"""Declarative data-quality validation (the Deequ/Great-Expectations idiom,
Schelter et al., VLDB'18): a check suite — completeness, uniqueness, value
ranges, regex shape, set membership, referential integrity — evaluated
against a table in a FIXED, minimal number of passes, returning one row per
check with the exact violation count.

Why engine-level: at 10^12 rows "eyeball a sample" is not a gate; ingest
pipelines publish these counts per batch and block promotion on them
(reference analog: hatchery validates each payload's schema per source —
schemaHint, source/falcon_data_replicator/client.go:195 — this is the
table-level generalization).

Execution shape: every ROW-LEVEL check (not_null / range / pattern /
in_set) folds into ONE shared aggregate pass — a single map-side-combined
projection of conditional sums, no shuffle beyond the 1-row agg — however
many checks there are. Each `unique` check adds one key-grouped aggregate
(two-level: per-key counts → surplus sum); each `ref_integrity` check adds
one LEFT ANTI join against the dimension's key set (broadcast when small).
Violation counts are integers — every engine replays them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["quality_checks"]


def _row_condition(check: dict) -> F.Column:
    """Violation predicate (TRUE = row violates) for row-level checks.
    NULLs only violate not_null — other checks skip them (completeness is
    its own dimension)."""
    kind = check["type"]
    col = F.col(check["col"])
    if kind == "not_null":
        return col.isNull()
    if kind == "range":
        cond = F.lit(False)
        if "min" in check:
            cond = cond | (col < F.lit(check["min"]))
        if "max" in check:
            cond = cond | (col > F.lit(check["max"]))
        return col.isNotNull() & cond
    if kind == "pattern":
        return col.isNotNull() & ~col.rlike(check["regex"])
    if kind == "in_set":
        return col.isNotNull() & ~col.isin(list(check["values"]))
    raise ValueError(f"unknown row-level check type {check['type']!r}")


def quality_checks(
    df: DataFrame,
    checks: list[dict],
    refs: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Evaluate a check suite. Each check dict: ``name``, ``type`` and
    type-specific fields — not_null(col) / range(col, min, max) /
    pattern(col, regex) / in_set(col, values) / unique(cols) /
    ref_integrity(col, ref, ref_col) where ``ref`` names an entry in
    ``refs``. Optional ``max_violations`` (default 0) sets the pass
    threshold. Returns (check_name, check_type, violations, n_rows,
    passed) — one row per check."""
    refs = refs or {}
    row_checks = [c for c in checks if c["type"] in
                  ("not_null", "range", "pattern", "in_set")]
    frames: list[DataFrame] = []
    if row_checks:
        aggs = [F.count(F.lit(1)).alias("__n")] + [
            F.sum(_row_condition(c).cast("long")).alias(f"v{i}")
            for i, c in enumerate(row_checks)
        ]
        wide = df.agg(*aggs)
        stack = ", ".join(
            f"'{c['name']}', '{c['type']}', v{i}"
            for i, c in enumerate(row_checks)
        )
        frames.append(
            wide.selectExpr(
                f"stack({len(row_checks)}, {stack}) AS "
                "(check_name, check_type, violations)",
                "__n AS n_rows",
            )
        )
    n_rows_df = None
    for c in checks:
        if c["type"] == "unique":
            # duplicate surplus: Σ(cnt−1) over keys seen more than once
            keys = [F.col(k) for k in c["cols"]]
            per_key = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))
            surplus = per_key.agg(
                F.coalesce(F.sum(F.col("cnt") - 1), F.lit(0)).alias("violations"),
                F.coalesce(F.sum("cnt"), F.lit(0)).alias("n_rows"),
            )
            frames.append(
                surplus.select(
                    F.lit(c["name"]).alias("check_name"),
                    F.lit("unique").alias("check_type"),
                    "violations",
                    "n_rows",
                )
            )
        elif c["type"] == "ref_integrity":
            dim = refs[c["ref"]].select(
                F.col(c["ref_col"]).alias(c["col"])
            ).distinct()
            orphans = (
                df.where(F.col(c["col"]).isNotNull())
                .join(dim, c["col"], "left_anti")
                .agg(F.count(F.lit(1)).alias("violations"))
            )
            if n_rows_df is None:
                n_rows_df = df.agg(F.count(F.lit(1)).alias("n_rows"))
            frames.append(
                orphans.crossJoin(F.broadcast(n_rows_df)).select(
                    F.lit(c["name"]).alias("check_name"),
                    F.lit("ref_integrity").alias("check_type"),
                    "violations",
                    "n_rows",
                )
            )
        elif c["type"] not in ("not_null", "range", "pattern", "in_set"):
            raise ValueError(f"unknown check type {c['type']!r}")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    thresholds = {c["name"]: int(c.get("max_violations", 0)) for c in checks}
    thr = F.create_map(
        *[x for name, t in thresholds.items() for x in (F.lit(name), F.lit(t))]
    )
    return out.select(
        "check_name",
        "check_type",
        F.col("violations").cast("long").alias("violations"),
        F.col("n_rows").cast("long").alias("n_rows"),
        (F.col("violations") <= thr[F.col("check_name")]).alias("passed"),
    )
