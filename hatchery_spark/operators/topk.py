"""Communication-bounded distributed top-k with per-row rank certificates.

Three-phase threshold top-k (the TPUT family — Cao & Wang, PODC'04
"Efficient top-k query calculation in distributed networks"; Fagin's
threshold-algorithm lineage): each data stripe ships only its LOCAL
top-k partial counts; the sum of the stripes' k-th-place thresholds
upper-bounds every key that never surfaced anywhere, so each reported
row carries a PROOF — ``rank_certified`` — that its global rank is
exact. Unlike sketch top-k (count-min / SpaceSaving) the answer has no
approximation error: a row is either certified exact or the flag says
the tail below it is open.

Why this matters at 10^12 rows: a plain ``groupBy(key).count`` top-k
shuffles the FULL keyspace (every distinct key crosses the wire as a
map-side partial). Here the only cross-stripe traffic is S×k candidate
rows plus the candidate-matched partials (a broadcast semi-join with
the candidate set as build side) — the uncertified tail of a power-law
keyspace never moves. The reference aggregates per-sink counts after
routing (pipeline/pipeline.go:run, destination writers count rows per
sink); this operator is the scale path for the same "top talkers"
question when the key cardinality itself is the bottleneck.

Bound semantics (all BIGINT, both engines agree bit-for-bit):

* tau_s = count of the k-th locally-ranked key in stripe s (ties broken
  by key ascending), 0 when the stripe holds fewer than k keys — any
  key ABSENT from stripe s's local top-k has local count <= tau_s.
* ub_absent = sum_s tau_s — no key outside the candidate union can
  exceed this total.
* a candidate row with exact total > ub_absent provably beats every
  non-candidate, and every key ranked above it is itself a candidate
  with an exact total — so its reported rank is its TRUE global rank.

The flag is deliberately strict (>): a non-candidate could reach
ub_absent exactly, tying the row, so equality does not certify.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_certified(
    df: DataFrame,
    key_cols: Sequence[str],
    stripe_col: str = "stripe",
    k: int = 10,
) -> DataFrame:
    """Top-k keys by row count with per-row exact-rank certificates.

    ``df`` must carry ``stripe_col`` (any deterministic partition id —
    the catalog query derives it from md5(event_id) so both engines
    replay it). Returns k rows: ``*key_cols, total, rank, ub_absent,
    rank_certified`` ordered by rank.

    Plan shape: one map-side-combinable (stripe, key) aggregate; the
    per-stripe rank window partitions on the stripe key; candidates and
    thresholds are S×k- and S-sized frames (broadcast); the exact-total
    pass re-aggregates only candidate-matched partials. The final rank
    window is a single partition over <= S×k candidate rows — bounded
    by construction, not by data.
    """
    keys = list(key_cols)
    partials = df.groupBy(stripe_col, *keys).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    local_w = Window.partitionBy(stripe_col).orderBy(
        F.desc("c"), *[F.col(c).asc() for c in keys]
    )
    ranked = partials.withColumn("rn", F.row_number().over(local_w))
    local_top = ranked.where(F.col("rn") <= k)

    # tau_s: the k-th local count (0 when the stripe has < k keys)
    tau = ranked.groupBy(stripe_col).agg(
        F.coalesce(
            F.max(F.when(F.col("rn") == k, F.col("c"))), F.lit(0)
        ).cast("long").alias("tau")
    )
    ub = tau.agg(F.sum("tau").cast("long").alias("ub_absent"))

    cands = local_top.select(*keys).distinct()
    exact = (
        partials.join(F.broadcast(cands), keys, "left_semi")
        .groupBy(*keys)
        .agg(F.sum("c").cast("long").alias("total"))
    )
    glob_w = Window.orderBy(F.desc("total"), *[F.col(c).asc() for c in keys])
    out = (
        exact.withColumn("rank", F.row_number().over(glob_w))
        .where(F.col("rank") <= k)
        .crossJoin(F.broadcast(ub))
        .withColumn("rank_certified", F.col("total") > F.col("ub_absent"))
    )
    return out.select(*keys, "total", "rank", "ub_absent", "rank_certified")


def topk_oracle_sql(
    src_sql: str,
    key_expr: str,
    stripe_expr: str,
    k: int = 10,
) -> str:
    """DuckDB replay of the full three-phase algorithm: same local
    ranks, same tau/ub arithmetic, same strict certificate."""
    return f"""
        WITH src AS ({src_sql}),
        partials AS (
          SELECT {stripe_expr} AS s, {key_expr} AS key,
                 cast(count(*) AS bigint) AS c
          FROM src GROUP BY 1, 2),
        ranked AS (
          SELECT s, key, c,
                 row_number() OVER (PARTITION BY s
                                    ORDER BY c DESC, key) AS rn
          FROM partials),
        tau AS (
          SELECT s, cast(coalesce(max(CASE WHEN rn = {k} THEN c END), 0)
                         AS bigint) AS tau
          FROM ranked GROUP BY s),
        ub AS (SELECT cast(sum(tau) AS bigint) AS ub_absent FROM tau),
        cands AS (SELECT DISTINCT key FROM ranked WHERE rn <= {k}),
        exact AS (
          SELECT p.key, cast(sum(p.c) AS bigint) AS total
          FROM partials p JOIN cands USING (key)
          GROUP BY p.key),
        g AS (
          SELECT key, total,
                 cast(row_number() OVER (ORDER BY total DESC, key)
                      AS int) AS rank
          FROM exact)
        SELECT g.key, g.total, g.rank, ub.ub_absent,
               g.total > ub.ub_absent AS rank_certified
        FROM g, ub WHERE g.rank <= {k}"""
