"""Schema-drift detection over semi-structured payloads.

Upstream services change their log schemas without telling the pipeline —
keys appear, types flip (``"code":"E17"`` → ``"code":17``), enums widen.
At 10^12 rows the guard is a per-epoch (key, type) profile plus a
day-over-day diff, not a human reading samples. The reference's
``schemaHint`` per source (source/falcon_data_replicator/client.go:195) is
the static ancestor of this check.

Profiling strategy: the flat-JSON key list and each value's TYPE are read
straight off the wire text with two aligned ``regexp_extract_all`` calls
(key capture; first-char-of-value capture → string/number/bool/null) —
one pass, pure codegen, no JSON library in the hot path and no
per-row Python. ``from_json`` to a string map would ERASE the types
(``87`` and ``"87"`` both become ``"87"``), which is exactly the signal
drift detection needs; the raw-text classifier keeps it. Nested payloads
profile their top level only (documented contract — the fixture and the
reference's own payloads are flat).

Plan shape: explode of the zipped key/type arrays → ONE partial-agg
groupBy onto the (day, key, type) grid (profile-sized, corpus-
independent) → a lag window per key over days. The raw rows shuffle
once, pre-combined per partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_KEY_RE = r'"(\w+)"\s*:'
_TYPE_RE = r'"\w+"\s*:\s*(["\-0-9tfn])'


def _type_name(c):
    return (
        F.when(c == '"', "string")
        .when(c.isin("t", "f"), "bool")
        .when(c == "n", "null")
        .otherwise("number")
    )


def schema_profile(df: DataFrame, json_col: str, ts_col: str = "ts") -> DataFrame:
    """Per (day, key, type) occurrence counts from the raw JSON text."""
    # Spark SQL string literals eat backslashes — escape the regex text
    k_re = _KEY_RE.replace("\\", "\\\\")
    t_re = _TYPE_RE.replace("\\", "\\\\")
    keys = F.expr(f"regexp_extract_all({json_col}, '{k_re}', 1)")
    tchars = F.expr(f"regexp_extract_all({json_col}, '{t_re}', 1)")
    pairs = df.select(
        F.date_trunc("day", F.col(ts_col)).alias("day"),
        F.explode(F.arrays_zip(keys.alias("k"), tchars.alias("c"))).alias("p"),
    )
    return (
        pairs.select(
            "day",
            F.col("p.k").alias("key"),
            _type_name(F.col("p.c")).alias("vtype"),
        )
        .groupBy("day", "key", "vtype")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def schema_drift(df: DataFrame, json_col: str, ts_col: str = "ts") -> DataFrame:
    """Day-over-day drift report: per (day, key) the sorted type set, row
    count, and flags — ``is_new`` (key absent the previous observed day)
    and ``type_changed`` (type set differs from the previous day's)."""
    prof = schema_profile(df, json_col, ts_col)
    day_key = (
        prof.groupBy("day", "key")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_set("vtype"))).alias("types"),
            F.sum("n").cast("long").alias("n"),
        )
    )
    w = Window.partitionBy("key").orderBy("day")
    prev = F.lag("types").over(w)
    return day_key.select(
        "day", "key", "types", "n",
        prev.isNull().alias("is_new"),
        (prev.isNotNull() & (prev != F.col("types"))).alias("type_changed"),
    )


def drift_oracle_sql(profile_sql: str) -> str:
    """Window algebra replay over an independently-derived
    (day, key, vtype, n) profile relation."""
    return f"""
        WITH prof AS ({profile_sql}),
        day_key AS (
          SELECT day, key,
                 string_agg(DISTINCT vtype, ',' ORDER BY vtype) AS types,
                 cast(sum(n) AS bigint) AS n
          FROM prof GROUP BY day, key),
        lagged AS (
          SELECT day, key, types, n,
                 lag(types) OVER (PARTITION BY key ORDER BY day) AS prev
          FROM day_key)
        SELECT day, key, types, n,
               prev IS NULL AS is_new,
               (prev IS NOT NULL AND prev <> types) AS type_changed
        FROM lagged"""


# ---------------------------------------------------------------- Benford

# first-digit probabilities log10(1+1/d), fixed-point at 1e9 — module-level
# constants so the Spark expression and any SQL replay share THE SAME
# integers (no cross-engine log10 in the data path)
BENFORD_P_SCALED = {
    d: round(__import__("math").log10(1.0 + 1.0 / d) * 1_000_000_000)
    for d in range(1, 10)
}


def benford_deviation(df: DataFrame, value: Column, group_col: str) -> DataFrame:
    """First-significant-digit distribution vs Benford's law, per group —
    the classic fabricated-numbers screen (Benford 1938; Nigrini's audit
    use), INTEGER-EXACT end to end: observed counts are integers, expected
    mass is ``n · p_d`` with p_d a shared fixed-point constant, and the
    reported deviation is ``|observed·10^9 − n·p_d|`` — no float op
    anywhere, so any engine replays every row bit-for-bit.

    ``value`` must be a positive integral column; its first digit is taken
    from the decimal string (int→string is engine-identical, unlike float
    formatting or log10-based digit extraction, whose libm edge cases at
    powers of ten differ across engines).

    Cost: two map-side-combined aggregates (per-(group, digit) counts and
    per-group totals) + a groups×9 grid join — nothing corpus-sized past
    the first aggregate. Returns (group, digit, observed, expected_scaled,
    dev_scaled); Σ dev_scaled per group is 10^9·n·(2·total-variation
    distance) for callers that want one score."""
    d_col = F.substring(value.cast("string"), 1, 1).cast("int")
    src = df.select(F.col(group_col).alias("g"), d_col.alias("digit"))
    counts = src.groupBy("g", "digit").agg(F.count(F.lit(1)).alias("observed"))
    totals = src.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    digits = F.explode(F.array(*[F.lit(d) for d in range(1, 10)])).alias("digit")
    grid = totals.select("g", "n", digits)
    p_expr = F.element_at(
        F.array(*[F.lit(BENFORD_P_SCALED[d]) for d in range(1, 10)]),
        F.col("digit"),
    )
    out = (
        grid.join(counts, ["g", "digit"], "left")
        .select(
            F.col("g").alias(group_col),
            "digit",
            F.coalesce("observed", F.lit(0)).alias("observed"),
            (F.col("n") * p_expr).cast("long").alias("expected_scaled"),
        )
        .withColumn(
            "dev_scaled",
            F.abs(
                F.col("observed") * F.lit(1_000_000_000)
                - F.col("expected_scaled")
            ).cast("long"),
        )
    )
    return out
