"""Telemetry operators: flow control, anomaly triage, and behavioral rollups.

Log pipelines at 10^12 rows need flow control and outlier triage BEFORE
storage: a runaway client or misconfigured agent can emit millions of
near-identical events per hour (the reference throttles at the source API
level via its per-source schedules, pkg/config/range.go; at Spark scale the
equivalent guard runs inside the job). The behavioral rollups (funnels,
retention cohorts) are the read side of the same event stream.

Every operator here is windows/aggregates/joins only — hash shuffles keyed
on user or group, WindowGroupLimit partials where a rank cut exists,
broadcast build sides for the |users|-scale frames, no Python anywhere.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rate_cap(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    bucket: str = "hour",
    max_rows: int = 100,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Keep at most `max_rows` rows per (key, time-bucket), earliest first.

    The per-source quota guard: rows rank by event time (plus an explicit
    tiebreak column for determinism) within each (key, date_trunc(bucket))
    partition, and ranks beyond the cap are dropped. Spark plans the rank
    cut as WindowGroupLimit (partial top-n per input partition BEFORE the
    shuffle), so a whale key forwards at most max_rows rows per task rather
    than its full flood. Adds `rate_rank` (1-based) to surviving rows.
    """
    order = [F.col(ts_col)]
    if tiebreak_col:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(
        *key_cols, F.date_trunc(bucket, F.col(ts_col)).alias("_b")
    ).orderBy(*order)
    return (
        df.withColumn("rate_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rate_rank") <= max_rows)
    )


def group_zscores(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    round_digits: int = 4,
) -> DataFrame:
    """Per-group z-score: (value − group mean) / group sample-stddev.

    The cheap anomaly triage for telemetry values — one unbounded window
    over the group partition (a single hash shuffle; mean/stddev are
    computed once per partition frame, not per row). Groups with one row
    (stddev undefined) and zero-variance groups yield NULL `zscore`, which
    both ANSI engines agree on. Output order of magnitude: |z| > 3 is the
    conventional flag line.
    """
    w = Window.partitionBy(*group_cols)
    v = F.col(value_col)
    sd = F.stddev_samp(value_col).over(w)
    # explicit > 0 guard: ANSI engines disagree on float x/0 (error vs inf),
    # so zero-variance and single-row groups are pinned to NULL here
    z = F.when(sd > 0, (v - F.avg(v).over(w)) / sd)
    return df.withColumn("zscore", F.round(z, round_digits))


def funnel_steps(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered funnel progression per user: greedy earliest-match — step
    i+1 counts only if it happens strictly AFTER the user's matched step i
    (the standard product-analytics funnel, computed exactly, not as the
    unordered "did all steps" approximation).

    Plan: ONE conditional aggregate per funnel step, chained — step 1 is
    min ts of the step-1 event per user; step i is min ts of the step-i
    event AFTER that user's step-(i−1) time, delivered to the next
    aggregate by joining the (small) per-user frame back onto events. Each
    round is a hash aggregate + a join keyed on the user — no window sort,
    no explode; at web scale the per-user frames are |users| rows against
    an events table orders of magnitude larger, so Spark broadcasts them
    as the build side. Returns one row per user who completed step 1:
    (user, step_1_ts .. step_k_ts, steps_completed) with NULL ts for
    unreached steps.
    """
    assert steps, "funnel needs at least one step"
    u = F.col(user_col)
    cur = (
        df.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("step_1_ts"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            df.filter(F.col(type_col) == step)
            .join(cur.select(u, F.col(f"step_{i-1}_ts").alias("_prev")), user_col)
            .filter(F.col(ts_col) > F.col("_prev"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"step_{i}_ts"))
        )
        cur = cur.join(nxt, user_col, "left")
    done = reduce(
        lambda acc, i: acc + F.col(f"step_{i}_ts").isNotNull().cast("int"),
        range(2, len(steps) + 1),
        F.lit(1),
    )
    return cur.withColumn("steps_completed", done)


def funnel_steps_single_scan(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """`funnel_steps` computed in ONE shuffle: identical output, different
    physical shape for small step counts where re-scanning events k times
    dominates.

    Plan: filter events to the funnel types (k-value IN pushed to the
    scan), ONE hash aggregate per user collecting sort_array(collect_list(
    struct(ts, type))), then a greedy left-to-right walk over the sorted
    array (aggregate HOF) matches each step's earliest strictly-later
    event — the same greedy-earliest semantics as the k-scan form, proved
    by the shared driver oracle. The walk is interpreted (HOFs are
    CodegenFallback) at ~µs per funnel-type event; the k-scan form instead
    pays k codegen'd scans + k joins. Crossover is data-dependent — bench
    both (bench.py measures the two at sf0.1); state per user is the
    funnel-type events only, so skew follows the rate_cap guidance
    upstream if one user floods a step type.
    """
    assert steps, "funnel needs at least one step"
    k = len(steps)
    steps_arr = F.array(*[F.lit(s) for s in steps])
    ev = (
        df.filter(F.col(type_col).isin(list(steps)))
        .groupBy(user_col)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("tp")))
            ).alias("_ev")
        )
    )
    init = F.struct(
        F.array(*[F.lit(None).cast("timestamp") for _ in range(k)]).alias("matched"),
        F.lit(0).alias("idx"),
    )

    def _step(acc, e):
        # next expected step (1-based lookup into the literal steps array)
        expected = F.element_at(steps_arr, acc["idx"] + 1)
        # strictly after the previous matched ts (idx 0 has no predecessor;
        # try_element_at(…, 0) is NULL and the OR's first arm short-circuits
        # the row semantics — NULL never matches)
        after_prev = (acc["idx"] == 0) | (
            e["ts"] > F.try_element_at(acc["matched"], acc["idx"])
        )
        matched = F.transform(
            acc["matched"],
            lambda x, i: F.when(i == acc["idx"], e["ts"]).otherwise(x),
        )
        stepped = F.struct(matched.alias("matched"), (acc["idx"] + 1).alias("idx"))
        return F.when(
            (acc["idx"] < k) & (e["tp"] == expected) & after_prev, stepped
        ).otherwise(acc)

    walked = ev.select(
        F.col(user_col), F.aggregate("_ev", init, _step).alias("_w")
    )
    out = walked.select(
        F.col(user_col),
        *[
            F.element_at(F.col("_w")["matched"], i).alias(f"step_{i}_ts")
            for i in range(1, k + 1)
        ],
        F.col("_w")["idx"].alias("steps_completed"),
    )
    return out.filter(F.col("step_1_ts").isNotNull())


def retention_cohorts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen date, counted
    distinct on each subsequent activity day — the standard day-N retention
    table.

    Two hash aggregates: first-seen per user (shuffle keyed on user), then
    distinct users per (cohort_date, day_offset) — the second aggregate's
    exchange carries per-(user, day) rows AFTER an in-partition projection,
    and the cohort frame joining back onto events is |users|-sized
    (broadcast build side at web scale). Returns (cohort_date, day_offset,
    n_users, cohort_size, retention) with retention rounded to 4.
    """
    first = df.groupBy(user_col).agg(
        F.min(F.to_date(ts_col)).alias("cohort_date")
    )
    activity = (
        df.select(F.col(user_col), F.to_date(ts_col).alias("_day"))
        .distinct()
        .join(first, user_col)
        .withColumn("day_offset", F.datediff("_day", "cohort_date"))
    )
    counts = activity.groupBy("cohort_date", "day_offset").agg(
        F.count_distinct(F.col(user_col)).alias("n_users")
    )
    sizes = first.groupBy("cohort_date").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return counts.join(sizes, "cohort_date").select(
        "cohort_date",
        "day_offset",
        "n_users",
        "cohort_size",
        F.round(F.col("n_users") / F.col("cohort_size"), 4).alias("retention"),
    )


def gorilla_ts_bits(
    df: DataFrame,
    group_col: str = "conv_id",
    ts_col: str = "ts",
    order_col: str = "turn_idx",
) -> DataFrame:
    """Gorilla delta-of-delta timestamp sizing (Pelkonen et al.,
    VLDB'15 §4.1) — how many bits the pipeline's per-conversation
    timestamp streams cost in a Gorilla-style metrics store, per stream:

      dod == 0           → 1 bit   ('0')
      dod ∈ [-63, 64]    → 9 bits  ('10'  + 7)
      dod ∈ [-255, 256]  → 12 bits ('110' + 9)
      dod ∈ [-2047,2048] → 16 bits ('1110'+ 12)
      else               → 36 bits ('1111'+ 32)

    The stream head stores the full 64-bit timestamp; the second point's
    delta is encoded with the same bucket table against a zero prior
    delta (a uniform variant of the paper's block-aligned 14-bit first
    delta, chosen so every row goes through one rule). Timestamps are
    floored to seconds, the paper's resolution.

    Output per stream: point/bucket counts, total_bits, raw_bits (64·n),
    and an integer per-mille ratio — no floats anywhere, so the oracle
    replay is tie-proof.

    Scale shape: ONE hash shuffle on the stream key; both window passes
    (lag of ts, lag of delta) and the final aggregate reuse that single
    partitioning. Skewed whale streams are bounded by conversation
    length, not corpus size; AQE skew-join handling is irrelevant here
    because nothing joins.
    """
    ts_s = F.unix_timestamp(F.col(ts_col))
    w = Window.partitionBy(group_col).orderBy(ts_s, F.col(order_col))
    delta = ts_s - F.lag(ts_s).over(w)
    base = df.select(
        group_col,
        F.row_number().over(w).alias("rn"),
        delta.alias("delta"),
    )
    w2 = Window.partitionBy(group_col).orderBy("rn")
    dod = F.col("delta") - F.coalesce(F.lag("delta").over(w2), F.lit(0))
    a = F.abs(dod)
    bits = (
        F.when(F.col("rn") == 1, F.lit(64))
        .when(dod == 0, F.lit(1))
        .when((dod >= -63) & (dod <= 64), F.lit(9))
        .when((dod >= -255) & (dod <= 256), F.lit(12))
        .when((dod >= -2047) & (dod <= 2048), F.lit(16))
        .otherwise(F.lit(36))
    )
    per_row = base.select(group_col, bits.alias("bits"))
    agg = per_row.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum("bits").alias("total_bits"),
        F.sum(F.when(F.col("bits") == 1, 1).otherwise(0)).alias("n_zero"),
        F.sum(F.when(F.col("bits") == 9, 1).otherwise(0)).alias("n_7bit"),
        F.sum(F.when(F.col("bits") == 12, 1).otherwise(0)).alias("n_9bit"),
        F.sum(F.when(F.col("bits") == 16, 1).otherwise(0)).alias("n_12bit"),
        F.sum(F.when(F.col("bits") == 36, 1).otherwise(0)).alias("n_32bit"),
    )
    return agg.select(
        group_col,
        "n_points",
        "total_bits",
        (F.col("n_points") * 64).alias("raw_bits"),
        # integer div on both sides (DuckDB's cast(double) ROUNDS, Spark
        # truncates — exact integer semantics dodge the difference)
        F.expr("total_bits * 1000 div (n_points * 64)").alias("permille"),
        "n_zero",
        "n_7bit",
        "n_9bit",
        "n_12bit",
        "n_32bit",
    )


def gorilla_oracle_sql(source_cte: str, group_expr: str = "conv_id") -> str:
    """DuckDB replay of :func:`gorilla_ts_bits` over a CTE exposing
    (conv_id, turn_idx, ts)."""
    return f"""
WITH src AS ({source_cte}),
s AS (SELECT {group_expr} AS g, turn_idx,
             cast(floor(epoch(ts)) AS bigint) AS ts_s
      FROM src),
d AS (SELECT g,
             row_number() OVER (PARTITION BY g ORDER BY ts_s, turn_idx)
               AS rn,
             ts_s - lag(ts_s) OVER (PARTITION BY g ORDER BY ts_s, turn_idx)
               AS delta
      FROM s),
dd AS (SELECT g, rn,
              delta - coalesce(lag(delta) OVER (PARTITION BY g ORDER BY rn),
                               0) AS dod
       FROM d),
b AS (SELECT g,
             CASE WHEN rn = 1 THEN 64
                  WHEN dod = 0 THEN 1
                  WHEN dod BETWEEN -63 AND 64 THEN 9
                  WHEN dod BETWEEN -255 AND 256 THEN 12
                  WHEN dod BETWEEN -2047 AND 2048 THEN 16
                  ELSE 36 END AS bits
      FROM dd)
SELECT g AS conv_id,
       count(*) AS n_points,
       cast(sum(bits) AS bigint) AS total_bits,
       count(*) * 64 AS raw_bits,
       cast(sum(bits) * 1000 // (count(*) * 64) AS bigint) AS permille,
       cast(sum(CASE WHEN bits = 1 THEN 1 ELSE 0 END) AS bigint) AS n_zero,
       cast(sum(CASE WHEN bits = 9 THEN 1 ELSE 0 END) AS bigint) AS n_7bit,
       cast(sum(CASE WHEN bits = 12 THEN 1 ELSE 0 END) AS bigint) AS n_9bit,
       cast(sum(CASE WHEN bits = 16 THEN 1 ELSE 0 END) AS bigint) AS n_12bit,
       cast(sum(CASE WHEN bits = 36 THEN 1 ELSE 0 END) AS bigint) AS n_32bit
FROM b GROUP BY g"""


def beacon_intervals(
    df: DataFrame,
    actor_col: str = "user_id",
    channel_col: str = "event_type",
    ts_col: str = "ts",
    order_col: str = "event_id",
    min_intervals: int = 4,
    cv2_max_permille: int = 250,
) -> DataFrame:
    """Beaconing detector: flag (actor, channel) streams whose inter-arrival
    times are suspiciously regular — the classic C2-callback signal a
    security-monitoring pipeline (the reference's domain; alert sinks in
    source/*/config.go route exactly this class of detection) runs over its
    event firehose.

    Regularity is the squared coefficient of variation of the gap series
    CV² = Var(d)/E[d]² = n·Σd²/(Σd)² − 1; a timer-driven implant with small
    jitter has CV² near 0, a human has CV² near 1 (Poisson). The flag is
    computed ENTIRELY in integer arithmetic — gaps floored to seconds, the
    CV² threshold cross-multiplied through DECIMAL(38,0) so no float ever
    forms — which makes the oracle replay tie-proof, and the reported
    cv2_permille is an integer floor-div of the same quantities.

    Scale shape: ONE hash shuffle on (actor, channel); the lag window and
    the aggregate reuse that partitioning (same plan family as
    gorilla_ts_bits above). Stream cardinality bounds the output, not the
    corpus; no joins, no Python.
    """
    ts_s = F.unix_timestamp(F.col(ts_col))
    w = Window.partitionBy(actor_col, channel_col).orderBy(ts_s, F.col(order_col))
    gap = (ts_s - F.lag(ts_s).over(w)).alias("gap_s")
    gaps = df.select(actor_col, channel_col, gap).where(F.col("gap_s").isNotNull())
    agg = gaps.groupBy(actor_col, channel_col).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("gap_s").alias("sum_d"),
        F.sum(F.col("gap_s") * F.col("gap_s")).alias("sum_d2"),
    )
    big = "CAST(n_gaps AS DECIMAL(38,0)) * sum_d2"
    sq = "CAST(sum_d AS DECIMAL(38,0)) * sum_d"
    return agg.where(
        (F.col("n_gaps") >= min_intervals) & (F.col("sum_d") > 0)
    ).select(
        actor_col,
        channel_col,
        "n_gaps",
        "sum_d",
        "sum_d2",
        F.expr(f"CAST(({big}) * 1000 DIV ({sq}) AS BIGINT) - 1000").alias(
            "cv2_permille"
        ),
        F.expr(
            f"CAST(({big}) * 1000 < ({sq}) * {1000 + cv2_max_permille} AS INT)"
        ).alias("is_beacon"),
    )


def beacon_oracle_sql(
    events_rel: str = "events",
    min_intervals: int = 4,
    cv2_max_permille: int = 250,
) -> str:
    """DuckDB replay of :func:`beacon_intervals` over the raw events table."""
    return f"""
WITH s AS (SELECT user_id, event_type, event_id,
                  cast(floor(epoch(ts)) AS bigint) AS ts_s
           FROM {events_rel}),
g AS (SELECT user_id, event_type,
             ts_s - lag(ts_s) OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts_s, event_id) AS gap_s
      FROM s),
a AS (SELECT user_id, event_type,
             count(*) AS n_gaps,
             cast(sum(gap_s) AS bigint) AS sum_d,
             cast(sum(gap_s * gap_s) AS bigint) AS sum_d2
      FROM g WHERE gap_s IS NOT NULL
      GROUP BY user_id, event_type)
SELECT user_id, event_type, n_gaps, sum_d, sum_d2,
       cast((n_gaps::HUGEINT * sum_d2) * 1000 // (sum_d::HUGEINT * sum_d)
            AS bigint) - 1000 AS cv2_permille,
       cast((n_gaps::HUGEINT * sum_d2) * 1000
              < (sum_d::HUGEINT * sum_d) * {1000 + cv2_max_permille}
            AS int) AS is_beacon
FROM a
WHERE n_gaps >= {min_intervals} AND sum_d > 0"""


# α=1/2 geometric weights over the 8 previous buckets, fixed-point scale 255
# (their exact sum) — the EWMA never leaves integer arithmetic.
EWMA_WEIGHTS = (128, 64, 32, 16, 8, 4, 2, 1)


def ewma_spikes(
    df: DataFrame,
    group_cols: Sequence[str],
    ts_col: str = "ts",
    bucket: str = "hour",
    threshold: int = 3,
    min_history: int = 4,
) -> DataFrame:
    """EWMA burst detection per (group, time-bucket): flag buckets whose
    count exceeds ``threshold`` × the exponentially-weighted mean of the 8
    preceding OBSERVED buckets (α=1/2).

    Entirely fixed-point: the weighted history is ``Σ wᵢ·lagᵢ`` with integer
    weights summing to 255, and the spike test is ``255·n > threshold·ewma``
    — no float ever, so two ANSI engines agree bit-for-bit. Early buckets
    (fewer than ``min_history`` predecessors) never flag: a cold series has
    no baseline to deviate from. Missing lags count as 0 — semantics are
    "previous observed buckets", the shipper-side convention when silent
    hours emit no row at all.

    One groupBy shuffle to the bucket grid (corpus-independent size), then
    a lag window over each group's own series — no global sort."""
    bucket_ts = F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts")
    counts = df.groupBy(*group_cols, bucket_ts).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.partitionBy(*group_cols).orderBy("bucket_ts")
    ewma = reduce(
        lambda a, b: a + b,
        [
            F.coalesce(F.lag("n", i + 1).over(w), F.lit(0)) * F.lit(wt)
            for i, wt in enumerate(EWMA_WEIGHTS)
        ],
    )
    rn = F.row_number().over(w)
    out = counts.select(
        *group_cols,
        "bucket_ts",
        "n",
        ewma.cast("long").alias("ewma_scaled"),
        rn.alias("_rn"),
    )
    spike = (F.col("_rn") > min_history) & (
        F.col("n") * 255 > F.col("ewma_scaled") * threshold
    )
    return out.withColumn("spike", spike).drop("_rn")


def ewma_oracle_sql(
    src_sql: str,
    group_expr: str,
    ts_expr: str = "ts",
    bucket: str = "hour",
    threshold: int = 3,
    min_history: int = 4,
) -> str:
    terms = " + ".join(
        f"{wt} * coalesce(lag(n, {i + 1}) OVER win, 0)"
        for i, wt in enumerate(EWMA_WEIGHTS)
    )
    return f"""
        WITH c AS (
          SELECT {group_expr} AS g, date_trunc('{bucket}', {ts_expr}) AS bucket_ts,
                 count(*) AS n
          FROM ({src_sql}) GROUP BY 1, 2),
        w AS (
          SELECT g, bucket_ts, n, {terms} AS ewma_scaled,
                 row_number() OVER win AS rn
          FROM c
          WINDOW win AS (PARTITION BY g ORDER BY bucket_ts))
        SELECT g, bucket_ts, cast(n AS bigint) AS n,
               cast(ewma_scaled AS bigint) AS ewma_scaled,
               (rn > {min_history} AND 255 * n > {threshold} * ewma_scaled)
                 AS spike
        FROM w"""


def lateness_stats(
    df: DataFrame,
    event_ts_col: str = "ts",
    proc_ts_col: str = "proc_ts",
    group_cols: Sequence[str] = ("g",),
    watermark_s: int = 600,
) -> DataFrame:
    """Event-time lateness profile per (group, processing hour): how far
    behind the processing clock the event clock runs, and what fraction of
    rows a `watermark_s` watermark would have dropped.

    This is the observability twin of the streaming watermark (stream.py):
    before picking a delay threshold you measure the actual lag surface.
    All-integer (second-resolution lags, exact percentile via the ANSI
    discrete quantile): one groupBy shuffle to the (group, hour) grid.

    p95 uses the index-based discrete percentile (``ceil(0.95·n)``-th
    smallest) — identical on both engines, no interpolation floats."""
    lag_s = (
        F.unix_timestamp(F.col(proc_ts_col)) - F.unix_timestamp(F.col(event_ts_col))
    ).alias("lag_s")
    bucket = F.date_trunc("hour", F.col(proc_ts_col)).alias("proc_hour")
    base = df.select(*group_cols, bucket, lag_s)
    w = Window.partitionBy(*group_cols, "proc_hour").orderBy("lag_s")
    ranked = base.select(
        *group_cols, "proc_hour", "lag_s",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(
            Window.partitionBy(*group_cols, "proc_hour")
        ).alias("n"),
    )
    return (
        ranked.groupBy(*group_cols, "proc_hour")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.max("lag_s").alias("max_lag_s"),
            F.min("lag_s").alias("min_lag_s"),
            F.max(
                F.when(F.col("rn") == F.ceil(F.col("n") * 0.95), F.col("lag_s"))
            ).alias("p95_lag_s"),
            F.sum(
                F.when(F.col("lag_s") > watermark_s, 1).otherwise(0)
            ).cast("long").alias("n_late"),
        )
    )


def lateness_oracle_sql(
    src_sql: str,
    group_expr: str = "g",
    event_ts: str = "ts",
    proc_ts: str = "proc_ts",
    watermark_s: int = 600,
) -> str:
    ep = "cast(floor(epoch({x})) AS bigint)"
    lag = f"{ep.format(x=proc_ts)} - {ep.format(x=event_ts)}"
    return f"""
        WITH base AS (
          SELECT {group_expr} AS g, date_trunc('hour', {proc_ts}) AS proc_hour,
                 {lag} AS lag_s
          FROM ({src_sql})),
        ranked AS (
          SELECT g, proc_hour, lag_s,
                 row_number() OVER (PARTITION BY g, proc_hour ORDER BY lag_s)
                   AS rn,
                 count(*) OVER (PARTITION BY g, proc_hour) AS n
          FROM base)
        SELECT g, proc_hour,
               cast(max(n) AS bigint) AS n,
               max(lag_s) AS max_lag_s,
               min(lag_s) AS min_lag_s,
               max(CASE WHEN rn = ceil(n * 0.95) THEN lag_s END) AS p95_lag_s,
               cast(sum(CASE WHEN lag_s > {watermark_s} THEN 1 ELSE 0 END)
                 AS bigint) AS n_late
        FROM ranked GROUP BY g, proc_hour"""


ROLLUP_AGGS = ("n", "v_sum", "v_min", "v_max")


def rollup_bucket(
    df: DataFrame,
    value_col: Column | str,
    group_cols: Sequence[str],
    bucket: str,
    ts_col: str = "ts",
) -> DataFrame:
    """One resolution level of a continuous-aggregate cascade:
    (group, date_trunc(bucket)) → count / sum / min / max of the value.

    The aggregate set is deliberately CLOSED UNDER MERGE (count→sum,
    sum→sum, min→min, max→max), so a coarser level is computable from the
    next finer level without touching raw rows — at 10^12 rows the raw
    stream is aggregated exactly once into minutes, and hours/days roll
    up from sketch-sized inputs (the hypertable/continuous-aggregate
    pattern). Avg is served as v_sum/n at read time; never store avg —
    it does not merge."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    return (
        df.select(*group_cols, F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts"), v.alias("v"))
        .groupBy(*group_cols, "bucket_ts")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("v").cast("long").alias("v_sum"),
            F.min("v").cast("long").alias("v_min"),
            F.max("v").cast("long").alias("v_max"),
        )
    )


def rollup_cascade(
    fine: DataFrame, group_cols: Sequence[str], bucket: str
) -> DataFrame:
    """Merge a finer rollup into a coarser bucket — raw rows never move."""
    return (
        fine.select(
            *group_cols,
            F.date_trunc(bucket, F.col("bucket_ts")).alias("bucket_ts"),
            *ROLLUP_AGGS,
        )
        .groupBy(*group_cols, "bucket_ts")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("v_sum").cast("long").alias("v_sum"),
            F.min("v_min").cast("long").alias("v_min"),
            F.max("v_max").cast("long").alias("v_max"),
        )
    )


def rollup_oracle_sql(
    src_sql: str, value_expr: str, group_expr: str, bucket: str
) -> str:
    """Direct single-level aggregation — the cascade must equal it exactly."""
    return f"""
        SELECT {group_expr} AS g, date_trunc('{bucket}', ts) AS bucket_ts,
               cast(count(*) AS bigint) AS n,
               cast(sum({value_expr}) AS bigint) AS v_sum,
               cast(min({value_expr}) AS bigint) AS v_min,
               cast(max({value_expr}) AS bigint) AS v_max
        FROM ({src_sql}) GROUP BY 1, 2"""


ERROR_SEVERITIES = ("error", "critical")


def tail_sample_traces(
    spans: DataFrame,
    trace_cols: Sequence[str],
    severity_col: str = "severity",
    ts_col: str = "ts",
    slow_s: int = 6 * 3600,
    rate: float = 0.1,
) -> DataFrame:
    """Tail-based trace sampling: the keep/drop decision is made per TRACE,
    after all its spans are seen — keep every trace containing an error
    span, every slow trace (wall duration >= slow_s), and a deterministic
    `rate` fraction of the healthy remainder as the baseline.

    This is the sampling mode head-based (per-span coin flip) pipelines
    can't express: an error trace is kept WHOLE or not at all. One hash
    shuffle on the trace key with map-side partial aggregation — a
    million-span whale trace forwards one partial row per input partition,
    never its spans. The baseline leg hashes the trace key (md5 prefix vs
    threshold, functions/sampling.py), so the kept set is a deterministic
    function of the data — identical on 8 executors or 1000, and nested
    across rates (raising `rate` only ADDS traces).

    Returns one row per KEPT trace: trace cols, n_spans, n_error_spans,
    duration_s, keep_reason ('error' > 'slow' > 'sampled'). To materialize
    the spans themselves, left-semi join the span stream against this frame
    on the trace key (broadcast when the kept set is small).
    """
    from hatchery_spark.functions.sampling import sample_threshold

    err = F.max(
        F.when(F.col(severity_col).isin(*ERROR_SEVERITIES), 1).otherwise(0)
    )
    per = spans.groupBy(*trace_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum(
            F.when(F.col(severity_col).isin(*ERROR_SEVERITIES), 1).otherwise(0)
        ).cast("long").alias("n_error_spans"),
        (
            F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))
        ).cast("long").alias("duration_s"),
        err.alias("_err"),
    )
    key = F.concat_ws("/", *[F.col(c).cast("string") for c in trace_cols])
    reason = (
        F.when(F.col("_err") == 1, "error")
        .when(F.col("duration_s") >= slow_s, "slow")
        .when(
            F.substring(F.md5(key), 1, 4) < sample_threshold(rate), "sampled"
        )
    )
    return (
        per.withColumn("keep_reason", reason)
        .where(F.col("keep_reason").isNotNull())
        .drop("_err")
    )


def tail_sample_oracle_sql(
    spans_sql: str,
    trace_exprs: Sequence[str],
    severity_expr: str = "severity",
    slow_s: int = 6 * 3600,
    rate: float = 0.1,
) -> str:
    """DuckDB replay of the per-trace decision (same md5-prefix baseline)."""
    from hatchery_spark.functions.sampling import sample_threshold

    cols = ", ".join(trace_exprs)
    key = (
        "concat_ws('/', "
        + ", ".join(f"cast({c} AS varchar)" for c in trace_exprs)
        + ")"
    )
    errs = ", ".join(f"'{s}'" for s in ERROR_SEVERITIES)
    return f"""
        WITH per AS (
          SELECT {cols},
                 cast(count(*) AS bigint) AS n_spans,
                 cast(sum(CASE WHEN {severity_expr} IN ({errs})
                               THEN 1 ELSE 0 END) AS bigint) AS n_error_spans,
                 cast(date_diff('second', min(ts), max(ts)) AS bigint)
                   AS duration_s
          FROM ({spans_sql}) GROUP BY {cols}
        )
        SELECT *
        FROM (SELECT {cols}, n_spans, n_error_spans, duration_s,
                     CASE WHEN n_error_spans > 0 THEN 'error'
                          WHEN duration_s >= {slow_s} THEN 'slow'
                          WHEN substr(md5({key}), 1, 4)
                               < '{sample_threshold(rate)}' THEN 'sampled'
                     END AS keep_reason
              FROM per)
        WHERE keep_reason IS NOT NULL"""


def slo_burnrate(
    df: DataFrame,
    service_cols: Sequence[str],
    is_error_col: str = "is_error",
    ts_col: str = "ts",
    page_per_10k: int = 144,
    ticket_per_10k: int = 60,
) -> DataFrame:
    """Multi-window multi-burn-rate SLO alerting (the SRE-workbook page/
    ticket policy) evaluated over history in ONE corpus pass.

    Burn rate = error_ratio / error_budget. With a 99.9% SLO (budget
    0.1%), the canonical policy pages when the 1h AND 5m windows both
    burn >= 14.4x (error ratio >= 1.44% = 144 per 10k) and tickets when
    the 6h AND 30m windows both burn >= 6x (60 per 10k). The short
    window is the reset guard: once the burst stops, the 5m/30m leg
    clears even while the long window is still polluted. Thresholds are
    passed as INTEGER per-10k ratios and compared by cross-
    multiplication (10000*err >= thresh*total) — no float division, no
    engine-dependent rounding anywhere.

    Scale shape: raw rows are aggregated ONCE into per-(service, 5-min)
    counts (one hash shuffle with map-side partial agg — the
    continuous-aggregate pattern above); the 30m/1h/6h windows roll up
    from that reduced frame and join back on bucket-floor keys, so every
    post-corpus stage is sketch-sized and AQE broadcasts it. Bucket keys
    are epoch-second BIGINTs (timezone-proof on both engines).

    Returns one row per (service, 5-min bucket): bucket_s, tot/err at
    5m/30m/1h/6h, page_alert, ticket_alert.
    """
    svc = [F.col(c) for c in service_cols]
    b5 = (F.floor(F.unix_timestamp(F.col(ts_col)) / 300) * 300).cast("long")
    base = (
        df.select(
            *svc,
            b5.alias("bucket_s"),
            F.col(is_error_col).cast("int").alias("_e"),
        )
        .groupBy(*service_cols, "bucket_s")
        .agg(
            F.count(F.lit(1)).cast("long").alias("tot_5m"),
            F.sum("_e").cast("long").alias("err_5m"),
        )
        # four plan branches (output + 3 rollups) read this reduced frame;
        # without the persist each branch re-scans and re-shuffles the RAW
        # corpus (verified: 4 source scans, zero ReusedExchange)
        .persist()
    )

    def roll(width: int, suffix: str) -> DataFrame:
        # service cols renamed so the join back to `base` (a self-join by
        # lineage) has unambiguous, explicitly-equated keys
        return (
            base.groupBy(
                *[F.col(c).alias(f"{c}_{suffix}") for c in service_cols],
                (F.floor(F.col("bucket_s") / width) * width)
                .cast("long")
                .alias(f"b_{suffix}"),
            )
            .agg(
                F.sum("tot_5m").cast("long").alias(f"tot_{suffix}"),
                F.sum("err_5m").cast("long").alias(f"err_{suffix}"),
            )
        )

    out = base
    for width, suffix in ((1800, "30m"), (3600, "1h"), (21600, "6h")):
        key = (F.floor(F.col("bucket_s") / width) * width).cast("long")
        cond = key == F.col(f"b_{suffix}")
        for c in service_cols:
            cond = cond & (F.col(c) == F.col(f"{c}_{suffix}"))
        out = out.join(roll(width, suffix), on=cond, how="inner").drop(
            f"b_{suffix}", *[f"{c}_{suffix}" for c in service_cols]
        )

    def burns(err: str, tot: str, thresh: int) -> Column:
        return (F.col(err) * 10000) >= (F.lit(thresh) * F.col(tot))

    return out.select(
        *service_cols,
        "bucket_s",
        "tot_5m", "err_5m", "tot_30m", "err_30m",
        "tot_1h", "err_1h", "tot_6h", "err_6h",
        (
            burns("err_1h", "tot_1h", page_per_10k)
            & burns("err_5m", "tot_5m", page_per_10k)
        ).alias("page_alert"),
        (
            burns("err_6h", "tot_6h", ticket_per_10k)
            & burns("err_30m", "tot_30m", ticket_per_10k)
        ).alias("ticket_alert"),
    )


def slo_burnrate_oracle_sql(
    src_sql: str,
    service_expr: str,
    error_expr: str,
    page_per_10k: int = 144,
    ticket_per_10k: int = 60,
) -> str:
    """Direct SQL replay: same 5-min base aggregate, same bucket-floor
    rollups, same integer cross-multiplied thresholds."""
    return f"""
        WITH src AS ({src_sql}),
        b5 AS (
          SELECT {service_expr} AS svc,
                 cast(floor(epoch(ts) / 300) * 300 AS bigint) AS bucket_s,
                 cast(count(*) AS bigint) AS tot_5m,
                 cast(sum(cast({error_expr} AS int)) AS bigint) AS err_5m
          FROM src GROUP BY 1, 2),
        r30 AS (SELECT svc, cast(floor(bucket_s/1800)*1800 AS bigint) AS b,
                       sum(tot_5m) AS tot, sum(err_5m) AS err FROM b5 GROUP BY 1,2),
        r1h AS (SELECT svc, cast(floor(bucket_s/3600)*3600 AS bigint) AS b,
                       sum(tot_5m) AS tot, sum(err_5m) AS err FROM b5 GROUP BY 1,2),
        r6h AS (SELECT svc, cast(floor(bucket_s/21600)*21600 AS bigint) AS b,
                       sum(tot_5m) AS tot, sum(err_5m) AS err FROM b5 GROUP BY 1,2)
        SELECT b5.svc, b5.bucket_s, b5.tot_5m, b5.err_5m,
               cast(r30.tot AS bigint) AS tot_30m, cast(r30.err AS bigint) AS err_30m,
               cast(r1h.tot AS bigint) AS tot_1h, cast(r1h.err AS bigint) AS err_1h,
               cast(r6h.tot AS bigint) AS tot_6h, cast(r6h.err AS bigint) AS err_6h,
               (r1h.err * 10000 >= {page_per_10k} * r1h.tot
                AND b5.err_5m * 10000 >= {page_per_10k} * b5.tot_5m) AS page_alert,
               (r6h.err * 10000 >= {ticket_per_10k} * r6h.tot
                AND r30.err * 10000 >= {ticket_per_10k} * r30.tot) AS ticket_alert
        FROM b5
        JOIN r30 ON r30.svc = b5.svc AND r30.b = cast(floor(b5.bucket_s/1800)*1800 AS bigint)
        JOIN r1h ON r1h.svc = b5.svc AND r1h.b = cast(floor(b5.bucket_s/3600)*3600 AS bigint)
        JOIN r6h ON r6h.svc = b5.svc AND r6h.b = cast(floor(b5.bucket_s/21600)*21600 AS bigint)"""


def rate_envelope_violations(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    sigma: int = 3,
    rho_num: int = 1,
    rho_den: int = 600,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Token-bucket / arrival-curve conformance marking: flag every event
    whose key-stream violates the declared (sigma, rho) envelope — more
    than sigma + rho*(t_i - t_j) arrivals in some window (j..i].

    This is the network-calculus form of token-bucket policing (GCRA's
    virtual queue): a queue drains at rho events/sec and each arrival
    deposits one; event i is flagged when the queue exceeds the burst
    allowance sigma. The naive test is O(n^2) pairs per key; the closed
    form is a RUNNING MIN — backlog_i = max_j [count(j..i) - rho*(t_i -
    t_j)] = cum_i - rho*t_i - min_{j<=i}(cum_{j-1} - rho*t_j) — so one
    ordered pass per key computes it exactly. (Enforcement with drop
    FEEDBACK — dropped events not consuming tokens — is inherently
    sequential per key; this is the marking form every wire-rate policer
    implements, and the flag set is identical whenever the stream never
    exceeds the envelope by more than one event at a time.)

    rho is the INTEGER ratio rho_num/rho_den events per second; the
    whole test is cross-multiplied by rho_den (BIGINT throughout), so
    backlog_x_den = backlog * rho_den is exact and the violation test
    `backlog_x_den > sigma * rho_den` has no float rounding on any
    engine. One hash shuffle on the key, two frame-free window passes
    over the same sort order (Spark plans a single Sort).

    Adds: backlog_x_den (bigint), violates (boolean).
    """
    order = [F.col(ts_col)]
    if tiebreak_col:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(*key_cols).orderBy(*order)
    wmin = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t = F.unix_timestamp(F.col(ts_col))  # whole seconds, BIGINT
    cum = F.row_number().over(w).cast("long")
    g = (cum - F.lit(1)) * rho_den - F.lit(rho_num) * t
    backlog = cum * rho_den - F.lit(rho_num) * t - F.min(g).over(wmin)
    return df.withColumn("backlog_x_den", backlog.cast("long")).withColumn(
        "violates", F.col("backlog_x_den") > F.lit(sigma * rho_den)
    )


def rate_envelope_oracle_sql(
    src_sql: str,
    key_expr: str,
    order_expr: str,
    select_cols: str,
    sigma: int = 3,
    rho_num: int = 1,
    rho_den: int = 600,
) -> str:
    """Window-for-window SQL replay of the running-min closed form."""
    return f"""
        WITH src AS ({src_sql}),
        x AS (
          SELECT *,
            cast(row_number() OVER (PARTITION BY {key_expr}
                                    ORDER BY {order_expr}) AS bigint) AS cum,
            cast(floor(epoch(ts)) AS bigint) AS t_s
          FROM src),
        y AS (
          SELECT *,
            cum * {rho_den} - {rho_num} * t_s
              - min((cum - 1) * {rho_den} - {rho_num} * t_s)
                  OVER (PARTITION BY {key_expr} ORDER BY {order_expr}
                        ROWS UNBOUNDED PRECEDING) AS backlog_x_den
          FROM x)
        SELECT {select_cols}, cast(backlog_x_den AS bigint) AS backlog_x_den,
               backlog_x_den > {sigma} * {rho_den} AS violates
        FROM y"""


def cusum_rate_shift(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    k_gap_s: int = 600,
    h_s: int = 1800,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """CUSUM changepoint detection on per-key event RATE (Page 1954):
    flag the point where a key's inter-arrival gaps drift persistently
    BELOW the reference gap ``k_gap_s`` — the emission-rate-shift onset
    (compromised credential, runaway agent) that a fixed-threshold
    rate cap only catches after the burst peaks.

    The lower-CUSUM recurrence S_i = max(0, S_{i-1} + (k - gap_i))
    accumulates "too fast" mass and self-drains while the stream is on
    schedule. Sequential as written — but it has the SAME running-min
    closed form as the token bucket above: with y_i = k - gap_i and
    C_i = Σ_{j≤i} y_j,  S_i = C_i - min(0, min_{j≤i} C_j), so one
    ordered pass per key (ONE hash shuffle, two frame-bound window
    passes over a single Sort) computes it exactly. The first event of
    a key has no gap and contributes y = 0. Alarm when S_i ≥ h_s:
    h_s seconds of accumulated schedule-debt — persistent drift, not
    one tight pair. All arithmetic is BIGINT seconds; no float ties on
    any engine.

    Adds: gap_s (NULL on each key's first event), cusum_s (bigint),
    alarm (boolean), first_alarm_ts (per key; NULL when never alarmed).
    """
    order = [F.col(ts_col)]
    if tiebreak_col:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(*key_cols).orderBy(*order)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t = F.unix_timestamp(F.col(ts_col))
    gap = t - F.lag(t).over(w)
    y = F.coalesce(F.lit(k_gap_s) - gap, F.lit(0))
    cum = F.sum(y).over(wrun)
    s = cum - F.least(F.lit(0), F.min(cum).over(wrun))
    out = (
        df.withColumn("gap_s", gap.cast("long"))
        .withColumn("cusum_s", s.cast("long"))
        .withColumn("alarm", F.col("cusum_s") >= F.lit(h_s))
    )
    first = F.min(F.when(F.col("alarm"), F.col(ts_col))).over(wall)
    return out.withColumn("first_alarm_ts", first)


def cusum_oracle_sql(
    src_sql: str,
    key_expr: str,
    order_expr: str,
    select_cols: str,
    k_gap_s: int = 600,
    h_s: int = 1800,
) -> str:
    """Window-for-window SQL replay of the CUSUM running-min form."""
    return f"""
        WITH src AS ({src_sql}),
        x AS (
          SELECT *,
            cast(floor(epoch({{ts}})) AS bigint)
              - lag(cast(floor(epoch({{ts}})) AS bigint))
                  OVER (PARTITION BY {key_expr} ORDER BY {order_expr})
              AS gap_s
          FROM src),
        y AS (
          SELECT *,
            sum(coalesce({k_gap_s} - gap_s, 0))
              OVER (PARTITION BY {key_expr} ORDER BY {order_expr}
                    ROWS UNBOUNDED PRECEDING) AS cum
          FROM x),
        z AS (
          SELECT *,
            cast(cum - least(0, min(cum)
              OVER (PARTITION BY {key_expr} ORDER BY {order_expr}
                    ROWS UNBOUNDED PRECEDING)) AS bigint) AS cusum_s
          FROM y)
        SELECT {select_cols},
               cast(gap_s AS bigint) AS gap_s,
               cusum_s,
               cusum_s >= {h_s} AS alarm,
               min(CASE WHEN cusum_s >= {h_s} THEN {{ts}} END)
                 OVER (PARTITION BY {key_expr}) AS first_alarm_ts
        FROM z""".replace("{ts}", "ts")


def seasonal_baseline_anomaly(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    slot: str = "dow",
    n_mads: int = 3,
) -> DataFrame:
    """Seasonal-profile volume anomaly: a robust per-slot baseline per
    key. A log stream's volume is strongly periodic (diurnal, weekly),
    so a global 3σ test (pipeline_template_anomaly's form) either
    misses off-peak bursts or pages on every Monday peak; the
    operational fix is a baseline PER seasonal slot, and a ROBUST one
    (median + MAD) so the anomalies being hunted don't inflate their
    own threshold.

    ``slot``: "dow" = day-of-week profile over daily counts (0=Sunday,
    both engines); "hod" = hour-of-day profile over hourly counts.

    Statistic, all-integer so both engines agree bit-for-bit: counts
    c(key, day[, hour]); per (key, slot) the LOWER MEDIAN via rank
    arithmetic (the value at row ⌊(n+1)/2⌋ of the ordered slot — no
    even-count interpolation, no floats); MAD = lower median of
    |c − med|; flag c > med + n_mads·MAD.

    Scale shape: one (key, grain) aggregate over the raw stream — the
    only corpus-sized exchange; everything after runs on the grid
    (O(keys × days [× 24]) regardless of raw rows): two window passes
    for the medians and two grid-sized joins (broadcast-eligible under
    AQE).

    Returns one row per (key, day[, hour] → slot): c, med_c, mad_c,
    anomalous.
    """
    ts = F.col(ts_col)
    if slot == "dow":
        grain = [F.to_date(ts).alias("day"),
                 (F.dayofweek(ts) - 1).cast("int").alias("slot")]
    elif slot == "hod":
        grain = [F.to_date(ts).alias("day"),
                 F.hour(ts).cast("int").alias("slot")]
    else:
        raise ValueError(f"unknown slot kind: {slot!r}")
    hourly = df.groupBy(*key_cols, *grain).agg(
        F.count("*").cast("long").alias("c")
    )

    def lower_median(frame: DataFrame, val: str, out: str) -> DataFrame:
        w = Window.partitionBy(*key_cols, "slot").orderBy(val)
        wall = Window.partitionBy(*key_cols, "slot")
        return (
            frame.withColumn("rn", F.row_number().over(w))
            .withColumn("n", F.count("*").over(wall))
            .where(F.col("rn") == F.floor((F.col("n") + 1) / 2))
            .select(*key_cols, "slot", F.col(val).alias(out))
        )

    med = lower_median(hourly, "c", "med_c")
    on = [*key_cols, "slot"]
    dev = hourly.join(med, on).withColumn(
        "dev", F.abs(F.col("c") - F.col("med_c"))
    )
    mad = lower_median(dev, "dev", "mad_c")
    return (
        hourly.join(med, on).join(mad, on)
        .withColumn(
            "anomalous",
            F.col("c") > F.col("med_c") + F.lit(n_mads) * F.col("mad_c"),
        )
    )


def seasonal_oracle_sql(
    src_sql: str,
    key_expr: str,
    ts_expr: str = "ts",
    slot: str = "dow",
    n_mads: int = 3,
) -> str:
    """SQL replay: same rank-arithmetic lower medians, same grid joins.
    DuckDB's dayofweek() is already 0=Sunday — Spark's is shifted by 1
    in the operator so the slots line up."""
    slot_expr = (f"cast(dayofweek(cast({ts_expr} AS date)) AS int)"
                 if slot == "dow" else f"cast(hour({ts_expr}) AS int)")
    return f"""
        WITH src AS ({src_sql}),
        hourly AS (
          SELECT {key_expr} AS k, cast({ts_expr} AS date) AS day,
                 {slot_expr} AS slot,
                 cast(count(*) AS bigint) AS c
          FROM src GROUP BY 1, 2, 3),
        medr AS (
          SELECT k, slot, c,
                 row_number() OVER (PARTITION BY k, slot ORDER BY c) AS rn,
                 count(*) OVER (PARTITION BY k, slot) AS n
          FROM hourly),
        med AS (
          SELECT k, slot, c AS med_c FROM medr
          WHERE rn = (n + 1) // 2),
        devr AS (
          SELECT h.k, h.slot, abs(h.c - m.med_c) AS dev,
                 row_number() OVER (PARTITION BY h.k, h.slot
                                    ORDER BY abs(h.c - m.med_c)) AS rn,
                 count(*) OVER (PARTITION BY h.k, h.slot) AS n
          FROM hourly h JOIN med m ON h.k = m.k AND h.slot = m.slot),
        mad AS (
          SELECT k, slot, dev AS mad_c FROM devr
          WHERE rn = (n + 1) // 2)
        SELECT h.k, cast(h.day AS varchar) AS day, h.slot, h.c,
               m.med_c, d.mad_c,
               h.c > m.med_c + {n_mads} * d.mad_c AS anomalous
        FROM hourly h
        JOIN med m ON h.k = m.k AND h.slot = m.slot
        JOIN mad d ON h.k = d.k AND h.slot = d.slot"""


def gorilla_roundtrip(
    df: DataFrame,
    group_col: str = "conv_id",
    ts_col: str = "ts",
    val_col: str = "value",
    order_col: str = "turn_idx",
) -> DataFrame:
    """Full Gorilla block codec roundtrip (functions/gorilla.py —
    VLDB'15 §4.1 timestamps + §4.2 XOR values, real bitstream both
    directions): encode each stream in ONE applyInPandas group (the
    per-stream state is strictly sequential — the shape Spark cannot
    parallelize inside a stream; streams fan out across the cluster),
    then decode the blobs back in mapInPandas and explode to points.

    Returns (group, rn, t_s, value, n_points, comp_bytes): the decoded
    points in stream order plus the stream's compressed size. The
    roundtrip identity (decoded == source, both timestamps and float64
    values BIT-exact) is the oracle's value gate; the bit-exact sizing
    is pinned in pytest against functions/gorilla.sizing_bits and the
    gorilla_ts_bits bucket accounting above.
    """
    import pandas as pd

    from hatchery_spark.functions.gorilla import decode_series, encode_series

    src = df.select(
        F.col(group_col).alias("g"),
        F.col(ts_col).alias("ts_full"),
        F.unix_timestamp(F.col(ts_col)).alias("t_s"),
        F.col(val_col).cast("double").alias("v"),
        F.col(order_col).alias("o"),
    )

    def enc(batches) -> "pd.DataFrame":
        # one vectorized pandas groupby per partition instead of one
        # applyInPandas call per stream: the per-group pandas-frame setup
        # dominated encode wall time at thousands of tiny streams; the
        # bitstream itself stays strictly sequential per stream.
        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        pdf = pdf.sort_values(["g", "ts_full", "o"], kind="mergesort")
        gs, ns, blobs_out = [], [], []
        for g, grp in pdf.groupby("g", sort=False):
            blob = encode_series(
                [int(t) for t in grp["t_s"]], [float(x) for x in grp["v"]]
            )
            gs.append(g)
            ns.append(len(grp))
            blobs_out.append(blob)
        yield pd.DataFrame({"g": gs, "n_points": ns, "blob": blobs_out})

    blobs = src.repartition("g").mapInPandas(
        enc, "g string, n_points long, blob binary"
    )

    def dec(batches):
        for b in batches:
            out = []
            for g, n, blob in zip(b["g"], b["n_points"], b["blob"]):
                wire = bytes(blob)
                ts, vals = decode_series(wire)
                if len(ts) != n:
                    raise ValueError("decoded point count mismatch")
                for i, (t, v) in enumerate(zip(ts, vals)):
                    out.append((g, i + 1, t, v, int(n), len(wire)))
            yield pd.DataFrame(
                out, columns=["g", "rn", "t_s", "value", "n_points",
                              "comp_bytes"],
            )

    return blobs.mapInPandas(
        dec,
        "g string, rn long, t_s long, value double, n_points long, "
        "comp_bytes long",
    )


def first_seen_novelty(
    df: DataFrame,
    actor_col: str,
    entity_col: str,
    ts_col: str = "ts",
) -> DataFrame:
    """First-seen (actor, entity) novelty rollup — the SOC primitive
    behind "first time this service account touched that resource"
    alerts (reference analog: hatchery routes auth events to dedicated
    sinks, pipeline/config wiring; the detection itself runs downstream
    at Spark scale).

    Per (actor, day): ``events`` (row count), ``active_pairs`` (distinct
    entities touched), ``new_pairs`` (entities whose corpus-wide FIRST
    occurrence for this actor lands on that day). A lateral-movement or
    scanning burst shows up as new_pairs spiking against a stable
    active_pairs baseline.

    Plan shape: ONE (actor, entity, day) aggregate over the raw stream
    (map-side combinable — the only corpus-sized exchange), a min-window
    on its (actor, entity) prefix for the first day, then an (actor,
    day) re-aggregate on the already-reduced frame. No joins, no
    row-wise Python; all counts BIGINT, days DATE — nothing for two
    engines to disagree on.
    """
    day = F.to_date(F.col(ts_col)).alias("day")
    daily = df.groupBy(actor_col, entity_col, day).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.partitionBy(actor_col, entity_col)
    with_first = daily.withColumn("first_day", F.min("day").over(w))
    return (
        with_first.groupBy(actor_col, "day")
        .agg(
            F.sum("n").cast("long").alias("events"),
            F.count(F.lit(1)).cast("long").alias("active_pairs"),
            F.sum(
                F.when(F.col("day") == F.col("first_day"), 1).otherwise(0)
            ).cast("long").alias("new_pairs"),
        )
    )


def first_seen_oracle_sql(
    src_sql: str,
    actor_expr: str,
    entity_expr: str,
    ts_expr: str = "ts",
) -> str:
    """DuckDB replay: identical aggregate → min-window → re-aggregate."""
    return f"""
        WITH src AS ({src_sql}),
        daily AS (
          SELECT {actor_expr} AS actor, {entity_expr} AS entity,
                 cast({ts_expr} AS date) AS day,
                 cast(count(*) AS bigint) AS n
          FROM src GROUP BY 1, 2, 3),
        wf AS (
          SELECT *, min(day) OVER (PARTITION BY actor, entity) AS first_day
          FROM daily)
        SELECT actor, day,
               cast(sum(n) AS bigint) AS events,
               cast(count(*) AS bigint) AS active_pairs,
               cast(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END)
                    AS bigint) AS new_pairs
        FROM wf GROUP BY actor, day"""
