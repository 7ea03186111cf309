"""Telemetry guardrail operators: per-key rate caps and anomaly scores.

Log pipelines at 10^12 rows need flow control and outlier triage BEFORE
storage: a runaway client or misconfigured agent can emit millions of
near-identical events per hour (the reference throttles at the source API
level via its per-source schedules, pkg/config/range.go; at Spark scale the
equivalent guard runs inside the job).

Both operators are single-window / single-aggregate plans — one hash
shuffle on the grouping key, WindowGroupLimit partials where a rank cut
exists, no Python anywhere.
"""

from __future__ import annotations

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
