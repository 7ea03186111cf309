"""Time-range generation + per-run window bounds.

Semantics rebuilt from the reference's batch time axis:
  * Range.Generate — yields start, start+tick, … ≤ end; single shot when tick=0
    (/root/reference/pkg/config/range.go:62-75)
  * per-run window [end−duration, end] pushed down to the source
    (/root/reference/source/slack/slack.go:120-126)
  * ctx-injected logical "as-of" time, never wall clock
    (/root/reference/pkg/timestamp/timestamp.go:11-21) → run_ts is always an
    explicit parameter here; nothing in the package calls now().

Driver-side `generate_ticks` feeds one pipeline run per tick; `ticks_df` is the
distributed/SQL-expressible equivalent (sequence + explode). `window_filter` is a
plain `ts BETWEEN` predicate, so Catalyst pushes it to parquet row-group /
partition pruning — the rebuild's analog of the reference turning the window into
API query params.
"""

from __future__ import annotations

from datetime import datetime, timedelta
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def generate_ticks(start: datetime, end: datetime, tick: timedelta) -> Iterator[datetime]:
    """start, start+tick, … while ≤ end; [start] alone when tick is zero."""
    if end < start:
        raise ValueError("time range: end before start")
    if tick.total_seconds() < 0:
        raise ValueError("time range: negative tick")
    if tick.total_seconds() == 0:
        yield start
        return
    t = start
    while t <= end:
        yield t
        t = t + tick


def ticks_df(
    spark: SparkSession, start: str, end: str, tick_interval: str
) -> DataFrame:
    """Distributed tick generator: sequence(start, end, interval) + explode."""
    return spark.range(1).select(
        F.explode(
            F.sequence(
                F.to_timestamp(F.lit(start)),
                F.to_timestamp(F.lit(end)),
                F.expr(f"interval {tick_interval}"),
            )
        ).alias("tick")
    )


def window_filter(df: DataFrame, run_ts: str, window: str = "10 minutes") -> DataFrame:
    """Rows with ts in [run_ts − window, run_ts] — pushdown-friendly predicate.

    Default window mirrors the reference's 10-minute poll duration
    (/root/reference/source/slack/slack.go:45).
    """
    end = F.to_timestamp(F.lit(run_ts))
    start = end - F.expr(f"interval {window}")
    return df.filter(F.col("ts").between(start, end))
