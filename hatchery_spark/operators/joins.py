"""Temporal join operators Spark lacks natively: as-of join and range join.

Both are built from compositions of existing DataFrame ops (SURVEY.md's
custom-operator rule (a)) — no Pandas UDFs, no per-key explosion:

  * as_of_join — for each left row, the most recent right row with
    right.ts <= left.ts for the same key. Implemented as the tagged-union /
    last-non-null-window pattern: ONE shuffle on the key, state flows through
    a running window instead of a non-equi join. This is the scalable shape —
    a naive `l JOIN r ON l.key = r.key AND r.ts <= l.ts` + argmax explodes
    quadratically per key.
  * range_join_binned — event-in-interval join without an equi key. Intervals
    are exploded into fixed time bins and events join on their bin (hash
    join), then the exact BETWEEN filter prunes bin edges. Bin width trades
    duplication factor (interval_len/bin) against candidate selectivity.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_INTERVAL_UNITS = {"second": 1, "minute": 60, "hour": 3600, "day": 86400, "week": 604800}


def interval_seconds(interval: str) -> int:
    """Parse 'N unit' (e.g. '2 hours', '30 minutes') into whole seconds."""
    m = re.fullmatch(r"\s*(\d+)\s+(second|minute|hour|day|week)s?\s*", interval)
    if not m:
        raise ValueError(f"unsupported interval: {interval!r}")
    return int(m.group(1)) * _INTERVAL_UNITS[m.group(2)]


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    tolerance: str | None = None,
    salt_buckets: int | None = None,
) -> DataFrame:
    """Left as-of join: latest right values at-or-before each left timestamp.

    Output: all left columns + value_cols (NULL when no right row precedes).
    tolerance: optional max lookback (e.g. '1 hour') — matches older than
    left_ts − tolerance are nulled out.

    salt_buckets: whale-key guard. The window sorts each key's rows in ONE
    task, so a key holding half the corpus becomes a straggler. With salting,
    LEFT rows spread across `salt_buckets` sub-partitions (deterministic hash
    of the left timestamp) and RIGHT rows replicate to every bucket, so each
    (key, salt) window still sees the full right-side state but only
    1/salt_buckets of the whale's left rows — identical output, straggler
    split ~salt_buckets ways. Cost: right side duplicated ×salt_buckets;
    leave unset unless key skew is real.
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (key, right_ts)]

    payload = F.struct(F.col(right_ts).alias("_rts"), *[F.col(c) for c in value_cols])
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),  # rights sort before a left row at equal ts
        payload.alias("_rv"),
    )
    l_cols = left.columns
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_rv"].dataType).alias("_rv"),
        *[F.col(c).alias(f"_l_{c}") for c in l_cols],
    )
    r_aligned = r.select(
        "_k", "_ts", "_side", "_rv",
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
            for c in l_cols
        ],
    )
    if salt_buckets and salt_buckets > 1:
        l = l.withColumn("_salt", F.pmod(F.xxhash64(F.col("_ts")), F.lit(salt_buckets)))
        r_aligned = r_aligned.withColumn(
            "_salt",
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.lit(salt_buckets - 1).cast("long"))
            ),
        )
        part_cols = ["_k", "_salt"]
    else:
        part_cols = ["_k"]
    unioned = l.unionByName(r_aligned, allowMissingColumns=False)
    w = (
        Window.partitionBy(*part_cols)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn("_last_rv", F.last("_rv", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1)
    if tolerance is not None:
        fresh = F.col("_last_rv._rts") >= F.col("_ts") - F.expr(f"interval {tolerance}")
        out = out.withColumn("_last_rv", F.when(fresh, F.col("_last_rv")))
    return out.select(
        *[F.col(f"_l_{c}").alias(c) for c in l_cols],
        *[F.col(f"_last_rv.{c}").alias(c) for c in value_cols],
    )


def range_join_binned(
    events: DataFrame,
    intervals: DataFrame,
    event_ts: str = "ts",
    start_col: str = "window_start",
    end_col: str = "window_end",
    bin_width: str = "1 hour",
) -> DataFrame:
    """Join events to enclosing intervals via time-bin bucketing + exact filter.

    Returns events ⋈ intervals rows where start <= ts <= end. Both sides key
    on their bin(s): intervals explode to every bin they overlap, events map
    to one bin — the join is a plain hash join on the bin timestamp.

    The bin grid is floor(epoch / W) * W with W = bin_width seconds, derived
    identically on BOTH sides — any bin_width puts events and interval bins on
    the same grid (a fixed date_trunc here would silently drop matches for
    widths that don't divide its unit).
    """
    w = interval_seconds(bin_width)

    def to_bin(col):
        # cast: parquet TIMESTAMP_NTZ → TIMESTAMP is a pure reinterpretation
        # under the session's fixed UTC timezone
        return F.timestamp_seconds(
            F.floor(F.unix_timestamp(col.cast("timestamp")) / w) * w
        )

    iv_bins = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                to_bin(F.col(start_col)),
                to_bin(F.col(end_col)),
                F.expr(f"interval {w} seconds"),
            )
        ),
    )
    ev_bins = events.withColumn("_bin", to_bin(F.col(event_ts)))
    return (
        ev_bins.join(iv_bins, on="_bin")
        .filter(F.col(event_ts).between(F.col(start_col), F.col(end_col)))
        .drop("_bin")
    )
