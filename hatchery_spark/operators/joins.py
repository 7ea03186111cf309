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


# ------------------------------------------------------------- bloom join


def build_key_bloom(
    keys: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    k_hashes: int = 3,
    build_partitions: int = 8,
) -> "np.ndarray":
    """Distributed Bloom-bitmap build over a JOIN-KEY column (the key-level
    sibling of dedup.build_bloom_bitmap's n-gram build): each task ORs its
    distinct keys' bits into a local m-bit bitmap and emits ONE binary row;
    the driver ORs O(build_partitions) bitmaps — driver traffic is
    partitions × m/8 bytes regardless of key count. Hashing is the repo's
    md5-slice scheme (dedup._bloom_positions), so k ≤ 4.
    """
    import numpy as np
    import pandas as pd

    from hatchery_spark.functions.dedup import _bloom_positions

    nbytes = (m_bits + 7) // 8

    def _partial(batches):
        bm = np.zeros(nbytes, dtype=np.uint8)
        seen: set[str] = set()
        for b in batches:
            seen.update(b[key_col].dropna().astype(str))
        if seen:
            pos = _bloom_positions(sorted(seen), m_bits, k_hashes).ravel()
            np.bitwise_or.at(bm, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        yield pd.DataFrame({"bm": [bm.tobytes()]})

    parts = (
        keys.select(F.col(key_col).cast("string").alias(key_col))
        .coalesce(build_partitions)
        .mapInPandas(_partial, "bm binary")
        .toPandas()
    )
    if len(parts) == 0:
        return np.zeros(nbytes, dtype=np.uint8)
    return np.bitwise_or.reduce(
        np.stack([np.frombuffer(b, dtype=np.uint8) for b in parts["bm"]]), axis=0
    )


def bloom_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    m_bits: int = 1 << 20,
    k_hashes: int = 3,
) -> DataFrame:
    """Bloom-prefiltered inner equi-join — the runtime-row-filter pattern
    (Spark's own InjectRuntimeFilter / Bloom-join optimization, rebuilt
    explicitly because the expression is not in the public registry): the
    small side's join keys are folded into an m-bit Bloom bitmap
    (distributed OR build, O(partitions) driver rows), broadcast once, and
    the big side is pre-filtered in ONE zero-shuffle Arrow scan BEFORE its
    exchange — at 100 TB the win is that only may-match rows (true matches
    + the (1−e^{−kn/m})^k false-positive sliver) pay the shuffle, not the
    whole fact table. Bloom filters have NO false negatives and the exact
    join removes every false positive, so the result EQUALS the plain join
    row-for-row at any m — which is exactly what the oracle checks.

    Reference analog: hatchery's enrich joins each stream against small
    side state (pkg/usecase/enrich.go:24); this is that join armed for the
    case where the big side must shuffle.
    """
    import numpy as np
    import pandas as pd

    from hatchery_spark.functions.dedup import _bloom_positions

    spark = big.sparkSession
    bitmap = build_key_bloom(small.select(small_key), small_key, m_bits, k_hashes)
    bc = spark.sparkContext.broadcast(bitmap)
    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in big.schema.fields
    )

    def _probe(batches):
        bm = bc.value
        for b in batches:
            ks = b[big_key].astype(str)
            uniq = ks.drop_duplicates()
            pos = _bloom_positions(list(uniq), m_bits, k_hashes)
            ok = ((bm[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1).all(axis=1)
            hit = pd.Series(ok, index=uniq)
            yield b[ks.map(hit).to_numpy(dtype=bool) & b[big_key].notna().to_numpy()]

    filtered = big.mapInPandas(_probe, fields)
    return filtered.join(small, filtered[big_key] == small[small_key])
