"""Rendezvous (highest-random-weight) sharding — deterministic key→shard
assignment with MINIMAL MOVEMENT under resharding (Thaler & Ravishankar
1996, the scheme behind consistent request routing and shard-map changes
in log pipelines): shard(key, N) = argmax over s<N of hash(key, s).

Growing N→N+1 moves exactly the keys whose new shard wins the argmax —
an expected 1/(N+1) fraction — where a modulo map (key % N) moves ~N/(N+1)
of all keys, invalidating caches / local state for nearly the whole fleet.

Why it matters here: hatchery routes messages to destinations by static
config (pipeline/destination wiring); at 10^12 turns the *placement* of
per-conversation state across workers is itself an operator, and rebalance
cost is dominated by how many keys move.

Scale shape: the winner is a PURE CODEGEN expression — an array of
(md5(key:s), s) structs reduced with array_max (struct ordering = hash
first) — no explode, no join, no shuffle, no UDF; cost is O(N) hashes per
row with N a config constant. md5 (not xxhash64) keeps every assignment
engine-replayable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["rendezvous_shard", "rendezvous_reshard"]


def rendezvous_shard(key: Column, n_shards: int) -> Column:
    """HRW winner for ``key`` among shards 0..n_shards-1 as an int column."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    cands = [
        F.struct(
            F.md5(F.concat(key.cast("string"), F.lit(f":{s}"))).alias("h"),
            F.lit(s).alias("s"),
        )
        for s in range(n_shards)
    ]
    return F.array_max(F.array(*cands))["s"].cast("int")


def rendezvous_reshard(
    df: DataFrame, key_col: str, n_before: int, n_after: int
) -> DataFrame:
    """Per distinct key: shard under ``n_before`` and ``n_after`` shards and
    whether the key moves. One distinct() exchange; everything else is
    codegen. Returns (key, shard_before, shard_after, moved)."""
    keys = df.select(F.col(key_col).alias("key")).distinct()
    return keys.select(
        "key",
        rendezvous_shard(F.col("key"), n_before).alias("shard_before"),
        rendezvous_shard(F.col("key"), n_after).alias("shard_after"),
    ).withColumn("moved", F.col("shard_before") != F.col("shard_after"))
