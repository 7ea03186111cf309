"""Misra-Gries heavy-hitter summaries (operators/sketches.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hatchery_spark.operators.sketches import mg_merge_all, mg_sketch


def _rows(spark, spec: dict[str, int], shards: int = 3):
    """spec: key -> count; rows spread round-robin over shards."""
    data = []
    i = 0
    for k, n in spec.items():
        for _ in range(n):
            data.append((k, i % shards))
            i += 1
    return spark.createDataFrame(data, "key string, shard int")


SPEC = {
    "whale": 300,
    "big": 120,
    "mid": 40,
    **{f"tail{i}": 3 for i in range(30)},
}


def _merged(spark, k):
    df = _rows(spark, SPEC)
    sk = mg_sketch(df, F.col("key"), F.col("shard"), k=k)
    return {
        r["key"]: (r["est"], r["deficit"])
        for r in mg_merge_all(sk, k=k).collect()
    }


def test_sandwich_bound_on_survivors(spark):
    got = _merged(spark, k=4)
    for key, (est, deficit) in got.items():
        true = SPEC[key]
        assert est <= true <= est + deficit, (key, est, deficit, true)


def test_dropped_keys_bounded_by_deficit(spark):
    got = _merged(spark, k=4)
    deficit = next(iter(got.values()))[1]
    for key, true in SPEC.items():
        if key not in got:
            assert true <= deficit, (key, true, deficit)


def test_guaranteed_heavy_hitter_survives(spark):
    # MG guarantee: any key with true > N/(k+1) per shard chain survives;
    # the whale holds 60%+ of all rows and must be present at tiny k
    got = _merged(spark, k=2)
    assert "whale" in got
    est, deficit = got["whale"]
    assert est <= SPEC["whale"] <= est + deficit


def test_exact_when_k_exceeds_cardinality(spark):
    # no rank cut ever fires → deficit 0 and every estimate exact
    got = _merged(spark, k=64)
    deficit = next(iter(got.values()))[1]
    assert deficit == 0
    assert {k: e for k, (e, _) in got.items()} == SPEC


def test_sketch_size_bounded(spark):
    df = _rows(spark, SPEC, shards=3)
    sk = mg_sketch(df, F.col("key"), F.col("shard"), k=4)
    per_shard = {
        r["shard"]: r["n"]
        for r in sk.groupBy("shard").agg(F.count("*").alias("n")).collect()
    }
    assert all(n <= 4 for n in per_shard.values())
