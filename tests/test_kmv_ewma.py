"""KMV distinct sketch + EWMA burst detection."""

from __future__ import annotations

from pyspark.sql import functions as F

from hatchery_spark.operators.sketches import (
    kmv_estimate,
    kmv_merge,
    kmv_sketch,
)
from hatchery_spark.operators.telemetry import ewma_spikes


def _keys(spark, n, grp="g1"):
    return spark.range(n).select(
        F.lit(grp).alias("g"), F.concat(F.lit("k"), F.col("id")).alias("k")
    )


def test_kmv_exact_below_k(spark):
    sk = kmv_sketch(_keys(spark, 10), F.col("k"), ["g"], k=64)
    r = kmv_estimate(sk, ["g"], k=64).first()
    assert r["sketch_n"] == 10 and r["est_distinct"] == 10


def test_kmv_estimator_accuracy(spark):
    n = 5000
    sk = kmv_sketch(_keys(spark, n), F.col("k"), ["g"], k=128)
    r = kmv_estimate(sk, ["g"], k=128).first()
    assert r["sketch_n"] == 128
    # (k−1)/h_k estimator: relative error ~1/√k ≈ 9%; allow 3σ
    assert abs(r["est_distinct"] - n) / n < 0.27


def test_kmv_duplicates_dont_inflate(spark):
    df = _keys(spark, 20).union(_keys(spark, 20))  # every key twice
    r = kmv_estimate(kmv_sketch(df, F.col("k"), ["g"], k=64), ["g"], k=64).first()
    assert r["est_distinct"] == 20


def test_kmv_merge_equals_union_sketch(spark):
    a = _keys(spark, 300)
    b = spark.range(200, 600).select(
        F.lit("g1").alias("g"), F.concat(F.lit("k"), F.col("id")).alias("k")
    )
    k = 32
    merged = kmv_merge(
        kmv_sketch(a, F.col("k"), ["g"], k),
        kmv_sketch(b, F.col("k"), ["g"], k),
        ["g"],
        k,
    )
    direct = kmv_sketch(a.unionByName(b), F.col("k"), ["g"], k)
    assert sorted(r["h"] for r in merged.collect()) == sorted(
        r["h"] for r in direct.collect()
    )


def _events(spark, counts):
    """counts: list of per-hour event counts, hours consecutive from 00:00."""
    rows = []
    for h, c in enumerate(counts):
        rows += [(f"2024-01-01 {h:02d}:{m % 60:02d}:00",) for m in range(c)]
    return spark.createDataFrame(rows, "ts string").select(
        F.lit("svc").alias("g"), F.col("ts").cast("timestamp").alias("ts")
    )


def test_ewma_flags_burst_not_steady(spark):
    df = _events(spark, [10, 10, 10, 10, 10, 10, 200])
    out = {r["bucket_ts"].hour: r for r in ewma_spikes(df, ["g"]).collect()}
    assert out[6]["spike"] is True
    assert all(not out[h]["spike"] for h in range(6))


def test_ewma_cold_start_never_flags(spark):
    # huge first buckets, but fewer than min_history predecessors
    df = _events(spark, [500, 500, 1, 500])
    out = ewma_spikes(df, ["g"]).collect()
    assert all(not r["spike"] for r in out)


def test_ewma_is_integer_exact(spark):
    df = _events(spark, [3, 5, 7, 11, 13, 17])
    r = {x["bucket_ts"].hour: x for x in ewma_spikes(df, ["g"]).collect()}
    # hand-computed Σ wᵢ·lagᵢ at hour 5: 128·13+64·11+32·7+16·5+8·3
    assert r[5]["ewma_scaled"] == 128 * 13 + 64 * 11 + 32 * 7 + 16 * 5 + 8 * 3
    assert r[0]["ewma_scaled"] == 0
