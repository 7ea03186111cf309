"""Beacon-interval detection and HDR-histogram quantiles."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from hatchery_spark.operators.sketches import hdr_buckets, hdr_quantiles
from hatchery_spark.operators.telemetry import beacon_intervals

T0 = dt.datetime(2024, 1, 1)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, event_type string, event_id bigint, ts timestamp"
    )


def test_regular_beacon_flagged(spark):
    # implant: exactly 60 s apart → zero variance → cv2_permille = 0
    rows = [(1, "poll", i, T0 + dt.timedelta(seconds=60 * i)) for i in range(10)]
    out = beacon_intervals(_events(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_gaps == 9 and r.cv2_permille == 0 and r.is_beacon == 1


def test_jittered_beacon_still_flagged(spark):
    # 60 s ± 5 s deterministic jitter → CV well under the 0.25 CV² gate
    rows = [
        (1, "poll", i, T0 + dt.timedelta(seconds=60 * i + (i % 3 - 1) * 5))
        for i in range(20)
    ]
    out = beacon_intervals(_events(spark, rows)).collect()
    assert out[0].is_beacon == 1 and 0 < out[0].cv2_permille < 250


def test_human_traffic_not_flagged(spark):
    # bursty gaps: 1 s, 1 s, 3600 s repeating → huge CV²
    gaps = [1, 1, 3600] * 4
    ts, acc = [], 0
    for g in gaps:
        acc += g
        ts.append(acc)
    rows = [(2, "click", i, T0 + dt.timedelta(seconds=s)) for i, s in enumerate(ts)]
    out = beacon_intervals(_events(spark, rows)).collect()
    assert out[0].is_beacon == 0 and out[0].cv2_permille > 250


def test_short_streams_excluded(spark):
    rows = [(3, "poll", i, T0 + dt.timedelta(seconds=60 * i)) for i in range(4)]
    # 4 events → 3 gaps < min_intervals=4
    assert beacon_intervals(_events(spark, rows)).count() == 0


def _vals(spark, vals):
    return spark.createDataFrame([(int(v),) for v in vals], "v bigint").select(
        F.lit("g").alias("g"), "v"
    )


def test_hdr_bucket_bounds(spark):
    vals = [1, 7, 15, 16, 17, 100, 1000, 123456, 2**40 + 12345]
    b = hdr_buckets(_vals(spark, vals), F.col("v"), ["g"]).collect()
    # every stored value must fall inside a bucket with bounded rel. error
    total = sum(r.c for r in b)
    assert total == len(vals)
    for r in b:
        assert r.lo <= r.hi
        width = r.hi - r.lo + 1
        if r.lo >= 16:
            assert width <= max(1, r.lo // 8)  # 2^-3 relative error
        else:
            assert width == 1  # exact unit buckets below 2^(s+1)


def test_hdr_quantiles_accuracy(spark):
    vals = list(range(1, 1001))
    b = hdr_buckets(_vals(spark, vals), F.col("v"), ["g"])
    q = hdr_quantiles(b, ["g"]).collect()[0]
    assert q.n == 1000
    for est, true in ((q.p500_est, 500), (q.p900_est, 900), (q.p990_est, 990)):
        assert abs(est - true) <= true / 8 + 1


def test_hdr_merge_equals_rebuild(spark):
    a = list(range(1, 501))
    bvals = list(range(400, 1200))
    ba = hdr_buckets(_vals(spark, a), F.col("v"), ["g"])
    bb = hdr_buckets(_vals(spark, bvals), F.col("v"), ["g"])
    merged = (
        ba.unionAll(bb)
        .groupBy("g", "lo", "hi")
        .agg(F.sum("c").alias("c"))
    )
    direct = hdr_buckets(_vals(spark, a + bvals), F.col("v"), ["g"])
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    qm = hdr_quantiles(merged, ["g"]).collect()[0]
    qd = hdr_quantiles(direct, ["g"]).collect()[0]
    assert qm == qd
