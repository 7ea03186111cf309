"""CUSUM rate-shift detection vs a literal sequential reference."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from hatchery_spark.operators.telemetry import cusum_rate_shift

K, H = 600, 1800


def _sequential_cusum(gaps: list[int | None]) -> list[int]:
    """Page's recurrence, as written: S_i = max(0, S_{i-1} + (k - gap))."""
    s, out = 0, []
    for g in gaps:
        y = 0 if g is None else K - g
        s = max(0, s + y)
        out.append(s)
    return out


def test_closed_form_matches_recurrence(spark):
    base = datetime(2024, 5, 1, 0, 0, 0)
    # on-schedule, then a burst (gap 60s << k=600), then recovery
    gaps = [None, 700, 650, 60, 60, 60, 60, 60, 5000, 700]
    ts, t = [], base
    for g in gaps:
        t = t + timedelta(seconds=g or 0)
        ts.append(t)
    rows = [("a1", i, ts[i]) for i in range(len(gaps))]
    df = spark.createDataFrame(rows, "actor string, seq int, ts timestamp")
    got = (
        cusum_rate_shift(df, ["actor"], k_gap_s=K, h_s=H, tiebreak_col="seq")
        .orderBy("seq")
        .collect()
    )
    expect = _sequential_cusum(gaps)
    assert [r.cusum_s for r in got] == expect
    assert [r.alarm for r in got] == [s >= H for s in expect]
    # the burst must alarm (4 × 540s of debt > 1800) and drain after
    assert any(r.alarm for r in got)
    first = min(r.ts for r in got if r.alarm)
    assert all(r.first_alarm_ts == first for r in got)


def test_steady_stream_never_alarms(spark):
    base = datetime(2024, 5, 1)
    rows = [("b", i, base + timedelta(seconds=700 * i)) for i in range(50)]
    df = spark.createDataFrame(rows, "actor string, seq int, ts timestamp")
    got = cusum_rate_shift(df, ["actor"], k_gap_s=K, h_s=H,
                           tiebreak_col="seq").collect()
    assert all(r.cusum_s == 0 for r in got)
    assert all(r.first_alarm_ts is None for r in got)


def test_keys_are_independent(spark):
    base = datetime(2024, 5, 1)
    fast = [("fast", i, base + timedelta(seconds=10 * i)) for i in range(30)]
    slow = [("slow", i, base + timedelta(seconds=900 * i)) for i in range(30)]
    df = spark.createDataFrame(
        fast + slow, "actor string, seq int, ts timestamp"
    )
    got = cusum_rate_shift(df, ["actor"], k_gap_s=K, h_s=H,
                           tiebreak_col="seq")
    agg = {r.actor: r for r in
           got.groupBy("actor").agg(F.max("alarm").alias("a")).collect()}
    assert agg["fast"].a is True and agg["slow"].a is False
