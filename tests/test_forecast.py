"""Holt linear-trend forecasting (operators/forecast.py)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from hatchery_spark.operators.forecast import SCALE, holt_forecast

D0 = datetime.date(2024, 1, 1)


def _events(spark, daily: dict[str, list[int]]):
    rows = []
    for actor, counts in daily.items():
        for d, n in enumerate(counts):
            for _ in range(n):
                rows.append((actor, D0 + datetime.timedelta(days=d)))
    return spark.createDataFrame(rows, "actor string, day date")


def _run(spark, daily):
    df = _events(spark, daily)
    out = holt_forecast(df, F.col("actor"), F.col("day"))
    return {
        (r["actor"], r["day_idx"]): r for r in out.collect()
    }


def _ref_holt(ys):
    """Reference python fold — floor-div-by-2 recurrences."""
    l, b = ys[0] * SCALE, 0
    path = [(ys[0] * SCALE, ys[0] * SCALE)]  # (y, fc)
    for y in ys[1:]:
        y *= SCALE
        fc = l + b
        lnew = (y + l + b) // 2
        b = (lnew - l + b) // 2
        l = lnew
        path.append((y, fc))
    return path


def test_matches_reference_fold(spark):
    daily = {"a": [4, 6, 8, 10, 12, 14], "b": [5, 5, 5, 5, 5, 5]}
    got = _run(spark, daily)
    for actor, ys in daily.items():
        for d, (y, fc) in enumerate(_ref_holt(ys)):
            r = got[(actor, d)]
            assert r["forecast_fp"] == fc, (actor, d)
            assert r["resid_fp"] == y - fc


def test_trend_is_learned_not_alerted(spark):
    # a steady linear ramp: Holt's trend term tracks it, so residuals
    # shrink and the relative alert stays quiet after warm-up
    got = _run(spark, {"ramp": [10, 12, 14, 16, 18, 20, 22, 24]})
    late = [r for (a, d), r in got.items() if d >= 4]
    assert all(not r["alert"] for r in late)


def test_step_spike_alerts(spark):
    got = _run(spark, {"s": [5, 5, 5, 5, 5, 40, 5]})
    assert got[("s", 5)]["alert"]          # the spike day
    assert not got[("s", 1)]["alert"]


def test_zero_fill_missing_days(spark):
    # actor quiet on day 1 — grid must zero-fill, not skip
    got = _run(spark, {"q": [6, 0, 6]})
    assert got[("q", 1)]["y_n"] == 0
    assert ("q", 2) in got


def test_negative_trend_stays_exact(spark):
    # decaying series drives the trend negative; floor-div identity must
    # agree with the python reference on negatives (the last day keeps a
    # row — the grid spans min..max OBSERVED day)
    ys = [40, 30, 20, 10, 5, 2, 1, 1]
    got = _run(spark, {"d": ys})
    for d, (y, fc) in enumerate(_ref_holt(ys)):
        assert got[("d", d)]["forecast_fp"] == fc
