"""Seasonal (day-of-week) robust baseline anomaly detection."""

from __future__ import annotations

from datetime import datetime, timedelta

from hatchery_spark.operators.telemetry import seasonal_baseline_anomaly


def _rows(spark, events):
    return spark.createDataFrame(events, "k string, ts timestamp")


def test_planted_spike_flags_only_spike_day(spark):
    base = datetime(2024, 1, 1)  # a Monday
    events = []
    # 8 weeks of steady Mondays (3/day) and Tuesdays (5/day)
    for week in range(8):
        for i in range(3):
            events.append(("svc", base + timedelta(weeks=week, hours=i)))
        for i in range(5):
            events.append(("svc", base + timedelta(weeks=week, days=1,
                                                   hours=i)))
    # spike: week 4's Monday gets 40 extra events
    for i in range(40):
        events.append(("svc", base + timedelta(weeks=4, minutes=i)))
    out = seasonal_baseline_anomaly(_rows(spark, events), ["k"], slot="dow")
    got = {(r.day.isoformat(), r.slot): r for r in out.collect()}
    spike_day = (base + timedelta(weeks=4)).date().isoformat()
    for (day, slot), r in got.items():
        if day == spike_day:
            assert r.anomalous and r.c == 43
        else:
            # steady days: med == c, MAD == 0 except the slot holding
            # the spike (its median is still the steady 3)
            assert not r.anomalous, (day, slot, r)
    # slot baselines are per-dow: Tuesday median 5, Monday median 3
    mon = next(r for (d, s), r in got.items()
               if s == 1 and d != spike_day)
    tue = next(r for (d, s), r in got.items() if s == 2)
    assert mon.med_c == 3 and tue.med_c == 5


def test_lower_median_even_count_is_integer(spark):
    base = datetime(2024, 3, 3)  # a Sunday
    events = []
    # four Sundays with counts 1,2,3,4 → lower median = 2
    for week, n in enumerate([1, 2, 3, 4]):
        for i in range(n):
            events.append(("x", base + timedelta(weeks=week, hours=i)))
    out = seasonal_baseline_anomaly(_rows(spark, events), ["k"], slot="dow")
    rows = out.collect()
    assert all(r.med_c == 2 for r in rows)
    # devs |1-2|,|2-2|,|3-2|,|4-2| = 1,0,1,2 → sorted 0,1,1,2 → lower med 1
    assert all(r.mad_c == 1 for r in rows)


def test_hod_slot_variant(spark):
    base = datetime(2024, 6, 1, 0, 0)
    events = []
    for day in range(10):
        for i in range(2):  # steady 2/hour at 09:00
            events.append(("h", base + timedelta(days=day, hours=9,
                                                 minutes=i)))
    for i in range(30):  # burst on day 5 at 09:00
        events.append(("h", base + timedelta(days=5, hours=9,
                                             seconds=30 + i)))
    out = seasonal_baseline_anomaly(_rows(spark, events), ["k"], slot="hod")
    flagged = [r for r in out.collect() if r.anomalous]
    assert len(flagged) == 1
    assert flagged[0].day.isoformat() == "2024-06-06" and flagged[0].slot == 9
