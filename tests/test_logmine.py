"""Drain-style log template mining."""

from __future__ import annotations

from hatchery_spark.operators.logmine import mine_log_templates


def _templates(spark, msgs):
    df = spark.createDataFrame([(m,) for m in msgs], "text string")
    return {
        r.template: (r.n_messages, r.n_buckets)
        for r in mine_log_templates(df).collect()
    }


def test_digit_mask_and_positionwise_merge(spark):
    got = _templates(spark, [
        "connect from 10.0.0.1 port 22",
        "connect from 10.0.0.9 port 443",
        "connect from 172.16.0.4 port 80",
        "disk full on /var",
        "disk full on /home",
    ])
    # ip/port tokens carry digits -> masked in stage 1; the /var vs /home
    # split is digit-free, so only the position-wise merge wildcards it
    assert got["connect from <*> port <*>"] == (3, 1)
    assert got["disk full on <*>"] == (2, 1)


def test_distinct_shapes_stay_separate(spark):
    got = _templates(spark, [
        "user alice logged in",
        "user bob logged in",
        "user alice logged out",   # same bucket (4, 'user') -> merges pos 4
        "cache flush complete",
    ])
    assert got["user <*> logged <*>"] == (3, 1)
    assert got["cache flush complete"] == (1, 1)


def test_buckets_with_equal_templates_are_summed(spark):
    # same first token, different token counts -> different buckets, and
    # the (5-token) bucket keeps its extra literal tail
    got = _templates(spark, [
        "job 1 done",
        "job 2 done",
        "job 3 done now ok",
    ])
    assert got["job <*> done"] == (2, 1)
    assert got["job <*> done now ok"] == (1, 1)


def test_single_message_is_its_own_template(spark):
    got = _templates(spark, ["totally unique line here"])
    assert got == {"totally unique line here": (1, 1)}


def test_template_anomaly_flags_burst_and_fills_zero_days(spark):
    import datetime

    from hatchery_spark.operators.logmine import template_day_stats

    rows = []
    # stable template: "login ok user <n>" twice a day for 10 days
    for d in range(10):
        ts = datetime.datetime(2024, 3, 1 + d)
        rows += [("login ok user %d" % i, ts) for i in range(2)]
    # bursty template: "disk err code <n>" once a day, 40x on day 6,
    # absent on day 3 (the zero-day must appear in the grid)
    for d in range(10):
        if d == 3:
            continue
        n = 40 if d == 6 else 1
        ts = datetime.datetime(2024, 3, 1 + d)
        rows += [("disk err code %d" % i, ts) for i in range(n)]
    df = spark.createDataFrame(rows, "text string, ts timestamp")
    got = template_day_stats(df).collect()
    by = {(r.template, r.day): r for r in got}
    burst = by[("disk err code <*>", "2024-03-07")]
    assert burst.is_anomaly and burst.c == 40
    zero = by[("disk err code <*>", "2024-03-04")]
    assert zero.c == 0  # dense grid kept the silent day
    stable = [r for r in got if r.template == "login ok user <*>"]
    assert len(stable) == 10 and not any(r.is_anomaly for r in stable)
