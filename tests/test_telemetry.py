import math

from pyspark.sql import functions as F

from hatchery_spark.operators.telemetry import group_zscores, rate_cap


def test_rate_cap_keeps_earliest_per_bucket(spark):
    rows = [
        (i, 1, f"2025-06-01 00:0{i}:00") for i in range(6)          # 6 in one hour
    ] + [(10, 1, "2025-06-02 00:00:00"), (11, 2, "2025-06-01 00:00:00")]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = rate_cap(df, ["user_id"], bucket="day", max_rows=3, tiebreak_col="event_id")
    got = sorted((r.user_id, r.event_id, r.rate_rank) for r in out.collect())
    # user 1 day 1: earliest three of six; other buckets under cap survive whole
    assert got == [(1, 0, 1), (1, 1, 2), (1, 2, 3), (1, 10, 1), (2, 11, 1)]


def test_rate_cap_plan_has_window_group_limit(spark):
    df = spark.createDataFrame(
        [(1, 1, "2025-06-01 00:00:00")], "event_id long, user_id long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    plan = rate_cap(df, ["user_id"], max_rows=3)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan  # partial top-n before the shuffle


def test_group_zscores_closed_form_and_degenerate(spark):
    df = spark.createDataFrame(
        [(0, "a", 1.0), (1, "a", 2.0), (2, "a", 3.0),
         (3, "b", 5.0),                     # single row -> NULL
         (4, "c", 7.0), (5, "c", 7.0)],     # zero variance -> NULL
        "event_id long, g string, value double",
    )
    out = {r.event_id: r.zscore for r in group_zscores(df, "value", ["g"]).collect()}
    assert out[0] == -1.0 and out[1] == 0.0 and out[2] == 1.0
    assert out[3] is None and out[4] is None and out[5] is None
    assert math.isclose(sum(v for v in out.values() if v is not None), 0.0, abs_tol=1e-9)


def test_funnel_greedy_order_semantics(spark):
    """Step i+1 must occur strictly AFTER the matched step i: a purchase
    before the first click does not count; unreached steps stay NULL."""
    from hatchery_spark.operators.telemetry import funnel_steps

    rows = [
        # u1 completes in order
        (1, "signup", "2025-06-01 09:00:00"),
        (1, "click", "2025-06-01 10:00:00"),
        (1, "purchase", "2025-06-01 11:00:00"),
        # u2: purchase BEFORE the click -> stops at 2 steps
        (2, "signup", "2025-06-01 09:00:00"),
        (2, "purchase", "2025-06-01 09:30:00"),
        (2, "click", "2025-06-01 10:00:00"),
        # u3 never signs up -> not in output
        (3, "click", "2025-06-01 09:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r.user_id: r for r in
           funnel_steps(df, ["signup", "click", "purchase"]).collect()}
    assert set(out) == {1, 2}
    assert out[1].steps_completed == 3
    assert out[2].steps_completed == 2 and out[2].step_3_ts is None
    assert str(out[1].step_3_ts) == "2025-06-01 11:00:00"


def test_retention_cohorts_matrix(spark):
    """First-seen date defines the cohort; day-0 retention is 1.0 by
    construction; later offsets count distinct returning users."""
    from hatchery_spark.operators.telemetry import retention_cohorts

    rows = [
        (1, "2025-06-01 10:00:00"), (1, "2025-06-02 09:00:00"),
        (2, "2025-06-01 11:00:00"),
        (3, "2025-06-02 08:00:00"), (3, "2025-06-02 23:00:00"),  # same day twice
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = {(str(r.cohort_date), r.day_offset): r for r in retention_cohorts(df).collect()}
    assert out[("2025-06-01", 0)].n_users == 2
    assert out[("2025-06-01", 0)].retention == 1.0
    assert out[("2025-06-01", 1)].n_users == 1  # only user 1 returned
    assert out[("2025-06-01", 1)].retention == 0.5
    assert out[("2025-06-02", 0)].n_users == 1 and out[("2025-06-02", 0)].cohort_size == 1
    assert len(out) == 3  # same-day double activity counted once


def test_funnel_single_scan_matches_k_scan(spark):
    """The one-shuffle HOF-walk funnel is output-identical to the k-scan
    form on randomized event streams, including equal-timestamp edges
    (strictly-after must reject a same-ts next step)."""
    import random

    from hatchery_spark.operators.telemetry import (
        funnel_steps,
        funnel_steps_single_scan,
    )

    rng = random.Random(23)
    types = ["signup", "click", "purchase", "refund", "view"]
    rows = [
        (
            u,
            rng.choice(types),
            f"2025-06-01 {rng.randrange(24):02d}:{rng.choice([0, 15, 30]):02d}:00",
        )
        for u in range(40)
        for _ in range(rng.randrange(12))
    ]
    # an explicit same-ts chain: click at exactly the signup ts must NOT count
    rows += [(100, "signup", "2025-06-01 09:00:00"),
             (100, "click", "2025-06-01 09:00:00"),
             (100, "click", "2025-06-01 09:30:00")]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    steps = ["signup", "click", "purchase"]
    a = sorted(map(tuple, funnel_steps(df, steps).collect()))
    b = sorted(map(tuple, funnel_steps_single_scan(df, steps).collect()))
    assert a == b
    got = {r.user_id: r for r in funnel_steps_single_scan(df, steps).collect()}
    assert str(got[100].step_2_ts) == "2025-06-01 09:30:00"


def test_tail_sample_trace_level_decision_and_precedence(spark):
    from hatchery_spark.operators.telemetry import tail_sample_traces

    rows = [
        # trace A: one error span among infos → kept whole as 'error'
        ("A", "info", "2025-06-01 00:00:00"),
        ("A", "error", "2025-06-01 00:00:10"),
        ("A", "info", "2025-06-01 00:00:20"),
        # trace B: healthy but slow (2h)
        ("B", "info", "2025-06-01 00:00:00"),
        ("B", "info", "2025-06-01 02:00:00"),
        # trace C: healthy + fast → only the md5 baseline can keep it
        ("C", "info", "2025-06-01 00:00:00"),
    ]
    df = spark.createDataFrame(rows, "trace string, severity string, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    got = {
        r.trace: (r.keep_reason, r.n_spans, r.n_error_spans, r.duration_s)
        for r in tail_sample_traces(df, ["trace"], slow_s=3600, rate=1.0).collect()
    }
    assert got["A"] == ("error", 3, 1, 20)      # error wins over slow
    assert got["B"] == ("slow", 2, 0, 7200)
    assert got["C"] == ("sampled", 1, 0, 0)     # rate=1.0 keeps everything

    # rate=0 drops the healthy-fast trace entirely — no per-span leakage
    kept = tail_sample_traces(df, ["trace"], slow_s=3600, rate=0.0)
    assert sorted(r.trace for r in kept.collect()) == ["A", "B"]


def test_tail_sample_stable_under_repartition(spark):
    from hatchery_spark.operators.telemetry import tail_sample_traces

    rows = [(f"t{i}", "info", "2025-06-01 00:00:00") for i in range(400)]
    df = spark.createDataFrame(rows, "trace string, severity string, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    a = {r.trace for r in tail_sample_traces(df, ["trace"], rate=0.25).collect()}
    b = {
        r.trace
        for r in tail_sample_traces(df.repartition(17), ["trace"], rate=0.25).collect()
    }
    assert a == b and 0 < len(a) < 400
