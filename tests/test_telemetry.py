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


def _slo_rows(events):
    """events: list of (svc, minute_offset, n_total, n_errors) → raw rows."""
    import datetime

    base = datetime.datetime(2025, 6, 1, 0, 0, 0)
    rows = []
    for svc, mins, tot, errs in events:
        ts = base + datetime.timedelta(minutes=mins)
        for i in range(tot):
            rows.append((svc, ts, i < errs))
    return rows


def test_slo_burnrate_page_fires_and_resets(spark):
    from hatchery_spark.operators.telemetry import slo_burnrate

    # svc "api": minute 0-4 a hard burst (50% errors), minutes 10..55 healthy.
    # page needs 1h AND 5m >= 1.44%: fires ONLY in the burst bucket; in the
    # healthy buckets the polluted 1h window alone must NOT page (reset guard).
    events = [("api", 0, 100, 50)] + [
        ("api", m, 100, 0) for m in range(10, 60, 5)
    ]
    df = spark.createDataFrame(
        _slo_rows(events), "svc string, ts timestamp, is_error boolean"
    )
    out = {r.bucket_s: r for r in slo_burnrate(df, ["svc"]).collect()}
    buckets = sorted(out)
    burst, healthy = buckets[0], buckets[3]
    assert out[burst].page_alert and out[burst].ticket_alert
    assert out[burst].err_5m == 50 and out[burst].tot_5m == 100
    # long window still polluted (50/1100 = 4.5% > 1.44%) but 5m leg clear
    assert out[healthy].err_1h == 50 and out[healthy].tot_1h >= 1000
    assert not out[healthy].page_alert
    assert out[healthy].err_5m == 0


def test_slo_burnrate_integer_threshold_boundary(spark):
    from hatchery_spark.operators.telemetry import slo_burnrate

    # exactly at the page threshold: 144 errors per 10000 → >= fires
    df = spark.createDataFrame(
        _slo_rows([("svc", 0, 10000, 144)]),
        "svc string, ts timestamp, is_error boolean",
    )
    row = slo_burnrate(df, ["svc"]).collect()[0]
    assert row.page_alert  # 144*10000 >= 144*10000
    # one error fewer → clears
    df2 = spark.createDataFrame(
        _slo_rows([("svc", 0, 10000, 143)]),
        "svc string, ts timestamp, is_error boolean",
    )
    assert not slo_burnrate(df2, ["svc"]).collect()[0].page_alert


def test_slo_burnrate_single_corpus_shuffle(spark):
    from hatchery_spark.operators.telemetry import slo_burnrate

    df = spark.createDataFrame(
        _slo_rows([("a", 0, 5, 1), ("b", 7, 5, 0)]),
        "svc string, ts timestamp, is_error boolean",
    )
    plan = (
        slo_burnrate(df, ["svc"])._jdf.queryExecution().executedPlan().toString()
    )
    # raw rows are aggregated exactly once: the four plan branches (output +
    # 3 rollups) all read the persisted 5-min frame, never the raw source
    assert plan.count("InMemoryTableScan") == 4


def test_rate_envelope_burst_flags_exactly(spark):
    from hatchery_spark.operators.telemetry import rate_envelope_violations
    import datetime

    base = datetime.datetime(2025, 6, 1)
    # sigma=2, rho=1/60: allowance is 2 + elapsed/60 events.
    # Four events in 10s (idx 0-3): the 3rd event (i=2) has count 3 vs
    # allowance 2+0.1 → the running-min test must flag idx 2 and 3 but
    # not the first two, nor a 5th event after a long drain.
    rows = [
        ("c", i, base + datetime.timedelta(seconds=s))
        for i, s in enumerate([0, 5, 8, 10, 600])
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts timestamp")
    out = rate_envelope_violations(
        df, ["conv_id"], sigma=2, rho_num=1, rho_den=60, tiebreak_col="turn_idx"
    )
    got = {r.turn_idx: r.violates for r in out.collect()}
    assert got == {0: False, 1: False, 2: True, 3: True, 4: False}


def test_rate_envelope_matches_brute_force(spark):
    from hatchery_spark.operators.telemetry import rate_envelope_violations
    import datetime

    base = datetime.datetime(2025, 6, 1)
    import random

    rnd = random.Random(7)
    ts, t = [], 0
    for _ in range(120):
        t += rnd.choice([1, 2, 3, 30, 120])
        ts.append(t)
    rows = [("k", i, base + datetime.timedelta(seconds=s)) for i, s in enumerate(ts)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts timestamp")
    sigma, num, den = 3, 1, 10  # 1 event per 10s, burst 3
    out = {
        r.turn_idx: r.violates
        for r in rate_envelope_violations(
            df, ["conv_id"], sigma=sigma, rho_num=num, rho_den=den,
            tiebreak_col="turn_idx",
        ).collect()
    }
    # brute force: exists j<=i with (i-j+1)*den > sigma*den + num*(t_i-t_j)
    for i in range(len(ts)):
        brute = any(
            (i - j + 1) * den > sigma * den + num * (ts[i] - ts[j])
            for j in range(i + 1)
        )
        assert out[i] == brute, i


def test_rate_envelope_single_sort(spark):
    from hatchery_spark.operators.telemetry import rate_envelope_violations
    import datetime

    df = spark.createDataFrame(
        [("c", 0, datetime.datetime(2025, 6, 1))],
        "conv_id string, turn_idx int, ts timestamp",
    )
    plan = (
        rate_envelope_violations(df, ["conv_id"], tiebreak_col="turn_idx")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # both windows share one partition/order: exactly one Exchange, one Sort
    assert plan.count("Exchange") == 1 and plan.count("Sort") == 1


# ---------------------------------------------------------------------------
# first_seen_novelty
# ---------------------------------------------------------------------------


def test_first_seen_novelty_planted(spark):
    from hatchery_spark.operators.telemetry import first_seen_novelty

    rows = [
        # alice: A,B on d1; A again d2 (not new); C on d3 (new)
        ("alice", "A", "2024-01-01 09:00:00"),
        ("alice", "B", "2024-01-01 10:00:00"),
        ("alice", "A", "2024-01-02 09:00:00"),
        ("alice", "C", "2024-01-03 09:00:00"),
        ("alice", "A", "2024-01-03 10:00:00"),
        # bob: A on d2 — independent of alice's A on d1
        ("bob", "A", "2024-01-02 12:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "actor string, action string, ts_s string"
    ).selectExpr("actor", "action", "cast(ts_s AS timestamp) AS ts")
    out = first_seen_novelty(df, "actor", "action")
    got = {(r["actor"], str(r["day"])): r for r in out.collect()}
    a1 = got[("alice", "2024-01-01")]
    assert (a1["events"], a1["active_pairs"], a1["new_pairs"]) == (2, 2, 2)
    a2 = got[("alice", "2024-01-02")]
    assert (a2["events"], a2["active_pairs"], a2["new_pairs"]) == (1, 1, 0)
    a3 = got[("alice", "2024-01-03")]
    assert (a3["events"], a3["active_pairs"], a3["new_pairs"]) == (2, 2, 1)
    b2 = got[("bob", "2024-01-02")]
    assert (b2["events"], b2["active_pairs"], b2["new_pairs"]) == (1, 1, 1)
    assert len(got) == 4


def test_first_seen_novelty_same_day_repeats_count_once(spark):
    from hatchery_spark.operators.telemetry import first_seen_novelty

    rows = [("u", "X", f"2024-02-01 0{h}:00:00") for h in range(1, 6)]
    df = spark.createDataFrame(
        rows, "actor string, action string, ts_s string"
    ).selectExpr("actor", "action", "cast(ts_s AS timestamp) AS ts")
    out = first_seen_novelty(df, "actor", "action").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["events"], r["active_pairs"], r["new_pairs"]) == (5, 1, 1)
