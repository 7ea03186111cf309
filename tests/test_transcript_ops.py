"""Transcript-structure operators: truncation, QC, tool-loop detection."""

from __future__ import annotations

from pyspark.sql import functions as F

from hatchery_spark.operators.transcripts import (
    tool_call_loops,
    truncate_context,
    turn_structure_qc,
)

SCHEMA = "conv_id string, turn_idx int, role string, text string, tool string"


def _turns(spark, rows):
    return spark.createDataFrame(rows, schema=SCHEMA)


def test_truncate_keeps_longest_fitting_suffix(spark):
    rows = [
        ("c1", 0, "user", "a b c d", "click"),        # 4 tokens
        ("c1", 1, "assistant", "e f g", "purchase"),  # 3
        ("c1", 2, "user", "h i", "click"),            # 2
        ("c1", 3, "assistant", "j", "purchase"),      # 1
    ]
    out = truncate_context(_turns(spark, rows), budget_tokens=6)
    kept = sorted(r.turn_idx for r in out.collect())
    # suffix sums from end: idx3=1, idx2=3, idx1=6, idx0=10 -> keep 1..3
    assert kept == [1, 2, 3]


def test_truncate_always_keeps_final_turn(spark):
    rows = [("c1", 0, "user", "one two three four five", "click")]
    out = truncate_context(_turns(spark, rows), budget_tokens=2).collect()
    assert [r.turn_idx for r in out] == [0]
    assert out[0].n_tokens == 5


def test_truncate_is_per_conversation(spark):
    rows = [
        ("a", 0, "user", "x x x", "click"),
        ("a", 1, "user", "x", "click"),
        ("b", 0, "user", "y", "click"),
    ]
    out = truncate_context(_turns(spark, rows), budget_tokens=1)
    got = {(r.conv_id, r.turn_idx) for r in out.collect()}
    assert got == {("a", 1), ("b", 0)}


def test_qc_flags_role_violations_and_start(spark):
    rows = [
        ("ok", 0, "user", "[info] x", "click"),
        ("ok", 1, "assistant", "[info] y", "purchase"),
        ("bad", 0, "tool", "free form junk", "error"),
        ("bad", 1, "tool", "[warn] z", "error"),
        ("bad", 2, "tool", "[warn] w", "error"),
    ]
    out = {r.conv_id: r for r in turn_structure_qc(_turns(spark, rows)).collect()}
    assert out["ok"].valid == 1 and out["ok"].role_violations == 0
    assert out["ok"].unparseable_turns == 0 and out["ok"].starts_ok == 1
    assert out["bad"].valid == 0
    assert out["bad"].role_violations == 2  # turns 1 and 2 repeat 'tool'
    assert out["bad"].unparseable_turns == 1
    assert out["bad"].starts_ok == 0


def test_qc_single_turn_conversation(spark):
    rows = [("s", 0, "system", "[info] hello", "signup")]
    r = turn_structure_qc(_turns(spark, rows)).collect()[0]
    assert (r.n_turns, r.role_violations, r.valid) == (1, 0, 1)


def test_tool_loops_finds_only_consecutive_runs(spark):
    rows = [
        # run of 3 'search' at 0..2, interrupted, then 'search' again at 4
        ("c", 0, "tool", "t", "search"),
        ("c", 1, "tool", "t", "search"),
        ("c", 2, "tool", "t", "search"),
        ("c", 3, "tool", "t", "fetch"),
        ("c", 4, "tool", "t", "search"),
        # a 2-run stays below min_run=3
        ("d", 0, "tool", "t", "fetch"),
        ("d", 1, "tool", "t", "fetch"),
    ]
    out = tool_call_loops(_turns(spark, rows), min_run=3).collect()
    assert len(out) == 1
    assert (out[0].conv_id, out[0].tool, out[0].start_idx, out[0].run_len) == (
        "c",
        "search",
        0,
        3,
    )


def test_tool_loops_min_run_boundary(spark):
    rows = [("c", i, "tool", "t", "x") for i in range(4)]
    out = tool_call_loops(_turns(spark, rows), min_run=4).collect()
    assert len(out) == 1 and out[0].run_len == 4


def test_single_conv_exchange_plan(spark):
    """All three operators shuffle on the conv family exactly once — the
    window and any downstream agg reuse one exchange."""
    rows = [("c", i, "user", "w w", "click") for i in range(3)]
    df = _turns(spark, rows)
    for op in (
        lambda d: truncate_context(d, 10),
        turn_structure_qc,
        lambda d: tool_call_loops(d, 2),
    ):
        plan = op(df)._jdf.queryExecution().executedPlan().toString()
        n_exchange = plan.count("Exchange hashpartitioning")
        assert n_exchange <= 1, plan


def test_best_of_n_selection(spark, tmp_path):
    """Highest reward wins; reward ties break to the EARLIEST turn."""
    import __spark_entry__ as e
    from pyspark.sql import functions as F

    # build a tiny events parquet whose transcript has a known best turn
    rows = [
        # user 1: three purchase (assistant) events, values 5, 9, 9
        (100, "2025-01-01 00:00:01", 1, "purchase", 5.0, ""),
        (101, "2025-01-01 00:00:02", 1, "purchase", 9.0, ""),
        (102, "2025-01-01 00:00:03", 1, "purchase", 9.0, ""),
        # one user event so turn_idx 0 is not assistant
        (103, "2025-01-01 00:00:00", 1, "click", 1.0, ""),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = e.queries()["pipeline_best_of_n"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    # turns: click@idx0 (user), purchases idx1(v5), idx2(v9), idx3(v9)
    assert (r.n_candidates, r.best_turn_idx, r.reward) == (3, 2, 9.0)
