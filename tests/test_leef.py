"""LEEF 2.0 framing: delimiter-resolution edge cases (operators/leef.py)."""

import datetime

from hatchery_spark.operators.leef import parse_leef, render_leef

TS = datetime.datetime(2025, 6, 3, 12, 0, 0)
SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def _roundtrip(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return parse_leef(render_leef(df).select("line")).collect()


def test_hex_delimiter_even_turns(spark):
    # turn_idx 0 → x09 spelling; value spaces must survive a tab split
    text = "[warn] actor=u@x action=login_event resource=doc:/r1 ip=1.2.3.4"
    [r] = _roundtrip(spark, [("c-1", 0, "user", text, "idp", TS)])
    assert r.msg == text and r.severity == 6
    assert r.usr_name == "u@x" and r.src_ip == "1.2.3.4"
    assert r.dev_time_ms == int(TS.timestamp() * 1000)


def test_literal_delimiter_odd_turns(spark):
    [r] = _roundtrip(spark, [("c-2", 3, "tool", "free text = with equals",
                              "edr", TS)])
    assert r.msg == "free text = with equals"   # '=' inside msg survives
    assert r.sig_id == "freeform" and r.turn_idx == 3
    assert r.usr_name is None and r.src_ip is None


def test_delimiter_spelling_actually_rotates(spark):
    df = spark.createDataFrame(
        [("c", 0, "user", "a", "w", TS), ("c", 1, "user", "a", "w", TS)],
        SCHEMA,
    )
    lines = [r.line for r in render_leef(df).select("line").collect()]
    assert any("|x09|" in ln and "\t" in ln for ln in lines)
    assert any("|^|" in ln and "^msg=" in ln for ln in lines)


def test_parse_is_single_stage(spark):
    df = spark.createDataFrame([("c", 0, "user", "t", "w", TS)], SCHEMA)
    plan = (
        parse_leef(render_leef(df).select("line"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "BatchEvalPython" not in plan
