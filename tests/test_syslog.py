"""RFC 5424 framing: escape roundtrip, PRI math, lossless timestamps."""

import datetime

from pyspark.sql import functions as F

from hatchery_spark.operators.syslog import parse_rfc5424, render_rfc5424


def _mk(spark, text, role="user", tool="click", turn=3):
    ts = datetime.datetime(2024, 1, 5, 6, 7, 8, 123456)
    return spark.createDataFrame(
        [("conv-9", turn, role, text, tool, ts)],
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )


def _roundtrip(spark, text, **kw):
    lines = render_rfc5424(_mk(spark, text, **kw)).select("line")
    return parse_rfc5424(lines).collect()[0]


def test_audit_turn_fields_and_pri(spark):
    text = "[error] actor=u1@example.com action=login_event resource=doc:/r7 ip=10.0.1.2"
    row = _roundtrip(spark, text, role="tool", tool="login")
    assert (row.facility, row.severity, row.pri) == (16, 3, 16 * 8 + 3)
    assert row.conv_id == "conv-9" and row.turn_idx == 3
    assert row.actor == "u1@example.com"
    assert row.resource == "doc:/r7"
    assert row.msgid == "login_event"
    assert row.msg == text  # per-turn text equality through the frame
    assert row.ts == datetime.datetime(2024, 1, 5, 6, 7, 8, 123456)  # µs kept


def test_free_form_turn_nil_sd(spark):
    row = _roundtrip(spark, "free form turn 37 with no audit payload")
    assert (row.severity, row.msgid, row.actor, row.note) == (5, "-", "", "")
    assert row.msg == "free form turn 37 with no audit payload"


def test_sd_escape_roundtrip_adversarial(spark):
    # actor value packed with every escapable char: " \ ]
    nasty = 'a"b\\c]d'
    text = f"[warn] actor={nasty} action=x_event resource=r ip=1.2.3.4"
    row = _roundtrip(spark, text)
    assert row.actor == nasty
    assert row.note == 'pod "click" [x\\]'
    # the rendered line itself must contain the escaped forms
    line = (
        render_rfc5424(_mk(spark, text)).select("line").collect()[0].line
    )
    assert 'actor="a\\"b\\\\c\\]d"' in line


def test_no_exchange(spark):
    df = _mk(spark, "[info] actor=a action=b_event resource=r ip=1.2.3.4")
    out = parse_rfc5424(render_rfc5424(df).select("line"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
