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


# --- RFC 3164 legacy BSD framing ------------------------------------------

from hatchery_spark.operators.syslog import parse_rfc3164, render_rfc3164


def _bsd_roundtrip(spark, text, day=5, **kw):
    ts = datetime.datetime(2024, 8, day, 6, 7, 8)
    df = spark.createDataFrame(
        [("conv-9", 3, kw.get("role", "user"), text, kw.get("tool", "click"), ts)],
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )
    lines = render_rfc3164(df).select("line")
    return lines.collect()[0].line, parse_rfc3164(lines).collect()[0]


def test_bsd_space_padded_day(spark):
    # days 1-9 render with a SPACE pad ("Aug  5"), not zero ("Aug 05")
    line, row = _bsd_roundtrip(spark, "[info] actor=a action=b_event resource=r ip=1.2.3.4")
    assert "<14>Aug  5 06:07:08 conv-9 click[3]: " in line
    assert (row.mon, row.day, row.time_str) == (8, 5, "06:07:08")
    assert row.msg.startswith("[info] actor=a")


def test_bsd_two_digit_day_and_pri(spark):
    line, row = _bsd_roundtrip(
        spark, "[error] actor=a action=b_event resource=r ip=1.2.3.4",
        day=25, role="tool", tool="login",
    )
    assert "Aug 25 " in line and "Aug  " not in line
    assert (row.facility, row.severity, row.pri) == (16, 3, 16 * 8 + 3)
    assert (row.host, row.tag, row.pid) == ("conv-9", "login", 3)


def test_bsd_msg_text_equality(spark):
    # msg carries the raw text even when it contains frame-ish chars
    nasty = "free [text] with: colons ]: and <brackets> <14>Aug  5"
    _, row = _bsd_roundtrip(spark, nasty)
    assert row.msg == nasty
    assert row.severity == 5  # free-form turn → default severity


def test_bsd_no_exchange(spark):
    ts = datetime.datetime(2024, 8, 5, 6, 7, 8)
    df = spark.createDataFrame(
        [("c", 0, "user", "[info] actor=a action=b resource=r ip=1.1.1.1", "t", ts)],
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )
    out = parse_rfc3164(render_rfc3164(df).select("line"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
