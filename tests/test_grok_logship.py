"""Grok pattern-library compiler + multiline stitcher."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hatchery_spark.operators.grok import (
    COMBINEDAPACHELOG,
    GROK_PATTERNS,
    grok_compile,
    grok_parse,
    render_access_log,
)
from hatchery_spark.operators.logship import stitch_multiline

LINE = (
    '10.0.3.7 - user42 [05/Feb/2024:13:55:36 +0000] "GET /r/17 HTTP/1.1" '
    '200 1234 "https://ref.example/click" "agent/3"'
)


def test_grok_compile_field_order():
    pattern, fields = grok_compile(COMBINEDAPACHELOG)
    assert fields == [
        "clientip", "ident", "auth", "timestamp", "verb", "request",
        "httpversion", "response", "bytes", "referrer", "agent",
    ]
    # sub-pattern refs are fully expanded: no %{…} survives compilation
    assert "%{" not in pattern


def test_grok_compile_unknown_and_cycle():
    with pytest.raises(KeyError):
        grok_compile("%{NOPE:x}")
    with pytest.raises(ValueError, match="cycle"):
        grok_compile("%{A:x}", {"A": "%{B}", "B": "%{A}"})
    with pytest.raises(ValueError, match="duplicate"):
        grok_compile("%{INT:x} %{INT:x}")


def test_grok_parse_line(spark):
    df = spark.createDataFrame([(LINE,), ("panic: nope",)], "line string")
    out = grok_parse(
        df, COMBINEDAPACHELOG, types={"response": "int", "bytes": "bigint"}
    )
    rows = {r["_grok_matched"]: r for r in out.collect()}
    ok = rows[True]
    assert ok["clientip"] == "10.0.3.7"
    assert ok["ident"] == "-" and ok["auth"] == "user42"
    assert ok["timestamp"] == "05/Feb/2024:13:55:36 +0000"
    assert ok["verb"] == "GET" and ok["request"] == "/r/17"
    assert ok["httpversion"] == "1.1"
    assert ok["response"] == 200 and ok["bytes"] == 1234
    assert ok["referrer"] == "https://ref.example/click"
    assert ok["agent"] == "agent/3"
    bad = rows[False]
    assert all(
        bad[f] is None
        for f in ("clientip", "auth", "response", "bytes", "agent")
    )


def test_grok_parse_clf_dash_bytes(spark):
    dashed = LINE.replace(" 200 1234 ", " 304 - ")
    df = spark.createDataFrame([(dashed,)], "line string")
    r = grok_parse(df, COMBINEDAPACHELOG, types={"bytes": "bigint"}).first()
    assert r["response"] == "304" and r["bytes"] is None and r["_grok_matched"]


def test_render_parse_roundtrip(spark):
    src = spark.createDataFrame(
        [("10.0.3.7", "-", "user42", "2024-02-05 13:55:36", "GET",
          "/r/17", 200, 1234, "https://ref.example/click", "agent/3")],
        "ip string, ident string, auth string, ts string, method string, "
        "path string, status int, bytes long, referrer string, agent string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    assert render_access_log(src).first()["line"] == LINE


def test_registry_patterns_are_re2_safe():
    # no backrefs / lookaround anywhere in the registry (dual-engine rule)
    for name, p in GROK_PATTERNS.items():
        assert "\\1" not in p and "(?=" not in p and "(?<" not in p, name


def _lines(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, line_no long, line string"
    )


def test_stitch_basic(spark):
    df = _lines(spark, [
        ("c1", 0, "[error] boom"),
        ("c1", 1, "    at A(a.java:1)"),
        ("c1", 2, "    at B(b.java:2)"),
        ("c1", 3, "[info] fine"),
        ("c2", 0, "[warn] solo"),
    ])
    out = {
        (r["stream"], r["rec_no"]): r
        for r in stitch_multiline(
            df, ~F.col("line").startswith("    at ")
        ).collect()
    }
    assert out[("c1", 0)]["n_lines"] == 3
    assert out[("c1", 0)]["message"] == (
        "[error] boom\n    at A(a.java:1)\n    at B(b.java:2)"
    )
    assert out[("c1", 3)]["message"] == "[info] fine"
    assert out[("c2", 0)]["n_lines"] == 1


def test_stitch_orphan_dead_letter(spark):
    df = _lines(spark, [
        ("c1", 0, "    at Orphan(o.java:0)"),
        ("c1", 1, "[info] header"),
        ("c1", 2, "    at A(a.java:1)"),
    ])
    out = {
        r["rec_no"]: r
        for r in stitch_multiline(
            df, ~F.col("line").startswith("    at ")
        ).collect()
    }
    assert out[-1]["message"] == "    at Orphan(o.java:0)"
    assert out[1]["n_lines"] == 2


def test_stitch_order_stable_under_shuffle(spark):
    rows = [("c1", i, f"    at F{i}" if i % 5 else f"[info] h{i}")
            for i in range(40)]
    df = _lines(spark, rows).repartition(7)  # scramble arrival order
    out = stitch_multiline(df, ~F.col("line").startswith("    at "))
    msgs = {r["rec_no"]: r["message"] for r in out.collect()}
    assert msgs[0].splitlines() == [
        "[info] h0", "    at F1", "    at F2", "    at F3", "    at F4"
    ]
    assert len(msgs) == 8
