"""HTTP/1.1 extraction from TCP streams (operators/tcphttp.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hatchery_spark.operators.tcphttp import (
    concat_requests,
    extract_http_requests,
    render_http_requests,
)
from hatchery_spark.operators.tcpstream import (
    reassemble_streams,
    segment_streams,
)

SCHEMA = "conv_id string, turn_idx int, text string"


def _extract(spark, wire):
    df = spark.createDataFrame([("f", wire)], "conv_id string, stream string")
    return extract_http_requests(df).collect()


def _req(body, te="cl", idx=0):
    head = f"POST /t/{idx} HTTP/1.1\r\nHost: h\r\n"
    if te == "cl":
        return head + f"Content-Length: {len(body)}\r\n\r\n" + body
    chunks = "".join(
        f"{len(body[i:i+5]):x}\r\n{body[i:i+5]}\r\n"
        for i in range(0, len(body), 5)
    )
    return head + "Transfer-Encoding: chunked\r\n\r\n" + chunks + "0\r\n\r\n"


def test_pipelined_requests_both_framings(spark):
    wire = _req("hello world", "cl", 0) + _req("chunked body here", "chunked", 1)
    rows = sorted(_extract(spark, wire), key=lambda r: r.msg_idx)
    assert [(r.body, r.te, r.ok) for r in rows] == [
        ("hello world", "cl", True),
        ("chunked body here", "chunked", True),
    ]
    assert rows[0].target == "/t/0" and rows[1].target == "/t/1"


def test_body_looking_like_a_request_is_opaque(spark):
    body = "POST /fake HTTP/1.1\r\nHost: evil\r\n\r\n"
    wire = _req(body, "cl", 0) + _req("tail", "cl", 1)
    rows = sorted(_extract(spark, wire), key=lambda r: r.msg_idx)
    assert rows[0].body == body and rows[1].body == "tail"


def test_truncated_body_dead_letters_remainder(spark):
    wire = _req("good", "cl", 0) + "POST /t/1 HTTP/1.1\r\nHost: h\r\nContent-Length: 99\r\n\r\nshort"
    rows = _extract(spark, wire)
    ok = [r for r in rows if r.ok]
    bad = [r for r in rows if not r.ok]
    assert [r.body for r in ok] == ["good"]
    assert len(bad) == 1 and bad[0].msg_idx == -1


def test_bad_chunk_size_dead_letters(spark):
    wire = (
        "POST /t/0 HTTP/1.1\r\nHost: h\r\nTransfer-Encoding: chunked\r\n\r\n"
        "zz\r\nbody\r\n0\r\n\r\n"
    )
    rows = _extract(spark, wire)
    assert len(rows) == 1 and not rows[0].ok


def test_e2e_render_tcp_extract(spark):
    rows = [
        (f"c{i}", j, f"turn {i}-{j} " + "abcdefg " * (3 + 5 * j))
        for i in range(20)
        for j in range(4)
    ]
    t = spark.createDataFrame(rows, SCHEMA)
    conv = concat_requests(
        render_http_requests(t).select("conv_id", "turn_idx", "req")
    )
    streams = reassemble_streams(segment_streams(conv))
    complete = streams.where(F.col("complete")).select("conv_id", "stream")
    got = (
        extract_http_requests(complete)
        .alias("m")
        .join(
            t.alias("s"),
            (F.col("m.conv_id") == F.col("s.conv_id"))
            & (F.col("m.msg_idx") == F.col("s.turn_idx")),
        )
        .select(
            (F.col("m.body") == F.col("s.text")).alias("same"),
            F.col("m.te"),
            F.col("m.ok"),
        )
        .collect()
    )
    n_complete = complete.count()
    assert len(got) == n_complete * 4
    assert all(r.same and r.ok for r in got)
    assert {r.te for r in got} == {"cl", "chunked"}
