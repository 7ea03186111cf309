"""RFC 6587 octet-counted syslog over TCP (operators/tcpsyslog.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hatchery_spark.operators.tcpstream import (
    reassemble_streams,
    segment_streams,
)
from hatchery_spark.operators.tcpsyslog import (
    frame_octet_counted,
    split_octet_counted,
)


def _streams(spark, rows):
    return spark.createDataFrame(rows, "conv_id string, stream string")


def test_split_walks_prefixes(spark):
    out = split_octet_counted(
        _streams(spark, [("f", "5 hello6 world!2 :)")])
    ).collect()
    got = [(r.msg_idx, r.line, r.ok) for r in sorted(out, key=lambda r: r.msg_idx)]
    assert got == [(0, "hello", True), (1, "world!", True), (2, ":)", True)]


def test_content_is_never_inspected(spark):
    # a message whose BODY looks exactly like a frame must not confuse
    # the walk — only the counted prefix decides boundaries
    body = "12 fake frame"
    wire = f"{len(body)} {body}3 end"
    out = split_octet_counted(_streams(spark, [("f", wire)])).collect()
    lines = [r.line for r in sorted(out, key=lambda r: r.msg_idx)]
    assert lines == [body, "end"]


def test_desync_dead_letters_remainder(spark):
    # truncated payload: declared 10 octets, only 4 present
    out = split_octet_counted(
        _streams(spark, [("f", "3 abc10 shor")])
    ).collect()
    ok = [r for r in out if r.ok]
    bad = [r for r in out if not r.ok]
    assert [r.line for r in ok] == ["abc"]
    assert len(bad) == 1 and bad[0].msg_idx == -1
    assert bad[0].line == "10 shor"


def test_garbage_prefix_dead_letters(spark):
    out = split_octet_counted(_streams(spark, [("f", "xx 3 abc")])).collect()
    assert len(out) == 1 and not out[0].ok


def test_e2e_through_tcp_reassembly(spark):
    # frames → TCP segmentation (retransmit/overlap gates fire across 30
    # flows) → reassembly → split: every message returns in order
    lines = spark.createDataFrame(
        [
            (f"c{i}", j, f"<13>1 msg {i}-{j} " + "x" * (20 + 7 * j))
            for i in range(30)
            for j in range(6)
        ],
        "conv_id string, turn_idx int, line string",
    )
    conv = frame_octet_counted(lines)
    streams = reassemble_streams(segment_streams(conv))
    complete = streams.where(F.col("complete")).select("conv_id", "stream")
    msgs = split_octet_counted(complete)
    joined = (
        msgs.alias("m")
        .join(
            lines.alias("s"),
            (F.col("m.conv_id") == F.col("s.conv_id"))
            & (F.col("m.msg_idx") == F.col("s.turn_idx")),
        )
        .select((F.col("m.line") == F.col("s.line")).alias("same"))
    )
    rows = joined.collect()
    n_complete = complete.count()
    assert all(r.same for r in rows)
    assert len(rows) == n_complete * 6  # every message of every flow
    assert msgs.where(~F.col("ok")).count() == 0
