"""OTLP TracesData framing: span chain, wire types, walker edge cases."""

import hashlib

from hatchery_spark.functions.otlp import (
    decode_traces,
    encode_trace,
    read_otlp_traces,
    write_otlp_traces,
)

TURNS = [
    (0, "user", "[info] hello", "chat", 1_700_000_000_000),
    (1, "assistant", "[error] boom", "edr", 1_700_000_000_500),
    (2, "tool", "free text", "edr", 1_700_000_001_000),
]


def test_span_chain_and_ids():
    spans = decode_traces(encode_trace("conv-9", TURNS))
    assert len(spans) == 3
    tid = hashlib.md5(b"conv-9").hexdigest()
    assert all(s["trace_id"] == tid for s in spans)
    assert spans[0]["parent_span_id"] is None          # root
    assert spans[1]["parent_span_id"] == spans[0]["span_id"]
    assert spans[2]["parent_span_id"] == spans[1]["span_id"]
    assert spans[0]["span_id"] == hashlib.md5(b"conv-9:0").hexdigest()[:16]


def test_fixed64_nanos_and_duration():
    [s0, s1, _] = decode_traces(encode_trace("conv-9", TURNS))
    assert s0["start_ms"] == 1_700_000_000_000
    assert s0["end_ms"] - s0["start_ms"] == len("[info] hello")
    assert s1["start_ms"] == 1_700_000_000_500


def test_status_and_kind_mapping():
    spans = decode_traces(encode_trace("conv-9", TURNS))
    assert [s["kind"] for s in spans] == ["CLIENT", "SERVER", "INTERNAL"]
    assert [s["status_code"] for s in spans] == [1, 2, 1]
    assert spans[1]["status_message"] == "[error] boom"


def test_resource_service_name():
    spans = decode_traces(encode_trace("conv-42", TURNS[:1]))
    assert spans[0]["service"] == "hatchery:conv-42"
    assert spans[0]["turn_idx"] == 0 and spans[0]["role"] == "user"


def test_multibyte_text_survives():
    spans = decode_traces(
        encode_trace("conv-1", [(0, "user", "héllo — 多字节", "chat", 5)])
    )
    assert spans[0]["status_message"] == "héllo — 多字节"


def test_dataframe_roundtrip(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("conv-7", 0, "user", "a", "chat", "2025-06-01 00:00:00"),
         ("conv-7", 1, "tool", "bb", "edr", "2025-06-01 00:00:01")],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = sorted(
        read_otlp_traces(write_otlp_traces(df)).collect(),
        key=lambda r: r.turn_idx,
    )
    assert out[0].parent_span_id is None and out[1].parent_span_id == out[0].span_id
    assert out[1].status_message == "bb" and out[1].end_ms - out[1].start_ms == 2
