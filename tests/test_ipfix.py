"""IPFIX templated export/collect: binding, state carry, strictness."""

from __future__ import annotations

import struct

import pytest

from hatchery_spark.operators.ipfix import (
    MAX_RECORDS,
    decode_stream,
    encode_message,
    record_len,
)


def _rows(n, base_ms=1_700_000_000_000):
    return [
        {"src_ip": f"10.0.{i % 256}.{i % 100}", "dst_ip": "192.168.1.2",
         "src_port": 1024 + i, "dst_port": 443, "prot": 6,
         "pkts": 1 + i % 5, "octets": 40 + i,
         "start_ms": base_ms + 1000 * i,
         "unix_secs": (base_ms + 1000 * i) // 1000}
        for i in range(n)
    ]


def test_both_templates_bind_by_ie_not_position():
    rows = _rows(3)
    for domain in (0, 1):  # template 256 vs 257 (flipped order, reduced)
        msg = encode_message(domain, 0, rows)
        got = decode_stream([msg])
        assert len(got) == 3
        for r, src in zip(got, rows):
            for k in ("src_ip", "dst_ip", "src_port", "dst_port",
                      "prot", "pkts", "octets", "start_ms"):
                assert r[k] == src[k], (domain, k)
            assert r["template_id"] == 256 + domain % 2


def test_record_lengths():
    assert record_len(256) == 37
    assert record_len(257) == 27
    rows = _rows(5)
    m0 = encode_message(0, 1, rows)   # no template set on pkt_idx 1...
    assert len(m0) == 16 + 4 + 5 * 37


def test_template_state_carries_across_messages_and_orders():
    first = encode_message(1, 0, _rows(MAX_RECORDS))
    later = encode_message(1, 3, _rows(4, base_ms=1_700_009_999_000))
    # arrival order reversed: collector sorts by header sequence
    got = decode_stream([later, first])
    assert len(got) == MAX_RECORDS + 4
    assert got[0]["seq"] == 0 and got[-1]["seq"] == 3 * MAX_RECORDS


def test_data_before_template_raises():
    later = encode_message(1, 3, _rows(2))
    with pytest.raises(ValueError, match="before template"):
        decode_stream([later])


def test_reduced_size_overflow_guard():
    rows = _rows(1)
    rows[0]["octets"] = 1 << 32  # does not fit template 257's 4 bytes
    encode_message(0, 0, rows)   # 8-byte field: fine
    with pytest.raises(ValueError, match="overflows"):
        encode_message(1, 0, rows)


def test_header_strictness():
    msg = bytearray(encode_message(0, 0, _rows(2)))
    with pytest.raises(ValueError, match="bad IPFIX header"):
        decode_stream([bytes(msg[:-1])])        # length mismatch
    bad = bytearray(msg)
    bad[0:2] = struct.pack(">H", 9)             # NetFlow v9 version
    with pytest.raises(ValueError, match="bad IPFIX header"):
        decode_stream([bytes(bad)])


def test_spark_roundtrip(spark):
    from pyspark.sql import functions as F

    from hatchery_spark.operators.ipfix import export_ipfix, parse_ipfix

    n = 130
    flows = spark.range(n).select(
        (F.col("id") % 4).cast("int").alias("exporter_id"),
        F.col("id").alias("event_id"),
        F.to_timestamp(F.lit("2024-04-01 00:00:00")).alias("_t0"),
    ).select(
        "exporter_id", "event_id",
        (F.col("_t0") + F.make_interval(secs=F.col("event_id") * 7))
        .alias("ts"),
        F.concat(F.lit("10.1."), (F.col("event_id") % 9).cast("string"),
                 F.lit(".5")).alias("src_ip"),
        (F.lit(2000) + F.col("event_id") % 100).cast("int")
        .alias("src_port"),
        F.lit("192.168.0.9").alias("dst_ip"),
        F.lit(443).cast("int").alias("dst_port"),
        F.lit(17).cast("int").alias("prot"),
        (F.lit(1) + F.col("event_id") % 3).cast("int").alias("pkts"),
        (F.lit(64) + F.col("event_id") % 900).cast("int").alias("octets"),
    )
    out = parse_ipfix(export_ipfix(flows))
    got = out.orderBy("exporter_id", "seq", "rec_idx").collect()
    assert len(got) == n
    # every exporter's later packets parsed via the message-0 template
    per_dom = {}
    for r in got:
        per_dom.setdefault(r.exporter_id, set()).add(r.seq)
    assert all(len(s) > 1 for s in per_dom.values())
    by_eid = {(r.src_port, r.exporter_id): r for r in got}
    assert all(r.template_id == 256 + r.exporter_id % 2 for r in got)
