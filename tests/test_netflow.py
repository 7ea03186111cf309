"""NetFlow v5 framing: struct layout, packet cuts, wire validation."""

import struct

import pytest

from hatchery_spark.functions import snappy  # noqa: F401  (env sanity)
from hatchery_spark.operators.netflow import (
    MAX_RECORDS,
    decode_packet,
    encode_packet,
    export_netflow,
    parse_netflow,
)


def _row(i=0, prot=6):
    return {"src_ip": "10.0.1.2", "dst_ip": "192.168.3.4",
            "src_port": 1024 + i, "dst_port": 443, "prot": prot,
            "pkts": 3, "octets": 120, "first_ms": 123456 + i,
            "unix_secs": 1_700_000_000 + i}


def test_wire_layout_header_and_record():
    buf = encode_packet(2, 5, [_row()])
    assert len(buf) == 24 + 48
    version, count = struct.unpack_from(">HH", buf, 0)
    assert version == 5 and count == 1
    flow_seq = struct.unpack_from(">I", buf, 16)[0]
    assert flow_seq == 5 * MAX_RECORDS
    src = struct.unpack_from(">I", buf, 24)[0]
    assert src == (10 << 24) | (0 << 16) | (1 << 8) | 2


def test_roundtrip_fields_and_flags():
    p = decode_packet(encode_packet(1, 0, [_row(prot=6), _row(1, prot=17)]))
    assert p["count"] == 2 and p["exporter_id"] == 1
    assert p["unix_secs"] == 1_700_000_001           # max over records
    r0, r1 = p["records"]
    assert r0["tcp_flags"] == 0x1B and r1["tcp_flags"] == 0
    assert r1["src_port"] == 1025 and r0["dst_ip"] == "192.168.3.4"


def test_count_limit_and_truncation_rejected():
    with pytest.raises(ValueError):
        encode_packet(0, 0, [])
    with pytest.raises(ValueError):
        encode_packet(0, 0, [_row(i) for i in range(MAX_RECORDS + 1)])
    buf = encode_packet(0, 0, [_row()])
    with pytest.raises(ValueError):
        decode_packet(buf[:-1])


def test_packet_cut_every_30_rows(spark):
    n = 65
    rows = [(0, i, f"2025-06-01 00:00:{i % 60:02d}", "10.0.0.1", 1000 + i,
             "192.168.0.2", 443, 6, 1, 40) for i in range(n)]
    from pyspark.sql import functions as F

    flows = spark.createDataFrame(
        rows,
        "exporter_id int, event_id long, ts string, src_ip string, "
        "src_port int, dst_ip string, dst_port int, prot int, pkts int, "
        "octets int",
    ).withColumn("ts", F.to_timestamp("ts"))
    pkts = export_netflow(flows).collect()
    assert len(pkts) == 3                             # 30 + 30 + 5
    out = parse_netflow(export_netflow(flows))
    counts = sorted(
        r["hdr_count"] for r in out.select("hdr_count").distinct().collect()
    )
    assert counts == [5, 30]
    assert out.count() == n
    seqs = {r.flow_sequence for r in out.select("flow_sequence").distinct().collect()}
    assert seqs == {0, 30, 60}
