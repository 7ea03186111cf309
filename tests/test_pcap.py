"""pcap/Ethernet/IPv4/UDP: checksum math, framing, tamper detection."""

import struct

import pytest

from hatchery_spark.operators.pcap import (
    build_frame,
    inet_checksum,
    parse_frame,
    split_pcap,
    write_pcap,
)


def test_inet_checksum_rfc1071_vector():
    # classic worked example: 0x0001 0xf203 0xf4f5 0xf6f7 → sum 0xddf2,
    # checksum = ~0xddf2 = 0x220d
    assert inet_checksum(bytes.fromhex("0001f203f4f5f6f7")) == 0x220D
    assert inet_checksum(b"") == 0xFFFF
    assert inet_checksum(b"\x00") == 0xFFFF          # odd-byte pad


def test_frame_checksums_verify():
    f = build_frame("10.0.1.2", "203.0.113.5", 40001, 514, 7, b"payload")
    m = parse_frame(f)
    assert m["ip_ok"] and m["udp_ok"]
    assert m["src_ip"] == "10.0.1.2" and m["dst_port"] == 514
    assert m["payload"] == b"payload"


def test_payload_flip_fails_udp_not_ip():
    f = bytearray(build_frame("10.0.1.2", "203.0.113.5", 40001, 514, 7, b"xyz"))
    f[-1] ^= 0x01
    m = parse_frame(bytes(f))
    assert m["ip_ok"] and not m["udp_ok"]


def test_ip_header_flip_fails_ip():
    f = bytearray(build_frame("10.0.1.2", "203.0.113.5", 40001, 514, 7, b"xyz"))
    f[22] ^= 0x01                                    # TTL byte
    assert not parse_frame(bytes(f))["ip_ok"]


def test_pcap_container_roundtrip():
    frames = [build_frame("10.0.0.1", "203.0.113.1", 40000, 514, i,
                          f"p{i}".encode()) for i in range(3)]
    buf = write_pcap([(100 + i, i * 1000, f) for i, f in enumerate(frames)])
    magic = struct.unpack_from("<I", buf, 0)[0]
    assert magic == 0xA1B2C3D4
    recs = split_pcap(buf)
    assert [(r[0], r[1]) for r in recs] == [(100, 0), (101, 1000), (102, 2000)]
    assert [parse_frame(r[2])["payload"] for r in recs] == [b"p0", b"p1", b"p2"]


def test_truncated_capture_rejected():
    buf = write_pcap([(1, 2, build_frame("10.0.0.1", "203.0.113.1",
                                         40000, 514, 1, b"zz"))])
    with pytest.raises(ValueError):
        split_pcap(buf[:-4])


def test_odd_length_payload_checksum():
    f = build_frame("10.0.1.2", "203.0.113.5", 40001, 514, 7, b"odd")
    assert parse_frame(f)["udp_ok"]
