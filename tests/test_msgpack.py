"""MessagePack codec + Fluentd Forward chunk roundtrip."""

from __future__ import annotations

import struct

import pytest

from hatchery_spark.functions.msgpack import (
    Ext,
    MsgpackError,
    decode,
    encode,
    event_time,
)

# The msgpack project's own canonical example (spec README): the 18-byte
# encoding of {"compact": true, "schema": 0}.
CANONICAL = "82a7636f6d70616374c3a6736368656d6100"

# boundary-value matrix: every head-width threshold, both sides
VECTORS = [
    ("c0", None), ("c2", False), ("c3", True),
    ("00", 0), ("7f", 127), ("cc80", 128), ("ccff", 255),
    ("cd0100", 256), ("cdffff", 65535), ("ce00010000", 65536),
    ("ceffffffff", 4294967295), ("cf0000000100000000", 4294967296),
    ("cfffffffffffffffff", 18446744073709551615),
    ("ff", -1), ("e0", -32), ("d0df", -33), ("d080", -128),
    ("d1ff7f", -129), ("d18000", -32768), ("d2ffff7fff", -32769),
    ("d280000000", -2147483648), ("d3ffffffff7fffffff", -2147483649),
    ("d38000000000000000", -9223372036854775808),
    ("cb3ff199999999999a", 1.1),
    ("cb7ff0000000000000", float("inf")),
    ("a0", ""), ("a161", "a"), ("a17e", "~"),
    ("bf" + "61" * 31, "a" * 31),
    ("d920" + "61" * 32, "a" * 32),
    ("c400", b""), ("c403010203", b"\x01\x02\x03"),
    ("90", []), ("930102a161", [1, 2, "a"]),
    ("dc0010" + "00" * 16, [0] * 16),
    ("80", {}), ("82a16101a16202", {"a": 1, "b": 2}),
    ("d4012a", Ext(1, b"\x2a")),
    ("d5020102", Ext(2, b"\x01\x02")),
    ("d70012345678deadbeef",
     Ext(0, bytes.fromhex("12345678deadbeef"))),
    ("c7050affffffffff", Ext(10, b"\xff" * 5)),
]


def test_canonical_example():
    assert encode({"compact": True, "schema": 0}).hex() == CANONICAL
    assert decode(bytes.fromhex(CANONICAL)) == {"compact": True, "schema": 0}


@pytest.mark.parametrize("hexstr,value", VECTORS)
def test_vectors_decode(hexstr, value):
    assert decode(bytes.fromhex(hexstr)) == value


@pytest.mark.parametrize("hexstr,value", VECTORS)
def test_vectors_encode(hexstr, value):
    assert encode(value).hex() == hexstr


def test_large_forms_roundtrip():
    big = {
        "s16": "x" * 300, "s32": "y" * 70000,
        "arr16": list(range(20)), "nested": [{"k": [1, None, -5]}],
        "bin16": b"\x00" * 300,
    }
    assert decode(encode(big)) == big
    m32 = {f"k{i}": i for i in range(70000)}
    wire = encode(m32)
    assert wire[0] == 0xDF  # map 32
    assert decode(wire) == m32


def test_timestamp_ext_decodes():
    # timestamp 32 / 64 / 96 (spec ext type -1) → (sec, nsec)
    assert decode(b"\xd6\xff" + struct.pack(">I", 1000)) == (1000, 0)
    d64 = (7 << 34) | 1234
    assert decode(b"\xd7\xff" + struct.pack(">Q", d64)) == (1234, 7)
    assert decode(
        b"\xc7\x0c\xff" + struct.pack(">Iq", 99, -5)
    ) == (-5, 99)


def test_strictness():
    with pytest.raises(MsgpackError):
        decode(b"\xcd\x01")            # truncated uint16
    with pytest.raises(MsgpackError):
        decode(b"\x01\x02")            # trailing garbage
    with pytest.raises(MsgpackError):
        decode(b"\xc1")                # never-used byte
    with pytest.raises(MsgpackError):
        decode(b"\x91")                # fixarray1 with no element


def test_event_time_shape():
    et = event_time(1700000000, 123456789)
    wire = encode(et)
    assert wire[0] == 0xD7 and wire[1] == 0x00 and len(wire) == 10
    back = decode(wire)
    assert isinstance(back, Ext)
    assert struct.unpack(">II", back.data) == (1700000000, 123456789)


def test_forward_chunk_roundtrip_spark(spark):
    from pyspark.sql import functions as F

    from hatchery_spark.operators.fluentd import (
        parse_forward_chunks,
        render_forward_chunks,
    )

    rows = [
        (f"conv-{i}", j, "user" if j % 2 == 0 else "assistant",
         f"turn {i}/{j} with text", "toolA" if i % 2 == 0 else "toolB")
        for i in range(10) for j in range(4)
    ]
    turns = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
        "tool string",
    ).withColumn("ts", F.to_timestamp(F.lit("2024-03-01 10:00:00")))

    chunks = render_forward_chunks(turns)
    parsed = parse_forward_chunks(chunks).orderBy("conv_id", "turn_idx")
    got = parsed.collect()
    assert len(got) == 40
    by_key = {(r.conv_id, r.turn_idx): r for r in got}
    for conv_id, turn_idx, role, text, tool in rows:
        r = by_key[(conv_id, turn_idx)]
        assert r.message == text and r.role == role and r.tag == tool
        assert r.nsec == turn_idx * 1000003 % 1_000_000_000

    # corrupt chunk (flip a payload byte) must fail strict parsing
    one = chunks.limit(1).collect()[0].chunk
    bad = bytes(one[:-1]) + bytes([one[-1] ^ 0xFF])
    bad_df = spark.createDataFrame([(bad,)], "chunk binary")
    with pytest.raises(Exception):
        parse_forward_chunks(bad_df).collect()
