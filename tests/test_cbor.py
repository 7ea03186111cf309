"""CBOR codec vs RFC 8949 Appendix A's own example table."""

from __future__ import annotations

import math

import pytest

from hatchery_spark.functions.cbor import UNDEFINED, Tag, decode, encode

# (hex, value) straight from RFC 8949 Appendix A
VECTORS = [
    ("00", 0), ("01", 1), ("0a", 10), ("17", 23), ("1818", 24),
    ("1819", 25), ("1864", 100), ("1903e8", 1000),
    ("1a000f4240", 1000000), ("1b000000e8d4a51000", 1000000000000),
    ("1bffffffffffffffff", 18446744073709551615),
    ("20", -1), ("29", -10), ("3863", -100), ("3903e7", -1000),
    ("f90000", 0.0), ("f98000", -0.0), ("f93c00", 1.0),
    ("fb3ff199999999999a", 1.1), ("f93e00", 1.5), ("f97bff", 65504.0),
    ("fa47c35000", 100000.0),
    ("fa7f7fffff", 3.4028234663852886e38),
    ("fb7e37e43c8800759c", 1.0e300),
    ("f90001", 5.960464477539063e-8), ("f90400", 6.103515625e-5),
    ("f9c400", -4.0), ("fbc010666666666666", -4.1),
    ("f97c00", math.inf), ("f9fc00", -math.inf),
    ("fa7f800000", math.inf), ("faff800000", -math.inf),
    ("fb7ff0000000000000", math.inf), ("fbfff0000000000000", -math.inf),
    ("f4", False), ("f5", True), ("f6", None), ("f7", UNDEFINED),
    ("f0", 16), ("f8ff", 255),
    ("c074323031332d30332d32315432303a30343a30305a",
     Tag(0, "2013-03-21T20:04:00Z")),
    ("c11a514b67b0", Tag(1, 1363896240)),
    ("c1fb41d452d9ec200000", Tag(1, 1363896240.5)),
    ("d74401020304", Tag(23, b"\x01\x02\x03\x04")),
    ("d818456449455446", Tag(24, b"dIETF")),
    ("d82076687474703a2f2f7777772e6578616d706c652e636f6d",
     Tag(32, "http://www.example.com")),
    ("40", b""), ("4401020304", b"\x01\x02\x03\x04"),
    ("60", ""), ("6161", "a"), ("6449455446", "IETF"),
    ("62225c", '"\\'), ("62c3bc", "ü"), ("63e6b0b4", "水"),
    ("64f0908591", "\U00010151"),
    ("80", []), ("83010203", [1, 2, 3]),
    ("8301820203820405", [1, [2, 3], [4, 5]]),
    ("98190102030405060708090a0b0c0d0e0f101112131415161718181819",
     list(range(1, 26))),
    ("a0", {}), ("a201020304", {1: 2, 3: 4}),
    ("a26161016162820203", {"a": 1, "b": [2, 3]}),
    ("826161a161626163", ["a", {"b": "c"}]),
    ("a56161614161626142616361436164614461656145",
     {"a": "A", "b": "B", "c": "C", "d": "D", "e": "E"}),
    # indefinite-length forms
    ("5f42010243030405ff", b"\x01\x02\x03\x04\x05"),
    ("7f657374726561646d696e67ff", "streaming"),
    ("9fff", []),
    ("9f018202039f0405ffff", [1, [2, 3], [4, 5]]),
    ("9f01820203820405ff", [1, [2, 3], [4, 5]]),
    ("83018202039f0405ff", [1, [2, 3], [4, 5]]),
    ("83019f0203ff820405", [1, [2, 3], [4, 5]]),
    ("9f0102030405060708090a0b0c0d0e0f101112131415161718181819ff",
     list(range(1, 26))),
    ("bf61610161629f0203ffff", {"a": 1, "b": [2, 3]}),
    ("826161bf61626163ff", ["a", {"b": "c"}]),
    ("bf6346756ef563416d7421ff", {"Fun": True, "Amt": -2}),
]

# indefinite-length vectors (decode-only: the encoder always emits definite)
INDEFINITE = {
    "5f42010243030405ff", "7f657374726561646d696e67ff", "9fff",
    "9f018202039f0405ffff", "9f01820203820405ff", "83018202039f0405ff",
    "83019f0203ff820405",
    "9f0102030405060708090a0b0c0d0e0f101112131415161718181819ff",
    "bf61610161629f0203ffff", "826161bf61626163ff",
    "bf6346756ef563416d7421ff",
}

# the definite-length, canonically-headed subset must ENCODE to the same hex
CANONICAL = {
    h for h, _ in VECTORS
    if h not in INDEFINITE
    and h not in ("f0", "f8ff")  # simple values decode to plain ints
}


@pytest.mark.parametrize("hex_, want", VECTORS, ids=[h for h, _ in VECTORS])
def test_appendix_a_decode(hex_, want):
    got = decode(bytes.fromhex(hex_))
    if isinstance(want, float) and math.isnan(want):  # pragma: no cover
        assert math.isnan(got)
    else:
        assert got == want
        if isinstance(want, float):
            assert math.copysign(1, got) == math.copysign(1, want)


def test_appendix_a_nan_vectors():
    for h in ("f97e00", "fa7fc00000", "fb7ff8000000000000"):
        assert math.isnan(decode(bytes.fromhex(h)))


@pytest.mark.parametrize("hex_", sorted(CANONICAL))
def test_appendix_a_encode_canonical(hex_):
    v = decode(bytes.fromhex(hex_))
    if isinstance(v, float) and hex_[:2] != "fb":
        pytest.skip("shorter-float form; encoder emits binary64")
    assert encode(v).hex() == hex_


def test_roundtrip_structures():
    v = {"i": 2**40, "neg": -(2**33), "b": b"\x00\xff", "t": "héllo",
         "arr": [True, False, None, UNDEFINED, Tag(1, 3.25)],
         "nested": {"x": [1, {"y": -1}]}}
    assert decode(encode(v)) == v


def test_errors():
    with pytest.raises(ValueError, match="truncated"):
        decode(bytes.fromhex("1a0102"))
    with pytest.raises(ValueError, match="trailing"):
        decode(bytes.fromhex("0000"))
    with pytest.raises(ValueError, match="break"):
        decode(bytes.fromhex("ff"))
    with pytest.raises(ValueError, match="reserved"):
        decode(bytes.fromhex("1c"))
