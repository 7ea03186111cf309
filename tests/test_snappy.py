"""Snappy block codec: wire vectors per element type, roundtrips, bounds."""

import pytest

from hatchery_spark.functions.snappy import (
    snappy_compress,
    snappy_decompress,
)


def test_empty_and_tiny():
    for data in (b"", b"a", b"abc"):
        z = snappy_compress(data)
        assert snappy_decompress(z) == data
    assert snappy_compress(b"") == b"\x00"  # varint(0), no elements


def test_short_literal_wire_format():
    z = snappy_compress(b"abcd")  # no self-match possible
    # varint(4), literal tag (len-1)<<2 = 0x0c, payload
    assert z == b"\x04\x0cabcd"


def test_rle_overlapping_copy():
    data = b"a" * 100
    z = snappy_compress(data)
    assert snappy_decompress(z) == data
    assert len(z) < 20  # one literal + overlapping copies
    # wire: varint(100)=0x64, literal "aaaa", then copy offset<len (RLE)
    assert z[0] == 100 and (z[1] & 3) == 0


def test_long_literal_extended_length():
    # incompressible-ish: all distinct 2-byte pairs, length > 60
    data = bytes(range(256)) * 2  # has a match at offset 256
    z = snappy_compress(data)
    assert snappy_decompress(z) == data
    one = bytes(range(200))  # pure literal > 60 → 1-byte extended length
    z1 = snappy_compress(one)
    # varint(200) = 2 bytes, then tag 60<<2, then len-1 byte
    assert z1[2] >> 2 == 60 and z1[3] == 199
    assert snappy_decompress(z1) == one


def test_copy1_vs_copy2_selection():
    # small offset + len in 4..11 → copy-1 (tag & 3 == 1 somewhere)
    data = b"0123456789abcdef" * 8
    z = snappy_compress(data)
    assert snappy_decompress(z) == data
    kinds = set()
    pos = 1  # skip 1-byte varint (len 128)
    pos = 2
    while pos < len(z):
        tag = z[pos]
        kinds.add(tag & 3)
        if tag & 3 == 0:
            ln = tag >> 2
            if ln >= 60:
                nb = ln - 59
                ln = int.from_bytes(z[pos + 1 : pos + 1 + nb], "little")
                pos += nb
            pos += 1 + ln + 1
        elif tag & 3 == 1:
            pos += 2
        elif tag & 3 == 2:
            pos += 3
        else:
            pos += 5
    assert 1 in kinds or 2 in kinds


def test_long_match_chunking():
    data = b"xy" + b"z" * 500 + b"xy" + b"z" * 500
    z = snappy_compress(data)
    assert snappy_decompress(z) == data


def test_decoder_rejects_bad_offset():
    # copy-2 with offset 5 but only 4 bytes of output so far
    bad = b"\x08" + b"\x0c" + b"abcd" + bytes([(3 << 2) | 2, 5, 0])
    with pytest.raises(ValueError):
        snappy_decompress(bad)


def test_decoder_rejects_length_mismatch():
    good = snappy_compress(b"abcdef")
    tampered = bytes([99]) + good[1:]
    with pytest.raises(ValueError):
        snappy_decompress(tampered)


def test_compression_actually_compresses():
    data = (b"the quick brown fox jumps over the lazy dog. " * 50)
    z = snappy_compress(data)
    assert len(z) < len(data) // 3
    assert snappy_decompress(z) == data


def test_random_ish_roundtrip():
    # deterministic pseudo-random bytes (LCG), mixed compressibility
    x, out = 12345, bytearray()
    for _ in range(10_000):
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        out.append((x >> 16) & 0xFF if x & 1 else 65)
    data = bytes(out)
    assert snappy_decompress(snappy_compress(data)) == data
