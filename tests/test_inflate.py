"""Inflate: third-party interop (zlib), block types, malformed streams."""

import random
import zlib

import pytest

from hatchery_spark.functions.inflate import inflate


def _raw(data, level=6):
    c = zlib.compressobj(level, zlib.DEFLATED, -15)
    return c.compress(data) + c.flush()


def test_interop_all_levels_and_block_types():
    random.seed(3)
    cases = [
        b"",
        b"a",
        b"hello world " * 100,
        bytes(random.randrange(256) for _ in range(5000)),  # stored blocks
        b"ab" * 40000,  # multi-block long matches
        bytes(random.choice(b"abcd") for _ in range(100000)),  # dynamic
    ]
    for lvl in (0, 1, 6, 9):  # 0 = stored, low = fixed-ish, high = dynamic
        for d in cases:
            assert inflate(_raw(d, lvl)) == d


def test_overlapping_copy_rle():
    d = b"x" * 10000  # dist=1 overlapping copy chain
    assert inflate(_raw(d)) == d


def test_utf8_text_roundtrip():
    d = ("snow ❄ and 中文 mixed – déjà vu\n" * 500).encode("utf-8")
    assert inflate(_raw(d, 9)) == d


def test_truncated_stream_rejected():
    z = _raw(b"hello world " * 50)
    with pytest.raises(ValueError):
        inflate(z[: len(z) // 2])


def test_stored_block_len_check():
    # hand-build a stored block with corrupted NLEN
    good = _raw(b"abcdef" * 10, 0)
    bad = bytearray(good)
    bad[3] ^= 0xFF  # NLEN byte
    with pytest.raises(ValueError):
        inflate(bytes(bad))


def test_reserved_block_type_rejected():
    with pytest.raises(ValueError):
        inflate(bytes([0b110]))  # bfinal=0? btype=3 → reserved
