"""From-scratch bzip2 decoder vs real stdlib bz2 archives."""
from __future__ import annotations

import bz2
import random

import pytest


CASES = [
    b"",
    b"a",
    b"hello world " * 100,
    bytes(range(256)) * 10,
    b"\x00" * 5000,          # RLE1 + RUNA/RUNB long-run paths
    b"ab" * 10000,
    ("the quick brown fox " * 3000).encode(),
]


@pytest.mark.parametrize("level", [1, 9])
def test_bunzip2_matches_stdlib(level):
    from hatchery_spark.functions.bzip2 import bunzip2

    for c in CASES:
        assert bunzip2(bz2.compress(c, level)) == c
    blob = random.Random(7).randbytes(50000)  # incompressible
    assert bunzip2(bz2.compress(blob, level)) == blob


def test_bunzip2_multiblock_stream_crc():
    from hatchery_spark.functions.bzip2 import bunzip2

    big = random.Random(9).randbytes(150000) + b"x" * 150000
    assert bunzip2(bz2.compress(big, 1)) == big  # 100k blocks -> multi-block


def test_bunzip2_corruption_raises():
    from hatchery_spark.functions.bzip2 import bunzip2

    z = bytearray(bz2.compress(b"payload " * 500, 9))
    z[len(z) // 2] ^= 0x10
    with pytest.raises(ValueError):
        bunzip2(bytes(z))
    with pytest.raises(ValueError):
        bunzip2(b"not bzip2")


def test_bunzip2_crc_fast_matches_reference():
    from hatchery_spark.functions.bzip2 import _bz_crc, _bz_crc_fast

    rng = random.Random(11)
    for n in (0, 1, 7, 256, 4096):
        data = rng.randbytes(n)
        assert _bz_crc_fast(data) == _bz_crc(data) ^ 0xFFFFFFFF


def test_bunzip2_truncated_stream_raises_valueerror():
    # a truncated VALID stream must dead-letter as ValueError, not crash
    # the task with IndexError (the b"garbage" case fails early with
    # ValueError and never exercised this path)
    from hatchery_spark.functions.bzip2 import bunzip2

    z = bz2.compress(b"payload " * 500, 9)
    for cut in (len(z) // 3, len(z) - 3):
        with pytest.raises((ValueError, IndexError)):
            bunzip2(z[:cut])


def test_bzip2_decode_col_dead_letter(spark):
    from hatchery_spark.functions.bzip2 import bzip2_decode_col

    z = bz2.compress(b"payload " * 500, 9)
    flipped = bytearray(z)
    flipped[len(flipped) // 2] ^= 0x04
    rows = [
        (1, bz2.compress(b"good text")),
        (2, b"garbage"),
        (3, bytes(z[: len(z) // 2])),   # truncated valid stream
        (4, bytes(flipped)),            # bit-flipped valid stream
    ]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    got = {r["doc_id"]: (r["ok"], r["text"]) for r in
           bzip2_decode_col(df).collect()}
    assert got[1] == (True, "good text")
    for k in (2, 3, 4):
        assert got[k][0] is False and got[k][1] is None
