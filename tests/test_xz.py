"""From-scratch xz/LZMA2 decoder vs real stdlib lzma archives."""
from __future__ import annotations

import lzma
import random

import pytest


CASES = [
    b"",
    b"a",
    b"hello world " * 200,
    bytes(range(256)) * 40,
    b"\x00" * 60000,
    ("the quick brown fox jumps " * 5000).encode(),
]


@pytest.mark.parametrize("check", [lzma.CHECK_CRC32, lzma.CHECK_CRC64,
                                   lzma.CHECK_SHA256, lzma.CHECK_NONE])
def test_unxz_matches_stdlib_checks(check):
    from hatchery_spark.functions.xz import unxz

    for c in CASES:
        z = lzma.compress(c, format=lzma.FORMAT_XZ, check=check, preset=6)
        assert unxz(z) == c


@pytest.mark.parametrize("preset", [0, 9 | lzma.PRESET_EXTREME])
def test_unxz_presets_and_incompressible(preset):
    from hatchery_spark.functions.xz import unxz

    blob = random.Random(7).randbytes(80000)
    assert unxz(lzma.compress(blob, preset=preset)) == blob


def test_unxz_multichunk():
    from hatchery_spark.functions.xz import unxz

    big = (b"lorem ipsum dolor " * 150000)  # > 2 MiB unpacked: several chunks
    assert unxz(lzma.compress(big, preset=1)) == big


def test_unxz_corruption_raises():
    from hatchery_spark.functions.xz import unxz

    z = bytearray(lzma.compress(b"payload " * 2000, preset=6))
    z[len(z) // 2] ^= 0x01
    with pytest.raises((ValueError, IndexError)):
        unxz(bytes(z))
    with pytest.raises(ValueError):
        unxz(b"not xz data....")
    # truncated footer
    good = lzma.compress(b"x" * 100)
    with pytest.raises((ValueError, IndexError)):
        unxz(good[:-4])


def test_xz_decode_col_dead_letter(spark):
    from hatchery_spark.functions.xz import xz_decode_col

    rows = [(1, lzma.compress(b"good text")), (2, b"garbage")]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    got = {r["doc_id"]: (r["ok"], r["text"]) for r in
           xz_decode_col(df).collect()}
    assert got[1] == (True, "good text")
    assert got[2][0] is False and got[2][1] is None
