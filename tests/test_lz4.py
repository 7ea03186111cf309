"""LZ4: xxh32 vectors, bidirectional third-party interop, frame checks."""

import random
import struct

import pyarrow as pa
import pytest

from hatchery_spark.functions.lz4 import (
    lz4_block_compress,
    lz4_block_decompress,
    lz4_frame_compress,
    lz4_frame_decompress,
    xxh32,
)


def test_xxh32_public_vectors():
    assert xxh32(b"") == 0x02CC5D05
    assert xxh32(b"", 1) == 0x0B2CB792
    assert xxh32(b"Hello World") == 0xB1FD16EE
    # >16 bytes exercises the 4-lane path
    assert xxh32(b"The quick brown fox jumps over the lazy dog") == 0xE85EA4DE


def _cases():
    random.seed(5)
    return [
        b"",
        b"a",
        b"hello world " * 30,
        b"ab" * 40000,  # pyarrow emits a LINKED-block frame for this
        bytes(random.randrange(256) for _ in range(5000)),
        bytes(random.choice(b"abcd") for _ in range(300000)),
    ]


def test_decode_third_party_frames_and_blocks():
    for d in _cases():
        assert lz4_frame_decompress(bytes(pa.Codec("lz4").compress(d))) == d
        if d:
            assert (
                lz4_block_decompress(bytes(pa.Codec("lz4_raw").compress(d)))
                == d
            )


def test_our_frames_decode_by_third_party():
    for d in _cases():
        mine = lz4_frame_compress(d)
        assert bytes(pa.Codec("lz4").decompress(mine, len(d))) == d
        assert lz4_frame_decompress(mine) == d


def test_block_end_conditions():
    # shorter than any legal match → single literal sequence
    for d in (b"", b"abc", b"abcdefghijkl"):
        z = lz4_block_compress(d)
        assert lz4_block_decompress(z) == d
        if d:
            assert z[0] >> 4 == min(len(d), 15) and (z[0] & 0xF) == 0


def test_frame_checksum_verification():
    good = lz4_frame_compress(b"payload " * 100, checksums=True)
    # corrupt the content checksum (last 4 bytes)
    bad = good[:-1] + bytes([good[-1] ^ 0xFF])
    with pytest.raises(ValueError, match="content checksum"):
        lz4_frame_decompress(bad)
    # corrupt the header checksum byte
    hdr_bad = bytearray(good)
    hdr_bad[14] ^= 0xFF  # HC position: 4 magic + 2 desc + 8 size
    with pytest.raises(ValueError, match="header checksum"):
        lz4_frame_decompress(bytes(hdr_bad))


def test_bad_magic_and_offset():
    with pytest.raises(ValueError, match="magic"):
        lz4_frame_decompress(b"\x00" * 16)
    # block with a match offset beyond produced output
    bad = bytes([0x10]) + b"a" + struct.pack("<H", 9) + b"\x00"
    with pytest.raises(ValueError, match="offset"):
        lz4_block_decompress(bad)
