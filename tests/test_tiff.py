"""Baseline TIFF 6.0: LZW early-change, PackBits, predictor, palette,
byte orders, multi-strip."""

from __future__ import annotations

import numpy as np
import pytest

from hatchery_spark.functions.multimodal import DecoderUnavailable
from hatchery_spark.functions.tiff import (
    decode_tiff,
    encode_tiff,
    lzw_decode,
    lzw_encode,
    packbits_decode,
    packbits_encode,
)


def _grad(h, w, a=5, b=9, c=0):
    yy, xx = np.indices((h, w))
    return ((xx * a + yy * b + c) % 256).astype(np.uint8)


def test_lzw_roundtrip_table_pressure():
    rng = np.random.default_rng(3)
    cases = [
        b"",
        b"a" * 10_000,  # long single-symbol runs (KwKwK path)
        bytes(rng.integers(0, 256, 20_000, dtype=np.uint8)),  # incompressible
        bytes(rng.integers(0, 4, 60_000, dtype=np.uint8)),  # fills the table
        bytes(range(256)) * 40,
    ]
    for data in cases:
        assert lzw_decode(lzw_encode(data)) == data


def test_lzw_early_change_width_boundary():
    """Force emission counts straddling the 2^w boundaries — the classic
    early-change off-by-one corrupts exactly these streams."""
    # distinct pairs force one table add per 2 bytes → crosses 512/1024
    data = bytes(
        (i // 256) % 256 if i % 2 else i % 256 for i in range(8192)
    )
    assert lzw_decode(lzw_encode(data)) == data


def test_packbits_roundtrip():
    rng = np.random.default_rng(4)
    for data in [b"", b"x", b"a" * 300, b"ab" * 200,
                 bytes(rng.integers(0, 3, 5000, dtype=np.uint8))]:
        assert packbits_decode(packbits_encode(data)) == data


@pytest.mark.parametrize("compression", [1, 5, 32773])
@pytest.mark.parametrize("big_endian", [False, True])
def test_gray_rgb_all_compressions(compression, big_endian):
    gray = _grad(23, 31)
    out = decode_tiff(
        encode_tiff(gray, compression=compression, big_endian=big_endian,
                    rows_per_strip=7)
    )
    assert (out[:, :, 0] == gray).all() and (out[:, :, 2] == gray).all()
    yy, xx = np.indices((14, 18))
    rgb = np.stack([(xx + yy + c * 30) % 256 for c in range(3)], axis=2).astype(
        np.uint8
    )
    out = decode_tiff(
        encode_tiff(rgb, compression=compression, big_endian=big_endian,
                    rows_per_strip=5)
    )
    assert (out == rgb).all()


def test_predictor_whitezero_palette():
    gray = _grad(19, 27)
    out = decode_tiff(encode_tiff(gray, compression=5, predictor=2,
                                  rows_per_strip=6))
    assert (out[:, :, 0] == gray).all()
    out = decode_tiff(encode_tiff(gray, photometric=0))
    assert (out[:, :, 0] == gray).all()  # WhiteIsZero inverts back
    yy, xx = np.indices((12, 16))
    idx = ((xx + yy) % 16).astype(np.uint8)
    cmap = np.stack(
        [np.arange(16) * 17, 255 - np.arange(16) * 17, np.arange(16) * 3],
        axis=1,
    ).astype(np.uint8)
    out = decode_tiff(encode_tiff(idx, colormap=cmap))
    assert (out == cmap[idx]).all()


def test_unsupported_gated():
    gray = _grad(8, 8)
    payload = bytearray(encode_tiff(gray))
    with pytest.raises(DecoderUnavailable):
        decode_tiff(b"not a tiff")
    # patch Compression tag value to 7 (new-style JPEG): honest gate
    # (entries are sorted by tag; find 259 in the IFD)
    n = payload[8] | (payload[9] << 8)
    for t in range(n):
        off = 10 + t * 12
        if payload[off] | (payload[off + 1] << 8) == 259:
            payload[off + 8] = 7
    with pytest.raises(DecoderUnavailable):
        decode_tiff(bytes(payload))
