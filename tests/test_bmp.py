"""Windows BMP/DIB: 24/32-bit, row orders, palette, RLE8."""

from __future__ import annotations

import numpy as np
import pytest

from hatchery_spark.functions.bmp import (
    decode_bmp,
    encode_bmp_palette,
    encode_bmp_rgb,
)
from hatchery_spark.functions.multimodal import DecoderUnavailable


def _rgb(h, w, base=0):
    yy, xx = np.indices((h, w))
    return np.stack(
        [(xx * 3 + yy * 7 + base + c * 40) % 256 for c in range(3)], axis=2
    ).astype(np.uint8)


@pytest.mark.parametrize("bpp", [24, 32])
@pytest.mark.parametrize("top_down", [False, True])
def test_rgb_roundtrip(bpp, top_down):
    img = _rgb(13, 17)
    out = decode_bmp(encode_bmp_rgb(img, bpp=bpp, top_down=top_down))
    assert (out == img).all()
    # odd width exercises the 4-byte row padding
    img = _rgb(5, 15)
    out = decode_bmp(encode_bmp_rgb(img, bpp=bpp, top_down=top_down))
    assert (out == img).all()


def test_palette_and_rle8():
    yy, xx = np.indices((12, 16))
    idx = ((xx + yy) % 16).astype(np.uint8)
    pal = np.stack(
        [np.arange(16) * 17, 255 - np.arange(16) * 17, np.arange(16) * 5],
        axis=1,
    ).astype(np.uint8)
    assert (decode_bmp(encode_bmp_palette(idx, pal)) == pal[idx]).all()
    assert (decode_bmp(encode_bmp_palette(idx, pal, rle=True)) == pal[idx]).all()
    rng = np.random.default_rng(5)
    noisy = rng.integers(0, 16, size=(9, 250)).astype(np.uint8)  # absolute mode
    assert (decode_bmp(encode_bmp_palette(noisy, pal, rle=True)) == pal[noisy]).all()
    const = np.full((7, 300), 5, dtype=np.uint8)  # >255 run splitting
    assert (decode_bmp(encode_bmp_palette(const, pal, rle=True)) == pal[const]).all()


def test_unsupported_gated():
    with pytest.raises(DecoderUnavailable):
        decode_bmp(b"not a bmp")
    img = _rgb(4, 4)
    payload = bytearray(encode_bmp_rgb(img))
    payload[28] = 16  # biBitCount → 16-bit (BITFIELDS territory): gated
    with pytest.raises(DecoderUnavailable):
        decode_bmp(bytes(payload))
