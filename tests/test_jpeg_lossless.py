"""Lossless JPEG (SOF3, T.81 Annex H): exact round trips across predictors,
precisions, point transform, restarts. Pure numpy — no Spark."""

from __future__ import annotations

import numpy as np
import pytest

from hatchery_spark.functions.jpeg import decode_jpeg
from hatchery_spark.functions.jpeg_lossless import encode_jpeg_gray_lossless
from hatchery_spark.functions.multimodal import DecoderUnavailable


@pytest.mark.parametrize("pred", range(1, 8))
def test_lossless_exact_all_predictors(pred):
    rng = np.random.default_rng(5 + pred)
    img = rng.integers(0, 256, (21, 34)).astype(np.int32)
    dec = decode_jpeg(encode_jpeg_gray_lossless(img, predictor=pred))
    assert dec.dtype == np.uint8 and dec.shape == (21, 34, 3)
    assert (dec[:, :, 0].astype(int) == img).all()
    assert (dec[:, :, 0] == dec[:, :, 1]).all()  # grayscale replicate


def test_lossless_16bit_exact_with_wraparound_diffs():
    """Full-range 16-bit noise forces diffs across the whole ±32768 band,
    including the SSSS=16 no-extra-bits case and mod-2^16 wraparound."""
    rng = np.random.default_rng(6)
    img = rng.integers(0, 65536, (17, 23)).astype(np.int64)
    dec = decode_jpeg(encode_jpeg_gray_lossless(img, predictor=4, precision=16))
    assert dec.dtype == np.uint16
    assert (dec[:, :, 0].astype(int) == img).all()


def test_lossless_12bit_exact():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 4096, (11, 9)).astype(np.int64)
    dec = decode_jpeg(encode_jpeg_gray_lossless(img, predictor=6, precision=12))
    assert dec.dtype == np.uint16
    assert (dec[:, :, 0].astype(int) == img).all()


def test_lossless_point_transform():
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (10, 12)).astype(np.int32)
    dec = decode_jpeg(
        encode_jpeg_gray_lossless(img, predictor=2, point_transform=2)
    )
    assert (dec[:, :, 0].astype(int) == (img >> 2) << 2).all()


def test_lossless_restart_markers():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (16, 20)).astype(np.int32)
    dec = decode_jpeg(
        encode_jpeg_gray_lossless(img, predictor=7, restart_interval=37)
    )
    assert (dec[:, :, 0].astype(int) == img).all()


def test_lossless_smooth_content_compresses():
    """A gradient's diffs are tiny — predictive coding must beat raw size."""
    img = np.add.outer(np.arange(64), np.arange(64)).astype(np.int32)
    assert len(encode_jpeg_gray_lossless(img, predictor=4)) < 64 * 64


def test_lossless_rgb_interleaved_exact():
    from hatchery_spark.functions.jpeg_lossless import encode_jpeg_rgb_lossless

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (13, 17, 3)).astype(np.int32)
    for pred in (1, 4, 7):
        dec = decode_jpeg(encode_jpeg_rgb_lossless(img, predictor=pred))
        assert (dec.astype(int) == img).all()
    dec = decode_jpeg(encode_jpeg_rgb_lossless(img, predictor=2, restart_interval=5))
    assert (dec.astype(int) == img).all()


def test_lossless_subsampled_gated():
    import struct

    from hatchery_spark.functions.jpeg import JPEG_MAGIC

    # hand-built SOF3 with UNEQUAL sampling factors (2x1 luma)
    def seg(marker, payload):
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    sof = seg(
        0xC3,
        struct.pack(">BHHB", 8, 4, 4, 3)
        + bytes([1, 0x21, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    dht = seg(0xC4, bytes([0x00]) + bytes([0] * 15 + [1]) + bytes([0]))
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 1, 0, 0]))
    payload = JPEG_MAGIC + sof + dht + sos + b"\x00" + b"\xff\xd9"
    with pytest.raises(DecoderUnavailable):
        decode_jpeg(payload)


# ---------------------------------------------------------------- SOF11


@pytest.mark.parametrize("pred", range(1, 8))
def test_lossless_arith_exact_all_predictors(pred):
    from hatchery_spark.functions.jpeg_lossless import (
        encode_jpeg_gray_lossless_arith,
    )

    yy, xx = np.indices((13, 17))
    img = ((xx * 7 + yy * 3 + pred) % 256).astype(np.int32)
    out = decode_jpeg(encode_jpeg_gray_lossless_arith(img, predictor=pred))
    assert (out[:, :, 0] == img).all()
    assert (out[:, :, 1] == img).all()  # gray replicates


@pytest.mark.parametrize("precision", [2, 8, 12, 16])
def test_lossless_arith_precisions(precision):
    from hatchery_spark.functions.jpeg_lossless import (
        encode_jpeg_gray_lossless_arith,
    )

    yy, xx = np.indices((10, 14))
    img = ((xx * 517 + yy * 9931) % (1 << precision)).astype(np.int32)
    out = decode_jpeg(
        encode_jpeg_gray_lossless_arith(img, predictor=4, precision=precision)
    )
    assert (out[:, :, 0].astype(np.int64) == img).all()


def test_lossless_arith_point_transform_and_restart():
    from hatchery_spark.functions.jpeg_lossless import (
        encode_jpeg_gray_lossless_arith,
    )

    yy, xx = np.indices((12, 16))
    img = ((xx + yy * 5) % 256).astype(np.int32)
    out = decode_jpeg(
        encode_jpeg_gray_lossless_arith(img, predictor=2, point_transform=2)
    )
    assert (out[:, :, 0] == (img >> 2) << 2).all()
    out = decode_jpeg(
        encode_jpeg_gray_lossless_arith(img, predictor=7, restart_interval=13)
    )
    assert (out[:, :, 0] == img).all()


def test_lossless_arith_matches_huffman_decode():
    """The two entropy codings of the same samples decode BIT-IDENTICAL —
    the strongest cross-codec invariant available without external
    fixtures (both are lossless, so both must equal the source)."""
    from hatchery_spark.functions.jpeg_lossless import (
        encode_jpeg_gray_lossless_arith,
    )

    yy, xx = np.indices((11, 19))
    img = ((xx * 31 + yy * 17) % 256).astype(np.int32)
    a = decode_jpeg(encode_jpeg_gray_lossless_arith(img, predictor=5))
    h = decode_jpeg(encode_jpeg_gray_lossless(img, predictor=5))
    assert (a == h).all()


def test_lossless_arith_smooth_content_compresses():
    """Adaptation works: a smooth gradient codes well below 1 byte/sample
    (the diffs are constant, so the zero/sign bins converge hard)."""
    from hatchery_spark.functions.jpeg_lossless import (
        encode_jpeg_gray_lossless_arith,
    )

    yy, xx = np.indices((32, 32))
    img = ((xx + yy) % 256).astype(np.int32)
    payload = encode_jpeg_gray_lossless_arith(img, predictor=4)
    assert len(payload) < 32 * 32 // 2


def test_lossless_arith_rgb_interleaved_exact():
    from hatchery_spark.functions.jpeg_lossless import (
        encode_jpeg_rgb_lossless_arith,
    )

    yy, xx = np.indices((9, 13))
    img3 = np.stack(
        [(xx * 3 + yy * 11 + ch * 40) % 256 for ch in range(3)], axis=2
    ).astype(np.int32)
    for pred in (1, 4, 7):
        out = decode_jpeg(encode_jpeg_rgb_lossless_arith(img3, predictor=pred))
        assert (out == img3).all()
    out = decode_jpeg(
        encode_jpeg_rgb_lossless_arith(img3, predictor=5, restart_interval=9)
    )
    assert (out == img3).all()
