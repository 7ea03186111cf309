"""Hierarchical JPEG (T.81 Annex J): pyramids, EXP expansion, differential
lossless refinement, lossy-base correction."""

from __future__ import annotations

import numpy as np
import pytest

from hatchery_spark.functions.jpeg import decode_jpeg
from hatchery_spark.functions.jpeg_hier import (
    encode_jpeg_hier_correction,
    encode_jpeg_hier_lossless_pyramid,
    expand_ref,
)
from hatchery_spark.functions.multimodal import DecoderUnavailable


def _grad(h, w, a=7, b=5, c=0):
    yy, xx = np.indices((h, w))
    return ((xx * a + yy * b + c) % 256).astype(np.int64)


def test_expand_ref_filter():
    p = np.array([[0, 10], [20, 30]], dtype=np.int32)
    out = expand_ref(p, 1, 0)
    # midpoints are (a + b + 1) >> 1, trailing column replicates
    assert out.tolist() == [[0, 5, 10, 10], [20, 25, 30, 30]]
    out = expand_ref(p, 0, 1)
    assert out.tolist() == [[0, 10], [10, 20], [20, 30], [20, 30]]
    out = expand_ref(p, 1, 1)
    assert out.shape == (4, 4)
    assert out[0].tolist() == [0, 5, 10, 10]
    assert out[3].tolist() == [20, 25, 30, 30]


@pytest.mark.parametrize("shape", [(12, 16), (13, 17), (8, 8), (5, 23)])
def test_pyramid_exact(shape):
    img = _grad(*shape)
    out = decode_jpeg(encode_jpeg_hier_lossless_pyramid(img))
    assert out.shape == (*shape, 3)
    assert (out[:, :, 0] == img).all()
    assert (out[:, :, 2] == img).all()


def test_pyramid_restart_and_16bit():
    img = _grad(13, 17)
    out = decode_jpeg(encode_jpeg_hier_lossless_pyramid(img, restart_interval=19))
    assert (out[:, :, 0] == img).all()
    yy, xx = np.indices((10, 14))
    img16 = ((xx * 517 + yy * 993) % 65536).astype(np.int64)
    out = decode_jpeg(encode_jpeg_hier_lossless_pyramid(img16, precision=16))
    assert out.dtype == np.uint16
    assert (out[:, :, 0].astype(np.int64) == img16).all()


def test_correction_exact_on_noise():
    """The lossy SOF0 base alone is NOT exact; the SOF7 residual frame
    lands the final image bit-exact — the defining hierarchical property."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(20, 24)).astype(np.int64)
    out = decode_jpeg(encode_jpeg_hier_correction(img))
    assert (out[:, :, 0] == img).all()


def test_multi_component_hier_gated():
    img = _grad(12, 16)
    payload = bytearray(encode_jpeg_hier_lossless_pyramid(img))
    # patch the DHP component count to 3: honest gate, not garbage output
    assert payload[2:4] == b"\xff\xde"
    payload[11] = 3  # SOI(2) + marker(2) + length(2) + P(1) + Y(2) + X(2)
    with pytest.raises(DecoderUnavailable):
        decode_jpeg(bytes(payload))


def test_all_arithmetic_pyramid_exact():
    from hatchery_spark.functions.jpeg_hier import encode_jpeg_hier_pyramid_arith

    img = _grad(13, 17)
    out = decode_jpeg(encode_jpeg_hier_pyramid_arith(img))
    assert (out[:, :, 0] == img).all()
    yy, xx = np.indices((10, 14))
    img16 = ((xx * 517 + yy * 993) % 65536).astype(np.int64)
    out = decode_jpeg(encode_jpeg_hier_pyramid_arith(img16, precision=16))
    assert (out[:, :, 0].astype(np.int64) == img16).all()


def test_differential_dct_stays_gated():
    from hatchery_spark.functions.jpeg_hier import encode_jpeg_hier_lossless_pyramid

    payload = bytearray(encode_jpeg_hier_lossless_pyramid(_grad(12, 16)))
    idx = bytes(payload).index(b"\xff\xc7")
    payload[idx + 1] = 0xC5  # SOF7 → SOF5 (differential sequential DCT)
    with pytest.raises(DecoderUnavailable):
        decode_jpeg(bytes(payload))
