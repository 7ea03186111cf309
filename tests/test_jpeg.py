"""Baseline JPEG codec (functions/jpeg.py) + its Spark decode path.

Reference parity note: the reference pipeline treats media payloads as opaque
bytes end-to-end (falcon client.go — byte-identity projection); the decode
surface here is the LLM-data-pipeline extension, implemented from the public
T.81 spec.
"""

import struct

import numpy as np
import pytest

from hatchery_spark.functions.jpeg import (
    JPEG_MAGIC,
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_gray,
)
from hatchery_spark.functions.multimodal import (
    DecoderUnavailable,
    decode_media,
    real_decode_image,
    synthetic_jpeg_media_df,
)


@pytest.mark.parametrize(
    "gray,sub,rst,w,h",
    [
        (0, "444", 0, 16, 12),
        (255, "420", 0, 17, 13),   # non-multiple-of-16 dims exercise MCU crop
        (100, "444", 2, 24, 12),   # restart markers
        (187, "420", 2, 33, 29),   # 4:2:0 + RST + odd dims
        (7, "420", 0, 8, 8),       # image smaller than one 420 MCU
    ],
)
def test_solid_roundtrip_exact(gray, sub, rst, w, h):
    # unit quantization tables: the only nonzero coefficient is the Y DC term,
    # quantized by 1 — decode is bit-exact, every pixel == gray on all channels
    img = decode_jpeg(encode_jpeg(w, h, gray, sub, rst))
    assert img.shape == (h, w, 3)
    assert img.dtype == np.uint8
    assert (img == gray).all()


def test_gray_arbitrary_content_roundtrip():
    # full decode surface: forward DCT, AC runs/ZRL/EOB, DC prediction.
    # unit quantization → only loss is rounding coefficients to ints; the
    # per-pixel error bound is a couple of LSBs.
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(21, 37)).astype(np.float64)
    dec = decode_jpeg(encode_jpeg_gray(img))
    assert dec.shape == (21, 37, 3)
    assert (dec[:, :, 0] == dec[:, :, 1]).all()  # gray replicates channels
    assert np.abs(dec[:, :, 0].astype(np.float64) - img).max() <= 2.0


def test_gray_roundtrip_with_restart_markers():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(16, 40)).astype(np.float64)
    dec = decode_jpeg(encode_jpeg_gray(img, restart_interval=3))
    assert np.abs(dec[:, :, 0].astype(np.float64) - img).max() <= 2.0


def test_unsupported_modes_are_gated_not_faked():
    progressive_arith = (
        JPEG_MAGIC + struct.pack(">BBH", 0xFF, 0xCA, 8) + bytes(6) + b"\xff\xd9"
    )
    with pytest.raises(DecoderUnavailable):
        decode_jpeg(progressive_arith)
    with pytest.raises(DecoderUnavailable):
        decode_jpeg(b"notajpeg")


# ------------------------------------------------------------- progressive


def test_progressive_gray_equals_sequential_bit_exact():
    """The progressive scan script entropy-codes the SAME quantized
    coefficients as the sequential encoder, so decode must be identical
    down to the last bit — DC first/refine, two spectral AC bands, AC
    refine all exercised."""
    from hatchery_spark.functions.jpeg import encode_jpeg_gray_progressive

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(29, 37)).astype(np.uint8)
    seq = decode_jpeg(encode_jpeg_gray(img))
    prog = decode_jpeg(encode_jpeg_gray_progressive(img))
    assert (seq == prog).all()


def test_progressive_restart_markers_reset_state():
    from hatchery_spark.functions.jpeg import encode_jpeg_gray_progressive

    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, size=(24, 48)).astype(np.uint8)
    seq = decode_jpeg(encode_jpeg_gray(img))
    prog = decode_jpeg(encode_jpeg_gray_progressive(img, restart_interval=3))
    assert (seq == prog).all()


def test_progressive_multi_level_successive_approximation():
    """Al=2 chain: two refinement passes per band (DC and AC), the deepest
    successive-approximation shape real encoders emit."""
    from hatchery_spark.functions.jpeg import encode_jpeg_gray_progressive

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(17, 23)).astype(np.uint8)
    seq = decode_jpeg(encode_jpeg_gray(img))
    scans = (
        (0, 0, 0, 2), (0, 0, 2, 1), (0, 0, 1, 0),
        (1, 63, 0, 2), (1, 63, 2, 1), (1, 63, 1, 0),
    )
    prog = decode_jpeg(encode_jpeg_gray_progressive(img, scans=scans))
    assert (seq == prog).all()


def test_progressive_three_component_solid_closed_form():
    """Interleaved DC scan + per-component all-EOB AC scans (EOBRUN > 1
    with appended length bits); under 4:2:0 the AC scans walk the
    component's own raster, which is smaller than the MCU-padded grid."""
    from hatchery_spark.functions.jpeg import encode_jpeg_progressive

    for sub in ("444", "420"):
        for w, h in ((37, 21), (16, 16), (130, 70)):
            img = decode_jpeg(encode_jpeg_progressive(w, h, 190, subsampling=sub))
            assert img.shape == (h, w, 3)
            assert (img == 190).all(), (sub, w, h)


def test_progressive_truncated_stream_is_an_error():
    from hatchery_spark.functions.jpeg import encode_jpeg_gray_progressive

    rng = np.random.default_rng(14)
    img = rng.integers(0, 256, size=(16, 16)).astype(np.uint8)
    payload = encode_jpeg_gray_progressive(img)
    with pytest.raises(Exception):
        decode_jpeg(payload[: len(payload) - 10])


def test_truncated_stream_is_an_error_not_a_hang():
    payload = encode_jpeg(16, 16, 50)
    with pytest.raises(Exception):
        decode_jpeg(payload[: len(payload) - 8])


def test_real_decode_image_handles_jpeg():
    grid = real_decode_image(encode_jpeg(16, 12, 77))
    assert grid.shape == (12, 16)
    assert float(grid.min()) == float(grid.max()) == 77.0


def test_decode_media_jpeg_statuses(spark):
    out = decode_media(synthetic_jpeg_media_df(spark, 32)).toPandas()
    out = out.set_index("media_id").sort_index()
    for i in range(32):
        # baseline, progressive (i%8==7) AND arithmetic (i%16==15) all decode
        row = out.loc[i]
        assert row["decode_status"] == "ok_jpeg"
        assert row["width"] == 16 + i % 9
        assert row["height"] == 12 + i % 5
        assert row["px_mean"] == float((i * 11) % 256)


def test_ac_refine_bitstream_unit_all_branches():
    """Direct G.1.2.3 encode↔decode on crafted coefficient bands — forces
    the branches random images rarely hit: ZRL inside a refinement scan
    (>15 zero-history run before a newly-nonzero coefficient), correction
    bits buffered across EOB-run blocks (BE), blocks contributing ONLY
    correction bits, and sign handling on negative refinements."""
    from hatchery_spark.functions.jpeg import (
        _BitReader,
        _BitWriter,
        _ScanWriter,
        _SymbolCounter,
        _canonical_codes,
        _custom_table,
        _decode_band,
        _decode_table,
        _enc_ac_refine,
        _point_ac,
    )

    def blk64(**at):
        z = np.zeros(64, dtype=np.int64)
        for k, v in at.items():
            z[int(k[1:])] = v
        return z

    blocks = [
        blk64(z3=5, z50=1, z62=-1),   # history@3 + 46-zero run (ZRL x2) + new
        blk64(),                      # pure EOB-run member
        blk64(z10=2),                 # correction-bit-only block (joins run)
        blk64(z1=1, z2=-4, z40=-1),   # immediate new, negative history, late new
        blk64(z60=1),                 # flushes the pending run with BE bits
    ]

    counter = _SymbolCounter()
    _enc_ac_refine(blocks, 1, 63, 0, counter)
    bits, vals = _custom_table(counter.symbols)
    codes = _canonical_codes(bits, vals)
    bw = _BitWriter()
    _enc_ac_refine(blocks, 1, 63, 0, _ScanWriter(bw, codes))
    bw.flush()
    data = bytes(bw.out) + b"\xff\xd9"

    dec_tab = _decode_table(bits, vals)
    br = _BitReader(data, 0)
    eobrun = [0]
    for zz in blocks:
        # state after the Al=1 first scan: point-transformed, re-scaled
        blk = np.array(
            [_point_ac(int(v), 1) * 2 for v in zz], dtype=np.int32
        )
        _decode_band(br, blk, 1, 63, 1, 0, {}, None, eobrun, None, dec_tab)
        assert (blk[1:] == zz[1:]).all(), (blk[1:], zz[1:])


# ---------------------------------------------------------------- 12-bit


def test_12bit_solid_roundtrip_exact():
    for gray, sub, rst in [(2048, "444", 0), (1793, "420", 2),
                           (2303, "444", 3), (2100, "420", 0)]:
        dec = decode_jpeg(
            encode_jpeg(20, 13, gray, subsampling=sub,
                        restart_interval=rst, precision=12)
        )
        assert dec.dtype == np.uint16
        assert dec.shape == (13, 20, 3)
        assert (dec == gray).all()


def test_12bit_precision_flows_from_sof_not_caller():
    # same bytes, no decode-side hint: precision comes from the SOF1 header
    payload = encode_jpeg(8, 8, 1800, precision=12)
    assert payload[payload.index(b"\xff\xc1") + 4] == 12
    assert (decode_jpeg(payload) == 1800).all()


def test_12bit_fixture_bounds_enforced():
    with pytest.raises(ValueError):
        encode_jpeg(8, 8, 4095, precision=12)  # category > Annex-K table
    with pytest.raises(ValueError):
        encode_jpeg(8, 8, 4096, precision=12)  # out of 12-bit range
    with pytest.raises(ValueError):
        encode_jpeg(8, 8, 100, precision=10)  # only 8/12 legal


def test_8bit_output_dtype_unchanged():
    dec = decode_jpeg(encode_jpeg(8, 8, 77))
    assert dec.dtype == np.uint8 and (dec == 77).all()
