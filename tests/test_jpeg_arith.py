"""Arithmetic-coded JPEG (SOF9): coder core, statistical models, decode
integration. No Spark session needed — pure numpy/stdlib."""

from __future__ import annotations

import numpy as np
import pytest

from hatchery_spark.functions.jpeg import decode_jpeg, encode_jpeg, encode_jpeg_gray
from hatchery_spark.functions.jpeg_arith import (
    AC_STAT_BINS,
    DC_STAT_BINS,
    FIXED_BIN,
    QM_STATES,
    ArithDecoder,
    ArithEncoder,
    encode_jpeg_arith,
    encode_jpeg_gray_arith,
    new_stats,
)


def test_qm_table_shape_and_transitions():
    assert len(QM_STATES) == 114  # 113 adaptive + the fixed bin
    for i, (qe, nmps, nlps, switch) in enumerate(QM_STATES):
        assert 0 < qe <= 0x5B12
        assert 0 <= nmps < len(QM_STATES)
        assert 0 <= nlps < len(QM_STATES)
        assert switch in (0, 1)
    # the fixed bin never leaves itself (non-adaptive sign coding)
    qe, nmps, nlps, switch = QM_STATES[FIXED_BIN]
    assert (nmps, nlps, switch) == (FIXED_BIN, FIXED_BIN, 0)


def test_coder_roundtrip_random_decisions():
    """Raw coder: a deterministic pseudo-random decision stream with several
    contexts survives encode→flush→decode exactly."""
    rng = np.random.default_rng(42)
    decisions = rng.integers(0, 2, 5000).tolist()
    ctx_pick = rng.integers(0, 4, 5000).tolist()

    enc = ArithEncoder()
    bins = new_stats(4)
    for d, c in zip(decisions, ctx_pick):
        enc.encode(d, bins[c])
    payload = enc.flush() + b"\xff\xd9"

    dec = ArithDecoder(payload, 0)
    bins2 = new_stats(4)
    got = [dec.decode(bins2[c]) for c in ctx_pick]
    assert got == decisions


def test_coder_skewed_stream_compresses():
    """1000 MPS-heavy decisions should compress far below 125 bytes — the
    adaptation machine must actually adapt (a broken Table D.3 still
    round-trips but cannot compress)."""
    enc = ArithEncoder()
    bins = new_stats(1)
    decisions = [0] * 990 + [1] * 10
    for d in decisions:
        enc.encode(d, bins[0])
    payload = enc.flush()
    assert len(payload) < 40
    dec = ArithDecoder(payload + b"\xff\xd9", 0)
    bins2 = new_stats(1)
    assert [dec.decode(bins2[0]) for _ in decisions] == decisions


def test_solid_gray_arith_decodes_exactly():
    for gray in (0, 5, 128, 251, 255):
        for sub in ("444", "420"):
            img = decode_jpeg(encode_jpeg_arith(19, 13, gray, subsampling=sub))
            assert img.shape == (13, 19, 3)
            assert (img == gray).all()


def test_arith_restart_markers():
    img = decode_jpeg(encode_jpeg_arith(33, 21, 99, "420", restart_interval=2))
    assert img.shape == (21, 33, 3) and (img == 99).all()


def test_arith_pixels_bit_identical_to_huffman():
    """Same quantized coefficients through both entropy codecs must decode
    to the SAME pixels — the strongest cross-codec check available without
    external conformance fixtures."""
    rng = np.random.default_rng(3)
    img = np.clip(rng.normal(128, 40, (24, 31)), 0, 255).round()
    hf = decode_jpeg(encode_jpeg_gray(img))
    ar = decode_jpeg(encode_jpeg_gray_arith(img))
    assert (hf == ar).all()
    assert np.abs(ar[:, :, 0].astype(int) - img.astype(int)).max() <= 2
    # with restarts too (coder + stats reset at every RST)
    ar_rst = decode_jpeg(encode_jpeg_gray_arith(img, restart_interval=3))
    assert (ar_rst == hf).all()


def test_arith_beats_huffman_on_smooth_content():
    smooth = np.tile(np.linspace(100, 160, 48).round(), (40, 1))
    assert len(encode_jpeg_gray_arith(smooth)) < len(encode_jpeg_gray(smooth))


def test_entropy_bytes_are_marker_safe():
    """Every 0xFF inside the entropy segment must be followed by a stuffed
    0x00 (or be the terminating marker) — decoder-visible framing rule."""
    rng = np.random.default_rng(9)
    img = np.clip(rng.normal(128, 60, (32, 32)), 0, 255).round()
    payload = encode_jpeg_gray_arith(img)
    # find SOS, skip its header, then scan the entropy bytes
    sos = payload.index(b"\xff\xda")
    seg_len = int.from_bytes(payload[sos + 2 : sos + 4], "big")
    p = sos + 2 + seg_len
    while p < len(payload) - 1:
        if payload[p] == 0xFF:
            nxt = payload[p + 1]
            assert nxt in (0x00, 0xD9) or 0xD0 <= nxt <= 0xD7
            p += 2
        else:
            p += 1
    # and it still decodes
    assert decode_jpeg(payload).shape == (32, 32, 3)


def test_progressive_arith_bit_identical_to_huffman():
    """SOF10 full chain (DC/AC first at al_max + refinements down to al=0)
    must reconstruct the exact coefficients → pixels identical to the
    sequential Huffman decode; al_max=2 exercises multi-level refinement
    (corrections applied twice per coefficient)."""
    from hatchery_spark.functions.jpeg_arith import (
        encode_jpeg_gray_arith_progressive,
    )

    rng = np.random.default_rng(3)
    img = np.clip(rng.normal(128, 40, (24, 31)), 0, 255).round()
    hf = decode_jpeg(encode_jpeg_gray(img))
    for al_max in (1, 2):
        pa = decode_jpeg(encode_jpeg_gray_arith_progressive(img, al_max=al_max))
        assert (pa == hf).all()
    pr = decode_jpeg(
        encode_jpeg_gray_arith_progressive(img, al_max=1, restart_interval=4)
    )
    assert (pr == hf).all()


def test_differential_sequential_stays_gated():
    from hatchery_spark.functions.jpeg import JPEG_MAGIC
    from hatchery_spark.functions.multimodal import DecoderUnavailable

    bad = encode_jpeg_arith(16, 12, 50)
    # flip SOF9 -> SOF13 (differential sequential arithmetic): outside a
    # hierarchical frame sequence this process is the honest gated channel
    # (SOF11 lossless-arithmetic decodes for real since round 5)
    idx = bad.index(b"\xff\xc9")
    bad = bad[:idx] + b"\xff\xcd" + bad[idx + 2 :]
    assert bad.startswith(JPEG_MAGIC)
    with pytest.raises(DecoderUnavailable):
        decode_jpeg(bad)


def test_dc_conditioning_bounds_parsed_from_dac():
    """encode_jpeg_arith writes a DAC with defaults; a payload with a
    nonstandard U still round-trips because encoder and decoder share the
    conditioning (regression for the DAC parse path)."""
    b = encode_jpeg_arith(17, 9, 200)
    assert b"\xff\xcc" in b  # DAC segment present
    assert (decode_jpeg(b) == 200).all()
