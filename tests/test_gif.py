"""GIF codec: LZW roundtrips, interlace, compositing/disposal, frame stats."""

import numpy as np
import pytest

from hatchery_spark.functions.gif import decode_gif, encode_gif
from hatchery_spark.functions.multimodal import DecoderUnavailable

PAL4 = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)


def _rand_frame(rng, h=23, w=31, n=4):
    return rng.integers(0, n, size=(h, w)).astype(np.uint8)


def test_single_frame_roundtrip_and_interlace():
    rng = np.random.default_rng(4)
    f = _rand_frame(rng)
    for interlace in (False, True):
        frames, delays = decode_gif(encode_gif([f], PAL4, interlace=interlace))
        assert frames.shape == (1, 23, 31, 3)
        assert (frames[0] == PAL4[f]).all(), interlace


def test_animation_frames_and_delays():
    rng = np.random.default_rng(5)
    f1, f2 = _rand_frame(rng), _rand_frame(rng)
    frames, delays = decode_gif(
        encode_gif([f1, f2], PAL4, delays=[5, 10], disposals=[1, 1])
    )
    assert delays == [5, 10]
    assert (frames[0] == PAL4[f1]).all() and (frames[1] == PAL4[f2]).all()


def test_transparency_composites_over_previous_frame():
    rng = np.random.default_rng(6)
    f1 = _rand_frame(rng)
    f2 = np.zeros((23, 31), dtype=np.uint8)
    f2[5:10, 5:10] = 2
    frames, _ = decode_gif(encode_gif([f1, f2], PAL4, transparent=0,
                                      disposals=[1, 1]))
    want = PAL4[f1].copy()
    want[5:10, 5:10] = PAL4[2]
    assert (frames[1] == want).all()


def test_disposal_restore_background_and_previous():
    rng = np.random.default_rng(7)
    f1, f2, f3 = _rand_frame(rng), _rand_frame(rng), _rand_frame(rng)
    # disposal 2: after frame 1, canvas resets to bg — frame 2 (full canvas)
    # overwrites it all, so frame 2 must equal its own pixels exactly
    frames, _ = decode_gif(encode_gif([f1, f2, f3], PAL4, disposals=[2, 1, 1]))
    assert (frames[1] == PAL4[f2]).all()
    # disposal 3: frame 2 is transparent-patched over frame 1, then RESTORED —
    # frame 3's transparent pixels must show frame 1 (not frame 2)
    patch = np.zeros((23, 31), dtype=np.uint8)
    patch[0:4, 0:4] = 3
    frames, _ = decode_gif(
        encode_gif([f1, patch, patch], PAL4, transparent=0, disposals=[1, 3, 1])
    )
    want2 = PAL4[f1].copy()
    want2[0:4, 0:4] = PAL4[3]
    assert (frames[1] == want2).all()
    assert (frames[2] == want2).all()  # previous (frame-1 canvas) restored


def test_256_color_lzw_width_growth():
    rng = np.random.default_rng(8)
    pal = rng.integers(0, 256, size=(256, 3)).astype(np.uint8)
    img = rng.integers(0, 256, size=(64, 64)).astype(np.uint8)
    frames, _ = decode_gif(encode_gif([img], pal))
    assert (frames[0] == pal[img]).all()


def test_corrupt_and_foreign_payloads():
    rng = np.random.default_rng(9)
    payload = encode_gif([_rand_frame(rng)], PAL4)
    with pytest.raises(ValueError):
        decode_gif(payload[: len(payload) // 2])
    with pytest.raises(DecoderUnavailable):
        decode_gif(b"notagif")


def test_decode_media_reports_gif(spark):
    from hatchery_spark.functions.multimodal import (
        decode_media,
        synthetic_gif_media_df,
    )

    out = decode_media(synthetic_gif_media_df(spark, 8)).toPandas()
    out = out.set_index("media_id").sort_index()
    for i in range(8):
        row = out.loc[i]
        assert row["decode_status"] == "ok_gif"
        assert row["width"] == 16 + i % 7 and row["height"] == 10 + i % 5
        n_frames = i % 4 + 1
        want_dur = sum(((i + j) % 3 + 1) * 2 for j in range(n_frames)) * 10
        assert row["duration_ms"] == want_dur
        want_mean = np.mean([10 + 60 * ((i + j) % 4) for j in range(n_frames)])
        assert abs(row["px_mean"] - want_mean) < 1e-9


def test_gif_frame_stats_matches_closed_form(spark):
    from hatchery_spark.functions.multimodal import (
        gif_frame_stats,
        synthetic_gif_media_df,
    )

    out = gif_frame_stats(synthetic_gif_media_df(spark, 12)).toPandas()
    for i in range(12):
        rows = out[out.media_id == i].sort_values("frame_idx")
        assert len(rows) == i % 4 + 1
        t = 0
        for j, (_, r) in enumerate(rows.iterrows()):
            assert r["ts_ms"] == t * 10
            assert r["frame_mean"] == float(10 + 60 * ((i + j) % 4))
            t += ((i + j) % 3 + 1) * 2
