"""MP4/ISO-BMFF: box framing, v0/v1 headers, track typing, error channels."""

import pandas as pd
import pytest

from hatchery_spark.functions.mp4 import encode_mp4, parse_mp4_meta
from hatchery_spark.functions.multimodal import DecoderUnavailable


def test_basic_video_only_v0():
    m = parse_mp4_meta(encode_mp4("isom", 600, 2100, [("vide", 320.0, 240.0)]))
    assert m.major_brand == "isom"
    assert m.timescale == 600 and m.duration == 2100
    assert m.duration_sec == 3.5
    assert (m.video_tracks, m.audio_tracks, m.n_tracks) == (1, 0, 1)
    assert (m.width, m.height) == (320.0, 240.0)


def test_v1_64bit_headers_and_audio_track():
    m = parse_mp4_meta(
        encode_mp4("mp42", 1200, 4800,
                   [("vide", 160.0, 96.0), ("soun", 0.0, 0.0)], versions=1)
    )
    assert m.duration_sec == 4.0
    assert (m.video_tracks, m.audio_tracks, m.n_tracks) == (1, 1, 2)
    assert (m.width, m.height) == (160.0, 96.0)


def test_largesize_and_free_box_skipped():
    m = parse_mp4_meta(
        encode_mp4("avc1", 600, 600, [("vide", 16.0, 16.0)],
                   largesize_mdat=True, free_box=True)
    )
    assert m.duration_sec == 1.0 and m.major_brand == "avc1"


def test_fractional_fixed_point_dims():
    m = parse_mp4_meta(encode_mp4("isom", 600, 600, [("vide", 100.5, 50.25)]))
    assert (m.width, m.height) == (100.5, 50.25)


def test_truncated_payload_is_framing_error():
    content = encode_mp4("isom", 600, 600, [("vide", 16.0, 16.0)])
    with pytest.raises(ValueError):
        parse_mp4_meta(content[:-20])


def test_non_bmff_is_decoder_unavailable():
    with pytest.raises(DecoderUnavailable):
        parse_mp4_meta(b"\x42" * 64)


def test_missing_moov_is_error():
    content = encode_mp4("isom", 600, 600, [("vide", 16.0, 16.0)])
    # keep only the ftyp box (its declared size is bytes 0..3)
    import struct
    (ftyp_size,) = struct.unpack(">I", content[:4])
    with pytest.raises(ValueError):
        parse_mp4_meta(content[:ftyp_size])


def test_mp4_meta_features_three_channels(spark):
    from hatchery_spark.functions.multimodal import (
        mp4_meta_features,
        synthetic_mp4_media_df,
    )

    out = mp4_meta_features(synthetic_mp4_media_df(spark, 48)).toPandas()
    out = out.set_index("media_id").sort_index()
    for i in range(48):
        r = out.loc[i]
        if i % 16 == 11:
            assert r["decode_status"] == "decoder_unavailable"
            assert pd.isna(r["major_brand"]) and pd.isna(r["duration_sec"])
        elif i % 16 == 15:
            assert r["decode_status"] == "decode_error"
        else:
            assert r["decode_status"] == "ok"
            assert r["major_brand"] == ["isom", "mp42", "avc1"][i % 3]
            assert r["duration_sec"] == (3 + i % 5) + 0.5 * (i % 2)
            assert r["n_tracks"] == 1 + i % 2
            assert r["width"] == 16.0 * (10 + i % 6)
            assert r["height"] == 16.0 * (6 + i % 4)
