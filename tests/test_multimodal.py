import pytest

from hatchery_spark.functions import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.synthetic_media_df(spark, n=30).cache()


def test_schema_and_determinism(spark, media):
    out1 = mm.extract_media_features(media).orderBy("media_id").collect()
    out2 = mm.extract_media_features(media).orderBy("media_id").collect()
    assert out1 == out2
    assert len(out1) == 30
    r = out1[0]
    assert len(r.feature) == 8 and r.decode_status == "ok_fake"
    assert len(r.sha8) == 8 and r.n_bytes > 0


def test_no_raw_bytes_in_output(spark, media):
    cols = mm.extract_media_features(media).columns
    assert "content" not in cols


def test_real_codec_path_is_stubbed(spark, media):
    out = mm.extract_media_features(media, use_real_codecs=True).collect()
    assert all(r.decode_status == "decoder_unavailable" for r in out)
    assert all(r.feature is None for r in out)
    with pytest.raises(mm.DecoderUnavailable):
        mm.real_decode_image(b"xx")


def test_frame_sampling_grid(spark, media):
    frames = mm.sample_video_frames(media, every_ms=500)
    rows = frames.collect()
    assert all(r.frame_ms % 500 == 0 for r in rows)
    n_videos = media.filter("kind = 'video'").count()
    assert frames.select("media_id").distinct().count() == n_videos


def test_ppm_decode_roundtrip_with_comment():
    """Real stdlib PPM parse: gradient pixels + a header comment survive."""
    import numpy as np

    from hatchery_spark.functions.multimodal import decode_ppm

    w, h = 5, 3
    pixels = np.arange(w * h * 3, dtype=np.uint8).reshape(h, w, 3)
    raw = b"P6\n# a comment line\n5 3\n255\n" + pixels.tobytes()
    out = decode_ppm(raw)
    assert out.shape == (3, 5, 3)
    assert (out == pixels).all()


def test_wav_decode_roundtrip():
    import numpy as np

    from hatchery_spark.functions.multimodal import decode_wav, encode_wav

    samples, sr, nch = decode_wav(encode_wav(1600, 8000, -123))
    assert sr == 8000 and len(samples) == 1600 and nch == 1
    assert (samples == -123).all()
    assert np.abs(samples).mean() == 123


def test_stereo_wav_duration_not_doubled(spark):
    """Interleaved stereo has 2 samples per frame — duration must divide by
    the channel count (1 second of 8 kHz stereo is 1000 ms, not 2000)."""
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(np.full(8000 * 2, 5, dtype=np.int16).tobytes())
    df = spark.createDataFrame(
        [(0, "audio", bytearray(buf.getvalue()))],
        "media_id long, kind string, content binary",
    )
    r = mm.decode_media(df).first()
    assert r.decode_status == "ok_wav"
    assert r.duration_ms == 1000, r.duration_ms


def test_decode_media_statuses(spark):
    """Corrupt payloads report decode_error; unknown formats report
    decoder_unavailable; valid PPM/WAV decode for real."""
    from hatchery_spark.functions.multimodal import decode_media, encode_ppm

    rows = [
        (0, "image", bytearray(encode_ppm(4, 2, (9, 9, 9)))),
        (1, "image", bytearray(b"P6\n4 2\n255\n\x01")),  # truncated pixel data
        (2, "video", bytearray(b"\x00unknown")),
    ]
    df = spark.createDataFrame(rows, "media_id long, kind string, content binary")
    out = {r.media_id: r for r in decode_media(df).collect()}
    assert out[0].decode_status == "ok_ppm" and out[0].px_mean == 9.0
    assert out[1].decode_status == "decode_error"
    assert out[2].decode_status == "decoder_unavailable"


def test_real_codec_path_decodes_ppm_features(spark):
    """With a decodable payload, the real path produces features from the
    ACTUAL pixels (solid color 7 → quadrant means all 7, std 0)."""
    rows = [(0, "image", bytearray(mm.encode_ppm(8, 8, (7, 7, 7))), "image/x-ppm",
             8, 8, None)]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    r = mm.extract_media_features(df, use_real_codecs=True).first()
    assert r.decode_status == "ok_real"
    assert r.feature[:5] == [7.0, 7.0, 7.0, 7.0, 7.0] and r.feature[5] == 0.0
