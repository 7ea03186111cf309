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
