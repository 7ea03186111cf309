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


def _filtered_png(img, filters):
    """Encode an (h, w, ch) uint8 array as a PNG using the given per-scanline
    filter types — exercises the decoder's unfiltering paths (spec §9)."""
    import struct
    import zlib

    import numpy as np
    from hatchery_spark.functions.multimodal import PNG_MAGIC

    h, w, ch = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.int32)
    out = bytearray()
    recon = np.zeros((h, stride), dtype=np.int32)
    for y in range(h):
        recon[y] = flat[y]
        f = filters[y % len(filters)]
        prev = recon[y - 1] if y else np.zeros(stride, dtype=np.int32)
        line = np.zeros(stride, dtype=np.int32)
        for x in range(stride):
            a = recon[y, x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            line[x] = (flat[y, x] - pred) % 256
        out += bytes([f]) + bytes(line.astype(np.uint8))

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(out))) + chunk(b"IEND", b""))


def test_png_roundtrip_solid():
    import numpy as np
    from hatchery_spark.functions.multimodal import decode_png, encode_png

    img = decode_png(encode_png(7, 5, (10, 200, 30)))
    assert img.shape == (5, 7, 3)
    assert (img == np.array([10, 200, 30], dtype=np.uint8)).all()


def test_png_all_filter_types_unfilter_correctly():
    import numpy as np
    from hatchery_spark.functions.multimodal import decode_png

    rng = np.random.default_rng(17)
    for ch in (1, 2, 3, 4):
        img = rng.integers(0, 256, size=(6, 5, ch), dtype=np.uint8)
        for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
            got = decode_png(_filtered_png(img, filters))
            assert (got == img).all(), (ch, filters)


def test_png_unsupported_variants_and_corrupt():
    import struct
    import zlib

    import pytest
    from hatchery_spark.functions.multimodal import (
        DecoderUnavailable, PNG_MAGIC, decode_png, encode_png,
    )

    with pytest.raises(DecoderUnavailable):
        decode_png(b"not a png")
    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))
    # short interlaced payload (2x2 RGB Adam7 needs 15 bytes) is a parse
    # ERROR (decode_error row), not a codec gap
    inter = (PNG_MAGIC + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1))
             + chunk(b"IDAT", zlib.compress(b"\x00" * 14)) + chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        decode_png(inter)
    # interlace method 2 does not exist → honest gap, not an error row
    bad_i = (PNG_MAGIC + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 2))
             + chunk(b"IDAT", zlib.compress(b"\x00" * 14)) + chunk(b"IEND", b""))
    with pytest.raises(DecoderUnavailable):
        decode_png(bad_i)
    # palette PNG WITHOUT a PLTE chunk is malformed → parse error, not a gap
    pal = (PNG_MAGIC + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00" * 2)) + chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        decode_png(pal)
    # truncated payload is a parse ERROR (decode_error row), not a codec gap
    with pytest.raises(Exception) as ei:
        decode_png(encode_png(8, 8, (1, 2, 3))[:30])
    assert not isinstance(ei.value, DecoderUnavailable)


def _chunk(tag, data):
    import struct
    import zlib

    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def _palette_png(idx, palette, depth):
    """Encode an (h, w) index array as a depth-{1,2,4,8} palette PNG
    (filter 0 rows, packed bits big-endian-first per spec)."""
    import struct
    import zlib

    import numpy as np
    from hatchery_spark.functions.multimodal import PNG_MAGIC

    h, w = idx.shape
    out = bytearray()
    for y in range(h):
        bits = np.unpackbits(idx[y].astype(np.uint8)[:, None], axis=1)[:, 8 - depth:]
        packed = np.packbits(bits.reshape(-1))
        out += b"\x00" + bytes(packed)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, 0)
    plte = bytes(np.asarray(palette, dtype=np.uint8).reshape(-1))
    return (PNG_MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", plte)
            + _chunk(b"IDAT", zlib.compress(bytes(out))) + _chunk(b"IEND", b""))


def test_png_palette_depths_decode_to_rgb():
    import numpy as np
    from hatchery_spark.functions.multimodal import decode_png

    palette = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (7, 8, 9)]
    rng = np.random.default_rng(5)
    for depth, npal in ((1, 2), (2, 4), (4, 4), (8, 4)):
        # width 5: not a multiple of 8/depth — exercises bit-row trimming
        idx = rng.integers(0, npal, size=(3, 5), dtype=np.uint8)
        got = decode_png(_palette_png(idx, palette[:npal], depth))
        expect = np.asarray(palette[:npal], dtype=np.uint8)[idx]
        assert (got == expect).all(), depth


def test_png_16bit_decodes_high_byte():
    import struct
    import zlib

    import numpy as np
    from hatchery_spark.functions.multimodal import PNG_MAGIC, decode_png

    h, w = 2, 3
    px = np.array(
        [[(0xAB, 0x12, 0xFF), (0x01, 0x80, 0x7F), (0x00, 0xFE, 0x33)]] * h,
        dtype=np.uint16,
    )
    samples = (px.astype(np.uint16) * 257).astype(">u2")  # 0xHH -> 0xHHHH
    out = bytearray()
    for y in range(h):
        out += b"\x00" + samples[y].tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0)
    png = (PNG_MAGIC + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(bytes(out))) + _chunk(b"IEND", b""))
    got = decode_png(png)
    assert got.shape == (h, w, 3)
    assert (got == px.astype(np.uint8)).all()


def test_png_16bit_up_filter():
    import struct
    import zlib

    import numpy as np
    from hatchery_spark.functions.multimodal import PNG_MAGIC, decode_png

    # row0: filter 0 raw; row1: filter 2 (Up) deltas — checks byte-level
    # unfiltering composes with 16-bit sample reassembly
    h, w = 2, 4
    r0 = np.array([0x1234, 0xABCD, 0x0001, 0xFF00], dtype=">u2")
    r1 = np.array([0x1235, 0xABCE, 0x0003, 0xFF04], dtype=">u2")
    d1 = (
        np.frombuffer(r1.tobytes(), np.uint8).astype(np.int32)
        - np.frombuffer(r0.tobytes(), np.uint8).astype(np.int32)
    ) % 256
    out = b"\x00" + r0.tobytes() + b"\x02" + bytes(d1.astype(np.uint8))
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0)
    png = (PNG_MAGIC + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(out)) + _chunk(b"IEND", b""))
    got = decode_png(png)
    # gray 16-bit, 4 samples/row -> shape (2, 4, 1); high bytes
    assert got.shape == (2, 4, 1)
    assert list(got[0, :, 0]) == [0x12, 0xAB, 0x00, 0xFF]
    assert list(got[1, :, 0]) == [0x12, 0xAB, 0x00, 0xFF]


def test_decode_media_handles_png(spark):
    from hatchery_spark.functions.multimodal import decode_media, synthetic_real_media_df

    out = {r.media_id: r for r in decode_media(synthetic_real_media_df(spark, 24)).collect()}
    # image rows are i%3==0; PPM when i%6==0, so i=3 is the first PNG
    assert out[3].decode_status == "ok_png"
    assert out[3].width == 16 + 3 % 8 and out[3].height == 12 + 3 % 4
    assert out[3].px_mean == (3 * 7) % 256
    assert out[6].decode_status == "ok_ppm"
    assert out[0].decode_status == "ok_ppm"
    assert out[1].decode_status == "ok_wav"
    assert out[2].decode_status == "decoder_unavailable"


def test_resize_grid_math():
    """Area interpolation downsampling + nearest-neighbor upsampling."""
    import numpy as np

    from hatchery_spark.functions.multimodal import resize_grid

    g = np.arange(16 * 16).reshape(16, 16)
    t = resize_grid(g, 8, 8)
    assert t.shape == (8, 8)
    assert t[0, 0] == np.mean([0, 1, 16, 17])  # 2x2 block mean
    u = resize_grid(np.array([[1, 2], [3, 4]]), 4, 4)
    assert (u == np.array([[1, 1, 2, 2], [1, 1, 2, 2], [3, 3, 4, 4], [3, 3, 4, 4]])).all()


def test_media_thumbnails_real_pixels(spark):
    """Thumbnails are built from ACTUAL decoded pixels: a two-tone PPM's 8x8
    area-pooled thumbnail has the left half at one value, right at another."""
    import numpy as np

    from hatchery_spark.functions.multimodal import media_thumbnails

    # 16x8 image: left 8 columns value 10, right 8 columns value 250
    w, h = 16, 8
    row = bytes((10, 10, 10)) * 8 + bytes((250, 250, 250)) * 8
    ppm = f"P6\n{w} {h}\n255\n".encode() + row * h
    df = spark.createDataFrame(
        [(0, "image", bytearray(ppm)), (1, "video", bytearray(b"\x00xx"))],
        "media_id long, kind string, content binary",
    )
    out = {r.media_id: r for r in media_thumbnails(df).collect()}
    t = np.array(out[0].thumb).reshape(8, 8)
    assert (t[:, :4] == 10.0).all() and (t[:, 4:] == 250.0).all()
    assert out[0].thumb_mean == 130.0
    assert out[1].decode_status == "decoder_unavailable"


def _adam7_png(samples, depth, color_type, palette=None):
    """Encode (h, w, ch) samples as an Adam7-interlaced PNG: each non-empty
    reduced pass emitted as filter-0 rows at the pass's own stride (sub-byte
    index rows packed MSB-first per pass row; 16-bit as 0xHH·257 big-endian)."""
    import struct
    import zlib

    import numpy as np
    from hatchery_spark.functions.multimodal import PNG_MAGIC, _ADAM7

    h, w = samples.shape[:2]
    out = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = samples[y0::dy, x0::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        for row in sub:
            if depth == 16:
                out += b"\x00" + (row.astype(np.uint16) * 257).astype(">u2").tobytes()
            elif depth == 8:
                out += b"\x00" + row.astype(np.uint8).tobytes()
            else:
                bits = np.unpackbits(
                    row.reshape(-1).astype(np.uint8)[:, None], axis=1
                )[:, 8 - depth:]
                out += b"\x00" + bytes(np.packbits(bits.reshape(-1)))
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, 1)
    png = PNG_MAGIC + _chunk(b"IHDR", ihdr)
    if palette is not None:
        png += _chunk(b"PLTE", bytes(np.asarray(palette, dtype=np.uint8).reshape(-1)))
    return png + _chunk(b"IDAT", zlib.compress(bytes(out))) + _chunk(b"IEND", b"")


def test_png_adam7_rgb_all_shapes():
    import numpy as np
    from hatchery_spark.functions.multimodal import decode_png

    rng = np.random.default_rng(11)
    # odd/small shapes exercise empty passes and per-pass ceil widths
    for h, w in ((1, 1), (2, 2), (3, 7), (7, 5), (8, 8), (9, 10)):
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        got = decode_png(_adam7_png(arr, 8, 2))
        assert (got == arr).all(), (h, w)


def test_png_adam7_palette_subbyte():
    import numpy as np
    from hatchery_spark.functions.multimodal import decode_png

    palette = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (7, 8, 9)]
    rng = np.random.default_rng(13)
    idx = rng.integers(0, 4, size=(5, 5, 1), dtype=np.uint8)
    got = decode_png(_adam7_png(idx, 4, 3, palette=palette))
    assert (got == np.asarray(palette, dtype=np.uint8)[idx[:, :, 0]]).all()


def test_png_adam7_16bit_gray():
    import numpy as np
    from hatchery_spark.functions.multimodal import decode_png

    arr = np.arange(9, dtype=np.uint8).reshape(3, 3, 1) * 20
    got = decode_png(_adam7_png(arr, 16, 0))
    assert (got == arr).all()


def test_png_adam7_up_filter_is_per_pass():
    import struct
    import zlib

    import numpy as np
    from hatchery_spark.functions.multimodal import PNG_MAGIC, decode_png

    # 4x1 gray8: passes 1 (row 0), 5 (row 2), 7 (rows 1 and 3). Pass 7's
    # second scanline uses the Up filter — its predecessor must be pass 7's
    # OWN first row (image row 1), not the image's row 2.
    stream = (b"\x00" + bytes([10])      # pass 1 -> y=0
              + b"\x00" + bytes([20])    # pass 5 -> y=2
              + b"\x00" + bytes([100])   # pass 7 row 0 -> y=1
              + b"\x02" + bytes([5]))    # pass 7 row 1 (Up) -> y=3
    ihdr = struct.pack(">IIBBBBB", 1, 4, 8, 0, 0, 0, 1)
    png = (PNG_MAGIC + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(stream)) + _chunk(b"IEND", b""))
    got = decode_png(png)
    assert got[:, 0, 0].tolist() == [10, 100, 20, 105]


def test_image_dhash_hand_bits(spark):
    """dHash bit layout: MSB-first row-major left<right comparisons."""
    import numpy as np
    from hatchery_spark.functions.multimodal import (
        encode_png_rgb,
        image_dhash,
    )

    # 8x9 image: row y is [y, 0, y, 0, ...] alternating → bits alternate
    img = np.zeros((8, 9, 3), dtype=np.uint8)
    img[:, 1::2, :] = 200          # cols 1,3,5,7 bright
    # comparisons col x vs x+1: 0<1 T, 1<2 F, ... → 10101010 per row = 0xaa
    df = spark.createDataFrame(
        [(0, bytearray(encode_png_rgb(img)))], "media_id long, content binary"
    )
    row = image_dhash(df).collect()[0]
    assert row.decode_status == "ok"
    assert row.dhash == "aa" * 8


def test_image_dhash_perturbation_and_resize(spark):
    import numpy as np
    from hatchery_spark.functions.multimodal import (
        encode_png_rgb,
        image_dhash,
    )

    y, x = np.mgrid[0:8, 0:9]
    gray = ((7 * x * (x + y) + 13 * y) % 256).astype(np.uint8)
    img = np.repeat(gray[:, :, None], 3, axis=2)
    big = np.repeat(np.repeat(img, 4, axis=0), 4, axis=1)  # 32x36 upscale
    pert = img.copy()
    pert[3, 4, :] = 255 - pert[3, 4, :]
    rows = [
        (0, bytearray(encode_png_rgb(img))),
        (1, bytearray(encode_png_rgb(big))),   # resize path, same content
        (2, bytearray(encode_png_rgb(pert))),  # perturbed → different hash
        (3, bytearray(b"not an image")),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r.media_id: r for r in image_dhash(df).collect()}
    assert out[0].dhash == out[1].dhash        # scale-invariant
    assert out[0].dhash != out[2].dhash
    assert out[3].decode_status == "decoder_unavailable"
    assert out[3].dhash is None
