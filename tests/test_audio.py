"""Audio: μ-law expansion, spectral features, closed-form parity."""

import io
import struct
import wave

import numpy as np
import pytest

from hatchery_spark.functions.multimodal import (
    _MULAW_TABLE,
    DecoderUnavailable,
    decode_wav,
    encode_wav_mulaw,
    encode_wav_sine_sr4,
    mulaw_byte,
)


def test_mulaw_table_closed_form_and_sign():
    for e in range(8):
        for m in range(16):
            want = ((m * 8 + 132) << e) - 132
            assert int(_MULAW_TABLE[mulaw_byte(e, m)]) == want
            assert int(_MULAW_TABLE[mulaw_byte(e, m, negative=True)]) == -want


def test_mulaw_wav_roundtrip():
    b = mulaw_byte(4, 9)
    samples, sr, nch = decode_wav(encode_wav_mulaw(512, 16000, b))
    assert sr == 16000 and nch == 1 and samples.size == 512
    assert (samples == ((9 * 8 + 132) << 4) - 132).all()


def test_sine_fixture_is_bin_aligned():
    s, sr, _ = decode_wav(encode_wav_sine_sr4(1024, 8000, 2000))
    mono = s.astype(np.float64)
    assert int(np.argmax(np.abs(np.fft.rfft(mono)))) == 256  # n/4
    assert float(np.sqrt(np.mean(mono * mono))) == float(np.sqrt(2000 * 2000 / 2.0))


def test_unsupported_wav_format_gated():
    # IEEE-float WAV (format tag 3): honestly unavailable, not mis-decoded
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 8) + b"\x00" * 8)
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(DecoderUnavailable):
        decode_wav(payload)


def test_spectral_features_match_closed_forms(spark):
    from hatchery_spark.functions.multimodal import (
        synthetic_audio_media_df,
        wav_spectral_features,
    )

    out = wav_spectral_features(synthetic_audio_media_df(spark, 24)).toPandas()
    out = out.set_index("media_id").sort_index()
    for i in range(24):
        r = out.loc[i]
        sr = 8000 + 4000 * (i % 3)
        assert r["decode_status"] == "ok"
        assert r["sr"] == sr and r["n_samples"] == 1024 + 256 * (i % 4)
        if i % 3 == 0:
            a = 1000 + 500 * (i % 5)
            assert r["rms"] == round(float(np.sqrt(a * a / 2.0)), 4)
            assert r["dominant_freq_hz"] == sr / 4
        elif i % 3 == 1:
            assert r["rms"] == float(100 * (i % 7))
            assert r["dominant_freq_hz"] == 0.0
        else:
            e, m = i % 8, (i * 3) % 16
            assert r["rms"] == float(((m * 8 + 132) << e) - 132)
            assert r["dominant_freq_hz"] == 0.0


def test_spectral_features_stereo_folds_to_mono(spark):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        left = np.full(512, 400, dtype=np.int16)
        right = np.full(512, 200, dtype=np.int16)
        w.writeframes(np.column_stack([left, right]).reshape(-1).tobytes())
    from hatchery_spark.functions.multimodal import wav_spectral_features

    df = spark.createDataFrame(
        [(0, "audio", bytearray(buf.getvalue()))],
        "media_id long, kind string, content binary",
    )
    r = wav_spectral_features(df).collect()[0]
    assert r["n_samples"] == 512          # frames, not interleaved samples
    assert r["rms"] == 300.0              # channel mean of 400/200
    assert r["dominant_freq_hz"] == 0.0


def test_alaw_table_properties():
    from hatchery_spark.functions.multimodal import (
        _ALAW_TABLE,
        alaw_byte,
        decode_wav,
        encode_wav_alaw,
    )

    # every (e, m, sign) expands to the closed form, signs are symmetric
    for e in range(8):
        for m in range(16):
            mag = (m << 4) + 8 if e == 0 else ((m << 4) + 0x108) << (e - 1)
            assert _ALAW_TABLE[alaw_byte(e, m)] == mag
            assert _ALAW_TABLE[alaw_byte(e, m, negative=True)] == -mag
    # the table is a bijection over all byte values
    assert len(set(int(v) for v in _ALAW_TABLE)) == 256
    # decode path: tag-6 WAV → expanded samples
    samples, sr, nch = decode_wav(encode_wav_alaw(320, 8000, alaw_byte(3, 5)))
    assert (sr, nch, samples.size) == (8000, 1, 320)
    assert (samples == ((5 << 4) + 0x108) << 2).all()


# ---------------------------------------------------------------------------
# IMA ADPCM (WAV format tag 17)
# ---------------------------------------------------------------------------


def test_adpcm_hand_traced_trajectory():
    """Nibble stream [1, 4, 0xA, 0] from (pred=100, index=0), traced by
    hand against the IMA spec recurrence."""
    import struct

    from hatchery_spark.functions.multimodal import _ima_adpcm_decode_mono

    block = struct.pack("<hBB", 100, 0, 0) + bytes([0x41, 0x0A])
    out = _ima_adpcm_decode_mono(block, block_align=6)
    # step7: nib1 -> +1; nib4 -> +7 (idx->2, step9); nibA -> -5 (idx->1,
    # step8); nib0 -> +1
    assert out.tolist() == [100, 101, 108, 103, 104]


def test_adpcm_clamps_to_int16():
    import struct

    from hatchery_spark.functions.multimodal import _ima_adpcm_decode_mono

    # max index (88 -> step 32767), nibble 7 = step + step/2 + step/4 + step/8
    block = struct.pack("<hBB", 32000, 88, 0) + bytes([0x77])
    out = _ima_adpcm_decode_mono(block, block_align=5)
    assert out.tolist()[0] == 32000
    assert out.tolist()[1] == 32767  # clamped high
    block = struct.pack("<hBB", -32000, 88, 0) + bytes([0xFF])
    out = _ima_adpcm_decode_mono(block, block_align=5)
    assert out.tolist()[1:] == [-32768, -32768]  # clamped low


def test_adpcm_constant_blocks_decode_constant():
    from hatchery_spark.functions.multimodal import (
        _ima_adpcm_decode_mono,
        decode_wav,
        encode_wav_adpcm_const,
    )

    wav = encode_wav_adpcm_const(n_blocks=4, sample_rate=8000, predictor=-777)
    samples, sr, nch = decode_wav(wav)
    assert sr == 8000 and nch == 1
    assert samples.size == 4 * 17
    assert set(samples.tolist()) == {-777}


def test_adpcm_spectral_features_e2e(spark):
    from hatchery_spark.functions.multimodal import (
        synthetic_adpcm_media_df,
        wav_spectral_features,
    )

    out = {r.media_id: r for r in
           wav_spectral_features(synthetic_adpcm_media_df(spark, 16)).collect()}
    assert out[0].decode_status == "ok"
    assert out[0].rms == float(abs((0 * 2741) % 4001 - 2000))
    assert out[1].rms == float(abs((1 * 2741) % 4001 - 2000))
    assert out[0].dominant_freq_hz == 0.0
    assert out[7].decode_status == "decoder_unavailable"  # stereo gated
