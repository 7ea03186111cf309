"""QOI codec: exact roundtrip over adversarial content, opcode coverage,
spec edge semantics, corruption rejection."""

import numpy as np
import pytest

from hatchery_spark.functions.qoi import QOI_MAGIC, decode_qoi, encode_qoi


def test_roundtrip_random_rgb_rgba():
    rng = np.random.default_rng(7)
    for channels in (3, 4):
        for shape in ((1, 1), (5, 3), (17, 23)):
            img = rng.integers(0, 256, size=(*shape, channels), dtype=np.uint8)
            out = decode_qoi(encode_qoi(img))
            assert out.shape == img.shape
            assert np.array_equal(out, img)


def test_roundtrip_structured_content():
    yy, xx = np.indices((12, 16))
    cases = [
        np.stack([(xx * 3 + yy * 7 + c * 40) % 256 for c in range(3)], axis=2),
        np.stack([((xx // 4) * 8 + (yy // 4) * 8) % 256] * 3, axis=2),
        np.stack([(xx + yy) % 256] * 3, axis=2),
        np.zeros((12, 16, 3)),  # one long run
    ]
    for img in cases:
        img = img.astype(np.uint8)
        assert np.array_equal(decode_qoi(encode_qoi(img)), img)


def test_all_opcode_families_exercised():
    """The synthetic rotations must actually hit every opcode family."""
    seen = set()
    yy, xx = np.indices((12, 16))
    imgs = [
        np.stack([(xx * 3 + yy * 7 + c * 40) % 256 for c in range(3)], axis=2),
        np.stack([((xx // 4) * 8 + (yy // 4) * 8) % 256] * 3, axis=2),
        np.stack([(xx + yy) % 256] * 3, axis=2),
    ]
    rgba = np.concatenate(
        [imgs[0], ((xx * 5) % 256)[:, :, None]], axis=2
    ).astype(np.uint8)
    rng = np.random.default_rng(3)
    noise = rng.integers(0, 256, size=(12, 16, 3), dtype=np.uint8)
    for img in [a.astype(np.uint8) for a in imgs] + [rgba, noise]:
        buf = encode_qoi(img)
        body, pos = buf[14:-8], 0
        while pos < len(body):
            b0 = body[pos]
            if b0 == 0xFE:
                seen.add("rgb"); pos += 4
            elif b0 == 0xFF:
                seen.add("rgba"); pos += 5
            else:
                seen.add({0: "index", 1: "diff", 2: "luma", 3: "run"}[b0 >> 6])
                pos += 2 if b0 >> 6 == 2 else 1
    assert seen == {"rgb", "rgba", "index", "diff", "luma", "run"}


def test_spec_edge_run_then_index():
    """A stream opening with a RUN of the implicit (0,0,0,255) pixel stores
    it in the index (spec decoder stores after every chunk), so a later
    INDEX of slot hash(0,0,0,255)=53 must yield it."""
    head = QOI_MAGIC + (4).to_bytes(4, "big") + (1).to_bytes(4, "big") + b"\x03\x00"
    body = bytes([0xC0 | 1])            # run of 2 × (0,0,0,255)
    body += bytes([0xFE, 9, 9, 9])      # disturb px
    body += bytes([53])                  # INDEX slot hash(0,0,0,255)
    buf = head + body + b"\x00" * 7 + b"\x01"
    img = decode_qoi(buf)
    assert img[0].tolist() == [[0, 0, 0], [0, 0, 0], [9, 9, 9], [0, 0, 0]]


def test_corruption_rejected():
    img = np.full((4, 4, 3), 77, dtype=np.uint8)
    buf = encode_qoi(img)
    with pytest.raises(ValueError, match="bad QOI magic"):
        decode_qoi(b"nope" + buf[4:])
    with pytest.raises(ValueError, match="truncated"):
        decode_qoi(buf[:10])
    with pytest.raises(ValueError, match="truncated QOI stream|missing QOI end"):
        decode_qoi(buf[:-9] + b"\x00" * 8)
    bad = bytearray(buf)
    bad[12] = 5  # channels
    with pytest.raises(ValueError, match="bad QOI header"):
        decode_qoi(bytes(bad))


def test_decode_media_dispatch(spark):
    from hatchery_spark.functions.multimodal import (
        decode_media,
        synthetic_qoi_media_df,
    )

    out = decode_media(synthetic_qoi_media_df(spark, 12)).collect()
    assert len(out) == 12
    assert all(r.decode_status == "ok_qoi" for r in out)
    assert all(r.width == 16 + r.media_id % 9 for r in out)
