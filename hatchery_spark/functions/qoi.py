"""QOI ("Quite OK Image") codec — the lossless RGB(A) format increasingly
used for fast intermediate image storage in data pipelines (single-pass,
byte-aligned, ~PNG-size at 20-50× the speed). Implemented from the public
one-page spec at qoiformat.org (qoi-specification.pdf, 2022); no reference
code consulted.

Ops (2-bit tag, then 8-bit tags):
  QOI_OP_INDEX 00iiiiii  — emit seen-pixel table entry i (64-slot hash)
  QOI_OP_DIFF  01drdgdb  — per-channel delta in [-2,1] vs previous pixel
  QOI_OP_LUMA  10gggggg / drdg dbdg — green delta [-32,31], red/blue
                deltas expressed relative to green in [-8,7]
  QOI_OP_RUN   11rrrrrr  — repeat previous pixel 1..62 times
  QOI_OP_RGB   0xFE r g b       (alpha carried over)
  QOI_OP_RGBA  0xFF r g b a
Hash: (r*3 + g*5 + b*7 + a*11) % 64. Stream ends with 7×0x00 then 0x01.

Spark-side use: whole images per task via ``decode_media``'s mapInPandas
(multimodal.py:905) — the per-pixel loop is bounded by one image, the
format is sliceable only at image granularity (like JPEG), so parallelism
comes from the table's image rows, exactly the 100 TB layout.

Reference analog: hatchery's source decode stage (source/parse.go:21) —
payload bytes → typed records before transforms.
"""

from __future__ import annotations

import numpy as np

QOI_MAGIC = b"qoif"
_END = b"\x00" * 7 + b"\x01"


def _hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def encode_qoi(img: np.ndarray, colorspace: int = 0) -> bytes:
    """(h, w, 3|4) uint8 → QOI bytes. Deterministic: the spec's encoder
    decision order (run → index → diff → luma → rgb/rgba) is total."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] not in (3, 4):
        raise ValueError("expected (h, w, 3|4) uint8 image")
    h, w, channels = img.shape
    out = bytearray(QOI_MAGIC)
    out += w.to_bytes(4, "big") + h.to_bytes(4, "big")
    out += bytes([channels, colorspace])

    index = [(0, 0, 0, 0)] * 64
    prev = (0, 0, 0, 255)
    run = 0
    flat = img.reshape(-1, channels)
    for px_arr in flat:
        if channels == 3:
            px = (int(px_arr[0]), int(px_arr[1]), int(px_arr[2]), prev[3])
        else:
            px = tuple(int(v) for v in px_arr)
        if px == prev:
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        pos = _hash(*px)
        if index[pos] == px:
            out.append(pos)
        else:
            index[pos] = px
            if px[3] == prev[3]:
                dr = (px[0] - prev[0] + 128) % 256 - 128
                dg = (px[1] - prev[1] + 128) % 256 - 128
                db = (px[2] - prev[2] + 128) % 256 - 128
                if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                    out.append(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
                elif (
                    -32 <= dg <= 31 and -8 <= dr - dg <= 7 and -8 <= db - dg <= 7
                ):
                    out.append(0x80 | (dg + 32))
                    out.append(((dr - dg + 8) << 4) | (db - dg + 8))
                else:
                    out += bytes((0xFE, px[0], px[1], px[2]))
            else:
                out += bytes((0xFF, *px))
        prev = px
    if run:
        out.append(0xC0 | (run - 1))
    out += _END
    return bytes(out)


def decode_qoi(buf: bytes) -> np.ndarray:
    """QOI bytes → (h, w, channels) uint8. Validates magic, header,
    pixel-count exactness, and the 8-byte end marker."""
    if buf[:4] != QOI_MAGIC:
        raise ValueError("bad QOI magic")
    if len(buf) < 14 + 8:
        raise ValueError("truncated QOI header")
    w = int.from_bytes(buf[4:8], "big")
    h = int.from_bytes(buf[8:12], "big")
    channels, colorspace = buf[12], buf[13]
    if channels not in (3, 4) or colorspace not in (0, 1):
        raise ValueError(f"bad QOI header: channels={channels} cs={colorspace}")
    n = w * h
    out = np.empty((n, 4), dtype=np.uint8)
    index = [(0, 0, 0, 0)] * 64
    px = (0, 0, 0, 255)
    pos, i = 14, 0
    end = len(buf) - 8
    while i < n:
        if pos >= end:
            raise ValueError("truncated QOI stream")
        b0 = buf[pos]
        pos += 1
        if b0 == 0xFE:  # RGB
            px = (buf[pos], buf[pos + 1], buf[pos + 2], px[3])
            pos += 3
        elif b0 == 0xFF:  # RGBA
            px = (buf[pos], buf[pos + 1], buf[pos + 2], buf[pos + 3])
            pos += 4
        elif b0 >> 6 == 0:  # INDEX
            px = index[b0]
        elif b0 >> 6 == 1:  # DIFF
            px = (
                (px[0] + ((b0 >> 4) & 3) - 2) % 256,
                (px[1] + ((b0 >> 2) & 3) - 2) % 256,
                (px[2] + (b0 & 3) - 2) % 256,
                px[3],
            )
        elif b0 >> 6 == 2:  # LUMA
            dg = (b0 & 0x3F) - 32
            b1 = buf[pos]
            pos += 1
            px = (
                (px[0] + dg + ((b1 >> 4) & 0xF) - 8) % 256,
                (px[1] + dg) % 256,
                (px[2] + dg + (b1 & 0xF) - 8) % 256,
                px[3],
            )
        else:  # RUN
            run = (b0 & 0x3F) + 1
            if i + run > n:
                raise ValueError("QOI run overflows pixel count")
            # spec decoder stores px after EVERY chunk, runs included —
            # only observable when the stream opens with a run of the
            # implicit (0,0,0,255) pixel and later INDEXes its slot
            index[_hash(*px)] = px
            out[i : i + run] = px
            i += run
            continue
        index[_hash(*px)] = px
        out[i] = px
        i += 1
    if buf[pos : pos + 8] != _END:
        raise ValueError("missing QOI end marker")
    return out.reshape(h, w, 4)[:, :, :channels].copy()
