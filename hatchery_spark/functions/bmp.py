"""Windows BMP (DIB) — decoder + fixture encoders.

The screenshot/export format desktop-sourced corpora carry. Implemented
from the public format layout: BITMAPFILEHEADER + BITMAPINFOHEADER (40-byte
v3), bottom-up and top-down row orders, 4-byte row padding, 8-bit palette,
24-bit BGR, 32-bit BGRX, and RLE8 compression (encoded runs, absolute mode
with word padding, end-of-line / end-of-bitmap / delta escapes). Other
depths (1/4/16-bit, RLE4, BITFIELDS) raise DecoderUnavailable honestly.

Reference parity note: hatchery never decodes media (objects pass through
byte-identical, destination/gcs/client.go:76); this module belongs to the
multimodal feature-extraction surface of the training-data pipeline.
"""

from __future__ import annotations

import struct

import numpy as np

from hatchery_spark.functions.multimodal import DecoderUnavailable

BMP_MAGIC = b"BM"


def decode_bmp(content: bytes) -> np.ndarray:
    """Parse a BMP into (h, w, 3) uint8 RGB."""
    if not content.startswith(BMP_MAGIC):
        raise DecoderUnavailable("not a BMP payload")
    (data_off,) = struct.unpack("<I", content[10:14])
    (hdr_size,) = struct.unpack("<I", content[14:18])
    if hdr_size < 40:
        raise DecoderUnavailable("pre-v3 BMP header not supported")
    w, h_raw, _planes, bpp, comp = struct.unpack("<iiHHI", content[18:34])
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    if bpp not in (8, 24, 32) or comp not in (0, 1):
        raise DecoderUnavailable(f"BMP {bpp}-bit compression {comp} not supported")
    if comp == 1 and bpp != 8:
        raise ValueError("RLE8 requires 8-bit")

    palette = None
    if bpp == 8:
        (n_colors,) = struct.unpack("<I", content[46:50])
        n_colors = n_colors or 256
        pal_off = 14 + hdr_size
        raw = np.frombuffer(
            content[pal_off : pal_off + 4 * n_colors], dtype=np.uint8
        ).reshape(-1, 4)
        palette = raw[:, [2, 1, 0]]  # BGRA → RGB

    if comp == 1:  # RLE8
        idx = np.zeros((h, w), dtype=np.uint8)
        x = y = 0
        i = data_off
        while i + 1 < len(content):
            n, v = content[i], content[i + 1]
            i += 2
            if n:  # encoded run
                idx[y, x : x + n] = v
                x += n
                continue
            if v == 0:  # end of line
                x, y = 0, y + 1
            elif v == 1:  # end of bitmap
                break
            elif v == 2:  # delta
                x += content[i]
                y += content[i + 1]
                i += 2
            else:  # absolute mode, word-padded
                idx[y, x : x + v] = np.frombuffer(
                    content[i : i + v], dtype=np.uint8
                )
                x += v
                i += v + (v & 1)
        rows = idx
    else:
        stride = (w * (bpp // 8) + 3) & ~3
        raw = np.frombuffer(
            content[data_off : data_off + stride * h], dtype=np.uint8
        ).reshape(h, stride)
        if bpp == 8:
            rows = raw[:, :w]
        else:
            nb = bpp // 8
            rows = raw[:, : w * nb].reshape(h, w, nb)

    if not top_down:
        rows = rows[::-1]
    if bpp == 8:
        return palette[rows]
    return np.ascontiguousarray(rows[:, :, [2, 1, 0]])  # BGR(X) → RGB


def _headers(w: int, h: int, bpp: int, comp: int, data_len: int,
             n_colors: int = 0, top_down: bool = False) -> bytes:
    pal_len = 4 * n_colors
    data_off = 14 + 40 + pal_len
    file_hdr = b"BM" + struct.pack("<IHHI", data_off + data_len, 0, 0, data_off)
    info = struct.pack(
        "<IiihHIIiiII", 40, w, -h if top_down else h, 1, bpp, comp,
        data_len, 2835, 2835, n_colors, 0,
    )
    return file_hdr + info


def encode_bmp_rgb(img: np.ndarray, bpp: int = 24, top_down: bool = False) -> bytes:
    """24-bit BGR / 32-bit BGRX writer with 4-byte row padding."""
    img = np.asarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    nb = bpp // 8
    stride = (w * nb + 3) & ~3
    rows = img if top_down else img[::-1]
    body = bytearray()
    for r in rows:
        line = bytearray()
        for px in r:
            line += bytes([px[2], px[1], px[0]] + ([0] if nb == 4 else []))
        body += line.ljust(stride, b"\x00")
    return _headers(w, h, bpp, 0, len(body), top_down=top_down) + bytes(body)


def encode_bmp_palette(idx: np.ndarray, palette: np.ndarray,
                       rle: bool = False) -> bytes:
    """8-bit palette writer, optionally RLE8-compressed (encoded runs +
    absolute-mode stretches + EOL/EOB escapes)."""
    idx = np.asarray(idx, dtype=np.uint8)
    palette = np.asarray(palette, dtype=np.uint8)
    h, w = idx.shape
    pal = bytearray()
    for r, g, b in palette:
        pal += bytes([b, g, r, 0])
    pal = pal.ljust(4 * 256, b"\x00")
    if not rle:
        stride = (w + 3) & ~3
        body = b"".join(bytes(idx[y]).ljust(stride, b"\x00") for y in range(h - 1, -1, -1))
        return (
            _headers(w, h, 8, 0, len(body), n_colors=256) + bytes(pal) + body
        )
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        x = 0
        row = idx[y]
        while x < w:
            run = 1
            while x + run < w and run < 255 and row[x + run] == row[x]:
                run += 1
            if run >= 2 or w - x == 1:
                body += bytes([run, row[x]])
                x += run
            else:
                j = x + 1
                while (
                    j < w and j - x < 255
                    and not (j + 1 < w and row[j] == row[j + 1])
                ):
                    j += 1
                if j - x < 3:  # absolute mode needs ≥3; emit unit runs
                    body += bytes([1, row[x]])
                    x += 1
                else:
                    chunk = bytes(row[x:j])
                    body += bytes([0, len(chunk)]) + chunk
                    if len(chunk) & 1:
                        body += b"\x00"
                    x = j
        body += b"\x00\x00"  # end of line
    body += b"\x00\x01"  # end of bitmap
    return _headers(w, h, 8, 1, len(body), n_colors=256) + bytes(pal) + bytes(body)
