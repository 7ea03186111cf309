"""Multimodal column plumbing: image/audio/video as opaque binary + typed metadata.

The Spark-side machinery — schema, Arrow batch shape, partition sizing, UDF
signatures — is real and tested. The codec layer is split honestly:
  * REAL stdlib decoders for PPM (P6), PNG (the full matrix — all color
    types, depths 1-16, non-interlaced + Adam7; zlib IDAT + scanline
    unfiltering) and the COMPLETE T.81 JPEG matrix (sequential/progressive
    Huffman, 8/12-bit, lossless SOF3, arithmetic SOF9/10/11, hierarchical
    DHP/EXP/SOF7 — jpeg.py, jpeg_arith.py, jpeg_lossless.py, jpeg_hier.py)
    plus PCM/μ-law/A-law WAV audio — bytes are actually parsed into
    pixels/samples, exercised end-to-end by the `media_*` oracle queries;
  * MP4 CODEC payloads (avc1 etc.) stay behind `DecoderUnavailable` (those
    codecs genuinely are not in this container) — swapping in PIL/libav is
    a one-function change; nothing else moves.

Pattern notes for 100 TB:
  * media rows are WIDE → keep Arrow batches small (maxRecordsPerBatch is set
    in session.py) and use mapInPandas (iterator form) so a task never holds
    more than one batch of decoded frames.
  * decode → feature-extract emits FIXED-SIZE vectors/metadata, so downstream
    stages shuffle features, never raw bytes.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class DecoderUnavailable(NotImplementedError):
    """Raised by the real-codec path: media libraries are not installed here."""


MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),  # opaque payload
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, sha8 string, "
    "feature array<float>, decode_status string"
)


def synthetic_media_df(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (binary payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=128 + (i % 5) * 64, dtype=np.uint8).tobytes()
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 + i % 32 if kind != "audio" else None,
                48 + i % 32 if kind != "audio" else None,
                1000 + i * 10 if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode_image(content: bytes, width, height) -> np.ndarray:
    """Deterministic stand-in for a real decoder: derive a tiny 'pixel' grid
    from the payload bytes. Replace with PIL.Image.open(...) in production."""
    arr = np.frombuffer(content, dtype=np.uint8)
    size = 16
    if arr.size == 0:
        return np.zeros((size, size), dtype=np.float32)
    reps = int(np.ceil(size * size / arr.size))
    return np.tile(arr, reps)[: size * size].reshape(size, size).astype(np.float32)


def real_decode_image(content: bytes) -> np.ndarray:
    """Real decode where a codec exists (stdlib PPM + PNG + sequential/
    progressive JPEG); raise otherwise.

    Returns a float32 grayscale grid (channel mean; alpha excluded for
    gray+alpha/RGBA) for the feature stage. MP4 codec payloads stay behind
    DecoderUnavailable.
    """
    if content.startswith(b"P6"):
        return decode_ppm(content).mean(axis=2).astype(np.float32)
    if content.startswith(PNG_MAGIC):
        img = decode_png(content)
        color = img[:, :, :3] if img.shape[2] >= 3 else img[:, :, :1]
        return color.mean(axis=2).astype(np.float32)
    # lazy import: jpeg.py imports DecoderUnavailable from this module
    from hatchery_spark.functions.jpeg import JPEG_MAGIC, decode_jpeg

    if content.startswith(JPEG_MAGIC):
        return decode_jpeg(content).mean(axis=2).astype(np.float32)
    raise DecoderUnavailable("no codec for this image format in this environment")


def extract_media_features(df: DataFrame, use_real_codecs: bool = False) -> DataFrame:
    """mapInPandas decode → fixed-size feature vector (8 floats) + metadata.

    Iterator form: one Arrow batch in flight per task. Output never carries the
    raw bytes — only n_bytes, an 8-hex sha fingerprint, and the feature vector.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for b in batches:
            feats, shas, nbytes, status = [], [], [], []
            for content, width, height in zip(b["content"], b["width"], b["height"]):
                raw = bytes(content) if content is not None else b""
                shas.append(hashlib.sha256(raw).hexdigest()[:8])
                nbytes.append(len(raw))
                if use_real_codecs:
                    try:
                        grid = real_decode_image(raw)
                        row_status = "ok_real"
                    except DecoderUnavailable:
                        feats.append(None)
                        status.append("decoder_unavailable")
                        continue
                    except Exception:
                        # corrupt payload (e.g. truncated P6): a status row,
                        # never a task abort — one bad image in a 100 TB
                        # batch must not kill the job
                        feats.append(None)
                        status.append("decode_error")
                        continue
                else:
                    grid = _fake_decode_image(raw, width, height)
                    row_status = "ok_fake"
                # 8-dim feature: quadrant means + global stats (deterministic)
                h, w = grid.shape
                q = [
                    grid[: h // 2, : w // 2].mean(),
                    grid[: h // 2, w // 2 :].mean(),
                    grid[h // 2 :, : w // 2].mean(),
                    grid[h // 2 :, w // 2 :].mean(),
                    grid.mean(),
                    grid.std(),
                    grid.min(),
                    grid.max(),
                ]
                feats.append([float(x) for x in q])
                status.append(row_status)
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "kind": b["kind"],
                    "n_bytes": nbytes,
                    "sha8": shas,
                    "feature": feats,
                    "decode_status": status,
                }
            )

    return df.mapInPandas(_extract, FEATURE_SCHEMA)


# ---------------------------------------------------------------- real codecs
# PPM (P6), PNG (all color types/depths, non-interlaced + Adam7), JPEG
# (sequential + progressive Huffman, jpeg.py) and WAV (PCM) are fully
# decodable with the standard library + numpy, so for these four formats
# the decode step is REAL: bytes → parsed pixels / samples.
# Arithmetic-coded JPEG and MP4 remain behind DecoderUnavailable (their
# codecs genuinely aren't in this container).

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def encode_png(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """Minimal valid solid-color 8-bit RGB PNG (deterministic test payloads).

    Filter byte 0 (None) per scanline, one IDAT chunk, no ancillary chunks —
    decodable by any conforming reader, including decode_png below.
    """
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    scanline = b"\x00" + bytes(rgb) * width
    idat = zlib.compress(scanline * height)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


# channels by PNG color type: gray, RGB, palette (1 index/px), gray+alpha, RGBA
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def encode_png_rgb(img: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a real 8-bit RGB PNG (filter
    type 0 scanlines, one zlib IDAT) — the arbitrary-content complement
    of the solid-color `encode_png` fixture writer. Deterministic
    (zlib level fixed), exact by construction."""
    import struct
    import zlib

    img = np.asarray(img, dtype=np.uint8)
    h, w, ch = img.shape
    assert ch == 3
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + typ + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def _png_unfilter(raw: bytes, height: int, stride: int, bpp: int) -> np.ndarray:
    """Undo the per-scanline filter (None/Sub/Up/Average/Paeth, PNG spec §9).

    `stride` is the filtered row width in BYTES, `bpp` the filter's
    left-neighbor distance in bytes (max(1, bits_per_pixel // 8) per spec —
    1 for sub-byte palette depths). Returns (height, stride) uint8.
    """
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG pixel data length mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters, rows = raw[:, 0], raw[:, 1:].astype(np.int32)
    out = np.zeros((height, stride), dtype=np.uint8)
    for y in range(height):
        line = rows[y].copy()
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, dtype=np.int32)
        f = filters[y]
        if f == 0:  # None
            out[y] = line & 0xFF
        elif f == 1:  # Sub: add left neighbor (sequential per pixel)
            for x in range(stride):
                left = out[y, x - bpp] if x >= bpp else 0
                out[y, x] = (line[x] + left) & 0xFF
        elif f == 2:  # Up — vectorized over the scanline
            out[y] = (line + prev) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                left = int(out[y, x - bpp]) if x >= bpp else 0
                out[y, x] = (line[x] + (left + int(prev[x])) // 2) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = int(out[y, x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[y, x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {f}")
    return out


# Adam7 pass grid: (x_start, y_start, x_step, y_step), PNG spec §8.2.
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_samples(
    raw: bytes, width: int, height: int, depth: int, ch: int
) -> np.ndarray:
    """Unfilter one (sub-)image's filtered scanlines and render them to
    (height, width, ch) uint8 samples — the shared step between the
    non-interlaced whole image and each Adam7 reduced pass (every pass is
    independently filtered at its own stride, PNG spec §8.2). 16-bit samples
    reduce to their high byte; sub-byte depths (palette) unpack MSB-first
    with the row's padding bits trimmed. `ch` is 1 for palette (indices).
    """
    bits = ch * depth
    stride = (width * bits + 7) // 8
    out = _png_unfilter(raw, height, stride, max(1, bits // 8))
    if depth == 16:
        samples = out.reshape(height, stride).view(">u2").astype(np.uint16)
        return (samples >> 8).astype(np.uint8).reshape(height, width, ch)
    if depth == 8:
        return out.reshape(height, width, ch)
    bitrows = np.unpackbits(out, axis=1)[:, : width * depth]
    idx = bitrows.reshape(height, width, depth)
    weights = 1 << np.arange(depth - 1, -1, -1, dtype=np.uint8)
    return (idx * weights).sum(axis=2).astype(np.uint8).reshape(height, width, 1)


def decode_png(content: bytes) -> np.ndarray:
    """Parse a PNG into an (h, w, channels) uint8 array.

    Stdlib-only: chunk walk → zlib-inflate the IDAT stream → unfilter.
    Supports color types 0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA) at bit
    depths 8 and 16, and type 3 (palette) at depths 1/2/4/8 — the full PNG
    matrix — in both non-interlaced and Adam7-interlaced form (each of the
    7 reduced passes is independently unfiltered at its own stride, then
    scattered onto the output grid, spec §8.2). 16-bit samples render to
    8-bit via the high byte (exact for the canonical 0xHHHH = 0xHH·257
    encoding); palette indices resolve through PLTE to RGB (tRNS alpha
    ignored).
    """
    import struct
    import zlib

    if not content.startswith(PNG_MAGIC):
        raise DecoderUnavailable("not a PNG payload")
    pos, idat, meta, plte = len(PNG_MAGIC), [], None, None
    while pos + 8 <= len(content):
        (length,), tag = struct.unpack(">I", content[pos : pos + 4]), content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        if tag == b"IHDR":
            meta = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"PLTE":
            plte = data
        elif tag == b"IEND":
            break
        pos += 12 + length  # length + tag + data + crc
    if meta is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    width, height, depth, color_type, _comp, _filt, interlace = meta
    ok = (color_type in (0, 2, 4, 6) and depth in (8, 16)) or (
        color_type == 3 and depth in (1, 2, 4, 8)
    )
    if not ok or interlace not in (0, 1):
        raise DecoderUnavailable(
            f"PNG variant not supported (depth={depth}, color_type={color_type}, "
            f"interlace={interlace})"
        )
    ch = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(b"".join(idat))
    if interlace == 0:
        samples = _png_samples(raw, width, height, depth, ch)
    else:  # Adam7: 7 independently filtered reduced images, scattered back
        bits = ch * depth
        samples = np.zeros((height, width, ch), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            w_p = (width - x0 + dx - 1) // dx
            h_p = (height - y0 + dy - 1) // dy
            if w_p <= 0 or h_p <= 0:
                continue  # empty pass emits no scanlines (spec §8.2)
            n = h_p * (1 + (w_p * bits + 7) // 8)
            samples[y0::dy, x0::dx] = _png_samples(
                raw[off : off + n], w_p, h_p, depth, ch
            )
            off += n
        if off != len(raw):
            raise ValueError("PNG pixel data length mismatch")
    if color_type == 3:
        if plte is None or len(plte) % 3:
            raise ValueError("palette PNG missing or malformed PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = samples[:, :, 0]
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("palette index out of range")
        return pal[idx]
    return samples


def encode_ppm(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """Minimal valid solid-color P6 image (deterministic test payloads)."""
    header = f"P6\n{width} {height}\n255\n".encode()
    return header + bytes(rgb) * (width * height)


def decode_ppm(content: bytes) -> np.ndarray:
    """Parse a binary P6 PPM into an (h, w, 3) uint8 array. Stdlib-only."""
    if not content.startswith(b"P6"):
        raise DecoderUnavailable("not a P6 PPM payload")
    # header = 4 whitespace-separated tokens (comments start with '#')
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3 and i < len(content):
        while i < len(content) and content[i : i + 1].isspace():
            i += 1
        if content[i : i + 1] == b"#":
            while i < len(content) and content[i : i + 1] != b"\n":
                i += 1
            continue
        start = i
        while i < len(content) and not content[i : i + 1].isspace():
            i += 1
        tokens.append(content[start:i])
    i += 1  # single whitespace after maxval, then raw RGB
    width, height, maxval = (int(t) for t in tokens)
    if maxval > 255:
        raise DecoderUnavailable("16-bit PPM not supported")
    pixels = np.frombuffer(content, dtype=np.uint8, count=width * height * 3, offset=i)
    return pixels.reshape(height, width, 3)


def encode_wav(n_samples: int, sample_rate: int, amplitude: int) -> bytes:
    """Minimal valid 16-bit mono PCM WAV with constant-amplitude samples."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(
            np.full(n_samples, amplitude, dtype=np.int16).tobytes()
        )
    return buf.getvalue()


def _mulaw_decode_table() -> np.ndarray:
    """G.711 μ-law byte → linear int16 expansion table (the public
    ((m·8+0x84)<<e − 0x84 formula; bytes are stored ones-complemented)."""
    out = np.empty(256, dtype=np.int16)
    for b in range(256):
        u = ~b & 0xFF
        sign = u & 0x80
        e = (u >> 4) & 0x07
        m = u & 0x0F
        mag = (((m << 3) + 0x84) << e) - 0x84
        out[b] = -mag if sign else mag
    return out


_MULAW_TABLE = _mulaw_decode_table()


def mulaw_byte(e: int, m: int, negative: bool = False) -> int:
    """The μ-law byte whose expansion is ±(((m·8+0x84)<<e) − 0x84) —
    test-fixture inverse of the decode table."""
    u = (0x80 if negative else 0) | ((e & 7) << 4) | (m & 0xF)
    return ~u & 0xFF


def _alaw_decode_table() -> np.ndarray:
    """G.711 A-law byte → linear int16 expansion table (the public Sun/
    CCITT form: XOR 0x55, then segment e with mantissa m expands to
    (m·16+8) for e=0 and ((m·16+264)·2^(e−1)) otherwise; the post-XOR
    sign bit SET means positive)."""
    out = np.empty(256, dtype=np.int16)
    for b in range(256):
        a = b ^ 0x55
        e = (a >> 4) & 0x07
        m = a & 0x0F
        mag = (m << 4) + 8 if e == 0 else ((m << 4) + 0x108) << (e - 1)
        out[b] = mag if (a & 0x80) else -mag
    return out


_ALAW_TABLE = _alaw_decode_table()


def alaw_byte(e: int, m: int, negative: bool = False) -> int:
    """The A-law byte whose expansion is ±((m·16+8) | ((m·16+264)·2^(e−1)))
    — test-fixture inverse of the decode table."""
    a = (0 if negative else 0x80) | ((e & 7) << 4) | (m & 0xF)
    return a ^ 0x55


def encode_wav_alaw(n_samples: int, sample_rate: int, byte: int) -> bytes:
    """Minimal mono G.711 A-law WAV (format tag 6) with a constant byte."""
    import struct as _struct

    data = bytes([byte]) * n_samples
    fmt = _struct.pack("<HHIIHH", 6, 1, sample_rate, sample_rate, 1, 8)
    body = (
        b"WAVEfmt " + _struct.pack("<I", len(fmt)) + fmt
        + b"data" + _struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + _struct.pack("<I", 4 + len(body) - 4) + body


def synthetic_alaw_media_df(spark, n: int = 48) -> DataFrame:
    """A-law audio rows sweeping every segment e, mantissa grid, and both
    signs: constant bytes make RMS the exact expansion magnitude and the
    dominant bin DC — every stat closed-form for the oracle."""
    rows = []
    for i in range(n):
        sr = 8000 + 8000 * (i % 2)
        n_samples = 800 + 160 * (i % 5)
        content = encode_wav_alaw(
            n_samples, sr, alaw_byte(e=i % 8, m=(i * 5) % 16, negative=i % 2 == 1)
        )
        rows.append((i, "audio", bytearray(content)))
    return spark.createDataFrame(
        rows, "media_id long, kind string, content binary"
    )


def decode_wav(content: bytes) -> tuple[np.ndarray, int, int]:
    """Parse a WAV into (int16 samples interleaved, sample_rate,
    n_channels). Stdlib-only: 16-bit PCM via the wave module, G.711 μ-law /
    A-law (format tags 7/6 — telephony corpora) via a manual RIFF chunk walk
    + expansion tables. Other sample formats raise DecoderUnavailable."""
    import io
    import wave

    if not content.startswith(b"RIFF"):
        raise DecoderUnavailable("not a RIFF/WAV payload")
    try:
        with wave.open(io.BytesIO(content), "rb") as w:
            if w.getsampwidth() != 2:
                raise DecoderUnavailable("only 16-bit PCM supported")
            frames = w.readframes(w.getnframes())
            return (
                np.frombuffer(frames, dtype=np.int16),
                w.getframerate(),
                w.getnchannels(),
            )
    except wave.Error:
        pass  # non-PCM format tag: walk the chunks ourselves
    import struct as _struct

    pos, fmt, data = 12, None, None
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        (size,) = _struct.unpack("<I", content[pos + 4 : pos + 8])
        body = content[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = _struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, nch, sr, _brate, _align, bits = fmt
    if tag == 7 and bits == 8:  # G.711 μ-law
        samples = _MULAW_TABLE[np.frombuffer(data, dtype=np.uint8)]
        return samples, sr, nch
    if tag == 6 and bits == 8:  # G.711 A-law
        samples = _ALAW_TABLE[np.frombuffer(data, dtype=np.uint8)]
        return samples, sr, nch
    if tag == 17 and bits == 4:  # IMA ADPCM
        if nch != 1:
            raise DecoderUnavailable("multi-channel IMA ADPCM not supported")
        return _ima_adpcm_decode_mono(data, _align), sr, nch
    raise DecoderUnavailable(f"unsupported WAV format tag {tag}/{bits}-bit")


# IMA/DVI ADPCM spec constants (IMA Digital Audio Focus Group, 1992; also
# Microsoft WAVE format tag 0x0011 documentation) — public tables.
_IMA_STEP_TABLE = np.array(
    [7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
     41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
     190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
     724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
     2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
     6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
     16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767],
    dtype=np.int32,
)
_IMA_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def _ima_adpcm_decode_mono(data: bytes, block_align: int) -> np.ndarray:
    """Mono IMA ADPCM block decode: each block opens with (predictor int16,
    step index uint8, reserved uint8) — the header predictor IS the first
    output sample — followed by 4-bit codes, low nibble first.

        diff = step>>3 (+step if b&4) (+step>>1 if b&2) (+step>>2 if b&1)
        predictor ± diff (sign = b&8), clamped to int16
        index += index_table[b&7], clamped to [0, 88]

    The per-sample recurrence is inherently sequential WITHIN a block, but
    blocks are independent — the distributed unit is the media row (and at
    scale the block), so the Python loop here bounds only per-block work
    (block_align bytes), never corpus size."""
    out = []
    for pos in range(0, len(data) - (len(data) % block_align), block_align):
        block = data[pos : pos + block_align]
        pred = int.from_bytes(block[0:2], "little", signed=True)
        index = min(max(block[2], 0), 88)
        out.append(pred)
        step = int(_IMA_STEP_TABLE[index])
        for byte in block[4:]:
            for nib in (byte & 0x0F, byte >> 4):
                diff = step >> 3
                if nib & 4:
                    diff += step
                if nib & 2:
                    diff += step >> 1
                if nib & 1:
                    diff += step >> 2
                pred = pred - diff if nib & 8 else pred + diff
                pred = min(max(pred, -32768), 32767)
                index = min(max(index + int(_IMA_INDEX_TABLE[nib & 7]), 0), 88)
                step = int(_IMA_STEP_TABLE[index])
                out.append(pred)
    return np.array(out, dtype=np.int16)


def encode_wav_adpcm_const(
    n_blocks: int, sample_rate: int, predictor: int, block_align: int = 12,
    channels: int = 1,
) -> bytes:
    """Mono IMA ADPCM WAV whose every block is (predictor, index 0,
    all-zero nibbles). At index 0 the step is 7, so code 0 decodes to
    diff = 7>>3 = 0 and index stays clamped at 0: the decoded signal is
    EXACTLY constant at ``predictor`` — rms = |predictor| and dominant
    frequency 0 are closed forms for the oracle. ``channels`` > 1 builds a
    header advertising stereo (the honest decoder_unavailable channel)."""
    import struct as _struct

    spb = (block_align - 4) * 2 + 1
    block = (
        _struct.pack("<hBB", predictor, 0, 0) + b"\x00" * (block_align - 4)
    )
    data = block * n_blocks
    fmt = _struct.pack(
        "<HHIIHHHH",
        17, channels, sample_rate,
        sample_rate * block_align // spb, block_align, 4, 2, spb,
    )
    body = (
        b"WAVEfmt " + _struct.pack("<I", len(fmt)) + fmt
        + b"data" + _struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + _struct.pack("<I", 4 + len(body) - 4) + body


def synthetic_adpcm_media_df(spark, n: int = 48) -> DataFrame:
    """IMA ADPCM rows: constant-signal blocks with per-row predictors
    sweeping both signs and the int16 range (rms = |P|, dominant 0);
    every 8th row advertises stereo — the gated decoder_unavailable path."""
    rows = []
    for i in range(n):
        sr = 8000 + 4000 * (i % 3)
        pred = ((i * 2741) % 4001) - 2000
        nch = 2 if i % 8 == 7 else 1
        content = encode_wav_adpcm_const(
            n_blocks=30 + i % 5, sample_rate=sr, predictor=pred, channels=nch
        )
        rows.append((i, "audio", bytearray(content)))
    return spark.createDataFrame(
        rows, "media_id long, kind string, content binary"
    )


def encode_wav_sine_sr4(n_samples: int, sample_rate: int, amplitude: int) -> bytes:
    """Mono 16-bit PCM sine at EXACTLY sample_rate/4: the sample pattern is
    the integer-exact [0, A, 0, −A], so both the RMS (A/√2) and the
    dominant rfft bin (n/4 → sr/4 Hz) have closed forms."""
    import io
    import wave

    if n_samples % 4:
        raise ValueError("n_samples must be a multiple of 4")
    pattern = np.array([0, amplitude, 0, -amplitude], dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(np.tile(pattern, n_samples // 4).tobytes())
    return buf.getvalue()


def encode_wav_mulaw(n_samples: int, sample_rate: int, byte: int) -> bytes:
    """Minimal mono G.711 μ-law WAV (format tag 7) with a constant byte —
    manual RIFF writer since the stdlib wave module is PCM-only."""
    import struct as _struct

    data = bytes([byte]) * n_samples
    fmt = _struct.pack("<HHIIHH", 7, 1, sample_rate, sample_rate, 1, 8)
    body = (
        b"WAVEfmt " + _struct.pack("<I", len(fmt)) + fmt
        + b"data" + _struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + _struct.pack("<I", 4 + len(body) - 4) + body


def synthetic_audio_media_df(spark, n: int = 48) -> DataFrame:
    """Audio table with closed-form spectral stats: rows rotate through a
    bin-aligned sine (dominant = sr/4, rms = A/√2), a constant PCM level
    (dominant bin 0, rms = |level|), and a constant μ-law byte (decoded
    magnitude is the G.711 closed form (((m·8)+132)·2^e − 132)."""
    rows = []
    for i in range(n):
        sr = 8000 + 4000 * (i % 3)
        n_samples = 1024 + 256 * (i % 4)
        if i % 3 == 0:
            content = encode_wav_sine_sr4(n_samples, sr, 1000 + 500 * (i % 5))
        elif i % 3 == 1:
            content = encode_wav(n_samples, sr, 100 * (i % 7))
        else:
            content = encode_wav_mulaw(
                n_samples, sr, mulaw_byte(e=i % 8, m=(i * 3) % 16)
            )
        rows.append((i, "audio", bytearray(content)))
    return spark.createDataFrame(
        rows, "media_id long, kind string, content binary"
    )


def wav_spectral_features(df: DataFrame) -> DataFrame:
    """REAL audio feature extraction (numpy rfft inside mapInPandas): per
    media row — sample rate, sample count, RMS level, and the dominant
    spectral frequency in Hz (argmax |rfft| bin scaled by sr/n). The
    audio analog of the image decode path: features are fixed-width
    scalars, raw samples never leave the task. Stereo folds to mono by
    channel mean before the transform."""
    schema = (
        "media_id long, sr int, n_samples int, rms double, "
        "dominant_freq_hz double, decode_status string"
    )

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {k: [] for k in
                   ("media_id", "sr", "n_samples", "rms",
                    "dominant_freq_hz", "decode_status")}
            for mid, content in zip(b["media_id"], b["content"]):
                sr = ns = None
                rms = dom = None
                try:
                    samples, rate, nch = decode_wav(bytes(content))
                    mono = (
                        samples.reshape(-1, nch).mean(axis=1)
                        if nch > 1 else samples.astype(np.float64)
                    )
                    sr, ns = int(rate), int(mono.size)
                    rms = round(float(np.sqrt(np.mean(mono * mono))), 4)
                    spec = np.abs(np.fft.rfft(mono))
                    peak = int(np.argmax(spec))
                    dom = round(float(peak * sr / ns), 4)
                    status = "ok"
                except DecoderUnavailable:
                    status = "decoder_unavailable"
                except Exception:
                    status = "decode_error"
                out["media_id"].append(mid)
                out["sr"].append(sr)
                out["n_samples"].append(ns)
                out["rms"].append(rms)
                out["dominant_freq_hz"].append(dom)
                out["decode_status"].append(status)
            yield pd.DataFrame(out)

    return df.select("media_id", "content").mapInPandas(_feat, schema)


def synthetic_real_media_df(spark, n: int = 64) -> DataFrame:
    """Media table whose image/audio payloads are REAL decodable bytes
    (solid-color P6 and PNG alternating, constant-amplitude WAV) with
    closed-form expected stats — video rows stay opaque (their codec is
    genuinely unavailable)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            v = (i * 7) % 256
            codec = encode_ppm if i % 6 == 0 else encode_png
            content = codec(16 + i % 8, 12 + i % 4, (v, v, v))
        elif kind == "audio":
            content = encode_wav(800 + i * 10, 8000, (i * 3) % 1000)
        else:
            content = b"\x00\x00\x00\x18ftypmp42" + bytes([i % 256]) * 64
        rows.append((i, kind, bytearray(content)))
    return spark.createDataFrame(
        rows, "media_id long, kind string, content binary"
    )


def synthetic_gif_media_df(spark, n: int = 48) -> DataFrame:
    """Animated-GIF media table with closed-form per-frame stats.

    Full-canvas solid frames from a 4-gray palette (10+60·c), frame j
    of row i colored ((i+j) % 4), delays ((i+j) % 3 + 1)·2 hundredths,
    disposal=leave, interlace on odd rows — every frame mean, timestamp,
    and duration is SQL arithmetic for the `media_gif_frames` oracle while
    the decoder runs real LZW/interlace/compositing.
    """
    from hatchery_spark.functions.gif import encode_gif

    pal = np.array([[v] * 3 for v in (10, 70, 130, 190)], dtype=np.uint8)
    rows = []
    for i in range(n):
        n_frames = i % 4 + 1
        w, h = 16 + i % 7, 10 + i % 5
        frames = [
            np.full((h, w), (i + j) % 4, dtype=np.uint8) for j in range(n_frames)
        ]
        delays = [((i + j) % 3 + 1) * 2 for j in range(n_frames)]
        content = encode_gif(
            frames, pal, delays=delays, disposals=[1] * n_frames,
            interlace=bool(i % 2),
        )
        rows.append((i, "video", bytearray(content)))
    return spark.createDataFrame(
        rows, "media_id long, kind string, content binary"
    )


def gif_frame_stats(df: DataFrame) -> DataFrame:
    """REAL video-style frame sampling: decode every GIF frame (LZW +
    compositing), one output row per frame with its start timestamp (the
    cumulative delay clock) and pixel mean — the frame-sample stage a
    video pipeline runs, actually executed instead of stubbed. mapInPandas
    (iterator form); output rows are fixed-width stats, never pixels."""
    schema = (
        "media_id long, frame_idx int, ts_ms int, width int, height int, "
        "frame_mean double"
    )

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from hatchery_spark.functions.gif import decode_gif

        for b in batches:
            out = {k: [] for k in
                   ("media_id", "frame_idx", "ts_ms", "width", "height",
                    "frame_mean")}
            for mid, content in zip(b["media_id"], b["content"]):
                frames, delays = decode_gif(bytes(content))
                t = 0
                for j in range(frames.shape[0]):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(j)
                    out["ts_ms"].append(t * 10)
                    out["width"].append(frames.shape[2])
                    out["height"].append(frames.shape[1])
                    out["frame_mean"].append(round(float(frames[j].mean()), 4))
                    t += delays[j]
            yield pd.DataFrame(out)

    return df.select("media_id", "content").mapInPandas(_frames, schema)


def synthetic_jpeg_media_df(spark, n: int = 64) -> DataFrame:
    """JPEG media table with closed-form expected stats.

    Solid-gray JPEGs (unit quantization tables → the round trip is EXACT:
    every decoded pixel equals the encoded gray, no rounding), rotating
    through 4:4:4 / 4:2:0 sampling and restart-marker intervals so the
    decoder's chroma-upsample and RST paths are both driver-checked. Every
    8th row is a PROGRESSIVE (SOF2) payload — interleaved DC scan +
    per-component EOB-run AC scans — decoded by the same closed form.
    Every 16th row is ARITHMETIC-CODED (SOF9, QM-class coder + the Annex F
    statistical models, functions/jpeg_arith.py) and every 32nd is
    PROGRESSIVE-ARITHMETIC (SOF10, full refinement chain), both decoded by
    the same closed form; hierarchical modes remain the honest
    `decoder_unavailable` channel (SOF11 lossless-arithmetic is covered by
    the media_jpeg_lossless fixture).
    """
    from hatchery_spark.functions.jpeg import (
        encode_jpeg,
        encode_jpeg_progressive,
    )
    from hatchery_spark.functions.jpeg_arith import encode_jpeg_arith

    rows = []
    for i in range(n):
        if i % 32 == 31:
            # PROGRESSIVE arithmetic (SOF10): single-component solid gray —
            # decode_media replicates to 3 channels, same closed form
            from hatchery_spark.functions.jpeg_arith import (
                encode_jpeg_gray_arith_progressive,
            )

            img = np.full((12 + i % 5, 16 + i % 9), (i * 11) % 256, np.int32)
            content = encode_jpeg_gray_arith_progressive(img, al_max=1)
        elif i % 16 == 15:
            content = encode_jpeg_arith(
                width=16 + i % 9,
                height=12 + i % 5,
                gray=(i * 11) % 256,
                subsampling="420" if i % 2 else "444",
                restart_interval=2 if i % 4 == 3 else 0,
            )
        elif i % 8 == 7:
            content = encode_jpeg_progressive(
                width=16 + i % 9,
                height=12 + i % 5,
                gray=(i * 11) % 256,
                subsampling="420" if i % 2 else "444",
            )
        else:
            content = encode_jpeg(
                width=16 + i % 9,
                height=12 + i % 5,
                gray=(i * 11) % 256,
                subsampling="420" if i % 2 else "444",
                restart_interval=2 if i % 4 == 0 else 0,
            )
        rows.append((i, "image", bytearray(content)))
    return spark.createDataFrame(
        rows, "media_id long, kind string, content binary"
    )


def synthetic_jpeg_lossless_media_df(spark, n: int = 28) -> DataFrame:
    """LOSSLESS JPEG media table (Annex H — DNG/medical archival form) with
    REAL gradient content: img[y][x] = (x + y + i) % 256. Decode is exact
    by definition, so px_mean has a closed form the oracle recomputes over
    the same grid — and because lossless output is predictor- AND
    entropy-coding-independent, the rotation proves all 7 predictors,
    point transforms, restart intervals, interleaved RGB (i%4==1), and
    BOTH entropy codings (Huffman SOF3; arithmetic SOF11 at i%4==2)
    against the same expectation."""
    from hatchery_spark.functions.jpeg_lossless import (
        encode_jpeg_gray_lossless,
        encode_jpeg_rgb_lossless,
    )

    rows = []
    for i in range(n):
        w, h = 16 + i % 9, 12 + i % 5
        yy, xx = np.indices((h, w))
        if i % 4 == 1:
            # interleaved direct-RGB lossless (DNG layout): per-channel
            # gradient, same closed form per channel
            img3 = np.stack(
                [((xx + yy + i + ch) % 256) for ch in range(3)], axis=2
            ).astype(np.int32)
            if i % 8 == 5:
                # interleaved RGB through the ARITHMETIC coding (SOF11)
                from hatchery_spark.functions.jpeg_lossless import (
                    encode_jpeg_rgb_lossless_arith,
                )

                content = encode_jpeg_rgb_lossless_arith(
                    img3, predictor=1 + i % 7, restart_interval=5
                )
            else:
                content = encode_jpeg_rgb_lossless(img3, predictor=1 + i % 7)
        elif i % 4 == 2:
            # lossless ARITHMETIC (SOF11, Annex H model + QM coder): same
            # gradient + point transform → the SAME closed form; the shared
            # oracle proves the two entropy codings decode identically
            from hatchery_spark.functions.jpeg_lossless import (
                encode_jpeg_gray_lossless_arith,
            )

            img = ((xx + yy + i) % 256).astype(np.int32)
            content = encode_jpeg_gray_lossless_arith(
                img,
                predictor=1 + i % 7,
                point_transform=i % 3,
                restart_interval=11 if i % 8 == 6 else 0,
            )
        else:
            img = ((xx + yy + i) % 256).astype(np.int32)
            content = encode_jpeg_gray_lossless(
                img,
                predictor=1 + i % 7,
                point_transform=i % 3,
                restart_interval=13 if i % 4 == 3 else 0,
            )
        rows.append((i, "image", bytearray(content)))
    return spark.createDataFrame(
        rows, "media_id long, kind string, content binary"
    )


def synthetic_jpeg12_media_df(spark, n: int = 32) -> DataFrame:
    """12-bit JPEG media table (EXTENDED SEQUENTIAL, SOF1 — medical/scientific
    imaging's precision). Solid grays within ±255 of mid-level 2048 (the
    fixture's Annex-K-table category bound; the decoder itself takes any
    category) with unit quantization → decode is exact, px_mean == gray.
    Rotates 4:4:4 / 4:2:0 and restart intervals like the 8-bit fixture."""
    from hatchery_spark.functions.jpeg import encode_jpeg

    rows = []
    for i in range(n):
        content = encode_jpeg(
            width=16 + i % 9,
            height=12 + i % 5,
            gray=2048 + ((i * 37) % 511) - 255,
            subsampling="420" if i % 2 else "444",
            restart_interval=2 if i % 4 == 0 else 0,
            precision=12,
        )
        rows.append((i, "image", bytearray(content)))
    return spark.createDataFrame(
        rows, "media_id long, kind string, content binary"
    )


def decode_media(df: DataFrame) -> DataFrame:
    """REAL decode via mapInPandas: PPM/PNG/JPEG → pixel stats, WAV → sample
    stats.

    Output (fixed-width, never the raw bytes):
      media_id, kind, width, height, duration_ms, px_mean, decode_status.
    Formats without an available codec report decoder_unavailable — the honest
    outcome, distinct from a parse error on a corrupt payload (decode_error).
    """
    schema = (
        "media_id long, kind string, width int, height int, "
        "duration_ms int, px_mean double, decode_status string"
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from hatchery_spark.functions.jpeg import JPEG_MAGIC, decode_jpeg

        for b in batches:
            out = {k: [] for k in
                   ("media_id", "kind", "width", "height", "duration_ms",
                    "px_mean", "decode_status")}
            for mid, kind, content in zip(b["media_id"], b["kind"], b["content"]):
                raw = bytes(content) if content is not None else b""
                w = h = dur = px = None
                try:
                    if raw.startswith(b"P6"):
                        img = decode_ppm(raw)
                        h, w = img.shape[0], img.shape[1]
                        px = round(float(img.mean()), 4)
                        status = "ok_ppm"
                    elif raw.startswith(PNG_MAGIC):
                        img = decode_png(raw)
                        h, w = img.shape[0], img.shape[1]
                        color = img[:, :, :3] if img.shape[2] >= 3 else img[:, :, :1]
                        px = round(float(color.mean()), 4)
                        status = "ok_png"
                    elif raw.startswith(JPEG_MAGIC):
                        img = decode_jpeg(raw)
                        h, w = img.shape[0], img.shape[1]
                        px = round(float(img.mean()), 4)
                        status = "ok_jpeg"
                    elif raw[:6] in (b"GIF87a", b"GIF89a"):
                        from hatchery_spark.functions.gif import decode_gif

                        frames, delays = decode_gif(raw)
                        h, w = frames.shape[1], frames.shape[2]
                        dur = int(sum(delays) * 10)  # delays are 1/100 s
                        px = round(float(frames.mean()), 4)
                        status = "ok_gif"
                    elif raw[:4] in (b"II*\x00", b"MM\x00*"):
                        from hatchery_spark.functions.tiff import decode_tiff

                        img = decode_tiff(raw)
                        h, w = img.shape[0], img.shape[1]
                        px = round(float(img.mean()), 4)
                        status = "ok_tiff"
                    elif raw.startswith(b"BM"):
                        from hatchery_spark.functions.bmp import decode_bmp

                        img = decode_bmp(raw)
                        h, w = img.shape[0], img.shape[1]
                        px = round(float(img.mean()), 4)
                        status = "ok_bmp"
                    elif raw.startswith(b"qoif"):
                        from hatchery_spark.functions.qoi import decode_qoi

                        img = decode_qoi(raw)
                        h, w = img.shape[0], img.shape[1]
                        px = round(float(img[:, :, :3].mean()), 4)
                        status = "ok_qoi"
                    elif raw.startswith(b"RIFF"):
                        samples, sr, nch = decode_wav(raw)
                        dur = int(len(samples) // nch * 1000 / sr)
                        px = round(float(np.abs(samples.astype(np.float64)).mean()), 4)
                        status = "ok_wav"
                    else:
                        raise DecoderUnavailable(f"no codec for {kind} payload")
                except DecoderUnavailable:
                    status = "decoder_unavailable"
                except Exception:
                    status = "decode_error"
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["width"].append(w)
                out["height"].append(h)
                out["duration_ms"].append(dur)
                out["px_mean"].append(px)
                out["decode_status"].append(status)
            yield pd.DataFrame(out)

    return df.mapInPandas(_decode, schema)


def sample_video_frames(df: DataFrame, every_ms: int = 500) -> DataFrame:
    """Frame-sampling plumbing: explode a frame-timestamp grid per video row.

    The actual frame grab is the stubbed decode step; the grid (which frames a
    real sampler would pull) is computed natively from duration_ms.
    """
    frames = F.sequence(
        F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)), F.lit(every_ms)
    )
    return (
        df.filter(F.col("kind") == "video")
        .withColumn("frame_ms", F.explode(frames))
        .select("media_id", "frame_ms")
    )


def resize_grid(grid: np.ndarray, out_h: int = 8, out_w: int = 8) -> np.ndarray:
    """Real resize of a grayscale pixel grid to (out_h, out_w), float64.

    Area interpolation (block mean) when downsampling — each output pixel is
    the mean of its source block, the standard anti-aliased thumbnail path —
    and nearest-neighbor when a source dimension is smaller than the target.
    Pure numpy; no image library.
    """
    h, w = grid.shape
    g = grid.astype(np.float64)
    if h >= out_h and w >= out_w:
        ys = (np.arange(out_h + 1) * h) // out_h
        xs = (np.arange(out_w + 1) * w) // out_w
        out = np.empty((out_h, out_w), np.float64)
        for i in range(out_h):
            for j in range(out_w):
                out[i, j] = g[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean()
        return out
    yi = (np.arange(out_h) * h) // out_h
    xi = (np.arange(out_w) * w) // out_w
    return g[np.ix_(yi, xi)]


def media_thumbnails(df: DataFrame, out_h: int = 8, out_w: int = 8) -> DataFrame:
    """REAL decode → grayscale → resize to a fixed (out_h × out_w) thumbnail.

    mapInPandas, iterator form; output is the FIXED-width thumbnail vector
    (row-major array<double>) plus its mean/std — never raw bytes — so the
    downstream image-dedup/similarity stages shuffle 64 doubles per image,
    not megapixel payloads. Formats without a codec (arithmetic JPEG/MP4)
    report decoder_unavailable; corrupt payloads report decode_error, never a
    task abort.
    """
    schema = (
        "media_id long, kind string, thumb array<double>, "
        "thumb_mean double, thumb_std double, decode_status string"
    )
    n_px = out_h * out_w

    def _thumbs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {k: [] for k in
                   ("media_id", "kind", "thumb", "thumb_mean", "thumb_std",
                    "decode_status")}
            for mid, kind, content in zip(b["media_id"], b["kind"], b["content"]):
                raw = bytes(content) if content is not None else b""
                thumb = mean = std = None
                try:
                    grid = real_decode_image(raw)
                    t = resize_grid(grid, out_h, out_w)
                    thumb = [round(float(x), 4) for x in t.reshape(n_px)]
                    mean = round(float(t.mean()), 4)
                    std = round(float(t.std()), 4)
                    status = "ok"
                except DecoderUnavailable:
                    status = "decoder_unavailable"
                except Exception:
                    status = "decode_error"
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["thumb"].append(thumb)
                out["thumb_mean"].append(mean)
                out["thumb_std"].append(std)
                out["decode_status"].append(status)
            yield pd.DataFrame(out)

    return df.mapInPandas(_thumbs, schema)


def synthetic_mp4_media_df(spark, n: int = 48) -> DataFrame:
    """MP4 table with closed-form container metadata: brands, v0/v1 box
    versions, 1–2 tracks (video + optional audio), largesize mdat and free
    boxes rotated in; i%16==11 is a non-BMFF payload (decoder_unavailable),
    i%16==15 a truncated moov (decode_error)."""
    from .mp4 import encode_mp4

    rows = []
    for i in range(n):
        if i % 16 == 11:
            content = bytes([i % 256]) * 64  # not BMFF at all
        else:
            ts = 600 * (1 + i % 4)
            dur = int(ts * ((3 + i % 5) + 0.5 * (i % 2)))
            tracks = [("vide", 16.0 * (10 + i % 6), 16.0 * (6 + i % 4))]
            if i % 2 == 1:
                tracks.append(("soun", 0.0, 0.0))
            content = encode_mp4(
                ["isom", "mp42", "avc1"][i % 3], ts, dur, tracks,
                largesize_mdat=(i % 8 == 7), free_box=(i % 4 == 2),
                versions=i % 2,
            )
            if i % 16 == 15:
                content = content[:-20]  # truncate into mdat → framing error
        rows.append((i, "video", bytearray(content)))
    return spark.createDataFrame(
        rows, "media_id long, kind string, content binary"
    )


def image_dhash(df: DataFrame, hash_h: int = 8, hash_w: int = 8) -> DataFrame:
    """Perceptual difference-hash (dHash) over REAL decoded images — the
    standard cheap image-dedup fingerprint: grayscale → (hash_h × hash_w+1)
    grid → one bit per horizontal neighbor pair (left < right) → hex
    string. Content-identical images hash identically ACROSS FORMATS
    because the hash sees decoded pixels, not bytes — byte-level digests
    can never catch a PNG and a JPEG of the same image. mapInPandas;
    output is (media_id, dhash, decode_status), 16 hex chars per image —
    downstream exact grouping is a plain groupBy, and near-dup grouping
    reuses the SimHash banded-Hamming machinery (dedup.simhash paths)
    since a dHash IS a 64-bit locality-sensitive sketch."""
    schema = "media_id long, dhash string, decode_status string"
    nbits = hash_h * hash_w

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out: dict[str, list] = {
                "media_id": [], "dhash": [], "decode_status": []}
            for mid, content in zip(b["media_id"], b["content"]):
                raw = bytes(content) if content is not None else b""
                h = None
                try:
                    grid = real_decode_image(raw)
                    if grid.shape != (hash_h, hash_w + 1):
                        grid = resize_grid(grid, hash_h, hash_w + 1)
                    bits = (grid[:, :-1] < grid[:, 1:]).reshape(nbits)
                    val = 0
                    for bit in bits:
                        val = (val << 1) | int(bit)
                    h = format(val, f"0{(nbits + 3) // 4}x")
                    status = "ok"
                except DecoderUnavailable:
                    status = "decoder_unavailable"
                except Exception:
                    status = "decode_error"
                out["media_id"].append(mid)
                out["dhash"].append(h)
                out["decode_status"].append(status)
            yield pd.DataFrame(out)

    return df.select("media_id", "content").mapInPandas(_hash, schema)


def synthetic_gradient_image_df(spark, n: int = 60) -> DataFrame:
    """Cross-format image-dedup fixtures: content id c = media_id // 2 is
    a 9×8 pattern px(y,x) = (7x(x+c+y) + 13y + 3c) mod 256 — quadratic in
    x so the horizontal comparisons flip direction (a monotonic gradient
    would hash every content identically), encoded as a REAL
    RGB PNG on even ids and a REAL interleaved-RGB lossless JPEG (SOF3,
    predictor rotating over all 7) on odd ids — two byte-disjoint
    encodings of IDENTICAL pixels, both exact by construction, so each
    content's pair must collapse into one dHash group."""
    from .jpeg_lossless import encode_jpeg_rgb_lossless

    rows = []
    for i in range(n):
        c = i // 2
        y, x = np.mgrid[0:8, 0:9]
        gray = ((7 * x * (x + c + y) + 13 * y + 3 * c) % 256).astype(np.uint8)
        img = np.repeat(gray[:, :, None], 3, axis=2)
        if i % 2 == 0:
            content = encode_png_rgb(img)
        else:
            content = encode_jpeg_rgb_lossless(img, predictor=c % 7 + 1)
        rows.append((i, "image", bytearray(content)))
    return spark.createDataFrame(
        rows, "media_id long, kind string, content binary"
    )


def synthetic_mjpeg_mp4_df(spark, n: int = 48) -> DataFrame:
    """Motion-JPEG MP4 table with closed-form per-frame stats.

    Row i: (i%4+2) solid-gray JPEG frames (gray (i*17+j*31)%256, unit
    quantization → decode is EXACT), sizes 16+i%9 × 12+i%5, per-frame
    durations (i+j)%3+1 at timescale 10 → ts_ms = 100·cumsum. Layout
    rotation: 4:2:0 on odd rows, multi-chunk stsc on i%3==1 (first chunk
    1 sample, 2 per chunk after), co64 on i%8==7, v1 boxes on odd rows.
    i%12==11 is an 'avc1' track (compressed bitstream — no decoder) so
    the honest decoder_unavailable channel is driver-checked too."""
    from .jpeg import encode_jpeg
    from .mp4 import encode_mp4_video

    rows = []
    for i in range(n):
        n_frames = i % 4 + 2
        w, h = 16 + i % 9, 12 + i % 5
        durs = [(i + j) % 3 + 1 for j in range(n_frames)]
        if i % 12 == 11:
            samples = [bytes([(i + j) % 256]) * 40 for j in range(n_frames)]
            codec = "avc1"
        else:
            samples = [
                encode_jpeg(w, h, (i * 17 + j * 31) % 256,
                            "420" if i % 2 else "444")
                for j in range(n_frames)
            ]
            codec = "jpeg"
        chunking = None
        if i % 3 == 1:
            chunking = [1] + [2] * ((n_frames - 1) // 2)
            if sum(chunking) < n_frames:
                chunking.append(n_frames - sum(chunking))
        content = encode_mp4_video(
            samples, durs, 10, w, h, codec=codec, chunking=chunking,
            co64=(i % 8 == 7), versions=i % 2,
        )
        rows.append((i, "video", bytearray(content)))
    return spark.createDataFrame(
        rows, "media_id long, kind string, content binary"
    )


def mp4_frame_stats(df: DataFrame) -> DataFrame:
    """REAL MP4 video frame decode: reconstruct the sample map from the
    container's stsd/stts/stsc/stsz/stco tables (functions/mp4.py), slice
    each frame's byte range out of mdat, and — for Motion-JPEG tracks —
    decode every frame with the in-repo T.81 decoder. One output row per
    frame with its decode timestamp and pixel mean; compressed codecs
    (avc1/hev1) surface ONE decoder_unavailable row per video, corrupt
    containers one decode_error row — a 100 TB video corpus never aborts
    a task. mapInPandas; pixels never leave the task."""
    schema = (
        "media_id long, frame_idx int, ts_ms int, width int, height int, "
        "frame_mean double, decode_status string"
    )

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .jpeg import decode_jpeg
        from .mp4 import parse_mp4_video_track

        for b in batches:
            out: dict[str, list] = {k: [] for k in
                   ("media_id", "frame_idx", "ts_ms", "width", "height",
                    "frame_mean", "decode_status")}

            def emit(mid, idx, ts, w, h, mean, status):
                out["media_id"].append(mid)
                out["frame_idx"].append(idx)
                out["ts_ms"].append(ts)
                out["width"].append(w)
                out["height"].append(h)
                out["frame_mean"].append(mean)
                out["decode_status"].append(status)

            for mid, content in zip(b["media_id"], b["content"]):
                raw = bytes(content) if content is not None else b""
                try:
                    track = parse_mp4_video_track(raw)
                    if track.codec != "jpeg":
                        raise DecoderUnavailable(
                            f"no decoder for codec {track.codec!r}")
                    for j, s in enumerate(track.samples):
                        img = decode_jpeg(raw[s.offset : s.offset + s.size])
                        emit(mid, j, s.dts * 1000 // track.timescale,
                             img.shape[1], img.shape[0],
                             round(float(img.mean()), 4), "ok")
                except DecoderUnavailable:
                    emit(mid, None, None, None, None, None,
                         "decoder_unavailable")
                except Exception:
                    emit(mid, None, None, None, None, None, "decode_error")
            yield pd.DataFrame(out)

    return df.select("media_id", "content").mapInPandas(_frames, schema)


def mp4_meta_features(df: DataFrame) -> DataFrame:
    """Container-metadata triage for a video corpus (ISO/IEC 14496-12 box
    walk in functions/mp4.py): duration, track layout, resolution — the
    stage a 100 TB video pipeline runs on EVERY object before any codec.
    Same shape as the image/audio paths: mapInPandas, fixed-width scalars
    out, payload bytes never leave the task; non-BMFF payloads surface as
    decoder_unavailable, corrupt framing as decode_error."""
    schema = (
        "media_id long, major_brand string, duration_sec double, "
        "n_tracks int, video_tracks int, audio_tracks int, "
        "width double, height double, decode_status string"
    )
    cols = ("major_brand", "duration_sec", "n_tracks", "video_tracks",
            "audio_tracks", "width", "height")

    def _meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .mp4 import parse_mp4_meta

        for b in batches:
            out: dict[str, list] = {k: [] for k in ("media_id",) + cols
                                    + ("decode_status",)}
            for mid, content in zip(b["media_id"], b["content"]):
                vals: dict[str, object] = dict.fromkeys(cols)
                status = "ok"
                try:
                    m = parse_mp4_meta(bytes(content))
                    vals.update(
                        major_brand=m.major_brand,
                        duration_sec=round(m.duration_sec, 4)
                        if m.duration_sec is not None else None,
                        n_tracks=m.n_tracks,
                        video_tracks=m.video_tracks,
                        audio_tracks=m.audio_tracks,
                        width=m.width, height=m.height,
                    )
                except DecoderUnavailable:
                    status = "decoder_unavailable"
                except Exception:
                    status = "decode_error"
                out["media_id"].append(mid)
                for k in cols:
                    out[k].append(vals[k])
                out["decode_status"].append(status)
            yield pd.DataFrame(out)

    return df.select("media_id", "content").mapInPandas(_meta, schema)


def synthetic_jpeg_hier_media_df(spark, n: int = 32) -> DataFrame:
    """HIERARCHICAL JPEG media table (Annex J): gradient content
    ((x·7 + y·13 + i·29) % 256) through two hierarchy shapes — a lossless
    two-level resolution pyramid (SOF3 base → EXP → SOF7 differential,
    with restart rotation), and the lossy-base + lossless-correction form
    (full-res SOF0 + SOF7 residual). Both land bit-exact by construction,
    so px_mean has the same closed form the oracle recomputes."""
    from hatchery_spark.functions.jpeg_hier import (
        encode_jpeg_hier_correction,
        encode_jpeg_hier_lossless_pyramid,
    )

    rows = []
    from hatchery_spark.functions.jpeg_hier import encode_jpeg_hier_pyramid_arith

    for i in range(n):
        w, h = 16 + i % 9, 12 + i % 5
        yy, xx = np.indices((h, w))
        img = ((xx * 7 + yy * 13 + i * 29) % 256).astype(np.int64)
        if i % 4 == 3:
            content = encode_jpeg_hier_correction(img)
        elif i % 4 == 1:
            # all-arithmetic hierarchy (SOF11 base + SOF15 differential):
            # same pixels → the SHARED closed form proves both codings
            content = encode_jpeg_hier_pyramid_arith(img)
        else:
            content = encode_jpeg_hier_lossless_pyramid(
                img, restart_interval=17 if i % 4 == 2 else 0
            )
        rows.append((i, "image", bytearray(content)))
    return spark.createDataFrame(
        rows, "media_id long, kind string, content binary"
    )


def synthetic_tiff_media_df(spark, n: int = 40) -> DataFrame:
    """Baseline TIFF media table sweeping the format matrix — gray/RGB/
    palette, uncompressed/PackBits/LZW (+ horizontal predictor), both byte
    orders, multi-strip — over gradient content, so px_mean has a closed
    form (decode is exact for every baseline compression)."""
    from hatchery_spark.functions.tiff import encode_tiff

    rows = []
    for i in range(n):
        w, h = 16 + i % 9, 12 + i % 5
        yy, xx = np.indices((h, w))
        if i % 5 == 3:
            img = np.stack(
                [(xx + yy + i + c * 30) % 256 for c in range(3)], axis=2
            ).astype(np.uint8)
            content = encode_tiff(img, compression=5, rows_per_strip=5)
        elif i % 5 == 4:
            idx = ((xx + yy) % 16).astype(np.uint8)
            cmap = np.stack(
                [
                    np.arange(16) * 17,
                    255 - np.arange(16) * 17,
                    (np.arange(16) * 3 + i) % 256,
                ],
                axis=1,
            ).astype(np.uint8)
            content = encode_tiff(idx, colormap=cmap)
        else:
            gray = ((xx * 5 + yy * 9 + i) % 256).astype(np.uint8)
            comp = {0: 1, 1: 32773, 2: 5}[i % 5]
            content = encode_tiff(
                gray,
                compression=comp,
                photometric=0 if i % 2 else 1,
                predictor=2 if i % 5 == 2 else 1,
                rows_per_strip=7 if i % 5 else None,
                big_endian=i % 5 == 1,
            )
        rows.append((i, "image", bytearray(content)))
    return spark.createDataFrame(
        rows, "media_id long, kind string, content binary"
    )


def synthetic_qoi_media_df(spark, n: int = 40) -> DataFrame:
    """QOI media table over gradient/blocky/flat-delta/alpha content so the
    encoder is forced through every opcode family (RUN+INDEX on the blocky
    rotation, DIFF on the ±1 rotation, LUMA/RGB on the channel-offset
    gradients, RGBA on the alpha rotation) and px_mean stays closed-form."""
    from hatchery_spark.functions.qoi import encode_qoi

    rows = []
    for i in range(n):
        w, h = 16 + i % 9, 12 + i % 5
        yy, xx = np.indices((h, w))
        if i % 4 == 1:
            v = ((xx // 4) * 8 + (yy // 4) * 8 + i) % 256
            img = np.stack([v, v, v], axis=2).astype(np.uint8)
        elif i % 4 == 2:
            v = (xx + yy + i) % 256
            img = np.stack([v, v, v], axis=2).astype(np.uint8)
        else:
            img = np.stack(
                [(xx * 3 + yy * 7 + i + c * 40) % 256 for c in range(3)], axis=2
            ).astype(np.uint8)
            if i % 4 == 3:
                alpha = ((xx * 5 + i) % 256).astype(np.uint8)
                img = np.concatenate([img, alpha[:, :, None]], axis=2)
        rows.append((i, "image", bytearray(encode_qoi(img))))
    return spark.createDataFrame(
        rows, "media_id long, kind string, content binary"
    )


def synthetic_bmp_media_df(spark, n: int = 40) -> DataFrame:
    """BMP media table sweeping the DIB matrix — 24/32-bit BGR(X), both row
    orders, 8-bit palette plain and RLE8 (runs + absolute mode) — over
    gradient content, so px_mean has a closed form per rotation."""
    from hatchery_spark.functions.bmp import encode_bmp_palette, encode_bmp_rgb

    rows = []
    for i in range(n):
        w, h = 16 + i % 9, 12 + i % 5
        yy, xx = np.indices((h, w))
        if i % 4 < 2:
            rgb = np.stack(
                [(xx * 3 + yy * 7 + i + c * 40) % 256 for c in range(3)], axis=2
            ).astype(np.uint8)
            content = encode_bmp_rgb(
                rgb, bpp=24 if i % 4 == 0 else 32, top_down=i % 8 < 4
            )
        else:
            idx = ((xx + yy) % 16).astype(np.uint8)
            pal = np.stack(
                [
                    np.arange(16) * 17,
                    255 - np.arange(16) * 17,
                    (np.arange(16) * 5 + i) % 256,
                ],
                axis=1,
            ).astype(np.uint8)
            content = encode_bmp_palette(idx, pal, rle=i % 4 == 3)
        rows.append((i, "image", bytearray(content)))
    return spark.createDataFrame(
        rows, "media_id long, kind string, content binary"
    )
