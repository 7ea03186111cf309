"""Baseline TIFF 6.0 — decoder + fixture encoders.

The scanned-document / archival-image format a large text-extraction corpus
meets constantly (page scans, DNG previews, fax archives). Implemented from
the public TIFF 6.0 specification: both byte orders (II/MM), the IFD tag
walk, multi-strip layout, and the three baseline compressions —
  1     uncompressed
  5     LZW (MSB-first codes, 9→12-bit width with the spec's EARLY-CHANGE
        width switch, Clear/EOI codes, optional horizontal-differencing
        Predictor 2)
  32773 PackBits
for PhotometricInterpretation 0/1 (gray, either polarity), 2 (RGB), and
3 (palette, 16-bit ColorMap scaled to 8-bit). 8 bits per sample (the
baseline requirement); anything else raises DecoderUnavailable honestly.

LZW conformance caveat (same posture as jpeg_arith.py): no third-party TIFF
fixtures exist in this environment, so the early-change convention is
verified by mirrored encoder/decoder round trips + the spec's pseudo-code,
not against another codec.

Reference parity note: hatchery never decodes media (objects pass through
byte-identical, destination/gcs/client.go:76); this module belongs to the
multimodal feature-extraction surface of the training-data pipeline.
"""

from __future__ import annotations

import struct

import numpy as np

from hatchery_spark.functions.multimodal import DecoderUnavailable

TIFF_MAGIC_LE = b"II*\x00"
TIFF_MAGIC_BE = b"MM\x00*"

_CLEAR, _EOI = 256, 257


# --------------------------------------------------------------------------
# LZW (TIFF variant: MSB-first bit packing, early change)
# --------------------------------------------------------------------------


def lzw_decode(data: bytes) -> bytes:
    out = bytearray()
    bitpos = 0
    nbits = len(data) * 8
    width = 9
    table: list[bytes] = []
    old: bytes | None = None

    def init_table():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    def next_code():
        nonlocal bitpos
        if bitpos + width > nbits:
            return _EOI
        byte0 = bitpos // 8
        avail = bytes(data[byte0 : byte0 + 3]).ljust(3, b"\x00")
        v = int.from_bytes(avail, "big")
        v >>= 24 - (bitpos % 8) - width
        bitpos += width
        return v & ((1 << width) - 1)

    init_table()
    while True:
        code = next_code()
        if code == _EOI:
            break
        if code == _CLEAR:
            init_table()
            code = next_code()
            if code == _EOI:
                break
            out += table[code]
            old = table[code]
            continue
        if old is None:
            raise ValueError("LZW stream starts without Clear")
        if code < len(table):
            s = table[code]
            table.append(old + s[:1])
        elif code == len(table):
            s = old + old[:1]
            table.append(s)
        else:
            raise ValueError("corrupt LZW code")
        out += s
        old = s
        # EARLY CHANGE (TIFF 6.0): widen one code before the table fills
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1
    return bytes(out)


def lzw_encode(data: bytes) -> bytes:
    """Mirror of lzw_decode (emits Clear up front, early-change widths,
    Clear again when the table would exceed 12 bits, EOI at the end)."""
    out = bytearray()
    acc = 0
    accbits = 0
    width = 9

    def emit(code):
        nonlocal acc, accbits
        acc = (acc << width) | code
        accbits += width
        while accbits >= 8:
            accbits -= 8
            out.append((acc >> accbits) & 0xFF)

    table: dict[bytes, int] = {}

    def init_table():
        nonlocal table, width
        table = {bytes([i]): i for i in range(256)}
        width = 9

    init_table()
    emit(_CLEAR)
    nxt = 258
    s = b""
    for b in data:
        cand = s + bytes([b])
        if cand in table:
            s = cand
            continue
        emit(table[s])
        table[cand] = nxt
        nxt += 1
        # mirror of the decoder's early change. The decoder's table lags the
        # encoder's by ONE entry (it can't form an entry until the next code
        # arrives), so the encoder widens at 2^w exactly when the decoder —
        # widening early at table size 2^w − 1 — reads the next code.
        if nxt == 4094:
            emit(_CLEAR)
            init_table()
            nxt = 258
        elif nxt == (1 << width) and width < 12:
            width += 1
        s = bytes([b])
    if s:
        emit(table[s])
    emit(_EOI)
    if accbits:
        out.append((acc << (8 - accbits)) & 0xFF)
    return bytes(out)


# --------------------------------------------------------------------------
# PackBits
# --------------------------------------------------------------------------


def packbits_decode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        n = data[i]
        i += 1
        if n < 128:
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        j = i + 1
        while (
            j < n
            and j - i < 128
            and not (j + 1 < n and data[j] == data[j + 1])
        ):
            j += 1
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    return bytes(out)


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------


def decode_tiff(content: bytes) -> np.ndarray:
    """Parse a baseline TIFF into (h, w, 3) uint8 (gray replicates,
    palette expands via the ColorMap, WhiteIsZero inverts)."""
    if content.startswith(TIFF_MAGIC_LE):
        e = "<"
    elif content.startswith(TIFF_MAGIC_BE):
        e = ">"
    else:
        raise DecoderUnavailable("not a TIFF payload")
    (ifd_off,) = struct.unpack(e + "I", content[4:8])
    (n_tags,) = struct.unpack(e + "H", content[ifd_off : ifd_off + 2])
    tags: dict[int, list[int]] = {}
    type_size = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}
    type_fmt = {1: "B", 3: "H", 4: "I"}
    for t in range(n_tags):
        off = ifd_off + 2 + t * 12
        tag, typ, count = struct.unpack(e + "HHI", content[off : off + 8])
        if typ not in type_fmt:
            continue
        total = type_size[typ] * count
        if total <= 4:
            raw = content[off + 8 : off + 8 + total]
        else:
            (voff,) = struct.unpack(e + "I", content[off + 8 : off + 12])
            raw = content[voff : voff + total]
        tags[tag] = list(struct.unpack(e + str(count) + type_fmt[typ], raw))

    def one(tag, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return v[0]

    w, h = one(256), one(257)
    spp = one(277, 1)
    bps = tags.get(258, [8] * spp)
    if any(b != 8 for b in bps):
        raise DecoderUnavailable("baseline TIFF: 8 bits/sample only")
    compression = one(259, 1)
    photometric = one(262, 1)
    predictor = one(317, 1)
    offsets = tags.get(273)
    counts = tags.get(279)
    if offsets is None or counts is None:
        raise ValueError("TIFF missing strip offsets/byte counts")
    rows_per_strip = one(278, h)

    raw = bytearray()
    for so, sc in zip(offsets, counts):
        strip = bytes(content[so : so + sc])
        if compression == 1:
            raw += strip
        elif compression == 5:
            raw += lzw_decode(strip)
        elif compression == 32773:
            raw += packbits_decode(strip)
        else:
            raise DecoderUnavailable(f"TIFF compression {compression} not supported")
        del strip
    expect = h * w * spp
    if len(raw) < expect:
        raise ValueError("TIFF strip data truncated")
    img = np.frombuffer(bytes(raw[:expect]), dtype=np.uint8).reshape(h, w, spp)
    if predictor == 2:
        img = np.cumsum(img.astype(np.int64), axis=1).astype(np.uint8)
    elif predictor != 1:
        raise DecoderUnavailable(f"TIFF predictor {predictor} not supported")

    if photometric == 2:
        if spp < 3:
            raise ValueError("RGB TIFF with <3 samples/pixel")
        return np.ascontiguousarray(img[:, :, :3])
    if photometric == 3:
        cmap = tags.get(320)
        if cmap is None or spp != 1:
            raise ValueError("palette TIFF missing ColorMap")
        n = len(cmap) // 3
        lut = (np.array(cmap, dtype=np.uint32).reshape(3, n).T // 257).astype(
            np.uint8
        )
        return lut[img[:, :, 0]]
    plane = img[:, :, 0]
    if photometric == 0:  # WhiteIsZero
        plane = 255 - plane
    return np.dstack([plane, plane, plane])


# --------------------------------------------------------------------------
# fixture encoders
# --------------------------------------------------------------------------


def _encode_ifd(e: str, entries: list[tuple[int, int, list[int]]],
                header_after: bytes) -> bytes:
    """Assemble header + IFD + out-of-line values + trailing data blob.
    ``entries`` = (tag, type, values); ``header_after`` = strip data placed
    after the IFD (offsets inside `entries` must already account for it)."""
    type_fmt = {1: "B", 3: "H", 4: "I"}
    type_size = {1: 1, 3: 2, 4: 4}
    n = len(entries)
    ifd_off = 8
    data_off = ifd_off + 2 + n * 12 + 4
    # first pass: sizes of out-of-line values
    extra = bytearray()
    fields = bytearray()
    for tag, typ, vals in sorted(entries):
        total = type_size[typ] * len(vals)
        packed = struct.pack(e + str(len(vals)) + type_fmt[typ], *vals)
        if total <= 4:
            val = packed.ljust(4, b"\x00")
        else:
            val = struct.pack(e + "I", data_off + len(extra))
            extra += packed
        fields += struct.pack(e + "HHI", tag, typ, len(vals)) + val
    magic = TIFF_MAGIC_LE if e == "<" else TIFF_MAGIC_BE
    out = bytearray(magic)
    out += struct.pack(e + "I", ifd_off)
    out += struct.pack(e + "H", n) + fields + struct.pack(e + "I", 0)
    out += extra
    out += header_after
    return bytes(out)


def encode_tiff(
    img: np.ndarray,
    compression: int = 1,
    photometric: int | None = None,
    predictor: int = 1,
    rows_per_strip: int | None = None,
    big_endian: bool = False,
    colormap: np.ndarray | None = None,
) -> bytes:
    """Fixture TIFF writer: gray (h, w), RGB (h, w, 3), or palette indices
    (h, w) + colormap (n, 3). Multi-strip, all three baseline compressions,
    optional horizontal-differencing predictor (compression 5)."""
    e = ">" if big_endian else "<"
    img = np.asarray(img, dtype=np.uint8)
    if colormap is not None:
        spp, photometric = 1, 3
        data3 = img[:, :, None]
    elif img.ndim == 2:
        spp = 1
        photometric = 1 if photometric is None else photometric
        data3 = (255 - img[:, :, None]) if photometric == 0 else img[:, :, None]
    else:
        spp = img.shape[2]
        photometric = 2
        data3 = img
    h, w = data3.shape[:2]
    rows_per_strip = rows_per_strip or h

    strips = []
    for y0 in range(0, h, rows_per_strip):
        rows = data3[y0 : y0 + rows_per_strip]
        if predictor == 2:
            d = rows.astype(np.int16)
            rows = np.concatenate(
                [d[:, :1], (d[:, 1:] - d[:, :-1]) & 0xFF], axis=1
            ).astype(np.uint8)
        raw = rows.tobytes()
        if compression == 5:
            strips.append(lzw_encode(raw))
        elif compression == 32773:
            strips.append(packbits_encode(raw))
        else:
            strips.append(raw)

    entries = [
        (256, 4, [w]),
        (257, 4, [h]),
        (258, 3, [8] * spp),
        (259, 3, [compression]),
        (262, 3, [photometric]),
        (277, 3, [spp]),
        (278, 4, [rows_per_strip]),
        (279, 4, [len(s) for s in strips]),
    ]
    if predictor != 1:
        entries.append((317, 3, [predictor]))
    if colormap is not None:
        cm = np.asarray(colormap, dtype=np.uint32)
        vals = (cm[:, 0] * 257).tolist() + (cm[:, 1] * 257).tolist() + (
            cm[:, 2] * 257
        ).tolist()
        entries.append((320, 3, vals))

    # two-pass: sizes first (dummy offsets), then real offsets
    dummy = entries + [(273, 4, [0] * len(strips))]
    base = len(_encode_ifd(e, dummy, b""))
    offs = []
    acc = base
    for s in strips:
        offs.append(acc)
        acc += len(s)
    entries.append((273, 4, offs))
    return _encode_ifd(e, entries, b"".join(strips))
