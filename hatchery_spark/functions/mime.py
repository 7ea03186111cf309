"""MIME sniffing by magic bytes — the first routing decision a crawl
pipeline makes on every fetched payload (before any decoder runs, before
charset detection, before text extraction). Misrouting here poisons every
downstream stage, so the sniff must be cheap and scan-adjacent.

``sniff_mime`` is a PURE-CODEGEN column expression: ``hex(substring(...))``
prefix compares chained with ``when`` — no UDF, no shuffle, whole-stage
codegen keeps it inside the parquet scan stage at any corpus size. The
magic-byte table follows the WHATWG MIME-sniffing registry's binary
patterns (png/jpeg/gif/bmp/tiff/riff/gzip/zip/pdf) plus the ISO-BMFF
``ftyp`` rule (brand box at offset 4) and the WARC version line.

Reference analog: hatchery's source decode dispatch (source/parse.go:21)
picks a decoder per configured format; at web scale the format field IS
the sniffed magic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (hex-prefix, byte offset 1-based, mime) — longest / most specific first.
_MAGIC: list[tuple[str, int, str]] = [
    ("89504E470D0A1A0A", 1, "image/png"),
    ("47494638", 1, "image/gif"),          # GIF87a / GIF89a share 'GIF8'
    ("FFD8FF", 1, "image/jpeg"),
    ("49492A00", 1, "image/tiff"),         # little-endian
    ("4D4D002A", 1, "image/tiff"),         # big-endian
    ("424D", 1, "image/bmp"),
    ("1F8B", 1, "application/gzip"),
    ("504B0304", 1, "application/zip"),
    ("25504446", 1, "application/pdf"),    # %PDF
    ("716F6966", 1, "image/qoi"),          # qoif
    ("66747970", 5, "video/mp4"),          # ....ftyp (ISO-BMFF)
    ("574152432F", 1, "application/warc"),  # WARC/
]

_RIFF = "52494646"  # RIFF....WAVE / RIFF....AVI<space>
_WAVE = "57415645"
_AVI = "41564920"


def sniff_mime(content: Column) -> Column:
    """Magic-byte MIME classification as one codegen'd expression."""

    def at(off: int, nbytes: int) -> Column:
        return F.hex(F.substring(content, off, nbytes))

    expr = F.lit("application/octet-stream")
    # RIFF needs the inner fourcc at offset 9 to split wav from avi
    expr = (
        F.when(
            (at(1, 4) == _RIFF) & (at(9, 4) == _WAVE), F.lit("audio/wav")
        )
        .when((at(1, 4) == _RIFF) & (at(9, 4) == _AVI), F.lit("video/avi"))
        .otherwise(expr)
    )
    for hexpat, off, mime in reversed(_MAGIC):
        expr = F.when(
            at(off, len(hexpat) // 2) == hexpat, F.lit(mime)
        ).otherwise(expr)
    return expr


def mp4_stub(brand: bytes = b"isom") -> bytes:
    """Minimal ISO-BMFF ftyp box — enough container for the sniffer."""
    body = b"ftyp" + brand + b"\x00\x00\x02\x00" + brand
    return (len(body) + 4).to_bytes(4, "big") + body


def zip_stub(name: str, data: bytes) -> bytes:
    """One-entry stored ZIP (local header + central dir + EOCD), fully
    deterministic (fixed 1980-01-01 DOS timestamp)."""
    import struct
    import zlib

    nb = name.encode("ascii")
    crc = zlib.crc32(data) & 0xFFFFFFFF
    local = (
        b"PK\x03\x04"
        + struct.pack("<HHHHHIII", 20, 0, 0, 0, 0x21, crc, len(data), len(data))
        + struct.pack("<HH", len(nb), 0)
        + nb
        + data
    )
    central = (
        b"PK\x01\x02"
        + struct.pack(
            "<HHHHHHIIIHHHHHII",
            20, 20, 0, 0, 0, 0x21, crc, len(data), len(data),
            len(nb), 0, 0, 0, 0, 0, 0,
        )
        + nb
    )
    eocd = b"PK\x05\x06" + bytes(4) + (1).to_bytes(2, "little") * 2 + len(
        central
    ).to_bytes(4, "little") + len(local).to_bytes(4, "little") + bytes(2)
    return local + central + eocd
