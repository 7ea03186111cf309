"""CBOR (RFC 8949) codec from scratch — telemetry's binary JSON.

CBOR is the wire format of COSE/CWT tokens, SenML sensor streams, and
most IoT/EDR agent telemetry; an ingest pipeline meets it the way it
meets Avro or protobuf (both already in the suite — functions/avro.py,
functions/orc_meta.py's protobuf walker). Implemented from the public
RFC alone:

* all eight major types: uint (0), negint (1), byte string (2), text
  (3), array (4), map (5), tag (6), simple/float (7);
* every argument width (immediate <24, 1/2/4/8-byte) with the RFC's
  shortest-form rule in the encoder;
* half- (§3.3's exact decode algorithm), single- and double-precision
  floats, ±Infinity/NaN;
* indefinite-length byte/text strings (chunk concatenation), arrays and
  maps with the 0xff break;
* tags surfaced as ``Tag(number, value)`` so round-trips preserve them.

Evidence: the RFC's OWN Appendix A example table is pinned byte-for-byte
in pytest (hex → value AND value → hex for canonical forms), the
strongest offline conformance available — the jpeg_arith/snappy posture.

Spark side: encode and decode are Arrow-batched (mapInPandas /
pandas_udf) over binary columns; the plumbing (schema, batch shape)
is the deliverable at scale, the per-batch Python loop is the same
cost class as the Avro codec's.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass
from typing import Any


@dataclass(frozen=True)
class Tag:
    number: int
    value: Any


class Undefined:
    """CBOR 'undefined' (0xf7) — distinct from null."""

    _inst = None

    def __new__(cls):
        if cls._inst is None:
            cls._inst = super().__new__(cls)
        return cls._inst

    def __repr__(self) -> str:  # pragma: no cover
        return "undefined"


UNDEFINED = Undefined()


# ------------------------------------------------------------- encode --


# immediate heads (arg < 24) precomputed — the hot case for small ints,
# short strings and small containers; one dict/list hit instead of a
# bytes() construction per head
_IMMEDIATE_HEADS = [
    [bytes([m << 5 | a]) for a in range(24)] for m in range(8)
]


def _head(major: int, arg: int) -> bytes:
    """Shortest-form head (RFC 8949 §4.2.1 core deterministic rule)."""
    if arg < 24:
        return _IMMEDIATE_HEADS[major][arg]
    for ai, fmt, lim in ((24, "B", 1 << 8), (25, ">H", 1 << 16),
                        (26, ">I", 1 << 32), (27, ">Q", 1 << 64)):
        if arg < lim:
            return bytes([major << 5 | ai]) + struct.pack(fmt, arg)
    raise ValueError("argument out of 64-bit range")


def encode(v: Any) -> bytes:
    """Canonical-ish encoder: shortest heads, definite lengths, floats as
    binary64 (preferred-serialization float shortening is a decoder-side
    non-issue; Appendix A's canonical integer/string/array/map forms are
    what the vectors pin)."""
    if v is None:
        return b"\xf6"
    if v is UNDEFINED:
        return b"\xf7"
    if isinstance(v, bool):
        return b"\xf5" if v else b"\xf4"
    if isinstance(v, int):
        if v >= 0:
            return _head(0, v)
        return _head(1, -1 - v)
    if isinstance(v, float):
        return b"\xfb" + struct.pack(">d", v)
    if isinstance(v, bytes):
        return _head(2, len(v)) + v
    if isinstance(v, str):
        u = v.encode("utf-8")
        return _head(3, len(u)) + u
    if isinstance(v, (list, tuple)):
        return _head(4, len(v)) + b"".join(encode(x) for x in v)
    if isinstance(v, dict):
        return _head(5, len(v)) + b"".join(
            encode(k) + encode(x) for k, x in v.items()
        )
    if isinstance(v, Tag):
        return _head(6, v.number) + encode(v.value)
    raise TypeError(f"cannot encode {type(v).__name__}")


# ------------------------------------------------------------- decode --


def _decode_half(h: int) -> float:
    """RFC 8949 §3.3's exact half→double algorithm."""
    exp = (h >> 10) & 0x1F
    mant = h & 0x3FF
    if exp == 0:
        val = mant * 2.0 ** -24
    elif exp != 31:
        val = (mant + 1024) * 2.0 ** (exp - 25)
    else:
        val = math.inf if mant == 0 else math.nan
    return -val if h & 0x8000 else val


class _Reader:
    __slots__ = ("b", "i")

    def __init__(self, b: bytes):
        self.b, self.i = b, 0

    def take(self, n: int) -> bytes:
        if self.i + n > len(self.b):
            raise ValueError("truncated CBOR")
        out = self.b[self.i : self.i + n]
        self.i += n
        return out

    def u8(self) -> int:
        i = self.i
        if i >= len(self.b):
            raise ValueError("truncated CBOR")
        self.i = i + 1
        return self.b[i]


_BREAK = object()


def _arg(r: _Reader, ai: int) -> int | None:
    if ai < 24:
        return ai
    if ai == 24:
        return r.u8()
    if ai == 25:
        return struct.unpack(">H", r.take(2))[0]
    if ai == 26:
        return struct.unpack(">I", r.take(4))[0]
    if ai == 27:
        return struct.unpack(">Q", r.take(8))[0]
    if ai == 31:
        return None  # indefinite
    raise ValueError(f"reserved additional info {ai}")


def _item(r: _Reader) -> Any:
    ib = r.u8()
    major, ai = ib >> 5, ib & 0x1F
    if ib == 0xFF:
        return _BREAK
    n = _arg(r, ai)
    if major == 0:
        return n
    if major == 1:
        return -1 - n
    if major in (2, 3):
        if n is None:  # indefinite: concatenation of definite chunks
            chunks = []
            while True:
                c = _item(r)
                if c is _BREAK:
                    break
                if not isinstance(c, bytes if major == 2 else str):
                    raise ValueError("bad indefinite-string chunk")
                chunks.append(c)
            return (b"" if major == 2 else "").join(chunks)
        raw = r.take(n)
        return raw if major == 2 else raw.decode("utf-8")
    if major == 4:
        if n is None:
            out = []
            while True:
                x = _item(r)
                if x is _BREAK:
                    return out
                out.append(x)
        return [_item(r) for _ in range(n)]
    if major == 5:
        d: dict = {}
        if n is None:
            while True:
                k = _item(r)
                if k is _BREAK:
                    return d
                d[k] = _item(r)
        for _ in range(n):
            k = _item(r)
            d[k] = _item(r)
        return d
    if major == 6:
        return Tag(n, _item(r))
    # major 7
    if ai == 20:
        return False
    if ai == 21:
        return True
    if ai == 22:
        return None
    if ai == 23:
        return UNDEFINED
    if ai == 24:
        return n  # simple value 32..255 (surface the number)
    if ai == 25:
        return _decode_half(n)
    if ai == 26:
        return struct.unpack(">f", struct.pack(">I", n))[0]
    if ai == 27:
        return struct.unpack(">d", struct.pack(">Q", n))[0]
    if ai < 20:
        return ai  # unassigned simple value 0..19
    raise ValueError(f"bad major-7 additional info {ai}")


def decode(b: bytes) -> Any:
    r = _Reader(b)
    v = _item(r)
    if v is _BREAK:
        raise ValueError("unexpected break")
    if r.i != len(r.b):
        raise ValueError(f"{len(r.b) - r.i} trailing bytes")
    return v
