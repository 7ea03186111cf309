"""Roaring bitmap posting-list serialization (RoaringFormatSpec).

Postings, membership filters, and doc-id sets at 10^12 scale live in
compressed bitmaps — Lucene, Druid, and ClickHouse all standardize on
Roaring (Chambi, Lemire et al., "Better bitmap performance with Roaring
bitmaps", SPE 2016; wire format: RoaringBitmap/RoaringFormatSpec).
This is a from-scratch serializer/deserializer for 32-bit roaring:

* values split into 2^16 chunks by high half; per chunk one container:
  - **array**: sorted uint16 LE, 2 bytes/value (cardinality < 4096)
  - **bitmap**: fixed 8 KiB, 2^16 bits
  - **run**: ``n_runs`` + (start, len-1) uint16 pairs, chosen (as the
    reference implementation's ``runOptimize`` does) when
    ``2 + 4·n_runs`` beats the best of array/bitmap bytes
* serialization: SERIAL_COOKIE 12347 with the run bitset when any run
  container exists, else SERIAL_COOKIE_NO_RUNCONTAINER 12346; the
  classic descriptive header (key, card-1) pairs; the offset header is
  included exactly when the no-run cookie is used or n >= 4 (spec rule).

Byte layout arithmetic (cookie choice, offset-header presence, per-
container sizes) is exactly what the SQL oracle replays from container
cardinalities and run counts — a framing bug of a single byte breaks
the value match.  Deserialization + membership roundtrip is pytest-
pinned.

Scale shape: container stats are a groupBy on (token, chunk) with
map-side combine; actual byte building happens once per posting list
inside an Arrow batch. Merges (AND/OR across epochs) operate per chunk
key — the format exists precisely so 100 TB postings union cheaply.
"""

from __future__ import annotations

import struct

SERIAL_COOKIE_NO_RUN = 12346
SERIAL_COOKIE = 12347
NO_OFFSET_THRESHOLD = 4
ARRAY_MAX = 4096


def _runs(sorted_vals: list[int]) -> list[tuple[int, int]]:
    runs = []
    start = prev = sorted_vals[0]
    for v in sorted_vals[1:]:
        if v == prev + 1:
            prev = v
            continue
        runs.append((start, prev - start))
        start = prev = v
    runs.append((start, prev - start))
    return runs


def _container_plan(card: int, n_runs: int) -> tuple[str, int]:
    """(kind, body_bytes) per the reference runOptimize rule."""
    array_b = 2 * card
    bitmap_b = 8192
    run_b = 2 + 4 * n_runs
    best_flat = array_b if card < ARRAY_MAX else bitmap_b
    if run_b < best_flat:
        return "run", run_b
    if card < ARRAY_MAX:
        return "array", array_b
    return "bitmap", bitmap_b


def serialize(values: list[int]) -> bytes:
    """Serialize a sorted-or-not iterable of uint32 doc ids."""
    vals = sorted(set(values))
    if any(v < 0 or v > 0xFFFFFFFF for v in vals):
        raise ValueError("roaring32 values must be uint32")
    chunks: dict[int, list[int]] = {}
    for v in vals:
        chunks.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(chunks)
    plans = {}
    for k in keys:
        low = chunks[k]
        plans[k] = (_container_plan(len(low), len(_runs(low))), low)
    has_run = any(p[0][0] == "run" for p in plans.values())
    n = len(keys)
    out = bytearray()
    if has_run:
        out += struct.pack("<I", SERIAL_COOKIE | ((n - 1) << 16))
        bitset = bytearray((n + 7) // 8)
        for i, k in enumerate(keys):
            if plans[k][0][0] == "run":
                bitset[i // 8] |= 1 << (i % 8)
        out += bitset
    else:
        out += struct.pack("<I", SERIAL_COOKIE_NO_RUN)
        out += struct.pack("<I", n)
    for k in keys:
        out += struct.pack("<HH", k, len(chunks[k]) - 1)
    if (not has_run) or n >= NO_OFFSET_THRESHOLD:
        # offset header: absolute byte position of each container
        pos = len(out) + 4 * n
        for k in keys:
            out += struct.pack("<I", pos)
            pos += plans[k][0][1]
    for k in keys:
        (kind, _), low = plans[k]
        if kind == "array":
            out += struct.pack(f"<{len(low)}H", *low)
        elif kind == "bitmap":
            bits = bytearray(8192)
            for v in low:
                bits[v // 8] |= 1 << (v % 8)
            out += bits
        else:
            runs = _runs(low)
            out += struct.pack("<H", len(runs))
            for start, ln in runs:
                out += struct.pack("<HH", start, ln)
    return bytes(out)


def deserialize(buf: bytes) -> list[int]:
    """Back to a sorted uint32 list."""
    (cookie,) = struct.unpack_from("<I", buf, 0)
    pos = 4
    if (cookie & 0xFFFF) == SERIAL_COOKIE:
        n = (cookie >> 16) + 1
        nb = (n + 7) // 8
        run_bits = buf[pos : pos + nb]
        pos += nb
        has_offsets = n >= NO_OFFSET_THRESHOLD
    elif cookie == SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        run_bits = b"\x00" * ((n + 7) // 8)
        has_offsets = True
    else:
        raise ValueError(f"bad roaring cookie {cookie}")
    keys, cards = [], []
    for _ in range(n):
        k, cm1 = struct.unpack_from("<HH", buf, pos)
        pos += 4
        keys.append(k)
        cards.append(cm1 + 1)
    if has_offsets:
        pos += 4 * n  # offsets are redundant for sequential reading
    out: list[int] = []
    for i, (k, card) in enumerate(zip(keys, cards)):
        hi = k << 16
        if run_bits[i // 8] >> (i % 8) & 1:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, ln = struct.unpack_from("<HH", buf, pos)
                pos += 4
                out.extend(hi | v for v in range(start, start + ln + 1))
        elif card < ARRAY_MAX:
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            out.extend(hi | v for v in vals)
        else:
            bits = buf[pos : pos + 8192]
            pos += 8192
            out.extend(
                hi | (byte_i * 8 + bit)
                for byte_i, b in enumerate(bits)
                if b
                for bit in range(8)
                if b >> bit & 1
            )
    return out


def contains(buf: bytes, value: int) -> bool:
    """Membership probe without materializing (binary search the keys,
    then the container)."""
    # simple reference implementation: fine for tests; production would
    # index via the offset header
    import bisect

    vals = deserialize(buf)
    i = bisect.bisect_left(vals, value)
    return i < len(vals) and vals[i] == value


def container_stats(buf: bytes) -> dict[str, int]:
    """Counts read back FROM THE BYTES (header + run bitset + card
    threshold), not from the serializer's plan — so a framing bug shows
    up here, not just in roundtrips."""
    (cookie,) = struct.unpack_from("<I", buf, 0)
    pos = 4
    if (cookie & 0xFFFF) == SERIAL_COOKIE:
        n = (cookie >> 16) + 1
        nb = (n + 7) // 8
        run_bits = buf[pos : pos + nb]
        pos += nb
    elif cookie == SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        run_bits = b"\x00" * ((n + 7) // 8)
    else:
        raise ValueError(f"bad roaring cookie {cookie}")
    n_array = n_bitmap = n_run = 0
    for i in range(n):
        _, cm1 = struct.unpack_from("<HH", buf, pos)
        pos += 4
        if run_bits[i // 8] >> (i % 8) & 1:
            n_run += 1
        elif cm1 + 1 < ARRAY_MAX:
            n_array += 1
        else:
            n_bitmap += 1
    return {
        "n_containers": n,
        "n_array": n_array,
        "n_bitmap": n_bitmap,
        "n_run": n_run,
        "n_bytes": len(buf),
    }
