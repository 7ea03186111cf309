"""bzip2 decoder from scratch (the public format of bzip2 1.0, Julian
Seward; layout as documented in the bzip2 manual and the format's many
public descriptions): MSB-first bit stream, per-block Huffman-coded
MTF/RLE2 symbols with selector-switched code tables every 50 symbols,
inverse move-to-front over the used-byte alphabet, inverse
Burrows-Wheeler transform at origPtr, RLE1 run expansion, and both block
and stream CRCs verified (bzip2's CRC-32 is MSB-first — NOT zlib's
reflected variant).

Fixtures are produced by stdlib ``bz2`` (the real bzip2 library), so the
decoder is pinned against genuine archives, not a sibling encoder's
idiosyncrasies — the strongest interop evidence available in-sandbox.

Why: bzip2 is the third legacy archive codec a corpus-ingest engine meets
in the wild (gzip/DEFLATE and zstd are already decoded in-repo; Wikipedia
dumps and many academic corpora ship .bz2).

Scale shape: blobs are rows; decode is one zero-shuffle Arrow pass.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bunzip2", "bzip2_decode_col"]

_BLOCK_MAGIC = 0x314159265359
_EOS_MAGIC = 0x177245385090

_CRC_TABLE = []
for _i in range(256):
    _c = _i << 24
    for _ in range(8):
        _c = ((_c << 1) ^ 0x04C11DB7) if _c & 0x80000000 else (_c << 1)
        _c &= 0xFFFFFFFF
    _CRC_TABLE.append(_c)

_REV8 = np.array([int(f"{i:08b}"[::-1], 2) for i in range(256)], dtype=np.uint8)


def _bz_crc(data: bytes, crc: int = 0xFFFFFFFF) -> int:
    """Reference per-byte form (kept as the spec pin; ``_bz_crc_fast`` is
    the production path and is asserted equivalent in tests)."""
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[((crc >> 24) ^ b) & 0xFF]
    return crc


def _bz_crc_fast(data: bytes) -> int:
    """bzip2's MSB-first CRC-32 (poly 0x04C11DB7, init/final 0xFFFFFFFF)
    computed at C speed: it is the bit-reflection of zlib's reflected
    CRC-32 over bit-reflected input bytes — one numpy table lookup plus
    one zlib.crc32 call instead of a per-byte Python loop. Returns the
    FINAL value (already xored), i.e. _bz_crc(data) ^ 0xFFFFFFFF."""
    rev = _REV8[np.frombuffer(data, dtype=np.uint8)].tobytes()
    return int(f"{zlib.crc32(rev):032b}"[::-1], 2)


class _Bits:
    """MSB-first bit reader over a precomputed ASCII-'0'/'1' expansion:
    ``take(n)`` is one bytes slice + ``int(s, 2)`` (both C speed) instead
    of an n-iteration Python loop. The expansion is 8 bytes per input
    byte — fine for row-sized blobs; reads past the real end raise
    ValueError (the per-row dead-letter channel), never IndexError."""

    def __init__(self, buf: bytes, pos_bits: int = 0) -> None:
        bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8))
        self.nbits = len(bits)
        # padding guard: partial Huffman reads near EOF may peek past the
        # end; the stream's own magics/CRCs reject any decode using it
        self.s = (bits + ord("0")).astype(np.uint8).tobytes() + b"0" * 64
        self.p = pos_bits

    def take(self, n: int) -> int:
        p = self.p
        if p + n > self.nbits:
            raise ValueError("bzip2: truncated stream")
        self.p = p + n
        return int(self.s[p : p + n], 2)


def _huff_decode_tables(lengths: list[int]):
    """bzip2 canonical Huffman: (limit, base, perm) per the reference
    decoder's scheme — decode by extending the code until it is <= the
    limit for its length."""
    min_len, max_len = min(lengths), max(lengths)
    perm = []
    for ln in range(min_len, max_len + 1):
        for sym, L in enumerate(lengths):
            if L == ln:
                perm.append(sym)
    limit = [0] * (max_len + 2)
    base = [0] * (max_len + 2)
    cnt = [0] * (max_len + 2)
    for L in lengths:
        cnt[L] += 1
    vec = 0
    idx = 0
    for ln in range(min_len, max_len + 1):
        vec += cnt[ln]
        limit[ln] = vec - 1
        vec <<= 1
        base[ln + 1] = vec - (idx + cnt[ln])
        idx += cnt[ln]
    return min_len, max_len, limit, base, perm


def _read_huff_symbol(bits: _Bits, table) -> int:
    """One slice+parse for the minimum length, then per-bit extension via
    direct byte indexing into the expanded bit string (no take() call per
    bit — this loop runs once per decoded symbol and dominates decode)."""
    min_len, max_len, limit, base, perm = table
    s, p = bits.s, bits.p
    if p + min_len > bits.nbits:
        raise ValueError("bzip2: truncated stream")
    ln = min_len
    code = int(s[p : p + min_len], 2)
    while code > limit[ln]:
        code = (code << 1) | (s[p + ln] - 48)
        ln += 1
        if ln > max_len:
            raise ValueError("bzip2: bad Huffman code")
    bits.p = p + ln
    return perm[code - base[ln] if ln > min_len else code]


def bunzip2(blob: bytes) -> bytes:
    """Decode a complete .bz2 stream; raises ValueError on any structural
    or CRC failure."""
    if len(blob) < 4 or blob[0:2] != b"BZ" or blob[2] != ord("h"):
        raise ValueError("bzip2: bad stream header")
    level = blob[3] - ord("0")
    if not 1 <= level <= 9:
        raise ValueError("bzip2: bad block-size level")
    bits = _Bits(blob, 32)
    out = bytearray()
    stream_crc = 0
    while True:
        magic = bits.take(48)
        if magic == _EOS_MAGIC:
            want = bits.take(32)
            if want != stream_crc:
                raise ValueError("bzip2: stream CRC mismatch")
            return bytes(out)
        if magic != _BLOCK_MAGIC:
            raise ValueError("bzip2: bad block magic")
        block_crc = bits.take(32)
        if bits.take(1):
            raise ValueError("bzip2: randomized blocks unsupported (deprecated)")
        orig_ptr = bits.take(24)
        # symbol map: 16-bit coarse map then 16 bits per present group
        used = []
        coarse = bits.take(16)
        for i in range(16):
            if coarse & (0x8000 >> i):
                fine = bits.take(16)
                for j in range(16):
                    if fine & (0x8000 >> j):
                        used.append(16 * i + j)
        n_sym = len(used) + 2  # MTF values + RUNA/RUNB -> alphabet + EOB
        n_groups = bits.take(3)
        if not 2 <= n_groups <= 6:
            raise ValueError("bzip2: bad group count")
        n_sel = bits.take(15)
        sel_mtf = [  # selectors are MTF+unary coded
            0 for _ in range(n_sel)
        ]
        for s in range(n_sel):
            j = 0
            while bits.take(1):
                j += 1
                if j >= n_groups:
                    raise ValueError("bzip2: bad selector")
            sel_mtf[s] = j
        order = list(range(n_groups))
        selectors = []
        for j in sel_mtf:
            g = order.pop(j)
            order.insert(0, g)
            selectors.append(g)
        tables = []
        for _g in range(n_groups):
            lengths = []
            ln = bits.take(5)
            for _s in range(n_sym):
                while bits.take(1):
                    ln += -1 if bits.take(1) else 1
                    if not 1 <= ln <= 20:
                        raise ValueError("bzip2: bad code length")
                lengths.append(ln)
            tables.append(_huff_decode_tables(lengths))
        eob = n_sym - 1
        # the format's hard block limit: RLE2-decoded (BWT input) data is at
        # most level·100000 bytes — bounding run/len(bwt) here stops a
        # crafted blob from requesting an enormous allocation before any
        # CRC check runs (decompression-bomb guard)
        max_block = level * 100_000
        # Huffman decode -> MTF/RLE2 symbol stream -> BWT byte string
        mtf = list(used)
        bwt = bytearray()
        run = 0
        run_bit = 0
        group_pos = 0
        sel_idx = -1
        table = None
        while True:
            if group_pos == 0:
                sel_idx += 1
                if sel_idx >= len(selectors):
                    raise ValueError("bzip2: selectors exhausted")
                table = tables[selectors[sel_idx]]
                group_pos = 50
            group_pos -= 1
            sym = _read_huff_symbol(bits, table)
            if sym <= 1:  # RUNA / RUNB: bijective base-2 run length
                run += (sym + 1) << run_bit
                run_bit += 1
                if run > max_block:
                    raise ValueError("bzip2: RLE2 run exceeds block size")
                continue
            if run:
                if len(bwt) + run > max_block:
                    raise ValueError("bzip2: block exceeds declared size")
                bwt += bytes([mtf[0]]) * run
                run = 0
                run_bit = 0
            if sym == eob:
                break
            v = mtf.pop(sym - 1)
            mtf.insert(0, v)
            if len(bwt) >= max_block:
                raise ValueError("bzip2: block exceeds declared size")
            bwt.append(v)
        if run:
            if len(bwt) + run > max_block:
                raise ValueError("bzip2: block exceeds declared size")
            bwt += bytes([mtf[0]]) * run
        if orig_ptr >= len(bwt):
            raise ValueError("bzip2: origPtr out of range")
        # inverse BWT: the counting-sort next-array IS the stable argsort of
        # the BWT column; the sequential pointer walk p -> nxt[p] is computed
        # by permutation doubling (log2(n) vectorized gathers) instead of a
        # per-byte Python loop
        bwt_np = np.frombuffer(bytes(bwt), dtype=np.uint8)
        n = len(bwt_np)
        nxt = np.argsort(bwt_np, kind="stable").astype(np.int64)
        seq = np.empty(n, dtype=np.int64)
        seq[0] = nxt[orig_ptr]
        filled = 1
        g = nxt
        while filled < n:
            m = min(filled, n - filled)
            seq[filled : filled + m] = g[seq[:m]]
            filled += m
            if filled < n:
                g = g[g]
        plain_np = bwt_np[seq]
        # RLE1: 4 identical bytes followed by an extra-count byte. Candidate
        # 4-run starts are found vectorized; the Python loop runs once per
        # ACTUAL run (rare in text), copying literal spans wholesale.
        plain_b = plain_np.tobytes()
        n = len(plain_b)
        if n >= 4:
            eq = plain_np[1:] == plain_np[:-1]
            cands = np.flatnonzero(eq[:-2] & eq[1:-1] & eq[2:])
        else:
            cands = np.empty(0, dtype=np.int64)
        chunks = []
        pos = 0
        while True:
            ci = int(np.searchsorted(cands, pos))
            if ci >= len(cands):
                chunks.append(plain_b[pos:])
                break
            c = int(cands[ci])
            chunks.append(plain_b[pos:c])
            if c + 4 >= n:
                raise ValueError("bzip2: truncated RLE1 run")
            chunks.append(plain_b[c : c + 4] + plain_b[c : c + 1] * plain_b[c + 4])
            pos = c + 5
        data = b"".join(chunks)
        got = _bz_crc_fast(data)
        if got != block_crc:
            raise ValueError("bzip2: block CRC mismatch")
        out += data
        stream_crc = (((stream_crc << 1) | (stream_crc >> 31)) ^ block_crc) & 0xFFFFFFFF


def bzip2_decode_col(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """(…, text, n_bytes, ok, err) — decode a bz2 binary column in one
    zero-shuffle Arrow pass; failures dead-letter per row."""
    other = [c for c in df.columns if c != blob_col]

    def _dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            texts, sizes, oks, errs = [], [], [], []
            for blob in b[blob_col]:
                try:
                    data = bunzip2(bytes(blob))
                    texts.append(data.decode("utf-8"))
                    sizes.append(len(data))
                    oks.append(True)
                    errs.append(None)
                except (ValueError, IndexError, UnicodeDecodeError) as e:
                    # IndexError: corrupt structures can index past decoder
                    # state (e.g. MTF pop on a bit-flipped stream) — that is
                    # a per-row decode failure, not a task failure
                    texts.append(None)
                    sizes.append(0)
                    oks.append(False)
                    errs.append(str(e)[:80])
            res = b[other].copy()
            res["text"] = texts
            res["n_bytes"] = sizes
            res["ok"] = oks
            res["err"] = errs
            yield res

    schema = ", ".join(
        f"{c} {t}" for c, t in
        [(c, dict(df.dtypes)[c]) for c in other]
        + [("text", "string"), ("n_bytes", "long"), ("ok", "boolean"),
           ("err", "string")]
    )
    return df.mapInPandas(_dec, schema)
