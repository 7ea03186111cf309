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

from typing import Iterator

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


def _bz_crc(data: bytes, crc: int = 0xFFFFFFFF) -> int:
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[((crc >> 24) ^ b) & 0xFF]
    return crc


class _Bits:
    """MSB-first bit reader."""

    def __init__(self, buf: bytes, pos_bits: int = 0) -> None:
        self.buf = buf
        self.p = pos_bits

    def take(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.buf[self.p >> 3]
            v = (v << 1) | ((byte >> (7 - (self.p & 7))) & 1)
            self.p += 1
        return v


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
    min_len, max_len, limit, base, perm = table
    ln = min_len
    code = bits.take(min_len)
    while ln <= max_len:
        if code <= limit[ln]:
            return perm[code - base[ln] if ln > min_len else code]
        code = (code << 1) | bits.take(1)
        ln += 1
    raise ValueError("bzip2: bad Huffman code")


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
                continue
            if run:
                bwt += bytes([mtf[0]]) * run
                run = 0
                run_bit = 0
            if sym == eob:
                break
            v = mtf.pop(sym - 1)
            mtf.insert(0, v)
            bwt.append(v)
        if run:
            bwt += bytes([mtf[0]]) * run
        if orig_ptr >= len(bwt):
            raise ValueError("bzip2: origPtr out of range")
        # inverse BWT (counting sort next-array walk)
        counts = [0] * 256
        for b in bwt:
            counts[b] += 1
        starts = [0] * 256
        t = 0
        for v in range(256):
            starts[v] = t
            t += counts[v]
        nxt = [0] * len(bwt)
        seen = [0] * 256
        for i, b in enumerate(bwt):
            nxt[starts[b] + seen[b]] = i
            seen[b] += 1
        plain = bytearray()
        p = nxt[orig_ptr]
        for _ in range(len(bwt)):
            plain.append(bwt[p])
            p = nxt[p]
        # RLE1: 4 identical bytes followed by an extra-count byte
        data = bytearray()
        i = 0
        n = len(plain)
        while i < n:
            b = plain[i]
            j = i + 1
            while j < n and j - i < 4 and plain[j] == b:
                j += 1
            cnt = j - i
            data += bytes([b]) * cnt
            i = j
            if cnt == 4:
                if i >= n:
                    raise ValueError("bzip2: truncated RLE1 run")
                data += bytes([b]) * plain[i]
                i += 1
        got = _bz_crc(bytes(data)) ^ 0xFFFFFFFF
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
                except (ValueError, UnicodeDecodeError) as e:
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
