"""AES-CTR column encryption (FIPS-197 + SP 800-38A), from scratch.

Column-level encryption at rest for sensitive fields (the companion to
redact_pii / k_anonymize when the field must be RECOVERABLE by a key
holder, not destroyed): AES-128/192/256 implemented directly from
FIPS-197 — the S-box is *generated* from its definition (GF(2^8)
multiplicative inverse + affine transform), key expansion per §5.2,
rounds per §5.1 — and CTR mode per SP 800-38A §6.5, with the 16-byte
initial counter block derived per row.

Correctness evidence is the strongest available offline: the spec's own
known-answer vectors (FIPS-197 appendices B/C; SP 800-38A F.5 CTR
examples) are pytest-pinned, plus an identity-oracle roundtrip in the
catalog. No third-party crypto lib exists in this container — the KATs
stand in for interop.

This is a reference implementation for pipeline plumbing: timing
side-channels are out of scope (table lookups), and a production
deployment would swap in a hardware-backed AES — the column plumbing,
nonce discipline (one counter block per row, derived from the row key,
NEVER reused across rows under the same key), and key-id envelope
survive the swap.

Scale shape: one Arrow-batched UDF per direction; keys ship in the
closure (envelope pattern), data encrypts where it sits.
"""

from __future__ import annotations

import pandas as pd

# --- S-box generated from the FIPS-197 definition ----------------------


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


def _gmul(a: int, b: int) -> int:
    p = 0
    while b:
        if b & 1:
            p ^= a
        a = _xtime(a)
        b >>= 1
    return p


def _build_sbox() -> tuple[list[int], list[int]]:
    # multiplicative inverse in GF(2^8), then the affine transform
    inv = [0] * 256
    for x in range(1, 256):
        for y in range(1, 256):
            if _gmul(x, y) == 1:
                inv[x] = y
                break
    sbox2 = [0] * 256
    for x in range(256):
        b = inv[x]
        res = 0
        for i in range(8):
            bit = (
                (b >> i)
                ^ (b >> ((i + 4) % 8))
                ^ (b >> ((i + 5) % 8))
                ^ (b >> ((i + 6) % 8))
                ^ (b >> ((i + 7) % 8))
                ^ (0x63 >> i)
            ) & 1
            res |= bit << i
        sbox2[x] = res
    invbox = [0] * 256
    for x, v in enumerate(sbox2):
        invbox[v] = x
    return sbox2, invbox


_SBOX, _INV_SBOX = _build_sbox()
_RCON = [0x01]
while len(_RCON) < 14:
    _RCON.append(_xtime(_RCON[-1]))


def key_expand(key: bytes) -> list[list[int]]:
    """FIPS-197 §5.2 → list of round keys, each 16 bytes."""
    nk = len(key) // 4
    if nk not in (4, 6, 8):
        raise ValueError("AES key must be 128/192/256 bits")
    nr = nk + 6
    w = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        w.append([a ^ b for a, b in zip(w[i - nk], t)])
    return [
        sum((w[4 * r + c] for c in range(4)), []) for r in range(nr + 1)
    ]


def _encrypt_block(block: bytes, rks: list[list[int]]) -> bytes:
    nr = len(rks) - 1
    s = [b ^ k for b, k in zip(block, rks[0])]
    for rnd in range(1, nr + 1):
        s = [_SBOX[b] for b in s]
        # ShiftRows on column-major state: byte i sits at row i%4
        s = [s[(i + 4 * (i % 4)) % 16] for i in range(16)]
        if rnd != nr:
            t = []
            for c in range(4):
                a = s[4 * c : 4 * c + 4]
                t += [
                    _gmul(a[0], 2) ^ _gmul(a[1], 3) ^ a[2] ^ a[3],
                    a[0] ^ _gmul(a[1], 2) ^ _gmul(a[2], 3) ^ a[3],
                    a[0] ^ a[1] ^ _gmul(a[2], 2) ^ _gmul(a[3], 3),
                    _gmul(a[0], 3) ^ a[1] ^ a[2] ^ _gmul(a[3], 2),
                ]
            s = t
        s = [b ^ k for b, k in zip(s, rks[rnd])]
    return bytes(s)


def aes_encrypt_block(block: bytes, key: bytes) -> bytes:
    return _encrypt_block(block, key_expand(key))


# --- vectorized block engine (CTR blocks are independent) ---------------

import numpy as np

_SBOX_NP = np.array(_SBOX, dtype=np.uint8)
_X2 = np.array([_gmul(x, 2) for x in range(256)], dtype=np.uint8)
_X3 = np.array([_gmul(x, 3) for x in range(256)], dtype=np.uint8)
# ShiftRows permutation on the column-major flat state
_SHIFT = np.array([(i + 4 * (i % 4)) % 16 for i in range(16)])


def _encrypt_blocks_np(blocks: "np.ndarray", rks: list[list[int]]) -> "np.ndarray":
    """(n, 16) uint8 → (n, 16) uint8, all blocks in lockstep — every
    round is four table-indexing ops over the whole batch."""
    nr = len(rks) - 1
    s = blocks ^ np.array(rks[0], dtype=np.uint8)
    for rnd in range(1, nr + 1):
        s = _SBOX_NP[s]
        s = s[:, _SHIFT]
        if rnd != nr:
            a0, a1, a2, a3 = (s[:, i::4] for i in range(4))
            s = np.empty_like(s)
            s[:, 0::4] = _X2[a0] ^ _X3[a1] ^ a2 ^ a3
            s[:, 1::4] = a0 ^ _X2[a1] ^ _X3[a2] ^ a3
            s[:, 2::4] = a0 ^ a1 ^ _X2[a2] ^ _X3[a3]
            s[:, 3::4] = _X3[a0] ^ a1 ^ a2 ^ _X2[a3]
        s = s ^ np.array(rks[rnd], dtype=np.uint8)
    return s


def ctr_keystream(key: bytes, counter0: bytes, n: int) -> bytes:
    """SP 800-38A §6.5: E_K(counter), counter incremented as a 128-bit
    big-endian integer — all blocks computed in one vectorized batch."""
    rks = key_expand(key)
    nblk = (n + 15) // 16
    if nblk == 0:
        return b""
    c0 = int.from_bytes(counter0, "big")
    counters = [
        ((c0 + i) % (1 << 128)).to_bytes(16, "big") for i in range(nblk)
    ]
    blocks = np.frombuffer(b"".join(counters), dtype=np.uint8).reshape(
        nblk, 16
    )
    return _encrypt_blocks_np(blocks, rks).tobytes()[:n]


def aes_ctr(data: bytes, key: bytes, counter0: bytes) -> bytes:
    """Encrypt == decrypt in CTR."""
    ks = np.frombuffer(
        ctr_keystream(key, counter0, len(data)), dtype=np.uint8
    )
    return (np.frombuffer(data, dtype=np.uint8) ^ ks).tobytes()


def row_counter_block(row_id: int) -> bytes:
    """Per-row initial counter: 12-byte row nonce ‖ 4-byte zero block
    counter — distinct per row, never reused under one key (rows are
    ≤ 2^32·16 bytes apart in counter space)."""
    return row_id.to_bytes(12, "big") + b"\x00" * 4


def _ctr_batch(datas: list[bytes], rids: list[int], rks) -> list[bytes]:
    """AES-CTR a whole batch of rows in ONE vectorized AES pass.

    Row r's counter stream is (rid<<32)+j for block j (identical to
    row_counter_block + big-endian increment; the 4-byte block counter
    never wraps for rows ≤ 2^32·16 bytes, and the <<32 carry into the
    high quadword cannot occur because the low 32 bits start at zero).
    All rows' counter blocks are built side by side, encrypted in one
    (total_blocks, 16) batch, and XORed against the concatenated payload
    through a flat gather — the per-row work is two bytes slices."""
    if not datas:
        return []
    lens = np.fromiter((len(d) for d in datas), dtype=np.int64, count=len(datas))
    nblk = (lens + 15) // 16
    total_blk = int(nblk.sum())
    if total_blk == 0:
        return [b"" for _ in datas]
    rid_arr = np.asarray(rids, dtype=np.uint64)
    kstarts = np.concatenate([[0], np.cumsum(nblk)[:-1]])
    # per-block row index and within-row block offset
    row_of_blk = np.repeat(np.arange(len(datas)), nblk)
    off = np.arange(total_blk, dtype=np.uint64) - np.repeat(
        kstarts.astype(np.uint64), nblk
    )
    low = ((rid_arr[row_of_blk] & np.uint64(0xFFFFFFFF)) << np.uint64(32)) + off
    high = rid_arr[row_of_blk] >> np.uint64(32)
    blocks = np.empty((total_blk, 16), dtype=np.uint8)
    blocks[:, :8] = high.astype(">u8").view(np.uint8).reshape(total_blk, 8)
    blocks[:, 8:] = low.astype(">u8").view(np.uint8).reshape(total_blk, 8)
    ks_flat = _encrypt_blocks_np(blocks, rks).reshape(-1)
    data_flat = np.frombuffer(b"".join(datas), dtype=np.uint8)
    dstarts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    idx = (
        np.arange(len(data_flat), dtype=np.int64)
        - np.repeat(dstarts, lens)
        + np.repeat(16 * kstarts, lens)
    )
    out_flat = (data_flat ^ ks_flat[idx]).tobytes()
    return [
        out_flat[int(s) : int(s + n)] for s, n in zip(dstarts, lens)
    ]


def aes_ctr_col(data_col, id_col, key: bytes):
    """Column: AES-CTR each row's bytes under `key`, counter derived
    from the row id. Involution — apply twice to decrypt.

    The whole Arrow batch is encrypted in one numpy AES pass (`_ctr_batch`)
    — the earlier per-row form paid a key expansion plus a ~tens-of-bytes
    numpy launch per row, which dominated the stage for short documents."""
    from pyspark.sql.functions import pandas_udf

    k = bytes(key)

    @pandas_udf("binary")
    def crypt(b: pd.Series, i: pd.Series) -> pd.Series:
        rks = key_expand(k)  # once per batch, not once per row
        vals = list(b)
        ids = list(i)
        live = [j for j, v in enumerate(vals) if v is not None]
        enc = _ctr_batch(
            [bytes(vals[j]) for j in live], [int(ids[j]) for j in live], rks
        )
        out: list[bytes | None] = [None] * len(vals)
        for j, e in zip(live, enc):
            out[j] = e
        return pd.Series(out)

    return crypt(data_col, id_col)
