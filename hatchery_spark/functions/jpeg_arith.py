"""Arithmetic-coded JPEG — sequential (SOF9) AND progressive (SOF10)
decoders + fixture encoders.

Implemented from the public spec (ITU-T T.81): the 113-state probability
adaptation machine of Table D.3 (plus the fixed ~equiprobable bin the AC sign
decision uses), the DC difference model of §F.1.4.4.1 / F.2.4.1 (zero /
sign / magnitude-category / magnitude-bits decisions, conditioning category
from the previous diff via the DAC L/U bounds), and the AC model of
§F.1.4.4.2 / F.2.4.2 (per-index EOB and significance bins, Kx low/high
magnitude-category split, fixed-probability sign). The progressive scan
classes (§G with arithmetic entropy coding): DC first on the floor-shifted
domain, DC refinement as one fixed-probability bit per block, AC first over
the [Ss, Se] band with magnitude point transform (truncation toward zero),
and AC successive-approximation refinement (correction bits for previously
significant coefficients, ±1<<Al for newly significant ones, EOB decisions
only beyond the previous stage's end-of-block). Restart intervals
re-initialize the coder, the statistics areas, and the DC predictions.

Coder core: a QM-class binary arithmetic coder with the MPS subinterval at
the top of the range and conditional MPS/LPS exchange on renormalization —
the interval/exchange structure shared by T.81's QM and T.88's MQ coders.
The encoder keeps the code point as an arbitrary-precision integer (Python
int), which makes carry propagation automatic — no byte-stuffing stacks —
and emits the final code value MSB-first with JPEG's 0xFF 0x00 byte
stuffing; the decoder is the standard 16-bit-window integer decoder over the
unstuffed bit stream (zero-padded past the terminating marker, so truncated
flushes still resolve). Encoder and decoder are exact mirrors: round-trip
self-consistency is asserted by tests at every content class. CAVEAT,
stated honestly: no third-party arithmetic-coded JPEG fixtures exist in this
environment, so byte-level framing conformance against other codecs is
untested — the adaptation table, the statistical models, and the decoded
coefficients are spec-derived and fully exercised, the wire framing is
self-consistent only.

Reference parity note: hatchery never decodes media (objects pass through
byte-identical, destination/gcs/client.go:76); this module belongs to the
multimodal feature-extraction surface the training-data pipeline adds.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# T.81 Table D.3 — Qe value and probability estimation state machine.
# Rows: (Qe, next-state-MPS, next-state-LPS, switch-MPS). Index 113 is the
# non-adaptive ~0.5 bin used for AC sign decisions (stays in place forever).
# --------------------------------------------------------------------------

QM_STATES: tuple[tuple[int, int, int, int], ...] = (
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1),
    (0x5A1D, 113, 113, 0),  # 113: fixed ~equiprobable bin (AC sign)
)

FIXED_BIN = 113

DC_STAT_BINS = 64
AC_STAT_BINS = 256


def new_stats(n: int) -> list[list[int]]:
    """Fresh statistics area: n bins of [state_index, mps]."""
    return [[0, 0] for _ in range(n)]


# --------------------------------------------------------------------------
# coder core
# --------------------------------------------------------------------------


class ArithEncoder:
    """QM-class binary arithmetic encoder (MPS at the top of the interval,
    conditional exchange on renorm). The code point `c` is an unbounded int:
    carries propagate through ordinary addition, and `flush()` materializes
    the byte stream (0xFF 0x00 stuffed) from the final code value with its
    low bits cleared as far as the interval allows."""

    def __init__(self) -> None:
        self.a = 0x8000
        self.c = 0
        self.shifts = 0  # renormalization count → total code length

    def encode(self, d: int, bin_: list[int]) -> None:
        qe, nmps, nlps, switch = QM_STATES[bin_[0]]
        self.a -= qe
        if d == bin_[1]:  # MPS
            if self.a & 0x8000:
                self.c += qe
                return
            if self.a < qe:  # conditional exchange: MPS takes [0, qe)
                self.a = qe
            else:
                self.c += qe
            bin_[0] = nmps
        else:  # LPS
            if self.a < qe:  # exchange: LPS takes the top subinterval
                self.c += qe
            else:
                self.a = qe
            if switch:
                bin_[1] ^= 1
            bin_[0] = nlps
        while self.a < 0x8000:
            self.a <<= 1
            self.c <<= 1
            self.shifts += 1

    def flush(self) -> bytes:
        """Choose the code value in [c, c+a) with the most cleared low bits,
        emit it MSB-first (total bits = shifts + 16), byte-stuff 0xFF."""
        nbits = self.shifts + 16
        v = self.c + self.a - 1
        # clear as many low bits as stay >= c
        t = (self.c + self.a - 1).bit_length()
        for k in range(t, -1, -1):
            cand = v >> k << k
            if cand >= self.c:
                v = cand
                break
        nbytes = -(-nbits // 8)
        raw = v << (nbytes * 8 - nbits)  # zero-pad to byte boundary
        data = raw.to_bytes(nbytes, "big")
        # drop trailing zero bytes — the decoder zero-pads past the marker
        data = data.rstrip(b"\x00") or b"\x00"
        out = bytearray()
        for b in data:
            out.append(b)
            if b == 0xFF:
                out.append(0x00)
        return bytes(out)


class ArithDecoder:
    """Mirror of ArithEncoder: 16-bit window integer decoder over the
    unstuffed bit stream. Reads from `content` starting at `pos`; a bare
    0xFF + non-zero byte is a marker — from there on the bit source yields
    zeros and `marker_pos` records where the marker begins."""

    def __init__(self, content: bytes, pos: int) -> None:
        self.content = content
        self.pos = pos
        self.marker_pos: int | None = None
        self._bits = 0
        self._nbits = 0
        self.d = self._take(16)
        self.a = 0x8000

    def _next_byte(self) -> int:
        c = self.content
        if self.marker_pos is not None:
            return 0
        if self.pos >= len(c):
            self.marker_pos = len(c)
            return 0
        b = c[self.pos]
        if b == 0xFF:
            nxt = c[self.pos + 1] if self.pos + 1 < len(c) else 0xD9
            if nxt == 0x00:
                self.pos += 2
                return 0xFF
            self.marker_pos = self.pos
            return 0
        self.pos += 1
        return b

    def _take(self, n: int) -> int:
        while self._nbits < n:
            self._bits = (self._bits << 8) | self._next_byte()
            self._nbits += 8
        self._nbits -= n
        v = self._bits >> self._nbits
        self._bits &= (1 << self._nbits) - 1
        return v

    def decode(self, bin_: list[int]) -> int:
        qe, nmps, nlps, switch = QM_STATES[bin_[0]]
        self.a -= qe
        if self.d < qe:
            # bottom subinterval: LPS normally, MPS under exchange
            if self.a < qe:
                d = bin_[1]
                bin_[0] = nmps
            else:
                d = bin_[1] ^ 1
                if switch:
                    bin_[1] ^= 1
                bin_[0] = nlps
            self.a = qe
        else:
            self.d -= qe
            if self.a & 0x8000:
                return bin_[1]
            if self.a < qe:
                d = bin_[1] ^ 1
                if switch:
                    bin_[1] ^= 1
                bin_[0] = nlps
            else:
                d = bin_[1]
                bin_[0] = nmps
        while self.a < 0x8000:
            self.a <<= 1
            self.d = (self.d << 1) | self._take(1)
        return d

    def next_marker(self) -> int:
        """Byte position of the marker terminating this entropy segment."""
        if self.marker_pos is not None and self.marker_pos < len(self.content):
            return self.marker_pos
        p = self.pos
        c = self.content
        while p + 1 < len(c) and (c[p] != 0xFF or c[p + 1] == 0x00):
            p += 1
        return p


# --------------------------------------------------------------------------
# statistical models (T.81 §F.1.4 encode / §F.2.4 decode)
# --------------------------------------------------------------------------


def _dc_condition(m: int, sign: int, lo: int, up: int) -> int:
    """Next-block conditioning category from this diff's magnitude-1 value
    (F.1.4.4.1.2): zero/small/large split by the DAC L/U bounds."""
    if m < (1 << lo) >> 1:
        return 0
    if m > (1 << up) >> 1:
        return 12 + sign * 4
    return 4 + sign * 4


def decode_dc_diff(dec: ArithDecoder, stats: list[list[int]], ctx: int,
                   lo: int, up: int) -> tuple[int, int]:
    """F.2.4.1: returns (diff, next conditioning category)."""
    if dec.decode(stats[ctx]) == 0:
        return 0, 0
    sign = dec.decode(stats[ctx + 1])
    st = ctx + 2 + sign
    m = dec.decode(stats[st])
    if m:
        st = 20
        while dec.decode(stats[st]):
            m <<= 1
            if m == 0x8000:
                raise ValueError("arithmetic DC magnitude overflow")
            st += 1
    nxt = _dc_condition(m, sign, lo, up)
    v = m
    st += 14
    while m > 1:
        m >>= 1
        if dec.decode(stats[st]):
            v |= m
    v += 1
    return (-v if sign else v), nxt


def encode_dc_diff(enc: ArithEncoder, stats: list[list[int]], ctx: int,
                   diff: int, lo: int, up: int) -> int:
    """F.1.4.4.1 mirror of decode_dc_diff; returns next conditioning ctx."""
    if diff == 0:
        enc.encode(0, stats[ctx])
        return 0
    enc.encode(1, stats[ctx])
    sign = 1 if diff < 0 else 0
    enc.encode(sign, stats[ctx + 1])
    v = -diff if sign else diff
    v -= 1
    st = ctx + 2 + sign
    # magnitude category: number of doublings m = 2^e <= v
    if v == 0:
        enc.encode(0, stats[st])
        m = 0
    else:
        enc.encode(1, stats[st])
        m = 1
        st = 20
        while v >= (m << 1):
            enc.encode(1, stats[st])
            m <<= 1
            st += 1
        enc.encode(0, stats[st])
    nxt = _dc_condition(m, sign, lo, up)
    st += 14
    mm = m
    while mm > 1:
        mm >>= 1
        enc.encode(1 if v & mm else 0, stats[st])
    return nxt


def decode_ac_block(dec: ArithDecoder, stats: list[list[int]],
                    fixed: list[int], blk, kx: int,
                    ss: int = 1, se: int = 63, al: int = 0) -> None:
    """F.2.4.2 (sequential: ss=1 se=63 al=0) and the AC-first progressive
    scan class (G: band [ss, se], values written << al)."""
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if dec.decode(stats[st]):  # EOB
            return
        while dec.decode(stats[st + 1]) == 0:
            st += 3
            k += 1
            if k > se:
                raise ValueError("arithmetic AC run overflow")
        sign = dec.decode(fixed)
        st += 2
        m = dec.decode(stats[st])
        if m and dec.decode(stats[st]):
            m <<= 1
            st = 189 if k <= kx else 217
            while dec.decode(stats[st]):
                m <<= 1
                if m == 0x8000:
                    raise ValueError("arithmetic AC magnitude overflow")
                st += 1
        v = m
        st += 14
        while m > 1:
            m >>= 1
            if dec.decode(stats[st]):
                v |= m
        v += 1
        blk[k] = (-v if sign else v) << al
        k += 1


def decode_ac_refine(dec: ArithDecoder, stats: list[list[int]],
                     fixed: list[int], blk, ss: int, se: int, al: int) -> None:
    """AC successive-approximation refinement scan (G / F.2.4.3): one
    correction bit per previously-nonzero coefficient, newly-significant
    coefficients set to ±1<<al, EOB decision only beyond the previous
    stage's end-of-block index."""
    p1 = 1 << al
    m1 = -1 << al
    kex = se
    while kex >= ss and blk[kex] == 0:
        kex -= 1
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex and dec.decode(stats[st]):
            return  # EOB — the rest of the band is unchanged
        while True:
            if blk[k]:  # previously nonzero: one correction bit
                if dec.decode(stats[st + 2]):
                    blk[k] += m1 if blk[k] < 0 else p1
                break
            if dec.decode(stats[st + 1]):  # newly significant
                blk[k] = m1 if dec.decode(fixed) else p1
                break
            st += 3
            k += 1
            if k > se:
                raise ValueError("arithmetic AC refinement run overflow")
        k += 1


def encode_ac_refine(enc: ArithEncoder, stats: list[list[int]],
                     fixed: list[int], coefs, ss: int, se: int,
                     ah: int, al: int) -> None:
    """Mirror of decode_ac_refine over the TRUE coefficients: previous-pass
    visibility is |c|>>ah, this pass reveals bit al."""
    def cur(k):
        c = int(coefs[k])
        return (abs(c) >> al) * (-1 if c < 0 else 1)

    def prev(k):
        c = int(coefs[k])
        return (abs(c) >> ah) * (-1 if c < 0 else 1)

    ke = se
    while ke >= ss and cur(ke) == 0:
        ke -= 1
    kex = se
    while kex >= ss and prev(kex) == 0:
        kex -= 1
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex:
            if k > ke:
                enc.encode(1, stats[st])
                return
            enc.encode(0, stats[st])
        while True:
            if prev(k):
                enc.encode((abs(int(coefs[k])) >> al) & 1, stats[st + 2])
                break
            if cur(k):
                enc.encode(1, stats[st + 1])
                enc.encode(1 if int(coefs[k]) < 0 else 0, fixed)
                break
            enc.encode(0, stats[st + 1])
            st += 3
            k += 1
        k += 1


def encode_ac_block(enc: ArithEncoder, stats: list[list[int]],
                    fixed: list[int], coefs, kx: int,
                    ss: int = 1, se: int = 63, al: int = 0) -> None:
    """F.1.4.4.2 mirror of decode_ac_block (band [ss, se], AC point
    transform = magnitude shift, i.e. truncation toward zero — G.1.2.1);
    coefs is the zigzag block of TRUE coefficients."""
    def val_at(k):
        c = int(coefs[k])
        return (abs(c) >> al) * (-1 if c < 0 else 1)

    nz = [k for k in range(ss, se + 1) if val_at(k)]
    eob = (nz[-1] + 1) if nz else ss
    k = ss
    while k < eob:
        st = 3 * (k - 1)
        enc.encode(0, stats[st])  # not EOB
        while val_at(k) == 0:
            enc.encode(0, stats[st + 1])
            st += 3
            k += 1
        enc.encode(1, stats[st + 1])
        val = val_at(k)
        sign = 1 if val < 0 else 0
        enc.encode(sign, fixed)
        v = (-val if sign else val) - 1
        st += 2
        if v == 0:
            enc.encode(0, stats[st])
            m = 0
        else:
            enc.encode(1, stats[st])
            if v == 1:
                enc.encode(0, stats[st])
                m = 1
            else:
                enc.encode(1, stats[st])
                m = 2
                st = 189 if k <= kx else 217
                while v >= (m << 1):
                    enc.encode(1, stats[st])
                    m <<= 1
                    st += 1
                enc.encode(0, stats[st])
        st += 14
        mm = m
        while mm > 1:
            mm >>= 1
            enc.encode(1 if v & mm else 0, stats[st])
        k += 1
    if eob <= se:
        enc.encode(1, stats[3 * (eob - 1)])  # EOB decision


# --------------------------------------------------------------------------
# scan decode (wired into jpeg.decode_jpeg for SOF9 frames)
# --------------------------------------------------------------------------


class _ArithScanState:
    """Per-entropy-segment state: coder + statistics areas + DC conditioning,
    reset wholesale at restart markers (F.1.4.2)."""

    def __init__(self, content, pos, ns_comps, dc_cond, ac_cond):
        self.dec = ArithDecoder(content, pos)
        self.fixed = [FIXED_BIN, 0]
        self.dc_stats = {sc["dc"]: new_stats(DC_STAT_BINS) for sc in ns_comps}
        self.ac_stats = {sc["ac"]: new_stats(AC_STAT_BINS) for sc in ns_comps}
        self.preds = {sc["id"]: 0 for sc in ns_comps}
        self.dc_ctx = {sc["id"]: 0 for sc in ns_comps}
        self.dc_cond = dc_cond
        self.ac_cond = ac_cond


def decode_scan_arith(content, pos, frame, scan, store, dc_cond, ac_cond, ri,
                      scan_units):
    """Arithmetic counterpart of jpeg._decode_scan: sequential scans (SOF9,
    Ss/Se/Ah/Al = 0/63/0/0) AND every progressive scan class (SOF10 —
    DC first with point transform, DC refinement via the fixed bin, AC
    first over [Ss, Se], AC successive-approximation refinement).
    `scan_units` is jpeg.py's unit enumerator (shared block-raster logic)."""
    ns_comps, ss, se, ah, al = scan
    per_unit = scan_units(frame, ns_comps)
    state = _ArithScanState(content, pos, ns_comps, dc_cond, ac_cond)
    n_unit = 0
    for blocks in per_unit:
        if ri and n_unit and n_unit % ri == 0:
            p = state.dec.next_marker()
            if not (0xD0 <= content[p + 1] <= 0xD7):
                raise ValueError("expected restart marker")
            state = _ArithScanState(content, p + 2, ns_comps, dc_cond, ac_cond)
        for sc, by, bx in blocks:
            blk = store[sc["id"]][by, bx]
            if ss == 0 and ah == 0:
                # DC first (sequential scans take this path with al=0)
                lo, up = dc_cond.get(sc["dc"], (0, 1))
                diff, nxt = decode_dc_diff(
                    state.dec, state.dc_stats[sc["dc"]],
                    state.dc_ctx[sc["id"]], lo, up,
                )
                state.dc_ctx[sc["id"]] = nxt
                state.preds[sc["id"]] += diff
                blk[0] = state.preds[sc["id"]] << al
            elif ss == 0 and se == 0 and ah > 0:
                # DC refinement: ONE fixed-probability bit per block
                if state.dec.decode(state.fixed):
                    blk[0] |= 1 << al
            if se > 0:
                kx = ac_cond.get(sc["ac"], 5)
                first_k = max(ss, 1)
                if ah == 0:
                    decode_ac_block(
                        state.dec, state.ac_stats[sc["ac"]], state.fixed,
                        blk, kx, first_k, se, al,
                    )
                else:
                    decode_ac_refine(
                        state.dec, state.ac_stats[sc["ac"]], state.fixed,
                        blk, first_k, se, al,
                    )
        n_unit += 1
    return state.dec.next_marker()


# --------------------------------------------------------------------------
# encoders (fixture generators mirroring jpeg.encode_jpeg / encode_jpeg_gray)
# --------------------------------------------------------------------------


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def encode_jpeg_arith(
    width: int,
    height: int,
    gray: int,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Solid-gray 3-component SOF9 (sequential arithmetic) JPEG with unit
    quantization — the arithmetic twin of jpeg.encode_jpeg, decoding back to
    every pixel == gray exactly (same closed form for tests/oracles).
    Emits a DAC segment with the default conditioning (L=0 U=1, Kx=5) to
    exercise that parse path too."""
    from hatchery_spark.functions.jpeg import JPEG_MAGIC

    if not 0 <= gray <= 255:
        raise ValueError("gray must be 0..255")
    hs, vs = (2, 2) if subsampling == "420" else (1, 1)
    dqt = _seg(0xDB, b"\x00" + bytes([1] * 64)) + _seg(0xDB, b"\x01" + bytes([1] * 64))
    sof = _seg(
        0xC9,
        struct.pack(">BHHB", 8, height, width, 3)
        + bytes([1, (hs << 4) | vs, 0])
        + bytes([2, 0x11, 1])
        + bytes([3, 0x11, 1]),
    )
    # DAC: DC table 0 (L=0,U=1 → value 0x10), AC table 0 (Kx=5)
    dac = _seg(0xCC, bytes([0x00, 0x10, 0x10, 5]))
    dri = _seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    sos = _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))

    mcus_x = -(-width // (8 * hs))
    mcus_y = -(-height // (8 * vs))
    y_dc = 8 * (gray - 128)
    zero_ac = [0] * 64

    def fresh():
        return (
            ArithEncoder(),
            {0: new_stats(DC_STAT_BINS)},
            {0: new_stats(AC_STAT_BINS)},
            [FIXED_BIN, 0],
        )

    body = bytearray()
    enc, dc_stats, ac_stats, fixed = fresh()
    preds = {1: 0, 2: 0, 3: 0}
    dc_ctx = {1: 0, 2: 0, 3: 0}
    n_mcu = 0
    rst = 0
    for _my in range(mcus_y):
        for _mx in range(mcus_x):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                body += enc.flush() + bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                enc, dc_stats, ac_stats, fixed = fresh()
                preds = {1: 0, 2: 0, 3: 0}
                dc_ctx = {1: 0, 2: 0, 3: 0}
            for cid, n_blocks in ((1, hs * vs), (2, 1), (3, 1)):
                for _ in range(n_blocks):
                    target = y_dc if cid == 1 else 0
                    diff = target - preds[cid]
                    preds[cid] = target
                    dc_ctx[cid] = encode_dc_diff(
                        enc, dc_stats[0], dc_ctx[cid], diff, 0, 1
                    )
                    encode_ac_block(enc, ac_stats[0], fixed, zero_ac, 5)
            n_mcu += 1
    body += enc.flush()
    return JPEG_MAGIC + dqt + sof + dac + dri + sos + bytes(body) + b"\xff\xd9"


def encode_jpeg_gray_arith(img: np.ndarray, restart_interval: int = 0) -> bytes:
    """Arbitrary-content single-component SOF9 JPEG (unit quantization) —
    the arithmetic twin of jpeg.encode_jpeg_gray. Quantized coefficients are
    computed identically, so decoding this payload and the Huffman one must
    produce BIT-IDENTICAL pixels (the strongest cross-codec test we can run
    without external fixtures)."""
    from hatchery_spark.functions.jpeg import _DCT_M, _ZIGZAG, JPEG_MAGIC

    img = np.asarray(img, dtype=np.float64)
    h, w = img.shape
    bh, bw = -(-h // 8), -(-w // 8)
    padded = np.pad(img, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")

    # per-block 2D matmul + rint, BIT-IDENTICAL to encode_jpeg_gray's loop
    # (a batched einsum rounds the odd coefficient differently at .5-epsilon
    # boundaries, breaking the cross-codec pixel-identity test)
    zz = np.zeros((bh, bw, 64), dtype=np.int32)
    for by in range(bh):
        for bx in range(bw):
            block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coef = np.rint(_DCT_M @ block @ _DCT_M.T).astype(np.int32)
            zz[by, bx] = coef.reshape(-1)[_ZIGZAG]

    dqt = _seg(0xDB, b"\x00" + bytes([1] * 64))
    sof = _seg(0xC9, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    dri = _seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))

    body = bytearray()
    enc = ArithEncoder()
    dc_stats = new_stats(DC_STAT_BINS)
    ac_stats = new_stats(AC_STAT_BINS)
    fixed = [FIXED_BIN, 0]
    pred, ctx = 0, 0
    n_blk, rst = 0, 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and n_blk and n_blk % restart_interval == 0:
                body += enc.flush() + bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                enc = ArithEncoder()
                dc_stats = new_stats(DC_STAT_BINS)
                ac_stats = new_stats(AC_STAT_BINS)
                fixed = [FIXED_BIN, 0]
                pred, ctx = 0, 0
            blk = zz[by, bx]
            diff = int(blk[0]) - pred
            pred = int(blk[0])
            ctx = encode_dc_diff(enc, dc_stats, ctx, diff, 0, 1)
            encode_ac_block(enc, ac_stats, fixed, blk, 5)
            n_blk += 1
    body += enc.flush()
    return JPEG_MAGIC + dqt + sof + dri + sos + bytes(body) + b"\xff\xd9"


def encode_jpeg_gray_arith_progressive(
    img: np.ndarray, al_max: int = 1, restart_interval: int = 0
) -> bytes:
    """Arbitrary-content single-component PROGRESSIVE arithmetic JPEG
    (SOF10): DC first + two AC-first bands at point transform ``al_max``,
    then full successive-approximation refinement chains down to al=0.
    Because refinement reaches al=0, the decoded pixels must be
    BIT-IDENTICAL to the sequential decode of the same coefficients —
    the same cross-codec invariant the SOF9 encoder is tested with."""
    from hatchery_spark.functions.jpeg import _DCT_M, _ZIGZAG, JPEG_MAGIC

    img = np.asarray(img, dtype=np.float64)
    h, w = img.shape
    bh, bw = -(-h // 8), -(-w // 8)
    padded = np.pad(img, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    zz = np.zeros((bh, bw, 64), dtype=np.int32)
    for by in range(bh):
        for bx in range(bw):
            block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coef = np.rint(_DCT_M @ block @ _DCT_M.T).astype(np.int32)
            zz[by, bx] = coef.reshape(-1)[_ZIGZAG]

    scans = [(0, 0, 0, al_max), (1, 31, 0, al_max), (32, 63, 0, al_max)]
    for a in range(al_max, 0, -1):
        scans += [(0, 0, a, a - 1), (1, 31, a, a - 1), (32, 63, a, a - 1)]

    out = bytearray(JPEG_MAGIC)
    out += _seg(0xDB, b"\x00" + bytes([1] * 64))
    out += _seg(0xCA, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += _seg(0xCC, bytes([0x00, 0x10, 0x10, 5]))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))

    for ss, se, ah, al in scans:
        out += _seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))
        enc = ArithEncoder()
        dc_stats = new_stats(DC_STAT_BINS)
        ac_stats = new_stats(AC_STAT_BINS)
        fixed = [FIXED_BIN, 0]
        pred, ctx = 0, 0
        body = bytearray()
        n_blk, rst = 0, 0
        for by in range(bh):
            for bx in range(bw):
                if restart_interval and n_blk and n_blk % restart_interval == 0:
                    body += enc.flush() + bytes([0xFF, 0xD0 + rst])
                    rst = (rst + 1) % 8
                    enc = ArithEncoder()
                    dc_stats = new_stats(DC_STAT_BINS)
                    ac_stats = new_stats(AC_STAT_BINS)
                    fixed = [FIXED_BIN, 0]
                    pred, ctx = 0, 0
                blk = zz[by, bx]
                if ss == 0 and ah == 0:  # DC first: floor-shifted domain
                    m = int(blk[0]) >> al
                    ctx = encode_dc_diff(enc, dc_stats, ctx, m - pred, 0, 1)
                    pred = m
                elif ss == 0 and se == 0:  # DC refinement
                    enc.encode((int(blk[0]) >> al) & 1, fixed)
                if se > 0:
                    first_k = max(ss, 1)
                    if ah == 0:
                        encode_ac_block(
                            enc, ac_stats, fixed, blk, 5, first_k, se, al
                        )
                    else:
                        encode_ac_refine(
                            enc, ac_stats, fixed, blk, first_k, se, ah, al
                        )
                n_blk += 1
        body += enc.flush()
        out += bytes(body)
    return bytes(out) + b"\xff\xd9"
