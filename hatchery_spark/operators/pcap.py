r"""Classic pcap capture files around Ethernet/IPv4/UDP datagrams:
write transcript turns as fully-checksummed wire frames into per-group
capture files, then parse the captures back, verifying BOTH the IPv4
header checksum and the UDP checksum (with its IPv4 pseudo-header) —
the packet-capture replay path a network-security pipeline runs over
archived traffic.

Wire layout, all from the public specs:

  * pcap global header (little-endian writer): magic 0xa1b2c3d4,
    v2.4, thiszone 0, sigfigs 0, snaplen 65535, linktype 1 (Ethernet).
  * per-record header: ts_sec, ts_usec, incl_len, orig_len.
  * Ethernet II: dst/src MAC (locally-administered 02:: from the uid),
    ethertype 0x0800.
  * IPv4 (RFC 791): IHL=5, DF set, TTL 64, proto 17, header checksum =
    16-bit ones'-complement sum over the header with the field zeroed.
  * UDP (RFC 768): length covers header+payload; checksum over the
    pseudo-header (src, dst, 0, 17, udp_len) + header + payload with
    odd-byte zero padding, and the transmit rule 0x0000 → 0xFFFF.

Payload = ``conv_id|turn_idx|text`` (UTF-8), so the per-turn text
equality invariant travels through the frame. A deterministic tamper
flips one PAYLOAD byte of every turn with turn_idx % 59 == 11 after
the checksums were computed: the parser's UDP verification catches it
and dead-letters the frame — the 5-tuple and timestamps stay (the IP
header's own checksum still verifies), the payload fields do not
(nothing past a bad checksum is trusted).

Scale shape: encode = ONE file_id grouping exchange (captures bounded
per uid-stripe), decode = shuffle-free mapInPandas; checksums are
numpy-free byte sums over ≤MTU frames.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC = 0xA1B2C3D4
LINKTYPE_ETHERNET = 1
SNAPLEN = 65535
DPORT = 514
N_FILES = 8

_GHDR = struct.Struct("<IHHiIII")
_RHDR = struct.Struct("<IIII")


def inet_checksum(data: bytes) -> int:
    """RFC 1071 16-bit ones'-complement sum (odd byte zero-padded).

    Computed as one big-integer mod 2^16-1: the ones'-complement sum of
    the 16-bit words is exactly the base-2^16 digit sum with end-around
    carry, i.e. the value of the whole buffer mod 0xFFFF — with the one
    representative subtlety that a nonzero buffer whose sum folds to 0
    is represented as 0xFFFF by the word-at-a-time loop. One C-level
    int.from_bytes + mod replaces the per-word Python loop (~40x on an
    MTU-sized frame; this runs 4x per captured packet)."""
    if len(data) % 2:
        data += b"\x00"
    v = int.from_bytes(data, "big")
    s = v % 0xFFFF
    if s == 0 and v != 0:
        s = 0xFFFF
    return ~s & 0xFFFF


def _ip(ip: str) -> bytes:
    return bytes(int(x) for x in ip.split("."))


def build_frame(src_ip: str, dst_ip: str, src_port: int, dst_port: int,
                uid: int, payload: bytes) -> bytes:
    eth = (bytes([0x02, 0, 0, 0, 0, 0xFE])
           + bytes([0x02, 0, 0, uid >> 16 & 255, uid >> 8 & 255, uid & 255])
           + b"\x08\x00")
    udp_len = 8 + len(payload)
    ip_len = 20 + udp_len
    ip_hdr = bytearray(struct.pack(
        ">BBHHHBBH4s4s", 0x45, 0, ip_len, uid & 0xFFFF, 0x4000, 64, 17, 0,
        _ip(src_ip), _ip(dst_ip),
    ))
    ip_hdr[10:12] = inet_checksum(bytes(ip_hdr)).to_bytes(2, "big")
    udp_hdr = bytearray(struct.pack(">HHHH", src_port, dst_port, udp_len, 0))
    pseudo = _ip(src_ip) + _ip(dst_ip) + b"\x00\x11" + udp_len.to_bytes(2, "big")
    ck = inet_checksum(pseudo + bytes(udp_hdr) + payload)
    udp_hdr[6:8] = (ck or 0xFFFF).to_bytes(2, "big")
    return eth + bytes(ip_hdr) + bytes(udp_hdr) + payload


def parse_frame(frame: bytes) -> dict:
    """One Ethernet frame → 5-tuple + checksum verdicts + payload."""
    if frame[12:14] != b"\x08\x00":
        raise ValueError("pcap: not IPv4")
    ip_hdr = frame[14:34]
    if ip_hdr[0] != 0x45:
        raise ValueError("pcap: unexpected IHL")
    ip_ok = inet_checksum(ip_hdr) == 0
    src_ip = ".".join(str(b) for b in ip_hdr[12:16])
    dst_ip = ".".join(str(b) for b in ip_hdr[16:20])
    udp = frame[34:]
    sp, dp, udp_len, ck = struct.unpack_from(">HHHH", udp, 0)
    payload = udp[8:udp_len]
    pseudo = ip_hdr[12:20] + b"\x00\x11" + udp_len.to_bytes(2, "big")
    calc = inet_checksum(pseudo + udp[:6] + b"\x00\x00" + payload)
    udp_ok = (calc or 0xFFFF) == ck
    return {"src_ip": src_ip, "dst_ip": dst_ip, "src_port": sp,
            "dst_port": dp, "ip_ok": ip_ok, "udp_ok": udp_ok,
            "payload": payload}


def write_pcap(records: list[tuple[int, int, bytes]]) -> bytes:
    """records = [(ts_sec, ts_usec, frame)] → one classic pcap file."""
    out = bytearray(_GHDR.pack(MAGIC, 2, 4, 0, 0, SNAPLEN, LINKTYPE_ETHERNET))
    for ts_sec, ts_usec, frame in records:
        out += _RHDR.pack(ts_sec, ts_usec, len(frame), len(frame))
        out += frame
    return bytes(out)


def split_pcap(buf: bytes) -> list[tuple[int, int, bytes]]:
    magic, vmaj, vmin, _tz, _sf, _snap, link = _GHDR.unpack_from(buf, 0)
    if magic != MAGIC or (vmaj, vmin) != (2, 4) or link != LINKTYPE_ETHERNET:
        raise ValueError("pcap: bad global header")
    out, pos = [], _GHDR.size
    while pos < len(buf):
        ts_sec, ts_usec, incl, orig = _RHDR.unpack_from(buf, pos)
        pos += _RHDR.size
        if incl != orig or pos + incl > len(buf):
            raise ValueError("pcap: truncated record")
        out.append((ts_sec, ts_usec, buf[pos:pos + incl]))
        pos += incl
    return out


# ---------------------------------------------------------------------------
# DataFrame surface
# ---------------------------------------------------------------------------


def capture_turns(turns: DataFrame, tamper_mod: int = 59) -> DataFrame:
    """turns → (file_id, capture binary): one pcap per uid % N_FILES
    stripe, frames ordered by (conv_id, turn_idx); every turn with
    turn_idx % tamper_mod == 11 gets one payload byte flipped AFTER
    checksumming."""
    uid = F.substring("conv_id", 6, 32).cast("long")
    prepared = turns.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        "text",
        uid.alias("_uid"),
        F.pmod(uid, F.lit(N_FILES)).cast("int").alias("file_id"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("_ms"),
    )

    def _encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["conv_id", "turn_idx"])
        records = []
        # plain-array zip: a .loc scalar lookup per row costs more than the
        # whole frame build (itertuples mangles the _uid/_ms names, so pull
        # the columns out once instead)
        for conv, ti, text, u, ms in zip(
            pdf["conv_id"], pdf["turn_idx"], pdf["text"],
            pdf["_uid"].astype(int), pdf["_ms"].astype(int),
        ):
            payload = f"{conv}|{ti}|{text}".encode()
            frame = build_frame(
                f"10.0.{u % 256}.{u % 100}", f"203.0.113.{u % 20}",
                40000 + u % 20000, DPORT, u, payload,
            )
            if ti % tamper_mod == 11:
                frame = frame[:-1] + bytes([frame[-1] ^ 0x01])  # payload tail
            records.append((ms // 1000, ms % 1000 * 1000, frame))
        return pd.DataFrame({
            "file_id": [int(pdf["file_id"].iloc[0])],
            "capture": [write_pcap(records)],
        })

    return prepared.groupBy("file_id").applyInPandas(
        _encode, "file_id int, capture binary"
    )


def parse_captures(df: DataFrame, capture_col: str = "capture") -> DataFrame:
    """captures → one row per frame; payload fields NULL when the UDP
    checksum fails (nothing past a bad checksum is trusted)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fid, raw in zip(pdf["file_id"], pdf[capture_col]):
                for ts_sec, ts_usec, frame in split_pcap(bytes(raw)):
                    m = parse_frame(frame)
                    ok = m["ip_ok"] and m["udp_ok"]
                    conv = ti = text = None
                    if ok:
                        conv, ti, text = m["payload"].decode().split("|", 2)
                        ti = int(ti)
                    rows.append({
                        "file_id": int(fid), "ts_sec": ts_sec,
                        "ts_usec": ts_usec, "src_ip": m["src_ip"],
                        "dst_ip": m["dst_ip"], "src_port": m["src_port"],
                        "dst_port": m["dst_port"], "udp_ok": m["udp_ok"],
                        "conv_id": conv, "turn_idx": ti, "text": text,
                    })
            yield pd.DataFrame(
                rows,
                columns=["file_id", "ts_sec", "ts_usec", "src_ip", "dst_ip",
                         "src_port", "dst_port", "udp_ok", "conv_id",
                         "turn_idx", "text"],
            )

    return df.mapInPandas(
        _decode,
        "file_id int, ts_sec bigint, ts_usec bigint, src_ip string, "
        "dst_ip string, src_port int, dst_port int, udp_ok boolean, "
        "conv_id string, turn_idx int, text string",
    )


def pcap_oracle_sql(transcripts_sql: str, tamper_mod: int = 59) -> str:
    """DuckDB replay: the 5-tuple, timestamps, the tamper predicate, and
    the payload fields all recomputed from the source turns; the
    capture bytes are never touched."""
    return f"""
        WITH t AS ({transcripts_sql}),
        u AS (
          SELECT *, cast(substring(conv_id, 6) AS bigint) AS uid,
                 turn_idx % {tamper_mod} = 11 AS bad
          FROM t
        )
        SELECT cast(uid % {N_FILES} AS int) AS file_id,
               epoch_ms(ts) // 1000 AS ts_sec,
               epoch_ms(ts) % 1000 * 1000 AS ts_usec,
               '10.0.' || cast(uid % 256 AS varchar) || '.'
                 || cast(uid % 100 AS varchar) AS src_ip,
               '203.0.113.' || cast(uid % 20 AS varchar) AS dst_ip,
               cast(40000 + uid % 20000 AS int) AS src_port,
               {DPORT} AS dst_port,
               NOT bad AS udp_ok,
               CASE WHEN NOT bad THEN conv_id END AS conv_id,
               CASE WHEN NOT bad THEN turn_idx END AS turn_idx,
               CASE WHEN NOT bad THEN text END AS text
        FROM u"""
