r"""NetFlow v5 export framing: pack flow records into the classic
24-byte-header + 48-byte-record export datagrams (≤30 records per
packet, monotone flow_sequence per exporter) and parse them back — the
third network-telemetry wire format after the biflow stitcher and the
CIDR enricher (reference analog: the raw per-source decode stage of
hatchery's clients, source/*/client.go).

Layout per the public Cisco NetFlow v5 spec (all big-endian):

    header:  version(2)=5 count(2) sys_uptime(4) unix_secs(4)
             unix_nsecs(4) flow_sequence(4) engine_type(1) engine_id(1)
             sampling_interval(2)                                = 24 B
    record:  srcaddr(4) dstaddr(4) nexthop(4) input(2) output(2)
             dPkts(4) dOctets(4) first(4) last(4) srcport(2)
             dstport(2) pad1(1) tcp_flags(1) prot(1) tos(1)
             src_as(2) dst_as(2) src_mask(1) dst_mask(1) pad2(2) = 48 B

Packetization is fully data-derived so the oracle can replay it: rows
are ordered per exporter by (ts, event_id) with row_number, packets cut
every 30 rows, flow_sequence = 30·pkt_idx (the count of flows exported
before this packet), and the header's unix_secs is the packet's max
record timestamp. first/last carry unix_millis(ts) mod 2^32 (v5's
32-bit uptime wraparound, made explicit rather than hidden).

Scale shape: encode pays one exporter-keyed window exchange plus the
(exporter, pkt_idx) grouping exchange over the SAME rows (the second
key is a superset of the first — no data amplification between them);
decode is a shuffle-free mapInPandas; packets are ≤ 1464 bytes by
construction (the v5 MTU contract), so no group is ever unbounded.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

VERSION = 5
MAX_RECORDS = 30
ENGINE_TYPE, ENGINE_ID = 1, 7

_HDR = struct.Struct(">HHIIIIBBH")
_REC = struct.Struct(">IIIHHIIIIHHBBBBHHBBH")

# numpy mirrors of _HDR/_REC for whole-batch vectorized pack/unpack
# (no align → exactly the packed struct layout: 24 and 48 bytes)
_HDR_DT = np.dtype([
    ("version", ">u2"), ("count", ">u2"), ("uptime", ">u4"),
    ("unix_secs", ">u4"), ("nsecs", ">u4"), ("flow_seq", ">u4"),
    ("etype", "u1"), ("eid", "u1"), ("sampling", ">u2"),
])
_REC_DT = np.dtype([
    ("src", ">u4"), ("dst", ">u4"), ("nexthop", ">u4"),
    ("input", ">u2"), ("output", ">u2"), ("pkts", ">u4"),
    ("octets", ">u4"), ("first", ">u4"), ("last", ">u4"),
    ("sp", ">u2"), ("dp", ">u2"), ("pad1", "u1"), ("flags", "u1"),
    ("prot", "u1"), ("tos", "u1"), ("sas", ">u2"), ("das", ">u2"),
    ("sm", "u1"), ("dm", "u1"), ("pad2", ">u2"),
])
assert _HDR_DT.itemsize == _HDR.size and _REC_DT.itemsize == _REC.size
_HDR_SIZE, _REC_SIZE = _HDR.size, _REC.size


def _ips_to_u32(col: pd.Series) -> np.ndarray:
    """Vectorized dotted-quad → uint32 over a string Series."""
    parts = col.str.split(".", expand=True).astype(np.uint32)
    return (
        (parts[0].to_numpy() << 24) | (parts[1].to_numpy() << 16)
        | (parts[2].to_numpy() << 8) | parts[3].to_numpy()
    )


def _u32_to_ips(a: np.ndarray) -> np.ndarray:
    """Vectorized uint32 → dotted-quad strings."""
    return (
        (a >> 24).astype("U3").astype(object) + "."
        + ((a >> 16) & 255).astype("U3").astype(object) + "."
        + ((a >> 8) & 255).astype("U3").astype(object) + "."
        + (a & 255).astype("U3").astype(object)
    )


def _ip2int(ip: str) -> int:
    a, b, c, d = (int(x) for x in ip.split("."))
    return (a << 24) | (b << 16) | (c << 8) | d


def _int2ip(n: int) -> str:
    return f"{n >> 24 & 255}.{n >> 16 & 255}.{n >> 8 & 255}.{n & 255}"


def encode_packet(exporter_id: int, pkt_idx: int,
                  rows: list[dict]) -> bytes:
    """rows (≤30, in export order) → one v5 datagram."""
    if not (0 < len(rows) <= MAX_RECORDS):
        raise ValueError(f"netflow: bad record count {len(rows)}")
    unix_secs = max(r["unix_secs"] for r in rows)
    out = bytearray(
        _HDR.pack(VERSION, len(rows), 0, unix_secs, 0,
                  MAX_RECORDS * pkt_idx, ENGINE_TYPE, ENGINE_ID, exporter_id)
    )
    for r in rows:
        out += _REC.pack(
            _ip2int(r["src_ip"]), _ip2int(r["dst_ip"]), 0, 0, 0,
            r["pkts"], r["octets"], r["first_ms"], r["first_ms"],
            r["src_port"], r["dst_port"], 0,
            0x1B if r["prot"] == 6 else 0, r["prot"], 0, 0, 0, 0, 0, 0,
        )
    return bytes(out)


def decode_packet(buf: bytes) -> dict:
    """One datagram → header dict + list of record dicts."""
    (version, count, _upt, unix_secs, _nsecs, flow_seq, etype, eid,
     sampling) = _HDR.unpack_from(buf, 0)
    if version != VERSION:
        raise ValueError(f"netflow: version {version}")
    if len(buf) != _HDR_SIZE + count * _REC_SIZE:
        raise ValueError("netflow: length mismatch")
    records = []
    for i in range(count):
        (src, dst, _nh, _in, _out, pkts, octets, first, _last, sp, dp,
         _p1, flags, prot, _tos, _sas, _das, _sm, _dm, _p2) = \
            _REC.unpack_from(buf, _HDR.size + i * _REC.size)
        records.append({
            "rec_idx": i, "src_ip": _int2ip(src), "dst_ip": _int2ip(dst),
            "src_port": sp, "dst_port": dp, "prot": prot,
            "tcp_flags": flags, "pkts": pkts, "octets": octets,
            "first_ms": first,
        })
    return {"exporter_id": sampling, "flow_sequence": flow_seq,
            "count": count, "unix_secs": unix_secs, "records": records}


# ---------------------------------------------------------------------------
# DataFrame surface
# ---------------------------------------------------------------------------

FLOW_FIXTURE_SQL = """
SELECT
  cast(user_id % 4 AS int) AS exporter_id,
  event_id, ts,
  concat('10.0.', cast(user_id % 256 AS string), '.',
         cast(user_id % 100 AS string)) AS src_ip,
  cast(1024 + event_id % 60000 AS int) AS src_port,
  concat('192.168.', cast(event_id % 200 AS string), '.',
         cast(event_id % 250 AS string)) AS dst_ip,
  cast(443 AS int) AS dst_port,
  cast(CASE WHEN event_id % 3 = 0 THEN 17 ELSE 6 END AS int) AS prot,
  cast(1 + event_id % 5 AS int) AS pkts,
  cast(40 + floor(value * 11) AS int) AS octets
FROM {events}
"""


def export_netflow(flows: DataFrame) -> DataFrame:
    """flow rows → (packet binary): row_number per exporter ordered by
    (ts, event_id), packets cut every MAX_RECORDS rows."""
    w = Window.partitionBy("exporter_id").orderBy("ts", "event_id")
    prepared = flows.select(
        "exporter_id", "src_ip", "src_port", "dst_ip", "dst_port",
        "prot", "pkts", "octets",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("_ms"),
        F.floor((F.row_number().over(w) - 1) / MAX_RECORDS).cast("int")
        .alias("pkt_idx"),
        F.row_number().over(w).alias("_rn"),
    ).select(
        "*",
        F.pmod("_ms", F.lit(2 ** 32)).cast("long").alias("first_ms"),
        (F.col("_ms") / 1000).cast("long").alias("unix_secs"),
    )

    # one vectorized pass per PARTITION, not one Python call per packet:
    # applyInPandas costs a pandas frame per group (3k+ tiny groups at
    # sf0.1) and inherits the window's exporter-only partitioning (4
    # tasks). Repartitioning on the full (exporter, pkt_idx) key spreads
    # packets over the cluster, and the whole-batch numpy pack replaces
    # the per-row dict/struct loop (guide §4.2).
    def _encode_parts(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        pdf = pdf.sort_values(["exporter_id", "_rn"], kind="mergesort")
        n = len(pdf)
        rec = np.zeros(n, dtype=_REC_DT)
        rec["src"] = _ips_to_u32(pdf["src_ip"])
        rec["dst"] = _ips_to_u32(pdf["dst_ip"])
        rec["pkts"] = pdf["pkts"].to_numpy(np.uint32)
        rec["octets"] = pdf["octets"].to_numpy(np.uint32)
        first = pdf["first_ms"].to_numpy(np.int64).astype(np.uint32)
        rec["first"] = first
        rec["last"] = first
        rec["sp"] = pdf["src_port"].to_numpy(np.uint16)
        rec["dp"] = pdf["dst_port"].to_numpy(np.uint16)
        prot = pdf["prot"].to_numpy(np.uint8)
        rec["flags"] = np.where(prot == 6, 0x1B, 0)
        rec["prot"] = prot
        rec_bytes = rec.view(np.uint8).reshape(n, _REC_SIZE)

        # packet boundaries on the (exporter, pkt_idx) sorted key
        exp = pdf["exporter_id"].to_numpy(np.int64)
        pki = pdf["pkt_idx"].to_numpy(np.int64)
        starts = np.flatnonzero(
            np.r_[True, (exp[1:] != exp[:-1]) | (pki[1:] != pki[:-1])]
        )
        ends = np.r_[starts[1:], n]
        secs = pdf["unix_secs"].to_numpy(np.int64)
        hdr = np.zeros(len(starts), dtype=_HDR_DT)
        hdr["version"] = VERSION
        hdr["count"] = ends - starts
        hdr["unix_secs"] = np.maximum.reduceat(secs, starts)
        hdr["flow_seq"] = (MAX_RECORDS * pki[starts]).astype(np.uint32)
        hdr["etype"] = ENGINE_TYPE
        hdr["eid"] = ENGINE_ID
        hdr["sampling"] = exp[starts].astype(np.uint16)
        hdr_bytes = hdr.view(np.uint8).reshape(len(starts), _HDR_SIZE)
        pkts = [
            hdr_bytes[i].tobytes() + rec_bytes[s:e].tobytes()
            for i, (s, e) in enumerate(zip(starts, ends))
        ]
        yield pd.DataFrame({"packet": pkts})

    return prepared.repartition("exporter_id", "pkt_idx").mapInPandas(
        _encode_parts, "packet binary"
    )


def parse_netflow(df: DataFrame, packet_col: str = "packet") -> DataFrame:
    """datagrams → one row per flow record (header fields repeated)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # header checks + per-packet record counts, then ONE numpy
            # parse over the concatenated record blocks (guide §4.2)
            bufs, hdrs = [], []
            for raw in pdf[packet_col]:
                buf = bytes(raw)
                version, count = struct.unpack_from(">HH", buf, 0)
                if version != VERSION:
                    raise ValueError(f"netflow: version {version}")
                if len(buf) != _HDR_SIZE + count * _REC_SIZE:
                    raise ValueError("netflow: length mismatch")
                hdrs.append(buf[:_HDR_SIZE])
                bufs.append(buf[_HDR_SIZE:])
            if not bufs:
                yield pd.DataFrame(
                    columns=["exporter_id", "flow_sequence", "hdr_count",
                             "hdr_unix_secs", "rec_idx", "src_ip",
                             "dst_ip", "src_port", "dst_port", "prot",
                             "tcp_flags", "pkts", "octets", "first_ms"],
                )
                continue
            hdr = np.frombuffer(b"".join(hdrs), dtype=_HDR_DT)
            counts = hdr["count"].astype(np.int64)
            rec = np.frombuffer(b"".join(bufs), dtype=_REC_DT)
            rep = np.repeat(np.arange(len(hdr)), counts)
            rec_idx = np.arange(len(rec)) - np.repeat(
                np.cumsum(counts) - counts, counts
            )
            yield pd.DataFrame({
                "exporter_id": hdr["sampling"][rep].astype(np.int32),
                "flow_sequence": hdr["flow_seq"][rep].astype(np.int64),
                "hdr_count": counts[rep].astype(np.int32),
                "hdr_unix_secs": hdr["unix_secs"][rep].astype(np.int64),
                "rec_idx": rec_idx.astype(np.int32),
                "src_ip": _u32_to_ips(rec["src"]),
                "dst_ip": _u32_to_ips(rec["dst"]),
                "src_port": rec["sp"].astype(np.int32),
                "dst_port": rec["dp"].astype(np.int32),
                "prot": rec["prot"].astype(np.int32),
                "tcp_flags": rec["flags"].astype(np.int32),
                "pkts": rec["pkts"].astype(np.int32),
                "octets": rec["octets"].astype(np.int32),
                "first_ms": rec["first"].astype(np.int64),
            })

    return df.mapInPandas(
        _decode,
        "exporter_id int, flow_sequence bigint, hdr_count int, "
        "hdr_unix_secs bigint, rec_idx int, src_ip string, dst_ip string, "
        "src_port int, dst_port int, prot int, tcp_flags int, pkts int, "
        "octets int, first_ms bigint",
    )


def netflow_oracle_sql(events_table: str = "events") -> str:
    """DuckDB replay: packet membership, sequence numbers, header
    timestamps, and every record field recomputed from the events rows
    via the same row_number arithmetic. Wire bytes never touched."""
    fixture = FLOW_FIXTURE_SQL.format(events=events_table)
    return f"""
        WITH f AS ({fixture}),
        n AS (
          SELECT *,
                 cast((row_number() OVER (PARTITION BY exporter_id
                                          ORDER BY ts, event_id) - 1)
                      // {MAX_RECORDS} AS int) AS pkt_idx,
                 row_number() OVER (PARTITION BY exporter_id
                                    ORDER BY ts, event_id) AS rn,
                 epoch_ms(ts) % 4294967296 AS first_ms,
                 epoch_ms(ts) // 1000 AS unix_secs
          FROM f
        )
        SELECT exporter_id,
               cast({MAX_RECORDS} * pkt_idx AS bigint) AS flow_sequence,
               cast(count(*) OVER (PARTITION BY exporter_id, pkt_idx) AS int)
                 AS hdr_count,
               max(unix_secs) OVER (PARTITION BY exporter_id, pkt_idx)
                 AS hdr_unix_secs,
               cast((rn - 1) % {MAX_RECORDS} AS int) AS rec_idx,
               src_ip, dst_ip, src_port, dst_port, prot,
               cast(CASE WHEN prot = 6 THEN 27 ELSE 0 END AS int) AS tcp_flags,
               pkts, octets, first_ms
        FROM n"""
