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

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

VERSION = 5
MAX_RECORDS = 30
ENGINE_TYPE, ENGINE_ID = 1, 7

_HDR = struct.Struct(">HHIIIIBBH")
_REC = struct.Struct(">IIIHHIIIIHHBBBBHHBBH")


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
    if len(buf) != _HDR.size + count * _REC.size:
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

    def _encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_rn")
        rows = [
            {"src_ip": r.src_ip, "dst_ip": r.dst_ip,
             "src_port": int(r.src_port), "dst_port": int(r.dst_port),
             "prot": int(r.prot), "pkts": int(r.pkts),
             "octets": int(r.octets), "first_ms": int(r.first_ms),
             "unix_secs": int(r.unix_secs)}
            for r in pdf.itertuples()
        ]
        pkt = encode_packet(int(pdf["exporter_id"].iloc[0]),
                            int(pdf["pkt_idx"].iloc[0]), rows)
        return pd.DataFrame({"packet": [pkt]})

    return prepared.groupBy("exporter_id", "pkt_idx").applyInPandas(
        _encode, "packet binary"
    )


def parse_netflow(df: DataFrame, packet_col: str = "packet") -> DataFrame:
    """datagrams → one row per flow record (header fields repeated)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for raw in pdf[packet_col]:
                p = decode_packet(bytes(raw))
                for r in p["records"]:
                    rows.append({
                        "exporter_id": p["exporter_id"],
                        "flow_sequence": p["flow_sequence"],
                        "hdr_count": p["count"],
                        "hdr_unix_secs": p["unix_secs"],
                        **r,
                    })
            yield pd.DataFrame(
                rows,
                columns=["exporter_id", "flow_sequence", "hdr_count",
                         "hdr_unix_secs", "rec_idx", "src_ip", "dst_ip",
                         "src_port", "dst_port", "prot", "tcp_flags",
                         "pkts", "octets", "first_ms"],
            )

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
