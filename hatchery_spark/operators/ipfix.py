r"""IPFIX (NetFlow v10, RFC 7011) export framing with IN-BAND templates:
the templated successor of the fixed-layout v5 exporter next door
(operators/netflow.py) — and the binary analog of the W3C extended
log's directive-driven field binding (operators/weblog.py): the wire
carries its own schema, and a correct collector binds data records by
the template it received EARLIER IN THE STREAM, not by position.

Message layout (RFC 7011 §3, all big-endian):

    header:   version(2)=10 length(2) export_time(4) sequence(4)
              observation_domain_id(4)                        = 16 B
    set:      set_id(2) set_length(2) + payload
    template set (set_id=2): template_id(2) field_count(2) then
              field_count × [ie_id(2) field_len(2)]
    data set  (set_id=template_id ≥ 256): records packed per the
              template's field order and lengths

What the fixture exercises, deliberately:

* TWO templates with DIFFERENT field orders (exporter parity picks
  256 or 257) — a positional reader parses one and corrupts the other;
* RFC 7011 §6.2 REDUCED-SIZE ENCODING in template 257
  (octetDeltaCount IE 1 shipped in 4 bytes instead of 8,
  packetDeltaCount IE 2 in 2) — binding by (ie_id, declared length),
  not by the IE's nominal size;
* templates sent ONLY in each exporter's first message — the collector
  must carry template state across messages of the same observation
  domain (sequence numbers order them), exactly how real collectors
  behave after an exporter restart;
* the header `sequence` field is the RFC's count of data records
  exported before this message (row_number arithmetic, oracle-
  replayable), `export_time` the packet's max record second (the v5
  module's convention).

Scale shape: encode = one exporter-keyed window exchange + the
(exporter, pkt_idx) grouping over the same rows (the netflow.py
shape); parse = one shallow mapInPandas header peel (no shuffle), then
ONE observation-domain exchange so each domain's messages meet their
template in seq order. Packets hold ≤ MAX_RECORDS records (≤ ~800 B).

Oracle: every record field, the template id, the sequence numbers, and
each message's exact BYTE LENGTH (16 + 40-byte template set on the
first packet + 4 + n·record_len, record_len 37 vs 27 by parity) replay
from the events rows — wire bytes never touched by the oracle.

Reference analog: the raw per-source decode stage, source/*/client.go.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hatchery_spark.operators.netflow import (
    _int2ip,
    _ip2int,
    _ips_to_u32,
    _u32_to_ips,
)

VERSION = 10
MAX_RECORDS = 20
TEMPLATE_SET_ID = 2

# IANA IPFIX information elements
IE_OCTETS, IE_PKTS, IE_PROTO = 1, 2, 4
IE_SRC_PORT, IE_SRC_IP = 7, 8
IE_DST_PORT, IE_DST_IP = 11, 12
IE_START_MS = 152

# template_id → [(ie_id, field_len)]; 257 flips the order AND uses
# reduced-size encoding for the two counters
TEMPLATES: dict[int, list[tuple[int, int]]] = {
    256: [(IE_SRC_IP, 4), (IE_DST_IP, 4), (IE_SRC_PORT, 2),
          (IE_DST_PORT, 2), (IE_PROTO, 1), (IE_PKTS, 8), (IE_OCTETS, 8),
          (IE_START_MS, 8)],
    257: [(IE_START_MS, 8), (IE_OCTETS, 4), (IE_PKTS, 2), (IE_PROTO, 1),
          (IE_SRC_PORT, 2), (IE_DST_PORT, 2), (IE_SRC_IP, 4),
          (IE_DST_IP, 4)],
}


def record_len(template_id: int) -> int:
    return sum(ln for _, ln in TEMPLATES[template_id])


def _template_set(template_id: int) -> bytes:
    fields = TEMPLATES[template_id]
    body = struct.pack(">HH", template_id, len(fields))
    for ie, ln in fields:
        body += struct.pack(">HH", ie, ln)
    return struct.pack(">HH", TEMPLATE_SET_ID, 4 + len(body)) + body


def encode_message(domain: int, pkt_idx: int, rows: list[dict]) -> bytes:
    """rows (≤ MAX_RECORDS, export order) → one IPFIX message; the
    template set rides along only on pkt_idx 0."""
    template_id = 256 + domain % 2
    fields = TEMPLATES[template_id]
    recs = b""
    for r in rows:
        vals = {
            IE_SRC_IP: _ip2int(r["src_ip"]), IE_DST_IP: _ip2int(r["dst_ip"]),
            IE_SRC_PORT: r["src_port"], IE_DST_PORT: r["dst_port"],
            IE_PROTO: r["prot"], IE_PKTS: r["pkts"],
            IE_OCTETS: r["octets"], IE_START_MS: r["start_ms"],
        }
        for ie, ln in fields:
            v = vals[ie]
            if v >= 1 << (8 * ln):
                raise ValueError(f"IE {ie} value {v} overflows {ln} bytes")
            recs += int(v).to_bytes(ln, "big")
    sets = b""
    if pkt_idx == 0:
        sets += _template_set(template_id)
    sets += struct.pack(">HH", template_id, 4 + len(recs)) + recs
    export_time = max(r["unix_secs"] for r in rows)
    seq = MAX_RECORDS * pkt_idx
    hdr = struct.pack(">HHIII", VERSION, 16 + len(sets), export_time,
                      seq, domain)
    return hdr + sets


def decode_stream(messages: list[bytes]) -> list[dict]:
    """One observation domain's messages (any arrival order) → records.
    Messages sort by header sequence; templates learned in-band apply
    to every later data set of the domain. Unknown set ids (no template
    seen yet) and malformed lengths raise — a collector must not guess.
    """
    peeled = []
    for buf in messages:
        if len(buf) < 16:
            raise ValueError("short IPFIX message")
        version, length, export_time, seq, domain = struct.unpack(
            ">HHIII", buf[:16]
        )
        if version != VERSION or length != len(buf):
            raise ValueError("bad IPFIX header")
        peeled.append((seq, export_time, domain, buf))
    peeled.sort(key=lambda x: x[0])
    templates: dict[int, list[tuple[int, int]]] = {}
    out = []
    for seq, export_time, domain, buf in peeled:
        off = 16
        while off < len(buf):
            set_id, set_len = struct.unpack_from(">HH", buf, off)
            if set_len < 4 or off + set_len > len(buf):
                raise ValueError("bad set length")
            body = buf[off + 4:off + set_len]
            if set_id == TEMPLATE_SET_ID:
                p = 0
                while p + 4 <= len(body):
                    tid, fc = struct.unpack_from(">HH", body, p)
                    p += 4
                    fields = []
                    for _ in range(fc):
                        ie, ln = struct.unpack_from(">HH", body, p)
                        p += 4
                        fields.append((ie, ln))
                    templates[tid] = fields
            elif set_id >= 256:
                if set_id not in templates:
                    raise ValueError(f"data set {set_id} before template")
                fields = templates[set_id]
                rlen = sum(ln for _, ln in fields)
                n = len(body) // rlen
                for i in range(n):
                    rec = body[i * rlen:(i + 1) * rlen]
                    vals, p = {}, 0
                    for ie, ln in fields:
                        vals[ie] = int.from_bytes(rec[p:p + ln], "big")
                        p += ln
                    out.append({
                        "exporter_id": domain, "template_id": set_id,
                        "seq": seq, "export_time": export_time,
                        "rec_idx": i, "msg_bytes": len(buf),
                        "src_ip": _int2ip(vals[IE_SRC_IP]),
                        "dst_ip": _int2ip(vals[IE_DST_IP]),
                        "src_port": vals[IE_SRC_PORT],
                        "dst_port": vals[IE_DST_PORT],
                        "prot": vals[IE_PROTO], "pkts": vals[IE_PKTS],
                        "octets": vals[IE_OCTETS],
                        "start_ms": vals[IE_START_MS],
                    })
            else:
                raise ValueError(f"reserved set id {set_id}")
            off += set_len
    return out


def export_ipfix(flows: DataFrame) -> DataFrame:
    """flow rows → (message binary): row_number per exporter ordered by
    (ts, event_id), messages cut every MAX_RECORDS rows, template set
    on each exporter's first message only."""
    w = Window.partitionBy("exporter_id").orderBy("ts", "event_id")
    prepared = flows.select(
        "exporter_id", "src_ip", "src_port", "dst_ip", "dst_port",
        "prot", "pkts", "octets",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("start_ms"),
        (F.unix_millis(F.col("ts").cast("timestamp")) / 1000)
        .cast("long").alias("unix_secs"),
        F.floor((F.row_number().over(w) - 1) / MAX_RECORDS).cast("int")
        .alias("pkt_idx"),
        F.row_number().over(w).alias("_rn"),
    )

    # one vectorized pass per PARTITION instead of one Python call per
    # message (the netflow.py lesson, guide §4.2): repartition on the full
    # (exporter, pkt_idx) key so the encode spreads beyond the window's
    # exporter-only partitioning, then whole-batch numpy packing per
    # template (the per-template field order/width IS the numpy dtype).
    def _encode_parts(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        pdf = pdf.sort_values(["exporter_id", "_rn"], kind="mergesort")
        exp_all = pdf["exporter_id"].to_numpy(np.int64)
        msgs: list[bytes] = []
        for template_id, fields in TEMPLATES.items():
            sub = pdf[exp_all % 2 == template_id - 256]
            if not len(sub):
                continue
            vals = {
                IE_SRC_IP: _ips_to_u32(sub["src_ip"]).astype(np.uint64),
                IE_DST_IP: _ips_to_u32(sub["dst_ip"]).astype(np.uint64),
                IE_SRC_PORT: sub["src_port"].to_numpy(np.uint64),
                IE_DST_PORT: sub["dst_port"].to_numpy(np.uint64),
                IE_PROTO: sub["prot"].to_numpy(np.uint64),
                IE_PKTS: sub["pkts"].to_numpy(np.uint64),
                IE_OCTETS: sub["octets"].to_numpy(np.uint64),
                IE_START_MS: sub["start_ms"].to_numpy(np.uint64),
            }
            dt = np.dtype([(f"f{i}", f">u{ln}")
                           for i, (_, ln) in enumerate(fields)])
            rec = np.zeros(len(sub), dtype=dt)
            for i, (ie, ln) in enumerate(fields):
                v = vals[ie]
                if ln < 8 and v.size and int(v.max()) >= 1 << (8 * ln):
                    raise ValueError(
                        f"IE {ie} value {int(v.max())} overflows {ln} bytes"
                    )
                rec[f"f{i}"] = v
            rec_bytes = rec.view(np.uint8).reshape(len(sub), dt.itemsize)
            exp = sub["exporter_id"].to_numpy(np.int64)
            pki = sub["pkt_idx"].to_numpy(np.int64)
            starts = np.flatnonzero(
                np.r_[True, (exp[1:] != exp[:-1]) | (pki[1:] != pki[:-1])]
            )
            ends = np.r_[starts[1:], len(sub)]
            export_time = np.maximum.reduceat(
                sub["unix_secs"].to_numpy(np.int64), starts
            )
            tmpl = _template_set(template_id)
            for i, (s, e) in enumerate(zip(starts, ends)):
                recs = rec_bytes[s:e].tobytes()
                sets = (tmpl if pki[s] == 0 else b"") + struct.pack(
                    ">HH", template_id, 4 + len(recs)
                ) + recs
                msgs.append(struct.pack(
                    ">HHIII", VERSION, 16 + len(sets), int(export_time[i]),
                    MAX_RECORDS * int(pki[s]), int(exp[s]),
                ) + sets)
        yield pd.DataFrame({"message": msgs})

    return prepared.repartition("exporter_id", "pkt_idx").mapInPandas(
        _encode_parts, "message binary"
    )


def parse_ipfix(df: DataFrame, message_col: str = "message") -> DataFrame:
    """messages → one row per data record. Stage 1 peels the header
    (mapInPandas, no shuffle) to route each message to its observation
    domain; stage 2 is ONE domain-keyed exchange where messages meet
    their in-band template in sequence order."""

    def _peel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doms = [struct.unpack_from(">I", bytes(b), 12)[0]
                    for b in pdf[message_col]]
            yield pd.DataFrame({"domain": doms,
                                "message": pdf[message_col]})

    routed = df.mapInPandas(_peel, "domain int, message binary")

    cols = ["exporter_id", "template_id", "seq", "export_time", "rec_idx",
            "msg_bytes", "src_ip", "dst_ip", "src_port", "dst_port",
            "prot", "pkts", "octets", "start_ms"]

    def _decode(pdf: pd.DataFrame) -> pd.DataFrame:
        # the in-band template walk stays per message (it IS the protocol
        # state machine), but record fields parse as ONE numpy pass per
        # (template, field layout) over the concatenated data-set bodies
        # instead of a per-record Python loop (guide §4.2).
        peeled = []
        for b in pdf["message"]:
            buf = bytes(b)
            if len(buf) < 16:
                raise ValueError("short IPFIX message")
            version, length, export_time, seq, domain = struct.unpack(
                ">HHIII", buf[:16]
            )
            if version != VERSION or length != len(buf):
                raise ValueError("bad IPFIX header")
            peeled.append((seq, export_time, domain, buf))
        peeled.sort(key=lambda x: x[0])
        templates: dict[int, list[tuple[int, int]]] = {}
        # per template id: concatenated record bytes + per-set metadata
        bodies: dict[int, list[bytes]] = {}
        metas: dict[int, list[tuple[int, int, int, int, int]]] = {}
        for seq, export_time, domain, buf in peeled:
            off = 16
            while off < len(buf):
                set_id, set_len = struct.unpack_from(">HH", buf, off)
                if set_len < 4 or off + set_len > len(buf):
                    raise ValueError("bad set length")
                body = buf[off + 4:off + set_len]
                if set_id == TEMPLATE_SET_ID:
                    p = 0
                    while p + 4 <= len(body):
                        tid, fc = struct.unpack_from(">HH", body, p)
                        p += 4
                        fields = []
                        for _ in range(fc):
                            ie, ln = struct.unpack_from(">HH", body, p)
                            p += 4
                            fields.append((ie, ln))
                        templates[tid] = fields
                elif set_id >= 256:
                    if set_id not in templates:
                        raise ValueError(f"data set {set_id} before template")
                    rlen = sum(ln for _, ln in templates[set_id])
                    n = len(body) // rlen
                    bodies.setdefault(set_id, []).append(body[:n * rlen])
                    metas.setdefault(set_id, []).append(
                        (domain, seq, export_time, len(buf), n)
                    )
                else:
                    raise ValueError(f"reserved set id {set_id}")
                off += set_len
        frames = []
        for tid, blist in bodies.items():
            fields = templates[tid]
            dt = np.dtype([(f"f{i}", f">u{ln}")
                           for i, (_, ln) in enumerate(fields)])
            rec = np.frombuffer(b"".join(blist), dtype=dt)
            by_ie = {ie: rec[f"f{i}"].astype(np.uint64)
                     for i, (ie, _) in enumerate(fields)}
            meta = np.asarray(metas[tid], dtype=np.int64)
            counts = meta[:, 4]
            rep = np.repeat(np.arange(len(meta)), counts)
            rec_idx = np.arange(len(rec)) - np.repeat(
                np.cumsum(counts) - counts, counts
            )
            frames.append(pd.DataFrame({
                "exporter_id": meta[rep, 0].astype(np.int32),
                "template_id": np.full(len(rec), tid, dtype=np.int32),
                "seq": meta[rep, 1],
                "export_time": meta[rep, 2],
                "rec_idx": rec_idx.astype(np.int32),
                "msg_bytes": meta[rep, 3].astype(np.int32),
                "src_ip": _u32_to_ips(by_ie[IE_SRC_IP].astype(np.uint32)),
                "dst_ip": _u32_to_ips(by_ie[IE_DST_IP].astype(np.uint32)),
                "src_port": by_ie[IE_SRC_PORT].astype(np.int32),
                "dst_port": by_ie[IE_DST_PORT].astype(np.int32),
                "prot": by_ie[IE_PROTO].astype(np.int32),
                "pkts": by_ie[IE_PKTS].astype(np.int64),
                "octets": by_ie[IE_OCTETS].astype(np.int64),
                "start_ms": by_ie[IE_START_MS].astype(np.int64),
            }))
        if not frames:
            return pd.DataFrame({c: [] for c in cols})
        return pd.concat(frames, ignore_index=True)[cols]

    return routed.groupBy("domain").applyInPandas(
        _decode,
        "exporter_id int, template_id int, seq bigint, export_time bigint, "
        "rec_idx int, msg_bytes int, src_ip string, dst_ip string, "
        "src_port int, dst_port int, prot int, pkts bigint, octets bigint, "
        "start_ms bigint",
    )


def ipfix_oracle_sql(events_table: str = "events") -> str:
    """DuckDB replay: record fields, template ids, sequence numbers,
    export times, and each message's exact byte length recomputed from
    the events rows; wire bytes never touched."""
    from hatchery_spark.operators.netflow import FLOW_FIXTURE_SQL

    tmpl_set = 4 + 4 + 8 * 4  # set hdr + template hdr + 8 specs
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
                 epoch_ms(ts) AS start_ms,
                 epoch_ms(ts) // 1000 AS unix_secs
          FROM f
        )
        SELECT exporter_id,
               cast(256 + exporter_id % 2 AS int) AS template_id,
               cast({MAX_RECORDS} * pkt_idx AS bigint) AS seq,
               max(unix_secs) OVER (PARTITION BY exporter_id, pkt_idx)
                 AS export_time,
               cast((rn - 1) % {MAX_RECORDS} AS int) AS rec_idx,
               cast(16 + CASE WHEN pkt_idx = 0 THEN {tmpl_set} ELSE 0 END
                    + 4 + (count(*) OVER (PARTITION BY exporter_id,
                                          pkt_idx))
                        * (CASE WHEN exporter_id % 2 = 0
                                THEN 37 ELSE 27 END) AS int) AS msg_bytes,
               src_ip, dst_ip, src_port, dst_port, prot,
               cast(pkts AS bigint) AS pkts,
               cast(octets AS bigint) AS octets,
               cast(start_ms AS bigint) AS start_ms
        FROM n"""
