"""WARC (ISO 28500 / WARC/1.0) record framing: the container format of
Common Crawl and every web-archive corpus — the first stage of a real
pretraining pipeline is splitting multi-gigabyte WARC files into records.

Two halves, both distributed:

* ``build_warc_files`` — deterministic encoder: documents → one WARC blob
  per file group (applyInPandas over the group key; ONE shuffle on
  file_id). Exists so the parser can be exercised hermetically — the
  sandbox has no real crawl data.
* ``parse_warc`` — the operator under test: a byte-exact record splitter
  (version line, CRLF headers, Content-Length-driven payload slice,
  4-byte record separator) as mapInPandas over binary blobs — zero
  shuffle, O(file bytes) per task, the standard CC processing shape where
  each task owns whole archive files and memory is bounded by one file.

At 100 TB the encoder half disappears (files come from object storage via
binaryFile/stream source) and ``parse_warc`` is the scan-adjacent map.

Reference analog: hatchery's source decode stage (source/parse.go:21) —
container bytes → records before any transform runs.
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WARC_DATE = "2025-01-01T00:00:00Z"
_SEP = b"\r\n\r\n"


def encode_warc_record(doc_id: int, payload: bytes) -> bytes:
    """One WARC/1.0 response record with the standard header set."""
    uri = f"https://example.com/doc/{doc_id}"
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:doc:{doc_id}>\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: {WARC_DATE}\r\n"
        "Content-Type: text/plain\r\n"
        f"Content-Length: {len(payload)}\r\n"
        "\r\n"
    )
    return head.encode("ascii") + payload + _SEP


def build_warc_files(
    docs: DataFrame,
    files: int = 25,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """documents → (file_id, content) WARC blobs, ``doc_id % files`` groups,
    records in doc_id order within each file. Deterministic at any
    parallelism: group membership and in-file order are data-derived."""
    recs = docs.select(
        F.pmod(F.col(id_col), F.lit(files)).alias("file_id"),
        F.col(id_col).alias("_rid"),
        F.coalesce(F.col(text_col), F.lit("")).alias("_payload"),
    )

    def _encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_rid")
        blob = b"".join(
            encode_warc_record(int(rid), payload.encode("utf-8"))
            for rid, payload in zip(pdf["_rid"], pdf["_payload"])
        )
        return pd.DataFrame({"file_id": [int(pdf.file_id.iloc[0])], "content": [blob]})

    return recs.groupBy("file_id").applyInPandas(
        _encode, "file_id bigint, content binary"
    )


def split_warc_records(buf: bytes) -> list[tuple]:
    """Byte-exact record scan of one WARC file: (rec_idx, rec_offset,
    warc_type, target_uri, content_length, payload_bytes). Content-Length
    drives the payload slice, so payloads containing 'WARC/1.0' or CRLF
    runs cannot desynchronize the scan."""
    out, pos, idx = [], 0, 0
    n = len(buf)
    while pos < n:
        start = pos
        hdr_end = buf.index(_SEP, pos)
        lines = buf[pos:hdr_end].decode("utf-8").split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"bad WARC version line at offset {start}: {lines[0]!r}")
        hdrs = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            hdrs[k.strip().lower()] = v.strip()
        clen = int(hdrs["content-length"])
        payload = buf[hdr_end + 4 : hdr_end + 4 + clen]
        if len(payload) != clen:
            raise ValueError(f"truncated payload at offset {start}")
        if buf[hdr_end + 4 + clen : hdr_end + 4 + clen + 4] != _SEP:
            raise ValueError(f"missing record separator at offset {start}")
        out.append(
            (
                idx,
                start,
                hdrs.get("warc-type", ""),
                hdrs.get("warc-target-uri", ""),
                clen,
                payload,
            )
        )
        pos = hdr_end + 4 + clen + 4
        idx += 1
    return out


def parse_warc(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Split WARC blobs into records: one output row per record with its
    byte offset, headers, and payload md5 (the md5 proves the slice is
    byte-exact — any off-by-one mismatches the oracle's md5(text))."""

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fid, buf in zip(pdf["file_id"], pdf[content_col]):
                for idx, off, wtype, uri, clen, payload in split_warc_records(
                    bytes(buf)
                ):
                    rows.append(
                        (
                            int(fid),
                            idx,
                            off,
                            wtype,
                            uri,
                            clen,
                            hashlib.md5(payload).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "file_id",
                    "rec_idx",
                    "rec_offset",
                    "warc_type",
                    "target_uri",
                    "content_length",
                    "payload_md5",
                ],
            )

    return df.mapInPandas(
        _parse,
        "file_id bigint, rec_idx int, rec_offset bigint, warc_type string, "
        "target_uri string, content_length bigint, payload_md5 string",
    )


# ---------------------------------------------------------------------------
# .warc.gz — the member-per-record gzip framing Common Crawl actually ships.
# Each WARC record is compressed as its OWN gzip member and the members are
# concatenated, so a reader can seek to any member boundary and decompress
# one record without touching the rest of the file. Splitting a .warc.gz
# therefore happens at the COMPRESSED layer (gzip magic + member lengths),
# not by scanning decompressed bytes.
# Reference analog: hatchery's gzip source decode (source/parse.go:21) —
# container bytes → records before any transform runs.
# ---------------------------------------------------------------------------


def gzip_member(data: bytes) -> bytes:
    """One deterministic gzip member (level 9, zero mtime — zlib never
    writes a timestamp, so encode output is byte-stable across runs)."""
    co = zlib.compressobj(9, zlib.DEFLATED, 31)
    return co.compress(data) + co.flush()


def build_warc_gz_files(
    docs: DataFrame,
    files: int = 25,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """documents → (file_id, content) .warc.gz blobs: every record its own
    gzip member, members concatenated in doc_id order. Same grouping and
    determinism contract as ``build_warc_files``."""
    recs = docs.select(
        F.pmod(F.col(id_col), F.lit(files)).alias("file_id"),
        F.col(id_col).alias("_rid"),
        F.coalesce(F.col(text_col), F.lit("")).alias("_payload"),
    )

    def _encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_rid")
        blob = b"".join(
            gzip_member(encode_warc_record(int(rid), payload.encode("utf-8")))
            for rid, payload in zip(pdf["_rid"], pdf["_payload"])
        )
        return pd.DataFrame({"file_id": [int(pdf.file_id.iloc[0])], "content": [blob]})

    return recs.groupBy("file_id").applyInPandas(
        _encode, "file_id bigint, content binary"
    )


def split_gzip_members(buf: bytes) -> list[tuple]:
    """Scan concatenated gzip members: (member_idx, compressed_offset,
    compressed_len, decompressed_bytes). Linear in file size — each byte is
    fed to zlib exactly once; member boundaries come from the DEFLATE
    stream end (``decompressobj.eof``), never from searching for magic
    bytes (which can occur inside compressed data)."""
    out: list[tuple] = []
    idx, pos, n = 0, 0, len(buf)
    while pos < n:
        if buf[pos : pos + 2] != b"\x1f\x8b":
            raise ValueError(f"bad gzip magic at offset {pos}")
        do = zlib.decompressobj(31)
        produced = []
        p = pos
        while not do.eof:
            if p >= n:
                raise ValueError(f"truncated gzip member at offset {pos}")
            chunk = buf[p : p + 65536]
            produced.append(do.decompress(chunk))
            p += len(chunk)
        consumed = p - pos - len(do.unused_data)
        out.append((idx, pos, consumed, b"".join(produced)))
        pos += consumed
        idx += 1
    return out


def parse_warc_gz(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Split .warc.gz blobs: gzip-member scan, then the byte-exact WARC
    record split inside each member. ``record_md5`` hashes the FULL
    decompressed member (headers + payload + separator), so a member
    boundary off by even one byte value-mismatches; ``payload_md5`` pins
    the inner Content-Length slice. One mapInPandas pass, zero shuffle,
    memory bounded by one decompressed record at a time."""

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fid, buf in zip(pdf["file_id"], pdf[content_col]):
                for midx, _off, _clen, member in split_gzip_members(bytes(buf)):
                    for (_ridx, _roff, wtype, uri, clen, payload) in (
                        split_warc_records(member)
                    ):
                        rows.append(
                            (
                                int(fid),
                                midx,
                                wtype,
                                uri,
                                clen,
                                hashlib.md5(member).hexdigest(),
                                hashlib.md5(payload).hexdigest(),
                            )
                        )
            yield pd.DataFrame(
                rows,
                columns=[
                    "file_id",
                    "member_idx",
                    "warc_type",
                    "target_uri",
                    "content_length",
                    "record_md5",
                    "payload_md5",
                ],
            )

    return df.mapInPandas(
        _parse,
        "file_id bigint, member_idx int, warc_type string, "
        "target_uri string, content_length bigint, record_md5 string, "
        "payload_md5 string",
    )


def cdx_index(df: DataFrame, content_col: str = "content") -> DataFrame:
    """CDX-style capture index over WARC blobs — the lookup artifact a crawl
    archive publishes next to its WARC files (urlkey in SURT form, 14-digit
    timestamp, byte offset + record length + filename for random access,
    payload digest for dedup).

    The byte scan (offset, record length, digest, per-record headers) runs
    in one mapInPandas pass per file; urlkey/timestamp/filename derivation
    is pure codegen string expressions on the scan output, so Catalyst owns
    everything after the container split. One pass, no shuffle.
    """
    import hashlib as _hashlib

    def _scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fid, buf in zip(pdf["file_id"], pdf[content_col]):
                b = bytes(buf)
                recs = split_warc_records(b)
                for i, (idx, off, wtype, uri, clen, payload) in enumerate(recs):
                    end = recs[i + 1][1] if i + 1 < len(recs) else len(b)
                    hdr_end = b.index(_SEP, off)
                    date = ""
                    ctype = ""
                    for ln in b[off:hdr_end].decode("utf-8").split("\r\n")[1:]:
                        k, _, v = ln.partition(":")
                        k = k.strip().lower()
                        if k == "warc-date":
                            date = v.strip()
                        elif k == "content-type":
                            ctype = v.strip()
                    rows.append(
                        (
                            int(fid),
                            uri,
                            date,
                            ctype,
                            _hashlib.md5(payload).hexdigest(),
                            off,
                            end - off,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "file_id",
                    "target_uri",
                    "warc_date",
                    "mime",
                    "digest",
                    "rec_offset",
                    "rec_len",
                ],
            )

    scanned = df.mapInPandas(
        _scan,
        "file_id bigint, target_uri string, warc_date string, mime string, "
        "digest string, rec_offset bigint, rec_len bigint",
    )
    host = F.regexp_extract("target_uri", r"^[a-z]+://([^/]+)", 1)
    path = F.regexp_extract("target_uri", r"^[a-z]+://[^/]+(/.*)?$", 1)
    return scanned.select(
        F.concat(
            F.array_join(F.reverse(F.split(F.lower(host), r"\.")), ","),
            F.lit(")"),
            F.lower(path),
        ).alias("urlkey"),
        F.translate("warc_date", "-:TZ", "").alias("timestamp"),
        "target_uri",
        "mime",
        "digest",
        "rec_offset",
        "rec_len",
        F.concat(F.lit("crawl-"), F.col("file_id").cast("string"), F.lit(".warc")).alias(
            "filename"
        ),
    )
