r"""WebDataset-style tar shards: pack documents into POSIX ustar tar
archives as ``<key>.txt`` / ``<key>.json`` member pairs (the standard
large-scale training-corpus shard layout popularized by the public
WebDataset convention) and read them back by grouping members on the
basename key — the corpus-ingestion format a multimodal training
pipeline reads by the million.

ustar framing implemented from the public POSIX.1-1988/pax header
layout: 512-byte headers (name[100] mode[8] uid[8] gid[8] size[12]
mtime[12] chksum[8] typeflag[1] linkname[100] magic "ustar\0" "00"
uname[32] gname[32] devmajor[8] devminor[8] prefix[155]), octal
NUL-terminated numeric fields, the checksum-computed-with-spaces rule,
512-byte data padding, and the two-zero-block terminator. `tarfile` in
the stdlib could write these — building it from the spec keeps the
byte layout pinned by OUR tests and makes the reader's strictness
(checksum verify, magic check, size bounds) explicit; a pytest
cross-checks both directions against the stdlib anyway (real
third-party interop).

Shard assignment is doc_id % n_shards, members ordered by doc_id, keys
zero-padded to 9 digits (the WebDataset sort convention), mtime pinned
to a fixed epoch so shards are byte-deterministic. The .json member
carries {"doc_id":N,"lang":"..","source":".."} rendered by string
concatenation so the oracle replays its exact bytes via length
arithmetic if ever needed — the catalog query pins the PARSED fields.

Scale shape: ONE shard_id grouping exchange on the write side (shards
are doc_id-striped and bounded); read = shuffle-free mapInPandas, one
sequential block walk per shard.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOCK = 512
MTIME = 1_700_000_000  # fixed → byte-deterministic shards
N_SHARDS = 16


def _octal(n: int, width: int) -> bytes:
    return f"{n:0{width - 1}o}".encode() + b"\x00"


def _header(name: str, size: int) -> bytes:
    h = bytearray(BLOCK)
    nb = name.encode()
    if len(nb) > 100:
        raise ValueError("tar: name too long")
    h[0:len(nb)] = nb
    h[100:108] = _octal(0o644, 8)
    h[108:116] = _octal(0, 8)
    h[116:124] = _octal(0, 8)
    h[124:136] = _octal(size, 12)
    h[136:148] = _octal(MTIME, 12)
    h[148:156] = b" " * 8                      # checksum spaces rule
    h[156] = ord("0")                          # regular file
    h[257:263] = b"ustar\x00"
    h[263:265] = b"00"
    h[265:269] = b"data"                       # uname
    h[297:301] = b"data"                       # gname
    chk = sum(h)
    h[148:155] = f"{chk:06o}".encode() + b"\x00"
    h[155] = ord(" ")
    return bytes(h)


def write_tar(members: list[tuple[str, bytes]]) -> bytes:
    out = bytearray()
    for name, data in members:
        out += _header(name, len(data))
        out += data
        if len(data) % BLOCK:
            out += b"\x00" * (BLOCK - len(data) % BLOCK)
    out += b"\x00" * (2 * BLOCK)
    return bytes(out)


def read_tar(buf: bytes) -> list[tuple[str, bytes]]:
    out, pos = [], 0
    while pos + BLOCK <= len(buf):
        h = buf[pos:pos + BLOCK]
        if h == b"\x00" * BLOCK:
            break
        if h[257:263] != b"ustar\x00":
            raise ValueError("tar: bad magic")
        stored = int(h[148:155].rstrip(b" \x00"), 8)
        calc = sum(h[:148]) + 8 * 0x20 + sum(h[156:])
        if stored != calc:
            raise ValueError("tar: header checksum mismatch")
        name = h[:100].rstrip(b"\x00").decode()
        size = int(h[124:136].rstrip(b" \x00"), 8)
        pos += BLOCK
        if pos + size > len(buf):
            raise ValueError("tar: truncated member")
        out.append((name, buf[pos:pos + size]))
        pos += size + (-size % BLOCK)
    return out


# ---------------------------------------------------------------------------
# DataFrame surface
# ---------------------------------------------------------------------------


def write_webdataset(docs: DataFrame, n_shards: int = N_SHARDS) -> DataFrame:
    """documents → (shard_id, shard binary): <key>.txt + <key>.json per
    doc, keys 0-padded doc_ids, members in doc_id order."""
    prepared = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "text", "lang", "source",
        F.pmod("doc_id", F.lit(n_shards)).cast("int").alias("shard_id"),
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        members = []
        for r in pdf.itertuples():
            key = f"{int(r.doc_id):09d}"
            meta = (f'{{"doc_id":{int(r.doc_id)},"lang":"{r.lang}",'
                    f'"source":"{r.source}"}}')
            members.append((f"{key}.txt", r.text.encode()))
            members.append((f"{key}.json", meta.encode()))
        return pd.DataFrame({
            "shard_id": [int(pdf["shard_id"].iloc[0])],
            "shard": [write_tar(members)],
        })

    return prepared.groupBy("shard_id").applyInPandas(
        _pack, "shard_id int, shard binary"
    )


def read_webdataset(df: DataFrame, shard_col: str = "shard") -> DataFrame:
    """shards → one row per sample key, .txt and .json members joined
    on the basename (a sample missing either member is an error — the
    WebDataset contract)."""

    def _unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sid, raw in zip(pdf["shard_id"], pdf[shard_col]):
                samples: dict[str, dict] = {}
                for name, data in read_tar(bytes(raw)):
                    key, ext = name.rsplit(".", 1)
                    samples.setdefault(key, {})[ext] = data
                for key, parts in samples.items():
                    if set(parts) != {"txt", "json"}:
                        raise ValueError(f"tar: incomplete sample {key}")
                    meta = json.loads(parts["json"])
                    rows.append({
                        "shard_id": int(sid), "key": key,
                        "doc_id": meta["doc_id"],
                        "text": parts["txt"].decode(),
                        "lang": meta["lang"], "source": meta["source"],
                    })
            yield pd.DataFrame(
                rows, columns=["shard_id", "key", "doc_id", "text",
                               "lang", "source"],
            )

    return df.mapInPandas(
        _unpack,
        "shard_id int, key string, doc_id bigint, text string, "
        "lang string, source string",
    )


def webdataset_oracle_sql(docs_table: str = "documents",
                          n_shards: int = N_SHARDS) -> str:
    """DuckDB replay: shard stripe, zero-padded keys, and every sample
    field straight from the documents table."""
    return f"""
        SELECT cast(doc_id % {n_shards} AS int) AS shard_id,
               lpad(cast(doc_id AS varchar), 9, '0') AS key,
               doc_id, text, lang, source
        FROM {docs_table}"""
