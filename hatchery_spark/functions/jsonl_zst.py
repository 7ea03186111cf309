""".jsonl.zst source/sink — the de-facto LLM corpus distribution format
(RedPajama, DCLM, The Pile ship exactly this: one JSON object per line,
whole file a single zstandard frame).

The sandbox's Hadoop has no native zstd codec, so the engine carries its
own path: files are written as STANDARD zstd frames (pyarrow's bundled
zstd, content size embedded) and read back by parsing the RFC 8878 frame
header for Frame_Content_Size — no sidecar metadata, any zstd tool can
read our files and we can read theirs (when the frame embeds its size, as
every file-at-once compressor does).

Split of labor: binary framing + decompression + line splitting run in
mapInPandas (bounded by file size per task); JSON parsing is handed to
Catalyst's ``from_json`` so schema pruning/codegen own the hot part.
"""

from __future__ import annotations

import json
import struct
from typing import Iterator

import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ZSTD_MAGIC = 0xFD2FB528


def zstd_frame_content_size(buf: bytes) -> int:
    """Frame_Content_Size from a zstd frame header (RFC 8878 §3.1.1).
    Raises if the frame does not declare its size (streaming producers) —
    the honest unsupported channel, not a guess."""
    if len(buf) < 5 or struct.unpack("<I", buf[:4])[0] != ZSTD_MAGIC:
        raise ValueError("not a zstd frame (bad magic)")
    desc = buf[4]
    fcs_flag = desc >> 6
    single_segment = (desc >> 5) & 1
    dict_flag = desc & 3
    pos = 5
    if not single_segment:
        pos += 1  # window descriptor
    pos += (0, 1, 2, 4)[dict_flag]
    if fcs_flag == 0:
        if not single_segment:
            raise ValueError("frame does not declare its content size")
        return buf[pos]
    if fcs_flag == 1:
        return struct.unpack("<H", buf[pos : pos + 2])[0] + 256
    if fcs_flag == 2:
        return struct.unpack("<I", buf[pos : pos + 4])[0]
    return struct.unpack("<Q", buf[pos : pos + 8])[0]


def write_jsonl_zst_files(
    df: DataFrame,
    files: int = 8,
    id_col: str = "doc_id",
    level: int = 3,
) -> DataFrame:
    """df → (file_id, content) single-frame .jsonl.zst blobs; membership
    (id % files) and in-file order (ascending id) are data-derived, so the
    bytes are deterministic at any parallelism."""
    cols = df.columns
    recs = df.withColumn("file_id", F.pmod(F.col(id_col), F.lit(files)))

    def _encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        lines = []
        for row in pdf[cols].itertuples(index=False, name=None):
            obj = {
                c: (None if pd.isna(v) else v) for c, v in zip(cols, row)
            }
            lines.append(json.dumps(obj, ensure_ascii=False, sort_keys=True))
        raw = ("\n".join(lines) + "\n").encode("utf-8")
        comp = bytes(pa.Codec("zstd", compression_level=level).compress(raw))
        return pd.DataFrame(
            {"file_id": [int(pdf.file_id.iloc[0])], "content": [comp]}
        )

    return recs.groupBy("file_id").applyInPandas(
        _encode, "file_id bigint, content binary"
    )


def read_jsonl_zst_blobs(df: DataFrame, spark_ddl: str) -> DataFrame:
    """(file_id, content) zstd blobs → parsed rows. Decompression + line
    split in Python, JSON field extraction in Catalyst (from_json)."""

    def _lines(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for buf in pdf["content"]:
                b = bytes(buf)
                size = zstd_frame_content_size(b)
                raw = bytes(pa.Codec("zstd").decompress(b, size)).decode("utf-8")
                out.extend(ln for ln in raw.split("\n") if ln)
            yield pd.DataFrame({"line": out})

    lines = df.mapInPandas(_lines, "line string")
    parsed = lines.select(F.from_json("line", spark_ddl).alias("r"))
    return parsed.select("r.*")
