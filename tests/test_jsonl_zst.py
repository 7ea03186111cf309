""".jsonl.zst source/sink + RFC 8878 frame-header parsing."""

from __future__ import annotations

import json
import struct

import pyarrow as pa
import pytest

from hatchery_spark.functions.jsonl_zst import (
    read_jsonl_zst_blobs,
    write_jsonl_zst_files,
    zstd_frame_content_size,
)


@pytest.mark.parametrize("n", [0, 1, 255, 256, 300, 70000, 1 << 20])
def test_frame_content_size_all_fcs_widths(n):
    """pyarrow emits real frames; our header parse must agree with the
    actual decompressed size across every FCS field width."""
    data = b"a" * n
    frame = bytes(pa.Codec("zstd").compress(data))
    assert zstd_frame_content_size(frame) == n


def test_frame_parse_rejects_garbage():
    with pytest.raises(ValueError):
        zstd_frame_content_size(b"\x00\x01\x02\x03\x04\x05")


def test_frame_parse_skips_window_and_dict_fields():
    # hand-built header: magic, descriptor FCS=2(4 bytes) no single-segment,
    # window byte, then the 4-byte size
    hdr = struct.pack("<I", 0xFD2FB528) + bytes([0x80, 0x00]) + struct.pack("<I", 12345)
    assert zstd_frame_content_size(hdr + b"x") == 12345


def test_roundtrip_unicode_and_escapes(spark):
    rows = [
        (0, "en", 'quotes " and \\ backslash\nand newline'),
        (1, "fr", "café — ünïcödé ✓ 中文"),
        (2, "en", ""),
        (3, None, "null lang"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    back = read_jsonl_zst_blobs(
        write_jsonl_zst_files(df, files=2),
        "doc_id long, lang string, text string",
    )
    got = {r.doc_id: r for r in back.collect()}
    assert len(got) == 4
    for i, lang, text in rows:
        assert got[i].lang == lang and got[i].text == text


def test_files_are_standard_zstd(spark):
    """Any zstd tool must be able to read our output: decompress with the
    generic codec and parse lines independently."""
    df = spark.createDataFrame([(i, f"t{i}") for i in range(10)],
                               "doc_id long, text string")
    blobs = {r.file_id: bytes(r.content)
             for r in write_jsonl_zst_files(df, files=2).collect()}
    seen = []
    for b in blobs.values():
        raw = bytes(pa.Codec("zstd").decompress(b, zstd_frame_content_size(b)))
        for ln in raw.decode().strip().split("\n"):
            seen.append(json.loads(ln))
    assert sorted(r["doc_id"] for r in seen) == list(range(10))
