"""Avro OCF codec (spec-pinned) + distributed roundtrip."""

from __future__ import annotations

import io

import pytest

from hatchery_spark.functions.avro import (
    parse_ocf,
    read_avro_blobs,
    read_long,
    write_avro_files,
    write_long,
    write_ocf,
)

SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "props", "type": {"type": "map", "values": "int"}},
        {"name": "flag", "type": "boolean"},
        {"name": "blob", "type": "bytes"},
        {
            "name": "grade",
            "type": {"type": "enum", "name": "g", "symbols": ["A", "B"]},
        },
    ],
}

RECORDS = [
    {
        "id": -12345678901,
        "name": "héllo",
        "score": 3.5,
        "tags": ["a", "b"],
        "props": {"x": 1, "y": -2},
        "flag": True,
        "blob": b"\x00\xff",
        "grade": "B",
    },
    {
        "id": 0,
        "name": None,
        "score": -0.0,
        "tags": [],
        "props": {},
        "flag": False,
        "blob": b"",
        "grade": "A",
    },
]


def test_zigzag_varint_spec_vectors():
    """The exact byte sequences from the Avro spec's Binary Encoding table."""
    for n, expect in [
        (0, b"\x00"), (-1, b"\x01"), (1, b"\x02"), (-2, b"\x03"),
        (2, b"\x04"), (-64, b"\x7f"), (64, b"\x80\x01"), (-65, b"\x81\x01"),
    ]:
        out = io.BytesIO()
        write_long(out, n)
        assert out.getvalue() == expect, n
        v, p = read_long(expect, 0)
        assert (v, p) == (n, len(expect))


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_ocf_roundtrip_multi_block(codec):
    recs = RECORDS * 700
    buf = write_ocf(SCHEMA, recs, codec=codec, records_per_block=100)
    schema, back = parse_ocf(buf)
    assert schema == SCHEMA
    assert back == recs


def test_ocf_rejects_bad_magic_and_sync():
    buf = write_ocf(SCHEMA, RECORDS)
    with pytest.raises(ValueError):
        parse_ocf(b"XXXX" + buf[4:])
    # corrupt the final sync marker
    with pytest.raises(ValueError):
        parse_ocf(buf[:-1] + bytes([buf[-1] ^ 0xFF]))


def test_union_null_branch_encoding():
    buf = write_ocf(SCHEMA, [RECORDS[1]])
    _, back = parse_ocf(buf)
    assert back[0]["name"] is None


def test_distributed_roundtrip_with_nulls_and_timestamps(spark):
    from pyspark.sql import functions as F

    df = (
        spark.range(200)
        .select(
            F.col("id").cast("long").alias("k"),
            F.when(F.col("id") % 3 == 0, F.col("id").cast("string")).alias("s"),
            (F.col("id") * 1.5).alias("x"),
            F.to_timestamp(F.lit("2025-06-01 12:34:56")).alias("ts"),
        )
    )
    ddl = "k bigint, s string, x double, ts timestamp"
    back = read_avro_blobs(write_avro_files(df, files=4, order_col="k"), ddl)
    got = sorted(back.collect(), key=lambda r: r.k)
    assert len(got) == 200
    assert got[3].s == "3" and got[4].s is None
    assert got[7].x == 10.5
    assert str(got[0].ts) == "2025-06-01 12:34:56"


def test_reader_rejects_schema_mismatch(spark):
    from pyspark.sql import functions as F

    df = spark.range(5).select(F.col("id").alias("a"))
    blobs = write_avro_files(df, files=1)
    with pytest.raises(Exception):
        read_avro_blobs(blobs, "wrong bigint").collect()


def test_schema_resolution_rules():
    """Spec §Schema Resolution: skip writer-only, defaults, aliases,
    promotions (scalar and nested), union re-resolution."""
    from hatchery_spark.functions.avro import parse_ocf_resolved, write_ocf

    writer = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "doc_id", "type": "int"},
            {"name": "text", "type": "string"},
            {"name": "n_chars", "type": ["null", "long"]},
            {"name": "tags", "type": {"type": "array", "items": "int"}},
        ],
    }
    recs = [
        {"doc_id": 1, "text": "hi", "n_chars": 2, "tags": [1, 2]},
        {"doc_id": 2, "text": "yo", "n_chars": None, "tags": []},
    ]
    reader = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "doc_id", "type": "long"},  # int → long
            {
                "name": "chars",
                "aliases": ["n_chars"],
                "type": ["null", "double"],  # alias + long → double
            },
            {"name": "score", "type": "double", "default": 1.5},
            {"name": "tags", "type": {"type": "array", "items": "double"}},
        ],
    }
    for codec in ("null", "deflate"):
        out = parse_ocf_resolved(write_ocf(writer, recs, codec=codec), reader)
        assert out == [
            {"doc_id": 1, "chars": 2.0, "score": 1.5, "tags": [1.0, 2.0]},
            {"doc_id": 2, "chars": None, "score": 1.5, "tags": []},
        ]


def test_schema_resolution_errors():
    import pytest as _pytest

    from hatchery_spark.functions.avro import parse_ocf_resolved, write_ocf

    writer = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "a", "type": "string"}],
    }
    buf = write_ocf(writer, [{"a": "x"}])
    # missing reader field with NO default → hard error, not silent null
    bad = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "a", "type": "string"},
            {"name": "b", "type": "long"},
        ],
    }
    with _pytest.raises(ValueError, match="no default"):
        parse_ocf_resolved(buf, bad)
    # illegal demotion string → long
    demote = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "a", "type": "long"}],
    }
    with _pytest.raises(ValueError, match="cannot resolve"):
        parse_ocf_resolved(buf, demote)
