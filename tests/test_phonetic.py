"""Soundex: published vectors on BOTH engines, edge cases, blocking."""

import duckdb
from pyspark.sql import functions as F

from hatchery_spark.functions.phonetic import (
    KNOWN_VECTORS,
    soundex_col,
    soundex_sql,
)


def test_known_vectors_spark(spark):
    df = spark.createDataFrame([(n,) for n, _ in KNOWN_VECTORS], "name string")
    got = {
        r.name: r.sx
        for r in df.select("name", soundex_col(F.col("name")).alias("sx")).collect()
    }
    for name, want in KNOWN_VECTORS:
        assert got[name] == want, (name, got[name], want)


def test_known_vectors_duckdb_same_chain():
    expr = soundex_sql("name")
    vals = ", ".join(f"('{n}')" for n, _ in KNOWN_VECTORS)
    rows = duckdb.sql(
        f"SELECT name, {expr} AS sx FROM (VALUES {vals}) t(name)"
    ).fetchall()
    for (name, got), (_, want) in zip(rows, KNOWN_VECTORS):
        assert got == want, (name, got, want)


def test_edge_cases_spark(spark):
    cases = [
        ("", ""),            # empty
        ("123", ""),         # no letters
        ("A", "A000"),       # single letter pads
        ("O'Brien", "O165"), # punctuation stripped
        ("aaa", "A000"),     # all vowels
        ("Hwhw", "H000"),    # h/w soup
    ]
    df = spark.createDataFrame([(n,) for n, _ in cases], "name string")
    got = {
        r.name: r.sx
        for r in df.select("name", soundex_col(F.col("name")).alias("sx")).collect()
    }
    for name, want in cases:
        assert got[name] == want, (name, got[name], want)


def test_collision_blocking(spark):
    names = ["Robert", "Rupert", "Smith", "Smyth", "Ashcraft", "Ashcroft"]
    df = spark.createDataFrame([(n,) for n in names], "name string")
    keyed = df.select("name", soundex_col(F.col("name")).alias("sx"))
    blocks = {
        r.sx: r.n
        for r in keyed.groupBy("sx").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert blocks == {"R163": 2, "S530": 2, "A261": 2}
