"""XLSX and CSV round-trip operators, rendezvous sharding, k-core."""
from __future__ import annotations

import io
import zipfile

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------------- xlsx


def test_col_letters_bijective():
    from hatchery_spark.functions.xlsx import col_letters, letters_col

    for i in (0, 25, 26, 51, 701, 702, 18277):
        assert letters_col(col_letters(i)) == i
    assert col_letters(26) == "AA" and col_letters(702) == "AAA"
    with pytest.raises(ValueError):
        letters_col("A1")


def test_xlsx_cells_and_stdlib_zip():
    from hatchery_spark.functions.xlsx import build_xlsx, parse_xlsx

    rows = [["id", "name", "score"], [1, 'a & <b> "q"', 3.14159], [2, "c  ", -0.5]]
    kinds = [["i", "i", "i"], ["n", "s", "n"], ["n", "s", "n"]]
    blob = build_xlsx(rows, kinds)
    zf = zipfile.ZipFile(io.BytesIO(blob))
    assert zf.testzip() is None and "xl/worksheets/sheet1.xml" in zf.namelist()
    grid = {}
    for c in parse_xlsx(blob):
        grid.setdefault(c["row"], {})[c["col"]] = c
    assert grid[2][1]["s_val"] == 'a & <b> "q"'
    assert grid[3][1]["s_val"] == "c  "  # trailing spaces preserved
    assert grid[2][2]["n_val"] == 3.14159
    assert grid[1][0]["kind"] == "i" and grid[2][0]["kind"] == "n"


def test_xlsx_shared_string_dedup():
    from hatchery_spark.functions.xlsx import build_xlsx

    blob = build_xlsx([["x"], ["x"], ["x"]], ["s"])
    sheet = zipfile.ZipFile(io.BytesIO(blob)).read("xl/sharedStrings.xml")
    assert sheet.count(b"<si>") == 1  # one entry, three references


def test_xlsx_unsupported_cell_kind_and_type():
    from hatchery_spark.functions.ziparc import build_zip
    from hatchery_spark.functions.xlsx import build_xlsx, parse_xlsx

    with pytest.raises(ValueError):
        build_xlsx([[1.0]], ["b"])  # unknown kind at build time
    # unsupported cell TYPE at parse time (t="e", an error cell)
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    sheet = (
        f'<worksheet xmlns="{ns}"><sheetData><row r="1">'
        '<c r="A1" t="e"><v>#DIV/0!</v></c></row></sheetData></worksheet>'
    )
    blob = build_zip([("xl/worksheets/sheet1.xml", sheet.encode(), "store")])
    with pytest.raises(ValueError):
        parse_xlsx(blob)


def test_xlsx_roundtrip_spark(spark):
    from hatchery_spark.functions.xlsx import xlsx_roundtrip

    rows = [
        (i, i * 7, "OF"[i % 2], f"{i}-URGENT", i + 0.25) for i in range(37)
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_orderpriority string, o_totalprice double",
    )
    got = sorted(map(tuple, xlsx_roundtrip(df, workbooks=5).collect()))
    assert got == sorted(rows)


# -------------------------------------------------------------------- csv


def test_csv_roundtrip_adversarial_fields(spark):
    from hatchery_spark.functions.csvio import csv_roundtrip

    rows = [
        (0, 'plain', 'x'),
        (1, 'comma,inside', 'y'),
        (2, 'quote "q" inside', 'z'),
        (3, 'newline\ninside', 'w'),
        (4, 'crlf\r\ninside', 'v'),
        (5, '"leading and trailing"', 'u'),
        (6, '', 't'),
        (7, ',,",",""', 's'),
    ]
    df = spark.createDataFrame(rows, "id long, tricky string, plain string")
    df = df.select(F.col("id").cast("string").alias("id"), "tricky", "plain",
                   F.col("id").alias("ord"))
    out = csv_roundtrip(df, ["id", "tricky", "plain"],
                        F.pmod(F.col("ord"), F.lit(3)), "ord")
    got = {int(r["id_out"]): (r["tricky_out"], r["plain_out"])
           for r in out.collect()}
    assert got == {i: (t, p) for i, t, p in rows}


def test_csv_strict_arity_raises(spark):
    from hatchery_spark.functions.csvio import csv_parse_files

    files = spark.createDataFrame(
        [(0, "a,b\r\n1,2,3\r\n")], "file_id long, blob string"
    )
    with pytest.raises(Exception):
        csv_parse_files(files, 2).collect()


# -------------------------------------------------------------- rendezvous


def test_rendezvous_movement_minimal(spark):
    from hatchery_spark.operators.shards import rendezvous_reshard

    df = spark.range(2000).select(F.concat(F.lit("k"), F.col("id")).alias("key"))
    out = rendezvous_reshard(df, "key", 8, 9).collect()
    assert len(out) == 2000
    moved = sum(1 for r in out if r["moved"])
    # HRW moves ~1/9 of keys; a modulo map would move ~8/9
    assert moved / 2000 < 2 / 9
    # every moved key moves TO the new shard (HRW property for N -> N+1)
    for r in out:
        if r["moved"]:
            assert r["shard_after"] == 8
        assert 0 <= r["shard_before"] < 8 and 0 <= r["shard_after"] < 9


def test_rendezvous_balance(spark):
    from collections import Counter

    from hatchery_spark.operators.shards import rendezvous_reshard

    df = spark.range(4000).select(F.concat(F.lit("u"), F.col("id")).alias("key"))
    out = rendezvous_reshard(df, "key", 8, 9).collect()
    c = Counter(r["shard_before"] for r in out)
    assert len(c) == 8 and max(c.values()) < 2.0 * min(c.values())


def test_rendezvous_shard_validation(spark):
    from hatchery_spark.operators.shards import rendezvous_shard

    with pytest.raises(ValueError):
        rendezvous_shard(F.lit("x"), 0)


# ------------------------------------------------------------------ kcore


def test_kcore_hand_graph(spark):
    from hatchery_spark.functions.graph import kcore

    # triangle (0,1,2) + pendant chain 2-3-4: 2-core = the triangle only
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["degree"] for r in kcore(df, k=2).collect()}
    assert got == {0: 2, 1: 2, 2: 2}


def test_kcore_cascading_peel(spark):
    from hatchery_spark.functions.graph import kcore

    # path graph: 2-core empty, peeled one layer per round (multi-round)
    df = spark.createDataFrame([(i, i + 1) for i in range(12)], "src long, dst long")
    assert kcore(df, k=2).count() == 0


def test_kcore_k3_clique_survives(spark):
    from hatchery_spark.functions.graph import kcore

    from itertools import combinations

    clique = list(combinations(range(4), 2))  # K4: every degree 3
    extra = [(0, 10), (10, 11)]
    df = spark.createDataFrame(clique + extra, "src long, dst long")
    got = {r["node"]: r["degree"] for r in kcore(df, k=3).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


# ---------------------------------------------------------------- benford


def test_benford_powers_of_two_fit(spark):
    from hatchery_spark.operators.drift import BENFORD_P_SCALED, benford_deviation

    # 2^0..2^62 first digits follow Benford closely (equidistribution
    # of n*log10(2) mod 1); uniform 1..N does not
    rows = [(1 << i,) for i in range(63)]  # stay inside BIGINT
    df = spark.createDataFrame(rows, "v long").withColumn("g", F.lit("pow2"))
    out = benford_deviation(df, F.col("v"), "g").collect()
    assert len(out) == 9
    n = 63
    total_dev = sum(r["dev_scaled"] for r in out)
    # Σ|O/n − p_d| for 63 powers of two ≈ 0.18; uniform data is ~0.54
    assert total_dev / (n * 1_000_000_000) < 0.25
    # integer exactness: expected = n * p_d literally
    for r in out:
        assert r["expected_scaled"] == n * BENFORD_P_SCALED[r["digit"]]


def test_benford_uniform_deviates_more_than_pow2(spark):
    from hatchery_spark.operators.drift import benford_deviation

    uni = spark.range(1, 1001).select(F.col("id").alias("v")).withColumn(
        "g", F.lit("uni")
    )
    pow2 = spark.createDataFrame([(1 << i,) for i in range(63)], "v long"
                                 ).withColumn("g", F.lit("pow2"))
    out = benford_deviation(uni.unionAll(pow2), F.col("v"), "g").collect()
    dev = {}
    n = {"uni": 1000, "pow2": 63}
    for r in out:
        dev[r["g"]] = dev.get(r["g"], 0) + r["dev_scaled"] / (n[r["g"]] * 1e9)
    assert dev["uni"] > 1.5 * dev["pow2"]


def test_benford_zero_count_digits_present(spark):
    from hatchery_spark.operators.drift import benford_deviation

    df = spark.createDataFrame([(111,), (12,)], "v long").withColumn(
        "g", F.lit("x")
    )
    out = {r["digit"]: r["observed"] for r in
           benford_deviation(df, F.col("v"), "g").collect()}
    assert out == {1: 2, **{d: 0 for d in range(2, 10)}}


# ------------------------------------------------------------------- epub


def test_epub_strict_mimetype():
    import pytest as _pytest

    from hatchery_spark.functions.ziparc import (
        build_epub_bytes, build_zip, epub_extract,
    )

    blob = build_epub_bytes("b", ["ch1", "ch2"])
    title, n, txt = epub_extract(blob)
    assert (title, n, txt) == ("b", 2, "ch1\nch2")
    # mimetype deflated -> reject
    bad = build_zip([("mimetype", b"application/epub+zip", "deflate")])
    with _pytest.raises(ValueError):
        epub_extract(bad)
    # mimetype not first -> reject
    bad2 = build_zip([("a", b"x", "store"),
                      ("mimetype", b"application/epub+zip", "store")])
    with _pytest.raises(ValueError):
        epub_extract(bad2)
