"""Footer parser vs DuckDB's independent parquet_metadata implementation."""

import glob
import io

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hatchery_spark.functions.parquet_meta import (
    footer_summary,
    read_footer,
)


def _duck_rows(path):
    return duckdb.sql(
        "SELECT row_group_id, path_in_schema, num_values,"
        " stats_min_value, stats_max_value, compression, stats_null_count"
        f" FROM parquet_metadata('{path}') ORDER BY row_group_id, column_id"
    ).fetchall()


@pytest.mark.parametrize(
    "path", sorted(glob.glob("/root/testdata/sf0.001/*.parquet"))
)
def test_matches_duckdb_on_real_files(path):
    mine = footer_summary(open(path, "rb").read())
    duck = _duck_rows(path)
    assert len(mine) == len(duck)
    for m, d in zip(mine, duck):
        rg, col, nv, mn, mx, codec, nulls = d
        col = col.replace(", ", ".")  # duckdb renders nested paths with ', '
        assert (m["rg_idx"], m["column"], m["num_values"]) == (rg, col, nv)
        assert m["codec"] == codec
        if m["ptype"] in ("INT32", "INT64", "BYTE_ARRAY"):
            assert m["stat_min"] == (None if mn is None else str(mn))
            assert m["stat_max"] == (None if mx is None else str(mx))
        elif m["ptype"] in ("FLOAT", "DOUBLE") and mn is not None:
            assert abs(float(m["stat_min"]) - float(mn)) < 1e-6
            assert abs(float(m["stat_max"]) - float(mx)) < 1e-6
        if nulls is not None:
            assert m["null_count"] == nulls


def test_multi_row_group_and_nulls():
    tbl = pa.table(
        {
            "a": pa.array([3, 1, None, 7, 5, None], type=pa.int64()),
            "s": pa.array(["x", None, "m", "zz", "aa", "q"]),
        }
    )
    bio = io.BytesIO()
    pq.write_table(tbl, bio, row_group_size=2, compression="zstd")
    rows = footer_summary(bio.getvalue())
    assert {r["rg_idx"] for r in rows} == {0, 1, 2}
    assert all(r["codec"] == "ZSTD" for r in rows)
    a0 = next(r for r in rows if r["rg_idx"] == 0 and r["column"] == "a")
    assert (a0["stat_min"], a0["stat_max"], a0["null_count"]) == ("1", "3", 0)
    a1 = next(r for r in rows if r["rg_idx"] == 1 and r["column"] == "a")
    assert a1["null_count"] == 1 and a1["stat_min"] == "7"


def test_rejects_non_parquet():
    with pytest.raises(ValueError):
        read_footer(b"PAR1not really a parquet file tail")
    with pytest.raises(ValueError):
        read_footer(b"\x00" * 32)


def test_footer_len_overrun_rejected():
    # valid magic but a footer length pointing past the file start
    buf = b"PAR1" + b"\x00" * 8 + (10_000).to_bytes(4, "little") + b"PAR1"
    with pytest.raises(ValueError):
        read_footer(buf)
