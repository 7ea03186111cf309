"""Z-order (Morton) clustering: closed-form key + the file-skipping property
it exists for, asserted from the written parquet files' real footer stats."""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from hatchery_spark.sinks import write_zordered, zorder_values


def _morton(cells, bits):
    z = 0
    k = len(cells)
    for j, c in enumerate(cells):
        for i in range(bits):
            z |= ((c >> i) & 1) << (i * k + j)
    return z


def test_zorder_closed_form_matches_manual_morton(spark):
    # 4x4 integer grid with bits=2: the uniform-grid cells ARE the
    # coordinates (floor((v-0)*4/3) with the max clamped into cell 3)
    rows = [
        (x * 4 + y, float(x), float(y)) for x in range(4) for y in range(4)
    ]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    got = {r.id: r._zvalue for r in zorder_values(df, ["x", "y"], bits=2).collect()}
    for rid, x, y in rows:
        assert got[rid] == _morton((int(x), int(y)), 2), (x, y)


def test_zorder_degenerate_and_null_columns(spark):
    df = spark.createDataFrame(
        [(0, 1.0, 5.0), (1, 2.0, 5.0), (2, None, 5.0)],
        "id long, x double, c double",
    )
    out = {r.id: r._zvalue for r in zorder_values(df, ["x", "c"], bits=4).collect()}
    # constant column -> cell 0 everywhere: z reduces to the x interleave
    assert out[0] == 0 and out[1] > 0
    # NULL input propagates to a NULL key (caller sorts/filters explicitly)
    assert out[2] is None


def _files_overlapping(path, col_idx, lo, hi):
    """Count files whose FOOTER min/max for the column intersect [lo, hi] —
    the exact planning-time stats a scan uses to skip files."""
    n_total, n_hit = 0, 0
    for fp in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(fp).metadata
        if md.num_rows == 0:
            continue
        n_total += 1
        mn = min(
            md.row_group(g).column(col_idx).statistics.min
            for g in range(md.num_row_groups)
        )
        mx = max(
            md.row_group(g).column(col_idx).statistics.max
            for g in range(md.num_row_groups)
        )
        if mn <= hi and mx >= lo:
            n_hit += 1
    return n_hit, n_total


def test_zorder_layout_skips_files_on_every_dimension(spark, tmp_path):
    # 32x32 point grid. Z-ordered into 16 files vs the classic single-column
    # sort layout: a band predicate on the NON-leading dimension must prune
    # most z-ordered files and NO x-sorted files.
    rows = [
        (x * 32 + y, float(x), float(y)) for x in range(32) for y in range(32)
    ]
    df = spark.createDataFrame(rows, "id long, x double, y double").repartition(8)

    zpath = str(tmp_path / "zorder")
    write_zordered(df, zpath, ["x", "y"], n_files=16, bits=5)
    lpath = str(tmp_path / "linear")
    (
        df.repartitionByRange(16, F.col("x"))
        .sortWithinPartitions("x")
        .write.parquet(lpath)
    )

    # columns written as (id, x, y) -> y is column index 2
    z_hit, z_total = _files_overlapping(zpath, 2, 4.0, 7.0)
    l_hit, l_total = _files_overlapping(lpath, 2, 4.0, 7.0)
    assert l_hit == l_total  # x-sorted: every file spans all of y
    assert z_hit <= z_total // 2, (z_hit, z_total)  # z-order: most skipped

    # and the leading dimension still prunes fine under z-order
    zx_hit, zx_total = _files_overlapping(zpath, 1, 4.0, 7.0)
    assert zx_hit <= zx_total // 2, (zx_hit, zx_total)

    # layout is a permutation, not a transformation: same rows come back
    assert spark.read.parquet(zpath).count() == len(rows)
    got = sorted(
        (r.id, r.x, r.y) for r in spark.read.parquet(zpath).collect()
    )
    assert got == sorted(rows)


def test_zorder_bits_overflow_guard(spark):
    # shiftleft wraps its distance mod 64 on longs: past 63 key bits the
    # interleave silently corrupts — must refuse, not wrap
    df = spark.createDataFrame([(1.0,) * 7], ", ".join(f"c{i} double" for i in range(7)))
    with pytest.raises(ValueError, match="63 usable bits"):
        zorder_values(df, [f"c{i}" for i in range(7)], bits=10)
    # 7 cols at bits=9 (63 bits) is legal
    assert zorder_values(df, [f"c{i}" for i in range(7)], bits=9).count() == 1


def test_zorder_quantile_cells_skip_on_powerlaw_column(spark, tmp_path):
    # One extreme outlier collapses the uniform min/max grid: every normal
    # x lands in cell 0, so the z-key carries no x information and a band
    # predicate on x prunes (almost) nothing. Equi-depth quantile cells
    # keep the x spread and restore the skipping property.
    rows = [(i, float(i), float(i % 32)) for i in range(1023)]
    rows.append((1023, 1.0e9, 7.0))  # the outlier
    df = spark.createDataFrame(rows, "id long, x double, y double").repartition(8)

    upath, qpath = str(tmp_path / "uniform"), str(tmp_path / "quantile")
    write_zordered(df, upath, ["x", "y"], n_files=16, bits=5, cells="uniform")
    write_zordered(df, qpath, ["x", "y"], n_files=16, bits=5, cells="quantile")

    # columns written as (id, x, y) -> x is column index 1
    u_hit, u_total = _files_overlapping(upath, 1, 200.0, 300.0)
    q_hit, q_total = _files_overlapping(qpath, 1, 200.0, 300.0)
    assert u_hit >= u_total - 1, (u_hit, u_total)   # uniform grid: no pruning
    assert q_hit <= q_total // 2, (q_hit, q_total)  # quantile cells: pruned

    # same rows come back; NULL/degenerate guards unchanged
    assert sorted(r.id for r in spark.read.parquet(qpath).collect()) == sorted(
        r[0] for r in rows
    )
