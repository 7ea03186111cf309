"""Sink maintenance: small-files compaction + dynamic partition pruning."""

import pyspark.sql.functions as F
import pytest

from hatchery_spark.datagen import transcripts_df
from hatchery_spark.sinks import compact_parquet_sink


@pytest.fixture(scope="module")
def fragmented_sink(spark, tmp_path_factory):
    """A dt-partitioned sink fragmented into many tiny files (streaming shape)."""
    path = str(tmp_path_factory.mktemp("frag") / "sink")
    df = transcripts_df(spark, 20_000, seed=7).withColumn("dt", F.to_date("ts"))
    df.repartition(40).write.mode("overwrite").partitionBy("dt").parquet(path)
    return path


def test_compaction_reduces_files_preserves_rows(spark, fragmented_sink, tmp_path):
    dst = str(tmp_path / "compacted")
    before = spark.read.parquet(fragmented_sink)
    n_before = len(before.inputFiles())
    n_after = compact_parquet_sink(
        spark, fragmented_sink, dst, target_file_bytes=64 << 20,
        partition_cols=("dt",),
    )
    after = spark.read.parquet(dst)
    assert n_after < n_before / 4, (n_before, n_after)
    # exact multiset equality of rows
    assert before.exceptAll(after).isEmpty() and after.exceptAll(before).isEmpty()
    # partition layout preserved
    assert sorted(r.dt for r in before.select("dt").distinct().collect()) == sorted(
        r.dt for r in after.select("dt").distinct().collect()
    )


def test_compaction_splits_oversized_partitions(spark, fragmented_sink, tmp_path):
    dst = str(tmp_path / "tiny_target")
    n_after = compact_parquet_sink(
        spark, fragmented_sink, dst, target_file_bytes=64 << 10,
        partition_cols=("dt",),
    )
    n_parts = spark.read.parquet(dst).select("dt").distinct().count()
    assert n_after > n_parts  # maxRecordsPerFile split the big partitions


def test_dynamic_partition_pruning_on_dt_sink(spark, fragmented_sink):
    """Joining the dt-partitioned sink against a filtered date dim must prune
    partitions at RUNTIME (dynamicpruning expression in the scan's
    PartitionFilters) — the mechanism that keeps dimension-driven scans from
    reading the whole 10^12-row fact table."""
    fact = spark.read.parquet(fragmented_sink)
    dims = (
        fact.select("dt").distinct().limit(3)
        .withColumn("tag", F.lit("wanted"))
    )
    dims.write.mode("overwrite").parquet(fragmented_sink + "_dim")
    dim = spark.read.parquet(fragmented_sink + "_dim").filter(F.col("tag") == "wanted")
    joined = fact.join(dim, "dt")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:4000]
    assert joined.count() > 0


def test_aqe_splits_skewed_join_partition(spark, tmp_path):
    """AQE skew-join handling (north-rule requirement): a join where one
    conv_id holds most rows must show skew=true on the runtime join node —
    AQE split the whale partition into parallel subtasks instead of letting
    one task process it alone."""
    import pyspark.sql.functions as F

    fact = spark.range(0, 400_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("whale-conv"))
        .otherwise(F.concat(F.lit("c"), F.col("id")))
        .alias("conv_id"),
        F.col("id").alias("turn"),
        F.sha2(F.col("id").cast("string"), 256).alias("pad"),
    )
    dim = fact.select("conv_id").distinct().withColumn(
        "meta", F.length("conv_id")
    )
    fact.write.mode("overwrite").parquet(str(tmp_path / "fact"))
    dim.write.mode("overwrite").parquet(str(tmp_path / "dim"))
    conf = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
    }
    old = {k: spark.conf.get(k, None) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        joined = spark.read.parquet(str(tmp_path / "fact")).join(
            spark.read.parquet(str(tmp_path / "dim")), "conv_id"
        ).select("conv_id")
        # collect() executes THIS Dataset's QueryExecution, which is the one
        # whose AdaptiveSparkPlan gets finalized (count() would execute a
        # different QueryExecution and leave this plan un-finalized)
        assert len(joined.collect()) == 400_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:3000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_schema_evolution_mergeschema_across_runs(spark, tmp_path):
    """Long-lived sinks evolve: a later run adds a column. mergeSchema reads
    both generations; old rows surface NULL for the new column."""
    sink = str(tmp_path / "evolving")
    base = transcripts_df(spark, 500, seed=21).withColumn("dt", F.to_date("ts"))
    base.write.mode("overwrite").partitionBy("dt").parquet(sink)
    base.withColumn("pipeline_version", F.lit("v2")).write.mode("append").partitionBy(
        "dt"
    ).parquet(sink)
    merged = spark.read.option("mergeSchema", "true").parquet(sink)
    assert "pipeline_version" in merged.columns
    assert merged.count() == 1000
    assert merged.filter(F.col("pipeline_version").isNull()).count() == 500
    assert merged.filter(F.col("pipeline_version") == "v2").count() == 500


def test_compact_empty_source_keeps_partitioned_layout(spark, tmp_path):
    """An empty compaction must not emit an UNPARTITIONED data file into dst:
    the directory contract (partition dirs or nothing) survives, so a later
    pointer-flip to dst cannot change the sink layout."""
    import os

    from pyspark.sql import functions as F

    from hatchery_spark.sinks import compact_parquet_sink

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    empty = spark.range(0).select(
        F.col("id").alias("conv_id"),
        F.lit("t").alias("run_ts"),
        F.lit("2024-01-01").alias("dt"),
    )
    empty.write.parquet(src)  # schema-bearing empty source
    assert compact_parquet_sink(spark, src, dst) == 0
    # a 0-row partitioned write emits no data files at the sink root — in
    # particular no flat part-*.parquet that would break the partition layout
    data_files = [f for f in os.listdir(dst) if f.endswith(".parquet")]
    assert data_files == []


def test_merge_frames_update_insert_delete(spark):
    from hatchery_spark.sinks import merge_frames

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, v double",
    )
    updates = spark.createDataFrame(
        [(2, 99.0, False),   # update: only v changes, name survives
         (4, 40.0, False),   # insert: new key, name is NULL
         (3, None, True)],   # delete
        "k long, v double, _del boolean",
    )
    out = {r.k: r for r in
           merge_frames(base, updates, "k", delete_col="_del").collect()}
    assert set(out) == {1, 2, 4}
    assert out[1].name == "a" and out[1].v == 10.0       # untouched
    assert out[2].name == "b" and out[2].v == 99.0       # partial update
    assert out[4].name is None and out[4].v == 40.0      # insert

    import pytest
    with pytest.raises(ValueError):
        merge_frames(base, updates.withColumnRenamed("v", "nope"), "k",
                     delete_col="_del")


def test_upsert_partitioned_rewrites_only_touched_partitions(spark, tmp_path):
    import glob
    import hashlib

    from hatchery_spark.sinks import upsert_partitioned

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(i, f"d{i % 3}", float(i)) for i in range(30)],
        "k long, dt string, v double",
    )
    base.repartition(1).write.partitionBy("dt").parquet(path)

    def file_state(part):
        return {
            fp: hashlib.md5(open(fp, "rb").read()).hexdigest()
            for fp in sorted(glob.glob(f"{path}/dt={part}/part-*.parquet"))
        }

    before_d1, before_d2 = file_state("d1"), file_state("d2")

    updates = spark.createDataFrame(
        [(0, "d0", 999.0, False),    # update in d0
         (90, "d0", 90.0, False),    # insert into d0
         (3, "d0", None, True)],     # delete from d0
        "k long, dt string, v double, _del boolean",
    )
    touched = upsert_partitioned(spark, path, updates, "k", "dt",
                                 delete_col="_del")
    assert touched == ["d0"]

    # untouched partitions byte-identical
    assert file_state("d1") == before_d1
    assert file_state("d2") == before_d2

    got = {r.k: r.v for r in
           spark.read.parquet(path).filter("dt = 'd0'").collect()}
    assert got[0] == 999.0 and got[90] == 90.0 and 3 not in got
    assert len(got) == 10  # 10 base keys in d0, -1 delete +1 insert
    # the other partitions' rows are intact
    assert spark.read.parquet(path).count() == 30 - 1 + 1


def test_merge_frames_update_can_null_a_column(spark):
    # column replacement is key-match-gated, NOT coalesce: an update row
    # nulling a field (redaction) must actually null it
    from hatchery_spark.sinks import merge_frames

    base = spark.createDataFrame(
        [(1, "alice", 10.0), (2, "bob", 20.0)], "k long, name string, v double"
    )
    updates = spark.createDataFrame([(1, None)], "k long, v double")
    out = {r.k: r for r in merge_frames(base, updates, "k").collect()}
    assert out[1].v is None          # NULL update wins on the matched key
    assert out[1].name == "alice"    # non-carried column survives
    assert out[2].v == 20.0


def test_upsert_partitioned_deletes_emptied_partition(spark, tmp_path):
    # deleting EVERY key of a partition must remove its files — dynamic
    # overwrite alone never rewrites a partition absent from the output,
    # so the "deleted" rows would silently resurface on read
    import glob

    from hatchery_spark.sinks import upsert_partitioned

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(i, f"d{i % 3}", float(i)) for i in range(30)],
        "k long, dt string, v double",
    )
    base.repartition(1).write.partitionBy("dt").parquet(path)

    d1_keys = [i for i in range(30) if i % 3 == 1]
    updates = spark.createDataFrame(
        [(k, "d1", None, True) for k in d1_keys],
        "k long, dt string, v double, _del boolean",
    )
    touched = upsert_partitioned(spark, path, updates, "k", "dt",
                                 delete_col="_del")
    assert touched == ["d1"]
    assert glob.glob(f"{path}/dt=d1") == []          # directory is gone
    back = spark.read.parquet(path)
    assert back.filter("dt = 'd1'").count() == 0     # rows do not resurface
    assert back.count() == 20                        # other partitions intact
