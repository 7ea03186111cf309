import pytest
from pyspark.sql import functions as F

from hatchery_spark.datagen import transcripts_df
from hatchery_spark.parse import parse_turns
from hatchery_spark.streaming.stream import read_transcripts_stream
from hatchery_spark.streaming.stateful import conversation_sessionizer


@pytest.fixture(scope="module")
def input_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("state_in"))
    transcripts_df(spark, 3000, n_convs=40, seed=9).write.mode("overwrite").parquet(path)
    return path


def _latest_summaries(spark, qname):
    # update mode emits one row per key per batch; keep the last per conv
    return {
        r.conv_id: r
        for r in spark.sql(
            f"SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY conv_id ORDER BY n_turns DESC) rn FROM {qname}) WHERE rn = 1"
        ).collect()
    }


def test_sessionizer_matches_batch_totals(spark, input_dir, tmp_path):
    stream = parse_turns(read_transcripts_stream(spark, input_dir, max_files_per_trigger=2))
    q = (
        conversation_sessionizer(stream)
        .writeStream.format("memory")
        .queryName("conv_sessions")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = _latest_summaries(spark, "conv_sessions")

    batch = parse_turns(spark.read.parquet(input_dir))
    want = {
        r.conv_id: r
        for r in batch.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.sum(
                F.when(F.col("severity").isin("error", "critical"), 1).otherwise(0)
            ).alias("n_error_turns"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for cid, w in want.items():
        g = got[cid]
        assert g.n_turns == w.n_turns, cid
        assert g.n_error_turns == w.n_error_turns, cid
        assert g.first_ts == w.first_ts and g.last_ts == w.last_ts, cid


def test_state_survives_restart(spark, input_dir, tmp_path):
    """Two-phase input: state accumulated in run 1 continues in run 2.

    memory sink can't recover from a checkpoint, so summaries are appended to
    parquet via foreachBatch (which supports recovery)."""
    full_dir = str(tmp_path / "full")
    ckpt = str(tmp_path / "ckpt2")
    out_dir = str(tmp_path / "summaries")
    df = spark.read.parquet(input_dir).cache()
    df.limit(1500).write.mode("overwrite").parquet(full_dir)  # phase 1 files

    def run_once():
        stream = parse_turns(read_transcripts_stream(spark, full_dir))

        def sink(batch_df, batch_id):
            batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(out_dir)

        q = (
            conversation_sessionizer(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    # add phase-2 files to the SAME directory, resume from checkpoint
    df.exceptAll(spark.read.parquet(full_dir)).write.mode("append").parquet(full_dir)
    run_once()
    summaries = spark.read.parquet(out_dir)
    latest = {
        r.conv_id: r
        for r in summaries.orderBy("n_turns").collect()  # last write wins below
    }
    want = {
        r.conv_id: r.n
        for r in df.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # convs updated in phase 2 must carry phase-1 counts (state restored)
    for cid, g in latest.items():
        assert g.n_turns == want[cid], cid
    # every conversation reaches its full total across the two phases
    assert set(latest) == set(want)
    df.unpersist()
