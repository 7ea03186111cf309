import pytest
from pyspark.sql import functions as F

from hatchery_spark.config import RouteConfig
from hatchery_spark.datagen import service_catalog_df, transcripts_df
from hatchery_spark.pipeline import prepare
from hatchery_spark.router import sink_counts
from hatchery_spark.streaming.stream import (
    read_transcripts_stream,
    run_streaming_pipeline,
    windowed_sink_counts,
)

ROUTES = [
    RouteConfig("s-err", predicate="severity IN ('error','critical')"),
    RouteConfig("s-chat", predicate="category = 'chat'"),
]


@pytest.fixture(scope="module")
def input_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream_in"))
    transcripts_df(spark, 4000, seed=3).write.mode("overwrite").parquet(path)
    return path


def test_available_now_matches_batch(spark, input_dir, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    run_streaming_pipeline(spark, input_dir, ROUTES, out, ckpt)

    batch_df = spark.read.parquet(input_dir)
    want = {
        r.route_id: r.row_count
        for r in sink_counts(prepare(batch_df, service_catalog_df(spark)), ROUTES).collect()
    }
    for rid, n in want.items():
        got = spark.read.parquet(f"{out}/{rid}").count()
        assert got == n, rid


def test_checkpoint_prevents_reprocessing(spark, input_dir, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    run_streaming_pipeline(spark, input_dir, ROUTES, out, ckpt)
    first = spark.read.parquet(f"{out}/s-err").count()
    # second run with SAME checkpoint: no new input → no duplicates appended
    run_streaming_pipeline(spark, input_dir, ROUTES, out, ckpt)
    assert spark.read.parquet(f"{out}/s-err").count() == first


def test_windowed_counts_schema_and_totals(spark, input_dir, tmp_path):
    stream = read_transcripts_stream(spark, input_dir)
    agg = windowed_sink_counts(stream, ROUTES, service_catalog_df(spark), window="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM win_counts").collect()
    assert {r.route_id for r in rows} <= {"s-err", "s-chat"}
    batch_df = spark.read.parquet(input_dir)
    want = {
        r.route_id: r.row_count
        for r in sink_counts(prepare(batch_df, service_catalog_df(spark)), ROUTES).collect()
    }
    got = {}
    for r in rows:
        got[r.route_id] = got.get(r.route_id, 0) + r.row_count
        assert r.window_end > r.window_start
    assert got == want


def test_dedup_stream_drops_replayed_rows(spark, tmp_path):
    """Duplicate (conv_id, turn_idx) keys across the stream survive exactly
    once; state is watermark-bounded (dropDuplicatesWithinWatermark)."""
    from hatchery_spark.streaming.stream import dedup_stream

    src = str(tmp_path / "dup_in")
    base = transcripts_df(spark, 1000, seed=11)
    # replay: the same payload written twice (at-least-once redelivery shape)
    base.write.mode("overwrite").parquet(src)
    base.write.mode("append").parquet(src)
    assert spark.read.parquet(src).count() == 2000

    stream = read_transcripts_stream(spark, src)
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("dedup_out")
    assert out.count() == 1000
    assert out.groupBy("conv_id", "turn_idx").count().filter("count > 1").isEmpty()
