from pyspark.sql import functions as F

from hatchery_spark.config import RouteConfig
from hatchery_spark.datagen import transcripts_df
from hatchery_spark.router import write_route


def test_json_gzip_sink_roundtrip(spark, tmp_path):
    """Gzip-JSON sink (reference DataFormat json + gzip encode,
    /root/reference/pkg/types/format.go, destination/gcs/client.go:101-116):
    write, read back, byte-equal text."""
    df = transcripts_df(spark, 2000, seed=13)
    route = RouteConfig("json-sink", predicate="true", sink_format="json")
    sink, n = write_route(df.withColumn("severity", F.lit("info")), route, str(tmp_path))
    assert n == 2000

    import glob

    files = glob.glob(f"{sink}/run_ts=*/dt=*/*.json.gz")
    assert files, "expected gzip json part files"

    back = spark.read.json(sink)
    assert back.count() == 2000
    joined = back.select("conv_id", "turn_idx", F.col("text").alias("t2")).join(
        df.select("conv_id", "turn_idx", "text"), ["conv_id", "turn_idx"]
    )
    assert joined.filter(F.col("t2") != F.col("text")).count() == 0


def test_observe_count_matches(spark, tmp_path):
    df = transcripts_df(spark, 3000, seed=14)
    route = RouteConfig("obs", predicate="pmod(xxhash64(conv_id, turn_idx), 10) < 3")
    sink, n = write_route(df, route, str(tmp_path))
    assert n == spark.read.parquet(sink).count()
    assert 0 < n < 3000
