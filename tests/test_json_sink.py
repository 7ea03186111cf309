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


def test_log_sink_raw_text_passthrough(spark, tmp_path):
    """'log' sink = the reference's empty-format raw pipe: one line per record,
    bytes untouched (identity projection), gzip-compressed."""
    df = transcripts_df(spark, 1500, seed=21)
    route = RouteConfig("raw-log", predicate="true", sink_format="log")
    sink, n = write_route(df, route, str(tmp_path))
    assert n == 1500
    back = spark.read.text(sink)
    assert back.count() == 1500
    want = {r.text for r in df.select("text").collect()}
    got = {r.value for r in back.collect()}
    assert got == want  # byte-identical line set


def test_yaml_sink_parses_back(spark, tmp_path):
    df = transcripts_df(spark, 200, seed=22).withColumn(
        # force quote-escaping through the single-quote path
        "text", F.concat(F.col("text"), F.lit(" it's quoted"))
    )
    route = RouteConfig("yaml-sink", predicate="true", sink_format="yaml")
    sink, n = write_route(df, route, str(tmp_path))
    assert n == 200
    raw = "\n".join(r.value for r in spark.read.text(sink).collect())
    try:
        import yaml
    except ImportError:
        assert raw.count("- conv_id: ") == 200  # structural fallback
        return
    docs = yaml.safe_load(raw)
    assert len(docs) == 200
    texts = {d["text"] for d in docs}
    assert texts == {r.text for r in df.select("text").collect()}
    assert all(isinstance(d["turn_idx"], int) for d in docs)


def test_observe_count_matches(spark, tmp_path):
    df = transcripts_df(spark, 3000, seed=14)
    route = RouteConfig("obs", predicate="pmod(xxhash64(conv_id, turn_idx), 10) < 3")
    sink, n = write_route(df, route, str(tmp_path))
    assert n == spark.read.parquet(sink).count()
    assert 0 < n < 3000


def test_text_sinks_survive_multiline_records(spark, tmp_path):
    """A record whose text embeds newlines must stay ONE line (log) / ONE
    parseable document (yaml) — raw newlines would merge records."""
    df = spark.createDataFrame(
        [("conv-m", 0, "user", 'line1\nline2\t"quoted"\\end', "tool", "2025-06-01 10:00:00")],
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.to_timestamp("ts")).withColumn("severity", F.lit("info"))

    log_route = RouteConfig("ml-log", predicate="true", sink_format="log")
    sink, n = write_route(df, log_route, str(tmp_path))
    assert n == 1
    lines = [r.value for r in spark.read.text(sink).collect()]
    assert len(lines) == 1  # one record, one physical line
    assert lines[0] == 'line1\\nline2\t"quoted"\\end'

    yaml_route = RouteConfig("ml-yaml", predicate="true", sink_format="yaml")
    sink, n = write_route(df, yaml_route, str(tmp_path))
    import glob
    import yaml

    raw = "\n".join(
        open(f).read() for f in glob.glob(f"{sink}/run_ts=*/dt=*/part-*")
    )
    docs = yaml.safe_load(raw)
    assert len(docs) == 1
    assert docs[0]["text"] == 'line1\nline2\t"quoted"\\end'  # exact round-trip
