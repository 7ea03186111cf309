import pytest
from pyspark.sql import functions as F

from hatchery_spark import sinks
from hatchery_spark.datagen import transcripts_df
from hatchery_spark.parse import AUDIT_PATTERNS, multi_pattern_parse, parse_turns


def test_parquet_write_read_roundtrip(spark, tmp_path):
    df = transcripts_df(spark, 500, seed=31)
    sinks.write_table(df, str(tmp_path / "t"), "parquet")
    back = sinks.read_table(spark, str(tmp_path / "t"), "parquet")
    assert back.count() == 500
    assert "dt" in back.columns  # time-partitioned layout


def test_iceberg_gated_cleanly(spark, tmp_path):
    df = transcripts_df(spark, 10, seed=31)
    assert sinks.iceberg_available(spark) is False  # sandbox has no catalog
    with pytest.raises(sinks.IcebergUnavailable, match="catalog"):
        sinks.write_table(df, "cat.db.t", "iceberg")
    with pytest.raises(sinks.IcebergUnavailable):
        sinks.read_table(spark, "cat.db.t", "iceberg")


def test_unknown_format_rejected(spark, tmp_path):
    df = transcripts_df(spark, 10, seed=31)
    with pytest.raises(ValueError, match="table_format"):
        sinks.write_table(df, str(tmp_path / "x"), "orc2")


def test_multi_pattern_parse_both_layouts(spark):
    rows = [
        ("[error] actor=a action=b resource=c extra", "error", "a", "b", "c"),
        ("sev=warn user=u op=rotate obj=key:/k1", "warn", "u", "rotate", "key:/k1"),
        ("nothing matches here", None, None, None, None),
    ]
    df = spark.createDataFrame([(r[0],) for r in rows], "text string")
    out = {r.text: r for r in multi_pattern_parse(df).collect()}
    for text, sev, actor, action, resource in rows:
        r = out[text]
        assert (r.severity, r.actor, r.action, r.resource) == (sev, actor, action, resource)


def test_multi_pattern_first_wins_and_matches_single_on_audit(spark):
    # on audit-only text the pattern set equals the single-pattern parse
    df = transcripts_df(spark, 1000, seed=32).filter(F.col("text").startswith("["))
    a = parse_turns(df).orderBy("conv_id", "turn_idx").collect()
    b = multi_pattern_parse(df, AUDIT_PATTERNS).orderBy("conv_id", "turn_idx").collect()
    assert a == b
