"""Bucketed tables: co-located joins run with no Exchange on either side."""

import pyspark.sql.functions as F
import pytest

from hatchery_spark.sinks import write_bucketed_table


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    convs = spark.range(0, 2000).select(
        F.concat(F.lit("conv-"), F.col("id")).alias("conv_id"),
        (F.col("id") % 7).alias("shard"),
    )
    turns = spark.range(0, 10000).select(
        F.concat(F.lit("conv-"), (F.col("id") % 2000)).alias("conv_id"),
        (F.col("id") % 5).alias("turn_idx"),
    )
    spark.sql("DROP TABLE IF EXISTS b_convs")
    spark.sql("DROP TABLE IF EXISTS b_turns")
    write_bucketed_table(convs, "b_convs", ["conv_id"], 8, path=str(base / "convs"))
    write_bucketed_table(
        turns, "b_turns", ["conv_id"], 8, path=str(base / "turns"),
        sort_cols=["conv_id"],
    )
    return spark.table("b_convs"), spark.table("b_turns")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    convs, turns = bucketed
    # disable auto-broadcast so the join strategy decision is about bucketing,
    # not table size
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = turns.join(convs, "conv_id")
        plan = _executed_plan(joined)
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() == 10000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_unbucketed_join_shuffles_both_sides(spark, bucketed):
    convs, turns = bucketed
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = turns.join(convs.repartition(16), "conv_id")
        assert "Exchange hashpartitioning" in _executed_plan(plain)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_rows_match_plain_join(spark, bucketed):
    convs, turns = bucketed
    bucketed_rows = sorted(
        (r.conv_id, r.turn_idx, r.shard) for r in turns.join(convs, "conv_id").collect()
    )
    plain_rows = sorted(
        (r.conv_id, r.turn_idx, r.shard)
        for r in turns.join(convs.hint("shuffle_hash"), "conv_id").collect()
    )
    assert bucketed_rows == plain_rows
