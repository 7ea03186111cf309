from pyspark.sql import functions as F

from hatchery_spark.functions.udx import ParseKVPairs, conv_error_burst


def _conv_df(spark, sevs):
    rows = [("c1", i, s) for i, s in enumerate(sevs)]
    return spark.createDataFrame(rows, "conv_id string, turn_idx int, severity string")


def test_error_burst_basic(spark):
    df = _conv_df(spark, ["info", "error", "error", "critical", "info"])
    assert conv_error_burst(df).first().burst == 0.6  # run of 3 / 5 turns


def test_error_burst_no_errors(spark):
    assert conv_error_burst(_conv_df(spark, ["info", "warn"])).first().burst == 0.0


def test_error_burst_order_independent(spark):
    # shuffle row order: the UDAF must sort by turn_idx internally
    rows = [("c1", 2, "error"), ("c1", 0, "info"), ("c1", 1, "error"), ("c1", 3, "info")]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, severity string")
    assert conv_error_burst(df).first().burst == 0.5  # turns 1,2 are a run of 2/4


def test_udtf_kv_explode(spark):
    spark.udtf.register("parse_kv", ParseKVPairs)
    spark.createDataFrame(
        [("[error] actor=a@b action=user_login resource=vault:/r1 ip=10.0.0.1",)],
        "text string",
    ).createOrReplaceTempView("one_line")
    rows = spark.sql(
        "SELECT kv.key, kv.value FROM one_line, LATERAL parse_kv(text) kv"
    ).collect()
    got = {r.key: r.value for r in rows}
    assert got == {
        "severity": "error",
        "actor": "a@b",
        "action": "user_login",
        "resource": "vault:/r1",
        "ip": "10.0.0.1",
    }


def test_skew_salting_spreads_whales(spark):
    """Whale conversations must not stall the write stage: with salting a
    whale's rows land on multiple partitions; without, on exactly one."""
    from hatchery_spark.datagen import transcripts_df
    from hatchery_spark.router import ordered_for_sink

    df = transcripts_df(spark, 20000, n_convs=50, seed=21)  # whales ~600 rows
    whale_id = df.groupBy("conv_id").count().orderBy(F.desc("count")).first().conv_id

    def n_partitions_for_whale(repartitioned):
        return (
            repartitioned.withColumn("pid", F.spark_partition_id())
            .filter(F.col("conv_id") == whale_id)
            .select("pid")
            .distinct()
            .count()
        )

    # AQE's partition coalescing legitimately merges this tiny test shuffle
    # into one partition (at production scale partitions are far above the
    # advisory size and stay split) — pin it off to observe the salt itself
    old = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        salted = n_partitions_for_whale(ordered_for_sink(df, salt_buckets=8))
        unsalted = n_partitions_for_whale(
            df.repartition(F.col("conv_id")).sortWithinPartitions("conv_id", "turn_idx")
        )
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", old)
    assert unsalted == 1
    assert salted >= 4, salted  # 8 salt buckets over 8 shuffle partitions
