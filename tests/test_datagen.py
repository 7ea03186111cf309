from pyspark.sql import functions as F

from hatchery_spark.datagen import transcripts_df, service_catalog_df


def test_schema_matches_input_hint(spark):
    df = transcripts_df(spark, 100)
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == [
        ("conv_id", "string"),
        ("turn_idx", "int"),
        ("role", "string"),
        ("text", "string"),
        ("tool", "string"),
        ("ts", "timestamp"),
    ]


def test_deterministic_across_parallelism(spark):
    a = transcripts_df(spark, 2000, seed=7, num_partitions=2).orderBy("conv_id", "turn_idx")
    b = transcripts_df(spark, 2000, seed=7, num_partitions=16).orderBy("conv_id", "turn_idx")
    assert a.collect() == b.collect()


def test_key_uniqueness_and_turn_contiguity(spark):
    df = transcripts_df(spark, 5000, n_convs=100)
    assert df.groupBy("conv_id", "turn_idx").count().filter("count > 1").count() == 0
    # turn_idx is 0-based and contiguous per conv
    agg = df.groupBy("conv_id").agg(
        F.min("turn_idx").alias("lo"), F.max("turn_idx").alias("hi"), F.count("*").alias("n")
    )
    assert agg.filter("lo != 0 OR hi != n - 1").count() == 0


def test_skew_whales_present(spark):
    df = transcripts_df(spark, 10000, n_convs=200)
    top = (
        df.groupBy("conv_id").count().orderBy(F.desc("count")).limit(5).agg(F.sum("count"))
    ).collect()[0][0]
    assert top / 10000 >= 0.10  # whales hold >=10% of rows


def test_prose_fraction_and_grokability(spark):
    df = transcripts_df(spark, 10000)
    n_audit = df.filter(F.col("text").startswith("[")).count()
    assert 0.93 <= n_audit / 10000 <= 0.99


def test_ts_spread_and_monotonicity(spark):
    df = transcripts_df(spark, 5000, span_hours=72)
    days = df.select(F.to_date("ts").alias("d")).distinct().count()
    assert days >= 2
    from pyspark.sql import Window as W

    w = W.partitionBy("conv_id").orderBy("turn_idx")
    bad = (
        df.withColumn("prev", F.lag("ts").over(w))
        .filter(F.col("prev").isNotNull() & (F.col("ts") < F.col("prev")))
        .count()
    )
    assert bad == 0


def test_catalog_shape(spark):
    cat = service_catalog_df(spark)
    assert cat.count() == 40
    assert cat.groupBy("tool", "role").count().filter("count > 1").count() == 0
