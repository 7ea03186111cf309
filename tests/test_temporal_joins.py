from pyspark.sql import functions as F

from hatchery_spark.operators.joins import as_of_join, range_join_binned


def _ts(s):
    return F.to_timestamp(F.lit(s))


def test_as_of_basic(spark):
    left = spark.createDataFrame(
        [("k1", "2025-01-01 10:00:00", 1),
         ("k1", "2025-01-01 12:00:00", 2),
         ("k2", "2025-01-01 11:00:00", 3)],
        "key string, ts string, turn int",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [("k1", "2025-01-01 09:00:00", "v9"),
         ("k1", "2025-01-01 11:30:00", "v1130"),
         ("k3", "2025-01-01 00:00:00", "other")],
        "key string, ts string, val string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r.turn: r.val for r in as_of_join(left, right, "key").collect()}
    assert out == {1: "v9", 2: "v1130", 3: None}


def test_as_of_inclusive_equal_ts(spark):
    left = spark.createDataFrame(
        [("k", "2025-01-01 10:00:00", 1)], "key string, ts string, turn int"
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [("k", "2025-01-01 10:00:00", "same_ts")], "key string, ts string, val string"
    ).withColumn("ts", F.to_timestamp("ts"))
    assert as_of_join(left, right, "key").first().val == "same_ts"


def test_as_of_tolerance(spark):
    left = spark.createDataFrame(
        [("k", "2025-01-01 10:00:00", 1)], "key string, ts string, turn int"
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [("k", "2025-01-01 07:00:00", "stale")], "key string, ts string, val string"
    ).withColumn("ts", F.to_timestamp("ts"))
    assert as_of_join(left, right, "key").first().val == "stale"
    assert as_of_join(left, right, "key", tolerance="1 hour").first().val is None


def test_as_of_matches_naive_join(spark):
    """Window formulation must equal the quadratic argmax formulation."""
    from hatchery_spark.datagen import transcripts_df

    left = transcripts_df(spark, 500, n_convs=20, seed=41).select(
        F.col("conv_id").alias("key"), "ts", "turn_idx"
    )
    right = transcripts_df(spark, 100, n_convs=20, seed=42).select(
        F.col("conv_id").alias("key"), "ts", F.col("text").alias("val")
    ).dropDuplicates(["key", "ts"])
    fast = {
        (r.key, r.turn_idx): r.val for r in as_of_join(left, right, "key").collect()
    }
    naive = (
        left.alias("l")
        .join(right.alias("r"), (F.col("l.key") == F.col("r.key"))
              & (F.col("r.ts") <= F.col("l.ts")), "left")
        .groupBy("l.key", "l.turn_idx", "l.ts")
        .agg(F.max_by("r.val", "r.ts").alias("val"))
    )
    want = {(r.key, r.turn_idx): r.val for r in naive.collect()}
    assert fast == want


import pytest


@pytest.mark.parametrize(
    "bin_width", ["30 minutes", "1 hour", "2 hours", "1 day"]
)
def test_range_join_binned_matches_naive(spark, bin_width):
    """Any bin width must land events and interval bins on the SAME grid —
    widths that don't divide an hour (or exceed it) are the regression cases."""
    from hatchery_spark.timerange import ticks_df

    events = spark.createDataFrame(
        [(i, f"2025-01-01 {h:02d}:{m:02d}:00") for i, (h, m) in enumerate(
            [(0, 30), (3, 0), (5, 59), (6, 0), (11, 30), (23, 45)]
        )],
        "event_id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    # maintenance windows: 90 minutes starting every 6 hours
    windows = (
        ticks_df(spark, "2025-01-01 00:00:00", "2025-01-01 18:00:00", "6 hours")
        .select(
            F.col("tick").alias("window_start"),
            (F.col("tick") + F.expr("interval 90 minutes")).alias("window_end"),
        )
    )
    got = {
        (r.event_id, str(r.window_start))
        for r in range_join_binned(events, windows, bin_width=bin_width).collect()
    }
    naive = {
        (r.event_id, str(r.window_start))
        for r in events.join(
            windows,
            F.col("ts").between(F.col("window_start"), F.col("window_end")),
        ).collect()
    }
    assert got == naive and len(got) > 0


def test_as_of_join_salted_matches_unsalted_and_splits_whale(spark):
    """One key holds 50% of left rows; salting must (a) leave the output
    bit-identical and (b) split the whale's window group ~salt_buckets ways
    so no single task sorts half the corpus."""
    import datetime as dt

    from pyspark.sql import functions as F

    from hatchery_spark.operators.joins import as_of_join

    base = dt.datetime(2024, 1, 1)
    n = 4000
    lefts = [
        ("whale" if i % 2 == 0 else f"k{i % 40}", base + dt.timedelta(seconds=i), i)
        for i in range(n)
    ]
    rights = [
        ("whale" if j % 2 == 0 else f"k{j % 40}",
         base + dt.timedelta(seconds=j * 7), j * 10)
        for j in range(200)
    ]
    left = spark.createDataFrame(lefts, "key string, ts timestamp, seq int")
    right = spark.createDataFrame(rights, "key string, ts timestamp, state int")

    plain = as_of_join(left, right, key="key")
    salted = as_of_join(left, right, key="key", salt_buckets=8)
    key_fn = lambda r: (r.key, r.ts, r.seq, r.state)
    assert sorted(map(key_fn, plain.collect())) == sorted(map(key_fn, salted.collect()))

    # the whale's left rows spread across 8 (key, salt) window groups — the
    # sequential unit drops from n/2 rows to ~n/16 (+ replicated rights)
    groups = (
        left.filter("key = 'whale'")
        .withColumn("_salt", F.pmod(F.xxhash64(F.col("ts")), F.lit(8)))
        .groupBy("_salt").count().collect()
    )
    assert len(groups) == 8
    assert max(g["count"] for g in groups) < n / 2 / 4  # well under the whale
