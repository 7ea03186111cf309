"""Rollup cascade losslessness + streaming Sigma alert parity/idempotence."""

from pyspark.sql import functions as F

from hatchery_spark.datagen import transcripts_df
from hatchery_spark.operators.sigma import Rule, apply_rules
from hatchery_spark.operators.telemetry import rollup_bucket, rollup_cascade
from hatchery_spark.parse import parse_turns
from hatchery_spark.streaming.stream import run_sigma_alert_stream


def _events(spark):
    rows = [
        (g, f"2025-06-0{1 + i % 3} 0{i % 9}:{i % 60:02d}:{(7 * i) % 60:02d}", (i * 37) % 1000 - 250)
        for g in ("a", "b")
        for i in range(500)
    ]
    return spark.createDataFrame(rows, "g string, ts string, v long").withColumn(
        "ts", F.to_timestamp("ts")
    )


def test_rollup_cascade_is_lossless_vs_direct(spark):
    ev = _events(spark)
    minutes = rollup_bucket(ev, "v", ["g"], "minute")
    hours = rollup_cascade(minutes, ["g"], "hour")
    days = rollup_cascade(hours, ["g"], "day")

    direct = rollup_bucket(ev, "v", ["g"], "day")
    got = sorted(map(tuple, days.collect()))
    want = sorted(map(tuple, direct.collect()))
    assert got == want
    # avg is DERIVED (v_sum/n), never stored — verify it reconstructs
    row = days.where("g = 'a'").orderBy("bucket_ts").first()
    assert abs(row.v_sum / row.n - ev.where(
        "g = 'a' and date_trunc('day', ts) = '%s'" % row.bucket_ts
    ).agg(F.avg("v")).first()[0]) < 1e-9


def test_rollup_cascade_single_shuffle_per_level(spark):
    ev = _events(spark)
    minutes = rollup_bucket(ev, "v", ["g"], "minute")
    plan = (
        rollup_cascade(minutes, ["g"], "hour")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # partial aggregation (map-side combine) must exist at every level:
    # two HashAggregates around each of the two Exchanges, nothing more
    assert plan.count("Exchange") == 2


RULES = [
    Rule(
        "S1-errors", "error/critical turns",
        {"selection": {"severity": ["error", "critical"]}},
        "selection", level="high",
    ),
    Rule(
        "S2-deep-signup", "late signup turns",
        {"a": {"action": {"startswith": "signup"}}, "b": {"turn_idx": {"gt": 30}}},
        "a and b", level="low",
    ),
]


def test_sigma_alert_stream_matches_batch_and_is_idempotent(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    transcripts_df(spark, 3000, seed=11).write.mode("overwrite").parquet(src)

    run_sigma_alert_stream(spark, src, RULES, out, ckpt, max_files_per_trigger=4)

    want = (
        apply_rules(parse_turns(spark.read.parquet(src)), RULES,
                    ["conv_id", "turn_idx", "ts"])
        .groupBy("rule_id").count().collect()
    )
    got_df = spark.read.parquet(f"{out}/alerts")
    got = {r.rule_id: r["count"] for r in got_df.groupBy("rule_id").count().collect()}
    assert got == {r.rule_id: r["count"] for r in want} and got

    # restart with the same checkpoint: no new input → no duplicate alerts
    run_sigma_alert_stream(spark, src, RULES, out, ckpt)
    assert spark.read.parquet(f"{out}/alerts").count() == got_df.count()
