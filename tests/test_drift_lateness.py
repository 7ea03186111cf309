"""Schema-drift profiling + lateness stats."""

from __future__ import annotations

from pyspark.sql import functions as F

from hatchery_spark.operators.drift import schema_drift, schema_profile
from hatchery_spark.operators.telemetry import lateness_stats


def _payloads(spark):
    rows = [
        ("2024-01-01 10:00:00", '{"code":"E1","msg":"x"}'),
        ("2024-01-01 11:00:00", '{"code":"E2","msg":"y"}'),
        ("2024-01-02 10:00:00", '{"code":17,"msg":"z","fatal":true}'),
        ("2024-01-02 11:00:00", '{"code":18,"msg":null,"fatal":false}'),
        ("2024-01-02 12:00:00", '{"code":-5,"msg":"w"}'),
    ]
    return spark.createDataFrame(rows, "ts string, payload string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


def test_profile_types(spark):
    prof = {
        (r["day"].day, r["key"], r["vtype"]): r["n"]
        for r in schema_profile(_payloads(spark), "payload").collect()
    }
    assert prof[(1, "code", "string")] == 2
    assert prof[(2, "code", "number")] == 3  # incl. the negative literal
    assert prof[(2, "fatal", "bool")] == 2
    assert prof[(2, "msg", "null")] == 1
    assert prof[(2, "msg", "string")] == 2


def test_drift_flags(spark):
    out = {
        (r["day"].day, r["key"]): r
        for r in schema_drift(_payloads(spark), "payload").collect()
    }
    assert out[(1, "code")]["is_new"] and not out[(1, "code")]["type_changed"]
    d2 = out[(2, "code")]
    assert d2["type_changed"] and d2["types"] == "number" and not d2["is_new"]
    assert out[(2, "fatal")]["is_new"]
    m2 = out[(2, "msg")]
    assert m2["type_changed"] and m2["types"] == "null,string"


def test_lateness_simple(spark):
    # explicit tiny frame: 20 rows, lags 1..20 s, watermark 10 s
    rows = [("g", "2024-01-01 05:00:00", i) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "g string, proc_ts string, lag int").select(
        "g",
        F.col("proc_ts").cast("timestamp").alias("proc_ts"),
        F.timestamp_seconds(
            F.unix_timestamp(F.col("proc_ts").cast("timestamp")) - F.col("lag")
        ).alias("ts"),
    )
    r = lateness_stats(df, group_cols=["g"], watermark_s=10).first()
    assert r["n"] == 20
    assert r["min_lag_s"] == 1 and r["max_lag_s"] == 20
    assert r["p95_lag_s"] == 19  # ceil(0.95·20) = 19th smallest
    assert r["n_late"] == 10  # lags 11..20


def test_lateness_groups_by_proc_hour(spark):
    rows = [
        ("g", "2024-01-01 05:59:59", 5),
        ("g", "2024-01-01 06:00:01", 7),
    ]
    df = spark.createDataFrame(rows, "g string, proc_ts string, lag int").select(
        "g",
        F.col("proc_ts").cast("timestamp").alias("proc_ts"),
        F.timestamp_seconds(
            F.unix_timestamp(F.col("proc_ts").cast("timestamp")) - F.col("lag")
        ).alias("ts"),
    )
    out = lateness_stats(df, group_cols=["g"]).collect()
    assert len(out) == 2 and {r["max_lag_s"] for r in out} == {5, 7}
