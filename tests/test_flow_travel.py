"""Biflow stitching + impossible-travel triage."""

from __future__ import annotations

from pyspark.sql import functions as F

from hatchery_spark.operators.netenrich import impossible_travel, stitch_flows

FLOW_SCHEMA = (
    "src_ip string, src_port int, dst_ip string, dst_port int, "
    "ts string, bytes long"
)


def _flows(spark, rows):
    return spark.createDataFrame(rows, FLOW_SCHEMA).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


def test_stitch_pairs_directions(spark):
    df = _flows(spark, [
        ("10.0.0.1", 5000, "192.168.0.9", 443, "2024-01-01 00:00:00", 100),
        ("192.168.0.9", 443, "10.0.0.1", 5000, "2024-01-01 00:00:01", 900),
        ("10.0.0.1", 5000, "192.168.0.9", 443, "2024-01-01 00:00:02", 50),
    ])
    r = stitch_flows(df).first()
    assert (r["lo_ip"], r["lo_port"], r["hi_ip"], r["hi_port"]) == (
        "10.0.0.1", 5000, "192.168.0.9", 443
    )
    assert r["n_records"] == 3
    assert r["bytes_ab"] == 150 and r["bytes_ba"] == 900
    assert r["bidirectional"] and r["initiator_ip"] == "10.0.0.1"


def test_stitch_one_directional_and_server_initiated(spark):
    df = _flows(spark, [
        # one-directional
        ("10.0.0.2", 5001, "192.168.0.9", 443, "2024-01-01 00:00:00", 10),
        # server (hi endpoint) speaks first
        ("192.168.0.9", 443, "10.0.0.3", 5002, "2024-01-01 00:00:00", 20),
        ("10.0.0.3", 5002, "192.168.0.9", 443, "2024-01-01 00:00:05", 30),
    ])
    out = {r["lo_ip"]: r for r in stitch_flows(df).collect()}
    assert not out["10.0.0.2"]["bidirectional"]
    assert out["10.0.0.2"]["initiator_ip"] == "10.0.0.2"
    assert out["10.0.0.2"]["bytes_ba"] == 0
    assert out["10.0.0.3"]["bidirectional"]
    assert out["10.0.0.3"]["initiator_ip"] == "192.168.0.9"


def test_stitch_is_single_shuffle(spark):
    df = _flows(spark, [
        ("10.0.0.1", 5000, "192.168.0.9", 443, "2024-01-01 00:00:00", 100),
    ])
    plan = stitch_flows(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # one hash shuffle, no join


def _logins(spark, rows):
    return spark.createDataFrame(
        rows, "actor string, event_id long, ts string, lat double, lon double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_travel_flags_jet_speed(spark):
    df = _logins(spark, [
        # London → Sydney (~17000 km) in 2 hours
        ("a", 1, "2024-01-01 00:00:00", 51.5, -0.12),
        ("a", 2, "2024-01-01 02:00:00", -33.87, 151.2),
        # London → Paris (~340 km) in 2 hours: fine
        ("b", 1, "2024-01-01 00:00:00", 51.5, -0.12),
        ("b", 2, "2024-01-01 02:00:00", 48.85, 2.35),
    ])
    out = {(r["actor"], r["event_id" if False else "ts"].hour): r
           for r in impossible_travel(df).collect()}
    a = out[("a", 2)]
    assert a["impossible"] and 16500 < a["km"] < 17200
    b = out[("b", 2)]
    assert not b["impossible"] and 330 < b["km"] < 350


def test_travel_zero_dt_never_divides(spark):
    df = _logins(spark, [
        ("a", 1, "2024-01-01 00:00:00", 0.0, 0.0),
        ("a", 2, "2024-01-01 00:00:00", 50.0, 50.0),  # same second
    ])
    rows = sorted(impossible_travel(df).collect(), key=lambda r: r["km"] or -1)
    assert rows[0]["prev_ts"] is None and not rows[0]["impossible"]
    assert rows[1]["speed_kmh"] is None and not rows[1]["impossible"]
