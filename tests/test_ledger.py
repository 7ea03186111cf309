"""Hash-chain ledger: fold order, divergence localization, clean pass."""

import hashlib

from pyspark.sql import functions as F

from hatchery_spark.operators.ledger import build_ledger, tamper, verify_ledger

SCHEMA = "conv_id string, turn_idx int, text string"


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_chain_matches_reference_fold(spark):
    df = spark.createDataFrame(
        [("conv-1", 0, "a"), ("conv-1", 1, "b"), ("conv-1", 2, "c")], SCHEMA
    )
    [r] = build_ledger(df).collect()
    h = _md5("conv-1")
    prefixes = []
    for t in "abc":
        h = _md5(h + _md5(t))
        prefixes.append(h)
    assert r.head_hash == prefixes[-1]
    assert list(r.prefix_hashes) == prefixes and r.n_turns == 3


def test_clean_log_verifies(spark):
    df = spark.createDataFrame(
        [("conv-2", 0, "x"), ("conv-2", 1, "y")], SCHEMA
    )
    [r] = verify_ledger(build_ledger(df), df).collect()
    assert not r.tampered and r.first_bad_turn is None


def test_tamper_localizes_first_bad_turn(spark):
    df = spark.createDataFrame(
        [("conv-9", i, f"t{i}") for i in range(5)], SCHEMA
    )
    edited = df.withColumn(
        "text",
        F.when(F.col("turn_idx") == 2, F.lit("EVIL")).otherwise(F.col("text")),
    )
    [r] = verify_ledger(build_ledger(df), edited).collect()
    assert r.tampered and r.first_bad_turn == 2   # 3,4 diverge too; min wins


def test_tamper_fixture_hits_expected_convs(spark):
    rows = [(f"conv-{u}", i, f"w{u}:{i}") for u in (5, 6, 18) for i in range(4)]
    df = spark.createDataFrame(rows, SCHEMA)
    out = {r.conv_id: r for r in
           verify_ledger(build_ledger(df), tamper(df)).collect()}
    assert out["conv-5"].tampered and out["conv-5"].first_bad_turn == 0   # 5%5=0
    assert out["conv-18"].tampered and out["conv-18"].first_bad_turn == 3  # 18%5=3
    assert not out["conv-6"].tampered


def test_no_udf_in_plan(spark):
    df = spark.createDataFrame([("conv-1", 0, "a")], SCHEMA)
    plan = (
        verify_ledger(build_ledger(df), df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
