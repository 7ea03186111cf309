"""Fellegi-Sunter record linkage (functions/linkage.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hatchery_spark.functions.linkage import (
    MATCH_T,
    fs_link,
    person_records,
    perturbed_records,
)

CUST_SCHEMA = "c_custkey long, c_nationkey int"


def _cust(spark, n=120):
    return spark.createDataFrame(
        [(k, k % 25) for k in range(1, n + 1)], CUST_SCHEMA
    )


def _linked(spark):
    c = _cust(spark)
    return fs_link(person_records(c), perturbed_records(c)).collect()


def test_truth_recovery_dominates(spark):
    rows = _linked(spark)
    assert rows, "blocking produced no candidates"
    match = [r for r in rows if r.cls == "match"]
    # a solid fraction of dirty records survive both perturbation gates
    # well enough to classify as matches, and classified matches should
    # overwhelmingly be the true entity
    assert len(match) >= len(rows) // 4
    correct = sum(1 for r in match if r.correct)
    assert correct / len(match) > 0.9


def test_exact_duplicates_score_as_match(spark):
    c = _cust(spark, n=40)
    clean = person_records(c)
    dirty = clean.select(
        F.regexp_replace("rec_id", "^c-", "d-").alias("rec_id"),
        "src_key", "first", "last", "phone", "nation",
    )
    rows = fs_link(clean, dirty).collect()
    assert len(rows) == 40
    for r in rows:
        assert r.cls == "match" and r.score >= MATCH_T
        assert r.name_lvl == 2 and r.phone_lvl == 2 and r.nation_ok
        assert r.correct


def test_scores_are_weight_sums(spark):
    from hatchery_spark.functions.linkage import W_NAME, W_NATION, W_PHONE

    for r in _linked(spark):
        expect = (
            W_NAME[r.name_lvl]
            + W_PHONE[r.phone_lvl]
            + W_NATION[r.nation_ok]
        )
        assert r.score == expect


def test_one_best_candidate_per_dirty_record(spark):
    rows = _linked(spark)
    ids = [r.dirty_id for r in rows]
    assert len(ids) == len(set(ids))


def test_partial_agreement_levels_all_appear(spark):
    rows = _linked(spark)
    assert {r.name_lvl for r in rows} >= {1, 2}  # char-drop → soundex level
    assert {r.phone_lvl for r in rows} >= {1, 2}  # late bump → prefix level
