"""Frequent-itemset mining (operators/itemsets.py)."""
from __future__ import annotations

from itertools import combinations

import pytest
from pyspark.sql import functions as F


def _brute(baskets, thr, max_size):
    """All itemsets with support >= thr via direct enumeration."""
    from collections import Counter

    sets = [frozenset(b) for b in baskets]
    items = sorted({i for b in sets for i in b})
    out = {}
    for sz in range(1, max_size + 1):
        for combo in combinations(items, sz):
            s = sum(1 for b in sets if set(combo) <= b)
            if s >= thr:
                out[combo] = s
    return out


def _collect(df):
    got = {}
    for r in df.collect():
        combo = tuple(x for x in (r["i1"], r["i2"], r["i3"]) if x is not None)
        assert len(combo) == r["sz"]
        got[combo] = r["support"]
    return got


def test_itemsets_vs_bruteforce(spark):
    from hatchery_spark.operators.itemsets import frequent_itemsets

    baskets = [
        ("b1", ["a", "b", "c"]),
        ("b2", ["a", "b"]),
        ("b3", ["a", "c", "d"]),
        ("b4", ["b", "c"]),
        ("b5", ["a", "b", "c", "e"]),
    ]
    rows = [(bk, i) for bk, items in baskets for i in items]
    df = spark.createDataFrame(rows, "conv_id string, it string")
    # 40% of 5 baskets -> thr = 2
    got = _collect(frequent_itemsets(df, F.col("it"), min_support_pct=40))
    exp = _brute([i for _, i in baskets], 2, 3)
    assert got == exp
    # a 60% floor (thr=3) must prune ("a","c","d")-style singleton-support sets
    got60 = _collect(frequent_itemsets(df, F.col("it"), min_support_pct=60))
    assert got60 == _brute([i for _, i in baskets], 3, 3)
    assert ("a", "b", "c") in got and got[("a", "b", "c")] == 2


def test_itemsets_duplicate_rows_count_once_per_basket(spark):
    from hatchery_spark.operators.itemsets import frequent_itemsets

    rows = [("b1", "x")] * 5 + [("b2", "x")]
    df = spark.createDataFrame(rows, "conv_id string, it string")
    got = _collect(frequent_itemsets(df, F.col("it"), min_support_pct=50, max_size=1))
    assert got == {("x",): 2}


def test_itemsets_max_size_validation(spark):
    from hatchery_spark.operators.itemsets import frequent_itemsets

    df = spark.createDataFrame([("b", "x")], "conv_id string, it string")
    with pytest.raises(ValueError):
        frequent_itemsets(df, F.col("it"), max_size=4)


# ------------------------------------------------------- sequence matching


def test_sequence_match_order_and_overlap(spark):
    from hatchery_spark.operators.transcripts import sequence_match

    # turn order is shuffled in the input; codes in turn_idx order: "ttattta"
    rows = [
        ("c1", 3, "tool"), ("c1", 0, "tool"), ("c1", 1, "tool"),
        ("c1", 2, "assistant"), ("c1", 4, "tool"), ("c1", 5, "tool"),
        ("c1", 6, "assistant"),
        ("c2", 0, "user"), ("c2", 1, "assistant"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string")
    got = {r["conv_id"]: (r["n_matches"], r["matches"]) for r in
           sequence_match(df, r"t{2,}a").collect()}
    # non-overlapping, greedy, left to right: "tta" then "ttta"
    assert got == {"c1": (2, ["tta", "ttta"])}


def test_sequence_match_custom_code(spark):
    from pyspark.sql import functions as F

    from hatchery_spark.operators.transcripts import sequence_match

    rows = [("c1", 0, "x"), ("c1", 1, "y"), ("c1", 2, "x")]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, tool string")
    got = sequence_match(df, "xyx", code=F.col("tool")).collect()
    assert len(got) == 1 and got[0]["matches"] == ["xyx"]
