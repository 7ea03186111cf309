"""Incremental aggregate maintenance, PII extraction, curriculum interleave."""

import pyspark.sql.functions as F
import pytest

from hatchery_spark.functions.sampling import interleave_sources
from hatchery_spark.functions.text import extract_pii_entities
from hatchery_spark.operators.incremental import (
    merge_aggregates,
    partial_aggregates,
)

MEASURES = {
    "n": ("count", "v"),
    "s": ("sum", "v"),
    "lo": ("min", "v"),
    "hi": ("max", "v"),
}


@pytest.fixture(scope="module")
def rows(spark):
    return spark.createDataFrame(
        [(i, f"k{i % 3}", float(i * 7 % 50)) for i in range(200)],
        "id long, k string, v double",
    )


def test_merge_equals_full_recompute(rows):
    base = partial_aggregates(rows.filter(F.col("id") < 150), ["k"], MEASURES)
    batch = partial_aggregates(rows.filter(F.col("id") >= 150), ["k"], MEASURES)
    merged = {r.k: r for r in merge_aggregates(base, batch, ["k"], MEASURES).collect()}
    full = {r.k: r for r in partial_aggregates(rows, ["k"], MEASURES).collect()}
    assert merged.keys() == full.keys()
    for k in full:
        assert tuple(merged[k]) == tuple(full[k])


def test_merge_new_and_untouched_keys(spark, rows):
    base = partial_aggregates(rows, ["k"], MEASURES)
    batch = spark.createDataFrame(
        [(1000, "k_new", 5.0), (1001, "k0", 49.0)], "id long, k string, v double"
    )
    merged = {r.k: r for r in merge_aggregates(
        base, partial_aggregates(batch, ["k"], MEASURES), ["k"], MEASURES
    ).collect()}
    full = {r.k: r for r in partial_aggregates(rows, ["k"], MEASURES).collect()}
    assert merged["k_new"].n == 1 and merged["k_new"].s == 5.0
    assert merged["k1"] == full["k1"]  # untouched key passes through
    assert merged["k0"].n == full["k0"].n + 1
    assert merged["k0"].hi == 49.0


def test_unmergeable_kind_rejected(rows):
    with pytest.raises(ValueError, match="not mergeable"):
        partial_aggregates(rows, ["k"], {"d": ("count_distinct", "v")})


def test_pii_extraction_multiplicity(spark):
    df = spark.createDataFrame(
        [
            (0, "mail a@b.com twice a@b.com ip 10.0.0.1 card 4111222233334444"),
            (1, None),
            (2, "clean text"),
        ],
        "doc_id long, text string",
    )
    out = extract_pii_entities(df).collect()
    got = sorted((r.doc_id, r.kind, r.value) for r in out)
    assert got == [
        (0, "email", "a@b.com"),
        (0, "email", "a@b.com"),
        (0, "ipv4", "10.0.0.1"),
        (0, "longnum", "4111222233334444"),
    ]


def test_interleave_round_robin(spark):
    docs = spark.createDataFrame(
        [(i, ["a", "b", "c"][i % 3]) for i in range(30)] + [(100, "a")],
        "doc_id long, source string",
    )
    out = interleave_sources(docs).collect()
    assert len(out) == 31
    pos = sorted(r.pos for r in out)
    assert len(set(pos)) == 31  # total order, no collisions
    by_pos = sorted(out, key=lambda r: r.pos)
    # the first S positions are one doc from each source, round-robin
    assert [r.source for r in by_pos[:3]] == ["a", "b", "c"]
    # within a source, rank follows the md5 shuffle (deterministic)
    again = interleave_sources(docs.repartition(5)).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
