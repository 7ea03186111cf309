"""Bloom decontamination: superset-of-exact, replayable FPs, zero shuffle."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hatchery_spark.functions.dedup import (
    _bloom_positions,
    _distinct_word_ngrams,
    bloom_decontaminate,
    build_bloom_bitmap,
    ngram_decontaminate,
)


def test_ngrams_match_oracle_tokenization():
    # truncated gram for short docs; leading whitespace keeps the empty token
    assert _distinct_word_ngrams("a b c", 5) == ["a b c"]
    assert _distinct_word_ngrams("a b c d e f", 5) == ["a b c d e", "b c d e f"]
    assert _distinct_word_ngrams(" x y", 5) == [" x y"]
    assert _distinct_word_ngrams(None, 5) == [""]


def test_positions_are_md5_slices():
    import hashlib

    pos = _bloom_positions(["hello world"], 1 << 16, 3)[0]
    h = hashlib.md5(b"hello world").hexdigest()
    assert [int(p) for p in pos] == [int(h[8 * s : 8 * s + 8], 16) % (1 << 16)
                                     for s in range(3)]
    with pytest.raises(ValueError):
        _bloom_positions(["x"], 1 << 16, 5)


def test_bitmap_build_matches_direct_positions(spark):
    texts = [(i, f"tok{i} tok{i+1} tok{i+2} tok{i+3} tok{i+4} tok{i+5}")
             for i in range(40)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    bm = build_bloom_bitmap(df, m_bits=1 << 12, k_hashes=3)
    grams = sorted({g for _, t in texts for g in _distinct_word_ngrams(t, 5)})
    pos = _bloom_positions(grams, 1 << 12, 3).ravel()
    want = np.zeros(1 << 9, dtype=np.uint8)
    np.bitwise_or.at(want, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
    assert (bm == want).all()


def test_bloom_is_superset_of_exact_and_fps_exist(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 17 == 0)
    train = docs.filter(F.col("doc_id") % 17 != 0)
    exact = ngram_decontaminate(train, bench, n=5).toPandas().set_index("doc_id")
    # small m forces a measurable FP rate; a huge m should converge to exact
    small = (bloom_decontaminate(train, bench, n=5, m_bits=1 << 12, k_hashes=3)
             .toPandas().set_index("doc_id"))
    big = (bloom_decontaminate(train, bench, n=5, m_bits=1 << 24, k_hashes=3)
           .toPandas().set_index("doc_id"))
    assert (small["total_grams"].sort_index() == exact["total_grams"].sort_index()).all()
    # Bloom never misses a true contamination (no false negatives)
    for frame in (small, big):
        joined = exact.join(frame, rsuffix="_bloom")
        assert (joined["matched_grams_bloom"] >= joined["matched_grams"]).all()
        assert (~(joined["contaminated"] & ~joined["contaminated_bloom"])).all()
    # the deliberately-small filter over-flags (FPs exist and are deterministic)
    assert small["matched_grams"].sum() > exact["matched_grams"].sum()
    # at m=2^24 the FP rate for a few thousand grams is ~0 → exact agreement
    assert (big["matched_grams"].sort_index() == exact["matched_grams"].sort_index()).all()


def test_corpus_side_plan_has_no_exchange(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 17 == 0)
    train = docs.filter(F.col("doc_id") % 17 != 0)
    out = bloom_decontaminate(train, bench, n=5, m_bits=1 << 12, k_hashes=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # ONE scan + mapInPandas + project, no shuffle


# ------------------------------------------------------------- bloom join


def test_bloom_join_equals_plain_join(spark):
    from pyspark.sql import functions as F

    from hatchery_spark.operators.joins import bloom_join

    big = spark.range(2000).select(
        (F.col("id") % 500).alias("k"), (F.col("id") * 3).alias("v")
    )
    small = spark.range(40).select(
        (F.col("id") * 7).alias("sk"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    got = (
        bloom_join(big, small, "k", "sk", m_bits=1 << 7)
        .select("k", "v", "name")
        .collect()
    )
    exp = (
        big.join(small, big["k"] == small["sk"]).select("k", "v", "name").collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, exp))
    assert len(exp) > 0


def test_bloom_prefilter_drops_nonmatches_keeps_matches(spark):
    from pyspark.sql import functions as F

    from hatchery_spark.operators.joins import build_key_bloom
    import numpy as np

    from hatchery_spark.functions.dedup import _bloom_positions

    small = spark.range(50).select(F.col("id").alias("sk"))
    bm = build_key_bloom(small, "sk", m_bits=1 << 10, k_hashes=3)
    # every true key must pass (no false negatives)
    pos = _bloom_positions([str(i) for i in range(50)], 1 << 10, 3)
    assert ((bm[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1).all()
    # most of a disjoint key range must be rejected
    pos2 = _bloom_positions([str(i) for i in range(10_000, 11_000)], 1 << 10, 3)
    hit = ((bm[pos2 >> 3] >> (pos2 & 7).astype(np.uint8)) & 1).all(axis=1)
    assert hit.mean() < 0.10


def test_bloom_join_null_keys_dropped(spark):
    from hatchery_spark.operators.joins import bloom_join

    big = spark.createDataFrame(
        [(1, "a"), (None, "b"), (2, "c")], "k long, v string"
    )
    small = spark.createDataFrame([(1, "x"), (None, "y")], "sk long, w string")
    got = bloom_join(big, small, "k", "sk").select("k", "v", "w").collect()
    assert sorted(map(tuple, got)) == [(1, "a", "x")]
