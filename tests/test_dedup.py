import pytest
from pyspark.sql import functions as F

from hatchery_spark.functions import dedup as dd

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 0
    (2, "the quick brown fox jumps over the lazy dog near the river bank tonight"),  # near dup
    (3, "completely different text about spark dataframes and shuffle partitions"),
    (4, "another unrelated document mentioning broadcast joins and aqe settings"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def test_exact_dedup(spark, docs):
    out = dd.exact_dedup(docs)
    rows = {r.doc_id: r.dup_count for r in out.collect()}
    assert rows == {0: 2, 2: 1, 3: 1, 4: 1}


def test_char_shingles(spark):
    df = spark.createDataFrame([("abcdef",)], "text string")
    sh = df.select(dd.char_shingles(F.col("text"), 3).alias("s")).first().s
    assert sorted(sh) == ["abc", "bcd", "cde", "def"]


def test_minhash_finds_near_dups(spark, docs):
    pairs = dd.minhash_dedup(docs, threshold=0.5)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (0, 1) in got  # exact dup always found
    assert (0, 2) in got or (1, 2) in got  # near dup found
    # unrelated docs never paired
    assert not any(3 in p or 4 in p for p in got if p not in {(3, 4)})


def test_minhash_exact_dup_jaccard_is_one(spark, docs):
    pairs = {(r.id_a, r.id_b): r.jaccard for r in dd.minhash_dedup(docs, threshold=0.5).collect()}
    assert pairs[(0, 1)] == 1.0


def test_simhash_deterministic_and_groups_dups(spark, docs):
    sh = docs.select("doc_id", dd.simhash64(F.col("text")).alias("s")).collect()
    vals = {r.doc_id: r.s for r in sh}
    assert vals[0] == vals[1]  # identical text → identical simhash
    cands = {(r.id_a, r.id_b) for r in dd.simhash_candidates(docs).collect()}
    assert (0, 1) in cands


def test_ngram_jaccard(spark, docs):
    pairs = spark.createDataFrame([(0, 1), (0, 3)], "id_a long, id_b long")
    out = {(r.id_a, r.id_b): r.ngram_jaccard for r in dd.ngram_jaccard_pairs(docs, pairs).collect()}
    assert out[(0, 1)] == 1.0
    assert out[(0, 3)] == 0.0


def test_bucket_cap_applies(spark):
    # 60 identical docs all share every band bucket; cap 10 drops those buckets
    many = spark.createDataFrame(
        [(i, "same text everywhere for all docs") for i in range(60)],
        "doc_id long, text string",
    )
    capped = dd.minhash_lsh_candidates(many, max_bucket=10)
    assert capped.count() == 0
    uncapped = dd.minhash_lsh_candidates(many, max_bucket=1000)
    assert uncapped.count() == 60 * 59 // 2


def test_bucket_cap_is_observable(spark):
    """The cap is never silent: return_stats=True reports how many buckets
    (and member rows) the cap dropped, via a single-row aggregate — no
    per-bucket driver collect."""
    many = spark.createDataFrame(
        [(i, "same text everywhere for all docs") for i in range(60)],
        "doc_id long, text string",
    )
    capped, stats = dd.minhash_lsh_candidates(
        many, max_bucket=10, bands=8, return_stats=True
    )
    assert capped.count() == 0
    # 60 identical docs share one bucket per band → 8 capped buckets, each
    # holding all 60 members
    assert stats == {"capped_buckets": 8, "capped_rows": 60 * 8}

    uncapped, ustats = dd.minhash_lsh_candidates(
        many, max_bucket=1000, return_stats=True
    )
    assert uncapped.count() == 60 * 59 // 2
    assert ustats["capped_buckets"] == 0


def test_exact_dedup_window_matches_rejoin(spark):
    """One-shuffle window variant returns the same rows/columns as the
    groupBy+rejoin form."""
    docs = spark.createDataFrame(
        [(3, "a"), (1, "a"), (2, "b"), (4, "c"), (5, "c"), (6, "c")],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, dd.exact_dedup(docs).collect()))
    b = sorted(map(tuple, dd.exact_dedup_window(docs).collect()))
    assert a == b
    assert dd.exact_dedup_window(docs).columns == dd.exact_dedup(docs).columns


def test_incremental_exact_dedup_across_batches(spark):
    """Novel rows = first-in-batch AND never seen before; the digest store
    grows by exactly the novel texts."""
    from hatchery_spark.functions.dedup import digest_store, incremental_exact_dedup

    batch1 = spark.createDataFrame(
        [(0, "alpha"), (1, "beta"), (2, "alpha")], "doc_id long, text string"
    )
    seen = digest_store(batch1)
    assert seen.count() == 2

    batch2 = spark.createDataFrame(
        [(10, "beta"), (11, "gamma"), (12, "gamma"), (13, "delta")],
        "doc_id long, text string",
    )
    novel, updated = incremental_exact_dedup(batch2, seen)
    got = sorted(r.doc_id for r in novel.collect())
    assert got == [11, 13]  # beta seen before; gamma deduped within batch
    assert updated.count() == 4  # alpha beta gamma delta

    # a third batch of only repeats yields nothing new
    batch3 = spark.createDataFrame([(20, "alpha"), (21, "delta")], "doc_id long, text string")
    novel3, updated3 = incremental_exact_dedup(batch3, updated)
    assert novel3.isEmpty() and updated3.count() == 4


def test_ngram_decontaminate_flags_overlap(spark):
    """A training doc sharing a word 5-gram with the benchmark is flagged
    with the exact distinct-gram hit count; clean and short docs are kept
    with zero matches."""
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            # shares "quick brown fox jumps over" and 2 more benchmark 5-grams
            (0, "a quick brown fox jumps over the lazy cat"),
            (1, "totally different words with no overlap at all here"),
            (2, "short doc"),  # < 5 tokens: one truncated gram, no match
            (3, ""),  # empty: one empty-token gram, no match
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.asDict()
        for r in dd.ngram_decontaminate(train, bench, n=5).collect()
    }
    assert out[0]["contaminated"] and out[0]["matched_grams"] == 3
    assert not out[1]["contaminated"] and out[1]["matched_grams"] == 0
    assert not out[2]["contaminated"] and out[2]["total_grams"] == 1
    assert not out[3]["contaminated"] and out[3]["total_grams"] == 1
    assert set(out) == {0, 1, 2, 3}


def test_gram_hash_java_split_parity(spark):
    """Leading whitespace produces a leading '' token (Java/DuckDB split
    semantics), trailing whitespace produces none — the Arrow hasher must
    count exactly the grams `word_ngrams` would."""
    docs = spark.createDataFrame(
        [(0, " a b c d e f"), (1, "a b c d e f  ")],
        "doc_id long, text string",
    )
    expected = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", F.size(dd.word_ngrams(F.col("text"), 5)).alias("n")
        ).collect()
    }
    got = {
        r.doc_id: r.total_grams
        for r in dd.ngram_decontaminate(
            docs, docs.limit(0), n=5
        ).collect()
    }
    assert got == expected  # limit=-1 split: both docs 7 tokens, 3 grams
