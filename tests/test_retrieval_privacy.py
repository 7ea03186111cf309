"""BM25 retrieval and k-anonymity suppression."""

import math

import pytest


@pytest.fixture(scope="module")
def tiny_corpus(spark):
    rows = [
        (1, "spark join spark join spark"),
        (2, "spark window agg"),
        (3, "merge sort batch line"),
        (4, "the quick brown fox"),
    ]
    return rows, spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_matches_closed_form(tiny_corpus):
    from hatchery_spark.functions.corpus import bm25_topk

    rows, df = tiny_corpus
    k1, b = 1.2, 0.75
    docs = {d: t.lower().split() for d, t in rows}
    n = len(docs)
    avgdl = sum(map(len, docs.values())) / n
    terms = ["join", "spark"]

    def score(d):
        s = 0.0
        for t in terms:
            tf = docs[d].count(t)
            if not tf:
                continue
            dft = sum(1 for v in docs.values() if t in v)
            idf = math.log(1 + (n - dft + 0.5) / (dft + 0.5))
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(docs[d]) / avgdl))
        return round(s, 4)

    out = bm25_topk(df, "spark join", k=10).collect()
    got = {r.doc_id: r.score for r in out}
    assert got == {d: score(d) for d in (1, 2)}  # only docs hitting a term
    # ranking: doc 1 (both terms, high tf) above doc 2
    assert [r.doc_id for r in out] == [1, 2]
    assert {r.doc_id: r.n_terms_hit for r in out} == {1: 2, 2: 1}


def test_bm25_k_cut_and_ties(tiny_corpus):
    from hatchery_spark.functions.corpus import bm25_topk

    _, df = tiny_corpus
    assert len(bm25_topk(df, "spark join", k=1).collect()) == 1


def test_k_anonymize_suppresses_small_cohorts(spark):
    from hatchery_spark.functions.text import k_anonymize

    rows = [(i, "en", "web") for i in range(6)]  # cohort of 6: kept
    rows += [(100, "fr", "web"), (101, "fr", "web")]  # cohort of 2: suppressed
    rows += [(200, None, "web")]  # NULL cohort of 1: suppressed
    df = spark.createDataFrame(rows, "doc_id long, lang string, source string")
    out = {r.doc_id: r for r in k_anonymize(df, ["lang", "source"], k=3).collect()}
    assert out[0].lang == "en" and not out[0].suppressed and out[0].group_n == 6
    assert out[100].lang == "[SUPPRESSED]" and out[100].source == "[SUPPRESSED]"
    assert out[100].group_n == 2 and out[100].suppressed
    assert out[200].lang == "[SUPPRESSED]" and out[200].suppressed
    assert len(out) == 9  # NULL row not orphaned by the rejoin


def test_k_anonymize_null_cohort_groups_together(spark):
    from hatchery_spark.functions.text import k_anonymize

    rows = [(i, None, "web") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, source string")
    out = k_anonymize(df, ["lang", "source"], k=3).collect()
    assert all(r.group_n == 4 and not r.suppressed for r in out)
    assert all(r.lang is None for r in out)  # kept branch preserves NULL


def test_hybrid_topk_matches_bruteforce_rrf(spark):
    """RRF fusion equals the closed form computed from independent
    brute-force BM25 and cosine rankings, including a doc present in only
    one ranker's pool."""
    import math

    from hatchery_spark.functions.corpus import bm25_topk, hybrid_topk
    from hatchery_spark.functions.similarity import cosine_topk

    docs = [
        (0, "spark join join planner"),
        (1, "spark window window window merge"),
        (2, "totally unrelated prose about cats"),
        (3, "hash join merge spark"),
    ]
    vecs = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),
        (2, [0.95, 0.05]),   # lexically irrelevant but dense-similar
        (3, [0.0, 1.0]),
    ]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    vdf = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    query, qv, pool, krrf = "spark join", [1.0, 0.0], 3, 60

    bm_rank = {
        r.doc_id: i + 1
        for i, r in enumerate(bm25_topk(ddf, query, k=pool).collect())
    }
    qdf = spark.createDataFrame(
        [(0, qv)], "query_id long, embedding array<double>"
    )
    cs_rank = {
        r.vec_id: r.rank for r in cosine_topk(vdf, qdf, k=pool).collect()
    }
    expect = {}
    for d in set(bm_rank) | set(cs_rank):
        s = 0.0
        if d in bm_rank:
            s += 1.0 / (krrf + bm_rank[d])
        if d in cs_rank:
            s += 1.0 / (krrf + cs_rank[d])
        expect[d] = round(s * 10**6) / 10**6

    got = hybrid_topk(ddf, vdf, query, qv, k=4, k_rrf=krrf, pool=pool).collect()
    assert {r.doc_id: r.rrf_score for r in got} == pytest.approx(expect)
    # doc 2 is in the dense pool only -> its bm25_rank is NULL, score still set
    row2 = next(r for r in got if r.doc_id == 2)
    assert row2.bm25_rank is None and row2.cosine_rank is not None
    # fused order puts the doubly-ranked docs first
    assert got[0].bm25_rank is not None and got[0].cosine_rank is not None


def test_search_all_terms_and_semantics(spark):
    from hatchery_spark.functions.corpus import (
        inverted_postings,
        search_all_terms,
    )

    docs = [
        (0, "spark join window spark"),      # all three, spark twice
        (1, "spark join only"),              # missing window
        (2, "window join spark extra words"),
        (3, "nothing relevant at all"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    p = inverted_postings(df)
    got = {r.doc_id: r.total_tf
           for r in search_all_terms(p, ["Spark", "join", "window"]).collect()}
    assert got == {0: 4, 2: 3}  # doc 0: 2+1+1; doc 1 and 3 excluded

    import pytest
    with pytest.raises(ValueError):
        search_all_terms(p, [])


def test_inverted_index_bucketed_lookup_prunes_buckets(spark, tmp_path):
    """Materialized via write_bucketed_table, a term lookup reads only the
    query terms' buckets (SelectedBucketsCount in the scan) — the
    100TB-index lookup path."""
    import pyspark.sql.functions as F
    from hatchery_spark.functions.corpus import inverted_postings
    from hatchery_spark.sinks import write_bucketed_table

    docs = spark.createDataFrame(
        [(i, f"token{i % 40} common filler text") for i in range(200)],
        "doc_id long, text string",
    )
    spark.sql("DROP TABLE IF EXISTS inv_idx")
    write_bucketed_table(
        inverted_postings(docs), "inv_idx", ["token"], 16,
        path=str(tmp_path / "idx"),
    )
    # autoBucketedScan drops bucketed reading for plain filter queries (no
    # shuffle to avoid), which also skips bucket PRUNING — turn it off so
    # the lookup path actually uses the bucket layout
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        scan = spark.table("inv_idx").filter(
            F.col("token").isin(["token3", "token7"])
        )
        plan = scan._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    assert "SelectedBucketsCount" in plan, plan
    sel = [ln for ln in plan.splitlines() if "SelectedBucketsCount" in ln][0]
    import re
    n_sel = int(re.search(r"SelectedBucketsCount: (\d+) out of", sel).group(1))
    assert n_sel <= 2
    assert scan.count() == 10  # 5 docs per token value


def test_k_anonymize_delimiter_bytes_do_not_merge_cohorts(spark):
    # struct cohort key: values containing \x01/\x00 (the old composite-key
    # delimiter/sentinel bytes) must NOT merge distinct quasi combinations —
    # a merged cohort inflates group_n and under-suppresses in a privacy gate
    from hatchery_spark.functions.text import k_anonymize

    rows = (
        [(f"a{i}", "a\x01b", "c") for i in range(3)]      # cohort of 3: kept
        + [(f"b{i}", "a", "b\x01c") for i in range(2)]    # cohort of 2: suppressed
        + [("n0", None, "x"), ("n1", "\x00", "x")]        # NULL vs literal NUL
    )
    df = spark.createDataFrame(rows, "doc_id string, lang string, source string")
    out = {r.doc_id: r for r in k_anonymize(df, ["lang", "source"], k=3).collect()}
    assert not out["a0"].suppressed and out["a0"].group_n == 3
    assert out["b0"].suppressed and out["b0"].group_n == 2
    # NULL and the literal "\x00" string are DIFFERENT cohorts (size 1 each)
    assert out["n0"].group_n == 1 and out["n1"].group_n == 1


def test_search_phrase_overlaps_and_dup_terms(spark):
    from hatchery_spark.functions.corpus import (
        positional_postings,
        search_phrase,
    )

    docs = spark.createDataFrame(
        [
            (1, "a a a b"),        # "a a" overlaps: positions 0,1 → 2 matches
            (2, "A a"),            # case-insensitive, at boundary
            (3, "a b a"),          # no adjacent "a a"
            (4, "x y z x y"),      # trigram once, bigram "x y" twice
        ],
        "doc_id long, text string",
    )
    p = positional_postings(docs)
    aa = {r.doc_id: r.n_matches for r in search_phrase(p, "a a").collect()}
    assert aa == {1: 2, 2: 1}
    xyz = {r.doc_id: r.n_matches
           for r in search_phrase(p, "x y z").collect()}
    assert xyz == {4: 1}
    xy = {r.doc_id: r.n_matches for r in search_phrase(p, "x y").collect()}
    assert xy == {4: 2}
    assert search_phrase(p, "z q").count() == 0


def test_hard_negatives_excludes_positive_and_ranks(spark):
    from hatchery_spark.functions.corpus import hard_negatives

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon"),   # the query doc
            (1, "alpha beta gamma filler filler"),   # shares 3 terms
            (2, "alpha filler filler filler filler"),  # shares 1 term
            (3, "zzz yyy xxx www vvv"),              # shares none
        ],
        "doc_id long, text string",
    )
    out = hard_negatives(docs, every=7, qlen=5, k_neg=3).collect()
    assert all(r.query_id == 0 and r.pos_id == 0 for r in out)
    assert all(r.neg_id != 0 for r in out)           # positive excluded
    by_rank = sorted(out, key=lambda r: r.neg_rank)
    assert [r.neg_id for r in by_rank] == [1, 2]     # 3 never matches
    assert by_rank[0].score > by_rank[1].score       # more overlap = harder
