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
