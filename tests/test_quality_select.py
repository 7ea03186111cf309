"""NB quality classifier and DSIR importance resampling."""

import hashlib
import math

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # reference class (pos=True): clean prose vocabulary
        (1, True, "good clean prose text here"),
        (2, True, "clean prose reads well here"),
        (3, True, "good text reads well"),
        # crawl class: spam vocabulary
        (4, False, "spam junk click buy now"),
        (5, False, "buy spam click junk offer"),
        (6, False, "junk offer now click"),
    ]
    return spark.createDataFrame(rows, "doc_id long, pos boolean, text string")


def _train(corpus):
    from hatchery_spark.functions.corpus import nb_quality_train

    return nb_quality_train(corpus, F.col("pos"))


def test_nb_separates_classes(spark, corpus):
    from hatchery_spark.functions.corpus import nb_quality_score

    counts, stats = _train(corpus)
    score_df = spark.createDataFrame(
        [(10, "clean prose here"), (11, "buy spam junk"), (12, "zzz qqq")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in nb_quality_score(score_df, counts, stats).collect()}
    assert out[10].nb_logit > 0 > out[11].nb_logit
    assert out[10].n_tokens == 3
    # all-unseen doc: finite score (pure prior + normalizer), no crash
    assert math.isfinite(out[12].nb_logit)


def test_nb_matches_closed_form(spark, corpus):
    from hatchery_spark.functions.corpus import nb_quality_score

    counts, stats = _train(corpus)
    rows = [(r[0], r[1], r[2]) for r in corpus.collect()]
    tok_counts = {}
    for _, pos, text in rows:
        for t in text.lower().split():
            cp, cn = tok_counts.get(t, (0, 0))
            tok_counts[t] = (cp + pos, cn + (not pos))
    n_pos = sum(c[0] for c in tok_counts.values())
    n_neg = sum(c[1] for c in tok_counts.values())
    v = len(tok_counts)
    d_pos = sum(1 for r in rows if r[1])
    d_neg = len(rows) - d_pos

    def logit(text):
        s = math.log((d_pos + 1) / (d_neg + 1))
        for t in text.lower().split():
            cp, cn = tok_counts.get(t, (0, 0))
            s += math.log(cp + 1) - math.log(n_pos + v)
            s -= math.log(cn + 1) - math.log(n_neg + v)
        return round(s, 4)

    score_df = spark.createDataFrame(
        [(20, "good clean spam"), (21, "click click prose")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.nb_logit for r in nb_quality_score(score_df, counts, stats).collect()}
    assert abs(got[20] - logit("good clean spam")) < 1e-9
    assert abs(got[21] - logit("click click prose")) < 1e-9


# --------------------------------------------------------------------- DSIR


@pytest.fixture(scope="module")
def dsir_pool(spark):
    rows = [(i, True, "alpha beta alpha beta alpha") for i in range(8)]
    rows += [(100 + i, False, f"alpha beta alpha pad{i}") for i in range(4)]
    rows += [(200 + i, False, f"gamma delta gamma pad{i}") for i in range(4)]
    return spark.createDataFrame(rows, "doc_id long, is_target boolean, text string")


def test_dsir_weights_favor_target_like_docs(dsir_pool):
    from hatchery_spark.functions.corpus import dsir_importance

    w = {
        r.doc_id: r.log_w
        for r in dsir_importance(dsir_pool, F.col("is_target"), n_buckets=512).collect()
    }
    assert set(w) == {100 + i for i in range(4)} | {200 + i for i in range(4)}
    # every alpha-like raw doc outweighs every gamma-like raw doc
    assert min(w[100 + i] for i in range(4)) > max(w[200 + i] for i in range(4))


def test_dsir_resample_is_gumbel_topk_and_deterministic(dsir_pool):
    from hatchery_spark.functions.corpus import dsir_importance, dsir_resample

    w = dsir_importance(dsir_pool, F.col("is_target"), n_buckets=512)
    sel = dsir_resample(w, dsir_pool, k=5)
    got = [r.doc_id for r in sel.collect()]
    assert len(got) == 5

    # replicate the gumbel key host-side from the operator's own weights
    texts = {r.doc_id: r.text for r in dsir_pool.collect()}
    keys = {}
    for r in w.collect():
        h = int(hashlib.md5(texts[r.doc_id].encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / 2**32
        keys[r.doc_id] = round(r.log_w - math.log(-math.log(u)), 4)
    expect = [d for d, _ in sorted(keys.items(), key=lambda kv: (-kv[1], -kv[0]))[:5]]
    assert got == expect

    shuf = [r.doc_id for r in dsir_resample(w, dsir_pool.repartition(9), k=5).collect()]
    assert shuf == got


def test_dsir_single_token_doc_has_no_bigrams(spark):
    from hatchery_spark.functions.corpus import dsir_importance

    df = spark.createDataFrame(
        [(1, True, "alpha beta"), (2, False, "alpha")],
        "doc_id long, is_target boolean, text string",
    )
    out = dsir_importance(df, F.col("is_target"), n_buckets=64).collect()
    assert len(out) == 1 and out[0].n_feats == 1  # unigram only, no bigram


def test_canonicalize_url_rules(spark):
    from hatchery_spark.functions.text import canonicalize_url
    import pyspark.sql.functions as F

    cases = [
        # (raw, canonical)
        ("HTTP://WWW.Ex.COM:80/a/b/?utm_source=x&z=1&a=2#frag",
         "http://ex.com/a/b?a=2&z=1"),
        ("https://ex.com:443/", "https://ex.com/"),
        ("https://ex.com:8443/x", "https://ex.com:8443/x"),  # non-default kept
        ("http://ex.com", "http://ex.com/"),                 # empty path → /
        ("http://ex.com/p?gclid=1&fbclid=2&msclkid=3", "http://ex.com/p"),
        ("http://ex.com/p///", "http://ex.com/p"),           # multi slash
        ("http://ex.com/?b=2&a=1&a=0", "http://ex.com/?a=0&a=1&b=2"),
        ("http://www.www.ex.com/x", "http://www.ex.com/x"),  # only ONE www.
    ]
    df = spark.createDataFrame([(r,) for r, _ in cases], "url string")
    got = [r.c for r in df.select(
        canonicalize_url(F.col("url")).alias("c")).collect()]
    assert got == [c for _, c in cases]


def test_blocklist_whole_token_semantics(spark):
    """Whole-token match only: 'ass' must not trip 'classic'; case folds;
    empty-text and no-match docs pass; both plans agree."""
    from hatchery_spark.functions.corpus import blocklist_filter

    docs = spark.createDataFrame(
        [
            (1, "a classic performance"),   # substring, NOT blocked
            (2, "what an Ass"),             # case-folded token hit
            (3, ""),                        # empty
            (4, "clean text here"),
            (5, "ass at token start"),
        ],
        "doc_id long, text string",
    )
    want = {1: False, 2: True, 3: False, 4: False, 5: True}
    got_expr = {r.doc_id: r.blocked
                for r in blocklist_filter(docs, ["ASS"]).collect()}
    assert got_expr == want
    tdf = spark.createDataFrame([("ASS",)], "term string")
    got_join = {r.doc_id: r.blocked
                for r in blocklist_filter(docs, tdf).collect()}
    assert got_join == want
