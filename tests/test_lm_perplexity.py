"""Char-bigram LM perplexity scoring (the CCNet-style quality gate)."""

import math

import pyspark.sql.functions as F
import pytest

from hatchery_spark.functions.corpus import (
    char_bigram_pairs,
    char_lm_perplexity,
    char_lm_train,
)


@pytest.fixture(scope="module")
def model(spark):
    train = spark.createDataFrame(
        [(0, "ababab"), (1, "abba")], "doc_id long, text string"
    )
    return char_lm_train(train)


def test_bigram_pairs_shape(spark):
    df = spark.createDataFrame(
        [(0, "abc"), (1, "x"), (2, None), (3, "")], "doc_id long, text string"
    )
    rows = char_bigram_pairs(df).collect()
    # only doc 0 has >=2 chars: pairs (a,b), (b,c)
    assert sorted((r.ctx, r.nxt) for r in rows) == [("a", "b"), ("b", "c")]


def test_train_counts_by_hand(model):
    counts, totals, vocab = model
    # "ababab": ab ba ab ba ab ; "abba": ab bb ba
    got = {(r.ctx, r.nxt): r.c for r in counts.collect()}
    assert got == {("a", "b"): 4, ("b", "a"): 3, ("b", "b"): 1}
    tot = {r.ctx: r.tot for r in totals.collect()}
    assert tot == {"a": 4, "b": 4}
    assert vocab.collect()[0].v == 2


def test_perplexity_closed_form(spark, model):
    counts, totals, vocab = model
    test = spark.createDataFrame([(10, "ab"), (11, "zz")], "doc_id long, text string")
    out = {r.doc_id: r for r in char_lm_perplexity(test, counts, totals, vocab).collect()}
    # P(b|a) = (4+1)/(4+2) = 5/6 -> bits = -log2(5/6)
    assert out[10].n_bigrams == 1
    assert out[10].bits_per_char == round(-math.log2(5 / 6), 4)
    # unseen ctx 'z': P = (0+1)/(0+2) = 1/2 -> exactly 1 bit
    assert out[11].bits_per_char == 1.0


def test_reference_like_text_scores_lower(spark):
    # Model trained on English-like prose should score prose far below
    # uniform junk — the whole point of the perplexity gate.
    prose = [
        "the quick brown fox jumps over the lazy dog",
        "a quiet evening reading by the warm fire",
        "the child fed the brown dog by the door",
        "we walked over the quiet bridge at dawn",
    ]
    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(prose)], "doc_id long, text string"
    )
    counts, totals, vocab = char_lm_train(train)
    test = spark.createDataFrame(
        [(100, "the brown dog jumps over the quiet fox"),
         (101, "qzxj vkwq zzqp jxqv kzzw xqjv")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.bits_per_char
           for r in char_lm_perplexity(test, counts, totals, vocab).collect()}
    assert out[100] < out[101] - 1.0  # clearly separated


def test_scoring_stable_under_repartition(spark):
    docs = spark.createDataFrame(
        [(i, f"text number {i} body {i * 3 % 7}") for i in range(50)],
        "doc_id long, text string",
    )
    counts, totals, vocab = char_lm_train(docs.filter(F.col("doc_id") % 2 == 0))
    test = docs.filter(F.col("doc_id") % 2 == 1)
    a = char_lm_perplexity(test, counts, totals, vocab).collect()
    b = char_lm_perplexity(test.repartition(11), counts, totals, vocab).collect()
    assert {(r.doc_id, r.n_bigrams, r.bits_per_char) for r in a} == {
        (r.doc_id, r.n_bigrams, r.bits_per_char) for r in b
    }


# ------------------------------------------------------------- Kneser-Ney


def test_kneser_ney_hand_example(spark):
    """Every smoothing branch against hand-computed probabilities:
    seen pair, seen-ctx/unseen-pair backoff, unseen-ctx continuation."""
    import math

    from hatchery_spark.functions.corpus import (
        kneser_ney_bits,
        kneser_ney_train,
    )

    ref = spark.createDataFrame(
        [(1, "a b a c"), (2, "a b")], "doc_id long, text string"
    )
    score = spark.createDataFrame(
        [(10, "a b z"), (11, "q r")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r
        for r in kneser_ney_bits(score, *kneser_ney_train(ref)).collect()
    }
    # model: bc={(a,b):2,(b,a):1,(a,c):1}; ctx a=(3,2), b=(1,1);
    # cont a=1,b=1,c=1; T=3, V1=4 → Pc(seen)=2/7, Pc(unseen)=1/7
    p_b_a = (2 - 0.75) / 3 + 0.75 * 2 / 3 * (2 / 7)
    p_z_b = 0.0 + 0.75 * 1 / 1 * (1 / 7)
    exp_10 = round(-(math.log2(p_b_a) + math.log2(p_z_b)) / 2, 4)
    assert out[10].n_bigrams == 2 and out[10].kn_bits == exp_10
    # unseen context q → pure continuation with unk floor
    exp_11 = round(-math.log2(1 / 7), 4)
    assert out[11].n_bigrams == 1 and out[11].kn_bits == exp_11


def test_kneser_ney_reference_likes_reference(spark):
    """Sanity: text drawn from the reference distribution scores fewer
    bits than shuffled-vocabulary junk."""
    from hatchery_spark.functions.corpus import (
        kneser_ney_bits,
        kneser_ney_train,
    )

    ref = spark.createDataFrame(
        [(i, "the cat sat on the mat and the dog ran") for i in range(20)],
        "doc_id long, text string",
    )
    score = spark.createDataFrame(
        [(100, "the cat sat on the mat"), (101, "mat the ran dog cat on")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.kn_bits
        for r in kneser_ney_bits(score, *kneser_ney_train(ref)).collect()
    }
    assert out[100] < out[101]
