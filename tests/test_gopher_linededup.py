"""Gopher composite quality gate + cross-corpus first-occurrence line dedup."""

import pytest

from hatchery_spark.functions.corpus import gopher_filter
from hatchery_spark.functions.dedup import dedup_lines_first_occurrence

PROSE = (
    "the quick brown fox jumps over the lazy dog and then runs off to "
    "the river bank with a stick that it found by the old mill have fun"
)


def _one(spark, text, **kw):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    return gopher_filter(df, **kw).collect()[0]


def test_gopher_prose_passes(spark):
    r = _one(spark, PROSE, min_words=20, min_mean_word_len=2.0)
    assert r.keep is True
    assert r.n_words == 29
    assert r.ok_stopwords and r.n_stopwords >= 3


def test_gopher_word_count_floor(spark):
    r = _one(spark, "too short to pass the gate")
    assert r.ok_word_count is False and r.keep is False


def test_gopher_symbol_ratio(spark):
    r = _one(spark, PROSE + " # # # # # # #", min_words=20, min_mean_word_len=2.0)
    assert r.ok_symbols is False and r.keep is False
    # 7 '#' over 36 words
    assert r.symbol_word_ratio == round(7 / 36 + 5e-5, 4) or r.symbol_word_ratio == round(7 / 36, 4)


def test_gopher_bullet_and_ellipsis_lines(spark):
    bullets = "\n".join(["• item one here", "- item two here", "* item three"])
    r = _one(spark, bullets, min_words=1, min_stopwords=0, min_alpha_word_frac=0.0)
    assert r.bullet_line_frac == 1.0 and r.ok_bullets is False
    dots = "\n".join(["truncated line one...", "truncated line two...", "a full line"])
    r2 = _one(spark, dots, min_words=1, min_stopwords=0)
    assert r2.ellipsis_line_frac == 0.6667 and r2.ok_ellipsis is False


def test_gopher_dup_lines_and_alpha(spark):
    rep = "\n".join(["same line of text"] * 9 + ["one different line"])
    r = _one(spark, rep, min_words=1, min_stopwords=0)
    assert r.dup_line_frac == 0.8 and r.ok_dup_lines is False
    nums = " ".join(str(i * 137) for i in range(30))
    r2 = _one(spark, nums, min_words=1, min_stopwords=0)
    assert r2.alpha_word_frac == 0.0 and r2.ok_alpha is False


def test_gopher_null_text_excluded(spark):
    df = spark.createDataFrame([(0, PROSE), (1, None)], "doc_id long, text string")
    assert gopher_filter(df).count() == 1


def test_line_dedup_global_first_occurrence(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha\nbeta\nalpha"),   # in-doc repeat of alpha
            (2, "beta\ngamma"),           # beta already seen in doc 1
            (3, "alpha\nbeta"),           # everything seen -> empty
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup_lines_first_occurrence(df).collect()}
    assert out[1].clean_text == "alpha\nbeta" and out[1].kept_lines == 2
    assert out[1].removed_lines == 1
    assert out[2].clean_text == "gamma" and out[2].removed_lines == 1
    assert out[3].clean_text == "" and out[3].kept_lines == 0
    assert out[3].removed_lines == 2


def test_line_dedup_preserves_order(spark):
    df = spark.createDataFrame(
        [(1, "z line\na line\nm line")], "doc_id long, text string"
    )
    out = dedup_lines_first_occurrence(df).collect()[0]
    assert out.clean_text == "z line\na line\nm line"  # original order, not sorted


def test_line_dedup_stable_under_repartition(spark):
    rows = [(i, f"common header\nbody {i}\ncommon footer") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {(r.doc_id, r.clean_text) for r in dedup_lines_first_occurrence(df).collect()}
    b = {
        (r.doc_id, r.clean_text)
        for r in dedup_lines_first_occurrence(df.repartition(7)).collect()
    }
    assert a == b
    # doc 0 keeps header+footer; every later doc keeps only its body
    d = dict(a)
    assert d[0] == "common header\nbody 0\ncommon footer"
    assert d[5] == "body 5"


def test_c4_clean_line_and_page_rules(spark):
    from hatchery_spark.functions.corpus import c4_clean

    good = "this line has five proper words."
    docs = [
        (0, "\n".join([good, good + "!", 'a quoted five word line here"'])),
        (1, "\n".join([good, "no terminal punctuation here at all",
                       "too short.", "uses javascript on this line."])),
        (2, "\n".join([good, good, good]) + "\nif (x) { return; }"),
        (3, "\n".join([good, good, good, "Lorem Ipsum filler text here."])),
        (4, "\n".join([good, good])),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in c4_clean(df).collect()}

    # doc 0: all three lines survive; page kept
    assert out[0].kept_lines == 3 and out[0].page_kept
    assert out[0].clean_text == docs[0][1]
    # doc 1: no-punct, short, and javascript lines all drop
    assert out[1].kept_lines == 1 and out[1].dropped_lines == 3
    assert not out[1].page_kept  # fewer than 3 kept lines
    # doc 2: brace page flagged regardless of kept count
    assert out[2].kept_lines == 3 and not out[2].page_kept
    # doc 3: lorem ipsum page flagged (case-insensitive); the lorem line
    # itself passes the LINE rules
    assert out[3].kept_lines == 4 and not out[3].page_kept
    # doc 4: two kept lines -> page dropped
    assert not out[4].page_kept
