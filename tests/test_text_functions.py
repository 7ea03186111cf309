from pyspark.sql import functions as F

from hatchery_spark.functions import text as tx


def _one(spark, s, col):
    return spark.createDataFrame([(s,)], "text string").select(col.alias("r")).first().r


def test_token_count(spark):
    assert _one(spark, "a b  c", tx.token_count(F.col("text"))) == 3
    assert _one(spark, "hello", tx.token_count(F.col("text"))) == 1


def test_stopword_ratio(spark):
    # "the cat is here" → stopwords: the, is → 2/4
    assert _one(spark, "the cat is here", tx.stopword_ratio(F.col("text"))) == 0.5
    assert _one(spark, "cat dog", tx.stopword_ratio(F.col("text"))) == 0.0


def test_punct_ratio(spark):
    assert _one(spark, "ab!!", tx.punct_ratio(F.col("text"))) == 0.5


def test_quality_monotone_in_substance(spark):
    low = _one(spark, "!!! ??? !!!", tx.quality_score(F.col("text")))
    high = _one(
        spark,
        "the quick brown fox jumps over the lazy dog and it is a good day for running in the park " * 6,
        tx.quality_score(F.col("text")),
    )
    assert high > low


def test_lang_id(spark):
    assert _one(spark, "the cat and the dog is here", tx.lang_id(F.col("text"))) == "en"
    assert _one(spark, "der hund und die katze ist da", tx.lang_id(F.col("text"))) == "de"
    assert _one(spark, "el perro dice que es bueno", tx.lang_id(F.col("text"))) == "es"
    assert _one(spark, "le chien et le chat est là", tx.lang_id(F.col("text"))) == "fr"
    assert _one(spark, "xyzzy plugh", tx.lang_id(F.col("text"))) == "unknown"


def test_slug_deterministic(spark):
    a = _one(spark, "payload", tx.slug(F.col("text")))
    b = _one(spark, "payload", tx.slug(F.col("text")))
    assert a == b and len(a) == 8 and all(c in "0123456789abcdef" for c in a)


def test_schema_hint(spark):
    col = tx.schema_hint(F.col("text"))
    assert _one(spark, "data/foo/bar", col) == "data"
    assert _one(spark, "fdrv2/x/aidmaster/f.gz", col) == "fdrv2_aidmaster"
    assert _one(spark, "other/path", col) == "unknown"


def test_sink_object_name(spark):
    df = spark.createDataFrame(
        [("2025-06-01 13:04:05", "hint", "s", 7)],
        "ts string, hint string, slugv string, seq int",
    ).withColumn("ts", F.to_timestamp("ts"))
    r = df.select(
        tx.sink_object_name(
            "pre/", F.col("hint"), F.col("ts"), F.col("slugv"), F.col("seq"), "json"
        ).alias("r")
    ).first().r
    assert r == "pre/hint/2025/06/01/13/20250601T130405_s_0007.json"


def test_sink_object_name_custom_fn(spark):
    """ObjNameFunc analog: a user fn replaces the default layout entirely."""
    df = spark.createDataFrame(
        [("2025-06-01 13:04:05", "hint", "s", 7)],
        "ts string, hint string, slugv string, seq int",
    ).withColumn("ts", F.to_timestamp("ts"))

    def namer(hint, ts, slug_col, seq):
        return F.concat_ws("-", hint, F.date_format(ts, "yyyyMMdd"), seq.cast("string"))

    r = df.select(
        tx.sink_object_name(
            "pre/", F.col("hint"), F.col("ts"), F.col("slugv"), F.col("seq"),
            "json", name_fn=namer,
        ).alias("r")
    ).first().r
    assert r == "hint-20250601-7"


def test_fingerprint64_stable(spark):
    df = spark.createDataFrame([("x",), ("x",), ("y",)], "text string")
    vals = [r.f for r in df.select(tx.fingerprint64(F.col("text")).alias("f")).collect()]
    assert vals[0] == vals[1] != vals[2]


def test_tfidf_tokenizes_on_any_whitespace(spark):
    """Tab/newline-separated tokens must not glue together (split on \\s+)."""
    from hatchery_spark.functions.corpus import tfidf_topk_terms

    docs = spark.createDataFrame(
        [(0, "alpha\tbeta\ngamma"), (1, "alpha delta"), (2, "epsilon zeta")],
        "doc_id long, text string",
    )
    out = tfidf_topk_terms(docs, k=5)
    terms = {r.term for r in out.filter("doc_id = 0").collect()}
    assert terms == {"alpha", "beta", "gamma"}


def test_char_entropy_arrow_matches_explode(spark):
    """The Arrow default and the pure-JVM explode formulation agree exactly
    at round-4, including empty strings and multi-byte codepoints."""
    from hatchery_spark.functions.corpus import char_entropy, char_entropy_explode

    docs = spark.createDataFrame(
        [(0, "aabb"), (1, ""), (2, "héllo wörld héllo"), (3, "xxxxxxxx"),
         (4, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    a = {r.doc_id: r.entropy for r in char_entropy(docs).collect()}
    b = {r.doc_id: r.entropy for r in char_entropy_explode(docs).collect()}
    assert a == b
    assert a[3] == 0.0 and a[0] == round(__import__("math").log(2), 4)


def test_repetition_stats_closed_form(spark):
    """Gopher repetition signals on hand-computable docs."""
    from hatchery_spark.functions.corpus import repetition_stats

    docs = spark.createDataFrame(
        [(0, "a b a b a b"),      # top bigram "a b" ×3 of 5 bigrams
         (1, "x\ny\nx\nz"),       # 4 lines, 3 distinct → dup 0.25
         (2, "one"),              # <2 tokens → NULL bigram frac
         (3, "l1\nl1\nl1")],      # all lines identical
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_stats(docs).collect()}
    assert out[0].top_bigram_frac == 0.6 and out[0].dup_line_frac == 0.0
    assert out[1].n_lines == 4 and out[1].dup_line_frac == 0.25
    assert out[2].top_bigram_frac is None
    assert out[3].dup_line_frac == 0.6667 and out[3].top_bigram_frac == 1.0


def test_remove_boilerplate_lines(spark):
    """A line shared by >= min_docs docs is stripped everywhere (order of the
    surviving lines preserved); an all-boilerplate doc survives with empty
    text; rare lines are untouched."""
    from hatchery_spark.functions.corpus import remove_boilerplate_lines

    banner = "COOKIE BANNER"
    docs = spark.createDataFrame(
        [
            (0, f"{banner}\nunique zero\nalso zero"),
            (1, f"unique one\n{banner}"),
            (2, f"{banner}"),
            (3, "no banner here\nat all"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.asDict()
        for r in remove_boilerplate_lines(docs, min_docs=3).collect()
    }
    assert out[0]["clean_text"] == "unique zero\nalso zero"
    assert out[0]["kept_lines"] == 2 and out[0]["removed_lines"] == 1
    assert out[1]["clean_text"] == "unique one"
    assert out[2]["clean_text"] == "" and out[2]["kept_lines"] == 0
    assert out[3]["clean_text"] == "no banner here\nat all"
    assert out[3]["removed_lines"] == 0

    # shuffle anti-join path produces identical output
    alt = {
        r.doc_id: r.asDict()
        for r in remove_boilerplate_lines(
            docs, min_docs=3, broadcast_boiler=False
        ).collect()
    }
    assert alt == out


def test_winnow_fingerprints_guarantee(spark):
    """Winnowing guarantee: docs sharing a substring of length
    >= k + window - 1 share at least one fingerprint; the selection is
    sparse (far fewer fingerprints than shingles); identical docs have
    identical fingerprint sets."""
    from hatchery_spark.functions.text import winnow_fingerprints

    shared = "a long common passage that both documents contain verbatim"
    docs = spark.createDataFrame(
        [
            (0, f"intro text one {shared} outro alpha"),
            (1, f"other beginning {shared} different ending"),
            (2, f"intro text one {shared} outro alpha"),
            (3, "entirely unrelated content with zero overlap whatsoever!!"),
        ],
        "doc_id long, text string",
    )
    fp = winnow_fingerprints(docs, k=5, window=4)
    sets = {
        d: {r.fingerprint for r in rows}
        for d, rows in __import__("itertools").groupby(
            sorted(fp.collect(), key=lambda r: r.doc_id), key=lambda r: r.doc_id
        )
    }
    assert sets[0] & sets[1]          # shared passage ⇒ shared fingerprint
    assert sets[0] == sets[2]         # identical docs ⇒ identical sets
    n_shingles = len(docs.first().text) - 4
    assert len(sets[0]) < n_shingles  # sparse selection


def test_normalize_text_nfc_case_whitespace(spark):
    """NFC composes decomposed accents, case folds, whitespace runs
    collapse, ends strip — so normalized exact-dedup collides the encoding
    variants of one string."""
    from hatchery_spark.functions.text import make_normalize_udf

    norm = make_normalize_udf()
    df = spark.createDataFrame(
        [
            (0, "Café   MENU"),   # decomposed é + run of spaces
            (1, "café menu"),       # composed é, already lower
            (2, "\t café\nmenu "),  # tabs/newlines/edges
            (3, None),
            (4, "café\x0bmenu"),     # \x0b is NOT RE2 \s — must survive
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.n for r in df.select("doc_id", norm(F.col("text")).alias("n")).collect()}
    assert out[0] == out[1] == out[2] == "café menu"
    # SQL semantics: NULL propagates (the DuckDB oracle's nfc_normalize/
    # regexp_replace chain returns NULL for NULL input, and NULL-text docs
    # must not exact-dedup-collide with genuinely empty docs).
    assert out[3] is None
    # RE2's \s is [ \t\n\r\f] — no vertical tab; the oracle keeps \x0b, so
    # the Spark side must too.
    assert out[4] == "café\x0bmenu"


def test_chunk_documents_windows(spark):
    """Chunk boundaries: stride = chunk - overlap, last chunk truncated,
    short docs give one chunk; reassembling chunk tokens re-covers the doc."""
    from hatchery_spark.functions.corpus import chunk_documents

    text = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [(0, text), (1, "a b")], "doc_id long, text string"
    )
    out = sorted(
        chunk_documents(df, chunk_tokens=4, overlap=1).collect(),
        key=lambda r: (r.doc_id, r.chunk_idx),
    )
    d0 = [r for r in out if r.doc_id == 0]
    # 10 tokens, window 4, stride 3 -> ceil((10-1)/3) = 3 chunks
    assert [r.chunk_text for r in d0] == [
        "w0 w1 w2 w3", "w3 w4 w5 w6", "w6 w7 w8 w9"
    ]
    assert [r.n_tokens for r in d0] == [4, 4, 4]
    d1 = [r for r in out if r.doc_id == 1]
    assert len(d1) == 1 and d1[0].chunk_text == "a b" and d1[0].n_tokens == 2


def test_vocab_topk_counts_and_rank(spark):
    from hatchery_spark.functions.corpus import vocab_topk

    df = spark.createDataFrame(
        [(0, "a a b c"), (1, "a b b"), (2, "c")], "doc_id long, text string"
    )
    out = {r.token: r for r in vocab_topk(df, k=2).collect()}
    assert set(out) == {"a", "b"}  # totals: a=3, b=3 → tie broken by token
    assert out["a"].n_total == 3 and out["a"].n_docs == 2 and out["a"].vocab_rank == 1
    assert out["b"].n_total == 3 and out["b"].n_docs == 2 and out["b"].vocab_rank == 2
