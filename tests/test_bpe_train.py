"""Distributed BPE merge training vs the reference sequential algorithm."""

import collections

from hatchery_spark.functions.corpus import train_bpe_merges


def _ref_bpe(wordcounts, k):
    """Sennrich et al. 1508.07909 — sequential reference algorithm."""
    vocab = {tuple(w): c for w, c in wordcounts.items()}
    merges = []
    for step in range(1, k + 1):
        pairs = collections.Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (l, r), f = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, l, r, f))
        new = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + c
        vocab = new
    return merges


def test_bpe_classic_corpus(spark):
    """The textbook low/lower/newest/widest corpus: es, est, lo, low…"""
    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    got = [
        (r.step, r.left_sym, r.right_sym, r.freq)
        for r in train_bpe_merges(df, k=6).orderBy("step").collect()
    ]
    want = _ref_bpe({"low": 5, "lower": 2, "newest": 6, "widest": 3}, 6)
    assert got == want
    assert got[0] == (1, "e", "s", 9) and got[1] == (2, "es", "t", 9)


def test_bpe_parity_on_random_corpus(spark):
    """Merge-sequence parity with the sequential reference on a messier
    corpus (repeats inside words, ties, non-alpha tokens filtered)."""
    words = (
        ["banana"] * 7 + ["bandana"] * 4 + ["ananas"] * 5 + ["cabana"] * 3
        + ["na"] * 2 + ["x1x", "##", "MiXeD"]  # non-[a-z]+ dropped; MiXeD lowercased
    )
    rows = [(i, " ".join(words[i::3])) for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    wc = collections.Counter(w.lower() for w in words)
    for bad in ("x1x", "##"):
        del wc[bad]
    got = [
        (r.step, r.left_sym, r.right_sym, r.freq)
        for r in train_bpe_merges(df, k=10).orderBy("step").collect()
    ]
    assert got == _ref_bpe(wc, 10)


def test_bpe_stable_under_repartition(spark):
    text = " ".join(["alpha beta beta gamma alpha"] * 20)
    df = spark.createDataFrame([(i, text) for i in range(10)], "doc_id long, text string")
    a = train_bpe_merges(df, k=4).collect()
    b = train_bpe_merges(df.repartition(7), k=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_bpe_exhausts_gracefully(spark):
    """Single-char words yield no pairs — fewer than k merges, no error."""
    df = spark.createDataFrame([(0, "a b c a b")], "doc_id long, text string")
    assert train_bpe_merges(df, k=5).count() == 0


def test_bpe_encode_counts(spark):
    """Tokenizing with the learned merges: 'newest' (6 chars) compresses to
    n+ew+est = 3 tokens after 6 merges; out-of-scope words don't count."""
    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    df = spark.createDataFrame(
        [(0, text), (1, "newest low ## 42")], "doc_id long, text string"
    )
    from hatchery_spark.functions.corpus import bpe_encode

    merges = [
        (r.step, r.left_sym, r.right_sym)
        for r in train_bpe_merges(df.filter("doc_id = 0"), k=6).collect()
    ]
    out = {r.doc_id: (r.n_words, r.n_tokens) for r in bpe_encode(df, merges).collect()}
    # doc 1: newest -> [n, ewest] = 2 tokens (merge 6 fuses ew+est);
    # low -> [low] = 1; '##' and '42' are out of scope
    assert out[1] == (2, 3)
    # doc 0: 16 words; low=1, lower=3 (low,e,r), newest=2, widest=4 (w,i,d,est)
    assert out[0] == (16, 5 * 1 + 2 * 3 + 6 * 2 + 3 * 4)


def _chained_replace_count(word, merges):
    """Literal chained-replace reference (the distributed bpe_encode form):
    bracketed sentinel string, one left-to-right pass per merge in order."""
    s = "<" + "><".join(word) + ">"
    for _step, l, r in sorted(merges, key=lambda m: m[0]):
        s = s.replace(f"<{l}><{r}>", f"<{l}{r}>")
    return s.count("<")


def test_bpe_local_trainer_matches_distributed(spark):
    """Driver-local incremental trainer == distributed greedy, bit-for-bit
    (same argmax tie-breaks, same left-to-right pass)."""
    from hatchery_spark.functions.corpus import train_bpe_merges_local

    words = (
        ["banana"] * 7 + ["bandana"] * 4 + ["ananas"] * 5 + ["cabana"] * 3
        + ["na"] * 2 + ["assesses"] * 6 + ["mississippi"] * 2
    )
    rows = [(i, " ".join(words[i::3])) for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [tuple(r) for r in train_bpe_merges_local(df, k=25).orderBy("step").collect()]
    want = [tuple(r) for r in train_bpe_merges(df, k=25).orderBy("step").collect()]
    assert got == want and len(got) > 10


def test_bpe_local_trainer_max_words_cap(spark):
    """The vocabulary cap keeps only the top-N words by (count desc, word
    asc) — training then equals training on that sub-corpus exactly."""
    from hatchery_spark.functions.corpus import train_bpe_merges_local

    df = spark.createDataFrame(
        [(0, " ".join(["common"] * 50 + ["alsocommon"] * 40 + ["rare"] * 1))],
        "doc_id long, text string",
    )
    capped = [
        tuple(r)
        for r in train_bpe_merges_local(df, k=8, max_words=2).orderBy("step").collect()
    ]
    sub = spark.createDataFrame(
        [(0, " ".join(["common"] * 50 + ["alsocommon"] * 40))],
        "doc_id long, text string",
    )
    want = [tuple(r) for r in train_bpe_merges_local(sub, k=8).orderBy("step").collect()]
    assert capped == want


def test_bpe_encode_arrow_matches_chained(spark):
    """Arrow encode == chained-replace encode on the same merge table."""
    from hatchery_spark.functions.corpus import bpe_encode, bpe_encode_arrow

    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    df = spark.createDataFrame(
        [(0, text), (1, "newest low ## 42"), (2, "zzz")], "doc_id long, text string"
    )
    merges = [
        (r.step, r.left_sym, r.right_sym)
        for r in train_bpe_merges(df.filter("doc_id = 0"), k=6).collect()
    ]
    a = {r.doc_id: (r.n_words, r.n_tokens) for r in bpe_encode(df, merges).collect()}
    b = {r.doc_id: (r.n_words, r.n_tokens)
         for r in bpe_encode_arrow(df, merges).collect()}
    assert a == b


def test_bpe_arrow_survives_production_merge_count(spark):
    """k >= 1000 merges — far past where the chained-replace expression dies
    in Catalyst. Train locally (zero per-merge Spark jobs), encode with the
    Arrow UDF, and verify 30 words against the literal chained-replace
    reference applied in pure Python."""
    import random

    from hatchery_spark.functions.corpus import (
        _apply_merges_sequential,
        bpe_encode_arrow,
        train_bpe_merges_local,
    )

    rng = random.Random(7)
    vocab = [
        "".join(rng.choice("abcdefghij") for _ in range(rng.randint(4, 12)))
        for _ in range(1500)
    ]
    counts = {w: rng.randint(1, 50) for w in vocab}
    text = " ".join(w for w, c in counts.items() for _ in range(min(c, 5)))
    df = spark.createDataFrame(
        [(i, text) for i in range(2)], "doc_id long, text string"
    )
    merges_df = train_bpe_merges_local(df, k=1200)
    merges = [(r.step, r.left_sym, r.right_sym) for r in merges_df.collect()]
    assert len(merges) >= 1000, len(merges)

    ranks = {(l, r): s for s, l, r in merges}
    sample = rng.sample(sorted(set(vocab)), 30)
    for w in sample:
        assert len(_apply_merges_sequential(list(w), ranks)) == _chained_replace_count(
            w, merges
        ), w

    out = bpe_encode_arrow(df, merges).collect()
    assert len(out) == 2
    want_tokens = sum(
        _chained_replace_count(w, merges)
        for w, c in counts.items()
        for _ in range(min(c, 5))
    )
    assert all(r.n_tokens == want_tokens for r in out)


def test_bpe_tokenize_ids_reconstruct_the_corpus(spark):
    """Token-id sequences: ids map back through the vocabulary to symbol
    strings whose concatenation per word reproduces the word; doc token
    order = word order; id scheme matches the closed form (chars 0-25,
    merge step s -> 26+s-1)."""
    from hatchery_spark.functions.corpus import (
        bpe_tokenize_arrow,
        train_bpe_merges,
        train_bpe_merges_local,
    )

    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    df = spark.createDataFrame(
        [(0, text), (1, "newest low ## 42")], "doc_id long, text string"
    )
    merges = [
        (r.step, r.left_sym, r.right_sym)
        for r in train_bpe_merges_local(df.filter("doc_id = 0"), k=6).collect()
    ]
    # invert the id scheme
    vocab = {i: chr(97 + i) for i in range(26)}
    for s, l, r in sorted(merges):
        vocab.setdefault(26 + s - 1, l + r)

    out = {r.doc_id: r for r in bpe_tokenize_arrow(df, merges).collect()}
    assert out[1].n_words == 2
    ids = [int(x) for x in out[1].ids.split(",")]
    assert len(ids) == out[1].n_tokens
    assert "".join(vocab[i] for i in ids) == "newestlow"
    # doc 0: decoding all ids must reproduce the concatenated word stream
    ids0 = [int(x) for x in out[0].ids.split(",")]
    assert "".join(vocab[i] for i in ids0) == "low" * 5 + "lower" * 2 + \
        "newest" * 6 + "widest" * 3
    # parity sanity vs the distributed trainer's merge list
    m2 = [(r.step, r.left_sym, r.right_sym)
          for r in train_bpe_merges(df.filter("doc_id = 0"), k=6).collect()]
    assert sorted(m2) == sorted(merges)


# ---------------------------------------------------------------- wordpiece


def test_wordpiece_greedy_hand_cases():
    from hatchery_spark.functions.corpus import (
        WORDPIECE_VOCAB,
        _wordpiece_word,
    )

    vs = set(WORDPIECE_VOCAB)
    mx = max(len(v[2:]) if v.startswith("##") else len(v) for v in vs)
    assert _wordpiece_word("the", vs, mx) == ["the"]
    assert _wordpiece_word("interesting", vs, mx) == ["inter", "##est", "##ing"]
    # greedy takes 'the' (len 3) over 'th', then continues
    assert _wordpiece_word("then", vs, mx) == ["the", "##n"]
    # no duplicates in the vocab (the oracle VALUES table relies on it)
    assert len(WORDPIECE_VOCAB) == len(set(WORDPIECE_VOCAB))


def test_wordpiece_unk():
    from hatchery_spark.functions.corpus import _wordpiece_word

    vs = {"a", "b", "##b"}  # no continuation for 'a'
    assert _wordpiece_word("ba", vs, 1) == ["[UNK]"]
    assert _wordpiece_word("ab", vs, 1) == ["a", "##b"]


def test_wordpiece_encode_distributed(spark):
    import hashlib

    from hatchery_spark.functions.corpus import (
        WORDPIECE_VOCAB,
        _wordpiece_word,
        wordpiece_encode,
    )

    docs = spark.createDataFrame(
        [(1, "The quick brown fox"), (2, "running quickly"), (3, "зничтожение 42!")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in wordpiece_encode(docs).collect()}
    vs = set(WORDPIECE_VOCAB)
    mx = max(len(v[2:]) if v.startswith("##") else len(v) for v in vs)
    stream = " ".join(
        " ".join(_wordpiece_word(w, vs, mx))
        for w in "the quick brown fox".split()
    )
    assert out[1].n_words == 4
    assert out[1].n_tokens == len(stream.split())
    assert out[1].tok_md5 == hashlib.md5(stream.encode()).hexdigest()
    assert 3 not in out  # no [a-z]+ words survive the filter
