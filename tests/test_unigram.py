"""Unigram-LM tokenizer (SentencePiece algorithm, hard-EM variant):
distributed training must match a sequential reference implementation
step for step — the BPE parity-test pattern (no SQL oracle exists for the
Viterbi DP, so this parity IS the correctness pin)."""

import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F


def _ref_viterbi(w, logp, max_piece_len):
    n = len(w)
    bs = [-1e18] * (n + 1)
    bl = [0] * (n + 1)
    bs[0] = 0.0
    for i in range(1, n + 1):
        for piece_len in range(1, min(max_piece_len, i) + 1):
            lp = logp.get(w[i - piece_len : i])
            if lp is None:
                continue
            s = bs[i - piece_len] + lp
            if s > bs[i]:
                bs[i], bl[i] = s, piece_len
    pieces, i = [], n
    while i > 0:
        piece_len = bl[i]
        if piece_len == 0:
            return None
        pieces.append(w[i - piece_len : i])
        i -= piece_len
    return pieces[::-1]


def _ref_train(texts, vocab_size, max_piece_len=4, seed_factor=8,
               prune_frac=0.25, max_rounds=20):
    words = Counter()
    for t in texts:
        for w in re.split(r"[ \t\n\f\r\x0b]+", t.lower()):
            if re.fullmatch(r"[a-z]+", w):
                words[w] += 1
    subs = Counter()
    for w, c in words.items():
        for pos in range(len(w)):
            for plen in range(1, min(max_piece_len, len(w) - pos) + 1):
                subs[w[pos : pos + plen]] += c
    chars = {p: f for p, f in subs.items() if len(p) == 1}
    multi = sorted(
        ((p, f) for p, f in subs.items() if len(p) > 1),
        key=lambda pf: (-pf[1], pf[0]),
    )[: max(0, seed_factor * vocab_size - len(chars))]
    counts = dict(chars)
    counts.update(dict(multi))

    for _ in range(max_rounds):
        total = sum(counts.values())
        logp = {p: math.log(v / total) for p, v in counts.items()}
        est = Counter()
        for w, c in words.items():
            for p in _ref_viterbi(w, logp, max_piece_len):
                est[p] += c
        counts = {
            p: est.get(p, 0) + (1 if len(p) == 1 else 0)
            for p in counts
            if len(p) == 1 or est.get(p, 0) > 0
        }
        n_over = len(counts) - vocab_size
        if n_over <= 0:
            break
        multi_s = sorted(
            ((p, c) for p, c in counts.items() if len(p) > 1),
            key=lambda pc: (pc[1], pc[0]),
        )
        n_drop = min(n_over, max(1, int(len(multi_s) * prune_frac)), len(multi_s))
        for p, _c in multi_s[:n_drop]:
            del counts[p]
        if len(counts) <= vocab_size:
            break
    total = sum(counts.values())
    return {p: round(math.log(v / total), 6) for p, v in counts.items()}


TEXTS = [
    "the lowland landlord held the holding",
    "lowly landholders lend holdings lowland",
    "the held land holds the lowland lode",
    "lending the holding to the lowland landlord",
] * 3


def test_unigram_train_matches_sequential_reference(spark):
    from hatchery_spark.functions.corpus import train_unigram

    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)],
                               "doc_id long, text string")
    got = {r.piece: r.logprob for r in train_unigram(df, vocab_size=30).collect()}
    expect = _ref_train(TEXTS, vocab_size=30)
    assert got == pytest.approx(expect)
    assert len(got) <= 30
    # multi-char pieces actually survive (the vocab is not just chars)
    assert any(len(p) > 1 for p in got)


def test_unigram_token_counts_match_reference(spark):
    from hatchery_spark.functions.corpus import (
        train_unigram,
        unigram_token_counts,
    )

    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)],
                               "doc_id long, text string")
    pieces = train_unigram(df, vocab_size=30)
    logp = {r.piece: r.logprob for r in pieces.collect()}

    probe = spark.createDataFrame(
        [
            (0, "the lowland landlord"),
            (1, "held holding lode"),
            (2, "x9z the"),  # x9z: digits outside the alphabet -> 1 unk token
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.n_tokens
           for r in unigram_token_counts(probe, pieces).collect()}

    def ref_count(text):
        n = 0
        for w in re.split(r"[ \t\n\f\r\x0b]+", text.lower()):
            if not w:
                continue
            segs = _ref_viterbi(w, logp, 4)
            n += len(segs) if segs else 1
        return n

    assert got == {i: ref_count(t) for i, t in
                   [(0, "the lowland landlord"), (1, "held holding lode"),
                    (2, "x9z the")]}
    # and the unk word really contributed exactly 1
    assert got[2] == ref_count("the") + 1
