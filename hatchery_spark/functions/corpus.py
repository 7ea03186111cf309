"""Corpus-level text statistics: TF-IDF keywords, character entropy,
boilerplate removal, repetition stats, chunking, vocab induction, and
char-bigram LM perplexity scoring.

Both follow the explode → codegen'd-aggregate shape (see
dedup.minhash_signature_staged for the rationale): one row per (doc, unit),
hash aggregates with map-side partial combine, and rank-limit windows that
Spark rewrites into WindowGroupLimit (per-partition top-k before the
shuffle). No Python, no HOFs on the hot path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def tfidf_topk_terms(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k TF-IDF terms per document: (doc_id, term, score, rank).

    tf = term count in doc; idf = ln(N / df_t). The document-frequency side
    aggregates to one row per TERM (vocabulary-sized, not corpus-sized) and
    the corpus size joins as a broadcast single row — no global window, no
    driver collect. Ties rank deterministically (score desc, term asc).

    Tokenization splits on any whitespace run (\\s+), matching every other
    text op in the package — tab/newline-separated tokens stay separate.
    """
    terms = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), r"\s+")).alias("term")
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df_t")), 4),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "score", "rank")
    )


def char_entropy_explode(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Shannon entropy via explode → (doc, char) rows → hash aggregates.

    Pure-JVM formulation kept for SQL-expressibility reference (it IS the
    DuckDB oracle's shape) and for engines without Arrow. NOT the default:
    the explode inflates the pre-agg row count by average doc length (partial
    aggregation bounds the SHUFFLE, not the explode), and `char_entropy` —
    the Arrow form — measured 14–110× faster across 80 B chat turns
    (13.9s → 0.18s warm, 2M rows) and 4 KB docs (2.6s → 0.13s, 50k rows),
    with bit-identical rounded output on the test corpus.
    """
    chars = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), "")).alias("ch")
    )
    counts = chars.groupBy(id_col, "ch").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.groupBy(id_col).agg(F.sum("c").alias("L"))
    return (
        counts.join(totals, id_col)
        .groupBy(id_col)
        .agg(
            F.round(
                -F.sum((F.col("c") / F.col("L")) * F.log(F.col("c") / F.col("L"))), 4
            ).alias("entropy")
        )
    )


@pandas_udf(T.DoubleType())
def _entropy64(text: pd.Series) -> pd.Series:
    """Per-doc Shannon entropy (nats), Arrow-batched.

    One numpy pass per doc: codepoints via a zero-copy utf-32 view, counts
    via np.unique. The per-doc loop is Python, but each iteration is O(len)
    C work — no (doc, char) row inflation, so for multi-KB docs this does
    ~1/len(doc) of the explode form's row handling. Terms are summed in
    sorted-codepoint order (np.unique sorts), keeping results deterministic.
    """
    out = np.zeros(len(text), dtype=np.float64)
    for i, s in enumerate(text):
        if s is None or len(s) == 0:
            out[i] = np.nan if s is None else 0.0
            continue
        cps = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
        _, counts = np.unique(cps, return_counts=True)
        p = counts / counts.sum()
        out[i] = -(p * np.log(p)).sum()
    return pd.Series(out)


def char_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Shannon entropy (nats) of the character distribution per doc.

    A cheap perplexity proxy for quality filtering: natural text sits in a
    narrow entropy band; binary junk and repeated-char spam fall outside it.

    One Arrow-batched UDF — no (doc, char) intermediate rows, no shuffle at
    all; entropy is a per-row map. Beats the explode formulation
    (`char_entropy_explode`) by 14–110× at every doc length measured, and the
    gap widens with length. Output matches it exactly (round 4): entropy
    terms sum in sorted-codepoint order, deterministic per doc.
    """
    ent = F.round(_entropy64(F.col(text_col)), 4).alias("entropy")
    return df.filter(F.col(text_col).isNotNull()).select(F.col(id_col), ent)


def remove_boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 5,
    broadcast_boiler: bool = True,
) -> DataFrame:
    """C4/CCNet-style corpus-level boilerplate removal: drop every line that
    occurs in >= min_docs DISTINCT documents (nav menus, cookie banners,
    copyright footers), preserving the remaining lines' original order.

    Scale shape: two source scans, two shuffles. Scan 1 explodes lines and
    aggregates frequency over xxhash64(line) longs — that shuffle carries
    16-byte (hash, doc_id) pairs, never text. The boilerplate set (lines
    shared by >= min_docs docs — the highly repeated tail, small by
    construction) broadcasts back onto a second exploded pass as a
    membership mark; pass broadcast_boiler=False to fall back to a shuffle
    join when min_docs is set low enough to produce a huge set. ONE groupBy
    then rebuilds clean_text (order-restoring array_sort over the kept
    lines — collect_list skips the NULLed boiler rows) and counts kept /
    removed together, so boilerplate text is dropped by the map-side
    partial aggregate and the rebuild shuffle carries only surviving lines.
    Line equality is decided on 64-bit hashes (collision P ≈ n²·2⁻⁶⁴ —
    negligible).

    Returns (id, clean_text, kept_lines, removed_lines); docs whose every
    line was boilerplate survive with clean_text = ''.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_pos", "_line"),
    ).withColumn("_h", F.xxhash64("_line"))
    boiler = (
        lines.groupBy("_h")
        .agg(F.count_distinct(F.col(id_col)).alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("_h", F.lit(True).alias("_is_boiler"))
    )
    if broadcast_boiler:
        boiler = F.broadcast(boiler)
    marked = lines.join(boiler, "_h", "left")
    kept_struct = F.when(
        F.col("_is_boiler").isNull(), F.struct("_pos", "_line")
    )
    return marked.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)),
                lambda s: s["_line"],
            ),
            "\n",
        ).alias("clean_text"),
        F.count(kept_struct).cast("int").alias("kept_lines"),
        F.count(F.col("_is_boiler")).cast("int").alias("removed_lines"),
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition quality signals per document.

    Repetitive documents (boilerplate, scraper loops, keyword stuffing) are
    the classic web-corpus failure mode; Rae et al. (Gopher, arXiv:2112.11446
    §A1.1) filter on exactly these fractions:

      * n_lines / dup_line_frac — share of the doc's lines that are repeats
        of an earlier line (1 − distinct/total). Computed with codegen'd
        collection expressions (split + array_distinct) — no explode, no
        shuffle, no lambda HOF.
      * top_bigram_frac — occurrences of the doc's most frequent word bigram
        over total bigrams (NULL when < 2 tokens). Bigrams come from ONE
        explode of arrays_zip(toks[:-1], toks[1:]) (codegen'd slices, no HOF)
        into the standard count → max hash-aggregate pair; both aggregates
        partial-combine map-side, so the exchanges carry per-(doc, bigram)
        and per-doc rows, never per-token rows.
    """
    toks = F.split(F.col(text_col), r"\s+")
    lines = F.split(F.col(text_col), "\n")
    base = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.size(lines).cast("int").alias("n_lines"),
        F.round(
            F.lit(1.0) - F.size(F.array_distinct(lines)) / F.size(lines), 4
        ).alias("dup_line_frac"),
    ).withColumn("_n_tok", F.size("_toks"))

    zipped = F.arrays_zip(
        F.slice(F.col("_toks"), 1, F.col("_n_tok") - 1),
        F.slice(F.col("_toks"), 2, F.col("_n_tok") - 1),
    )
    bg = (
        base.filter(F.col("_n_tok") >= 2)
        .select(F.col(id_col), F.explode(zipped).alias("_bg"))
        .select(
            F.col(id_col),
            F.concat_ws(" ", F.col("_bg.0"), F.col("_bg.1")).alias("_bigram"),
        )
    )
    top = (
        bg.groupBy(id_col, "_bigram")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(id_col)
        .agg(F.max("_c").alias("_max_bg"))
    )
    return (
        base.join(top, on=id_col, how="left")
        .select(
            F.col(id_col),
            "n_lines",
            "dup_line_frac",
            F.round(F.col("_max_bg") / (F.col("_n_tok") - 1), 4).alias(
                "top_bigram_frac"
            ),
        )
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping token windows — the standard
    pre-training/RAG chunker (window of `chunk_tokens`, stride
    `chunk_tokens - overlap`, last window truncated, short docs yield one
    chunk).

    Narrow plan: tokenize once, posexplode a chunk-index sequence, slice
    the token array per chunk — a handful of codegen'd array ops per CHUNK
    (not per token), no shuffle. Output rows are (id, chunk_idx,
    chunk_text, n_tokens), ready for pack_sequences or an embedding stage
    downstream.
    """
    assert 0 <= overlap < chunk_tokens
    step = chunk_tokens - overlap
    toks = F.split(F.col(text_col), r"\s+")
    staged = df.select(F.col(id_col), toks.alias("_t"), F.size(toks).alias("_n"))
    n_chunks = F.greatest(
        F.floor((F.col("_n") - F.lit(overlap) + F.lit(step - 1)) / F.lit(step)),
        F.lit(1),
    ).cast("int")
    e = staged.select(
        F.col(id_col),
        "_t",
        "_n",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * step + 1
    return e.select(
        F.col(id_col),
        F.col("chunk_idx"),
        F.concat_ws(" ", F.slice("_t", start, chunk_tokens)).alias("chunk_text"),
        F.least(F.lit(chunk_tokens), F.col("_n") - F.col("chunk_idx") * step)
        .cast("int")
        .alias("n_tokens"),
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

# built with types.StructType (not a DDL string) so importing this module
# never needs an active SparkSession to parse the schema
_GOPHER_SIGNAL_SCHEMA = T.StructType(
    [
        T.StructField("n_words", T.IntegerType()),
        T.StructField("mean_word_len", T.DoubleType()),
        T.StructField("symbol_word_ratio", T.DoubleType()),
        T.StructField("ellipsis_line_frac", T.DoubleType()),
        T.StructField("bullet_line_frac", T.DoubleType()),
        T.StructField("alpha_word_frac", T.DoubleType()),
        T.StructField("n_stopwords", T.IntegerType()),
        T.StructField("dup_line_frac", T.DoubleType()),
    ]
)


@pandas_udf(_GOPHER_SIGNAL_SCHEMA)
def _gopher_signals(text: pd.Series) -> pd.DataFrame:
    """Per-doc Gopher quality signals, Arrow-batched (one Python pass per doc
    over its token/line lists — no (doc, token) row inflation, no shuffle; the
    char_entropy lesson applied to per-token work).

    Tokenization splits on the ASCII whitespace class [ \\t\\n\\f\\r\\x0b]
    explicitly — Java/RE2 \\s is ASCII-only while Python's is Unicode, so a
    bare \\s here would diverge from both the package's JVM splits and the
    DuckDB oracle. Like F.split, leading/trailing separators keep their empty
    tokens.
    """
    import math
    import re

    ws = re.compile(r"[ \t\n\f\r\x0b]+")
    out = {k: [] for k in (
        "n_words", "mean_word_len", "symbol_word_ratio", "ellipsis_line_frac",
        "bullet_line_frac", "alpha_word_frac", "n_stopwords", "dup_line_frac",
    )}
    alpha = re.compile(r"[a-zA-Z]")

    def r4(v: float) -> float:
        # round half AWAY from zero (the JVM F.round / DuckDB convention) —
        # Python's built-in round is half-even and diverges on exact ties
        # like 1/32 = 0.03125
        return math.floor(v * 10000 + 0.5) / 10000

    for s in text:
        words = ws.split(s)
        lines = s.split("\n")
        nw, nl = len(words), len(lines)
        out["n_words"].append(nw)
        out["mean_word_len"].append(r4(sum(len(w) for w in words) / nw))
        out["symbol_word_ratio"].append(r4((s.count("#") + s.count("...")) / nw))
        out["ellipsis_line_frac"].append(
            r4(sum(1 for l in lines if l.endswith("...")) / nl)
        )
        out["bullet_line_frac"].append(
            r4(sum(1 for l in lines if l.startswith(("•", "-", "*"))) / nl)
        )
        out["alpha_word_frac"].append(
            r4(sum(1 for w in words if alpha.search(w)) / nw)
        )
        lowered = {w.lower() for w in words}
        out["n_stopwords"].append(sum(1 for sw in GOPHER_STOPWORDS if sw in lowered))
        out["dup_line_frac"].append(r4(1.0 - len(set(lines)) / nl))
    return pd.DataFrame(out)


def gopher_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_ellipsis_line_frac: float = 0.3,
    max_bullet_line_frac: float = 0.9,
    min_alpha_word_frac: float = 0.8,
    min_stopwords: int = 2,
    max_dup_line_frac: float = 0.3,
) -> DataFrame:
    """Gopher-rule composite quality gate (Rae et al. arXiv:2112.11446 §A1.1):
    word-count band, mean word length band, symbol-to-word ratio, ellipsis- and
    bullet-line fractions, alphabetic-word fraction, stopword floor, and the
    duplicate-line fraction — one boolean per rule plus the conjunctive `keep`.

    Scale shape: ONE Arrow pandas_udf pass computes every signal (the per-token
    and per-line work that would be interpreted HOFs or an exploded shuffle in
    pure SQL form) — a narrow per-row map with no shuffle at all; the rule
    thresholds are codegen'd comparisons over the struct fields. Thresholds are
    Gopher's published defaults; NULL text is excluded (no signals to gate).
    """
    sig = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), _gopher_signals(F.col(text_col)).alias("_s")
    ).select(id_col, "_s.*")
    checks = {
        "ok_word_count": F.col("n_words").between(min_words, max_words),
        "ok_word_len": F.col("mean_word_len").between(
            min_mean_word_len, max_mean_word_len
        ),
        "ok_symbols": F.col("symbol_word_ratio") <= max_symbol_word_ratio,
        "ok_ellipsis": F.col("ellipsis_line_frac") <= max_ellipsis_line_frac,
        "ok_bullets": F.col("bullet_line_frac") <= max_bullet_line_frac,
        "ok_alpha": F.col("alpha_word_frac") >= min_alpha_word_frac,
        "ok_stopwords": F.col("n_stopwords") >= min_stopwords,
        "ok_dup_lines": F.col("dup_line_frac") <= max_dup_line_frac,
    }
    out = sig
    for name, cond in checks.items():
        out = out.withColumn(name, cond)
    keep = F.lit(True)
    for name in checks:
        keep = keep & F.col(name)
    return out.withColumn("keep", keep)


def char_bigram_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, ctx, nxt) rows: every adjacent character pair of every doc.

    Codegen'd: posexplode of a position sequence + two substrings — no
    Python, no HOF. Docs shorter than 2 chars yield no rows.
    """
    t = F.col(text_col)
    # one linear split per doc, pairs zipped from two array slices —
    # exploding a position sequence and substr-ing per row would carry
    # the full text through the Generate into every char row (O(len²)
    # bytes) and pay UTF8String's O(position) char-offset scan per slice
    chars = F.split(t, "")
    pairs = F.arrays_zip(
        F.slice(chars, 1, F.length(t) - 1),
        F.slice(chars, 2, F.length(t) - 1),
    )
    return (
        df.filter(t.isNotNull() & (F.length(t) >= 2))
        .select(F.col(id_col), F.explode(pairs).alias("_p"))
        .select(
            F.col(id_col),
            F.col("_p")["0"].alias("ctx"),
            F.col("_p")["1"].alias("nxt"),
        )
    )


def char_lm_train(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train a character-bigram language model with add-one smoothing.

    The CCNet recipe (Wenzek et al., arXiv:1911.00359) filters web text by
    LM perplexity against a trusted reference corpus; this is that shape
    with a character bigram model (order kept low so the model is exactly
    SQL-expressible and the smoothed math has a closed form — swapping in a
    higher order only grows the count frames).

    Returns (counts, ctx_totals, vocab_size):
      * counts     — one row per SEEN (ctx, nxt) pair with its count: at
        most |vocab|² rows regardless of corpus size (broadcast-able).
      * ctx_totals — one row per seen ctx with the total pair count.
      * vocab_size — single row `v`: distinct chars observed in pairs.
    All three are vocabulary-sized aggregates with map-side partial
    combine — the exchanges carry character keys, never corpus text.
    """
    pairs = char_bigram_pairs(df, text_col, id_col)
    counts = pairs.groupBy("ctx", "nxt").agg(F.count(F.lit(1)).alias("c"))
    ctx_totals = counts.groupBy("ctx").agg(F.sum("c").alias("tot"))
    # chars seen in pairs == chars among counts' keys (counts is the pair
    # dedup), so totals AND vocab both derive from the VOCAB-SIZED counts
    # frame, never from a second pass over raw pairs. The three outputs
    # share counts' lineage — persist counts (it is ≤ |vocab|² rows) when
    # the training corpus is large enough that re-running its scan matters
    vocab_size = (
        counts.select(F.col("ctx").alias("ch"))
        .union(counts.select(F.col("nxt").alias("ch")))
        .agg(F.count_distinct("ch").alias("v"))
    )
    return counts, ctx_totals, vocab_size


def char_lm_perplexity(
    df: DataFrame,
    counts: DataFrame,
    ctx_totals: DataFrame,
    vocab_size: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score documents by bits-per-character under a trained char-bigram LM —
    the perplexity gate of CCNet-style quality filtering (low = reference-like
    prose, high = junk/boilerplate/wrong-language).

    Add-one smoothing gives one closed form for all three cases:
    P(nxt|ctx) = (c + 1) / (tot + V) with c, tot = 0 when unseen (unseen ctx
    degenerates to uniform 1/V). Output: (id, n_bigrams, bits_per_char),
    docs with ≥ 1 bigram only.

    Scale shape: the doc side explodes to character pairs (narrow, codegen),
    the model joins are FORCED BROADCAST (both frames are vocabulary-bounded
    by construction — ≤ |V|² rows however large the training corpus), and the
    only shuffle is the per-doc aggregate, partial-combined map-side to one
    row per doc per task. Nothing Python-side; for multi-KB docs an Arrow
    kernel over a broadcast dict would cut the explode row inflation (the
    char_entropy lesson) at the cost of leaving codegen — the JVM form is
    the oracle-checkable reference shape.
    """
    pairs = char_bigram_pairs(df, text_col, id_col)
    joined = (
        pairs.join(F.broadcast(counts), ["ctx", "nxt"], "left")
        .join(F.broadcast(ctx_totals), ["ctx"], "left")
        .crossJoin(F.broadcast(vocab_size))
    )
    logp = F.log2(
        (F.coalesce(F.col("c"), F.lit(0)) + 1)
        / (F.coalesce(F.col("tot"), F.lit(0)) + F.col("v"))
    )
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_bigrams"),
        F.round(-F.avg(logp), 4).alias("bits_per_char"),
    )


def word_bigram_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, w1, w2) rows: every adjacent lowercased-word pair. Codegen'd
    posexplode over the token array — no Python; docs with < 2 tokens
    yield no rows."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), _WS), lambda x: x != ""
    )
    # pairs zipped from two slices of the token array — exploding an index
    # and element_at-ing per row would carry the whole token array through
    # the Generate into every pair row (array-width × n_tokens bytes)
    return (
        df.select(F.col(id_col), toks.alias("_t"))
        .filter(F.size("_t") >= 2)
        .select(
            F.col(id_col),
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("_t"), 1, F.size("_t") - 1),
                    F.slice(F.col("_t"), 2, F.size("_t") - 1),
                )
            ).alias("_p"),
        )
        .select(
            F.col(id_col),
            F.col("_p")["0"].alias("w1"),
            F.col("_p")["1"].alias("w2"),
        )
    )


def kneser_ney_train(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Train an interpolated Kneser-Ney WORD-bigram LM (Kneser & Ney 1995;
    Chen & Goodman 1999 §2.7) from a reference corpus — the model class
    KenLM serves in CCNet-style perplexity filtering; the bigram order
    keeps every term SQL-expressible so the oracle replays the full
    smoothing math, and higher orders only add count frames.

    Returns (bigrams, ctx, cont, totals):
      * bigrams — (w1, w2, c): seen-pair counts. Reference-corpus-bounded
        (distinct pair TYPES, not tokens).
      * ctx     — (w1, tot, n_follow): context token total c(w1·) and the
        follower-type count N1+(w1,·) — BOTH derived from the bigrams
        frame, never a second corpus pass.
      * cont    — (w2, n_prec): predecessor-type count N1+(·,w2), the
        continuation numerator.
      * totals  — ONE row (t_types, v1): total distinct bigram types and
        vocabulary size + 1 (the unk slot).
    Every frame is a map-side-combined aggregate whose exchange carries
    word keys; the corpus is touched exactly once — the bigrams frame is
    PERSISTED (it is pair-type-sized, not corpus-sized) and ctx/cont
    derive from it, while totals derives from ctx∪cont (vocabulary-sized
    inputs), so no downstream frame re-runs the corpus explode. Callers
    may `bigrams.unpersist()` after scoring.
    """
    pairs = word_bigram_pairs(df, text_col, id_col)
    bigrams = (
        pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c")).persist()
    )
    ctx = bigrams.groupBy("w1").agg(
        F.sum("c").alias("tot"), F.count(F.lit(1)).alias("n_follow")
    )
    cont = bigrams.groupBy("w2").agg(F.count(F.lit(1)).alias("n_prec"))
    # T = Σ follower-types; vocab = distinct over the two aggregate frames'
    # keys — everything here is vocabulary-sized, nothing touches the corpus
    totals = (
        ctx.select(F.col("w1").alias("w"))
        .union(cont.select(F.col("w2").alias("w")))
        .agg((F.count_distinct("w") + 1).alias("v1"))
        .crossJoin(ctx.agg(F.sum("n_follow").alias("t_types")))
        .select("t_types", "v1")
    )
    return bigrams, ctx, cont, totals


def kneser_ney_bits(
    df: DataFrame,
    bigrams: DataFrame,
    ctx: DataFrame,
    cont: DataFrame,
    totals: DataFrame,
    discount: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score documents as bits-per-bigram under the interpolated KN model:

      P(w2|w1) = max(c−D,0)/c(w1·) + D·N1+(w1,·)/c(w1·) · Pc(w2)   seen ctx
                 Pc(w2)                                            unseen ctx
      Pc(w2)   = (N1+(·,w2) + 1) / (T + V1)    (+1/V1: the unk floor, so
                                                OOV next-words stay finite)

    Scale shape: the doc side is a codegen'd bigram explode; `ctx`/`cont`
    are vocabulary-sized → forced broadcast at any corpus size; the
    (w1,w2)-keyed `bigrams` join is reference-corpus-bounded — a real
    reference (Wikipedia-scale) broadcasts too, and AQE picks that plan
    when it fits (left to AQE rather than forced, since bigram TYPES grow
    faster than vocabulary); totals is one broadcast row. The only
    corpus-sized exchange is the final per-doc aggregate, map-side
    combined. Output: (id, n_bigrams, kn_bits), docs with ≥ 1 bigram.
    """
    pairs = word_bigram_pairs(df, text_col, id_col)
    joined = (
        pairs.join(bigrams, ["w1", "w2"], "left")
        .join(F.broadcast(ctx), ["w1"], "left")
        .join(F.broadcast(cont), ["w2"], "left")
        .crossJoin(F.broadcast(totals))
    )
    d = F.lit(discount)
    pc = (F.coalesce(F.col("n_prec"), F.lit(0)) + 1) / (
        F.col("t_types") + F.col("v1")
    )
    seen_ctx = F.col("tot").isNotNull()
    p = F.when(
        seen_ctx,
        F.greatest(F.coalesce(F.col("c"), F.lit(0)) - d, F.lit(0.0))
        / F.col("tot")
        + d * F.col("n_follow") / F.col("tot") * pc,
    ).otherwise(pc)
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_bigrams"),
        F.round(-F.avg(F.log2(p)), 4).alias("kn_bits"),
    )


def vocab_topk(
    df: DataFrame,
    k: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus vocabulary induction: the k most frequent whitespace tokens
    with total count and document frequency — the seed step for BPE-style
    vocab building and for stopword/heavy-hitter diagnostics.

    Explode → ONE hash aggregate per (token) carrying (count, n_docs via
    count_distinct) with map-side partial combine — the exchange is
    vocabulary-sized, not corpus-sized. The final top-k is a single
    ORDER/LIMIT over the vocabulary frame (count desc, token asc — fully
    deterministic), which Spark plans as TakeOrderedAndProject: each
    partition forwards only its local top k.
    """
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), r"\s+")).alias("token")
    )
    counts = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count_distinct(F.col(id_col)).alias("n_docs"),
    )
    return (
        counts.orderBy(F.desc("n_total"), F.col("token"))
        .limit(k)
        .withColumn(
            "vocab_rank",
            F.row_number().over(
                Window.orderBy(F.desc("n_total"), F.col("token"))
            ).cast("int"),
        )
    )


def train_bpe_merges(
    df: DataFrame,
    k: int = 10,
    text_col: str = "text",
) -> DataFrame:
    """Learn the first `k` BPE merge rules from a corpus (Sennrich et al.,
    arXiv:1508.07909): repeatedly count adjacent symbol pairs across the
    word-frequency vocabulary and merge the most frequent pair everywhere.
    Returns (step, left_sym, right_sym, freq) — step 1 is the first merge.

    Scale shape — the classic BPE trick, distributed: the CORPUS is touched
    exactly once (whitespace split → explode → word-count aggregate,
    map-side combined, exchange carries one row per distinct word); every
    merge iteration then runs on the VOCABULARY frame (distinct words ×
    counts — millions of rows for a 100 TB corpus, not trillions). Each
    iteration is one explode + weighted count aggregate + a 1-ROW collect
    (the argmax pair) + a codegen'd literal `replace` over the vocab;
    `localCheckpoint` truncates the growing loop lineage each round, the
    resolve_duplicate_groups lesson. This call is EAGER (k jobs).

    Words are lowercased and restricted to ^[a-z]+$ — the sentinel encoding
    `<s1><s2>…` brackets every symbol, so merging pair (a,b) is the literal
    replacement `<a><b>` → `<ab>`; non-overlapping left-to-right `replace`
    on a fully bracketed string IS greedy BPE merge order, and the same
    call exists verbatim in DuckDB, which makes every iteration
    SQL-replayable (the `doc_bpe_train` oracle chains k CTE stages).
    Ties break on (freq desc, left_sym asc, right_sym asc), deterministic
    in both engines over the ASCII alphabet.
    """
    spark = df.sparkSession
    words = (
        df.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"[ \t\n\f\r\x0b]+")).alias("w")
        )
        .filter(F.col("w").rlike("^[a-z]+$"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    vocab = words.select(
        F.concat(
            F.lit("<"),
            F.array_join(F.split(F.col("w"), ""), "><"),
            F.lit(">"),
        ).alias("repr"),
        "cnt",
    ).localCheckpoint()

    merges = []
    for step in range(1, k + 1):
        syms = F.split(F.expr("trim(BOTH '<>' FROM repr)"), "><")
        n = F.size(syms)
        pairs = (
            vocab.filter(n >= 2)
            .select(
                F.explode(
                    F.arrays_zip(
                        F.slice(syms, 1, n - 1).alias("l"),
                        F.slice(syms, 2, n - 1).alias("r"),
                    )
                ).alias("p"),
                "cnt",
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("cnt").alias("freq"))
        )
        best = pairs.orderBy(F.desc("freq"), F.asc("l"), F.asc("r")).limit(1).collect()
        if not best:
            break
        l, r, freq = best[0]["l"], best[0]["r"], int(best[0]["freq"])
        merges.append((step, l, r, freq))
        vocab = vocab.select(
            F.replace(
                F.col("repr"), F.lit(f"<{l}><{r}>"), F.lit(f"<{l}{r}>")
            ).alias("repr"),
            "cnt",
        ).localCheckpoint()
    return spark.createDataFrame(
        merges, "step int, left_sym string, right_sym string, freq bigint"
    )


def bpe_encode(
    df: DataFrame,
    merges: list,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize with a learned BPE merge list (the output rows of
    `train_bpe_merges`, applied in step order): per-doc
    (id, n_words, n_tokens) — n_tokens is the post-merge symbol count, the
    number a packing/budgeting stage actually needs.

    Scale shape: the merge chain runs ONCE over the DISTINCT-WORD frame
    (k chained codegen'd literal `replace` calls — k is tokenizer-sized,
    corpus-independent), then per-word token counts rejoin the exploded
    corpus by word and aggregate per doc. Two shuffles total (distinct
    words; per-doc agg), both map-side combined; the merge chain itself
    never touches corpus-sized data. Same [a-z]+ word scope as training;
    out-of-scope words count 0 tokens (they carry no learned merges).
    """
    words = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), r"[ \t\n\f\r\x0b]+")).alias("w"),
    ).filter(F.col("w").rlike("^[a-z]+$"))
    repr_col = F.concat(
        F.lit("<"), F.array_join(F.split(F.col("w"), ""), "><"), F.lit(">")
    )
    for m in sorted(merges, key=lambda m: m[0]):
        _, l, r = m[0], m[1], m[2]
        repr_col = F.replace(repr_col, F.lit(f"<{l}><{r}>"), F.lit(f"<{l}{r}>"))
    word_tokens = (
        words.select("w").distinct().select(
            "w", F.size(F.split(repr_col, "><")).alias("n_tok")
        )
    )
    return (
        words.join(word_tokens, "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_words"),
            F.sum("n_tok").cast("int").alias("n_tokens"),
        )
    )


def _apply_merges_sequential(symbols: list, ranks: dict) -> list:
    """Apply a BPE merge table to one word with SEQUENTIAL-PASS semantics —
    the exact behavior of k chained left-to-right `replace` calls (each
    merge gets ONE full pass, in step order; a pair created by a LATER
    merge never revisits an earlier step) — without iterating the full
    table. At each round the word's adjacent pairs are scanned for the
    minimum merge step STRICTLY ABOVE the last applied step; all other
    table entries are skipped for free, so cost is O(len² · merges that
    actually fire), independent of table size. Returns the final symbol
    list. `ranks` maps (left, right) → step."""
    last = 0
    while len(symbols) > 1:
        best = None
        for i in range(len(symbols) - 1):
            r = ranks.get((symbols[i], symbols[i + 1]))
            if r is not None and r > last and (best is None or r < best):
                best = r
        if best is None:
            break
        out, i = [], 0
        while i < len(symbols):
            if (
                i + 1 < len(symbols)
                and ranks.get((symbols[i], symbols[i + 1])) == best
            ):
                out.append(symbols[i] + symbols[i + 1])
                i += 2
            else:
                out.append(symbols[i])
                i += 1
        symbols = out
        last = best
    return symbols


def bpe_encode_arrow(
    df: DataFrame,
    merges: list,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """`bpe_encode` for PRODUCTION-SIZED merge tables: same output contract
    (id, n_words, n_tokens), same sequential-pass semantics, but the merge
    table is applied inside an Arrow `pandas_udf` over the DISTINCT-WORD
    frame (the `unigram_token_counts` Viterbi pattern) instead of k chained
    `F.replace` expressions. The chained-expression form dies in Catalyst
    (analyzer stack depth / 64 KB codegen method limits) thousands of
    levels below a real ~32k-merge vocabulary; here the table is a dict in
    the UDF closure — k only affects closure size, never plan size, and
    per-word cost is O(len² · merges that fire) via the min-next-step scan
    (`_apply_merges_sequential`), not O(k).

    Scale shape is unchanged from `bpe_encode`: the corpus is exploded
    once, the UDF runs once per DISTINCT word, and two map-side-combined
    shuffles (distinct words; per-doc agg) are the only exchanges. Shares
    the `doc_bpe_encode` oracle at small k — the driver gate itself proves
    the Arrow variant matches the chained-replace replay.
    """
    ranks = {(m[1], m[2]): int(m[0]) for m in merges}

    @pandas_udf("int")
    def n_tok(words: pd.Series) -> pd.Series:
        return pd.Series(
            [len(_apply_merges_sequential(list(w), ranks)) for w in words],
            dtype="int32",
        )

    words = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), r"[ \t\n\f\r\x0b]+")).alias("w"),
    ).filter(F.col("w").rlike("^[a-z]+$"))
    word_tokens = words.select("w").distinct().select("w", n_tok("w").alias("n_tok"))
    return (
        words.join(word_tokens, "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_words"),
            F.sum("n_tok").cast("int").alias("n_tokens"),
        )
    )


def bpe_tokenize_arrow(
    df: DataFrame,
    merges: list,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Full tokenization — actual TOKEN IDS per document, not just counts:
    (id, n_words, n_tokens, ids) where `ids` is the comma-joined id
    sequence over the doc's in-scope words in order. Id scheme is closed
    form so the oracle can rebuild it: single chars a–z get 0–25, the
    symbol created by merge step s gets 26+s−1 (first-creating step wins
    when two merges produce the same surface string). This is the piece a
    packing/training pipeline actually consumes; `bpe_encode*` only
    budgets.

    Same scale shape as `bpe_encode_arrow`: merges apply once per DISTINCT
    word inside an Arrow UDF (plan size independent of k); the per-doc
    rebuild is ONE order-restoring aggregate over (word-position, ids)
    structs — the remove_boilerplate_lines rebuild pattern. Docs with no
    in-scope words produce no row (join semantics, mirrored by the
    oracle)."""
    sym_ids = {chr(97 + i): i for i in range(26)}
    for m in sorted(merges, key=lambda m: m[0]):
        sym_ids.setdefault(m[1] + m[2], 26 + int(m[0]) - 1)
    ranks = {(m[1], m[2]): int(m[0]) for m in merges}

    @pandas_udf("string")
    def tok_ids(words: pd.Series) -> pd.Series:
        return pd.Series(
            [
                ",".join(
                    str(sym_ids[s]) for s in _apply_merges_sequential(list(w), ranks)
                )
                for w in words
            ]
        )

    words = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.lower(F.col(text_col)), r"[ \t\n\f\r\x0b]+")
        ).alias("wpos", "w"),
    ).filter(F.col("w").rlike("^[a-z]+$"))
    word_tokens = words.select("w").distinct().select(
        "w", tok_ids("w").alias("_ids")
    )
    return (
        words.join(word_tokens, "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_words"),
            F.sum(F.size(F.split("_ids", ","))).cast("int").alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("wpos", "_ids"))),
                    lambda s: s["_ids"],
                ),
                ",",
            ).alias("ids"),
        )
    )


def train_bpe_merges_local(
    df: DataFrame,
    k: int = 10,
    text_col: str = "text",
    max_words: int | None = None,
) -> DataFrame:
    """`train_bpe_merges` for PRODUCTION-SIZED k: identical greedy algorithm
    and tie-breaks ((freq desc, left asc, right asc); one full left-to-right
    pass per merge), but the per-merge iteration runs on the DRIVER over the
    collected word-frequency table with INCREMENTAL pair-count updates —
    zero Spark jobs per merge instead of one. The distributed loop's cost
    model is corpus-right but driver-wrong: 32k merges = 32k sequential
    argmax jobs ≈ hours of scheduler latency at ANY corpus size.

    Scale split: the corpus-sized work (word counting) stays distributed
    and touches the corpus ONCE; the vocabulary-sized work (pair counting,
    argmax, merge application) is driver-local — the unigram-LM piece-table
    pattern, where driver traffic is bounded by the VOCABULARY, not the
    corpus. `max_words` caps the collected vocabulary at the top-N words by
    (count desc, word asc) — a TakeOrderedAndProject cut, the standard
    trainer bound (every production BPE trainer caps candidate words; the
    dropped tail is rare words whose pair mass is negligible). With
    max_words=None the table is exact and the output is bit-identical to
    `train_bpe_merges` (pytest-proven; `doc_bpe_train_local` shares the
    `doc_bpe_train` oracle so the driver gate proves it too).

    Per merge: argmax via a lazily-invalidated heap (O(log P) per touched
    pair) and pair-count updates only around actual replacement sites —
    the textbook fast BPE trainer (Sennrich 1508.07909 §3 describes the
    algorithm; implementation here is original).
    """
    import heapq

    spark = df.sparkSession
    words_df = (
        df.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"[ \t\n\f\r\x0b]+")).alias("w")
        )
        .filter(F.col("w").rlike("^[a-z]+$"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if max_words is not None:
        words_df = words_df.orderBy(F.desc("cnt"), F.asc("w")).limit(max_words)
    rows = words_df.collect()
    words = [(list(r["w"]), int(r["cnt"])) for r in rows]

    from collections import Counter

    def word_pairs(syms) -> Counter:
        c: Counter = Counter()
        for i in range(len(syms) - 1):
            c[(syms[i], syms[i + 1])] += 1
        return c

    # pair -> total weighted count; pair -> {word_idx} ever containing it
    # (membership may go stale after merges — a stale pass over a word
    # without the pair is a clean no-op, see below)
    pair_counts: Counter = Counter()
    pair_words: dict = {}
    for wi, (syms, cnt) in enumerate(words):
        for p, n in word_pairs(syms).items():
            pair_counts[p] += n * cnt
            pair_words.setdefault(p, set()).add(wi)

    # lazily-invalidated heap: any entry whose count no longer matches
    # pair_counts is discarded on pop; every count CHANGE pushes the fresh
    # value so the live count is always somewhere in the heap
    heap = [(-n, p[0], p[1]) for p, n in pair_counts.items()]
    heapq.heapify(heap)

    merges = []
    for step in range(1, k + 1):
        best = None
        while heap:
            negn, l, r = heap[0]
            cur = pair_counts.get((l, r))
            if cur is None or -negn != cur:
                heapq.heappop(heap)  # stale entry
                continue
            best = (l, r, cur)
            break
        if best is None:
            break
        l, r, freq = best
        merges.append((step, l, r, freq))
        merged = l + r
        for wi in sorted(pair_words.pop((l, r), ())):
            syms, cnt = words[wi]
            old = word_pairs(syms)
            if (l, r) not in old:
                continue  # stale membership — word changed under this pair
            out, i = [], 0
            while i < len(syms):
                # one left-to-right non-overlapping pass, exactly like the
                # literal replace in the distributed form
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new = word_pairs(out)
            for p in set(old) | set(new):
                d = (new.get(p, 0) - old.get(p, 0)) * cnt
                if d == 0:
                    continue
                n = pair_counts[p] + d
                if n <= 0:
                    pair_counts.pop(p, None)
                else:
                    pair_counts[p] = n
                    heapq.heappush(heap, (-n, p[0], p[1]))
                if d > 0:
                    pair_words.setdefault(p, set()).add(wi)
            words[wi] = (out, cnt)
        pair_counts.pop((l, r), None)
    return spark.createDataFrame(
        merges, "step int, left_sym string, right_sym string, freq bigint"
    )


# ---------------------------------------------------------------------------
# Naive Bayes quality classifier (GPT-3 appendix A / PaLM-style filtering)
# ---------------------------------------------------------------------------

_WS = r"[ \t\n\f\r\x0b]+"  # explicit ASCII class: identical in Java and RE2


def _ws_tokens(df: DataFrame, text_col: str, *extra) -> DataFrame:
    """Lowercased whitespace tokens, empties dropped: (extra…, token)."""
    return df.select(
        *extra,
        F.explode(F.split(F.lower(F.col(text_col)), _WS)).alias("token"),
    ).filter(F.col("token") != "")


def nb_quality_train(
    df: DataFrame, label, text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """Train a binary Naive Bayes token classifier for quality filtering.

    GPT-3 (2005.14165 appendix A) and PaLM filter web crawl by a linear
    classifier scoring "reference-corpus-like" vs "raw crawl"; multinomial
    NB with add-one smoothing is that classifier in closed form — fully
    SQL-replayable, one pass, no iterative optimizer.

    `label` is a boolean Column evaluated per training row (True = positive
    / reference class). Returns (token_counts, class_stats):

      * token_counts — one row per SEEN token: (token, c_pos, c_neg).
        Vocabulary-sized however large the corpus — broadcastable.
      * class_stats  — ONE row: (n_pos, n_neg, v, d_pos, d_neg) = per-class
        token totals, distinct-token count, per-class doc counts.

    Scale shape: the only corpus-sized stage is the token explode feeding a
    map-side-combined hash aggregate keyed on token; class totals and vocab
    derive from the vocabulary-sized counts frame, doc priors from a
    two-long-column scan of the input.
    """
    lab = df.select(label.alias("_pos"), F.col(text_col))
    toks = _ws_tokens(lab, text_col, "_pos")
    counts = toks.groupBy("token").agg(
        F.sum(F.col("_pos").cast("long")).alias("c_pos"),
        F.sum((~F.col("_pos")).cast("long")).alias("c_neg"),
    )
    token_stats = counts.agg(
        F.sum("c_pos").alias("n_pos"),
        F.sum("c_neg").alias("n_neg"),
        F.count(F.lit(1)).alias("v"),
    )
    doc_stats = lab.agg(
        F.sum(F.col("_pos").cast("long")).alias("d_pos"),
        F.sum((~F.col("_pos")).cast("long")).alias("d_neg"),
    )
    return counts, token_stats.crossJoin(F.broadcast(doc_stats))


def nb_quality_score(
    df: DataFrame,
    token_counts: DataFrame,
    class_stats: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score documents with a trained NB classifier: (id, n_tokens, nb_logit).

    nb_logit = ln((d_pos+1)/(d_neg+1))                          [prior]
             + Σ_tokens [ln(c_t+1) − ln(c_f+1)]                 [per-token]
             + n_tokens · [ln(n_neg+v) − ln(n_pos+v)]           [normalizer]

    with c = 0 for unseen tokens — the add-one closed form, factored so the
    corpus-sized aggregate carries ONE double (the per-token sum) and the
    vocabulary-independent terms attach after the aggregate. Positive logit
    = more reference-like than crawl-like. Docs with ≥1 token only.

    The model joins are FORCED BROADCAST (both frames vocabulary-bounded by
    construction); the only shuffle is the per-doc aggregate, map-side
    combined. Same plan family as char_lm_perplexity.
    """
    toks = _ws_tokens(df, text_col, F.col(id_col))
    per_tok = toks.join(F.broadcast(token_counts), "token", "left").select(
        id_col,
        (
            F.log(F.coalesce(F.col("c_pos"), F.lit(0)) + 1)
            - F.log(F.coalesce(F.col("c_neg"), F.lit(0)) + 1)
        ).alias("_term"),
    )
    agg = per_tok.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_tokens"),
        F.sum("_term").alias("_s"),
    )
    return agg.crossJoin(F.broadcast(class_stats)).select(
        id_col,
        "n_tokens",
        F.round(
            F.log((F.col("d_pos") + 1) / (F.col("d_neg") + 1))
            + F.col("_s")
            + F.col("n_tokens")
            * (F.log(F.col("n_neg") + F.col("v")) - F.log(F.col("n_pos") + F.col("v"))),
            4,
        ).alias("nb_logit"),
    )


# ---------------------------------------------------------------------------
# DSIR: data selection via hashed-ngram importance resampling
# ---------------------------------------------------------------------------


def dsir_importance(
    df: DataFrame,
    target,
    n_buckets: int = 8192,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Hashed-ngram importance weights for data selection (DSIR, Xie et al.
    arXiv:2302.03169): log w(d) = Σ_f ln p_target(b_f) − ln p_raw(b_f) over
    d's hashed uni+bigram features, bag-of-buckets models with add-one
    smoothing. Returns (id, n_feats, log_w) for every RAW (non-target) doc;
    resample by log_w + Gumbel noise for the selected subset.

    `target` is a boolean Column: True rows define the target distribution,
    False rows are the raw pool being weighted. Features hash through
    md5 → first 8 hex digits → pmod n_buckets (md5 so the exact bucket
    assignment replays in any engine; swap xxhash64 for production speed —
    the plan is identical).

    Scale shape: bucket-count frames are ≤ n_buckets rows (broadcast
    always); the factored form attaches the normalizer ln(N_raw+B) −
    ln(N_target+B) AFTER the per-doc aggregate so the corpus-sized exchange
    carries one double. Bigrams come from a codegen'd zip_with over the
    token array — per-token array HOFs cost ~15 µs/row interpreted, so at
    production scale swap the feature extractor for an Arrow pandas_udf
    (the ngram_decontaminate lesson); the JVM form is the oracle-checkable
    reference shape.
    """
    lab = df.select(F.col(id_col), target.alias("_t"), F.col(text_col))
    toks = F.filter(F.split(F.lower(F.col(text_col)), _WS), lambda t: t != "")
    big = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    feats = lab.select(
        id_col, "_t", F.explode(F.concat(toks, big)).alias("feat")
    ).select(
        id_col,
        "_t",
        F.pmod(
            F.conv(F.substring(F.md5(F.col("feat")), 1, 8), 16, 10).cast("long"),
            F.lit(n_buckets),
        ).alias("b"),
    )
    bcounts = feats.groupBy("b").agg(
        F.sum(F.col("_t").cast("long")).alias("c_t"),
        F.sum((~F.col("_t")).cast("long")).alias("c_r"),
    )
    totals = bcounts.agg(F.sum("c_t").alias("n_t"), F.sum("c_r").alias("n_r"))
    per_feat = (
        feats.filter(~F.col("_t"))
        .join(F.broadcast(bcounts), "b", "left")
        .select(
            id_col,
            (
                F.log(F.coalesce(F.col("c_t"), F.lit(0)) + 1)
                - F.log(F.coalesce(F.col("c_r"), F.lit(0)) + 1)
            ).alias("_term"),
        )
    )
    agg = per_feat.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_feats"), F.sum("_term").alias("_s")
    )
    return agg.crossJoin(F.broadcast(totals)).select(
        id_col,
        "n_feats",
        F.round(
            F.col("_s")
            + F.col("n_feats")
            * (F.log(F.col("n_r") + F.lit(n_buckets)) - F.log(F.col("n_t") + F.lit(n_buckets))),
            4,
        ).alias("log_w"),
    )


def dsir_resample(
    weights: DataFrame,
    df: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gumbel top-k resampling over DSIR importance weights — samples k docs
    WITHOUT replacement with P(d) ∝ w(d), deterministically: the Gumbel noise
    g = −ln(−ln(u)) derives u from md5(text) (cluster-size-stable like every
    sampler here), and argtop-k of log_w + g is exactly weighted sampling
    without replacement (Gumbel-max trick). Spark plans the k-cut as
    TakeOrderedAndProject — each partition forwards only its local top k.
    Ties (byte-identical texts share u AND log_w) break on id desc.
    """
    u = (
        F.conv(F.substring(F.md5(F.col(text_col)), 1, 8), 16, 10).cast("double")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    keyed = weights.join(df.select(id_col, text_col), id_col).select(
        id_col,
        "n_feats",
        "log_w",
        F.round(F.col("log_w") - F.log(-F.log(u)), 4).alias("gumbel_key"),
    )
    return keyed.orderBy(F.desc("gumbel_key"), F.desc(id_col)).limit(k)


# ---------------------------------------------------------------------------
# BM25 retrieval scoring
# ---------------------------------------------------------------------------


def bm25_topk(
    df: DataFrame,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 top-k retrieval over the corpus for one query string — the
    lexical-retrieval primitive of curation workflows (find benchmark-like
    docs, audit what a filter kept, nearest-neighbor sanity checks without
    embeddings). Lucene's non-negative idf form:

        idf(t)  = ln(1 + (N − df_t + 0.5) / (df_t + 0.5))
        score   = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·len/avgdl))

    Returns (id, n_terms_hit, score) for the top k docs (score desc, id asc).

    Scale shape: ONE corpus pass — the token explode feeds a single per-doc
    aggregate computing doc length AND one conditional-sum tf per query term
    (query terms are a handful of literal columns, the funnel_steps
    chained-conditional-agg pattern), so the corpus never shuffles twice and
    never shuffles by token. The per-term stack, df_t, and the (N, avgdl)
    row are all ≤ |terms|- or 1-sized frames (broadcast); the k-cut plans
    as TakeOrderedAndProject.
    """
    terms = sorted({t for t in query.lower().split() if t})
    if not terms:
        raise ValueError("bm25_topk: empty query")
    toks = _ws_tokens(df, text_col, F.col(id_col))
    per_doc = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.sum((F.col("token") == t).cast("long")).alias(f"_tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    quoted = [t.replace("'", "''") for t in terms]  # terms as safe SQL literals
    stack = ", ".join(f"'{t}', _tf{i}" for i, t in enumerate(quoted))
    tf = per_doc.select(
        id_col, "dl", F.expr(f"stack({len(terms)}, {stack}) AS (token, tf)")
    ).filter(F.col("tf") > 0)
    dft = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df_t"))
    scored = (
        tf.join(F.broadcast(dft), "token")
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            (
                F.log(
                    1
                    + (F.col("n_docs") - F.col("df_t") + 0.5)
                    / (F.col("df_t") + 0.5)
                )
                * (F.col("tf") * (k1 + 1))
                / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
            ).alias("_s"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_terms_hit"),
            F.round(F.sum("_s"), 4).alias("score"),
        )
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def hybrid_topk(
    docs: DataFrame,
    vectors: DataFrame,
    query: str,
    query_vec: list[float],
    k: int = 10,
    k_rrf: int = 60,
    pool: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hybrid lexical+dense retrieval fused with Reciprocal Rank Fusion
    (Cormack, Clarke & Buettcher, SIGIR'09):

        rrf(d) = Σ_r 1/(k_rrf + rank_r(d))

    over the BM25 ranking and the exact-cosine ranking, each truncated to a
    `pool` of candidates. RRF is the standard hybrid combiner because it
    fuses RANKS, not scores — no per-ranker score calibration exists or is
    needed; a doc absent from one pool simply contributes only the other
    ranker's term (RRF over truncated lists). Ids in `docs` and `vectors`
    must refer to the same documents.

    Scale shape: each ranker is its existing single-pass operator ending in
    a TakeOrderedAndProject pool cut, so rank assignment runs on POOL-sized
    frames (the single-partition windows below are bounded at `pool` rows
    by construction — never corpus-sized); fusion is a full-outer join of
    two pool-sized frames plus one final k-cut (planned as a sort-merge
    join — FULL OUTER has no broadcast form — over ≤pool-row inputs, so the
    sort is trivial). The corpus is touched exactly once per modality.
    """
    from hatchery_spark.functions.similarity import cosine_topk

    spark = docs.sparkSession
    bm = bm25_topk(docs, query, k=pool, text_col=text_col, id_col=id_col)
    wb = Window.orderBy(F.desc("score"), F.col(id_col))
    bm_r = bm.select(
        F.col(id_col).alias("_id"), F.row_number().over(wb).alias("bm25_rank")
    )
    qdf = spark.createDataFrame(
        [(0, [float(x) for x in query_vec])],
        "query_id long, embedding array<double>",
    )
    cs = cosine_topk(vectors, qdf, k=pool, id_col=vec_id_col, vec_col=vec_col)
    cs_r = cs.select(
        F.col(vec_id_col).alias("_id"), F.col("rank").alias("cosine_rank")
    )
    fused = bm_r.join(cs_r, "_id", "full_outer")
    rrf = F.coalesce(
        F.lit(1.0) / (F.lit(k_rrf) + F.col("bm25_rank")), F.lit(0.0)
    ) + F.coalesce(
        F.lit(1.0) / (F.lit(k_rrf) + F.col("cosine_rank")), F.lit(0.0)
    )
    return (
        fused.select(
            F.col("_id").alias(id_col),
            F.round(rrf, 6).alias("rrf_score"),
            "bm25_rank",
            "cosine_rank",
        )
        .orderBy(F.desc("rrf_score"), F.col(id_col))
        .limit(k)
    )


def _viterbi_segment_udf(logp: dict, max_piece_len: int):
    """Arrow UDF: best unigram-LM segmentation per DISTINCT word (Viterbi
    over character positions; the piece table ships in the closure, the
    IVF-centroid pattern). Ties prefer the shorter final piece (strict
    `>` with piece length ascending) — mirrored by the sequential reference
    implementation in tests."""

    @pandas_udf("array<string>")
    def seg(words: pd.Series) -> pd.Series:
        out = []
        for w in words:
            n = len(w)
            best_score = [-1e18] * (n + 1)
            best_len = [0] * (n + 1)
            best_score[0] = 0.0
            for i in range(1, n + 1):
                for piece_len in range(1, min(max_piece_len, i) + 1):
                    lp = logp.get(w[i - piece_len : i])
                    if lp is None:
                        continue
                    s = best_score[i - piece_len] + lp
                    if s > best_score[i]:
                        best_score[i], best_len[i] = s, piece_len
            pieces, i = [], n
            while i > 0:
                piece_len = best_len[i]
                if piece_len == 0:  # char outside the trained alphabet
                    pieces = None
                    break
                pieces.append(w[i - piece_len : i])
                i -= piece_len
            out.append(pieces[::-1] if pieces is not None else None)
        return pd.Series(out)

    return seg


def train_unigram(
    df: DataFrame,
    vocab_size: int = 120,
    max_piece_len: int = 4,
    seed_factor: int = 8,
    prune_frac: float = 0.25,
    text_col: str = "text",
    max_rounds: int = 20,
) -> DataFrame:
    """Unigram-LM tokenizer training (Kudo, arXiv:1804.10959 — the
    SentencePiece algorithm; hard-EM/Viterbi variant): seed a large piece
    vocabulary from frequent substrings, alternate (re-estimate piece
    probabilities from Viterbi segmentations) with (prune the
    lowest-probability multi-char pieces) until `vocab_size` remains.
    Returns (piece, logprob). Single-character pieces are never pruned, so
    every word stays segmentable (character coverage).

    Scale shape — the BPE distribution generalized: the CORPUS is touched
    exactly once (word-count aggregate; exchange carries one row per
    distinct word). Seeding explodes substrings of the VOCABULARY frame
    (≤ len·max_piece_len rows per distinct word) into a map-side-combined
    weighted count. Each EM round runs the Viterbi UDF over the DISTINCT-
    WORD frame with the piece table broadcast in the closure, then one
    piece-count aggregate; driver traffic per round is the piece table
    itself (≤ seed_factor·vocab_size rows, bounded like the IVF quantizer
    sample) — never corpus- or vocabulary-frame-sized. This call is EAGER.

    No SQL oracle exists for the catalog query (Viterbi DP is not
    reasonably SQL-expressible) — the driver records a rows-only check;
    correctness is pinned by sequential-reference parity in
    tests/test_unigram.py instead (the BPE parity-test pattern).
    """
    import math

    spark = df.sparkSession
    words = (
        df.select(
            F.explode(
                F.split(F.lower(F.col(text_col)), r"[ \t\n\f\r\x0b]+")
            ).alias("w")
        )
        .filter(F.col("w").rlike("^[a-z]+$"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint()
    )

    # ---- seed: frequent substrings (all chars kept unconditionally)
    subs = (
        words.select(
            "cnt",
            F.explode(F.sequence(F.lit(1), F.length("w"))).alias("pos"),
            F.col("w"),
        )
        .select(
            "cnt",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.least(
                        F.lit(max_piece_len),
                        F.length("w") - F.col("pos") + 1,
                    ),
                )
            ).alias("plen"),
            "pos",
            "w",
        )
        .select(
            F.expr("substring(w, pos, plen)").alias("piece"),
            F.col("cnt"),
        )
        .groupBy("piece")
        .agg(F.sum("cnt").alias("freq"))
    )
    chars = {
        r.piece: r.freq
        for r in subs.filter(F.length("piece") == 1).collect()
    }
    multi_top = (
        subs.filter(F.length("piece") > 1)
        .orderBy(F.desc("freq"), F.col("piece"))
        .limit(max(0, seed_factor * vocab_size - len(chars)))
        .collect()
    )
    counts = dict(chars)
    counts.update({r.piece: r.freq for r in multi_top})

    def to_logp(c: dict) -> dict:
        total = sum(c.values())
        return {p: math.log(v / total) for p, v in c.items()}

    for _ in range(max_rounds):
        logp = to_logp(counts)
        seg = _viterbi_segment_udf(logp, max_piece_len)
        est = (
            words.select("cnt", F.explode(seg(F.col("w"))).alias("piece"))
            .groupBy("piece")
            .agg(F.sum("cnt").alias("freq"))
            .collect()
        )
        est_counts = {r.piece: r.freq for r in est}
        # character coverage: chars survive with add-one floor even when the
        # current segmentation never picks them
        counts = {
            p: est_counts.get(p, 0) + (1 if len(p) == 1 else 0)
            for p in counts
            if len(p) == 1 or est_counts.get(p, 0) > 0
        }
        n_over = len(counts) - vocab_size
        if n_over <= 0:
            break
        multi = sorted(
            ((p, c) for p, c in counts.items() if len(p) > 1),
            key=lambda pc: (pc[1], pc[0]),
        )
        # gradual pruning (≤ prune_frac of multi-char pieces per round) so
        # surviving pieces get re-estimated between drops, the SentencePiece
        # schedule; never drop more than needed to reach vocab_size
        n_drop = min(n_over, max(1, int(len(multi) * prune_frac)), len(multi))
        for p, _c in multi[:n_drop]:
            del counts[p]
        if len(counts) <= vocab_size:
            break
    logp = to_logp(counts)
    return spark.createDataFrame(
        sorted(logp.items()), "piece string, logprob double"
    ).select("piece", F.round("logprob", 6).alias("logprob"))


def unigram_token_counts(
    df: DataFrame,
    pieces: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_len: int = 4,
) -> DataFrame:
    """Per-document token counts under a trained unigram-LM vocabulary —
    the budgeting number packing/chunking consumes (mirror of
    `bpe_encode`). Viterbi runs once per DISTINCT word (piece table
    collected — vocabulary-bounded — and shipped in the UDF closure), then
    a by-word rejoin puts counts back on the corpus; words outside the
    trained alphabet (out-of-coverage) count 1 token each, the unk
    convention."""
    logp = {r.piece: r.logprob for r in pieces.collect()}
    seg = _viterbi_segment_udf(logp, max_piece_len)
    toks = _ws_tokens(df, text_col, F.col(id_col))
    wordfreq = (
        toks.groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    distinct_words = wordfreq.select("token").distinct()
    n_pieces = distinct_words.select(
        "token",
        F.coalesce(F.size(seg(F.col("token"))), F.lit(1)).alias("_np"),
    )
    per_word = wordfreq.join(n_pieces, "token")
    return (
        per_word.groupBy(id_col)
        .agg(
            F.sum(F.col("n") * F.greatest(F.col("_np"), F.lit(1)))
            .cast("long")
            .alias("n_tokens")
        )
    )


def span_corruption(
    df: DataFrame,
    block: int = 8,
    span_len: int = 3,
    rate_pct: int = 30,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """T5/UL2 span-corruption example construction (Raffel 1910.10683
    §3.1.4): mask contiguous token spans with sentinel tokens, emit
    (inputs, targets) pairs — inputs carry ``<extra_id_k>`` where span k
    was removed, targets carry each sentinel followed by the removed
    tokens, closed by a terminator sentinel.

    Span placement is DETERMINISTIC block arithmetic (seeded-RNG analog,
    O27 discipline): tokens partition into fixed blocks of `block`; block
    b of doc d corrupts iff md5(d‖b) % 100 < rate_pct, with the span's
    in-block start at (h//100) % (block−span_len+1). Spans are confined
    to their block, so non-overlap holds BY CONSTRUCTION — no sequential
    greedy scan, every token's fate is a pure per-row expression, and the
    whole derivation replays in SQL (the driver oracle runs it).

    Scale shape: one codegen'd posexplode + per-row hash arithmetic; ONE
    doc_id exchange serves both the sentinel-numbering window (running
    count of span starts) and the order-restoring rebuild aggregate —
    the SFT-render pattern. Docs with no corrupted span yield
    inputs = the document and targets = the bare terminator.
    """
    from .graph import _md5_prefix_long

    toks = F.filter(
        F.split(F.lower(F.col(text_col)), _WS), lambda x: x != ""
    )
    t = (
        df.select(F.col(id_col), toks.alias("_t"))
        .filter(F.size("_t") >= 1)
        .select(F.col(id_col), F.posexplode("_t").alias("pos", "token"))
    )
    blk = (F.col("pos") / block).cast("long")
    off = F.col("pos") % block
    h = _md5_prefix_long(
        F.concat(F.col(id_col).cast("string"), F.lit(":"), blk.cast("string"))
    )
    corrupt = (h % 100) < rate_pct
    s = F.floor(h / 100) % (block - span_len + 1)
    in_span = corrupt & (off >= s) & (off < s + span_len)
    is_start = corrupt & (off == s)
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    k = F.sum(is_start.cast("int")).over(w)  # span ordinal (1-based at start)
    sent = F.concat(F.lit("<extra_id_"), (k - 1).cast("string"), F.lit(">"))
    inp_piece = (
        F.when(is_start, sent)
        .when(in_span, F.lit(None))
        .otherwise(F.col("token"))
    )
    tgt_piece = (
        F.when(is_start, F.concat(sent, F.lit(" "), F.col("token")))
        .when(in_span, F.col("token"))
        .otherwise(F.lit(None))
    )
    rows = t.select(
        F.col(id_col), F.col("pos"), k.alias("_k"),
        inp_piece.alias("_inp"), tgt_piece.alias("_tgt"),
    )

    def _rebuild(col: str) -> Column:
        return F.array_join(
            F.transform(
                F.filter(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col(col)))
                    ),
                    lambda r: r[col].isNotNull(),
                ),
                lambda r: r[col],
            ),
            " ",
        )

    agg = rows.groupBy(id_col).agg(
        F.max("_k").cast("int").alias("n_spans"),
        _rebuild("_inp").alias("_inputs"),
        _rebuild("_tgt").alias("_targets"),
    )
    term = F.concat(
        F.lit("<extra_id_"), F.col("n_spans").cast("string"), F.lit(">")
    )
    return agg.select(
        id_col,
        "n_spans",
        F.col("_inputs").alias("inputs"),
        F.when(F.col("_targets") == "", term)
        .otherwise(F.concat(F.col("_targets"), F.lit(" "), term))
        .alias("targets"),
    )


def blocklist_filter(
    df: DataFrame,
    terms: DataFrame | list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Page-level blocklist gate — the C4 step (Raffel 1910.10683 §2.2)
    that drops any page containing a term from a banned-word list; also
    the shape of PII-keyword and policy-term screens.

    Token-match semantics (whole lowercased whitespace tokens, not
    substrings — "classic" must not trip on "ass"). Two plans, same
    result:

      * `terms` as a LIST → `arrays_overlap(tokens, lit(...))`: a pure
        codegen'd projection, ZERO shuffle at any corpus size — right for
        the real-world few-hundred-entry lists.
      * `terms` as a DATAFRAME (column `term`) → token explode +
        LEFT SEMI broadcast join to flag, then the verdict rejoins the
        corpus by id: right when the list is itself a table (e.g. mined
        phrases), still corpus-shuffle-free on the flag side because the
        semi join broadcasts the terms.

    Output: the input columns + `blocked` boolean (kept docs =
    `~blocked`; the flag is returned rather than filtered so curation can
    AUDIT what a list removes before committing to it).
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), _WS), lambda x: x != ""
    )
    if isinstance(terms, list):
        hit = F.arrays_overlap(
            toks, F.lit([t.lower() for t in sorted(set(terms))])
        )
        return df.withColumn("blocked", F.coalesce(hit, F.lit(False)))
    flagged = (
        _ws_tokens(df, text_col, F.col(id_col))
        .join(
            F.broadcast(terms.select(F.lower(F.col("term")).alias("token"))),
            "token",
            "left_semi",
        )
        .select(id_col)
        .distinct()
        .withColumn("blocked", F.lit(True))
    )
    return df.join(flagged, id_col, "left").withColumn(
        "blocked", F.coalesce(F.col("blocked"), F.lit(False))
    )


def c4_clean(
    df: DataFrame,
    min_words_per_line: int = 5,
    min_kept_lines: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4 cleaning rules (Raffel et al., arXiv:1910.10683 §2.2), the classic
    web-corpus line/page filter. Line level: keep only lines that end in a
    terminal punctuation mark, contain ≥ `min_words_per_line` words, and do
    not mention "javascript". Page level: flag pages that keep fewer than
    `min_kept_lines` lines, contain "{" (code), or "lorem ipsum"
    (placeholder text). Returns every input row with
    (clean_text, kept_lines, dropped_lines, page_kept) so callers either
    filter on the flag or audit what would drop.

    Scale shape: ZERO shuffles at any corpus size — one narrow JVM map:
    split → HOF `filter` with collection expressions (regexp + word count +
    substring test per LINE, not per token row) → array_join. Nothing
    explodes, nothing aggregates. The HOF lambda is an interpreted
    expression (a plain Project over the scan, outside codegen), which is
    fine here because its cost is per LINE — bounded by lines/doc — not
    per token, where interpreted HOFs hurt (the char_entropy lesson). Word
    counting uses the explicit ASCII whitespace class so the DuckDB
    oracle's RE2 semantics match Java's exactly.
    """
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(
        lines,
        lambda l: l.rlike('[.!?"] *$')
        & (F.size(F.split(F.trim(l), r"[ \t\f\r\x0b]+")) >= min_words_per_line)
        & ~F.lower(l).contains("javascript"),
    )
    low = F.lower(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.array_join(kept, "\n").alias("clean_text"),
        F.size(kept).cast("int").alias("kept_lines"),
        (F.size(lines) - F.size(kept)).cast("int").alias("dropped_lines"),
        (
            (F.size(kept) >= min_kept_lines)
            & ~F.col(text_col).contains("{")
            & ~low.contains("lorem ipsum")
        ).alias("page_kept"),
    )


def inverted_postings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Inverted-index postings as ROWS: (token, id, tf). The scalable
    posting layout — per-token ARRAYS (collect_list) are the classic skew
    trap: a stopword's posting list is corpus-sized and lands on one
    executor; as rows, postings hash-partition across tasks, the build is
    one map-side-combined aggregate, and `sinks.write_bucketed_table`
    materializes them token-bucketed so term lookups bucket-prune and
    repeated term-joins co-locate with no exchange (the Lucene
    segment-postings idea expressed as a bucketed table).
    """
    return (
        _ws_tokens(df, text_col, F.col(id_col))
        .groupBy("token", id_col)
        .agg(F.count(F.lit(1)).cast("int").alias("tf"))
    )


def search_all_terms(
    postings: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
) -> DataFrame:
    """Conjunctive (AND) boolean retrieval over a postings frame: documents
    containing EVERY query term, with their summed term frequency.

    Scale shape: the term filter prunes the postings scan FIRST (on a
    bucketed index table it also bucket-prunes, touching |terms| buckets),
    so the single doc-keyed aggregate sees rows ∝ the query terms' postings
    only — never the full index. HAVING count(distinct token) = n is the
    standard AND via intersection-free aggregation (no k-way self-join).
    """
    terms = sorted({t.lower() for t in terms if t})
    if not terms:
        raise ValueError("search_all_terms: empty term list")
    p = postings.filter(F.col("token").isin(terms))
    return (
        p.groupBy(id_col)
        .agg(
            F.count_distinct("token").alias("_nt"),
            F.sum("tf").cast("int").alias("total_tf"),
        )
        .filter(F.col("_nt") == len(terms))
        .select(id_col, "total_tf")
    )


def hard_negatives(
    df: DataFrame,
    every: int = 61,
    qlen: int = 5,
    k_neg: int = 4,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Hard-negative mining for retrieval/embedding training (the DPR
    recipe, Karpukhin 2004.04906 §3.2: BM25 top hits that are NOT the
    positive): each selected doc's leading `qlen` tokens act as the query,
    the doc itself is the positive, and the top `k_neg` BM25-scored OTHER
    docs are its hard negatives — the triples an in-batch-negatives
    trainer consumes.

    BATCH BM25 (many queries in one plan, unlike the single-query
    `bm25_topk` literal-column form): postings (token, doc, tf) built
    once; the query-term frame is query-set-sized and broadcast; scoring
    is one join postings⋈terms + a (qid, doc) aggregate; the per-query
    k-cut is a rank window over CANDIDATE rows only (docs sharing ≥1
    query term). Query selection is deterministic (doc_id % every == 0).
    Ranking uses the 4-decimal-rounded score with doc_id tie-break, so
    the cut is engine-replayable.
    """
    postings = inverted_postings(df, text_col, id_col)
    dl = postings.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), _WS), lambda x: x != ""
    )
    q_terms = (
        df.filter(F.col(id_col) % every == 0)
        .select(
            F.col(id_col).alias("qid"),
            F.explode(
                F.array_distinct(F.slice(toks, 1, qlen))
            ).alias("token"),
        )
    )
    dft = (
        postings.join(
            F.broadcast(q_terms.select("token").distinct()), "token"
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df_t"))
    )
    scored = (
        postings.join(F.broadcast(q_terms), "token")
        .join(dl, id_col)
        .join(F.broadcast(dft), "token")
        .crossJoin(F.broadcast(stats))
        .filter(F.col("qid") != F.col(id_col))
        .select(
            "qid",
            F.col(id_col),
            (
                F.log(
                    1
                    + (F.col("n_docs") - F.col("df_t") + 0.5)
                    / (F.col("df_t") + 0.5)
                )
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("_s"),
        )
        .groupBy("qid", id_col)
        .agg(F.round(F.sum("_s"), 4).alias("score"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(
        F.desc("score"), F.col(id_col)
    )
    return (
        scored.withColumn("neg_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("neg_rank") <= k_neg)
        .select(
            F.col("qid").alias("query_id"),
            F.col("qid").alias("pos_id"),
            "neg_rank",
            F.col(id_col).alias("neg_id"),
            "score",
        )
    )


def positional_postings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Positional postings as ROWS: (token, id, pos) — one row per token
    OCCURRENCE (0-based document position). Same skew-safe layout argument
    as `inverted_postings` taken one level down: per-occurrence rows
    hash-partition across tasks, a stopword's occurrences never gather
    anywhere, and the frame is a pure codegen posexplode (no aggregate at
    all — phrase search consumes occurrences directly). Materialize
    token-bucketed via `sinks.write_bucketed_table` for pruned lookups,
    exactly like the tf postings."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), _WS), lambda x: x != ""
    )
    return df.select(F.col(id_col), toks.alias("_t")).select(
        F.col(id_col), F.posexplode("_t").alias("pos", "token")
    ).filter(F.col("token") != "")


def search_phrase(
    postings_pos: DataFrame,
    phrase: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-phrase retrieval over positional postings (the Lucene
    PhraseQuery shape): documents where the terms occur at CONSECUTIVE
    positions, with the match count.

    k−1 equi-joins on (doc, position+offset), one per phrase term past the
    first — each side is the pruned posting set of ONE term (bucket-pruned
    on a materialized index), so join inputs are term-frequency-sized,
    never index-sized; k is query-sized. Duplicate-token phrases
    ("table table") work because positions, not tokens, anchor the join.
    Serve repeated queries from a persisted or `write_bucketed_table`-
    materialized postings frame — otherwise each term filter re-derives
    the posting explode from the raw corpus.
    """
    terms = [t for t in phrase.lower().split() if t]
    if not terms:
        raise ValueError("search_phrase: empty phrase")
    out = postings_pos.filter(F.col("token") == terms[0]).select(
        F.col(id_col), F.col("pos").alias("_p")
    )
    for k, t in enumerate(terms[1:], start=1):
        nxt = postings_pos.filter(F.col("token") == t).select(
            F.col(id_col), (F.col("pos") - k).alias("_p")
        )
        out = out.join(nxt, [id_col, "_p"])
    return out.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_matches")
    )


def readability(df: DataFrame, text_col: str = "text", rd: int = 4) -> DataFrame:
    """Flesch reading-ease + Flesch-Kincaid grade per document — a standard
    text-quality prior for corpus curation (alongside the Gopher and C4
    gates above): grade-level bands are a cheap proxy for "is this prose or
    junk" and a common mixture-weighting feature.

    Counting is the classic regex approximation, chosen because it runs
    IDENTICALLY in Spark and DuckDB regexp engines (plain ASCII classes, no
    engine-specific syntax):
      words     = maximal [a-z]+ runs of lower(text)
      syllables = maximal vowel-group [aeiouy]+ runs (≥1 per real word)
      sentences = maximal [.!?]+ runs, floored at 1

    Zero shuffle, pure codegen — one Arrow-free projection at any corpus
    size. Scores are round(rd) so hashed comparisons are stable.
    """
    lower = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    words = F.size(F.regexp_extract_all(lower, F.lit("[a-z]+"), 0))
    syllables = F.size(F.regexp_extract_all(lower, F.lit("[aeiouy]+"), 0))
    sentences = F.greatest(
        F.size(F.regexp_extract_all(lower, F.lit("[.!?]+"), 0)), F.lit(1)
    )
    w = F.greatest(words, F.lit(1)).cast("double")
    s = sentences.cast("double")
    y = syllables.cast("double")
    ease = F.lit(206.835) - F.lit(1.015) * (w / s) - F.lit(84.6) * (y / w)
    grade = F.lit(0.39) * (w / s) + F.lit(11.8) * (y / w) - F.lit(15.59)
    return df.select(
        "*",
        words.cast("int").alias("n_words"),
        sentences.cast("int").alias("n_sentences"),
        syllables.cast("int").alias("n_syllables"),
        F.round(ease, rd).alias("fk_ease"),
        F.round(grade, rd).alias("fk_grade"),
    )


def _md5_tag_long(id_col: Column, tag: str) -> Column:
    """First 8 hex chars of md5(id ‖ ':' ‖ tag) as a non-negative BIGINT
    (≤ 2^32-1, exact through conv). The per-purpose tag keeps the gate,
    cut-point, and sampling hashes independent of each other."""
    h = F.md5(F.concat(id_col.cast("string"), F.lit(":" + tag)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def fim_transform(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rate_pct: int = 50,
    salt: str = "fim",
) -> DataFrame:
    """Fill-in-the-middle restructuring for code/text pretraining (Bavarian
    et al., arXiv:2207.14255): split each selected document at two random
    points into (prefix, middle, suffix) and emit the PSM form
    ``<PRE>prefix<SUF>suffix<MID>middle`` so the model learns infilling;
    the rest of the corpus passes through untouched (the paper's fim_rate).

    Everything is deterministic (md5-derived gate and cut points — same
    output at any cluster size/partitioning) and pure codegen: length,
    substring, concat. Zero shuffle, zero Python — at 100 TB this is a
    free map over the scan, and the transform composes with the pack/
    shuffle stages downstream.

    Output: id, mode ('psm' | 'plain'), fim_text.
    Reference analog: transform stage of the pipeline (hatchery
    pipeline/pipeline.go:41) — a per-record restructuring operator.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    ln = F.length(t)
    gate = (F.pmod(_md5_tag_long(F.col(id_col), salt + "-gate"), F.lit(100)) < rate_pct) & (
        ln >= 2
    )
    c1 = F.pmod(_md5_tag_long(F.col(id_col), salt + "-a"), ln + 1)
    c2 = F.pmod(_md5_tag_long(F.col(id_col), salt + "-b"), ln + 1)
    lo, hi = F.least(c1, c2), F.greatest(c1, c2)
    psm = F.concat(
        F.lit("<PRE>"),
        F.substring(t, F.lit(1), lo),
        F.lit("<SUF>"),
        F.substring(t, hi + 1, ln - hi),
        F.lit("<MID>"),
        F.substring(t, lo + 1, hi - lo),
    )
    return df.select(
        F.col(id_col),
        F.when(gate, F.lit("psm")).otherwise(F.lit("plain")).alias("mode"),
        F.when(gate, psm).otherwise(t).alias("fim_text"),
    )


def ccnet_bucket_mix(
    docs: DataFrame,
    ref_filter: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    rates: tuple = (("head", 1.0), ("middle", 0.5), ("tail", 0.1)),
    salt: str = "ccnet",
) -> DataFrame:
    """CCNet perplexity bucketing + per-bucket mixing (Wenzek et al.,
    arXiv:1911.00359 §4.3): score every document in bits-per-char under a
    char-bigram LM trained on the trusted ``ref_filter`` slice, split each
    language into perplexity TERTILES (head = most reference-like), then
    keep a deterministic md5 sample at a per-bucket rate — the standard
    head/middle/tail mixture used to build high-quality web corpora.

    Scale shape: model frames are vocabulary-bounded broadcasts (see
    char_lm_train); the scoring pass shuffles once on the doc id for the
    per-doc aggregate; the tertile split is ONE window over (lang) ordered
    by the already-rounded score + id — a per-language sort, no global
    order. The md5 keep-gate is pure codegen. Bucket boundaries are
    rank-based (ntile), so skewed perplexity distributions still split
    into thirds — the quantile-cell lesson from Z-ordering applied here.
    """
    counts, totals, v = char_lm_train(docs.filter(ref_filter), text_col, id_col)
    scored = char_lm_perplexity(docs, counts, totals, v, text_col, id_col).join(
        docs.select(id_col, lang_col), id_col
    )
    w = Window.partitionBy(lang_col).orderBy("bits_per_char", id_col)
    n = len(rates)
    tiled = scored.select(
        id_col,
        lang_col,
        "bits_per_char",
        F.ntile(n).over(w).alias("tile"),
    )
    bucket = F.element_at(
        F.array(*[F.lit(name) for name, _ in rates]), F.col("tile")
    )
    u = _md5_tag_long(F.col(id_col), salt) / F.lit(float(2**32))
    rate = F.element_at(F.array(*[F.lit(r) for _, r in rates]), F.col("tile"))
    return tiled.select(
        id_col,
        lang_col,
        "bits_per_char",
        bucket.alias("bucket"),
        (u < rate).alias("kept"),
    )


# --------------------------------------------------------------------------
# WordPiece encoding (Wu et al. 2016, arXiv:1609.08144 §4.1 — the BERT
# tokenizer family): greedy longest-match-first segmentation against a
# fixed vocabulary, continuation pieces prefixed "##", whole word → [UNK]
# when any position has no match.
# --------------------------------------------------------------------------

# Deterministic demonstration vocabulary: all 26 single letters in both
# positions (so lowercase-alpha words can never hit [UNK] — the UNK path is
# pytest-covered instead) plus common English prefixes/suffixes.
WORDPIECE_VOCAB: tuple = tuple(dict.fromkeys(
    [chr(c) for c in range(ord("a"), ord("z") + 1)]
    + ["##" + chr(c) for c in range(ord("a"), ord("z") + 1)]
    + ["the", "th", "he", "in", "re", "an", "and", "er", "on", "at", "en",
       "to", "of", "is", "it", "as", "be", "we", "ha", "se", "st", "pr",
       "de", "un", "con", "com", "ex", "dis", "over", "inter"]
    + ["##s", "##ed", "##ing", "##er", "##est", "##ly", "##al", "##es",
       "##ion", "##tion", "##ent", "##ment", "##ness", "##able", "##ive",
       "##ous", "##ate", "##ity"]
))  # dict.fromkeys: unique, order kept — the oracle VALUES table must not
#     carry duplicate rows (a dup piece would double-emit its token rows)


def _wordpiece_word(word: str, vocab: set, max_raw: int) -> list:
    """Greedy longest-match-first segmentation of one word."""
    toks, pos, n = [], 0, len(word)
    while pos < n:
        end = min(n, pos + max_raw)
        hit = None
        while end > pos:
            piece = word[pos:end] if pos == 0 else "##" + word[pos:end]
            if piece in vocab:
                hit = piece
                break
            end -= 1
        if hit is None:
            return ["[UNK]"]
        toks.append(hit)
        pos = end
    return toks


def wordpiece_encode(
    df: DataFrame,
    vocab=WORDPIECE_VOCAB,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy WordPiece over the corpus: per doc ``(n_words, n_tokens,
    tok_md5)`` where tok_md5 hashes the FULL space-joined token stream in
    word order — the md5 pins every piece boundary of every word, not just
    counts.

    Scale shape (the `bpe_encode_arrow` pattern): the corpus is exploded
    once with positions; the greedy matcher — a dict-closure Arrow
    `pandas_udf`, vocabulary size never enters the plan — runs once per
    DISTINCT word; one rejoin + one per-doc agg are the only corpus-sized
    shuffles. The ordered stream rebuild is an in-group array_sort, never
    a window over the corpus.
    """
    vset = set(vocab)
    max_raw = max(len(v[2:]) if v.startswith("##") else len(v) for v in vset)

    @pandas_udf("string")
    def toks(words: pd.Series) -> pd.Series:
        return pd.Series(
            [" ".join(_wordpiece_word(w, vset, max_raw)) for w in words]
        )

    words = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.lower(F.col(text_col)), r"[ \t\n\f\r\x0b]+")
        ).alias("pos", "w"),
    ).filter(F.col("w").rlike("^[a-z]+$"))
    wt = words.select("w").distinct().select("w", toks("w").alias("toks"))
    return (
        words.join(wt, "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_words"),
            F.sum(F.size(F.split(F.col("toks"), " "))).cast("int").alias("n_tokens"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct(F.col("pos"), F.col("toks")))
                        ),
                        lambda s: s["toks"],
                    ),
                    " ",
                )
            ).alias("tok_md5"),
        )
    )
