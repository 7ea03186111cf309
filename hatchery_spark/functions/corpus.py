"""Corpus-level text statistics: TF-IDF keywords + character entropy.

Both follow the explode → codegen'd-aggregate shape (see
dedup.minhash_signature_staged for the rationale): one row per (doc, unit),
hash aggregates with map-side partial combine, and rank-limit windows that
Spark rewrites into WindowGroupLimit (per-partition top-k before the
shuffle). No Python, no HOFs on the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


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
    """
    terms = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("term")
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


def char_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Shannon entropy (nats) of the character distribution per doc.

    A cheap perplexity proxy for quality filtering: natural text sits in a
    narrow entropy band; binary junk and repeated-char spam fall outside it.
    explode to (doc, char) → counts → -Σ (c/L)·ln(c/L), all hash aggregates.
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
