"""Similarity search over embedding columns (array<float>), Spark-first.

Two paths:
  * cosine_topk        — exact brute-force top-k: broadcast the (small) query
                         set against the corpus, cosine via native zip_with +
                         aggregate (JVM-side fold, deterministic left-to-right
                         order → reproducible doubles), window row_number for
                         the top-k cut. O(N·Q) — the correctness baseline.
  * lsh_topk           — scale path: random-hyperplane (sign) LSH. H seeded
                         hyperplanes → an H-bit bucket per vector; candidates =
                         bucket-equality join probed across nearby buckets
                         (multi-probe by flipping low bits); exact cosine +
                         top-k within candidates. Shuffle is keyed on the
                         bucket id, never all-pairs.

Hyperplanes are generated from a numpy PRNG with an explicit seed and shipped
as plan literals (they are tiny: H×dim floats) — deterministic across cluster
sizes, no driver randomness at execution time.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cosine(a, b):
    """Cosine similarity between two array<double> columns (native fold)."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    queries: (query_id, embedding). Broadcast — the corpus never shuffles.
    Output: (query_id, vec_id, cosine) with deterministic ties (vec_id asc).
    Self-matches (same id) are kept; filter upstream if undesired.
    """
    c = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_cv")
    )
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).cast("array<double>").alias("_qv")
    )
    scored = c.join(F.broadcast(q)).withColumn(
        "cosine", F.round(_cosine(F.col("_cv"), F.col("_qv")), 4)
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket(vec, planes: list[list[float]]):
    """H-bit sign bucket id for an array<double> column."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        dot = F.aggregate(
            F.zip_with(vec, plane, lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 42,
    n_probes: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: sign-LSH buckets + multi-probe + exact rerank.

    Each query probes its own bucket plus the buckets at Hamming distance 1 on
    the first `n_probes` bits; candidates join on bucket id (hash shuffle on a
    long key), exact cosine only within candidates.
    """
    planes = _hyperplanes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_cv")
    ).withColumn("bucket", lsh_bucket(F.col("_cv"), planes))
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).cast("array<double>").alias("_qv")
    ).withColumn("bucket0", lsh_bucket(F.col("_qv"), planes))
    # multi-probe: own bucket + flip each of the first n_probes bits
    probe_buckets = F.array(
        F.col("bucket0"),
        *[F.col("bucket0").bitwiseXOR(F.lit(1 << i)) for i in range(n_probes)],
    )
    qp = q.withColumn("bucket", F.explode(probe_buckets)).drop("bucket0")
    scored = c.join(qp, on="bucket").withColumn(
        "cosine", F.round(_cosine(F.col("_cv"), F.col("_qv")), 4)
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-flat ANN: coarse quantize to centroid cells, probe the n_probe
    nearest cells per query, exact cosine within probed cells.

    Centroids are chosen deterministically (the n_centroids lowest-id corpus
    vectors — at production scale swap in a k-means sample; the plumbing is
    identical). Cell assignment is a broadcast argmax over the tiny centroid
    set; the candidate join shuffles on the int cell id only. Corpus cell
    assignments would be precomputed/persisted in a real index build.
    """
    c = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_cv")
    )
    centroids = [
        (int(r[0]), [float(x) for x in r[1]])
        for r in c.orderBy(id_col).limit(n_centroids).collect()
    ]

    def best_cells(vec, n: int):
        """Array of the n nearest centroid ids for a vector column."""
        scored = F.array(
            *[
                F.struct(
                    _cosine(vec, F.array(*[F.lit(x) for x in cv])).alias("cos"),
                    F.lit(cid).alias("cell"),
                )
                for cid, cv in centroids
            ]
        )
        top = F.slice(F.reverse(F.array_sort(scored)), 1, n)
        return F.transform(top, lambda s: s.cell)

    cells_c = c.withColumn("cell", F.element_at(best_cells(F.col("_cv"), 1), 1))
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).cast("array<double>").alias("_qv")
    ).withColumn("cell", F.explode(best_cells(F.col("_qv"), n_probe)))
    scored = cells_c.join(q, on="cell").withColumn(
        "cosine", F.round(_cosine(F.col("_cv"), F.col("_qv")), 4)
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def embedding_near_dup(
    df: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    n_planes: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥ threshold).

    Bucket self-join on sign-LSH (near-identical vectors almost surely share
    all sign bits), exact cosine verify inside buckets.
    """
    planes = _hyperplanes(dim, n_planes, seed)
    v = df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v"))
    b = v.withColumn("bucket", lsh_bucket(F.col("_v"), planes))
    a = b.select(F.col(id_col).alias("id_a"), F.col("_v").alias("v_a"), "bucket")
    bb = b.select(F.col(id_col).alias("id_b"), F.col("_v").alias("v_b"), "bucket")
    return (
        a.join(bb, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(_cosine(F.col("v_a"), F.col("v_b")), 4))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
        .distinct()
    )
