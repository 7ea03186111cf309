from pyspark.sql import functions as F

from hatchery_spark.functions.dedup import dedup_keep_canonical, resolve_duplicate_groups
from hatchery_spark.functions.similarity import ivf_topk, cosine_topk


def test_connected_components_chain(spark):
    # chain 1-2-3-4 plus isolated pair 10-11 → two components
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    got = {r.doc_id: r.canonical_id for r in resolve_duplicate_groups(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_merge_via_bridge(spark):
    # two stars bridged by one edge → single component labeled by global min
    pairs = spark.createDataFrame(
        [(5, 6), (5, 7), (20, 21), (20, 22), (7, 22)], "id_a long, id_b long"
    )
    got = {r.doc_id: r.canonical_id for r in resolve_duplicate_groups(pairs).collect()}
    assert set(got.values()) == {5}


def test_long_chain_converges_logarithmically(spark):
    """Pointer doubling: a 64-node path converges in far fewer rounds than its
    diameter (plain min-propagation would need ~63)."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "id_a long, id_b long"
    )
    got = {r.doc_id: r.canonical_id for r in
           resolve_duplicate_groups(pairs, max_iterations=8).collect()}
    assert set(got.values()) == {0} and len(got) == 64


def test_nonconvergence_raises(spark):
    import pytest as _pytest

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "id_a long, id_b long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        resolve_duplicate_groups(pairs, max_iterations=1)


def test_keep_canonical_drops_losers(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 5)], "id_a long, id_b long")
    kept = sorted(r.doc_id for r in dedup_keep_canonical(docs, pairs).collect())
    assert kept == [0, 1, 3, 4, 6, 7]  # 2 and 5 collapse into 1


def test_ivf_recall_vs_bruteforce(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((300, 16)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(300)],
        "vec_id long, embedding array<float>",
    ).cache()
    queries = df.filter("vec_id IN (0, 50, 100)").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r.query_id, r.vec_id)
        for r in cosine_topk(df, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.vec_id)
        for r in ivf_topk(df, queries, k=5, n_centroids=16, n_probe=8).collect()
    }
    # probing half the cells must recover a solid majority of true neighbors;
    # self-match must always be found (query's own cell is probed first)
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, recall
    assert all((q, q) in approx for q in (0, 50, 100))
    df.unpersist()


def test_cluster_representatives_best_member_wins(spark):
    """Longest member represents the cluster (smallest id on ties);
    singletons represent themselves."""
    from hatchery_spark.functions.dedup import cluster_representatives

    resolved = spark.createDataFrame(
        [(1, 0), (0, 0), (2, 0), (5, 4), (4, 4)],
        "doc_id long, canonical_id long",
    )
    docs = spark.createDataFrame(
        [(0, 10), (1, 30), (2, 30), (4, 7), (5, 7), (9, 1)],
        "doc_id long, n_chars long",
    )
    out = {r.doc_id: r for r in
           cluster_representatives(resolved, docs, "n_chars").collect()}
    # cluster 0: lengths 10/30/30 → tie between 1 and 2 → smallest id (1)
    assert out[0].rep_id == 1 and out[1].is_rep and not out[2].is_rep
    # cluster 4: tie between 4 and 5 → 4
    assert out[4].is_rep and out[5].rep_id == 4
    # unpaired doc 9: own cluster, own representative
    assert out[9].canonical_id == 9 and out[9].is_rep
