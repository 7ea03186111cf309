"""Distributed Lloyd's k-means: local-reference parity, determinism, empty clusters."""

import hashlib

import numpy as np
from pyspark.sql import functions as F

from hatchery_spark.functions.similarity import kmeans_lloyd


def _local_lloyd(ids, X, k, iters, rd=6):
    """Same algorithm, plain numpy: md5-order init, rounded centroids and
    distances, empty clusters keep the previous centroid."""
    order = sorted(range(len(ids)), key=lambda i: (hashlib.md5(str(ids[i]).encode()).hexdigest(), ids[i]))
    C = np.round(X[order[:k]].astype(np.float64), rd)
    for _ in range(iters):
        d = np.round(((X[:, None, :] - C[None]) ** 2).sum(axis=2), rd)
        a = np.argmin(d, axis=1)
        nxt = C.copy()
        for c in range(k):
            if (a == c).any():
                nxt[c] = np.round(X[a == c].mean(axis=0), rd)
        C = nxt
    d = np.round(((X[:, None, :] - C[None]) ** 2).sum(axis=2), rd)
    return np.argmin(d, axis=1)


def test_matches_local_reference(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = emb.select("vec_id", "embedding").collect()
    ids = [r[0] for r in rows]
    X = np.array([r[1] for r in rows], dtype=np.float64)
    want = dict(zip(ids, _local_lloyd(ids, X, k=3, iters=2)))
    got = {r["vec_id"]: r["cluster"]
           for r in kmeans_lloyd(emb, k=3, iters=2).collect()}
    assert got == want


def test_deterministic_and_partitioning(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = kmeans_lloyd(emb, k=4, iters=2).toPandas().set_index("vec_id")["cluster"]
    b = kmeans_lloyd(emb, k=4, iters=2).toPandas().set_index("vec_id")["cluster"]
    assert (a.sort_index() == b.sort_index()).all()
    assert len(a) == emb.count()               # every vector assigned
    assert set(a.unique()) <= set(range(4))


def test_empty_cluster_keeps_previous_centroid(spark):
    # two identical far-apart blobs, k=3: one centroid can never win a point
    rows = [(i, [0.0, 0.0]) for i in range(5)] + [(i, [100.0, 100.0]) for i in range(5, 10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_lloyd(df, k=3, iters=3).toPandas()
    assert len(out) == 10
    # both blobs end up in internally-consistent clusters
    g0 = set(out[out.vec_id < 5]["cluster"])
    g1 = set(out[out.vec_id >= 5]["cluster"])
    assert len(g0) == 1 and len(g1) == 1 and g0 != g1
