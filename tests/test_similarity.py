import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from hatchery_spark.functions import similarity as sim


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(7)
    base = rng.standard_normal((50, 16)).astype(np.float32)
    base[1] = base[0] * 1.5  # same direction as 0 → cosine 1.0
    base[2] = -base[0]  # opposite
    rows = [(i, [float(x) for x in base[i]]) for i in range(50)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()


def test_cosine_topk_exact(spark, vectors):
    queries = vectors.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = sim.cosine_topk(vectors, queries, k=3).collect()
    assert [r.vec_id for r in out][:2] == [0, 1]  # self then scaled copy
    assert out[0].cosine == 1.0 and out[1].cosine == 1.0
    assert all(out[i].rank == i + 1 for i in range(3))


def test_cosine_matches_numpy(spark, vectors):
    queries = vectors.filter("vec_id = 5").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = {r.vec_id: r.cosine for r in sim.cosine_topk(vectors, queries, k=50).collect()}
    rows = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in vectors.collect()}
    q = rows[5]
    for vid, got in out.items():
        want = float(np.dot(rows[vid], q) / (np.linalg.norm(rows[vid]) * np.linalg.norm(q)))
        assert math.isclose(got, round(want, 4), abs_tol=2e-4), vid


def test_lsh_topk_high_recall_on_self_and_dups(spark, vectors):
    queries = vectors.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = [r.vec_id for r in sim.lsh_topk(vectors, queries, k=3, dim=16).collect()]
    assert 0 in out and 1 in out  # identical-direction vectors share all sign bits


def test_embedding_near_dup(spark, vectors):
    pairs = {(r.id_a, r.id_b): r.cosine for r in
             sim.embedding_near_dup(vectors, threshold=0.95, dim=16).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert all(c >= 0.95 for c in pairs.values())


def test_deterministic_across_runs(spark, vectors):
    queries = vectors.filter("vec_id < 3").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = sorted(map(tuple, sim.cosine_topk(vectors, queries, k=5).collect()))
    b = sorted(map(tuple, sim.cosine_topk(vectors, queries, k=5).collect()))
    assert a == b
