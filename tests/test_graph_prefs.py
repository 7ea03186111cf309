"""Tests for round-5 session-3 operators: PageRank, Bradley-Terry, DPO pairs,
SCD2, readability, PCA projection."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hatchery_spark.functions.graph import derive_event_edges, pagerank
from hatchery_spark.functions.preferences import (
    bradley_terry,
    derive_event_comparisons,
    dpo_pairs,
)
from hatchery_spark.functions.similarity import pca_power_project
from hatchery_spark.operators.scd import scd2_build

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- pagerank


def _toy_edges(spark):
    # 1→2, 1→3, 2→3, 4 dangling (appears only as dst via 3→4)
    rows = [(1, 2), (1, 3), (2, 3), (3, 4)]
    return spark.createDataFrame(rows, "src long, dst long")


def test_pagerank_matches_hand_computation(spark):
    got = {
        r["node"]: r["pagerank"]
        for r in pagerank(_toy_edges(spark), iters=2).collect()
    }
    # replicate the exact integer recurrence in python
    S, N, p = 10**12, 4, 85
    deg = {1: 2, 2: 1, 3: 1}
    r = {n: S // N for n in (1, 2, 3, 4)}
    for _ in range(2):
        share = {u: r[u] // deg[u] for u in deg}
        contrib = {
            2: share[1],
            3: share[1] + share[2],
            4: share[3],
        }
        dang = r[4]
        r = {
            n: ((100 - p) * S) // (100 * N)
            + (p * (contrib.get(n, 0) + dang // N)) // 100
            for n in (1, 2, 3, 4)
        }
    assert got == {n: r[n] / S for n in r}


def test_pagerank_mass_and_order(spark):
    out = pagerank(_toy_edges(spark), iters=3).collect()
    total = sum(r["pagerank"] for r in out)
    # floor-div leaks at most a few 1e-12 units per term
    assert 0.999 < total <= 1.0 + 1e-9
    ranks = {r["node"]: r["pagerank"] for r in out}
    # node 3 receives from 1 and 2; node 1 receives nothing but teleport
    assert ranks[3] > ranks[1]


def test_pagerank_partition_invariant(spark):
    """Integer arithmetic ⇒ bit-identical under any partitioning."""
    e = _toy_edges(spark)
    a = sorted(pagerank(e, iters=3).collect())
    b = sorted(pagerank(e.repartition(7), iters=3).collect())
    assert a == b


def test_derive_event_edges_shape(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    e = derive_event_edges(ev)
    row = e.agg(
        F.min("src"), F.max("dst"), F.count(F.lit(1)), F.sum((F.col("src") == F.col("dst")).cast("int"))
    ).collect()[0]
    mx = ev.agg(F.max("user_id")).collect()[0][0]
    assert row[0] >= 0 and row[1] <= mx and row[3] == 0
    assert row[2] > 0


# ------------------------------------------------------------ bradley-terry


def test_bradley_terry_dominance(spark):
    # item 1 beats everyone twice; item 3 never wins
    rows = [(1, 2), (1, 2), (1, 3), (1, 3), (2, 3), (2, 3)]
    cmp_df = spark.createDataFrame(rows, "winner long, loser long")
    scores = {r["item"]: r["bt_score"] for r in bradley_terry(cmp_df, iters=3).collect()}
    assert scores[1] > scores[2] > scores[3]
    assert scores[3] == 0.0  # zero-win fixed point
    assert math.isclose(sum(scores.values()), 3.0, rel_tol=1e-6)  # sum-to-N


def test_bradley_terry_symmetry(spark):
    # perfectly balanced head-to-head → equal strengths
    rows = [(1, 2), (2, 1), (1, 2), (2, 1)]
    cmp_df = spark.createDataFrame(rows, "winner long, loser long")
    scores = {r["item"]: r["bt_score"] for r in bradley_terry(cmp_df, iters=3).collect()}
    assert scores[1] == scores[2]


def test_derive_event_comparisons_no_self(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    c = derive_event_comparisons(ev)
    assert c.where(F.col("winner") == F.col("loser")).count() == 0


# ----------------------------------------------------------------- dpo pairs


def test_dpo_pairs_basic(spark):
    rows = [
        # conv a: prompt + two assistant turns with distinct values
        ("a", 0, "user", "ask-a", 0.0),
        ("a", 1, "assistant", "weak", 1.0),
        ("a", 2, "assistant", "strong", 9.0),
        # conv b: only one assistant turn → dropped
        ("b", 0, "user", "ask-b", 0.0),
        ("b", 1, "assistant", "only", 5.0),
        # conv c: tie values → earliest wins chosen, latest wins rejected
        ("c", 0, "user", "ask-c", 0.0),
        ("c", 1, "assistant", "first", 2.0),
        ("c", 2, "assistant", "second", 2.0),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, value double"
    )
    out = {r["conv_id"]: r for r in dpo_pairs(t).collect()}
    assert set(out) == {"a", "c"}
    assert out["a"]["prompt"] == "ask-a"
    assert out["a"]["chosen"] == "strong" and out["a"]["rejected"] == "weak"
    assert out["c"]["chosen"] == "first" and out["c"]["rejected"] == "second"


# --------------------------------------------------------------------- scd2


def test_scd2_versions(spark):
    rows = [
        (1, "A", 10, 1),
        (1, "A", 20, 2),  # same attr → collapses into version 1
        (1, "B", 30, 3),  # change → version 2
        (1, "A", 40, 4),  # change back → version 3 (A again, NOT merged)
        (2, None, 5, 5),  # NULL attr opens a version
        (2, None, 6, 6),  # NULL == NULL (null-safe) → still version 1
        (2, "X", 7, 7),
    ]
    log = spark.createDataFrame(rows, "k int, a string, ts int, id int")
    out = scd2_build(log, "k", "a", "ts", "id").collect()
    k1 = sorted([r for r in out if r["k"] == 1], key=lambda r: r["version"])
    assert [(r["version"], r["a"], r["valid_from"], r["valid_to"], r["is_current"]) for r in k1] == [
        (1, "A", 10, 30, False),
        (2, "B", 30, 40, False),
        (3, "A", 40, None, True),
    ]
    k2 = sorted([r for r in out if r["k"] == 2], key=lambda r: r["version"])
    assert [(r["version"], r["a"]) for r in k2] == [(1, None), (2, "X")]
    assert k2[0]["valid_to"] == 7 and k2[1]["is_current"]


# -------------------------------------------------------------- readability


def test_readability_hand_values(spark):
    from hatchery_spark.functions.corpus import readability

    df = spark.createDataFrame([(1, "The cat sat. It purred!")], "doc_id int, text string")
    r = readability(df).collect()[0]
    # words: the,cat,sat,it,purred = 5; sentences: '.' and '!' = 2
    # vowel groups: e,a,a,i,u,e = 6
    assert r["n_words"] == 5 and r["n_sentences"] == 2 and r["n_syllables"] == 6
    ease = 206.835 - 1.015 * (5 / 2) - 84.6 * (6 / 5)
    grade = 0.39 * (5 / 2) + 11.8 * (6 / 5) - 15.59
    assert r["fk_ease"] == pytest.approx(ease, abs=1e-4)
    assert r["fk_grade"] == pytest.approx(grade, abs=1e-4)


def test_readability_empty_text(spark):
    from hatchery_spark.functions.corpus import readability

    df = spark.createDataFrame([(1, ""), (2, None)], "doc_id int, text string")
    out = readability(df).collect()
    for r in out:
        assert r["n_words"] == 0 and r["n_sentences"] == 1
        assert r["fk_ease"] is not None  # guarded division


# ---------------------------------------------------------------------- pca


def test_pca_recovers_dominant_axis(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    # variance 25 along axis 0, ~0.01 elsewhere
    n, d = 400, 8
    x = rng.normal(0, 0.1, (n, d))
    x[:, 0] += rng.normal(0, 5.0, n)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>",
    )
    out = pca_power_project(df, iters=8).toPandas().sort_values("vec_id")
    proj = out["pc1"].to_numpy()
    corr = abs(np.corrcoef(proj, x[:, 0])[0, 1])
    assert corr > 0.99


def test_pca_deterministic(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    a = sorted(pca_power_project(emb, iters=4).collect())
    b = sorted(pca_power_project(emb.repartition(5), iters=4).collect())
    assert a == b


# ----------------------------------------------------- fuzzy pairs / ORC


def test_deletion_neighborhood_pairs(spark):
    from hatchery_spark.functions.dedup import deletion_neighborhood_pairs

    toks = spark.createDataFrame(
        [("table",), ("tabel",), ("tble",), ("chair",), ("chairs",),
         ("stone",), ("stoen",)],  # stoen = transposition → distance 2
        "token string",
    )
    out = {(r["t1"], r["t2"]): r["dist"]
           for r in deletion_neighborhood_pairs(toks).collect()}
    assert ("table", "tble") in out      # deletion
    assert ("chair", "chairs") in out    # insertion
    assert out[("chair", "chairs")] == 1
    # transposition pairs share a deletion variant but sit at distance 2 —
    # the exact verify must reject them
    assert ("stoen", "stone") not in out
    # substitution pairs share the deletion at the substituted position
    toks2 = spark.createDataFrame([("cat",), ("bat",)], "token string")
    out2 = deletion_neighborhood_pairs(toks2).collect()
    assert len(out2) == 1 and out2[0]["dist"] == 1


def test_orc_roundtrip_matches_parquet(spark):
    from hatchery_spark.plans.driver_queries import q_orc_roundtrip, load
    import pyspark.sql.functions as F

    got = {
        (r["l_returnflag"], r["l_linestatus"]): (r["n"], r["sum_qty"])
        for r in q_orc_roundtrip(spark, SF).collect()
    }
    li = load(spark, SF, "lineitem")
    exp = {
        (r["l_returnflag"], r["l_linestatus"]): (r["n"], r["sum_qty"])
        for r in li.groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 4).alias("sum_qty"))
        .collect()
    }
    assert got == exp


# ---------------------------------------------------------------- hits


def test_hits_star_graph(spark):
    """Star: 0→{1,2,3}. Node 0 is the only hub; 1-3 are equal authorities."""
    from hatchery_spark.functions.graph import hits

    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "src long, dst long"
    )
    r = {x.node: (x.hub, x.authority) for x in hits(edges, iters=3).collect()}
    assert r[0][0] > 0 and r[0][1] == 0.0
    assert r[1] == r[2] == r[3]
    assert r[1][0] == 0.0 and r[1][1] > 0


def test_hits_matches_float_reference(spark):
    """Sum-normalized fixed-point scores track a plain float L1-HITS to
    ~1e-5: the integer renormalizer's coarse divisor (sum div scale) only
    rescales ALL scores by one common factor — per-node ratios carry floor
    error ≤ 1/score ≈ 1e-7 — so after dividing by the total the two
    iterations agree."""
    import numpy as np

    from hatchery_spark.functions.graph import hits

    rng = np.random.default_rng(11)
    pairs = sorted(
        {(int(a), int(b)) for a, b in rng.integers(0, 30, size=(150, 2)) if a != b}
    )
    edges = spark.createDataFrame(pairs, "src long, dst long")
    got = {r.node: (r.hub, r.authority) for r in hits(edges, iters=3).collect()}

    nodes = sorted({x for p in pairs for x in p})
    ix = {v: i for i, v in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for a, b in pairs:
        A[ix[a], ix[b]] = 1.0
    h = np.full(len(nodes), 1.0 / len(nodes))
    for _ in range(3):
        a = A.T @ h
        a /= a.sum()
        h = A @ a
        h /= h.sum()
    hub_sum = sum(v[0] for v in got.values())
    auth_sum = sum(v[1] for v in got.values())
    for v in nodes:
        assert math.isclose(got[v][0] / hub_sum, h[ix[v]], rel_tol=1e-4, abs_tol=1e-6)
        assert math.isclose(got[v][1] / auth_sum, a[ix[v]], rel_tol=1e-4, abs_tol=1e-6)


def test_hits_partition_invariant(spark):
    from hatchery_spark.functions.graph import derive_event_edges, hits

    ev = spark.read.parquet(f"{SF}/events.parquet")
    e = derive_event_edges(ev)
    r1 = sorted(hits(e.repartition(1), iters=2).collect())
    r32 = sorted(hits(e.repartition(32), iters=2).collect())
    assert r1 == r32


# ---------------------------------------------------------------------------
# triangles
# ---------------------------------------------------------------------------


def test_triangles_k4(spark):
    from hatchery_spark.functions.graph import triangles

    # complete graph on 4 nodes: every node is in C(3,2)=3 triangles, deg 3
    edges = [(a, b) for a in range(4) for b in range(4) if a != b]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r.node: r for r in triangles(df).collect()}
    assert len(out) == 4
    for n in range(4):
        assert (out[n].degree, out[n].n_triangles, out[n].n_wedges) == (3, 3, 3)


def test_triangles_path_has_none(spark):
    from hatchery_spark.functions.graph import triangles

    df = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "src long, dst long")
    out = triangles(df).collect()
    assert all(r.n_triangles == 0 for r in out)
    assert {r.node: r.n_wedges for r in out} == {0: 0, 1: 1, 2: 1, 3: 0}


def test_triangles_parallel_and_reverse_edges_collapse(spark):
    from hatchery_spark.functions.graph import triangles

    # triangle with duplicated / reversed / self-loop edges: still 1 triangle
    edges = [(0, 1), (1, 0), (1, 2), (1, 2), (2, 0), (1, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r.node: r.n_triangles for r in triangles(df).collect()}
    assert out == {0: 1, 1: 1, 2: 1}


def test_triangles_hub_wedges(spark):
    from hatchery_spark.functions.graph import triangles

    # star hub (deg 5) + one closing rim edge -> exactly one triangle;
    # the hub's wedge count is C(5,2)=10
    edges = [(9, i) for i in range(5)] + [(0, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r.node: r for r in triangles(df).collect()}
    assert out[9].n_wedges == 10 and out[9].n_triangles == 1
    assert out[0].n_triangles == 1 and out[1].n_triangles == 1
    assert out[2].n_triangles == 0


# ---------------------------------------------------------------------------
# label propagation
# ---------------------------------------------------------------------------


def test_lpa_two_cliques_converge(spark):
    from hatchery_spark.functions.graph import label_propagation

    # two triangles bridged by one edge: each clique converges to its min id
    edges = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10), (2, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r.node: r.label for r in label_propagation(df, iters=3).collect()}
    assert out[0] == out[1] == out[2] == 0
    assert out[10] == out[11] == out[12]
    assert out[10] != 0


def test_lpa_tie_breaks_to_smallest_label(spark):
    from hatchery_spark.functions.graph import label_propagation

    # node 5 has neighbors 1 and 9, one vote each -> adopts 1 after round 1
    df = spark.createDataFrame([(1, 5), (9, 5)], "src long, dst long")
    out = {r.node: r.label for r in label_propagation(df, iters=1).collect()}
    assert out[5] == 1


def test_lpa_undirected_and_simple(spark):
    from hatchery_spark.functions.graph import label_propagation

    # parallel + reversed edges must not double-weight a neighbor's vote:
    # 5 sees {1 (x3 edges), 2, 3}; simple-graph votes are 1,2,3 -> min = 1
    edges = [(1, 5), (5, 1), (1, 5), (2, 5), (5, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r.node: r.label for r in label_propagation(df, iters=1).collect()}
    assert out[5] == 1


# ---------------------------------------------------------------------------
# connected components (large-star / small-star)
# ---------------------------------------------------------------------------


def _uf_components(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    members: dict = {}
    for n in nodes:
        members.setdefault(find(n), []).append(n)
    out = {}
    for ms in members.values():
        m = min(ms)
        for n in ms:
            out[n] = (m, len(ms))
    return out


def test_connected_components_random_vs_union_find(spark):
    import random

    from hatchery_spark.functions.graph import connected_components

    rng = random.Random(7)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(25)]
    nodes = sorted({x for e in edges for x in e})
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: (r["comp"], r["comp_size"])
        for r in connected_components(df).collect()
    }
    assert got == _uf_components(edges, nodes)


def test_connected_components_chain_needs_multiple_rounds(spark):
    # a 30-node path has diameter 29: one hash-min round cannot finish it,
    # so this pins the alternating star iteration actually iterating
    from hatchery_spark.functions.graph import connected_components

    df = spark.createDataFrame([(i, i + 1) for i in range(29)], "src long, dst long")
    rows = connected_components(df).collect()
    assert len(rows) == 30
    assert {r["comp"] for r in rows} == {0}
    assert all(r["comp_size"] == 30 for r in rows)


def test_connected_components_self_loop_singleton(spark):
    from hatchery_spark.functions.graph import connected_components

    df = spark.createDataFrame([(7, 7), (1, 2)], "src long, dst long")
    got = {r["node"]: (r["comp"], r["comp_size"]) for r in connected_components(df).collect()}
    assert got == {7: (7, 1), 1: (1, 2), 2: (1, 2)}
