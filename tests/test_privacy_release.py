"""l-diversity gate and DP geometric mechanism."""

from __future__ import annotations

from pyspark.sql import functions as F

from hatchery_spark.functions.privacy import geometric_noise
from hatchery_spark.functions.text import l_diversify


def test_l_diversity_homogeneity_attack_suppressed(spark):
    # cohort A: large but every row shares one sensitive value → must
    # suppress even though k-anonymity would pass it
    # `tag` is NOT a quasi column, so it survives the suppression rewrite
    rows = [("a", "A", "x", "s1")] * 10 + [
        ("b", "B", "y", f"s{i % 4}") for i in range(10)
    ] + [("c", "C", "z", "s1")] * 2
    df = spark.createDataFrame(
        rows, "tag string, q1 string, q2 string, sens string"
    )
    out = l_diversify(df, ["q1", "q2"], "sens", k=5, l=3).collect()
    by_tag = {}
    for r in out:
        by_tag.setdefault(r["tag"], r)
    a, b, c = by_tag["a"], by_tag["b"], by_tag["c"]
    assert a["suppressed"] and a["group_n"] == 10 and a["sensitive_n"] == 1
    assert not b["suppressed"] and b["sensitive_n"] == 4
    assert c["suppressed"] and c["group_n"] == 2  # size gate
    assert a["q1"] == "[SUPPRESSED]" and b["q1"] == "B"


def test_geometric_noise_matches_reference(spark):
    import hashlib

    def ref(key):
        def g(prefix):
            h = int(hashlib.md5((prefix + key).encode()).hexdigest()[:8], 16)
            b = bin(h)[2:].zfill(32)
            return b.find("0") if "0" in b else 32

        return g("dpa-") - g("dpb-")

    keys = [f"cell-{i}" for i in range(200)]
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    got = {
        r["key"]: r["z"]
        for r in df.select(
            "key", geometric_noise(F.col("key")).alias("z")
        ).collect()
    }
    for k in keys:
        assert got[k] == ref(k), k


def test_geometric_noise_law(spark):
    # over many cells the empirical law approximates P(z) = (1/3)(1/2)^|z|
    df = spark.createDataFrame(
        [(f"k{i}",) for i in range(3000)], "key string"
    )
    zs = [
        r["z"]
        for r in df.select(geometric_noise(F.col("key")).alias("z")).collect()
    ]
    n = len(zs)
    p0 = zs.count(0) / n
    p1 = (zs.count(1) + zs.count(-1)) / n
    assert abs(p0 - 1 / 3) < 0.04
    assert abs(p1 - 1 / 3) < 0.04          # 2 · (1/3)(1/2)
    assert abs(sum(zs) / n) < 0.15         # symmetric
