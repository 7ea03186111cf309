"""HLL / count-min: mergeability, error bounds, one-sided CMS error."""

from pyspark.sql import functions as F

from hatchery_spark.operators.sketches import (
    cms_query,
    cms_sketch,
    hll_estimate,
    hll_registers,
)


def _keys(spark, lo, hi, grp="g"):
    return spark.range(lo, hi).select(
        F.lit(grp).alias("grp"), F.concat(F.lit("k"), F.col("id")).alias("k")
    )


def test_hll_estimate_within_bound(spark):
    # m=512 → standard error ≈ 1.04/sqrt(512) ≈ 4.6%; allow 3σ
    n = 20_000
    est = hll_estimate(
        hll_registers(_keys(spark, 0, n), "k", ["grp"]), ["grp"]
    ).collect()[0]
    assert abs(est.estimate - n) / n < 0.15, est.estimate


def test_hll_registers_merge_equals_union(spark):
    a = hll_registers(_keys(spark, 0, 5000), "k", ["grp"])
    b = hll_registers(_keys(spark, 3000, 9000), "k", ["grp"])
    merged = (
        a.unionAll(b)
        .groupBy("grp", "reg")
        .agg(F.max("m_rank").alias("m_rank"))
    )
    direct = hll_registers(_keys(spark, 0, 9000), "k", ["grp"])
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_hll_linear_counting_small_cardinality(spark):
    # tiny set → LC branch; LC is near-exact there
    est = hll_estimate(
        hll_registers(_keys(spark, 0, 40), "k", ["grp"]), ["grp"]
    ).collect()[0]
    assert est.v_zero > 0
    assert abs(est.estimate - 40) < 3, est.estimate


def test_cms_overestimates_never_under(spark):
    # zipf-ish: key j appears j times for j in 1..60
    df = spark.range(1, 61).select(
        F.explode(F.array_repeat(F.concat(F.lit("r"), F.col("id")), F.col("id").cast("int"))).alias("key")
    )
    sketch = cms_sketch(df, "key")
    truth = df.groupBy("key").agg(F.count(F.lit(1)).alias("true_n"))
    got = truth.join(cms_query(sketch, truth.select("key"), "key"), "key").collect()
    assert all(r.cms_count >= r.true_n for r in got)
    # sketch is 4x256 over 60 keys: collisions rare, most estimates exact
    exact = sum(1 for r in got if r.cms_count == r.true_n)
    assert exact >= 55, exact


def test_cms_merge_equals_union(spark):
    a, b = _keys(spark, 0, 300).select("k"), _keys(spark, 100, 500).select("k")
    merged = (
        cms_sketch(a, "k")
        .unionAll(cms_sketch(b, "k"))
        .groupBy("r", "col")
        .agg(F.sum("c").alias("c"))
    )
    direct = cms_sketch(a.unionAll(b), "k")
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0
