"""Single-pass column profiling (the Deequ / TFDV "analyzer" surface).

Corpus intake at 100 TB starts with a profile: row count, null fractions,
distinct counts, value ranges per column — the reference's operators assume
well-formed inputs, and a profiling pass is how a pipeline operator proves
that before burning a full run (hatchery surfaces the analogous per-source
record counts through its pipeline logging, pkg/logging/context.go).

Plan shape: ONE aggregate job over the table. With exact_ndv=True Spark
plans multiple COUNT(DISTINCT) via an Expand operator — the scan's rows are
replicated once per distinct-aggregate (k× pre-shuffle rows, each pruned to
a single column), which is the standard exact multi-NDV plan and is fine up
to a handful of profiled columns. At 100 TB-scale column counts, pass
exact_ndv=False: approx_count_distinct (HyperLogLog++) profiles every
column in one non-expanded pass with ~2% relative error and a fixed-size
sketch per (column) — the estimator is mergeable across partitions, so the
shuffle carries one sketch per column per task.

The aggregate result is a single row; the per-column unpivot happens on the
driver-side 1-row frame (explode of a literal struct array), costing
nothing at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    exact_ndv: bool = True,
    rsd: float = 0.02,
) -> DataFrame:
    """Profile columns in one pass: (col_name, n_rows, n_nulls, n_distinct,
    min_value, max_value), min/max cast to string AFTER aggregation so
    numeric ordering is preserved and the output schema is column-uniform.
    `rsd` is the HLL relative standard deviation used when exact_ndv=False.
    """
    cols = cols or df.columns
    ndv = (
        F.count_distinct
        if exact_ndv
        else lambda c: F.approx_count_distinct(c, rsd)
    )
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"_nn_{c}"),
            ndv(F.col(c)).alias(f"_ndv_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
        ]
    row = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("_n").alias("n_rows"),
                (F.col("_n") - F.col(f"_nn_{c}")).alias("n_nulls"),
                F.col(f"_ndv_{c}").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_value"),
                F.col(f"_max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return row.select(F.explode(per_col).alias("p")).select("p.*")
