"""Slowly-changing-dimension (Type 2) history build.

Warehouse-side counterpart of the reference's enrichment metadata
(metadata/enricher.go): where hatchery enriches each object against the
*current* catalog row, a 100 TB lakehouse needs the catalog's full change
history as validity intervals so late-arriving facts can join the dimension
row that was current AT EVENT TIME (the as-of join in operators/joins.py then
consumes these intervals).

``scd2_build`` compresses an append-only attribute log into version rows:
consecutive equal attribute values collapse, each change opens a new version
with ``valid_from`` = change timestamp and ``valid_to`` = next change (NULL =
current). Pure window functions over ONE shuffle on the dimension key —
no self-join, no per-key iteration, skew-safe at any key cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["scd2_build"]


def scd2_build(
    log: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Build SCD Type 2 validity intervals from an attribute change log.

    Input: one row per observation ``(key, attr, ts, tiebreak)`` (the
    tiebreak column makes ordering total for equal timestamps). Output: one
    row per version ``(key, version, attr, valid_from, valid_to,
    is_current)`` where a version starts whenever ``attr`` differs from the
    previous observation of the same key (NULL-safe comparison).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    # first observation always opens a version (even a NULL attr, which
    # eqNullSafe would otherwise equate with the NULL lag of row 1)
    changed = (F.row_number().over(w) == 1) | ~F.col(attr_col).eqNullSafe(
        F.lag(attr_col).over(w)
    )
    starts = (
        log.withColumn("_chg", changed)
        .where(F.col("_chg"))
        .drop("_chg")
    )
    wv = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    return starts.select(
        F.col(key_col),
        F.row_number().over(wv).cast("int").alias("version"),
        F.col(attr_col),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(wv).alias("valid_to"),
        F.lead(ts_col).over(wv).isNull().alias("is_current"),
    )
