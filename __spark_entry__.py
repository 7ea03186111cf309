"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship parse→enrich→route→aggregate pipeline on sf0.001.
queries()      — one entry per implemented operator (SURVEY.md §2 + training-data ops).
oracle_sql()   — DuckDB-equivalent SQL per query (omitted for seeded-hash /
                 pandas-UDF internals → driver records rows-only checks).

Query definitions live in hatchery_spark/plans/driver_queries.py so they are
importable by tests and bench as well.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hatchery_spark.plans.driver_queries import (
    oracle_catalog,
    q_run_summary,
    query_catalog,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_run_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return query_catalog()


def oracle_sql() -> dict[str, str]:
    return oracle_catalog()
