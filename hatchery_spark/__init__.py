"""hatchery_spark — a PySpark-native collect→normalize→route→store analytics engine.

A from-scratch rebuild of the capabilities of secmon-lab/hatchery (reference at
/root/reference, Go) as an idiomatic Spark batch / Structured Streaming job:

    scan(transcripts, window)
      → parse   (vectorized grok/regex → actor, action, resource, severity)
      → enrich  (broadcast hash join against a service catalog)
      → route   (tag/predicate fan-out to per-destination sinks)
      → sink    (partitioned parquet, sorted within partition by (conv_id, turn_idx))
      → metrics (per-sink counts + per-partition lineage, manifest commit → resume)

The reference is byte-stream/dataflow shaped (Source → Pipe → Destination); this
package re-expresses those semantics over DataFrames so Catalyst/Tungsten pick the
physical strategy. No RDDs; no per-row Python UDFs on the hot path.
"""

from hatchery_spark.config import RouteConfig, select_all, select_by_id, select_by_tag
from hatchery_spark.session import get_spark
from hatchery_spark.pipeline import run_pipeline

__all__ = [
    "RouteConfig",
    "select_all",
    "select_by_id",
    "select_by_tag",
    "get_spark",
    "run_pipeline",
]

__version__ = "0.1.0"
