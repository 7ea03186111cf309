"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, ...extras}

The headline is the end-to-end parse→enrich→route→aggregate pipeline
(BASELINE.json metric: turns/sec); generic operator timings ride along.
Scaling-efficiency evidence (local[8] vs local[32]) is produced by
scripts/scaling_bench.py → BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from hatchery_spark.session import get_spark  # noqa: E402
from hatchery_spark.config import DEFAULT_ROUTES  # noqa: E402
from hatchery_spark.datagen import transcripts_df, service_catalog_df  # noqa: E402
from hatchery_spark.pipeline import prepare, run_pipeline  # noqa: E402
from hatchery_spark.router import sink_counts  # noqa: E402
from hatchery_spark.plans import driver_queries as dq  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# synthetic transcripts rows for the throughput headline (fixed seed)
SYN_ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "5000000"))


def timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("hatchery_bench", cpus=CPUS)
    spark.range(1000).count()  # warm the JVM before timing

    timings: dict[str, float] = {}

    # --- headline: synthetic transcripts pipeline at bench scale ------------
    syn = transcripts_df(spark, SYN_ROWS, seed=42)
    cat = service_catalog_df(spark)
    t_pipe = timed(
        lambda: sink_counts(prepare(syn, cat), DEFAULT_ROUTES).collect()
    )
    timings["pipeline_synthetic_agg"] = t_pipe
    turns_per_sec = round(SYN_ROWS / t_pipe, 1)

    with tempfile.TemporaryDirectory() as tmp:
        timings["pipeline_synthetic_write"] = timed(
            lambda: run_pipeline(
                spark,
                syn,
                DEFAULT_ROUTES,
                tmp,
                run_ts="2025-06-04 00:00:00",
                collect_lineage=False,
            )
        )

    # --- pipeline on the driver's events-derived transcripts ---------------
    timings["pipeline_events_e2e"] = timed(
        lambda: dq.q_sink_counts(spark, SF_DIR).collect()
    )
    timings["parse_native"] = timed(
        lambda: dq.q_parse(spark, SF_DIR).select(F.count("severity")).collect()
    )
    timings["parse_pandas_udf"] = timed(
        lambda: dq.q_parse_pandas(spark, SF_DIR).select(F.count("severity")).collect()
    )

    # --- generic operators ---------------------------------------------------
    for name, fn in [
        ("rel_agg_pricing", dq.q_agg_pricing),
        ("rel_join_segment_revenue", dq.q_join_segment_revenue),
        ("rel_window_first_events", dq.q_window_first_events),
        ("doc_exact_dedup", dq.q_exact_dedup),
        ("doc_minhash_neardup", dq.q_minhash_neardup),
        ("emb_cosine_topk", dq.q_embedding_topk),
    ]:
        timings[name] = timed(lambda fn=fn: fn(spark, SF_DIR).write.format("noop").mode("overwrite").save())

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "e2e_parse_route_pipeline_plus_operators",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": CPUS,
                "synthetic_rows": SYN_ROWS,
                "throughput_turns_per_sec": turns_per_sec,
            }
        )
    )


if __name__ == "__main__":
    main()
