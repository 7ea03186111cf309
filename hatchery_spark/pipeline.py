"""End-to-end batch pipeline: scan → parse → enrich → route → sink → metrics.

The Spark-native rebuild of the reference's Run lifecycle
(/root/reference/hatchery.go:36-77): selectors choose routes, every selected
route consumes the SAME parsed+enriched dataset (persisted once), each route is
one filtered write action, and a manifest commit after each successful write
gives crash-resume at route granularity (ack-after-write semantics,
/root/reference/source/falcon_data_replicator/client.go:217-224).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Sequence

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hatchery_spark.config import RouteConfig, Selector, select_routes
from hatchery_spark.datagen import service_catalog_df
from hatchery_spark.enrich import enrich_turns
from hatchery_spark.lineage import ManifestStore, RouteRunRecord, partition_metrics
from hatchery_spark.parse import parse_turns
from hatchery_spark.router import route_matches, ordered_for_sink, write_route_frame
from hatchery_spark.timerange import window_filter

TRANSCRIPT_COLUMNS = ("conv_id", "turn_idx", "role", "text", "tool", "ts")


class LineageParityError(RuntimeError):
    """Raised when per-partition lineage row counts disagree with the count
    observed on the write action (never downgraded to a skippable assert)."""


@dataclass
class PipelineResult:
    run_ts: str
    counts: dict[str, int] = field(default_factory=dict)
    sinks: dict[str, str] = field(default_factory=dict)
    skipped: list[str] = field(default_factory=list)


def prepare(
    transcripts: DataFrame,
    catalog: DataFrame,
    run_ts: str | None = None,
    window: str | None = None,
    parse_engine: str = "native",
) -> DataFrame:
    """The shared (pre-fan-out) plan: window filter → parse → enrich."""
    df = transcripts
    if run_ts is not None and window is not None:
        df = window_filter(df, run_ts, window)
    return enrich_turns(parse_turns(df, engine=parse_engine), catalog)


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    routes: Sequence[RouteConfig],
    out_dir: str,
    run_ts: str = "1970-01-01 00:00:00",
    selectors: Sequence[Selector] = (),
    catalog: DataFrame | None = None,
    window: str | None = None,
    manifest: ManifestStore | None = None,
    parse_engine: str = "native",
    collect_lineage: bool = True,
    max_parallel_routes: int = 1,
) -> PipelineResult:
    """Run one tick: fan selected routes out from a single cached enriched DF.

    Resume: routes already committed in `manifest` for this run_ts are skipped;
    each route commits only after its write action returns.

    max_parallel_routes > 1 submits route write actions from a driver thread
    pool — the Spark scheduler interleaves the jobs across executors — which is
    the reference's goroutine-per-selected-stream shape
    (/root/reference/hatchery.go:55-67). Results are identical to sequential
    execution; only action submission order changes.
    """
    selected = select_routes(routes, list(selectors))
    if catalog is None:
        catalog = service_catalog_df(spark)
    enriched = prepare(transcripts, catalog, run_ts=run_ts, window=window,
                       parse_engine=parse_engine)

    result = PipelineResult(run_ts=run_ts)
    pending = []
    for route in selected:
        if manifest is not None and manifest.is_committed(run_ts, route.route_id):
            result.skipped.append(route.route_id)
            rec = manifest.load(run_ts, route.route_id)
            result.counts[route.route_id] = rec.row_count
            result.sinks[route.route_id] = rec.sink_path
        else:
            pending.append(route)

    if not pending:
        return result

    def run_route(route: RouteConfig) -> tuple[RouteConfig, str, int, list[dict]]:
        """One route: filter+order once, write it, derive lineage from the SAME
        physical pass. The ordered frame is persisted so the write action
        populates the cache and the lineage pass re-reads cached blocks —
        the filter + salted shuffle + sort are paid exactly once."""
        matched = ordered_for_sink(route_matches(enriched, route))
        if collect_lineage:
            matched = matched.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            # row count rides on the write action (df.observe) — no extra pass
            sink, n = write_route_frame(matched, route, out_dir, run_ts)
            if collect_lineage:
                parts = [r.asDict() for r in partition_metrics(matched).collect()]
                lineage_n = sum(p["row_count"] for p in parts)
                if lineage_n != n:
                    raise LineageParityError(
                        f"route {route.route_id}: lineage rows {lineage_n} != "
                        f"written rows {n}"
                    )
            else:
                parts = []
        finally:
            if collect_lineage:
                matched.unpersist()
        # commit immediately (ack-after-write): a crash later in the run loses
        # no finished route. Manifest files are per-(run_ts, route) → no
        # cross-thread contention.
        if manifest is not None:
            manifest.commit(
                RouteRunRecord(
                    run_ts=run_ts,
                    route_id=route.route_id,
                    sink_path=sink,
                    row_count=n,
                    committed=True,
                    partitions=parts,
                )
            )
        return route, sink, n, parts

    # pay scan+parse+enrich once; each pending route re-reads cached blocks
    enriched.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        if max_parallel_routes > 1 and len(pending) > 1:
            # materialize the shared cache BEFORE fanning out: concurrent
            # route jobs otherwise stampede the un-populated cache (block
            # locks serialize the partition computes across the pool, so
            # the "parallel" phase degrades to sequential compute plus
            # lock waits). One count() populates every cached block, then
            # the pool's jobs only pay filter+shuffle+write.
            enriched.count()
            with ThreadPoolExecutor(max_workers=max_parallel_routes) as pool:
                outcomes = list(pool.map(run_route, pending))
        else:
            outcomes = [run_route(route) for route in pending]
        for route, sink, n, _parts in outcomes:
            result.counts[route.route_id] = n
            result.sinks[route.route_id] = sink
    finally:
        enriched.unpersist()
    return result
