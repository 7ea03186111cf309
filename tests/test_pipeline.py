import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from hatchery_spark.config import RouteConfig
from hatchery_spark.datagen import service_catalog_df, transcripts_df
from hatchery_spark.lineage import ManifestStore
from hatchery_spark.pipeline import prepare, run_pipeline
from hatchery_spark.router import routed_union, sink_counts

from tests.oracle import pipeline_oracle

ROUTES = [
    RouteConfig("sec-alerts", tags=("security",), predicate="severity IN ('error','critical')"),
    RouteConfig("chat-archive", tags=("archive",), predicate="category = 'chat'"),
    RouteConfig(
        "auth-audit",
        tags=("security", "audit"),
        predicate="action IN ('user_login','token_created','permission_granted')",
    ),
]

ORACLE_PREDS = {
    "sec-alerts": lambda d: d["severity"].isin(["error", "critical"]),
    "chat-archive": lambda d: d["category"] == "chat",
    "auth-audit": lambda d: d["action"].isin(
        ["user_login", "token_created", "permission_granted"]
    ),
}

KEY = ["route_id", "conv_id", "turn_idx"]
CMP_COLS = KEY + ["role", "text", "tool", "actor", "action", "resource", "severity",
                  "service", "category"]


@pytest.fixture(scope="module")
def transcripts(spark):
    df = transcripts_df(spark, 6000, n_convs=150, seed=11).cache()
    df.count()
    yield df
    df.unpersist()


def _spark_routed(spark, transcripts):
    enriched = prepare(transcripts, service_catalog_df(spark))
    return routed_union(enriched, ROUTES)


def test_routed_row_equality_vs_oracle(spark, transcripts):
    got = (
        _spark_routed(spark, transcripts)
        .select(*CMP_COLS)
        .toPandas()
        .sort_values(KEY)
        .reset_index(drop=True)
    )
    pdf = transcripts.toPandas()
    want = (
        pipeline_oracle(pdf, ORACLE_PREDS)[CMP_COLS].sort_values(KEY).reset_index(drop=True)
    )
    # NaN→None normalization for comparison
    got = got.where(pd.notnull(got), None)
    want = want.where(pd.notnull(want), None)
    pd.testing.assert_frame_equal(got, want)


def test_per_sink_count_parity(spark, transcripts):
    enriched = prepare(transcripts, service_catalog_df(spark))
    got = {r.route_id: r.row_count for r in sink_counts(enriched, ROUTES).collect()}
    oracle = pipeline_oracle(transcripts.toPandas(), ORACLE_PREDS)
    want = oracle.groupby("route_id").size().to_dict()
    assert got == want


def test_ordering_stable_across_shuffle_partitions(spark, transcripts):
    # per-file ordering by (conv_id, turn_idx) must hold regardless of
    # spark.sql.shuffle.partitions (SURVEY §5.4)
    from hatchery_spark.router import ordered_for_sink

    for n in ("4", "13"):
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", n)
        try:
            out = ordered_for_sink(transcripts)

            def check_sorted(it):
                prev = None
                bad = 0
                for row in it:
                    k = (row.conv_id, row.turn_idx)
                    if prev is not None and k < prev:
                        bad += 1
                    prev = k
                yield (bad,)

            bad_total = (
                out.select("conv_id", "turn_idx")
                .rdd.mapPartitions(check_sorted)
                .map(lambda t: t[0])
                .sum()
            )
            assert bad_total == 0
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)


def test_end_to_end_run_with_sinks(spark, transcripts, tmp_path):
    out_dir = str(tmp_path / "sinks")
    manifest = ManifestStore(str(tmp_path / "manifest"))
    res = run_pipeline(
        spark, transcripts, ROUTES, out_dir, run_ts="2025-06-04 00:00:00", manifest=manifest
    )
    oracle = pipeline_oracle(transcripts.toPandas(), ORACLE_PREDS)
    want = oracle.groupby("route_id").size().to_dict()
    assert res.counts == want
    # sinks readable, text byte-equal to input under the (conv_id, turn_idx) key
    for rid, sink in res.sinks.items():
        back = spark.read.parquet(sink)
        assert back.count() == want[rid]
        joined = back.select("conv_id", "turn_idx", F.col("text").alias("routed_text")).join(
            transcripts.select("conv_id", "turn_idx", "text"), ["conv_id", "turn_idx"]
        )
        assert joined.filter(F.col("routed_text") != F.col("text")).count() == 0
    # lineage recorded per partition
    rec = manifest.load("2025-06-04 00:00:00", "sec-alerts")
    assert rec.committed and sum(p["row_count"] for p in rec.partitions) == want["sec-alerts"]


def test_resume_skips_committed_routes(spark, transcripts, tmp_path):
    out_dir = str(tmp_path / "sinks")
    manifest = ManifestStore(str(tmp_path / "manifest"))
    run_ts = "2025-06-04 01:00:00"
    # simulate a crash after the first route: run only route 1 committed
    res1 = run_pipeline(
        spark, transcripts, ROUTES[:1], out_dir, run_ts=run_ts, manifest=manifest
    )
    assert res1.skipped == []
    # full re-run with same run_ts: route 1 skipped, others executed
    res2 = run_pipeline(spark, transcripts, ROUTES, out_dir, run_ts=run_ts, manifest=manifest)
    assert res2.skipped == ["sec-alerts"]
    assert set(res2.counts) == {"sec-alerts", "chat-archive", "auth-audit"}
    # idempotence: third run skips everything, counts unchanged
    res3 = run_pipeline(spark, transcripts, ROUTES, out_dir, run_ts=run_ts, manifest=manifest)
    assert sorted(res3.skipped) == sorted(res2.counts)
    assert res3.counts == res2.counts
    # no duplicate rows in any sink after re-runs
    for rid, sink in res3.sinks.items():
        back = spark.read.parquet(sink)
        assert back.groupBy("conv_id", "turn_idx").count().filter("count > 1").count() == 0


def test_two_ticks_accumulate_in_shared_sinks(spark, transcripts, tmp_path):
    """Tick-loop semantics: each run lands in its own run_ts partition; a later
    tick must never clobber an earlier tick's rows (reference accumulates one
    object per poll, destination/gcs/client.go:42-54)."""
    out_dir = str(tmp_path / "sinks")
    manifest = ManifestStore(str(tmp_path / "manifest"))
    route = [RouteConfig("all-rows", predicate="true")]
    # disjoint 6h windows ending at two consecutive tick times
    ticks = ["2025-06-01 06:00:00", "2025-06-01 12:00:00"]
    counts = {}
    for run_ts in ticks:
        res = run_pipeline(
            spark, transcripts, route, out_dir,
            run_ts=run_ts, window="6 hours", manifest=manifest,
        )
        counts[run_ts] = res.counts["all-rows"]
    assert all(c > 0 for c in counts.values())
    back = spark.read.parquet(f"{out_dir}/all-rows")
    # both ticks' partitions survive, no loss and no duplication
    per_run = {r.run_ts: r.n for r in back.groupBy("run_ts").agg(F.count("*").alias("n")).collect()}
    assert per_run == {
        "2025-06-01T06-00-00": counts[ticks[0]],
        "2025-06-01T12-00-00": counts[ticks[1]],
    }
    # re-running tick 1 WITHOUT the manifest (simulated retry after lost
    # manifest) overwrites only its own run_ts partitions — still no dup
    run_pipeline(spark, transcripts, route, out_dir, run_ts=ticks[0], window="6 hours")
    back2 = spark.read.parquet(f"{out_dir}/all-rows")
    assert back2.count() == sum(counts.values())


def test_parallel_routes_match_sequential(spark, transcripts, tmp_path):
    seq = run_pipeline(
        spark, transcripts, ROUTES, str(tmp_path / "seq"),
        run_ts="2025-06-04 00:00:00",
        manifest=ManifestStore(str(tmp_path / "m_seq")),
    )
    par = run_pipeline(
        spark, transcripts, ROUTES, str(tmp_path / "par"),
        run_ts="2025-06-04 00:00:00",
        manifest=ManifestStore(str(tmp_path / "m_par")),
        max_parallel_routes=3,
    )
    assert par.counts == seq.counts
    for rid in par.counts:
        a = spark.read.parquet(par.sinks[rid]).drop("run_ts")
        b = spark.read.parquet(seq.sinks[rid]).drop("run_ts")
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # manifests recorded the same counts + consistent lineage
    m = ManifestStore(str(tmp_path / "m_par"))
    for rid, n in par.counts.items():
        rec = m.load("2025-06-04 00:00:00", rid)
        assert rec.committed and sum(p["row_count"] for p in rec.partitions) == n


def test_lineage_single_pass_reads_cache(spark, transcripts):
    """The lineage pass must read the persisted ordered frame (InMemory scan),
    not recompute the filter+shuffle+sort a second time."""
    from hatchery_spark.lineage import partition_metrics
    from hatchery_spark.router import ordered_for_sink, route_matches

    matched = ordered_for_sink(route_matches(
        prepare(transcripts, service_catalog_df(spark)), ROUTES[0]
    )).persist()
    try:
        matched.count()  # populate cache (stands in for the write action)
        plan = partition_metrics(matched)._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan or "TableCacheQueryStage" in plan, plan
    finally:
        matched.unpersist()


def test_window_filter_applied(spark, transcripts):
    res_df = prepare(
        transcripts,
        service_catalog_df(spark),
        run_ts="2025-06-02 00:00:00",
        window="6 hours",
    )
    mn, mx = res_df.agg(F.min("ts"), F.max("ts")).first()
    assert str(mn) >= "2025-06-01 18:00:00"
    assert str(mx) <= "2025-06-02 00:00:00"


def test_gorilla_bucket_table(spark):
    import datetime

    from hatchery_spark.operators.telemetry import gorilla_ts_bits

    base = datetime.datetime(2024, 5, 1)
    # stream: constant 10s cadence (dod=0), one +30s wobble (7-bit), one
    # +300s gap (9-bit dod=270 then -270), one big jump (32-bit)
    offs = [0, 10, 20, 30, 60, 70, 80, 380, 390, 100000]
    rows = [
        ("c1", i, "user", "t", "x", base + datetime.timedelta(seconds=o))
        for i, o in enumerate(offs)
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )
    r = gorilla_ts_bits(df).collect()[0]
    assert r.n_points == 10 and r.raw_bits == 640
    # deltas: -,10,10,10,30,10,10,300,10,99610
    # dods:   -, 10,0,0,20,-20,0, 290,-290 (→16-bit bucket), 99600 (→36)
    assert (r.n_zero, r.n_7bit, r.n_9bit, r.n_12bit, r.n_32bit) == (3, 3, 0, 2, 1)
    assert r.total_bits == 64 + 3 * 1 + 3 * 9 + 2 * 16 + 36
    assert r.permille == r.total_bits * 1000 // 640
