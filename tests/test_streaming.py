import pytest
from pyspark.sql import functions as F

from hatchery_spark.config import RouteConfig
from hatchery_spark.datagen import service_catalog_df, transcripts_df
from hatchery_spark.pipeline import prepare
from hatchery_spark.router import sink_counts
from hatchery_spark.streaming.stream import (
    read_transcripts_stream,
    run_streaming_pipeline,
    windowed_sink_counts,
)

ROUTES = [
    RouteConfig("s-err", predicate="severity IN ('error','critical')"),
    RouteConfig("s-chat", predicate="category = 'chat'"),
]


@pytest.fixture(scope="module")
def input_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream_in"))
    transcripts_df(spark, 4000, seed=3).write.mode("overwrite").parquet(path)
    return path


def test_available_now_matches_batch(spark, input_dir, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    run_streaming_pipeline(spark, input_dir, ROUTES, out, ckpt)

    batch_df = spark.read.parquet(input_dir)
    want = {
        r.route_id: r.row_count
        for r in sink_counts(prepare(batch_df, service_catalog_df(spark)), ROUTES).collect()
    }
    for rid, n in want.items():
        got = spark.read.parquet(f"{out}/{rid}").count()
        assert got == n, rid


def test_checkpoint_prevents_reprocessing(spark, input_dir, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    run_streaming_pipeline(spark, input_dir, ROUTES, out, ckpt)
    first = spark.read.parquet(f"{out}/s-err").count()
    # second run with SAME checkpoint: no new input → no duplicates appended
    run_streaming_pipeline(spark, input_dir, ROUTES, out, ckpt)
    assert spark.read.parquet(f"{out}/s-err").count() == first


def test_windowed_counts_schema_and_totals(spark, input_dir, tmp_path):
    stream = read_transcripts_stream(spark, input_dir)
    agg = windowed_sink_counts(stream, ROUTES, service_catalog_df(spark), window="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM win_counts").collect()
    assert {r.route_id for r in rows} <= {"s-err", "s-chat"}
    batch_df = spark.read.parquet(input_dir)
    want = {
        r.route_id: r.row_count
        for r in sink_counts(prepare(batch_df, service_catalog_df(spark)), ROUTES).collect()
    }
    got = {}
    for r in rows:
        got[r.route_id] = got.get(r.route_id, 0) + r.row_count
        assert r.window_end > r.window_start
    assert got == want


def test_dedup_stream_drops_replayed_rows(spark, tmp_path):
    """Duplicate (conv_id, turn_idx) keys across the stream survive exactly
    once; state is watermark-bounded (dropDuplicatesWithinWatermark)."""
    from hatchery_spark.streaming.stream import dedup_stream

    src = str(tmp_path / "dup_in")
    base = transcripts_df(spark, 1000, seed=11)
    # replay: the same payload written twice (at-least-once redelivery shape)
    base.write.mode("overwrite").parquet(src)
    base.write.mode("append").parquet(src)
    assert spark.read.parquet(src).count() == 2000

    stream = read_transcripts_stream(spark, src)
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("dedup_out")
    assert out.count() == 1000
    assert out.groupBy("conv_id", "turn_idx").count().filter("count > 1").isEmpty()


def test_interrupted_replay_is_idempotent(spark, input_dir, tmp_path):
    """Kill the foreachBatch writer BETWEEN route writes, restart from the same
    checkpoint, and assert multiset row parity with an uninterrupted run.

    foreachBatch is at-least-once: the restarted query replays the failed batch
    with the SAME batch_id. The sinks are batch_id-partitioned and written with
    dynamic partition overwrite, so the replay replaces route 1's partial write
    instead of appending a duplicate copy (streaming analog of the reference's
    ack-after-write, falcon client.go:217-224).
    """
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from hatchery_spark.pipeline import TRANSCRIPT_COLUMNS
    from hatchery_spark.streaming.stream import route_fanout_batch_writer

    catalog = service_catalog_df(spark)

    # --- uninterrupted reference run -------------------------------------
    clean_out = str(tmp_path / "clean_out")
    run_streaming_pipeline(
        spark, input_dir, ROUTES, clean_out, str(tmp_path / "clean_ckpt")
    )

    # --- interrupted run: route 1 lands, then the driver "dies" ----------
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    first_route_only = route_fanout_batch_writer(ROUTES[:1], out, catalog)

    def crash_between_routes(batch_df, batch_id):
        first_route_only(batch_df, batch_id)  # route 1 fully written...
        raise RuntimeError("simulated crash before route 2")  # ...then crash

    q = (
        spark.readStream.schema(
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp"
        )
        .parquet(input_dir)
        .select(*TRANSCRIPT_COLUMNS)
        .writeStream.foreachBatch(crash_between_routes)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException):
        q.awaitTermination()
    # route 1's rows exist on disk but the batch was never committed
    assert spark.read.parquet(f"{out}/{ROUTES[0].route_id}").count() > 0

    # --- restart from the same checkpoint: Spark replays the batch -------
    run_streaming_pipeline(spark, input_dir, ROUTES, out, ckpt)

    for route in ROUTES:
        got = spark.read.parquet(f"{out}/{route.route_id}")
        want = spark.read.parquet(f"{clean_out}/{route.route_id}")
        # no duplicates from the replayed partial write
        assert got.groupBy("conv_id", "turn_idx").count().filter("count > 1").isEmpty()
        # multiset parity with the uninterrupted run
        key = lambda r: (r.conv_id, r.turn_idx, r.role, r.text)
        assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))


def test_incremental_dedup_stream_across_batches(spark, tmp_path):
    """Continuous-ingest dedup: texts repeated across micro-batches (and
    within one) reach the sink exactly once; the digest store accumulates
    one delta partition per batch; a re-run of the same query from the same
    checkpoint adds nothing."""
    from hatchery_spark.streaming.stream import run_incremental_dedup_stream

    inp = str(tmp_path / "in")
    sink = str(tmp_path / "sink")
    store = str(tmp_path / "store")
    ck = str(tmp_path / "ck")
    schema = "doc_id long, text string"

    spark.createDataFrame(
        [(0, "alpha"), (1, "beta"), (2, "alpha")], schema
    ).coalesce(1).write.mode("append").parquet(inp)
    spark.createDataFrame(
        [(10, "beta"), (11, "gamma")], schema
    ).coalesce(1).write.mode("append").parquet(inp)

    # one file per trigger → the two input files become separate batches
    run_incremental_dedup_stream(
        spark, inp, sink, store, ck, schema, max_files_per_trigger=1
    )
    out = {r.text: r.doc_id for r in spark.read.parquet(sink).collect()}
    assert set(out) == {"alpha", "beta", "gamma"}  # each text exactly once
    assert spark.read.parquet(store).count() == 3  # one digest per text

    # drain again from the same checkpoint: no new batches, nothing changes
    run_incremental_dedup_stream(spark, inp, sink, store, ck, schema)
    assert spark.read.parquet(sink).count() == 3


def test_incremental_dedup_history_scan_is_pruned_not_shuffled(spark, tmp_path):
    """The per-batch history lookup must partition-prune the digest store
    (bucket ∈ batch buckets ∧ v < batch_id as PartitionFilters) and keep
    history on the map side of a BROADCAST semi-join — a full-store
    sort-merge anti-join would make every micro-batch shuffle the entire
    digest history (the round-3 scale finding this layout closes)."""
    from hatchery_spark.streaming.stream import (
        _bucketed_digests,
        pruned_history_digests,
        run_incremental_dedup_stream,
    )

    inp = str(tmp_path / "in")
    sink = str(tmp_path / "sink")
    store = str(tmp_path / "store")
    ck = str(tmp_path / "ck")
    schema = "doc_id long, text string"
    spark.createDataFrame(
        [(i, f"doc number {i}") for i in range(50)], schema
    ).coalesce(1).write.mode("append").parquet(inp)
    run_incremental_dedup_stream(spark, inp, sink, store, ck, schema)

    batch2 = spark.createDataFrame(
        [(100, "doc number 7"), (101, "a brand new doc")], schema
    )
    seen = pruned_history_digests(
        spark, store, _bucketed_digests(batch2, "text", 64), batch_id=1
    )
    plan = seen._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # bucket + v filters reached the scan as partition (directory) filters
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln][0]
    assert "bucket" in pf and "v#" in pf
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan
    # and the pruned lookup is correct: exactly the one replayed digest
    assert seen.count() == 1


def test_incremental_dedup_recovers_from_uncommitted_first_write(spark, tmp_path):
    """A store directory that exists but holds NO committed parquet (the
    crash-during-first-write state — only _temporary/ inside) must be
    treated as empty history, not wedge every replay with a read error."""
    import os

    from hatchery_spark.streaming.stream import run_incremental_dedup_stream

    inp = str(tmp_path / "in")
    sink = str(tmp_path / "sink")
    store = str(tmp_path / "store")
    ck = str(tmp_path / "ck")
    schema = "doc_id long, text string"
    # simulate the crashed first write: directory exists, nothing committed
    os.makedirs(os.path.join(store, "_temporary", "0"))
    spark.createDataFrame(
        [(0, "alpha"), (1, "beta"), (2, "alpha")], schema
    ).coalesce(1).write.mode("append").parquet(inp)

    run_incremental_dedup_stream(spark, inp, sink, store, ck, schema)
    assert {r.text for r in spark.read.parquet(sink).collect()} == {"alpha", "beta"}


def test_session_window_counts_gap_semantics(spark, tmp_path):
    """Two bursts separated by more than the gap become two sessions; a
    burst within the gap stays one session. Append-mode sessions emit only
    once a LATER batch advances the watermark past their end, so two flush
    batches trail the data under maxFilesPerTrigger=1."""
    from pyspark.sql import functions as F
    from hatchery_spark.streaming.stream import session_window_counts

    inp = str(tmp_path / "sw_in")
    ck = str(tmp_path / "sw_ck")
    out = str(tmp_path / "sw_out")
    ddl = "conv_id string, turn_idx int, ts string"

    def put(rows):
        spark.createDataFrame(rows, ddl).withColumn(
            "ts", F.to_timestamp("ts")
        ).coalesce(1).write.mode("append").parquet(inp)

    put([
        ("c1", 0, "2025-06-01 10:00:00"),
        ("c1", 1, "2025-06-01 10:02:00"),   # within 5 min gap -> same session
        ("c1", 2, "2025-06-01 10:30:00"),   # > gap -> new session
        ("c2", 0, "2025-06-01 10:00:00"),
    ])
    put([("flush", 0, "2025-06-01 12:00:00")])
    put([("flush", 1, "2025-06-01 14:00:00")])

    stream = (
        spark.readStream.schema("conv_id string, turn_idx int, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(inp)
    )
    q = (
        session_window_counts(stream, gap="5 minutes", watermark="1 second")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.conv_id, str(r.session_start)): r.n_turns
        for r in spark.read.parquet(out).collect()
        if r.conv_id != "flush"
    }
    assert got == {
        ("c1", "2025-06-01 10:00:00"): 2,
        ("c1", "2025-06-01 10:30:00"): 1,
        ("c2", "2025-06-01 10:00:00"): 1,
    }


def _neardup_corpus():
    """Three ~200-char base texts far apart in shingle space, plus edits."""
    base = {
        "a": "the quick brown fox jumps over the lazy dog " * 5,
        "b": "pack my box with five dozen liquor jugs today " * 5,
        "c": "sphinx of black quartz judge my vow tonight ok " * 5,
    }
    near_a = base["a"].replace("lazy", "lazy old", 1)  # high-Jaccard edit
    return base, near_a


def test_streaming_neardup_across_batches(spark, tmp_path):
    """Continuous-ingest NEAR-dup: a batch-2 document that is an edited
    (not byte-equal) variant of a batch-1 document is suppressed; genuinely
    novel text passes; within-batch near-dups keep only the min-id member;
    re-draining from the same checkpoint adds nothing."""
    from hatchery_spark.streaming.stream import run_streaming_neardup

    base, near_a = _neardup_corpus()
    inp = str(tmp_path / "in")
    sink = str(tmp_path / "sink")
    store = str(tmp_path / "bands")
    ck = str(tmp_path / "ck")
    schema = "doc_id long, text string"

    # batch 1: two distinct docs + a within-batch near-dup of doc 0
    spark.createDataFrame(
        [(0, base["a"]), (1, base["b"]), (2, base["a"] + " extra tail")],
        schema,
    ).coalesce(1).write.mode("append").parquet(inp)
    # batch 2: near-dup of batch-1 doc 0 (edited, not byte-equal) + novel doc
    spark.createDataFrame(
        [(10, near_a), (11, base["c"])], schema
    ).coalesce(1).write.mode("append").parquet(inp)

    run_streaming_neardup(
        spark, inp, sink, store, ck, schema, max_files_per_trigger=1
    )
    kept = {r.doc_id for r in spark.read.parquet(sink).collect()}
    assert kept == {0, 1, 11}  # 2 lost within batch 1; 10 lost to history

    # band store indexes exactly the emitted docs
    assert spark.read.parquet(store).select("doc_id").distinct().count() == 3

    # idempotence: re-drain from the same checkpoint — no new batches
    run_streaming_neardup(spark, inp, sink, store, ck, schema)
    assert spark.read.parquet(sink).count() == 3


def test_streaming_neardup_history_scan_is_pruned(spark, tmp_path):
    """The cross-batch candidate lookup must partition-prune the band store
    (bucket ∈ batch buckets ∧ v < batch_id) and broadcast the BATCH side —
    a full-store shuffle per micro-batch is the scale shape this layout
    exists to avoid."""
    from hatchery_spark.streaming.stream import (
        _bucketed_band_rows,
        pruned_history_band_matches,
        run_streaming_neardup,
    )

    base, near_a = _neardup_corpus()
    inp = str(tmp_path / "in")
    sink = str(tmp_path / "sink")
    store = str(tmp_path / "bands")
    ck = str(tmp_path / "ck")
    schema = "doc_id long, text string"
    spark.createDataFrame(
        [(0, base["a"]), (1, base["b"])], schema
    ).coalesce(1).write.mode("append").parquet(inp)
    run_streaming_neardup(spark, inp, sink, store, ck, schema)

    batch2 = spark.createDataFrame([(10, near_a), (11, base["c"])], schema)
    bands2 = _bucketed_band_rows(batch2, "text", "doc_id", 32, 8, 5, 64)
    cand = pruned_history_band_matches(spark, store, bands2, batch_id=1)
    plan = cand._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln][0]
    assert "bucket" in pf and "v#" in pf
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # candidate correctness: the edited doc collides with doc 0 on ≥1 band
    got = {(r.hist_id, r.new_id) for r in cand.collect()}
    assert (0, 10) in got
    assert all(h == 0 and n == 10 for h, n in got)


def test_ann_ingest_stream_and_pruned_search(spark, tmp_path):
    """Continuous ANN ingest against a frozen quantizer: vectors arriving in
    different micro-batches are all searchable; the search scan
    partition-prunes to the probed cells; a re-drain from the same
    checkpoint adds nothing to the store."""
    import numpy as np

    from hatchery_spark.functions.similarity import spherical_kmeans
    from hatchery_spark.streaming.stream import (
        run_ann_ingest_stream,
        search_ann_store,
    )

    rng = np.random.default_rng(7)
    # two well-separated clusters -> a 2-cell quantizer is stable
    a = rng.normal((5, 0, 0, 0), 0.1, (20, 4))
    b = rng.normal((0, 5, 0, 0), 0.1, (20, 4))
    cents = spherical_kmeans(np.vstack([a, b]), 2, seed=1)

    schema = "vec_id long, embedding array<double>"
    inp, store, ck = (str(tmp_path / p) for p in ("in", "store", "ck"))
    spark.createDataFrame(
        [(i, [float(x) for x in a[i]]) for i in range(20)], schema
    ).coalesce(1).write.mode("append").parquet(inp)
    spark.createDataFrame(
        [(100 + i, [float(x) for x in b[i]]) for i in range(20)], schema
    ).coalesce(1).write.mode("append").parquet(inp)

    # one file per trigger -> the two input files become separate batches
    run_ann_ingest_stream(
        spark, inp, store, ck, schema, cents, max_files_per_trigger=1
    )
    assert spark.read.parquet(store).count() == 40

    # a query near cluster b retrieves ONLY batch-2 vectors; near cluster a
    # only batch-1 — i.e. both batches are live in one index
    qb = spark.createDataFrame(
        [(0, [0.0, 5.0, 0.0, 0.0])], "query_id long, embedding array<double>"
    )
    hits_b = search_ann_store(spark, store, cents, qb, k=3, n_probe=1)
    plan = hits_b._jdf.queryExecution().executedPlan().toString()
    got_b = [r.vec_id for r in hits_b.collect()]
    assert len(got_b) == 3 and all(v >= 100 for v in got_b)
    qa = spark.createDataFrame(
        [(1, [5.0, 0.0, 0.0, 0.0])], "query_id long, embedding array<double>"
    )
    got_a = [r.vec_id for r in search_ann_store(
        spark, store, cents, qa, k=3, n_probe=1).collect()]
    assert len(got_a) == 3 and all(v < 100 for v in got_a)

    # the store scan is pruned at planning time to the probed cell dirs
    assert "PartitionFilters" in plan
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln][0]
    assert "cell" in pf

    # re-drain from the same checkpoint: no new batches, store unchanged
    run_ann_ingest_stream(spark, inp, store, ck, schema, cents)
    assert spark.read.parquet(store).count() == 40


def test_interval_join_streams_inner_and_timeout(spark, tmp_path):
    """Stream-stream interval join: in-window responses pair, out-of-window
    ones don't, and left_outer emits watermark-proven unmatched requests."""
    from hatchery_spark.streaming.stream import interval_join_streams

    req_dir, resp_dir = str(tmp_path / "req"), str(tmp_path / "resp")
    out = str(tmp_path / "ivout")
    base = "2025-06-01 10:{:02d}:00"
    reqs = spark.createDataFrame(
        [
            ("r1", base.format(0)),   # matched in window
            ("r2", base.format(5)),   # response arrives too late (> lag)
            ("r3", base.format(10)),  # never answered
        ],
        "req_id string, req_ts string",
    ).select("req_id", F.col("req_ts").cast("timestamp"))
    resps = spark.createDataFrame(
        [
            ("r1", base.format(3), "ok"),      # +3 min: inside 10-min lag
            ("r2", base.format(20), "late"),   # +15 min: outside
            ("zz", "2025-06-01 12:00:00", "wm"),  # watermark advancer
        ],
        "req_id string, resp_ts string, status string",
    ).select("req_id", F.col("resp_ts").cast("timestamp"), "status")
    # two files per side, processed as separate micro-batches
    # (maxFilesPerTrigger=1): the second file's 12:00 rows advance BOTH
    # watermarks so the outer join can prove r2/r3 unmatched and flush them
    reqs.filter("req_id != 'zz'").coalesce(1).write.mode("overwrite").parquet(req_dir)
    spark.createDataFrame(
        [("zz", "2025-06-01 12:00:00")], "req_id string, req_ts string"
    ).select("req_id", F.col("req_ts").cast("timestamp")).coalesce(1).write.mode(
        "append"
    ).parquet(req_dir)
    resps.filter("status != 'wm'").coalesce(1).write.mode("overwrite").parquet(resp_dir)
    resps.filter("status = 'wm'").coalesce(1).write.mode("append").parquet(resp_dir)

    def run(how, ckpt):
        left = (
            spark.readStream.schema("req_id string, req_ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(req_dir)
        )
        right = (
            spark.readStream.schema("req_id string, resp_ts timestamp, status string")
            .option("maxFilesPerTrigger", 1)
            .parquet(resp_dir)
        )
        joined = interval_join_streams(
            left, right, max_lag="10 minutes", watermark="5 minutes", how=how
        )
        q = (
            joined.writeStream.format("parquet")
            .option("path", f"{out}_{how}")
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(f"{out}_{how}")

    inner = [r for r in run("inner", "ck1").collect() if r.req_id != "zz"]
    assert [(r.req_id, r.status) for r in inner] == [("r1", "ok")]

    outer = {r.req_id: r.status for r in run("left_outer", "ck2").collect()}
    assert outer["r1"] == "ok"
    # r2/r3: watermark (advanced by the 12:00 rows) proves no match → NULLs
    assert outer["r2"] is None and outer["r3"] is None


def test_hll_ingest_stream_merges_and_is_idempotent(spark, tmp_path):
    """Streaming HLL: two micro-batches' merged registers equal the
    registers of the union (sketch mergeability end-to-end); a replayed
    drain from the same checkpoint changes nothing; the store holds one
    complete snapshot per batch (time travel)."""
    import os

    from hatchery_spark.operators.sketches import hll_estimate, hll_registers
    from hatchery_spark.streaming.stream import (
        hll_store_estimates,
        run_hll_ingest_stream,
    )

    inp = str(tmp_path / "in")
    store = str(tmp_path / "store")
    ck = str(tmp_path / "ck")
    schema = "grp string, k string"

    b1 = [("a", f"k{i}") for i in range(0, 400)]
    b2 = [("a", f"k{i}") for i in range(200, 700)] + [
        ("b", f"x{i}") for i in range(50)
    ]
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(inp)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(inp)

    run_hll_ingest_stream(
        spark, inp, store, ck, schema, "k", ["grp"], max_files_per_trigger=1
    )
    versions = sorted(d for d in os.listdir(store) if d.startswith("v="))
    assert len(versions) == 2  # one complete snapshot per micro-batch

    merged = hll_store_estimates(spark, store, ["grp"])
    direct = hll_estimate(
        hll_registers(
            spark.createDataFrame(b1 + b2, schema), "k", ["grp"]
        ),
        ["grp"],
    )
    m = {r.grp: (r.v_zero, r.scaled_sum, r.estimate) for r in merged.collect()}
    d = {r.grp: (r.v_zero, r.scaled_sum, r.estimate) for r in direct.collect()}
    assert m == d  # streamed merge ≡ batch sketch, register-exact

    # replay: same checkpoint, no new input → store byte-stable
    before = {
        v: sorted(os.listdir(os.path.join(store, v))) for v in versions
    }
    run_hll_ingest_stream(spark, inp, store, ck, schema, "k", ["grp"])
    after = {
        v: sorted(os.listdir(os.path.join(store, v)))
        for v in sorted(os.listdir(store))
        if v.startswith("v=")
    }
    assert before == after
