"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, ...extras}

Protocol notes:
  * The synthetic transcripts input is MATERIALIZED to parquet once and the
    pipeline is measured reading it — matching how a 100 TB job reads a table,
    and keeping datagen expressions out of the measured plan.
  * Each measured query runs once as warm-up, then timed runs. Spark's
    generated code needs one execution to JIT; steady-state throughput is the
    metric that matters for a long-lived cluster job (cold timings are
    reported under "cold_queries" for transparency).
  * THROTTLE ROBUSTNESS: this host throttles CPU, memory bus, and disk in
    INDEPENDENT bursts (identical runs vary 10-20×, and round-4 published a
    9.45 s row for a 3.79 s query because a CPU-only probe can't see a
    bus/disk burst). Every warm sample is bracketed by THREE probes — a
    ~1 s pure-JVM CPU probe, a large-array memcpy probe (memory
    bandwidth), and a small parquet-scan probe (disk+decode) — and only
    counts as CLEAN if every probe lands within 1.3× of its own rolling
    10th-percentile reference (min-ever gets poisoned by one transient
    turbo burst; q10 tracks the sustained fast state, while real
    minutes-long 2-20× throttle bursts still trip the gate). warm = min
    over clean samples (min over all, plus a "throttled" flag, if no
    clean window was found).
  * Scaling-efficiency evidence (local[8] vs local[32]) comes from
    scripts/scaling_bench.py → BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
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
# 3M keeps the disk-bound write tests inside a tight wall-clock budget even
# when the sandbox host throttles
SYN_ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "3000000"))


def _funnel_single_scan(spark, sf_dir):
    """One-shuffle funnel variant benched against the k-scan q_funnel —
    same steps, same events table (verdict r3 #10)."""
    from hatchery_spark.operators.telemetry import funnel_steps_single_scan

    ev = dq.load(spark, sf_dir, "events")
    return funnel_steps_single_scan(ev, ["signup", "click", "purchase"])
# the throughput headline runs on a larger input so fixed per-job overhead
# (~1 s scheduling/broadcast) is <10% of the measured time — at 3M rows the
# agg finishes in ~2 s and the "throughput" would mostly measure that constant
AGG_ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_AGG_ROWS", "12000000"))


def main() -> None:
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("hatchery_bench", cpus=CPUS)
    spark.range(1000).count()

    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    throttled: list[str] = []

    import numpy as np

    _membw_src = np.empty(128 << 20, dtype=np.uint8)  # 128 MiB
    _scan_probe_path: list[str] = []  # filled once the work dir exists

    def _cpu_probe() -> float:
        t0 = time.perf_counter()
        spark.range(0, 300_000_000, 1, CPUS).select(
            F.avg(F.pmod(F.xxhash64("id"), F.lit(1000)))
        ).collect()
        return time.perf_counter() - t0

    def _membw_probe() -> float:
        # a plain big memcpy saturates the memory bus exactly the way
        # shuffle/scan row materialization does — a bus-throttle burst
        # shows up here when the CPU probe stays clean. Each 128 MiB copy
        # is timed INDIVIDUALLY and the min reported: a JVM GC pause or
        # page-cache flush from the just-finished query hits one copy, not
        # the min (summed-copies probes measured bimodal 2× right after
        # heavy queries; min-of-5 is stable within 1.3× — validated), while
        # a genuine bus throttle slows every copy
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            _membw_src.copy()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    def _scan_probe() -> float:
        # small fixed parquet aggregate: disk read + decode; a disk-throttle
        # burst (the r4 write-leg asymmetry) flags here
        t0 = time.perf_counter()
        spark.read.parquet(_scan_probe_path[0]).select(
            F.sum("v"), F.avg("id")
        ).collect()
        return time.perf_counter() - t0

    probes = {"cpu": _cpu_probe, "membw": _membw_probe}
    probe_samples: dict[str, list[float]] = {}

    def _reference(k: str) -> float:
        # the run's "un-throttled host speed" estimate: the 10th percentile
        # of every sample of this probe so far. A min-ever reference gets
        # poisoned by one transient turbo burst (observed: a 0.55 s CPU
        # probe early in a run whose steady state is 0.75 s flags EVERY
        # later sample); q10 tracks the sustained fast state instead,
        # while a genuine throttle burst (minutes-long, 2-20x) still
        # trips the 1.3x gate
        xs = sorted(probe_samples[k])
        return xs[min(len(xs) - 1, len(xs) // 10)]

    def probe_all() -> dict[str, float]:
        got = {k: fn() for k, fn in probes.items()}
        for k, v in got.items():
            probe_samples.setdefault(k, []).append(v)
        return got

    def _probes_clean(got: dict[str, float]) -> bool:
        return all(got[k] <= 1.3 * _reference(k) for k in got)

    def _init_probes() -> None:
        for fn in probes.values():  # JIT / warm each probe path once
            fn()
        for _ in range(4):
            probe_all()

    def measure(name: str, fn, reps: int = 2, max_tries: int = 5) -> None:
        t0 = time.perf_counter()
        fn()
        cold[name] = round(time.perf_counter() - t0, 3)
        clean_samples, all_samples = [], []
        for _ in range(max_tries):
            # bracket the sample with probes: a throttle burst that starts
            # MID-query would pass a before-only check
            p_before = probe_all()
            t1 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t1
            p_after = probe_all()
            all_samples.append(dt)
            if _probes_clean(p_before) and _probes_clean(p_after):
                clean_samples.append(dt)
            if len(clean_samples) >= reps:
                break
        if not clean_samples:
            throttled.append(name)
        warm[name] = round(min(clean_samples or all_samples), 3)

    work = tempfile.mkdtemp(prefix="hs_bench_")
    try:
        # --- materialize synthetic transcripts once (not measured as pipeline)
        t0 = time.perf_counter()
        transcripts_df(spark, SYN_ROWS, seed=42).write.mode("overwrite").parquet(
            f"{work}/transcripts"
        )
        transcripts_df(spark, AGG_ROWS, seed=42).write.mode("overwrite").parquet(
            f"{work}/transcripts_agg"
        )
        datagen_sec = round(time.perf_counter() - t0, 3)
        syn = spark.read.parquet(f"{work}/transcripts")
        cat = service_catalog_df(spark)

        # fixed scan-probe table (~64 MB), written once before any gating
        spark.range(0, 8_000_000, 1, 8).select(
            F.col("id"), F.pmod(F.xxhash64("id"), F.lit(10_000)).alias("v"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        ).write.mode("overwrite").parquet(f"{work}/scan_probe")
        _scan_probe_path.append(f"{work}/scan_probe")
        probes["scan"] = _scan_probe
        _init_probes()

        # --- headline: parse→enrich→route→aggregate over the materialized table
        # (a FRESH DataFrame per rep — re-collecting one instance would reuse
        # its shuffle outputs via stage skipping and time only the final stage)
        measure(
            "pipeline_synthetic_agg",
            lambda: sink_counts(
                prepare(spark.read.parquet(f"{work}/transcripts_agg"), cat),
                DEFAULT_ROUTES,
            ).collect(),
            reps=3, max_tries=7,
        )
        turns_per_sec = round(AGG_ROWS / warm["pipeline_synthetic_agg"], 1)

        def full_write(tag, parallel=1):
            run_pipeline(
                spark, syn, DEFAULT_ROUTES, f"{work}/sinks_{tag}",
                run_ts="2025-06-04 00:00:00", collect_lineage=False,
                max_parallel_routes=parallel,
            )

        def _dir_bytes(path):
            total = 0
            for root, _dirs, files in os.walk(path):
                for f_ in files:
                    total += os.path.getsize(os.path.join(root, f_))
            return total

        write_mb_per_sec: dict[str, float] = {}

        def measure_write(name, parallel, reps=2, max_tries=4):
            # same probe-gated, multi-sample protocol as every other query —
            # a single cold+warm pair on a throttling host reads as a fake
            # regression whenever a burst lands on one leg (the r3 parallel-
            # leg anomaly). Writes are ALSO disk-bound, so MB/s is reported
            # alongside: a disk-throttle window shows up as an MB/s outlier
            # even when the CPU probes pass. Each sample writes a fresh sink
            # dir (removed after sizing) so no run reuses committed output.
            t0 = time.perf_counter()
            full_write(f"{name}_cold", parallel)
            cold[name] = round(time.perf_counter() - t0, 3)
            nbytes = _dir_bytes(f"{work}/sinks_{name}_cold")
            shutil.rmtree(f"{work}/sinks_{name}_cold", ignore_errors=True)
            clean_samples, all_samples = [], []
            for i in range(max_tries):
                tag = f"{name}_w{i}"
                p_before = probe_all()
                t1 = time.perf_counter()
                full_write(tag, parallel)
                dt = time.perf_counter() - t1
                p_after = probe_all()
                shutil.rmtree(f"{work}/sinks_{tag}", ignore_errors=True)
                all_samples.append(dt)
                if _probes_clean(p_before) and _probes_clean(p_after):
                    clean_samples.append(dt)
                if len(clean_samples) >= reps:
                    break
            if not clean_samples:
                throttled.append(name)
            warm[name] = round(min(clean_samples or all_samples), 3)
            write_mb_per_sec[name] = round(nbytes / warm[name] / 1e6, 1)

        # sequential vs 4-way-concurrent route write actions
        measure_write("pipeline_synthetic_write", parallel=1)
        measure_write("pipeline_synthetic_write_parallel", parallel=4)

        # --- pipeline over the driver's events-derived transcripts ----------
        measure(
            "pipeline_events_e2e", lambda: dq.q_sink_counts(spark, SF_DIR).collect()
        )
        measure(
            "parse_native",
            lambda: dq.q_parse(spark, SF_DIR).select(F.count("severity")).collect(),
        )
        measure(
            "parse_pandas_udf",
            lambda: dq.q_parse_pandas(spark, SF_DIR).select(F.count("severity")).collect(),
        )

        # --- generic operators ----------------------------------------------
        for name, fn in [
            ("rel_agg_pricing", dq.q_agg_pricing),
            ("rel_join_segment_revenue", dq.q_join_segment_revenue),
            ("rel_window_first_events", dq.q_window_first_events),
            ("doc_exact_dedup", dq.q_exact_dedup),
            ("doc_minhash_neardup", dq.q_minhash_neardup),
            ("doc_simhash_neardup", dq.q_simhash_neardup),
            ("doc_tfidf_topk", dq.q_tfidf_topk),
            ("doc_char_entropy", dq.q_char_entropy),
            ("doc_pack_sequences", dq.q_pack_sequences),
            ("doc_decontaminate", dq.q_decontaminate),
            ("doc_boilerplate_removal", dq.q_boilerplate_removal),
            ("doc_curation_e2e", dq.q_curation_e2e),
            ("pipeline_asof_last_event", dq.q_asof_last_event),
            ("emb_cosine_topk", dq.q_embedding_topk),
            ("emb_lsh_topk", dq.q_lsh_topk),
            # round-3 operators, oracled but previously untimed (verdict r3 #4)
            ("pipeline_funnel", dq.q_funnel),
            ("pipeline_retention", dq.q_retention),
            ("pipeline_rate_cap", dq.q_rate_cap),
            ("pipeline_group_zscores", dq.q_group_zscores),
            ("doc_vocab_topk", dq.q_vocab_topk),
            ("doc_winnow_fingerprints", dq.q_winnow_fingerprints),
            ("doc_profile_columns", dq.q_profile_columns),
            ("emb_quantized_topk", dq.q_quantized_topk),
            ("emb_ivf_topk", dq.q_ivf_topk),
            # round-4
            ("emb_pq_topk", dq.q_pq_topk),
            ("pipeline_funnel_single_scan", _funnel_single_scan),
            ("doc_gopher_filter", dq.q_gopher_filter),
            ("doc_line_dedup", dq.q_line_dedup),
            ("doc_lm_perplexity", dq.q_lm_perplexity),
            ("doc_temperature_sample", dq.q_temperature_sample),
            ("doc_shuffle_order", dq.q_shuffle_order),
            ("emb_semdedup", dq.q_semdedup),
            ("doc_bpe_train", dq.q_bpe_train),
            ("doc_bpe_encode", dq.q_bpe_encode),
            ("pipeline_sft_render", dq.q_sft_render),
            ("doc_nb_quality", dq.q_nb_quality),
            ("doc_dsir_select", dq.q_dsir_select),
            ("doc_substring_dedup", dq.q_substring_dedup),
            ("doc_bm25_topk", dq.q_bm25_topk),
            ("doc_k_anonymize", dq.q_k_anonymize),
            ("rel_zorder", dq.q_zorder),
            ("doc_group_split", dq.q_group_split),
            ("doc_hybrid_topk", dq.q_hybrid_topk),
            ("doc_unigram_tokens", dq.q_unigram_tokens),
            ("doc_c4_clean", dq.q_c4_clean),
            ("doc_substring_dedup_xx", dq.q_substring_dedup_xx),
            ("rel_upsert_merge", dq.q_upsert_merge),
            ("doc_substring_dedup_within", dq.q_substring_dedup_within),
            ("doc_search_and", dq.q_search_and),
            # round-5
            ("doc_bpe_train_local", dq.q_bpe_train_local),
            ("doc_bpe_encode_arrow", dq.q_bpe_encode_arrow),
            ("doc_substring_dedup_sa", dq.q_substring_dedup_sa),
            ("doc_substring_dedup_sa_within", dq.q_substring_dedup_sa_within),
            ("doc_bpe_tokenize", dq.q_bpe_tokenize),
            ("media_gif_frames", dq.q_media_gif_frames),
            ("media_audio_spectral", dq.q_media_audio_spectral),
            ("media_mp4_meta", dq.q_media_mp4_meta),
            ("doc_bloom_decontaminate", dq.q_bloom_decontaminate),
            ("media_jpeg12_decode", dq.q_media_jpeg12_decode),
            ("emb_kmeans", dq.q_emb_kmeans),
            # round-5 session 3
            ("graph_pagerank", dq.q_pagerank),
            ("pref_bradley_terry", dq.q_bradley_terry),
            ("emb_pca_project", dq.q_pca_project),
            ("pipeline_dpo_pairs", dq.q_dpo_pairs),
            ("rel_scd2", dq.q_scd2),
            ("doc_readability", dq.q_readability),
            ("media_jpeg_decode", dq.q_media_jpeg_decode),
            ("media_jpeg_lossless", dq.q_media_jpeg_lossless),
            ("doc_fuzzy_pairs", dq.q_fuzzy_pairs),
            ("rel_orc_roundtrip", dq.q_orc_roundtrip),
            ("media_mp4_frames", dq.q_media_mp4_frames),
            ("rel_snapshot_timetravel", dq.q_snapshot_timetravel),
            ("doc_kn_perplexity", dq.q_kn_perplexity),
            ("doc_url_canonical", dq.q_url_canonical),
            ("doc_search_phrase", dq.q_search_phrase),
            ("media_image_dhash", dq.q_image_dhash_dedup),
            ("doc_blocklist", dq.q_blocklist_filter),
            ("doc_span_corruption", dq.q_span_corruption),
            ("pipeline_hard_negatives", dq.q_hard_negatives),
            # round-5 session-5 additions
            ("doc_fim_transform", dq.q_fim_transform),
            ("doc_ccnet_buckets", dq.q_ccnet_buckets),
            ("doc_warc_roundtrip", dq.q_warc_roundtrip),
            ("doc_robots_filter", dq.q_robots_filter),
            ("media_audio_alaw", dq.q_media_audio_alaw),
            ("media_jpeg_hier", dq.q_media_jpeg_hier),
            ("media_tiff_decode", dq.q_media_tiff_decode),
            ("media_bmp_decode", dq.q_media_bmp_decode),
            ("rel_incremental_agg", dq.q_incremental_agg),
            ("pipeline_pii_entities", dq.q_pii_entities),
            ("doc_interleave_sources", dq.q_interleave_sources),
            ("doc_homoglyph_fold", dq.q_homoglyph_fold),
            ("doc_length_buckets", dq.q_length_buckets),
            ("doc_html_extract", dq.q_html_extract),
            ("doc_html_outlinks", dq.q_html_outlinks),
            ("doc_warc_wet_chain", dq.q_warc_wet_chain),
            ("doc_warc_gz_members", dq.q_warc_gz_members),
            ("media_mime_sniff", dq.q_mime_sniff),
            ("media_qoi_decode", dq.q_media_qoi_decode),
            ("graph_hits", dq.q_hits),
            ("doc_wordpiece_encode", dq.q_wordpiece_encode),
            ("doc_sitemap_extract", dq.q_sitemap_extract),
            ("pipeline_context_truncate", dq.q_context_truncate),
            ("pipeline_turn_qc", dq.q_turn_qc),
            ("pipeline_tool_loops", dq.q_tool_loops),
            ("graph_triangles", dq.q_triangles),
            ("doc_license_detect", dq.q_license_detect),
            ("doc_cdx_index", dq.q_cdx_index),
            ("doc_markdown_extract", dq.q_markdown_extract),
            ("graph_lpa", dq.q_lpa),
            ("doc_mbox_roundtrip", dq.q_mbox_roundtrip),
            ("pipeline_best_of_n", dq.q_best_of_n),
            ("media_audio_adpcm", dq.q_media_audio_adpcm),
            ("rel_avro_roundtrip", dq.q_avro_roundtrip),
            ("doc_mojibake_repair", dq.q_mojibake_repair),
            ("doc_frontier_schedule", dq.q_frontier_schedule),
            ("rel_jsonl_zst_roundtrip", dq.q_jsonl_zst_roundtrip),
            ("doc_quality_regression", dq.q_quality_regression),
            ("doc_quality_logreg", dq.q_quality_logreg),
            ("pipeline_log_templates", dq.q_log_templates),
            ("pipeline_beacon_detect", dq.q_beacon_detect),
            ("pipeline_hdr_quantiles", dq.q_hdr_quantiles),
            ("pipeline_cidr_enrich", dq.q_cidr_enrich),
            ("pipeline_syslog_rfc5424", dq.q_syslog_rfc5424),
            ("pipeline_syslog_bsd", dq.q_syslog_bsd),
            ("pipeline_topk_certified", dq.q_topk_certified),
            ("pipeline_first_seen", dq.q_first_seen),
            ("pipeline_lttb_downsample", dq.q_lttb_downsample),
            ("pipeline_tcp_reassembly", dq.q_tcp_reassembly),
            ("pipeline_leef_parse", dq.q_leef_parse),
            ("pipeline_mg_heavyhitters", dq.q_mg_heavyhitters),
            ("pipeline_syslog_tcp", dq.q_syslog_tcp),
            ("pipeline_http_extract", dq.q_http_extract),
            ("pipeline_holt_trend", dq.q_holt_trend),
            ("rel_record_linkage", dq.q_record_linkage),
            ("pipeline_l_diversity", dq.q_l_diversity),
            ("pipeline_dp_counts", dq.q_dp_counts),
            ("pipeline_route_digest", dq.q_route_digest),
            ("doc_collocations", dq.q_collocations),
            ("pipeline_fluentd_forward", dq.q_fluentd_forward),
            ("pipeline_cusum_drift", dq.q_cusum_drift),
            ("pipeline_seasonal_anomaly", dq.q_seasonal_anomaly),
            ("pipeline_gorilla_roundtrip", dq.q_gorilla_roundtrip),
            ("pipeline_ipfix_roundtrip", dq.q_ipfix_roundtrip),
            ("pipeline_winevent_xml", dq.q_winevent_xml),
            ("pipeline_gelf_roundtrip", dq.q_gelf_roundtrip),
            ("pipeline_kafka_roundtrip", dq.q_kafka_roundtrip),
            ("pipeline_otlp_roundtrip", dq.q_otlp_roundtrip),
            ("pipeline_ledger_verify", dq.q_ledger_verify),
            ("pipeline_dns_tunnel", dq.q_dns_tunnel),
            ("pipeline_netflow_roundtrip", dq.q_netflow_roundtrip),
            ("media_x509_extract", dq.q_x509_extract),
            ("pipeline_prometheus_scrape", dq.q_prometheus_roundtrip),
            ("pipeline_pcap_roundtrip", dq.q_pcap_roundtrip),
            ("doc_webdataset_roundtrip", dq.q_webdataset_roundtrip),
            ("pipeline_w3c_log", dq.q_w3c_log),
            ("pipeline_slo_burnrate", dq.q_slo_burnrate),
            ("pipeline_rate_envelope", dq.q_rate_envelope),
            ("pipeline_logfmt_roundtrip", dq.q_logfmt_roundtrip),
            ("pipeline_hll_actors", dq.q_hll_actors),
            ("pipeline_cms_resources", dq.q_cms_resources),
            ("rel_snappy_roundtrip", dq.q_snappy_roundtrip),
            ("rel_parquet_footer", dq.q_parquet_footer),
            ("pipeline_template_anomaly", dq.q_template_anomaly),
            ("pipeline_gorilla_bits", dq.q_gorilla_bits),
            ("doc_multi_pattern_scan", dq.q_multi_pattern_scan),
            ("rel_roaring_postings", dq.q_roaring_postings),
            ("pipeline_ip_pseudonymize", dq.q_ip_pseudonymize),
            ("rel_inflate_roundtrip", dq.q_inflate_roundtrip),
            ("rel_deflate_encode", dq.q_deflate_encode),
            ("doc_cdc_chunks", dq.q_cdc_chunks),
            ("rel_avro_evolution", dq.q_avro_evolution),
            ("rel_aes_roundtrip", dq.q_aes_roundtrip),
            ("rel_lz4_roundtrip", dq.q_lz4_roundtrip),
            ("rel_zstd_decode", dq.q_zstd_decode),
            ("rel_orc_footer", dq.q_orc_footer),
            ("doc_soundex_blocks", dq.q_soundex_blocks),
            ("pipeline_stack_stitch", dq.q_stack_stitch),
            ("pipeline_access_log", dq.q_access_log),
            ("pipeline_kmv_actors", dq.q_kmv_actors),
            ("pipeline_ewma_spikes", dq.q_ewma_spikes),
            ("pipeline_flow_stitch", dq.q_flow_stitch),
            ("pipeline_impossible_travel", dq.q_impossible_travel),
            ("pipeline_jwt_parse", dq.q_jwt_parse),
            ("rel_ulid_roundtrip", dq.q_ulid_roundtrip),
            ("rel_cbor_roundtrip", dq.q_cbor_roundtrip),
            ("doc_idn_decode", dq.q_idn_decode),
            ("pipeline_sigma_rules", dq.q_sigma_rules),
            ("pipeline_span_tree", dq.q_span_tree),
            ("pipeline_schema_drift", dq.q_schema_drift),
            ("pipeline_lateness_stats", dq.q_lateness_stats),
            # round-5 session-13
            ("graph_components", dq.q_graph_components),
            ("graph_kcore", dq.q_kcore),
            ("rel_bloom_join", dq.q_bloom_join),
            ("pipeline_itemsets", dq.q_frequent_itemsets),
            ("pipeline_sequence_match", dq.q_sequence_match),
            ("pipeline_rendezvous_shards", dq.q_rendezvous_shards),
            ("pipeline_benford", dq.q_benford),
            ("pipeline_theta_setops", dq.q_theta_setops),
            ("rel_quality_checks", dq.q_quality_checks),
            ("rel_zip_roundtrip", dq.q_zip_roundtrip),
            ("doc_docx_extract", dq.q_docx_extract),
            ("doc_epub_extract", dq.q_epub_extract),
            ("doc_pptx_extract", dq.q_pptx_extract),
            ("rel_xlsx_roundtrip", dq.q_xlsx_roundtrip),
            ("rel_csv_roundtrip", dq.q_csv_roundtrip),
            ("doc_tfrecord_roundtrip", dq.q_tfrecord_roundtrip),
            ("rel_arrow_ipc_roundtrip", dq.q_arrow_ipc_roundtrip),
            ("rel_bzip2_decode", dq.q_bzip2_decode),
            ("rel_xz_decode", dq.q_xz_decode),
        ]:
            measure(
                name,
                lambda fn=fn: fn(spark, SF_DIR)
                .write.format("noop")
                .mode("overwrite")
                .save(),
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)

    total = round(sum(warm.values()), 3)
    # attach the latest scaling-efficiency evidence (scripts/scaling_bench.py)
    scaling = None
    scaling_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "BENCH", "scaling.json")
    if os.path.exists(scaling_path):
        with open(scaling_path) as f:
            s = json.load(f)
        scaling = {
            "efficiency_median_clean": s.get("efficiency_median_clean"),
            "efficiency_normalized_to_hw": s.get("efficiency_normalized_to_hw"),
            "hw_ceiling_efficiency_median": s.get("hw_ceiling_efficiency_median"),
            "scan_ceiling_efficiency_median": s.get("scan_ceiling_efficiency_median"),
            "efficiency_normalized_to_scan": s.get("efficiency_normalized_to_scan"),
            "clean_pairs": s.get("clean_pairs"),
            "rows": s.get("rows"),
            "turns_per_sec_median": s.get("turns_per_sec_median"),
        }
        # cross-run pooled estimators (throttle-robust; scaling_bench.py)
        hist_path = os.path.join(os.path.dirname(scaling_path),
                                 "scaling_history.json")
        if os.path.exists(hist_path):
            with open(hist_path) as f:
                h = json.load(f)
            scaling["pooled_median"] = h.get("pooled_median")
            scaling["pooled_minmin_efficiency"] = h.get("pooled_minmin_efficiency")
            scaling["pooled_clean_pairs"] = h.get("pooled_clean_pairs")
            scaling["pooled_run_count"] = h.get("pooled_run_count")
    print(
        json.dumps(
            {
                "metric": "e2e_parse_route_pipeline_plus_operators_steady_state",
                "value": total,
                "unit": "sec",
                "queries": warm,
                "cold_queries": cold,
                "throttled_queries": throttled,
                "best_probe_sec": round(min(probe_samples["cpu"]), 3),
                "best_probes": {
                    k: round(min(v), 4) for k, v in probe_samples.items()
                },
                "probe_reference": {
                    k: round(_reference(k), 4) for k in probe_samples
                },
                "probe_p50": {
                    k: round(sorted(v)[len(v) // 2], 4)
                    for k, v in probe_samples.items()
                },
                "sf": sf,
                "cpus": CPUS,
                "synthetic_rows": SYN_ROWS,
                "agg_rows": AGG_ROWS,
                "datagen_materialize_sec": datagen_sec,
                "write_mb_per_sec": write_mb_per_sec,
                "throughput_turns_per_sec": turns_per_sec,
                "scaling": scaling,
            }
        )
    )


if __name__ == "__main__":
    main()
