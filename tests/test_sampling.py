"""Sampling + packing: determinism under repartition, quota and bin semantics."""

import pyspark.sql.functions as F
import pytest

from hatchery_spark.functions.sampling import (
    deterministic_sample,
    pack_sequences,
    sample_threshold,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"doc text number {i} with some words", ["web", "chat", "code"][i % 3])
        for i in range(300)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_sample_threshold_bounds():
    assert sample_threshold(0.0) == "0000"
    # 'g' sorts above every hex char; "10000" would sort BELOW "ffff"
    assert sample_threshold(1.0) == "g"
    assert sample_threshold(0.25) == "4000"


def test_sample_rate_one_keeps_everything(docs):
    assert deterministic_sample(docs, 1.0).count() == docs.count()
    assert deterministic_sample(docs, 0.0).count() == 0


def test_deterministic_sample_stable_under_repartition(docs):
    ids1 = {r.doc_id for r in deterministic_sample(docs, 0.3).select("doc_id").collect()}
    ids2 = {
        r.doc_id
        for r in deterministic_sample(docs.repartition(13), 0.3).select("doc_id").collect()
    }
    assert ids1 == ids2
    assert 0.15 < len(ids1) / 300 < 0.45  # roughly the rate


def test_stratified_sample_quota_per_stratum(docs):
    out = stratified_sample(docs, "source", 7).groupBy("source").count().collect()
    assert {r.source: r["count"] for r in out} == {"web": 7, "chat": 7, "code": 7}


def test_stratified_sample_rank_deterministic(docs):
    a = stratified_sample(docs, "source", 5).orderBy("doc_id").collect()
    b = stratified_sample(docs.repartition(7), "source", 5).orderBy("doc_id").collect()
    assert [(r.doc_id, r.sample_rank) for r in a] == [(r.doc_id, r.sample_rank) for r in b]


def test_pack_sequences_offsets_and_bins(spark):
    df = spark.createDataFrame(
        [(1, "s", 100), (2, "s", 100), (3, "s", 100), (4, "t", 50)],
        "doc_id long, source string, n_tokens int",
    )
    out = {r.doc_id: r for r in pack_sequences(df, budget=256).collect()}
    assert (out[1].bin_offset, out[1].bin_id) == (0, 0)
    assert (out[2].bin_offset, out[2].bin_id) == (100, 0)
    assert (out[3].bin_offset, out[3].bin_id) == (200, 0)  # straddles, starts in bin 0
    assert (out[4].bin_offset, out[4].bin_id) == (0, 0)  # independent group


def test_pack_sequences_bin_advances(spark):
    df = spark.createDataFrame(
        [(i, "s", 100) for i in range(6)], "doc_id long, source string, n_tokens int"
    )
    bins = [r.bin_id for r in pack_sequences(df, budget=256).orderBy("doc_id").collect()]
    assert bins == [0, 0, 0, 1, 1, 1]  # offsets 0,100,200,300,400,500


def test_redact_pii(spark):
    from hatchery_spark.functions.text import redact_pii

    df = spark.createDataFrame(
        [("mail bob@corp.example.com from 10.0.3.7 card 4111111111111111 ok",)],
        "text string",
    )
    out = df.select(redact_pii(F.col("text")).alias("r")).first().r
    assert out == "mail <email> from <ip> card <longnum> ok"


def test_stratified_sample_null_keys_deterministic(spark):
    """NULL text must hash as md5('') (cross-engine stable) rather than
    relying on engine NULL-ordering defaults."""
    import hashlib

    from hatchery_spark.functions.sampling import stratified_sample

    rows = [(i, "s", None if i % 3 == 0 else f"text {i}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {(r.doc_id, r.sample_rank) for r in stratified_sample(df, "source", 5).collect()}
    # recompute expected order in Python with the same coalesce semantics
    def key(row):
        return (hashlib.md5((row[2] or "").encode()).hexdigest(), row[0])
    want = {(r[0], i + 1) for i, r in enumerate(sorted(rows, key=key)[:5])}
    assert got == want


def test_mixture_sample_rates_and_nesting(spark):
    """Per-source rates land near target; selection at a lower rate is a
    SUBSET of the higher-rate selection (nested samples)."""
    from hatchery_spark.functions.sampling import mixture_sample

    rows = [(i, "web" if i % 2 else "books", f"text number {i}") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    kept = mixture_sample(df, {"books": 1.0, "web": 0.25}).collect()
    books = [r.doc_id for r in kept if r.source == "books"]
    web = {r.doc_id for r in kept if r.source == "web"}
    assert len(books) == 1000                      # rate 1.0 keeps everything
    assert 150 <= len(web) <= 350                  # ~25% of 1000
    # nested: web at 0.1 ⊂ web at 0.25
    low = {r.doc_id for r in mixture_sample(df, {"books": 1.0, "web": 0.1}).collect()
           if r.source == "web"}
    assert low <= web
    # unknown source falls to default_rate=0.0 → dropped
    extra = spark.createDataFrame([(9999, "unknown", "zz")], "doc_id long, source string, text string")
    assert mixture_sample(extra, {"books": 1.0}).count() == 0


# ---------------------------------------------------------------- temperature


@pytest.fixture(scope="module")
def skewed_docs(spark):
    # 160 web / 40 chat / 10 code — skew makes the tempered rates distinct
    rows = [
        (i, f"document body {i} {i*7%13}", "web" if i < 160 else ("chat" if i < 200 else "code"))
        for i in range(210)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_temperature_alpha1_is_uniform_rate(skewed_docs):
    from hatchery_spark.functions.sampling import temperature_sample

    # alpha=1 preserves the natural mix: every source gets rate == target_frac
    out = temperature_sample(skewed_docs, alpha=1.0, target_frac=0.5)
    rates = {r.source: r.rate for r in out.select("source", "rate").distinct().collect()}
    assert all(abs(v - 0.5) < 1e-9 for v in rates.values()), rates


def test_temperature_alpha0_equalizes_quotas(skewed_docs):
    from hatchery_spark.functions.sampling import temperature_sample

    # alpha=0: every source's expected sampled COUNT is equal (rate ∝ 1/n_s)
    out = temperature_sample(skewed_docs, alpha=0.0, target_frac=0.3)
    rates = {r.source: r.rate for r in out.select("source", "rate").distinct().collect()}
    # expected per-source quota = 0.3 * 210 / 3 = 21 rows
    assert abs(rates["web"] - 21 / 160) < 1e-6
    assert abs(rates["chat"] - 21 / 40) < 1e-6
    assert rates["code"] == 1.0  # quota 21 > 10 rows -> capped


def test_temperature_rate_caps_at_one(skewed_docs):
    from hatchery_spark.functions.sampling import temperature_sample

    # huge target: small sources' quotas exceed their size -> rate capped at 1,
    # and every row of the capped source survives
    out = temperature_sample(skewed_docs, alpha=0.0, target_frac=0.9)
    code = out.filter(F.col("source") == "code")
    assert code.count() == 10
    assert all(r.rate == 1.0 for r in code.select("rate").distinct().collect())


def test_temperature_token_weight_budgets_mass_not_docs(spark):
    from hatchery_spark.functions.sampling import temperature_sample

    # web: 10 docs × 100 tokens; chat: 100 docs × 1 token. By DOC count chat
    # dominates (100 vs 10); by TOKEN mass web dominates (1000 vs 100). With
    # alpha=0 and weight=tokens, each source's expected sampled MASS is
    # frac·T_total/k, so rate_s = frac·T_total/(k·T_s).
    rows = [(i, " ".join(["tok"] * 100), "web") for i in range(10)]
    rows += [(100 + i, "tok", "chat") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    w = F.size(F.split(F.col("text"), r"\s+"))
    out = temperature_sample(df, alpha=0.0, target_frac=0.4, weight=w)
    rates = {r.source: r.rate for r in out.select("source", "rate").distinct().collect()}
    # T_total=1100, quota per source = 0.4*1100/2 = 220 token mass
    assert abs(rates["web"] - 220 / 1000) < 1e-6
    assert rates["chat"] == 1.0  # quota 220 > 100 available -> capped
    # doc-count budgeting would have given chat rate 22/100, not 1.0


def test_temperature_stable_under_repartition(skewed_docs):
    from hatchery_spark.functions.sampling import temperature_sample

    a = {r.doc_id for r in temperature_sample(skewed_docs, 0.5, 0.4).select("doc_id").collect()}
    b = {
        r.doc_id
        for r in temperature_sample(skewed_docs.repartition(17), 0.5, 0.4)
        .select("doc_id")
        .collect()
    }
    assert a == b and len(a) > 0


# ---------------------------------------------------------------- global shuffle


def test_shuffle_total_order_across_partitions(docs):
    from hatchery_spark.functions.sampling import shuffle_for_training

    sh = shuffle_for_training(docs, salt="ep1", num_partitions=5)
    parts = (
        sh.select(
            F.spark_partition_id().alias("pid"), "_shuffle_key"
        )
        .groupBy("pid")
        .agg(F.min("_shuffle_key").alias("lo"), F.max("_shuffle_key").alias("hi"))
        .orderBy("pid")
        .collect()
    )
    assert len(parts) > 1  # range partitioning actually split
    for prev, cur in zip(parts, parts[1:]):
        assert prev.hi <= cur.lo  # file k entirely precedes file k+1


def test_shuffle_order_stable_under_input_partitioning(docs):
    from hatchery_spark.functions.sampling import shuffle_for_training

    def order(df):
        rows = shuffle_for_training(df, salt="ep1").select("doc_id", "_shuffle_key").collect()
        return [r.doc_id for r in sorted(rows, key=lambda r: r._shuffle_key)]

    assert order(docs) == order(docs.repartition(23))


def test_shuffle_salt_changes_order(docs):
    from hatchery_spark.functions.sampling import shuffle_for_training

    def order(salt):
        rows = shuffle_for_training(docs, salt=salt).select("doc_id", "_shuffle_key").collect()
        return [r.doc_id for r in sorted(rows, key=lambda r: r._shuffle_key)]

    assert order("ep1") != order("ep2")  # new epoch, new permutation
    assert sorted(order("ep1")) == sorted(order("ep2"))  # same rows


def test_group_split_groups_are_atomic(spark):
    from hatchery_spark.functions.sampling import group_split

    rows = [(i, f"domain-{i % 40}") for i in range(400)] + [(1000, None), (1001, None)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = group_split(df, "source", {"train": 0.8, "val": 0.1, "test": 0.1})
    # every group maps to exactly one split (NULL forms its own group)
    per_group = (
        out.groupBy("source")
        .agg(F.countDistinct("split").alias("n"))
        .collect()
    )
    assert all(r.n == 1 for r in per_group)
    nulls = {r.split for r in out.filter(F.col("source").isNull()).collect()}
    assert len(nulls) == 1


def test_group_split_fractions_converge_and_salt_redraws(spark):
    from hatchery_spark.functions.sampling import group_split

    df = spark.createDataFrame(
        [(i, f"g{i}") for i in range(4000)], "doc_id long, source string"
    )
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = {
        r.split: r.n
        for r in group_split(df, "source", fr)
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert abs(got["train"] / 4000 - 0.8) < 0.03
    assert abs(got["val"] / 4000 - 0.1) < 0.02
    # a different salt reassigns a nontrivial share of groups
    a = group_split(df, "source", fr, salt="a").select("doc_id", "split")
    b = (
        group_split(df, "source", fr, salt="b")
        .select("doc_id", F.col("split").alias("split_b"))
    )
    moved = a.join(b, "doc_id").filter(F.col("split") != F.col("split_b")).count()
    assert moved > 200

    with pytest.raises(ValueError):
        group_split(df, "source", {"train": 0.5})
