"""FIM restructuring (Bavarian 2207.14255) and CCNet perplexity bucketing
(Wenzek 1911.00359 §4.3)."""

import re

import pyspark.sql.functions as F
import pytest

from hatchery_spark.functions.corpus import ccnet_bucket_mix, fim_transform

_PSM = re.compile(r"^<PRE>(.*)<SUF>(.*)<MID>(.*)$", re.DOTALL)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"doc {i} body with some words " * (1 + i % 3), ["en", "de"][i % 2])
        for i in range(40)
    ] + [(100, None, "en"), (101, "", "en"), (102, "x", "en")]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_fim_psm_reassembles_to_original(docs):
    out = {r.doc_id: r for r in fim_transform(docs).collect()}
    originals = {r.doc_id: r.text or "" for r in docs.collect()}
    n_psm = 0
    for doc_id, row in out.items():
        if row.mode == "plain":
            assert row.fim_text == originals[doc_id]
            continue
        n_psm += 1
        m = _PSM.match(row.fim_text)
        assert m, row.fim_text
        pre, suf, mid = m.groups()
        assert pre + mid + suf == originals[doc_id]
    # ~50% gate on the 40 eligible docs; degenerate docs are always plain
    assert 8 <= n_psm <= 32
    assert out[100].mode == "plain" and out[100].fim_text == ""
    assert out[102].mode == "plain" and out[102].fim_text == "x"


def test_fim_deterministic(docs):
    a = sorted(map(tuple, fim_transform(docs).collect()))
    b = sorted(map(tuple, fim_transform(docs.repartition(7)).collect()))
    assert a == b


def test_ccnet_tertiles_ordered_and_balanced(docs):
    out = ccnet_bucket_mix(
        docs.filter(F.col("text").isNotNull() & (F.length("text") >= 2)),
        ref_filter=F.col("doc_id") % 10 == 0,
    ).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    assert set(by_lang) == {"en", "de"}
    for lang, rows in by_lang.items():
        buckets = {}
        for r in rows:
            buckets.setdefault(r.bucket, []).append(r)
        assert set(buckets) == {"head", "middle", "tail"}
        sizes = [len(buckets[b]) for b in ("head", "middle", "tail")]
        assert max(sizes) - min(sizes) <= 1  # ntile balance
        assert max(r.bits_per_char for r in buckets["head"]) <= min(
            r.bits_per_char for r in buckets["tail"]
        )
        # head rate is 1.0 → every head doc kept
        assert all(r.kept for r in buckets["head"])
