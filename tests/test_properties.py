"""Property-based tests (hypothesis): the parse stage must be total and agree
with an independent Python re implementation on arbitrary text, and routing
must be a partition-stable multiset regardless of shuffle partitioning."""

import re

import pandas as pd
from hypothesis import given, settings, strategies as st

from hatchery_spark.parse import AUDIT_PATTERN_NAMED, parse_turns

_RE = re.compile(AUDIT_PATTERN_NAMED)

# arbitrary printable text, plus adversarial near-matches
text_strategy = st.one_of(
    st.text(min_size=0, max_size=200),
    st.from_regex(r"\[(debug|info|warn|error|critical)\] actor=\S{1,10} action=\S{1,10} resource=\S{1,10}", fullmatch=True),
    st.from_regex(r"\[[a-z]{1,8}\] actor=.{0,5}", fullmatch=False),
)


@settings(max_examples=30, deadline=None)
@given(st.lists(text_strategy, min_size=1, max_size=30))
def test_parse_total_and_matches_python_re(spark_prop, texts):
    spark = spark_prop
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    out = {r.i: r for r in parse_turns(df).collect()}
    for i, t in enumerate(texts):
        m = _RE.search(t)
        row = out[i]
        if m:
            assert row.severity == m.group("severity"), t
            assert row.actor == m.group("actor")
            assert row.action == m.group("action")
            assert row.resource == m.group("resource")
        else:
            assert row.severity is None and row.actor is None, t


# module-scoped spark alias for hypothesis (function-scoped fixture would
# re-enter the session fixture per example)
import pytest  # noqa: E402


@pytest.fixture(scope="module")
def spark_prop(spark):
    return spark


doc_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),  # doc_id (may collide)
        st.text(min_size=0, max_size=60),
        st.sampled_from(["a", "b", "c"]),
        st.integers(min_value=0, max_value=500),  # n_tokens
    ),
    min_size=1, max_size=25, unique_by=lambda r: r[0],
)


@settings(max_examples=15, deadline=None)
@given(doc_strategy)
def test_sampling_monotone_and_packing_invariants(spark_prop, rows):
    from hatchery_spark.functions.sampling import deterministic_sample, pack_sequences

    spark = spark_prop
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_tokens int"
    )
    # monotone: a lower rate selects a subset of a higher rate's rows
    low = {r.doc_id for r in deterministic_sample(df, 0.2).collect()}
    high = {r.doc_id for r in deterministic_sample(df, 0.7).collect()}
    assert low <= high

    # packing: offset == prior token sum in id order per group; bins consistent
    packed = pack_sequences(df, budget=100)
    by_group = {}
    for r in sorted(packed.collect(), key=lambda r: (r.source, r.doc_id)):
        expect = by_group.get(r.source, 0)
        assert r.bin_offset == expect, r
        assert r.bin_id == r.bin_offset // 100
        by_group[r.source] = expect + r.n_tokens


@settings(max_examples=15, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=80), min_size=1, max_size=10))
def test_redact_pii_idempotent(spark_prop, texts):
    import pyspark.sql.functions as F
    from hatchery_spark.functions.text import redact_pii

    spark = spark_prop
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    once = df.select("i", redact_pii(F.col("text")).alias("r"))
    twice = once.select("i", redact_pii(F.col("r")).alias("r"))
    assert {(r.i, r.r) for r in once.collect()} == {(r.i, r.r) for r in twice.collect()}


# ------------------------------------------------------- round-3 operators

ws_text = st.text(
    alphabet=st.sampled_from(list("ab ") + ["\t", "\n"]), min_size=0, max_size=80
)


@settings(max_examples=25, deadline=None)
@given(st.lists(ws_text, min_size=1, max_size=12))
def test_chunking_covers_every_token_in_order(spark_prop, texts):
    """Stripping the overlap from chunks 2..k and concatenating restores the
    doc's exact token sequence — no token lost or duplicated, any text."""
    from hatchery_spark.functions.corpus import chunk_documents
    import re as _re

    spark = spark_prop
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    chunk, overlap = 7, 3
    rows = chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, t in enumerate(texts):
        toks = _re.split(r"\s+", t) if t else [""]
        got = []
        for r in sorted(by_doc[i], key=lambda r: r.chunk_idx):
            ctoks = r.chunk_text.split(" ") if r.chunk_text != "" else [""]
            got.extend(ctoks if r.chunk_idx == 0 else ctoks[overlap:])
        assert got == toks, (t, got, toks)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(st.text(min_size=0, max_size=40), min_size=1, max_size=15),
    st.sampled_from([0.1, 0.3, 0.6]),
    st.sampled_from([0.7, 0.9, 1.0]),
)
def test_mixture_nesting_property(spark_prop, texts, low, high):
    """For ANY corpus and any low < high: kept(low) ⊆ kept(high)."""
    from hatchery_spark.functions.sampling import mixture_sample

    spark = spark_prop
    df = spark.createDataFrame(
        [(i, "s", t) for i, t in enumerate(texts)],
        "doc_id long, source string, text string",
    )
    lo = {r.doc_id for r in mixture_sample(df, {"s": low}).collect()}
    hi = {r.doc_id for r in mixture_sample(df, {"s": high}).collect()}
    assert lo <= hi
