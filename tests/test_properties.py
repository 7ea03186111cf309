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


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5_000),
            st.floats(min_value=-1e6, max_value=1e6,
                      allow_nan=False, allow_infinity=False),
            st.floats(min_value=-1e6, max_value=1e6,
                      allow_nan=False, allow_infinity=False),
        ),
        min_size=1, max_size=25, unique_by=lambda r: r[0],
    )
)
def test_zorder_key_bounded_and_dominance_monotone(spark_prop, rows):
    """Z-keys stay inside [0, 4^bits); a point that dominates another in
    BOTH grid cells never gets a smaller Morton key (interleaving preserves
    per-dimension order)."""
    from hatchery_spark.sinks import zorder_values

    bits = 4
    df = spark_prop.createDataFrame(rows, "id long, x double, y double")
    out = zorder_values(df, ["x", "y"], bits=bits).collect()
    vals = {r.id: (r.x, r.y, r._zvalue) for r in out}
    assert all(0 <= z < (1 << (2 * bits)) for _, _, z in vals.values())
    n = 1 << bits
    xs = [r[1] for r in rows]
    ys = [r[2] for r in rows]
    lox, hix, loy, hiy = min(xs), max(xs), min(ys), max(ys)

    def cell(v, lo, hi):
        if hi == lo:
            return 0
        return min(n - 1, max(0, int(((v - lo) * float(n)) // (hi - lo))))

    for ia, (xa, ya, za) in vals.items():
        for ib, (xb, yb, zb) in vals.items():
            ca = (cell(xa, lox, hix), cell(ya, loy, hiy))
            cb = (cell(xb, lox, hix), cell(yb, loy, hiy))
            if ca[0] >= cb[0] and ca[1] >= cb[1]:
                assert za >= zb, (ia, ib)


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5_000),
            st.one_of(st.none(), st.text(alphabet="abcdef", max_size=6)),
        ),
        min_size=1, max_size=40, unique_by=lambda r: r[0],
    )
)
def test_group_split_total_partition_and_atomicity(spark_prop, rows):
    """Splits partition the corpus exactly (every row in exactly one split)
    and groups are atomic, for arbitrary group values including NULL."""
    import pyspark.sql.functions as F
    from hatchery_spark.functions.sampling import group_split

    df = spark_prop.createDataFrame(rows, "doc_id long, source string")
    out = group_split(df, "source", {"train": 0.7, "val": 0.2, "test": 0.1})
    rowsout = out.collect()
    assert len(rowsout) == len(rows)
    assert all(r.split in ("train", "val", "test") for r in rowsout)
    per_group = {}
    for r in rowsout:
        per_group.setdefault(r.source, set()).add(r.split)
    assert all(len(s) == 1 for s in per_group.values())


@settings(max_examples=12, deadline=None)
@given(st.lists(st.text(max_size=120), min_size=1, max_size=8))
def test_c4_clean_text_is_subsequence_of_kept_lines(spark_prop, texts):
    """clean_text is exactly the kept lines in original order, and counts
    always reconcile with the doc's line count — for arbitrary text."""
    from hatchery_spark.functions.corpus import c4_clean

    df = spark_prop.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    for r in c4_clean(df).collect():
        orig_lines = texts[r.doc_id].split("\n")
        assert r.kept_lines + r.dropped_lines == len(orig_lines)
        kept = r.clean_text.split("\n") if r.clean_text else []
        it = iter(orig_lines)
        assert all(any(k == o for o in it) for k in kept)  # ordered subseq
