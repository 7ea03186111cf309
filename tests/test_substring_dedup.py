"""ExactSubstr span dedup: brute-force parity, self-repeats, edge cases."""

import pytest


def _brute(rows, k):
    """Reference implementation: remove the union of [i, i+k) spans whose
    k-gram occurs >= 2 times across the corpus (1-based i)."""
    from collections import Counter

    counts = Counter()
    for _, t in rows:
        for i in range(len(t) - k + 1):
            counts[t[i : i + k]] += 1
    out = {}
    for d, t in rows:
        covered = [False] * len(t)
        for i in range(len(t) - k + 1):
            if counts[t[i : i + k]] >= 2:
                for j in range(i, i + k):
                    covered[j] = True
        cleaned = "".join(c for c, cov in zip(t, covered) if not cov)
        # islands = maximal covered runs
        islands = 0
        prev = False
        for cov in covered:
            if cov and not prev:
                islands += 1
            prev = cov
        out[d] = (cleaned, islands, sum(covered))
    return out


@pytest.fixture(scope="module")
def planted(spark):
    shared = "THIS LICENSE TEXT IS COPIED VERBATIM EVERYWHERE"  # 47 chars
    rows = [
        (1, f"unique preamble one {shared} unique tail one"),
        (2, f"a different start {shared} and a different end"),
        (3, "totally original content with no repeats at all here"),
        (4, "shorty"),  # < k: untouched
        (5, "ABCDEFGHIJKLMNOPQRSTUV" * 2),  # self-repeat inside one doc
    ]
    return rows, spark.createDataFrame(rows, "doc_id long, text string")


def test_matches_brute_force(planted):
    from hatchery_spark.functions.dedup import remove_duplicate_substrings

    rows, df = planted
    k = 20
    expect = _brute(rows, k)
    got = {
        r.doc_id: (r.text, r.n_islands, r.n_removed)
        for r in remove_duplicate_substrings(df, k=k).collect()
    }
    assert got == expect


def test_shared_span_removed_from_all_occurrences(planted):
    from hatchery_spark.functions.dedup import remove_duplicate_substrings

    _, df = planted
    got = {r.doc_id: r for r in remove_duplicate_substrings(df, k=20).collect()}
    assert "LICENSE" not in got[1].text and "LICENSE" not in got[2].text
    assert got[1].text.startswith("unique preamble one")
    assert got[3].text.endswith("at all here") and got[3].n_removed == 0
    assert got[4].text == "shorty" and got[4].n_islands == 0
    # self-repeat: every position of doc 5 is covered (period-22 repeat)
    assert got[5].text == "" and got[5].n_islands == 1


def test_removed_count_equals_length_delta(planted):
    from hatchery_spark.functions.dedup import remove_duplicate_substrings

    rows, df = planted
    orig = dict(rows)
    for r in remove_duplicate_substrings(df, k=20).collect():
        assert len(orig[r.doc_id]) - len(r.text) == r.n_removed


def test_stable_under_repartition(planted):
    from hatchery_spark.functions.dedup import remove_duplicate_substrings

    _, df = planted
    a = sorted(map(tuple, remove_duplicate_substrings(df, k=20).collect()))
    b = sorted(
        map(tuple, remove_duplicate_substrings(df.repartition(13), k=20).collect())
    )
    assert a == b


def test_gram_hash_variants_identical_output(spark):
    from hatchery_spark.functions.dedup import remove_duplicate_substrings

    docs = [
        (0, "the quick brown fox jumps over the lazy dog near the river bank"),
        (1, "a duplicated span lives here: the quick brown fox jumps over it"),
        (2, "completely unique text without any repeated twenty gram at all"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    md = sorted(remove_duplicate_substrings(df, k=20).collect())
    xx = sorted(
        remove_duplicate_substrings(df, k=20, gram_hash="xxhash64").collect()
    )
    assert md == xx

    import pytest
    with pytest.raises(ValueError):
        remove_duplicate_substrings(df, gram_hash="sha1")


def test_doc_scope_only_excises_within_document_repeats(spark):
    from hatchery_spark.functions.dedup import remove_duplicate_substrings

    shared = "this exact twenty char span X"  # appears in docs 0 AND 1 once each
    docs = [
        (0, f"prefix one {shared} suffix one"),
        (1, f"prefix two {shared} suffix two"),
        (2, "repeat me now! repeat me now! tail"),  # repeats WITHIN doc 2
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    corpus = {r.doc_id: r for r in
              remove_duplicate_substrings(df, k=15).collect()}
    within = {r.doc_id: r for r in
              remove_duplicate_substrings(df, k=15, scope="doc").collect()}

    # cross-doc shared span: excised under corpus scope, kept under doc scope
    assert corpus[0].n_removed > 0 and corpus[1].n_removed > 0
    assert within[0].n_removed == 0 and within[0].text == docs[0][1]
    assert within[1].n_removed == 0
    # within-doc repeat: excised under BOTH scopes
    assert corpus[2].n_removed > 0 and within[2].n_removed > 0

    import pytest
    with pytest.raises(ValueError):
        remove_duplicate_substrings(df, scope="paragraph")


@pytest.mark.parametrize("dup_filter", ["broadcast", "join"])
def test_fast_variant_matches_positional(planted, dup_filter):
    """Vectorized two-pass form == positional-explode form, on both the
    broadcast and the join global-filter paths."""
    from hatchery_spark.functions.dedup import (
        remove_duplicate_substrings,
        remove_duplicate_substrings_fast,
    )

    rows, df = planted
    k = 20
    want = {
        r.doc_id: (r.text, r.n_islands, r.n_removed)
        for r in remove_duplicate_substrings(df, k=k).collect()
    }
    got = {
        r.doc_id: (r.text, r.n_islands, r.n_removed)
        for r in remove_duplicate_substrings_fast(
            df, k=k, dup_filter=dup_filter
        ).collect()
    }
    assert got == want


def test_fast_variant_random_corpus_and_scopes(spark):
    """Messier corpus (overlapping plants, adjacency, unicode, NULL text,
    repartition) — fast == positional for corpus AND doc scope."""
    import random

    from hatchery_spark.functions.dedup import (
        remove_duplicate_substrings,
        remove_duplicate_substrings_fast,
    )

    rng = random.Random(3)
    alpha = "abcdé ∂"
    plants = ["".join(rng.choice(alpha) for _ in range(25)) for _ in range(4)]
    rows = []
    for i in range(40):
        t = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 80)))
        for p in plants:
            if rng.random() < 0.3:
                cut = rng.randint(0, len(t))
                t = t[:cut] + p + t[cut:]
        rows.append((i, t))
    rows.append((98, rows[5][1]))      # whole-doc duplicate
    rows.append((99, None))            # NULL text stays NULL
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(7)

    for scope, kk in (("corpus", 12), ("doc", 8)):
        want = {
            r.doc_id: (r.text, r.n_islands, r.n_removed)
            for r in remove_duplicate_substrings(df, k=kk, scope=scope).collect()
        }
        got = {
            r.doc_id: (r.text, r.n_islands, r.n_removed)
            for r in remove_duplicate_substrings_fast(df, k=kk, scope=scope).collect()
        }
        assert got == want, scope


def test_fast_variant_auto_overflow_falls_to_join(spark):
    """dup_filter='auto' with a tiny broadcast_cap must take the join path
    and still match."""
    from hatchery_spark.functions.dedup import (
        remove_duplicate_substrings,
        remove_duplicate_substrings_fast,
    )

    rows = [(i, "SHARED-BOILERPLATE-SPAN-" + str(i % 2) * 5) for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    want = {
        r.doc_id: r.text for r in remove_duplicate_substrings(df, k=10).collect()
    }
    got = {
        r.doc_id: r.text
        for r in remove_duplicate_substrings_fast(
            df, k=10, broadcast_cap=1
        ).collect()
    }
    assert got == want
