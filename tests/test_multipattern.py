"""Aho–Corasick: overlap semantics, nested outputs, brute-force parity."""

import pytest

from hatchery_spark.functions.multipattern import (
    ac_count,
    build_ac,
    multi_pattern_counts,
)


def _brute(text, patterns):
    return [
        sum(
            1
            for i in range(len(text) - len(p) + 1)
            if text[i : i + len(p)] == p
        )
        for p in patterns
    ]


def _ac(text, patterns):
    goto, fail, ends = build_ac(patterns)
    return ac_count(text, goto, fail, ends, len(patterns))


def test_overlapping_matches_counted():
    assert _ac("aaaaa", ["aaa"]) == [3]
    assert _ac("ababab", ["abab"]) == [2]


def test_nested_patterns_via_fail_chain():
    pats = ["scan", "can", "an", "a"]
    assert _ac("scan", pats) == [1, 1, 1, 1]
    # the scan never leaves the 'scan' path — suffix outputs must fire
    assert _ac("xscanscan", pats) == [2, 2, 2, 2]


def test_brute_force_parity_on_adversarial_text():
    pats = ["ab", "ba", "aba", "bab", "abba", "aa", "b"]
    texts = [
        "abababababba",
        "aabbaabbabab",
        "bbbbbb",
        "a",
        "",
        "abbaabbaabba",
    ]
    for t in texts:
        assert _ac(t, pats) == _brute(t, pats), t


def test_empty_pattern_rejected():
    with pytest.raises(ValueError):
        build_ac(["ok", ""])


def test_spark_scan_matches_brute_force(spark):
    pats = ["an", "can", "scan", "na"]
    rows = [(1, "a scanner can scan bananas"), (2, "nothing here"), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.pattern): r.n_matches
        for r in multi_pattern_counts(df, pats).collect()
    }
    expect = {}
    for did, text in rows:
        for p, c in zip(pats, _brute(text or "", pats)):
            if c:
                expect[(did, p)] = c
    assert got == expect
