"""SPDX-style license fingerprint detection."""

from __future__ import annotations

from pyspark.sql import functions as F

from hatchery_spark.functions.license import LICENSE_SNIPPETS, detect_license

MIT = dict(LICENSE_SNIPPETS)["mit"]
GPL = dict(LICENSE_SNIPPETS)["gpl-3.0"]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_detects_planted_header(spark):
    rows = [
        (1, "// " + MIT + "\n actual code follows here for a while"),
        (2, "plain prose document with no license header at all " * 10),
    ]
    out = detect_license(_docs(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.doc_id, r.license) == (1, "mit")
    assert r.matched_shingles == r.license_shingles  # full header -> 100%


def test_normalization_survives_comment_markers(spark):
    # '#' prefixes, odd casing, punctuation changes: the fold erases them
    mangled = "\n".join("# " + ln.upper() for ln in GPL.split(". "))
    out = detect_license(_docs(spark, [(7, mangled)])).collect()
    assert [(r.doc_id, r.license) for r in out] == [(7, "gpl-3.0")]


def test_threshold_rejects_partial_match(spark):
    # only the first ~quarter of the MIT text: below the 80% bar
    partial = " ".join(MIT.split()[:14])
    out = detect_license(_docs(spark, [(3, partial + " other words follow")])).collect()
    assert out == []


def test_header_beyond_head_window_is_ignored(spark):
    padded = ("filler " * 130) + MIT
    out = detect_license(_docs(spark, [(4, padded)]), head_words=120).collect()
    assert out == []


def test_short_text_no_crash(spark):
    out = detect_license(_docs(spark, [(5, "tiny"), (6, "")])).collect()
    assert out == []


def test_license_side_is_broadcast(spark):
    plan = (
        detect_license(_docs(spark, [(1, MIT)]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
