"""TCP stream reassembly (operators/tcpstream.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hatchery_spark.operators.tcpstream import (
    reassemble_streams,
    segment_streams,
)


def _segs(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, seq long, payload string"
    )


def _one(out, cid):
    return [r for r in out.collect() if r["conv_id"] == cid][0]


def test_in_order_clean_flow(spark):
    out = reassemble_streams(
        _segs(spark, [("f", 0, "abcd"), ("f", 4, "efgh"), ("f", 8, "ij")])
    )
    r = _one(out, "f")
    assert r["stream"] == "abcdefghij"
    assert r["complete"] and r["n_redundant"] == 0
    assert r["stream_len"] == 10 and r["n_segments"] == 3


def test_out_of_order_and_exact_retransmit(spark):
    out = reassemble_streams(
        _segs(
            spark,
            [("f", 4, "efgh"), ("f", 0, "abcd"), ("f", 4, "efgh"),
             ("f", 8, "ij")],
        )
    )
    r = _one(out, "f")
    assert r["stream"] == "abcdefghij"
    assert r["complete"] and r["n_redundant"] == 1


def test_overlapping_retransmit_trimmed_to_tail(spark):
    # second segment re-sends bytes 4..7 plus new bytes 8..11
    out = reassemble_streams(
        _segs(spark, [("f", 0, "abcdefgh"), ("f", 4, "efghIJKL")])
    )
    r = _one(out, "f")
    assert r["stream"] == "abcdefghIJKL"
    assert r["complete"] and r["n_redundant"] == 0


def test_contained_segment_is_redundant(spark):
    # a short retransmit entirely inside already-covered bytes
    out = reassemble_streams(
        _segs(spark, [("f", 0, "abcdefgh"), ("f", 2, "cde")])
    )
    r = _one(out, "f")
    assert r["stream"] == "abcdefgh"
    assert r["n_redundant"] == 1 and r["complete"]


def test_hole_dead_letters_but_emits_bytes(spark):
    out = reassemble_streams(
        _segs(spark, [("f", 0, "abcd"), ("f", 8, "ijkl")])
    )
    r = _one(out, "f")
    assert not r["complete"]
    assert r["stream"] == "abcdijkl"  # bytes it has, gap flagged


def test_duplicate_seq_longest_wins_front(spark):
    # two segments at seq 0; the longer one must own the front so the
    # shorter is pure-redundant, not a truncation
    out = reassemble_streams(
        _segs(spark, [("f", 0, "ab"), ("f", 0, "abcdef")])
    )
    r = _one(out, "f")
    assert r["stream"] == "abcdef" and r["n_redundant"] == 1


def test_flows_independent(spark):
    out = reassemble_streams(
        _segs(
            spark,
            [("a", 0, "xy"), ("b", 0, "12"), ("b", 2, "34"),
             ("a", 2, "z")],
        )
    )
    assert _one(out, "a")["stream"] == "xyz"
    assert _one(out, "b")["stream"] == "1234"


def test_segmentation_roundtrip_on_synthetic_flows(spark):
    # long texts exercise multi-segment flows through every planted gate;
    # every hole-free flow must reassemble to its exact original text
    conv = spark.createDataFrame(
        [(f"c{i}", f"c{i}:" + "".join(
            chr(97 + (i * 7 + j) % 26) for j in range(50 + 37 * i)
        )) for i in range(40)],
        "conv_id string, conv_text string",
    )
    segs = segment_streams(conv)
    out = reassemble_streams(segs).join(conv, "conv_id")
    rows = out.select(
        "conv_id", "complete", "n_redundant",
        (F.col("stream") == F.col("conv_text")).alias("ok"),
    ).collect()
    assert len(rows) == 40
    complete = [r for r in rows if r["complete"]]
    assert complete, "gates should leave most flows hole-free"
    assert all(r["ok"] for r in complete)
    holed = [r for r in rows if not r["complete"]]
    # md5 flow gate plants holes on ~1/10 of flows; with 40 flows the
    # planted-hole branch must actually fire
    assert holed, "hole gate never fired — planting broken"
    assert any(r["n_redundant"] > 0 for r in rows), "dup gate never fired"
