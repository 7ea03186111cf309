"""Mojibake repair (sloppy-cp1252 ↔ UTF-8)."""

from __future__ import annotations

import pytest

from hatchery_spark.functions.encoding import (
    corrupt_mojibake,
    corrupt_mojibake_df,
    fix_mojibake,
    repair_mojibake_text,
    sloppy_cp1252_decode,
    sloppy_cp1252_encode,
)

SAMPLES = [
    "café résumé naïve",
    "price: 12 € — that's it",
    "quotes “like this” and ‘this’",
    "mixed ümlauts and ß and ñ",
    "plain ascii only",
    "",
]


@pytest.mark.parametrize("t", SAMPLES)
@pytest.mark.parametrize("layers", [1, 2, 3])
def test_repair_inverts_corruption(t, layers):
    got, rounds = repair_mojibake_text(corrupt_mojibake(t, layers))
    if any(ord(c) > 127 for c in t):
        assert got == t
        assert rounds == layers
    else:
        # ASCII is a fixed point of both directions
        assert got == t and rounds == 0


def test_healthy_text_untouched():
    for t in SAMPLES:
        got, rounds = repair_mojibake_text(t)
        assert (got, rounds) == (t, 0)


def test_classic_signatures():
    assert repair_mojibake_text("Ã©")[0] == "é"
    assert repair_mojibake_text("â‚¬")[0] == "€"
    assert repair_mojibake_text("â€™")[0] == "’"


def test_sloppy_codec_covers_all_bytes():
    data = bytes(range(256))
    s = sloppy_cp1252_decode(data)
    assert sloppy_cp1252_encode(s) == data
    # the five cp1252-undefined bytes round-trip through C1 code points
    for b in (0x81, 0x8D, 0x8F, 0x90, 0x9D):
        assert ord(sloppy_cp1252_decode(bytes([b]))) == b


def test_right_single_quote_double_mojibake():
    # U+201D's utf-8 contains 0x9D — the byte strict cp1252 cannot decode;
    # the sloppy codec must still invert a double corruption
    t = "he said —”— done"
    assert repair_mojibake_text(corrupt_mojibake(t, 2)) == (t, 2)


def test_distributed_repair(spark):
    rows = [(i, s, i % 3) for i, s in enumerate(SAMPLES * 3)]
    df = spark.createDataFrame(rows, "doc_id long, text string, times int")
    out = fix_mojibake(corrupt_mojibake_df(df)).collect()
    by_id = {r.doc_id: r for r in out}
    for i, s in enumerate(SAMPLES * 3):
        expect_rounds = i % 3 if any(ord(c) > 127 for c in s) else 0
        assert by_id[i].repaired == s
        assert by_id[i].rounds == expect_rounds
