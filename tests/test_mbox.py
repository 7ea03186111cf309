"""mbox framing + quoted-printable + mboxrd munging."""

from __future__ import annotations

import pytest

from hatchery_spark.functions.mbox import (
    build_mbox_files,
    encode_mbox_message,
    fold_header,
    mboxrd_mung,
    mboxrd_unmung,
    parse_mbox,
    qp_decode,
    qp_encode,
    split_mbox,
)

ADVERSARIAL_BODIES = [
    "plain short body",
    "From the start this line is hostile",          # needs munging
    ">From already quoted\n>>From doubly quoted",   # mboxrd depth
    "line with trailing space \nand tab\t\nend",    # QP trailing-WSP rule
    "equals = signs == everywhere =3D fake escape",
    "unicode: naïve café — ünïcödé ✓",
    "x" * 300,                                      # soft wrap
    "ends with newline\n",
    "blank\n\nlines\n\n\ninside",
    "",
]


@pytest.mark.parametrize("body", ADVERSARIAL_BODIES)
def test_qp_roundtrip(body):
    enc = qp_encode(body)
    # canonical form: every encoded line fits 76 cols, no raw '='
    for ln in enc.split("\n"):
        assert len(ln) <= 76
    assert qp_decode(enc) == body


def test_qp_wrap_never_splits_escape():
    body = "é" * 100  # every char becomes =C3=A9
    enc = qp_encode(body)
    for ln in enc.split("\n"):
        stripped = ln[:-1] if ln.endswith("=") else ln
        # removing complete escapes leaves nothing containing '='
        import re

        assert "=" not in re.sub(r"=[0-9A-F]{2}", "", stripped)
    assert qp_decode(enc) == body


def test_munging_roundtrip():
    body = "From a\n>From b\n>>From c\nFrom: header-like\nnot From"
    assert mboxrd_unmung(mboxrd_mung(body)) == body
    # 'From:' (no space) is NOT a separator and must not be quoted
    assert "\n>From: header-like" not in mboxrd_mung(body)


def test_split_mbox_adversarial_bodies():
    blob = "".join(
        encode_mbox_message(f"m{i}@x", f"s{i}", f"u{i}@x", b)
        for i, b in enumerate(ADVERSARIAL_BODIES)
    )
    msgs = split_mbox(blob)
    assert len(msgs) == len(ADVERSARIAL_BODIES)
    for (idx, hdrs, body), expect in zip(msgs, ADVERSARIAL_BODIES):
        assert body == expect
        assert hdrs["message-id"] == f"<m{idx}@x>"


def test_header_folding_unfolds():
    subject = "word " * 40  # way past 78 cols
    folded = fold_header("Subject", subject.strip())
    assert all(len(ln) <= 78 for ln in folded.split("\n"))
    assert len(folded.split("\n")) > 1
    blob = encode_mbox_message("m@x", subject.strip(), "u@x", "body")
    (_, hdrs, body), = split_mbox(blob)
    assert hdrs["subject"] == subject.strip()
    assert body == "body"


def test_split_rejects_non_mbox():
    with pytest.raises(ValueError):
        split_mbox("not a mailbox at all")


def test_distributed_roundtrip(spark):
    docs = spark.createDataFrame(
        [(i, b) for i, b in enumerate(ADVERSARIAL_BODIES)],
        "doc_id long, text string",
    )
    out = parse_mbox(build_mbox_files(docs, files=3)).collect()
    assert len(out) == len(ADVERSARIAL_BODIES)
    by_id = {r.msg_id: r for r in out}
    for i, b in enumerate(ADVERSARIAL_BODIES):
        assert by_id[f"msg-{i}@example.com"].body == b
        assert by_id[f"msg-{i}@example.com"].sender == f"user{i}@example.com"
