"""SFT assembly: rendered documents + loss-mask span correctness."""

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def convs(spark):
    rows = [
        # conv a: system, user, assistant, user, assistant
        ("a", 0, "system", "be helpful"),
        ("a", 1, "user", "hi there"),
        ("a", 2, "assistant", "hello! how can I help?"),
        ("a", 3, "user", "what's 2+2"),
        ("a", 4, "assistant", "4"),
        # conv b: no assistant turn at all
        ("b", 0, "user", "ping"),
        ("b", 1, "tool", "pong"),
        # conv c: single assistant turn, first position
        ("c", 0, "assistant", "unprompted"),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )


def _rows(df):
    return {r.conv_id: r for r in df.collect()}


def test_spans_slice_exactly_the_assistant_texts(convs):
    from hatchery_spark.operators.sft import render_sft_documents

    out = _rows(render_sft_documents(convs))
    a = out["a"]
    spans = [tuple(map(int, s.split(":"))) for s in a.loss_spans.split(",")]
    assert [a.text[s:e] for s, e in spans] == ["hello! how can I help?", "4"]
    assert a.n_turns == 5 and a.n_loss_turns == 2
    assert a.n_chars == len(a.text)
    # every span char is inside the doc, spans don't overlap, ordered
    assert all(0 <= s < e <= len(a.text) for s, e in spans)
    assert all(e1 <= s2 for (_, e1), (s2, _) in zip(spans, spans[1:]))


def test_rendered_template_shape(convs):
    from hatchery_spark.operators.sft import render_sft_documents

    out = _rows(render_sft_documents(convs))
    assert out["b"].text == "<|user|>\nping\n<|tool|>\npong\n"
    assert out["b"].loss_spans == "" and out["b"].n_loss_turns == 0
    assert out["b"].loss_frac == 0.0
    c = out["c"]
    assert c.text == "<|assistant|>\nunprompted\n"
    s, e = map(int, c.loss_spans.split(":"))
    assert c.text[s:e] == "unprompted"


def test_loss_frac_is_loss_chars_over_total(convs):
    from hatchery_spark.operators.sft import render_sft_documents

    a = _rows(render_sft_documents(convs))["a"]
    expect = (len("hello! how can I help?") + len("4")) / len(a.text)
    assert abs(a.loss_frac - round(expect, 6)) < 1e-9


def test_order_stable_under_repartition(convs):
    from hatchery_spark.operators.sft import render_sft_documents

    base = {r.conv_id: r.text for r in render_sft_documents(convs).collect()}
    shuf = {
        r.conv_id: r.text
        for r in render_sft_documents(convs.repartition(7)).collect()
    }
    assert base == shuf


def test_custom_loss_role(convs):
    from hatchery_spark.operators.sft import render_sft_documents

    out = _rows(render_sft_documents(convs, loss_role="user"))
    a = out["a"]
    spans = [tuple(map(int, s.split(":"))) for s in a.loss_spans.split(",")]
    assert [a.text[s:e] for s, e in spans] == ["hi there", "what's 2+2"]


# -------------------------------------------------------- span corruption


def test_span_corruption_reconstructs_original(spark):
    """Splicing each target span back at its sentinel in inputs recovers
    the original lowercased token stream exactly — masking is lossless."""
    import re

    from hatchery_spark.functions.corpus import span_corruption

    rows = [(i, " ".join(f"w{i}x{j}" for j in range(25))) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in span_corruption(df).collect()}
    assert any(r.n_spans > 0 for r in out.values())   # masking actually fires
    for i, orig in rows:
        r = out[i]
        # parse targets: <extra_id_k> tok tok ... <extra_id_{n_spans}>
        spans = {}
        parts = re.split(r"<extra_id_(\d+)>", r.targets)
        labels = re.findall(r"<extra_id_(\d+)>", r.targets)
        assert labels[-1] == str(r.n_spans)            # terminator present
        chunks = parts[1:]  # alternating label, text
        for k_str, text in zip(chunks[0::2], chunks[1::2]):
            if int(k_str) < r.n_spans:
                spans[int(k_str)] = text.split()
        rebuilt = []
        for tok in r.inputs.split():
            m = re.fullmatch(r"<extra_id_(\d+)>", tok)
            rebuilt.extend(spans[int(m.group(1))] if m else [tok])
        assert rebuilt == orig.split(), i
        # sentinels appear in order 0..n_spans-1 exactly once in inputs
        sents = [int(m.group(1)) for m in
                 re.finditer(r"<extra_id_(\d+)>", r.inputs)]
        assert sents == list(range(r.n_spans))
