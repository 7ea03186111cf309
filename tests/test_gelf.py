"""GELF chunked-datagram framing: byte layout, reassembly, loss paths."""

from pyspark.sql import functions as F

from hatchery_spark.operators.gelf import (
    drop_lost_chunks,
    parse_gelf,
    render_gelf,
)

SCHEMA = "conv_id string, turn_idx int, role string, text string, tool string"


def _turns(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_single_datagram_is_bare_json(spark):
    df = _turns(spark, [("c-1", 0, "user", "short", "chat")])
    [r] = render_gelf(df, chunk_bytes=512).collect()
    assert bytes(r.frame)[:1] == b"{"          # no chunk header
    assert r._n == 1 and r._seq is None
    [p] = parse_gelf(render_gelf(df, chunk_bytes=512).select("frame")).collect()
    assert p.msg_id is None and p.complete and p.n_chunks == 1
    assert p.short_message == "short" and p.conv_id == "c-1" and p.turn_idx == 0


def test_chunk_header_layout_and_reassembly(spark):
    text = "[warn] " + "x" * 400                # forces multiple chunks
    df = _turns(spark, [("c-2", 3, "tool", text, "edr")])
    frames = render_gelf(df).orderBy("_seq").collect()
    assert len(frames) > 2
    for i, r in enumerate(frames):
        b = bytes(r.frame)
        assert b[:2] == b"\x1e\x0f"             # magic
        assert b[10] == i                        # seq byte
        assert b[11] == len(frames)              # count byte
    # payload bytes concatenate back to the exact JSON template
    payload = b"".join(bytes(r.frame)[12:] for r in frames).decode()
    assert payload.startswith('{"version":"1.1","host":"agent-edr"')
    [p] = parse_gelf(render_gelf(df).select("frame")).collect()
    assert p.complete and p.n_chunks == len(frames)
    assert p.short_message == text and p.level == 4
    assert p.conv_id == "c-2" and p.turn_idx == 3


def test_lost_chunk_dead_letters_without_leaking_fields(spark):
    text = "[error] " + "y" * 300
    df = _turns(spark, [("c-3", 7, "user", text, "idp"),   # 7 % 50 == 7 → lost
                        ("c-4", 8, "user", text, "idp")])  # kept
    out = {r.turn_idx: r
           for r in parse_gelf(drop_lost_chunks(render_gelf(df))).collect()}
    lost = [r for r in out.values() if not r.complete]
    assert len(lost) == 1 and lost[0].short_message is None \
        and lost[0].conv_id is None and lost[0].msg_id is not None
    assert out[8].complete and out[8].short_message == text


def test_duplicate_chunk_does_not_fake_completeness(spark):
    text = "[info] " + "z" * 300
    df = _turns(spark, [("c-5", 7, "user", text, "chat")])
    frames = drop_lost_chunks(render_gelf(df))          # seq=1 gone
    dup = frames.limit(1)                               # re-deliver seq=0
    [p] = parse_gelf(frames.unionByName(dup)).collect()
    assert not p.complete                               # count matches, seq gapped


def test_parse_has_single_exchange(spark):
    df = _turns(spark, [("c", 0, "user", "[info] " + "a" * 300, "w")])
    plan = (
        parse_gelf(render_gelf(df).select("frame"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") <= 2          # partial+final agg of ONE groupBy
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
