"""CEF framing: escape-path edge cases the fixture can't reach."""

from pyspark.sql import functions as F

from hatchery_spark.operators.cef import parse_cef, render_cef


def _roundtrip(spark, rows):
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    return parse_cef(render_cef(df).select("line")).collect()


def test_header_pipes_and_backslashes_survive(spark):
    # tool lands in BOTH product (header) and the Name — pipes and
    # backslashes in it must round-trip through the header escapes
    [r] = _roundtrip(spark, [("c-1", 0, "user", "plain text", "a|b\\c")])
    assert r.product == "a|b\\c"
    assert r.name == "op |a|b\\c| x\\"
    assert r.version == 0 and r.severity == 5 and r.sig_id == "freeform"


def test_extension_equals_and_spaces_survive(spark):
    text = "[error] actor=u=v@x action=login_event resource=doc:/r1 ip=1.2.3.4"
    [r] = _roundtrip(spark, [("c-2", 3, "tool", text, "idp")])
    assert r.msg == text                      # '=' escaped, spaces kept
    assert r.suser == "u=v@x"                 # value containing '='
    assert r.src == "1.2.3.4" and r.turn_idx == 3 and r.severity == 8


def test_freeform_rows_null_identity_keys(spark):
    [r] = _roundtrip(spark, [("c-3", 7, "user", "no audit here", "chat")])
    assert r.suser is None and r.src is None
    assert r.conv_id == "c-3" and r.turn_idx == 7 and r.msg == "no audit here"


def test_parse_is_single_stage(spark):
    df = spark.createDataFrame(
        [("c", 0, "user", "t", "w")],
        "conv_id string, turn_idx int, role string, text string, tool string",
    )
    plan = (
        parse_cef(render_cef(df).select("line"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "BatchEvalPython" not in plan
