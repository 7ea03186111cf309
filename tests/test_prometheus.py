"""Prometheus exposition: escaping matrix, page shape, scraper tolerance."""

from pyspark.sql import functions as F

from hatchery_spark.operators.prometheus import (
    parse_metrics_page,
    render_metrics_page,
)

SCHEMA = "conv_id string, turn_idx int, role string, text string, tool string"


def _page(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return render_metrics_page(df, 1_000)


def test_page_has_help_type_and_samples(spark):
    [r] = _page(spark, [("c", 0, "user", "abc", "chat")]).collect()
    lines = r.page.splitlines()
    assert lines[0].startswith("# HELP hatchery_turns_total")
    assert lines[1] == "# TYPE hatchery_turns_total counter"
    assert 'hatchery_turns_total{tool="chat",role="user"} 1 1000' in lines
    assert 'hatchery_turn_chars{tool="chat",role="user"} 3 1000' in lines


def test_roundtrip_counts(spark):
    rows = [("c", i, "user" if i % 2 else "tool", "xy", "chat")
            for i in range(6)]
    out = parse_metrics_page(_page(spark, rows).select("page")).collect()
    got = {(r.metric, r.role): r.value for r in out}
    assert got[("hatchery_turns_total", "user")] == 3.0
    assert got[("hatchery_turn_chars", "tool")] == 6.0
    assert all(r.ts_ms == 1000 for r in out)


def test_label_escaping_matrix(spark):
    evil = 'a"b\\c\nd'          # quote, backslash, newline
    rows = [("c", 0, evil, "t", 'x\\ny')]   # role and tool both hostile
    out = parse_metrics_page(_page(spark, rows).select("page")).collect()
    assert {r.role for r in out} == {evil}
    assert {r.tool for r in out} == {"x\\ny"}   # backslash-n stays two chars


def test_comment_and_blank_lines_ignored(spark):
    df = spark.createDataFrame(
        [("# HELP x y\n# TYPE x counter\n\n"
          'hatchery_turns_total{tool="a",role="b"} 2 5\n',)],
        "page string",
    )
    out = parse_metrics_page(df).collect()
    assert len(out) == 1 and out[0].value == 2.0 and out[0].ts_ms == 5


def test_parse_is_codegen_only(spark):
    page = _page(spark, [("c", 0, "user", "abc", "chat")]).select("page")
    plan = (
        parse_metrics_page(page)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
