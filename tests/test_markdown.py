"""Markdown → plain-text extraction."""

from __future__ import annotations

from pyspark.sql import functions as F

from hatchery_spark.functions.markdown import markdown_to_text, oracle_expr


def _extract(spark, md: str) -> str:
    return spark.range(1).select(markdown_to_text(F.lit(md)).alias("t")).collect()[0].t


def test_full_document(spark):
    md = (
        "## Install\n\nRun `pip install x` then see "
        "[the docs](https://d.example/a) and ![badge](b.svg).\n\n"
        "```python\nprint('# not a heading')\n```\n\n"
        "- first\n* second\n+ third\n\n---\n\n> *quoted* tail"
    )
    assert _extract(spark, md) == (
        "Install Run pip install x then see the docs and badge. "
        "first second third quoted tail"
    )


def test_fence_content_never_leaks(spark):
    md = "before\n```\n[link](x) **bold** # head\n```\nafter"
    assert _extract(spark, md) == "before after"


def test_image_before_link_ordering(spark):
    # if links ran first, the image would degrade to '!alt'
    assert _extract(spark, "![alt text](u.png)") == "alt text"


def test_underscores_and_plain_text_untouched(spark):
    assert _extract(spark, "snake_case_name stays 3*4 intact") == (
        "snake_case_name stays 3*4 intact"
    )


def test_oracle_expr_is_generated_from_same_chain(spark):
    import duckdb

    md = "# H\n\n**b** [t](u) `c`\n\n```\nzap\n```\n\n> q"
    got_spark = _extract(spark, md)
    q = f"SELECT {oracle_expr('md')} AS t FROM (SELECT ? AS md)"
    got_duck = duckdb.connect().execute(q, [md]).fetchone()[0]
    assert got_spark == got_duck == "H b t c q"
