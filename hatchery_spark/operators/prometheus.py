r"""Prometheus exposition-format render/parse (the text format every
metrics scraper speaks, per the public Prometheus exposition-format
docs): render per-(tool, role) turn counters as a metrics page —
``# HELP`` / ``# TYPE`` comment lines plus
``name{label="value",...} value timestamp`` samples — then parse ONLY
the page text back into (metric, labels, value, ts) rows.

Label-value escaping is the spec's three-character matrix (``\\``,
``\"``, ``\n`` — backslash first on encode, single-pass unescape on
decode); the HELP text takes the two-character variant (``\\``,
``\n``). Both directions are pure codegen: render is one concat
projection over an aggregated frame, parse is regexp_extract over
sample lines (comment lines filtered by prefix — a scraper must ignore
them). Sample timestamps are epoch millis, the exposition default.

Scale shape: the page is built from the ALREADY-AGGREGATED
(tool, role) frame — the only corpus-sized exchange is the counting
groupBy with map-side partials; render/parse add zero shuffles. One
page per tool keeps pages bounded (a real /metrics endpoint is
per-target); the explode back to lines is page-bounded fan-out.

Reference analog: hatchery's structured metrics emission
(logging/metrics wiring, pipeline.go) — here re-expressed as the
industry scrape format instead of ad-hoc counters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

METRIC = "hatchery_turns_total"
GAUGE = "hatchery_turn_chars"

_SAMPLE_RE = (
    r'^(\w+)\{tool="((?:[^"\\]|\\.)*)",role="((?:[^"\\]|\\.)*)"\} '
    r"(-?[0-9.]+) ([0-9]+)$"
)


def esc_label(v: Column) -> Column:
    """Prometheus label-value escaping: backslash, quote, newline."""
    v = F.replace(v, F.lit("\\"), F.lit("\\\\"))
    v = F.replace(v, F.lit('"'), F.lit('\\"'))
    return F.replace(v, F.lit("\n"), F.lit("\\n"))


def unesc_label(v: Column) -> Column:
    """Escaped backslashes park on a \\x00 sentinel first, so '\\\\n'
    (backslash + n) never collides with '\\n' (newline)."""
    v = F.replace(v, F.lit("\\\\"), F.lit("\x00"))
    v = F.replace(v, F.lit('\\"'), F.lit('"'))
    v = F.replace(v, F.lit("\\n"), F.lit("\n"))
    return F.replace(v, F.lit("\x00"), F.lit("\\"))


def render_metrics_page(turns: DataFrame, as_of_ms: int) -> DataFrame:
    """turns → one row per (tool) page: the exposition text with HELP /
    TYPE headers and one counter + one gauge sample per (tool, role)."""
    agg = turns.groupBy("tool", "role").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("text")).alias("chars"),
    )

    def sample(name: str, value: Column) -> Column:
        return F.concat(
            F.lit(name + '{tool="'), esc_label(F.col("tool")),
            F.lit('",role="'), esc_label(F.col("role")),
            F.lit('"} '), value.cast("string"),
            F.lit(f" {as_of_ms}"),
        )

    lines = agg.select(
        "tool",
        sample(METRIC, F.col("n")).alias("l1"),
        sample(GAUGE, F.col("chars")).alias("l2"),
    )
    page = lines.groupBy("tool").agg(
        F.array_sort(F.collect_list("l1")).alias("c_lines"),
        F.array_sort(F.collect_list("l2")).alias("g_lines"),
    )
    header = (
        f"# HELP {METRIC} Turns observed per tool and role.\n"
        f"# TYPE {METRIC} counter\n"
    )
    gheader = (
        f"# HELP {GAUGE} Total turn text characters.\n"
        f"# TYPE {GAUGE} gauge\n"
    )
    return page.select(
        "tool",
        F.concat(
            F.lit(header), F.array_join("c_lines", "\n"),
            F.lit("\n" + gheader), F.array_join("g_lines", "\n"),
            F.lit("\n"),
        ).alias("page"),
    )


def parse_metrics_page(df: DataFrame, page_col: str = "page") -> DataFrame:
    """pages → one row per sample: (metric, tool, role, value, ts_ms);
    comment lines are ignored, as a scraper must."""
    lines = df.select(
        F.explode(F.split(F.col(page_col), "\n")).alias("line")
    ).filter(
        (F.col("line") != "") & ~F.col("line").startswith("#")
    )
    return lines.select(
        F.regexp_extract("line", _SAMPLE_RE, 1).alias("metric"),
        unesc_label(F.regexp_extract("line", _SAMPLE_RE, 2)).alias("tool"),
        unesc_label(F.regexp_extract("line", _SAMPLE_RE, 3)).alias("role"),
        F.regexp_extract("line", _SAMPLE_RE, 4).cast("double").alias("value"),
        F.regexp_extract("line", _SAMPLE_RE, 5).cast("long").alias("ts_ms"),
    )


def prometheus_oracle_sql(transcripts_sql: str, as_of_ms: int) -> str:
    """DuckDB replay: the (tool, role) aggregates computed directly,
    one counter and one gauge row each — the page text never parsed."""
    return f"""
        WITH t AS ({transcripts_sql}),
        a AS (
          SELECT tool, role, count(*) AS n, sum(length(text)) AS chars
          FROM t GROUP BY tool, role
        )
        SELECT '{METRIC}' AS metric, tool, role,
               cast(n AS double) AS value, {as_of_ms} AS ts_ms FROM a
        UNION ALL
        SELECT '{GAUGE}', tool, role, cast(chars AS double), {as_of_ms}
        FROM a"""
