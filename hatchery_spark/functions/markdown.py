"""Markdown → plain-text extraction.

GitHub/docs corpora arrive as Markdown; pretraining wants the prose with
markup stripped and code fences dropped (fences are handled by dedicated
code pipelines, and leaving them inline poisons prose quality signals).

The whole transform is ONE chain of regexp_replace expressions — pure
codegen, zero shuffle, zero Python — over a pattern table written in the
common subset of Java regex (Spark) and RE2 (DuckDB): no lookaround, no
backreferences in patterns, ASCII character classes only. The DuckDB
replay is GENERATED from the same table (``oracle_expr``), so Spark and
oracle cannot drift.

Chain order matters and is load-bearing: fences before anything (their
content must not leak into later rules), images before links (an image is
a link with a ``!`` prefix), bullets before hrules before emphasis (all
three compete for leading ``-``/``*``), whitespace collapse last.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (pattern, replacement-with-$1) — $1 is rewritten to \1 for RE2.
MD_CHAIN: list[tuple[str, str]] = [
    (r"```[^`]*```", ""),                    # fenced code blocks: drop
    (r"!\[([^\]]*)\]\(([^)]*)\)", "$1"),     # images -> alt text
    (r"\[([^\]]*)\]\(([^)]*)\)", "$1"),      # links -> anchor text
    (r"`([^`]*)`", "$1"),                    # inline code -> content
    (r"(^|\n)[ \t]*#{1,6}[ \t]*", "$1"),     # ATX headings
    (r"(^|\n)[ \t]*>[ \t]?", "$1"),          # blockquote markers
    (r"(^|\n)[ \t]*[-*+][ \t]+", "$1"),      # list bullets
    (r"(^|\n)-{3,}", "$1"),                  # horizontal rules
    (r"\*{1,3}([^*\n]+)\*{1,3}", "$1"),      # emphasis (asterisk form)
    (r"[ \t\r\n]+", " "),                    # whitespace collapse
]


def markdown_to_text(col: Column) -> Column:
    """Strip Markdown markup, drop code fences, collapse whitespace."""
    for pat, rep in MD_CHAIN:
        col = F.regexp_replace(col, pat, rep)
    return F.trim(col)


def oracle_expr(inner: str) -> str:
    """The identical chain as a DuckDB SQL expression over ``inner`` —
    generated from MD_CHAIN so the oracle replays byte-for-byte."""
    for pat, rep in MD_CHAIN:
        pat_sql = pat.replace("'", "''")
        rep_sql = rep.replace("$1", "\\1")
        inner = f"regexp_replace({inner}, '{pat_sql}', '{rep_sql}', 'g')"
    return f"trim({inner})"
