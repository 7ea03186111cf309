"""Grok pattern-library compiler: %{NAME:field} templates → one-pass parse.

Logstash-style grok is the lingua franca of log parsing: a template like
``%{IPV4:ip} %{USER:ident} ... %{NUMBER:status}`` references a registry of
named sub-patterns and expands (recursively) into one big regex with named
captures. The reference reaches the same goal with per-source schema hints
(/root/reference/source/falcon_data_replicator/client.go:195-198 and the
per-SaaS source configs under /root/reference/source/); here the template IS
the per-source config, and the compiler turns it into a single codegen'd
parse stage.

Execution model (the 100 TB path): ONE ``regexp_extract(line, p, 0)`` pulls
the whole match — whole-stage codegen's subexpression elimination shares that
single regex evaluation across every derived field — then ``regexp_replace``
rewrites the short matched substring into a ␁-separated capture list and the
fields split out positionally (the same rewrite trick as
parse.multi_pattern_parse, generalized to N named fields with types). The
regex engine touches the full line exactly twice per row regardless of how
many fields the template binds; a naive per-field regexp_extract would touch
it F times. No Python anywhere.

Registry patterns are RE2-safe (no backrefs, no lookaround) so the exact same
compiled regex also replays in DuckDB oracles if ever needed there.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Core registry — the subset of logstash's grok-patterns base file that the
# shipped templates need, each rewritten RE2-safe. Sub-pattern references
# (%{NAME}) expand recursively at compile time.
GROK_PATTERNS: dict[str, str] = {
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "USER": r"[a-zA-Z0-9._-]+",
    "IPV4": r"(?:\d{1,3}\.){3}\d{1,3}",
    "MONTH": r"Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec",
    "MONTHDAY": r"(?:0[1-9]|[12]\d|3[01]|[1-9])",
    "YEAR": r"\d{4}",
    "TIME": r"\d{2}:\d{2}:\d{2}",
    "HTTPDATE": r"%{MONTHDAY}/%{MONTH}/%{YEAR}:%{TIME} %{ISO8601_TIMEZONE}",
    "ISO8601_TIMEZONE": r"(?:Z|[+-]\d{2}:?\d{2})",
    "HTTPMETHOD": r"GET|POST|PUT|DELETE|HEAD|OPTIONS|PATCH",
    "URIPATH": r"/[^\s?\"]*",
    "QUOTEDSTRING": r"\"[^\"]*\"",
    "LOGLEVEL": r"debug|info|warn|error|critical",
}

# The classic access-log templates, expressed over the registry exactly like
# logstash's COMMONAPACHELOG / COMBINEDAPACHELOG.
COMMONAPACHELOG = (
    '%{IPV4:clientip} %{USER:ident} %{USER:auth} \\[%{HTTPDATE:timestamp}\\] '
    '"%{HTTPMETHOD:verb} %{URIPATH:request} HTTP/%{NUMBER:httpversion}" '
    "%{INT:response} (?:%{INT:bytes}|-)"
)
COMBINEDAPACHELOG = (
    COMMONAPACHELOG + ' "%{DATA:referrer}" "%{DATA:agent}"'
)

_REF = re.compile(r"%\{(\w+)(?::(\w+))?\}")

# Group separator for the match → fields rewrite (cannot occur in log text —
# see parse._FIELD_SEP for the same invariant).
_SEP = "\x01"


def grok_compile(template: str, registry: dict[str, str] | None = None) -> tuple[str, list[str]]:
    """Expand a grok template into (regex, ordered field names).

    ``%{NAME:field}`` becomes a capturing group bound to ``field``;
    ``%{NAME}`` expands inline without capturing. Expansion is recursive
    (HTTPDATE references MONTHDAY/MONTH/...), depth-capped to fail fast on
    registry cycles. The emitted regex contains ONLY the template's own
    capture groups, in template order — that positional contract is what the
    rewrite trick in :func:`grok_parse` relies on.
    """
    reg = GROK_PATTERNS if registry is None else registry
    fields: list[str] = []

    def expand(t: str, depth: int) -> str:
        if depth > 10:
            raise ValueError("grok expansion too deep (registry cycle?)")

        def sub(m: re.Match) -> str:
            name, field = m.group(1), m.group(2)
            if name not in reg:
                raise KeyError(f"unknown grok pattern %{{{name}}}")
            body = expand(reg[name], depth + 1)
            if field:
                fields.append(field)
                return f"({body})"
            return f"(?:{body})"

        return _REF.sub(sub, t)

    pattern = expand(template, 0)
    if len(fields) != len(set(fields)):
        raise ValueError(f"duplicate grok field names in template: {fields}")
    return pattern, fields


def grok_parse(
    df: DataFrame,
    template: str,
    line_col: str = "line",
    types: dict[str, str] | None = None,
) -> DataFrame:
    """Append one column per grok field, parsed from ``line_col`` in one pass.

    ``types`` maps field → Spark cast type (e.g. ``{"response": "int"}``);
    unmapped fields stay strings. Unparseable lines yield NULL in every
    field (never dropped — the caller decides dead-lettering), and a
    ``_grok_matched`` boolean flags them for the dead-letter split.
    """
    pattern, fields = grok_compile(template)
    types = types or {}
    line = F.col(line_col)
    m = F.regexp_extract(line, pattern, 0)
    rewrite = _SEP.join(f"${i + 1}" for i in range(len(fields)))
    parts = F.split(F.regexp_replace(m, pattern, rewrite), _SEP)

    def field_col(i: int, name: str) -> Column:
        c = F.nullif(F.try_element_at(parts, F.lit(i + 1)), F.lit(""))
        t = types.get(name)
        return c.cast(t) if t else c

    out = df.withColumns({name: field_col(i, name) for i, name in enumerate(fields)})
    return out.withColumn("_grok_matched", m != "")


def render_access_log(df: DataFrame) -> DataFrame:
    """Render enriched transcript turns as Apache combined-log lines.

    The inverse of the parse — used by the e2e query so the oracle can pin
    BOTH directions from the source table (same contract as
    operators/syslog.py's render→parse pair). Byte layout:
    ``ip ident user [ts] "METHOD path HTTP/1.1" status bytes "ref" "ua"``.
    ``bytes`` renders ``-`` when NULL (the CLF dash), exercising the
    parser's dash alternative. Pure Project — codegen'd, zero shuffle.

    Expects columns: ip, ident, auth, ts, method, path, status, bytes,
    referrer, agent (referrer/agent WITHOUT surrounding quotes).
    """
    ts_str = F.concat(
        F.date_format("ts", "dd/MMM/yyyy:HH:mm:ss"), F.lit(" +0000")
    )
    return df.select(
        F.concat(
            F.col("ip"), F.lit(" "),
            F.col("ident"), F.lit(" "),
            F.col("auth"), F.lit(" ["),
            ts_str, F.lit('] "'),
            F.col("method"), F.lit(" "),
            F.col("path"), F.lit(" HTTP/1.1" + '" '),
            F.col("status").cast("string"), F.lit(" "),
            F.coalesce(F.col("bytes").cast("string"), F.lit("-")),
            F.lit(' "'), F.col("referrer"), F.lit('" "'),
            F.col("agent"), F.lit('"'),
        ).alias("line")
    )
