r"""logfmt encode/decode (the key=value telemetry line format).

The second wire format hatchery-style collectors meet everywhere
(alongside syslog/JSON): space-separated ``key=value`` pairs where any
value containing a space or quote is double-quoted with ``\"`` and
``\\`` escapes (Go logfmt / Heroku dialect).  Reference analog: the
free-form message decode in the per-source configs (source/*/).

Both directions are pure codegen:

* **encode** — conditional quoting via a single ``when`` on the
  need-quote character class, escapes as two literal ``replace`` calls
  (backslash first).
* **decode** — one regex captures every pair twice
  (``regexp_extract_all`` once for keys, once for raw values), the two
  arrays zip into a ``MAP<STRING,STRING>``, quoted values unescape with
  a single-pass ``regexp_replace('\\(.)' → '$1')``.  Field access is
  ``try_element_at`` on the map, so pair order on the wire is
  irrelevant and unknown keys are ignored — exactly the tolerant-reader
  posture a 100 TB ingest needs.

The oracle computes every output field directly from the source table;
a bug in either quoting or unquoting breaks value equality.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PAIR_RE = r'(\w+)=("(?:[^"\\]|\\.)*"|[^ ]*)'


def logfmt_escape(v: Column) -> Column:
    """Quote + escape a value unconditionally (used for fields that can
    contain spaces)."""
    v = F.replace(v, F.lit("\\"), F.lit("\\\\"))
    v = F.replace(v, F.lit('"'), F.lit('\\"'))
    return F.concat(F.lit('"'), v, F.lit('"'))


def logfmt_value(v: Column) -> Column:
    """Go-logfmt conditional quoting: bare unless the value contains a
    space, quote, backslash, or equals sign."""
    return F.when(v.rlike(r'[ "\\=]'), logfmt_escape(v)).otherwise(v)


def render_logfmt(df: DataFrame, fields: list[tuple[str, Column]]) -> DataFrame:
    """Add a ``line`` column: ``k1=v1 k2=v2 …`` with per-value
    conditional quoting."""
    parts: list[Column] = []
    for key, col in fields:
        if parts:
            parts.append(F.lit(" "))
        parts.append(F.lit(key + "="))
        parts.append(logfmt_value(col.cast("string")))
    return df.withColumn("line", F.concat(*parts))


def parse_logfmt(df: DataFrame, line_col: str = "line") -> DataFrame:
    """Add a ``kv`` MAP<STRING,STRING> column of the decoded pairs."""
    line = F.col(line_col)
    keys = F.regexp_extract_all(line, F.lit(_PAIR_RE), F.lit(1))
    raw = F.regexp_extract_all(line, F.lit(_PAIR_RE), F.lit(2))
    vals = F.transform(
        raw,
        lambda v: F.when(
            v.startswith('"'),
            F.regexp_replace(
                F.substring(v, 2, F.length(v) - 2), r"\\(.)", "$1"
            ),
        ).otherwise(v),
    )
    return df.withColumn(
        "kv",
        F.map_from_entries(
            F.zip_with(keys, vals, lambda k, v: F.struct(k, v))
        ),
    )


def kv(name: str) -> Column:
    """Map field accessor (NULL when absent — tolerant reader)."""
    return F.try_element_at(F.col("kv"), F.lit(name))
