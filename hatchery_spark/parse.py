"""Vectorized grok/regex parse stage.

Extracts hatchery-style audit fields (actor, action, resource, severity) from the
`text` column into NEW columns only — `text` itself is never touched, preserving
the byte-equality invariant of the reference's passthrough copy
(/root/reference/pipe.go:34-50, io.Copy at :40).

Two interchangeable engines, equal by construction (tested):
  * "native"  — `regexp_extract` per field. JVM-side, whole-stage-codegen'd; the
                default and the fast path at 100 TB (no Python exchange at all).
  * "pandas"  — one Arrow-vectorized `pandas_udf` applying a single compiled regex
                via `pandas.Series.str.extract` (named groups → struct). This is
                the north-star-named API surface and the template for parses that
                outgrow regexp_extract (multi-pattern grok, lookbehinds, etc.).
                No per-row Python either way.

Non-matching rows (prose) yield NULL fields; severity later falls back to the
catalog default — mirroring the `schemaHint = "unknown"` branch of the reference
(/root/reference/source/falcon_data_replicator/client.go:195-198).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# One pattern, four capture groups. \S+ keeps it linear-time (no backtracking blowup).
AUDIT_PATTERN = r"\[(debug|info|warn|error|critical)\] actor=(\S+) action=(\S+) resource=(\S+)"
# Same pattern with named groups for the pandas engine.
AUDIT_PATTERN_NAMED = (
    r"\[(?P<severity>debug|info|warn|error|critical)\]"
    r" actor=(?P<actor>\S+) action=(?P<action>\S+) resource=(?P<resource>\S+)"
)

PARSED_FIELDS = ("actor", "action", "resource", "severity")

_PARSE_SCHEMA = T.StructType(
    [T.StructField(f, T.StringType(), True) for f in PARSED_FIELDS]
)


_SUBSTR_MAX = (1 << 31) - 1  # "rest of string" for substring's length arg


def _parse_native(df: DataFrame) -> DataFrame:
    """Single-regex native parse: ONE match per row, fields from the match.

    Four per-group `regexp_extract` calls run the regex engine four times per
    row (the group index differs, so codegen subexpression elimination cannot
    merge them). Instead the WHOLE match (group 0) is extracted once — the
    identical subexpression IS eliminated across the four derived columns —
    and the fields fall out of the match's rigid shape with cheap string ops:
    split on ' ' (captures are \\S+, so the match has exactly 4
    space-separated tokens), brackets trimmed off the severity, fixed
    'actor='/'action='/'resource=' prefixes dropped. No-match rows produce an
    empty match → try_element_at/nullif → all fields NULL, exactly like the
    per-group form. Measured on 40M rows at 32 threads: 5.77s → 3.98s
    (clean-probe min), bit-identical output.
    """
    m = F.regexp_extract(F.col("text"), AUDIT_PATTERN, 0)
    parts = F.split(m, " ")

    def tok(i: int) -> Column:
        return F.try_element_at(parts, F.lit(i))

    return df.withColumns(
        {
            "actor": F.nullif(F.substring(tok(2), 7, _SUBSTR_MAX), F.lit("")),
            "action": F.nullif(F.substring(tok(3), 8, _SUBSTR_MAX), F.lit("")),
            "resource": F.nullif(F.substring(tok(4), 10, _SUBSTR_MAX), F.lit("")),
            "severity": F.nullif(F.btrim(tok(1), F.lit("[]")), F.lit("")),
        }
    )


@pandas_udf(_PARSE_SCHEMA)
def _parse_audit_pandas(text: pd.Series) -> pd.DataFrame:
    # Series.str.extract runs the compiled regex C-side over the whole Arrow
    # batch; named groups become DataFrame columns (NaN → NULL on no-match).
    out = text.str.extract(AUDIT_PATTERN_NAMED)
    return out[list(PARSED_FIELDS)]


# grok-style pattern set: tried in order, first match wins per field.
# Each pattern must expose the same 4 capture groups (severity, actor,
# action, resource). Pattern 2 handles a legacy "sev=... user=... op=... obj=..."
# layout as the multi-format example.
AUDIT_PATTERNS = (
    AUDIT_PATTERN,
    r"sev=(debug|info|warn|error|critical) user=(\S+) op=(\S+) obj=(\S+)",
)


# Group separator for the match → fields rewrite. \x01 cannot appear in a
# \S+ capture of any audit pattern (control chars are not produced upstream;
# a pattern whose captures could contain \x01 must not use this helper).
_FIELD_SEP = "\x01"


def multi_pattern_parse(df: DataFrame, patterns: tuple[str, ...] = AUDIT_PATTERNS) -> DataFrame:
    """Grok-pattern-set parse: coalesce of per-pattern extractions.

    Every pattern is evaluated vectorized (JVM codegen); for each field the
    first pattern that matched supplies the value. This is how a mixed-format
    log table (multiple SaaS sources in one stream — the reference's
    multi-source topology) parses in one pass.

    Per pattern the regex engine touches the FULL text once: the whole match
    (group 0) is extracted — codegen subexpression elimination shares that one
    call across all four fields — then a second regexp_replace rewrites the
    SHORT matched substring into 'g1␁g2␁g3␁g4' and the fields split out.
    The per-group form ran the full-text regex 4× per pattern per row.
    Works for ANY pattern exposing 4 capture groups (unlike the fixed-prefix
    fast path parse_turns uses for the single audit pattern).
    """

    def pattern_fields(p: str) -> list[Column]:
        m = F.regexp_extract(F.col("text"), p, 0)
        parts = F.split(F.regexp_replace(m, p, _FIELD_SEP.join(f"${i}" for i in (1, 2, 3, 4))), _FIELD_SEP)
        return [
            F.nullif(F.try_element_at(parts, F.lit(i)), F.lit("")) for i in (1, 2, 3, 4)
        ]

    per_pattern = [pattern_fields(p) for p in patterns]
    # field order in the output matches the capture-group order (severity=1)
    sev, actor, action, resource = (
        F.coalesce(*[fields[i] for fields in per_pattern]) for i in range(4)
    )
    return df.withColumns(
        {"actor": actor, "action": action, "resource": resource, "severity": sev}
    )


def parse_turns(df: DataFrame, engine: str = "native") -> DataFrame:
    """Append actor/action/resource/severity columns parsed from `text`."""
    if engine == "native":
        return _parse_native(df)
    if engine == "pandas":
        parsed = _parse_audit_pandas(F.col("text"))
        return df.withColumns({f: parsed.getField(f) for f in PARSED_FIELDS})
    raise ValueError(f"unknown parse engine: {engine!r}")


def tolerant_json_parse(
    df: DataFrame, json_col: str, schema: str
) -> DataFrame:
    """Error-tolerant structured decode: parse `json_col` against `schema`,
    NEVER failing the task — each row gains the schema's fields plus a
    `json_status` of 'ok' | 'malformed' | 'missing'.

    The reference's ingest loop skips-and-logs empty payloads
    (source/falcon_data_replicator/client.go:158-161) but ABORTS the whole
    poll when one record fails to unmarshal (client.go:164-167) — at
    10^12-turn scale one bad payload must not kill a stage, so this op
    quarantines instead of aborting, as a single projection:
    from_json in PERMISSIVE mode with a columnNameOfCorruptRecord channel,
    so malformed payloads surface as a status value an aggregate can count
    per sink. Pure codegen'd projection — no shuffle, no Python, corrupt
    rows cost the same as clean ones.

    Note Spark's notion of 'malformed' (Jackson): truncated/unparseable
    JSON and schema-type mismatches are corrupt, but trailing garbage after
    a complete value is tolerated.

    `schema` is a struct DDL string ("a bigint, b string", parameterized
    and nested types included) — field names are recovered through Spark's
    own DDL parser, not string splitting.
    """
    from pyspark.sql.types import StructType

    full = f"{schema}, _corrupt_record string"
    parsed = F.from_json(
        F.col(json_col), full, {"columnNameOfCorruptRecord": "_corrupt_record"}
    )
    fields = [f.name for f in StructType.fromDDL(schema).fields]
    status = (
        F.when(F.col(json_col).isNull(), F.lit("missing"))
        .when(parsed["_corrupt_record"].isNotNull(), F.lit("malformed"))
        .otherwise(F.lit("ok"))
    )
    out = df.withColumn("_p", parsed)
    for f in fields:
        out = out.withColumn(f, F.col("_p")[f])
    return out.withColumn("json_status", status).drop("_p")
