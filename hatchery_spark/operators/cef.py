r"""ArcSight CEF (Common Event Format) framing: render transcript turns to
CEF lines and parse them back — both directions pure codegen.

CEF is the other wire framing SaaS security products emit besides syslog
(reference analog: the per-source raw-message decode configs,
source/*/client.go, which normalize vendor frames before field
extraction). Frame shape:

    CEF:Version|Vendor|Product|DeviceVersion|SignatureID|Name|Severity|ext

* The seven HEADER fields escape ``\`` and ``|`` (spec §"Character
  encoding"); the rendered Name deliberately contains both.
* The EXTENSION is space-separated ``key=value`` pairs where values
  escape ``\`` and ``=``; the raw turn text rides in ``msg`` — audit
  turns contain literal ``=`` characters, so the escape path is
  exercised by real data, and the per-turn text-equality invariant
  holds through the frame.
* Severity is the 0–10 CEF scale mapped from the turn's level token.

The correctness gate does NOT replay render→parse: the oracle computes
every parsed field directly from the source table, so a bug in either
direction (header split on an escaped pipe, extension split inside an
escaped ``=``, unescape order) breaks value equality.

Scale shape: both directions are single codegen'd Projects (regex +
string ops + one map_from_entries; no UDF, no shuffle, no explode) —
the operator composes with scans and sinks without a stage boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

VENDOR = "hatchery"
DEV_VERSION = "1.0"

#: level token → CEF 0-10 severity (mirrored by the oracle)
CEF_SEVERITY = {"debug": 2, "info": 4, "warn": 6, "error": 8, "critical": 10}
DEFAULT_CEF_SEVERITY = 5

#: header-field escapes: backslash and pipe (backslash first)
def _escape_header(v: Column) -> Column:
    v = F.replace(v, F.lit("\\"), F.lit("\\\\"))
    return F.replace(v, F.lit("|"), F.lit("\\|"))


#: extension-value escapes: backslash and equals (backslash first)
def _escape_ext(v: Column) -> Column:
    v = F.replace(v, F.lit("\\"), F.lit("\\\\"))
    return F.replace(v, F.lit("="), F.lit("\\="))


def _unescape(v: Column) -> Column:
    return F.regexp_replace(v, r"\\(.)", "$1")


def name_raw(tool: Column) -> Column:
    r"""Deterministic Name header exercising both escapable chars:
    ``op |<tool>| x\`` — two literal pipes and a trailing backslash."""
    return F.concat(F.lit("op |"), tool, F.lit("| x\\"))


def render_cef(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add a ``line`` column: the CEF frame of each turn.
    Expects transcript columns (conv_id, turn_idx, role, text, tool)."""
    text = F.col(text_col)
    is_audit = text.startswith("[")
    level = F.regexp_extract(text, r"^\[(\w+)\]", 1)
    sev = F.lit(DEFAULT_CEF_SEVERITY)
    for k, v in CEF_SEVERITY.items():
        sev = F.when(level == k, F.lit(v)).otherwise(sev)
    sig = F.when(
        is_audit, F.regexp_extract(text, r"action=(\S+)", 1)
    ).otherwise(F.lit("freeform"))

    def kv(key: str, val: Column) -> Column:
        return F.concat(F.lit(key + "="), _escape_ext(val))

    audit_ids = F.concat(
        F.lit(" "),
        kv("suser", F.regexp_extract(text, r"actor=(\S+)", 1)),
        F.lit(" "),
        kv("src", F.regexp_extract(text, r"ip=(\S+)", 1)),
    )
    ext = F.concat(
        kv("cs1", F.col("conv_id")),
        F.lit(" "),
        kv("cnt", F.col("turn_idx").cast("string")),
        F.when(is_audit, audit_ids).otherwise(F.lit("")),
        F.lit(" "),
        kv("msg", text),
    )
    line = F.concat_ws(
        "|",
        F.lit("CEF:0"),
        _escape_header(F.lit(VENDOR)),
        _escape_header(F.col("tool")),
        _escape_header(F.lit(DEV_VERSION)),
        _escape_header(sig),
        _escape_header(name_raw(F.col("tool"))),
        sev.cast("string"),
        ext,
    )
    return df.withColumn("line", line)


_HDR = r"((?:[^|\\]|\\.)*)"
_CEF_RE = (
    r"^CEF:(\d+)\|" + r"\|".join([_HDR] * 6) + r"\|(.*)$"
)


def parse_cef(df: DataFrame, line_col: str = "line") -> DataFrame:
    """Parse ``line_col`` back into structured fields. Returns ONLY
    columns derived from the line: (version, vendor, product,
    dev_version, sig_id, name, severity, conv_id, turn_idx, suser,
    src, msg).

    Header fields split by ONE anchored regex whose field atom is
    ``(?:[^|\\]|\\.)*`` — an escaped pipe never terminates a field.
    The extension splits on spaces that start a ``key=`` token
    (lookahead); escaped ``\=`` inside a value cannot match, so values
    keep their spaces and equals. Missing keys surface as NULL via
    try_element_at on the assembled map (ANSI-safe).
    """
    line = F.col(line_col)

    def h(i: int) -> Column:
        return _unescape(F.regexp_extract(line, _CEF_RE, i))

    pairs = F.split(F.regexp_extract(line, _CEF_RE, 8), r" (?=[\w.]+=)")
    ext = F.map_from_entries(
        F.transform(
            pairs,
            lambda p: F.struct(
                F.regexp_extract(p, r"^([\w.]+)=", 1).alias("key"),
                _unescape(F.regexp_replace(p, r"^[\w.]+=", "")).alias("value"),
            ),
        )
    )

    def x(key: str) -> Column:
        return F.try_element_at(ext, F.lit(key))

    return df.select(
        F.regexp_extract(line, _CEF_RE, 1).cast("int").alias("version"),
        h(2).alias("vendor"),
        h(3).alias("product"),
        h(4).alias("dev_version"),
        h(5).alias("sig_id"),
        h(6).alias("name"),
        F.regexp_extract(line, _CEF_RE, 7).cast("int").alias("severity"),
        x("cs1").alias("conv_id"),
        x("cnt").cast("int").alias("turn_idx"),
        x("suser").alias("suser"),
        x("src").alias("src"),
        x("msg").alias("msg"),
    )


def cef_oracle_sql(transcripts_sql: str) -> str:
    """DuckDB replay: every parsed field computed DIRECTLY from the
    source turns (never through the frame), from the same config."""
    sev = " ".join(f"WHEN '{k}' THEN {v}" for k, v in CEF_SEVERITY.items())
    return f"""
        WITH t AS ({transcripts_sql})
        SELECT cast(0 AS int) AS version,
          '{VENDOR}' AS vendor,
          tool AS product,
          '{DEV_VERSION}' AS dev_version,
          CASE WHEN text LIKE '[%'
               THEN regexp_extract(text, 'action=(\\S+)', 1)
               ELSE 'freeform' END AS sig_id,
          concat('op |', tool, '| x\\') AS name,
          cast(CASE regexp_extract(text, '^\\[(\\w+)\\]', 1)
               {sev} ELSE {DEFAULT_CEF_SEVERITY} END AS int) AS severity,
          conv_id, turn_idx,
          CASE WHEN text LIKE '[%'
               THEN regexp_extract(text, 'actor=(\\S+)', 1) END AS suser,
          CASE WHEN text LIKE '[%'
               THEN regexp_extract(text, 'ip=(\\S+)', 1) END AS src,
          text AS msg
        FROM t"""
