r"""IBM QRadar LEEF 2.0 framing: render transcript turns to LEEF lines
and parse them back — both directions pure codegen.

LEEF is the second big SIEM wire format besides ArcSight CEF
(operators/cef.py); QRadar-integrated SaaS sources emit it natively
(reference analog: the per-source raw-message decode configs,
source/*/client.go). Frame shape (LEEF 2.0):

    LEEF:2.0|Vendor|Product|Version|EventID|delimSpec|k=v<delim>k=v...

* Unlike CEF, LEEF defines NO escape mechanism — the producer must pick
  an attribute delimiter absent from the data. The 2.0 header's sixth
  field declares it, either as a literal character or as hex ``xHH``.
  Rendering rotates both spellings by ``turn_idx % 2`` (``x09`` tab /
  literal ``^``) so the parser's delimiter-resolution branch is
  exercised by every run.
* ``devTimeFormat=MILLISECONDS`` + integer ``devTime`` keeps timestamps
  locale-free and oracle-exact.
* The raw turn text rides in ``msg`` — the per-turn text-equality
  invariant holds through the frame.

The correctness gate does NOT replay render→parse: the oracle computes
every parsed field directly from the source table, so a bug in either
direction (delimiter resolution, hex decode, attr split) breaks value
equality.

Scale shape: both directions are single codegen'd Projects (regex +
string ops + one map_from_entries; no UDF, no shuffle) — same contract
as the CEF operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hatchery_spark.operators.cef import CEF_SEVERITY, DEFAULT_CEF_SEVERITY

VENDOR = "hatchery"
PRODUCT_VERSION = "1.0"
LEEF_VERSION = "2.0"

#: (delimiter char, header spelling) rotated by turn_idx % 2 — one hex
#: form, one literal form, both absent from the synthetic turn text
DELIMS = [("\t", "x09"), ("^", "^")]


def render_leef(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add a ``line`` column: the LEEF 2.0 frame of each turn.
    Expects transcript columns (conv_id, turn_idx, role, text, tool, ts)."""
    text = F.col(text_col)
    is_audit = text.startswith("[")
    level = F.regexp_extract(text, r"^\[(\w+)\]", 1)
    sev = F.lit(DEFAULT_CEF_SEVERITY)
    for k, v in CEF_SEVERITY.items():
        sev = F.when(level == k, F.lit(v)).otherwise(sev)
    sig = F.when(
        is_audit, F.regexp_extract(text, r"action=(\S+)", 1)
    ).otherwise(F.lit("freeform"))

    even = F.pmod(F.col("turn_idx"), F.lit(2)) == 0
    delim = F.when(even, F.lit(DELIMS[0][0])).otherwise(F.lit(DELIMS[1][0]))
    delim_spec = F.when(even, F.lit(DELIMS[0][1])).otherwise(
        F.lit(DELIMS[1][1])
    )

    audit_attrs = F.concat(
        delim,
        F.lit("usrName="), F.regexp_extract(text, r"actor=(\S+)", 1),
        delim,
        F.lit("src="), F.regexp_extract(text, r"ip=(\S+)", 1),
    )
    attrs = F.concat(
        F.lit("devTimeFormat=MILLISECONDS"),
        delim, F.lit("devTime="),
        # parquet reads ts as TIMESTAMP_NTZ, which unix_millis rejects;
        # the session TZ is UTC so the LTZ cast is value-preserving and
        # matches DuckDB's epoch_ms on the same naive timestamps
        F.unix_millis(F.col("ts").cast("timestamp")).cast("string"),
        delim, F.lit("sev="), sev.cast("string"),
        delim, F.lit("cat="), F.col("role"),
        delim, F.lit("convId="), F.col("conv_id"),
        delim, F.lit("turnIdx="), F.col("turn_idx").cast("string"),
        F.when(is_audit, audit_attrs).otherwise(F.lit("")),
        delim, F.lit("msg="), text,
    )
    line = F.concat_ws(
        "|",
        F.lit("LEEF:" + LEEF_VERSION),
        F.lit(VENDOR),
        F.col("tool"),
        F.lit(PRODUCT_VERSION),
        sig,
        delim_spec,
        attrs,
    )
    return df.withColumn("line", line)


_LEEF_RE = r"^LEEF:([^|]*)\|([^|]*)\|([^|]*)\|([^|]*)\|([^|]*)\|([^|]*)\|(.*)$"


def parse_leef(df: DataFrame, line_col: str = "line") -> DataFrame:
    """Parse ``line_col`` back into structured fields. Returns ONLY
    columns derived from the line.

    The sixth header field resolves the attribute delimiter: ``xHH``
    decodes as a hex code point (case-insensitive), anything else is the
    literal delimiter character. Attrs split on the resolved delimiter
    regex-quoted (``\\Q…\\E``), then assemble into a map; missing keys
    surface as NULL via try_element_at.
    """
    line = F.col(line_col)

    def h(i: int) -> Column:
        return F.regexp_extract(line, _LEEF_RE, i)

    spec = h(6)
    delim = F.when(
        spec.rlike("^x[0-9a-fA-F]{2}$"),
        F.char(F.conv(F.substring(spec, 2, 2), 16, 10).cast("long")),
    ).otherwise(spec)
    pairs = F.split(h(7), F.concat(F.lit(r"\Q"), delim, F.lit(r"\E")))
    ext = F.map_from_entries(
        F.transform(
            pairs,
            lambda p: F.struct(
                F.regexp_extract(p, r"^([\w.]+)=", 1).alias("key"),
                F.regexp_replace(p, r"^[\w.]+=", "").alias("value"),
            ),
        )
    )

    def x(key: str) -> Column:
        return F.try_element_at(ext, F.lit(key))

    return df.select(
        h(1).alias("leef_version"),
        h(2).alias("vendor"),
        h(3).alias("product"),
        h(4).alias("product_version"),
        h(5).alias("sig_id"),
        x("convId").alias("conv_id"),
        x("turnIdx").cast("int").alias("turn_idx"),
        x("devTime").cast("long").alias("dev_time_ms"),
        x("sev").cast("int").alias("severity"),
        x("cat").alias("cat"),
        x("usrName").alias("usr_name"),
        x("src").alias("src_ip"),
        x("msg").alias("msg"),
    )


def leef_oracle_sql(transcripts_sql: str) -> str:
    """DuckDB replay: every parsed field computed DIRECTLY from the
    source turns (never through the frame), from the same config."""
    sev = " ".join(f"WHEN '{k}' THEN {v}" for k, v in CEF_SEVERITY.items())
    return f"""
        WITH t AS ({transcripts_sql})
        SELECT '{LEEF_VERSION}' AS leef_version,
          '{VENDOR}' AS vendor,
          tool AS product,
          '{PRODUCT_VERSION}' AS product_version,
          CASE WHEN text LIKE '[%'
               THEN regexp_extract(text, 'action=(\\S+)', 1)
               ELSE 'freeform' END AS sig_id,
          conv_id, turn_idx,
          epoch_ms(ts) AS dev_time_ms,
          cast(CASE regexp_extract(text, '^\\[(\\w+)\\]', 1)
               {sev} ELSE {DEFAULT_CEF_SEVERITY} END AS int) AS severity,
          role AS cat,
          CASE WHEN text LIKE '[%'
               THEN regexp_extract(text, 'actor=(\\S+)', 1) END AS usr_name,
          CASE WHEN text LIKE '[%'
               THEN regexp_extract(text, 'ip=(\\S+)', 1) END AS src_ip,
          text AS msg
        FROM t"""
