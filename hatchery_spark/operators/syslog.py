r"""RFC 5424 syslog framing: render transcript turns to syslog lines and
parse them back — both directions pure codegen.

Hatchery's sources ship SaaS audit logs whose on-the-wire framing is
syslog-shaped (reference analog: the raw-message decode step in each
source/*/ config before field extraction); this operator gives the
pipeline a real RFC 5424 encoder/decoder pair:

    <PRI>VERSION TIMESTAMP HOSTNAME APP-NAME PROCID MSGID SD MSG

* PRI = facility*8 + severity, split back out with div/mod.
* SD  = ``[hs@32473 actor="…" resource="…" note="…"]`` with the three
  RFC-mandated PARAM-VALUE escapes (``\\`` ``\"`` ``\]``), or the
  NILVALUE ``-`` for turns with no audit payload.
* MSG = the raw turn text, untouched — the per-turn text-equality
  invariant rides through the frame.

The correctness gate does NOT replay render→parse: the oracle computes
every output field directly from the source table, so a bug in either
direction (field order, escape handling, PRI math, timestamp format)
breaks value equality.

Scale shape: both directions are single codegen'd Projects (regex +
string ops, no UDF, no shuffle); the operator composes with scans and
sinks without adding a stage boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SD_ID = "hs@32473"
_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"  # TIME-SECFRAC keeps µs lossless

#: role → syslog facility (deterministic config, mirrored by the oracle)
FACILITY_BY_ROLE = {"system": 3, "tool": 16, "assistant": 10, "user": 1}
#: level token → syslog severity
SEVERITY_BY_LEVEL = {
    "debug": 7,
    "info": 6,
    "warn": 4,
    "error": 3,
    "critical": 2,
}
DEFAULT_SEVERITY = 5  # notice — free-form turns carry no level token


def _case(col: Column, mapping: dict[str, int], default: int) -> Column:
    expr = F.lit(default)
    for k, v in mapping.items():
        expr = F.when(col == k, F.lit(v)).otherwise(expr)
    return expr.cast("int")


def _escape_sd(v: Column) -> Column:
    """RFC 5424 §6.3.3 PARAM-VALUE escaping (backslash first)."""
    v = F.replace(v, F.lit("\\"), F.lit("\\\\"))
    v = F.replace(v, F.lit('"'), F.lit('\\"'))
    return F.replace(v, F.lit("]"), F.lit("\\]"))


def _unescape_sd(v: Column) -> Column:
    return F.regexp_replace(v, r"\\(.)", "$1")


def note_raw(tool: Column) -> Column:
    """Deterministic SD param exercising all three escapable chars:
    ``pod "<tool>" [x\\]`` — quote, bracket, literal backslash."""
    return F.concat(F.lit('pod "'), tool, F.lit('" [x\\]'))


def render_rfc5424(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add a ``line`` column: the RFC 5424 frame of each turn.
    Expects transcript columns (conv_id, turn_idx, role, text, tool, ts)."""
    text = F.col(text_col)
    level = F.regexp_extract(text, r"^\[(\w+)\]", 1)
    facility = _case(F.col("role"), FACILITY_BY_ROLE, 9)
    severity = _case(level, SEVERITY_BY_LEVEL, DEFAULT_SEVERITY)
    pri = facility * 8 + severity
    action = F.regexp_extract(text, r"action=(\S+)", 1)
    is_audit = text.startswith("[")
    sd = F.when(
        is_audit,
        F.concat(
            F.lit(f"[{SD_ID} actor=\""),
            _escape_sd(F.regexp_extract(text, r"actor=(\S+)", 1)),
            F.lit('" resource="'),
            _escape_sd(F.regexp_extract(text, r"resource=(\S+)", 1)),
            F.lit('" note="'),
            _escape_sd(note_raw(F.col("tool"))),
            F.lit('"]'),
        ),
    ).otherwise(F.lit("-"))
    line = F.concat(
        F.lit("<"),
        pri.cast("string"),
        F.lit(">1 "),
        F.date_format("ts", _TS_FMT),
        F.lit(" "),
        F.col("conv_id"),
        F.lit(" "),
        F.col("tool"),
        F.lit(" "),
        F.col("turn_idx").cast("string"),
        F.lit(" "),
        F.when(is_audit, action).otherwise(F.lit("-")),
        F.lit(" "),
        sd,
        F.lit(" "),
        text,
    )
    return df.withColumn("line", line)


def parse_rfc5424(df: DataFrame, line_col: str = "line") -> DataFrame:
    """Parse ``line_col`` back into structured fields. Returns ONLY
    columns derived from the line (nothing smuggled from the input):
    (conv_id, turn_idx, pri, facility, severity, ts, app, msgid,
    actor, resource, note, msg)."""
    line = F.col(line_col)
    pri = F.regexp_extract(line, r"^<(\d+)>", 1).cast("int")
    # header fields contain no spaces: positional split, msg capped off
    head = F.split(line, " ", 7)

    def h(i: int) -> Column:
        return F.try_element_at(head, F.lit(i))

    rest = h(7)  # SD + ' ' + MSG
    sd = F.regexp_extract(rest, r"^(\[(?:[^\]\\]|\\.)*\]|-) ", 1)
    msg = F.substring(rest, F.length(sd) + 2, F.length(rest))

    def param(name: str) -> Column:
        return _unescape_sd(
            F.regexp_extract(sd, name + r'="((?:[^"\\]|\\.)*)"', 1)
        )

    return df.select(
        h(3).alias("conv_id"),
        h(5).cast("int").alias("turn_idx"),
        pri.alias("pri"),
        (pri / F.lit(8)).cast("int").alias("facility"),
        F.pmod(pri, F.lit(8)).cast("int").alias("severity"),
        F.to_timestamp(h(2), _TS_FMT).alias("ts"),
        h(4).alias("app"),
        h(6).alias("msgid"),
        param("actor").alias("actor"),
        param("resource").alias("resource"),
        param("note").alias("note"),
        msg.alias("msg"),
    )


def syslog_oracle_sql(transcripts_sql: str) -> str:
    """DuckDB replay: every parsed field computed DIRECTLY from the
    source turns (never through the frame), generated from the same
    facility/severity config dicts."""
    fac = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in FACILITY_BY_ROLE.items()
    )
    sev = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in SEVERITY_BY_LEVEL.items()
    )
    return f"""
        WITH t AS ({transcripts_sql}),
        x AS (
          SELECT *,
            CASE role {fac} ELSE 9 END AS facility,
            CASE regexp_extract(text, '^\\[(\\w+)\\]', 1)
                 {sev} ELSE {DEFAULT_SEVERITY} END AS severity,
            text LIKE '[%' AS is_audit
          FROM t)
        SELECT conv_id, turn_idx,
          cast(facility * 8 + severity AS int) AS pri,
          cast(facility AS int) AS facility,
          cast(severity AS int) AS severity,
          ts, tool AS app,
          CASE WHEN is_audit
               THEN regexp_extract(text, 'action=(\\S+)', 1)
               ELSE '-' END AS msgid,
          CASE WHEN is_audit
               THEN regexp_extract(text, 'actor=(\\S+)', 1)
               ELSE '' END AS actor,
          CASE WHEN is_audit
               THEN regexp_extract(text, 'resource=(\\S+)', 1)
               ELSE '' END AS resource,
          CASE WHEN is_audit
               THEN concat('pod "', tool, '" [x\\]')
               ELSE '' END AS note,
          text AS msg
        FROM x"""


# ---------------------------------------------------------------------------
# RFC 3164 — legacy BSD syslog. The format every pipeline still has to
# ingest: no year, no timezone, no structured data, and the infamous
# SPACE-padded day-of-month ("Aug  5", not "Aug 05").
# ---------------------------------------------------------------------------

#: month abbreviations in RFC 3164 TIMESTAMP order (index = month number - 1)
BSD_MONTHS = [
    "Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec",
]


def render_rfc3164(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add a ``line`` column: the RFC 3164 frame of each turn.

        <PRI>Mmm dd hh:mm:ss HOSTNAME TAG[pid]: MSG

    PRI reuses the 5424 facility/severity config (the PRI octet predates
    both RFCs and is identical); TIMESTAMP is the §4.1.2 format with the
    day SPACE-padded for days 1-9 — the classic parser trap, exercised
    by real rows whenever the source spans a month's first nine days.
    HOSTNAME = conv_id, TAG = tool, pid = turn_idx; MSG carries the raw
    turn text untouched (per-turn text-equality invariant). Pure codegen
    Project — no UDF, no shuffle.
    """
    text = F.col(text_col)
    level = F.regexp_extract(text, r"^\[(\w+)\]", 1)
    facility = _case(F.col("role"), FACILITY_BY_ROLE, 9)
    severity = _case(level, SEVERITY_BY_LEVEL, DEFAULT_SEVERITY)
    pri = facility * 8 + severity
    # date_format 'MMM' depends on session locale for some JVMs; build the
    # month token from the config list so render and parse share one table.
    mon = F.element_at(
        F.array(*[F.lit(m) for m in BSD_MONTHS]), F.month("ts")
    )
    stamp = F.concat(
        mon,
        F.lit(" "),
        F.lpad(F.dayofmonth("ts").cast("string"), 2, " "),
        F.lit(" "),
        F.date_format("ts", "HH:mm:ss"),
    )
    line = F.concat(
        F.lit("<"),
        pri.cast("string"),
        F.lit(">"),
        stamp,
        F.lit(" "),
        F.col("conv_id"),
        F.lit(" "),
        F.col("tool"),
        F.lit("["),
        F.col("turn_idx").cast("string"),
        F.lit("]: "),
        text,
    )
    return df.withColumn("line", line)


def parse_rfc3164(df: DataFrame, line_col: str = "line") -> DataFrame:
    """Parse RFC 3164 lines back into structured fields — ONLY from the
    line (nothing smuggled from the input). The year is NOT in the frame
    (3164's defining lossiness), so event time comes back as (mon, day,
    time_str); callers re-anchor against ingest date, exactly as real
    collectors do. Returns (host, tag, pid, pri, facility, severity,
    mon, day, time_str, msg). Single codegen'd Project.
    """
    line = F.col(line_col)
    pri = F.regexp_extract(line, r"^<(\d+)>", 1).cast("int")
    # TIMESTAMP: month token, space-or-zero-padded day, time
    pat = r"^<\d+>(\w{3}) ([ \d]\d) (\d\d:\d\d:\d\d) (\S+) (\w+)\[(\d+)\]: "
    mon_name = F.regexp_extract(line, pat, 1)
    # month token → number via the shared table (no locale parsing)
    mon = F.lit(None).cast("int")
    for i, m in enumerate(BSD_MONTHS, start=1):
        mon = F.when(mon_name == m, F.lit(i)).otherwise(mon)
    header = F.regexp_extract(line, pat, 0)
    msg = F.substring(line, F.length(header) + 1, F.length(line))
    return df.select(
        F.regexp_extract(line, pat, 4).alias("host"),
        F.regexp_extract(line, pat, 5).alias("tag"),
        F.regexp_extract(line, pat, 6).cast("int").alias("pid"),
        pri.alias("pri"),
        (pri / F.lit(8)).cast("int").alias("facility"),
        F.pmod(pri, F.lit(8)).cast("int").alias("severity"),
        mon.alias("mon"),
        F.trim(F.regexp_extract(line, pat, 2)).cast("int").alias("day"),
        F.regexp_extract(line, pat, 3).alias("time_str"),
        msg.alias("msg"),
    )


def syslog_bsd_oracle_sql(transcripts_sql: str) -> str:
    """DuckDB replay: every parsed field computed DIRECTLY from the
    source turns — a bug in either render (padding, month table, PRI)
    or parse (space-day regex, header length arithmetic) breaks value
    equality. Generated from the same facility/severity config."""
    fac = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in FACILITY_BY_ROLE.items()
    )
    sev = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in SEVERITY_BY_LEVEL.items()
    )
    return f"""
        WITH t AS ({transcripts_sql}),
        x AS (
          SELECT *,
            CASE role {fac} ELSE 9 END AS facility,
            CASE regexp_extract(text, '^\\[(\\w+)\\]', 1)
                 {sev} ELSE {DEFAULT_SEVERITY} END AS severity
          FROM t)
        SELECT
          conv_id AS host,
          tool AS tag,
          cast(turn_idx AS int) AS pid,
          cast(facility * 8 + severity AS int) AS pri,
          cast(facility AS int) AS facility,
          cast(severity AS int) AS severity,
          cast(month(ts) AS int) AS mon,
          cast(day(ts) AS int) AS day,
          strftime(ts, '%H:%M:%S') AS time_str,
          text AS msg
        FROM x"""
