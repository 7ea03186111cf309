r"""W3C extended log format (ELF — the IIS/CloudFront access-log
dialect): render per-stripe log FILES with ``#Version`` / ``#Fields`` /
``#Date`` directive headers and space-separated, percent-encoded data
lines, then parse them back with the field binding driven by each
file's OWN ``#Fields`` directive — the property that separates ELF
from fixed-column formats: two files in the same batch can carry the
same fields in different orders, and a correct reader binds by name.

Both directions are PURE CODEGEN — no UDF anywhere:

  * encode: lines are one concat projection; files assemble via
    array_sort(collect_list) + array_join (one file_id exchange);
    the fixture alternates between TWO field orders (file_id parity)
    so the dynamic binding is actually exercised.
  * decode: files explode into lines; each file's #Fields directive
    becomes a split array; the position of every wanted field comes
    from array_position on that array, and element_at pulls the value
    out of the line's own split — per-file positions join back to the
    data lines as a file-count-sized broadcast. '-' is the ELF null;
    the single percent-escape in the fixture alphabet (%20 for the
    User-Agent spaces) decodes with one replace.

A User-Agent classification (browser family via CASE prefix tests —
the classic log-enrichment step) rides on the parsed rows.

Scale shape: encode = ONE file_id exchange; decode = explode +
broadcast of the per-file field map (O(files) rows); everything else
is narrow. Reference analog: hatchery's per-source text decode,
source/*/client.go.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_FILES = 6
FIELDS_A = "date time c-ip cs-username cs-uri-stem sc-status cs(User-Agent)"
FIELDS_B = "date time cs-username c-ip sc-status cs-uri-stem cs(User-Agent)"

#: UA table indexed by uid % 4 (spaces → %20 on the wire)
USER_AGENTS = [
    "Mozilla/5.0 (X11; Linux) Chrome/120.0",
    "Mozilla/5.0 (Macintosh) Firefox/121.0",
    "curl/8.4.0",
    "AgentBot/2.1 (+https://example.com/bot)",
]


def _enc(v: Column) -> Column:
    return F.replace(v, F.lit(" "), F.lit("%20"))


def _dec(v: Column) -> Column:
    return F.replace(v, F.lit("%20"), F.lit(" "))


def _ua_for(uid: Column) -> Column:
    out = F.lit(USER_AGENTS[0])
    for i, ua in enumerate(USER_AGENTS[1:], start=1):
        out = F.when(uid % 4 == i, F.lit(ua)).otherwise(out)
    return out


def render_w3c_logs(turns: DataFrame) -> DataFrame:
    """turns → (file_id, content): ELF files with directive headers,
    field order alternating by uid % 2, lines in (conv_id, turn_idx)
    order."""
    uid = F.substring("conv_id", 6, 32).cast("long")
    ip = F.concat(F.lit("10.0."), (uid % 256).cast("string"),
                  F.lit("."), (uid % 100).cast("string"))
    user = F.concat(F.lit("user"), uid.cast("string"))
    uri = F.coalesce(
        F.nullif(F.regexp_extract("text", r"resource=(\S+)", 1), F.lit("")),
        F.lit("-"),
    )
    status = F.when(F.col("text").startswith("[error]"), 500).otherwise(
        F.when(F.col("text").startswith("[critical]"), 503).otherwise(200)
    )
    d = F.date_format(F.col("ts").cast("timestamp"), "yyyy-MM-dd")
    t = F.date_format(F.col("ts").cast("timestamp"), "HH:mm:ss")
    ua = _enc(_ua_for(uid))
    cols = {
        "date": d, "time": t, "c-ip": ip, "cs-username": user,
        "cs-uri-stem": uri, "sc-status": status.cast("string"),
        "cs(User-Agent)": ua,
    }
    # the field order is a property of the FILE (file_id parity), so every
    # line in a file binds against that file's own #Fields directive
    file_id = F.pmod(uid, F.lit(N_FILES))
    orders = {0: FIELDS_A, 1: FIELDS_B}
    line = F.when(
        file_id % 2 == 0,
        F.concat_ws(" ", *[cols[f] for f in FIELDS_A.split()]),
    ).otherwise(
        F.concat_ws(" ", *[cols[f] for f in FIELDS_B.split()]),
    )
    fields_line = F.when(file_id % 2 == 0, F.lit("#Fields: " + orders[0])) \
        .otherwise(F.lit("#Fields: " + orders[1]))
    rows = turns.select(
        file_id.cast("int").alias("file_id"),
        F.struct(F.col("conv_id"), F.col("turn_idx").cast("int")).alias("_k"),
        line.alias("_line"),
        fields_line.alias("_fields"),
    )
    return rows.groupBy("file_id").agg(
        F.concat(
            F.lit("#Version: 1.0\n"),
            F.max("_fields"),                  # one order per uid-stripe file?
            F.lit("\n"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_k", "_line"))),
                    lambda s: s["_line"],
                ),
                "\n",
            ),
            F.lit("\n"),
        ).alias("content"),
    )


def parse_w3c_logs(df: DataFrame, content_col: str = "content") -> DataFrame:
    """ELF files → one row per data line, bound by each file's #Fields
    directive (order-independent by construction). Adds ua_family."""
    lines = df.select(
        F.monotonically_increasing_id().alias("_fid"),
        F.col(content_col).alias("_c"),
    ).select(
        "_fid",
        F.posexplode(F.split("_c", "\n")).alias("_ln", "line"),
    ).filter(F.col("line") != "")

    fmap = lines.filter(F.col("line").startswith("#Fields: ")).select(
        "_fid",
        F.split(F.substring("line", 10, 10_000), " ").alias("_fields"),
    )
    data = lines.filter(~F.col("line").startswith("#"))
    bound = data.join(F.broadcast(fmap), "_fid").select(
        "line",
        F.split("line", " ").alias("_v"),
        "_fields",
    )

    def field(name: str) -> Column:
        return F.element_at(
            F.col("_v"), F.array_position(F.col("_fields"), name).cast("int")
        )

    ua = _dec(field("cs(User-Agent)"))
    return bound.select(
        field("date").alias("date"),
        field("time").alias("time"),
        field("c-ip").alias("c_ip"),
        field("cs-username").alias("username"),
        F.nullif(field("cs-uri-stem"), F.lit("-")).alias("uri_stem"),
        field("sc-status").cast("int").alias("status"),
        ua.alias("user_agent"),
        F.when(ua.startswith("curl/"), "curl")
        .when(ua.contains("Chrome/"), "chrome")
        .when(ua.contains("Firefox/"), "firefox")
        .when(ua.rlike("[Bb]ot"), "bot")
        .otherwise("other").alias("ua_family"),
    )


def w3c_oracle_sql(transcripts_sql: str) -> str:
    """DuckDB replay: every parsed field recomputed from the source
    turns (uid arithmetic, severity→status, the UA table, the ELF '-'
    null); the file text is never touched."""
    ua_case = ("CASE uid % 4 "
               + " ".join(f"WHEN {i} THEN '{ua}'"
                          for i, ua in enumerate(USER_AGENTS))
               + " END")
    return f"""
        WITH t AS ({transcripts_sql}),
        u AS (
          SELECT *, cast(substring(conv_id, 6) AS bigint) AS uid FROM t
        )
        SELECT strftime(ts, '%Y-%m-%d') AS date,
               strftime(ts, '%H:%M:%S') AS time,
               '10.0.' || cast(uid % 256 AS varchar) || '.'
                 || cast(uid % 100 AS varchar) AS c_ip,
               'user' || cast(uid AS varchar) AS username,
               nullif(regexp_extract(text, 'resource=(\\S+)', 1), '')
                 AS uri_stem,
               CASE WHEN text LIKE '[error]%' THEN 500
                    WHEN text LIKE '[critical]%' THEN 503
                    ELSE 200 END AS status,
               {ua_case} AS user_agent,
               CASE WHEN {ua_case} LIKE 'curl/%' THEN 'curl'
                    WHEN {ua_case} LIKE '%Chrome/%' THEN 'chrome'
                    WHEN {ua_case} LIKE '%Firefox/%' THEN 'firefox'
                    WHEN regexp_matches({ua_case}, '[Bb]ot') THEN 'bot'
                    ELSE 'other' END AS ua_family
        FROM u"""
