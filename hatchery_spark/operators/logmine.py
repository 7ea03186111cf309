"""Log template mining (Drain-style, deterministic).

The log-normalization step hatchery's parse stage presupposes: raw
messages are clustered into templates so the long tail of free-form
logs gets structure without per-source grok patterns. Reference analog:
the per-source parse configs (source/*/config.go) hand-write one
pattern per SaaS; template mining derives the patterns from the data.

Algorithm (a deterministic variant of Drain, He et al. ICWS'17):

1. **Mask** — tokenize on single spaces; any token containing a digit
   becomes ``<*>`` (numbers, ids, IPs, emails with counters — the
   classic crude-but-effective variable mask).
2. **Bucket** — group by Drain's tree prefix ``(token_count,
   first_token)``.
3. **Position-wise merge** — within a bucket, a position keeps its
   token iff every message in the bucket agrees on it after masking;
   otherwise it becomes ``<*>``. The bucket's template is the
   positionally-rebuilt string.
4. Buckets whose merged templates coincide are summed.

Everything is exact relational algebra — no similarity thresholds, no
driver state — so the DuckDB oracle replays it verbatim.

Scale shape (100 TB): one explode of O(total tokens) rows feeding a
partially-aggregated ``(bucket, position, token)`` distinct-count —
map-side combine collapses each partition to its local vocabulary, and
a whale bucket (one message shape dominating the corpus) is spread
across its ``token_count`` positions rather than landing on one
reducer. The template rebuild then runs on O(buckets × positions) rows
— vocabulary-sized, corpus-independent. Driver traffic: none.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MASK = "<*>"


def _masked_tokens(text: Column) -> Column:
    toks = F.split(text, " ", -1)
    return F.transform(
        toks,
        lambda t: F.when(t.rlike("[0-9]"), F.lit(_MASK)).otherwise(t),
    )


def mine_log_templates(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Return one row per mined template:
    ``(template, n_messages, n_buckets)``."""
    msgs = df.select(_masked_tokens(F.col(text_col)).alias("toks")).select(
        "toks",
        F.size("toks").alias("n"),
        F.coalesce(F.try_element_at("toks", F.lit(1)), F.lit("")).alias("first"),
    )
    bucket_counts = msgs.groupBy("n", "first").agg(
        F.count(F.lit(1)).alias("c")
    )
    pos = msgs.select("n", "first", F.posexplode("toks").alias("pos", "tok"))
    pos_agg = pos.groupBy("n", "first", "pos").agg(
        F.countDistinct("tok").alias("d"), F.min("tok").alias("mt")
    )
    templates = pos_agg.groupBy("n", "first").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "d", "mt"))),
                lambda s: F.when(s["d"] == 1, s["mt"]).otherwise(F.lit(_MASK)),
            ),
        ).alias("template")
    )
    return (
        templates.join(bucket_counts, ["n", "first"])
        .groupBy("template")
        .agg(
            F.sum("c").alias("n_messages"),
            F.count(F.lit(1)).alias("n_buckets"),
        )
    )


def log_templates_oracle_sql(source_cte: str, text_expr: str = "text") -> str:
    """DuckDB replay over a CTE named ``src`` exposing ``text``."""
    return f"""
WITH src AS ({source_cte}),
m AS (SELECT list_transform(string_split({text_expr}, ' '),
             x -> CASE WHEN regexp_matches(x, '[0-9]') THEN '{_MASK}'
                       ELSE x END) AS toks
      FROM src),
b AS (SELECT toks, len(toks) AS n, coalesce(toks[1], '') AS first FROM m),
bc AS (SELECT n, first, count(*) AS c FROM b GROUP BY 1, 2),
p AS (SELECT n, first,
             generate_subscripts(toks, 1) AS pos, unnest(toks) AS tok
      FROM b),
pa AS (SELECT n, first, pos, count(DISTINCT tok) AS d, min(tok) AS mt
       FROM p GROUP BY 1, 2, 3),
tpl AS (SELECT n, first,
               string_agg(CASE WHEN d = 1 THEN mt ELSE '{_MASK}' END,
                          ' ' ORDER BY pos) AS template
        FROM pa GROUP BY 1, 2)
SELECT t.template,
       cast(sum(bc.c) AS bigint) AS n_messages,
       count(*) AS n_buckets
FROM tpl t JOIN bc ON t.n = bc.n AND t.first = bc.first
GROUP BY t.template"""


def template_day_stats(
    df: DataFrame, text_col: str = "text", ts_col: str = "ts"
) -> DataFrame:
    """Template-rate anomaly detection: mine templates (same bucket →
    positional-merge machinery as :func:`mine_log_templates`), count each
    template per DAY on a dense template×day grid (zero-days included —
    the classic silent-outage blind spot when absent days are skipped),
    and flag days where the rate deviates ≥3σ from the template's mean.

    The 3σ test is ALL-INTEGER:  ``z² > 9  ⟺  (c·n − Σc)²·n >
    9·(n·Σc² − (Σc)²)`` — no division, no sqrt, so the oracle replays it
    with zero float-tie risk (the fixed-point lesson from pagerank).
    BIGINT headroom: per-template daily counts up to ~10⁶ over ≤10⁴ days
    fit; at true 10^12-turn scale promote the two products to
    DECIMAL(38,0) (one cast) or pre-normalize counts.

    Returns ``(template, day, c, n_days, sum_c, sumsq_c, is_anomaly)``.

    Scale shape: counting is one map-side-combined agg keyed on the
    (bucket, day) grid; the dense grid is a template×day cross join of
    two vocabulary-sized frames — corpus-independent, broadcast NL join.
    """
    msgs = df.select(
        _masked_tokens(F.col(text_col)).alias("toks"),
        F.to_date(F.col(ts_col)).alias("day"),
    ).select(
        "toks",
        "day",
        F.size("toks").alias("n"),
        F.coalesce(F.try_element_at("toks", F.lit(1)), F.lit("")).alias("first"),
    )
    pos = msgs.select("n", "first", F.posexplode("toks").alias("pos", "tok"))
    pos_agg = pos.groupBy("n", "first", "pos").agg(
        F.countDistinct("tok").alias("d"), F.min("tok").alias("mt")
    )
    templates = pos_agg.groupBy("n", "first").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "d", "mt"))),
                lambda s: F.when(s["d"] == 1, s["mt"]).otherwise(F.lit(_MASK)),
            ),
        ).alias("template")
    )
    bucket_day = msgs.groupBy("n", "first", "day").agg(
        F.count(F.lit(1)).alias("c")
    )
    tpl_day = (
        bucket_day.join(templates, ["n", "first"])
        .groupBy("template", "day")
        .agg(F.sum("c").alias("c"))
    )
    grid = (
        tpl_day.select("template").distinct()
        .crossJoin(tpl_day.select("day").distinct())
        .join(tpl_day, ["template", "day"], "left")
        .select(
            "template", "day", F.coalesce("c", F.lit(0)).cast("long").alias("c")
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("template")
    out = grid.select(
        "template",
        "day",
        "c",
        F.count(F.lit(1)).over(w).alias("n_days"),
        F.sum("c").over(w).alias("sum_c"),
        F.sum(F.col("c") * F.col("c")).over(w).alias("sumsq_c"),
    )
    dev = F.col("c") * F.col("n_days") - F.col("sum_c")
    var_n3 = (
        F.col("n_days") * F.col("sumsq_c") - F.col("sum_c") * F.col("sum_c")
    )
    return out.withColumn(
        "is_anomaly", (dev * dev * F.col("n_days")) > F.lit(9) * var_n3
    ).withColumn("day", F.date_format("day", "yyyy-MM-dd"))


def template_anomaly_oracle_sql(source_cte: str) -> str:
    """DuckDB replay of :func:`template_day_stats` (integer z² test)."""
    return f"""
WITH src AS ({source_cte}),
m AS (SELECT list_transform(string_split(text, ' '),
             x -> CASE WHEN regexp_matches(x, '[0-9]') THEN '{_MASK}'
                       ELSE x END) AS toks,
             cast(ts AS date) AS day
      FROM src),
b AS (SELECT toks, day, len(toks) AS n, coalesce(toks[1], '') AS first
      FROM m),
p AS (SELECT n, first,
             generate_subscripts(toks, 1) AS pos, unnest(toks) AS tok
      FROM b),
pa AS (SELECT n, first, pos, count(DISTINCT tok) AS d, min(tok) AS mt
       FROM p GROUP BY 1, 2, 3),
tpl AS (SELECT n, first,
               string_agg(CASE WHEN d = 1 THEN mt ELSE '{_MASK}' END,
                          ' ' ORDER BY pos) AS template
        FROM pa GROUP BY 1, 2),
bd AS (SELECT n, first, day, count(*) AS c FROM b GROUP BY 1, 2, 3),
td AS (SELECT t.template, bd.day, cast(sum(bd.c) AS bigint) AS c
       FROM bd JOIN tpl t ON t.n = bd.n AND t.first = bd.first
       GROUP BY 1, 2),
grid AS (
  SELECT g.template, g.day, cast(coalesce(td.c, 0) AS bigint) AS c
  FROM (SELECT tt.template, dd.day
        FROM (SELECT DISTINCT template FROM td) tt,
             (SELECT DISTINCT day FROM td) dd) g
  LEFT JOIN td ON td.template = g.template AND td.day = g.day),
st AS (
  SELECT template, day, c,
         count(*) OVER (PARTITION BY template) AS n_days,
         sum(c) OVER (PARTITION BY template) AS sum_c,
         sum(c * c) OVER (PARTITION BY template) AS sumsq_c
  FROM grid)
SELECT template, strftime(day, '%Y-%m-%d') AS day, c,
       cast(n_days AS bigint) AS n_days,
       cast(sum_c AS bigint) AS sum_c,
       cast(sumsq_c AS bigint) AS sumsq_c,
       (c * n_days - sum_c) * (c * n_days - sum_c) * n_days
         > 9 * (n_days * sumsq_c - sum_c * sum_c) AS is_anomaly
FROM st"""
