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
