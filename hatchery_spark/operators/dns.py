r"""DNS-tunneling detection: per-domain label-entropy profiling over
qnames derived from transcript turns — the exfiltration heuristic every
security log pipeline ships (long, high-entropy, high-cardinality
subdomain labels under one registered domain ⇒ DNS used as a covert
byte channel).

Fixture: each turn issues one DNS query. Tunneling actors
(user_id % 11 == 7) encode data in the label — md5(text), 32 hex chars
of near-uniform entropy; everyone else resolves a service name (the
tool), short and low-entropy. The registered domain partitions by user
(svc<uid % 20>.example.com), so both classes coexist per domain only
through the uid stripe, and the detector must separate them on the
aggregate signals alone: mean label length, distinct-label ratio, and
Shannon entropy of the domain's label character distribution.

Float discipline: entropy is a sum of p·log2(p) terms — IEEE addition
is not associative, so engine-different aggregation orders can differ
in the last bit and a round() could straddle. Both sides therefore
fold the SAME canonical sequence: Spark sorts the (char, count) pairs
with array_sort and folds with the aggregate() HOF; DuckDB builds the
identical ordered list and list_sum's it — bit-identical doubles, then
one final round(4). The tunnel thresholds (entropy ≥ 3.5 AND mean
length ≥ 20) sit far from both populations (hex ≈ 3.9+, service names
≤ 2.6), so the flag could never hinge on the last bit anyway.

Scale shape: the char explode is a bounded ≤63× fan-out (DNS label
limit) that map-side combines into (domain, char) partials immediately;
everything after is O(domains × alphabet). Two exchanges, both on the
reduced key. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ENTROPY_MIN = 3.5
MEAN_LEN_MIN = 20.0


def derive_qnames(turns: DataFrame) -> DataFrame:
    """turn → (domain, label): tunnel actors exfiltrate md5(text)."""
    uid = F.substring("conv_id", 6, 32).cast("long")
    label = F.when(uid % 11 == 7, F.md5("text")).otherwise(F.col("tool"))
    domain = F.concat(F.lit("svc"), (uid % 20).cast("string"),
                      F.lit(".example.com"))
    return turns.select(domain.alias("domain"), label.alias("label"))


def detect_tunnels(qnames: DataFrame) -> DataFrame:
    """(domain, label) queries → per-domain signals + tunnel flag."""
    per_char = (
        qnames.select(
            "domain", F.explode(F.split("label", "")).alias("ch")
        )
        .filter(F.col("ch") != "")
        .groupBy("domain", "ch")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # canonical-order entropy fold: sort (ch, c) then sum p*log2(p)
    ent = (
        per_char.groupBy("domain")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("ch"), F.col("c")))
            ).alias("cs"),
            F.sum("c").alias("total"),
        )
        .select(
            "domain",
            F.round(
                -F.aggregate(
                    "cs",
                    F.lit(0.0),
                    lambda acc, x: acc
                    + (x["c"] / F.col("total"))
                    * F.log2(x["c"] / F.col("total")),
                ),
                4,
            ).alias("char_entropy"),
        )
    )
    stats = qnames.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.countDistinct("label").alias("distinct_labels"),
        F.round(F.sum(F.length("label")) / F.count(F.lit(1)), 4)
        .alias("mean_label_len"),
    )
    return stats.join(ent, "domain").select(
        "domain", "n_queries", "distinct_labels", "mean_label_len",
        "char_entropy",
        (
            (F.col("char_entropy") >= ENTROPY_MIN)
            & (F.col("mean_label_len") >= MEAN_LEN_MIN)
        ).alias("is_tunnel"),
    )


def dns_oracle_sql(transcripts_sql: str) -> str:
    """DuckDB replay with the IDENTICAL fold order: ordered (ch, c)
    list → list_transform → list_sum reproduces Spark's aggregate()
    sequence term-for-term."""
    return f"""
        WITH t AS ({transcripts_sql}),
        q AS (
          SELECT 'svc' || cast(cast(substring(conv_id, 6) AS bigint) % 20
                              AS varchar) || '.example.com' AS domain,
                 CASE WHEN cast(substring(conv_id, 6) AS bigint) % 11 = 7
                      THEN md5(text) ELSE tool END AS label
          FROM t
        ),
        pc AS (
          SELECT domain, ch, count(*) AS c
          FROM (SELECT domain, unnest(string_split(label, '')) AS ch FROM q)
          WHERE ch != '' GROUP BY domain, ch
        ),
        ent AS (
          SELECT pc.domain,
                 round(-list_sum(list_transform(
                     list(pc.c ORDER BY pc.ch),
                     x -> (x / tt.total) * log2(x / tt.total))), 4)
                   AS char_entropy
          FROM pc JOIN (SELECT domain, sum(c) AS total
                        FROM pc GROUP BY domain) tt
            ON pc.domain = tt.domain
          GROUP BY pc.domain, tt.total
        ),
        st AS (
          SELECT domain, count(*) AS n_queries,
                 count(DISTINCT label) AS distinct_labels,
                 round(sum(length(label)) / count(*), 4) AS mean_label_len
          FROM q GROUP BY domain
        )
        SELECT st.domain, n_queries, distinct_labels, mean_label_len,
               char_entropy,
               char_entropy >= {ENTROPY_MIN} AND mean_label_len >= {MEAN_LEN_MIN}
                 AS is_tunnel
        FROM st JOIN ent ON st.domain = ent.domain"""
