"""Fellegi-Sunter probabilistic record linkage (entity resolution).

The missing member of the repo's dedup family: exact/MinHash/SimHash
dedup compare DOCUMENTS, the deletion-neighborhood miner compares
single tokens — record linkage compares STRUCTURED RECORDS field by
field under the Fellegi & Sunter (JASA 1969) decision model: each
field comparison yields an agreement level, each level carries a
log-likelihood weight ``≈ 10·log10(m/u)`` (deciban-scaled integers:
``m`` = P(level | same entity), ``u`` = P(level | different entities)),
the pair score is the weight sum, and two thresholds cut
match / possible / non-match.

Everything here is deterministic and dual-engine:

* A synthetic person table derives from ``customer`` by md5-indexing
  fixed FIRST/LAST name lists (24×24 — collisions are intended: the
  ``u``-probability term exists precisely because different people
  share names), with the TPC-H phone and nation carried over.
* A "dirty" re-entry of every record perturbs fields through md5
  gates: name char-drop (soundex usually survives — the partial
  agreement level), full name swap, late/early phone-digit bumps
  (prefix agreement vs total disagreement), nation flips.
* Blocking: candidate pairs come from (soundex(first), soundex(last))
  blocks UNION exact-phone blocks — never all-pairs; a pair missed by
  both blocks is a recall loss the oracle replays identically.
* Weights are STATED CONSTANTS (derived offline from the assumed m/u
  in the table below), so scoring is pure integer addition — no EM fit,
  no floats, bit-exact replay.

Scale shape: two block joins on key-reduced frames, one window rank
per dirty record (WindowGroupLimit), all integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hatchery_spark.functions.graph import _md5_prefix_long
from hatchery_spark.functions.phonetic import soundex_col, soundex_sql

FIRST = [
    "james", "mary", "robert", "patricia", "john", "jennifer", "michael",
    "linda", "david", "elizabeth", "william", "barbara", "richard",
    "susan", "joseph", "jessica", "thomas", "karen", "charles", "sarah",
    "daniel", "lisa", "matthew", "nancy",
]
LAST = [
    "smith", "johnson", "williams", "brown", "jones", "garcia", "miller",
    "davis", "rodriguez", "martinez", "hernandez", "lopez", "gonzalez",
    "wilson", "anderson", "thomas", "taylor", "moore", "jackson",
    "martin", "lee", "perez", "thompson", "white",
]

#: agreement-level weights, deciban-scaled 10·log10(m/u) with assumed
#: m/u — name exact (m=.92,u=.004)≈+24, soundex-only (m=.06,u=.006)≈+10,
#: disagree (m=.02,u=.99)≈−17 softened to −8 for the 3-field model;
#: phone exact +22, prefix-only +8, disagree −7; nation +3 / −6.
W_NAME = {2: 24, 1: 10, 0: -8}
W_PHONE = {2: 22, 1: 8, 0: -7}
W_NATION = {True: 3, False: -6}
MATCH_T = 30
POSSIBLE_T = 15
PHONE_PREFIX = 7  # country + area code


def _pick(h: Column, table: list[str]) -> Column:
    # array indexing, not a 24-way chained CASE: the deep CASE tree is
    # semantically identical but blows up whole-stage-codegen compile
    # time when the synthesis appears in four join branches
    arr = F.array(*[F.lit(v) for v in table])
    return F.element_at(
        arr, (F.pmod(h, F.lit(len(table))) + 1).cast("int")
    )


def _pick_sql(h: str, table: list[str]) -> str:
    whens = " ".join(
        f"WHEN {i} THEN '{v}'" for i, v in enumerate(table)
    )
    return f"CASE ({h}) % {len(table)} {whens} END"


def _h(prefix: str, key: Column) -> Column:
    return _md5_prefix_long(F.concat(F.lit(prefix), key.cast("string")))


def _phone(k: Column, nation: Column) -> Column:
    """Deterministic TPC-H-style phone ``NN-NNN-NNN-NNNN`` (the testdata
    customer table carries no phone column): country code 10+nation,
    md5-derived groups."""
    return F.concat_ws(
        "-",
        (nation + 10).cast("string"),
        F.lpad(F.pmod(_h("ph1-", k), F.lit(1000)).cast("string"), 3, "0"),
        F.lpad(F.pmod(_h("ph2-", k), F.lit(1000)).cast("string"), 3, "0"),
        F.lpad(F.pmod(_h("ph3-", k), F.lit(10000)).cast("string"), 4, "0"),
    )


def person_records(customer: DataFrame) -> DataFrame:
    """Clean person table: (rec_id, src_key, first, last, phone, nation)."""
    k = F.col("c_custkey")
    nation = F.col("c_nationkey").cast("long")
    return customer.select(
        F.concat(F.lit("c-"), k.cast("string")).alias("rec_id"),
        k.cast("long").alias("src_key"),
        _pick(_h("fn-", k), FIRST).alias("first"),
        _pick(_h("ln-", k), LAST).alias("last"),
        _phone(k, nation).alias("phone"),
        nation.alias("nation"),
    )


def perturbed_records(customer: DataFrame) -> DataFrame:
    """Dirty re-entry of every customer, md5-gated perturbations:
    name gate %3 — 0: drop the first name's 2nd char, 1: exact,
    2: swap to a different first name; phone gate %3 — 0: exact,
    1: bump digit 13 (prefix survives), 2: bump digit 5 (prefix dies);
    nation gate %4 — 0: flip, else keep."""
    base = person_records(customer)
    k = F.col("src_key")
    g1 = F.pmod(_h("pg1-", k), F.lit(3))
    g2 = F.pmod(_h("pg2-", k), F.lit(3))
    g3 = F.pmod(_h("pg3-", k), F.lit(4))

    def bump(pos: int) -> Column:
        d = F.substring(F.col("phone"), pos, 1).cast("int")
        nd = F.pmod(d + 1, F.lit(10)).cast("string")
        return F.concat(
            F.substring(F.col("phone"), 1, pos - 1),
            nd,
            F.expr(f"substring(phone, {pos + 1})"),
        )

    first = (
        F.when(
            g1 == 0,
            F.concat(
                F.substring("first", 1, 1),
                F.expr("substring(first, 3)"),
            ),
        )
        .when(g1 == 2, _pick(_h("fn2-", k) + 1, FIRST))
        .otherwise(F.col("first"))
    )
    phone = (
        F.when(g2 == 1, bump(13)).when(g2 == 2, bump(5))
        .otherwise(F.col("phone"))
    )
    nation = F.when(
        g3 == 0, F.pmod(F.col("nation") + 7, F.lit(25))
    ).otherwise(F.col("nation"))
    return base.select(
        F.concat(F.lit("d-"), k.cast("string")).alias("rec_id"),
        "src_key",
        first.alias("first"),
        F.col("last").alias("last"),
        phone.alias("phone"),
        nation.alias("nation"),
    )


def _with_keys(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "blk_name",
        F.concat(soundex_col(F.col("first")), soundex_col(F.col("last"))),
    )


def fs_link(clean: DataFrame, dirty: DataFrame) -> DataFrame:
    """Block, score, rank: the best clean candidate per dirty record.
    Returns (dirty_id, clean_id, name_lvl, phone_lvl, nation_ok, score,
    cls, correct)."""
    c = _with_keys(clean).select(
        F.col("rec_id").alias("clean_id"),
        F.col("src_key").alias("c_key"),
        F.col("first").alias("c_first"),
        F.col("last").alias("c_last"),
        F.col("phone").alias("c_phone"),
        F.col("nation").alias("c_nation"),
        F.col("blk_name").alias("c_blk"),
    )
    d = _with_keys(dirty).select(
        F.col("rec_id").alias("dirty_id"),
        F.col("src_key").alias("d_key"),
        F.col("first").alias("d_first"),
        F.col("last").alias("d_last"),
        F.col("phone").alias("d_phone"),
        F.col("nation").alias("d_nation"),
        F.col("blk_name").alias("d_blk"),
    )
    # each side feeds BOTH block joins: persist so the md5 synthesis +
    # soundex chain evaluates once per record, not once per branch
    c = c.persist()
    d = d.persist()
    by_name = d.join(c, F.col("d_blk") == F.col("c_blk"))
    by_phone = d.join(c, F.col("d_phone") == F.col("c_phone"))
    # no pair dedup: a (dirty, clean) pair surfaced by both blocks has
    # identical field agreements, so duplicates cannot change the
    # rank-1 winner under the (score DESC, clean_id) tie-break — the
    # oracle's DISTINCT and this union converge at rn = 1, and skipping
    # the dedup removes a full candidate-set shuffle
    cand = by_name.unionByName(by_phone)
    name_lvl = (
        F.when(
            (F.col("d_first") == F.col("c_first"))
            & (F.col("d_last") == F.col("c_last")),
            F.lit(2),
        )
        .when(F.col("d_blk") == F.col("c_blk"), F.lit(1))
        .otherwise(F.lit(0))
    )
    phone_lvl = (
        F.when(F.col("d_phone") == F.col("c_phone"), F.lit(2))
        .when(
            F.substring("d_phone", 1, PHONE_PREFIX)
            == F.substring("c_phone", 1, PHONE_PREFIX),
            F.lit(1),
        )
        .otherwise(F.lit(0))
    )
    nation_ok = F.col("d_nation") == F.col("c_nation")

    def w(lvl: Column, table: dict) -> Column:
        out = F.lit(0)
        for key, v in table.items():
            out = F.when(lvl == key, F.lit(v)).otherwise(out)
        return out

    scored = cand.select(
        "dirty_id",
        "clean_id",
        name_lvl.alias("name_lvl"),
        phone_lvl.alias("phone_lvl"),
        nation_ok.alias("nation_ok"),
        (
            w(name_lvl, W_NAME)
            + w(phone_lvl, W_PHONE)
            + w(nation_ok, W_NATION)
        ).cast("long").alias("score"),
        (F.col("c_key") == F.col("d_key")).alias("correct"),
    )
    win = Window.partitionBy("dirty_id").orderBy(
        F.col("score").desc(), F.col("clean_id")
    )
    best = (
        scored.withColumn("rn", F.row_number().over(win))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    cls = (
        F.when(F.col("score") >= MATCH_T, F.lit("match"))
        .when(F.col("score") >= POSSIBLE_T, F.lit("possible"))
        .otherwise(F.lit("nonmatch"))
    )
    return best.withColumn("cls", cls)


def linkage_oracle_sql() -> str:
    """DuckDB replay over the ``customer`` view: synthesis,
    perturbation gates, soundex blocking, weights, rank — everything."""

    def hsql(prefix: str, key: str) -> str:
        digits = "0123456789abcdef"
        md5 = f"md5(concat('{prefix}', cast({key} AS varchar)))"
        return " + ".join(
            f"(strpos('{digits}', substr({md5}, {i + 1}, 1)) - 1)"
            f" * {16 ** (7 - i)}"
            for i in range(8)
        )

    def w_case(col: str, table: dict) -> str:
        whens = " ".join(
            f"WHEN {str(k).upper() if isinstance(k, bool) else k}"
            f" THEN {v}"
            for k, v in table.items()
        )
        return f"CASE {col} {whens} END"

    p = PHONE_PREFIX
    return f"""
        WITH clean AS (
          SELECT concat('c-', cast(c_custkey AS varchar)) AS rec_id,
                 cast(c_custkey AS bigint) AS src_key,
                 {_pick_sql(hsql('fn-', 'c_custkey'), FIRST)} AS first,
                 {_pick_sql(hsql('ln-', 'c_custkey'), LAST)} AS last,
                 concat(
                   cast(cast(c_nationkey AS bigint) + 10 AS varchar), '-',
                   lpad(cast(({hsql('ph1-', 'c_custkey')}) % 1000
                             AS varchar), 3, '0'), '-',
                   lpad(cast(({hsql('ph2-', 'c_custkey')}) % 1000
                             AS varchar), 3, '0'), '-',
                   lpad(cast(({hsql('ph3-', 'c_custkey')}) % 10000
                             AS varchar), 4, '0')) AS phone,
                 cast(c_nationkey AS bigint) AS nation
          FROM customer),
        gates AS (
          SELECT src_key,
                 ({hsql('pg1-', 'src_key')}) % 3 AS g1,
                 ({hsql('pg2-', 'src_key')}) % 3 AS g2,
                 ({hsql('pg3-', 'src_key')}) % 4 AS g3,
                 ({hsql('fn2-', 'src_key')}) AS h2
          FROM clean),
        dirty AS (
          SELECT concat('d-', cast(b.src_key AS varchar)) AS rec_id,
                 b.src_key,
                 CASE WHEN g.g1 = 0
                      THEN concat(substr(b.first, 1, 1), substr(b.first, 3))
                      WHEN g.g1 = 2
                      THEN {_pick_sql('g.h2 + 1', FIRST)}
                      ELSE b.first END AS first,
                 b.last,
                 CASE WHEN g.g2 = 1 THEN concat(substr(b.phone, 1, 12),
                        cast((cast(substr(b.phone, 13, 1) AS int) + 1) % 10
                             AS varchar), substr(b.phone, 14))
                      WHEN g.g2 = 2 THEN concat(substr(b.phone, 1, 4),
                        cast((cast(substr(b.phone, 5, 1) AS int) + 1) % 10
                             AS varchar), substr(b.phone, 6))
                      ELSE b.phone END AS phone,
                 CASE WHEN g.g3 = 0 THEN (b.nation + 7) % 25
                      ELSE b.nation END AS nation
          FROM clean b JOIN gates g ON b.src_key = g.src_key),
        ck AS (
          SELECT *, concat({soundex_sql('first')}, {soundex_sql('last')})
                 AS blk FROM clean),
        dk AS (
          SELECT *, concat({soundex_sql('first')}, {soundex_sql('last')})
                 AS blk FROM dirty),
        cand AS (
          SELECT DISTINCT d.rec_id AS dirty_id, c.rec_id AS clean_id,
                 d.src_key AS d_key, c.src_key AS c_key,
                 d.first AS d_first, c.first AS c_first,
                 d.last AS d_last, c.last AS c_last,
                 d.phone AS d_phone, c.phone AS c_phone,
                 d.nation AS d_nation, c.nation AS c_nation,
                 d.blk AS d_blk, c.blk AS c_blk
          FROM dk d JOIN ck c
            ON d.blk = c.blk OR d.phone = c.phone),
        scored AS (
          SELECT dirty_id, clean_id,
                 CASE WHEN d_first = c_first AND d_last = c_last THEN 2
                      WHEN d_blk = c_blk THEN 1 ELSE 0 END AS name_lvl,
                 CASE WHEN d_phone = c_phone THEN 2
                      WHEN substr(d_phone, 1, {p}) = substr(c_phone, 1, {p})
                      THEN 1 ELSE 0 END AS phone_lvl,
                 d_nation = c_nation AS nation_ok,
                 c_key = d_key AS correct
          FROM cand),
        weighted AS (
          SELECT *,
                 cast({w_case('name_lvl', W_NAME)}
                      + {w_case('phone_lvl', W_PHONE)}
                      + {w_case('nation_ok', W_NATION)} AS bigint) AS score
          FROM scored),
        ranked AS (
          SELECT *, row_number() OVER (
            PARTITION BY dirty_id ORDER BY score DESC, clean_id) AS rn
          FROM weighted)
        SELECT dirty_id, clean_id, name_lvl, phone_lvl, nation_ok, score,
               correct,
               CASE WHEN score >= {MATCH_T} THEN 'match'
                    WHEN score >= {POSSIBLE_T} THEN 'possible'
                    ELSE 'nonmatch' END AS cls
        FROM ranked WHERE rn = 1"""
