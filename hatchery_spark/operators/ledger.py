r"""Tamper-evident audit-log hash chain: per-conversation ledger chains
(h_i = md5(h_{i-1} || md5(text_i)), seeded h_{-1} = md5(conv_id)) and
chain verification that localizes the FIRST tampered turn — the
append-only integrity primitive an audit pipeline needs before anyone
trusts its sinks (reference analog: the at-least-once delivery
guarantees hatchery's destinations assume, destination/*: a chain makes
silent post-hoc edits detectable, not just lost writes).

Everything is declarative: the chain fold is Spark's `aggregate`
higher-order function over the conversation's sorted digest array
(acc = struct(running hash, prefix array)), so the whole ledger build
is ONE conv_id shuffle and zero UDFs. Verification recomputes the
chain over a (deterministically) tampered copy of the log and compares
prefix-by-prefix: entry i diverges iff some j ≤ i was edited, so the
min divergent index IS the first tampered turn. The oracle replays the
exact same chains with a DuckDB recursive CTE — hex-string md5 at
every step, no engine-specific binary forms.

Tamper fixture: conversations with user_id % 13 == 5 get turn
t* = least(user_id % 5, n_turns-1) edited (text || ' [T]') AFTER the
ledger was built — replayed, never random.

Scale shape: chains are conversation-bounded (the same per-key
sequential dependency any hash chain has); across conversations the
build is embarrassingly parallel. The output is O(conversations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _digests(turns: DataFrame, text_col: str) -> DataFrame:
    """conv_id → sorted array of per-turn md5 digests (ONE shuffle)."""
    return (
        turns.select(
            "conv_id",
            F.struct(F.col("turn_idx").cast("int").alias("i"),
                     F.md5(F.col(text_col)).alias("d")).alias("td"),
        )
        .groupBy("conv_id")
        .agg(F.array_sort(F.collect_list("td")).alias("tds"))
    )


def _chain(col, seed):
    """Fold digests into (head, per-turn prefix hashes) via aggregate()."""
    init = F.struct(
        seed.alias("h"), F.array().cast("array<string>").alias("ps")
    )
    return F.aggregate(
        col,
        init,
        lambda acc, x: F.struct(
            F.md5(F.concat(acc["h"], x["d"])).alias("h"),
            F.concat(acc["ps"],
                     F.array(F.md5(F.concat(acc["h"], x["d"])))).alias("ps"),
        ),
    )


def build_ledger(turns: DataFrame, text_col: str = "text") -> DataFrame:
    """(conv_id, n_turns, head_hash, prefix_hashes) — the stored ledger."""
    chained = _digests(turns, text_col).select(
        "conv_id",
        F.size("tds").alias("n_turns"),
        _chain(F.col("tds"), F.md5(F.col("conv_id"))).alias("c"),
    )
    return chained.select(
        "conv_id", "n_turns",
        F.col("c.h").alias("head_hash"),
        F.col("c.ps").alias("prefix_hashes"),
    )


def tamper(turns: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic post-ledger edit: conversations with uid % 13 == 5
    get turn least(uid % 5, n_turns-1) suffixed with ' [T]'."""
    uid = F.substring("conv_id", 6, 32).cast("long")
    n = F.count(F.lit(1)).over(Window.partitionBy("conv_id"))
    t_star = F.least(uid % 5, n.cast("long") - 1)
    hit = (uid % 13 == 5) & (F.col("turn_idx").cast("long") == t_star)
    return turns.withColumn(
        text_col, F.when(hit, F.concat(F.col(text_col), F.lit(" [T]")))
        .otherwise(F.col(text_col))
    )


def verify_ledger(ledger: DataFrame, turns: DataFrame,
                  text_col: str = "text") -> DataFrame:
    """Recompute chains over `turns` and compare against the stored
    ledger prefix-by-prefix. Returns one row per conversation:
    (conv_id, n_turns, head_hash, tampered, first_bad_turn)."""
    recomputed = build_ledger(turns, text_col).select(
        "conv_id",
        F.col("head_hash").alias("_rh"),
        F.col("prefix_hashes").alias("_rps"),
    )
    joined = ledger.join(recomputed, "conv_id")
    # first index whose prefix hash diverges (zip_with + array_position)
    diverge = F.zip_with(
        "prefix_hashes", "_rps", lambda a, b: (a != b).cast("int")
    )
    first_bad = F.array_position(diverge, 1) - 1  # 0-based turn, -1 if none
    return joined.select(
        "conv_id", "n_turns", "head_hash",
        (F.col("head_hash") != F.col("_rh")).alias("tampered"),
        F.when(F.col("head_hash") != F.col("_rh"),
               first_bad.cast("int")).alias("first_bad_turn"),
    )


def ledger_oracle_sql(transcripts_sql: str) -> str:
    """DuckDB replay: the chain is rebuilt turn-by-turn with a recursive
    CTE (hex md5 at each step) over both the clean and the tampered
    text; tampered flag and first divergent turn fall out of the same
    recursion."""
    return f"""
        WITH RECURSIVE t AS ({transcripts_sql}),
        u AS (
          SELECT conv_id, turn_idx, text,
                 cast(substring(conv_id, 6) AS bigint) AS uid,
                 count(*) OVER (PARTITION BY conv_id) AS n_turns
          FROM t
        ),
        w AS (
          SELECT *,
            CASE WHEN uid % 13 = 5
                  AND turn_idx = least(uid % 5, n_turns - 1)
                 THEN text || ' [T]' ELSE text END AS text2
          FROM u
        ),
        chain AS (
          SELECT conv_id, turn_idx, n_turns,
                 md5(md5(conv_id) || md5(text))  AS h,
                 md5(md5(conv_id) || md5(text2)) AS h2
          FROM w WHERE turn_idx = 0
          UNION ALL
          SELECT w.conv_id, w.turn_idx, w.n_turns,
                 md5(c.h || md5(w.text)),
                 md5(c.h2 || md5(w.text2))
          FROM w JOIN chain c
            ON w.conv_id = c.conv_id AND w.turn_idx = c.turn_idx + 1
        )
        SELECT conv_id,
               cast(n_turns AS int) AS n_turns,
               max(CASE WHEN turn_idx = n_turns - 1 THEN h END) AS head_hash,
               bool_or(h != h2) AS tampered,
               CASE WHEN bool_or(h != h2)
                    THEN cast(min(CASE WHEN h != h2 THEN turn_idx END) AS int)
               END AS first_bad_turn
        FROM chain
        GROUP BY conv_id, n_turns"""


#: 60-bit row hash (15 md5 hex chars) — positive in a BIGINT on both
#: engines; the modular sum term uses the low 20 bits so a 10^12-row
#: sum stays ≤ 2^60 without overflow on either engine (Spark sums in a
#: wrapping long; DuckDB promotes to HUGEINT — different overflow
#: semantics, so the envelope must avoid overflow entirely)
DIGEST_SUM_BITS = 20


def table_digest(
    df: DataFrame, cols: list[str], group_cols: list[str] | None = None
) -> DataFrame:
    """Order-invariant table fingerprint — routed-row equality at 100 TB
    without sorting anything.

    The north rule gates on routed-row equality with the reference; at
    10^12 rows the naive proof (sort both sides, compare) costs a global
    sort each. This digest is ONE aggregate pass: each row canonicalizes
    to ``md5(field1 \\x1f field2 …)`` (unit-separator joined, NULLs as a
    sentinel) and the table reduces to

        (n_rows, xor of the 60-bit row hashes, sum of their low 20 bits)

    XOR and + are commutative/associative ⇒ partition order, shuffle
    order, and parallelism cannot change the digest; map-side partial
    aggregation means O(groups) rows ever cross the wire. XOR alone is
    blind to duplicate-row pairs (x ⊕ x = 0); the count and the modular
    sum close that hole (a duplicated row changes both), giving a
    practical ~80-bit integrity check — for byte equality of two routed
    outputs, compare their digest rows instead of their rows.

    Reference analog: hatchery verifies destination writes by object
    count/ack (destination/gcs); this is the content-strength version.
    """
    canon = F.concat_ws(
        "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols]
    )
    h = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("long")
    gb = df.groupBy(*group_cols) if group_cols else df.groupBy()
    return gb.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.bit_xor(h).alias("xor_digest"),
        F.sum(F.pmod(h, F.lit(1 << DIGEST_SUM_BITS))).cast("long")
        .alias("sum_digest"),
    )


def table_digest_sql(
    src_sql: str, col_exprs: list[str], group_expr: str | None = None
) -> str:
    """DuckDB replay of :func:`table_digest` (positional hex decode —
    no conv() there)."""
    digits = "0123456789abcdef"
    canon = (
        "concat_ws(chr(31), "
        + ", ".join(
            f"coalesce(cast({c} AS varchar), chr(0))" for c in col_exprs
        )
        + ")"
    )
    h = " + ".join(
        f"(strpos('{digits}', substr(md5({canon}), {i + 1}, 1)) - 1)"
        f" * {16 ** (14 - i)}"
        for i in range(15)
    )
    g_sel = f"{group_expr}, " if group_expr else ""
    g_by = f"GROUP BY {group_expr}" if group_expr else ""
    return f"""
        SELECT {g_sel}cast(count(*) AS bigint) AS n_rows,
               cast(bit_xor(cast({h} AS bigint)) AS bigint) AS xor_digest,
               cast(sum(({h}) % {1 << DIGEST_SUM_BITS}) AS bigint)
                 AS sum_digest
        FROM ({src_sql}) {g_by}"""
