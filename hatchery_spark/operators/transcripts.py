"""Transcript-structure operators: context-window truncation, chat-format
QC, and degenerate tool-loop detection.

These are the per-conversation hygiene passes an LLM log pipeline runs
before transcripts become training or eval data (reference analog: the
per-record enrichment/validation stage of the pipeline topology,
pipeline/pipeline.go; the operators themselves are standard
training-data practice — context packing, role-alternation checks, agent
loop detection).

Scale notes: every operator here shuffles ONCE on conv_id and does all
further work inside the per-conversation window/group — conversations are
bounded (a chat has thousands of turns at most, never billions), so the
per-key state is small and skew-safe at any corpus size. Nothing collects,
nothing is iterative, everything is pure codegen expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def truncate_context(
    turns: DataFrame,
    budget_tokens: int,
    tokens: Column | None = None,
) -> DataFrame:
    """Keep, per conversation, the longest SUFFIX of turns whose total token
    count fits ``budget_tokens`` — the standard context-window packing rule
    (most-recent-first) for serving logs replayed into training examples.

    The final turn is always kept even when it alone exceeds the budget
    (otherwise a conversation silently vanishes). Cost: one conv_id
    exchange; the reverse cumulative sum is a running window over the
    bounded per-conversation turn list.
    """
    n_tok = tokens if tokens is not None else F.size(F.split(F.col("text"), " ", -1))
    rev = W.partitionBy("conv_id").orderBy(F.col("turn_idx").desc())
    out = (
        turns.withColumn("n_tokens", n_tok.cast("int"))
        .withColumn(
            "cum_from_end",
            F.sum("n_tokens").over(rev.rowsBetween(W.unboundedPreceding, 0)),
        )
        .withColumn("rev_pos", F.row_number().over(rev))
    )
    return out.where(
        (F.col("cum_from_end") <= F.lit(budget_tokens)) | (F.col("rev_pos") == 1)
    ).drop("rev_pos")


def turn_structure_qc(turns: DataFrame) -> DataFrame:
    """Per-conversation chat-format validation: turn counts, role-alternation
    violations (consecutive turns with the same role), unparseable turns
    (no structured audit payload), opening-role check, and a composite
    ``valid`` verdict. One conv_id exchange (window + final agg share it).
    """
    seq = W.partitionBy("conv_id").orderBy("turn_idx")
    flagged = turns.select(
        "conv_id",
        "turn_idx",
        "role",
        (F.col("role") == F.lag("role").over(seq)).cast("int").alias("same_as_prev"),
        (~F.col("text").startswith("[")).cast("int").alias("unparseable"),
    )
    return flagged.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_turns"),
        F.coalesce(F.sum("same_as_prev"), F.lit(0)).cast("int").alias("role_violations"),
        F.sum("unparseable").cast("int").alias("unparseable_turns"),
        F.max(
            F.when(F.col("turn_idx") == 0, F.col("role").isin("system", "user"))
        ).cast("int").alias("starts_ok"),
        (
            (F.coalesce(F.sum("same_as_prev"), F.lit(0)) == 0)
            & F.max(F.when(F.col("turn_idx") == 0, F.col("role").isin("system", "user")))
        ).cast("int").alias("valid"),
    )


def tool_call_loops(turns: DataFrame, min_run: int = 3) -> DataFrame:
    """Detect degenerate agent loops: runs of >= ``min_run`` CONSECUTIVE
    turns in a conversation that invoke the same tool — the stuck-agent
    signature that poisons agentic training data.

    Gaps-and-islands on the dense per-conversation turn index:
    ``turn_idx - row_number() over (conv_id, tool order by turn_idx)`` is
    constant exactly on consecutive same-tool turns, so one window + one
    group-by finds every run without self-joins. One conv_id-family
    exchange total.
    """
    isl = W.partitionBy("conv_id", "tool").orderBy("turn_idx")
    islands = turns.select(
        "conv_id",
        "tool",
        "turn_idx",
        (F.col("turn_idx") - F.row_number().over(isl)).alias("island"),
    )
    return (
        islands.groupBy("conv_id", "tool", "island")
        .agg(
            F.min("turn_idx").cast("int").alias("start_idx"),
            F.count(F.lit(1)).cast("int").alias("run_len"),
        )
        .where(F.col("run_len") >= min_run)
        .drop("island")
    )


def sequence_match(
    turns: DataFrame,
    pattern: str,
    code: Column | None = None,
) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence-pattern detection: each turn is mapped
    to a ONE-CHARACTER code (default: first letter of ``role``), the codes
    are concatenated in (conv_id, turn_idx) order, and ``pattern`` — a
    regex over the code alphabet — is matched non-overlapping, left to
    right. This is the row-pattern-recognition idiom (SQL:2016
    MATCH_RECOGNIZE, Flink CEP) reduced to its scalable core: ONE conv_id
    exchange builds the per-conversation code string (conversations are
    bounded — thousands of turns, never billions), then matching is a
    zero-shuffle codegen projection.

    Keep the pattern inside the shared regex subset (no lookaround, no
    backreferences): Spark matches with Java regex and engines replaying
    the result (RE2-based) must agree.

    Returns one row per conversation with ≥1 match:
    ``(conv_id, n_turns, n_matches, matches array<string>)``.
    """
    c = code if code is not None else F.substring(F.col("role"), 1, 1)
    seq = (
        turns.select(F.col("conv_id"), F.col("turn_idx"), c.alias("code"))
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_turns"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("turn_idx"), F.col("code")))
                    ),
                    lambda x: x["code"],
                ),
                "",
            ).alias("seq"),
        )
    )
    out = seq.select(
        "conv_id",
        "n_turns",
        F.regexp_extract_all(F.col("seq"), F.lit(pattern), 0).alias("matches"),
    ).withColumn("n_matches", F.size("matches").cast("int"))
    return out.where(F.col("n_matches") > 0).select(
        "conv_id", "n_turns", "n_matches", "matches"
    )
