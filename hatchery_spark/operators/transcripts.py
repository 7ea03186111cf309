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
