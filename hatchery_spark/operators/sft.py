"""Transcript → SFT training-document assembly.

The reference pipeline's unit of work is the conversation turn (transcripts
with `conv_id / turn_idx / role / text` — the table shape of
schema/transcript.go in the reference); an LLM fine-tuning run consumes whole
conversations rendered into one training string per conversation with LOSS
MASKS over the spans the optimizer should learn (assistant completions),
everything else (system / user / tool turns) attend-only. This operator does
that assembly distributed:

  * each turn renders as ``<|role|>\\n{text}\\n`` (a ChatML-style template —
    the markup is a parameter of the format, not of the plan);
  * turns concatenate in ``turn_idx`` order into one document per
    conversation;
  * for every turn whose role == ``loss_role`` the operator emits the
    0-based ``[start, end)`` CHARACTER offsets of its text portion inside
    the rendered document — exactly what a tokenizer-side masker needs to
    zero out non-completion loss.

Scale shape: ONE exchange on ``conv_col`` serves both the prefix-sum window
(per-turn start offsets are a running sum of rendered-turn lengths over the
conversation — turns per conversation are bounded, never corpus-sized) and
the final per-conversation aggregate; every expression is codegen'd JVM
string/arith work (no Python, no second shuffle). Rendered text is built by
``array_sort(collect_list(struct(turn_idx, rt)))`` + join so the output is
deterministic under any input partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def render_sft_documents(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    loss_role: str = "assistant",
) -> DataFrame:
    """Assemble one training document per conversation with loss-mask spans.

    Returns one row per conversation:
      * ``n_turns`` / ``n_loss_turns`` — turn counts (int);
      * ``n_chars`` — rendered document length (int);
      * ``loss_frac`` — fraction of rendered characters inside loss spans
        (round 6) — the "how much of this batch actually trains" gauge a
        mixture planner reads;
      * ``text`` — the rendered document;
      * ``loss_spans`` — ``"start:end,start:end,…"`` 0-based ``[start, end)``
        character offsets of each loss turn's text, in turn order ('' when
        the conversation has no loss turns).

    The span arithmetic is closed-form against the template: a turn's text
    starts ``len("<|") + len(role) + len("|>\\n")`` characters after the
    turn's rendered start, so offsets need only the window prefix sum — no
    post-hoc substring search against the assembled document.
    """
    role, text = F.col(role_col), F.col(text_col)
    rt = F.concat(F.lit("<|"), role, F.lit("|>\n"), text, F.lit("\n"))
    turns = df.select(
        F.col(conv_col),
        F.col(idx_col),
        role,
        text,
        rt.alias("_rt"),
    )
    w = (
        Window.partitionBy(conv_col)
        .orderBy(idx_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = F.coalesce(F.sum(F.length("_rt")).over(w), F.lit(0))
    start = off + F.length(role) + F.lit(5)  # len("<|") + role + len("|>\n")
    span = F.concat_ws(":", start.cast("string"), (start + F.length(text)).cast("string"))
    is_loss = role == F.lit(loss_role)
    spanned = turns.withColumn("_span", F.when(is_loss, span)).withColumn(
        "_loss_len", F.when(is_loss, F.length(text)).otherwise(F.lit(0))
    )

    def _ordered_join(col: Column, sep: str) -> Column:
        return F.array_join(
            F.transform(F.array_sort(F.collect_list(col)), lambda s: s["v"]), sep
        )

    return spanned.groupBy(conv_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_turns"),
        F.sum(is_loss.cast("int")).cast("int").alias("n_loss_turns"),
        F.sum(F.length("_rt")).cast("int").alias("n_chars"),
        F.round(F.sum("_loss_len") / F.sum(F.length("_rt")), 6).alias("loss_frac"),
        _ordered_join(
            F.struct(F.col(idx_col).alias("k"), F.col("_rt").alias("v")), ""
        ).alias("text"),
        _ordered_join(
            F.when(is_loss, F.struct(F.col(idx_col).alias("k"), F.col("_span").alias("v"))),
            ",",
        ).alias("loss_spans"),
    )
