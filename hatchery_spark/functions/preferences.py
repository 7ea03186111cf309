"""Preference-data operators for RLHF/DPO training pipelines.

Two engine-level capabilities a preference-data pipeline needs that plain
per-object processing (the reference's model — destination/gcs/client.go:76)
cannot express:

  * ``bradley_terry`` — aggregate pairwise human preferences (winner/loser
    comparisons) into per-item strength scores via the Bradley-Terry model,
    fit with Hunter's MM algorithm (Hunter 2004, "MM algorithms for
    generalized Bradley-Terry models"). This is how arena-style preference
    corpora (e.g. Chatbot-Arena Elo tables) are reduced to scalar quality
    signals for data weighting / reward-model calibration.
  * ``dpo_pairs`` — reshape per-turn conversation logs into (prompt, chosen,
    rejected) triples, the DPO/RLHF training row format.

Scale notes: the comparisons frame is the only corpus-sized input. It is
reduced ONCE to (i, j, n_games) and (i, wins) aggregates; every MM iteration
then runs on the pair-count frame (bounded by distinct item pairs, not by raw
comparisons) with node-sized parameter frames joined in. Rounding to ``rd``
decimals after every aggregate makes the fixed-iteration fit replayable in
DuckDB (same trick as ``kmeans_lloyd`` / ``pagerank``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["derive_event_comparisons", "bradley_terry", "dpo_pairs"]


def derive_event_comparisons(events: DataFrame) -> DataFrame:
    """Deterministic synthetic comparison log over the events table: each
    event yields one comparison ``winner=user_id`` vs
    ``loser=md5(event_id) % (max_user+1)`` (self-comparisons dropped).
    Mirrors ``graph.derive_event_edges`` so the oracle replays it verbatim.
    """
    from hatchery_spark.functions.graph import _md5_prefix_long

    mx = events.agg((F.max("user_id") + F.lit(1)).alias("m"))
    c = events.crossJoin(F.broadcast(mx)).select(
        F.col("user_id").cast("long").alias("winner"),
        F.pmod(_md5_prefix_long(F.col("event_id")), F.col("m"))
        .cast("long")
        .alias("loser"),
    )
    return c.where(F.col("winner") != F.col("loser"))


def bradley_terry(
    comparisons: DataFrame,
    iters: int = 3,
    rd: int = 7,
) -> DataFrame:
    """Fit Bradley-Terry strengths from a ``(winner, loser)`` comparison log
    with ``iters`` rounds of Hunter's MM update:

        w_i ← W_i / Σ_{j≠i} n_ij / (w_i + w_j)        (then rescale to Σw = N)

    where W_i = total wins of item i and n_ij = games between i and j.
    Items that never won keep strength 0 (the MM fixed point for W_i = 0);
    any pair with n_ij > 0 contains at least one winner, so the denominator
    never divides by zero. Per-iteration aggregates are rounded to ``rd``
    decimals for cross-engine replay.

    Returns ``(item, bt_score)`` for every item appearing in the log.
    """
    # the raw log feeds the win counts, both union legs of the pair counts,
    # and the item set — persist once instead of re-deriving per consumer
    comparisons = comparisons.select(
        F.col("winner").cast("long").alias("winner"),
        F.col("loser").cast("long").alias("loser"),
    ).persist()
    # one pass over the corpus-sized log → bounded aggregate frames
    wins = comparisons.groupBy(F.col("winner").alias("item")).agg(
        F.count(F.lit(1)).cast("double").alias("w_cnt")
    )
    games = (
        comparisons.select(F.col("winner").alias("i"), F.col("loser").alias("j"))
        .union(comparisons.select(F.col("loser").alias("i"), F.col("winner").alias("j")))
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
        .persist()
    )
    items = (
        comparisons.select(F.col("winner").alias("item"))
        .union(comparisons.select(F.col("loser").alias("item")))
        .distinct()
        .join(wins, "item", "left")
        .select("item", F.coalesce(F.col("w_cnt"), F.lit(0.0)).alias("w_cnt"))
        .persist()
    )
    n_items = float(items.count())

    # eager localCheckpoint per round (the HITS/CC lesson): a lazy persist
    # chain keeps every prior round in the plan, and the nested-join tree
    # grows geometrically — at iters=3 the physical plan ran to ~28k lines
    # and single-threaded driver planning dominated the query (guide §7.3).
    # Checkpointing the node-sized params frame truncates lineage to O(1)
    # per round for the cost of one tiny materialization job.
    params = items.select("item", F.lit(1.0).alias("w")).localCheckpoint(
        eager=True
    )

    for it in range(iters):
        # denom_i = Σ_j n_ij / (w_i + w_j): pair frame joined to both sides'
        # current strengths (node-sized frames — broadcast-when-small by AQE)
        denom = (
            games.join(params.select(F.col("item").alias("i"), F.col("w").alias("wi")), "i")
            .join(params.select(F.col("item").alias("j"), F.col("w").alias("wj")), "j")
            .groupBy(F.col("i").alias("item"))
            .agg(F.round(F.sum(F.col("n") / (F.col("wi") + F.col("wj"))), rd).alias("denom"))
        )
        raw = items.join(denom, "item", "left").select(
            "item",
            F.round(
                F.when(F.col("w_cnt") > 0, F.col("w_cnt") / F.col("denom")).otherwise(
                    F.lit(0.0)
                ),
                rd,
            ).alias("w_raw"),
        )
        total = raw.agg(F.round(F.sum("w_raw"), rd).alias("s"))
        params = (
            raw.crossJoin(F.broadcast(total))
            .select(
                "item",
                F.round(F.lit(n_items) * F.col("w_raw") / F.col("s"), rd).alias("w"),
            )
            .localCheckpoint(eager=True)
        )

    return params.select("item", F.col("w").alias("bt_score"))


def dpo_pairs(turns: DataFrame, prompt_role: str = "user", response_role: str = "assistant") -> DataFrame:
    """Reshape a per-turn conversation log into DPO training rows.

    Input columns: ``conv_id, turn_idx, role, text, value`` (``value`` is the
    per-turn preference signal — a rating, reward-model score, or vote count).
    Per conversation:

      * prompt   = text of the FIRST ``prompt_role`` turn (by turn_idx)
      * chosen   = ``response_role`` turn with the highest (value, -turn_idx)
      * rejected = ``response_role`` turn with the lowest  (value,  turn_idx)

    Conversations with fewer than two response turns are dropped (no
    contrastive pair exists). One shuffle on conv_id serves all three
    window computations.
    """
    first_prompt = Window.partitionBy("conv_id").orderBy("turn_idx")
    prompts = (
        turns.where(F.col("role") == prompt_role)
        .withColumn("rn", F.row_number().over(first_prompt))
        .where(F.col("rn") == 1)
        .select("conv_id", F.col("text").alias("prompt"))
    )
    resp = turns.where(F.col("role") == response_role)
    best = Window.partitionBy("conv_id").orderBy(F.col("value").desc(), F.col("turn_idx").asc())
    worst = Window.partitionBy("conv_id").orderBy(F.col("value").asc(), F.col("turn_idx").desc())
    ranked = resp.select(
        "conv_id",
        "text",
        "value",
        "turn_idx",
        F.row_number().over(best).alias("rk_best"),
        F.row_number().over(worst).alias("rk_worst"),
        F.count(F.lit(1)).over(Window.partitionBy("conv_id")).alias("n_resp"),
    ).where(F.col("n_resp") >= 2)
    chosen = ranked.where(F.col("rk_best") == 1).select(
        "conv_id",
        F.col("text").alias("chosen"),
        F.col("value").alias("chosen_value"),
        F.col("turn_idx").alias("chosen_turn"),
    )
    rejected = ranked.where(F.col("rk_worst") == 1).select(
        "conv_id",
        F.col("text").alias("rejected"),
        F.col("value").alias("rejected_value"),
        F.col("turn_idx").alias("rejected_turn"),
    )
    return (
        prompts.join(chosen, "conv_id")
        .join(rejected, "conv_id")
        .where(F.col("chosen_turn") != F.col("rejected_turn"))
        .select(
            "conv_id",
            "prompt",
            "chosen",
            "rejected",
            F.round(F.col("chosen_value"), 6).alias("chosen_value"),
            F.round(F.col("rejected_value"), 6).alias("rejected_value"),
        )
    )
