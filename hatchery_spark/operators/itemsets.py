"""Frequent-itemset mining (market-basket analysis) over per-conversation
item sets — the classic Apriori lattice walk (Agrawal & Srikant, VLDB'94)
expressed relationally, sized for distributed execution the way SON (Savasere
et al., VLDB'95) sizes it: every candidate-generation step is pruned by the
PREVIOUS level's frequent set via a broadcast join BEFORE any self-join, so
the pair/triple explosion only ever covers frequent items, never the raw
item stream.

Telemetry reading: "which (tool, severity) combinations co-occur inside the
same conversation more often than a support floor" — the co-occurrence prior
behind playbook mining and alert-correlation rules (reference analog:
hatchery routes each event independently, pipeline/pipeline.go; cross-event
structure inside a conversation is engine-level work).

Scale shape (10^12 turns):
  * the basket frame is `distinct(conv_id, item)` — ONE conv_id+item
    exchange; per-basket cardinality is bounded by the item vocabulary, not
    by turn count.
  * L1/L2 frequent sets are vocabulary-sized (≤ |items|, |items|²) →
    broadcast; the within-basket self-join runs AFTER the broadcast
    semi-prune, so its fan-out is C(frequent-per-basket, 2).
  * support counts are map-side-combined integer aggregates; the support
    threshold is ONE driver scalar (ceil of a count — O(1) traffic).
  * Apriori monotonicity means the candidate pruning never changes the
    result, only the work — the oracle replays the same lattice and agrees
    exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["frequent_itemsets"]


def frequent_itemsets(
    turns: DataFrame,
    item: Column,
    basket_col: str = "conv_id",
    min_support_pct: int = 5,
    max_size: int = 3,
) -> DataFrame:
    """Frequent itemsets of size 1..max_size (max_size ≤ 3) with support ≥
    ceil(n_baskets · min_support_pct / 100).

    Returns ``(sz, i1, i2, i3, support)`` — i2/i3 NULL below the row's size;
    items within a row are in ascending order (canonical form).
    """
    if not 1 <= max_size <= 3:
        raise ValueError("max_size must be 1..3")
    baskets = (
        turns.select(F.col(basket_col).alias("bk"), item.alias("item"))
        .where(F.col("item").isNotNull())
        .distinct()
        .persist()
    )
    n_baskets = baskets.select("bk").distinct().count()  # O(1) driver scalar
    thr = -(-n_baskets * min_support_pct // 100)  # integer ceil
    nul = F.lit(None).cast("string")

    l1 = (
        baskets.groupBy("item")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= thr)
        .persist()
    )
    out = l1.select(
        F.lit(1).alias("sz"),
        F.col("item").alias("i1"),
        nul.alias("i2"),
        nul.alias("i3"),
        "support",
    )
    if max_size == 1:
        return out

    # Apriori prune FIRST: only frequent items enter the within-basket
    # self-join (broadcast semi — l1 is vocabulary-sized)
    bf = baskets.join(F.broadcast(l1.select("item")), "item").select("bk", "item")
    pairs = (
        bf.alias("x")
        .join(
            bf.alias("y"),
            (F.col("x.bk") == F.col("y.bk")) & (F.col("x.item") < F.col("y.item")),
        )
        .select(
            F.col("x.bk").alias("bk"),
            F.col("x.item").alias("i1"),
            F.col("y.item").alias("i2"),
        )
        .persist()
    )
    l2 = (
        pairs.groupBy("i1", "i2")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= thr)
        .persist()
    )
    out = out.unionAll(
        l2.select(F.lit(2).alias("sz"), "i1", "i2", nul.alias("i3"), "support")
    )
    if max_size == 2:
        return out

    # triples: extend each frequent-pair occurrence by a third in-basket item,
    # then require BOTH remaining 2-subsets frequent (full Apriori pruning —
    # result-neutral by support monotonicity, work-proportional to survivors)
    pb = pairs.join(F.broadcast(l2.select("i1", "i2")), ["i1", "i2"])
    tri = (
        pb.join(
            bf.alias("z"),
            (F.col("z.bk") == pb["bk"]) & (F.col("z.item") > pb["i2"]),
        )
        .select(pb["bk"], "i1", "i2", F.col("z.item").alias("i3"))
        .join(
            F.broadcast(
                l2.select(F.col("i1").alias("i1"), F.col("i2").alias("i3"))
            ),
            ["i1", "i3"],
        )
        .join(
            F.broadcast(
                l2.select(F.col("i1").alias("i2"), F.col("i2").alias("i3"))
            ),
            ["i2", "i3"],
        )
    )
    l3 = (
        tri.groupBy("i1", "i2", "i3")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= thr)
    )
    return out.unionAll(l3.select(F.lit(3).alias("sz"), "i1", "i2", "i3", "support"))
