"""Incremental aggregate maintenance — the materialized-view refresh pattern.

At 100 TB you never recompute a corpus-wide aggregate because one day of
data arrived: you keep the aggregate table and MERGE the new batch's
partial aggregates into it. That works exactly when every measure is
MERGEABLE (count/sum/min/max, and avg carried as sum+count); the refresh
then costs O(|batch| + |affected keys|) instead of O(|history|).

``partial_aggregates`` turns a raw batch into the mergeable shape;
``merge_aggregates`` folds partials into the base table. Both are pure
DataFrame ops: the batch aggregate is map-side combined, and the merge is
a key-grouped union — Catalyst plans one exchange on the group keys, and
when the base table is bucketed by those keys (sinks.write_bucketed_table)
the exchange disappears on the base side.

Reference analog: hatchery's per-poll destination counters accumulate
across ticks (pipeline/pipeline.go:74) — this is that pattern generalized
to keyed aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: measure kind → (partial expression builder, merge expression builder)
_MERGEABLE = {
    "count": (
        lambda col: F.count(F.lit(1)),
        lambda name: F.sum(name),
    ),
    "sum": (
        lambda col: F.sum(col),
        lambda name: F.sum(name),
    ),
    "min": (
        lambda col: F.min(col),
        lambda name: F.min(name),
    ),
    "max": (
        lambda col: F.max(col),
        lambda name: F.max(name),
    ),
}


def partial_aggregates(
    batch: DataFrame, keys: list[str], measures: dict[str, tuple[str, str]]
) -> DataFrame:
    """Aggregate one batch into the mergeable shape.

    ``measures``: output name → (kind, source column); kind ∈ count/sum/
    min/max. An average is expressed as a sum measure plus a count measure
    and divided at read time — the classic mergeable-avg decomposition.
    """
    aggs = []
    for name, (kind, col) in measures.items():
        if kind not in _MERGEABLE:
            raise ValueError(f"measure kind {kind!r} is not mergeable")
        aggs.append(_MERGEABLE[kind][0](col).alias(name))
    return batch.groupBy(*keys).agg(*aggs)


def merge_aggregates(
    base: DataFrame, partial: DataFrame, keys: list[str],
    measures: dict[str, tuple[str, str]],
) -> DataFrame:
    """Fold a batch's partial aggregates into the base aggregate table:
    unionByName + one key-grouped merge agg. Keys present only in the
    batch appear; keys untouched by the batch pass through unchanged
    (their single base row is the group)."""
    merged = []
    for name, (kind, _col) in measures.items():
        merged.append(_MERGEABLE[kind][1](name).alias(name))
    return base.unionByName(partial).groupBy(*keys).agg(*merged)
