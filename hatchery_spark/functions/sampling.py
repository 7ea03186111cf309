"""Deterministic sampling + sequence packing for training-data curation.

Both are pure pyspark.sql expressions (no Python on the hot path) and both are
deterministic functions of the DATA, not of partitioning or row order — the
same rows are selected on 8 executors or 1000, which is what makes a sampled
training set reproducible across cluster sizes. (`df.sample()` is seeded
per-partition, so its output changes whenever partitioning changes — useless
as a stable curation step.)

  * deterministic_sample — keep rows whose md5(key) prefix falls under the
    rate threshold. Uniform over the key distribution, stable under
    repartition, and expressible in any engine with md5 (oracle-checkable).
  * stratified_sample   — per-stratum quota: rank rows inside each stratum by
    md5(key) (a deterministic pseudo-random order) and keep the first n.
    The shuffle is one hash partition on the stratum column.
  * pack_sequences      — greedy offset packing: within each group, docs are
    laid end-to-end in a deterministic order and a doc is assigned to the bin
    its FIRST token lands in (bin = floor(start_offset / budget)). One window
    (running sum) — no iteration; a doc may straddle a bin boundary, which is
    the standard streaming-packing approximation (exact first-fit needs
    sequential state and buys <1% fill at web scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sample_threshold(rate: float) -> str:
    """md5-prefix threshold for a given sample rate (0..1).

    Compared as STRINGS against a 4-char hex prefix, so the rate-1.0 bound
    must sort above every hex string — "10000" would not ('f' > '1'
    lexicographically, which would keep only ~1/16 of rows); 'g' sorts above
    any hex character and keeps everything.
    """
    n = max(0, min(65536, round(rate * 65536)))
    return "g" if n >= 65536 else format(n, "04x")


def deterministic_sample(
    df: DataFrame, rate: float, key_col: str = "text"
) -> DataFrame:
    """Keep ~rate of rows, chosen by md5(key) prefix — stable under
    repartition/cluster size, unlike df.sample()."""
    return df.filter(F.substring(F.md5(F.col(key_col)), 1, 4) < sample_threshold(rate))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    key_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-stratum quota sample: first n rows of each stratum in deterministic
    md5(key) order (id as tiebreak). Adds sample_rank (1-based).

    NULL keys hash as md5('') rather than sorting as NULL: Spark windows sort
    NULLS FIRST ascending while ANSI-SQL ORDER BY engines (the DuckDB oracle)
    default to NULLS LAST, so a bare md5(key) would select different rows per
    engine on data with NULL text. coalesce pins one cross-engine order."""
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.coalesce(F.col(key_col), F.lit(""))), F.col(id_col)
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("sample_rank") <= n_per_stratum)
    )


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    key_col: str = "text",
    default_rate: float = 0.0,
) -> DataFrame:
    """Data-mixing: sample each source at its own rate (the mixture-weights
    step of every pretraining corpus — e.g. upweight books, downsample web).

    The per-source thresholds compile to a literal MAP in the projection —
    no join, no broadcast, no shuffle; the filter is a pure codegen'd row
    predicate that pushes down like any other. Selection is md5-keyed like
    `deterministic_sample`, so it is stable under repartition/cluster size
    AND nested across rates: the rows kept at rate r are a subset of those
    kept at any r' > r — raising one source's weight only ADDS documents,
    which makes incremental mixture re-tuning reproducible (no churn in the
    already-selected set).
    """
    mapping = F.create_map(
        *[
            x
            for s, r in rates.items()
            for x in (F.lit(s), F.lit(sample_threshold(r)))
        ]
    )
    thr = F.coalesce(
        F.try_element_at(mapping, F.col(source_col)),
        F.lit(sample_threshold(default_rate)),
    )
    # NULL keys hash as md5('') instead of propagating NULL through the
    # comparison (which would silently drop the row even at rate 1.0) —
    # same pin as stratified_sample
    key = F.md5(F.coalesce(F.col(key_col), F.lit("")))
    return df.filter(F.substring(key, 1, 4) < thr)


def temperature_sample(
    df: DataFrame,
    alpha: float = 0.5,
    target_frac: float = 0.25,
    source_col: str = "source",
    key_col: str = "text",
    id_col: str = "doc_id",
    weight=None,
) -> DataFrame:
    """Temperature-based mixture sampling: per-source rates ∝ n_s^alpha.

    The multilingual/multi-domain balancing rule (mBERT/XLM-R style,
    Conneau et al. arXiv:1911.02116 §3): sample source s with probability
    proportional to n_s^alpha, so alpha=1 preserves the natural mix,
    alpha=0 equalizes sources, and 0<alpha<1 upweights the tail. The
    expected output size is target_frac · N rows split across sources by
    the tempered weights; a source whose quota exceeds its size is kept
    whole (rate capped at 1).

    Unlike `mixture_sample` the rates are COMPUTED FROM THE DATA: one
    vocabulary-sized count aggregate → tempered weight → per-source rate,
    joined back as a forced broadcast (the frame has one row per source).
    Selection stays md5-keyed — deterministic, cluster-size-stable, and
    nested in rate like every other sampler here. Output adds the applied
    `rate` (rounded) for audit.

    Pass `weight` (a Column, e.g. a token count) to budget in TOKEN MASS
    instead of documents: n_s becomes sum(weight) per source, so the
    tempered quotas and target_frac apply to what a training run actually
    consumes — expected sampled mass per source is rate_s · T_s with the
    same ∝ T_s^alpha split (docs are still the sampling unit; selection
    stays md5-keyed and nested).
    """
    mass = F.count(F.lit(1)) if weight is None else F.sum(weight)
    by_src = df.groupBy(source_col).agg(mass.alias("n_s"))
    stats = by_src.agg(
        F.sum(F.pow("n_s", F.lit(alpha))).alias("z"),
        F.sum("n_s").alias("n_total"),
    )
    weights = by_src.crossJoin(F.broadcast(stats)).select(
        source_col,
        F.least(
            F.lit(1.0),
            F.lit(target_frac)
            * F.col("n_total")
            * F.pow("n_s", F.lit(alpha))
            / F.col("z")
            / F.col("n_s"),
        ).alias("rate"),
    )
    # 4-hex md5-prefix threshold, the package-wide sampling convention
    # (sample_threshold), computed in-column: 'g' sorts above any hex char
    # so rate 1.0 keeps everything
    n16 = F.round(F.col("rate") * 65536).cast("int")
    thr = F.when(n16 >= 65536, F.lit("g")).otherwise(
        F.lpad(F.lower(F.hex(n16)), 4, "0")
    )
    key = F.md5(F.coalesce(F.col(key_col), F.lit("")))
    return (
        df.join(F.broadcast(weights), source_col)
        .filter(F.substring(key, 1, 4) < thr)
        .withColumn("rate", F.round("rate", 6))
    )


def shuffle_for_training(
    df: DataFrame,
    salt: str = "",
    key_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic global shuffle for training-data serving order.

    Pre-training readers consume shards sequentially, so the corpus must be
    written in a random-but-reproducible global order (same order at any
    cluster size, re-shuffleable per epoch by changing `salt`). The order
    key is md5(salt ‖ key): range-partition on it, sort within partitions —
    a total order across output files WITHOUT a single-reducer global sort;
    each task sorts its own range and file k precedes file k+1 entirely.
    repartitionByRange samples the key distribution (md5 is uniform, so
    ranges balance) — the standard Spark total-order-write shape.
    """
    shuffled = df.withColumn(
        "_shuffle_key", F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    )
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return shuffled.repartitionByRange(n, "_shuffle_key").sortWithinPartitions(
        "_shuffle_key"
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign each doc to a token-budget bin within its group.

    Docs are ordered by id inside the group; doc i starts at the running token
    offset of docs before it and lands in bin floor(offset / budget). Adds
    (bin_id, bin_offset). One running-sum window per group — the shuffle is a
    single hash partition on group_col; at scale, groups are the unit of
    parallelism so no global coordination exists.
    """
    w = Window.partitionBy(group_col).orderBy(id_col)
    offset = F.coalesce(
        F.sum(token_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    return df.withColumn("bin_offset", offset.cast("long")).withColumn(
        "bin_id", F.floor(F.col("bin_offset") / F.lit(budget)).cast("int")
    )


def group_split(
    df: DataFrame,
    group_col: str,
    fractions: dict[str, float],
    salt: str = "",
) -> DataFrame:
    """Leakage-safe train/val/test assignment: every row of a GROUP lands in
    the same split, so near-duplicates that share the group key (a domain,
    a source crawl, a conversation) can never straddle the train/eval
    boundary — the standard contamination guard when row-level random
    splits would leak (Kaggle GroupKFold semantics at corpus scale).

    `fractions` maps split name → target fraction (must sum to ~1). The
    group's md5(salt ‖ group) is mapped to [0, 1) via its first 8 hex chars
    and compared against the cumulative fraction boundaries — a pure
    codegen'd expression per row: NO shuffle, NO group enumeration, stable
    under repartition, re-drawable with `salt`. Groups are atomic, so
    realized fractions converge to the targets only as group count grows
    (one whale group can dominate a split — that is inherent to grouped
    splitting, not this implementation).

    NULL groups form one group of their own (coalesced sentinel), keeping
    NULL-keyed rows together rather than scattering them.
    """
    if not fractions:
        raise ValueError("group_split: fractions must be non-empty")
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"group_split: fractions sum to {total}, expected 1")
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(salt),
                        F.coalesce(F.col(group_col).cast("string"), F.lit("\x00")),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(1 << 32))
    )
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def interleave_sources(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "ep1",
) -> DataFrame:
    """Curriculum/mixture ORDERING: deterministic round-robin interleave
    across sources — position ``(rank_in_source − 1) · S + source_idx`` —
    so a training run sees sources evenly mixed instead of concatenated
    (the data-order analog of temperature mixing; epoch salt reshuffles
    within source).

    Scale shape: per-source rank is ONE window over the source partition
    (shuffled by md5(salt ‖ id), so the within-source order is the
    deterministic training shuffle); the global position is CLOSED-FORM
    arithmetic — no global window, no single reducer. Positions stay a
    valid total order when sources exhaust at different ranks (gaps, not
    collisions). Source index + count ride broadcast frames. Downstream,
    write with repartitionByRange(pos) + sortWithinPartitions (the
    shuffle_for_training pattern) for totally-ordered output files.
    """
    srcs = df.select(source_col).distinct()
    sidx = srcs.select(
        F.col(source_col),
        (F.row_number().over(Window.orderBy(source_col)) - 1).alias("src_idx"),
    )
    n_src = sidx.agg(F.count(F.lit(1)).alias("n_src"))
    shuffle_key = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    rn = F.row_number().over(
        Window.partitionBy(source_col).orderBy(shuffle_key, id_col)
    )
    return (
        df.join(F.broadcast(sidx), source_col)
        .crossJoin(F.broadcast(n_src))
        .select(
            id_col,
            source_col,
            rn.alias("rank_in_source"),
            ((rn - 1).cast("long") * F.col("n_src") + F.col("src_idx")).alias(
                "pos"
            ),
        )
    )


def length_buckets(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Power-of-two length bucketing for padding-efficient batching: docs
    batched within a bucket pad to the bucket ceiling, so padding waste is
    bounded by <2× and attention cost is predictable. Returns per-bucket
    stats (docs, tokens, padding waste) — the planning table a training
    loader consumes. Pure codegen + ONE map-side-combined aggregate."""
    n = F.greatest(
        F.size(F.split(F.coalesce(F.col(text_col), F.lit("")), " ")), F.lit(1)
    )
    bucket = F.ceil(F.log2(n.cast("double"))).cast("int")
    padded = F.pow(F.lit(2.0), bucket.cast("double")).cast("long")
    return (
        df.select(
            bucket.alias("bucket"),
            n.cast("long").alias("n_tokens"),
            (padded - n).cast("long").alias("waste"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("waste").alias("total_waste"),
        )
    )
