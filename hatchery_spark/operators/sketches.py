"""Hand-rolled mergeable sketches: HyperLogLog and count-min.

At 10^12 turns the pipeline's "how many distinct actors / how hot is
this resource" questions can't afford exact distincts per window, and
the built-in ``approx_count_distinct`` (used by profile.py) is opaque —
its registers can't be persisted, merged across days, or replayed by an
oracle.  These are the explicit versions:

* **HyperLogLog** (Flajolet et al. 2007) — the register table
  ``(group, reg, M)`` is a plain DataFrame: build it per partition /
  per day, store it, and merge two epochs with ``groupBy(reg).max(M)``
  — that mergeability is the whole point at 100 TB (sketch once,
  combine forever; the raw keys never move again).
* **Count-min** (Cormode & Muthukrishnan 2005) — ``d`` rows × ``w``
  counters as ``(r, col, c)`` rows; merging epochs is ``sum(c)``;
  a point estimate is ``min`` over the ``d`` probes, an upper bound
  with one-sided error.

Hash = positional slices of ``md5`` (32 bits each), the repo-standard
oracle-replayable hash (xxhash64 has no DuckDB twin).  The HLL rank
``rho`` is computed as ``24 - length(bin(w))`` — Spark and DuckDB both
render ``bin()`` without leading zeros, so the oracle replays the
register table bit-for-bit, and the estimator's only float ops are one
division (or ``m·ln(m/V)`` on the linear-counting branch), pinned with
``round(…, 4)``.

Plan shape: sketch build is one partially-aggregated ``groupBy`` whose
key space is the register/counter grid (m or d·w rows per group —
corpus-independent), so map-side combine collapses each partition
before the shuffle; estimates then run on sketch-sized data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HLL_P = 9  # 2^9 = 512 registers
CMS_D = 4
CMS_W = 256


def _md5_slice_long(col: Column, s: int = 0) -> Column:
    """Hex chars [8s, 8s+8) of md5(col) as a 32-bit value in a long."""
    return F.conv(F.substring(F.md5(col), 8 * s + 1, 8), 16, 10).cast("long")


def _hex_slice_sql(expr: str, s: int = 0) -> str:
    """DuckDB replay of :func:`_md5_slice_long` (no conv() there)."""
    digits = "0123456789abcdef"
    return " + ".join(
        f"(strpos('{digits}', substr(md5({expr}), {8 * s + i + 1}, 1)) - 1)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )


# --------------------------------------------------------------- HLL --


def hll_registers(
    df: DataFrame, key_col: str, group_cols: list[str], p: int = HLL_P
) -> DataFrame:
    """Mergeable register table ``(…group, reg, m_rank)``.  Merging two
    epochs = union → groupBy(reg).max(m_rank)."""
    wbits = 32 - p
    h = _md5_slice_long(F.col(key_col))
    reg = F.shiftright(h, wbits)
    w = h - F.shiftleft(reg, wbits)
    rho = F.when(w == 0, F.lit(wbits + 1)).otherwise(
        F.lit(wbits + 1) - F.length(F.bin(w))
    )
    return (
        df.select(*group_cols, reg.alias("reg"), rho.alias("rho"))
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").alias("m_rank"))
    )


def hll_estimate(
    regs: DataFrame, group_cols: list[str], p: int = HLL_P
) -> DataFrame:
    """Per-group cardinality estimate from a register table:
    ``(…group, v_zero, scaled_sum, estimate)``.  ``scaled_sum`` is the
    EXACT integer ``2^(wbits+1) · Σ 2^-M`` (absent registers count as
    2^0), so the only float op is the final estimator — deterministic
    across engines."""
    wbits = 32 - p
    m = 1 << p
    scale = 1 << (wbits + 1)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_regs"),
        F.sum(
            # shiftleft() in PySpark only takes a literal shift — go via expr
            F.expr(f"shiftleft(cast(1 AS bigint), {wbits + 1} - m_rank)")
        ).alias("present_sum"),
    )
    v_zero = (F.lit(m) - F.col("n_regs")).alias("v_zero")
    scaled = (F.col("present_sum") + (F.lit(m) - F.col("n_regs")) * F.lit(scale)).alias(
        "scaled_sum"
    )
    out = agg.select(*group_cols, v_zero, scaled)
    raw = F.lit(alpha * m * m * scale) / F.col("scaled_sum")
    lc = F.lit(m) * F.log(F.lit(m) / F.col("v_zero"))
    est = F.when((raw <= 2.5 * m) & (F.col("v_zero") > 0), lc).otherwise(raw)
    return out.withColumn("estimate", F.round(est, 4))


def hll_oracle_sql(
    source_sql: str,
    key_expr: str,
    group_expr: str,
    p: int = HLL_P,
) -> str:
    """DuckDB replay of registers + estimator over ``source_sql`` (must
    yield the key/group exprs)."""
    wbits = 32 - p
    m = 1 << p
    scale = 1 << (wbits + 1)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return f"""
        WITH src AS ({source_sql}),
        h AS (
          SELECT {group_expr} AS grp,
                 ({_hex_slice_sql(key_expr)}) AS h32
          FROM src),
        rr AS (
          SELECT grp, h32 >> {wbits} AS reg,
                 h32 - ((h32 >> {wbits}) << {wbits}) AS w
          FROM h),
        regs AS (
          SELECT grp, reg,
                 max(CASE WHEN w = 0 THEN {wbits + 1}
                     ELSE {wbits + 1} - length(bin(w)) END) AS m_rank
          FROM rr GROUP BY grp, reg),
        agg AS (
          SELECT grp, count(*) AS n_regs,
                 sum((cast(1 AS bigint) << ({wbits + 1} - m_rank))) AS present_sum
          FROM regs GROUP BY grp),
        est AS (
          SELECT grp,
                 cast({m} - n_regs AS bigint) AS v_zero,
                 cast(present_sum + ({m} - n_regs) * {scale} AS bigint)
                   AS scaled_sum
          FROM agg)
        SELECT grp, v_zero, scaled_sum,
               round(CASE WHEN {alpha * m * m * scale!r} / scaled_sum
                               <= {2.5 * m} AND v_zero > 0
                     THEN {m} * ln({m} / v_zero)
                     ELSE {alpha * m * m * scale!r} / scaled_sum END,
                     4) AS estimate
        FROM est"""


# --------------------------------------------------------- count-min --


def cms_sketch(
    df: DataFrame, key_col: str, d: int = CMS_D, w: int = CMS_W
) -> DataFrame:
    """Counter table ``(r, col, c)`` — d·w rows total.  Merging epochs =
    union → groupBy(r, col).sum(c)."""
    rows = [
        df.select(
            F.lit(r).alias("r"),
            F.pmod(_md5_slice_long(F.col(key_col), r), F.lit(w)).alias("col"),
        )
        for r in range(d)
    ]
    allrows = rows[0]
    for extra in rows[1:]:
        allrows = allrows.unionAll(extra)
    return allrows.groupBy("r", "col").agg(F.count(F.lit(1)).alias("c"))


def cms_query(
    sketch: DataFrame, keys: DataFrame, key_col: str, d: int = CMS_D, w: int = CMS_W
) -> DataFrame:
    """Point estimates for each key: min over the d probes (broadcast
    the d·w-row sketch, never shuffle the keys)."""
    probes = keys.select(
        key_col,
        *[
            F.pmod(_md5_slice_long(F.col(key_col), r), F.lit(w)).alias(f"col{r}")
            for r in range(d)
        ],
    )
    out = probes
    for r in range(d):
        side = F.broadcast(
            sketch.where(F.col("r") == r).select(
                F.col("col").alias(f"col{r}"), F.col("c").alias(f"c{r}")
            )
        )
        out = out.join(side, f"col{r}", "left")
    est = F.least(*[F.coalesce(F.col(f"c{r}"), F.lit(0)) for r in range(d)])
    return out.select(key_col, est.alias("cms_count"))


def cms_oracle_sql(
    source_sql: str, key_expr: str, d: int = CMS_D, w: int = CMS_W
) -> str:
    """DuckDB replay: per-key true count + min-over-probes estimate,
    same md5-slice hashes."""
    slices = ", ".join(
        f"({_hex_slice_sql('k', r)}) % {w} AS col{r}" for r in range(d)
    )
    counters = ",\n        ".join(
        f"c{r} AS (SELECT col{r}, count(*) AS n{r} FROM hashed GROUP BY col{r})"
        for r in range(d)
    )
    joins = " ".join(f"JOIN c{r} USING (col{r})" for r in range(d))
    least = ", ".join(f"n{r}" for r in range(d))
    return f"""
        WITH src AS ({source_sql}),
        keyed AS (SELECT {key_expr} AS k FROM src),
        hashed AS (SELECT k, {slices} FROM keyed),
        {counters},
        dk AS (SELECT k, {", ".join(f"col{r}" for r in range(d))},
                      count(*) AS true_n
               FROM hashed GROUP BY ALL)
        SELECT dk.k AS key, dk.true_n, least({least}) AS cms_count
        FROM dk {joins}"""


# --------------------------------------------------- HDR histogram --

HDR_SUB_BITS = 3  # 2^3 sub-buckets per power of two → ≤ ~12.5% rel. error


def hdr_buckets(
    df: DataFrame,
    value_expr: Column,
    group_cols: list[str],
    sub_bits: int = HDR_SUB_BITS,
) -> DataFrame:
    """HDR-histogram bucket table ``(group…, lo, hi, c)`` (Tene's
    HdrHistogram bucketing, hdrhistogram.org): values below
    ``2^(sub_bits+1)`` are exact unit buckets; above, each power-of-two
    range splits into ``2^sub_bits`` linear sub-buckets, so relative
    error is bounded by ``2^-sub_bits`` at every magnitude.

    Everything is integer bit arithmetic — ``floor(log2 v)`` comes from
    ``length(bin(v)) - 1`` (both engines render bin() without leading
    zeros) — so the bucket table and the quantile read-out replay
    tie-free in the oracle.  Like the HLL/CMS tables above, epochs merge
    with ``groupBy(lo, hi).sum(c)``: the bucket grid is value-range-
    bounded (~64·2^sub_bits rows per group), never corpus-sized, and the
    build is ONE map-side-combined groupBy.
    """
    v = value_expr.alias("v")
    small = 1 << (sub_bits + 1)
    based = df.select(*group_cols, v)
    lo = F.expr(
        f"CASE WHEN v < {small} THEN v ELSE "
        f"shiftleft(shiftright(v, length(bin(v)) - 1 - {sub_bits}),"
        f" length(bin(v)) - 1 - {sub_bits}) END"
    )
    hi = F.expr(
        f"CASE WHEN v < {small} THEN v ELSE "
        f"shiftleft(shiftright(v, length(bin(v)) - 1 - {sub_bits}),"
        f" length(bin(v)) - 1 - {sub_bits})"
        f" + shiftleft(1, length(bin(v)) - 1 - {sub_bits}) - 1 END"
    )
    return based.select(*group_cols, lo.alias("lo"), hi.alias("hi")).groupBy(
        *group_cols, "lo", "hi"
    ).agg(F.count(F.lit(1)).alias("c"))


def hdr_quantiles(
    buckets: DataFrame,
    group_cols: list[str],
    qs_permille: tuple[int, ...] = (500, 900, 990),
) -> DataFrame:
    """Quantile read-out from an HDR bucket table: per group, the first
    bucket (by lo) whose cumulative count reaches ``ceil(q·n/1000)``,
    reported as the bucket midpoint.  Runs on sketch-sized data — the
    window and aggregate shuffle bucket rows, not events."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*group_cols)
        .orderBy("lo")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = buckets.select(
        *group_cols,
        "lo",
        "hi",
        "c",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(Window.partitionBy(*group_cols)).alias("n"),
    )
    mid = F.expr("(lo + hi) DIV 2")
    aggs = [F.max("n").alias("n")]
    for q in qs_permille:
        rank = F.expr(f"({q} * n + 999) DIV 1000")
        aggs.append(
            F.min(F.when(F.col("cum") >= rank, mid)).alias(f"p{q}_est")
        )
    return cum.groupBy(*group_cols).agg(*aggs)


def hdr_oracle_sql(
    source_sql: str,
    value_expr: str,
    group_expr: str,
    sub_bits: int = HDR_SUB_BITS,
    qs_permille: tuple[int, ...] = (500, 900, 990),
) -> str:
    """DuckDB replay of hdr_buckets → hdr_quantiles."""
    small = 1 << (sub_bits + 1)
    sh = f"length(bin(v)) - 1 - {sub_bits}"
    picks = ",\n       ".join(
        f"min(CASE WHEN cum >= ({q} * n + 999) // 1000"
        f" THEN (lo + hi) // 2 END) AS p{q}_est"
        for q in qs_permille
    )
    return f"""
WITH src AS ({source_sql}),
vals AS (SELECT {group_expr} AS g, {value_expr} AS v FROM src),
b AS (SELECT g,
        CASE WHEN v < {small} THEN v
             ELSE (v >> ({sh})) << ({sh}) END AS lo,
        CASE WHEN v < {small} THEN v
             ELSE ((v >> ({sh})) << ({sh})) + (1 << ({sh})) - 1 END AS hi,
        count(*) AS c
      FROM vals GROUP BY ALL),
cums AS (SELECT g, lo, hi, c,
         sum(c) OVER (PARTITION BY g ORDER BY lo) AS cum,
         sum(c) OVER (PARTITION BY g) AS n
         FROM b)
SELECT g, cast(max(n) AS bigint) AS n,
       {picks}
FROM cums GROUP BY g"""


# --------------------------------------------------------------- KMV --

KMV_K = 64


def _md5_hash48(col: Column) -> Column:
    """First 12 hex chars of md5 as a 48-bit value in a long — wide enough
    that the (k−1)·2^48 estimator numerator still fits a BIGINT exactly
    (a 64-bit hash would force float division and double's 53-bit mantissa
    cannot hold the numerator)."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long")


def _hash48_sql(expr: str) -> str:
    """DuckDB replay of :func:`_md5_hash48` (no conv() there)."""
    digits = "0123456789abcdef"
    return " + ".join(
        f"(strpos('{digits}', substr(md5({expr}), {i + 1}, 1)) - 1)"
        f" * {16 ** (11 - i)}"
        for i in range(12)
    )


def kmv_sketch(df: DataFrame, key_col: Column, group_cols: list[str], k: int = KMV_K) -> DataFrame:
    """K-minimum-values distinct sketch (Bar-Yossef et al. 2002): the k
    smallest DISTINCT 48-bit hashes per group, as plain ``(…group, h)``
    rows — k·8 bytes per group, mergeable forever.

    Plan shape: distinct is one partially-aggregated shuffle; the rank cut
    plans as WindowGroupLimit, so each input partition forwards at most k
    hashes per group before the exchange — a whale group moves k rows per
    task, not its cardinality."""
    from pyspark.sql import Window

    d = df.select(*group_cols, _md5_hash48(key_col).alias("h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("h")
    return d.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k).drop("rn")


def kmv_merge(a: DataFrame, b: DataFrame, group_cols: list[str], k: int = KMV_K) -> DataFrame:
    """Merge two epoch sketches: union → distinct → keep k smallest again.
    ``merge(sketch(A), sketch(B)) == sketch(A ∪ B)`` exactly (pytest-pinned),
    because the k smallest of a union are a subset of each side's k smallest."""
    from pyspark.sql import Window

    u = a.unionByName(b).distinct()
    w = Window.partitionBy(*group_cols).orderBy("h")
    return u.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k).drop("rn")


def kmv_estimate(sketch: DataFrame, group_cols: list[str], k: int = KMV_K) -> DataFrame:
    """Distinct-count estimate per group: exact when the group filled fewer
    than k slots, else the classic (k−1)·2^48 / h_k — ALL integer (BIGINT
    div), so the oracle replays it bit-for-bit."""
    num = (k - 1) << 48
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("sketch_n"),
        F.max("h").alias("hk"),
    )
    est = F.when(F.col("sketch_n") < k, F.col("sketch_n")).otherwise(
        F.expr(f"{num} div hk")
    )
    return agg.select(*group_cols, "sketch_n", est.cast("long").alias("est_distinct"))


def kmv_oracle_sql(src_sql: str, key_expr: str, group_expr: str, k: int = KMV_K) -> str:
    num = (k - 1) << 48
    return f"""
        WITH hashed AS (
          SELECT DISTINCT {group_expr} AS g, {_hash48_sql(key_expr)} AS h
          FROM ({src_sql})),
        ranked AS (
          SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
          FROM hashed),
        agg AS (
          SELECT g, count(*) AS sketch_n, max(h) AS hk
          FROM ranked WHERE rn <= {k} GROUP BY g)
        SELECT g, cast(sketch_n AS bigint) AS sketch_n,
               cast(CASE WHEN sketch_n < {k} THEN sketch_n
                         ELSE {num} // hk END AS bigint) AS est_distinct
        FROM agg"""


MG_K = 16
MG_SHARDS = 8


def mg_sketch(
    df: DataFrame, key: Column, shard: Column, k: int = MG_K
) -> DataFrame:
    """Misra-Gries heavy-hitter summary per shard (Misra & Gries 1982,
    in the mergeable-summaries form of Agarwal et al., PODS'12): exact
    per-shard counts → keep the k largest counters reduced by the
    (k+1)-th largest, drop the rest. Each reduction undercounts every
    key by AT MOST the subtracted value, and the subtraction total is
    carried as an exact ``deficit`` column — the sketch certifies its
    own error bound (est ≤ true ≤ est + Σ deficits), unlike count-min's
    probabilistic one-sided bound.

    Arrival-order-free by construction: classic MG is order-dependent
    (a streaming counter eviction), but summarizing EXACT shard counts
    dominates any arrival order — deterministic, hence replayable.

    Plan shape: one partially-aggregated (shard, key) groupBy; the rank
    cut is a shard-partitioned window (WindowGroupLimit forwards ≤ k+1
    rows per shard per task). Output ≤ k rows + 1 deficit per shard.
    """
    counts = df.groupBy(shard.alias("shard"), key.alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("shard").orderBy(F.col("c").desc(), F.col("key"))
    r = counts.withColumn("rn", F.row_number().over(w))
    cut = r.where(F.col("rn") == k + 1).select(
        "shard", F.col("c").alias("cut")
    )
    return (
        r.where(F.col("rn") <= k)
        .join(cut, "shard", "left")
        .select(
            "shard",
            "key",
            (F.col("c") - F.coalesce(F.col("cut"), F.lit(0))).alias("c"),
            F.coalesce(F.col("cut"), F.lit(0)).alias("deficit"),
        )
        .where(F.col("c") > 0)
    )


def mg_merge_all(sketch: DataFrame, k: int = MG_K) -> DataFrame:
    """Merge every shard summary into one MG-k summary: sum counters per
    key, keep the k largest reduced by the (k+1)-th, accumulate the
    total deficit (shard deficits + the merge's own subtraction).

    The global window runs on SKETCH-SIZED data (≤ shards·k rows —
    corpus-independent), so the single-reducer sort is a constant-cost
    tail, the same shape as the repo's other post-aggregate grids.
    Returns (key, est, deficit) — ``deficit`` identical on every row:
    for every key, est ≤ true_count ≤ est + deficit.
    """
    from pyspark.sql import Window

    shard_def = (
        sketch.groupBy("shard")
        .agg(F.max("deficit").alias("d"))
        .agg(F.coalesce(F.sum("d"), F.lit(0)).cast("long").alias("d0"))
    )
    summed = sketch.groupBy("key").agg(F.sum("c").cast("long").alias("c"))
    w = Window.orderBy(F.col("c").desc(), F.col("key"))
    r = summed.withColumn("rn", F.row_number().over(w))
    cut = r.where(F.col("rn") == k + 1).select(F.col("c").alias("cut"))
    cut1 = cut.agg(
        F.coalesce(F.max("cut"), F.lit(0)).cast("long").alias("cut")
    )
    return (
        r.where(F.col("rn") <= k)
        .crossJoin(F.broadcast(shard_def))
        .crossJoin(F.broadcast(cut1))
        .select(
            "key",
            (F.col("c") - F.col("cut")).alias("est"),
            (F.col("d0") + F.col("cut")).alias("deficit"),
        )
        .where(F.col("est") > 0)
    )


def mg_oracle_sql(
    src_sql: str,
    key_expr: str,
    shard_hex_expr: str,
    shards: int = MG_SHARDS,
    k: int = MG_K,
) -> str:
    """DuckDB replay of shard → summarize → merge → certify.
    ``shard_hex_expr`` must yield the 8-hex-char md5 prefix whose
    positional decode mod ``shards`` is the shard id."""
    from hatchery_spark.plans.driver_queries import _hex_decode_terms

    return f"""
        WITH src AS ({src_sql}),
        rows_in AS (
          SELECT {key_expr} AS key,
                 ({_hex_decode_terms(f"({shard_hex_expr})")}) % {shards}
                   AS shard
          FROM src),
        counts AS (
          SELECT shard, key, cast(count(*) AS bigint) AS c
          FROM rows_in GROUP BY shard, key),
        ranked AS (
          SELECT *, row_number() OVER (
            PARTITION BY shard ORDER BY c DESC, key) AS rn
          FROM counts),
        cuts AS (
          SELECT shard, c AS cut FROM ranked WHERE rn = {k + 1}),
        shard_sk AS (
          SELECT r.shard, r.key, r.c - coalesce(t.cut, 0) AS c,
                 coalesce(t.cut, 0) AS deficit
          FROM ranked r LEFT JOIN cuts t ON r.shard = t.shard
          WHERE r.rn <= {k} AND r.c - coalesce(t.cut, 0) > 0),
        d0 AS (
          SELECT coalesce(sum(d), 0) AS d0 FROM (
            SELECT shard, max(deficit) AS d FROM shard_sk GROUP BY shard)),
        summed AS (
          SELECT key, cast(sum(c) AS bigint) AS c
          FROM shard_sk GROUP BY key),
        g_ranked AS (
          SELECT *, row_number() OVER (ORDER BY c DESC, key) AS rn
          FROM summed),
        g_cut AS (
          SELECT coalesce(max(c), 0) AS cut FROM g_ranked
          WHERE rn = {k + 1}),
        merged AS (
          SELECT key, c - g_cut.cut AS est,
                 d0.d0 + g_cut.cut AS deficit
          FROM g_ranked, g_cut, d0
          WHERE rn <= {k} AND c - g_cut.cut > 0),
        exact AS (
          SELECT key, cast(count(*) AS bigint) AS true_n
          FROM rows_in GROUP BY key)
        SELECT m.key, cast(m.est AS bigint) AS est,
               cast(m.deficit AS bigint) AS deficit,
               e.true_n,
               m.est <= e.true_n AS lower_ok,
               e.true_n <= m.est + m.deficit AS upper_ok
        FROM merged m JOIN exact e ON m.key = e.key"""


# ----------------------------------------------------- KMV set operations


def kmv_theta_setops(
    a: DataFrame, b: DataFrame, key_a: Column, key_b: Column, k: int = 64
) -> DataFrame:
    """Theta-sketch-style SET OPERATIONS on two KMV sketches (the
    DataSketches union/intersection/difference idiom, Dasgupta et al.):
    build the k-minimum-values sketch of each side, take
    θ = min(θ_A, θ_B) where θ_X = h_k when the sketch filled its k slots
    (else 2^48 — the sketch IS the set), keep each side's hashes below θ,
    and estimate every region as ``count · 2^48 div θ`` — which degrades
    to the EXACT count when θ = 2^48, so small sets need no special case.

    All arithmetic is BIGINT (48-bit hashes keep count·2^48 inside int64),
    md5-based — any engine replays the estimates bit-for-bit.

    Returns ONE row: (est_a, est_b, est_union, est_inter, est_a_only,
    est_b_only). Scale shape: two sketch builds (distinct + windowed top-k
    per partition — WindowGroupLimit forwards ≤k rows per task), then all
    set logic runs on ≤2k rows."""
    # global (ungrouped) k-min: orderBy().limit(k) plans as
    # TakeOrderedAndProject — each partition forwards only its local k
    # minima; the windowed kmv_sketch form would single-partition a global
    # window here
    sa = (
        a.select(_md5_hash48(key_a.cast("string")).alias("ha"))
        .distinct().orderBy("ha").limit(k)
    )
    sb = (
        b.select(_md5_hash48(key_b.cast("string")).alias("hb"))
        .distinct().orderBy("hb").limit(k)
    )
    full = 1 << 48
    ta = sa.agg(
        F.when(F.count(F.lit(1)) < k, F.lit(full)).otherwise(F.max("ha"))
        .alias("theta_a")
    )
    tb = sb.agg(
        F.when(F.count(F.lit(1)) < k, F.lit(full)).otherwise(F.max("hb"))
        .alias("theta_b")
    )
    both = (
        sa.join(sb, sa["ha"] == sb["hb"], "full_outer")
        .crossJoin(F.broadcast(ta))
        .crossJoin(F.broadcast(tb))
        .withColumn("theta", F.least("theta_a", "theta_b"))
        .withColumn("h", F.coalesce("ha", "hb"))
        .where(F.col("h") < F.col("theta"))
    )
    counts = both.groupBy("theta").agg(
        F.sum(F.col("ha").isNotNull().cast("long")).alias("c_a"),
        F.sum(F.col("hb").isNotNull().cast("long")).alias("c_b"),
        F.count(F.lit(1)).alias("c_union"),
        F.sum((F.col("ha").isNotNull() & F.col("hb").isNotNull()).cast("long"))
        .alias("c_inter"),
        F.sum((F.col("ha").isNotNull() & F.col("hb").isNull()).cast("long"))
        .alias("c_a_only"),
        F.sum((F.col("hb").isNotNull() & F.col("ha").isNull()).cast("long"))
        .alias("c_b_only"),
    )
    # BIGINT div keeps the count·2^48 numerator exact (double floor-division
    # would round at 2^53)
    return counts.select(
        *[
            F.expr(f"cast((c_{r} * {full}) div theta as bigint)").alias(f"est_{r}")
            for r in ("a", "b", "union", "inter", "a_only", "b_only")
        ]
    )


def theta_setops_oracle_sql(
    a_sql: str, b_sql: str, key_a: str, key_b: str, k: int = 64
) -> str:
    """DuckDB replay of kmv_theta_setops for sources given as SQL text."""
    full = 1 << 48
    return f"""
WITH sa AS (SELECT h FROM (
  SELECT h, row_number() OVER (ORDER BY h) AS rn FROM (
    SELECT DISTINCT {_hash48_sql(key_a)} AS h FROM ({a_sql}))) WHERE rn <= {k}),
sb AS (SELECT h FROM (
  SELECT h, row_number() OVER (ORDER BY h) AS rn FROM (
    SELECT DISTINCT {_hash48_sql(key_b)} AS h FROM ({b_sql}))) WHERE rn <= {k}),
ta AS (SELECT CASE WHEN count(*) < {k} THEN {full} ELSE max(h) END AS theta_a
       FROM sa),
tb AS (SELECT CASE WHEN count(*) < {k} THEN {full} ELSE max(h) END AS theta_b
       FROM sb),
j AS (SELECT sa.h AS ha, sb.h AS hb FROM sa FULL OUTER JOIN sb ON sa.h = sb.h),
f AS (SELECT ha, hb, least(theta_a, theta_b) AS theta,
             coalesce(ha, hb) AS h
      FROM j, ta, tb)
SELECT cast(sum(CASE WHEN ha IS NOT NULL THEN 1 ELSE 0 END) * {full}
            // any_value(theta) AS bigint) AS est_a,
       cast(sum(CASE WHEN hb IS NOT NULL THEN 1 ELSE 0 END) * {full}
            // any_value(theta) AS bigint) AS est_b,
       cast(count(*) * {full} // any_value(theta) AS bigint) AS est_union,
       cast(sum(CASE WHEN ha IS NOT NULL AND hb IS NOT NULL THEN 1 ELSE 0 END)
            * {full} // any_value(theta) AS bigint) AS est_inter,
       cast(sum(CASE WHEN ha IS NOT NULL AND hb IS NULL THEN 1 ELSE 0 END)
            * {full} // any_value(theta) AS bigint) AS est_a_only,
       cast(sum(CASE WHEN hb IS NOT NULL AND ha IS NULL THEN 1 ELSE 0 END)
            * {full} // any_value(theta) AS bigint) AS est_b_only
FROM f WHERE h < theta"""
