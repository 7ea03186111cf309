"""Link-analysis operators for corpus curation: PageRank over a document/host
link graph.

Web-crawl curation pipelines weight documents by the link structure of the
crawl (harmonic centrality / PageRank is a standard quality prior — e.g. the
Common Crawl host-level ranks used by CCNet-style pipelines). The engine-level
requirement is an *iterative* join-agg operator that survives web-scale edge
lists, which neither the reference (hatchery processes each object
independently — destination/gcs/client.go:76) nor vanilla SQL provides.

Scale notes (100 TB / billions of edges):
  * the edge list is the only corpus-sized frame; it is touched once per
    iteration with a shuffle hash join on ``src`` followed by one
    aggregation on ``dst`` — both partition-pruned by AQE, no broadcast of
    anything corpus-sized.
  * the rank frame is node-sized; each iteration materializes it
    (``persist`` + count) so the 3-iteration plan does not re-derive the
    whole lineage per step (classic iterative-algorithm hygiene; for
    hundreds of iterations swap persist for ``localCheckpoint``).
  * the dangling-node mass is ONE row (a global agg) broadcast back via
    crossJoin — O(1) regardless of graph size.

Determinism / oracle replay: the iteration runs in fixed-point BIGINT
arithmetic (see ``pagerank``) — float rounding was NOT enough here, because
rounded ranks divided by small outdegrees land exactly on decimal ties that
Spark's HALF_UP and DuckDB's binary round resolve differently. Integer
div/sum is replayable on any engine with 64-bit integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "connected_components",
    "derive_dense_edges",
    "kcore",
    "derive_component_edges",
    "derive_event_edges",
    "hits",
    "pagerank",
]


def _md5_prefix_long(col):
    """First 8 hex chars of md5(col) as a non-negative BIGINT (≤ 2^32-1, so
    conv's string→long is exact). DuckDB has no conv(); the oracle replays
    the same value with digit-by-digit positional arithmetic."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")


def derive_event_edges(events: DataFrame) -> DataFrame:
    """Deterministic synthetic link graph over the events table: each event
    contributes one directed edge ``user_id -> md5(event_id) % (max_user+1)``
    (self-loops dropped, parallel edges kept — they act as link weights).

    The modulus is data-derived (scalar agg, 1-row broadcast) so the graph
    shape scales with the input instead of hard-coding a node count.
    """
    mx = events.agg((F.max("user_id") + F.lit(1)).alias("m"))
    e = events.crossJoin(F.broadcast(mx)).select(
        F.col("user_id").cast("long").alias("src"),
        F.pmod(_md5_prefix_long(F.col("event_id")), F.col("m")).cast("long").alias("dst"),
    )
    return e.where(F.col("src") != F.col("dst"))


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping_pct: int = 85,
    scale: int = 10**12,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list ``(src, dst)``,
    computed in FIXED-POINT INTEGER arithmetic (ranks scaled by ``scale``):

        r_{t+1}(v) = ((100-p)·S) div (100·N)
                     + (p · (Σ_{u→v} r_t(u) div outdeg(u) + dangling_t div N)) div 100

    Why integers: per-iteration float rounding is NOT cross-engine safe here —
    a rank rounded to k decimals divided by a small outdegree lands EXACTLY on
    a half-way decimal, and Spark (BigDecimal HALF_UP on the shortest repr)
    and DuckDB (binary scaled round) systematically resolve those ties
    differently. BIGINT div/sum has no ties to resolve: every engine computes
    the identical integer, at any scale. The floor in ``div`` leaks ≤1/scale
    of mass per term — at the default scale that is 1e-12, far below any use
    of the score. All intermediates fit BIGINT: ranks ≤ S=1e12, the damped
    term ≤ 100·S = 1e14 ≪ 2^63.

    Returns ``(node, pagerank double)`` for every node in src ∪ dst, where
    ``pagerank = r/scale`` (an exact IEEE division of an integer < 2^53).
    """
    # the edge list is touched by EVERY iteration (plus the node/degree
    # derivations) — persist it once instead of re-deriving from the source
    # per use (the canonical iterative-graph pattern; at 100 TB the
    # re-derivation would re-scan the corpus each round)
    edges = edges.select(
        F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst")
    ).persist()
    # node set + O(1) driver scalars (node count, integer teleport term)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()  # materializes `nodes`
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")).persist()

    teleport = ((100 - damping_pct) * scale) // (100 * n_nodes)  # exact int
    # Every rank level is persisted LAZILY: the single terminal action
    # materializes each level once (cache reuse spans stages within a job),
    # so a 3-iteration run costs 2 jobs total (node count + the action)
    # instead of 2 extra jobs per round. Eager count + unpersist every 5
    # rounds bounds lineage depth and cached-level count on long runs.
    # The dangling-node FLAG is computed once and carried in the rank frame
    # — per-iteration dangling mass is then a bare aggregate, not an
    # anti-join repeated every round on an iteration-invariant node set.
    ranks = (
        nodes.join(
            deg.withColumnRenamed("src", "node").withColumn("_d", F.lit(False)),
            "node",
            "left",
        )
        .select(
            "node",
            F.coalesce(F.col("_d"), F.lit(True)).alias("dangling"),
            F.lit(scale // n_nodes).alias("r"),
        )
        .persist()
    )

    for it in range(iters):
        # per-node in-flow: edges ⋈ deg ⋈ ranks, grouped on dst — the only
        # corpus-sized shuffles in the loop; per-src share is an exact
        # integer division
        shares = ranks.withColumnRenamed("node", "src").join(deg, "src").select(
            "src", F.expr("r div outdeg").alias("share")
        )
        contrib = (
            edges.join(shares, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("share").alias("contrib"))
        )
        # dangling mass: ranks of nodes with no out-edges — ONE row
        dangling = ranks.agg(
            F.coalesce(F.sum(F.when(F.col("dangling"), F.col("r"))), F.lit(0))
            .cast("long")
            .alias("dang")
        )
        new_ranks = (
            ranks.select("node", "dangling")
            .crossJoin(F.broadcast(dangling))
            .join(contrib, "node", "left")
            .select(
                "node",
                "dangling",
                (
                    F.lit(teleport)
                    + F.expr(
                        f"({damping_pct} * (coalesce(contrib, 0) "
                        f"+ (dang div {n_nodes}))) div 100"
                    )
                ).cast("long").alias("r"),
            )
            .persist()
        )
        if (it + 1) % 5 == 0:
            new_ranks.count()
            ranks.unpersist()
        ranks = new_ranks

    return ranks.select(
        "node", (F.col("r").cast("double") / F.lit(float(scale))).alias("pagerank")
    )


def hits(
    edges: DataFrame,
    iters: int = 3,
    scale: int = 10**9,
) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg 1999, hubs & authorities) over a
    directed edge list ``(src, dst)`` in FIXED-POINT INTEGER arithmetic:

        a_t(v)  = Σ_{u→v} h_{t-1}(u), then L1-renormalized to ~scale
        h_t(v)  = Σ_{v→w} a_t(w),     then L1-renormalized to ~scale

    Renormalization is integer: ``x div greatest(Σx div scale, 1)`` — the
    same cross-engine-exact trick as ``pagerank`` (per-iteration float
    rounding lands on decimal ties that Spark HALF_UP and DuckDB binary
    rounding resolve differently; integer div has no ties). The L1 norm
    (not the classical L2) keeps the iteration division-free and changes
    only the scores' scale, never their order or ratios.

    The coarse divisor ``Σx div scale`` rescales every score by one COMMON
    factor in [1, 1+scale/Σraw) — per-node ratios are exact to ≤1/score —
    so consumers needing a true L1 distribution divide by the column sum
    (one more 1-row agg); rankings and ratios need nothing.

    Overflow envelope: after renormalization every score ≤ ~scale, so the
    raw sums are bounded by indeg·scale ≤ E·scale — at the default
    scale=1e9 that holds to ~9×10⁹ edges; for larger graphs lower
    ``scale`` (precision degrades as 1/scale). All test/bench graphs are
    orders of magnitude inside the envelope.

    Same plan shape as ``pagerank``: the edge list is the only
    corpus-sized frame, touched twice per iteration with shuffle
    hash-joins + one agg each; score frames are node-sized and
    ``localCheckpoint``'ed each round — eager materialization plus plan
    truncation (see the in-loop comment for the two failure modes the
    lazy-persist form had); each norm scalar is a 1-row aggregate
    fetched to the driver and inlined (O(1) longs per round).

    Returns ``(node, hub double, authority double)`` for every node in
    src ∪ dst, scores divided back by ``scale``.
    """
    edges = edges.select(
        F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst")
    ).persist()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()

    hub = nodes.select("node", F.lit(scale // n_nodes).alias("h")).persist()
    auth = None

    def _renorm(full: DataFrame, raw: str, out: str) -> DataFrame:
        """x div greatest(Σx div scale, 1), with the norm as a BROADCAST
        1-row aggregate of the SAME frame — not a driver-fetched scalar.

        The old driver-scalar form (.first() per half-round) paid the edge
        join + agg TWICE per half-round: once for the norm job and once
        again for the localCheckpoint, since the un-persisted chain
        recomputes. The broadcast form evaluates the chain once inside the
        checkpoint job (the broadcast side populates `full`'s cache, the
        main side reads it). localCheckpoint per half-round stays: a fully
        lazy persist chain nests cached-AQE plans and drives the driver
        into EXPONENTIAL TreeNode.generateTreeString rendering (re-confirmed
        by jstack this round — 800+ s RUNNABLE in generateTreeString on a
        3-iteration graph), so plan truncation is load-bearing, not
        optional."""
        full = full.persist()
        s = full.agg(
            F.greatest(F.expr(f"sum({raw}) div {scale}"), F.lit(1))
            .cast("long")
            .alias("_s")
        )
        leveled = (
            full.crossJoin(F.broadcast(s))
            .select("node", F.expr(f"{raw} div _s").cast("long").alias(out))
            .localCheckpoint()
        )
        full.unpersist()
        return leveled

    for it in range(iters):
        a_raw = (
            edges.join(hub.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("h").cast("long").alias("a_raw"))
        )
        a_full = nodes.join(a_raw, "node", "left").select(
            "node", F.coalesce(F.col("a_raw"), F.lit(0)).alias("a_raw")
        )
        auth = _renorm(a_full, "a_raw", "a")
        h_raw = (
            edges.join(auth.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("a").cast("long").alias("h_raw"))
        )
        h_full = nodes.join(h_raw, "node", "left").select(
            "node", F.coalesce(F.col("h_raw"), F.lit(0)).alias("h_raw")
        )
        hub = _renorm(h_full, "h_raw", "h")

    return hub.join(auth, "node").select(
        "node",
        (F.col("h").cast("double") / F.lit(float(scale))).alias("hub"),
        (F.col("a").cast("double") / F.lit(float(scale))).alias("authority"),
    )


def triangles(edges: DataFrame) -> DataFrame:
    """Exact per-node triangle counting over a directed edge list treated as
    an undirected simple graph, plus the wedge (open-triple) denominator —
    the link-farm / spam-cluster prior next to PageRank and HITS (dense
    mutual-link neighborhoods have anomalously high triangle-to-wedge
    ratios).

    Algorithm: degree-ordering orientation (Chiba–Nishizeki 1985 /
    Schank–Wagner 2005). Every undirected edge is oriented from its
    lower-(degree, id) endpoint to the higher one, wedges are enumerated by
    self-joining oriented edges on their SOURCE — always the lower-degree
    endpoint, so a degree-d hub fans out O(d_oriented^2) where its oriented
    out-degree is bounded by the graph arboricity, never the raw degree —
    and each triangle is found exactly once as (u -> v, u -> w, v -> w)
    with ord(v) < ord(w). Total work is O(m * arboricity): the standard
    distributed-triangle bound, robust to power-law hubs. All joins are
    node-keyed shuffle hash joins; nothing collects, nothing iterates.

    Clustering coefficients are deliberately left to the caller as the
    integer pair (n_triangles, n_wedges): a single float division is
    cross-engine rounding-unsafe (see ``pagerank``) and loses nothing here.

    Returns ``(node, degree int, n_triangles bigint, n_wedges bigint)`` for
    every node of the undirected simple graph.
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .union(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
        .persist()
    )
    low_first = F.expr(
        "da < db OR (da = db AND a < b)"
    )
    oriented = (
        und.join(deg.select(F.col("node").alias("a"), F.col("degree").alias("da")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("degree").alias("db")), "b")
        .select(
            F.when(low_first, F.col("a")).otherwise(F.col("b")).alias("src"),
            F.when(low_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
            # orientation key of dst, for ordering siblings within a wedge
            F.when(low_first, F.col("db")).otherwise(F.col("da")).alias("dd"),
        )
        .persist()
    )
    wedges = (
        oriented.alias("e1")
        .join(oriented.alias("e2"), on=F.expr("e1.src = e2.src"))
        .where(F.expr("e1.dd < e2.dd OR (e1.dd = e2.dd AND e1.dst < e2.dst)"))
        .select(
            F.col("e1.src").alias("u"),
            F.col("e1.dst").alias("v"),
            F.col("e2.dst").alias("w"),
        )
    )
    tri = wedges.join(
        oriented.select(F.col("src").alias("v"), F.col("dst").alias("w")),
        on=["v", "w"],
    )
    per_node = (
        tri.select(F.explode(F.array("u", "v", "w")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return (
        deg.join(per_node, "node", "left")
        .select(
            "node",
            F.col("degree").cast("int").alias("degree"),
            F.coalesce(F.col("n_triangles"), F.lit(0))
            .cast("long")
            .alias("n_triangles"),
            F.expr("degree * (degree - 1) div 2").cast("long").alias("n_wedges"),
        )
    )


def label_propagation(edges: DataFrame, iters: int = 3) -> DataFrame:
    """Synchronous label propagation (Raghavan 2007) over the undirected
    simple graph of a directed edge list — the cheap community detector for
    mirror-site / link-farm clustering.

    Deterministic by construction: labels start as node ids (integers),
    every round each node adopts the most frequent neighbor label with
    ties broken by SMALLEST label. All state is integer, so the unrolled
    SQL replay computes identical values on any engine (the same rationale
    as ``pagerank``'s fixed-point form — no float rounding exists).

    Per round: one edge-sized hash join (adjacency × labels) + one
    (node, label) partial-aggregated count + one node-keyed argmax — the
    same cost class as a PageRank round; label frames are node-sized and
    persisted lazily. Isolated nodes don't occur (every node of the
    undirected graph has a neighbor by construction).
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    adj = (
        und.select(F.col("a").alias("node"), F.col("b").alias("nb"))
        .union(und.select(F.col("b").alias("node"), F.col("a").alias("nb")))
        .persist()
    )
    labels = adj.select("node").distinct().withColumn("lab", F.col("node")).persist()
    for it in range(iters):
        counts = (
            adj.join(labels.withColumnRenamed("node", "nb"), "nb")
            .groupBy("node", "lab")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        new_labels = counts.groupBy("node").agg(
            F.expr("max_by(lab, struct(cnt, -lab))").alias("lab")
        ).persist()
        if (it + 1) % 5 == 0:
            new_labels.count()
            labels.unpersist()
        labels = new_labels
    return labels.select("node", F.col("lab").cast("long").alias("label"))


def derive_component_edges(events: DataFrame) -> DataFrame:
    """Deterministic SPARSE synthetic graph over the events table: one edge
    per event between two md5-hashed endpoints drawn from a node space of
    size 4×|events| (data-derived via one scalar agg, broadcast). With
    |E| = n edges over 4n candidate nodes the random graph is subcritical
    (mean degree 0.5), so the structure is many small components — the
    regime where a components operator is actually informative (the dense
    ``derive_event_edges`` graph collapses to one giant component).
    """
    m = events.agg((F.count(F.lit(1)) * 4).cast("long").alias("m"))
    return events.crossJoin(F.broadcast(m)).select(
        F.pmod(
            _md5_prefix_long(F.concat(F.lit("s"), F.col("event_id").cast("string"))),
            F.col("m"),
        ).cast("long").alias("src"),
        F.pmod(
            _md5_prefix_long(F.concat(F.lit("d"), F.col("event_id").cast("string"))),
            F.col("m"),
        ).cast("long").alias("dst"),
    )


def _canon_edges(e: DataFrame) -> DataFrame:
    """Canonical undirected form (a < b), self-loops dropped, dedup'd."""
    return (
        e.select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star step (Kiveris et al., SoCC'14 "Connected Components in
    MapReduce and Beyond"): every node u connects each STRICTLY LARGER
    neighbor to m(u) = min(Γ(u) ∪ {u}).

    Emits the RAW (possibly duplicated, but already a<b oriented) edge
    multiset — the round's single dedup happens once, after the small-star
    step. Window-min over duplicates equals window-min over the set, and
    both star steps are defined on edge SETS, so deferring the distinct
    changes nothing except removing one full exchange per round."""
    sym = e.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
        e.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    # min(Γ(u)) via a window over the SAME u-keyed exchange the rows need
    # anyway — the groupBy+join form paid a second full shuffle of sym
    # (agg exchange + join exchange) for the identical neighborhood min
    marked = sym.withColumn(
        "mn", F.min("v").over(Window.partitionBy("u"))
    )
    # least(mn, u) ≤ u < v always, so the output is a<b oriented already;
    # only self-loop-free rows can occur (v > u ≥ least(mn, u))
    return marked.where(F.col("v") > F.col("u")).select(
        F.least("mn", "u").alias("a"), F.col("v").alias("b")
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star step: each edge is routed to its LARGER endpoint u, which
    connects its strictly smaller neighbors (and itself) to their minimum.

    Accepts a raw (duplicated) a<b edge multiset from ``_large_star``;
    duplicate (u, v) rows only duplicate output rows, which the trailing
    ``_canon_edges`` (the round's one distinct) removes."""
    sym = e.select(F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v"))
    # same one-exchange window form as _large_star
    marked = sym.withColumn(
        "mn", F.min("v").over(Window.partitionBy("u"))
    )
    rewired = marked.where(F.col("v") != F.col("mn")).select(
        F.col("mn").alias("a"), F.col("v").alias("b")
    )
    centers = marked.where(F.col("v") == F.col("mn")).select(
        F.col("mn").alias("a"), F.col("u").alias("b")
    )
    return _canon_edges(rewired.union(centers))


def connected_components(edges: DataFrame, max_iters: int = 40) -> DataFrame:
    """Connected components of the undirected graph behind a directed edge
    list ``(src, dst)`` via the alternating large-star / small-star
    algorithm (Kiveris et al., SoCC'14) — the at-scale CC method: O(log²
    n) rounds to a forest of stars whose root is the component MINIMUM,
    with per-round cost two key-partitioned shuffles over the (shrinking)
    edge frame. Nothing corpus-sized is ever collected or broadcast.

    Determinism / oracle replay: the fixpoint is unique — every node
    labelled with min(component) — so a DuckDB recursive-CTE reachability
    replay value-matches regardless of how many rounds Spark needed.

    Implementation notes for the iteration (the HITS lesson applied from
    the start): each round's edge frame is ``localCheckpoint``'d — eager,
    plan-truncating — so round k never re-derives rounds 1..k-1 and the
    convergence-check agg never triggers lineage replay. Convergence is
    detected with an O(1)-row digest (count + bit_xor of edge hashes),
    one extra aggregate per round.

    Returns ``(node, comp, comp_size)`` for every node appearing in the
    input (self-loop-only nodes become singleton components).
    """
    nodes = (
        edges.select(F.col("src").cast("long").alias("node"))
        .union(edges.select(F.col("dst").cast("long").alias("node")))
        .distinct()
        .persist()
    )
    e = _canon_edges(
        edges.select(
            F.col("src").cast("long").alias("a"), F.col("dst").cast("long").alias("b")
        )
    ).localCheckpoint(eager=True)
    prev = None
    for _ in range(max_iters):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        digest = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("a", "b")), F.lit(0)).alias("x"),
        ).first()
        if (digest["n"], digest["x"]) == prev:
            break
        prev = (digest["n"], digest["x"])
    else:  # pragma: no cover - convergence is O(log^2 n) rounds
        raise RuntimeError(f"connected_components: no fixpoint in {max_iters} rounds")
    # converged stars: (a=root=component min, b=member); min() is belt and
    # braces (the fixpoint leaves exactly one edge per member)
    stars = e.groupBy(F.col("b").alias("node")).agg(F.min("a").alias("root"))
    labels = nodes.join(stars, "node", "left").select(
        "node", F.coalesce("root", "node").alias("comp")
    )
    sizes = labels.groupBy("comp").agg(F.count(F.lit(1)).cast("int").alias("comp_size"))
    return labels.join(sizes, "comp").select("node", "comp", "comp_size")


def derive_dense_edges(events: DataFrame) -> DataFrame:
    """Denser sibling of ``derive_component_edges``: node space |events|÷2
    (mean degree ≈ 4 — supercritical), so cycles and non-trivial k-cores
    exist. Same md5 endpoint scheme, same oracle replayability."""
    m = events.agg(F.expr("cast(count(1) div 2 as bigint)").alias("m"))
    return events.crossJoin(F.broadcast(m)).select(
        F.pmod(
            _md5_prefix_long(F.concat(F.lit("s"), F.col("event_id").cast("string"))),
            F.col("m"),
        ).cast("long").alias("src"),
        F.pmod(
            _md5_prefix_long(F.concat(F.lit("d"), F.col("event_id").cast("string"))),
            F.col("m"),
        ).cast("long").alias("dst"),
    )


def kcore(edges: DataFrame, k: int, max_iters: int = 60) -> DataFrame:
    """k-core of the undirected simple graph behind ``(src, dst)``: the
    maximal subgraph where every node has degree ≥ k, computed by
    SIMULTANEOUS peeling — each round recomputes degrees and drops every
    node below k at once (the Batagelj–Zaveršnik bulk variant; the
    sequential-peel fixpoint is identical because the k-core is unique).

    Per round: one degree aggregate + two left-semi joins on the shrinking
    edge frame; ``localCheckpoint`` truncates lineage (the HITS lesson) and
    the convergence digest is O(1) rows. Peel-round count is O(graph
    diameter)-ish in the worst case (a path peels one layer per round for
    k=2) — at web scale, degeneracy-ordered peeling inside partitions
    would cut rounds, but round count here is data-, not scale-, bound.

    Returns ``(node, degree)`` over the surviving subgraph (degree ≥ k by
    the fixpoint property). Empty when no k-core exists.
    """
    e = _canon_edges(
        edges.select(
            F.col("src").cast("long").alias("a"), F.col("dst").cast("long").alias("b")
        )
    ).localCheckpoint(eager=True)
    prev = None
    for _ in range(max_iters):
        sym = e.select(F.col("a").alias("u")).union(e.select(F.col("b")))
        keep = (
            sym.groupBy("u")
            .agg(F.count(F.lit(1)).alias("d"))
            .where(F.col("d") >= k)
            .select("u")
        )
        e = (
            e.join(keep.withColumnRenamed("u", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("u", "b"), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        # peeling only DROPS edges (two semi-joins of e against keep), so an
        # unchanged count proves an unchanged set — no content hash needed
        n_edges = e.count()
        if n_edges == prev:
            break
        prev = n_edges
    else:  # pragma: no cover
        raise RuntimeError(f"kcore: no fixpoint in {max_iters} rounds")
    sym = e.select(F.col("a").alias("node")).union(e.select(F.col("b")))
    return sym.groupBy("node").agg(F.count(F.lit(1)).cast("int").alias("degree"))
