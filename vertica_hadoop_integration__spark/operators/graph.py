"""Connected components over a pair/edge list — the step that turns
near-duplicate PAIRS into duplicate CLUSTERS (one canonical doc per
component), and the canonical Spark iterative-algorithm shape.

Label propagation to fixpoint: every node repeatedly adopts the minimum
label among itself and its neighbors. Convergence takes O(component
diameter) rounds — near-dup clusters are shallow (stars/cliques), so
2-4 rounds in practice. Each round is two hash-shuffles (message
groupBy, label join); lineage is truncated per round with
localCheckpoint so the plan does not grow with iterations (at cluster
scale, persist+unpersist or checkpoint to HDFS instead — same shape).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_id_a",
    dst: str = "doc_id_b",
    max_iter: int = 20,
    strict: bool = True,
    small_graph_threshold: int = 200_000,
) -> DataFrame:
    """Return (node, component) with component = min node id reachable.

    ``edges`` is an undirected pair list; isolated nodes absent from it
    simply form their own singleton components downstream (left join +
    coalesce at the call site).  Self-loop edges (u == v) are dropped
    before symmetrization — they never affect connectivity — so a node
    whose ONLY edge is a self-loop is treated exactly like an isolated
    node: it does NOT appear in the output and owes its singleton
    component to the same call-site left join + coalesce.  (Behavior
    change in r09: such nodes were previously emitted as their own
    one-row components; callers passing raw pair lists that rely on
    self-loop rows surviving should coalesce against their node
    universe, which every in-repo caller already does.)

    Size-gated execution: the symmetrized-distinct edge list is
    checkpointed first (one execution of the edge pipeline on either
    branch), then probed with one bounded take() over the materialized
    blocks.  At or below
    ``small_graph_threshold`` distinct undirected edges, the labels come
    from a single-pass driver-side union-find over the bounded collect —
    exact, convergence-free, and O(E α(E)) instead of O(diameter) shuffle
    rounds (each round is a checkpoint job + probe job; near-dup edge
    sets after verification are typically 1e2-1e5 rows, so the rounds
    were pure scheduling overhead).  Above the threshold — the 100 TB
    case, where verified-pair graphs can reach billions of edges — the
    distributed label-propagation path engages automatically; the gate is
    the same "solve the reduced problem where it fits" trade as a
    broadcast join, with the memory bound explicit (2 longs x threshold
    ~= tens of MB at the default).  Pass ``small_graph_threshold=0`` to
    force the distributed path.

    If the distributed fixpoint is not reached within ``max_iter`` rounds
    (component diameter exceeds it), labels are WRONG — one component
    would be silently split into several. ``strict=True`` (default)
    raises in that case; ``strict=False`` logs a warning and returns the
    partial labels (callers that only need a conservative
    over-partitioning).  The union-find path is always exact."""
    e = edges.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    )
    # drop self-loops: they never affect connectivity (a node whose only
    # edge is a self-loop becomes an "isolated node" handled at the call
    # site), and because they appear ONCE in the symmetrized frame they
    # made the 2x-count small-graph gate slightly inconsistent with its
    # documented distinct-undirected-edge bound (r08 ADVICE)
    e = e.filter(F.col("u") != F.col("v"))
    # symmetrize once; messages then flow both directions via one join.
    # localCheckpoint on purpose: it TRUNCATES lineage, so each
    # iteration's plan is tiny no matter how expensive the edge
    # pipeline was.  (A persist-chain variant was measured 10x slower
    # on containment clusters — every iteration re-analyzed the full
    # containment logical plan through the cached layers.)
    sym = (
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        # checkpoint BEFORE the gate (r12, per r11 ADVICE): the edge
        # pipeline — at 100 TB scale an expensive verification cascade —
        # executes exactly once on BOTH branches.  The r11 take()-first
        # form executed it ~twice over the gate (take() must run the
        # distinct's full map side before its limit applies, then the
        # checkpoint recomputed the pipeline for the distributed path).
        .localCheckpoint()
    )
    if small_graph_threshold:
        # ONE bounded take() against the already-materialized blocks
        # both decides the gate and hands the union-find its rows (r11,
        # guide §1.2 — replaces the former separate count + collect):
        # under the gate, the rows in hand ARE the edge set; over it,
        # take()'s incremental limit stops after the first checkpointed
        # partitions (a cheap cached scan, no recompute).
        rows = sym.take(2 * small_graph_threshold + 1)
        if len(rows) <= 2 * small_graph_threshold:
            return _driver_union_find(e.sparkSession, rows)
    # hop 0 folded into initialization: label(u) = min(u, min neighbor)
    # straight from the symmetric edge list — one aggregate instead of a
    # full propagate round (labels == node ids makes the first join a
    # no-op rename)
    # no eager materialization for the seed labels: their lineage is one
    # aggregate over the already-checkpointed sym, so the round-1 plan
    # stays tiny without paying a separate checkpoint job (every later
    # generation IS checkpointed below)
    labels = (
        sym.groupBy("u")
        .agg(F.least(F.col("u"), F.min("v")).alias("label"))
        .select(F.col("u").alias("node"), "label")
    )

    def _propagate(lbl: DataFrame, keep: list[str]) -> DataFrame:
        nbr_min = (
            sym.join(lbl, sym.u == lbl.node)
            .select(F.col("v").alias("node"), F.col("label"))
            .groupBy("node")
            .agg(F.min("label").alias("nbr_label"))
        )
        return lbl.join(nbr_min, on="node", how="left").select(
            "node",
            F.least(
                F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
            ).alias("label"),
            *keep,
        )

    converged = False
    for _ in range(max_iter):
        # TWO propagation hops per checkpoint+probe: the per-round fixed
        # cost (checkpoint job + stability probe job) dominates on small
        # or shallow graphs and halves when rounds cover two hops; the
        # un-checkpointed middle hop keeps the plan a bounded two-join
        # chain.  Label reach per round doubles, so max_iter rounds now
        # certify diameters up to ~2*max_iter.  The starting label rides
        # along as _prev so the change flag costs no extra join, and the
        # stability probe on the checkpointed result is a cached-scan +
        # limit(1).
        seeded = labels.select("node", "label", F.col("label").alias("_prev"))
        two_hops = _propagate(_propagate(seeded, ["_prev"]), ["_prev"])
        # eager=False: the stability probe right below is the round's
        # ONLY job — it materializes the checkpoint as it runs (the
        # text_bpe_encode lesson: one job per round, not two)
        new_gen = two_hops.select(
            "node",
            "label",
            (F.col("label") < F.col("_prev")).alias("_changed"),
        ).localCheckpoint(eager=False)
        stable = new_gen.filter(F.col("_changed")).limit(1).isEmpty()
        labels = new_gen.select("node", "label")
        if stable:
            converged = True
            break
    if not converged:
        msg = (
            f"connected_components did not converge in max_iter={max_iter} "
            "rounds (component diameter exceeds it); labels would split a "
            "single component into several"
        )
        if strict:
            raise RuntimeError(msg + " — raise max_iter or pass strict=False")
        logging.getLogger(__name__).warning(msg)
    return labels.select(F.col("node"), F.col("label").alias("component"))


def _driver_union_find(spark, rows) -> DataFrame:
    """Exact min-label connected components for a bounded symmetrized
    edge list already in hand (the caller's gated take()), union-find
    with union-by-min-root — every union keeps the smaller id as root,
    so each node's final root IS the minimum id of its component,
    matching the label-propagation fixpoint bit for bit."""
    from pyspark.sql.types import LongType, StructField, StructType

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for row in rows:
        u, v = row[0], row[1]
        if u not in parent:
            parent[u] = u
        if v not in parent:
            parent[v] = v
        ru, rv = find(u), find(v)
        if ru != rv:
            if ru < rv:
                parent[rv] = ru
            else:
                parent[ru] = rv
    out = [(n, find(n)) for n in parent]
    schema = StructType(
        [
            StructField("node", LongType(), False),
            StructField("component", LongType(), False),
        ]
    )
    return spark.createDataFrame(out, schema)


def dedup_clusters(
    pairs: DataFrame,
    src: str = "doc_id_a",
    dst: str = "doc_id_b",
) -> DataFrame:
    """Collapse verified near-dup pairs into clusters: (doc_id,
    canonical_id, cluster_size). canonical = smallest id in the
    component; keep-set = rows where doc_id == canonical_id."""
    cc = connected_components(pairs, src, dst)
    sizes = cc.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        cc.join(sizes, on="component")
        .select(
            F.col("node").alias("doc_id"),
            F.col("component").alias("canonical_id"),
            "cluster_size",
        )
    )


def triangle_count(
    edges: DataFrame,
    src: str = "doc_id_a",
    dst: str = "doc_id_b",
    input_symmetric: bool = False,
) -> DataFrame:
    """Exact global triangle count over an undirected edge list — one
    row (n_triangles). The graph-analytics clustering-coefficient
    primitive (pagerank = importance, connected components = identity,
    triangles = cohesion).

    Algorithm: degree orientation ("compact-forward") + edge iterator.
    Every edge is directed from its lower-(degree, id) endpoint to the
    higher, which makes the out-degree of any node O(sqrt(m)) on real
    graphs — adjacency size is bounded by arboricity instead of the max
    degree, so a celebrity node cannot produce a quadratic neighbor
    set. Each triangle has exactly one node with two out-edges under
    this orientation, so per oriented edge (a,b) the count
    |N+(a) ∩ N+(b)| sees each triangle exactly once (c must be an
    out-neighbor of BOTH, which the orientation makes unique).

    Plan shape: one groupBy for degrees, one join to orient, one
    groupBy to build sorted out-adjacency arrays, two equi-joins to
    attach them to edges, then a codegen'd array_intersect + global
    sum. The shipped bytes equal the wedge count (each edge carries
    |N+(a)|+|N+(b)| neighbor ids) — the same volume the older
    wedge-join form shuffled — but no wedge ROWS are materialized
    through a join, which measured 8.1 -> 5.1s median (interleaved
    3-trial A/B at sf0.1, identical counts) versus the wedge form."""
    if input_symmetric:
        # both directions of every edge are present (the co-order pair
        # expansion's contract), so keeping only src < dst rows yields
        # the same canonical set while HALVING the distinct's shuffle
        # input (r11, guide §2.3: shuffle fewer bytes).  Compare on the
        # CAST values (r12, per r11 ADVICE) so string-typed ids order
        # the same way as the default path's post-cast least/greatest.
        e = edges.select(
            F.col(src).cast("long").alias("u"),
            F.col(dst).cast("long").alias("v"),
        ).filter(F.col("u") < F.col("v")).distinct()
    else:
        e = edges.select(
            F.least(F.col(src), F.col(dst)).cast("long").alias("u"),
            F.greatest(F.col(src), F.col(dst)).cast("long").alias("v"),
        ).filter(F.col("u") != F.col("v")).distinct()
    # note: the edge list feeds degrees and both orientation joins, but
    # interleaved A/B at sf0.1 showed neither persist() nor an eager
    # localCheckpoint beats recomputation here (medians 16.0/16.3 vs
    # 14.2s plain — the wedge join dominates, and caching only adds
    # memory pressure); at cluster scale, write the canonical edge list
    # once and read it back instead
    deg = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    ed = (
        e.join(deg.withColumnRenamed("node", "u").withColumnRenamed("d", "du"), on="u")
        .join(deg.withColumnRenamed("node", "v").withColumnRenamed("d", "dv"), on="v")
    )
    fwd = F.col("du") < F.col("dv")
    tie = (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    o = ed.select(
        F.when(fwd | tie, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(fwd | tie, F.col("v")).otherwise(F.col("u")).alias("b"),
    )
    adj = o.groupBy("a").agg(F.array_sort(F.collect_list("b")).alias("nbr"))
    # a-side adjacency rides the explode instead of a join (r12, guide
    # §2.4): the oriented edges ARE adj's rows fanned back out, so
    # re-deriving o and joining it on a paid one edge-sized exchange +
    # join for an array the explode carries for free (the count never
    # reads a itself).  Same (a, b, na) multiset bit for bit.
    attached = (
        adj.select(F.col("nbr").alias("na"), F.explode("nbr").alias("b"))
        # left: b may have no out-edges (a pure sink under orientation)
        .join(
            adj.withColumnRenamed("a", "_y").withColumnRenamed("nbr", "nb"),
            F.col("b") == F.col("_y"),
            "left",
        )
        .drop("_y")
    )
    per_edge = attached.select(
        F.when(F.col("nb").isNull(), F.lit(0))
        .otherwise(F.size(F.array_intersect("na", "nb")))
        .alias("t")
    )
    return per_edge.agg(F.sum("t").cast("long").alias("n_triangles"))


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    damping: float = 0.85,
    teleport: float = 0.15,
    iters: int = 10,
    dangling: str = "redistribute",
    checkpoint_every: int = 1,
    input_symmetric: bool = False,
) -> DataFrame:
    """Weighted PageRank over an arbitrary directed edge list; returns
    (node, pagerank) for every node appearing as a source or target.

    ``input_symmetric=True`` (r11) declares that every node appearing
    as a target also appears as a source (true of any symmetric edge
    list, e.g. the co-order graph) and requires
    ``dangling="assume_none"``.  The fast path it unlocks, values
    bit-identical (guide §2.3-2.4): out-weights attach via ONE
    whole-partition window over the single persisted edge frame (r12 —
    no separate outw aggregate + join-back, no second persisted frame),
    the node table IS that frame's distinct source key set, the node
    count becomes one driver scalar instead of a per-iteration 1-row
    broadcast join, the per-iteration left-join back onto the node
    table disappears (the in-sum covers every node, so its coalesce
    could never fire), the rank join takes a shuffled-hash build on
    the node-sized rank side (no per-iteration sort of the edge
    frame), and per-iteration lineage truncation is lazy (one job per
    run, not one per iteration).

    ``dangling`` controls nodes with no out-edges:

    * ``"redistribute"`` (default, the standard formulation): their rank
      mass is spread uniformly — ``r = t/n + d*(sum_in + dm/n)`` where
      ``dm`` is the summed rank of dangling nodes;
    * ``"assume_none"``: skips the dangling machinery entirely — the
      exact arithmetic the iteration-replay oracle pins (valid for
      symmetric graphs like the co-order graph, where every node that
      receives also sends);
    * ``"error"``: raise if any dangling node exists (one bounded probe).

    Exactness contract (shared with the oracle-replayed caller):
    ``teleport`` must be passed as its OWN literal (``1 - 0.85`` is one
    ulp off ``0.15``); per-edge contributions are deterministic double
    math; per-node sums (and the dangling-mass sum) go through
    DECIMAL(30,15) so partial-agg order cannot move an ulp.

    Plan shape: one edges-sized join + one node-keyed aggregation per
    iteration; the rank frontier is node-cardinality-sized and its
    lineage is truncated every iteration with localCheckpoint, so the
    physical plan stays flat no matter how high ``iters`` goes (at
    cluster scale swap for reliable checkpoints — same shape).  The
    canonical (p, q, w) edge frame is persisted on entry: outw, the
    normalized edge list, AND the node table all derive from it, and
    without the cache the caller's edge-construction plan (for the
    co-order graph, a pair-expansion + groupBy) re-executes for each —
    interleaved A/B at sf0.1: median 10.9s -> 8.6s with the cache.
    All persisted subframes are unpersisted before returning; the
    result is a bounded materialized frame with no lineage into them."""
    if dangling not in ("redistribute", "assume_none", "error"):
        raise ValueError(f"unknown dangling mode: {dangling!r}")
    if input_symmetric and dangling != "assume_none":
        raise ValueError(
            "input_symmetric requires dangling='assume_none' (a symmetric "
            "graph has no dangling nodes)"
        )
    w_expr = (
        F.col(weight).cast("double") if weight else F.lit(1.0)
    )
    if input_symmetric:
        # outw attached by a whole-partition window instead of a
        # groupBy + join-back (r12, guide §2.4): ONE exchange on p and
        # ONE materialized frame replace the former two persisted
        # frames (e, edges_n) and their agg+join exchanges —
        # interleaved A/B 5.63 -> 4.34s min on the co-order query,
        # identical xxhash sums.  Value note: the window sums w in a
        # different order than the hash aggregate, which is exact here
        # because pagerank weights are integer-valued doubles (co-order
        # counts; sums stay far under 2^53) — arbitrary fractional
        # weights were already partial-agg-order-sensitive in BOTH
        # forms.  The window buffers one out-neighborhood per group
        # (degree-bounded, spillable) — the same bound the adjacency
        # builders carry.
        edges_n = (
            edges.select(
                F.col(src).alias("p"), F.col(dst).alias("q"), w_expr.alias("w")
            )
            .withColumn("outw", F.sum("w").over(Window.partitionBy("p")))
            .persist()
        )
        outw_keys = edges_n.select("p").distinct()
        try:
            # bounded driver scalar: one count of the node-cardinality
            # out-weight key set (the nodes == sources contract); the
            # distinct reuses edges_n's hash partitioning on p
            n = outw_keys.count()
            inv_n = F.lit(1.0) / F.lit(n).cast("double")
            rank = outw_keys.select("p", inv_n.alias("r"))
            for _i in range(iters):
                contrib = edges_n.join(
                    rank.hint("shuffle_hash"), on="p"
                ).select(
                    F.col("q"),
                    (
                        (F.col("r") * F.col("w")) / F.col("outw")
                    ).cast("decimal(30,15)").alias("_c"),
                )
                # the in-sum covers every node (symmetric graph), so it
                # IS the next rank frontier — no node-table join back
                new_rank = (
                    contrib.groupBy("q")
                    .agg(F.sum("_c").cast("double").alias("_s"))
                    .select(
                        F.col("q").alias("p"),
                        (
                            F.lit(teleport) / F.lit(n).cast("double")
                            + F.lit(damping) * F.col("_s")
                        ).alias("r"),
                    )
                )
                if _i % checkpoint_every == checkpoint_every - 1 or _i == iters - 1:
                    rank = new_rank.localCheckpoint(eager=_i == iters - 1)
                else:
                    rank = new_rank
            return rank.select(
                F.col("p").alias("node"), F.col("r").alias("pagerank")
            )
        finally:
            edges_n.unpersist()
    e = edges.select(
        F.col(src).alias("p"), F.col(dst).alias("q"), w_expr.alias("w")
    ).persist()
    outw = e.groupBy("p").agg(F.sum("w").alias("outw"))
    edges_n = e.join(outw, on="p").persist()
    nodes = (
        e.select("p")
        .unionByName(e.select(F.col("q").alias("p")))
        .distinct()
        .persist()
    )
    try:
        n_df = nodes.agg(F.count(F.lit(1)).alias("n"))
        # dangling = appears as a node but never as a source
        dang = nodes.join(outw, on="p", how="left_anti")
        if dangling == "error" and not dang.isEmpty():
            raise ValueError(
                "graph has dangling nodes (no out-edges); pass "
                "dangling='redistribute' or fix the edge list"
            )
        rank = nodes.join(F.broadcast(n_df)).select(
            "p", (F.lit(1.0) / F.col("n").cast("double")).alias("r")
        )
        for _i in range(iters):
            contrib = edges_n.join(rank, on="p").select(
                F.col("q"),
                (
                    (F.col("r") * F.col("w")) / F.col("outw")
                ).cast("decimal(30,15)").alias("_c"),
            )
            summed = contrib.groupBy("q").agg(
                F.sum("_c").cast("double").alias("_s")
            )
            base = (
                nodes.join(F.broadcast(n_df))
                .join(summed.withColumnRenamed("q", "p"), on="p", how="left")
            )
            if dangling == "redistribute":
                dm_df = (
                    dang.join(rank, on="p")
                    .agg(
                        F.coalesce(
                            F.sum(F.col("r").cast("decimal(30,15)")),
                            F.lit(0).cast("decimal(30,15)"),
                        )
                        .cast("double")
                        .alias("dm")
                    )
                )
                new_rank = base.join(F.broadcast(dm_df)).select(
                    "p",
                    (
                        F.lit(teleport) / F.col("n").cast("double")
                        + F.lit(damping)
                        * (
                            F.coalesce(F.col("_s"), F.lit(0.0))
                            + F.col("dm") / F.col("n").cast("double")
                        )
                    ).alias("r"),
                )
            else:
                new_rank = base.select(
                    "p",
                    (
                        F.lit(teleport) / F.col("n").cast("double")
                        + F.lit(damping) * F.coalesce(F.col("_s"), F.lit(0.0))
                    ).alias("r"),
                )
            # truncate lineage every checkpoint_every iterations (and at
            # the end).  Default 1 — interleaved A/B at sf0.1 (4 trials
            # each) measured checkpoint_every=2 a wash on the co-order
            # graph at iters=3 (medians 5.07 vs 4.92s): the saved
            # checkpoint job is repaid in deeper per-iteration plans.
            # The knob stays for high-iters graphs where the trade
            # flips.  Values are checkpoint-invariant either way, so the
            # iteration-replay oracle is untouched.
            if _i % checkpoint_every == checkpoint_every - 1 or _i == iters - 1:
                rank = new_rank.localCheckpoint()
            else:
                rank = new_rank
        return rank.select(F.col("p").alias("node"), F.col("r").alias("pagerank"))
    finally:
        edges_n.unpersist()
        nodes.unpersist()
        e.unpersist()


def cooccurrence_pagerank(
    lineitem: DataFrame,
    damping: float = 0.85,
    teleport: float = 0.15,
    iters: int = 3,
    top_k: int = 20,
) -> DataFrame:
    """PageRank over the part co-order graph: parts appearing in the
    same order are linked (weight = co-occurrence count), and ``iters``
    power iterations rank "hub" parts — the graph-analytics member of
    the operator family (connected components is the other), useful for
    importance-weighting items in recommendation/curation pipelines.

    Exactness contract (the oracle replays every iteration):

    * ``teleport`` is passed as its OWN literal — ``1 - 0.85`` differs
      from ``0.15`` by one ulp, so deriving it would break parity;
    * each per-edge contribution ``(rank * w) / outw`` is deterministic
      double math; the per-node SUM goes through DECIMAL(30,15), so
      partial-agg order cannot move an ulp between iterations;
    * co-order edges are symmetric, so every node has out-weight (no
      dangling-mass redistribution needed) and in-edges (no null
      coalesce ambiguity).

    Plan shape: the pair expansion is bounded per order (orders hold a
    handful of lineitems — never a corpus-scale quadratic), one groupBy
    builds the weighted edge list, then the generic ``pagerank``
    iterates (flat plan, no cache leak). Co-order edges are symmetric,
    so every node has out-weight — ``dangling='assume_none'`` keeps the
    exact arithmetic the iteration-replay oracle pins. Top-k via
    orderBy+limit.

    Pair expansion is groupBy(order)->collect_list->double explode, NOT
    a self-join on the order key: one exchange of the fact rows instead
    of the join's two plus the same pair generation, and the collected
    array is bounded by the items-per-order contract (single-digit for
    this schema) so no row can balloon. Interleaved A/B at sf0.1:
    median 3.41s -> 1.65s for the edge build, bit-identical edges
    (count + weight sum + xxhash64 bit_xor all equal)."""
    e = lineitem.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    )
    pairs = (
        e.groupBy("o")
        .agg(F.collect_list("p").alias("ps"))
        .select(F.explode("ps").alias("p"), "ps")
        .select("p", F.explode("ps").alias("q"))
        .filter(F.col("p") != F.col("q"))
    )
    edges = (
        pairs.groupBy("p", "q")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    ranks = pagerank(
        edges,
        src="p",
        dst="q",
        weight="w",
        damping=damping,
        teleport=teleport,
        iters=iters,
        dangling="assume_none",
        # co-order edges are symmetric (the pair expansion emits both
        # directions), so the r11 fast path applies: no node-table
        # union/persist, driver-scalar n, no per-iteration node join,
        # hash-built rank join, lazy lineage truncation
        input_symmetric=True,
    )
    return (
        ranks.orderBy(F.col("pagerank").desc(), F.col("node"))
        .limit(top_k)
        .select(F.col("node").alias("l_partkey"), "pagerank")
    )


def label_propagation(
    edges: DataFrame,
    src: str = "doc_id_a",
    dst: str = "doc_id_b",
    weight: str | None = None,
    iters: int = 3,
    input_symmetric: bool = False,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Synchronous weighted label propagation (Raghavan et al. 2007) —
    community detection, the third member of the graph family next to
    connected components (identity) and PageRank (importance): every
    node repeatedly adopts the label carrying the largest summed edge
    weight among its neighbors, ties by smallest label.  Communities
    split where CC would merge — dense cliques keep their own labels
    across a thin bridge.

    Deterministic by construction: synchronous updates (no visit-order
    dependence), integer/exact weight sums, (weight DESC, label ASC)
    tie-break — every iteration replays in SQL, the pagerank oracle
    pattern.  Fixed ``iters`` rather than convergence detection: LPA can
    oscillate on bipartite structures, and the downstream contract is
    "deterministic labels after T sweeps", not a fixpoint claim.

    ``input_symmetric=True`` declares the caller's contract that
    ``edges`` already contains BOTH directions of every undirected edge
    with equal weight and one row per directed edge (true of the
    co-order pair expansion, which emits (p,q) and (q,p) symmetrically
    and is grouped per pair).  The symmetrize-union-aggregate pass —
    a 2x-edge-volume shuffle plus a checkpoint job — is then skipped
    outright and the edge frame is used as-is; labels are invariant to
    this because argmax/tie-break only compare per-(node, label) weight
    sums, which the doubled symmetrized weights scale uniformly (r11
    measurement: the union+groupBy was ~1/3 of the query's wall).

    Plan shape per iteration (r11, guide §2.3-2.4): one edges-sized
    join that attaches the SOURCE endpoint's label (a shuffled-hash
    join with the node-sized label frame as build side — the edge side
    never sorts) + one (node, label)-keyed partial aggregation + one
    node-keyed argmax via ``max_by(label, struct(ws, -label))`` —
    deterministic because the label rides in the ordering key, so no
    group has tied keys; it partial-aggregates before its exchange
    where the previous row_number window shipped every (node, label)
    row to a sort.  (Both argmax forms execute as SortAggregate — the
    struct-typed buffer is not hash-aggregable — but the sort is over
    the node×label-bounded vote output, never the edges; interleaved
    A/B put max_by ahead of min-of-struct and both ahead of the
    window.)  Sweep 1 needs no join at all (the seed label of a node
    IS the node id, so the message labels are the edge's own source
    column).  The per-iteration left-join back onto the node table was
    dropped: in a symmetrized graph every node has at least one
    neighbor, so the argmax output already covers every node (the
    coalesce it fed could never fire).

    ``checkpoint_every`` truncates the label frontier's lineage (lazy
    localCheckpoint) every that-many sweeps, never after the last one
    (the caller's action materializes it).  Default 1: each sweep's
    subtree then executes exactly once even when the caller consumes
    the labels several times (graph_modularity feeds them to two
    joins), which a 4-variant interleaved A/B measured no slower than
    the un-truncated single-plan form even for a single consumer."""
    if iters < 1:
        raise ValueError(
            "label_propagation requires iters >= 1 (0 sweeps would leave "
            "every node's community as its own seed label — select the "
            "distinct endpoints yourself if that is what you want)"
        )
    w_expr = F.col(weight).cast("bigint") if weight else F.lit(1).cast("bigint")
    e = edges.select(
        F.col(src).cast("long").alias("u"),
        F.col(dst).cast("long").alias("v"),
        w_expr.alias("w"),
    )
    if input_symmetric:
        sym = e
    else:
        sym = (
            e.unionByName(
                e.select(
                    F.col("v").alias("u"), F.col("u").alias("v"), F.col("w")
                )
            )
            .groupBy("u", "v")
            .agg(F.sum("w").alias("w"))
            .localCheckpoint()
        )
    labels = None
    for _i in range(iters):
        if labels is None:
            # sweep 1: label(u) == u, so the message label is sym's own
            # source column — no join needed
            msg = sym.select(F.col("v"), F.col("u").alias("label"), "w")
        else:
            # attach the SOURCE endpoint's label and vote at the target:
            # by symmetry this is the same message set as attaching the
            # target's label and voting at the source, but it keys the
            # join on u — the partitioning both the pre-partitioned edge
            # frame and the previous sweep's node-keyed argmax output
            # already have, so neither side re-shuffles.  shuffle_hash:
            # build the node-sized label side, never sort the edges.
            msg = (
                sym.join(
                    labels.hint("shuffle_hash"), sym.u == labels.node
                ).select(F.col("v"), F.col("label"), "w")
            )
        if labels is None and input_symmetric:
            # the input_symmetric contract includes "one row per
            # directed edge", so sweep 1's (v, label=u) vote keys are
            # already unique — the (v, label) groupBy-sum would be a
            # no-op aggregation costing its own edge-sized exchange
            # (r12, guide §2.4).  Feed the argmax directly: the sum of
            # w over a one-row group IS w.
            cnt = msg.select("v", "label", F.col("w").alias("ws"))
        else:
            cnt = msg.groupBy("v", "label").agg(F.sum("w").alias("ws"))
        # argmax per node: max_by over struct(ws, -label) == (ws DESC,
        # label ASC) top-1 — deterministic (the label rides in the
        # ordering key, so no group has tied keys), partial-aggregating
        # before its exchange where the former row_number window
        # shipped every vote row to a sort
        labels = (
            cnt.groupBy("v")
            .agg(
                F.max_by(
                    F.col("label"),
                    F.struct(F.col("ws"), (-F.col("label")).alias("_nl")),
                ).alias("label")
            )
            .select(F.col("v").alias("node"), "label")
        )
        if _i < iters - 1 and (_i + 1) % checkpoint_every == 0:
            labels = labels.localCheckpoint(eager=False)
    return labels.select("node", F.col("label").alias("community"))


def kcore(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 3,
    src: str = "u",
    dst: str = "v",
    input_symmetric: bool = False,
) -> DataFrame:
    """k-core peel, ``rounds`` synchronous iterations: repeatedly drop
    nodes of degree < ``k`` (dropping a node lowers its neighbors'
    degrees, so the peel cascades).  The dense-core extractor for
    duplicate/co-occurrence graphs: a dedup pair graph's k-core is its
    template-spam heart; the low-core fringe is incidental similarity.
    Full convergence needs O(peel depth) rounds — callers pick
    ``rounds`` the way pagerank picks iters, and each round replays
    exactly in SQL (the LPA/pagerank iteration-replay pattern).

    Returns (node, degree) for nodes surviving ``rounds`` peels, with
    their degree INSIDE the surviving subgraph.

    Scale shape: per round one degree aggregation (node-cardinality
    output) + two semi-joins of the edge list against the survivor set
    — every shuffle is on a node key, nothing quadratic; lineage is
    checkpoint-truncated per round so round r's plan does not re-derive
    rounds 1..r-1."""
    e = edges.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    ).filter(F.col("u") != F.col("v"))
    if input_symmetric:
        # both directions already present: skip the union, halving the
        # distinct's shuffle input (r11, guide §2.3)
        sym = e.distinct()
    else:
        sym = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).distinct()
    alive = sym.localCheckpoint()
    for r in range(rounds):
        keep = (
            alive.groupBy("u")
            .agg(F.count(F.lit(1)).alias("_d"))
            .filter(F.col("_d") >= k)
            .select("u")
        )
        # v-side semi first, u-side last (r11, guide §2.4): the round's
        # output is then hash-partitioned on u, which the NEXT round's
        # degree aggregate and u-side semi-join reuse without an
        # exchange (filter order is irrelevant to the surviving set)
        alive = alive.join(
            keep.select(F.col("u").alias("v")), on="v", how="left_semi"
        ).join(keep, on="u", how="left_semi")
        if r < rounds - 1:
            alive = alive.localCheckpoint(eager=False)
    return alive.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("degree")
    )


def jaccard_link_prediction(
    edges: DataFrame,
    top: int = 50,
    min_common: int = 2,
    src: str = "u",
    dst: str = "v",
    max_degree: int | None = 64,
    input_symmetric: bool = False,
) -> DataFrame:
    """Neighborhood-Jaccard link prediction: for node pairs that share
    at least ``min_common`` neighbors but are NOT already connected,
    score ``|N(a) ∩ N(b)| / |N(a) ∪ N(b)|`` and return the ``top``
    candidates — the classic missing-edge / entity-resolution
    suggestion list (Liben-Nowell & Kleinberg 2003).

    Exactness: neighbor sets are exact distinct edge lists, so common
    and union counts are integers and the score is one int/int double
    division; ties break by (score desc, a, b) so the top-k is total.

    Hub cap (r09 verdict — the uncapped wedge expansion was the
    round's one scale-killer): a wedge center of degree d fans out
    d^2/2 candidate pairs, ALL landing on one join key — quadratic
    volume and shuffle skew on exactly the graphs this operator is for
    (dedup pair graphs with template-spam hearts).  ``max_degree``
    bounds it: each center contributes wedges from at most
    ``max_degree`` of its neighbors, chosen DETERMINISTICALLY by
    md5(center:neighbor) rank so reruns and the SQL oracle replay the
    identical sample.  Per-center fan-out is then <= max_degree^2/2
    regardless of skew.  Recall trade-off: common-neighbor counts that
    route through capped hubs are undercounted (never overcounted), so
    hub-mediated pairs can drop below ``min_common`` or score lower —
    acceptable for top-k ranking because a hub's Jaccard contribution
    is near-zero anyway (the union term grows with d while the hub
    adds 1 to the intersection).  Exact degrees (uncapped) stay in the
    denominator.  Pass ``max_degree=None`` for the exact expansion on
    graphs known to be hub-free.

    Scale shape: candidate pairs come from the WEDGE expansion (two
    edges sharing an endpoint — the triangle_count fan-out), bounded by
    ``V * max_degree^2`` after the cap, never |V|^2; the cap itself is
    one node-keyed window rank; the anti-join against existing edges
    and the degree join are node/edge-keyed; the final top-k is a
    mergeable orderBy+limit (TakeOrderedAndProject), not a global
    window."""
    e = edges.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    ).filter(F.col("u") != F.col("v"))
    if input_symmetric:
        # both directions already present: skip the union, halving the
        # distinct's shuffle input (r11, guide §2.3)
        sym = e.distinct()
    else:
        sym = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).distinct()
    sym = sym.localCheckpoint()
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("_d"))
    wedge_src = sym
    if max_degree is not None:
        wc = Window.partitionBy("u").orderBy(
            F.md5(
                F.concat(
                    F.col("u").cast("string"),
                    F.lit(":"),
                    F.col("v").cast("string"),
                )
            )
        )
        wedge_src = (
            sym.withColumn("_hr", F.row_number().over(wc))
            .filter(F.col("_hr") <= max_degree)
            .select("u", "v")
        )
    # wedges via capped-adjacency double explode (r12, guide §2.4 — the
    # triangle_count / cooccurrence_pagerank move): collect each
    # center's capped neighbor list (bounded <= max_degree rows, and the
    # groupBy reuses the cap window's hash partitioning on u, so NO new
    # exchange) and explode the a < b pairs out of it.  Same wedge
    # multiset as the former a-join-b self-join — each unordered pair of
    # capped neighbors of w exactly once — but no join ever materializes
    # the wedge rows, so the self-join's per-side sorts/hash build are
    # gone and the only wedge-sized exchange left is the partial-agged
    # groupBy(a, b).  With max_degree=None (exact mode, hub-free graphs
    # only per the docstring) the list is the full neighborhood.
    nbrs = wedge_src.groupBy("u").agg(F.collect_list("v").alias("_nbrs"))
    common = (
        nbrs.select(F.explode("_nbrs").alias("a"), "_nbrs")
        .select("a", F.explode("_nbrs").alias("b"))
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )
    linked = sym.select(
        F.col("u").alias("a"), F.col("v").alias("b")
    )
    cand = common.join(linked, on=["a", "b"], how="left_anti")
    scored = (
        cand.join(deg.select(F.col("u").alias("a"), F.col("_d").alias("_da")), on="a")
        .join(deg.select(F.col("u").alias("b"), F.col("_d").alias("_db")), on="b")
        .select(
            "a",
            "b",
            F.col("n_common").cast("bigint").alias("n_common"),
            (
                F.col("n_common").cast("double")
                / (F.col("_da") + F.col("_db") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
        )
    )
    return scored.orderBy(
        F.desc("jaccard"), F.asc("a"), F.asc("b")
    ).limit(top)


def modularity(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "u",
    dst: str = "v",
    weight: str | None = None,
    node_col: str = "node",
    label_col: str = "label",
    input_symmetric: bool = False,
) -> DataFrame:
    """Newman modularity of a community assignment: per community c,
    ``Q_c = in_c/(2m) - (d_c/(2m))^2`` over the symmetrized weighted
    edge list (in_c counts both directions of intra-community edges,
    d_c is the community's total degree weight, 2m the total) — the
    quality score for label_propagation's output, closing the loop the
    LPA docstring gestures at ("modularity-ish grouping"): detect
    communities, then MEASURE how modular they actually are.  Sum of
    q_contrib over the output = Q; Q near 0 means the partition is no
    better than random, ~0.3+ means real community structure.

    Exactness: symmetrization and weights mirror label_propagation's
    (union both directions, groupBy-sum), so in_c/d_c/two_m are exact
    BIGINTs; q_contrib is closed-form doubles in one fixed association
    (in/2m - (d/2m)*(d/2m)) the oracle mirrors.

    Scale shape: two node-keyed joins of the edge list against the
    label table (the LPA per-round shape), then aggregations bounded by
    community count; the 1-row two_m scalar is a broadcast cross join.
    Nothing quadratic, no global windows."""
    w_expr = F.col(weight).cast("bigint") if weight else F.lit(1).cast("bigint")
    e = edges.select(
        F.col(src).cast("long").alias("u"),
        F.col(dst).cast("long").alias("v"),
        w_expr.alias("w"),
    ).filter(F.col("u") != F.col("v"))
    if input_symmetric:
        # the caller declares edges already hold BOTH directions of
        # every undirected edge with equal weight, one row per directed
        # edge (the co-order pair expansion's contract): the union +
        # groupBy symmetrization then reduces to doubling the weight in
        # place — bit-identical in/degree/2m sums (each (u,v) would
        # have received w_uv + w_vu = 2*w_uv), zero extra shuffle
        # (r11, guide §2.4).
        sym = e.select("u", "v", (F.col("w") * 2).alias("w")).localCheckpoint(
            eager=False
        )
    else:
        sym = (
            e.unionByName(
                e.select(F.col("v").alias("u"), F.col("u").alias("v"), F.col("w"))
            )
            .groupBy("u", "v")
            .agg(F.sum("w").alias("w"))
            # LAZY localCheckpoint, not persist (r10 ADVICE): all three
            # consumers (two_m, deg, in_c) sit under ONE final action, so
            # the checkpoint materializes once on first use with no extra
            # eager job — same one-compute behavior as persist — but its
            # blocks are ContextCleaner-reclaimed when the result frame goes
            # out of scope, instead of pinning one edge-sized cache per call
            # in a long-lived session (no caller-owned cleanup needed).
            .localCheckpoint(eager=False)
        )
    lab = labels.select(
        F.col(node_col).cast("long").alias("_n"),
        F.col(label_col).cast("long").alias("_lbl"),
    )
    # r12 negative result (kept for the record, like the r11 centroid
    # drift one-scan attempt): a fused one-pass form for the symmetric
    # case — degree/two_m read off the incoming-message sums of the
    # in_c aggregation, one node-scale combine, one community aggregate
    # — is bit-identical (property-tested) but measured consistently
    # SLOWER in a 6-trial interleaved A/B at sf0.1 (min 4.80 vs 5.03s,
    # med 5.11 vs 5.56s for graph_modularity): the three cheap columnar
    # rescans of the checkpointed edge frame beat the extra join stage
    # + node-scale checkpoint the fusion needs.  The 3-pass shape stays.
    two_m = sym.agg(F.sum("w").alias("_2m"))
    deg = sym.groupBy("u").agg(F.sum("w").alias("_d"))
    d_c = (
        deg.join(lab, deg.u == lab._n)
        .groupBy("_lbl")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.sum("_d").cast("bigint").alias("degree_w"),
        )
    )
    # internal weight via the message shape (r11, guide §2.3): attach
    # the SOURCE label, partially aggregate per (target, source-label)
    # — the exchange then carries the compressed (v, label) sums, not
    # raw edges — and only then attach the TARGET label node-keyed.
    # Algebraically identical to the former double edge-sized join
    # (sum over edges with equal endpoint labels, exact BIGINTs), but
    # the second join moves |V|-scale rows instead of |E|-scale.
    in_c = (
        sym.join(
            lab.select(F.col("_n"), F.col("_lbl").alias("_lu")).hint(
                "shuffle_hash"
            ),
            sym.u == F.col("_n"),
        )
        .groupBy("v", "_lu")
        .agg(F.sum("w").alias("_ws"))
        .join(
            lab.select(F.col("_n"), F.col("_lbl").alias("_lv")).hint(
                "shuffle_hash"
            ),
            F.col("v") == F.col("_n"),
        )
        .filter(F.col("_lu") == F.col("_lv"))
        .groupBy(F.col("_lu").alias("_lbl"))
        .agg(F.sum("_ws").cast("bigint").alias("internal_w"))
    )
    tm = F.col("_2m").cast("double")
    din = F.col("internal_w").cast("double")
    dd = F.col("degree_w").cast("double")
    return (
        d_c.join(in_c, on="_lbl", how="left")
        .na.fill({"internal_w": 0})
        .crossJoin(F.broadcast(two_m))
        .select(
            F.col("_lbl").alias("community"),
            "n_nodes",
            F.col("internal_w").cast("bigint").alias("internal_w"),
            "degree_w",
            (din / tm - (dd / tm) * (dd / tm)).alias("q_contrib"),
        )
    )


def adamic_adar_link_prediction(
    edges: DataFrame,
    top: int = 50,
    min_common: int = 2,
    src: str = "u",
    dst: str = "v",
    max_degree: int | None = 64,
    input_symmetric: bool = False,
) -> DataFrame:
    """Adamic-Adar link prediction (Adamic & Adar 2003): unlinked pairs
    scored ``sum over shared neighbors w of 1/ln(deg(w))`` — the
    degree-discounted companion to jaccard_link_prediction: a shared
    RARE neighbor is strong evidence, a shared hub is weak evidence,
    which is exactly the weighting the Jaccard score lacks.

    Exactness: wedge-center weights are one double division of an
    exact BIGINT degree (every wedge center has degree >= 2, so
    ln(deg) > 0); per-pair scores sum the weights through
    DECIMAL(30,15) so partial-agg order cannot move the last ulp;
    common counts ride along as exact integers; ties break
    (score desc, a, b).

    Scale shape: identical to jaccard_link_prediction — the same
    ``max_degree`` md5-rank hub cap bounds per-center wedge fan-out to
    max_degree^2 (weights use the FULL degree, so a capped hub that
    does land in a wedge still carries its honest tiny 1/ln(d)),
    node/edge-keyed joins, mergeable top-k."""
    e = edges.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    ).filter(F.col("u") != F.col("v"))
    if input_symmetric:
        # both directions already present: skip the union, halving the
        # distinct's shuffle input (r11, guide §2.3)
        sym = e.distinct()
    else:
        sym = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).distinct()
    sym = sym.localCheckpoint()
    if max_degree is not None:
        # one window pass computes BOTH the md5-rank cap and the FULL
        # degree (r12): count() over the same partition key rides the
        # cap window's exchange+sort for free, replacing the former
        # separate degree aggregation + edge-sized join (guide §2.4).
        wc = Window.partitionBy("u").orderBy(
            F.md5(
                F.concat(
                    F.col("u").cast("string"),
                    F.lit(":"),
                    F.col("v").cast("string"),
                )
            )
        )
        nbrs = (
            sym.withColumn("_hr", F.row_number().over(wc))
            .withColumn("_d", F.count(F.lit(1)).over(Window.partitionBy("u")))
            .filter(F.col("_hr") <= max_degree)
            .groupBy("u")
            .agg(
                F.collect_list("v").alias("_nbrs"),
                F.first("_d").alias("_d"),
            )
        )
    else:
        nbrs = sym.groupBy("u").agg(
            F.collect_list("v").alias("_nbrs"),
            F.count(F.lit(1)).alias("_d"),
        )
    # wedges via capped-adjacency double explode (r12, guide §2.4 — the
    # triangle_count move, see jaccard_link_prediction): the center
    # weight 1/ln(deg(w)) is constant per center, computed once on the
    # node-sized adjacency row before the explode; the capped list is
    # bounded <= max_degree and the groupBy reuses the window's hash
    # partitioning on u, so the only wedge-sized exchange left is the
    # partial-agged groupBy(a, b) — the self-join's per-side sorts and
    # wedge-row materialization are gone.  Same wedge multiset, and the
    # DECIMAL(30,15) score sums are partial-agg-order-free, so results
    # are bit-identical.
    weighted = (
        # a center with < 2 capped neighbors yields no a < b pair, so
        # dropping it first is free — and it is the ONLY row whose
        # degree can be 1, so the filter also keeps ln(_d) > 0 out of
        # ANSI divide-by-zero territory (the old join form only dodged
        # that because codegen deferred the division past the filter)
        nbrs.filter(F.size("_nbrs") >= 2)
        .select(
            (F.lit(1.0) / F.log(F.col("_d").cast("double")))
            .cast("decimal(30,15)")
            .alias("_wt"),
            F.explode("_nbrs").alias("a"),
            "_nbrs",
        )
        .select("_wt", "a", F.explode("_nbrs").alias("b"))
        .filter(F.col("a") < F.col("b"))
    )
    common = (
        weighted.groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_common"),
            F.sum("_wt").alias("_aa"),
        )
        .filter(F.col("n_common") >= min_common)
    )
    linked = sym.select(F.col("u").alias("a"), F.col("v").alias("b"))
    cand = common.join(linked, on=["a", "b"], how="left_anti")
    return (
        cand.select(
            "a", "b", "n_common",
            F.col("_aa").cast("double").alias("adamic_adar"),
        )
        .orderBy(F.desc("adamic_adar"), F.asc("a"), F.asc("b"))
        .limit(top)
    )
