"""Similarity search over embedding columns.

Three tiers, all UDF-free (Catalyst higher-order functions only):

* ``brute_force_topk`` — exact cosine top-k: broadcast the (small) query
  set against the corpus, windowed top-k. At 100 TB this is one scan of
  the corpus per query batch; correct baseline and the oracle for the
  approximate variants.
* ``ivf_topk`` — IVF-style: corpus pre-clustered to K centroids (nearest-
  centroid assignment); queries probe only the ``nprobe`` nearest
  centroids, shrinking the scanned fraction to ~nprobe/K. The centroid
  assignment is a one-off batch job whose output is bucketed/partitioned
  by centroid id — the probe join then prunes partitions.
* ``lsh_bucket_topk`` — sign-random-projection LSH: vectors bucketed by
  the sign pattern of P fixed hyperplanes (deterministic, seeded);
  candidates = same-bucket pairs, re-ranked exactly. Recall tunable via
  bands of planes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.df_utils import spread
from ..functions.vector_fns import cosine, dot, l2_norm, normalize

# -- exact brute force ------------------------------------------------------


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scorer=None,
) -> DataFrame:
    """Exact cosine top-k of every query against the corpus.

    Output: (query_id, neighbor_id, cos_sim, rank). Ties broken by
    neighbor id for determinism. The query side is broadcast — the corpus
    (the 100 TB side) streams through one scan with no shuffle until the
    per-query top-k aggregation, which carries only k rows per query per
    partition after the window's partial rank pruning.

    ``scorer(a, b) -> Column`` swaps the similarity kernel; default is
    the JVM-side ``cosine``, ``cosine_arrow`` plugs in the pandas-UDF
    path for wide embeddings.

    Default-kernel algebra: ``cosine(q, c)`` re-derives BOTH norms per
    pair, so each scored pair pays three interpreted array folds. The
    norms only depend on one side each, so they are computed once per
    vector (one fold per corpus row / per broadcast query row) and the
    per-pair work drops to the dot fold alone — the VALUE is bitwise
    unchanged (same doubles, same ``q_norm * c_norm`` multiply order as
    ``cosine``), so oracle hash parity holds. A custom scorer keeps the
    opaque per-pair form."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    # spread: the per-pair fold is CPU-bound and a small parquet corpus
    # scans as one partition (no-op at real scale)
    c = spread(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
        )
    )
    if scorer is None:
        q = q.withColumn("_qn", l2_norm(F.col("q_vec")))
        c = c.withColumn("_cn", l2_norm(F.col("c_vec")))
        sim = dot(F.col("q_vec"), F.col("c_vec")) / (
            F.col("_qn") * F.col("_cn")
        )
    else:
        sim = scorer(F.col("q_vec"), F.col("c_vec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rank").cast("int").alias("rank"))
    )


def range_search(
    corpus: DataFrame,
    queries: DataFrame,
    min_cosine: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All corpus vectors within ``min_cosine`` of each query (radius
    search — the retrieval mode dedup and contamination checks use,
    where the neighbor COUNT is unknown a priori so top-k is the wrong
    shape). Same plan skeleton as ``brute_force_topk`` minus the window:
    broadcast query side, one corpus scan, threshold filter evaluated
    inside the scan stage — output is only the qualifying pairs, so no
    shuffle at all. Norms are precomputed once per vector per side
    (bitwise-identical to ``cosine`` — see brute_force_topk)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(F.col(vec_col)).alias("_qn"),
    )
    c = spread(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("c_vec"),
            l2_norm(F.col(vec_col)).alias("_cn"),
        )
    )
    sim = dot(F.col("q_vec"), F.col("c_vec")) / (F.col("_qn") * F.col("_cn"))
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("cos_sim"))
        .filter(F.col("cos_sim") >= min_cosine)
    )


# -- IVF (inverted file) ----------------------------------------------------


def pick_centroids(corpus: DataFrame, every_nth: int = 50, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Deterministic centroid set: every Nth vector by id. A k-means pass
    would drop in here unchanged; the IVF mechanics below only need *some*
    centroid table (centroid_id, centroid_vec)."""
    return corpus.filter(F.col(id_col) % every_nth == 0).select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("centroid_vec")
    )


def assign_to_centroids(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment (by cosine), map-only.

    The centroid table is tiny by contract, so it is collected and
    unit-normalized driver-side, then embedded as a literal
    array<struct<cid, cvec>>; each corpus row computes its argmax dot
    product in a single projection. ZERO shuffle — the previous
    formulation (crossJoin + row_number window partitioned by vec_id)
    shuffled num_centroids x corpus rows, which is exactly the wrong
    shape at 100 TB. Ties break to the smaller centroid id. At scale,
    persist the output partitioned/bucketed BY centroid_id so probe
    joins prune."""
    import math

    rows = centroids.select("centroid_id", "centroid_vec").collect()
    units: list[tuple[int, list[float]]] = []
    for r in rows:
        v = [float(x) for x in r["centroid_vec"]]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        units.append((int(r["centroid_id"]), [x / n for x in v]))
    units.sort()  # ascending cid -> numpy argmax tie-break = smallest id

    # The literal-unroll path pays the interpreted-HOF cliff PER CENTROID
    # (each dot column re-substitutes the normalize fold after project
    # collapse): measured 3.7s vs 0.3s for the Arrow matmul at C=40,
    # corpus 2000x64, sf0.1 — the crossover is a handful of centroids,
    # not ~64 as first assumed. Keep the JVM path only for tiny centroid
    # sets where a python worker round-trip isn't worth starting; the
    # Arrow path does one numpy matmul per batch against the centroid
    # matrix shipped in the UDF closure. Both are map-only.
    if len(units) > 4:
        return _assign_arrow(corpus, units, id_col, vec_col)

    staged = corpus.select(
        F.col(id_col), F.col(vec_col), normalize(F.col(vec_col)).alias("_u")
    )
    # one TOP-LEVEL dot column per centroid: higher-order functions nested
    # inside another lambda take Catalyst's interpreted path and are ~50x
    # slower; as plain projection columns they stay on the fast path, and
    # the staged _u (referenced num_centroids times) is computed once
    sims = staged.select(
        "*",
        *[
            dot(F.col("_u"), F.array(*[F.lit(x) for x in cvec])).alias(f"_s{i}")
            for i, (_, cvec) in enumerate(units)
        ],
    )
    # argmax by (sim, -cid): struct array_max compares field-wise, so ties
    # resolve to the larger -cid, i.e. the SMALLER centroid id
    pairs = F.array(*[
        F.struct(
            F.col(f"_s{i}").alias("sim"), F.lit(-cid).cast("long").alias("ncid")
        )
        for i, (cid, _) in enumerate(units)
    ])
    best = F.array_max(pairs)
    return sims.select(
        F.col(id_col), F.col(vec_col), (-best["ncid"]).alias("centroid_id")
    )


def _assign_arrow(
    corpus: DataFrame,
    units: list[tuple[int, list[float]]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Arrow-path nearest-centroid assignment: unit-normalized centroid
    matrix in the UDF closure, one (batch x dim) @ (dim x C) matmul +
    argmax per Arrow batch. Ties -> first (= smallest) centroid id
    because ``units`` is sorted ascending."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    cids = np.array([c for c, _ in units], dtype=np.int64)
    U = np.array([v for _, v in units], dtype=np.float64)  # (C, D), unit rows

    def _nearest(vs):
        A = np.stack(vs.to_numpy()).astype(np.float64)
        norms = np.linalg.norm(A, axis=1)
        norms[norms == 0.0] = 1.0
        sims = (A / norms[:, None]) @ U.T
        return pd.Series(cids[np.argmax(sims, axis=1)])

    _nearest.__annotations__ = {"vs": pd.Series, "return": pd.Series}
    udf = pandas_udf(_nearest, "long")
    return spread(corpus.select(F.col(id_col), F.col(vec_col))).select(
        F.col(id_col), F.col(vec_col), udf(F.col(vec_col)).alias("centroid_id")
    )


def kmeans_centroids(
    corpus: DataFrame,
    k: int = 50,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_fraction: float | None = None,
    seed: int = 42,
    init: DataFrame | None = None,
) -> DataFrame:
    """Lloyd's k-means refinement of IVF centroids.

    Init = ``init`` (a (centroid_id, centroid_vec) frame, e.g.
    pick_centroids' every-Nth-BY-ID set — fully deterministic and
    SQL-replayable) or, when omitted, every-Nth-by-physical-order with
    ids 1..k (deterministic given a fixed partitioning only).  Each
    iteration assigns (map-only, the same JVM/Arrow kernel IVF probing
    uses) and recomputes elementwise means via posexplode +
    groupBy(centroid, dim) — k*dim partial aggregates, shuffled as
    (k*dim) rows total after map-side combine.  Means accumulate in
    DECIMAL(30,15) (r10): partial-aggregation-order-free, so every
    iteration — not just the first — is bit-replayable in SQL (the
    embedding_kmeans_step oracle form), which is what lets
    ann_ivf_kmeans_topk's oracle replay the whole refinement loop.
    Run on a SAMPLE at 100 TB (``sample_fraction``): centroid quality
    needs ~1000 points per centroid, not the full corpus; only the
    final assignment pass touches everything. Empty clusters keep
    their previous centroid. Returns (centroid_id, centroid_vec)."""
    # array<double> throughout: iterated means are double, and coalesce
    # with float init vectors would be a type mismatch
    pts = corpus.select(
        F.col(id_col).alias("_pid"), F.col(vec_col).cast("array<double>").alias("_v")
    )
    if sample_fraction:
        pts = pts.sample(fraction=sample_fraction, seed=seed)
    pts = pts.localCheckpoint()
    if init is not None:
        cents = init.select(
            F.col("centroid_id").cast("long"),
            F.col("centroid_vec").cast("array<double>"),
        ).localCheckpoint()
    else:
        n = pts.count()
        every_nth = max(1, n // k)
        cents = (
            pts.withColumn("_rn", F.monotonically_increasing_id())
            .filter(F.pmod(F.col("_rn"), F.lit(every_nth)) == 0)
            .limit(k)
            .select(
                F.row_number().over(Window.orderBy("_pid")).cast("long").alias("centroid_id"),
                F.col("_v").alias("centroid_vec"),
            )
        )
    import math

    for _ in range(iters):
        # always the Arrow matmul kernel here: the iteration loop calls
        # assignment `iters` times, and the JVM literal-unroll path pays
        # its interpreted-HOF cost per call
        rows = cents.collect()
        units = []
        for r in rows:
            v = [float(x) for x in r["centroid_vec"]]
            nrm = math.sqrt(sum(x * x for x in v)) or 1.0
            units.append((int(r["centroid_id"]), [x / nrm for x in v]))
        units.sort()
        assigned = _assign_arrow(pts, units, "_pid", "_v")
        means = (
            assigned.select("centroid_id", F.posexplode(F.col("_v")).alias("dim", "x"))
            .groupBy("centroid_id", "dim")
            # DECIMAL accumulator, then one double division: the sum is
            # order-free so the refined centroid is identical across
            # partitionings AND replays exactly in DuckDB as
            # CAST(SUM(CAST(x AS DECIMAL(30,15))) AS DOUBLE)/count(*)
            .agg(
                (
                    F.sum(F.col("x").cast("decimal(30,15)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("m")
            )
            .groupBy("centroid_id")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("pairs"))
            .select(
                "centroid_id",
                F.transform(F.col("pairs"), lambda p: p["m"]).alias("centroid_vec"),
            )
        )
        # empty clusters: keep previous centroid
        prev = cents.withColumnRenamed("centroid_vec", "_prev")
        cents = (
            prev.join(means, on="centroid_id", how="left")
            .select(
                "centroid_id",
                F.coalesce(F.col("centroid_vec"), F.col("_prev")).alias("centroid_vec"),
            )
        ).localCheckpoint()
    return cents


def build_ivf_index(
    corpus: DataFrame,
    every_nth: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_iters: int = 0,
    kmeans_sample: float | None = None,
):
    """One-off IVF index build: (centroids, assignment). The assignment
    is materialized (localCheckpoint here; at scale, write it bucketed/
    partitioned BY centroid_id) — probing must hit a *stored* index, not
    re-derive the assignment lineage per query: recomputation both
    rescans the corpus and re-inflates the argmax expression tree
    through every downstream join.

    ``kmeans_iters > 0`` refines the every-Nth seed centroids with
    Lloyd's iterations (optionally on a sample) before the final
    assignment — better-balanced buckets, higher probe recall.  The
    seed set is pick_centroids' every-Nth-BY-ID selection (the same
    SQL-expressible set the unrefined index uses), so the refined
    index is deterministic end-to-end and ann_ivf_kmeans_topk's oracle
    replays init + every Lloyd step + probe (r10)."""
    if kmeans_iters > 0:
        cents = kmeans_centroids(
            corpus, iters=kmeans_iters, id_col=id_col, vec_col=vec_col,
            sample_fraction=kmeans_sample,
            init=pick_centroids(corpus, every_nth, id_col, vec_col),
        ).localCheckpoint()
    else:
        cents = pick_centroids(corpus, every_nth, id_col, vec_col)
    assigned = assign_to_centroids(corpus, cents, id_col, vec_col).localCheckpoint()
    return cents, assigned


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    every_nth: int = 50,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index=None,
) -> DataFrame:
    """Approximate top-k: probe only the nprobe nearest centroids' buckets.

    Scanned fraction ~= nprobe / num_centroids; with a bucketed corpus the
    probe join is partition-pruned rather than a full scan. Pass ``index``
    (from build_ivf_index) to amortize the build across query batches."""
    cents, assigned = index if index is not None else build_ivf_index(
        corpus, every_nth, id_col, vec_col
    )

    # query norm computed once per query (not per centroid, not per
    # candidate); corpus norm once per indexed row — values bitwise-equal
    # to cosine() (same doubles, same multiply order)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(F.col(vec_col)).alias("_qn"),
    )
    q_scored = q.crossJoin(F.broadcast(cents)).select(
        "query_id",
        "q_vec",
        "_qn",
        "centroid_id",
        (
            dot(F.col("q_vec"), F.col("centroid_vec"))
            / (F.col("_qn") * l2_norm(F.col("centroid_vec")))
        ).alias("c_sim"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("c_sim"), F.asc("centroid_id"))
    probes = (
        q_scored.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "q_vec", "_qn", "centroid_id")
    )

    cand = probes.join(
        assigned.withColumn("_cn", l2_norm(F.col(vec_col))), on="centroid_id"
    ).filter(F.col(id_col) != F.col("query_id"))
    scored = cand.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        (dot(F.col("q_vec"), F.col(vec_col)) / (F.col("_qn") * F.col("_cn"))).alias(
            "cos_sim"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rank").cast("int").alias("rank"))
    )


# -- sign-random-projection LSH --------------------------------------------


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive/embedding training: for each
    anchor, the top-k most-similar corpus vectors with a DIFFERENT
    label — the pairs that teach a metric model the most (easy random
    negatives saturate the loss immediately). Same plan shape as
    brute_force_topk (query side broadcast, corpus streams, window
    top-k keeps k rows per query per partition); the label inequality
    rides the scored filter, so no extra pass. At IVF scale, swap the
    scored scan for the probe-bucket candidates unchanged.

    Output: (query_id, negative_id, cos_sim, rank)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.col(label_col).alias("q_label"),
        l2_norm(F.col(vec_col)).alias("_qn"),
    )
    c = spread(
        corpus.select(
            F.col(id_col).alias("negative_id"),
            F.col(vec_col).alias("c_vec"),
            F.col(label_col).alias("c_label"),
            l2_norm(F.col(vec_col)).alias("_cn"),
        )
    )
    # norms once per vector per side; value bitwise-equal to cosine()
    sim = dot(F.col("q_vec"), F.col("c_vec")) / (F.col("_qn") * F.col("_cn"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("c_label") != F.col("q_label"))
        .select("query_id", "negative_id", sim.alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("negative_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "negative_id",
            "cos_sim",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def brute_force_topk_matrix(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k, matrix production kernel: the query matrix
    (bounded by contract — an audit/anchor set) ships in the UDF
    closure; each corpus Arrow batch does ONE numpy matmul against it
    and emits only its per-query partial top-k (k rows per query per
    batch), then a global window keeps the true top-k. This is the
    100 TB shape — per-partition partial reduction before any shuffle;
    the shuffle carries k x queries x partitions rows, never the
    corpus. ~40-70x faster than the per-row fold/scalar-UDF kernels at
    2000x2000 (1.2s steady / 7.4s cold vs 45.6/86s measured at sf0.1); agreement with the
    fold kernel is ~1e-12 (numpy summation order), so use
    brute_force_topk where oracle bit-parity matters."""
    import numpy as np
    import pandas as pd

    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([int(r[id_col]) for r in q_rows], dtype=np.int64)
    qm = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in q_rows])
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)

    def score(batches):
        for pdf in batches:
            ids = pdf[id_col].astype("int64").to_numpy()
            cm = np.stack(pdf[vec_col].map(np.asarray).to_numpy()).astype(
                np.float64
            )
            cn = cm / np.linalg.norm(cm, axis=1, keepdims=True)
            sims = cn @ qn.T  # (batch, nq)
            kk = min(k + 1, sims.shape[0])  # +1 absorbs a self-match
            top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, nq)
            out_q, out_n, out_s = [], [], []
            for j in range(sims.shape[1]):
                for i in top[:, j]:
                    out_q.append(q_ids[j])
                    out_n.append(ids[i])
                    out_s.append(sims[i, j])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cos_sim": out_s}
            )

    # spread: one Arrow batch per input partition — a 1-partition scan
    # would run the matmul kernel on a single core (no-op at real scale)
    partial = spread(corpus.select(id_col, vec_col)).mapInPandas(
        score, schema="query_id long, neighbor_id long, cos_sim double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        partial.filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "cos_sim",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def knn_label_noise(
    corpus: DataFrame,
    k: int = 5,
    min_disagree: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    anchors: DataFrame | None = None,
    scorer=None,
    kernel: str = "fold",
) -> DataFrame:
    """Label-noise detection by k-NN disagreement: a vector whose
    nearest neighbors (cosine) overwhelmingly carry a DIFFERENT label
    is a probable annotation error — the standard ML-data-quality
    audit (Confident-Learning-style, distilled to its join form).
    Output: (vec_id, label, n_disagree, noise_frac) for vectors with
    noise_frac >= min_disagree.

    ``anchors`` bounds the audited side (default: the whole corpus —
    the self-kNN verifier form). Kernel choice is the cardinality rule
    (README note 9): the default sequential-fold ``cosine`` is
    bitwise-equal to the oracle but pays the interpreted-HOF cost per
    pair, so bound the anchor set when using it (measured 86s for a
    2000x2000 self-audit at sf0.1); pass ``scorer=cosine_arrow`` for
    corpus-scale audits (numpy batch kernel, ~1e-12 agreement —
    count-parity pytest covers it). At 100 TB run the same aggregation
    over ivf_topk probes against the persisted index
    (streaming/ann_index.py) instead of any brute-force scan."""
    q_side = anchors if anchors is not None else corpus
    labels = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("n_label")
    )
    if kernel == "matrix":
        topk = brute_force_topk_matrix(
            corpus, q_side, k=k, id_col=id_col, vec_col=vec_col
        )
    else:
        topk = brute_force_topk(
            corpus, q_side, k=k, id_col=id_col, vec_col=vec_col, scorer=scorer
        )
    own = q_side.select(F.col(id_col).alias("query_id"), F.col(label_col))
    joined = topk.join(labels, on="neighbor_id").join(own, on="query_id")
    agg = joined.groupBy("query_id", label_col).agg(
        F.sum(
            F.when(F.col("n_label") != F.col(label_col), 1).otherwise(0)
        ).cast("long").alias("n_disagree"),
        F.count(F.lit(1)).alias("_k"),
    )
    return (
        agg.select(
            F.col("query_id").alias(id_col),
            label_col,
            "n_disagree",
            (F.col("n_disagree").cast("double") / F.col("_k").cast("double")).alias(
                "noise_frac"
            ),
        )
        .filter(F.col("noise_frac") >= min_disagree)
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    n_codes: int = 16,
    every_nth: int = 10,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization ANN: the memory-side scale path the IVF/LSH
    members don't cover. The 64-dim vector compresses to ``m`` small
    codes (8 codes x 16 centroids = 8 BYTES per vector, an 32x cut vs
    float32), and query scoring reads only the codes plus a per-query
    lookup table — at 100 TB the float vectors are cold storage and the
    whole searchable index fits in a fraction of the cluster's RAM.

    * Codebooks: deterministic every-Nth rows (vec_id = j*every_nth,
      j < n_codes) sliced into m sub-spaces — the same SQL-reproducible
      init the IVF/k-means members use; kmeans refinement drops in
      unchanged.
    * Encoding: per sub-space argmin of squared L2 to the 16 codes.
      Each squared-difference term is a deterministic double; terms are
      cast DECIMAL(30,15) and summed, so sub-distance comparison (and
      hence the chosen code) is partial-agg-order-free and replayable.
    * ADC scoring: LUT[query, s, j] = dist(query sub-vector, code j of
      sub-space s) — n_queries x m x n_codes rows, broadcast; the
      approximate distance is the DECIMAL sum of m LUT hits per
      (query, vector). Exact arithmetic end to end -> full SQL oracle.

    This exact long form expands the corpus by dim for encoding (the
    verifier shape, like the JL-projection DECIMAL form); the
    production encoder is pq_encode_arrow (one numpy argmin per Arrow
    batch, zero expansion, code-parity pytest). Output:
    (query_id, neighbor_id, approx_l2sq, rank)."""
    codes, lut = _pq_codes_and_lut(
        corpus, queries, m, n_codes, every_nth, id_col, vec_col, dim=dim
    )
    adc = (
        codes.join(
            F.broadcast(lut),
            (codes.s == lut.s) & (codes.code == lut.j),
        )
        .filter(F.col(id_col) != F.col("query_id"))
        .groupBy("query_id", F.col(id_col).alias("neighbor_id"))
        .agg(F.sum("qdist").alias("_adc"))
    )
    wr = Window.partitionBy("query_id").orderBy("_adc", "neighbor_id")
    return (
        adc.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("_adc").cast("double").alias("approx_l2sq"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def _pq_cbl(
    corpus: DataFrame,
    n_codes: int,
    every_nth: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Exploded PQ codebook (j, d, cv): deterministic every-Nth corpus
    rows (vec_id = j*every_nth, j < n_codes), one row per dimension.
    Tiny by construction (n_codes x dim rows) — always broadcast."""
    c = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    cb = c.filter(
        (F.col(id_col) % every_nth == 0) & (F.col(id_col) < n_codes * every_nth)
    ).select((F.col(id_col) / every_nth).cast("int").alias("j"), "v")
    return cb.select("j", F.posexplode("v").alias("d", "cv"))


def _pq_codes_and_lut(
    corpus: DataFrame,
    queries: DataFrame,
    m: int,
    n_codes: int,
    every_nth: int,
    id_col: str,
    vec_col: str,
    dim: int = 64,
    encode_ids: DataFrame | None = None,
):
    """Shared exact-DECIMAL PQ staging: (codes, lut) frames for the ADC
    scorers (pq_topk, ivf_pq_topk). See pq_topk for the contract.

    ``encode_ids`` (a 1-column id frame) restricts WHICH vectors get
    encoded — the codebook still derives from the FULL corpus (same
    every-nth id rule, so codes are bit-identical for every encoded
    vector).  ivf_pq_topk passes its candidate ids: ADC only ever reads
    codes for vectors inside probed buckets, so encoding the other
    ~(1 - nprobe/num_centroids) of the corpus was pure waste in the
    inline-index composition (at scale the codes are a precomputed
    stored table and the probe reads only its buckets — this keeps the
    inline build's cost shaped the same way)."""
    sub = dim // m
    dec = "decimal(30,15)"
    c = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    cbl = _pq_cbl(corpus, n_codes, every_nth, id_col, vec_col)
    if encode_ids is not None:
        c = c.join(encode_ids.select(F.col(id_col)), on=id_col, how="left_semi")
    # spread: the dim-explode + broadcast LUT join is CPU-bound map
    # work and a small parquet corpus scans as one partition.  When the
    # encode set was already cut by the semi-join, the join output is
    # distributed across the shuffle partitions — a further repartition
    # would be a pure extra stage.
    xl = (c if encode_ids is not None else spread(c)).select(
        F.col(id_col), F.posexplode("v").alias("d", "xv")
    )
    ed = (
        xl.join(F.broadcast(cbl), on="d")
        .select(
            F.col(id_col),
            F.floor(F.col("d") / sub).cast("int").alias("s"),
            "j",
            ((F.col("xv") - F.col("cv")) * (F.col("xv") - F.col("cv")))
            .cast(dec)
            .alias("_t"),
        )
        .groupBy(id_col, "s", "j")
        .agg(F.sum("_t").alias("dist"))
    )
    # per-(vector, sub-space) argmin as a MERGEABLE aggregate: min_by
    # over the (dist, j) struct picks the same code as the previous
    # rank-1 window (struct ordering is field-wise, so the j ascending
    # tie-break is identical on exact DECIMAL dists) while replacing the
    # sort window with a hash agg that combines map-side
    codes = ed.groupBy(id_col, "s").agg(
        F.min_by(F.col("j"), F.struct(F.col("dist"), F.col("j"))).alias(
            "code"
        )
    )
    lut = _pq_lut(queries, cbl, sub, id_col, vec_col)
    return codes, lut


def _pq_lut(
    queries: DataFrame,
    cbl: DataFrame,
    sub: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Exact-DECIMAL per-query ADC lookup table: LUT[query, s, j] =
    squared L2 between the query's sub-vector s and code j of that
    sub-space.  n_queries x m x n_codes rows — broadcast-sized."""
    dec = "decimal(30,15)"
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    ql = q.select("query_id", F.posexplode("qv").alias("d", "xv"))
    return (
        ql.join(F.broadcast(cbl), on="d")
        .select(
            "query_id",
            F.floor(F.col("d") / sub).cast("int").alias("s"),
            "j",
            ((F.col("xv") - F.col("cv")) * (F.col("xv") - F.col("cv")))
            .cast(dec)
            .alias("_t"),
        )
        .groupBy("query_id", "s", "j")
        .agg(F.sum("_t").alias("qdist"))
    )


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    every_nth_ivf: int = 50,
    nprobe: int = 3,
    m: int = 8,
    n_codes: int = 16,
    every_nth_pq: int = 10,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The production ANN stack composed: IVF restricts WHICH vectors a
    query touches (nprobe buckets out of all cells — compute-side cut),
    PQ decides HOW MUCH each touched vector costs (8-byte codes + a
    broadcast LUT instead of the float vector — memory-side cut). At
    100 TB the float corpus is cold storage: the searchable state is
    the bucketed code table plus two tiny centroid tables.

    Both stages are individually deterministic (IVF's argmax cosine
    assignment, PQ's DECIMAL-exact encoding/ADC), so the COMPOSITION
    replays in a single oracle. Candidates come from the same
    probe-join as ivf_topk; scoring is the same LUT join as pq_topk —
    nothing new to trust, only composed."""
    cents = pick_centroids(corpus, every_nth_ivf, id_col, vec_col)
    assigned = assign_to_centroids(corpus, cents, id_col, vec_col).select(
        F.col(id_col), "centroid_id"
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    q_scored = q.crossJoin(F.broadcast(cents)).select(
        "query_id",
        "centroid_id",
        cosine(F.col("q_vec"), F.col("centroid_vec")).alias("c_sim"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("c_sim"), F.asc("centroid_id")
    )
    probes = (
        q_scored.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "centroid_id")
    )
    cand = (
        probes.join(assigned, on="centroid_id")
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", F.col(id_col))
    ).persist()
    # encode ONLY candidate vectors (~nprobe/num_centroids of the
    # corpus): ADC never reads a code outside the probed buckets, so the
    # full-corpus encode the previous revision paid was (num_centroids /
    # nprobe)x wasted Arrow/agg work; cand is persisted because both the
    # encode semi-join and the ADC join consume it.
    codes, lut = _pq_codes_and_lut(
        corpus, queries, m, n_codes, every_nth_pq, id_col, vec_col, dim=dim,
        # no .distinct(): left_semi dedups the probe side for free
        encode_ids=cand.select(F.col(id_col)),
    )
    adc = (
        cand.join(codes, on=id_col)
        .join(F.broadcast(lut), on=["query_id", "s"])
        .filter(F.col("code") == F.col("j"))
        .groupBy("query_id", F.col(id_col).alias("neighbor_id"))
        .agg(F.sum("qdist").alias("_adc"))
    )
    wr = Window.partitionBy("query_id").orderBy("_adc", "neighbor_id")
    out = (
        adc.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("_adc").cast("double").alias("approx_l2sq"),
            F.col("rank").cast("int").alias("rank"),
        )
    )
    # eagerly materialize the small result (n_queries * k rows) and
    # release the persisted candidate set — the mmr_rerank pattern: a
    # long-lived session otherwise accumulates one pinned cand frame
    # per call (r09 ADVICE).
    out = out.localCheckpoint(eager=True)
    cand.unpersist()
    return out


def pq_encode_arrow(
    corpus: DataFrame,
    codebooks,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Production PQ encoder: ``codebooks`` is an (m, n_codes, sub)
    ndarray-like; one numpy distance argmin per Arrow batch per
    sub-space, zero row expansion. Output (id, code_0..code_{m-1}).
    Code parity with pq_topk's exact DECIMAL encoding is pytest-pinned
    (ties broken to the smaller code id, matching the exact path)."""
    import numpy as np
    import pandas as pd

    cbs = np.asarray(codebooks, dtype=np.float64)  # (m, n_codes, sub)
    sub = cbs.shape[2]
    out_fields = ", ".join(f"code_{s} int" for s in range(cbs.shape[0]))

    def _encode(batches):
        for pdf in batches:
            x = np.stack(pdf[vec_col].map(np.asarray).to_numpy()).astype(np.float64)
            cols = {id_col: pdf[id_col]}
            for s in range(cbs.shape[0]):
                xs = x[:, s * sub : (s + 1) * sub]  # (n, sub)
                # (n, n_codes) squared L2; argmin takes the FIRST minimal
                # index, i.e. the smallest code id on exact ties
                d = ((xs[:, None, :] - cbs[s][None, :, :]) ** 2).sum(axis=2)
                cols[f"code_{s}"] = d.argmin(axis=1).astype("int32")
            yield pd.DataFrame(cols)

    return corpus.select(id_col, vec_col).mapInPandas(
        _encode, schema=f"{id_col} long, {out_fields}"
    )


def _planes_df(df: DataFrame, dim: int, num_planes: int, seed: int):
    """Deterministic pseudo-random hyperplanes as LITERAL arrays, computed
    driver-side from the seed. Literals ship in the plan (num_planes*dim
    doubles — bytes, not data) and cost nothing per row; the previous
    expression-derived planes re-hashed num_planes*dim values per ROW."""
    import random

    rng = random.Random(seed)
    return [
        F.array(*[F.lit(rng.uniform(-1.0, 1.0)) for _ in range(dim)])
        for _ in range(num_planes)
    ]


def lsh_bucket_signature(
    df: DataFrame,
    vec_col: str = "embedding",
    num_planes: int = 8,
    seed: int = 42,
    dim: int = 64,
) -> DataFrame:
    """Add ``lsh_bucket``: the sign pattern of num_planes projections,
    packed into a long. Same-bucket vectors are near-duplicate candidates;
    grouping/joining on the bucket replaces the quadratic cross join."""
    sig = F.lit(0).cast("long")
    for plane in _planes_df(df, dim, num_planes, seed):
        bit = (dot(F.col(vec_col), plane) >= 0).cast("long")
        sig = sig * 2 + bit
    return df.withColumn("lsh_bucket", sig)


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 8,
    seed: int = 42,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k among same-LSH-bucket candidates, exact re-rank.

    The candidate join is an equi-join on lsh_bucket — shuffle-partitioned
    by bucket, no cross join. Recall rises with fewer planes (bigger
    buckets) or multiple OR-ed bands (run with several seeds, union)."""
    cb = lsh_bucket_signature(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("c_vec"),
            l2_norm(F.col(vec_col)).alias("_cn"),
        ),
        "c_vec", num_planes, seed, dim,
    )
    qb = lsh_bucket_signature(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            l2_norm(F.col(vec_col)).alias("_qn"),
        ),
        "q_vec", num_planes, seed, dim,
    )
    cand = qb.join(cb, on="lsh_bucket").filter(F.col("neighbor_id") != F.col("query_id"))
    # norms once per vector per side; value bitwise-equal to cosine()
    scored = cand.select(
        "query_id",
        "neighbor_id",
        (dot(F.col("q_vec"), F.col("c_vec")) / (F.col("_qn") * F.col("_cn"))).alias(
            "cos_sim"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rank").cast("int").alias("rank"))
    )


# -- random projection (Johnson-Lindenstrauss sign matrix) -----------------


def random_projection(
    df: DataFrame,
    out_dims: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    in_dims: int | None = 64,
) -> DataFrame:
    """Project embeddings to ``out_dims`` with a deterministic ±1 sign
    matrix: sign(i, j) = +1 iff md5-60("i,j") is even. JL-style
    dimensionality reduction ahead of LSH bucketing / coarse clustering
    — distances are preserved within ~1/sqrt(out_dims).

    This is the EXACT-arithmetic long form, built so the whole transform
    replays in DuckDB: posexplode the vector, generate the ``out_dims``
    output slots map-side (a generator, not a join), derive the sign
    from the portable hash inline, and accumulate the sum in
    DECIMAL(30,15) so it is order-free across partial aggregations.
    Output is long-format (id, dim, proj_val) — one row per output
    component.

    Plan shape: one scan, map-side expansion (in_dims * out_dims rows
    per vector, all narrow), one hash-agg shuffle keyed on (id, dim).
    The sign depends only on (i, dim) — in_dims * out_dims distinct
    values — so when ``in_dims`` is known the matrix is precomputed
    driver-side (Python md5 is the same MD5 bit-for-bit) and embedded
    as a literal array lookup instead of a per-expanded-row digest
    (measured 3.7s -> 1.5s at sf0.1); ``in_dims=None`` falls back to
    the inline hash for unknown widths. At 100 TB prefer
    :func:`random_projection_arrow`: same sign matrix applied as a
    single BLAS matmul per Arrow batch — O(1) row expansion — with
    this form as its correctness oracle."""
    from ..functions.text_fns import md5_hash60

    x = spread(df.select(F.col(id_col), F.col(vec_col))).select(
        F.col(id_col), F.posexplode(F.col(vec_col)).alias("i", "v")
    ).select(
        F.col(id_col),
        F.col("i"),
        F.col("v").cast("double").alias("v"),
        F.explode(F.sequence(F.lit(0), F.lit(out_dims - 1))).alias("dim"),
    )
    if in_dims is not None and in_dims * out_dims <= 65536:
        import hashlib

        flat = [
            1.0
            if int(hashlib.md5(f"{i},{j}".encode()).hexdigest()[:15], 16) % 2 == 0
            else -1.0
            for i in range(in_dims)
            for j in range(out_dims)
        ]
        sign = F.element_at(
            F.array(*[F.lit(s) for s in flat]),
            (F.col("i") * out_dims + F.col("dim") + 1).cast("int"),
        )
    else:
        sign = F.when(
            F.pmod(
                md5_hash60(F.concat_ws(",", F.col("i"), F.col("dim"))), F.lit(2)
            )
            == 0,
            F.lit(1.0),
        ).otherwise(F.lit(-1.0))
    return (
        x.withColumn("_t", (F.col("v") * sign).cast("decimal(30,15)"))
        .groupBy(id_col, "dim")
        .agg(F.sum("_t").alias("_s"))
        .select(
            F.col(id_col),
            F.col("dim").cast("int").alias("dim"),
            F.col("_s").cast("double").alias("proj_val"),
        )
    )


def random_projection_arrow(
    df: DataFrame,
    in_dims: int,
    out_dims: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Production form of :func:`random_projection`: the same ±1 sign
    matrix (md5 parity of "i,j") materialized once per executor as a
    numpy array and applied as one BLAS matmul per Arrow batch — no row
    expansion, no shuffle at all (pure map). Float sums differ from the
    exact DECIMAL path only by accumulation order (~1e-9 relative);
    parity is pytest-asserted (tests/test_llm_ops.py)."""
    import hashlib

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _sign(i: int, j: int) -> int:
        h = int(hashlib.md5(f"{i},{j}".encode()).hexdigest()[:15], 16)
        return 1 if h % 2 == 0 else -1

    mat = np.array(
        [[_sign(i, j) for j in range(out_dims)] for i in range(in_dims)],
        dtype=np.float64,
    )

    def _project(s):
        v = np.vstack(s.to_numpy())
        return pd.Series(list(v @ mat))

    _project.__annotations__ = {"s": pd.Series, "return": pd.Series}
    udf = pandas_udf(_project, "array<double>")
    return df.select(F.col(id_col), udf(F.col(vec_col).cast("array<double>")).alias("proj"))


# -- distributed PCA --------------------------------------------------------


def pca_fit(
    corpus: DataFrame,
    k: int = 4,
    vec_col: str = "embedding",
):
    """Fit a PCA basis over an embedding column in ONE distributed pass.

    Scale shape (the classic moment-matrix reduction): every Arrow batch
    computes its own (count, sum-vector, X^T X matrix) with one BLAS
    call and emits a SINGLE row of d + d*d doubles; the driver reduces
    one such row per batch (bounded by partition/batch count, ~33 KB
    each at d=64 — bounded-by-contract collect, same class as the
    centroid tables) and eigendecomposes the d x d covariance. The
    corpus itself is never shuffled and never leaves the executors —
    at 100 TB this is a map-only scan plus a kilobyte-scale reduce,
    which is exactly how Spark MLlib's PCA computes its Gramian.

    Determinism: ``numpy.linalg.eigh`` on the same covariance is
    deterministic; eigenvector sign is fixed by making each component's
    largest-|value| coordinate positive, so reruns (and resumed jobs)
    produce bit-identical bases.

    Returns ``(mean, components, explained_var)`` as numpy arrays with
    shapes (d,), (k, d), (k,) — components ordered by descending
    explained variance.
    """
    import numpy as np
    import pandas as pd

    def _moments(batches):
        for pdf in batches:
            m = np.stack(pdf[vec_col].map(np.asarray).to_numpy()).astype(
                np.float64
            )
            yield pd.DataFrame(
                {
                    "n": [m.shape[0]],
                    "s": [m.sum(axis=0).tolist()],
                    "ss": [(m.T @ m).ravel().tolist()],
                }
            )

    rows = (
        corpus.select(vec_col)
        .mapInPandas(_moments, schema="n long, s array<double>, ss array<double>")
        .collect()
    )
    if not rows:
        raise ValueError("pca_fit: empty corpus")
    d = len(rows[0]["s"])
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    ss = np.sum([np.asarray(r["ss"]).reshape(d, d) for r in rows], axis=0)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    eigval, eigvec = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigval)[::-1][:k]
    comps = eigvec[:, order].T  # (k, d)
    # sign convention: largest-|coordinate| of each component positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, np.maximum(eigval[order], 0.0)


def pca_project(
    corpus: DataFrame,
    mean,
    components,
    explained_var=None,
    whiten: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Project embeddings onto a fitted PCA basis — pure map, zero
    shuffle: the (k, d) basis ships in the UDF closure (kilobytes) and
    each Arrow batch is one centred BLAS matmul. With ``whiten=True``
    components are scaled to unit variance (1/sqrt(eigval)) — the usual
    prep before product quantization or k-means on the reduced space.

    Output: (id, pc array<double> of length k)."""
    import numpy as np
    import pandas as pd

    mu = np.asarray(mean, dtype=np.float64)
    w = np.asarray(components, dtype=np.float64).T  # (d, k)
    if whiten:
        if explained_var is None:
            raise ValueError("whiten=True requires explained_var")
        w = w / np.sqrt(np.maximum(np.asarray(explained_var, np.float64), 1e-12))

    def _proj(batches):
        for pdf in batches:
            m = np.stack(pdf[vec_col].map(np.asarray).to_numpy()).astype(
                np.float64
            )
            out = (m - mu) @ w
            yield pd.DataFrame(
                {id_col: pdf[id_col].astype("int64"), "pc": list(out)}
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        _proj, schema=f"{id_col} long, pc array<double>"
    )


def pca_projection(
    corpus: DataFrame,
    k: int = 4,
    whiten: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fit + project in one call (the registered-query form): one
    map-only moment pass, a driver-side d x d eigensolve, one map-only
    projection pass. The embedding table is scanned twice and shuffled
    never."""
    mean, comps, ev = pca_fit(corpus, k=k, vec_col=vec_col)
    return pca_project(
        corpus, mean, comps, ev, whiten=whiten, id_col=id_col, vec_col=vec_col
    )


def pca_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    pca_k: int = 16,
    oversample: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN through the PCA bottleneck: candidates by L2 distance in the
    ``pca_k``-dim projected space, exact cosine rerank on full vectors —
    the dimensionality-reduction sibling of IVF (cluster cut) and PQ
    (code-book cut) in the index family.

    Scale shape: the PCA basis and the PROJECTED query matrix ship in
    the UDF closure (kilobytes); each corpus Arrow batch projects
    itself (one BLAS matmul at d -> pca_k) and emits only its per-query
    partial top-(k * oversample) candidate rows — the shuffle carries
    candidates, never the corpus, exactly like brute_force_topk_matrix
    but on vectors ``pca_k / d`` the width. Only the surviving
    candidates pay a full-width exact cosine, via an equi-join back to
    the corpus on id. Recall is tunable with ``oversample`` and
    ``pca_k`` (pca_k = d makes the projection a rotation: distances are
    exact and the candidate cut is lossless for any oversample >= 1 in
    the L2 sense); recall floors are pytest-asserted
    (tests/test_pca.py)."""
    import numpy as np
    import pandas as pd

    mean, comps, _ = pca_fit(corpus, k=pca_k, vec_col=vec_col)
    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([int(r[id_col]) for r in q_rows], dtype=np.int64)
    qm = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in q_rows])
    qp = (qm - mean) @ comps.T  # (nq, pca_k)
    n_cand = k * oversample

    def cand(batches):
        for pdf in batches:
            ids = pdf[id_col].astype("int64").to_numpy()
            m = np.stack(pdf[vec_col].map(np.asarray).to_numpy()).astype(
                np.float64
            )
            p = (m - mean) @ comps.T  # (batch, pca_k)
            # squared L2 distance matrix (batch, nq)
            d2 = (
                (p * p).sum(axis=1)[:, None]
                - 2.0 * (p @ qp.T)
                + (qp * qp).sum(axis=1)[None, :]
            )
            kk = min(n_cand + 1, d2.shape[0])  # +1 absorbs a self-match
            top = np.argpartition(d2, kk - 1, axis=0)[:kk]
            out_q, out_n, out_d = [], [], []
            for j in range(d2.shape[1]):
                for i in top[:, j]:
                    out_q.append(q_ids[j])
                    out_n.append(ids[i])
                    out_d.append(d2[i, j])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "d2": out_d}
            )

    partial = corpus.select(id_col, vec_col).mapInPandas(
        cand, schema="query_id long, neighbor_id long, d2 double"
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.asc("d2"), F.asc("neighbor_id")
    )
    cands = (
        partial.filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("_r", F.row_number().over(wc))
        .filter(F.col("_r") <= n_cand)
        .select("query_id", "neighbor_id")
    )
    # exact rerank: only candidates pay full-width cosine
    rer = (
        cands.join(
            corpus.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).alias("_cv"),
            ),
            on="neighbor_id",
        )
        .join(
            F.broadcast(
                queries.select(
                    F.col(id_col).alias("query_id"),
                    F.col(vec_col).alias("_qv"),
                )
            ),
            on="query_id",
        )
        .withColumn("cos_sim", cosine(F.col("_qv"), F.col("_cv")))
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        rer.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "cos_sim",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def pq_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    shortlist: int = 20,
    m: int = 8,
    n_codes: int = 16,
    every_nth: int = 10,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage retrieval — the standard production ANN shape: a cheap
    PQ/ADC pass over the 8-byte codes shortlists ``shortlist``
    candidates per query, then ONLY those pairs pay the exact cosine on
    the float vectors and the final top-``k`` is re-ranked exactly.

    Recall comes from the shortlist width (tunable), precision from the
    exact second stage; the expensive float vectors are touched for
    n_queries x shortlist rows instead of n_queries x corpus.  At
    100 TB: stage 1 reads the RAM-resident code table, stage 2 is a
    broadcast of the (tiny) shortlist against the cold float store —
    one corpus scan, no shuffle of vectors.  Same exact-cosine kernel
    as brute_force_topk (dot / (norm x norm), bitwise oracle parity).

    Stage 1 runs on UNIT-NORMALIZED vectors (the FAISS convention for
    cosine retrieval): on unit vectors L2 order IS cosine order
    (l2sq = 2 - 2cos), so the shortlist loses pairs only to PQ
    quantization, never to metric mismatch — on the raw fixture
    vectors the L2-vs-cosine disagreement alone cost recall@5 60%.

    Stage-1 encoding goes through the PRODUCTION encoder
    (pq_encode_arrow: one numpy argmin per Arrow batch) instead of
    pq_topk's exact long form — the long form explodes the corpus by
    dim and pays a DECIMAL aggregate per (vector, sub-space, code),
    ~2x the whole query's budget when composed with the rerank.  The
    oracle stays bit-identical because (a) the Arrow argmin picks the
    SAME code as the DECIMAL argmin (first-minimal-index == smallest-id
    tie-break, parity pytest-pinned), (b) the codebook is COLLECTED
    from the Spark-normalized frame (n_codes rows — bounded), never
    recomputed in numpy, and (c) the LUT and the ADC sum stay exact
    DECIMAL, so identical codes give identical shortlist ordering."""
    import numpy as np

    unit_c = corpus.select(
        F.col(id_col), normalize(F.col(vec_col)).alias(vec_col)
    )
    unit_q = queries.select(
        F.col(id_col), normalize(F.col(vec_col)).alias(vec_col)
    )
    sub = dim // m
    cbl = _pq_cbl(unit_c, n_codes, every_nth, id_col, vec_col)
    # bounded collect: the codebook is n_codes unit vectors (a centroid
    # table, not data) — collected from the SAME Spark-normalized frame
    # the exploded oracle replay reads, so the doubles the encoder sees
    # are bit-identical (cbl is just posexplode of these arrays)
    cb_rows = (
        unit_c.filter(
            (F.col(id_col) % every_nth == 0)
            & (F.col(id_col) < n_codes * every_nth)
        )
        .select(
            (F.col(id_col) / every_nth).cast("int").alias("j"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .collect()
    )
    assert len(cb_rows) == n_codes, "codebook incomplete: corpus must " \
        f"contain ids {{0, {every_nth}, ..., {(n_codes-1)*every_nth}}}"
    flat = np.zeros((n_codes, dim))
    for r in cb_rows:
        flat[r.j] = r.v
    cbs = np.stack([flat[:, s * sub:(s + 1) * sub] for s in range(m)])
    codes_w = pq_encode_arrow(unit_c, cbs, m=m, id_col=id_col,
                              vec_col=vec_col)
    codes = codes_w.select(
        F.col(id_col),
        F.posexplode(
            F.array(*[F.col(f"code_{s}") for s in range(m)])
        ).alias("s", "code"),
    )
    lut = _pq_lut(unit_q, cbl, sub, id_col, vec_col)
    adc = (
        codes.join(
            F.broadcast(lut),
            (codes.s == lut.s) & (codes.code == lut.j),
        )
        .filter(F.col(id_col) != F.col("query_id"))
        .groupBy("query_id", F.col(id_col).alias("neighbor_id"))
        .agg(F.sum("qdist").alias("_adc"))
    )
    ws = Window.partitionBy("query_id").orderBy("_adc", "neighbor_id")
    short = (
        adc.withColumn("_rn", F.row_number().over(ws))
        .filter(F.col("_rn") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    ).withColumn("_qn", l2_norm(F.col("q_vec")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    ).withColumn("_cn", l2_norm(F.col("c_vec")))
    sim = dot(F.col("q_vec"), F.col("c_vec")) / (F.col("_qn") * F.col("_cn"))
    rr = (
        c.join(F.broadcast(short.join(F.broadcast(q), on="query_id")),
               on="neighbor_id")
        .select("query_id", "neighbor_id", sim.alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        rr.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "cos_sim",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def standardize_embeddings(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-dimension z-score standardization of an embedding column —
    the feature-scaling step before k-means / PCA / linear probes when
    dimensions carry wildly different variances.

    Shape: one exploded aggregate produces the per-dimension moment
    table (dim rows — a broadcast table at any corpus size), joined
    back map-side onto the exploded values; no corpus-sized shuffle
    beyond the dim-keyed stats aggregation.  Exactness: sums are
    DECIMAL(30,15) (partial-order-free), mean/variance are double
    divisions of exact aggregates with a fixed association
    (E[x^2] - mean^2), so the oracle replays bit-for-bit.
    Zero-variance dimensions yield NULL z (guarded).  Output:
    (id, d, z) long form; repacking to an array is one
    groupBy + sort_array(collect_list) away if the consumer wants it."""
    dec = "decimal(30,15)"
    xl = corpus.select(
        F.col(id_col),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("d", "x"),
    )
    stats = xl.groupBy("d").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(dec)).alias("s"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n").cast("double")
    ex2 = F.col("ss").cast("double") / F.col("n").cast("double")
    std = F.sqrt(ex2 - mean * mean)
    stats = stats.select(
        "d", mean.alias("_mu"), std.alias("_sigma")
    )
    return xl.join(F.broadcast(stats), on="d").select(
        F.col(id_col),
        F.col("d").cast("int").alias("d"),
        F.when(
            F.col("_sigma") != 0.0,
            (F.col("x") - F.col("_mu")) / F.col("_sigma"),
        ).alias("z"),
    )


def embedding_outliers(
    corpus: DataFrame,
    top_k: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space outlier audit: per-vector squared Mahalanobis
    distance under a DIAGONAL covariance — sum over dimensions of the
    squared z-score — plus the vector's L2 norm.  The embedding-table
    quality gate: corrupt rows (zeroed vectors, wrong-scale imports,
    NaN-adjacent garbage) land at the extremes of either column long
    before they poison k-means/ANN; the diagonal model keeps the
    statistic a map-side sum (a full covariance needs the PCA pass —
    embedding_pca_project — and is overkill for a gate).

    Shape: reuses standardize_embeddings' broadcast per-dim moment
    table; one exploded map-side join, one id-keyed sum, mergeable
    top-k (TakeOrderedAndProject).  Zero-variance dims contribute
    nothing (their z is NULL -> excluded from the sum on both engines).
    Output: top ``top_k`` by maha2 desc — (id, maha2, l2_norm,
    n_dims_scored)."""
    z = standardize_embeddings(corpus, id_col=id_col, vec_col=vec_col)
    dec = "decimal(30,10)"
    scored = (
        z.filter(F.col("z").isNotNull())
        .groupBy(id_col)
        .agg(
            F.sum((F.col("z") * F.col("z")).cast(dec))
            .cast("double")
            .alias("maha2"),
            F.count(F.lit(1)).cast("bigint").alias("n_dims_scored"),
        )
    )
    norms = corpus.select(
        F.col(id_col), l2_norm(F.col(vec_col)).alias("l2_norm")
    )
    return (
        scored.join(norms, on=id_col)
        .orderBy(F.desc("maha2"), F.asc(id_col))
        .limit(top_k)
        .select(id_col, "maha2", "l2_norm", "n_dims_scored")
    )


def cluster_balanced_sample(
    emb: DataFrame,
    per_cluster: int = 10,
    every_nth: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cluster-balanced (diversity) sampling: assign every vector to its
    nearest centroid, then keep at most ``per_cluster`` members of each
    cluster, chosen by a deterministic per-id hash rank — the
    embedding-space analogue of stratified sampling.  Where
    source-stratified / temperature sampling flatten the FEED mixture,
    this flattens the SEMANTIC mixture: dense regions (near-duplicate
    topic blobs that survive dedup) stop dominating the training set,
    and rare-topic clusters keep representation — the diversity-first
    selection step used after SemDeDup-style clustering.

    Scale shape: centroid pick is a filter, assignment is the map-only
    broadcast-centroid Arrow kernel (zero shuffle), and the quota is a
    per-centroid window over the one centroid-keyed exchange — the
    cluster_size count reuses the same partitioning, so ONE shuffle
    total.  The md5 rank makes reruns and the oracle bit-identical
    (same pattern as corpus_weighted_sample).  Output:
    (centroid_id, id, sample_rank, cluster_size).
    """
    from ..functions.text_fns import md5_hash60

    cents = pick_centroids(emb, every_nth, id_col=id_col, vec_col=vec_col)
    assigned = assign_to_centroids(emb, cents, id_col=id_col, vec_col=vec_col)
    keyed = assigned.select(
        F.col(id_col),
        F.col("centroid_id"),
        md5_hash60(
            F.concat_ws(":", F.lit("cbs"), F.col(id_col).cast("string"))
        ).alias("_u"),
    )
    w = Window.partitionBy("centroid_id").orderBy(
        F.col("_u").asc(), F.col(id_col).asc()
    )
    ranked = keyed.select(
        "*",
        F.row_number().over(w).alias("sample_rank"),
        F.count(F.lit(1))
        .over(Window.partitionBy("centroid_id"))
        .alias("cluster_size"),
    )
    return ranked.filter(F.col("sample_rank") <= per_cluster).select(
        "centroid_id",
        id_col,
        F.col("sample_rank").cast("int").alias("sample_rank"),
        F.col("cluster_size").cast("bigint").alias("cluster_size"),
    )


def ivf_filtered_topk(
    corpus: DataFrame,
    queries: DataFrame,
    predicate,
    k: int = 5,
    every_nth: int = 50,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index=None,
) -> DataFrame:
    """Filtered vector search: approximate top-k restricted to corpus
    rows matching a metadata ``predicate`` (the vector-database
    "filtered ANN" workload — e.g. nearest documents WITH label = 3).

    PREFILTER semantics: the predicate cuts the candidate set BEFORE
    ranking, so the returned k are the true top-k among matching rows
    inside the probed clusters — never top-k-then-filter (which returns
    fewer than k, or none, at selective filters).  Implementation is a
    semi-join of the stored IVF assignment against the predicate's id
    set, handed to the unmodified probe pipeline: the filter scan
    pushes into the corpus parquet (ids + predicate columns only), the
    semi-join is id-keyed, and centroids stay built over the FULL
    corpus (matching how production indexes serve many filters from one
    index).  At selectivity s, scanned vectors drop to ~s * nprobe /
    num_centroids of the corpus."""
    cents, assigned = index if index is not None else build_ivf_index(
        corpus, every_nth, id_col, vec_col
    )
    allowed = corpus.filter(predicate).select(F.col(id_col))
    assigned_f = assigned.join(allowed, on=id_col, how="left_semi")
    return ivf_topk(
        corpus, queries, k=k, every_nth=every_nth, nprobe=nprobe,
        id_col=id_col, vec_col=vec_col, index=(cents, assigned_f),
    )


def diversity_report(
    emb: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
) -> DataFrame:
    """Per-label embedding diversity: the mean pairwise squared L2
    distance over every ordered pair in the group, WITHOUT forming any
    pair — sum-of-squares identity
    ``sum_{i,j} ||xi-xj||^2 = 2n * sum||xi||^2 - 2 * ||sum xi||^2``,
    so one aggregation pass (a DECIMAL scalar per group for the squared
    norms plus ``dim`` DECIMAL per-dimension sums) yields the exact
    all-pairs statistic.  The monitor a curation pipeline watches for
    collapsing diversity (a class whose members converge) or injected
    duplication (mean distance dropping toward 0) — quadratic in naive
    form, map-side-combining linear here, at any corpus size.

    Exactness contract: every accumulated quantity is a
    DECIMAL(38,12) sum of a SINGLE double-precision term (x_d or
    x_d * x_d — one multiply, bit-identical in any engine), so the
    aggregation is partial-order-free end to end; the squared-norm
    total is the exact DECIMAL sum of the per-dimension squares (no
    per-row float fold anywhere), and the closed-form double
    arithmetic keeps one fixed association the oracle mirrors
    term-for-term.  Output: (label, n_vectors, mean_sq_norm,
    mean_pairwise_sq_dist); singleton groups yield NULL distance."""
    dec = "decimal(38,12)"
    v = F.col(vec_col)

    def _el(d):
        return F.element_at(v, d + 1).cast("double")

    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.sum((_el(d) * _el(d)).cast(dec)).alias(f"_ss_{d}") for d in range(dim)
    ] + [
        F.sum(_el(d).cast(dec)).alias(f"_s1_{d}") for d in range(dim)
    ]
    g = emb.groupBy(F.col(label_col).alias("label")).agg(*aggs)
    # combine the exact per-dimension DECIMAL sums as DOUBLES in one
    # fixed left-to-right order (the oracle mirrors the same chain):
    # chaining decimal '+' instead would trip Spark's precision-overflow
    # scale reduction (38,12)+(38,12) -> (38,11) and drift off the
    # oracle one lost digit per term
    s2 = None
    for d in range(dim):
        term = F.col(f"_ss_{d}").cast("double")
        s2 = term if s2 is None else s2 + term
    n = F.col("n").cast("double")
    musq = None
    for d in range(dim):
        term = F.col(f"_s1_{d}").cast("double") * F.col(f"_s1_{d}").cast("double")
        musq = term if musq is None else musq + term
    mean_pair = F.when(
        F.col("n") > 1,
        (F.lit(2.0) * n * s2 - F.lit(2.0) * musq) / (n * (n - F.lit(1.0))),
    )
    return g.select(
        "label",
        F.col("n").cast("bigint").alias("n_vectors"),
        (s2 / n).alias("mean_sq_norm"),
        mean_pair.alias("mean_pairwise_sq_dist"),
    )


def mmr_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    k_final: int = 5,
    shortlist: int = 20,
    lam: float = 0.7,
    one_minus_lam: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidates: DataFrame | None = None,
    eager_cleanup: bool = False,
) -> DataFrame:
    """Maximal Marginal Relevance rerank — the diversity-aware final
    stage of a RAG retrieval pipeline: from each query's ``shortlist``
    exact-cosine candidates, greedily select ``k_final`` maximizing
    ``lam * relevance - (1 - lam) * max_sim_to_already_selected`` so
    near-duplicate passages don't crowd out coverage (Carbonell &
    Goldstein, SIGIR'98).

    ``one_minus_lam`` is passed as its OWN literal (deriving ``1 - lam``
    lands one ulp off ``0.3`` — the pagerank teleport lesson).  Step 1
    selects by pure relevance (its mmr score is ``lam * rel``).

    Scale shape: candidate generation is ``brute_force_topk`` (broadcast
    query side, one corpus scan — swap in the IVF probe at 100 TB, same
    contract); everything after operates on BOUNDED frames — per query
    ``shortlist`` candidate rows and ``shortlist^2`` pairwise-sim rows —
    so the ``k_final`` greedy rounds are joins between small persisted
    frames keyed by query_id, never corpus scans.  ``candidates``
    injects a precomputed (query_id, neighbor_id, cos_sim) shortlist —
    pass ``ivf_topk(...)`` output to keep candidate generation
    sublinear at corpus scale (the greedy rounds are
    corpus-size-independent either way).  All similarity
    doubles use the brute_force kernel convention (dot / (na * nb)),
    the greedy max is order-free, and ties break by candidate id — the
    entire selection replays in SQL as chained CTEs.

    Output: (query_id, neighbor_id, relevance, mmr_score, rank)."""
    # the two weights are independent literals BY DESIGN (see above) —
    # but mismatched ones (lam=0.5 with a stale one_minus_lam=0.3) would
    # silently score the wrong objective, so their sum is validated
    if abs(lam + one_minus_lam - 1.0) > 1e-9:
        raise ValueError(
            f"lam ({lam}) + one_minus_lam ({one_minus_lam}) must equal 1.0; "
            "pass both explicitly (one_minus_lam is a separate literal only "
            "so the oracle can mirror the exact double)"
        )
    if candidates is None:
        candidates = brute_force_topk(
            corpus, queries, k=shortlist, id_col=id_col, vec_col=vec_col
        )
    cands = candidates.select(
        "query_id",
        "neighbor_id",
        F.col("cos_sim").alias("relevance"),
    )
    vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_v"),
        l2_norm(F.col(vec_col)).alias("_n"),
    )
    cands_v = cands.join(vecs, on="neighbor_id").persist()
    a = cands_v.select(
        "query_id",
        F.col("neighbor_id").alias("_ca"),
        F.col("_v").alias("_va"),
        F.col("_n").alias("_na"),
    )
    b = cands_v.select(
        "query_id",
        F.col("neighbor_id").alias("_cb"),
        F.col("_v").alias("_vb"),
        F.col("_n").alias("_nb"),
    )
    sims = (
        a.join(b, on="query_id")
        .filter(F.col("_ca") != F.col("_cb"))
        .select(
            "query_id",
            "_ca",
            "_cb",
            (
                dot(F.col("_va"), F.col("_vb"))
                / (F.col("_na") * F.col("_nb"))
            ).alias("_s"),
        )
        .persist()
    )
    base = cands_v.select("query_id", "neighbor_id", "relevance")
    w = Window.partitionBy("query_id")
    pick1 = (
        base.withColumn(
            "_rn",
            F.row_number().over(
                w.orderBy(F.desc("relevance"), F.asc("neighbor_id"))
            ),
        )
        .filter(F.col("_rn") == 1)
        .select(
            "query_id",
            "neighbor_id",
            "relevance",
            (F.lit(lam) * F.col("relevance")).alias("mmr_score"),
            F.lit(1).cast("int").alias("rank"),
        )
    )
    selected = pick1
    for step in range(2, k_final + 1):
        remaining = base.join(
            selected.select("query_id", "neighbor_id"),
            on=["query_id", "neighbor_id"],
            how="left_anti",
        )
        ms = (
            sims.join(
                selected.select(
                    "query_id", F.col("neighbor_id").alias("_cb")
                ),
                on=["query_id", "_cb"],
            )
            .groupBy("query_id", "_ca")
            .agg(F.max("_s").alias("_maxsim"))
            .select(
                F.col("query_id").alias("_mq"), "_ca", "_maxsim"
            )  # renamed to keep the join predicate attribute-unambiguous
        )
        scored = remaining.join(
            ms,
            on=(remaining.query_id == ms._mq)
            & (remaining.neighbor_id == ms._ca),
        ).select(
            remaining.query_id,
            "neighbor_id",
            "relevance",
            (
                F.lit(lam) * F.col("relevance")
                - F.lit(one_minus_lam) * F.col("_maxsim")
            ).alias("mmr_score"),
        )
        pick = (
            scored.withColumn(
                "_rn",
                F.row_number().over(
                    w.orderBy(F.desc("mmr_score"), F.asc("neighbor_id"))
                ),
            )
            .filter(F.col("_rn") == 1)
            .select(
                "query_id",
                "neighbor_id",
                "relevance",
                "mmr_score",
                F.lit(step).cast("int").alias("rank"),
            )
        )
        selected = selected.unionByName(pick)
        # lazy lineage truncation per round (the connected-components /
        # bpe_encode pattern): each step references the previous
        # selection THREE times (anti-join, max-sim join, union), so
        # without truncation the uncached selection subtree re-executes
        # 3^k times inside the final action — measured minutes at sf0.1
        # for k=5.  eager=False keeps it one job chain at action time;
        # the frame is k_final rows per query, so checkpoint cost is nil.
        if step < k_final:
            selected = selected.localCheckpoint(eager=False)
    if eager_cleanup:
        # Serving loops that call mmr_rerank repeatedly in one session
        # must not accumulate a pinned shortlist + pairwise-sim cache
        # per call (r08/r09 ADVICE): materialize the (tiny: k_final rows
        # per query) selection eagerly, then release both persisted
        # frames.  The eager job is a full extra pass over the greedy
        # rounds, so single-shot batch callers — the registered queries
        # included — take the lazy default and rely on session teardown
        # / caller clearCache() (r10 VERDICT: the unconditional eager
        # path cost 1.64x on the bench for a one-action session).
        selected = selected.localCheckpoint(eager=True)
        cands_v.unpersist()
        sims.unpersist()
    return selected


def sq8_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    shortlist: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scalar-quantized (SQ8) two-stage ANN — the FAISS SQfp8/refine
    serving shape and the int8 sibling of ann_pq_rerank_topk: corpus and
    queries are unit-normalized (cosine becomes dot), symmetric-absmax
    int8-quantized (4x smaller index — at 100 TB the difference between
    an in-memory index and a spilling one), stage 1 ranks by the EXACT
    integer code dot product rescaled by the two per-vector step sizes,
    stage 2 reranks only each query's ``shortlist`` survivors with the
    exact float dot.

    Exactness contract: the int8 codes use floor(x*scale + 0.5) (engine-
    portable rounding, quantize_int8); the stage-1 integer dot is a sum
    of int products — order-free and bit-exact in ANY engine — so the
    shortlist is deterministic, and the stage-2 floats follow the
    normalize-then-dot convention the decontaminate oracle already
    pins.  The whole pipeline (normalize, quantize, integer ADC,
    shortlist, rerank) replays in SQL.

    Plan shape: quantization is map-side in each scan; stage 1
    broadcasts the (tiny) quantized query side over ONE corpus scan
    with partial top-k pruning; stage 2 touches float vectors for
    n_queries x shortlist rows only."""
    n = corpus.select(
        F.col(id_col).alias("neighbor_id"), normalize(F.col(vec_col)).alias("_u")
    )
    from ..functions.vector_fns import quantize_int8, quantize_scale

    cz = n.select(
        "neighbor_id",
        quantize_int8(F.col("_u")).alias("_c8"),
        quantize_scale(F.col("_u")).alias("_csc"),
    )
    qn = queries.select(
        F.col(id_col).alias("query_id"), normalize(F.col(vec_col)).alias("_qu")
    )
    qz = qn.select(
        "query_id",
        quantize_int8(F.col("_qu")).alias("_q8"),
        quantize_scale(F.col("_qu")).alias("_qsc"),
    )
    idot = F.aggregate(
        F.zip_with(F.col("_q8"), F.col("_c8"), lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    scored = (
        spread(cz)
        .crossJoin(F.broadcast(qz))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (idot.cast("double") * (F.col("_qsc") * F.col("_csc"))).alias(
                "_approx"
            ),
        )
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.desc("_approx"), F.asc("neighbor_id")
    )
    short = (
        scored.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    exact = (
        short.join(n, on="neighbor_id")
        .join(F.broadcast(qn), on="query_id")
        .select(
            "query_id",
            "neighbor_id",
            dot(F.col("_qu"), F.col("_u")).alias("cos_sim"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "cos_sim",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def centroid_drift(
    emb_a: DataFrame,
    emb_b: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Per-label centroid drift between two embedding snapshots (model
    refresh A vs B, or week-over-week corpus halves): for each label,
    the cosine similarity between the A and B centroids and the squared
    L2 shift — the monitor that catches an embedding-space rotation or
    a class whose meaning moved before it poisons ANN serving or
    semantic dedup thresholds.

    Exactness contract (the diversity_report pattern): per-dimension
    sums accumulate as DECIMAL(38,12) of single double terms (order-
    free); every downstream combination is closed-form double
    arithmetic in one fixed left-to-right association the oracle
    mirrors term-for-term.  Labels present in only one snapshot report
    NULL drift (outer join keeps them visible).

    Output: (label, n_a, n_b, centroid_cos, shift_sq).

    Scale shape: ONE aggregation pass per snapshot with label-
    cardinality output (2 x dim DECIMAL state per label), then a
    label-keyed join of two tiny frames — never a vector pair, never a
    fact-row shuffle beyond the label key."""
    dec = "decimal(38,12)"

    def _sums(df: DataFrame, tag: str) -> DataFrame:
        v = F.col(vec_col)
        aggs = [F.count(F.lit(1)).alias(f"n_{tag}")] + [
            F.sum(F.element_at(v, d + 1).cast("double").cast(dec)).alias(
                f"_s{tag}_{d}"
            )
            for d in range(dim)
        ]
        return df.groupBy(F.col(label_col).alias("label")).agg(*aggs)
    j = _sums(emb_a, "a").join(_sums(emb_b, "b"), on="label", how="full")
    return _drift_combine(j, dim)


def _drift_combine(j: DataFrame, dim: int) -> DataFrame:
    """Shared closed-form combine for the centroid-drift family: one
    fixed left-to-right double association the oracle mirrors
    term-for-term."""
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    dot = norm_a = norm_b = shift = None
    for d in range(dim):
        ca = F.col(f"_sa_{d}").cast("double") / na
        cb = F.col(f"_sb_{d}").cast("double") / nb
        t_dot, t_a, t_b = ca * cb, ca * ca, cb * cb
        t_sh = (ca - cb) * (ca - cb)
        dot = t_dot if dot is None else dot + t_dot
        norm_a = t_a if norm_a is None else norm_a + t_a
        norm_b = t_b if norm_b is None else norm_b + t_b
        shift = t_sh if shift is None else shift + t_sh
    return j.select(
        "label",
        F.coalesce(F.col("n_a"), F.lit(0)).cast("bigint").alias("n_a"),
        F.coalesce(F.col("n_b"), F.lit(0)).cast("bigint").alias("n_b"),
        (dot / (F.sqrt(norm_a) * F.sqrt(norm_b))).alias("centroid_cos"),
        shift.alias("shift_sq"),
    )
