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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_id_a",
    dst: str = "doc_id_b",
    max_iter: int = 20,
    strict: bool = True,
) -> DataFrame:
    """Return (node, component) with component = min node id reachable.

    ``edges`` is an undirected pair list; isolated nodes absent from it
    simply form their own singleton components downstream (left join +
    coalesce at the call site).

    If the fixpoint is not reached within ``max_iter`` rounds (component
    diameter exceeds it), labels are WRONG — one component would be
    silently split into several. ``strict=True`` (default) raises in
    that case; ``strict=False`` logs a warning and returns the partial
    labels (callers that only need a conservative over-partitioning)."""
    e = edges.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    )
    # symmetrize once; messages then flow both directions via one join
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    sym = sym.localCheckpoint()
    labels = (
        sym.select("u").distinct().select(F.col("u").alias("node"), F.col("u").alias("label"))
    ).localCheckpoint()

    converged = False
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.u == labels.node)
            .select(F.col("v").alias("node"), F.col("label"))
            .groupBy("node")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, on="node", how="left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))).alias(
                    "label"
                ),
            )
        ).localCheckpoint()
        stable = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .isEmpty()
        )
        labels = new_labels
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
