"""Per-invocation materialized part co-order edge list.

``graph_label_propagation`` (the community listing) and
``graph_modularity`` (the partition-quality report) consume the SAME
graph: the lineitem ``l_orderkey % 3`` slice, collect_list
double-explode pair expansion, grouped per (p, q) — symmetric by
construction (the expansion emits both directions of every co-order
pair).

r11: the r10-era module-level ``_CACHE`` that memoized the edge list
AND the 3-sweep LPA label table per (applicationId, sf_dir) is GONE —
it made every invocation of either query after the first serve a
cached result instead of computing from the parquet inputs, which is
result caching, not optimization.  Each query invocation now builds
the graph itself; ``coorder_edges`` only factors out the shared
construction (and its one-time repartition+checkpoint) so the two
queries stay plan-identical, and within ONE ``graph_modularity``
invocation the same checkpointed frame legitimately feeds both the LPA
sweeps and the modularity aggregates.

The checkpoint is hash-partitioned on the SOURCE endpoint ``p``: every
LPA sweep joins labels on that key and modularity's degree aggregate
groups by it, so the one up-front exchange removes an edge-sized
exchange from each of those consumers (guide §2.4: two operations
keyed the same way share one exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table


def coorder_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The weighted part co-order edge list (p, q, w) of the
    ``l_orderkey % 3`` lineitem slice, eagerly localCheckpoint-
    materialized (lineage-free, ContextCleaner-reclaimed blocks) and
    hash-partitioned on ``p``.  Symmetric: (p, q, w) and (q, p, w)
    rows pair up exactly, one row per directed pair."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 3 == 0
    )
    pairs = (
        li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .groupBy("o")
        .agg(F.collect_list("p").alias("ps"))
        .select(F.explode("ps").alias("p"), "ps")
        .select("p", F.explode("ps").alias("q"))
        .filter(F.col("p") != F.col("q"))
    )
    # Eager localCheckpoint, no repartition (r11 A/B): a checkpointed
    # RDD scans back as UnknownPartitioning, so a pre-checkpoint
    # repartition("p") is a pure-cost exchange — and the
    # partition-preserving alternative (repartition + persist + count,
    # which DOES let the sweeps' label joins skip the edge exchange —
    # plan evidence in plans/r11/graph_lpa_sweeps_after.txt) measured
    # NO FASTER end-to-end in a 4-variant interleaved A/B at sf0.1
    # (mins 5.6-6.9s, persisted-edge variants mid-pack): the saved
    # exchange is repaid in InMemoryTableScan's columnar→row
    # deserialization on every one of the ~6 consumers.  The checkpoint
    # also avoids pinning a catalog cache entry in long-lived sessions
    # (blocks are ContextCleaner-reclaimed with the frame).
    return (
        pairs.groupBy("p", "q")
        .agg(F.count(F.lit(1)).alias("w"))
        .localCheckpoint()
    )
