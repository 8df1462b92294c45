"""DataFrame plumbing helpers shared across operator modules."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Repartition up to the cluster's parallelism when the input arrives
    in fewer partitions — a small parquet file scans as ONE partition and
    would serialize expensive per-row work (tokenizing, shingling,
    hashing, Arrow matmuls) onto one core.  At real scale the scan
    already exceeds defaultParallelism and this is a no-op (no shuffle
    is added); locally it is the difference between 1-core and 32-core
    map stages (measured 3.8s -> 0.8s on the DSIR feature pass at
    sf0.1).  Apply at the entry of CPU-bound operators, never on cheap
    scan-stage projections where the exchange would dominate."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df
