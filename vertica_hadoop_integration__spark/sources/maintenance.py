"""Storage maintenance: small-file compaction.

The reference's pipeline produced one directory of files per Sqoop
mapper per partition per run (``/user/sqoop2/<t>/``, N_MAPPERS text
files each load — sqoop_pyhive.py:30-32); long-running incremental
loads accumulate small files that poison scan planning (one task per
tiny file) and NameNode/listing pressure. Compaction rewrites a
directory to ~target-sized files, atomically.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession

from .writers import write_atomic


def _dir_bytes(path: str) -> tuple[int, int]:
    total, files = 0, 0
    for root, _dirs, names in os.walk(path):
        for n in names:
            if n.startswith(("_", ".")):
                continue
            total += os.path.getsize(os.path.join(root, n))
            files += 1
    return total, files


def compact_path(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
) -> dict:
    """Rewrite ``path`` to ceil(size/target) files of ~target size.

    Uses coalesce (narrow — no shuffle; merges existing partitions) and
    the atomic rename commit from write_atomic, so readers never observe
    a partial directory. Returns {files_before, files_after, bytes}.

    Local-filesystem sizing: on HDFS/object stores swap _dir_bytes for
    the FileSystem API / listing; the Spark plan is unchanged. At 100 TB
    run per-partition (compact each ledger partition directory after its
    load completes), never globally."""
    size, files_before = _dir_bytes(path)
    n = max(1, math.ceil(size / target_file_bytes))
    df = (
        spark.read.format(fmt).load(path)
        if fmt != "csv"
        else spark.read.csv(path, header=False)
    )
    write_atomic(df.coalesce(n), path, output_format=fmt)
    _, files_after = _dir_bytes(path)
    return {"files_before": files_before, "files_after": files_after, "bytes": size}
