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


def propagate_deletes(
    spark,
    tombstones: DataFrame,
    tables: dict[str, tuple[str, str]],
) -> list[dict]:
    """Right-to-be-forgotten propagation: remove every tombstoned id
    from a set of stored tables — the raw corpus AND the derived
    artifacts that embed per-document rows (LSH index bands/verify
    frames, chunk tables, posting lists) — rewriting each table
    atomically and returning a per-table audit report.

    ``tables`` maps a table name to ``(parquet_path, id_col)``; the
    tombstone frame has one ``id`` column.  Per table: one broadcast
    LEFT ANTI join (tombstone lists are small by nature — deletion
    requests, not corpora) and one atomic rewrite (write-to-temp +
    rename, same crash contract as every loader here), so a reader
    never sees a half-deleted table and a crashed run leaves the
    original in place.  Returns
    [{table, n_before, n_deleted, n_after}, ...] — the audit row a
    governance pipeline logs per deletion request.

    Scale note: anti-join + full rewrite is the parquet-native shape
    (immutable files); at 100 TB, partition the stored tables by an
    id-derived key so the anti-join prunes to the partitions that can
    contain tombstoned rows, and rewrite only those partitions."""
    from pyspark.sql import functions as F

    tomb = F.broadcast(tombstones.select(F.col("id")).distinct())
    report = []
    for name, (path, id_col) in sorted(tables.items()):
        df = spark.read.parquet(path)
        n_before = df.count()
        kept = df.join(
            tomb.withColumnRenamed("id", id_col), on=id_col, how="left_anti"
        )
        write_atomic(kept, path, output_format="parquet")
        n_after = spark.read.parquet(path).count()
        report.append(
            {
                "table": name,
                "n_before": n_before,
                "n_deleted": n_before - n_after,
                "n_after": n_after,
            }
        )
    return report
