"""Incremental-state ledger: the engine's ``sqoop_etl_status`` table
(reference schema inferred at FIXTURES.md §B from sqoop_table.py:143,145,62).

Storage: a tiny versioned-parquet table with an atomically-swapped pointer
file — a minimal Delta-style commit protocol giving UPDATE/INSERT semantics
(S11/S14/S15) on immutable files:

    <path>/v=000001/part-*.parquet      immutable snapshots
    <path>/_LATEST                      text file naming the live version
                                        (os.replace -> atomic on POSIX)

Readers read the version named by _LATEST; writers write a NEW version dir
then swap the pointer. Crash between "write dir" and "swap" leaves garbage
files but never a torn table. The ledger holds one row per table-partition
— thousands of rows at 100 TB fact scale — so full-snapshot rewrites are
O(KB) and the pattern is sound; the *fact* data never goes through this
path.

Partition values are stored as strings; callers must use an
order-preserving encoding (ISO dates, zero-padded ints) because
oldest-first selection (S1, sqoop_table.py:41) sorts lexically.
"""

from __future__ import annotations

import os
import shutil
import uuid

from .locking import FileLock
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

LEDGER_SCHEMA = StructType(
    [
        StructField("table_name", StringType(), False),
        StructField("hive_db", StringType(), True),
        StructField("start_date", TimestampType(), True),
        StructField("end_date", TimestampType(), True),
        StructField("primary_partition_column", StringType(), True),
        StructField("primary_partition_value", StringType(), True),
        StructField("is_complete", StringType(), False),  # 'f'/'t' as in reference
        StructField("num_mappers", IntegerType(), True),
    ]
)

_POINTER = "_LATEST"


class Ledger:
    """Parquet-backed incremental-state ledger with atomic snapshot swap."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)
        # Ledger-scoped writer lock: every mutation is a whole-snapshot
        # read-modify-write, so two concurrent writers on DIFFERENT tables
        # sharing one ledger path (two jobs, or a stream plus a batch run)
        # would otherwise lose each other's rows — last snapshot wins.
        # Serializing the read->union->swap critical section closes that;
        # readers stay lock-free (the pointer swap is atomic).
        self._write_lock = FileLock(os.path.join(path, "_WRITE_LOCK"))
        if not os.path.exists(self._pointer_path()):
            with self._write_lock:
                if not os.path.exists(self._pointer_path()):
                    self._write_snapshot(self.spark.createDataFrame([], LEDGER_SCHEMA))

    # -- commit protocol ---------------------------------------------------
    def _pointer_path(self) -> str:
        return os.path.join(self.path, _POINTER)

    def _current_version(self) -> str | None:
        try:
            with open(self._pointer_path()) as f:
                return f.read().strip()
        except FileNotFoundError:
            return None

    # Snapshot retention: every mutation writes a NEW immutable version
    # dir, so without pruning the ledger path accumulates one dir per
    # mutation forever (at one mutation per table-partition per run this
    # is thousands of small dirs a day at 100 TB scale — a namenode /
    # object-listing burden, not a data-size one).  After each pointer
    # swap (still under the writer lock) all but the newest _RETAIN
    # versions are deleted.  _RETAIN > 1 keeps a window for lock-free
    # readers that resolved the pointer just before a swap: a reader
    # would have to lag _RETAIN consecutive mutations behind to see its
    # version vanish.
    _RETAIN = 10

    @staticmethod
    def _version_seq(d: str) -> int:
        """Explicit version order: the zero-padded sequence prefix baked
        into the dir name at write time.  mtime ordering (the previous
        scheme) ties/misorders under coarse filesystem timestamp
        granularity, which could delete a newer non-live version first
        and shrink the _RETAIN reader-safety window.  Legacy unordered
        names (v-<uuid>) parse as -1 -> pruned first.  Only the exact
        new format (v-<12 digits>-<suffix>) is accepted: a legacy uuid
        chunk that happens to be all decimal digits would otherwise
        parse as a huge sequence, pinning that oldest dir as "newest"
        in pruning and bumping _next_seq to start above it."""
        parts = d.split("-")
        if len(parts) >= 3 and len(parts[1]) == 12 and parts[1].isdigit():
            return int(parts[1])
        return -1

    def _next_seq(self) -> int:
        try:
            existing = os.listdir(self.path)
        except FileNotFoundError:
            return 0
        return 1 + max(
            (self._version_seq(d) for d in existing if d.startswith("v-")),
            default=-1,
        )

    def _prune_old_versions(self) -> None:
        live = self._current_version()
        versions = [
            d
            for d in os.listdir(self.path)
            if d.startswith("v-")
            and d != live
            and os.path.isdir(os.path.join(self.path, d))
        ]
        versions.sort(key=self._version_seq, reverse=True)
        for stale in versions[self._RETAIN - 1 :]:
            shutil.rmtree(os.path.join(self.path, stale), ignore_errors=True)

    def _write_snapshot(self, df: DataFrame) -> None:
        version = f"v-{self._next_seq():012d}-{uuid.uuid4().hex[:6]}"
        out_dir = os.path.join(self.path, version)
        # coalesce(1): the ledger is tiny by design; one file per snapshot
        df.coalesce(1).write.mode("overwrite").parquet(out_dir)
        tmp = self._pointer_path() + f".tmp-{uuid.uuid4().hex[:6]}"
        with open(tmp, "w") as f:
            f.write(version)
        os.replace(tmp, self._pointer_path())  # atomic pointer swap
        self._prune_old_versions()

    def read(self) -> DataFrame:
        version = self._current_version()
        return self.spark.read.schema(LEDGER_SCHEMA).parquet(
            os.path.join(self.path, version)
        )

    # -- S9+S11: enqueue unseen partitions (sqoop_table.py:131-148) --------
    def enqueue_new(
        self,
        parts: DataFrame,
        table_name: str,
        hive_db: str,
        partition_column: str | None,
        num_mappers: int,
    ) -> int:
        """Insert a pending row for every partition value absent from the
        ledger (anti-join semantics -> idempotent re-runs). ``parts`` must
        have a single string column ``part``. Returns rows inserted."""
        with self._write_lock:
            current = self.read()
            seen = current.filter(F.col("table_name") == table_name).select(
                F.col("primary_partition_value").alias("part")
            )
            new = parts.select(F.col("part").cast("string").alias("part")).join(
                F.broadcast(seen), on=["part"], how="left_anti"
            )
            new_rows = new.select(
                F.lit(table_name).alias("table_name"),
                F.lit(hive_db).alias("hive_db"),
                F.current_timestamp().alias("start_date"),
                F.lit(None).cast("timestamp").alias("end_date"),
                F.lit(partition_column).cast("string").alias("primary_partition_column"),
                F.col("part").alias("primary_partition_value"),
                F.lit("f").alias("is_complete"),
                F.lit(num_mappers).cast("int").alias("num_mappers"),
            )
            n = new_rows.count()
            if n:
                self._write_snapshot(current.unionByName(new_rows))
            return n

    def enqueue_whole_table(
        self, table_name: str, hive_db: str, num_mappers: int
    ) -> int:
        """Whole-table mode (PRIMARY_ID='': one NULL-keyed row,
        sqoop_table.py:141-143)."""
        with self._write_lock:
            current = self.read()
            exists = not (
                current.filter(
                    (F.col("table_name") == table_name)
                    & F.col("primary_partition_value").isNull()
                )
                .limit(1)
                .isEmpty()
            )
            if exists:
                return 0
            row = self.spark.range(1).select(
                F.lit(table_name).alias("table_name"),
                F.lit(hive_db).alias("hive_db"),
                F.current_timestamp().alias("start_date"),
                F.lit(None).cast("timestamp").alias("end_date"),
                F.lit(None).cast("string").alias("primary_partition_column"),
                F.lit(None).cast("string").alias("primary_partition_value"),
                F.lit("f").alias("is_complete"),
                F.lit(num_mappers).cast("int").alias("num_mappers"),
            )
            self._write_snapshot(current.unionByName(row))
            return 1

    # -- S1/S2: oldest pending (sqoop_table.py:39-52) ----------------------
    def next_pending(self, table_name: str) -> str | None:
        rows = (
            self.read()
            .filter((F.col("is_complete") == "f") & (F.col("table_name") == table_name))
            .orderBy(F.col("primary_partition_value").asc_nulls_first())
            .select("primary_partition_value")
            .limit(1)
            .collect()
        )
        if not rows:
            return None
        return rows[0][0]

    # -- S3: existence probe (sqoop_table.py:106-112) ----------------------
    def pending_exists(self, table_name: str) -> bool:
        return not (
            self.read()
            .filter((F.col("is_complete") == "f") & (F.col("table_name") == table_name))
            .limit(1)
            .isEmpty()
        )

    # -- S14: mark complete (sqoop_table.py:59-66) -------------------------
    def mark_complete(self, table_name: str, partition_value: str | None) -> None:
        with self._write_lock:
            current = self.read()
            match = (F.col("table_name") == table_name) & (
                F.col("primary_partition_value").eqNullSafe(F.lit(partition_value))
            )
            updated = current.withColumn(
                "is_complete", F.when(match, F.lit("t")).otherwise(F.col("is_complete"))
            ).withColumn(
                "end_date",
                F.when(match, F.current_timestamp()).otherwise(F.col("end_date")),
            )
            self._write_snapshot(updated)

    # -- S15: delete rows (sqoop_table.py:68-73) ---------------------------
    def delete_table(self, table_name: str) -> None:
        with self._write_lock:
            self._write_snapshot(self.read().filter(F.col("table_name") != table_name))
