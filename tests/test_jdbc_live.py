"""Live JDBC round-trip: the P1/P3 extract paths against a real database.

The reference's core hop is a JDBC bulk extract with N parallel mappers
(sqoop_json.py:41-79) — until now the engine's JDBC layer was verified
interface-only because no server-based database exists in this container.
Apache Derby's EMBEDDED driver ships inside Spark's own jar directory
(it backs the Hive metastore), so a file-backed Derby database gives a
genuine JDBC endpoint in-process: real driver, real SQL pushdown, real
per-partition connections.

Covered end-to-end: write_jdbc (table create + insert), read_partitioned
in BOTH parallel modes — range partitioning (partitionColumn/bounds) and
predicate slicing (mod_predicates) — with value parity and a physical
partition-count assertion proving the read is actually parallel.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from vertica_hadoop_integration__spark.sources import load_table
from vertica_hadoop_integration__spark.sources.jdbc import (
    JdbcSource,
    mod_predicates,
    read_partitioned,
    write_jdbc,
)

_SPARK_JARS = os.path.join(
    os.path.dirname(os.path.abspath(__import__("pyspark").__file__)), "jars"
)
_HAS_DERBY = bool(glob.glob(os.path.join(_SPARK_JARS, "derby-*.jar")))

pytestmark = pytest.mark.skipif(
    not _HAS_DERBY, reason="no Derby jar in the Spark runtime"
)

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_src(spark, sf_dir, tmp_path_factory):
    """A Derby database seeded with a customer slice via write_jdbc —
    the engine's own sink is the fixture loader, so the test covers the
    write half implicitly."""
    db_dir = tmp_path_factory.mktemp("derby") / "db"
    src = JdbcSource(
        url=f"jdbc:derby:{db_dir};create=true",
        table="customer",
        driver=DERBY_DRIVER,
    )
    df = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal"
    )
    write_jdbc(df, src, mode="overwrite", num_partitions=2)
    return src, df


def test_jdbc_roundtrip_range_partitioned(spark, derby_src):
    """Range-partitioned parallel read (the P1 path: partitionColumn +
    bounds -> one WHERE-range query per task)."""
    src, want = derby_src
    hi = want.agg(F.max("c_custkey")).first()[0]
    got = read_partitioned(
        spark,
        src,
        partition_column="c_custkey",
        num_partitions=4,
        lower_bound=1,
        upper_bound=hi + 1,
    )
    assert got.rdd.getNumPartitions() == 4
    assert got.count() == want.count()
    g = {r.c_custkey: (r.c_name, r.c_nationkey) for r in got.collect()}
    w = {r.c_custkey: (r.c_name, r.c_nationkey) for r in want.collect()}
    assert g == w


def test_jdbc_roundtrip_mod_predicates(spark, derby_src):
    """Predicate-sliced parallel read (the P3 keyless path: one residue
    class per task, evaluated server-side — Derby supports MOD)."""
    src, want = derby_src
    # Spark's JDBC writer creates quoted (case-exact) columns; Derby folds
    # unquoted identifiers to uppercase, so quote the key in the predicate
    preds = mod_predicates('"c_custkey"', 4)
    got = read_partitioned(spark, src, predicates=preds)
    assert got.rdd.getNumPartitions() == 4
    assert got.count() == want.count()
    # residue classes partition the table: no row lost, none duplicated
    assert got.select("c_custkey").distinct().count() == want.count()


def test_jdbc_pushdown_subquery(spark, derby_src):
    """dbtable accepts a pushdown subquery — the reference's filtered
    extract (WHERE pid = value pruning) runs server-side."""
    src, want = derby_src
    sub = JdbcSource(
        url=src.url,
        table='(SELECT "c_custkey", "c_acctbal" FROM customer'
        ' WHERE "c_nationkey" = 3) pruned',
        driver=src.driver,
    )
    got = read_partitioned(spark, sub)
    assert got.count() == want.filter(F.col("c_nationkey") == 3).count()
    assert set(got.columns) == {"C_CUSTKEY", "C_ACCTBAL"} or set(
        got.columns
    ) == {"c_custkey", "c_acctbal"}


def test_jdbc_write_options_decimal_timestamp_roundtrip_and_truncate(
    spark, tmp_path
):
    """The writer option surface against a live endpoint (r07 verdict
    item 7): createTableColumnTypes pins exact DECIMAL(12,2)/TIMESTAMP
    column types at create time (the D11 map applied on write), values
    round-trip bit-exact, and overwrite with truncate=True REUSES the
    table — proven by the pinned DECIMAL type surviving an overwrite
    that does not resend createTableColumnTypes (a drop+recreate would
    fall back to the generic type mapping)."""
    from datetime import datetime
    from decimal import Decimal

    from vertica_hadoop_integration__spark.sources.jdbc import (
        write_jdbc,
    )

    db_dir = tmp_path / "derby_w"
    src = JdbcSource(
        url=f"jdbc:derby:{db_dir};create=true",
        table="typed_sink",
        driver=DERBY_DRIVER,
    )
    df = spark.createDataFrame(
        [
            (1, Decimal("12345.67"), datetime(2024, 3, 1, 12, 30, 45)),
            (2, Decimal("-0.01"), datetime(2024, 3, 2, 0, 0, 0)),
        ],
        "id bigint, bal decimal(12,2), ts timestamp",
    )
    write_jdbc(
        df,
        src,
        mode="overwrite",
        batchsize=500,
        isolation_level="READ_COMMITTED",
        create_table_column_types="id BIGINT, bal DECIMAL(12,2), ts TIMESTAMP",
    )
    back = read_partitioned(spark, src)
    assert dict(back.dtypes)["bal"] == "decimal(12,2)"
    got = {r["id"]: (r["bal"], r["ts"]) for r in back.collect()}
    want = {r["id"]: (r["bal"], r["ts"]) for r in df.collect()}
    assert got == want

    # overwrite WITHOUT resending the column types, truncate=True: the
    # table (and its pinned DECIMAL(12,2)) must survive
    df2 = spark.createDataFrame(
        [(3, Decimal("999.99"), datetime(2025, 1, 1, 6, 0, 0))],
        "id bigint, bal decimal(12,2), ts timestamp",
    )
    write_jdbc(df2, src, mode="overwrite", truncate=True)
    back2 = read_partitioned(spark, src)
    assert dict(back2.dtypes)["bal"] == "decimal(12,2)"
    assert back2.count() == 1
    (row,) = back2.collect()
    assert (row["id"], row["bal"]) == (3, Decimal("999.99"))


class TestAtomicJdbcWrite:
    """write_jdbc_atomic's staged-swap exactly-once protocol (r10
    VERDICT item 9): the reference's completion flag-flip
    (sqoop_etl.py:43-46) on the WRITE side — a reader must never see a
    half-loaded table, and a crashed load must converge on rerun."""

    def _src(self, tmp_path, name="atomic_sink"):
        db_dir = tmp_path / "derby_atomic"
        return JdbcSource(
            url=f"jdbc:derby:{db_dir};create=true",
            table=name,
            driver=DERBY_DRIVER,
        )

    def _read(self, spark, src):
        from vertica_hadoop_integration__spark.sources.jdbc import (
            read_partitioned,
        )

        return read_partitioned(spark, src)

    def test_partitioned_atomic_write_and_overwrite(self, spark, tmp_path):
        from vertica_hadoop_integration__spark.sources.jdbc import (
            write_jdbc_atomic,
        )

        src = self._src(tmp_path)
        v1 = spark.range(0, 100).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        write_jdbc_atomic(v1, src, num_partitions=3)
        got = self._read(spark, src)
        assert got.count() == 100
        assert got.agg(F.sum("v")).first()[0] == 9900
        # overwrite with different contents — the swap replaces fully
        v2 = spark.range(0, 7).select(
            F.col("id").alias("k"), (F.col("id") + 1).alias("v")
        )
        write_jdbc_atomic(v2, src, num_partitions=2)
        got2 = self._read(spark, src)
        assert got2.count() == 7
        assert got2.agg(F.sum("v")).first()[0] == 28

    def test_crash_before_commit_preserves_old_table(
        self, spark, tmp_path, monkeypatch
    ):
        """Failure point 1: the staging load completes but the commit
        swap never runs (crash between load and flag-flip).  The old
        table must stay fully intact; the rerun must converge."""
        from vertica_hadoop_integration__spark.sources import jdbc as J

        src = self._src(tmp_path)
        v1 = spark.range(0, 50).select(
            F.col("id").alias("k"), F.col("id").alias("v")
        )
        J.write_jdbc_atomic(v1, src, num_partitions=2)

        def boom(*a, **kw):
            raise RuntimeError("injected crash before commit")

        monkeypatch.setattr(J, "_commit_swap", boom)
        v2 = spark.range(0, 9).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        )
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="injected"):
            J.write_jdbc_atomic(v2, src, num_partitions=2)
        # reader still sees the COMPLETE old table — zero partial rows
        got = self._read(spark, src)
        assert got.count() == 50
        assert got.agg(F.sum("v")).first()[0] == 1225
        # rerun without the fault: converges to v2, orphan stage reused
        monkeypatch.undo()
        J.write_jdbc_atomic(v2, src, num_partitions=2)
        got2 = self._read(spark, src)
        assert got2.count() == 9
        assert got2.agg(F.sum("v")).first()[0] == 360

    def test_crash_mid_stage_load_leaves_reader_view_unchanged(
        self, spark, tmp_path
    ):
        """Failure point 2: the staging load itself dies half-way (here:
        an orphan stage table with partial rows from a previous
        attempt).  The serving table never reflects it, and the next
        atomic write overwrites the orphan."""
        from vertica_hadoop_integration__spark.sources import jdbc as J

        src = self._src(tmp_path)
        v1 = spark.range(0, 30).select(
            F.col("id").alias("k"), F.col("id").alias("v")
        )
        J.write_jdbc_atomic(v1, src, num_partitions=2)
        # simulate the crashed half-load: partial rows in the stage
        stage = JdbcSource(
            url=src.url, table=src.table + "__stage", driver=src.driver
        )
        J.write_jdbc(
            spark.range(0, 3).select(
                F.col("id").alias("k"), F.col("id").alias("v")
            ),
            stage,
            mode="overwrite",
        )
        got = self._read(spark, src)
        assert got.count() == 30  # reader view untouched by the orphan
        v2 = spark.range(0, 12).select(
            F.col("id").alias("k"), (F.col("id") + 5).alias("v")
        )
        J.write_jdbc_atomic(v2, src, num_partitions=2)
        got2 = self._read(spark, src)
        assert got2.count() == 12
        assert got2.agg(F.sum("v")).first()[0] == 126
