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
