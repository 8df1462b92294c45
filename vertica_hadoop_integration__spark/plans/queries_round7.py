"""Round-7 additions.  Registered immediately after the reference suite
so the driver's natural-order first-50 correctness sample covers each
new query in the round it is written (see plans/__init__.py).  Queries
graduate to their topical home module once their driver row lands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register

__all__: list[str] = []


# -- JDBC write->read-back round-trip against a live embedded Derby ----------
# The north star is "Spark reads Hadoop / writes Vertica via JDBC"
# (BASELINE.json); the read half is live-tested against Derby
# (tests/test_jdbc_live.py) but the driver never exercised the SINK half.
# This query runs the full sink+source cycle in-process: write a customer
# slice through write_jdbc (real CREATE TABLE + batched INSERTs through
# the embedded Derby driver), read it back with a predicate-sliced
# parallel read (4 MOD residue classes, evaluated server-side), and
# reduce to a summary the oracle predicts straight from the parquet —
# count, exact key sum, DECIMAL balance sum.  Any loss, duplication, or
# value corruption in either JDBC direction breaks the value hash.
@register(
    "jdbc_write_roundtrip",
    oracle="""
    SELECT count(*) AS n_rows,
           CAST(sum(c_custkey) AS BIGINT) AS key_sum,
           CAST(sum(CAST(c_acctbal AS DECIMAL(30,2))) AS DECIMAL(38,2))
               AS bal_sum,
           CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_keys
    FROM customer WHERE c_custkey % 3 = 0
    """,
)
def jdbc_write_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vertica-sink rehearsal (sources/jdbc.py::write_jdbc, cited to the
    reference's numLoaders throttle): write -> read-back -> summarize
    through a genuine JDBC endpoint (Spark's bundled embedded Derby —
    real driver, real batched inserts, real server-side MOD pushdown).
    The summary is computed from the READ-BACK frame only, so the oracle
    (which reads the parquet source) certifies the round-trip lossless."""
    import tempfile

    from ..sources.jdbc import (
        JdbcSource,
        mod_predicates,
        read_partitioned,
        write_jdbc,
    )

    db_dir = tempfile.mkdtemp(prefix="jdbc_rt_") + "/db"
    src = JdbcSource(
        url=f"jdbc:derby:{db_dir};create=true",
        table="customer_rt",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    )
    df = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 3 == 0)
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    )
    write_jdbc(df, src, mode="overwrite", num_partitions=2)
    # Derby folds unquoted identifiers to uppercase; Spark's JDBC writer
    # creates case-exact quoted columns — quote the key in the predicate
    back = read_partitioned(
        spark, src, predicates=mod_predicates('"c_custkey"', 4)
    )
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("c_custkey").cast("bigint").alias("key_sum"),
        F.sum(F.col("c_acctbal").cast("decimal(30,2)"))
        .cast("decimal(38,2)")
        .alias("bal_sum"),
        F.countDistinct("c_custkey").cast("bigint").alias("n_keys"),
    )
