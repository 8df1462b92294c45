"""Batch sources: parquet test tables, CSV staging, ORC.

Replaces the reference's read-side surface: Vertica catalog reflection +
Sqoop text staging + Hive external tables (SURVEY.md §2B D7/D8) collapse to
declarative ``spark.read`` calls whose schema/pruning/pushdown Catalyst
handles. Scan efficiency notes:

* Column pruning + predicate pushdown reach the parquet/ORC footer readers
  (verify with ``df.explain`` -> ``PushedFilters`` / ``ReadSchema``).
* ``spark.sql.files.maxPartitionBytes`` (session.py) sizes file splits, so a
  100 TB table becomes ~800k well-sized tasks, no manual split planning
  (the reference needed a Sqoop boundary query + rowId salt for this;
  sqoop_json.py:31, sqoop_table.py:97).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

# The fixture star schema (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Pure declarative scan — filters/projections
    applied by callers push down into this scan via Catalyst.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark reads as long
    nanoseconds (``spark.sql.legacy.parquet.nanosAsLong``, session.py);
    normalize it to a microsecond timestamp so downstream plans see a
    regular timestamp column (the fixture generator emits whole-microsecond
    values, so the ns->us truncation is lossless)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    if name == "events":
        # defensive: the driver may hand us a session built without this
        # legacy conf; it is runtime-settable and required to scan
        # TIMESTAMP(NANOS) parquet.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # integer division: ns values (~1.7e18) exceed double's 53-bit
        # mantissa, so a float `/ 1000` would round the microsecond
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def read_csv_staging(
    spark: SparkSession, path: str, schema: StructType, sep: str = ","
) -> DataFrame:
    """CSV staging reader matching the reference's ``<t>_text`` external
    table shape: delimited, ``\\n`` lines, headerless, explicit schema
    (sqoop_pyhive.py:28-40). Explicit schema avoids a full inference scan —
    mandatory at scale."""
    return spark.read.csv(path, schema=schema, sep=sep, header=False)
