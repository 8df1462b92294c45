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

    ``events.ts`` is parquet TIMESTAMP(NANOS). How Spark surfaces that
    depends on the engine version, so normalize both shapes to a regular
    session-tz ``TIMESTAMP`` column here, at the single ingestion choke
    point, so every downstream plan (``unix_micros``, watermarks, window
    ranges) sees one canonical type:

    * Spark 3.x with ``spark.sql.legacy.parquet.nanosAsLong``: long
      nanoseconds -> ``timestamp_micros(ns div 1000)``.
    * Spark >= 4.1: the legacy conf is inert and the column arrives as
      ``TIMESTAMP_NTZ`` -> cast to ``TIMESTAMP``. Under the engine's fixed
      UTC session timezone (session.py) this is a pure reinterpretation —
      the stored micros value is unchanged.

    The fixture generator emits whole-microsecond values, so the ns->us
    truncation in the legacy branch is lossless."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    if name == "events":
        # defensive: the driver may hand us a session built without this
        # legacy conf; it is runtime-settable and (on Spark 3.x) required
        # to scan TIMESTAMP(NANOS) parquet. Inert no-op on Spark >= 4.1.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        dt = df.schema["ts"].dataType
        if isinstance(dt, LongType):
            # integer division: ns values (~1.7e18) exceed double's 53-bit
            # mantissa, so a float `/ 1000` would round the microsecond
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(dt, TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
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


def read_evolved(
    spark: SparkSession,
    path: str,
    target_schema=None,
) -> DataFrame:
    """Read a directory whose parquet files span SCHEMA GENERATIONS —
    the long-lived-table reality at 100 TB: columns get added, old
    files never get rewritten. ``mergeSchema`` unions the per-file
    schemas (files missing a column read it as NULL); if
    ``target_schema`` (a StructType) is given, the result is CONFORMED
    to it — missing columns materialized as typed NULLs, every column
    cast to the target type (safe widenings like int->long, float->
    double), extra columns dropped, column order fixed. That makes the
    reader's contract independent of which generation a file came
    from, so downstream plans never see a schema flap.

    Schema merge reads footers only (no data pass); the conform step
    is a pure projection. Incompatible type changes (e.g. string ->
    long) surface as an AnalysisException at plan time rather than
    silent corruption — by design."""
    from pyspark.sql import functions as F

    df = spark.read.option("mergeSchema", "true").parquet(path)
    if target_schema is None:
        return df
    cols = []
    have = {f.name for f in df.schema.fields}
    for f in target_schema.fields:
        if f.name in have:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)
