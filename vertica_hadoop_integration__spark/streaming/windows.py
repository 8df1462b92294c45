"""Streaming window operators over the ``events`` stream.

Every transformation here is *mode-agnostic*: it accepts a batch OR
streaming DataFrame with schema (event_id, ts timestamp, user_id,
event_type, value, props) and builds the same logical plan — Structured
Streaming's incrementalizer turns it into a stateful streaming plan when
the input is a stream. Tests exercise both modes and assert they agree
(batch result == streaming availableNow result).

Scale/state notes:
* watermarks bound state: late rows beyond the watermark are dropped and
  window state is evicted — without it, 100 TB/day of events would grow
  state unboundedly;
* state store shuffles on the group keys (window+type, user); skew on
  hot users is the risk — AQE doesn't apply to streaming, so hot-key
  salting must be done in the key expression if needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_watermark(events: DataFrame, delay: str = "10 minutes") -> DataFrame:
    return events.withWatermark("ts", delay)


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "10 minutes"
) -> DataFrame:
    """Tumbling-window counts/sums per event_type. Output one row per
    (window, type) when the watermark passes window end (append mode)."""
    return (
        with_watermark(events, watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_rates(
    events: DataFrame,
    window: str = "30 minutes",
    slide: str = "10 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Sliding-window event rate per type — each event lands in
    window/slide overlapping windows."""
    return (
        with_watermark(events, watermark)
        .groupBy(F.window("ts", window, slide).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def session_aggregate(
    events: DataFrame, gap: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Session windows per user: events within ``gap`` of each other merge
    into one session (F.session_window — dynamic-length state merged by
    the streaming session-window operator)."""
    return (
        with_watermark(events, watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


def dedup_within_watermark(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming dedup on event_id within the watermark horizon — state
    holds only ids newer than the watermark (bounded), unlike
    dropDuplicates whose state grows forever."""
    wm = with_watermark(events, watermark)
    if events.isStreaming:
        return wm.dropDuplicatesWithinWatermark(keys or ["event_id"])
    # batch plans have no watermark state; plain dropDuplicates is the
    # batch-equivalent semantics
    return events.dropDuplicates(keys or ["event_id"])


def enrich_with_dim(
    events: DataFrame,
    dim: DataFrame,
    on_left: str = "user_id",
    on_right: str = "c_custkey",
    how: str = "left",
) -> DataFrame:
    """Stream-static join: each micro-batch joins against the (batch)
    dimension — Spark re-plans the static side per batch, so a broadcast
    dim stays map-side with no stream-state. The standard enrichment
    shape: stream of facts, slowly-changing dim table; at 100 TB the
    stream side never shuffles for this join."""
    from pyspark.sql import functions as F

    return events.join(
        F.broadcast(dim), events[on_left] == dim[on_right], how
    )


def json_enriched(events: DataFrame) -> DataFrame:
    """Parse the props JSON column (from_json with explicit schema — the
    schema-on-read hop stays JVM-side)."""
    return events.withColumn(
        "props_k",
        F.from_json(F.col("props"), "k INT")["k"],
    )
