"""Event-stream queries (batch form; streaming variants live in
``streaming/``): JSON prop extraction, tumbling windows, sessionization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register


# -- JSON prop extraction --------------------------------------------------
@register(
    "events_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
    FROM events
    """,
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
    )


# -- tumbling hourly window (batch form of the streaming agg) --------------
@register(
    "events_tumbling_hourly",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           event_type,
           count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            "event_type",
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
    )


# -- gap-based sessionization (lag + cumulative sum; oracle-checked) -------
@register(
    "events_sessionize",
    oracle="""
    WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, value FROM events),
    marked AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch_us(ts - lag(ts) OVER w) > 300000000
                    THEN 1 ELSE 0 END AS new_session
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM marked
    )
    SELECT user_id, CAST(session_seq AS INT) AS session_seq,
           CAST(min(ts) AS TIMESTAMP) AS session_start,
           CAST(max(ts) AS TIMESTAMP) AS session_end,
           count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM numbered GROUP BY user_id, session_seq
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom gap-based sessionization as composable window ops (the
    non-session_window formulation — works identically in any SQL engine;
    session_window variant below is the Spark-native streaming-capable
    one). One shuffle on user_id; both windows share the partitioning."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 5 * 60 * 1_000_000
    marked = e.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w)) > gap_us),
            1,
        ).otherwise(0),
    )
    wsum = Window.partitionBy("user_id").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    numbered = marked.withColumn(
        "session_seq", F.sum("new_session").over(wsum).cast("int")
    )
    return numbered.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
    )


# -- Spark-native session_window (batch form; oracle via lag-equivalence) --
@register(
    "events_session_window",
    oracle="""
    WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id FROM events),
    marked AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch_us(ts - lag(ts) OVER w) >= 300000000
                    THEN 1 ELSE 0 END AS new_session
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM marked
    )
    SELECT user_id,
           CAST(min(ts) AS TIMESTAMP) AS session_start,
           CAST(max(ts) + INTERVAL 5 MINUTES AS TIMESTAMP) AS session_end,
           count(*) AS n_events
    FROM numbered GROUP BY user_id, session_seq
    """,
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F.session_window batch form. Session ends at last_event+gap; an
    event exactly at a session's end starts a NEW session (half-open
    windows) — hence the >= in the oracle's gap test."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "5 minutes").alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
        )
    )


# -- sliding windows (batch form; oracle via shift-unnest) -----------------
@register(
    "events_sliding_rates",
    oracle="""
    WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
    shifted AS (
        SELECT event_type,
               time_bucket(INTERVAL 10 MINUTES, ts) - (s.shift * INTERVAL 10 MINUTES)
                   AS window_start,
               ts
        FROM e CROSS JOIN (SELECT unnest([0, 1, 2]) AS shift) s
    )
    SELECT window_start,
           CAST(window_start + INTERVAL 30 MINUTES AS TIMESTAMP) AS window_end,
           event_type, count(*) AS n_events
    FROM shifted
    WHERE ts >= window_start AND ts < window_start + INTERVAL 30 MINUTES
    GROUP BY window_start, event_type
    """,
)
def events_sliding_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-min windows sliding every 10 min: each event lands in 3 windows
    (F.window's slide form; the oracle reconstructs via shift-unnest)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "30 minutes", "10 minutes").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


# -- trending top-k per hour window (serving-table shape; oracle-checked) --
@register(
    "events_trending_topk",
    oracle="""
    WITH c AS (
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
               event_type, count(*) AS n_events
        FROM events GROUP BY 1, 2)
    SELECT window_start, event_type, n_events, rank FROM (
        SELECT window_start, event_type, n_events,
               row_number() OVER (PARTITION BY window_start
                                  ORDER BY n_events DESC, event_type) AS rank
        FROM c)
    WHERE rank <= 5
    """,
)
def events_trending_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch form of the streaming trending serving table
    (streaming/trending.py::trending_topk over window_counts): top-5
    event types per tumbling hour, deterministically tie-broken. The
    streaming pipeline maintaining this incrementally (delta landing +
    touched-day re-rank, exactly-once) is restart-tested in
    tests/test_stream_rollup.py."""
    from ..streaming.trending import trending_topk, window_counts

    e = load_table(spark, sf_dir, "events")
    out = trending_topk(window_counts(e, window="1 hour"), k=5)
    return out.withColumn("n_events", F.col("n_events").cast("long"))
