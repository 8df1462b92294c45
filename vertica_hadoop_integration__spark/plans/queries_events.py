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


# -- offline change-point localization per (type, day) (oracle-exact) --------
@register(
    "events_change_point",
    oracle="""
    WITH e AS (SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP)
                          AS seg_start,
                      CAST(ts AS TIMESTAMP) AS ts, event_id, value
               FROM events WHERE value IS NOT NULL),
    pre AS (
        SELECT event_type, seg_start, ts, event_id,
               row_number() OVER w AS i,
               SUM(CAST(value AS DECIMAL(30,15))) OVER w AS s
        FROM e
        WINDOW w AS (PARTITION BY event_type, seg_start
                     ORDER BY ts, event_id)),
    tot AS (
        SELECT event_type, seg_start, count(*) AS n,
               SUM(CAST(value AS DECIMAL(30,15))) AS t
        FROM e GROUP BY 1, 2),
    scored AS (
        SELECT p.event_type, p.seg_start, tot.n, p.i, p.ts,
               CAST(p.s AS DOUBLE) / CAST(p.i AS DOUBLE) AS mean_before,
               CAST(tot.t - p.s AS DOUBLE)
                   / CAST(tot.n - p.i AS DOUBLE) AS mean_after,
               abs(CAST(p.s AS DOUBLE) / CAST(p.i AS DOUBLE)
                   - CAST(tot.t - p.s AS DOUBLE)
                     / CAST(tot.n - p.i AS DOUBLE))
               * sqrt(CAST(p.i AS DOUBLE) * CAST(tot.n - p.i AS DOUBLE)
                      / CAST(tot.n AS DOUBLE)) AS score
        FROM pre p JOIN tot USING (event_type, seg_start)
        WHERE p.i >= 4 AND p.i <= tot.n - 4),
    picked AS (
        SELECT *, row_number() OVER (PARTITION BY event_type, seg_start
                      ORDER BY score DESC, i) AS rn
        FROM scored)
    SELECT event_type, seg_start, CAST(n AS BIGINT) AS n,
           CAST(i AS INT) AS split_i, ts AS change_ts,
           mean_before, mean_after, score
    FROM picked WHERE rn = 1
    """,
)
def events_change_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-shift change-point localization per (event_type, day)
    (operators/temporal.py::change_point_scan): the single-change-point
    least-squares scan via prefix sums — one cumulative DECIMAL window
    per bounded (type, day) segment scores EVERY split position without
    rescans or self-joins; argmax with earlier-split tie-break.  The
    level-shift monitoring report between the point-anomaly queries and
    the seasonal baseline; fully oracle-replayed."""
    from ..operators.temporal import change_point_scan

    e = load_table(spark, sf_dir, "events")
    return change_point_scan(e, min_segment=4)


# -- trajectory similarity search over user event paths (oracle-exact) -------
def _trajectory_oracle() -> str:
    from .oracle_fragments import minhash_portable_cte

    cte = minhash_portable_cte(
        num_hashes=8, bands=4,
        src=(
            "(SELECT user_id AS doc_id, "
            "string_agg(event_type, ' ' ORDER BY ts, event_id) AS text "
            "FROM events GROUP BY user_id)"
        ),
    )
    return rf"""
    WITH {cte}
    SELECT doc_id_a AS user_id_a, doc_id_b AS user_id_b, jaccard
    FROM ver WHERE jaccard >= 0.4
    ORDER BY jaccard DESC, user_id_a, user_id_b LIMIT 20
    """


@register("events_trajectory_similarity", oracle=_trajectory_oracle())
def events_trajectory_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k trajectory similarity search (the distributed
    trajectory-top-k workload, ICDE'21 REPOSE class, re-expressed
    Spark-first): each user's ordered event-type sequence becomes a
    path string, ORDER-PRESERVING 3-step shingles feed the portable
    MinHash-LSH pipeline (banding prunes the user-pair space exactly
    like document dedup — trajectories ARE documents over a small
    alphabet), and the exact path-shingle Jaccard ranks the top-20
    most-similar journey pairs.  One groupBy builds paths (array_sort
    of (ts, event_id, type) structs — deterministic under ts ties),
    everything downstream reuses operators/dedup.py::
    minhash_dedup_portable verbatim; whole pipeline oracle-replayed,
    top-k via orderBy+limit."""
    from ..operators import dedup as D

    e = load_table(spark, sf_dir, "events")
    traj = e.groupBy("user_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda x: x["event_type"],
            ),
        ).alias("path")
    )
    pairs = D.minhash_dedup_portable(
        traj, text_col="path", id_col="user_id",
        num_hashes=8, bands=4, min_jaccard=0.4, shingle_n=3,
    )
    return (
        pairs.select(
            F.col("doc_id_a").alias("user_id_a"),
            F.col("doc_id_b").alias("user_id_b"),
            "jaccard",
        )
        .orderBy(F.desc("jaccard"), F.asc("user_id_a"), F.asc("user_id_b"))
        .limit(20)
    )


# ------------------------------------------------------------------
# Graduated from queries_round8.py (driver-green in CORRECTNESS_r08;
# see plans/__init__.py head rotation).

# -- two-proportion A/B z-test -------------------------------------------------
@register(
    "events_ab_test",
    oracle="""
    WITH u AS (SELECT user_id, CAST(ts AS DATE) AS day,
                      CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS v,
                      MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                          AS conv
               FROM events WHERE user_id IS NOT NULL
               GROUP BY 1, 2, 3),
    agg AS (SELECT v, count(*) AS n, SUM(conv) AS c FROM u GROUP BY 1),
    a AS (SELECT n AS n_control, c AS conv_control FROM agg WHERE v = 'A'),
    b AS (SELECT n AS n_treatment, c AS conv_treatment FROM agg
          WHERE v = 'B'),
    j AS (SELECT * FROM a CROSS JOIN b),
    t AS (SELECT *,
            CAST(conv_control AS DOUBLE) / CAST(n_control AS DOUBLE) AS pa,
            CAST(conv_treatment AS DOUBLE) / CAST(n_treatment AS DOUBLE) AS pb,
            CAST((conv_control + conv_treatment) AS DOUBLE)
                / CAST((n_control + n_treatment) AS DOUBLE) AS pp
          FROM j)
    SELECT CAST(n_control AS BIGINT) AS n_control,
           CAST(conv_control AS BIGINT) AS conv_control,
           CAST(n_treatment AS BIGINT) AS n_treatment,
           CAST(conv_treatment AS BIGINT) AS conv_treatment,
           pa AS rate_control,
           pb AS rate_treatment,
           pb - pa AS lift,
           CASE WHEN pp > 0.0 AND pp < 1.0 THEN
             (pb - pa) / sqrt(pp * (1.0 - pp)
                 * (1.0 / CAST(n_control AS DOUBLE)
                    + 1.0 / CAST(n_treatment AS DOUBLE)))
           END AS z_score,
           CASE WHEN pp > 0.0 AND pp < 1.0 THEN
             abs((pb - pa) / sqrt(pp * (1.0 - pp)
                 * (1.0 / CAST(n_control AS DOUBLE)
                    + 1.0 / CAST(n_treatment AS DOUBLE)))) > 1.96
           END AS significant
    FROM t
    """,
)
def events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion conversion z-test
    (operators/profile.py::ab_test_proportions): units are (user, day)
    pairs — conversion = any purchase event that day — split into
    control/treatment by the deterministic user_id parity (the hash
    split an experimentation platform assigns).  One mergeable unit
    aggregation, one variant aggregation, two 1-row scalars crossed;
    counts exact, every double expression one fixed association the
    oracle mirrors."""
    from ..operators.profile import ab_test_proportions

    e = load_table(spark, sf_dir, "events")
    units = (
        e.filter(F.col("user_id").isNotNull())
        .groupBy(
            "user_id",
            F.to_date("ts").alias("day"),
            F.when(F.col("user_id") % 2 == 0, F.lit("A"))
            .otherwise(F.lit("B"))
            .alias("variant"),
        )
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("converted")
        )
    )
    return ab_test_proportions(units, "variant", "converted")


# -- graduated from queries_round9 (driver-green in CORRECTNESS_r09) ------

# -- last-touch conversion attribution ---------------------------------------
@register(
    "events_attribution_last_touch",
    oracle="""
    WITH s AS (
        SELECT event_type, value, ts, user_id,
               last_value(CASE WHEN event_type <> 'purchase' THEN
                   struct_pack(t := ts, y := event_type) END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS _touch
        FROM events),
    conv AS (
        SELECT CASE WHEN _touch IS NOT NULL
                    AND epoch_us(ts) - epoch_us(_touch.t)
                        <= CAST(7 AS BIGINT) * 86400 * 1000000
                    THEN _touch.y END AS attributed_type,
               value
        FROM s WHERE event_type = 'purchase')
    SELECT attributed_type,
           CAST(count(*) AS BIGINT) AS n_conversions,
           CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM conv GROUP BY 1
    """,
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution report (operators/temporal.py::
    attribution_last_touch): every purchase credited to the user's most
    recent preceding non-purchase event within 7 days (NULL = organic),
    aggregated to (touchpoint type, conversions, DECIMAL-exact value).
    One user-keyed window carries the latest touch forward — no
    conversion-vs-history self-join — then a types-bounded groupBy."""
    from ..operators.temporal import attribution_last_touch

    e = load_table(spark, sf_dir, "events")
    return attribution_last_touch(e, window_days=7)

# -- cohort lifetime-value curves ---------------------------------------------
@register(
    "events_cohort_ltv",
    oracle="""
    WITH f AS (
        SELECT user_id AS u, date_trunc('week', min(ts)) AS cohort
        FROM events GROUP BY 1),
    cs AS (SELECT cohort AS cohort_week, CAST(count(*) AS BIGINT)
               AS cohort_size FROM f GROUP BY 1),
    pa AS (
        SELECT f.cohort AS cohort_week,
               CAST(date_diff('day', CAST(f.cohort AS DATE),
                    CAST(date_trunc('week', e.ts) AS DATE)) / 7
                    AS INT) AS age_weeks,
               CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active,
               sum(CAST(e.value AS DECIMAL(38,6))) AS v
        FROM events e JOIN f ON f.u = e.user_id
        GROUP BY 1, 2),
    cum AS (
        SELECT cohort_week, age_weeks, n_active,
               sum(v) OVER (PARTITION BY cohort_week ORDER BY age_weeks
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
        FROM pa)
    SELECT CAST(cohort_week AS DATE) AS cohort_week, age_weeks,
           n_active, cohort_size,
           CAST(c AS DOUBLE) AS cum_value,
           CAST(c AS DOUBLE) / CAST(cohort_size AS DOUBLE) AS ltv_per_user
    FROM cum JOIN cs USING (cohort_week)
    """,
)
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves (operators/temporal.py::cohort_ltv): users
    cohorted by first-event week; cumulative DECIMAL-exact per-user
    value by cohort age in weeks — the revenue-side twin of
    events_retention_cohorts.  Running totals window over the bounded
    (cohort, age) spine only; the single fact shuffle is the user key."""
    from ..operators.temporal import cohort_ltv

    e = load_table(spark, sf_dir, "events")
    return cohort_ltv(e)

# -- Welch's t-test on a continuous per-user metric -----------------------------
@register(
    "stats_welch_ttest",
    oracle="""
    WITH units AS (
        SELECT user_id,
               CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
               CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS metric
        FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2),
    g AS (SELECT variant, count(*) AS n,
                 sum(CAST(metric AS DECIMAL(38,6))) AS s,
                 sum(CAST(metric * metric AS DECIMAL(38,6))) AS ss
          FROM units GROUP BY 1),
    ab AS (SELECT
        (SELECT n FROM g WHERE variant = 'A') AS na_i,
        (SELECT s FROM g WHERE variant = 'A') AS sa,
        (SELECT ss FROM g WHERE variant = 'A') AS ssa,
        (SELECT n FROM g WHERE variant = 'B') AS nb_i,
        (SELECT s FROM g WHERE variant = 'B') AS sb,
        (SELECT ss FROM g WHERE variant = 'B') AS ssb),
    c AS (SELECT CAST(na_i AS DOUBLE) AS na, CAST(nb_i AS DOUBLE) AS nb,
                 CAST(sa AS DOUBLE) / CAST(na_i AS DOUBLE) AS ma,
                 CAST(sb AS DOUBLE) / CAST(nb_i AS DOUBLE) AS mb,
                 CAST(ssa AS DOUBLE) AS ssad, CAST(ssb AS DOUBLE) AS ssbd,
                 na_i, nb_i
          FROM ab),
    v AS (SELECT na, nb, ma, mb, na_i, nb_i,
                 ((ssad - na * ma * ma) / (na - 1.0)) / na AS sea,
                 ((ssbd - nb * mb * mb) / (nb - 1.0)) / nb AS seb
          FROM c)
    SELECT CAST(na_i AS BIGINT) AS n_a, CAST(nb_i AS BIGINT) AS n_b,
           ma AS mean_a, mb AS mean_b,
           (ma - mb) / sqrt(sea + seb) AS t_stat,
           (sea + seb) * (sea + seb)
               / (sea * sea / (na - 1.0) + seb * seb / (nb - 1.0))
               AS df_welch,
           abs((ma - mb) / sqrt(sea + seb)) > 1.96 AS reject_at_95
    FROM v
    """,
)
def stats_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test (operators/profile.py::
    welch_ttest) on revenue-per-user between the deterministic parity
    split — the continuous-metric companion to events_ab_test's
    proportions z-test.  Units are per-(user, variant) DECIMAL-exact
    value sums; the test itself is one mergeable moment aggregation +
    closed-form doubles the oracle mirrors association-for-
    association."""
    from ..operators.profile import welch_ttest

    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    units = e.groupBy(
        "user_id",
        F.when(F.col("user_id") % 2 == 0, F.lit("A"))
        .otherwise(F.lit("B"))
        .alias("variant"),
    ).agg(
        F.sum(F.col("value").cast("decimal(38,6)"))
        .cast("double")
        .alias("metric")
    )
    return welch_ttest(units, "variant", "metric")
