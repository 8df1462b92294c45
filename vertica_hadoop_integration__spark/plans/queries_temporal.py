"""Temporal-join / rollup / sketch queries.

The reference's SQL surface has no temporal joins or approximate
aggregates (its aggregate inventory is count/min — SURVEY.md §2A S4/S5);
these cover the "absent relational categories" extensions with
oracle-checked as-of join, range join, grouping-set and hypertable
rollups, plus rows-only sketch estimators (error bounds pytest-asserted
in tests/test_sketches.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import sketches as K
from ..operators import temporal as T
from ..sources import load_table
from .registry import register

# -- as-of join (oracle: DuckDB ASOF LEFT JOIN) ----------------------------
# Right side deduped to one row per (user_id, ts) in BOTH engines: the
# as-of winner at equal timestamps would otherwise be tie-ambiguous and
# hash-unstable across engines.
_ASOF_SQL = """
    WITH p AS (SELECT event_id, user_id, ts, value FROM events
               WHERE event_type = 'purchase'),
         c AS (SELECT user_id, ts, max(value) AS value FROM events
               WHERE event_type = 'click' GROUP BY user_id, ts)
    SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts, p.value,
           CAST(c.ts AS TIMESTAMP) AS asof_ts, c.value AS asof_value
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
"""


@register("asof_join_purchase_click", oracle=_ASOF_SQL)
def asof_join_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase annotated with the user's most recent click at or
    before it (NULL if none). Union+window formulation: one shuffle on
    user_id, no join — see operators/temporal.asof_join."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    return T.asof_join(
        purchases, clicks, on="user_id", value_cols=("value",)
    ).select("event_id", "user_id", "ts", "value", "asof_ts", "asof_value")


# -- range join: point-in-interval against a band dimension ----------------
_BANDS = [(i, float(i * 20000), float((i + 1) * 20000)) for i in range(6)]
_BANDS_SQL = ", ".join(f"({i}, {lo}, {hi})" for i, lo, hi in _BANDS)


@register(
    "range_join_price_bands",
    oracle=f"""
    WITH bands(band_id, lo, hi) AS (VALUES {_BANDS_SQL})
    SELECT b.band_id, count(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN bands b ON l.l_extendedprice >= b.lo AND l.l_extendedprice < b.hi
    GROUP BY b.band_id
    """,
)
def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem prices bucketed into 20k-wide revenue bands via a
    broadcast range join (non-equi; the fact side streams map-side)."""
    li = load_table(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(_BANDS, ["band_id", "lo", "hi"])
    joined = T.range_join_point(li, bands, "l_extendedprice")
    return joined.groupBy("band_id").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("revenue"),
    )


# -- hypertable rollup (minute -> hour -> day cascading partials) ----------
def _rollup_level_sql(gran: str) -> str:
    return f"""
    SELECT '{gran}' AS granularity,
           CAST(date_trunc('{gran}', ts) AS TIMESTAMP) AS bucket_start,
           event_type,
           count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
           min(value) AS min_value,
           max(value) AS max_value,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_value
    FROM events GROUP BY 2, 3"""


@register(
    "hypertable_rollup_events",
    oracle=" UNION ALL ".join(_rollup_level_sql(g) for g in ("minute", "hour", "day")),
)
def hypertable_rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three time granularities in one result; coarser levels aggregate
    the finer level's partials, so raw events are scanned once. The
    oracle recomputes each level from raw rows — value equality proves
    the partial re-aggregation is lossless."""
    e = load_table(spark, sf_dir, "events")
    return T.hypertable_rollup(
        e, ts_col="ts", key_cols=("event_type",), value_col="value",
        granularities=("minute", "hour", "day"),
    )


# -- sketches (rows-only; error bounds asserted in tests/test_sketches.py) -
@register(
    "sketch_kmv_distinct",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exact,
           TRUE AS within_band
    FROM orders GROUP BY 1
    """,
)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct customers per order status (operators/sketches.py::
    kmv_distinct, k=64), audited in counts-and-error-band form since
    r09 (the sketch_hll_rollup pattern): exact count (SQL-replayable) +
    ``within_band`` = |estimate - exact| <= ceil(4/sqrt(k-2) * exact)+1
    — KMV's published relative error is ~1/sqrt(k-2), and the sketch is
    EXACT below k distinct values.  The oracle asserts TRUE, so an
    estimator break outside its guarantee fails the value hash; the
    portable twin (kmv_distinct_portable) already SQL-replays the
    bottom-k algebra itself."""
    o = load_table(spark, sf_dir, "orders")
    est = K.kmv_distinct(o, "o_custkey", ("o_orderstatus",), k=64)
    exact = o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_exact")
    )
    band = 4.0 / (64 - 2) ** 0.5
    return exact.join(est, on="o_orderstatus").select(
        "o_orderstatus",
        F.col("n_exact").cast("bigint").alias("n_exact"),
        (
            F.abs(F.col("distinct_est") - F.col("n_exact"))
            <= F.ceil(F.lit(band) * F.col("n_exact")) + F.lit(1)
        ).alias("within_band"),
    )


# sketch_hll_distinct / sketch_approx_quantiles moved to queries_extras.py
# (below the correctness window; kmv stays here as the family's checked row)


@register(
    "asof_join_tolerance",
    oracle=f"""
    SELECT event_id, user_id, ts, value,
           CASE WHEN date_diff('second', asof_ts, ts) <= 1800
                THEN asof_ts END AS asof_ts,
           CASE WHEN date_diff('second', asof_ts, ts) <= 1800
                THEN asof_value END AS asof_value
    FROM ({_ASOF_SQL})
    """,
)
def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """asof_join_purchase_click with pandas merge_asof's third knob: a
    click more than 30 minutes before the purchase is NO match (asof_*
    NULL) — attribution windows are the canonical use.  Same one-shuffle
    union+window plan; the tolerance is a map-side mask on the carried
    columns (operators/temporal.py::asof_join tolerance_seconds)."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    return T.asof_join(
        purchases, clicks, on="user_id", value_cols=("value",),
        tolerance_seconds=1800,
    ).select("event_id", "user_id", "ts", "value", "asof_ts", "asof_value")
