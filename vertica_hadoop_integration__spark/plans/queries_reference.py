"""SURVEY.md §2A reference-surface queries (S1-S20) recast over the fixture
tables, each with a DuckDB oracle.

The reference's control table (``sqoop_etl_status``) does not exist in the
fixture set, so ledger-shaped queries derive an equivalent relation from
``orders``: a "partition" is an order month (``date_trunc('month',
o_orderdate)``), and the "already backed-up" set is the months that contain
a finalized (``o_orderstatus='F'``) order before 1999 — a genuine proper
subset, so anti-joins have bite. The *operators* exercised are exactly the
reference's (file:line cited per query); only the carrier relation differs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import relational as R
from ..sources import load_table
from .registry import register

# -- shared relation builders ---------------------------------------------


def _orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders")


def _month(col: str = "o_orderdate"):
    return F.date_trunc("month", F.col(col)).cast("date")


def _seen_months(orders: DataFrame) -> DataFrame:
    """The 'already backed up' partition set: months containing a finalized
    order placed before 1999."""
    return (
        orders.filter((F.col("o_orderstatus") == "F") & (F.year("o_orderdate") < 1999))
        .select(_month().alias("part"))
        .distinct()
    )


_SEEN_SQL = """
    SELECT DISTINCT CAST(date_trunc('month', o_orderdate) AS DATE) AS part
    FROM orders
    WHERE o_orderstatus = 'F' AND year(o_orderdate) < 1999
"""


# -- S1/S2: oldest pending partition (sqoop_table.py:39-52) ----------------
@register(
    "s1_next_pending",
    oracle=f"""
    SELECT part FROM (
        SELECT DISTINCT CAST(date_trunc('month', o_orderdate) AS DATE) AS part
        FROM orders
    ) p
    WHERE NOT EXISTS (SELECT 1 FROM ({_SEEN_SQL}) s WHERE s.part = p.part)
    ORDER BY part LIMIT 1
    """,
)
def s1_next_pending(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _orders(spark, sf_dir)
    parts = R.distinct_partitions(orders, _month())
    pending = R.anti_join_new(parts, _seen_months(orders), on=["part"])
    return pending.orderBy("part").limit(1)


# -- S3: existence probe (sqoop_table.py:106-112) --------------------------
@register(
    "s3_pending_exists",
    oracle="""
    SELECT count(*) > 0 AS has_pending
    FROM (SELECT 1 FROM orders WHERE o_orderstatus = 'P' LIMIT 1) t
    """,
)
def s3_pending_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _orders(spark, sf_dir)
    return (
        orders.filter(F.col("o_orderstatus") == "P")
        .limit(1)
        .agg((F.count(F.lit(1)) > 0).alias("has_pending"))
    )


# -- S4: filtered count (sqoop_table.py:54-57) -----------------------------
@register(
    "s4_count_filter",
    oracle="SELECT count(*) AS cnt FROM lineitem WHERE l_returnflag = 'R'",
)
def s4_count_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return R.filtered_count(li, F.col("l_returnflag") == "R")


# -- S5: split boundary query (sqoop_json.py:31) ---------------------------
@register(
    "s5_split_bounds",
    oracle="""
    SELECT CAST(min(o_orderkey) AS BIGINT) AS min_id,
           CAST(8 AS BIGINT) AS max_id
    FROM orders
    """,
)
def s5_split_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.split_bounds(_orders(spark, sf_dir), "o_orderkey", 8)


# -- S6: DISTINCT partition values (sqoop_table.py:145) --------------------
@register(
    "s6_distinct_partitions",
    oracle="SELECT DISTINCT CAST(date_trunc('month', o_orderdate) AS DATE) AS part FROM orders",
)
def s6_distinct_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.distinct_partitions(_orders(spark, sf_dir), _month())


# -- S7: window ranking newest-first (sqoop_table.py:145) ------------------
@register(
    "s7_rank_partitions",
    oracle="""
    SELECT part, CAST(row_number() OVER (ORDER BY part DESC) AS INT) AS rn
    FROM (SELECT DISTINCT CAST(date_trunc('month', o_orderdate) AS DATE) AS part FROM orders) p
    """,
)
def s7_rank_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = R.distinct_partitions(_orders(spark, sf_dir), _month())
    return R.rank_newest_first(parts)


# -- S8: recency skip (sqoop_table.py:137,145) -----------------------------
@register(
    "s8_skip_latest",
    oracle="""
    SELECT part, CAST(rn AS INT) AS rn FROM (
        SELECT part, row_number() OVER (ORDER BY part DESC) AS rn
        FROM (SELECT DISTINCT CAST(date_trunc('month', o_orderdate) AS DATE) AS part FROM orders) p
    ) r WHERE rn > 3
    """,
)
def s8_skip_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = R.distinct_partitions(_orders(spark, sf_dir), _month())
    return R.skip_latest(R.rank_newest_first(parts), 3)


# -- S9: NOT EXISTS anti-join (sqoop_table.py:143,145) ---------------------
@register(
    "s9_anti_join",
    oracle="""
    SELECT c_custkey FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def s9_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = _orders(spark, sf_dir)
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey")


# -- S10: the full nested pipeline (flagship; sqoop_table.py:131-148) ------
@register(
    "s10_pending_pipeline",
    oracle=f"""
    SELECT part FROM (
        SELECT part, row_number() OVER (ORDER BY part DESC) AS rn
        FROM (SELECT DISTINCT CAST(date_trunc('month', o_orderdate) AS DATE) AS part FROM orders) c
    ) a
    WHERE rn > 2
      AND NOT EXISTS (SELECT 1 FROM ({_SEEN_SQL}) s WHERE s.part = a.part)
    """,
)
def s10_pending_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's most complex generated query: enqueue unseen,
    non-recent partitions (S6+S7+S8+S9 nested per S10)."""
    orders = _orders(spark, sf_dir)
    return R.pending_partition_pipeline(
        orders, _month(), _seen_months(orders), skip_latest_n=2
    )


# -- S12: round-robin salting (sqoop_table.py:94-104) ----------------------
@register(
    "s12_salt_round_robin",
    oracle="""
    SELECT CAST(rowId AS INT) AS rowId, count(*) AS cnt FROM (
        SELECT (row_number() OVER (ORDER BY o_orderkey)) % 8 AS rowId FROM orders
    ) t GROUP BY rowId
    """,
)
def s12_salt_round_robin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense variant for oracle parity; the scale path is
    relational.salt_round_robin(dense=False) — tested in pytest."""
    orders = _orders(spark, sf_dir).orderBy("o_orderkey")
    from pyspark.sql import Window

    w = Window.orderBy("o_orderkey")
    salted = orders.withColumn("rowId", (F.row_number().over(w) % 8).cast("int"))
    return salted.groupBy("rowId").agg(F.count(F.lit(1)).alias("cnt"))


# -- S13: projection via reflected column list (sqoop_table.py:114-120) ----
@register(
    "s13_reflected_projection",
    oracle="SELECT o_orderkey, o_custkey, o_orderstatus FROM orders",
)
def s13_reflected_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _orders(spark, sf_dir)
    cols = [c for c in orders.columns if c in ("o_orderkey", "o_custkey", "o_orderstatus")]
    return orders.select(*cols)


# -- S14: UPDATE semantics (sqoop_table.py:59-66) --------------------------
@register(
    "s14_update_semantics",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'O' THEN 'f' ELSE 't' END AS is_complete
    FROM orders
    """,
)
def s14_update_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _orders(spark, sf_dir).select(
        "o_orderkey", F.lit("t").alias("is_complete"), "o_orderstatus"
    )
    updated = R.update_where(
        orders, F.col("o_orderstatus") == "O", {"is_complete": F.lit("f")}
    )
    return updated.select("o_orderkey", "is_complete")


# -- S15: DELETE semantics (sqoop_table.py:68-73) --------------------------
@register(
    "s15_delete_semantics",
    oracle="SELECT o_orderkey, o_orderstatus FROM orders WHERE NOT (o_orderstatus = 'F')",
)
def s15_delete_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _orders(spark, sf_dir).select("o_orderkey", "o_orderstatus")
    return R.delete_where(orders, F.col("o_orderstatus") == "F")


# -- S16: TRUNCATE semantics (sqoop_table.py:87-92) ------------------------
@register(
    "s16_truncate_semantics",
    oracle="SELECT o_orderkey FROM orders WHERE 1 = 0",
)
def s16_truncate_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _orders(spark, sf_dir).select("o_orderkey").filter(F.lit(False))


# -- S17: string concat expr (sqoop_table.py:125) --------------------------
@register(
    "s17_concat_expr",
    oracle="SELECT n_name || ' ' || CAST(n_regionkey AS VARCHAR) AS name_and_region FROM nation",
)
def s17_concat_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    return nation.select(
        F.concat_ws(" ", F.col("n_name"), F.col("n_regionkey").cast("string")).alias(
            "name_and_region"
        )
    )


# -- S18: CAST expr (sqoop_table.py:143) -----------------------------------
@register(
    "s18_cast_expr",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS order_day,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_day_str
    FROM orders
    """,
)
def s18_cast_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _orders(spark, sf_dir)
    return orders.select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("order_day"),
        F.col("o_orderdate").cast("date").cast("string").alias("order_day_str"),
    )


# -- S20: deterministic LIMIT-1 peek (sqoop_table.py:167-175) --------------
@register(
    "s20_peek_one",
    oracle="SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 1",
)
def s20_peek_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.peek_one(_orders(spark, sf_dir), "o_orderkey")


# -- S19: text->columnar format conversion (sqoop_pyhive.py:67-98) ---------
@register(
    "s19_csv_orc_roundtrip",
    oracle="SELECT * FROM lineitem WHERE l_orderkey <= 1000",
)
def s19_csv_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's Hive INSERT-SELECT text->ORC rewrite as one Spark
    job: write CSV staging, read back with explicit schema, write ORC
    with the reference's tuning, return the ORC scan.  Oracle-checked
    since r07: the returned frame is the round-tripped slice itself, and
    the oracle reads the SAME slice straight from the parquet source —
    any value mangled across CSV text formatting/parsing or the ORC hop
    breaks the value hash (the deterministic ``l_orderkey <= 1000``
    slice replaced an unordered ``limit(1000)`` to make the content
    oracle-predictable).  Value parity also asserted in
    tests/test_pipeline.py round-trips."""
    import tempfile

    from ..sources.readers import read_csv_staging
    from ..sources.writers import write_columnar

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") <= 1000
    )
    tmp = tempfile.mkdtemp(prefix="s19_")
    write_columnar(li, f"{tmp}/staging", output_format="csv")
    staged = read_csv_staging(spark, f"{tmp}/staging", li.schema)
    write_columnar(staged, f"{tmp}/orc", output_format="orc")
    return spark.read.orc(f"{tmp}/orc")
