"""Extension relational queries: the absent-category operators from
SURVEY.md §2A (joins, set ops, grouping sets, window frames, rich
aggregates) — all Catalyst built-ins, registered to prove them end-to-end
against the DuckDB oracle.

Float determinism: aggregate arithmetic over double columns is done in
DECIMAL (exact, order-independent) and the result cast to DOUBLE in BOTH
the Spark plan and the oracle SQL, so value hashes match bit-for-bit
regardless of partial-aggregation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import relational as R
from ..sources import load_table
from .registry import register


def _dec(col: str):
    return F.col(col).cast("decimal(18,4)")


# -- TPC-H Q1: pricing summary (wide aggregate surface) --------------------
@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) * (1 + CAST(l_tax AS DECIMAL(18,4)))) AS DOUBLE) AS sum_charge,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS DOUBLE) AS avg_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS DOUBLE) AS avg_price,
           count(*) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    charge = disc * (F.lit(1) + _dec("l_tax"))
    return (
        li.filter(F.col("l_shipdate").cast("date") <= F.lit("2001-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1)))
            .cast("double")
            .alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / F.count(F.lit(1)))
            .cast("double")
            .alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# -- TPC-H Q3-style: 3-way join + agg + top-k ------------------------------
@register(
    "q3_shipping_priority",
    oracle="""
    SELECT o.o_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
           CAST(o.o_orderdate AS DATE) AS order_day
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderstatus <> 'F'
    GROUP BY o.o_orderkey, CAST(o.o_orderdate AS DATE)
    ORDER BY revenue DESC, o_orderkey LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "F")
    l = load_table(spark, sf_dir, "lineitem")
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        # customer side is small relative to the facts -> broadcast
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", F.col("o_orderdate").cast("date").alias("order_day"))
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("o_orderkey", "revenue", "order_day")
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


# -- TPC-H Q5-style: 5-way star join through region/nation -----------------
@register(
    "q5_local_volume",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q5_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


# -- broadcast dim join ----------------------------------------------------
@register(
    "join_broadcast_dim",
    oracle="""
    SELECT n.n_name, count(*) AS num_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_acctbal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("num_customers"),
            F.sum(_dec("c_acctbal")).cast("double").alias("total_acctbal"),
        )
    )


# -- left outer join with null-producing side ------------------------------
@register(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, count(o.o_orderkey) AS num_orders
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("num_orders"))
    )


# -- semi join (EXISTS) ----------------------------------------------------
@register(
    "join_semi",
    oracle="""
    SELECT c_custkey FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, o.o_custkey == c.c_custkey, "left_semi").select("c_custkey")


# -- set operations --------------------------------------------------------
@register(
    "set_union_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionAll(s)


@register(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "set_except",
    oracle="""
    SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS part FROM lineitem
    EXCEPT
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS part FROM orders
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics -> ``subtract``): ship months with no
    order month — non-empty because shipping trails ordering."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.date_trunc("month", F.col("l_shipdate")).cast("date").alias("part")
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("part")
    )
    return li.subtract(o)


# -- grouping sets: ROLLUP / CUBE ------------------------------------------
@register(
    "agg_rollup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt")
    )


@register(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "join_salted_skew",
    oracle="""
    SELECT o.o_orderpriority,
           count(*) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted equi-join: result-identical to the plain join (that is
    what the oracle asserts); physically the left side's hot keys spread
    over `salt` shuffle partitions and the right side is replicated."""
    li = load_table(spark, sf_dir, "lineitem")
    # salted_join equi-joins on shared column names; align the right key
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = R.salted_join(li, o, on=["l_orderkey"], how="inner", salt=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("revenue"),
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets (per-status, per-priority, grand total) —
    one scan, Expand-based like cube/rollup, not three scans unioned.
    DataFrame API has no grouping-sets method; SQL is the idiomatic
    surface."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "window_ranking_suite",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4)     OVER w AS quartile,
           CAST(percent_rank() OVER w AS DOUBLE) AS pct_rank,
           CAST(cume_dist()    OVER w AS DOUBLE) AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_ranking_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function family in one window (rank, dense_rank,
    ntile, percent_rank, cume_dist) — one shuffle on the partition key
    serves all five."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).cast("double").alias("pct_rank"),
        F.cume_dist().over(w).cast("double").alias("cdist"),
    )


@register(
    "scalar_date_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS order_date,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(dayofmonth(o_orderdate) AS INT) AS dom,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
           CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
           datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since
    FROM orders
    """,
)
def scalar_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar family: extract fields, month/week truncation,
    day arithmetic — pure projection, scan-stage execution."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        d.cast("date").alias("order_date"),
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dom"),
        F.quarter(d).alias("qtr"),
        F.last_day(d).alias("month_end"),
        F.date_trunc("week", d).cast("date").alias("week_start"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).alias("days_since"),
    )


@register(
    "agg_variance_stats",
    oracle="""
    WITH s AS (
        SELECT l_returnflag,
               count(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS s1,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS s2
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           (s2 - s1 * s1 / n) / (n - 1) AS var_qty,
           sqrt((s2 - s1 * s1 / n) / (n - 1)) AS stddev_qty
    FROM s
    """,
)
def agg_variance_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance/stddev from exact-decimal power sums — a single
    pass with map-side partials, and hash-identical across engines
    (built-in stddev uses Welford-style accumulation whose float result
    depends on partial order; the power-sum formula does not)."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(18,4)")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).cast("double").alias("s1"),
        F.sum(q * q).cast("double").alias("s2"),
    )
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    return s.select(
        "l_returnflag", "n", var.alias("var_qty"), F.sqrt(var).alias("stddev_qty")
    )


@register(
    "scalar_regexp_functions",
    oracle=r"""
    SELECT doc_id,
           regexp_extract(text, '(\w+)$', 1) AS last_word,
           regexp_replace(text, '\d+', '#', 'g') AS nums_masked,
           CASE WHEN regexp_matches(text, '\d') THEN 1 ELSE 0 END AS has_digit
    FROM documents
    """,
)
def scalar_regexp_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp scalar family: extract / global replace / match test —
    scan-stage projections (Java regex vs DuckDB RE2 agree on this
    pattern class; verified by the oracle hash)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"(\w+)$", 1).alias("last_word"),
        F.regexp_replace("text", r"\d+", "#").alias("nums_masked"),
        F.when(F.col("text").rlike(r"\d"), 1).otherwise(0).alias("has_digit"),
    )


@register(
    "agg_exact_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.5) AS p50,
           quantile_cont(l_extendedprice, 0.9) AS p90,
           quantile_cont(l_extendedprice, 0.99) AS p99
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT interpolated percentiles per group (vs the GK sketch in
    sketch_approx_quantiles): Spark's percentile = DuckDB quantile_cont
    bit-for-bit. Exact percentiles buffer each group's values — the
    sketch is the 100 TB default; this is the verifier."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
        F.expr("percentile(l_extendedprice, 0.9)").alias("p90"),
        F.expr("percentile(l_extendedprice, 0.99)").alias("p99"),
    )


@register(
    "array_functions",
    oracle="""
    SELECT vec_id,
           array_to_string(
               list_transform(list_reverse_sort(list_slice(embedding::DOUBLE[], 1, 4)),
                              x -> CAST(round(x * 1000000) AS BIGINT)),
               ',') AS top4_sorted,
           len(embedding) AS dim,
           list_max(embedding::DOUBLE[]) AS max_dim,
           list_min(embedding::DOUBLE[]) AS min_dim,
           embedding[1]::DOUBLE AS first_dim
    FROM embeddings
    """,
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function family over the embedding column: slice, sort,
    size, extrema, element access — all scan-stage projections.

    The sorted-slice column is serialized to a comma-joined string of
    micro-quantized ints (round(x*1e6)) on BOTH sides: the driver's
    canonicalizer hashes pandas frames and dies on list-typed cells, and
    raw double->string formatting differs between the JVM and DuckDB."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding").cast("array<double>")
    return e.select(
        "vec_id",
        F.array_join(
            F.transform(
                F.sort_array(F.slice(emb, 1, 4), asc=False),
                lambda x: F.round(x * 1000000).cast("long").cast("string"),
            ),
            ",",
        ).alias("top4_sorted"),
        F.size("embedding").alias("dim"),
        F.array_max(emb).alias("max_dim"),
        F.array_min(emb).alias("min_dim"),
        F.element_at(emb, 1).alias("first_dim"),
    )


_PIVOT_STATUSES = ["F", "O", "P"]


@register(
    "pivot_status_revenue",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
           {cols}
    FROM orders
    GROUP BY 1
    """.format(
        cols=", ".join(
            f"CAST(SUM(CASE WHEN o_orderstatus = '{s}' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS rev_{s}"
            for s in _PIVOT_STATUSES
        )
    ),
)
def pivot_status_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: one revenue column per order status, by month. Explicit
    pivot values keep the plan single-pass (no distinct-scan to discover
    them) and the schema stable."""
    o = load_table(spark, sf_dir, "orders")
    piv = (
        o.groupBy(F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"))
        .pivot("o_orderstatus", _PIVOT_STATUSES)
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double"))
    )
    return piv.select(
        "order_month", *[F.col(s).alias(f"rev_{s}") for s in _PIVOT_STATUSES]
    )


@register(
    "unpivot_quality_metrics",
    oracle="""
    SELECT doc_id, 'n_chars' AS metric, CAST(n_chars AS DOUBLE) AS metric_value
    FROM documents
    UNION ALL
    SELECT doc_id, 'n_tokens' AS metric,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE)
    FROM documents
    """,
)
def unpivot_quality_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt: wide per-doc metrics to (doc_id, metric, value)
    rows — single scan via the Expand operator, not one scan per
    metric."""
    d = load_table(spark, sf_dir, "documents")
    wide = d.select(
        "doc_id",
        F.col("n_chars").cast("double").alias("n_chars"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("double").alias("n_tokens"),
    )
    return wide.unpivot(
        ids=["doc_id"],
        values=["n_chars", "n_tokens"],
        variableColumnName="metric",
        valueColumnName="metric_value",
    )


_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"]
_PROFILE_NUM = {"o_orderkey", "o_custkey", "o_totalprice"}
_PROFILE_SQL = " UNION ALL ".join(
    f"""
    SELECT '{c}' AS col_name, count(*) AS n_rows,
           count(*) - count({c}) AS n_nulls,
           count(DISTINCT {c}) AS n_distinct,
           {f'CAST(min({c}) AS DOUBLE)' if c in _PROFILE_NUM else 'CAST(NULL AS DOUBLE)'} AS min_value,
           {f'CAST(max({c}) AS DOUBLE)' if c in _PROFILE_NUM else 'CAST(NULL AS DOUBLE)'} AS max_value
    FROM orders"""
    for c in _PROFILE_COLS
)


@register("profile_orders", oracle=_PROFILE_SQL)
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column stats in one aggregation scan (catalog reflection's
    value-level sibling — D4/D5 adjacent). Oracle recomputes each column
    independently; equality proves the single-pass expansion correct."""
    from ..operators.profile import profile_table

    o = load_table(spark, sf_dir, "orders")
    return profile_table(o, _PROFILE_COLS)


@register(
    "q18_large_volume_customer",
    oracle="""
    WITH big AS (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > 180
    )
    SELECT c.c_name, o.o_orderkey, o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c.c_name, o.o_orderkey, o.o_totalprice
    """,
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered aggregate feeding a left-semi
    join (the IN subquery), then a 3-way join + re-aggregation. The semi
    join's build side is the small post-HAVING key set — broadcast."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 180)
        .select("l_orderkey")
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey, "left_semi")
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_name", "o_orderkey", "o_totalprice")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_qty")
        )
    )


@register(
    "window_moving_avg_range",
    oracle="""
    SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
           CAST(SUM(CAST(value AS DECIMAL(18,4)))
                OVER (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
               AS DOUBLE)
           / COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                            RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
               AS avg_1h
    FROM events
    """,
)
def window_moving_avg_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame (trailing 1 hour per user) — a value-range
    window, not a row-count one: frame bounds follow the ORDER BY value.
    Spark's rangeBetween needs a numeric sort key, so the frame runs on
    epoch MICROseconds (second-granularity unix_timestamp would disagree
    with the oracle's full-precision interval at frame boundaries). The
    average is exact-decimal SUM / COUNT in double — Spark's avg(DECIMAL)
    rounds at scale 8, which drifts ~3e-9 from the oracle's division."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3600 * 1_000_000, 0)
    )
    s = F.sum(F.col("value").cast("decimal(18,4)")).over(w).cast("double")
    return e.select(
        "event_id",
        "user_id",
        "ts",
        (s / F.count(F.lit(1)).over(w)).alias("avg_1h"),
    )


# -- analytic window frame: running total ----------------------------------
@register(
    "window_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_spend
    FROM orders
    """,
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(_dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


# -- lag/lead --------------------------------------------------------------
@register(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           lag(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_order,
           lead(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_order
    FROM orders
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
    )


# -- top-k per group -------------------------------------------------------
@register(
    "topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, CAST(rn AS INT) AS rn FROM (
        SELECT o_custkey, o_orderkey,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) t WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import top_k_per_group

    o = load_table(spark, sf_dir, "orders")
    return top_k_per_group(
        o, ["o_custkey"], [F.desc("o_totalprice"), F.asc("o_orderkey")], 3
    ).select("o_custkey", "o_orderkey", "rn")


# -- exact distinct count + rich stats -------------------------------------
@register(
    "agg_distinct_stats",
    oracle="""
    SELECT count(DISTINCT o_custkey) AS n_customers,
           count(DISTINCT CAST(date_trunc('month', o_orderdate) AS DATE)) AS n_months,
           CAST(min(o_totalprice) AS DOUBLE) AS min_price,
           CAST(max(o_totalprice) AS DOUBLE) AS max_price
    FROM orders
    """,
)
def agg_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct(F.date_trunc("month", F.col("o_orderdate")).cast("date")).alias(
            "n_months"
        ),
        F.min("o_totalprice").cast("double").alias("min_price"),
        F.max("o_totalprice").cast("double").alias("max_price"),
    )


# -- scalar function surface: string/date/math -----------------------------
@register(
    "scalar_functions",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_upper,
           length(p_name) AS name_len,
           substr(p_type, 1, 5) AS type_prefix,
           CAST(round(CAST(p_retailprice AS DECIMAL(18,4)) * 110, 0) / 100 AS DOUBLE) AS price_with_tax,
           abs(p_size - 25) AS size_dist
    FROM part
    """,
)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        (F.round(_dec("p_retailprice") * 110, 0) / 100).cast("double").alias("price_with_tax"),
        F.abs(F.col("p_size") - 25).alias("size_dist"),
    )


# -- correlated scalar subquery (avg filter) -------------------------------
@register(
    "subquery_above_avg",
    oracle="""
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders
    WHERE CAST(o_totalprice AS DECIMAL(18,4)) > (
        SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(38,10)) / count(*) FROM orders
    )
    """,
)
def subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    # exact decimal mean as a scalar broadcast (no driver round-trip at scale:
    # this is a 1-row cross join Catalyst turns into a broadcast)
    avg_df = o.agg(
        (F.sum(_dec("o_totalprice")).cast("decimal(38,10)") / F.count(F.lit(1))).alias(
            "avg_price"
        )
    )
    return (
        o.crossJoin(F.broadcast(avg_df))
        .filter(_dec("o_totalprice") > F.col("avg_price"))
        .select("o_orderkey", F.col("o_totalprice").cast("double").alias("o_totalprice"))
    )


# -- data-quality rule report (single-scan conditional sums) ---------------
@register(
    "dq_rules_orders",
    oracle="""
    WITH w AS (
        SELECT count(*) AS n_rows,
               SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS nonpositive_price,
               SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS bad_status,
               SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS null_custkey,
               SUM(CASE WHEN o_orderdate < DATE '1992-01-01'
                         OR o_orderdate > DATE '1998-12-31' THEN 1 ELSE 0 END) AS date_out_of_range,
               SUM(CASE WHEN length(o_orderpriority) = 0 THEN 1 ELSE 0 END) AS empty_priority
        FROM orders)
    SELECT r.rule, CAST(r.n_violations AS BIGINT) AS n_violations,
           CAST(w.n_rows AS BIGINT) AS n_rows FROM w,
    LATERAL (VALUES ('nonpositive_price', nonpositive_price),
                    ('bad_status', bad_status),
                    ('null_custkey', null_custkey),
                    ('date_out_of_range', date_out_of_range),
                    ('empty_priority', empty_priority)) r(rule, n_violations)
    """,
)
def dq_rules_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt-test-style data-quality gate over orders: five declarative
    violation rules evaluated in ONE aggregation scan (conditional
    sums), reported one row per rule (operators/profile.py::
    dq_rule_report). At 100 TB: one pass, not one per rule; the fixed
    date bounds keep the check deterministic vs the oracle (never
    current_date in an oracle-compared rule)."""
    from ..operators.profile import dq_rule_report

    o = load_table(spark, sf_dir, "orders")
    rules = [
        ("nonpositive_price", F.col("o_totalprice") <= 0),
        ("bad_status", ~F.col("o_orderstatus").isin("O", "F", "P")),
        ("null_custkey", F.col("o_custkey").isNull()),
        (
            "date_out_of_range",
            (F.col("o_orderdate") < F.lit("1992-01-01").cast("date"))
            | (F.col("o_orderdate") > F.lit("1998-12-31").cast("date")),
        ),
        ("empty_priority", F.length("o_orderpriority") == 0),
    ]
    return dq_rule_report(o, rules)


# -- referential-integrity report across the star schema -------------------
@register(
    "dq_referential_integrity",
    oracle="""
    SELECT 'lineitem->orders' AS relationship,
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans,
           (SELECT count(*) FROM lineitem) AS n_child_rows
    UNION ALL
    SELECT 'orders->customer',
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)),
           (SELECT count(*) FROM orders)
    UNION ALL
    SELECT 'customer->nation',
           (SELECT count(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = c.c_nationkey)),
           (SELECT count(*) FROM customer)
    """,
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key orphan report across the star schema: one anti-join
    per relationship, parent side reduced to its distinct key before
    the exchange (operators/profile.py::referential_integrity), results
    unioned into a single constellation report — the load-validation
    step of the reference's Vertica->Hadoop migration
    (sqoop_table.py:55's count-parity check, upgraded to key-level)."""
    from ..operators.profile import referential_integrity

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        referential_integrity(li, o, "l_orderkey", "o_orderkey", "lineitem->orders")
        .unionByName(
            referential_integrity(o, c, "o_custkey", "c_custkey", "orders->customer")
        )
        .unionByName(
            referential_integrity(c, n, "c_nationkey", "n_nationkey", "customer->nation")
        )
    )


# -- CDC changelog apply (max-seq-wins upsert/delete; oracle-exact) --------
@register(
    "cdc_apply_orders",
    oracle="""
    WITH log AS (
        SELECT 'U' AS op, 1 AS seq, o_orderkey,
               o_custkey, o_orderstatus, o_totalprice + 100.0 AS o_totalprice
        FROM orders WHERE o_orderkey % 7 = 0
        UNION ALL
        SELECT 'D', 2, o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 11 = 0
        UNION ALL
        SELECT 'I', 1, o_orderkey + 10000000,
               o_custkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 13 = 0),
    latest AS (
        SELECT * FROM (
            SELECT log.*, row_number() OVER (PARTITION BY o_orderkey
                                             ORDER BY seq DESC) AS rn
            FROM log) WHERE rn = 1),
    survivors AS (
        SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus, o.o_totalprice
        FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM latest l
                          WHERE l.o_orderkey = o.o_orderkey))
    SELECT * FROM survivors
    UNION ALL
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM latest WHERE op <> 'D'
    """,
)
def cdc_apply_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture apply over orders (operators/relational.py::
    cdc_apply): a synthesized changelog updates every 7th key (price
    +100, seq 1), deletes every 11th (seq 2 — so a key divisible by 77
    ends up DELETED, exercising max-seq-wins), and inserts a shifted
    copy of every 13th. The oracle replays frontier reduction,
    deletion, and upsert union row-for-row over the full final state."""
    from ..operators.relational import cdc_apply

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    upd = o.filter(F.col("o_orderkey") % 7 == 0).select(
        F.lit("U").alias("op"), F.lit(1).alias("seq"), "o_orderkey",
        "o_custkey", "o_orderstatus",
        (F.col("o_totalprice") + 100.0).alias("o_totalprice"),
    )
    dele = o.filter(F.col("o_orderkey") % 11 == 0).select(
        F.lit("D").alias("op"), F.lit(2).alias("seq"), "o_orderkey",
        "o_custkey", "o_orderstatus", "o_totalprice",
    )
    ins = o.filter(F.col("o_orderkey") % 13 == 0).select(
        F.lit("I").alias("op"), F.lit(1).alias("seq"),
        (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
        "o_custkey", "o_orderstatus", "o_totalprice",
    )
    log = upd.unionByName(dele).unionByName(ins)
    return cdc_apply(o, log, key_cols=["o_orderkey"])


# -- data-driven skew rebalance: S12's adaptive twin (r06 verdict item) -----
@register(
    "skew_rebalance_report",
    oracle="""
    WITH freq AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1),
    fan AS (
        SELECT event_type,
               CAST(greatest(1, ceil(cnt / 512.0)) AS BIGINT) AS fanout
        FROM freq WHERE cnt > 512),
    salted AS (
        SELECT e.event_type,
               e.event_id % coalesce(f.fanout, 1) AS salt,
               e.value
        FROM events e LEFT JOIN fan f USING (event_type))
    SELECT event_type, CAST(salt AS BIGINT) AS salt,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM salted GROUP BY 1, 2
    """,
)
def skew_rebalance_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-driven repartitioning for skewed keys — the adaptive twin of
    the reference's fixed ``sequence % N`` salting (S12,
    create_hcatalog_tables.py:24 rowId round-robin): one counting pass
    observes per-key frequency, hot keys (> rows_per_bucket) get a salt
    fan-out proportional to how hot they are, tail keys pay nothing.
    The report shows the post-rebalance (key, salt) bucket profile — at
    sf0.01 each of the 5 event_types (~2000 rows) splits into
    ceil(2000/512)=4 near-even buckets, bounding any one task's share of
    a hot key at rows_per_bucket regardless of cluster size.  The salt
    (event_id % fanout) is deterministic, so the whole rebalance is
    SQL-replayable.  100 TB: the fanout map is bounded by
    total_rows/rows_per_bucket keys — broadcastable by construction."""
    e = load_table(spark, sf_dir, "events")
    fan = R.skew_fanout(e, ["event_type"], rows_per_bucket=512)
    salted = (
        e.join(F.broadcast(fan), on=["event_type"], how="left")
        .withColumn("_fanout", F.coalesce(F.col("_fanout"), F.lit(1)))
        .withColumn("salt", F.pmod(F.col("event_id"), F.col("_fanout")))
    )
    return salted.groupBy("event_type", "salt").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("sum_value"),
    )


@register(
    "skew_salted_join_events",
    oracle="""
    WITH dim AS (
        SELECT event_type,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   / count(*) AS type_avg
        FROM events GROUP BY 1)
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN e.value > d.type_avg THEN 1 ELSE 0 END)
                AS BIGINT) AS n_above_avg
    FROM events e JOIN dim d USING (event_type)
    GROUP BY 1
    """,
)
def skew_salted_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end salted join on a low-cardinality (hence skewed-by-
    construction) key: 5 event_types mean a plain hash join uses at most
    5 reduce tasks at ANY cluster size.  salted_join_auto splits each
    hot key over ceil(cnt/512) salt buckets (data-driven, one counting
    pass) and replicates the 5-row dimension per-key exactly that wide —
    result-identical to the plain join (this oracle replays the PLAIN
    join; the driver hash-match proves equivalence end-to-end)."""
    e = load_table(spark, sf_dir, "events")
    dim = e.groupBy("event_type").agg(
        (
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("type_avg")
    )
    joined = R.salted_join_auto(
        e.select("event_type", "event_id", "value"),
        dim,
        on=["event_type"],
        salt_src=F.col("event_id"),
        rows_per_bucket=512,
    )
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col("value") > F.col("type_avg"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_above_avg"),
    )


@register(
    "skew_range_rebalance",
    oracle="""
    WITH cuts AS (
        SELECT quantile_cont(value, [0.125, 0.25, 0.375, 0.5,
                                     0.625, 0.75, 0.875]) AS c
        FROM events),
    b AS (
        SELECT CAST(len(list_filter(cuts.c, x -> e.value > x)) AS INT)
                   AS bucket,
               e.value
        FROM events e CROSS JOIN cuts)
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(value) AS DOUBLE) AS min_value,
           CAST(max(value) AS DOUBLE) AS max_value
    FROM b GROUP BY 1
    """,
)
def skew_range_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distributed ntile (r05 verdict item 4): 8 near-even RANGE
    buckets over events.value from exact interpolated percentile cut
    points (bit-identical to DuckDB quantile_cont — verified), assigned
    by counting broadcast cuts below each value.  No global window: the
    classic ntile(8) OVER (ORDER BY value) funnels the whole table
    through ONE task; this is one mergeable aggregate pass + a map-side
    broadcast compare.  The report pins bucket sizes (near-even by
    construction) and value ranges (disjoint, ordered) — the profile a
    range-partitioned write or repartitionByRange layout would produce.
    100 TB: swap exact=False (approx_percentile sketch) — same plan
    shape, bounded memory."""
    e = load_table(spark, sf_dir, "events")
    b = R.range_rebalance(e, "value", num_buckets=8, exact=True)
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("value").cast("double").alias("min_value"),
        F.max("value").cast("double").alias("max_value"),
    )


def _zorder_oracle(cols: tuple[str, str] = ("l_extendedprice", "l_quantity"),
                   bits: int = 16) -> str:
    """SQL replay of sources/writers.py::zorder_stage over lineitem:
    min-max scale both dims to 16-bit ints off the 1-row bounds, Morton
    bit-interleave with the identical shift/mask arithmetic, bucket by
    the z-value's top byte."""
    n = len(cols)
    scale = float((1 << bits) - 1)
    bounds = ", ".join(
        f"CAST(min({c}) AS DOUBLE) AS lo{j}, CAST(max({c}) AS DOUBLE) AS hi{j}"
        for j, c in enumerate(cols)
    )
    scaled = ", ".join(
        f"CAST(floor((CASE WHEN b.hi{j} > b.lo{j} THEN "
        f"(CAST(t.{c} AS DOUBLE) - b.lo{j}) / (b.hi{j} - b.lo{j}) "
        f"ELSE 0.0 END) * {scale!r}) AS BIGINT) AS s{j}"
        for j, c in enumerate(cols)
    )
    terms = " + ".join(
        f"(((s{j} >> {i}) & 1) << {i * n + j})"
        for i in range(bits)
        for j in range(n)
    )
    col_list = ", ".join(f"t.{c}" for c in cols)
    stats = ", ".join(
        f"CAST(min({c}) AS DOUBLE) AS min{j}, CAST(max({c}) AS DOUBLE) AS max{j}"
        for j, c in enumerate(cols)
    )
    return f"""
    WITH b AS (SELECT {bounds} FROM lineitem),
    s AS (SELECT {scaled}, {col_list} FROM lineitem t CROSS JOIN b),
    z AS (SELECT ({terms}) AS zv, {", ".join(cols)} FROM s)
    SELECT CAST(zv >> {2 * bits - 8} AS BIGINT) AS zbucket,
           CAST(count(*) AS BIGINT) AS n_rows, {stats}
    FROM z GROUP BY 1
    """


@register("layout_zorder_profile", oracle=_zorder_oracle())
def layout_zorder_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering profile — the oracle-checked twin of
    the write_zorder sink (sources/writers.py::zorder_stage): lineitem
    keyed by the bit-interleave of min-max-scaled (l_extendedprice,
    l_quantity), bucketed by the z-value's top byte.  Per-bucket min/max
    of BOTH dims are tight simultaneously — the property that makes
    parquet footer stats prunable on every clustered column at once
    (write_sorted is tight on the leading column only); the pruning
    itself is pytest-proven on real files in tests/test_bucketing.py.
    Scale: 1-row bounds broadcast, pure shift/mask codegen expressions,
    one aggregation shuffle — no rank window, no UDF."""
    from ..sources.writers import zorder_stage

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_extendedprice", "l_quantity"
    )
    z = zorder_stage(li, ["l_extendedprice", "l_quantity"], bits=16)
    return (
        z.withColumn("zbucket", F.shiftright(F.col("_z"), 24))
        .groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_extendedprice").cast("double").alias("min0"),
            F.max("l_extendedprice").cast("double").alias("max0"),
            F.min("l_quantity").cast("double").alias("min1"),
            F.max("l_quantity").cast("double").alias("max1"),
        )
    )


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
    """Vertica-sink rehearsal (sources/jdbc.py::write_jdbc_atomic, cited
    to the reference's numLoaders throttle + completion flag-flip):
    staged partitioned write -> transactional swap -> read-back ->
    summarize through a genuine JDBC endpoint (Spark's bundled embedded
    Derby — real driver, real batched inserts, real transactional DDL
    commit, real server-side MOD pushdown).  The summary is computed
    from the READ-BACK frame only, so the oracle (which reads the
    parquet source) certifies the staged round-trip lossless; crash
    injection at both failure points is pytest-driven
    (tests/test_jdbc_live.py)."""
    import tempfile

    from ..sources.jdbc import (
        JdbcSource,
        mod_predicates,
        read_partitioned,
        write_jdbc_atomic,
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
    write_jdbc_atomic(df, src, num_partitions=2)
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


# -- one-pass pairwise correlation profile (oracle-exact) --------------------
def _corr_matrix_oracle(table: str, cols: list[str]) -> str:
    """Mirror of profile.correlation_matrix: DECIMAL(38,6) moment sums,
    double closed-form arithmetic with identical association."""
    aggs = ["count(*) AS n"]
    for c in cols:
        aggs.append(f"SUM(CAST({c} AS DECIMAL(38,6))) AS s_{c}")
        aggs.append(f"SUM(CAST({c}*{c} AS DECIMAL(38,6))) AS ss_{c}")
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            aggs.append(f"SUM(CAST({a}*{b} AS DECIMAL(38,6))) AS sp_{a}_{b}")
    sel = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            nd = "CAST(n AS DOUBLE)"
            sx, sy = f"CAST(s_{a} AS DOUBLE)", f"CAST(s_{b} AS DOUBLE)"
            dx = f"({nd}*CAST(ss_{a} AS DOUBLE) - {sx}*{sx})"
            dy = f"({nd}*CAST(ss_{b} AS DOUBLE) - {sy}*{sy})"
            num = f"({nd}*CAST(sp_{a}_{b} AS DOUBLE) - {sx}*{sy})"
            sel.append(
                f"SELECT '{a}' AS col_x, '{b}' AS col_y,"
                f" CAST(n AS BIGINT) AS n,"
                f" CASE WHEN {dx} <> 0.0 AND {dy} <> 0.0"
                f" THEN {num}/sqrt({dx}*{dy}) END AS corr FROM m"
            )
        u = "\n    UNION ALL ".join(sel)
    return f"WITH m AS (SELECT {', '.join(aggs)} FROM {table})\n    {u}"


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@register(
    "profile_correlation_matrix",
    oracle=_corr_matrix_oracle("lineitem", _CORR_COLS),
)
def profile_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations of the lineitem measures in ONE
    aggregation pass (operators/profile.py::correlation_matrix): all
    moments accumulate map-side into a single 1-row state, the pair
    expansion is a literal explode — no joins, no second scan.  The
    drift/feature-selection profiling step at 100 TB costs one scan."""
    from ..operators.profile import correlation_matrix

    li = load_table(spark, sf_dir, "lineitem")
    return correlation_matrix(li, _CORR_COLS)


# -- small-file compaction round-trip (oracle-exact) --------------------------
@register(
    "layout_compact_roundtrip",
    oracle="""
    SELECT count(*) AS n_rows,
           CAST(sum(l_orderkey) AS BIGINT) AS key_sum,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))) AS DECIMAL(38,2))
               AS price_sum,
           CAST(64 AS INT) AS files_before,
           CAST(1 AS INT) AS files_after
    FROM lineitem WHERE l_orderkey % 5 = 0
    """,
)
def layout_compact_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction round-trip (sources/maintenance.py::
    compact_path, cited to the reference's per-mapper file fanout,
    sqoop_pyhive.py:30-32): fragment a lineitem slice into 64 tiny
    parquet files (the incremental-ingest pathology), compact the
    directory atomically to ~target-size files, and summarize from the
    READ-BACK frame only — count, exact key sum, DECIMAL price sum, so
    the oracle (reading the parquet source) certifies the rewrite
    lossless.  The observed before/after file counts ride along as plan
    literals: 64 by construction, 1 after (slice ≪ target), so a
    compaction that silently stopped merging breaks the hash too."""
    import tempfile

    from ..sources.maintenance import compact_path

    path = tempfile.mkdtemp(prefix="compact_rt_") + "/t"
    sl = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 5 == 0
    )
    sl.repartition(64).write.parquet(path)
    stats = compact_path(spark, path, target_file_bytes=128 * 1024 * 1024)
    back = spark.read.parquet(path)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_orderkey").cast("bigint").alias("key_sum"),
        F.sum(F.col("l_extendedprice").cast("decimal(30,2)"))
        .cast("decimal(38,2)")
        .alias("price_sum"),
        F.lit(int(stats["files_before"])).cast("int").alias("files_before"),
        F.lit(int(stats["files_after"])).cast("int").alias("files_after"),
    )


# -- PSI feature-drift monitor (oracle-exact) ---------------------------------
@register(
    "dq_distribution_drift",
    oracle="""
    WITH ref AS (SELECT o_totalprice AS v FROM orders WHERE o_orderkey % 2 = 0),
    cur AS (SELECT o_totalprice AS v FROM orders WHERE o_orderkey % 2 = 1),
    cuts AS (SELECT quantile_cont(v, [0.1, 0.2, 0.3, 0.4, 0.5,
                                      0.6, 0.7, 0.8, 0.9]) AS c
             FROM ref),
    rb AS (SELECT CASE WHEN r.v IS NULL THEN -1
                  ELSE CAST(len(list_filter(cuts.c, x -> r.v > x)) AS INT)
                  END AS bin
           FROM ref r CROSS JOIN cuts),
    cb AS (SELECT CASE WHEN r.v IS NULL THEN -1
                  ELSE CAST(len(list_filter(cuts.c, x -> r.v > x)) AS INT)
                  END AS bin
           FROM cur r CROSS JOIN cuts),
    rc AS (SELECT bin, count(*) AS n FROM rb GROUP BY 1),
    cc AS (SELECT bin, count(*) AS n FROM cb GROUP BY 1),
    tots AS (SELECT (SELECT count(*) FROM ref) AS tr,
                    (SELECT count(*) FROM cur) AS tc),
    spine AS (SELECT CAST(range AS INT) AS bin FROM range(-1, 10)),
    j AS (SELECT s.bin,
                 COALESCE(rc.n, 0) AS n_ref,
                 COALESCE(cc.n, 0) AS n_cur
          FROM spine s
          LEFT JOIN rc ON rc.bin = s.bin
          LEFT JOIN cc ON cc.bin = s.bin)
    SELECT j.bin, CAST(j.n_ref AS BIGINT) AS n_ref,
           CAST(j.n_cur AS BIGINT) AS n_cur,
           (CAST(j.n_ref AS DOUBLE) + 1.0)
               / (CAST(t.tr AS DOUBLE) + 11.0) AS p_ref,
           (CAST(j.n_cur AS DOUBLE) + 1.0)
               / (CAST(t.tc AS DOUBLE) + 11.0) AS p_cur,
           ((CAST(j.n_cur AS DOUBLE) + 1.0) / (CAST(t.tc AS DOUBLE) + 11.0)
            - (CAST(j.n_ref AS DOUBLE) + 1.0) / (CAST(t.tr AS DOUBLE) + 11.0))
           * ln(((CAST(j.n_cur AS DOUBLE) + 1.0)
                 / (CAST(t.tc AS DOUBLE) + 11.0))
                / ((CAST(j.n_ref AS DOUBLE) + 1.0)
                   / (CAST(t.tr AS DOUBLE) + 11.0))) AS psi_term
    FROM j CROSS JOIN tots t
    """,
)
def dq_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two halves of orders
    (operators/profile.py::distribution_drift): reference-decile bin
    edges (Spark percentile == DuckDB quantile_cont bit-for-bit),
    map-side count-of-cuts-below-value binning, add-one-smoothed
    (q-p)*ln(q/p) terms per bin — sum(psi_term) is the PSI the feature-
    drift monitor alarms on.  Two mergeable aggregate passes + 1-row
    broadcast scalars; no global window; fully oracle-replayed."""
    from ..operators.profile import distribution_drift

    o = load_table(spark, sf_dir, "orders")
    ref = o.filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_totalprice").alias("v")
    )
    cur = o.filter(F.col("o_orderkey") % 2 == 1).select(
        F.col("o_totalprice").alias("v")
    )
    return distribution_drift(ref, cur, "v", num_bins=10)
