"""Bucketed-table layout: the co-located-join path must elide the
shuffle on both sides, and results must match the unbucketed join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vertica_hadoop_integration__spark.sources import load_table
from vertica_hadoop_integration__spark.sources.writers import write_bucketed

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture()
def bucketed_tables(spark):
    o = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    write_bucketed(o, "bt_orders", ["o_orderkey"], num_buckets=8,
                   sort_cols=["o_orderkey"])
    write_bucketed(li, "bt_lineitem", ["l_orderkey"], num_buckets=8,
                   sort_cols=["l_orderkey"])
    yield
    spark.sql("DROP TABLE IF EXISTS bt_orders")
    spark.sql("DROP TABLE IF EXISTS bt_lineitem")


def test_bucketed_join_elides_shuffle_and_matches(spark, bucketed_tables):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bo = spark.table("bt_orders")
        bl = spark.table("bt_lineitem")
        joined = bl.join(bo, bl.l_orderkey == bo.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        # neither join side may shuffle (bucketed scans feed the SMJ
        # directly); the ONLY exchange in the plan is the one feeding the
        # final aggregation on o_orderpriority
        tree = plan.split("\n\n")[0]
        assert "SortMergeJoin" in tree, tree
        assert tree.count("Exchange") == 1, tree

        got = {r["o_orderpriority"]: r["n"] for r in joined.collect()}
        o = load_table(spark, SF_DIR, "orders")
        li = load_table(spark, SF_DIR, "lineitem")
        want = {
            r["o_orderpriority"]: r["n"]
            for r in li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
