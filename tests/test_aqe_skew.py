"""Scale-evidence test: the engine's session (session.py enables AQE +
skew-join splitting) actually SPLITS a skewed shuffle join at runtime.
At 100 TB a hot key funnels one shuffle partition through one task;
AQE's skew handling is the engine's configured defense (alongside the
explicit relational.py::salted_join for planner-independent salting),
so this asserts the defense really engages rather than trusting the
conf name."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

# thresholds scaled down so a local fixture-sized join trips the same
# machinery a hot key would at cluster scale
_SKEW_CONFS = {
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.shuffle.partitions": "8",
}


def test_aqe_splits_skewed_join(spark):
    old = {k: spark.conf.get(k, None) for k in _SKEW_CONFS}
    for k, v in _SKEW_CONFS.items():
        spark.conf.set(k, v)
    try:
        # 90% of the left side shares key 0; wide payload so the hot
        # partition clears the (scaled-down) skew byte threshold
        left = spark.range(0, 500_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id"))
            .alias("k"),
            F.expr("repeat(uuid(), 4)").alias("x"),
        )
        right = spark.range(0, 50_000).select(
            F.col("id").alias("k"), F.rand(9).alias("y")
        )
        j = left.join(right, on="k").select(
            F.substring("x", 1, 2).alias("s")
        )
        # execute THIS DataFrame's plan so AQE finalizes it (a count()
        # would run a different QueryExecution)
        n = j._jdf.queryExecution().toRdd().count()
        assert n == 455_000  # 450k hot-key matches + 50k tail
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, (
            "AQE did not split the skewed join — session skew-join "
            "config regressed:\n"
            + "\n".join(l for l in plan.splitlines() if "Join" in l)
        )
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_join_auto_spreads_hot_keys(spark):
    """Data-driven salting (relational.salted_join_auto): result equals
    the plain join, and — with broadcast disabled so the shuffle is
    observable — the join's partitioning includes the salt column, so a
    hot key's rows spread over fanout>1 shuffle partitions instead of
    funneling through one task."""
    from vertica_hadoop_integration__spark.operators import relational as R

    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_type", "event_id", "value"
    )
    dim = e.groupBy("event_type").agg(F.avg("value").alias("type_avg"))

    plain = e.join(dim, on="event_type").orderBy("event_id")
    salted = R.salted_join_auto(
        e, dim, on=["event_type"], salt_src=F.col("event_id"),
        rows_per_bucket=128,
    ).orderBy("event_id")
    assert [tuple(r) for r in salted.collect()] == [
        tuple(r) for r in plain.collect()
    ]

    # fanout map: every hot key split proportionally to its frequency
    fan = {
        r["event_type"]: r["_fanout"]
        for r in R.skew_fanout(e, ["event_type"], 128).collect()
    }
    counts = {r["event_type"]: r["cnt"] for r in
              e.groupBy("event_type").agg(F.count("*").alias("cnt")).collect()}
    import math
    for k, c in counts.items():
        if c > 128:
            assert fan[k] == math.ceil(c / 128.0), (k, c, fan[k])

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = R.salted_join_auto(
            e, dim, on=["event_type"], salt_src=F.col("event_id"),
            rows_per_bucket=128,
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        join_lines = [l for l in plan.splitlines()
                      if "SortMergeJoin" in l or "ShuffledHashJoin" in l]
        assert any("_salt" in l and "event_type" in l for l in join_lines), (
            "final join not keyed on (event_type, _salt):\n" + plan
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
