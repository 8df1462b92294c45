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


def test_write_sorted_produces_disjoint_file_ranges(spark, sf_dir, tmp_path):
    """write_sorted lays out one contiguous key range per file with tight
    row-group stats — verified against the actual parquet footers."""
    import os

    import pyarrow.parquet as pq

    from vertica_hadoop_integration__spark.sources import load_table
    from vertica_hadoop_integration__spark.sources.writers import write_sorted

    orders = load_table(spark, sf_dir, "orders")
    dest = str(tmp_path / "sorted_orders")
    write_sorted(orders, dest, sort_cols=["o_custkey"], num_files=8,
                 output_format="parquet")

    ranges = []
    for name in sorted(os.listdir(dest)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(dest, name)).metadata
        col_idx = md.schema.names.index("o_custkey")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) > 1, "expected multiple output files"
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"file key ranges overlap: ({lo1},{hi1}) vs ({lo2},{hi2})"
    # nothing lost in the layout shuffle
    assert spark.read.parquet(dest).count() == orders.count()


def test_write_zorder_prunes_on_both_dimensions(spark, tmp_path):
    """Z-order layout must keep parquet file min/max stats tight on BOTH
    clustered columns: every file spans a minority of each dimension's
    range, and a small box filter intersects a minority of files — on
    both dimensions at once, which a single-column sort cannot do."""
    import glob

    import pyarrow.parquet as pq

    from vertica_hadoop_integration__spark.sources.writers import write_zorder

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_extendedprice", "l_quantity"
    )
    dest = str(tmp_path / "zo")
    write_zorder(li, dest, ["l_extendedprice", "l_quantity"], num_files=16)

    spans = []  # per file: {col: (min, max)}
    for f in glob.glob(dest + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        per = {}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                st = col.statistics
                lo, hi = per.get(name, (st.min, st.max))
                per[name] = (min(lo, st.min), max(hi, st.max))
        spans.append(per)
    assert len(spans) >= 8

    for col in ("l_extendedprice", "l_quantity"):
        glo = min(s[col][0] for s in spans)
        ghi = max(s[col][1] for s in spans)
        width = ghi - glo
        # every dimension stays clustered: mean file span well under the
        # full range (a random layout gives ~1.0; leading-sort gives ~1.0
        # on the trailing column)
        mean_span = sum(s[col][1] - s[col][0] for s in spans) / len(spans)
        assert mean_span < 0.6 * width, (col, mean_span, width)
        # a 10% box on this column alone intersects a minority of files
        box_lo, box_hi = glo + 0.45 * width, glo + 0.55 * width
        touched = sum(
            1 for s in spans if s[col][1] >= box_lo and s[col][0] <= box_hi
        )
        assert touched <= len(spans) * 0.75, (col, touched, len(spans))

    # 2-D boxes intersect a minority of files ON AVERAGE.  Averaged over
    # several positions, not one: repartitionByRange's sampler is seeded
    # by the RDD id (a session-global counter), so file boundaries shift
    # slightly with session history, and a single box straddling the
    # Morton top-bit seam (the 0.45-0.55 center) can flip a marginal
    # count — the locality PROPERTY is positional-average, and a random
    # (unclustered) layout would put every file in every box (ratio 1.0).
    bounds = {}
    for col in ("l_extendedprice", "l_quantity"):
        glo = min(s[col][0] for s in spans)
        ghi = max(s[col][1] for s in spans)
        bounds[col] = (glo, ghi - glo)
    total = 0
    positions = (0.10, 0.30, 0.45, 0.60, 0.80)
    for p in positions:
        boxes = {
            c: (lo + p * w, lo + (p + 0.10) * w)
            for c, (lo, w) in bounds.items()
        }
        total += sum(
            1
            for s in spans
            if all(
                s[c][1] >= boxes[c][0] and s[c][0] <= boxes[c][1]
                for c in boxes
            )
        )
    mean_touched = total / len(positions)
    assert mean_touched <= 0.45 * len(spans), (mean_touched, len(spans))


def test_write_partitioned_prunes_and_dynamic_overwrite(spark, tmp_path):
    """Hive-style layout: (1) a partition-column predicate shows up as
    PartitionFilters and scans only the matching directory; (2) a
    dynamic overwrite carrying ONE partition leaves the others intact;
    (3) content parity end to end."""
    import os

    from vertica_hadoop_integration__spark.sources.writers import write_partitioned

    e = load_table(spark, "/root/testdata/sf0.01", "events").withColumn(
        "event_date", F.to_date("ts")
    )
    path = str(tmp_path / "events_by_date")
    write_partitioned(e, path, ["event_date"])
    dirs = sorted(d for d in os.listdir(path) if d.startswith("event_date="))
    assert len(dirs) > 1

    r = spark.read.parquet(path)
    day = dirs[0].split("=", 1)[1]
    q = r.filter(F.col("event_date") == day)
    plan = q._sc._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan and "event_date" in plan.split(
        "PartitionFilters", 1
    )[1].split("\n")[0]
    assert q.count() == e.filter(F.col("event_date") == day).count()

    # dynamic overwrite of one partition: double that day's value,
    # every other partition byte-identical
    one = e.filter(F.col("event_date") == day).withColumn(
        "value", F.col("value") * 2
    )
    before_other = (
        spark.read.parquet(path)
        .filter(F.col("event_date") != day)
        .agg(F.sum(F.col("value").cast("decimal(30,6)")).alias("s"))
        .collect()[0]["s"]
    )
    write_partitioned(one, path, ["event_date"])
    after = spark.read.parquet(path)
    assert after.count() == e.count()
    after_other = (
        after.filter(F.col("event_date") != day)
        .agg(F.sum(F.col("value").cast("decimal(30,6)")).alias("s"))
        .collect()[0]["s"]
    )
    assert before_other == after_other
    got_day = (
        after.filter(F.col("event_date") == day)
        .agg(F.sum(F.col("value").cast("decimal(30,6)")).alias("s"))
        .collect()[0]["s"]
    )
    want_day = one.agg(
        F.sum(F.col("value").cast("decimal(30,6)")).alias("s")
    ).collect()[0]["s"]
    assert got_day == want_day
