"""Sketch estimators: error bounds vs exact answers, and temporal-operator
edge cases not visible to the DuckDB oracle harness."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from vertica_hadoop_integration__spark.operators import sketches as K
from vertica_hadoop_integration__spark.operators import temporal as T
from vertica_hadoop_integration__spark.sources import load_table

SF_DIR = "/root/testdata/sf0.01"


def test_kmv_distinct_within_error(spark):
    o = load_table(spark, SF_DIR, "orders")
    exact = {
        r["o_orderstatus"]: r["n"]
        for r in o.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    est = {
        r["o_orderstatus"]: r["distinct_est"]
        for r in K.kmv_distinct(o, "o_custkey", ("o_orderstatus",), k=64).collect()
    }
    assert est.keys() == exact.keys()
    for k, n in exact.items():
        # rel error ~1/sqrt(k-2) ~ 13%; allow 4 sigma
        assert abs(est[k] - n) / n < 0.5, f"{k}: est {est[k]} vs exact {n}"


def test_kmv_exact_below_k(spark):
    """Groups with < k distinct values must be exact, not estimated."""
    df = spark.createDataFrame([(i % 10,) for i in range(100)], ["v"])
    [row] = K.kmv_distinct(df, "v", (), k=64).collect()
    assert row["distinct_est"] == 10


def test_kmv_ungrouped_equals_single_group(spark):
    """The ungrouped sketch takes its bottom-k via mergeable
    orderBy+limit while grouped sketches use a per-group window; both
    select the same k smallest hashes, so the estimate must be
    IDENTICAL for a constant grouping — guards the two paths from
    drifting (both engines and both hash variants)."""
    o = load_table(spark, SF_DIR, "orders").limit(5000)
    g = o.withColumn("_g", F.lit(1))
    for fn in (K.kmv_distinct, K.kmv_distinct_portable):
        [flat] = fn(o, "o_custkey", (), k=64).collect()
        [grp] = fn(g, "o_custkey", ("_g",), k=64).collect()
        assert flat["distinct_est"] == grp["distinct_est"], fn.__name__


def test_hll_distinct_within_rsd(spark):
    o = load_table(spark, SF_DIR, "orders")
    exact = o.select("o_custkey").distinct().count()
    [row] = K.hll_distinct(o, "o_custkey", (), rsd=0.02).collect()
    assert abs(row["distinct_est"] - exact) / exact < 0.1


def test_approx_quantiles_rank_error(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    [row] = K.approx_quantiles(
        li, "l_extendedprice", (), probabilities=(0.5,), accuracy=10000
    ).collect()
    exact_median = li.selectExpr(
        "percentile(l_extendedprice, 0.5) AS m"
    ).collect()[0]["m"]
    # GK guarantees rank error <= n/accuracy; translate loosely to value space
    assert abs(row["q_0_5"] - exact_median) / exact_median < 0.05


def test_asof_join_no_prior_right_is_null(spark):
    t0 = datetime.datetime(2024, 1, 1)

    def ts(s):
        return t0 + datetime.timedelta(seconds=s)

    left = spark.createDataFrame(
        [(1, ts(5), 100.0), (1, ts(1), 50.0), (2, ts(9), 70.0)],
        ["user_id", "ts", "value"],
    )
    right = spark.createDataFrame(
        [(1, ts(2), 7.0), (1, ts(5), 8.0), (3, ts(0), 9.0)],
        ["user_id", "ts", "value"],
    )
    out = {
        (r["user_id"], r["ts"]): (r["asof_ts"], r["asof_value"])
        for r in T.asof_join(left, right, on="user_id").collect()
    }
    assert out[(1, ts(1))] == (None, None)  # no right row at or before
    assert out[(1, ts(5))] == (ts(5), 8.0)  # same-ts right row visible
    assert out[(2, ts(9))] == (None, None)  # key absent on right
    assert len(out) == 3  # user 3's right row produces no left output


def test_hypertable_rollup_partials_match_direct(spark):
    e = load_table(spark, SF_DIR, "events")
    out = T.hypertable_rollup(e, granularities=("minute", "hour", "day"))
    day = out.filter(F.col("granularity") == "day")
    direct = e.groupBy(
        F.date_trunc("day", F.col("ts")).alias("bucket_start"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    got = {(r["bucket_start"], r["event_type"]): r["n_events"] for r in day.collect()}
    want = {
        (r["bucket_start"], r["event_type"]): r["n_events"] for r in direct.collect()
    }
    assert got == want


def test_refresh_rollup_incremental_matches_full(spark, tmp_path):
    import datetime

    from vertica_hadoop_integration__spark.operators.temporal import refresh_rollup

    e = load_table(spark, SF_DIR, "events")
    path = str(tmp_path / "rollup")
    refresh_rollup(e, path)  # full build
    full = spark.read.parquet(path)

    # perturb one day: drop its 'error' events, refresh ONLY that day
    day = "2024-01-02"
    d0 = datetime.date.fromisoformat(day)
    e2 = e.filter(
        ~((F.to_date("ts") == F.lit(d0)) & (F.col("event_type") == "error"))
    )
    refresh_rollup(e2, path, days=[day])
    incr = spark.read.parquet(path)

    # ground truth: full rebuild from the perturbed events
    path2 = str(tmp_path / "rollup_truth")
    refresh_rollup(e2, path2)
    truth = spark.read.parquet(path2)

    cols = ["granularity", "bucket_start", "event_type", "n_events", "total_value"]
    assert sorted(map(tuple, incr.select(*cols).collect())) == sorted(
        map(tuple, truth.select(*cols).collect())
    )
    # and the untouched days were not rewritten: row count for other days
    # must equal the original build
    other_full = full.filter(F.col("part_day") != F.lit(d0)).count()
    other_incr = incr.filter(F.col("part_day") != F.lit(d0)).count()
    assert other_full == other_incr


def test_kmv_portable_matches_family_bounds(spark):
    """Portable md5-KMV: same estimator contract as the xxhash64 path —
    exact below k, bounded relative error above it."""
    o = load_table(spark, SF_DIR, "orders")
    exact = {
        r["o_orderstatus"]: r["n"]
        for r in o.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    est = {
        r["o_orderstatus"]: r["distinct_est"]
        for r in K.kmv_distinct_portable(
            o, "o_custkey", ("o_orderstatus",), k=64
        ).collect()
    }
    assert est.keys() == exact.keys()
    for k, n in exact.items():
        assert abs(est[k] - n) / n < 0.5, f"{k}: est {est[k]} vs exact {n}"

    small = spark.createDataFrame([(i % 10,) for i in range(100)], ["v"])
    [row] = K.kmv_distinct_portable(small, "v", (), k=64).collect()
    assert row["distinct_est"] == 10.0


# -- count-min sketch ------------------------------------------------------


def test_countmin_never_underestimates(spark):
    """The count-min guarantee: est >= true for every probed value."""
    d = load_table(spark, SF_DIR, "documents")
    from vertica_hadoop_integration__spark.functions.text_fns import tokens

    tok = d.select(F.explode(tokens(F.col("text"))).alias("term"))
    tc = tok.groupBy("term").agg(F.count(F.lit(1)).alias("true_cnt"))
    cells = K.countmin_cells(tok, "term", depth=4, width=1024)
    est = K.countmin_estimate(cells, tc.select("term"), "term", depth=4, width=1024)
    bad = (
        tc.join(est, on="term")
        .filter(F.col("est_cnt") < F.col("true_cnt"))
        .count()
    )
    assert bad == 0


def test_countmin_cells_bounded(spark):
    """Sketch state is capped at depth*width regardless of vocab size."""
    d = load_table(spark, SF_DIR, "documents")
    from vertica_hadoop_integration__spark.functions.text_fns import tokens

    tok = d.select(F.explode(tokens(F.col("text"))).alias("term"))
    cells = K.countmin_cells(tok, "term", depth=4, width=64)
    assert cells.count() <= 4 * 64
    # total mass per seed row equals the stream length
    n = tok.count()
    per_seed = cells.groupBy("seed").agg(F.sum("cell").alias("m")).collect()
    assert len(per_seed) == 4
    assert all(r["m"] == n for r in per_seed)


def test_countmin_tight_for_unique_stream(spark):
    """With distinct values <= width and depth rows, heavy hitters in a
    skewed stream stay close to truth (collisions only add the tail)."""
    rows = [("hot",)] * 500 + [(f"v{i}",) for i in range(50)]
    df = spark.createDataFrame(rows, ["t"])
    cells = K.countmin_cells(df, "t", depth=4, width=1024)
    est = K.countmin_estimate(
        cells, spark.createDataFrame([("hot",)], ["t"]), "t", depth=4, width=1024
    )
    [row] = est.collect()
    assert 500 <= row["est_cnt"] <= 550


def test_kmv_set_ops_discriminates_overlap(spark):
    """The set-ops estimator must see full overlap, partial overlap,
    and disjointness for what they are, with KMV-grade error."""
    from vertica_hadoop_integration__spark.operators.sketches import (
        kmv_set_ops_portable,
    )

    a = spark.range(0, 2000).selectExpr("id AS k")
    b_full = a
    b_half = spark.range(1000, 3000).selectExpr("id AS k")
    b_none = spark.range(5000, 7000).selectExpr("id AS k")

    full = kmv_set_ops_portable(a, "k", b_full, "k", k=64).collect()[0]
    assert full.jaccard_est == 1.0
    assert abs(full.est_intersection - 2000) / 2000 < 0.5

    half = kmv_set_ops_portable(a, "k", b_half, "k", k=64).collect()[0]
    # true J = 1000/3000; KMV jaccard error ~1/sqrt(k)
    assert 0.1 < half.jaccard_est < 0.6, half
    assert 300 < half.est_intersection < 2200, half

    none = kmv_set_ops_portable(a, "k", b_none, "k", k=64).collect()[0]
    assert none.jaccard_est == 0.0 and none.est_intersection == 0.0


def test_hll_partial_rollup_accuracy_and_union_consistency(spark, sf_dir):
    """Day estimates from unioned hour partials stay within HLL error of
    the exact per-day distincts, and equal the estimate of a sketch
    built directly at day grain (union of partials loses nothing)."""
    from pyspark.sql import functions as F

    from vertica_hadoop_integration__spark.operators.sketches import (
        hll_partial_rollup,
    )
    from vertica_hadoop_integration__spark.sources import load_table

    e = load_table(spark, sf_dir, "events")
    got = {
        (r.event_type, str(r.day)): r.distinct_users
        for r in hll_partial_rollup(e, "user_id", "ts", ("event_type",)).collect()
    }
    exact = {
        (r.event_type, str(r.day)): r.n
        for r in e.groupBy(
            "event_type", F.to_date("ts").alias("day")
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for k, n in exact.items():
        # lg_k=12 -> rsd ~1.6%; allow 5x headroom on small counts
        assert abs(got[k] - n) <= max(3, 0.08 * n), (k, got[k], n)

    direct = {
        (r.event_type, str(r.day)): r.est
        for r in e.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.round(
                F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12)))
            )
            .cast("long")
            .alias("est")
        )
        .collect()
    }
    assert got == direct  # hour-partial union == direct day sketch


def test_source_overlap_matrix_discriminates_planted_overlap(spark):
    """Two sources sharing half their documents must estimate a clearly
    higher Jaccard than disjoint-content pairs."""
    from pyspark.sql import functions as F

    from vertica_hadoop_integration__spark.operators.sketches import (
        source_overlap_matrix,
    )

    def doc(src, i, base):
        return (src, " ".join(f"{base}{(i * 13 + j) % 200}" for j in range(60)))

    rows = []
    for i in range(30):
        rows.append(doc("sA", i, "w"))         # sA: w-vocabulary
        rows.append(doc("sB", i, "w") if i < 15 else doc("sB", i, "x"))
        rows.append(doc("sC", i, "z"))         # sC: disjoint vocabulary
    df = spark.createDataFrame(rows, "source string, text string")
    got = {
        (r.source_a, r.source_b): r for r in source_overlap_matrix(df).collect()
    }
    assert set(got) == {("sA", "sB"), ("sA", "sC"), ("sB", "sC")}
    ab = got[("sA", "sB")].jaccard_est
    ac = got[("sA", "sC")].jaccard_est
    bc = got[("sB", "sC")].jaccard_est
    assert ab > 0.2, f"shared-content pair underestimated: {ab}"
    assert ac < 0.05 and bc < 0.05, f"disjoint pairs overestimated: {ac}, {bc}"
    for r in got.values():
        assert r.est_union >= max(r.est_a, r.est_b) - 1e-9
        assert r.est_intersection <= min(r.est_a, r.est_b) * 1.5
