"""Round-8 operator tests: one-pass embedding diversity, filtered
vector search, grouped PSI drift, per-source PII density."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_diversity_report_matches_numpy_all_pairs(spark):
    """The sum-of-squares identity must reproduce the naive all-pairs
    mean squared distance exactly (well under float noise), and a
    duplicated class must score ~0 while a spread class scores > 0."""
    import numpy as np

    from vertica_hadoop_integration__spark.operators.similarity import (
        diversity_report,
    )

    rng = np.random.RandomState(7)
    spread = rng.randn(20, 64)
    dup = np.tile(rng.randn(1, 64), (15, 1))
    rows = [
        (i, 0, [float(x) for x in spread[i]]) for i in range(20)
    ] + [
        (100 + i, 1, [float(x) for x in dup[i]]) for i in range(15)
    ] + [(999, 2, [0.0] * 64)]
    emb = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )
    out = {r["label"]: r for r in diversity_report(emb).collect()}

    xs = np.array(
        [[float(np.float32(x)) for x in row] for row in spread]
    )
    n = len(xs)
    want = sum(
        float(np.dot(xs[i] - xs[j], xs[i] - xs[j]))
        for i in range(n)
        for j in range(n)
        if i != j
    ) / (n * (n - 1))
    assert math.isclose(out[0]["mean_pairwise_sq_dist"], want, rel_tol=1e-9)
    assert out[0]["n_vectors"] == 20
    # exact duplicates: identity cancels to ~0 (decimal sums keep it tiny)
    assert abs(out[1]["mean_pairwise_sq_dist"]) < 1e-9
    # singleton: NULL distance, norm still reported
    assert out[2]["mean_pairwise_sq_dist"] is None
    assert out[2]["mean_sq_norm"] == 0.0


def test_ivf_filtered_topk_prefilter_semantics(spark, sf_dir):
    """Every returned neighbor matches the predicate, and with nprobe
    covering ALL centroids the result equals exact brute-force top-k
    over the filtered corpus (prefilter, never filter-after-rank)."""
    from vertica_hadoop_integration__spark.operators.similarity import (
        brute_force_topk,
        ivf_filtered_topk,
    )
    from vertica_hadoop_integration__spark.sources import load_table

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    n_cents = e.filter(F.col("vec_id") % 50 == 0).count()

    got = ivf_filtered_topk(
        e, q, F.col("label") == 3, k=5, every_nth=50, nprobe=n_cents
    )
    labels = {
        r["label"]
        for r in got.join(
            e.select(F.col("vec_id").alias("neighbor_id"), "label"),
            on="neighbor_id",
        ).collect()
    }
    assert labels == {3}

    want = brute_force_topk(e.filter(F.col("label") == 3), q, k=5)
    g = {(r.query_id, r.rank): r.neighbor_id for r in got.collect()}
    w = {(r.query_id, r.rank): r.neighbor_id for r in want.collect()}
    # queries may themselves carry label 3: brute_force excludes self
    # matches the same way the IVF path does, so rankings must agree
    assert g == w


def test_distribution_drift_by_group_localizes_segment_shift(spark):
    """A mean shift confined to ONE segment must alarm that segment's
    PSI and leave the stable segment near zero — the dilution case the
    global monitor misses."""
    from vertica_hadoop_integration__spark.operators.profile import (
        distribution_drift_by_group,
    )

    base = spark.range(0, 4000).select(
        F.when(F.col("id") % 2 == 0, "A").otherwise("B").alias("g"),
        (F.col("id") % 100).cast("double").alias("v"),
    )
    shifted = spark.range(0, 4000).select(
        F.when(F.col("id") % 2 == 0, "A").otherwise("B").alias("g"),
        F.when(
            F.col("id") % 2 == 0, (F.col("id") % 100) + 80
        ).otherwise(F.col("id") % 100).cast("double").alias("v"),
    )
    out = distribution_drift_by_group(base, shifted, "v", "g").collect()
    psi = {}
    for r in out:
        psi[r["g"]] = psi.get(r["g"], 0.0) + r["psi_term"]
    assert psi["A"] > 0.2
    assert psi["B"] < 0.01
    # bins partition each segment completely, NULL bin present
    bins = {(r["g"], r["bin"]) for r in out}
    assert bins == {(g, b) for g in ("A", "B") for b in range(-1, 10)}
    n_cur = sum(r["n_cur"] for r in out)
    assert n_cur == 4000


def test_pii_density_counts_planted_leaks_per_source(spark):
    from vertica_hadoop_integration__spark.operators.text import pii_density

    docs = spark.createDataFrame(
        [
            (1, "contact bob@example.com or sue@test.org now", "feedA"),
            (2, "call +1 (555) 123-4567 today", "feedA"),
            (3, "server at 10.0.0.1 and 192.168.1.254", "feedB"),
            (4, "clean text with no pii at all", "feedB"),
            (5, "x", "feedC"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in pii_density(docs).collect()}
    assert out["feedA"]["n_emails"] == 2
    assert out["feedA"]["n_phones"] == 1
    assert out["feedA"]["n_ips"] == 0
    assert out["feedB"]["n_ips"] == 2
    assert out["feedB"]["n_emails"] == 0
    assert out["feedC"]["pii_per_kchar"] == 0.0
    a = out["feedA"]
    assert a["pii_per_kchar"] == (3 * 1000.0) / a["n_chars"]
    assert a["n_docs"] == 2


def test_hll_sliding_matches_single_window_estimates(spark):
    """Each sliding window's estimate must equal the plain portable-HLL
    estimate computed directly over that window's rows (register
    max-merge == recompute), and track true distincts within the
    published error band."""
    from vertica_hadoop_integration__spark.operators.sketches import (
        hll_distinct_portable,
        hll_sliding_distinct,
    )

    rows = []
    uid = 0
    for day in range(1, 15):
        for _ in range(200):
            # churning population: ~50% carryover between days
            rows.append((f"2024-03-{day:02d} 10:00:00", uid % 300 + day * 37))
            uid += 1
    ev = spark.createDataFrame(rows, "ts_s string, user_id long").select(
        F.col("ts_s").cast("timestamp").alias("ts"), "user_id"
    )
    got = {
        str(r["window_end"]): r["distinct_est"]
        for r in hll_sliding_distinct(ev, "user_id", window_days=7).collect()
    }
    assert len(got) == 14  # one row per day present
    for day in (7, 10, 14):
        lo = max(1, day - 6)
        window = ev.filter(
            (F.dayofmonth("ts") >= lo) & (F.dayofmonth("ts") <= day)
        )
        (want,) = hll_distinct_portable(window, "user_id").collect()
        key = f"2024-03-{day:02d}"
        assert got[key] == want["distinct_est"]  # merge == recompute
        true = window.select("user_id").distinct().count()
        assert abs(got[key] - true) / true < 0.15  # p=8 error band


def test_quantile_normalize_calibrates_shifted_source(spark):
    """Two sources drawing the same ranks from shifted scales must land
    on the SAME normalized values at matching within-source ranks, and
    the normalized values live on the global value scale."""
    from vertica_hadoop_integration__spark.operators.corpus import (
        quantile_normalize,
    )

    rows = [(i, "lo", float(i)) for i in range(100)] + [
        (1000 + i, "hi", 1000.0 + i) for i in range(100)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, v double")
    out = quantile_normalize(docs, "v", "source", grid_points=100).collect()
    by = {(r["source"], round(r["pct"], 9)): r["normalized"] for r in out}
    # matching ranks across sources -> identical calibrated scores
    for i in range(100):
        pct = round(i / 99, 9)
        assert by[("lo", pct)] == by[("hi", pct)]
    vals = [r["normalized"] for r in out]
    assert min(vals) >= 0.0 and max(vals) <= 1099.0
    # monotone within each source
    lo_sorted = sorted(
        (r["pct"], r["normalized"]) for r in out if r["source"] == "lo"
    )
    assert all(
        a[1] <= b[1] for a, b in zip(lo_sorted, lo_sorted[1:])
    )


def test_propagate_deletes_scrubs_corpus_and_derived_tables(spark, tmp_path):
    """GDPR delete propagation: tombstoned ids vanish from the corpus
    AND the derived LSH index frames in one audited pass; untouched
    rows survive byte-identical; a second run is a no-op (idempotent)."""
    from vertica_hadoop_integration__spark.operators.dedup import minhash_index
    from vertica_hadoop_integration__spark.sources import load_table
    from vertica_hadoop_integration__spark.sources.maintenance import (
        propagate_deletes,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    bands, verify = minhash_index(docs)
    paths = {
        "documents": (str(tmp_path / "docs"), "doc_id"),
        "index_bands": (str(tmp_path / "bands"), "doc_id"),
        "index_verify": (str(tmp_path / "verify"), "doc_id"),
    }
    docs.write.parquet(paths["documents"][0])
    bands.write.parquet(paths["index_bands"][0])
    verify.write.parquet(paths["index_verify"][0])

    tomb = docs.filter(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").alias("id")
    )
    tomb_ids = {r["id"] for r in tomb.collect()}
    report = {
        r["table"]: r for r in propagate_deletes(spark, tomb, paths)
    }
    assert report["documents"]["n_deleted"] == len(tomb_ids)
    assert report["index_bands"]["n_deleted"] > 0
    for name, (path, id_col) in paths.items():
        back = spark.read.parquet(path)
        assert back.filter(F.col(id_col).isin(tomb_ids)).count() == 0
        assert back.count() == report[name]["n_after"]
    # survivors intact in the corpus
    back_docs = spark.read.parquet(paths["documents"][0])
    want = {
        (r["doc_id"], r["text"])
        for r in docs.filter(~F.col("doc_id").isin(tomb_ids)).collect()
    }
    got = {(r["doc_id"], r["text"]) for r in back_docs.collect()}
    assert got == want
    # idempotent: second run deletes nothing
    again = {r["table"]: r for r in propagate_deletes(spark, tomb, paths)}
    assert all(r["n_deleted"] == 0 for r in again.values())


def test_ams_f2_sketch_tracks_exact_second_moment(spark):
    """AMS sign-sum estimator: on a planted frequency profile the
    median-of-16 estimate lands within the sketch's concentration band
    of the exact F2, and the exact side equals the closed form."""
    from vertica_hadoop_integration__spark.operators.sketches import (
        ams_f2_estimate,
    )

    # 50 keys with f=1, 10 with f=10, 1 with f=100:
    # F2 = 50 + 10*100 + 10000 = 11050
    rows = (
        [(i,) for i in range(50)]
        + [(100 + i,) for i in range(10) for _ in range(10)]
        + [(999,)] * 100
    )
    df = spark.createDataFrame(rows, "user_id long")
    (r,) = ams_f2_estimate(df, "user_id").collect()
    assert r["f2_exact"] == 11050
    assert abs(r["rel_error"]) < 1.0  # median-of-16 band on a skewed profile
    # estimate is the median of squared integer sums: non-negative
    assert r["f2_est"] >= 0.0
    # NULL keys are ignored
    withnull = df.unionByName(
        spark.createDataFrame([(None,)], "user_id long")
    )
    (r2,) = ams_f2_estimate(withnull, "user_id").collect()
    assert r2["f2_exact"] == 11050 and r2["f2_est"] == r["f2_est"]


def test_ks_drift_detects_location_shift(spark):
    """A mean-shifted current split must alarm; an identical split must
    not — and NULLs are excluded from the CDFs but counted."""
    from vertica_hadoop_integration__spark.operators.profile import ks_drift

    ref = spark.range(0, 2000).select(
        (F.col("id") % 100).cast("double").alias("v")
    )
    shifted = spark.range(0, 2000).select(
        ((F.col("id") % 100) + 30.0).alias("v")
    )
    row = ks_drift(ref, shifted, "v", num_bins=20).collect()[0]
    assert row["alarm"] is True
    assert row["ks_stat"] > 0.25  # 30/100 shift => KS ~ 0.3
    assert row["n_ref"] == 2000 and row["n_cur"] == 2000

    same = ks_drift(ref, ref, "v", num_bins=20).collect()[0]
    assert same["ks_stat"] == 0.0 and same["alarm"] is False

    with_nulls = shifted.unionByName(
        spark.range(0, 500).select(F.lit(None).cast("double").alias("v"))
    )
    nn = ks_drift(ref, with_nulls, "v", num_bins=20).collect()[0]
    assert nn["n_null_cur"] == 500 and nn["n_cur"] == 2000
    # NULLs excluded: statistic identical to the null-free run
    assert nn["ks_stat"] == row["ks_stat"]


def test_k_anonymity_flags_small_and_uniform_groups(spark):
    from vertica_hadoop_integration__spark.operators.profile import (
        k_anonymity,
    )

    rows = (
        # group (1, 'x'): 5 members, 5 distinct sensitive values -> safe
        [(1, "x", float(i)) for i in range(5)]
        # group (2, 'y'): 2 members -> fails k=5
        + [(2, "y", 1.0), (2, "y", 2.0)]
        # group (3, 'z'): 6 members but ONE sensitive value -> fails l=2
        + [(3, "z", 7.0)] * 6
    )
    df = spark.createDataFrame(rows, ["qa", "qb", "s"])
    out = {
        (r["qa"], r["qb"]): (r["group_size"], r["n_distinct_sensitive"])
        for r in k_anonymity(
            df, ["qa", "qb"], k=5, sensitive_col="s", l_diversity=2
        ).collect()
    }
    assert out == {(2, "y"): (2, 2), (3, "z"): (6, 1)}
    # without the sensitive audit, only the small group is at risk
    only_k = k_anonymity(df, ["qa", "qb"], k=5).collect()
    assert [(r["qa"], r["qb"]) for r in only_k] == [(2, "y")]


def test_ab_test_known_value(spark):
    """z-score matches the closed form on a hand-computed example, and a
    degenerate pool (everyone converts) yields NULL instead of a
    division blow-up."""
    import math

    from vertica_hadoop_integration__spark.operators.profile import (
        ab_test_proportions,
    )

    # control: 100 units, 20 conversions; treatment: 100 units, 35
    rows = [("A", 1)] * 20 + [("A", 0)] * 80 + [("B", 1)] * 35 + [("B", 0)] * 65
    df = spark.createDataFrame(rows, ["variant", "converted"])
    r = ab_test_proportions(df, "variant", "converted").collect()[0]
    pp = 55 / 200
    se = math.sqrt(pp * (1 - pp) * (1 / 100 + 1 / 100))
    assert abs(r["z_score"] - (0.35 - 0.20) / se) < 1e-12
    assert r["significant"] is True and abs(r["lift"] - 0.15) < 1e-12

    allconv = spark.createDataFrame(
        [("A", 1)] * 10 + [("B", 1)] * 10, ["variant", "converted"]
    )
    d = ab_test_proportions(allconv, "variant", "converted").collect()[0]
    assert d["z_score"] is None and d["significant"] is None


def test_mmr_rerank_skips_redundant_candidate(spark):
    """With a planted near-duplicate of the top candidate, pure top-k
    keeps both at ranks 1-2; MMR must demote the duplicate in favor of
    a diverse (less relevant but non-redundant) candidate."""
    from vertica_hadoop_integration__spark.operators.similarity import (
        brute_force_topk,
        mmr_rerank,
    )

    # query 100 at origin direction [1, 0, 0, 0]; candidates:
    #  1: [1, .01, 0, 0]   best match
    #  2: [1, .011, 0, 0]  near-duplicate of 1 (sim ~1 with it)
    #  3: [.8, .6, 0, 0]   diverse, lower relevance
    #  4: [.7, 0, .7, 0]   diverse, lower still
    rows = [
        (100, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.01, 0.0, 0.0]),
        (2, [1.0, 0.011, 0.0, 0.0]),
        (3, [0.8, 0.6, 0.0, 0.0]),
        (4, [0.7, 0.0, 0.7, 0.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = df.filter(F.col("vec_id") == 100)
    corpus = df.filter(F.col("vec_id") != 100)

    plain = brute_force_topk(corpus, q, k=2)
    assert [r["neighbor_id"] for r in plain.orderBy("rank").collect()] == [1, 2]

    mmr = mmr_rerank(corpus, q, k_final=3, shortlist=4, lam=0.5,
                     one_minus_lam=0.5)
    got = [r["neighbor_id"] for r in mmr.orderBy("rank").collect()]
    # step 1: relevance wins (1); step 2: the near-duplicate 2 scores
    # ~0.5*(rel - sim_to_1) ~ 0 while the orthogonal-ish 4 scores
    # positive, so 4 jumps the queue; step 3: 2 (tiny negative) beats 3
    # (whose max-sim to 1 exceeds its relevance by more)
    assert got == [1, 4, 2]
    sel = mmr.collect()
    assert {r["rank"] for r in sel} == {1, 2, 3}
    assert all(r["relevance"] is not None for r in sel)


def test_dp_histogram_deterministic_and_calibrated(spark):
    """Same seed => identical release; different seed => different
    noise; mean |noise| over many groups ~ 1/epsilon (Laplace b)."""
    from vertica_hadoop_integration__spark.operators.profile import (
        dp_histogram,
    )

    df = spark.range(0, 5000).select(
        (F.col("id") % 200).cast("string").alias("g")
    )
    r1 = {r["g"]: r["noisy_count"] for r in dp_histogram(df, "g", seed=8).collect()}
    r2 = {r["g"]: r["noisy_count"] for r in dp_histogram(df, "g", seed=8).collect()}
    r3 = {r["g"]: r["noisy_count"] for r in dp_histogram(df, "g", seed=9).collect()}
    assert r1 == r2
    assert r1 != r3
    errs = [r["abs_error"] for r in dp_histogram(df, "g", epsilon=1.0).collect()]
    mean_err = sum(errs) / len(errs)
    assert 0.5 < mean_err < 2.0  # E|Laplace(1)| = 1, 200 draws
    # epsilon scales the noise inversely
    errs_tight = [
        r["abs_error"] for r in dp_histogram(df, "g", epsilon=10.0).collect()
    ]
    assert sum(errs_tight) / len(errs_tight) < mean_err / 5


def test_benford_digit_extraction_and_separation(spark):
    from vertica_hadoop_integration__spark.operators.profile import (
        benford_report,
    )

    planted = spark.createDataFrame(
        [(123.4,), (0.0567,), (9999.0,), (1.0,), (-50.0,), (0.0,)], ["v"]
    )
    rows = benford_report(planted, "v").collect()
    got = {r["digit"]: r["n"] for r in rows}
    # negatives and zero excluded; digits 1 (123.4, 1.0), 5 (0.0567), 9
    assert got == {1: 2, 5: 1, 9: 1}

    # log-uniform sample conforms (small chi2); uniform digits don't
    import math

    conforming = spark.range(0, 9000).select(
        F.pow(F.lit(10.0), F.col("id").cast("double") / 3000.0).alias("v")
    )
    chi_conf = (
        benford_report(conforming, "v")
        .agg(F.sum("chi2_term").alias("c"))
        .collect()[0]["c"]
    )
    uniform = spark.range(0, 9000).select(
        ((F.col("id") % 9) + 1).cast("double").alias("v")
    )
    chi_unif = (
        benford_report(uniform, "v")
        .agg(F.sum("chi2_term").alias("c"))
        .collect()[0]["c"]
    )
    assert chi_conf < 20.0          # ~8-dof null: 15.5 at alpha .05
    assert chi_unif > 100.0 * chi_conf


def test_label_propagation_splits_bridged_cliques(spark):
    """Two 4-cliques joined by ONE bridge edge: connected components
    merges them into one component; LPA keeps two communities (the
    bridge weight cannot outvote three intra-clique neighbors)."""
    from vertica_hadoop_integration__spark.operators.graph import (
        connected_components,
        label_propagation,
    )

    def clique(ids):
        return [(a, b) for a in ids for b in ids if a < b]

    edges = clique([1, 2, 3, 4]) + clique([10, 11, 12, 13]) + [(4, 10)]
    df = spark.createDataFrame(edges, ["doc_id_a", "doc_id_b"])

    cc = {r["component"] for r in connected_components(df).collect()}
    assert cc == {1}

    lpa = {
        r["node"]: r["community"]
        for r in label_propagation(df, iters=3).collect()
    }
    assert len({lpa[n] for n in (1, 2, 3)}) == 1
    assert len({lpa[n] for n in (11, 12, 13)}) == 1
    assert lpa[1] != lpa[11]
    # determinism: a second run is identical
    again = {
        r["node"]: r["community"]
        for r in label_propagation(df, iters=3).collect()
    }
    assert again == lpa


def test_sq8_rerank_recall_and_exact_stage2(spark, sf_dir):
    """SQ8 at 64 dims loses little: recall@5 vs exact brute force must
    be high, and stage-2 scores must equal the exact normalize-then-dot
    cosine for the pairs it returns (bitwise)."""
    from vertica_hadoop_integration__spark.operators.similarity import (
        brute_force_topk,
        sq8_rerank_topk,
    )
    from vertica_hadoop_integration__spark.sources import load_table

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    got = sq8_rerank_topk(e, q, k=5, shortlist=20).collect()
    want = brute_force_topk(e, q, k=5).collect()
    g = {(r["query_id"], r["neighbor_id"]) for r in got}
    w = {(r["query_id"], r["neighbor_id"]) for r in want}
    recall = len(g & w) / len(w)
    assert recall >= 0.8, f"SQ8 recall@5 {recall}"
    # stage-2 exactness: for pairs both paths return, cosine values agree
    # to float noise of the two conventions (dot/(na*nb) vs unit-dot)
    gm = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in got}
    wm = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in want}
    for key in g & w:
        assert abs(gm[key] - wm[key]) < 1e-12


def test_neyman_sample_allocates_by_variance(spark):
    """A large constant stratum gets ZERO allocation; the budget goes
    to the high-variance strata proportional to N_h * S_h; per-stratum
    counts match the closed form; reruns are identical."""
    import math as _m

    from vertica_hadoop_integration__spark.operators.corpus import (
        neyman_sample,
    )

    rows = (
        [(i, "wild", float(i * 13 % 1000)) for i in range(100)]
        + [(1000 + i, "flat", 5.0) for i in range(1000)]
        + [(5000 + i, "mid", float(i % 50)) for i in range(200)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, v double")
    out = neyman_sample(df, "source", "v", budget=60).collect()
    got = {}
    for r in out:
        got[r["source"]] = got.get(r["source"], 0) + 1
    assert "flat" not in got  # zero variance -> zero allocation

    # closed form on driver
    import statistics

    def nh_sh(vals):
        return len(vals) * statistics.stdev(vals)

    wild = [i * 13 % 1000 for i in range(100)]
    mid = [i % 50 for i in range(200)]
    tot = nh_sh(wild) + nh_sh(mid)
    want_wild = min(100, _m.floor(60 * nh_sh(wild) / tot + 0.5))
    want_mid = min(200, _m.floor(60 * nh_sh(mid) / tot + 0.5))
    assert got == {"wild": want_wild, "mid": want_mid}

    again = {}
    for r in neyman_sample(df, "source", "v", budget=60).collect():
        again[r["source"]] = again.get(r["source"], 0) + 1
    assert again == got


def test_mmr_ivf_candidates_match_brute_force_at_full_probe(spark, sf_dir):
    """With nprobe covering every centroid the IVF candidate set equals
    brute force, so the MMR selections must be identical — pinning that
    the candidates= seam changes WHERE candidates come from, never how
    the greedy selection treats them."""
    from vertica_hadoop_integration__spark.operators.similarity import (
        ivf_topk,
        mmr_rerank,
    )
    from vertica_hadoop_integration__spark.sources import load_table

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 4)
    n_cents = e.filter(F.col("vec_id") % 50 == 0).count()
    cands = ivf_topk(e, q, k=10, every_nth=50, nprobe=n_cents)
    got = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in mmr_rerank(
            e, q, k_final=3, shortlist=10, candidates=cands
        ).collect()
    }
    want = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in mmr_rerank(e, q, k_final=3, shortlist=10).collect()
    }
    assert got == want
