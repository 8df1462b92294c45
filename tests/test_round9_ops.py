"""Round-9 operator semantics: Markov transitions, last-touch
attribution, temperature mixture, centroid drift, k-core — each pinned
on hand-built fixtures where the right answer is computable by eye, plus
the invariants the oracle comparison cannot see (NULL handling, limit
behavior, degenerate inputs)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _events(spark, rows):
    """(event_id, ts, user_id, event_type, value) rows."""
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1, 0, 0, s), u, t, float(v))
            for i, (s, u, t, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


class TestMarkovTransitions:
    def test_counts_and_probabilities(self, spark):
        from vertica_hadoop_integration__spark.operators.temporal import (
            markov_transitions,
        )

        # user 1: a->b->a->b ; user 2: a->b  => a->b x3, b->a x1
        e = _events(
            spark,
            [(0, 1, "a", 0), (1, 1, "b", 0), (2, 1, "a", 0), (3, 1, "b", 0),
             (0, 2, "a", 0), (1, 2, "b", 0)],
        )
        out = {
            (r.from_type, r.to_type): (r.n_transitions, r.p_transition)
            for r in markov_transitions(e).collect()
        }
        assert out[("a", "b")] == (3, 1.0)
        assert out[("b", "a")][0] == 1
        assert out[("b", "a")][1] == pytest.approx(1.0)

    def test_rows_never_cross_users(self, spark):
        from vertica_hadoop_integration__spark.operators.temporal import (
            markov_transitions,
        )

        # one event per user -> no pairs at all
        e = _events(spark, [(0, 1, "a", 0), (1, 2, "b", 0), (2, 3, "c", 0)])
        assert markov_transitions(e).count() == 0

    def test_probabilities_sum_to_one_per_from(self, spark, sf_dir):
        from vertica_hadoop_integration__spark.operators.temporal import (
            markov_transitions,
        )
        from vertica_hadoop_integration__spark.sources import load_table

        e = load_table(spark, sf_dir, "events")
        sums = (
            markov_transitions(e)
            .groupBy("from_type")
            .agg(F.sum("p_transition").alias("s"))
            .collect()
        )
        assert sums and all(abs(r.s - 1.0) < 1e-9 for r in sums)


class TestAttributionLastTouch:
    def test_last_touch_wins_and_window_gates(self, spark):
        from vertica_hadoop_integration__spark.operators.temporal import (
            attribution_last_touch,
        )

        # user 1: view@1, click@2, purchase@3 -> credited to click (last)
        # user 2: purchase@5 with no preceding touch -> organic (NULL)
        e = _events(
            spark,
            [(1, 1, "view", 0), (2, 1, "click", 0), (3, 1, "purchase", 9),
             (5, 2, "purchase", 4)],
        )
        out = {r.attributed_type: r for r in attribution_last_touch(e).collect()}
        assert out["click"].n_conversions == 1
        assert out["click"].total_value == pytest.approx(9.0)
        assert out[None].n_conversions == 1
        assert out[None].total_value == pytest.approx(4.0)

    def test_stale_touch_outside_window_is_organic(self, spark):
        from vertica_hadoop_integration__spark.operators.temporal import (
            attribution_last_touch,
        )

        e = spark.createDataFrame(
            [
                (1, dt.datetime(2024, 1, 1), 1, "click", 0.0),
                (2, dt.datetime(2024, 1, 20), 1, "purchase", 7.0),
            ],
            "event_id long, ts timestamp, user_id long, event_type string, value double",
        )
        rows = attribution_last_touch(e, window_days=7).collect()
        assert len(rows) == 1 and rows[0].attributed_type is None

    def test_purchases_never_attribute_to_purchases(self, spark):
        from vertica_hadoop_integration__spark.operators.temporal import (
            attribution_last_touch,
        )

        e = _events(
            spark, [(1, 1, "purchase", 1), (2, 1, "purchase", 2)]
        )
        rows = attribution_last_touch(e).collect()
        assert len(rows) == 1 and rows[0].attributed_type is None
        assert rows[0].n_conversions == 2


class TestTemperatureMixture:
    def test_weights_normalize_and_flatten(self, spark):
        from vertica_hadoop_integration__spark.operators.corpus import (
            temperature_mixture,
        )

        d = spark.createDataFrame(
            [(1, "w w w w w w w w w", "big"), (2, "w", "small")],
            "doc_id long, text string, source string",
        )
        out = {r.source: r for r in temperature_mixture(d, temperature=0.5).collect()}
        assert out["big"].n_tokens == 9 and out["small"].n_tokens == 1
        assert out["big"].weight + out["small"].weight == pytest.approx(1.0)
        # T<1 flattens: small source's weight exceeds its raw share
        assert out["small"].weight > out["small"].p_raw
        assert out["big"].weight < out["big"].p_raw

    def test_temperature_one_keeps_natural_shares(self, spark):
        from vertica_hadoop_integration__spark.operators.corpus import (
            temperature_mixture,
        )

        d = spark.createDataFrame(
            [(1, "a b c", "x"), (2, "d e f g h i", "y")],
            "doc_id long, text string, source string",
        )
        for r in temperature_mixture(d, temperature=1.0).collect():
            assert r.weight == pytest.approx(r.p_raw, abs=1e-12)

    def test_effective_epochs_identity(self, spark):
        from vertica_hadoop_integration__spark.operators.corpus import (
            temperature_mixture,
        )

        d = spark.createDataFrame(
            [(1, "a b", "x"), (2, "c d e f", "y")],
            "doc_id long, text string, source string",
        )
        for r in temperature_mixture(d, token_budget=100).collect():
            assert r.effective_epochs == pytest.approx(
                r.weight * 100 / r.n_tokens
            )


class TestCentroidDrift:
    def test_identical_snapshots_have_zero_drift(self, spark):
        from vertica_hadoop_integration__spark.operators.similarity import (
            centroid_drift,
        )

        e = spark.createDataFrame(
            [(i, [float(i % 3 + d) for d in range(4)], i % 2) for i in range(12)],
            "vec_id long, embedding array<double>, label long",
        )
        out = centroid_drift(e, e, dim=4).collect()
        for r in out:
            assert r.centroid_cos == pytest.approx(1.0, abs=1e-12)
            assert r.shift_sq == pytest.approx(0.0, abs=1e-18)
            assert r.n_a == r.n_b

    def test_orthogonal_centroids(self, spark):
        from vertica_hadoop_integration__spark.operators.similarity import (
            centroid_drift,
        )

        a = spark.createDataFrame(
            [(1, [1.0, 0.0], 0)], "vec_id long, embedding array<double>, label long"
        )
        b = spark.createDataFrame(
            [(2, [0.0, 1.0], 0)], "vec_id long, embedding array<double>, label long"
        )
        r = centroid_drift(a, b, dim=2).collect()[0]
        assert r.centroid_cos == pytest.approx(0.0)
        assert r.shift_sq == pytest.approx(2.0)

    def test_one_sided_label_reports_null(self, spark):
        from vertica_hadoop_integration__spark.operators.similarity import (
            centroid_drift,
        )

        a = spark.createDataFrame(
            [(1, [1.0, 0.0], 7)], "vec_id long, embedding array<double>, label long"
        )
        b = spark.createDataFrame(
            [(2, [0.0, 1.0], 8)], "vec_id long, embedding array<double>, label long"
        )
        out = {r.label: r for r in centroid_drift(a, b, dim=2).collect()}
        assert out[7].n_b == 0 and out[7].centroid_cos is None
        assert out[8].n_a == 0 and out[8].shift_sq is None


class TestKcore:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(pairs, "u long, v long")

    def test_triangle_survives_pendant_peeled(self, spark):
        from vertica_hadoop_integration__spark.operators.graph import kcore

        # triangle 1-2-3 plus pendant 4 hanging off 1
        e = self._edges(spark, [(1, 2), (2, 3), (1, 3), (1, 4)])
        out = {r.node: r.degree for r in kcore(e, k=2, rounds=2).collect()}
        assert out == {1: 2, 2: 2, 3: 2}

    def test_chain_fully_peels(self, spark):
        from vertica_hadoop_integration__spark.operators.graph import kcore

        # a path graph has no 2-core; enough rounds peel everything
        e = self._edges(spark, [(1, 2), (2, 3), (3, 4)])
        assert kcore(e, k=2, rounds=3).count() == 0

    def test_rounds_cap_matches_partial_peel(self, spark):
        from vertica_hadoop_integration__spark.operators.graph import kcore

        # 5-chain: round 1 drops ends {1,5}; round 2 drops {2,4};
        # round 3 drops 3 — with rounds=1 the middle still stands
        e = self._edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
        out = {r.node for r in kcore(e, k=2, rounds=1).collect()}
        assert out == {2, 3, 4}


class TestCohortLtv:
    def test_curve_accumulates_and_cohorts_split(self, spark):
        from vertica_hadoop_integration__spark.operators.temporal import (
            cohort_ltv,
        )

        # user 1 first-active week of Jan 1 (Mon), spends 1.0 then 2.0 a
        # week later; user 2 joins the second week, spends 10.0
        e = spark.createDataFrame(
            [
                (1, dt.datetime(2024, 1, 1), 1, "purchase", 1.0),
                (2, dt.datetime(2024, 1, 8), 1, "purchase", 2.0),
                (3, dt.datetime(2024, 1, 9), 2, "purchase", 10.0),
            ],
            "event_id long, ts timestamp, user_id long, event_type string, value double",
        )
        rows = {
            (str(r.cohort_week), r.age_weeks): r
            for r in cohort_ltv(e).collect()
        }
        c1w0 = rows[("2024-01-01", 0)]
        c1w1 = rows[("2024-01-01", 1)]
        c2w0 = rows[("2024-01-08", 0)]
        assert c1w0.cum_value == pytest.approx(1.0)
        assert c1w1.cum_value == pytest.approx(3.0)  # cumulative
        assert c1w1.ltv_per_user == pytest.approx(3.0)  # cohort_size 1
        assert c2w0.cum_value == pytest.approx(10.0)
        assert c1w0.cohort_size == 1 and c2w0.cohort_size == 1
        assert c1w1.n_active == 1


class TestLinkPrediction:
    def test_square_predicts_diagonals(self, spark):
        from vertica_hadoop_integration__spark.operators.graph import (
            jaccard_link_prediction,
        )

        # 4-cycle 1-2-3-4-1: the two diagonals (1,3) and (2,4) each
        # share BOTH neighbors -> jaccard 2/(2+2-2)=1.0; no linked pair
        # may appear
        e = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 1)], "u long, v long"
        )
        out = {(r.a, r.b): r for r in jaccard_link_prediction(e, top=10).collect()}
        assert set(out) == {(1, 3), (2, 4)}
        for r in out.values():
            assert r.n_common == 2 and r.jaccard == pytest.approx(1.0)

    def test_existing_edges_excluded_and_min_common_gates(self, spark):
        from vertica_hadoop_integration__spark.operators.graph import (
            jaccard_link_prediction,
        )

        # triangle + pendant: (1,2),(2,3),(1,3),(3,4); pair (1,4) and
        # (2,4) share only node 3 -> below min_common=2; linked pairs
        # are never candidates
        e = spark.createDataFrame(
            [(1, 2), (2, 3), (1, 3), (3, 4)], "u long, v long"
        )
        assert jaccard_link_prediction(e, top=10, min_common=2).count() == 0
        out = {
            (r.a, r.b)
            for r in jaccard_link_prediction(e, top=10, min_common=1).collect()
        }
        assert (1, 2) not in out and (1, 4) in out and (2, 4) in out


class TestWelchTtest:
    def test_identical_groups_do_not_reject(self, spark):
        from vertica_hadoop_integration__spark.operators.profile import (
            welch_ttest,
        )

        rows = [("A", float(v)) for v in (1, 2, 3, 4, 5)] + [
            ("B", float(v)) for v in (1, 2, 3, 4, 5)
        ]
        d = spark.createDataFrame(rows, "variant string, metric double")
        r = welch_ttest(d, "variant", "metric").collect()[0]
        assert r.t_stat == pytest.approx(0.0)
        assert not r.reject_at_95
        assert r.n_a == 5 and r.n_b == 5

    def test_known_value_vs_scipy_formula(self, spark):
        from vertica_hadoop_integration__spark.operators.profile import (
            welch_ttest,
        )

        a = [1.0, 2.0, 3.0, 4.0]
        b = [10.0, 12.0, 14.0, 16.0]
        rows = [("A", v) for v in a] + [("B", v) for v in b]
        d = spark.createDataFrame(rows, "variant string, metric double")
        r = welch_ttest(d, "variant", "metric").collect()[0]
        # closed-form reference (Welch 1947)
        import statistics

        va, vb = statistics.variance(a), statistics.variance(b)
        sea, seb = va / len(a), vb / len(b)
        t_ref = (statistics.mean(a) - statistics.mean(b)) / (sea + seb) ** 0.5
        df_ref = (sea + seb) ** 2 / (
            sea**2 / (len(a) - 1) + seb**2 / (len(b) - 1)
        )
        assert r.t_stat == pytest.approx(t_ref)
        assert r.df_welch == pytest.approx(df_ref)
        assert r.reject_at_95


class TestMinhashProbePortable:
    def test_planted_cross_boundary_duplicate_found(self, spark):
        from vertica_hadoop_integration__spark.operators.dedup import (
            minhash_probe_portable,
        )

        base = (
            "the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep dark woods tonight"
        )
        corpus = spark.createDataFrame(
            [(1, base), (2, "completely different text about spark engines "
                            "processing terabytes of shuffle data daily")],
            "doc_id long, text string",
        )
        batch = spark.createDataFrame(
            [(10, base + " again"), (11, "unrelated third document about "
                                         "cooking pasta with fresh basil "
                                         "and ripe tomatoes")],
            "doc_id long, text string",
        )
        got = {
            (r.new_id, r.corpus_id): r.jaccard
            for r in minhash_probe_portable(corpus, batch).collect()
        }
        assert (10, 1) in got and got[(10, 1)] > 0.8
        assert all(k[0] != 11 for k in got)

    def test_probe_pairs_match_xxhash_twin_sets(self, spark, sf_dir):
        """Portable and xxhash probes use different hash families, so
        banding may differ per pair — but on the fixture's exact-replica
        batch docs (jaccard 1.0 collides in EVERY band under any
        family), the found (new, corpus) sets must agree."""
        from vertica_hadoop_integration__spark.operators.dedup import (
            minhash_index,
            minhash_probe,
            minhash_probe_portable,
        )
        from vertica_hadoop_integration__spark.sources import load_table

        d = load_table(spark, sf_dir, "documents")
        corpus = d.filter(F.col("doc_id") % 5 != 0)
        batch = d.filter(F.col("doc_id") % 5 == 0)
        portable = {
            (r.new_id, r.corpus_id)
            for r in minhash_probe_portable(
                corpus, batch, min_jaccard=0.99
            ).collect()
        }
        bands_df, verify_df = minhash_index(corpus)
        xx = {
            (r.new_id, r.corpus_id)
            for r in minhash_probe(
                bands_df, verify_df, batch, min_jaccard=0.99
            ).collect()
        }
        assert portable == xx
