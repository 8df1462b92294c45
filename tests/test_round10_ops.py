"""Round-10 operator semantics: chi-square independence, Kaplan-Meier
survival, Poisson bootstrap, modularity, cross-source duplicate matrix,
RAKE keyphrases — each pinned on hand-built fixtures where the right
answer is computable by eye, plus the invariants the oracle comparison
cannot see (zero cells, censoring, determinism under repartitioning,
degenerate partitions)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F


class TestChi2Independence:
    def _df(self, spark, counts):
        rows = []
        for (r, c), n in counts.items():
            rows += [(r, c)] * n
        return spark.createDataFrame(rows, "r string, c string")

    def test_independent_table_has_zero_statistic(self, spark):
        from vertica_hadoop_integration__spark.operators.profile import (
            chi2_independence,
        )

        df = self._df(
            spark,
            {("a", "A"): 10, ("a", "B"): 10, ("b", "A"): 20, ("b", "B"): 20},
        )
        out = chi2_independence(df, "r", "c").collect()
        assert len(out) == 4
        assert all(abs(row.chi2_contrib) < 1e-12 for row in out)
        assert all(row.n_observed == row.n_expected for row in out)

    def test_perfect_dependence_and_zero_cells(self, spark):
        from vertica_hadoop_integration__spark.operators.profile import (
            chi2_independence,
        )

        # diagonal-only counts: the (a,B)/(b,A) cells are never observed
        # but MUST appear with observed 0 and full expected contribution
        df = self._df(spark, {("a", "A"): 10, ("b", "B"): 10})
        out = {
            (r.r, r.c): (r.n_observed, r.n_expected, r.chi2_contrib)
            for r in chi2_independence(df, "r", "c").collect()
        }
        assert len(out) == 4
        assert out[("a", "B")][0] == 0 and out[("b", "A")][0] == 0
        # chi2 = sum contrib = n = 20 for a perfectly dependent 2x2
        total = sum(v[2] for v in out.values())
        assert total == pytest.approx(20.0, abs=1e-9)


class TestSurvivalKM:
    def _events(self, spark, rows):
        return spark.createDataFrame(
            [
                (i, dt.datetime(2024, 1, 1 + d, 12), u, "click", 0.0)
                for i, (u, d) in enumerate(rows)
            ],
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double",
        )

    def test_censoring_and_product(self, spark):
        from vertica_hadoop_integration__spark.operators.temporal import (
            survival_km,
        )

        # corpus max = day 10.  A: days 0..3 (gap 7 > 2 -> churn, dur 3);
        # B: 0..9 (gap 1 -> censored, dur 9); C: day 0 only (churn, dur 0);
        # D: 2..10 (gap 0 -> censored, dur 8)
        e = self._events(
            spark,
            [(1, 0), (1, 3), (2, 0), (2, 9), (3, 0), (4, 2), (4, 10)],
        )
        out = {
            r.t_days: (r.n_at_risk, r.n_churned, r.survival)
            for r in survival_km(e, horizon_days=2).collect()
        }
        assert set(out) == {0, 3}
        assert out[0] == (4, 1, pytest.approx(0.75))
        assert out[3] == (3, 1, pytest.approx(0.75 * 2 / 3))

    def test_everyone_churning_pins_survival_to_zero(self, spark):
        from vertica_hadoop_integration__spark.operators.temporal import (
            survival_km,
        )

        e = self._events(spark, [(1, 0), (2, 0), (9, 10)])
        # users 1,2 churn at duration 0 (gap 10 > 2); user 9 censored
        out = {
            r.t_days: (r.n_at_risk, r.n_churned, r.survival)
            for r in survival_km(e, horizon_days=2).collect()
        }
        assert out[0][1] == 2
        # one at-risk user survives past 0: S(0) = 1/3
        assert out[0][2] == pytest.approx(1 / 3)


class TestPoissonBootstrap:
    def test_deterministic_and_calibrated(self, spark):
        from vertica_hadoop_integration__spark.operators.profile import (
            poisson_bootstrap_means,
        )

        units = spark.range(0, 400).select(
            F.col("id").alias("k"),
            (F.col("id") % 10).cast("double").alias("x"),
        )
        a = poisson_bootstrap_means(units, "k", "x", replicates=20)
        b = poisson_bootstrap_means(
            units.repartition(7), "k", "x", replicates=20
        )
        ra = sorted((r.replicate, r.n_effective, r.boot_mean) for r in a.collect())
        rb = sorted((r.replicate, r.n_effective, r.boot_mean) for r in b.collect())
        assert ra == rb, "bootstrap must be partitioning-invariant"
        assert len(ra) == 20
        # Poisson(1) weights: effective n near 400, means near 4.5
        for _, ne, bm in ra:
            assert 300 < ne < 500
            assert 3.5 < bm < 5.5


class TestModularity:
    def _tri(self, spark):
        edges = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6)]
        return spark.createDataFrame(edges, "u long, v long")

    def test_two_cliques_perfect_partition(self, spark):
        from vertica_hadoop_integration__spark.operators.graph import (
            modularity,
        )

        labels = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 4)],
            "node long, label long",
        )
        out = {
            r.community: (r.n_nodes, r.internal_w, r.degree_w, r.q_contrib)
            for r in modularity(self._tri(spark), labels).collect()
        }
        # per triangle: in=6 (3 undirected edges, both directions),
        # 2m=12, d=6 -> q = 6/12 - (6/12)^2 = 0.25
        assert out[1] == (3, 6, 6, pytest.approx(0.25))
        assert out[4] == (3, 6, 6, pytest.approx(0.25))

    def test_single_community_scores_zero(self, spark):
        from vertica_hadoop_integration__spark.operators.graph import (
            modularity,
        )

        labels = spark.createDataFrame(
            [(n, 1) for n in range(1, 7)], "node long, label long"
        )
        out = modularity(self._tri(spark), labels).collect()
        assert len(out) == 1
        assert out[0].q_contrib == pytest.approx(0.0)


class TestCrossSourceMatrix:
    def test_pair_counts_closed_form(self, spark):
        from vertica_hadoop_integration__spark.operators.dedup import (
            cross_source_matrix,
        )

        docs = spark.createDataFrame(
            [
                (1, "t1", "X"), (2, "t1", "X"), (3, "t2", "X"),
                (4, "t1", "Y"), (5, "t3", "Y"), (6, "t3", "Z"),
            ],
            "doc_id long, text string, source string",
        )
        out = {
            (r.source_a, r.source_b): (r.n_dup_pairs, r.n_shared_texts)
            for r in cross_source_matrix(docs).collect()
        }
        assert out == {
            ("X", "X"): (1, 1),   # C(2,2) within X on t1
            ("X", "Y"): (2, 1),   # 2*1 across on t1
            ("Y", "Z"): (1, 1),   # 1*1 across on t3
        }


class TestRakeKeywords:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )

    def test_phrase_scores_by_hand(self, spark):
        from vertica_hadoop_integration__spark.operators.text import (
            rake_keywords,
        )

        d = self._docs(spark, ["The quick brown fox jumps over the Lazy-Dog!"])
        out = [
            (r.phrase, r.n_words, r.n_occurrences, r.rake_score)
            for r in rake_keywords(d, top=10).collect()
        ]
        # phrases: "quick brown fox jumps" (each word deg 4, freq 1 ->
        # score 4 -> phrase 16) and "lazy dog" (deg 2 -> phrase 4)
        assert out == [
            ("quick brown fox jumps", 4, 1, 16.0),
            ("lazy dog", 2, 1, 4.0),
        ]

    def test_shared_words_pool_degree_across_phrases(self, spark):
        from vertica_hadoop_integration__spark.operators.text import (
            rake_keywords,
        )

        d = self._docs(spark, ["red apple and red wine"])
        out = {
            r.phrase: (r.n_words, r.n_occurrences, r.rake_score)
            for r in rake_keywords(d, top=10).collect()
        }
        # red: freq 2, deg 4 -> 2; apple/wine: freq 1, deg 2 -> 2
        assert out == {
            "red apple": (2, 1, 4.0),
            "red wine": (2, 1, 4.0),
        }

    def test_duplicate_phrases_count_occurrences_once_scored(self, spark):
        from vertica_hadoop_integration__spark.operators.text import (
            rake_keywords,
        )

        d = self._docs(spark, ["green tea", "green tea"])
        out = [
            (r.phrase, r.n_occurrences, r.rake_score)
            for r in rake_keywords(d, top=10).collect()
        ]
        # each word: freq 2, deg 4 -> score 2; phrase score 4, seen twice
        assert out == [("green tea", 2, 4.0)]


class TestAdamicAdar:
    def test_degree_discounted_score_by_hand(self, spark):
        import math

        from vertica_hadoop_integration__spark.operators.graph import (
            adamic_adar_link_prediction,
        )

        # centers: node 1 (deg 2: 100,101) and node 2 (deg 3: 100,101,102)
        g = spark.createDataFrame(
            [(1, 100), (1, 101), (2, 100), (2, 101), (2, 102)],
            "u long, v long",
        )
        out = {
            (r.a, r.b): (r.n_common, r.adamic_adar)
            for r in adamic_adar_link_prediction(
                g, top=10, min_common=2
            ).collect()
        }
        # the symmetric graph yields two unlinked 2-common pairs:
        # (100,101) via centers {1,2} and (1,2) via centers {100,101}
        assert set(out) == {(100, 101), (1, 2)}
        n, aa = out[(100, 101)]
        assert n == 2
        # rare center (deg 2) outweighs the busier one (deg 3)
        assert aa == pytest.approx(1 / math.log(2) + 1 / math.log(3), rel=1e-12)
        # both mediating leaves of (1,2) have degree 2
        assert out[(1, 2)][1] == pytest.approx(2 / math.log(2), rel=1e-12)

    def test_hub_cap_applies_to_wedges_not_weights(self, spark):
        from vertica_hadoop_integration__spark.operators.graph import (
            adamic_adar_link_prediction,
        )

        # a hub of degree 40 mediating every pair: with cap 5 only the
        # kept-neighbor pairs survive, and each survivor's weight still
        # uses the FULL degree 40
        import math

        edges = [(9, x) for x in range(100, 140)]
        g = spark.createDataFrame(edges, "u long, v long")
        out = adamic_adar_link_prediction(
            g, top=1000, min_common=1, max_degree=5
        ).collect()
        assert 0 < len(out) <= 10  # C(5,2) pairs at most
        for r in out:
            assert r.adamic_adar == pytest.approx(1 / math.log(40), rel=1e-12)


class TestModularitySymmetricFastPath:
    def test_symmetric_fast_path_matches_default(self, spark):
        """r12: the input_symmetric one-pass form (degree off incoming
        message sums, one community aggregate) must equal the default
        three-pass form on a symmetric edge list with complete labels —
        bit-for-bit, since all sums are exact BIGINTs."""
        import random

        from vertica_hadoop_integration__spark.operators.graph import (
            label_propagation,
            modularity,
        )

        rng = random.Random(7)
        und = {(a, b) for a, b in (sorted(rng.sample(range(30), 2))
                                   for _ in range(120))}
        rows = [(a, b, w) for a, b in und for w in (rng.randint(1, 5),)]
        both = [(a, b, w) for a, b, w in rows] + [
            (b, a, w) for a, b, w in rows
        ]
        g = spark.createDataFrame(both, "u long, v long, w long")
        labels = label_propagation(
            g, src="u", dst="v", weight="w", iters=2, input_symmetric=True
        )
        canon = lambda df: sorted(  # noqa: E731
            (r.community, r.n_nodes, r.internal_w, r.degree_w, r.q_contrib)
            for r in df.collect()
        )
        fast = canon(modularity(
            g, labels, src="u", dst="v", weight="w",
            node_col="node", label_col="community", input_symmetric=True,
        ))
        # the default path symmetrizes a one-direction list; feeding it
        # the doubled-weight single-direction rows reproduces the same
        # undirected multigraph the fast path sees
        base = canon(modularity(
            g, labels, src="u", dst="v", weight="w",
            node_col="node", label_col="community", input_symmetric=False,
        ))
        assert fast == base
