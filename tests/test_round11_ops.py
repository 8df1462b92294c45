"""Round-11 regression guards: the opt-in eager-cleanup flag must (a)
change nothing about results and (b) actually release the persisted
frames its True path exists for (the r09 long-lived-ingest-session
motivation), now that the registered batch queries default lazy (r10
VERDICT item 1)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _non_checkpoint_persisted(spark):
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return [
        str(rdd.toString())
        for rdd in jmap.values()
        if "localcheckpoint" not in str(rdd.toString()).lower()
    ]


class TestEagerCleanupOptIn:
    def test_minhash_probe_portable_paths_agree_and_true_releases(
        self, spark, sf_dir
    ):
        from vertica_hadoop_integration__spark.operators.dedup import (
            minhash_probe_portable,
        )
        from vertica_hadoop_integration__spark.sources import load_table

        spark.catalog.clearCache()
        d = load_table(spark, sf_dir, "documents")
        corpus = d.filter(F.col("doc_id") % 5 != 0)
        batch = d.filter(F.col("doc_id") % 5 == 0)
        lazy = {
            (r.new_id, r.corpus_id, round(r.jaccard, 9))
            for r in minhash_probe_portable(corpus, batch).collect()
        }
        spark.catalog.clearCache()
        eager = {
            (r.new_id, r.corpus_id, round(r.jaccard, 9))
            for r in minhash_probe_portable(
                corpus, batch, eager_cleanup=True
            ).collect()
        }
        assert lazy == eager
        # the True path already ran its action and released its frames:
        # no plain persisted RDDs may survive it (localCheckpoint RDDs
        # are the returned data and exempt — the pagerank leak contract)
        assert _non_checkpoint_persisted(spark) == []

    def test_mmr_rerank_paths_agree_and_true_releases(self, spark, sf_dir):
        from vertica_hadoop_integration__spark.operators.similarity import (
            mmr_rerank,
        )
        from vertica_hadoop_integration__spark.sources import load_table

        spark.catalog.clearCache()
        e = load_table(spark, sf_dir, "embeddings")
        q = e.filter(F.col("vec_id") < 5)
        lazy = {
            (r.query_id, r.neighbor_id, r.rank)
            for r in mmr_rerank(e, q, k_final=3, shortlist=10).collect()
        }
        spark.catalog.clearCache()
        eager = {
            (r.query_id, r.neighbor_id, r.rank)
            for r in mmr_rerank(
                e, q, k_final=3, shortlist=10, eager_cleanup=True
            ).collect()
        }
        assert lazy == eager
        assert _non_checkpoint_persisted(spark) == []


class TestMarkovStationary:
    def test_two_state_chain_matches_closed_form(self, spark):
        """A->B w.p. 1, B->A w.p. 0.5, B->B w.p. 0.5 has stationary
        (1/3, 2/3); 8 power iterations from uniform get within 2%."""
        import datetime as dt

        from vertica_hadoop_integration__spark.operators.temporal import (
            markov_stationary,
        )

        rows = []
        eid = 0
        # user 1 path: A B B A B B A ... encodes the chain frequencies
        path = ["A", "B", "B"] * 8
        for i, s in enumerate(path):
            eid += 1
            rows.append((eid, dt.datetime(2024, 1, 1, 0, i), 1, s, 0.0))
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double",
        )
        got = {
            r.event_type: r.p_stationary
            for r in markov_stationary(df, iters=20).collect()
        }
        # empirical chain: from A always to B; from B: half to B, half
        # to A (the path alternates B->B and B->A) — stationary (1/3, 2/3)
        assert abs(got["A"] - 1 / 3) < 0.02
        assert abs(got["B"] - 2 / 3) < 0.02
        assert abs(sum(got.values()) - 1.0) < 1e-9

    def test_absorbing_terminal_state_conserves_mass(self, spark):
        """A type observed only as a final event gets a self-loop: the
        vector still sums to 1 and the absorbing state accumulates."""
        import datetime as dt

        from vertica_hadoop_integration__spark.operators.temporal import (
            markov_stationary,
        )

        df = spark.createDataFrame(
            [
                (1, dt.datetime(2024, 1, 1, 0, 0), 1, "view", 0.0),
                (2, dt.datetime(2024, 1, 1, 0, 1), 1, "buy", 1.0),
            ],
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double",
        )
        got = {
            r.event_type: r.p_stationary
            for r in markov_stationary(df, iters=8).collect()
        }
        assert abs(sum(got.values()) - 1.0) < 1e-9
        assert got["buy"] > 0.99  # all mass absorbed


class TestMannWhitneyBinned:
    def _ref(self, a_vals, b_vals, num_bins=50):
        """Pure-Python reference of the binned statistic (pooled
        quantile_cont cuts, midranks per bin, tie-corrected z)."""
        import math

        pooled = sorted(a_vals + b_vals)
        n = len(pooled)

        def qcont(f):
            h = (n - 1) * f
            lo = int(math.floor(h))
            hi = min(lo + 1, n - 1)
            return pooled[lo] + (h - lo) * (pooled[hi] - pooled[lo])

        cuts = [qcont(i / num_bins) for i in range(1, num_bins)]

        def bin_of(v):
            return sum(1 for c in cuts if v > c)

        from collections import Counter

        ca = Counter(bin_of(v) for v in a_vals)
        cb = Counter(bin_of(v) for v in b_vals)
        bins = sorted(set(ca) | set(cb))
        below, ra, s3 = 0, 0.0, 0
        for b in bins:
            na, nb = ca.get(b, 0), cb.get(b, 0)
            t = na + nb
            mid = below + (t + 1) / 2
            ra += na * mid
            s3 += t**3 - t
            below += t
        na, nb = len(a_vals), len(b_vals)
        ua = ra - na * (na + 1) / 2
        mean_u = na * nb / 2
        var_u = na * nb / 12 * ((na + nb + 1) - s3 / ((na + nb) * (na + nb - 1)))
        z = (ua - mean_u) / math.sqrt(var_u)
        return ua, z

    def test_matches_pure_python_reference(self, spark):
        import random

        from vertica_hadoop_integration__spark.operators.profile import (
            mann_whitney_binned,
        )

        rng = random.Random(11)
        a = [rng.gauss(10, 3) for _ in range(200)]
        b = [rng.gauss(11, 3) for _ in range(150)]
        df = spark.createDataFrame(
            [("A", v) for v in a] + [("B", v) for v in b], "g string, v double"
        )
        row = mann_whitney_binned(df, "g", "v").collect()[0]
        ua, z = self._ref(a, b)
        assert row.n_a == 200 and row.n_b == 150
        assert row.u_a == __import__("pytest").approx(ua, abs=1e-6)
        assert row.z_stat == __import__("pytest").approx(z, rel=1e-9)

    def test_dominant_shift_rejects_with_negative_z(self, spark):
        from vertica_hadoop_integration__spark.operators.profile import (
            mann_whitney_binned,
        )

        df = spark.createDataFrame(
            [("A", float(i)) for i in range(100)]
            + [("B", float(i + 200)) for i in range(100)],
            "g string, v double",
        )
        row = mann_whitney_binned(df, "g", "v").collect()[0]
        # every B beats every A: U_a = 0, z strongly negative
        assert row.u_a == 0.0
        assert row.z_stat < -5
        assert row.reject_at_95


class TestSourceNgramNovelty:
    def test_known_overlap(self, spark):
        from vertica_hadoop_integration__spark.operators.corpus import (
            source_ngram_novelty,
        )

        shared = "alpha beta gamma delta epsilon"
        df = spark.createDataFrame(
            [
                (1, "s1", shared),
                (2, "s1", "zeta eta theta iota kappa"),
                (3, "s2", shared),
            ],
            "doc_id long, source string, text string",
        )
        got = {
            r.source: (
                r.n_distinct_ngrams,
                r.n_shared_ngrams,
                round(r.novelty_frac, 9),
            )
            for r in source_ngram_novelty(df, shingle_n=5).collect()
        }
        # each 5-token doc is exactly one 5-gram
        assert got["s1"] == (2, 1, 0.5)
        assert got["s2"] == (3 - 2, 1, 0.0)
