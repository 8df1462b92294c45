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
