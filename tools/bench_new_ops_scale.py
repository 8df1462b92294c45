"""Scaling measurement for the round-5 continuation additions: semantic
decontamination, hybrid retrieval, mergeable HLL rollup, logreg training
step. Runs each op at 1x (sf0.1 fixtures) and 10x (id-offset replica
frames built in /tmp on first use), best-of-2 with clearCache between
trials, one JSON line out.

The replicas multiply the CORPUS side only where the op's contract holds
a side fixed (the eval set for decontamination, the query vector for
retrieval) — that is the shape the 100 TB claim is about: corpus grows,
the broadcast side does not.

Usage: python tools/bench_new_ops_scale.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.1"
REP = 10
OFF = 1_000_000


def main() -> None:
    from pyspark.sql import functions as F

    from vertica_hadoop_integration__spark.operators.corpus import (
        semantic_decontaminate,
    )
    from vertica_hadoop_integration__spark.operators.sketches import (
        hll_partial_rollup,
    )
    from vertica_hadoop_integration__spark.operators.similarity import (
        brute_force_topk,
    )
    from vertica_hadoop_integration__spark.operators.text import (
        bm25_search,
        logreg_train_step,
    )
    from vertica_hadoop_integration__spark.session import get_session

    spark = get_session("new-ops-scale")

    def replicate(df, id_cols):
        parts = []
        for k in range(REP):
            p = df
            for c in id_cols:
                p = p.withColumn(c, F.col(c) + F.lit(k * OFF))
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    docs1 = spark.read.parquet(f"{SF}/documents.parquet")
    emb1 = spark.read.parquet(f"{SF}/embeddings.parquet")
    ev1 = spark.read.parquet(f"{SF}/events.parquet")

    # materialize replicas once so the scan cost is comparable to 1x
    paths = {
        "docs10x": "/tmp/scale10_docs",
        "emb10x": "/tmp/scale10_emb",
        "events10x": "/tmp/scale10_events",
    }
    if not os.path.isdir(paths["docs10x"]):
        replicate(docs1, ["doc_id"]).write.mode("overwrite").parquet(
            paths["docs10x"]
        )
    if not os.path.isdir(paths["emb10x"]):
        replicate(emb1, ["vec_id"]).write.mode("overwrite").parquet(
            paths["emb10x"]
        )
    if not os.path.isdir(paths["events10x"]):
        replicate(ev1, ["event_id", "user_id"]).write.mode("overwrite").parquet(
            paths["events10x"]
        )
    docs10 = spark.read.parquet(paths["docs10x"])
    emb10 = spark.read.parquet(paths["emb10x"])
    ev10 = spark.read.parquet(paths["events10x"])

    # eval / query sides stay FIXED as the corpus grows
    def ops_for(docs, emb, ev):
        eval_side = emb.filter((F.col("vec_id") < OFF) & (F.col("vec_id") % 23 == 0))
        corpus_side = emb.filter(~((F.col("vec_id") < OFF) & (F.col("vec_id") % 23 == 0)))
        qv = emb.filter(F.col("vec_id") == 0)
        return {
            "semantic_decontaminate": lambda: semantic_decontaminate(
                corpus_side, eval_side, 0.3
            ).agg(F.count(F.lit(1)), F.sum("cos_sim")),
            "hybrid_lexical_leg": lambda: bm25_search(
                docs, ["data", "scan", "join"], k=50
            ).agg(F.sum("bm25")),
            "hybrid_semantic_leg": lambda: brute_force_topk(emb, qv, k=50).agg(
                F.sum("cos_sim")
            ),
            "hll_rollup": lambda: hll_partial_rollup(
                ev, "user_id", "ts", ("event_type",)
            ).agg(F.sum("distinct_users")),
            "logreg_train_step": lambda: logreg_train_step(docs).agg(
                F.sum("gradient")
            ),
        }

    def run(ops):
        out = {}
        for name, fn in ops.items():
            trials = []
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.monotonic()
                fn().collect()
                trials.append(round(time.monotonic() - t0, 3))
            out[name] = {"best": min(trials), "trials": trials}
        return out

    result = {
        "1x": run(ops_for(docs1, emb1, ev1)),
        "10x": run(ops_for(docs10, emb10, ev10)),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
