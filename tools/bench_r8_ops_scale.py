"""Round-8 scaling evidence: (a) re-measure the two r07 watch items
after their rework — corpus_ngram_novelty (join-back eliminated) and
dedup_containment_clustered (single-shuffle staging + positional
filter + faster CC rounds) — at 1x vs 10x corpus size; (b) the
streaming loaders' PER-BATCH wall time at 1x vs 10x batch size
(stream_dedup_load, stream_drift_monitor, stream_cdc_apply), the
bounded-state claim the r07 verdict asked to prove empirically
(verdict item 8).

Replica semantics: batch ops replicate documents with id offsets (10
replicas, offset 1M) exactly like the r06/r07 harnesses.  Streaming
ops feed ONE source file per scale (one micro-batch, availableNow) and
time the full start->termination cycle; state/side tables start empty
per run so the measurement is the per-batch cost, not accumulation.

Usage: python tools/bench_r8_ops_scale.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.1"
REP = 10
OFF = 1_000_000


def main() -> None:
    from pyspark.sql import functions as F

    from vertica_hadoop_integration__spark.operators.corpus import ngram_novelty
    from vertica_hadoop_integration__spark.operators.dedup import (
        containment_dedup_clustered,
    )
    from vertica_hadoop_integration__spark.session import get_session
    from vertica_hadoop_integration__spark.sources import load_table
    from vertica_hadoop_integration__spark.streaming.cdc import stream_cdc_apply
    from vertica_hadoop_integration__spark.streaming.dedup import stream_dedup_load
    from vertica_hadoop_integration__spark.streaming.drift import (
        stream_drift_monitor,
    )

    spark = get_session("r8-scale")
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    ev = load_table(spark, SF, "events")

    def replicate(df, id_col):
        out = [df]
        for r in range(1, REP):
            out.append(df.withColumn(id_col, F.col(id_col) + F.lit(r * OFF)))
        u = out[0]
        for d in out[1:]:
            u = u.unionByName(d)
        return u

    def run_batch(fn, trials=2):
        ts = []
        for _ in range(trials):
            spark.catalog.clearCache()
            t0 = time.time()
            fn()
            ts.append(round(time.time() - t0, 3))
        return {"best": min(ts), "trials": ts}

    out: dict = {"batch": {}, "streaming": {}}
    docs10 = replicate(docs, "doc_id")
    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
    emb10 = replicate(emb, "vec_id")
    orders = load_table(spark, SF, "orders")
    orders10 = replicate(orders, "o_orderkey")

    from vertica_hadoop_integration__spark.operators.profile import (
        distribution_drift_by_group,
    )
    from vertica_hadoop_integration__spark.operators.similarity import (
        diversity_report,
        ivf_filtered_topk,
    )
    from vertica_hadoop_integration__spark.operators.text import pii_density

    def _drift_grouped(o):
        ref = o.filter(F.col("o_orderkey") % 2 == 0).select(
            "o_orderpriority", F.col("o_totalprice").alias("v")
        )
        cur = o.filter(F.col("o_orderkey") % 2 == 1).select(
            "o_orderpriority", F.col("o_totalprice").alias("v")
        )
        return distribution_drift_by_group(ref, cur, "v", "o_orderpriority")

    for scale, d, e, o in (
        ("1x", docs, emb, orders),
        ("10x", docs10, emb10, orders10),
    ):
        out["batch"].setdefault("ngram_novelty", {})[scale] = run_batch(
            lambda d=d: ngram_novelty(d).agg(F.sum("n_shared_grams")).collect()
        )
        out["batch"].setdefault("containment_dedup_clustered", {})[scale] = (
            run_batch(
                lambda d=d: containment_dedup_clustered(d)
                .agg(F.count(F.lit(1)))
                .collect()
            )
        )
        # r08 new ops: diversity is one map-side-combined agg; filtered
        # ANN touches ~nprobe/num_centroids of the (grown) corpus;
        # grouped PSI reduces to groups x bins; PII density is one scan
        out["batch"].setdefault("embedding_diversity_report", {})[scale] = (
            run_batch(lambda e=e: diversity_report(e).count())
        )
        out["batch"].setdefault("ann_ivf_filtered_topk", {})[scale] = (
            run_batch(
                lambda e=e: ivf_filtered_topk(
                    e, e.filter(F.col("vec_id") < 5), F.col("label") == 3
                ).count()
            )
        )
        out["batch"].setdefault("drift_by_group", {})[scale] = run_batch(
            lambda o=o: _drift_grouped(o).agg(F.sum("psi_term")).collect()
        )
        out["batch"].setdefault("pii_density", {})[scale] = run_batch(
            lambda d=d: pii_density(d).count()
        )

    # -- streaming: one micro-batch per run, 1x vs 10x batch rows ---------
    work = tempfile.mkdtemp(prefix="r8scale_")

    def timed_stream(tag, start_fn):
        t0 = time.time()
        q = start_fn()
        q.awaitTermination(600)
        return round(time.time() - t0, 3)

    def stream_trials(name, make_src, start_fn, trials=2):
        per_scale = {}
        for scale, rows_df in make_src():
            ts = []
            for t in range(trials):
                root = os.path.join(work, f"{name}_{scale}_{t}")
                os.makedirs(root)
                src = os.path.join(root, "src")
                rows_df.coalesce(1).write.parquet(src)
                ts.append(timed_stream(name, lambda: start_fn(root, src)))
            per_scale[scale] = {"best": min(ts), "trials": ts}
        per_scale["ratio_10x"] = round(
            per_scale["10x"]["best"] / per_scale["1x"]["best"], 2
        )
        return per_scale

    d1 = docs.limit(500)
    d10 = docs10.filter(
        (F.col("doc_id") % OFF) < 500
    )  # 5000 rows, same doc mix replicated

    def dedup_sources():
        yield "1x", d1
        yield "10x", d10

    def dedup_start(root, src):
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return stream_dedup_load(
            stream,
            index_dir=os.path.join(root, "idx"),
            dest_dir=os.path.join(root, "out"),
            ledger_path=os.path.join(root, "led"),
            checkpoint_dir=os.path.join(root, "ckpt"),
        )

    out["streaming"]["stream_dedup_load"] = stream_trials(
        "dedup", dedup_sources, dedup_start
    )

    vals1 = ev.select(F.col("value").alias("v")).limit(20000)
    vals10 = vals1
    for _ in range(REP - 1):
        vals10 = vals10.unionByName(vals1)
    ref = ev.select(F.col("value").alias("v")).limit(20000)

    def drift_sources():
        yield "1x", vals1
        yield "10x", vals10

    def drift_start(root, src):
        stream = (
            spark.readStream.schema("v double")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return stream_drift_monitor(
            stream,
            ref,
            "v",
            out_dir=os.path.join(root, "out"),
            ledger_path=os.path.join(root, "led"),
            checkpoint_dir=os.path.join(root, "ckpt"),
        )

    out["streaming"]["stream_drift_monitor"] = stream_trials(
        "drift", drift_sources, drift_start
    )

    ch1 = spark.range(0, 2000).select(
        F.lit("U").alias("op"),
        F.lit(1).cast("long").alias("seq"),
        F.col("id").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
    )
    ch10 = spark.range(0, 20000).select(
        F.lit("U").alias("op"),
        F.lit(1).cast("long").alias("seq"),
        F.col("id").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
    )

    def cdc_sources():
        yield "1x", ch1
        yield "10x", ch10

    def cdc_start(root, src):
        base_dir = os.path.join(root, "base")
        spark.range(0, 20000).select(
            F.col("id").alias("k"), F.lit("v0").alias("v")
        ).coalesce(1).write.parquet(base_dir)
        stream = (
            spark.readStream.schema("op string, seq bigint, k bigint, v string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return stream_cdc_apply(
            stream,
            base_dir=base_dir,
            ledger_path=os.path.join(root, "led"),
            key_cols=["k"],
            checkpoint_dir=os.path.join(root, "ckpt"),
        )

    out["streaming"]["stream_cdc_apply"] = stream_trials(
        "cdc", cdc_sources, cdc_start
    )

    for name, d in out["batch"].items():
        d["ratio_10x"] = round(d["10x"]["best"] / d["1x"]["best"], 2)

    shutil.rmtree(work, ignore_errors=True)
    with open("/root/repo/reports/scale_new_ops_round8.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
