"""Round-9 scaling evidence (r08 verdict item 8): the ANN serving
stack's corpus-scale paths at 1x / 10x / 100x vectors —

* ``ivf_pq_topk`` — the composed production index (IVF probe cut +
  candidate-only PQ encode since r09), and
* ``mmr_rerank(candidates=ivf_topk(...))`` — the RAG final stage fed by
  the IVF probe (pipeline_mmr_rerank_ivf's shape),

to prove the stored-assignment probe stays sublinear while the query
set stays fixed (the serving shape: corpus grows, concurrent queries
don't).  Replica semantics match the r06-r08 harnesses: vectors
replicate with id offsets (offset 1M), centroid / codebook picks stay
id-deterministic so the index grows with the corpus.

Usage: python tools/bench_r9_ops_scale.py [--with-100x]
Writes reports/scale_new_ops_round9.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.1"
OFF = 1_000_000


def main() -> None:
    from pyspark.sql import functions as F

    from vertica_hadoop_integration__spark.operators.similarity import (
        ivf_pq_topk,
        ivf_topk,
        mmr_rerank,
    )
    from vertica_hadoop_integration__spark.session import get_session

    spark = get_session("r9-scale")
    spark.sparkContext.setLogLevel("ERROR")

    def replicate(df, id_col, rep):
        out = [df]
        for r in range(1, rep):
            out.append(df.withColumn(id_col, F.col(id_col) + F.lit(r * OFF)))
        u = out[0]
        for d in out[1:]:
            u = u.unionByName(d)
        return u

    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
    queries = emb.filter(F.col("vec_id") < 8)

    def ivf_pq(corpus):
        q = emb.filter(F.col("vec_id") < 5)
        return ivf_pq_topk(corpus, q, k=5, every_nth_ivf=50, nprobe=3).count()

    def mmr_ivf(corpus):
        cands = ivf_topk(corpus, queries, k=20, every_nth=50, nprobe=3)
        return mmr_rerank(
            corpus, queries, k_final=5, shortlist=20, candidates=cands
        ).count()

    reps = [1, 10] + ([100] if "--with-100x" in sys.argv else [])
    # checkpoint each replicated corpus once so the measured time is the
    # OPERATOR at rep-x rows, not the union fan-in
    corpora = {
        rep: (emb if rep == 1 else replicate(emb, "vec_id", rep).localCheckpoint())
        for rep in reps
    }
    # INTERLEAVED trials (the r08 harness lesson, ROADMAP r09 item 4):
    # sequential per-scale blocks let one host burst land entirely on one
    # scale and fake the ratio; round-robin across (op, scale) spreads
    # any burst over every cell, so min-of-trials compares like to like.
    ops = (("ann_ivf_pq_topk", ivf_pq), ("mmr_rerank_ivf", mmr_ivf))
    trials: dict[tuple[str, int], list[float]] = {
        (name, rep): [] for name, _ in ops for rep in reps
    }
    for _ in range(3):
        for name, fn in ops:
            for rep in reps:
                spark.catalog.clearCache()
                t0 = time.time()
                fn(corpora[rep])
                trials[(name, rep)].append(round(time.time() - t0, 3))
    out: dict = {"sf": 0.1, "offset": OFF, "ann_serving": {}}
    for name, _ in ops:
        rows = {}
        base = None
        for rep in reps:
            ts = trials[(name, rep)]
            r = {"best": min(ts), "trials": ts}
            if base is None:
                base = r["best"]
            r["ratio_vs_1x"] = round(r["best"] / base, 2)
            rows[f"{rep}x"] = r
            print(f"{name} {rep}x: {r}", flush=True)
        out["ann_serving"][name] = rows
    out["methodology"] = (
        "round-robin interleaved trials across every (op, scale) cell; "
        "replicated corpora localCheckpointed once before timing"
    )

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "reports",
        "scale_new_ops_round9.json",
    )
    existing = {}
    if os.path.exists(path):
        with open(path) as fh:
            existing = json.load(fh)
    existing.update(out)
    with open(path, "w") as fh:
        json.dump(existing, fh, indent=1)
    print(json.dumps(out))




def streaming_scale() -> None:
    """Per-batch cost of stream_attribution at 1x vs 10x batch size —
    the streaming-family scale row (the r08 pattern: per-batch wall
    should stay ~flat per input row, i.e. ~10x rows -> ~<=10x wall with
    bounded state artifacts).  Run: python tools/bench_r9_ops_scale.py
    --streaming"""
    import json
    import os
    import tempfile
    import time

    from pyspark.sql import functions as F

    from vertica_hadoop_integration__spark.session import get_session
    from vertica_hadoop_integration__spark.sources import load_table
    from vertica_hadoop_integration__spark.streaming.attribution import (
        stream_attribution,
    )

    spark = get_session("r9-stream-scale")
    spark.sparkContext.setLogLevel("ERROR")
    ev = load_table(spark, SF, "events")
    rows = {}
    for rep in (1, 10):
        src_df = ev
        if rep > 1:
            parts = [ev] + [
                ev.withColumn("event_id", F.col("event_id") + F.lit(r * OFF))
                for r in range(1, rep)
            ]
            u = parts[0]
            for d in parts[1:]:
                u = u.unionByName(d)
            src_df = u
        base = tempfile.mkdtemp(prefix=f"attr_scale_{rep}x_")
        src = os.path.join(base, "src")
        src_df.coalesce(4).write.parquet(src)
        stream = spark.readStream.schema(ev.schema).parquet(src)
        t0 = time.time()
        q = stream_attribution(
            stream,
            report_dir=os.path.join(base, "report"),
            ledger_path=os.path.join(base, "led"),
            checkpoint_dir=os.path.join(base, "ckpt"),
        )
        q.awaitTermination(600)
        wall = round(time.time() - t0, 3)
        rows[f"{rep}x"] = {"wall": wall}
        print(f"stream_attribution {rep}x: {wall}s", flush=True)
    rows["per_row_ratio_10x_vs_1x"] = round(
        rows["10x"]["wall"] / (10 * rows["1x"]["wall"]), 3
    )
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "reports",
        "scale_new_ops_round9.json",
    )
    existing = {}
    if os.path.exists(path):
        with open(path) as fh:
            existing = json.load(fh)
    existing["stream_attribution"] = rows
    with open(path, "w") as fh:
        json.dump(existing, fh, indent=1)
    print(json.dumps({"stream_attribution": rows}))


if __name__ == "__main__":
    if "--streaming" in sys.argv:
        streaming_scale()
    else:
        main()
