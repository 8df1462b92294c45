"""Round-10 scaling evidence (r09 verdict item 4 + item 2):

* 10x rows for the six r09 batch operators that shipped without them —
  graph_kcore, graph_link_prediction, events_cohort_ltv,
  embedding_centroid_drift, corpus_temperature_mixture,
  stats_welch_ttest — plus the six new r10 operators
  (stats_chi2_independence, events_survival_km, stats_bootstrap_mean,
  graph_modularity, dedup_cross_source_matrix, text_rake_keywords).
* the SKEWED-graph probe for the hub-capped link prediction (r09
  verdict's scale-killer fix): wall time on a planted-hub graph at
  1x/10x/100x leaves must grow ~linearly (the uncapped expansion is
  quadratic in hub degree); the uncapped baseline is measured only at
  1x where it is still feasible.
* a 10x per-batch row for the new streaming transition-matrix twin.

Replica semantics match the r06-r09 harnesses: facts replicate with id
offsets (offset 1M) so keys stay distinct and dimensions
(sources/types/labels) keep their cardinality; replicated frames are
localCheckpointed once so the measured time is the OPERATOR at rep-x
rows, not the union fan-in.  Trials are round-robin INTERLEAVED across
every (op, scale) cell (one host burst spreads over all cells instead
of faking one ratio); a third trial is added for any cell whose two
trials disagree by >30%.

Usage: python tools/bench_r10_ops_scale.py
Writes reports/scale_new_ops_round10.json.
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

    from vertica_hadoop_integration__spark.operators.corpus import (
        temperature_mixture,
    )
    from vertica_hadoop_integration__spark.operators.dedup import (
        cross_source_matrix,
    )
    from vertica_hadoop_integration__spark.operators.graph import (
        jaccard_link_prediction,
        kcore,
        label_propagation,
        modularity,
    )
    from vertica_hadoop_integration__spark.operators.profile import (
        chi2_independence,
        poisson_bootstrap_means,
        welch_ttest,
    )
    from vertica_hadoop_integration__spark.operators.similarity import (
        centroid_drift,
    )
    from vertica_hadoop_integration__spark.operators.temporal import (
        cohort_ltv,
        survival_km,
    )
    from vertica_hadoop_integration__spark.operators.text import rake_keywords
    from vertica_hadoop_integration__spark.session import get_session

    spark = get_session("r10-scale")
    spark.sparkContext.setLogLevel("ERROR")

    def replicate(df, id_cols, rep):
        out = [df]
        for r in range(1, rep):
            d = df
            for c in id_cols:
                d = d.withColumn(c, F.col(c) + F.lit(r * OFF))
            out.append(d)
        u = out[0]
        for d in out[1:]:
            u = u.unionByName(d)
        return u

    from vertica_hadoop_integration__spark.sources import load_table

    # load_table, not raw spark.read.parquet: it normalizes the events
    # TIMESTAMP(NANOS) column to a session-tz TIMESTAMP the operators'
    # unix_micros calls accept (the registered-query read path)
    events = load_table(spark, SF, "events")
    docs = load_table(spark, SF, "documents")
    emb = load_table(spark, SF, "embeddings")
    li = load_table(spark, SF, "lineitem").filter(
        F.col("l_orderkey") % 3 == 0
    ).select("l_orderkey", "l_partkey")

    reps = [1, 10]
    ev = {
        r: (events if r == 1
            else replicate(events, ["event_id", "user_id"], r).localCheckpoint())
        for r in reps
    }
    dc = {
        r: (docs if r == 1
            else replicate(docs, ["doc_id"], r).localCheckpoint())
        for r in reps
    }
    em = {
        r: (emb if r == 1
            else replicate(emb, ["vec_id"], r).localCheckpoint())
        for r in reps
    }
    lg = {
        r: (li if r == 1
            else replicate(li, ["l_orderkey", "l_partkey"], r).localCheckpoint())
        for r in reps
    }

    def pairs_of(frame):
        return (
            frame.select(
                F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
            )
            .groupBy("o")
            .agg(F.collect_list("p").alias("ps"))
            .select(F.explode("ps").alias("p"), "ps")
            .select("p", F.explode("ps").alias("q"))
            .filter(F.col("p") != F.col("q"))
        )

    def units_of(frame):
        return frame.filter(F.col("user_id").isNotNull()).groupBy(
            "user_id"
        ).agg(
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("double")
            .alias("metric")
        )

    OPS = {
        "graph_kcore": lambda r: kcore(
            pairs_of(lg[r]), k=3, rounds=3, src="p", dst="q"
        ).count(),
        "graph_link_prediction": lambda r: jaccard_link_prediction(
            pairs_of(lg[r]), top=50, min_common=2, src="p", dst="q",
            max_degree=64,
        ).count(),
        "graph_modularity": lambda r: (
            lambda e: modularity(
                e,
                label_propagation(e, src="p", dst="q", weight="w", iters=3),
                src="p", dst="q", weight="w",
                node_col="node", label_col="community",
            ).count()
        )(pairs_of(lg[r]).groupBy("p", "q").agg(F.count(F.lit(1)).alias("w"))),
        "events_cohort_ltv": lambda r: cohort_ltv(ev[r]).count(),
        "events_survival_km": lambda r: survival_km(
            ev[r], horizon_days=1
        ).count(),
        "stats_welch_ttest": lambda r: welch_ttest(
            ev[r].filter(F.col("user_id").isNotNull())
            .groupBy(
                "user_id",
                F.when(F.col("user_id") % 2 == 0, F.lit("A"))
                .otherwise(F.lit("B")).alias("variant"),
            )
            .agg(
                F.sum(F.col("value").cast("decimal(38,6)"))
                .cast("double").alias("metric")
            ),
            "variant", "metric",
        ).count(),
        "stats_chi2_independence": lambda r: chi2_independence(
            ev[r].filter(F.col("user_id").isNotNull()).select(
                "event_type",
                F.when(F.col("user_id") % 2 == 0, F.lit("A"))
                .otherwise(F.lit("B")).alias("variant"),
            ),
            "event_type", "variant",
        ).count(),
        "stats_bootstrap_mean": lambda r: poisson_bootstrap_means(
            units_of(ev[r]), "user_id", "metric", replicates=40
        ).count(),
        "embedding_centroid_drift": lambda r: centroid_drift(
            em[r].filter(F.col("vec_id") % 2 == 0),
            em[r].filter(F.col("vec_id") % 2 == 1),
        ).count(),
        "corpus_temperature_mixture": lambda r: temperature_mixture(
            dc[r], temperature=0.7, token_budget=1_000_000
        ).count(),
        "dedup_cross_source_matrix": lambda r: cross_source_matrix(
            dc[r]
        ).count(),
        "text_rake_keywords": lambda r: rake_keywords(dc[r], top=50).count(),
    }

    trials: dict[tuple[str, int], list[float]] = {
        (name, r): [] for name in OPS for r in reps
    }

    def run_cell(name, r):
        t0 = time.perf_counter()
        OPS[name](r)
        dt = round(time.perf_counter() - t0, 3)
        trials[(name, r)].append(dt)
        spark.catalog.clearCache()
        print(f"# {name} {r}x: {dt}s", file=sys.stderr)

    for _ in range(2):
        for name in OPS:
            for r in reps:
                run_cell(name, r)
    # burst-recovery third trial where the two disagree
    for (name, r), ts in list(trials.items()):
        if max(ts) > 1.3 * min(ts):
            run_cell(name, r)

    batch = {}
    for name in OPS:
        row = {}
        base = min(trials[(name, 1)])
        for r in reps:
            best = min(trials[(name, r)])
            row[f"{r}x"] = {
                "best": best,
                "trials": trials[(name, r)],
                "ratio_vs_1x": round(best / base, 2),
            }
        batch[name] = row

    # ---- skewed-graph probe for the hub cap (r09 verdict item 2) ----
    def hub_graph(n_leaves):
        hub = spark.range(1, n_leaves + 1).select(
            F.lit(0).cast("long").alias("u"), F.col("id").alias("v")
        )
        # background wedges so top-k has non-hub candidates
        chain = spark.range(1, 2001).select(
            (F.col("id") + 10_000_000).alias("u"),
            (F.col("id") % 400 + 20_000_000).alias("v"),
        )
        return hub.unionByName(chain).localCheckpoint()

    skew = {}
    sizes = {"1x": 2_000, "10x": 20_000, "100x": 200_000}
    cells = [(tag, True) for tag in sizes] + [("1x", False)]
    graphs = {tag: hub_graph(n) for tag, n in sizes.items()}
    sk_trials: dict[tuple[str, bool], list[float]] = {c: [] for c in cells}
    for _ in range(2):
        for tag, capped in cells:
            t0 = time.perf_counter()
            jaccard_link_prediction(
                graphs[tag], top=50, min_common=2,
                max_degree=64 if capped else None,
            ).count()
            sk_trials[(tag, capped)].append(
                round(time.perf_counter() - t0, 3)
            )
            spark.catalog.clearCache()
            print(
                f"# skew {tag} capped={capped}: {sk_trials[(tag, capped)][-1]}s",
                file=sys.stderr,
            )
    base = min(sk_trials[("1x", True)])
    for tag in sizes:
        best = min(sk_trials[(tag, True)])
        skew[tag] = {
            "leaves": sizes[tag],
            "best_capped": best,
            "trials": sk_trials[(tag, True)],
            "ratio_vs_1x": round(best / base, 2),
        }
    skew["1x_uncapped_baseline"] = {
        "best": min(sk_trials[("1x", False)]),
        "trials": sk_trials[("1x", False)],
        "note": "uncapped wedge expansion is O(hub_degree^2); only "
                "feasible at 1x — 100x uncapped would expand 4e10 pairs",
    }

    # ---- streaming transition twin: 10x per-batch rows ----
    from vertica_hadoop_integration__spark.streaming.transition import (
        make_transition_sink,
    )

    stream = {}
    for r in reps:
        root = f"/tmp/r10_scale_trans_{r}"
        import shutil

        shutil.rmtree(root, ignore_errors=True)
        sink = make_transition_sink(f"{root}/report", f"{root}/ledger")
        t0 = time.perf_counter()
        sink(ev[r], 0)
        stream[f"{r}x"] = {"wall": round(time.perf_counter() - t0, 3)}
    stream["per_row_ratio_10x_vs_1x"] = round(
        (stream["10x"]["wall"] / 10) / stream["1x"]["wall"], 3
    )

    out = {
        "sf": 0.1,
        "offset": OFF,
        "batch_ops_10x": batch,
        "skewed_link_prediction": skew,
        "stream_transition": stream,
        "methodology": (
            "round-robin interleaved trials across every (op, scale) "
            "cell, third trial on >1.3x disagreement; replicated frames "
            "localCheckpointed once before timing; skew probe = planted "
            "hub of degree n_leaves + 2000-edge background, capped "
            "max_degree=64 vs the 1x-only uncapped baseline"
        ),
    }
    path = "/root/repo/reports/scale_new_ops_round10.json"
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"written": path}))


if __name__ == "__main__":
    main()
