"""Scaling measurement for the round-6 additions: data-driven salted
join, range rebalance, z-order staging, cross-split leakage audit,
Kneser-Ney bigram LM, Gopher rule gate.  Runs each op at 1x (sf0.1
fixtures) and 10x (id-offset replica frames), best-of-2 with clearCache
between trials, one JSON line out + reports/scale_new_ops_round6.json.

The replicas multiply the corpus/fact side only — the broadcast sides
(fanout map, percentile cuts, column bounds, bigram-type total) stay
fixed or grow sublinearly, which is the shape the 100 TB claim is about.

Usage: python tools/bench_r6_ops_scale.py
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
        split_leakage_pairs,
    )
    from vertica_hadoop_integration__spark.operators.relational import (
        range_rebalance,
        salted_join_auto,
    )
    from vertica_hadoop_integration__spark.operators.text import (
        dedup_lines_within_doc,
        gopher_rules,
        kn_bigram_logprob,
    )
    from vertica_hadoop_integration__spark.operators.sketches import (
        hll_distinct_portable,
    )
    from vertica_hadoop_integration__spark.operators.temporal import (
        asof_join,
    )
    from vertica_hadoop_integration__spark.session import get_session
    from vertica_hadoop_integration__spark.sources.writers import zorder_stage

    spark = get_session("r6-scale")
    events = spark.read.parquet(os.path.join(SF, "events.parquet"))
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    li = spark.read.parquet(os.path.join(SF, "lineitem.parquet")).select(
        "l_extendedprice", "l_quantity"
    )

    def replicate(df, id_cols):
        out = []
        for r in range(REP):
            d = df
            for c in id_cols:
                d = d.withColumn(c, F.col(c) + F.lit(r * OFF))
            out.append(d)
        u = out[0]
        for d in out[1:]:
            u = u.unionByName(d)
        return u

    def run(fn):
        best = None
        trials = []
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.time()
            fn()
            dt = round(time.time() - t0, 3)
            trials.append(dt)
            best = dt if best is None else min(best, dt)
        return {"best": best, "trials": trials}

    def suite(ev, dc, fact):
        dim = ev.groupBy("event_type").agg(F.avg("value").alias("type_avg"))
        return {
            "salted_join_auto": lambda: salted_join_auto(
                ev.select("event_type", "event_id", "value"), dim,
                on=["event_type"], salt_src=F.col("event_id"),
                rows_per_bucket=512,
            ).groupBy("event_type").count().collect(),
            "range_rebalance_approx": lambda: range_rebalance(
                ev, "value", 8, exact=False
            ).groupBy("bucket").count().collect(),
            "zorder_stage": lambda: zorder_stage(
                fact, ["l_extendedprice", "l_quantity"]
            ).groupBy(F.shiftright("_z", 24)).count().collect(),
            "split_leakage": lambda: split_leakage_pairs(dc).count(),
            "kn_bigram_logprob": lambda: kn_bigram_logprob(dc)
            .agg(F.sum("n_bigrams")).collect(),
            "gopher_rules": lambda: gopher_rules(dc)
            .groupBy("gate_reason").count().collect(),
            "dedup_lines_within_doc": lambda: dedup_lines_within_doc(dc)
            .agg(F.sum("n_kept")).collect(),
            "hll_portable": lambda: hll_distinct_portable(
                ev, "user_id", ("event_type",)
            ).collect(),
            "asof_tolerance": lambda: asof_join(
                ev.filter(F.col("event_type") == "purchase")
                .select("event_id", "user_id", "ts", "value"),
                ev.filter(F.col("event_type") == "click")
                .groupBy("user_id", "ts")
                .agg(F.max("value").alias("value")),
                on="user_id", value_cols=("value",),
                tolerance_seconds=1800,
            ).filter("asof_ts IS NOT NULL").count(),
        }

    out = {}
    out["1x"] = {k: run(v) for k, v in suite(events, docs, li).items()}
    ev10 = replicate(events, ["event_id"])
    docs10 = replicate(docs, ["doc_id"])
    li10 = li
    for _ in range(REP - 1):
        li10 = li10.unionByName(li)
    out["10x"] = {k: run(v) for k, v in suite(ev10, docs10, li10).items()}
    with open("/root/repo/reports/scale_new_ops_round6.json", "w") as fh:
        json.dump(out, fh)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
