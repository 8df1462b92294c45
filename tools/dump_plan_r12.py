"""Dump .explain('formatted') for named queries into plans/r12/<query>_<tag>.txt.

Usage: python tools/dump_plan_r12.py <before|after> <query> [query ...]

sf0.1 on purpose: the same inputs the bench times, so size-driven planner
choices (broadcast thresholds, AQE initial partitioning) match the measured
runs.  explain() never executes the query.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    from vertica_hadoop_integration__spark.plans import QUERIES
    from vertica_hadoop_integration__spark.session import get_session

    spark = get_session("plan-dump-r12")
    out_dir = os.path.join("/root/repo", "plans", "r12")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
