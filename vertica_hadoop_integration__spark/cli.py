"""Engine CLI — replaces run_sqoop_job.sh (cron driver that ran one yaml
job per table, run_sqoop_job.sh:15-25).

    python -m vertica_hadoop_integration__spark.cli run job.yaml [job2.yaml ...]
        [--ledger DIR] [--source-table NAME] [--sf-dir DIR] [--pause-file PATH]

Each yaml is a JobSpec (jobspec.py). Jobs run sequentially like the
reference's shell loop; locking makes concurrent invocations safe.

Operational guards mirroring run_sqoop_job.sh:2-9:
* pause file — when present, the run is SKIPPED with a nonzero exit and
  an alert line (the reference's operator kill-switch before cron fires);
* lock contention — a job whose lock is held by a live run is reported
  and skipped (alert to stderr, nonzero exit) instead of silently doing
  nothing.
"""

from __future__ import annotations

import argparse
import os
import sys

from pyspark.sql import functions as F

RC_OK = 0
RC_LOCKED = 1
RC_PAUSED = 2


def _alert(msg: str) -> None:
    """The reference emailed on pause/contention (run_sqoop_job.sh:4-8);
    headless equivalent: a greppable ALERT line on stderr."""
    print(f"ALERT spark-etl-engine: {msg}", file=sys.stderr)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="spark-etl-engine")
    sub = p.add_subparsers(dest="cmd", required=True)
    run = sub.add_parser("run", help="run incremental backup job(s) from yaml spec(s)")
    run.add_argument("specs", nargs="+", help="job yaml files")
    run.add_argument("--ledger", default="/tmp/spark_etl_ledger")
    run.add_argument("--sf-dir", default=None, help="override source dir for fixture tables")
    run.add_argument(
        "--pause-file",
        default=os.environ.get("SPARK_GRAFT_PAUSE_FILE", "/tmp/spark_etl_pause"),
        help="skip the whole run (rc=2) while this file exists",
    )
    args = p.parse_args(argv)

    if os.path.exists(args.pause_file):
        _alert(f"pause file present ({args.pause_file}); skipping run")
        return RC_PAUSED

    from .jobspec import JobSpec
    from .pipeline import JobLockHeld, run_incremental
    from .session import get_session
    from .sources import TABLES, load_table

    spark = get_session("spark-etl-engine-cli")
    rc = RC_OK
    for spec_path in args.specs:
        spec = JobSpec.from_yaml(spec_path)
        src_dir = args.sf_dir or spec.source_path
        if spec.table_name in TABLES:
            source = load_table(spark, src_dir, spec.table_name)
        else:
            source = spark.read.parquet(spec.source_path)
        if spec.primary_id and spec.primary_id not in source.columns:
            # derived monthly partition column, the common incremental case
            base = spec.extra.get("partition_source_column", "o_orderdate")
            source = source.withColumn(
                spec.primary_id,
                F.date_trunc("month", F.col(base)).cast("date").cast("string"),
            )
        try:
            done = run_incremental(spark, spec, source, args.ledger)
        except JobLockHeld as e:
            _alert(f"{spec.table_name}: lock held by a live run ({e.lock_path}); skipped")
            rc = RC_LOCKED
            continue
        print(f"{spec.table_name}: {len(done)} partition(s) written")
    return rc


if __name__ == "__main__":
    sys.exit(main())
