"""Streaming cohort retention (streaming/retention.py): after streaming
events in time-ordered micro-batches, the maintained report must equal
retention_cohorts over the union — including users whose activity spans
batches (counted once per period, cohort fixed at first sight) — and
both a replayed batch and a crash between the state write and the
ledger mark must not change it."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from vertica_hadoop_integration__spark.operators.temporal import (
    retention_cohorts,
)
from vertica_hadoop_integration__spark.sources import load_table
from vertica_hadoop_integration__spark.streaming.retention import (
    make_retention_sink,
    read_report,
    stream_retention,
)

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, "
    "event_type string, value double"
)


def _canon(df):
    return sorted(
        (r.cohort_start, r.period_offset, r.n_users) for r in df.collect()
    )


class TestStreamRetention:
    def test_batch_twin_parity_over_time_split(self, spark, sf_dir, tmp_path):
        events = load_table(spark, sf_dir, "events")
        cut = events.agg(
            F.percentile_approx("ts", F.lit(0.5), F.lit(100))
        ).collect()[0][0]
        src = tmp_path / "src"
        events.filter(F.col("ts") <= F.lit(cut)).coalesce(1).write.parquet(
            str(src), mode="append"
        )
        events.filter(F.col("ts") > F.lit(cut)).coalesce(1).write.parquet(
            str(src), mode="append"
        )
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = stream_retention(
            stream,
            report_dir=str(tmp_path / "report"),
            ledger_path=str(tmp_path / "led"),
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
        q.awaitTermination(180)
        got = _canon(read_report(spark, str(tmp_path / "report")))
        expected = _canon(retention_cohorts(events, granularity="week"))
        assert got == expected

    def test_cross_batch_period_counted_once_and_cohort_fixed(
        self, spark, tmp_path
    ):
        """User 7 is active in week W in BOTH batches (count once) and
        returns in a later week only in batch 2 (offset vs the batch-1
        cohort)."""
        sink = make_retention_sink(
            str(tmp_path / "rep"), str(tmp_path / "led")
        )
        b0 = spark.createDataFrame(
            [(1, dt.datetime(2024, 1, 1, 9), 7, "view", 0.0)], EVENT_SCHEMA
        )
        b1 = spark.createDataFrame(
            [
                (2, dt.datetime(2024, 1, 3, 9), 7, "view", 0.0),  # same wk
                (3, dt.datetime(2024, 1, 10, 9), 7, "view", 0.0),  # wk+1
            ],
            EVENT_SCHEMA,
        )
        sink(b0, 0)
        sink(b1, 1)
        got = {
            (r.period_offset): r.n_users
            for r in read_report(spark, str(tmp_path / "rep")).collect()
        }
        assert got == {0: 1, 1: 1}

    def test_replay_and_crash_between_state_and_ledger(
        self, spark, tmp_path, monkeypatch
    ):
        """A batch that crashed after writing its delta + state but
        before the ledger mark is replayed: the report converges to the
        same values, nothing double-counts."""
        from vertica_hadoop_integration__spark import ledger as L

        rep, led = str(tmp_path / "rep"), str(tmp_path / "led")
        sink = make_retention_sink(rep, led)
        b0 = spark.createDataFrame(
            [(1, dt.datetime(2024, 2, 5, 9), 1, "view", 0.0)], EVENT_SCHEMA
        )
        b1 = spark.createDataFrame(
            [
                (2, dt.datetime(2024, 2, 6, 9), 2, "view", 0.0),
                (3, dt.datetime(2024, 2, 12, 9), 1, "view", 0.0),
            ],
            EVENT_SCHEMA,
        )
        sink(b0, 0)
        # crash injection: batch 1's first attempt dies on mark_complete
        real_mark = L.Ledger.mark_complete

        def boom(self, key, payload):
            raise RuntimeError("injected crash before ledger mark")

        monkeypatch.setattr(L.Ledger, "mark_complete", boom)
        with pytest.raises(RuntimeError, match="injected"):
            sink(b1, 1)
        monkeypatch.setattr(L.Ledger, "mark_complete", real_mark)
        # replay of batch 1 (same id) after the crash
        sink(b1, 1)
        # an extra replay of a COMMITTED batch is a ledger-guarded no-op
        sink(b1, 1)
        got = _canon(read_report(spark, rep))
        union = b0.unionByName(b1)
        expected = _canon(retention_cohorts(union, granularity="week"))
        assert got == expected
