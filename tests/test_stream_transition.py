"""Streaming Markov transition matrix (streaming/transition.py): after
streaming events in time-ordered micro-batches, the maintained report
must equal the batch operator over the union — including transitions
that straddle batch boundaries — and both a checkpoint restart and a
crash replayed from between the state write and the ledger mark must
not change it."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vertica_hadoop_integration__spark.operators.temporal import (
    markov_transitions,
)
from vertica_hadoop_integration__spark.sources import load_table
from vertica_hadoop_integration__spark.streaming.transition import (
    make_transition_sink,
    read_report,
    stream_transition_matrix,
)


def _canon(df):
    return sorted(
        (r.from_type, r.to_type, r.n_transitions, round(r.p_transition, 9))
        for r in df.collect()
    )


@pytest.fixture()
def staged(spark, sf_dir, tmp_path):
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
    return str(src), events


class TestStreamTransition:
    def test_batch_twin_parity(self, spark, staged, tmp_path):
        src, events = staged
        report = str(tmp_path / "report_a")
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = stream_transition_matrix(
            stream,
            report_dir=report,
            ledger_path=str(tmp_path / "led_a"),
            checkpoint_dir=str(tmp_path / "ckpt_a"),
        )
        q.awaitTermination(180)
        got = _canon(read_report(spark, report))
        expected = _canon(markov_transitions(events))
        assert got == expected

    def test_boundary_transition_carries(self, spark, tmp_path):
        import datetime as dt

        schema = (
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double"
        )
        b0 = spark.createDataFrame(
            [(1, dt.datetime(2024, 1, 1, 10), 7, "click", 0.0)], schema
        )
        b1 = spark.createDataFrame(
            [(2, dt.datetime(2024, 1, 2, 10), 7, "purchase", 5.0)], schema
        )
        report = str(tmp_path / "report_b")
        sink = make_transition_sink(report, str(tmp_path / "led_b"))
        sink(b0, 0)
        sink(b1, 1)
        got = _canon(read_report(spark, report))
        # the only transition exists purely ACROSS the batch boundary
        assert got == [("click", "purchase", 1, 1.0)]

    def test_crash_between_state_and_ledger_replays_clean(
        self, spark, tmp_path, monkeypatch
    ):
        import datetime as dt

        from vertica_hadoop_integration__spark.ledger import Ledger

        schema = (
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double"
        )
        b0 = spark.createDataFrame(
            [(1, dt.datetime(2024, 1, 1, 10), 7, "click", 0.0)], schema
        )
        b1 = spark.createDataFrame(
            [
                (2, dt.datetime(2024, 1, 2, 10), 7, "view", 0.0),
                (3, dt.datetime(2024, 1, 2, 11), 7, "purchase", 5.0),
            ],
            schema,
        )
        report = str(tmp_path / "report_c")
        sink = make_transition_sink(report, str(tmp_path / "led_c"))
        sink(b0, 0)
        real_mark = Ledger.mark_complete

        def _boom(self, key, val):
            raise RuntimeError("simulated crash before ledger commit")

        monkeypatch.setattr(Ledger, "mark_complete", _boom)
        with pytest.raises(RuntimeError, match="simulated crash"):
            sink(b1, 1)
        import os

        assert os.path.isdir(f"{report}__last/1")
        monkeypatch.setattr(Ledger, "mark_complete", real_mark)
        sink(b1, 1)  # replay: must read snapshot 0, not its own orphan
        got = _canon(read_report(spark, report))
        expected = _canon(markov_transitions(b0.unionByName(b1)))
        assert got == expected
        assert got == [
            ("click", "view", 1, 1.0),
            ("view", "purchase", 1, 1.0),
        ]

    def test_restart_is_idempotent(self, spark, staged, tmp_path):
        src, events = staged
        report = str(tmp_path / "report_d")
        led = str(tmp_path / "led_d")
        ckpt = str(tmp_path / "ckpt_d")

        def _run():
            stream = (
                spark.readStream.schema(events.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            q = stream_transition_matrix(
                stream, report_dir=report, ledger_path=led,
                checkpoint_dir=ckpt,
            )
            q.awaitTermination(180)

        _run()
        before = _canon(read_report(spark, report))
        _run()  # no new files: nothing replays, nothing changes
        assert _canon(read_report(spark, report)) == before
