"""Streaming last-touch attribution (streaming/attribution.py): after
streaming events in time-ordered micro-batches, the maintained report
must equal the batch operator over the union — including the organic
NULL row and a cross-batch carry (touch in batch 1, conversion in
batch 2) — and a checkpoint restart must not change it."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vertica_hadoop_integration__spark.operators.temporal import (
    attribution_last_touch,
)
from vertica_hadoop_integration__spark.sources import load_table
from vertica_hadoop_integration__spark.streaming.attribution import (
    read_report,
    stream_attribution,
)


@pytest.fixture()
def staged(spark, sf_dir, tmp_path):
    """Time-split micro-batches (in-order arrival: every batch-1 event
    precedes every batch-2 event), so cross-batch touches must carry."""
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


def _run(spark, src, schema, tmp_path, tag):
    report = str(tmp_path / f"report_{tag}")
    led = str(tmp_path / f"led_{tag}")
    ckpt = str(tmp_path / f"ckpt_{tag}")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_attribution(
        stream, report_dir=report, ledger_path=led, checkpoint_dir=ckpt
    )
    q.awaitTermination(180)
    return report, led, ckpt


def _canon(df):
    return sorted(
        (
            (r.attributed_type, r.n_conversions, round(r.total_value, 6))
            for r in df.collect()
        ),
        key=lambda t: (t[0] is None, t[0] or "", t[1]),
    )


class TestStreamAttribution:
    def test_batch_twin_parity(self, spark, staged, tmp_path):
        src, events = staged
        report, _, _ = _run(spark, src, events.schema, tmp_path, "a")
        expected = attribution_last_touch(events, window_days=7)
        got = read_report(spark, report)
        assert _canon(got) == _canon(expected)
        # the organic row exists and conversions total matches
        assert any(r[0] is None for r in _canon(got))

    def test_restart_is_idempotent(self, spark, staged, tmp_path):
        src, events = staged
        report, led, ckpt = _run(spark, src, events.schema, tmp_path, "b")
        before = _canon(read_report(spark, report))
        # restart over the same checkpoint: no new files -> no change;
        # and a forced re-run of the sink with a replayed batch id is
        # skipped by the ledger (pending_exists False)
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = stream_attribution(
            stream, report_dir=report, ledger_path=led, checkpoint_dir=ckpt
        )
        q.awaitTermination(120)
        after = _canon(read_report(spark, report))
        assert before == after

    def test_cross_batch_touch_carries(self, spark, tmp_path):
        import datetime as dt

        rows1 = [(1, dt.datetime(2024, 1, 1, 10), 7, "click", 0.0)]
        rows2 = [(2, dt.datetime(2024, 1, 2, 10), 7, "purchase", 5.0)]
        schema = (
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double"
        )
        src = tmp_path / "src2"
        spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(
            str(src), mode="append"
        )
        spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(
            str(src), mode="append"
        )
        report, _, _ = _run(
            spark,
            str(src),
            spark.createDataFrame(rows1, schema).schema,
            tmp_path,
            "c",
        )
        got = _canon(read_report(spark, report))
        assert got == [("click", 1, 5.0)]
