"""Streaming continuous-aggregate maintenance (streaming/rollup.py):
after streaming all events in two micro-batches, the persisted rollup
must equal the batch hypertable_rollup over the same events, and a
checkpoint restart must not change it."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vertica_hadoop_integration__spark.operators.temporal import hypertable_rollup
from vertica_hadoop_integration__spark.sources import load_table
from vertica_hadoop_integration__spark.streaming.rollup import stream_rollup_refresh

GRANS = ("hour", "day")


@pytest.fixture()
def staged(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    src = tmp_path / "src"
    events.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        str(src), mode="append"
    )
    events.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        str(src), mode="append"
    )
    return str(src), events


def _run(spark, src, schema, tmp_path):
    raw = str(tmp_path / "raw")
    roll = str(tmp_path / "roll")
    led = str(tmp_path / "led")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_rollup_refresh(
        stream, raw_dir=raw, rollup_dir=roll, ledger_path=led,
        granularities=GRANS, checkpoint_dir=ckpt,
    )
    q.awaitTermination(180)
    return raw, roll, led, ckpt


def _canon(df):
    return sorted(
        (
            r.granularity,
            r.bucket_start,
            r.event_type,
            r.n_events,
            round(r.total_value, 6),
        )
        for r in df.select(
            "granularity", "bucket_start", "event_type", "n_events", "total_value"
        ).collect()
    )


def test_stream_rollup_matches_batch_and_restart_is_stable(
    spark, staged, tmp_path
):
    src, events, = staged[0], staged[1]
    raw, roll, led, ckpt = _run(spark, src, events.schema, tmp_path)

    got = spark.read.parquet(roll)
    want = hypertable_rollup(events, granularities=GRANS)
    assert _canon(got) == _canon(want)

    # restart on the same checkpoint: no new files -> rollup unchanged
    before = _canon(spark.read.parquet(roll))
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_rollup_refresh(
        stream, raw_dir=raw, rollup_dir=roll, ledger_path=led,
        granularities=GRANS, checkpoint_dir=ckpt,
    )
    q.awaitTermination(120)
    assert _canon(spark.read.parquet(roll)) == before


# -- streaming trending top-k (streaming/trending.py) ----------------------


def _trending_canon(df):
    return sorted(
        (str(r.window_start), r.event_type, r.n_events, r.rank)
        for r in df.select("window_start", "event_type", "n_events", "rank").collect()
    )


def test_stream_trending_matches_batch_and_restart_is_stable(
    spark, staged, tmp_path
):
    from vertica_hadoop_integration__spark.streaming.trending import (
        stream_trending_load,
        trending_topk,
        window_counts,
    )

    src, events = staged[0], staged[1]
    deltas = str(tmp_path / "deltas")
    trend = str(tmp_path / "trend")
    led = str(tmp_path / "tled")
    ckpt = str(tmp_path / "tckpt")

    def _start():
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return stream_trending_load(
            stream, deltas_dir=deltas, trending_dir=trend,
            ledger_path=led, window="1 hour", k=3, checkpoint_dir=ckpt,
        )

    q = _start()
    q.awaitTermination(180)

    got = spark.read.parquet(trend)
    want = trending_topk(window_counts(events, window="1 hour"), k=3)
    assert _trending_canon(got) == _trending_canon(want)
    # top-k bound per window actually holds
    per_win = got.groupBy("window_start").count().agg(F.max("count")).first()[0]
    assert per_win <= 3

    # restart on the same checkpoint: no new files -> table unchanged
    before = _trending_canon(spark.read.parquet(trend))
    q2 = _start()
    q2.awaitTermination(180)
    assert _trending_canon(spark.read.parquet(trend)) == before
