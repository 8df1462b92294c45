"""Structured Streaming tests: every window operator is run BOTH as a
batch plan and as a real stream (file source, availableNow trigger,
memory sink) and the two results must agree — the mode-agnostic
transformation contract of streaming/windows.py."""

import pytest
from pyspark.sql import functions as F

from vertica_hadoop_integration__spark.sources import load_table
from vertica_hadoop_integration__spark.streaming import windows as W
from vertica_hadoop_integration__spark.streaming.stateful import running_user_totals


@pytest.fixture(scope="module")
def events_batch(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


@pytest.fixture(scope="module")
def events_stream_dir(spark, sf_dir, tmp_path_factory):
    """Re-materialize events as a normal-timestamp parquet dir usable as a
    file-stream source (the raw fixture's TIMESTAMP(NANOS) requires the
    nanosAsLong conf which readStream shares via the session)."""
    d = tmp_path_factory.mktemp("events_src")
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(str(d / "events"))
    return str(d / "events")


def _run_stream(spark, stream_df, tmp_path, name, output_mode):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def _sorted_rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def _stream_source(spark, events_stream_dir, events_batch):
    return spark.readStream.schema(events_batch.schema).parquet(events_stream_dir)


def _closed_before_final_watermark(batch_result, events_batch, end_col, delay_min=10):
    """Append-mode streams only emit windows closed by the final watermark
    (max event time - delay); trim the batch expectation to match."""
    cutoff = events_batch.agg(
        F.max("ts") - F.expr(f"INTERVAL {delay_min} MINUTES")
    ).first()[0]
    return batch_result.filter(F.col(end_col) <= F.lit(cutoff))


def test_tumbling_stream_matches_batch(spark, events_batch, events_stream_dir, tmp_path):
    src = _stream_source(spark, events_stream_dir, events_batch)
    got = _run_stream(
        spark, W.tumbling_counts(src), tmp_path, "tumbling_t", "append"
    )
    want = _closed_before_final_watermark(
        W.tumbling_counts(events_batch), events_batch, "window_end"
    )
    cols = ["window_start", "event_type", "n_events", "total_value"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)
    assert got.count() > 0


def test_sliding_stream_matches_batch(spark, events_batch, events_stream_dir, tmp_path):
    src = _stream_source(spark, events_stream_dir, events_batch)
    got = _run_stream(spark, W.sliding_rates(src), tmp_path, "sliding_t", "append")
    want = _closed_before_final_watermark(
        W.sliding_rates(events_batch), events_batch, "window_end"
    )
    cols = ["window_start", "event_type", "n_events"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)
    # each non-trailing event appears in window/slide = 3 overlapping windows
    assert got.agg(F.sum("n_events")).first()[0] == want.agg(F.sum("n_events")).first()[0]


def test_session_stream_matches_batch(spark, events_batch, events_stream_dir, tmp_path):
    src = _stream_source(spark, events_stream_dir, events_batch)
    got = _run_stream(spark, W.session_aggregate(src), tmp_path, "session_t", "append")
    want = _closed_before_final_watermark(
        W.session_aggregate(events_batch), events_batch, "session_end"
    )
    cols = ["session_start", "session_end", "user_id", "n_events", "total_value"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)
    # sessions partition the emitted events: totals must add up
    assert got.agg(F.sum("n_events")).first()[0] == want.agg(F.sum("n_events")).first()[0]


def test_dedup_within_watermark(spark, events_batch, events_stream_dir, tmp_path):
    src = _stream_source(spark, events_stream_dir, events_batch)
    got = _run_stream(
        spark, W.dedup_within_watermark(src), tmp_path, "dedup_t", "append"
    )
    # fixture has unique event_ids: dedup is identity there
    assert got.count() == events_batch.count()


def test_stateful_running_totals(spark, events_batch, events_stream_dir, tmp_path):
    src = _stream_source(spark, events_stream_dir, events_batch)
    got = _run_stream(
        spark, running_user_totals(src), tmp_path, "stateful_t", "update"
    )
    # final per-user state (last update per user) must equal the batch agg
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    final = (
        got.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    )
    want = running_user_totals(events_batch)
    got_map = {r["user_id"]: (r["n_events"], round(r["total_value"], 6)) for r in final.collect()}
    want_map = {r["user_id"]: (r["n_events"], round(r["total_value"], 6)) for r in want.collect()}
    assert got_map == want_map


def test_json_enriched(spark, events_batch):
    out = W.json_enriched(events_batch)
    assert out.filter(F.col("props_k").isNull()).count() == 0


def test_stream_static_enrich_matches_batch(spark, events_batch, events_stream_dir, tmp_path):
    dim = load_table(spark, "/root/testdata/sf0.01", "customer").select(
        "c_custkey", "c_mktsegment"
    )
    src = _stream_source(spark, events_stream_dir, events_batch)
    streamed = _run_stream(
        spark,
        W.enrich_with_dim(src, dim).select("event_id", "user_id", "c_mktsegment"),
        tmp_path,
        "enriched",
        "append",
    )
    batch = W.enrich_with_dim(events_batch, dim).select(
        "event_id", "user_id", "c_mktsegment"
    )
    cols = ["event_id", "user_id", "c_mktsegment"]
    assert _sorted_rows(streamed, cols) == _sorted_rows(batch, cols)


def test_stream_load_lands_batches_and_is_replay_safe(
    spark, events_batch, events_stream_dir, tmp_path
):
    from vertica_hadoop_integration__spark.streaming.loader import stream_load
    from vertica_hadoop_integration__spark.ledger import Ledger

    src = _stream_source(spark, events_stream_dir, events_batch)
    dest = str(tmp_path / "landed")
    ledger_path = str(tmp_path / "ledger")
    q = stream_load(
        src.select("event_id", "user_id", "value"),
        dest, ledger_path,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    landed = spark.read.orc(dest + "/batch=*")
    assert landed.count() == events_batch.count()
    led = Ledger(spark, ledger_path).read()
    assert led.filter(F.col("is_complete") == "t").count() >= 1
    assert led.filter(F.col("is_complete") == "f").count() == 0

    # restart with same checkpoint: no new data -> no duplicate rows
    src2 = _stream_source(spark, events_stream_dir, events_batch)
    q2 = stream_load(
        src2.select("event_id", "user_id", "value"),
        dest, ledger_path,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q2.awaitTermination(120)
    assert spark.read.orc(dest + "/batch=*").count() == events_batch.count()


def test_streaming_anomaly_scores_state(spark, events_batch, tmp_path):
    """Per-key Welford state: one emitted row per (event_type, batch),
    batch volumes sum to the true totals, and exactly the first batch
    per key lacks a baseline."""
    from vertica_hadoop_integration__spark.streaming.stateful import (
        streaming_anomaly_scores,
    )

    src_dir = tmp_path / "anom_src"
    events_batch.repartition(3).write.parquet(str(src_dir))
    n_files = len([p for p in src_dir.glob("*.parquet")])
    src = (
        spark.readStream.schema(events_batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir))
    )
    got = _run_stream(
        spark, streaming_anomaly_scores(src), tmp_path, "anom_t", "update"
    )
    rows = got.collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    want_totals = {
        r.event_type: r.n
        for r in events_batch.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(by_type) == set(want_totals)
    for et, et_rows in by_type.items():
        # one row per micro-batch the key appeared in (keys in every file
        # -> one per file), volumes sum to the key's true event count
        assert len(et_rows) <= n_files
        assert sum(r.batch_n for r in et_rows) == want_totals[et]
        # exactly one first-batch row without a baseline
        assert sum(1 for r in et_rows if r.baseline_mean is None) == 1

    # batch fallback = the windowed batch operator
    batch_out = streaming_anomaly_scores(events_batch)
    assert set(batch_out.columns) == {
        "event_type", "bucket_ts", "n_events", "baseline_mean", "zscore"
    }


def test_streaming_anomaly_restart_restores_state(spark, events_batch, tmp_path):
    """Kill-and-restart idempotence + state continuity for the Welford
    pipeline (mirrors test_stream_rollup's checkpoint-restart pattern):
    a restart with no new input emits nothing new, and a restart with
    one more source file scores it against the RESTORED baseline (every
    emitted row has a non-NULL baseline — proof state was recovered from
    the checkpoint, not rebuilt from scratch)."""
    from vertica_hadoop_integration__spark.streaming.stateful import (
        streaming_anomaly_scores,
    )

    src_dir = tmp_path / "anom_src"
    out_dir = str(tmp_path / "anom_out")
    ckpt = str(tmp_path / "anom_ckpt")
    events_batch.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        str(src_dir), mode="append"
    )

    def _sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out_dir)

    def _run_once():
        src = (
            spark.readStream.schema(events_batch.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src_dir))
        )
        q = (
            streaming_anomaly_scores(src)
            .writeStream.foreachBatch(_sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _run_once()
    n_first = spark.read.parquet(out_dir).count()
    assert n_first > 0

    # restart, no new files: checkpoint replays nothing, output unchanged
    _run_once()
    assert spark.read.parquet(out_dir).count() == n_first

    # one more file, restart: new rows must be scored against the
    # baseline built in run 1 (state restored across the restart)
    events_batch.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        str(src_dir), mode="append"
    )
    _run_once()
    out = spark.read.parquet(out_dir)
    new_rows = out.count() - n_first
    assert new_rows > 0
    assert out.filter(F.col("baseline_mean").isNull()).count() <= len(
        [r.event_type for r in events_batch.select("event_type").distinct().collect()]
    )
    # total scored volume across all runs covers every event exactly once
    assert (
        out.agg(F.sum("batch_n")).first()[0] == events_batch.count()
    )


def test_stream_stream_attribution_restart_is_idempotent(
    spark, events_batch, events_stream_dir, tmp_path
):
    """Kill-and-restart idempotence for the watermarked stream-stream
    join: run to completion into a parquet sink, restart on the same
    checkpoint with no new input — row set unchanged (no re-emitted
    pairs from replayed state)."""
    from vertica_hadoop_integration__spark.streaming.joins import (
        attribute_purchases,
    )

    out_dir = str(tmp_path / "attr_out")
    ckpt = str(tmp_path / "attr_ckpt")

    def _run_once():
        src = _stream_source(spark, events_stream_dir, events_batch)
        joined = attribute_purchases(
            src.filter(F.col("event_type") == "click"),
            src.filter(F.col("event_type") == "purchase"),
            window="30 minutes",
            watermark="10 minutes",
        )
        q = (
            joined.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _run_once()
    first = sorted(
        tuple(r)
        for r in spark.read.parquet(out_dir)
        .select("user_id", "click_id", "purchase_id")
        .collect()
    )
    assert first

    _run_once()
    second = sorted(
        tuple(r)
        for r in spark.read.parquet(out_dir)
        .select("user_id", "click_id", "purchase_id")
        .collect()
    )
    assert second == first


def test_stream_stream_attribution_matches_batch(
    spark, events_batch, events_stream_dir, tmp_path
):
    """Watermarked stream-stream click->purchase join emits exactly the
    pairs the identical batch join produces (both sides replayed with
    availableNow; final watermark passes all data)."""
    from vertica_hadoop_integration__spark.streaming.joins import (
        attribute_purchases,
    )

    def _split(df):
        return (
            df.filter(F.col("event_type") == "click"),
            df.filter(F.col("event_type") == "purchase"),
        )

    sc, sp = _split(_stream_source(spark, events_stream_dir, events_batch))
    got = _run_stream(
        spark,
        attribute_purchases(sc, sp, window="30 minutes", watermark="10 minutes"),
        tmp_path,
        "attr_t",
        "append",
    )
    bc, bp = _split(events_batch)
    want = attribute_purchases(bc, bp, window="30 minutes")
    cols = ["user_id", "click_id", "purchase_id"]
    got_rows = _sorted_rows(got, cols)
    want_rows = _sorted_rows(want, cols)
    assert got_rows == want_rows and got_rows
