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
    make_attribution_sink,
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

    def test_crash_between_state_and_ledger_replays_clean(
        self, spark, tmp_path, monkeypatch
    ):
        """r09 ADVICE (medium): a crash AFTER the touch-state write but
        BEFORE the ledger mark must not poison the replay.  Scenario:
        batch 0 carries a click; batch 1 has a purchase followed by a
        LATER signup.  The crashed first attempt of batch 1 leaves its
        own snapshot (containing the signup) on disk; with in-place
        state the replay would credit the signup — a touch that
        happened AFTER the conversion.  Snapshot-per-batch resolution
        (strictly earlier id) + the (ts, id) precedence gate keep the
        replay identical to the first attempt: credit goes to the
        click."""
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
                (2, dt.datetime(2024, 1, 2, 10), 7, "purchase", 5.0),
                (3, dt.datetime(2024, 1, 2, 11), 7, "signup", 0.0),
            ],
            schema,
        )
        report = str(tmp_path / "report_crash")
        sink = make_attribution_sink(report, str(tmp_path / "led_crash"))
        sink(b0, 0)

        # first attempt of batch 1: dies exactly at mark_complete —
        # delta, report AND state snapshot 1 are already on disk
        real_mark = Ledger.mark_complete

        def _boom(self, key, val):
            raise RuntimeError("simulated crash before ledger commit")

        monkeypatch.setattr(Ledger, "mark_complete", _boom)
        with pytest.raises(RuntimeError, match="simulated crash"):
            sink(b1, 1)
        import os

        assert os.path.isdir(f"{report}__touch/1"), (
            "crash simulation must leave the orphan snapshot behind"
        )
        monkeypatch.setattr(Ledger, "mark_complete", real_mark)

        # the replay (same batch id) must converge to the batch twin
        sink(b1, 1)
        got = _canon(read_report(spark, report))
        expected = _canon(
            attribution_last_touch(b0.unionByName(b1), window_days=7)
        )
        assert got == expected
        assert got == [("click", 1, 5.0)], (
            "replay credited a touch later than the conversion"
        )

    def test_equal_ts_tie_breaks_by_event_id_like_batch(
        self, spark, tmp_path
    ):
        """Carried-vs-new touches with IDENTICAL timestamps resolve by
        event_id, matching the batch operator's (ts, event_id) window
        order — including when the carried touch has the HIGHER id
        (r09 ADVICE: a ts-only merge was nondeterministic here)."""
        import datetime as dt

        schema = (
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double"
        )
        t = dt.datetime(2024, 1, 1, 10)
        # carried touch id 6 > in-batch touch id 5, same ts: the batch
        # window orders click(5) before view(6), so view must win
        b0 = spark.createDataFrame([(6, t, 7, "view", 0.0)], schema)
        b1 = spark.createDataFrame(
            [
                (5, t, 7, "click", 0.0),
                (9, dt.datetime(2024, 1, 2), 7, "purchase", 3.0),
            ],
            schema,
        )
        report = str(tmp_path / "report_tie")
        sink = make_attribution_sink(report, str(tmp_path / "led_tie"))
        sink(b0, 0)
        sink(b1, 1)
        got = _canon(read_report(spark, report))
        expected = _canon(
            attribution_last_touch(b0.unionByName(b1), window_days=7)
        )
        assert got == expected == [("view", 1, 3.0)]

    def test_snapshots_pruned_to_constant_count(self, spark, tmp_path):
        """Committed batches prune every strictly-older snapshot, so
        live touch-state storage is O(1) snapshots regardless of how
        many batches have run."""
        import datetime as dt
        import os

        schema = (
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double"
        )
        report = str(tmp_path / "report_prune")
        sink = make_attribution_sink(report, str(tmp_path / "led_prune"))
        for b in range(4):
            df = spark.createDataFrame(
                [(b + 1, dt.datetime(2024, 1, 1 + b), 7, "click", 0.0)],
                schema,
            )
            sink(df, b)
        snaps = [d for d in os.listdir(f"{report}__touch") if d.isdigit()]
        assert snaps == ["3"], f"stale snapshots not pruned: {snaps}"


class TestLegacyStateMigration:
    """r10 ADVICE: pre-snapshot deployments kept touch state as in-place
    parquet directly under touch_dir (without the t_id column).  The
    first post-upgrade batch must rewrite it as snapshot 0 — with t_id
    backfilled to the always-loses-ties sentinel — so conversions that
    straddle the upgrade keep their carried touches instead of being
    silently attributed organic."""

    def test_legacy_inplace_state_carries_across_upgrade(
        self, spark, tmp_path
    ):
        import datetime as dt

        from vertica_hadoop_integration__spark.streaming.attribution import (
            _LEGACY_TID_SENTINEL,
            touch_dir_for,
        )

        report = str(tmp_path / "rep_legacy")
        touch_dir = touch_dir_for(report)
        # legacy layout: parquet part-files DIRECTLY under touch_dir,
        # schema (user_id, t_ts, t_ty) — no t_id, no snapshot subdir
        legacy = spark.createDataFrame(
            [(7, dt.datetime(2024, 1, 1, 9), "click")],
            "user_id long, t_ts timestamp, t_ty string",
        )
        legacy.coalesce(1).write.parquet(touch_dir)
        sink = make_attribution_sink(report, str(tmp_path / "led_legacy"))
        # post-upgrade batch: user 7 converts with NO in-batch touch —
        # only the migrated legacy carry can claim the credit
        batch = spark.createDataFrame(
            [
                (
                    10,
                    dt.datetime(2024, 1, 2, 9),
                    7,
                    "purchase",
                    3.0,
                )
            ],
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double",
        )
        sink(batch, 5)
        got = _canon(read_report(spark, report))
        assert got == [("click", 1, 3.0)]
        # migrated snapshot 0 exists with the sentinel id; legacy
        # part-files are gone
        import os

        snap = spark.read.parquet(f"{touch_dir}/5")
        assert "t_id" in snap.columns
        root_files = [
            e for e in os.listdir(touch_dir)
            if os.path.isfile(os.path.join(touch_dir, e))
            and (e.startswith("part-") or e.endswith(".parquet"))
        ]
        assert root_files == []
        # the sentinel loses a (ts, id) tie against a real event id
        assert _LEGACY_TID_SENTINEL == -(2**63)

    def test_migration_skipped_when_snapshots_exist(self, spark, tmp_path):
        """A directory already on the snapshot layout is never touched
        by the migration, even if stray files sit at the root."""
        import datetime as dt
        import os

        from vertica_hadoop_integration__spark.streaming.attribution import (
            touch_dir_for,
        )

        report = str(tmp_path / "rep_mixed")
        touch_dir = touch_dir_for(report)
        sink = make_attribution_sink(report, str(tmp_path / "led_mixed"))
        b0 = spark.createDataFrame(
            [(1, dt.datetime(2024, 2, 1, 9), 3, "view", 0.0)],
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double",
        )
        sink(b0, 0)  # creates snapshot 0 in the NEW layout
        # a stray root-level file (e.g. an old _SUCCESS) must not
        # trigger a rewrite of the existing snapshots
        open(os.path.join(touch_dir, "_SUCCESS"), "w").close()
        b1 = spark.createDataFrame(
            [(2, dt.datetime(2024, 2, 1, 10), 3, "purchase", 2.0)],
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double",
        )
        sink(b1, 1)
        got = _canon(read_report(spark, report))
        assert got == [("view", 1, 2.0)]
