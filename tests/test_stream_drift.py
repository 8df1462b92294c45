"""Streaming PSI drift monitor (streaming/drift.py): per-batch PSI rows
must match the batch twin (operators/profile.py::distribution_drift)
computed over the same slices against the same frozen reference, the
planted-drift batch must alarm while the stable batch must not, and a
checkpoint restart must not duplicate serving rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from vertica_hadoop_integration__spark.operators.profile import (
    distribution_drift,
)
from vertica_hadoop_integration__spark.streaming.drift import (
    stream_drift_monitor,
)


def _mk(spark, lo, n):
    return spark.range(0, n).select(
        ((F.col("id") % 100) + lo).cast("double").alias("v")
    )


def _run(spark, src, schema, ref, tmp_path):
    out = str(tmp_path / "serve")
    led = str(tmp_path / "led")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_drift_monitor(
        stream, ref, "v", out_dir=out, ledger_path=led, checkpoint_dir=ckpt
    )
    q.awaitTermination(180)
    return out, led, ckpt


def test_stream_drift_matches_batch_twin_and_restart_is_stable(
    spark, tmp_path
):
    ref = _mk(spark, 0, 2000)
    stable = _mk(spark, 0, 1500)      # same distribution
    drifted = _mk(spark, 80, 1500)    # hard level shift
    src = str(tmp_path / "src")
    stable.coalesce(1).write.parquet(src, mode="append")
    drifted.coalesce(1).write.parquet(src, mode="append")

    out, led, ckpt = _run(spark, src, stable.schema, ref, tmp_path)
    rows = sorted(
        spark.read.option("recursiveFileLookup", "true").parquet(out).collect(),
        key=lambda r: r["batch_id"],
    )
    assert len(rows) == 2
    assert {r["n_rows"] for r in rows} == {1500}
    psis = sorted(r["psi"] for r in rows)
    alarms = {round(r["psi"], 6): r["alarm"] for r in rows}

    # batch-twin parity: the streamed PSI equals sum(psi_term) of the
    # batch operator over the same slice (driver fold vs DECIMAL-summed
    # Spark terms — identical up to summation-order ulps)
    for slice_df in (stable, drifted):
        want = sum(
            r["psi_term"]
            for r in distribution_drift(ref, slice_df, "v").collect()
        )
        assert any(abs(p - want) < 1e-9 for p in psis), (want, psis)

    # the drifted batch alarms, the stable one does not
    assert alarms[max(alarms)] is True
    assert alarms[min(alarms)] is False
    assert min(psis) < 0.01 and max(psis) > 0.2

    # KS rides the same bin counts: the drifted batch's sup-CDF gap is
    # large and alarmed, the stable batch's is tiny; each equals the
    # batch twin (operators/profile.py::ks_drift) at the same cut count
    from vertica_hadoop_integration__spark.operators.profile import ks_drift

    ks_by_alarm = {r["ks_alarm"]: r["ks"] for r in rows}
    assert ks_by_alarm[True] > 0.5      # 80/100 shift
    assert ks_by_alarm[False] < 0.05
    streamed_ks = sorted(r["ks"] for r in rows)
    for slice_df in (stable, drifted):
        (want,) = ks_drift(ref, slice_df, "v", num_bins=10).collect()
        assert any(
            abs(k - want["ks_stat"]) < 1e-12 for k in streamed_ks
        ), (want["ks_stat"], streamed_ks)

    # restart on the same checkpoint: no new files -> identical serving rows
    before = sorted(map(tuple, rows))
    stream = (
        spark.readStream.schema(stable.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_drift_monitor(
        stream,
        ref,
        "v",
        out_dir=out,
        ledger_path=led,
        checkpoint_dir=ckpt,
    )
    q.awaitTermination(120)
    after = sorted(
        map(
            tuple,
            spark.read.option("recursiveFileLookup", "true")
            .parquet(out)
            .collect(),
        )
    )
    assert after == before


def test_stream_drift_by_group_localizes_and_flags_unknown_segment(
    spark, tmp_path
):
    """Grouped streaming PSI: a shift confined to one segment alarms
    only that segment (batch-twin parity per segment); a segment absent
    from the frozen reference surfaces with NULL psi + alarm, never
    silently dropped."""
    from vertica_hadoop_integration__spark.operators.profile import (
        distribution_drift_by_group,
    )
    from vertica_hadoop_integration__spark.streaming.drift import (
        stream_drift_monitor_by_group,
    )

    def _mk(shift_a, n, with_new=False):
        base = spark.range(0, n).select(
            F.when(F.col("id") % 2 == 0, "A").otherwise("B").alias("g"),
            F.when(
                F.col("id") % 2 == 0, (F.col("id") % 100) + shift_a
            ).otherwise(F.col("id") % 100).cast("double").alias("v"),
        )
        if with_new:
            extra = spark.range(0, 50).select(
                F.lit("NEWFEED").alias("g"),
                (F.col("id") % 10).cast("double").alias("v"),
            )
            base = base.unionByName(extra)
        return base

    ref = _mk(0, 4000)
    batch = _mk(80, 3000, with_new=True)  # A shifted, B stable, NEWFEED unseen
    src = str(tmp_path / "src")
    batch.coalesce(1).write.parquet(src)

    out = str(tmp_path / "out")
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_drift_monitor_by_group(
        stream,
        ref,
        "v",
        "g",
        out_dir=out,
        ledger_path=str(tmp_path / "led"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    rows = {
        r["g"]: r
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(out)
        .collect()
    }
    assert set(rows) == {"A", "B", "NEWFEED"}
    assert rows["A"]["alarm"] is True and rows["A"]["psi"] > 0.2
    assert rows["B"]["alarm"] is False and rows["B"]["psi"] < 0.01
    assert rows["NEWFEED"]["psi"] is None and rows["NEWFEED"]["alarm"] is True
    assert rows["NEWFEED"]["n_rows"] == 50
    # KS rides along per segment: the shifted segment's sup-CDF gap is
    # large and alarmed, the stable one tiny, the unknown feed NULL+alarm
    assert rows["A"]["ks_alarm"] is True and rows["A"]["ks"] > 0.5
    assert rows["B"]["ks_alarm"] is False and rows["B"]["ks"] < 0.05
    assert rows["NEWFEED"]["ks"] is None and rows["NEWFEED"]["ks_alarm"] is True

    # per-segment batch-twin parity: streamed PSI == sum(psi_term) of the
    # batch operator for the segments the reference knows
    want = {}
    for r in distribution_drift_by_group(
        ref, batch.filter(F.col("g") != "NEWFEED"), "v", "g"
    ).collect():
        want[r["g"]] = want.get(r["g"], 0.0) + r["psi_term"]
    for g in ("A", "B"):
        assert abs(rows[g]["psi"] - want[g]) < 1e-9, (g, rows[g]["psi"], want[g])
