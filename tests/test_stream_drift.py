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
