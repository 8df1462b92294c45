"""Streaming decontamination (streaming/decontaminate.py): two
micro-batches each containing docs that overlap the eval suite — the
contaminated docs must be dropped in every batch, clean docs kept, and
a checkpoint restart must not double-ingest."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vertica_hadoop_integration__spark.operators.corpus import (
    decontaminate,
    eval_shingle_set,
)
from vertica_hadoop_integration__spark.sources import load_table
from vertica_hadoop_integration__spark.streaming.decontaminate import (
    stream_decontaminate_load,
)


@pytest.fixture()
def staged(spark, sf_dir, tmp_path):
    """Two source files of training docs; the eval suite is built from a
    slice of each file, so both micro-batches contain contamination."""
    docs = load_table(spark, sf_dir, "documents")
    b1 = docs.filter(F.col("doc_id") < 60)
    b2 = docs.filter((F.col("doc_id") >= 60) & (F.col("doc_id") < 120))
    ev = docs.filter(
        (F.col("doc_id") % 10 == 0) & (F.col("doc_id") < 120)
    ).select("text")
    src = tmp_path / "src"
    b1.coalesce(1).write.parquet(str(src), mode="append")
    b2.coalesce(1).write.parquet(str(src), mode="append")
    return str(src), docs.filter(F.col("doc_id") < 120), ev, docs.schema


def _run(spark, src, ev_shingles, tmp_path, tag, schema):
    out = str(tmp_path / f"out_{tag}")
    led = str(tmp_path / f"led_{tag}")
    ckpt = str(tmp_path / f"ckpt_{tag}")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_decontaminate_load(
        stream, ev_shingles, dest_dir=out, ledger_path=led,
        shingle_n=5, checkpoint_dir=ckpt,
    )
    q.awaitTermination(180)
    return out, led, ckpt


def test_stream_decontaminate_matches_batch_and_restarts_once(
    spark, staged, tmp_path
):
    src, all_docs, ev, schema = staged
    ev_shingles = eval_shingle_set(ev, shingle_n=5).cache()
    out, led, ckpt = _run(spark, src, ev_shingles, tmp_path, "t1", schema)
    got = spark.read.option("recursiveFileLookup", "true").orc(out)
    got_ids = {r.doc_id for r in got.select("doc_id").collect()}

    # streamed result == batch decontaminate over the same population
    want_ids = {
        r.doc_id
        for r in decontaminate(all_docs, ev_shingles, shingle_n=5, mode="drop")
        .select("doc_id")
        .collect()
    }
    assert got_ids == want_ids
    # the eval slice itself (every 10th doc) is contamination by
    # construction and must be gone
    assert not {i for i in got_ids if i % 10 == 0 and i < 120}
    assert got_ids  # but the stream kept the clean majority

    # restart over the same checkpoint: no new files -> no new output
    before = got.count()
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_decontaminate_load(
        stream, ev_shingles, dest_dir=out, ledger_path=led,
        shingle_n=5, checkpoint_dir=ckpt,
    )
    q.awaitTermination(120)
    after = spark.read.option("recursiveFileLookup", "true").orc(out).count()
    assert after == before
