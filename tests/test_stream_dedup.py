"""Streaming incremental dedup ingest (streaming/dedup.py): two
micro-batches where the second contains copies of the first — the copies
must be dropped via the persisted index, the survivors must be globally
near-dup-free, and a restart must not double-ingest."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from vertica_hadoop_integration__spark.operators.dedup import minhash_dedup
from vertica_hadoop_integration__spark.sources import load_table
from vertica_hadoop_integration__spark.streaming.dedup import stream_dedup_load


@pytest.fixture()
def staged(spark, sf_dir, tmp_path):
    """Two source files: file1 = docs A, file2 = byte-identical copies of
    A under new ids (+10000) plus fresh docs B."""
    docs = load_table(spark, sf_dir, "documents")
    a = docs.filter(F.col("doc_id") < 50)
    b = docs.filter((F.col("doc_id") >= 50) & (F.col("doc_id") < 100))
    a_copies = a.withColumn("doc_id", F.col("doc_id") + 10000)
    src = tmp_path / "src"
    a.coalesce(1).write.parquet(str(src), mode="append")
    a_copies.unionByName(b).coalesce(1).write.parquet(str(src), mode="append")
    return str(src), a, b, a_copies, docs.schema


def _run(spark, src, schema, tmp_path, tag):
    out = str(tmp_path / f"out_{tag}")
    idx = str(tmp_path / f"idx_{tag}")
    led = str(tmp_path / f"led_{tag}")
    ckpt = str(tmp_path / f"ckpt_{tag}")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_dedup_load(
        stream, index_dir=idx, dest_dir=out, ledger_path=led,
        min_jaccard=0.8, checkpoint_dir=ckpt,
    )
    q.awaitTermination(180)
    return out, idx, led, ckpt


def test_stream_dedup_drops_cross_batch_copies(spark, staged, tmp_path):
    src, a, b, a_copies, schema = staged
    out, idx, led, ckpt = _run(spark, src, schema, tmp_path, "t1")
    got = spark.read.option("recursiveFileLookup", "true").orc(out)
    got_ids = {r.doc_id for r in got.select("doc_id").collect()}
    copy_ids = {r.doc_id for r in a_copies.select("doc_id").collect()}
    # every byte-identical copy was caught by the index probe
    assert got_ids & copy_ids == set()
    # survivors come only from the original population
    orig_ids = {r.doc_id for r in a.select("doc_id").collect()} | {
        r.doc_id for r in b.select("doc_id").collect()
    }
    assert got_ids <= orig_ids and got_ids
    # the surviving corpus is globally near-dup-free at the threshold
    leftover = minhash_dedup(got, num_hashes=16, bands=8, min_jaccard=0.8)
    assert leftover.count() == 0
    # the index grew with the ingested docs
    n_indexed = spark.read.parquet(os.path.join(idx, "verify")).count()
    assert n_indexed == len(got_ids)


def test_stream_dedup_restart_is_exactly_once(spark, staged, tmp_path):
    src, a, b, a_copies, schema = staged
    out, idx, led, ckpt = _run(spark, src, schema, tmp_path, "t2")
    before = spark.read.option("recursiveFileLookup", "true").orc(out).count()
    n_idx_before = spark.read.parquet(os.path.join(idx, "verify")).count()
    # restart over the same checkpoint: no new files -> no new batches;
    # a replayed batch id would be skipped by the ledger guard
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_dedup_load(
        stream, index_dir=idx, dest_dir=out, ledger_path=led,
        min_jaccard=0.8, checkpoint_dir=ckpt,
    )
    q.awaitTermination(120)
    after = spark.read.option("recursiveFileLookup", "true").orc(out).count()
    n_idx_after = spark.read.parquet(os.path.join(idx, "verify")).count()
    assert after == before
    assert n_idx_after == n_idx_before
