"""Streaming C4-style chunk dedup (streaming/dedup.py::
stream_chunk_dedup_load): streamed in doc_id-ordered batches it must
produce EXACTLY the batch corpus_paragraph_dedup result, cross-batch
repeated chunks must die via the persisted hash index, and a checkpoint
restart must not double-ingest."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from vertica_hadoop_integration__spark.operators.corpus import (
    chunk_fixed,
    reassemble_chunks,
)
from vertica_hadoop_integration__spark.sources import load_table
from vertica_hadoop_integration__spark.streaming.dedup import (
    stream_chunk_dedup_load,
)


@pytest.fixture()
def staged(spark, sf_dir, tmp_path):
    """Two source files split by doc_id so batch order equals global
    first-occurrence order."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    lo = docs.filter(F.col("doc_id") < 250)
    hi = docs.filter(F.col("doc_id") >= 250)
    src = tmp_path / "src"
    lo.coalesce(1).write.parquet(str(src), mode="append")
    hi.coalesce(1).write.parquet(str(src), mode="append")
    return str(src), docs


def _batch_expected(docs):
    chunks = chunk_fixed(docs, chunk_size=20)
    w = Window.partitionBy("chunk").orderBy("doc_id", "chunk_idx")
    kept = chunks.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    return reassemble_chunks(kept)


def _run(spark, src, schema, tmp_path):
    out = str(tmp_path / "out")
    idx = str(tmp_path / "idx")
    led = str(tmp_path / "led")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_chunk_dedup_load(
        stream, index_dir=idx, dest_dir=out, ledger_path=led,
        checkpoint_dir=ckpt,
    )
    q.awaitTermination(180)
    return out, idx, led, ckpt


def _canon(df):
    return sorted(
        (r.doc_id, r.dedup_text, r.n_chunks_kept, r.n_chunks_total)
        for r in df.collect()
    )


def test_stream_chunk_dedup_matches_batch_and_restart(spark, staged, tmp_path):
    src, docs = staged
    out, idx, led, ckpt = _run(spark, src, docs.schema, tmp_path)

    got = spark.read.orc(out + "/batch=*")
    want = _batch_expected(docs)
    assert _canon(got) == _canon(want)

    # the persisted index holds exactly the distinct surviving hashes
    n_idx = spark.read.parquet(idx + "/chunk_hashes").count()
    n_kept = want.agg(F.sum("n_chunks_kept")).first()[0]
    assert n_idx == n_kept

    # restart on the same checkpoint, no new input: nothing re-lands
    before = _canon(spark.read.orc(out + "/batch=*"))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_chunk_dedup_load(
        stream, index_dir=idx, dest_dir=out, ledger_path=led,
        checkpoint_dir=ckpt,
    )
    q.awaitTermination(120)
    assert _canon(spark.read.orc(out + "/batch=*")) == before
    assert spark.read.parquet(idx + "/chunk_hashes").count() == n_idx


# -- streaming inverted-index maintenance (streaming/indexing.py) ----------


def test_stream_index_matches_batch_and_replay_safe(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from vertica_hadoop_integration__spark.operators.text import inverted_index
    from vertica_hadoop_integration__spark.sources import load_table
    from vertica_hadoop_integration__spark.streaming.indexing import (
        compact_index,
        read_index,
        stream_index_load,
    )

    docs = load_table(spark, sf_dir, "documents")
    src = tmp_path / "docsrc"
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(
        str(src), mode="append"
    )
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(
        str(src), mode="append"
    )
    deltas = str(tmp_path / "idx_deltas")
    led = str(tmp_path / "idx_led")
    ckpt = str(tmp_path / "idx_ckpt")

    def _start():
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        return stream_index_load(
            stream, deltas_dir=deltas, ledger_path=led, checkpoint_dir=ckpt
        )

    q = _start()
    q.awaitTermination(180)

    def _canon(df):
        return sorted((r.term, r.doc_id, r.tf) for r in df.collect())

    got = _canon(read_index(spark, deltas))
    want = _canon(inverted_index(docs))
    assert got == want

    # restart on same checkpoint: no new files -> index unchanged
    q2 = _start()
    q2.awaitTermination(180)
    assert _canon(read_index(spark, deltas)) == want

    # compaction preserves content and produces a bucketed catalog table
    compact_index(spark, deltas, "idx_base_test", buckets=4)
    try:
        assert _canon(spark.table("idx_base_test")) == want
    finally:
        spark.sql("DROP TABLE IF EXISTS idx_base_test")


# -- streaming CDC apply (streaming/cdc.py) --------------------------------


def test_stream_cdc_apply_matches_batch_and_replay_safe(spark, tmp_path):
    import pandas as pd
    from pyspark.sql import functions as F

    from vertica_hadoop_integration__spark.streaming.cdc import stream_cdc_apply

    base_dir = str(tmp_path / "cdc_base")
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], ["k", "v"]
    ).coalesce(1).write.parquet(base_dir)

    # two changelog files -> two micro-batches
    src = tmp_path / "cdc_log"
    spark.createDataFrame(
        [("U", 1, 1, "a2"), ("D", 1, 2, "x")], ["op", "seq", "k", "v"]
    ).coalesce(1).write.parquet(str(src), mode="append")
    # the file source orders batches by modification time; per-key
    # cross-batch ordering is the upstream's contract (see module doc),
    # so pin the fixture's intended order explicitly
    import time as _time

    _time.sleep(1.1)
    spark.createDataFrame(
        [("D", 2, 1, "x"), ("I", 1, 9, "new"), ("U", 1, 3, "c2")],
        ["op", "seq", "k", "v"],
    ).coalesce(1).write.parquet(str(src), mode="append")

    led = str(tmp_path / "cdc_led")
    ckpt = str(tmp_path / "cdc_ckpt")
    schema = "op string, seq bigint, k bigint, v string"

    def _start():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        return stream_cdc_apply(
            stream, base_dir=base_dir, ledger_path=led, key_cols=["k"],
            checkpoint_dir=ckpt,
        )

    q = _start()
    q.awaitTermination(180)

    def _canon():
        return sorted((r.k, r.v) for r in spark.read.parquet(base_dir).collect())

    # k=1 updated then deleted (across batches), k=2 deleted, k=3 updated,
    # k=9 inserted, k=4 untouched
    assert _canon() == [(3, "c2"), (4, "d"), (9, "new")]

    # restart on same checkpoint: no new files -> snapshot unchanged
    q2 = _start()
    q2.awaitTermination(180)
    assert _canon() == [(3, "c2"), (4, "d"), (9, "new")]


def test_stream_cdc_out_of_order_batch_is_noop(spark, tmp_path):
    """A later micro-batch carrying LOWER-seq changes for already-applied
    keys must not roll back newer state (applied-seq frontier sidecar):
    stale upserts are dropped, stale upserts on deleted keys do not
    resurrect them, and genuinely-new keys in the same batch still land."""
    import time as _time

    from vertica_hadoop_integration__spark.streaming.cdc import stream_cdc_apply

    base_dir = str(tmp_path / "cdc_base")
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "v"]
    ).coalesce(1).write.parquet(base_dir)

    src = tmp_path / "cdc_log"
    # batch 1: high-seq update of k=1, high-seq delete of k=2
    spark.createDataFrame(
        [("U", 5, 1, "new5"), ("D", 5, 2, "x")], ["op", "seq", "k", "v"]
    ).coalesce(1).write.parquet(str(src), mode="append")
    _time.sleep(1.1)  # file source orders batches by modification time
    # batch 2 (late, lower seq): stale update of k=1, zombie insert of
    # deleted k=2, plus a legitimately new key k=7
    spark.createDataFrame(
        [("U", 3, 1, "old3"), ("I", 2, 2, "zombie"), ("I", 1, 7, "g")],
        ["op", "seq", "k", "v"],
    ).coalesce(1).write.parquet(str(src), mode="append")

    stream = (
        spark.readStream.schema("op string, seq bigint, k bigint, v string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = stream_cdc_apply(
        stream,
        base_dir=base_dir,
        ledger_path=str(tmp_path / "cdc_led"),
        key_cols=["k"],
        checkpoint_dir=str(tmp_path / "cdc_ckpt"),
    )
    q.awaitTermination(180)

    got = sorted((r.k, r.v) for r in spark.read.parquet(base_dir).collect())
    assert got == [(1, "new5"), (3, "c"), (7, "g")]
    # frontier retains the max applied seq per key, deletes included
    fr = sorted(
        (r.k, r.applied_seq)
        for r in spark.read.parquet(base_dir + "__frontier").collect()
    )
    assert fr == [(1, 5), (2, 5), (7, 1)]


def test_compaction_cadence_probe_zero_exchange(spark, sf_dir, tmp_path):
    """Many small posting deltas -> one compaction -> a term-probe join
    against the bucketed base runs with ZERO exchange when the probe
    side shares the bucket layout (the compaction-cadence contract:
    between compactions probes read base + small deltas; after one,
    the co-located layout is restored)."""
    from pyspark.sql import functions as F

    from vertica_hadoop_integration__spark.operators.text import inverted_index
    from vertica_hadoop_integration__spark.sources import load_table
    from vertica_hadoop_integration__spark.sources.writers import write_bucketed
    from vertica_hadoop_integration__spark.streaming.indexing import (
        compact_index,
        read_index,
        stream_index_load,
    )

    docs = load_table(spark, sf_dir, "documents")
    src = tmp_path / "docsrc6"
    for m in range(6):  # six tiny delta batches
        docs.filter(F.col("doc_id") % 6 == m).coalesce(1).write.parquet(
            str(src), mode="append"
        )
    deltas = str(tmp_path / "idx_deltas6")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = stream_index_load(
        stream,
        deltas_dir=deltas,
        ledger_path=str(tmp_path / "led6"),
        checkpoint_dir=str(tmp_path / "ckpt6"),
    )
    q.awaitTermination(240)
    import os

    assert len([d for d in os.listdir(deltas) if d.startswith("batch=")]) == 6

    compact_index(spark, deltas, "idx_base_cadence", buckets=4)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # content parity: compacted base == batch index over all docs
        want = sorted(
            (r.term, r.doc_id, r.tf) for r in inverted_index(docs).collect()
        )
        base = spark.table("idx_base_cadence")
        assert sorted((r.term, r.doc_id, r.tf) for r in base.collect()) == want

        # probe side bucketed identically -> SMJ with zero Exchange
        probes = base.select("term").distinct().limit(20)
        write_bucketed(
            probes, "idx_probe_terms", ["term"], num_buckets=4,
            sort_cols=["term"],
        )
        joined = spark.table("idx_base_cadence").join(
            spark.table("idx_probe_terms"), on="term"
        )
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        tree = plan.split("\n\n")[0]
        assert "SortMergeJoin" in tree, tree
        assert tree.count("Exchange") == 0, tree
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS idx_base_cadence")
        spark.sql("DROP TABLE IF EXISTS idx_probe_terms")


def test_stream_cdc_chunker_dedups_shifted_copy_where_fixed_cannot(
    spark, tmp_path
):
    """The CDC chunker's reason to exist, demonstrated across batches:
    batch 2 carries a near-copy of batch 1's doc with ONE token
    prepended.  Fixed-width boundaries all shift (no chunk hash
    matches the index -> the whole copy lands again); content-defined
    boundaries resynchronize after the first boundary token, so the
    copy's shared chunks die against the index and only a small
    prefix survives."""
    base = " ".join(f"w{i}" for i in range(400))
    shifted = "INSERTED " + base
    df1 = spark.createDataFrame([(1, base)], "doc_id long, text string")
    df2 = spark.createDataFrame([(2, shifted)], "doc_id long, text string")
    src = tmp_path / "src"
    df1.coalesce(1).write.parquet(str(src), mode="append")
    df2.coalesce(1).write.parquet(str(src), mode="append")

    def run(chunker, sub):
        out = str(tmp_path / sub / "out")
        stream = (
            spark.readStream.schema(df1.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = stream_chunk_dedup_load(
            stream,
            index_dir=str(tmp_path / sub / "idx"),
            dest_dir=out,
            ledger_path=str(tmp_path / sub / "led"),
            checkpoint_dir=str(tmp_path / sub / "ckpt"),
            chunker=chunker,
        )
        q.awaitTermination(180)
        got = spark.read.orc(out + "/batch=*")
        return {r.doc_id: r for r in got.collect()}

    cdc = run("cdc", "cdc")
    fixed = run("fixed", "fixed")

    # doc 1 lands fully under both chunkers
    assert cdc[1].dedup_text == base
    assert fixed[1].dedup_text == base
    # fixed-width: every boundary shifted -> nothing dedups, the whole
    # copy survives
    assert fixed[2].n_chunks_kept == fixed[2].n_chunks_total
    # CDC: most of the copy's chunks hit the index; only the prefix up
    # to the first resynchronized boundary survives
    assert cdc[2].n_chunks_kept < cdc[2].n_chunks_total
    assert cdc[2].n_chunks_kept <= max(2, cdc[2].n_chunks_total // 4)
    # faithful reassembly: the surviving prefix is a prefix of the
    # shifted text (normalize=False preserves the original tokens)
    assert shifted.startswith(cdc[2].dedup_text.split(" ")[0])
