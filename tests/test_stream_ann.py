"""Streaming IVF index maintenance (streaming/ann_index.py): the
stream-built index must probe identically to the batch-built one over
the same corpus and centroids, and a checkpoint restart must not
duplicate index rows."""

from pyspark.sql import functions as F

from vertica_hadoop_integration__spark.operators.similarity import (
    build_ivf_index,
    ivf_topk,
)
from vertica_hadoop_integration__spark.sources import load_table
from vertica_hadoop_integration__spark.streaming.ann_index import (
    bootstrap_centroids,
    probe_index,
    stream_embedding_index_load,
)


def test_stream_ivf_index_matches_batch_and_replay_safe(spark, sf_dir, tmp_path):
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cdir = str(tmp_path / "cents")
    bootstrap_centroids(e, cdir, every_nth=50)

    src = tmp_path / "vecsrc"
    e.filter(F.col("vec_id") % 2 == 0).coalesce(1).write.parquet(
        str(src), mode="append"
    )
    e.filter(F.col("vec_id") % 2 == 1).coalesce(1).write.parquet(
        str(src), mode="append"
    )
    deltas = str(tmp_path / "ivf_deltas")
    led = str(tmp_path / "ivf_led")
    ckpt = str(tmp_path / "ivf_ckpt")

    def _start():
        stream = (
            spark.readStream.schema(e.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        return stream_embedding_index_load(
            stream, centroids_dir=cdir, deltas_dir=deltas,
            ledger_path=led, checkpoint_dir=ckpt,
        )

    q = _start()
    q.awaitTermination(240)

    queries = e.filter(F.col("vec_id") < 10)
    got = sorted(
        (r.query_id, r.neighbor_id, r.rank)
        for r in probe_index(spark, cdir, deltas, queries, k=5, nprobe=3).collect()
    )
    cents = spark.read.parquet(cdir)
    batch_index = build_ivf_index(e, every_nth=50)
    # same centroids by construction (both every-50th); probe via the
    # batch path for the parity target
    want = sorted(
        (r.query_id, r.neighbor_id, r.rank)
        for r in ivf_topk(e, queries, k=5, nprobe=3, index=(cents, batch_index[1])).collect()
    )
    assert got == want and got

    # restart on the same checkpoint: no new files -> no duplicate rows
    n_before = spark.read.option("recursiveFileLookup", "true").parquet(deltas).count()
    q2 = _start()
    q2.awaitTermination(240)
    n_after = spark.read.option("recursiveFileLookup", "true").parquet(deltas).count()
    assert n_before == n_after == e.count()
