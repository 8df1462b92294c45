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


def test_probe_index_dedups_reingested_vectors(spark, sf_dir, tmp_path):
    """A vector re-ingested with an UPDATED embedding in a later batch
    appears in two delta directories; the probe must rank only the
    latest row — without the max-batch dedup the same neighbor_id shows
    up twice (stale and fresh both ranked) and k-th results are wrong."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cdir = str(tmp_path / "ri_cents")
    bootstrap_centroids(e, cdir, every_nth=50)

    src = tmp_path / "ri_src"
    e.coalesce(1).write.parquet(str(src), mode="append")
    deltas = str(tmp_path / "ri_deltas")
    led = str(tmp_path / "ri_led")
    ckpt = str(tmp_path / "ri_ckpt")

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

    # re-ingest vec_ids < 20 carrying OTHER vectors' embeddings (shifted
    # by 100) — updated coordinates, likely different centroid buckets
    upd = (
        e.filter(F.col("vec_id") >= 100)
        .filter(F.col("vec_id") < 120)
        .select((F.col("vec_id") - 100).alias("vec_id"), "embedding")
    )
    upd.coalesce(1).write.parquet(str(src), mode="append")
    q2 = _start()
    q2.awaitTermination(240)

    queries = e.filter(F.col("vec_id") < 10)
    res = probe_index(spark, cdir, deltas, queries, k=5, nprobe=3)
    rows = res.collect()
    assert rows
    pairs = [(r.query_id, r.neighbor_id) for r in rows]
    assert len(pairs) == len(set(pairs)), "stale+fresh rows both ranked"


def test_stream_partitioned_load_lands_partitions_replay_safe(spark, sf_dir, tmp_path):
    """Two micro-batches with overlapping event dates -> hive layout
    holds exactly the union; checkpoint replay adds nothing; a reader
    predicate on the partition column prunes (PartitionFilters)."""
    import os

    from pyspark.sql import functions as F

    from vertica_hadoop_integration__spark.sources import load_table
    from vertica_hadoop_integration__spark.streaming.loader import (
        stream_partitioned_load,
    )

    e = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    src = tmp_path / "pl_src"
    e.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        str(src), mode="append"
    )
    e.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        str(src), mode="append"
    )
    dest = str(tmp_path / "pl_dest")

    def _start():
        stream = (
            spark.readStream.schema(e.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        return stream_partitioned_load(
            stream,
            dest_dir=dest,
            ledger_path=str(tmp_path / "pl_led"),
            partition_cols=["event_date"],
            checkpoint_dir=str(tmp_path / "pl_ckpt"),
        )

    q = _start()
    q.awaitTermination(240)
    landed = spark.read.parquet(dest)
    assert landed.count() == e.count()
    # two-level layout: batch=<id>/event_date=<d>/
    bdirs = [d for d in os.listdir(dest) if d.startswith("batch=")]
    assert len(bdirs) == 2
    assert any(
        d.startswith("event_date=") for d in os.listdir(os.path.join(dest, bdirs[0]))
    )

    # replay: no new files -> content unchanged
    q2 = _start()
    q2.awaitTermination(240)
    assert spark.read.parquet(dest).count() == e.count()

    # partition pruning works on the landed layout
    day = landed.select(F.min("event_date").alias("d")).collect()[0]["d"]
    qd = spark.read.parquet(dest).filter(F.col("event_date") == day)
    plan = qd._sc._jvm.PythonSQLUtils.explainString(
        qd._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan


def test_stream_partitioned_load_survives_rename_complete_crash(
    spark, sf_dir, tmp_path
):
    """Crash-window replay: the batch directory RENAME landed but the
    crash hit before ledger.mark_complete. On restart the replayed
    batch must treat the existing directory as applied (finish only the
    bookkeeping) — a bare os.replace onto the non-empty dir would raise
    ENOTEMPTY and wedge the stream forever, and re-writing would
    double-append."""
    import os

    from pyspark.sql import functions as F

    from vertica_hadoop_integration__spark.ledger import Ledger
    from vertica_hadoop_integration__spark.sources import load_table
    from vertica_hadoop_integration__spark.streaming.loader import (
        stream_partitioned_load,
    )

    e = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    a = e.filter(F.col("event_id") % 2 == 0)
    b = e.filter(F.col("event_id") % 2 == 1)
    src = tmp_path / "cw_src"
    # file order = micro-batch order under maxFilesPerTrigger=1: land A
    # first so the fresh stream's batch 0 replays exactly A
    a.coalesce(1).write.parquet(str(src), mode="append")
    b.coalesce(1).write.parquet(str(src), mode="append")
    dest = str(tmp_path / "cw_dest")
    ledger_path = str(tmp_path / "cw_led")

    # fabricate the crash state: batch=0 fully renamed into place...
    os.makedirs(dest, exist_ok=True)
    a.write.partitionBy("event_date").parquet(os.path.join(dest, "batch=0"))
    # ...but the ledger row is still pending (mark_complete never ran)
    led = Ledger(spark, ledger_path)
    led.enqueue_whole_table("events_partitioned#0", "stream", 1)
    assert led.pending_exists("events_partitioned#0")

    q = stream_partitioned_load(
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src)),
        dest_dir=dest,
        ledger_path=ledger_path,
        partition_cols=["event_date"],
        checkpoint_dir=str(tmp_path / "cw_ckpt"),
    )
    q.awaitTermination(240)
    assert q.exception() is None, f"stream wedged on replay: {q.exception()}"
    # exactly-once: the pre-landed batch was not re-appended, batch 1 landed
    assert spark.read.parquet(dest).count() == e.count()
    led2 = Ledger(spark, ledger_path)
    assert not led2.pending_exists("events_partitioned#0")
    assert not led2.pending_exists("events_partitioned#1")


def test_ann_index_compaction_probe_zero_exchange(spark, sf_dir, tmp_path):
    """After compaction the IVF index is centroid-bucketed: a probe
    join whose probe side shares the bucket layout runs with ZERO
    exchange, and content equals the delta union."""
    from vertica_hadoop_integration__spark.streaming.ann_index import (
        bootstrap_centroids,
        compact_ann_index,
        stream_embedding_index_load,
    )

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cdir = str(tmp_path / "cents2")
    bootstrap_centroids(e, cdir, every_nth=50)
    src = tmp_path / "vecsrc2"
    e.coalesce(1).write.parquet(str(src))
    stream = spark.readStream.schema(e.schema).parquet(str(src))
    q = stream_embedding_index_load(
        stream, centroids_dir=cdir, deltas_dir=str(tmp_path / "d2"),
        ledger_path=str(tmp_path / "l2"), checkpoint_dir=str(tmp_path / "c2"),
    )
    q.awaitTermination(240)

    compact_ann_index(spark, str(tmp_path / "d2"), "ivf_base_test", buckets=4)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        base = spark.table("ivf_base_test")
        assert base.count() == e.count()
        from vertica_hadoop_integration__spark.sources.writers import (
            write_bucketed,
        )

        probes = base.select("centroid_id").distinct().limit(3)
        write_bucketed(
            probes, "ivf_probe_cents", ["centroid_id"], num_buckets=4,
            sort_cols=["centroid_id"],
        )
        joined = spark.table("ivf_base_test").join(
            spark.table("ivf_probe_cents"), on="centroid_id"
        )
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        tree = plan.split("\n\n")[0]
        assert "SortMergeJoin" in tree and tree.count("Exchange") == 0, tree
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS ivf_base_test")
        spark.sql("DROP TABLE IF EXISTS ivf_probe_cents")
