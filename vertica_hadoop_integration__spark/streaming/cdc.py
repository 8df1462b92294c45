"""Streaming CDC apply: keep a base snapshot continuously maintained
from a changelog stream — the incremental-materialization member of the
streaming-maintenance family (rollup = aggregate, trending = ranked
serving table, indexing = retrieval layout, cdc = the TABLE itself).

Each micro-batch of (op, seq, key, cols) rows is applied with
operators/relational.py::cdc_apply semantics (max-seq frontier per key,
'D' removes, 'I'/'U' replace-or-insert) and the new snapshot is
committed atomically; the ledger skips replayed batch ids, so a
checkpoint restart neither double-applies nor loses changes. Within a
batch, cross-batch ordering is by the changelog's own seq — a late
batch with lower seq than an already-applied key still wins ONLY inside
its own batch (standard Kafka-compaction semantics: upstream must
deliver per-key ordered batches, which Kafka partitions by key do).

At 100 TB the base table should be bucketed by the key so the per-batch
anti-join co-locates; the rewrite cost is bounded by base size, and a
partition-pruned variant (apply only to touched partitions) follows the
rollup pipeline's touched-unit pattern when the base is partitioned by
a key prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..ledger import Ledger
from ..operators.relational import cdc_apply
from ..sources.writers import write_atomic


def stream_cdc_apply(
    changes,
    base_dir: str,
    ledger_path: str,
    key_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
    table_name: str = "cdc_base",
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = True,
):
    """Start the snapshot-maintaining changelog stream; returns the
    StreamingQuery. ``base_dir`` must hold the initial snapshot (the
    base schema = changelog minus op/seq columns)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        ledger = Ledger(spark, ledger_path)
        key = str(batch_id)
        ledger.enqueue_whole_table(f"{table_name}#{key}", "stream", 1)
        if not ledger.pending_exists(f"{table_name}#{key}"):
            return  # replayed batch, already applied
        base = spark.read.parquet(base_dir)
        updated = cdc_apply(
            base, batch_df, key_cols=key_cols, seq_col=seq_col, op_col=op_col
        )
        # cdc_apply reads `base` lazily; write_atomic stages to a side
        # directory and renames, so the read plan never overlaps the
        # overwrite of its own input
        write_atomic(updated, base_dir, output_format="parquet")
        ledger.mark_complete(f"{table_name}#{key}", None)

    writer = changes.writeStream.foreachBatch(_sink).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
