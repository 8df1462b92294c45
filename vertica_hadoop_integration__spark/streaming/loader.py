"""Streaming incremental loader: the reference's batch load loop
(extract -> convert -> mark complete, ``sqoop_etl.py:36-46``) recast as
a Structured Streaming sink.

``foreachBatch`` gives each micro-batch a batch id and exactly-once
semantics against idempotent sinks: we write each batch's partitions
with the same atomic-rename commit the batch pipeline uses, then record
(table, batch_id) in the ledger — a replayed batch id is skipped, which
is precisely the reference's is_complete re-run guard at micro-batch
granularity.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from ..ledger import Ledger
from ..sources.writers import write_atomic


def stream_load(
    events,
    dest_dir: str,
    ledger_path: str,
    table_name: str = "events_stream",
    output_format: str = "orc",
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = True,
):
    """Start an incremental streaming load into ``dest_dir``.

    Each micro-batch lands as ``batch=<id>/`` via atomic rename, then the
    ledger marks that batch complete. On restart, Spark's checkpoint
    replays the last uncommitted batch; the ledger guard makes the
    replay a no-op for already-landed batch dirs — the same
    write-then-flip ordering as the batch pipeline (exactly-once to an
    idempotent sink). Returns the StreamingQuery."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        ledger = Ledger(spark, ledger_path)
        key = str(batch_id)
        ledger.enqueue_whole_table(f"{table_name}#{key}", "stream", 1)
        if not ledger.pending_exists(f"{table_name}#{key}"):
            return  # replayed, already complete
        write_atomic(
            batch_df, os.path.join(dest_dir, f"batch={key}"),
            output_format=output_format,
        )
        ledger.mark_complete(f"{table_name}#{key}", None)

    writer = events.writeStream.foreachBatch(_sink).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
