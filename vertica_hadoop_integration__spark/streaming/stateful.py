"""Custom stateful streaming operator via applyInPandasWithState:
per-user running aggregates that built-in windowed aggs can't express
(running event count + running value total emitted per micro-batch).

This is the engine's extension point for arbitrary per-key streaming
state (the reference has no streaming at all; SURVEY.md §2C reserves this
for the events fixture). Arrow-batched: state updates process a pandas
iterator per key group — no row-at-a-time python.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def _update_user_state(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming: per-user cumulative totals, one updated row per user per
    micro-batch. Works only on streaming inputs (applyInPandasWithState);
    the batch equivalent is a plain groupBy aggregate."""
    if not events.isStreaming:
        from pyspark.sql import functions as F

        return events.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("double")).alias("total_value"),
        )
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# -- streaming anomaly detection: per-key running mean/variance state ------
#
# Welford's online update keeps (n, mean, M2) per key; each incoming
# count is scored against the state BEFORE it updates it (a point never
# judges itself), mirroring the batch operator
# operators/temporal.py::anomaly_zscore's excluded-current-row frame.

ANOMALY_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType(), True),
        StructField("batch_n", LongType()),
        StructField("baseline_mean", DoubleType(), True),
        StructField("zscore", DoubleType(), True),
    ]
)

ANOMALY_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("mean", DoubleType()),
        StructField("m2", DoubleType()),
    ]
)


def _update_anomaly_state(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    import math

    (event_type,) = key
    n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
    batch_n = 0
    for pdf in pdfs:
        batch_n += len(pdf)
    # score this batch's volume against the PRIOR baseline
    if n > 0:
        var = m2 / n
        std = math.sqrt(var) if var > 0 else 0.0
        baseline, z = mean, ((batch_n - mean) / std if std > 0 else None)
    else:
        baseline, z = None, None
    # then fold it in (Welford)
    n += 1
    delta = batch_n - mean
    mean += delta / n
    m2 += delta * (batch_n - mean)
    state.update((n, mean, m2))
    yield pd.DataFrame(
        {
            "event_type": [event_type],
            "batch_n": [batch_n],
            "baseline_mean": [baseline],
            "zscore": [z],
        }
    )


def streaming_anomaly_scores(events: DataFrame) -> DataFrame:
    """Streaming: per-event-type micro-batch volume scored against the
    running mean/variance of all PREVIOUS batches (Welford state — O(1)
    memory per key, any stream length). Emits one row per key per
    batch: (event_type, batch_n, baseline_mean, zscore); the first
    batch per key has a NULL score (no baseline yet). Batch inputs get
    the windowed equivalent (operators/temporal.py::anomaly_zscore)."""
    if not events.isStreaming:
        from ..operators.temporal import anomaly_zscore

        return anomaly_zscore(events)
    return (
        events.select("event_type")
        .groupBy("event_type")
        .applyInPandasWithState(
            _update_anomaly_state,
            outputStructType=ANOMALY_OUTPUT_SCHEMA,
            stateStructType=ANOMALY_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
