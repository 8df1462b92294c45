"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side plumbing (schemas, batching, partition sizing, UDF
signatures) is real and tested; the actual media decode is stubbed behind
``DECODERS`` because codec libraries aren't in this environment — a real
deployment drops in PIL/ffmpeg there without touching the dataflow.

Scale design:
* payloads stay in ``binary`` columns; Arrow moves them zero-copy between
  JVM and the pandas workers;
* feature extraction is mapInPandas (iterator form) so one python worker
  streams many Arrow batches without per-row overhead;
* ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory —
  for media blobs, set it low (the session default 10k rows assumes small
  rows; megabyte-scale payloads want ~64-256 rows per batch);
* decode is per-row CPU-bound python: parallelism = number of input
  partitions, so repartition to cores before mapping.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Callable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("source_doc_id", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("content_hash", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_sec", DoubleType(), True),
        StructField("mean_intensity", DoubleType(), True),
    ]
)


def _decode_stub(media_type: str, payload: bytes) -> dict:
    """Deterministic fake decode: derives pseudo-metadata from the payload
    hash. REPLACE with real decoders (PIL / soundfile / pyav) in
    production — the surrounding dataflow does not change."""
    h = hashlib.sha256(payload).digest()
    if media_type == "image":
        return {
            "width": 64 + h[0] % 192,
            "height": 64 + h[1] % 192,
            "duration_sec": None,
            "mean_intensity": h[2] / 255.0,
        }
    if media_type in ("audio", "video"):
        return {
            "width": None if media_type == "audio" else 320 + h[0] % 320,
            "height": None if media_type == "audio" else 240 + h[1] % 240,
            "duration_sec": 1.0 + (h[3] % 600) / 10.0,
            "mean_intensity": None,
        }
    raise NotImplementedError(f"unknown media type: {media_type}")


DECODERS: dict[str, Callable[[str, bytes], dict]] = {"stub": _decode_stub}


def synthesize_media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a media table from the documents fixture: the text bytes act
    as the opaque payload (environment has no codec fixtures). Exercises
    the binary-column path end to end."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.col("doc_id").alias("source_doc_id"),
    )


def extract_features(media: DataFrame, decoder: str = "stub") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    mapInPandas (iterator of batches — one worker handles many batches
    without python-call-per-row)."""
    decode = DECODERS[decoder]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(t, bytes(p)) for t, p in zip(pdf["media_type"], pdf["payload"])]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "media_type": pdf["media_type"].values,
                    "n_bytes": pdf["n_bytes"].values,
                    "content_hash": [
                        hashlib.sha256(bytes(p)).hexdigest() for p in pdf["payload"]
                    ],
                    "width": pd.array([f["width"] for f in feats], dtype="Int32"),
                    "height": pd.array([f["height"] for f in feats], dtype="Int32"),
                    "duration_sec": [f["duration_sec"] for f in feats],
                    "mean_intensity": [f["mean_intensity"] for f in feats],
                }
            )
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_sec: float = 1.0) -> DataFrame:
    """Video frame-sampling *plan*: one output row per frame to decode
    (media_id, frame_idx, frame_ts_sec). The decode itself is the stubbed
    step; the explode is the real scale concern — a 2h video at 1 fps is
    7200 rows, so the explode happens AFTER feature extraction determines
    duration, keeping payload bytes out of the exploded relation."""
    feats = extract_features(media).filter(F.col("media_type") == "video")
    n_frames = F.floor(F.col("duration_sec") / F.lit(every_sec)).cast("int")
    # guard: sequence(0, -1) would emit a DESCENDING [0, -1] for
    # zero-frame media — drop those rows before exploding
    return feats.withColumn("n_frames", n_frames).filter(F.col("n_frames") >= 1).select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx"),
    ).select(
        "media_id",
        "frame_idx",
        (F.col("frame_idx") * F.lit(every_sec)).alias("frame_ts_sec"),
    )
