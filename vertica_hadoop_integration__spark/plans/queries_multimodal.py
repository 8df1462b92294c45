"""Multimodal-column queries: binary payload plumbing (oracle-checked
metadata + content hashing) and the Arrow-batched feature/frame-sample
paths (rows-only — the decode stub is not SQL)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import multimodal as M
from ..sources import load_table
from .registry import register


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.synthesize_media_from_documents(load_table(spark, sf_dir, "documents"))


# -- binary column metadata (oracle-checked incl. sha256 content hash) -----
@register(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id AS media_id,
           (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS content_hash,
           doc_id AS source_doc_id
    FROM documents
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = _media(spark, sf_dir)
    return m.select(
        "media_id",
        "media_type",
        "n_bytes",
        F.sha2(F.col("payload"), 256).alias("content_hash"),
        "source_doc_id",
    )


# -- Arrow-batched feature extraction (rows-only; decode is stubbed) -------
@register("multimodal_features")
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.extract_features(_media(spark, sf_dir)).drop("mean_intensity", "duration_sec")


# -- video frame-sampling plan (rows-only) ---------------------------------
@register("multimodal_frame_sample")
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.frame_sample_plan(_media(spark, sf_dir), every_sec=10.0)
