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


# -- REAL format decode (oracle-checked) ------------------------------------
# Payload generators derive every BMP/WAV parameter deterministically from
# doc_id (operators/multimodal.py::_bmp_bytes/_wav_bytes), so DuckDB can
# predict exactly what a correct decoder must recover from the bytes:
# dimensions from the BMP DIB header, duration from the WAV frame count,
# mean intensity from the actual pixel/sample data (constant-luminance
# pixels and a square wave make both analytically exact).
@register(
    "multimodal_decode_real",
    oracle="""
    WITH m AS (SELECT doc_id, CAST(doc_id % 3 AS INT) AS k FROM documents
               WHERE doc_id % 3 < 2)
    SELECT doc_id AS media_id,
           CASE WHEN k = 0 THEN 'image' ELSE 'audio' END AS media_type,
           CASE WHEN k = 0
                THEN CAST(54 + ((8 + doc_id % 24) * 3 + 3) // 4 * 4
                          * (8 + (doc_id * 7) % 24) AS BIGINT)
                ELSE CAST(44 + (400 + (doc_id % 50) * 80) * 2 AS BIGINT)
           END AS n_bytes,
           CASE WHEN k = 0 THEN CAST(8 + doc_id % 24 AS INT) END AS width,
           CASE WHEN k = 0 THEN CAST(8 + (doc_id * 7) % 24 AS INT) END AS height,
           CASE WHEN k = 1
                THEN CAST(400 + (doc_id % 50) * 80 AS DOUBLE) / 8000
           END AS duration_sec,
           CASE WHEN k = 0 THEN CAST(doc_id % 256 AS DOUBLE) / 255
                ELSE CAST(1000 + (doc_id % 100) * 300 AS DOUBLE) / 32768
           END AS mean_intensity
    FROM m
    """,
)
def multimodal_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end REAL media decode: synthesize format-conformant BMP/WAV
    payloads per document (Arrow mapInPandas), then decode them back with
    the stdlib parsers (operators/multimodal.py::_decode_real) — header
    fields and pixel/sample statistics, not hash-derived fakes. The
    oracle recomputes every decoded value from the generation formulas,
    so a decoder that misparses a header or mis-scales samples fails the
    value hash."""
    media = M.synthesize_real_media_from_documents(
        load_table(spark, sf_dir, "documents")
    )
    return M.extract_features(media, decoder="real").drop("content_hash")
