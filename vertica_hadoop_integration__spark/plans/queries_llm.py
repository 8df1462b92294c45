"""LLM-data-pipeline queries: dedup, text analysis, fingerprinting,
similarity search — over the ``documents`` and ``embeddings`` fixtures.

Cross-engine determinism rules used throughout:
* fingerprints use md5 (identical hex in Spark and DuckDB);
* ratios are computed in DECIMAL and cast to DOUBLE at the end;
* tokenization is whitespace-regex on lower(trim(text)) — same regex
  semantics in both engines for the simple classes used.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register


# -- exact dedup (hash groupBy) --------------------------------------------
@register(
    "dedup_exact",
    oracle="""
    SELECT md5(lower(trim(text))) AS text_hash,
           min(doc_id) AS canonical_doc_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY md5(lower(trim(text)))
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-dup collapse: normalize -> hash -> groupBy. At 100 TB the
    groupBy shuffles only (hash, doc_id) pairs — the text column is pruned
    before the exchange."""
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.lower(F.trim(F.col("text")))).alias("text_hash")
    return (
        d.select(h, "doc_id")
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# -- token counting --------------------------------------------------------
@register(
    "text_token_count",
    oracle=r"""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS n_tokens,
           CAST(n_chars AS BIGINT) AS n_chars
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens"),
        F.col("n_chars").cast("long").alias("n_chars"),
    )


# -- document fingerprint --------------------------------------------------
@register(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id, md5(lower(trim(text))) AS fingerprint FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.md5(F.lower(F.trim(F.col("text")))).alias("fingerprint")
    )


# -- quality scoring -------------------------------------------------------
@register(
    "text_quality_score",
    oracle=r"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS len_chars,
           CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS n_tokens,
           CAST(CAST(length(text) AS DECIMAL(18,6)) /
                len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS avg_token_len,
           CASE WHEN length(text) >= 100
                 AND len(string_split_regex(trim(text), '\s+')) >= 20
                THEN 1 ELSE 0 END AS quality_ok
    FROM documents
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    len_chars = F.length("text").cast("long")
    return d.select(
        "doc_id",
        len_chars.alias("len_chars"),
        n_tokens.alias("n_tokens"),
        (len_chars.cast("decimal(18,6)") / n_tokens).cast("double").alias("avg_token_len"),
        F.when((F.length("text") >= 100) & (n_tokens >= 20), 1)
        .otherwise(0)
        .alias("quality_ok"),
    )
