"""End-to-end training-corpus cleaning: the composition a 100 TB
LLM-data pipeline actually runs, built from this package's operators —

    quality gate -> language gate -> exact dedup -> MinHash near-dedup

Stage cost shape: the two gates are pure projections (they run inside
the parquet scan stage, zero shuffle); exact dedup is one shuffle on a
16-byte hash; near-dedup is the LSH plan from ``dedup.py`` (one band
shuffle) plus a left-anti join of drop ids. Nothing quadratic, nothing
driver-side, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text_fns import punct_count, token_count
from .dedup import minhash_dedup
from .text import LANG_MARKERS, language_scores


def clean_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_langs: tuple[str, ...] | None = None,
    min_chars: int = 100,
    min_tokens: int = 20,
    min_jaccard: float = 0.8,
    num_hashes: int = 16,
    bands: int = 8,
) -> DataFrame:
    """Return the cleaned corpus: original columns + ``predicted_lang``.

    Drops, in order: low-quality docs (length / token-count / punctuation
    gates, computed inline — same thresholds as
    ``text.quality_features``), docs outside ``keep_langs`` (argmax of
    stopword-marker scores; None keeps all), exact duplicates (smallest
    id per normalized-text hash wins), and the higher-id member of every
    verified >= ``min_jaccard`` near-duplicate pair."""
    text = F.col(text_col)
    n_chars = F.length(text)
    n_tok = token_count(text)
    quality_ok = (
        (n_chars >= min_chars) & (n_tok >= min_tokens) & (punct_count(text) * 5 <= n_chars)
    )

    lang_pairs = F.array(*[
        F.struct(F.col(f"score_{lang}").alias("score"), F.lit(lang).alias("lang"))
        for lang in sorted(LANG_MARKERS)
    ])
    best = F.aggregate(
        lang_pairs,
        F.struct(F.lit(-1).alias("score"), F.lit("zz").alias("lang")),
        lambda acc, p: F.when(
            (p["score"] > acc["score"])
            | ((p["score"] == acc["score"]) & (p["lang"] < acc["lang"])),
            F.struct(p["score"].alias("score"), p["lang"].alias("lang")),
        ).otherwise(acc),
    )

    gated = (
        df.filter(quality_ok)
        .select("*", *language_scores(text))
        .withColumn("predicted_lang", best["lang"])
        .drop(*[f"score_{lang}" for lang in LANG_MARKERS])
    )
    if keep_langs is not None:
        gated = gated.filter(F.col("predicted_lang").isin(*keep_langs))

    # exact dedup, keeping the smallest id per normalized text
    w = Window.partitionBy(F.md5(F.lower(F.trim(text)))).orderBy(F.col(id_col).asc())
    exact_canon = (
        gated.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    # near-dedup: drop the higher-id side of each verified pair
    drops = (
        minhash_dedup(
            exact_canon,
            text_col=text_col,
            id_col=id_col,
            num_hashes=num_hashes,
            bands=bands,
            min_jaccard=min_jaccard,
        )
        .select(F.col("doc_id_b").alias(id_col))
        .distinct()
    )
    return exact_canon.join(drops, on=id_col, how="left_anti")
