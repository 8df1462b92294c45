"""Text-analysis operators: language ID, quality scoring, token stats,
fingerprinting — all built-in column expressions (SQL-expressible, so each
has a DuckDB oracle in plans/queries_llm.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text_fns import (
    punct_count,
    rolling_fingerprint,
    stopword_hits,
    token_count,
)

# Tiny per-language marker lexicons for the heuristic n-gram language ID.
# (The fixture corpus is synthetic English-ish text labeled with a lang
# column; the *operator* is what matters: per-language evidence scores ->
# argmax. Real deployments swap in real lexicons or a char-n-gram model.)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "y", "los", "de"],
    "zh": ["de", "shi", "le", "zai", "he"],
}


def language_scores(text: Column) -> list[Column]:
    return [
        stopword_hits(text, markers).alias(f"score_{lang}")
        for lang, markers in LANG_MARKERS.items()
    ]


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: stopword-marker hit counts per language,
    argmax wins (ties -> lexicographically first language for
    determinism). One projection, no shuffle."""
    scored = df.select(F.col(id_col), *language_scores(F.col(text_col)))
    pairs = F.array(*[
        F.struct(
            F.col(f"score_{lang}").alias("score"),
            F.lit(lang).alias("lang"),
        )
        for lang in sorted(LANG_MARKERS)
    ])
    best = F.aggregate(
        pairs,
        F.struct(F.lit(-1).alias("score"), F.lit("zz").alias("lang")),
        lambda acc, p: F.when(
            (p["score"] > acc["score"])
            | ((p["score"] == acc["score"]) & (p["lang"] < acc["lang"])),
            F.struct(p["score"].alias("score"), p["lang"].alias("lang")),
        ).otherwise(acc),
    )
    return scored.withColumn("predicted_lang", best["lang"]).select(
        id_col, *[f"score_{lang}" for lang in LANG_MARKERS], "predicted_lang"
    )


def quality_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Quality-scoring features: length, token count, mean token length,
    punctuation ratio, stopword ratio, plus a composite keep/drop flag.
    Pure projection — runs inside the scan stage at any scale."""
    text = F.col(text_col)
    n_tok = token_count(text)
    n_chars = F.length(text)
    n_punct = punct_count(text)
    sw = stopword_hits(text, LANG_MARKERS["en"])
    return df.select(
        F.col(id_col),
        n_chars.cast("long").alias("len_chars"),
        n_tok.alias("n_tokens"),
        (n_chars.cast("double") / n_tok.cast("double")).alias("avg_token_len"),
        (n_punct.cast("double") / n_chars.cast("double")).alias("punct_ratio"),
        (sw.cast("double") / n_tok.cast("double")).alias("stopword_ratio"),
        F.when((n_chars >= 100) & (n_tok >= 20) & (n_punct * 5 <= n_chars), 1)
        .otherwise(0)
        .alias("quality_ok"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return df.select(
        F.col(id_col), rolling_fingerprint(F.col(text_col)).alias("fingerprint")
    )


# conservative ASCII patterns with identical semantics in Java regex and
# RE2 (no backrefs, no lookaround) — cross-engine oracle parity
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+", "<EMAIL>"),
    (r"\+?[0-9][0-9()\- ]{7,14}[0-9]", "<PHONE>"),
    (r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
]


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII scrub for training corpora: replace email / phone-number / IP
    literals with typed placeholder tokens. Pure regexp projection (runs
    in the scan stage, zero shuffle); patterns are deliberately
    conservative ASCII classes so any engine applies them identically.
    Returns (id, clean_text, n_redactions) — the redaction count feeds
    corpus-quality dashboards (a spike means a leaky source)."""
    clean = F.col(text_col)
    for pat, token in PII_PATTERNS:
        clean = F.regexp_replace(clean, pat, token)
    n = F.lit(0)
    for _, token in PII_PATTERNS:
        # count placeholder occurrences in the redacted text (assumes the
        # raw corpus doesn't contain the literal placeholders)
        n = n + (
            F.length(clean) - F.length(F.replace(clean, F.lit(token), F.lit("")))
        ) / F.lit(len(token))
    return df.select(
        F.col(id_col),
        clean.alias("clean_text"),
        n.cast("int").alias("n_redactions"),
    )
