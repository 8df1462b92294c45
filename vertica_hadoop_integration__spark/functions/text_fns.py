"""Text-analysis column functions: tokenization, shingling, hashing,
language scoring, quality ratios. All Catalyst built-ins (split/transform/
xxhash64/regexp) — JVM-side, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column) -> Column:
    """Whitespace tokens of lower(trim(text))."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def distinct_tokens(text: Column) -> Column:
    return F.array_distinct(tokens(text))


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as strings ("w1 w2 w3"). Built via transform
    over token positions — no explode needed until the caller wants rows."""
    toks = tokens(text)
    k = F.size(toks) - (n - 1)
    return F.transform(
        F.sequence(F.lit(0), F.greatest(k - 1, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_token_estimate(text: Column) -> Column:
    """BPE-ish token count estimate without a tokenizer model: count the
    matches of letter-runs | digits | single non-space-non-alnum chars
    over the lowered text. Tracks real BPE counts to within ~20% on
    prose (BPE splits long words and merges common digit/punct runs, but
    the run structure dominates) — good enough for corpus token budgets
    and mixture shares. Pure regexp projection, scan-stage cost."""
    return F.size(
        F.regexp_extract_all(
            F.lower(text), F.lit(r"[a-z]+|[0-9]|[^a-z0-9\s]"), F.lit(0)
        )
    )


def punct_count(text: Column) -> Column:
    """Count of punctuation chars (explicit class — identical semantics in
    DuckDB for oracle parity)."""
    return F.length(text) - F.length(F.regexp_replace(text, r"[.,!?;:'\"()\[\]{}-]", ""))


def stopword_hits(text: Column, stopwords: list[str]) -> Column:
    """How many tokens are in the stopword list (array_intersect on
    distinct tokens would lose multiplicity; use filter)."""
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(sw, t)))


def hash64(col: Column, seed: int = 0) -> Column:
    """Stable 64-bit hash (xxhash64 + seed column). Engine-internal — used
    for MinHash/SimHash signatures, not for oracle-compared values."""
    return F.xxhash64(col, F.lit(seed))


def md5_hash60(col: Column, seed: int | None = None) -> Column:
    """Portable 60-bit hash: first 15 hex digits of md5, parsed base-16.
    Bit-identical in DuckDB as ``CAST(('0x'||substr(md5(x),1,15)) AS
    BIGINT)`` (verified), so operators built on it — the ``*_portable``
    variants — can replay their ENTIRE pipeline in an oracle SQL string
    instead of registering rows-only. 15 hex digits = 60 bits < 2^63, so
    the long cast never overflows under ANSI mode. ``seed`` prefixes the
    input as "seed:value", giving independent hash functions for MinHash
    signature rows. xxhash64 (``hash64``) stays the production default:
    one JVM op versus a digest + substring + base conversion."""
    base = col if seed is None else F.concat_ws(":", F.lit(seed), col)
    return F.conv(F.substring(F.md5(base), 1, 15), 16, 10).cast("long")


def rolling_fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized token
    stream (cross-engine stable — md5 hex matches DuckDB)."""
    return F.md5(F.concat_ws(" ", tokens(text)))
