"""Text-analysis operators: language ID, quality scoring, token stats,
fingerprinting — all built-in column expressions (SQL-expressible, so each
has a DuckDB oracle in plans/queries_llm.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.df_utils import spread

from ..functions.text_fns import (
    punct_count,
    rolling_fingerprint,
    stopword_hits,
    token_count,
    tokens,
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


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher/C4-style repetition diagnostics — the standard signals a
    training-data quality gate cuts on, all computable in the scan stage:

    * ``dup_2gram_frac`` — fraction of word-bigram occurrences that are
      repeats (1 - distinct/total); boilerplate and degenerate loops
      score high;
    * ``top_token_frac`` — share of tokens taken by the single most
      frequent token ("the the the ..." pathologies);
    * ``mean_token_len`` — characters per token (machine gibberish and
      char-level noise drift far from prose's ~4-6);
    * ``repetitive`` — composite flag at the usual cut points
      (dup_2gram_frac > 0.2 or top_token_frac > 0.3).

    All ratios are double divisions of exact integer counts (engine-
    parity rule). Pure projection, zero shuffle."""
    from ..functions.text_fns import shingles

    toks = tokens(F.col(text_col))
    n_tok = F.size(toks)
    # word bigrams via the linear zip_with shingle kernel (r12): the
    # former transform-over-positions form allocated a slice per window
    # (the exact shape the r11 shingle rewrite removed); same values
    # including the short-doc partial window
    grams2 = shingles(F.col(text_col), 2)
    n_g2 = F.size(grams2)
    n_g2_distinct = F.size(F.array_distinct(grams2))
    # most-frequent-token count without a shuffle (r12): longest equal
    # run of the SORTED token array — one O(n log n) JVM sort plus one
    # linear fold.  The former distinct-tokens x filter scan was
    # O(distinct x n) interpreted lambda evals PER DOCUMENT (quadratic
    # on repetitive docs — exactly the ones this operator exists to
    # catch); identical counts by definition.
    top_cnt = F.aggregate(
        F.array_sort(toks),
        F.struct(
            F.lit(None).cast("string").alias("p"),
            F.lit(0).alias("r"),
            F.lit(0).alias("b"),
        ),
        lambda a, x: F.struct(
            x.alias("p"),
            F.when(a.p.isNotNull() & (a.p == x), a.r + 1)
            .otherwise(F.lit(1))
            .alias("r"),
            F.greatest(
                a.b,
                F.when(a.p.isNotNull() & (a.p == x), a.r + 1).otherwise(
                    F.lit(1)
                ),
            ).alias("b"),
        ),
        lambda a: a.b,
    )
    dup_frac = F.lit(1.0) - n_g2_distinct.cast("double") / n_g2.cast("double")
    top_frac = top_cnt.cast("double") / n_tok.cast("double")
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        dup_frac.alias("dup_2gram_frac"),
        top_frac.alias("top_token_frac"),
        (
            F.length(F.col(text_col)).cast("double") / n_tok.cast("double")
        ).alias("mean_token_len"),
        F.when((dup_frac > 0.2) | (top_frac > 0.3), 1).otherwise(0).alias("repetitive"),
    )


def pack_sequences(
    df: DataFrame,
    max_tokens: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Chunk documents into fixed-token-budget training sequences:
    each doc's token stream is split into consecutive ``max_tokens``-token
    chunks (last chunk ragged). Output (id, chunk_idx, chunk_text,
    n_tokens) — the example-granularity frame a tokenizer/packer consumes.

    Map-only: chunk boundaries are positions in the per-row token array
    (sequence + slice), exploded without any shuffle; at 100 TB the
    explode multiplies rows inside the scan stage and downstream
    repartitioning is the consumer's choice. Cross-doc bin packing (fill
    the tail of one doc's last chunk with the next doc's tokens) is
    deliberately NOT done here — it destroys doc provenance and forces a
    global order; modern packers do it tokenizer-side per batch."""
    toks = tokens(F.col(text_col))
    n_chunks = F.ceil(F.size(toks).cast("double") / F.lit(max_tokens)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i * max_tokens + 1, max_tokens)),
    )
    out = df.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_idx", "chunk_text"),
    )
    return out.select(
        F.col(id_col),
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("chunk_text"),
        F.size(F.split(F.col("chunk_text"), r"\s+")).alias("n_tokens"),
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


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF
    (tf * ln(N/df)) — the keyword-extraction primitive behind corpus
    topic profiling and near-duplicate triage dashboards.

    Physical shape, corpus-scale: explode -> groupBy (doc, term) builds
    term frequencies in one shuffle with map-side combine and NO hot key
    (the key carries doc_id); document frequencies re-aggregate that
    (term-keyed, partial-agg absorbs stop-word skew); N is a 1-row
    broadcast. The scoring join is term-keyed (the planner broadcasts
    the df side while it is small; at web-vocabulary scale it shuffles —
    both correct), and the final top-k is one row_number window per doc.
    Everything is Catalyst built-ins; ties break on term ascending so
    results are deterministic."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = df.agg(F.count(F.lit(1)).alias("_n_docs"))
    scored = (
        tf.join(dfreq, on="term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.col("tf").cast("double")
            * F.log(F.col("_n_docs").cast("double") / F.col("df")),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            F.col(id_col),
            F.col("term"),
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.col("tfidf"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document average negative log-likelihood under the corpus's
    OWN unigram language model (p(term) = corpus_count/total_tokens) —
    the cheapest perplexity proxy for quality cuts: gibberish and
    boilerplate both sit far from the corpus-typical token mix.

    Determinism at scale: per-term log-probs are doubles, but summing
    doubles is partial-aggregation-order-dependent — so each
    tf * ln(p) contribution is cast to DECIMAL(30,15) first and summed
    EXACTLY (order-free), then the per-doc average goes back to DOUBLE.
    One (doc, term) shuffle + one term-keyed re-aggregation + a 1-row
    broadcast total; the model "training" and scoring are the same two
    scans no matter the corpus size.

    Output: (id, n_tokens, avg_nll, ppl_proxy=exp(avg_nll))."""
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    counts = tf.groupBy("term").agg(F.sum("tf").alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("_total"))
    contrib = (
        tf.join(counts, on="term")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "_ll",
            (
                F.col("tf").cast("double")
                * F.log(
                    F.col("cnt").cast("double") / F.col("_total").cast("double")
                )
            ).cast("decimal(30,15)"),
        )
    )
    per_doc = contrib.groupBy(id_col).agg(
        F.sum("tf").cast("long").alias("n_tokens"),
        F.sum("_ll").alias("_sum_ll"),
    )
    avg_nll = -(F.col("_sum_ll").cast("double")) / F.col("n_tokens")
    return per_doc.select(
        F.col(id_col),
        F.col("n_tokens"),
        avg_nll.alias("avg_nll"),
        F.exp(avg_nll).alias("ppl_proxy"),
    )


def bigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document average negative log-likelihood under an
    INTERPOLATED bigram LM trained on the corpus itself:
    p(w2|w1) = 0.75 * c(w1,w2)/c(w1 as history) + 0.25 * c(w2)/N —
    the next step up from unigram_logprob for quality cuts (catches
    word-salad that has corpus-typical unigrams in corpus-atypical
    order). The interpolation weight is 0.75 on purpose: both it and
    1-lambda = 0.25 are exact binary fractions, so the oracle's
    literals are bit-identical, no ulp trap (ROADMAP float-literal
    note).

    Bigrams are built SCAN-STAGE (slice + arrays_zip on the token
    array — zero extra shuffle vs a positional self-join); the only
    shuffles are the (doc, w1, w2) count and the model aggregations,
    all with map-side combine. Per-position log-probs go through
    DECIMAL(30,15) before the per-doc sum (order-free float parity).
    Docs with <2 tokens have no bigram positions and drop out, same as
    the oracle."""
    base = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_tk"))
    pairs = base.select(
        F.col(id_col),
        F.explode(
            F.when(
                F.size("_tk") >= 2,
                F.arrays_zip(
                    F.slice("_tk", 1, F.size("_tk") - 1).alias("w1"),
                    F.slice("_tk", 2, F.size("_tk") - 1).alias("w2"),
                ),
            ).otherwise(F.array())
        ).alias("_b"),
    ).select(F.col(id_col), F.col("_b.w1").alias("w1"), F.col("_b.w2").alias("w2"))
    tfbg = pairs.groupBy(id_col, "w1", "w2").agg(F.count(F.lit(1)).alias("tf"))
    cbg = tfbg.groupBy("w1", "w2").agg(F.sum("tf").alias("cbg"))
    hist = cbg.groupBy("w1").agg(F.sum("cbg").alias("cw1"))
    toks = df.select(F.explode(tokens(F.col(text_col))).alias("term"))
    uni = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cw2"))
    total = uni.agg(F.sum("cw2").alias("_n"))
    p = (
        F.lit(0.75) * (F.col("cbg").cast("double") / F.col("cw1").cast("double"))
        + F.lit(0.25) * (F.col("cw2").cast("double") / F.col("_n").cast("double"))
    )
    contrib = (
        tfbg.join(cbg, on=["w1", "w2"])
        .join(hist, on="w1")
        .join(uni.withColumnRenamed("term", "w2"), on="w2")
        .crossJoin(F.broadcast(total))
        .withColumn("_ll", (F.col("tf").cast("double") * F.log(p)).cast("decimal(30,15)"))
    )
    per_doc = contrib.groupBy(id_col).agg(
        F.sum("tf").cast("long").alias("n_bigrams"),
        F.sum("_ll").alias("_sum_ll"),
    )
    avg_nll = -(F.col("_sum_ll").cast("double")) / F.col("n_bigrams")
    return per_doc.select(
        F.col(id_col),
        "n_bigrams",
        avg_nll.alias("avg_nll"),
        F.exp(avg_nll).alias("ppl_proxy"),
    )


def feature_hashing(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_features: int = 1024,
) -> DataFrame:
    """The hashing trick: tokens -> fixed-``num_features``-dim signed
    sparse vectors, vocabulary-free (no dictionary to build, broadcast,
    or keep consistent across a 100 TB corpus — THE property that makes
    it the default featurizer for streaming/sharded training). Bucket =
    md5-60 hash mod D; sign = hash bit 10 (the Weinberger et al. signed
    variant, keeping bucket-collision noise zero-mean). Output is the
    sparse long form (id, feature_idx, feature_val) — one scan-stage
    explode + one (id, bucket) aggregation; map-side combine collapses
    repeated tokens before the shuffle. Portable hash end to end, so
    the oracle replays bucketing, signs, and sums exactly."""
    from ..functions.text_fns import md5_hash60

    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_t")
    ).select(F.col(id_col), md5_hash60(F.col("_t")).alias("_h"))
    signed = toks.select(
        F.col(id_col),
        F.pmod(F.col("_h"), F.lit(num_features)).cast("int").alias("feature_idx"),
        F.when(F.expr("(_h >> 10) & 1") == 0, F.lit(1))
        .otherwise(F.lit(-1))
        .alias("_s"),
    )
    return (
        signed.groupBy(id_col, "feature_idx")
        .agg(F.sum("_s").cast("long").alias("feature_val"))
        .filter(F.col("feature_val") != 0)
    )


# -- BPE vocabulary induction ------------------------------------------------
def bpe_pair_counts(
    df: DataFrame,
    text_col: str = "text",
    top: int = 20,
) -> DataFrame:
    """Step 0 of BPE tokenizer training, corpus-scale: adjacent
    character-pair frequencies weighted by word count — the statistic
    every merge decision reads. One token scan -> word counts (the
    corpus compresses to its vocabulary immediately; pair counting
    runs on DISTINCT words x their counts, not on raw tokens) -> one
    pair explode -> one aggregation. Output: top-``top`` candidate
    merges (left_sym, right_sym, pair_count), fully deterministic
    (count desc, then lexicographic)."""
    toks = df.select(F.explode(tokens(F.col(text_col))).alias("w"))
    wc = toks.groupBy("w").agg(F.count(F.lit(1)).alias("wc"))
    pairs = wc.select(
        "wc",
        F.explode(
            # guard: sequence(1, 0) auto-steps DOWN in Spark, so a
            # 1-char word would fabricate bogus pairs without the CASE
            F.expr(
                "CASE WHEN length(w) >= 2 THEN "
                "transform(sequence(1, length(w) - 1), "
                "i -> struct(substring(w, i, 1) AS l, "
                "substring(w, i + 1, 1) AS r)) "
                "ELSE array() END"
            )
        ).alias("p"),
    ).select(F.col("p.l").alias("left_sym"), F.col("p.r").alias("right_sym"), "wc")
    return (
        pairs.groupBy("left_sym", "right_sym")
        .agg(F.sum("wc").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "left_sym", "right_sym")
        .limit(top)
    )


def _bpe_merge_pair(sym_col, left: str, right: str):
    """Replace adjacent (left, right) symbol occurrences with their
    concatenation, greedy left-to-right non-overlapping — the BPE merge
    applied as a pure fold (array accumulator + skip flag), no UDF."""
    init = F.struct(
        F.array().cast("array<string>").alias("out"), F.lit(False).alias("skip")
    )

    def step(acc, i):
        cur = F.element_at(sym_col, i)
        # ANSI mode: element_at past the end THROWS; the lookahead at
        # the last symbol must tolerate it and yield NULL
        nxt = F.try_element_at(sym_col, i + F.lit(1))
        is_pair = (
            (~acc["skip"])
            & (cur == F.lit(left))
            & F.coalesce(nxt == F.lit(right), F.lit(False))
        )
        return F.struct(
            F.when(acc["skip"], acc["out"])
            .when(is_pair, F.concat(acc["out"], F.array(F.lit(left + right))))
            .otherwise(F.concat(acc["out"], F.array(cur)))
            .alias("out"),
            F.when(acc["skip"], F.lit(False)).otherwise(is_pair).alias("skip"),
        )

    return F.aggregate(
        F.sequence(F.lit(1), F.size(sym_col)), init, step, lambda a: a["out"]
    )


def bpe_learn(
    df: DataFrame,
    num_merges: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Learn a BPE merge table from the corpus — the tokenizer-training
    primitive, distributed: each round counts adjacent symbol pairs
    over the (distinct word, count) frame, picks the most frequent
    (ties: lexicographic), and applies the merge as a JVM fold over
    every word's symbol array. The working set is VOCABULARY-sized, not
    corpus-sized (word counts collapse the corpus in pass one — the
    reason BPE training scales to 100 TB at all), each round is one
    aggregation + one map-only rewrite, and lineage is truncated per
    round so the plan stays flat in ``num_merges``. The merge table
    itself is num_merges rows — it IS the artifact (a tokenizer's
    merges.txt) — so the per-round argmax collect is bounded and by
    design. Output: (step, left_sym, right_sym, pair_count)."""
    spark = df.sparkSession
    toks = df.select(F.explode(tokens(F.col(text_col))).alias("w"))
    wc = toks.groupBy("w").agg(F.count(F.lit(1)).alias("wc"))
    # eager=False: the checkpoint materializes as a side effect of the
    # round's top-1 aggregate instead of a dedicated job — one job per
    # round, not two (measured ~25% off the 8-merge train at sf0.1);
    # lineage is still truncated once computed
    words = wc.select(
        F.expr(
            "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
        ).alias("syms"),
        "wc",
    ).localCheckpoint(eager=False)
    merges = []
    for step_i in range(num_merges):
        pairs = words.select(
            "wc",
            F.explode(
                F.expr(
                    "CASE WHEN size(syms) >= 2 THEN "
                    "transform(sequence(1, size(syms) - 1), "
                    "i -> struct(syms[i - 1] AS l, syms[i] AS r)) "
                    "ELSE array() END"
                )
            ).alias("p"),
        ).select(F.col("p.l").alias("l"), F.col("p.r").alias("r"), "wc")
        top = (
            pairs.groupBy("l", "r")
            .agg(F.sum("wc").alias("cnt"))
            .orderBy(F.desc("cnt"), "l", "r")
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
        merges.append((step_i, l, r, cnt))
        words = words.select(
            _bpe_merge_pair(F.col("syms"), l, r).alias("syms"), "wc"
        ).localCheckpoint(eager=False)
    return spark.createDataFrame(
        merges, "step int, left_sym string, right_sym string, pair_count long"
    )


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned BPE merge table to the corpus — the tokenizer's
    ENCODE side (bpe_learn is the train side). Merges are applied in
    rank order, each as the same greedy left-to-right non-overlapping
    rewrite the trainer used (_bpe_merge_pair semantics), so encoding
    reproduces exactly the symbol state training reached. One Arrow
    pass; the merge table (a tokenizer's merges.txt — bounded by
    construction) ships in the UDF closure. Output per doc:
    (id, n_chars_tokens, n_bpe_tokens, compression_ratio) — the
    token-budget statistic sequence packing consumes."""
    import pandas as pd

    mlist = [(str(l), str(r)) for l, r in merges]

    def _apply(word: str) -> list[str]:
        syms = list(word)
        for l, r in mlist:
            out, i = [], 0
            n = len(syms)
            while i < n:
                if i + 1 < n and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    def run(batches):
        for pdf in batches:
            ids, nch, nbpe = [], [], []
            for did, text in zip(pdf[id_col].astype("int64"), pdf[text_col]):
                words = str(text).lower().strip().split()
                total_chars = sum(len(w) for w in words)
                total_bpe = sum(len(_apply(w)) for w in words)
                ids.append(int(did))
                nch.append(total_chars)
                nbpe.append(total_bpe)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_char_tokens": nch,
                    "n_bpe_tokens": nbpe,
                    "compression_ratio": [
                        (c / b if b else 0.0) for c, b in zip(nch, nbpe)
                    ],
                }
            )

    # spread: one Arrow batch stream per partition — a 1-partition scan
    # would run the merge loop on a single core (no-op at real scale)
    return spread(df.select(id_col, text_col)).mapInPandas(
        run,
        schema=(
            f"{id_col} long, n_char_tokens long, n_bpe_tokens long, "
            "compression_ratio double"
        ),
    )


# -- inverted-index full-text search ---------------------------------------
def inverted_index(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Posting lists: (term, doc_id, tf). THE retrieval layout — write it
    bucketed/sorted by term and every term-lookup join becomes a pruned,
    co-located probe (the parquet/bucketing analogue of an inverted
    index's seek). One explode + one groupBy; the shuffle carries
    (term, doc, count) triples after map-side combine."""
    return (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def search_all_terms(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Conjunctive (AND) term search over the corpus: documents containing
    EVERY query term, scored by total query-term frequency. Plan: build
    posting rows, semi-restrict to the broadcast query-term list, then a
    count(DISTINCT-free) groupBy — a doc qualifies when it matched all
    ``len(terms)`` terms (posting rows are per-(term, doc), so the match
    count per doc IS the distinct-term count). At scale the posting-list
    table is precomputed (``inverted_index``) and this becomes a probe
    of len(terms) term partitions instead of a corpus scan."""
    post = inverted_index(df, text_col, id_col)
    q = F.array(*[F.lit(t) for t in terms])
    hits = post.filter(F.array_contains(q, F.col("term")))
    return (
        hits.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("tf").cast("long").alias("score"),
        )
        .filter(F.col("n_terms") == len(terms))
        .select(id_col, F.col("score"))
    )


def quality_logreg(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Model-based quality score: a fixed-weight logistic regression over
    the :func:`quality_features` signals (the fasttext-style quality
    classifier of a training-data pipeline, with hand-set weights in
    place of learned ones — swapping in trained coefficients changes
    nothing structurally).

        z = -1.5 + 0.6*ln(n_tokens) + 8*stopword_ratio
            - 12*punct_ratio - 0.35*avg_token_len
        prob = 1 / (1 + e^-z),  keep = prob >= 0.5

    Pure projection — scores inside the scan stage at any scale, no
    shuffle, no UDF. ln/exp are bitwise-identical between Spark and
    DuckDB (round-2 verification), and every ratio reuses
    quality_features' exact cast shapes, so the probability is
    oracle-comparable to the last ulp."""
    prob = quality_logreg_prob(F.col(text_col))
    return df.select(
        F.col(id_col),
        prob.alias("quality_prob"),
        F.when(prob >= 0.5, 1).otherwise(0).alias("keep"),
    )


def quality_logreg_prob(text) -> "F.Column":
    """The :func:`quality_logreg` probability as a bare Column — so
    gate-style consumers (clean_corpus_portable) can FILTER inline in
    the scan stage instead of computing an (id, prob) frame and
    semi-joining it back onto the corpus (r11, guide §2.4: that
    self-join cost a second full scan + an id-keyed exchange for a
    value that is a pure projection).  Expression shape (literal order,
    casts) is identical to the frame form, so the probability stays
    oracle-comparable to the last ulp."""
    n_tok = token_count(text)
    n_chars = F.length(text)
    n_punct = punct_count(text)
    sw = stopword_hits(text, LANG_MARKERS["en"])
    avg_token_len = n_chars.cast("double") / n_tok.cast("double")
    punct_ratio = n_punct.cast("double") / n_chars.cast("double")
    stopword_ratio = sw.cast("double") / n_tok.cast("double")
    # association mirrors the oracle SQL exactly: left-to-right adds
    z = (
        F.lit(-1.5)
        + F.lit(0.6) * F.log(n_tok.cast("double"))
        + F.lit(8.0) * stopword_ratio
        - F.lit(12.0) * punct_ratio
        - F.lit(0.35) * avg_token_len
    )
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def logreg_train_step(
    df: DataFrame,
    weights: tuple[float, float, float, float, float] = (
        -1.5, 0.6, 8.0, -12.0, -0.35
    ),
    lr: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One full-batch gradient-descent step of the logistic quality
    classifier — training the model IN the engine, not just scoring
    with it. The weak label is :func:`quality_features`' rule-based
    ``quality_ok`` flag (classifier distillation: the learned model
    replaces the hand-set rule at serving time), features are the
    same four signals :func:`quality_logreg` scores with plus a bias.

        p_i   = sigmoid(w . x_i)
        g_j   = sum_i (p_i - y_i) * x_ij / N
        w'_j  = w_j - lr * g_j

    Scale shape: ONE scan-stage aggregation — the per-doc gradient
    terms are projections, each term casts to DECIMAL(30,15) before
    SUM so partial-agg order cannot move the last ulp (the same
    order-free-sum discipline as `embedding_kmeans_step`), and the
    5-feature result explodes from a single aggregate row. Per-step
    cost at 100 TB is one corpus scan + a 5-value reduce; an epoch is
    a driver loop over steps, exactly like the k-means loop.

    Returns one row per feature: (feature, w_old, gradient, w_new),
    deterministic and fully SQL-replayable (ln/exp bitwise parity)."""
    text = F.col(text_col)
    n_tok = token_count(text)
    n_chars = F.length(text)
    n_punct = punct_count(text)
    sw = stopword_hits(text, LANG_MARKERS["en"])
    x1 = F.log(n_tok.cast("double"))
    x2 = sw.cast("double") / n_tok.cast("double")
    x3 = n_punct.cast("double") / n_chars.cast("double")
    x4 = n_chars.cast("double") / n_tok.cast("double")
    y = (
        F.when((n_chars >= 100) & (n_tok >= 20) & (n_punct * 5 <= n_chars), 1)
        .otherwise(0)
        .cast("double")
    )
    w0, w1, w2, w3, w4 = (F.lit(float(w)) for w in weights)
    # association mirrors quality_logreg / the oracle: left-to-right adds
    z = w0 + w1 * x1 + w2 * x2 + w3 * x3 + w4 * x4
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    r = p - y  # the residual every feature's gradient term shares
    feats = [F.lit(1.0), x1, x2, x3, x4]
    agg = df.select(
        *[(r * f).cast("decimal(30,15)").alias(f"t{j}") for j, f in enumerate(feats)],
    ).agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(F.col(f"t{j}")).alias(f"s{j}") for j in range(5)],
    )
    names = ("bias", "ln_tokens", "stopword_ratio", "punct_ratio", "avg_token_len")
    rows = F.array(
        *[
            F.struct(
                F.lit(names[j]).alias("feature"),
                F.lit(float(weights[j])).alias("w_old"),
                (F.col(f"s{j}").cast("double") / F.col("n").cast("double")).alias(
                    "gradient"
                ),
                (
                    F.lit(float(weights[j]))
                    - F.lit(float(lr))
                    * (F.col(f"s{j}").cast("double") / F.col("n").cast("double"))
                ).alias("w_new"),
            )
            for j in range(5)
        ]
    )
    return agg.select(F.explode(rows).alias("r")).select("r.*")


def logreg_train(
    df: DataFrame,
    iters: int = 5,
    lr: float = 0.5,
    weights: tuple[float, float, float, float, float] = (
        -1.5, 0.6, 8.0, -12.0, -0.35
    ),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Full-batch gradient-descent TRAINING LOOP over
    :func:`logreg_train_step` — the iterative driver-loop shape of
    `embedding_kmeans` applied to the quality classifier. Each round is
    one corpus scan + a 5-value reduce; the 5 updated weights come back
    to the driver (bounded by contract: always exactly 5 rows, the
    same bounded-collect discipline as the k-means centroid table and
    the BPE per-round argmax) and parameterize the next step's plan.

    Returns the whole trajectory: (step, feature, weight) with step 0
    = the initial weights, so convergence is inspectable. Rows-only by
    design (iterative); per-step math is oracle-checked via
    text_logreg_train_step and the loop is numpy-parity pytest-pinned."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    spark = df.sparkSession
    names = ("bias", "ln_tokens", "stopword_ratio", "punct_ratio", "avg_token_len")
    w = tuple(float(x) for x in weights)
    traj = [(0, names[j], w[j]) for j in range(5)]
    for step in range(1, iters + 1):
        got = {
            r.feature: r.w_new
            for r in logreg_train_step(
                df, weights=w, lr=lr, text_col=text_col, id_col=id_col
            ).collect()
        }
        w = tuple(got[n] for n in names)
        traj += [(step, names[j], w[j]) for j in range(5)]
    return spark.createDataFrame(traj, "step int, feature string, weight double")


def bm25_search(
    df: DataFrame,
    terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25-ranked term search (Lucene-style idf), the ranked upgrade of
    :func:`search_all_terms`: any-term match, scored

        idf_t  = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
        s(d,t) = idf_t * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    and summed per doc through DECIMAL(30,15) so partial-agg order
    cannot move the last ulp — the whole ranking replays in DuckDB SQL.

    Plan shape: posting rows restricted to the broadcast query-term
    list (an IN predicate, pushed into the scan stage), doc lengths
    from the same token explode, two 1-row scalars (N, avgdl)
    broadcast back, per-term df from a len(terms)-row aggregate, final
    top-k via orderBy+limit (TakeOrderedAndProject — no global sort
    materialization). At scale the posting lists come precomputed
    (``inverted_index`` written bucketed by term) and the corpus scan
    drops out."""
    post = inverted_index(df, text_col, id_col)
    q = F.array(*[F.lit(t) for t in terms])
    dl = (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("t"))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("dl"))
    )
    scalars = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    ).select(
        F.col("n_docs"),
        (F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")).alias(
            "avgdl"
        ),
    )
    hits = post.filter(F.array_contains(q, F.col("term")))
    dft = hits.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    scored = (
        hits.join(F.broadcast(dft), on="term")
        .join(dl, on=id_col)
        .join(F.broadcast(scalars))
    )
    idf = F.log(
        F.lit(1.0)
        + (
            (F.col("n_docs").cast("double") - F.col("df_t").cast("double") + F.lit(0.5))
            / (F.col("df_t").cast("double") + F.lit(0.5))
        )
    )
    tf = F.col("tf").cast("double")
    s = (
        idf
        * (tf * F.lit(k1 + 1.0))
        / (
            tf
            + F.lit(k1)
            * (
                F.lit(1.0 - b)
                + F.lit(b) * (F.col("dl").cast("double") / F.col("avgdl"))
            )
        )
    )
    per_doc = (
        scored.withColumn("_s", s.cast("decimal(30,15)"))
        .groupBy(id_col)
        .agg(F.sum("_s").alias("_score"))
    )
    return (
        per_doc.orderBy(F.col("_score").desc(), F.col(id_col))
        .limit(k)
        .select(F.col(id_col), F.col("_score").cast("double").alias("bm25"))
    )


def kn_bigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document average negative log-likelihood under an (interpolated)
    KNESER-NEY smoothed bigram LM trained on the corpus itself —
    the published step up from :func:`bigram_logprob`'s fixed-mix
    interpolation (Kneser & Ney 1995; Chen & Goodman 1999 eq. 4.28):

        p(w2|w1) = max(c(w1,w2) - D, 0)/c(w1)
                   + (D * N1+(w1,*)/c(w1)) * N1+(*,w2)/N1+(*,*)

    The continuation probability N1+(*,w2)/N1+(*,*) scores w2 by how
    many DISTINCT histories it follows, not how often it occurs — the
    classic fix for high-frequency-but-bound words ("Francisco" is
    frequent yet follows only "San", so its continuation weight is
    tiny).  D = 0.75: exact binary fraction, no oracle ulp trap.

    All model tables are group-by aggregates of the bigram-type frame
    (types, not token streams — vocabulary-sized working sets); the
    1-row type total broadcasts.  Same scan-stage bigram construction,
    DECIMAL(30,15) order-free per-doc summation, and <2-token dropout
    as bigram_logprob."""
    base = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_tk"))
    pairs = base.select(
        F.col(id_col),
        F.explode(
            F.when(
                F.size("_tk") >= 2,
                F.arrays_zip(
                    F.slice("_tk", 1, F.size("_tk") - 1).alias("w1"),
                    F.slice("_tk", 2, F.size("_tk") - 1).alias("w2"),
                ),
            ).otherwise(F.array())
        ).alias("_b"),
    ).select(F.col(id_col), F.col("_b.w1").alias("w1"), F.col("_b.w2").alias("w2"))
    tfbg = pairs.groupBy(id_col, "w1", "w2").agg(F.count(F.lit(1)).alias("tf"))
    cbg = tfbg.groupBy("w1", "w2").agg(F.sum("tf").alias("cbg"))
    hist = cbg.groupBy("w1").agg(
        F.sum("cbg").alias("cw1"), F.count(F.lit(1)).alias("n1w1")
    )
    prec = cbg.groupBy("w2").agg(F.count(F.lit(1)).alias("n1prec"))
    types = cbg.agg(F.count(F.lit(1)).alias("_types"))
    d_ = F.lit(0.75)
    p = (
        F.greatest(F.col("cbg").cast("double") - d_, F.lit(0.0))
        / F.col("cw1").cast("double")
    ) + (
        (d_ * F.col("n1w1").cast("double") / F.col("cw1").cast("double"))
        * (F.col("n1prec").cast("double") / F.col("_types").cast("double"))
    )
    contrib = (
        tfbg.join(cbg, on=["w1", "w2"])
        .join(hist, on="w1")
        .join(prec, on="w2")
        .crossJoin(F.broadcast(types))
        .withColumn(
            "_ll", (F.col("tf").cast("double") * F.log(p)).cast("decimal(30,15)")
        )
    )
    per_doc = contrib.groupBy(id_col).agg(
        F.sum("tf").cast("long").alias("n_bigrams"),
        F.sum("_ll").alias("_sum_ll"),
    )
    avg_nll = -(F.col("_sum_ll").cast("double")) / F.col("n_bigrams")
    return per_doc.select(
        F.col(id_col),
        "n_bigrams",
        avg_nll.alias("avg_nll"),
        F.exp(avg_nll).alias("ppl_proxy"),
    )


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The published Gopher quality-filter rules (Rae et al. 2021,
    "Scaling Language Models", Appendix A) as ONE map-only conditional
    scan — each document labeled with every rule verdict plus the
    priority-ordered first-fail reason:

      * word count in [50, 100000]
      * mean word length in [3, 10]
      * symbol-to-word ratio ('#' and '...') <= 0.1
      * <= 90% of lines starting with a bullet ('-' or '*')
      * <= 30% of lines ending with '...'
      * >= 80% of words containing an alphabetic character
      * >= 2 of the 8 Gopher stop words present
        (the, be, to, of, and, that, have, with)

    Pure projection (scan-stage, zero shuffle); integer counts divide as
    doubles with fixed association so the oracle replays bit-exactly.
    The thresholds are the paper's, unmodified — this is the
    recognizable baseline gate corpora are compared on; the engine's
    tunable gates live in corpus.quality_* / corpus_quality_reasons."""
    t = F.trim(F.col(text_col))
    tk = F.split(t, r"\s+")
    n_words = F.size(tk)
    sum_word_len = F.expr(
        f"aggregate(transform(split(trim({text_col}), '\\\\s+'), "
        "x -> length(x)), 0L, (a, x) -> a + x)"
    )
    mean_word_len = sum_word_len.cast("double") / n_words.cast("double")
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    symbol_ratio = (n_hash + n_ellipsis).cast("double") / n_words.cast("double")
    lines = F.split(F.col(text_col), r"\n")
    n_lines = F.size(lines)
    bullet_frac = F.size(
        F.filter(lines, lambda l: l.startswith("-") | l.startswith("*"))
    ).cast("double") / n_lines.cast("double")
    ellipsis_line_frac = F.size(
        F.filter(lines, lambda l: l.endswith("..."))
    ).cast("double") / n_lines.cast("double")
    alpha_frac = F.size(
        F.filter(tk, lambda w: w.rlike("[a-zA-Z]"))
    ).cast("double") / n_words.cast("double")
    stop_hits = F.size(
        F.array_intersect(
            F.transform(tk, lambda w: F.lower(w)),
            F.array(*[F.lit(w) for w in
                      ("the", "be", "to", "of", "and", "that", "have", "with")]),
        )
    )
    checks = [
        ("word_count", (n_words >= 50) & (n_words <= 100000)),
        ("mean_word_length", (mean_word_len >= 3.0) & (mean_word_len <= 10.0)),
        ("symbol_ratio", symbol_ratio <= 0.1),
        ("bullet_lines", bullet_frac <= 0.9),
        ("ellipsis_lines", ellipsis_line_frac <= 0.3),
        ("alpha_words", alpha_frac >= 0.8),
        ("stop_words", stop_hits >= 2),
    ]
    reason = F.lit("pass")
    for name, ok in reversed(checks):
        reason = F.when(~ok, F.lit(name)).otherwise(reason)
    return df.select(
        F.col(id_col),
        *[ok.alias(f"ok_{name}") for name, ok in checks],
        reason.alias("gate_reason"),
    )


def dedup_lines_within_doc(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style INTRA-document line dedup (Raffel et al. 2020 §2.2
    "we discard ... duplicate lines within a page"): drop repeated lines
    inside each document, keeping the first occurrence in order.  The
    cross-corpus twin is corpus.paragraph_dedup; this one is a pure
    map-only projection (array fold inside the scan stage, zero shuffle
    at any corpus size).

    Output: id, deduped text, original/kept line counts."""
    # keep line i iff array_position of its value equals its own index
    # (first occurrence); filter's (value, index) lambda keeps order.
    # The filtered array is projected ONCE and re-referenced by name:
    # reusing one lambda-HOF Column object in several expressions of the
    # same select rebinds lambda-variable IDs and silently corrupts the
    # second use (observed: array_join correct, size() off by one).
    staged = df.select(
        F.col(id_col), F.split(F.col(text_col), r"\n").alias("_lines")
    )
    staged = staged.withColumn(
        "_kept",
        F.filter(
            F.col("_lines"),
            lambda l, i: F.array_position(F.col("_lines"), l) == i + F.lit(1),
        ),
    )
    return staged.select(
        F.col(id_col),
        F.array_join(F.col("_kept"), "\n").alias("text"),
        F.size(F.col("_lines")).alias("n_lines"),
        F.size(F.col("_kept")).alias("n_kept"),
    )


def char_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Shannon character entropy — the cheap randomness /
    boilerplate detector CCNet-class pipelines gate on (very low
    entropy = repeated filler, very high = base64/binary junk; natural
    prose sits in a narrow band).

    Shape: one scan, character explode, two hash aggregations keyed by
    doc — per-doc state is the doc's alphabet (bounded), never the
    corpus.  Exactness: p*ln(p) terms are doubles with a fixed
    association, summed as DECIMAL(30,15) so the per-doc sum is
    partial-order-free and the DuckDB oracle replays it bit-for-bit
    (ln double parity is already relied on by the logreg/LM oracles).
    Output: (id, n_chars, n_unique_chars, entropy_nats)."""
    # spread first: a small parquet scans as one partition and the char
    # explode + both aggregations would run on one core; at real scale
    # the scan already exceeds defaultParallelism (no-op, no shuffle)
    df = spread(df)
    chars = df.select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"transform(sequence(1, length({text_col})), "
                f"i -> substring({text_col}, i, 1))"
            )
        ).alias("ch"),
    )
    counts = chars.groupBy(id_col, "ch").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    p = F.col("cnt").cast("double") / F.col("n_chars").cast("double")
    term = (p * F.log(p)).cast("decimal(30,15)")
    totals = counts.groupBy(id_col).agg(
        F.sum("cnt").alias("n_chars"),
        F.count(F.lit(1)).alias("n_unique_chars"),
    )
    return (
        counts.join(totals, on=id_col)
        .groupBy(
            F.col(id_col),
            F.col("n_chars").cast("bigint").alias("n_chars"),
            F.col("n_unique_chars").cast("bigint").alias("n_unique_chars"),
        )
        .agg((-F.sum(term).cast("double")).alias("entropy_nats"))
    )


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    top_n: int = 200,
) -> DataFrame:
    """Zipf power-law fit of the corpus token distribution: OLS of
    ln(freq) on ln(rank) over the top ``top_n`` tokens — slope near -1
    is the natural-language signature; a flat slope flags templated or
    machine-generated corpora, a cliff flags boilerplate domination.
    The corpus-health one-liner next to corpus_vocab_stats.

    Shape: token count aggregate -> mergeable top-N
    (TakeOrderedAndProject, no global sort) -> rank window over N rows
    (bounded input by construction) -> closed-form OLS from DECIMAL
    sums (same exactness contract as profile.linreg_per_group).
    Output one row: (n_terms, slope, intercept, pearson_r)."""
    from pyspark.sql import Window

    toks = df.select(F.explode(tokens(F.col(text_col))).alias("term"))
    top = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), "term")
        .limit(top_n)
    )
    w = Window.orderBy(F.desc("freq"), "term")
    xy = top.select(
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )
    # ln-scale inputs are O(1): 15 decimal places keep the moment sums
    # faithful to the doubles (a 6-decimal cast costs ~1e-6 relative
    # error vs the true OLS); 23 integer digits of headroom remain
    dec = "decimal(38,15)"
    agg = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(dec)).alias("syy"),
        F.sum((F.col("x") * F.col("y")).cast(dec)).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    den_x = n * F.col("sxx").cast("double") - sx * sx
    den_y = n * F.col("syy").cast("double") - sy * sy
    num = n * F.col("sxy").cast("double") - sx * sy
    slope = F.when(den_x != 0.0, num / den_x)
    return agg.select(
        F.col("n").cast("long").alias("n_terms"),
        slope.alias("slope"),
        F.when(den_x != 0.0, (sy - slope * sx) / n).alias("intercept"),
        F.when(
            (den_x != 0.0) & (den_y != 0.0), num / F.sqrt(den_x * den_y)
        ).alias("pearson_r"),
    )


def sparse_retrieval_topk(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 10,
    num_features: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str | None = None,
) -> DataFrame:
    """Hashed-sparse-vector retrieval: score every corpus row against
    each query by cosine over their signed hashing-trick vectors
    (feature_hashing), computed as an INVERTED-BUCKET equi-join — the
    shape distributed sparse retrieval actually uses at scale: rows
    join only where they share a feature bucket (posting-list
    intersection), never a dense all-pairs scan.  Everything is
    integer-exact until the final cosine division (signed counts, dot,
    squared norms are all BIGINTs), so the ranking replays bit-for-bit
    in SQL.  The query side is broadcast (queries x num_features rows,
    bounded).  Output: (query_id, id, cos_sim, rank <= k)."""
    cf = feature_hashing(
        corpus, text_col=text_col, id_col=id_col, num_features=num_features
    )
    qf = feature_hashing(
        query.select(
            F.col(query_id_col or id_col).alias("query_id"), F.col(text_col)
        ),
        text_col=text_col,
        id_col="query_id",
        num_features=num_features,
    ).withColumnRenamed("feature_val", "_qv")
    cn = cf.groupBy(id_col).agg(
        F.sum(F.col("feature_val") * F.col("feature_val"))
        .cast("long")
        .alias("_cn2")
    )
    qn = qf.groupBy("query_id").agg(
        F.sum(F.col("_qv") * F.col("_qv")).cast("long").alias("_qn2")
    )
    from pyspark.sql import Window

    dot = (
        cf.join(F.broadcast(qf), on="feature_idx")
        .groupBy("query_id", id_col)
        .agg(
            F.sum(F.col("feature_val") * F.col("_qv")).cast("long").alias("_dot")
        )
    )
    scored = (
        dot.join(cn, on=id_col)
        .join(F.broadcast(qn), on="query_id")
        .select(
            "query_id",
            F.col(id_col),
            (
                F.col("_dot").cast("double")
                / (
                    F.sqrt(F.col("_cn2").cast("double"))
                    * F.sqrt(F.col("_qn2").cast("double"))
                )
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", id_col, "cos_sim",
            F.col("rank").cast("int").alias("rank"),
        )
    )


# Small signed sentiment lexicon (AFINN-style scoring scheme: integer
# valence per word, summed over the doc). Deployments swap in a full
# lexicon; the OPERATOR contract — broadcast lexicon join, integer-exact
# sums, coverage stats — is what matters and is lexicon-size-free.
SENTIMENT_LEXICON: dict[str, int] = {
    "good": 3, "great": 3, "excellent": 5, "amazing": 4, "love": 3,
    "happy": 3, "best": 3, "win": 4, "wonderful": 4, "nice": 3,
    "better": 2, "success": 2, "improved": 2, "fast": 1, "easy": 1,
    "bad": -3, "terrible": -3, "awful": -3, "hate": -3, "worst": -3,
    "sad": -2, "fail": -2, "failure": -2, "broken": -2, "slow": -1,
    "hard": -1, "problem": -2, "error": -2, "wrong": -2, "poor": -2,
}


def sentiment_score(
    df: DataFrame,
    lexicon: dict[str, int] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Lexicon-based sentiment per document (the classic large-scale
    Spark text-analytics workload): token explode -> broadcast lexicon
    equi-join -> integer-exact valence sum and hit coverage.  All
    counts are BIGINTs and the mean is one double division of exact
    aggregates, so the scorer replays bit-for-bit in SQL.

    Scale shape: the lexicon is a broadcast dimension (thousands of
    rows at most); scoring is one scan + one doc-keyed aggregation —
    map-side combine collapses repeated tokens before the shuffle.
    Docs with zero lexicon hits score 0 with n_hits = 0 (left join at
    the doc grain, never dropped).  Output: (id, n_tokens, n_hits,
    sentiment_sum, sentiment_mean)."""
    lex = SENTIMENT_LEXICON if lexicon is None else lexicon
    spark = df.sparkSession
    lex_df = spark.createDataFrame(
        [(w, int(v)) for w, v in sorted(lex.items())],
        "_w string, _v int",
    )
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_t")
    )
    per_doc = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens")
    )
    hits = (
        toks.join(F.broadcast(lex_df), toks._t == lex_df._w)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_hits"),
            F.sum("_v").cast("bigint").alias("sentiment_sum"),
        )
    )
    return (
        per_doc.join(hits, on=id_col, how="left")
        .select(
            F.col(id_col),
            "n_tokens",
            F.coalesce(F.col("n_hits"), F.lit(0).cast("bigint")).alias("n_hits"),
            F.coalesce(
                F.col("sentiment_sum"), F.lit(0).cast("bigint")
            ).alias("sentiment_sum"),
            F.when(
                F.coalesce(F.col("n_hits"), F.lit(0)) > 0,
                F.col("sentiment_sum").cast("double")
                / F.col("n_hits").cast("double"),
            ).otherwise(F.lit(0.0)).alias("sentiment_mean"),
        )
    )


def readability_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Flesch reading ease + Flesch-Kincaid grade per document — the
    classic readability gate curation pipelines run next to the quality
    classifier (FineWeb-Edu-style selection filters on exactly this
    family of scores).  Syllables are approximated as vowel-group runs
    ([aeiouy]+) — the standard regex proxy, within ~10% of dictionary
    syllable counts on English prose and exactly reproducible in SQL;
    sentences as [.!?]+ runs (floored at 1).  Pure scan-stage
    projection: three regexp passes, two divisions, literal
    coefficients — no shuffle at all, so the 100 TB cost is the scan
    you were already paying.  All coefficients are literals on both
    sides (oracle literal-parity rule)."""
    t = F.lower(F.trim(F.col(text_col)))
    w = F.size(tokens(F.col(text_col)))
    s = F.greatest(
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(r"[.!?]+"), F.lit(0))
        ),
        F.lit(1),
    )
    y = F.greatest(
        F.size(F.regexp_extract_all(t, F.lit(r"[aeiouy]+"), F.lit(0))),
        F.lit(1),
    )
    wps = w.cast("double") / s.cast("double")
    spw = y.cast("double") / w.cast("double")
    return df.select(
        F.col(id_col),
        w.cast("bigint").alias("n_words"),
        s.cast("bigint").alias("n_sentences"),
        y.cast("bigint").alias("n_syllables"),
        (F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw).alias(
            "flesch_ease"
        ),
        (F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)).alias(
            "fk_grade"
        ),
    )


def pii_density(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-source PII density report: how many email / phone / IP
    literals each source ships per thousand characters — the dashboard
    that catches a LEAKY SOURCE before its documents enter training
    (redact_pii scrubs per doc; this aggregates exposure per upstream
    feed so curation can quarantine or re-contract the feed itself).

    One aggregation scan: per-row match counts come from
    regexp_count with the SAME conservative cross-engine patterns as
    redact_pii (PII_PATTERNS — no backrefs/lookaround, identical in
    Java regex and RE2), then DECIMAL-summed per source.  Output:
    (source, n_docs, n_chars, n_emails, n_phones, n_ips,
    pii_per_kchar)."""
    text = F.col(text_col)
    counts = [
        F.regexp_count(text, F.lit(pat)).alias(f"_c{i}")
        for i, (pat, _) in enumerate(PII_PATTERNS)
    ]
    staged = df.select(
        F.col(group_col), F.length(text).alias("_len"), *counts
    )
    g = staged.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.col("_len").cast("decimal(38,0)")).cast("bigint").alias("n_chars"),
        F.sum(F.col("_c0").cast("decimal(38,0)")).cast("bigint").alias("n_emails"),
        F.sum(F.col("_c1").cast("decimal(38,0)")).cast("bigint").alias("n_phones"),
        F.sum(F.col("_c2").cast("decimal(38,0)")).cast("bigint").alias("n_ips"),
    )
    total = (
        F.col("n_emails") + F.col("n_phones") + F.col("n_ips")
    ).cast("double")
    return g.select(
        group_col,
        "n_docs",
        "n_chars",
        "n_emails",
        "n_phones",
        "n_ips",
        F.when(
            F.col("n_chars") > 0,
            total * F.lit(1000.0) / F.col("n_chars").cast("double"),
        ).alias("pii_per_kchar"),
    )


# RAKE stopword list: a fixed, versioned vocabulary (order irrelevant —
# membership only).  Deliberately small and frozen: the stoplist is part
# of the operator's contract (changing it changes every phrase boundary),
# and the SQL oracle embeds the same literal list.
RAKE_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "in", "on", "to", "is", "are",
    "was", "were", "for", "with", "as", "by", "at", "it", "its", "this",
    "that", "be", "from", "has", "have", "had", "not", "but", "they",
    "their", "we", "our", "you", "your", "he", "she", "his", "her",
    "will", "would", "can", "could", "should", "may", "might", "do",
    "does", "did", "so", "if", "then", "than", "there", "here", "what",
    "which", "who", "when", "where", "how", "all", "each", "every",
    "some", "any", "no", "nor", "too", "very", "just", "about", "into",
    "over", "after", "before", "between", "under", "above", "up",
    "down", "out", "off", "again", "once", "only", "own", "same",
    "such", "both", "few", "more", "most", "other",
]


def rake_keywords(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top: int = 50,
) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010) over the corpus:
    candidate phrases are maximal stopword-free token runs; a word's
    score is degree/frequency where degree sums the lengths of every
    phrase containing it (co-occurrence incl. itself — the standard
    simplification) and frequency counts its phrase occurrences; a
    phrase's score sums its member words' scores.  Returns the global
    top-``top`` phrases (phrase, n_words, n_occurrences, rake_score) —
    the corpus-level keyphrase inventory next to text_tfidf_topterms'
    per-term view and text_collocations_pmi's bigram view.

    Exactness: tokenization is one regexp_replace + trim + split both
    engines run identically; phrase islands are a per-doc running
    stopword count; degree/frequency are exact BIGINTs; each word score
    truncates to DECIMAL(30,15) so the per-phrase sum is order-free;
    ties break (score desc, phrase asc).

    Scale shape: tokenize + island windows shuffle on the doc key only;
    word stats aggregate on the token key; phrase scores join the
    distinct-phrase table (bounded by distinct phrases) against word
    scores; the final top-k is a mergeable orderBy+limit."""
    from pyspark.sql import Window

    norm = F.trim(
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", " ")
    )
    toks = docs.select(
        F.col(id_col).alias("_doc"),
        F.posexplode(F.split(norm, " +")).alias("_pos", "_tok"),
    ).withColumn("_stop", F.col("_tok").isin(RAKE_STOPWORDS))
    w_doc = Window.partitionBy("_doc").orderBy("_pos")
    grouped = toks.withColumn(
        "_grp", F.sum(F.when(F.col("_stop"), 1).otherwise(0)).over(w_doc)
    ).filter(~F.col("_stop") & (F.col("_tok") != ""))
    phrases = grouped.groupBy("_doc", "_grp").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("_pos", "_tok"))
                ),
                lambda s: s["_tok"],
            ),
        ).alias("phrase"),
        F.count(F.lit(1)).alias("_len"),
    )
    word_stats = (
        grouped.join(phrases.select("_doc", "_grp", "_len"), on=["_doc", "_grp"])
        .groupBy("_tok")
        .agg(
            F.count(F.lit(1)).alias("_freq"),
            F.sum("_len").alias("_deg"),
        )
        .select(
            "_tok",
            (F.col("_deg").cast("double") / F.col("_freq").cast("double"))
            .cast("decimal(30,15)")
            .alias("_wscore"),
        )
    )
    distinct_phrases = phrases.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences")
    )
    member = distinct_phrases.select(
        "phrase",
        "n_occurrences",
        F.explode(F.split(F.col("phrase"), " ")).alias("_tok"),
    )
    scored = member.join(word_stats, on="_tok").groupBy(
        "phrase", "n_occurrences"
    ).agg(
        F.count(F.lit(1)).cast("int").alias("n_words"),
        F.sum("_wscore").cast("double").alias("rake_score"),
    )
    return scored.select(
        "phrase", "n_words", "n_occurrences", "rake_score"
    ).orderBy(F.desc("rake_score"), F.asc("phrase")).limit(top)
