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

from ..functions.df_utils import spread

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
    dedup_strategy: str = "pairs",
    near_dedup: str = "xxhash",
) -> DataFrame:
    """Return the cleaned corpus: original columns + ``predicted_lang``.

    ``near_dedup`` picks the MinHash hash family: ``"xxhash"`` (default,
    the production path — cheapest per shingle) or ``"portable"``
    (md5-60 hashes via :func:`..operators.dedup.minhash_dedup_portable`,
    making the ENTIRE pipeline — gates, language argmax, exact dedup,
    banding, verify, drops — replayable in DuckDB SQL; the registered
    oracle-checked queries use this).

    Drops, in order: low-quality docs (length / token-count / punctuation
    gates, computed inline — same thresholds as
    ``text.quality_features``), docs outside ``keep_langs`` (argmax of
    stopword-marker scores; None keeps all), exact duplicates (smallest
    id per normalized-text hash wins), and near-duplicates at
    >= ``min_jaccard``.

    ``dedup_strategy`` picks the near-dup keep rule:

    * ``"pairs"`` — drop the higher-id member of every verified pair.
      One extra anti-join; can over-keep when two docs are only
      transitively similar through a higher-id hub (pairs (a,c),(b,c)
      keep both a and b).
    * ``"clusters"`` — connected components over the verified pairs,
      keep only the minimum id of each component (graph.py::
      dedup_clusters). Exact under chains at the cost of the iterative
      label-propagation rounds (O(cluster diameter), shallow for
      near-dup graphs)."""
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

    # exact dedup, keeping the smallest id per normalized text — as a
    # min_by hash aggregate, not a rank window: the aggregate combines
    # map-side, so duplicate text payloads are dropped BEFORE the
    # shuffle (the window shipped every copy to the sort)
    exact_canon = (
        gated.groupBy(F.md5(F.lower(F.trim(text))).alias("_th"))
        .agg(F.min_by(F.struct(*gated.columns), F.col(id_col)).alias("_r"))
        .select("_r.*")
    )

    if near_dedup == "portable":
        from .dedup import minhash_dedup_portable

        pairs = minhash_dedup_portable(
            exact_canon,
            text_col=text_col,
            id_col=id_col,
            num_hashes=num_hashes,
            bands=bands,
            min_jaccard=min_jaccard,
        )
    else:
        pairs = minhash_dedup(
            exact_canon,
            text_col=text_col,
            id_col=id_col,
            num_hashes=num_hashes,
            bands=bands,
            min_jaccard=min_jaccard,
        )
    if dedup_strategy == "clusters":
        from .graph import dedup_clusters

        # every non-canonical member of a component is a drop
        drops = (
            dedup_clusters(pairs)
            .filter(F.col("doc_id") != F.col("canonical_id"))
            .select(F.col("doc_id").alias(id_col))
        )
    else:
        # near-dedup: drop the higher-id side of each verified pair
        drops = (
            pairs.select(F.col("doc_id_b").alias(id_col)).distinct()
        )
    return exact_canon.join(drops, on=id_col, how="left_anti")


def decontaminate(
    df: DataFrame,
    eval_shingles: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 5,
    mode: str = "flag",
) -> DataFrame:
    """Benchmark decontamination: find training docs sharing any word
    ``shingle_n``-gram with the evaluation set.

    ``eval_shingles`` is a one-column frame (``shingle``) of the eval
    suite's n-grams (see :func:`eval_shingle_set`) — small by nature
    (benchmarks are MBs, corpora are TBs), so it is broadcast and the
    check runs as a map-side semi-join of the exploded doc shingles: one
    corpus scan, no shuffle of corpus data. ``mode='flag'`` returns
    (id, is_contaminated 0/1) for every doc; ``mode='drop'`` returns the
    clean rows of ``df``."""
    from ..functions.text_fns import shingles

    doc_sh = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(F.col(text_col), shingle_n))).alias(
            "shingle"
        ),
    )
    hit_ids = (
        doc_sh.join(F.broadcast(eval_shingles), on="shingle", how="left_semi")
        .select(id_col)
        .distinct()
    )
    if mode == "drop":
        return df.join(hit_ids, on=id_col, how="left_anti")
    return (
        df.select(id_col)
        .join(hit_ids.withColumn("_hit", F.lit(1)), on=id_col, how="left")
        .select(
            F.col(id_col), F.coalesce(F.col("_hit"), F.lit(0)).alias("is_contaminated")
        )
    )


def eval_shingle_set(
    eval_docs: DataFrame, text_col: str = "text", shingle_n: int = 5
) -> DataFrame:
    """The distinct word n-grams of an evaluation suite, as the
    one-column (``shingle``) frame :func:`decontaminate` consumes.
    Computed once per benchmark release and persisted."""
    from ..functions.text_fns import shingles

    return (
        eval_docs.select(
            F.explode(F.array_distinct(shingles(F.col(text_col), shingle_n))).alias(
                "shingle"
            )
        )
        .distinct()
    )


# -- corpus curation: sampling, stratification, mixture reporting ----------
#
# The selection half of a training-data pipeline: once cleaned, a corpus
# is SAMPLED (deterministically — reruns must pick the same docs),
# STRATIFIED (per-language/source quotas or quality cuts), and its
# MIXTURE measured (what share of tokens comes from where). All pure
# DataFrame ops: one window per stratum (shuffle on the stratum key,
# never on doc id) or a single groupBy — nothing driver-side, no UDFs.


def source_ngram_novelty(
    docs: DataFrame,
    shingle_n: int = 5,
    text_col: str = "text",
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source n-gram novelty: of each source's DISTINCT word
    ``shingle_n``-grams, how many also occur in at least one OTHER
    source — the content-level overlap view that sits between
    cross_source_matrix (whole-document exact copies) and
    decontaminate (one fixed eval set): a feed whose shingles are
    mostly shared is a re-crawl/mirror contributing little novel text
    to a training mix, even when no single document is an exact dupe.

    Output per source: (source, n_distinct_ngrams, n_shared_ngrams,
    novelty_frac) with ``novelty_frac = 1 - shared/distinct``; ordered
    by novelty ascending (worst offenders first), ties by source.

    Exactness: distinct-shingle sets and the source-count per shingle
    are exact integer aggregations; the fraction is one int/int double
    division — fully SQL-replayable.

    Scale shape: one text scan -> explode to (source, shingle) pairs
    -> distinct (the shuffle key is the shingle — the inverted-index
    exchange), one shingle-keyed source count joined back, one
    source-keyed rollup bounded by source cardinality.  No pair
    expansion anywhere: overlap is counted through the shingle's
    source-count, never source x source joins."""
    from ..functions.text_fns import shingles

    pairs = (
        docs.select(
            F.col(source_col).alias("source"),
            F.explode(
                F.array_distinct(shingles(F.col(text_col), shingle_n))
            ).alias("sh"),
        )
        .distinct()
    )
    src_count = pairs.groupBy("sh").agg(
        F.count(F.lit(1)).alias("_nsrc")
    )
    return (
        pairs.join(src_count, on="sh")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_distinct_ngrams"),
            F.sum(F.when(F.col("_nsrc") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_shared_ngrams"),
        )
        .select(
            "source",
            "n_distinct_ngrams",
            "n_shared_ngrams",
            (
                F.lit(1.0)
                - F.col("n_shared_ngrams").cast("double")
                / F.col("n_distinct_ngrams").cast("double")
            ).alias("novelty_frac"),
        )
        .orderBy("novelty_frac", "source")
    )


def systematic_sample(
    df: DataFrame, modulus: int, residue: int = 0, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic 1-in-``modulus`` sample: keep rows where
    ``id % modulus = residue``. Map-only (runs inside the scan stage);
    rerun-stable and cheap to reproduce on any engine. For id spaces
    with stride patterns, hash the id first (see ``stratified_sample``'s
    md5 ordering) — the fixture ids are dense so plain mod is unbiased."""
    return df.filter(F.col(id_col) % modulus == residue)


def stratified_sample(
    df: DataFrame,
    strata_col: str = "lang",
    n_per_stratum: int = 20,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum, chosen by md5 of the
    id — a deterministic pseudo-random order that any engine reproduces
    (no RNG state, no partition-order dependence). One shuffle on the
    stratum key; the window prunes to n rows per stratum map-side
    before the final sort of each group."""
    order_key = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(strata_col).orderBy(order_key, F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )


def quality_stratified_keep(
    df: DataFrame,
    keep_frac: float = 0.2,
    strata_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep the top ``keep_frac`` of each stratum by token count (longer
    docs first — the simple monotone quality proxy; swap the order
    expression for a model score column at no plan change). percent_rank
    is used so the cut adapts to stratum size; ties break by id for
    determinism."""
    n_tok = token_count(F.col(text_col))
    w = Window.partitionBy(strata_col).orderBy(
        F.desc("_n_tok"), F.col(id_col).asc()
    )
    return (
        df.withColumn("_n_tok", n_tok)
        .withColumn("_pr", F.percent_rank().over(w))
        .filter(F.col("_pr") <= keep_frac)
        .drop("_n_tok", "_pr")
    )


def mixture_report(
    df: DataFrame,
    group_cols: tuple[str, ...] = ("lang", "source"),
    text_col: str = "text",
) -> DataFrame:
    """Corpus mixture: per (lang, source) doc counts, token sums, and
    share of all tokens. One groupBy (partial aggregation map-side), then
    a scalar total joined back via a windowless cross-broadcast — the
    grouped frame is dimension-sized, so the share division is free.
    Token arithmetic goes through DECIMAL so the shares are
    order-independent (float partial-agg reordering would drift)."""
    n_tok = token_count(F.col(text_col)).cast("decimal(18,0)")
    grouped = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tok).alias("_tok"),
    )
    total = grouped.agg(F.sum("_tok").alias("_total"))
    return (
        grouped.crossJoin(F.broadcast(total))
        .select(
            *group_cols,
            "n_docs",
            F.col("_tok").cast("long").alias("n_tokens"),
            # double division of the two EXACT decimal sums — never
            # decimal/decimal (result-scale rules differ across engines)
            (F.col("_tok").cast("double") / F.col("_total").cast("double")).alias(
                "token_share"
            ),
        )
    )


def length_histogram(
    df: DataFrame, length_col: str = "n_chars"
) -> DataFrame:
    """Power-of-two length histogram: bucket = floor(log2(len)), with doc
    counts and per-bucket char totals. The canonical corpus-shape
    diagnostic (truncation spikes, boilerplate bands show up as bucket
    anomalies). Single groupBy over a map-side bucket expression."""
    bucket = F.floor(F.log2(F.col(length_col).cast("double"))).cast("int")
    return (
        df.filter(F.col(length_col) > 0)
        .groupBy(bucket.alias("log2_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col(length_col).cast("decimal(18,0)"))
            .cast("long")
            .alias("total_chars"),
        )
    )


def chunk_documents(
    df: DataFrame,
    chunk_size: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into fixed-size token windows with overlap —
    the context-length chunking step between cleaning and tokenization
    in a training pipeline (``pack_sequences`` then bins the chunks).

    Chunk i covers tokens [i*stride, i*stride + chunk_size) with
    stride = chunk_size - overlap; the final chunk is allowed to run
    short, and a doc at most ``chunk_size`` tokens long is one chunk.
    Chunk COUNT uses integer arithmetic only (exact in any engine), and
    the whole operator is a single generate+slice projection in the scan
    stage: no shuffle, no UDF, output rows ~ input tokens / stride.

    Output: (id, chunk_idx, n_chunk_tokens, chunk_text)."""
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    stride = chunk_size - overlap
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    n = F.size(toks)
    n_chunks = F.when(n <= chunk_size, F.lit(1)).otherwise(
        (n - chunk_size + stride - 1) / stride + 1
    ).cast("int")
    chunk = F.slice(toks, F.col("chunk_idx") * stride + 1, chunk_size)
    return (
        df.select(
            F.col(id_col),
            toks.alias("_toks"),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.size(
                F.slice(F.col("_toks"), F.col("chunk_idx") * stride + 1, chunk_size)
            ).alias("n_chunk_tokens"),
            F.concat_ws(
                " ",
                F.slice(F.col("_toks"), F.col("chunk_idx") * stride + 1, chunk_size),
            ).alias("chunk_text"),
        )
    )


def vocab_stats(
    df: DataFrame,
    text_col: str = "text",
    top_k: int = 100,
) -> DataFrame:
    """One-row corpus vocabulary profile: total tokens, distinct terms,
    hapax count (terms seen once — the long-tail/noise indicator), and
    the token share covered by the top-k most frequent terms (the
    head-heaviness a stop-word list would remove).

    Everything reduces off one (term, count) aggregation; the top-k
    slice uses sort-limit (planned as a distributed TakeOrderedAndProject
    — per-partition top-k then a k-row merge, NEVER a global sort or a
    single-partition window, which would serialize a web-scale
    vocabulary). Ratios are double divisions of exact integer counts
    (oracle-stable)."""
    toks = df.select(
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("term")
    )
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").cast("long").alias("total_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
        F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0))
        .cast("long")
        .alias("hapax_count"),
    )
    topk = (
        counts.orderBy(F.col("cnt").desc(), F.col("term").asc())
        .limit(top_k)
        .agg(F.sum("cnt").cast("double").alias("_topk_tokens"))
    )
    return totals.crossJoin(F.broadcast(topk)).select(
        "total_tokens",
        "vocab_size",
        "hapax_count",
        (F.col("_topk_tokens") / F.col("total_tokens").cast("double")).alias(
            "topk_share"
        ),
    )


def hash_split(
    df: DataFrame,
    val_pct: int = 5,
    test_pct: int = 5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test assignment by md5(id) — stable
    across engines, runs, cluster sizes, and corpus growth (a doc keeps
    its split forever; new docs don't reshuffle old ones, unlike
    rand(seed) whose draw depends on row order/partitioning). The
    bucket compare stays in HEX-STRING space (fixed-width lowercase hex
    orders like the number it spells), so any engine with md5 produces
    the identical split without base-conversion builtins. Pure
    projection, scan-stage cost; split shares are exact to 1/16^8.

    Output: every row + ``split`` in {'train','val','test'}."""
    h = F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)
    val_hi = f"{round(val_pct / 100 * 16**8):08x}"
    test_hi = f"{round((val_pct + test_pct) / 100 * 16**8):08x}"
    split = (
        F.when(h < val_hi, F.lit("val"))
        .when(h < test_hi, F.lit("test"))
        .otherwise(F.lit("train"))
    )
    return df.withColumn("split", split)


def contamination_score(
    df: DataFrame,
    eval_shingles: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 5,
) -> DataFrame:
    """Graded decontamination: instead of :func:`decontaminate`'s binary
    flag, score each doc by the FRACTION of its distinct word n-grams
    that appear in the eval suite — pipelines drop above a high cutoff
    and down-weight the grey zone instead of discarding every doc that
    shares one n-gram with a benchmark.

    Same scale shape as the flag path: eval shingles broadcast, one
    corpus scan, hits counted by a map-side left join (eval set is
    distinct, so no fan-out), one groupBy on doc id. The ratio is a
    double division of exact integer counts.

    Output: (id, n_shingles, n_hits, contamination)."""
    from ..functions.text_fns import shingles

    doc_sh = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(F.col(text_col), shingle_n))).alias(
            "shingle"
        ),
    )
    hits = doc_sh.join(
        F.broadcast(eval_shingles.withColumn("_hit", F.lit(1))),
        on="shingle",
        how="left",
    )
    return hits.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles"),
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias("n_hits"),
        (
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("contamination"),
    )


def chunk_fixed(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 20,
) -> DataFrame:
    """Non-overlapping fixed-size token chunks — the C4-style paragraph
    unit when the corpus has no newline structure. One row per chunk:
    (id, chunk_idx, chunk, n_chunks_total). Map-only (split + sequence
    explode + slice; no shuffle)."""
    toks = F.split(F.col(text_col), " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(float(chunk_size))).cast("long")
    return docs.select(
        F.col(id_col),
        n_chunks.alias("n_chunks_total"),
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
            "chunk_idx"
        ),
        toks.alias("_toks"),
    ).select(
        id_col,
        "n_chunks_total",
        "chunk_idx",
        F.concat_ws(
            " ",
            F.slice(
                "_toks",
                (F.col("chunk_idx") * chunk_size + 1).cast("int"),
                chunk_size,
            ),
        ).alias("chunk"),
    )


def reassemble_chunks(
    kept: DataFrame, id_col: str = "doc_id", out_col: str = "dedup_text"
) -> DataFrame:
    """Rebuild documents from surviving chunks in original order; docs
    with zero surviving chunks drop out. One id shuffle."""
    return kept.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk"))),
                lambda s: s.chunk,
            ),
        ).alias(out_col),
        F.count(F.lit(1)).alias("n_chunks_kept"),
        F.min("n_chunks_total").alias("n_chunks_total"),
    )


# -- Bloom-filter decontamination: bitmap pre-filter + exact verify --------


def bloom_bitmap(
    shingle_df: DataFrame,
    m: int = 65536,
    seeds: tuple[int, ...] = (101, 102, 103),
    shingle_col: str = "shingle",
) -> DataFrame:
    """The set bit positions of a Bloom filter over ``shingle_df``: each
    shingle sets ``len(seeds)`` positions (portable md5-60 hash mod
    ``m``); the bitmap is the distinct union, <= m rows of one int.

    This is the broadcastable form of an eval-suite membership set when
    the suite itself is too big to broadcast as strings: m bits is fixed
    (8 KiB at m=65536) no matter how many shingles the benchmark has."""
    from ..functions.text_fns import md5_hash60

    pos = F.array(
        *[
            F.pmod(md5_hash60(F.col(shingle_col), seed=s), F.lit(m))
            for s in seeds
        ]
    )
    return shingle_df.select(F.explode(pos).alias("pos")).distinct()


def bloom_decontaminate(
    df: DataFrame,
    eval_shingles: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 5,
    m: int = 65536,
    seeds: tuple[int, ...] = (101, 102, 103),
) -> DataFrame:
    """Two-phase decontamination: a Bloom-bitmap pre-filter finds
    candidate docs map-side, then only candidates pay the exact
    shingle semi-join.

    A shingle "passes" the filter iff ALL ``len(seeds)`` of its bit
    positions are set in the eval bitmap; a doc is a candidate iff any
    of its shingles passes. Bloom filters have no false negatives, so
    verifying only candidates yields the EXACT contamination flag —
    false positives cost a little verify work, never correctness.

    Returns (id, bloom_candidate, is_contaminated) for every doc; rows
    with bloom_candidate=1, is_contaminated=0 are the filter's false
    positives (rate ~ (1 - e^(-k*n/m))^k).

    Plan shape: the bitmap (<= m single-int rows) broadcasts to
    ``len(seeds)`` map-side hash joins over the exploded corpus
    shingles — the corpus never shuffles for the probe; the only wide
    exchanges group narrow (id, flag) rows. At 100 TB this replaces
    :func:`decontaminate`'s broadcast of the full eval shingle-string
    set (potentially GBs) with a fixed-size bitmap."""
    from ..functions.text_fns import md5_hash60, shingles

    bits = bloom_bitmap(eval_shingles, m=m, seeds=seeds)
    df = spread(df)
    doc_sh = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(F.col(text_col), shingle_n))).alias(
            "shingle"
        ),
    )
    # inner-join cascade: a shingle passes only if ALL positions are set,
    # so the first (broadcast, map-side) membership check discards the
    # vast majority of shingles before positions 2..k are even computed —
    # the conjunctive filter runs cheapest-first instead of carrying
    # every shingle through k left joins
    probe = doc_sh
    for idx, s in enumerate(seeds):
        probe = probe.withColumn(
            f"_p{idx}", F.pmod(md5_hash60(F.col("shingle"), seed=s), F.lit(m))
        ).join(
            F.broadcast(bits.withColumnRenamed("pos", f"_b{idx}")),
            F.col(f"_p{idx}") == F.col(f"_b{idx}"),
            "inner",
        )
    # no false negatives: every exact-hit shingle passes all k bloom
    # positions, so both the candidate set AND the verify step read the
    # probe's survivors — the corpus is shingled exactly once, not once
    # per phase
    pass_sh = probe.select(id_col, "shingle")
    cand_ids = pass_sh.select(id_col).distinct()
    cand = (
        df.select(id_col)
        .join(cand_ids.withColumn("_c", F.lit(1)), on=id_col, how="left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("_c"), F.lit(0)).alias("bloom_candidate"),
        )
    )
    hits = (
        pass_sh.join(F.broadcast(eval_shingles), on="shingle", how="left_semi")
        .select(id_col)
        .distinct()
    )
    return (
        cand.join(hits.withColumn("_hit", F.lit(1)), on=id_col, how="left")
        .select(
            F.col(id_col),
            F.col("bloom_candidate"),
            F.coalesce(F.col("_hit"), F.lit(0)).alias("is_contaminated"),
        )
    )


def clean_corpus_portable(
    df: DataFrame,
    eval_shingles: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_prob: float = 0.5,
    decon_shingle_n: int = 5,
    min_containment: float = 0.8,
    containment_shingle_n: int = 3,
) -> DataFrame:
    """End-to-end corpus cleaning where EVERY stage is SQL-replayable —
    the oracle-checked counterpart of :func:`clean_corpus` (whose
    xxhash64 MinHash internals force a rows-only check):

    1. model gate: logistic quality probability >= ``min_prob``
       (text.quality_logreg — scan-stage projection);
    2. decontamination: drop docs sharing any ``decon_shingle_n``-gram
       with the eval suite (at scale via the Bloom bitmap; exact-flag
       equivalence is pytest-proven, so the oracle uses the plain
       semi-join);
    3. exact dedup: smallest id per normalized-text md5 wins;
    4. containment near-dedup: prefix-filter pairs at
       >= ``min_containment`` (dedup.containment_pairs_portable), drop
       the higher-id member of each verified pair.

    Returns the surviving (id) rows. Stage order matters and is part of
    the contract: gates cut volume before any pair generation."""
    from .dedup import containment_pairs_portable
    from .text import quality_logreg_prob

    # spread the few-partition scan before the CPU-bound gate/decon/
    # shingle stages (no-op at real scale)
    df = spread(df)
    # r11 (guide §2.4): the gate probability is a pure projection, so
    # filter INLINE in the scan stage — the previous semi-join against
    # quality_logreg's (id, prob) frame paid a second corpus scan plus
    # an id-keyed exchange for the same surviving set.  Also project to
    # the two columns every later stage needs (guide §2.3): the result
    # is an id list, so dragging lang/source/n_chars through the
    # decon/exact/containment shuffles was pure shuffle weight.
    kept = df.filter(
        quality_logreg_prob(F.col(text_col)) >= min_prob
    ).select(id_col, text_col)
    decon = decontaminate(
        kept, eval_shingles, text_col, id_col, shingle_n=decon_shingle_n,
        mode="drop",
    )
    # exact dedup as a single window pass (min id per normalized-text
    # hash), matching clean_corpus: the groupBy-then-semi-join form
    # consumes the gate/decon lineage TWICE (two corpus scans) for the
    # same shuffle bytes — interleaved A/B at sf0.1 is a wash (4.04 vs
    # 4.05s median; containment pair generation dominates) but at
    # 100 TB one corpus scan is strictly better than two; min_by combines
    # map-side so duplicate payloads never reach the shuffle
    # the survivor frame feeds three consumers (containment's shingle
    # stage, its per-doc sets, and the final anti-join) — persist so the
    # gate/decon/exact lineage (two doc scans + a 5-gram explode) runs
    # once, not per consumer
    exact = (
        decon.groupBy(F.md5(F.lower(F.trim(F.col(text_col)))).alias("_th"))
        .agg(F.min_by(F.struct(*decon.columns), F.col(id_col)).alias("_r"))
        .select("_r.*")
        .persist()
    )
    pairs = containment_pairs_portable(
        exact, text_col, id_col,
        min_containment=min_containment, shingle_n=containment_shingle_n,
    )
    dropped = pairs.select(F.col("doc_id_b").alias(id_col)).distinct()
    return exact.join(dropped, on=id_col, how="left_anti").select(id_col)


def shuffle_shards(
    df: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    salt: str = "shuf",
) -> DataFrame:
    """Deterministic global shuffle + sharding — the step between a
    cleaned corpus and a training run. Each row gets a shard in
    [0, n_shards) and a 60-bit sort key, both derived from the portable
    md5-60 hash of "salt:id": shard = key mod n_shards, order within a
    shard = ascending key. Because the key is hash-derived the induced
    order is uniform-random w.r.t. any corpus attribute, yet reruns
    (and resumed jobs) reproduce the identical permutation — no RNG
    state, no seed file. Changing ``salt`` is a fresh epoch shuffle.

    Scale shape: pure projection — runs inside the parquet scan, zero
    shuffle HERE. The writer materializes it as
    ``.repartition(n_shards, "shard").sortWithinPartitions("sort_key")``
    — one exchange on the shard id and a per-partition sort, never a
    global orderBy; 100 TB / 1024 shards keeps each sort local and
    spillable. The oracle replays hash, shard, and key exactly
    (md5-60 is bit-identical in DuckDB)."""
    from ..functions.text_fns import md5_hash60

    key = md5_hash60(F.concat_ws(":", F.lit(salt), F.col(id_col)))
    return df.withColumn("sort_key", key).withColumn(
        "shard", F.pmod(F.col("sort_key"), F.lit(n_shards)).cast("int")
    )


def semantic_decontaminate(
    corpus_emb: DataFrame,
    eval_emb: DataFrame,
    min_cosine: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space decontamination: flag corpus vectors whose cosine
    similarity to ANY eval-set vector reaches ``min_cosine`` — the
    semantic upgrade of the n-gram decontaminate members (paraphrased
    eval leakage shares no shingles but lands close in embedding
    space).

    Scale shape: eval sets are small by nature (thousands of rows), so
    the eval side is unit-normalized and BROADCAST; the corpus side
    streams map-side through one dot fold per (corpus, eval) pair and
    reduces to max-similarity per corpus vector — zero shuffle of
    corpus data beyond the final vec_id aggregation, the same
    broadcast-small-side shape as ann_cosine_topk. Both sides normalize
    once (sequential fold, bitwise-replayable in SQL); the argmax eval
    id is a struct max, deterministic under the (cos, id) total order.

    Returns (vec_id, best_eval_id, cos_sim) for contaminated vectors
    only — the drop list a cleaning pipeline anti-joins against."""
    from ..functions.vector_fns import dot, normalize

    ev = eval_emb.select(
        F.col(id_col).alias("eval_id"), normalize(F.col(vec_col)).alias("ue")
    )
    # spread: the per-(corpus, eval) dot folds are CPU-bound and a small
    # parquet corpus scans as one partition (no-op at real scale)
    corpus = spread(
        corpus_emb.select(F.col(id_col), normalize(F.col(vec_col)).alias("uc"))
    )
    scored = corpus.crossJoin(F.broadcast(ev)).select(
        id_col,
        F.struct(
            dot(F.col("uc"), F.col("ue")).alias("cos_sim"),
            F.col("eval_id").alias("eval_id"),
        ).alias("s"),
    )
    best = scored.groupBy(id_col).agg(F.max("s").alias("b"))
    return best.select(
        id_col,
        F.col("b.eval_id").alias("best_eval_id"),
        F.col("b.cos_sim").alias("cos_sim"),
    ).filter(F.col("cos_sim") >= min_cosine)


def dsir_sample(
    df: DataFrame,
    target_pred,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 1024,
    n: int = 100,
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
    arXiv:2302.03169): rank raw documents by how target-like their
    hashed n-gram profile is, then draw a fixed-size sample with
    Gumbel-top-k — the published recipe for selecting pretraining data
    that matches a small high-quality target distribution.

    * Features: unigrams + word bigrams, hashed into ``num_buckets``
      via the portable md5-60 hash (vocabulary-free, like
      text.feature_hashing — the hashed-ngram generative model of the
      paper).
    * Importance weight: bag-of-buckets log-ratio
      ``log w(x) = sum_f tf_f * (ln p_target(b_f) - ln p_raw(b_f))``
      with add-1 smoothed bucket probabilities fit on the target split
      (``target_pred`` rows) and the full raw corpus respectively.
      Per-feature terms cast to DECIMAL(30,15) before the per-doc sum,
      so partial-agg order cannot move the last ulp.
    * Sampling: Gumbel-top-k — key = log w + g, g = -ln(-ln(u)) with u
      drawn from md5("dsir:"||id) exactly like corpus_weighted_sample;
      the top-``n`` keys are a weighted sample without replacement and
      reruns return the identical set.

    Scale shape: two scan-stage feature passes reduced to a
    ``num_buckets``-row model table (KB-sized, broadcast back), one
    map-side broadcast join to score, one doc-keyed partial-agg sum,
    one mergeable TakeOrderedAndProject top-k. No corpus-sized shuffle
    besides the (id, bucket) tf aggregation; the model table is
    fixed-size regardless of corpus scale."""
    from ..functions.text_fns import md5_hash60, shingles, tokens

    # spread a few-file scan across the cluster before the CPU-bound
    # tokenize+hash explode (the profile_correlation_matrix lesson:
    # a 2-partition parquet input serialized the pass — 3.8s -> 0.8s at
    # sf0.1); at real scale the scan already yields many partitions and
    # this is a no-op
    df = spread(df)
    text = F.col(text_col)
    # unigrams + bigrams in ONE text scan (concat of the two arrays,
    # one explode) — same feature multiset as the two-scan union, so
    # bucket tf counts and the oracle are unchanged; measured faster
    # than the union at equal spread (0.76 vs 0.96s median, sf0.1)
    feats = (
        df.select(
            F.col(id_col),
            F.explode(F.concat(tokens(text), shingles(text, 2))).alias("_f"),
        )
        .select(
            F.col(id_col),
            F.pmod(md5_hash60(F.col("_f")), F.lit(num_buckets)).alias("bucket"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()
    )
    tgt_ids = df.filter(target_pred).select(id_col)
    cnt_t = (
        feats.join(tgt_ids, on=id_col, how="left_semi")
        .groupBy("bucket")
        .agg(F.sum("tf").alias("ct"))
    )
    cnt_r = feats.groupBy("bucket").agg(F.sum("tf").alias("cr"))
    tot_t = cnt_t.agg(F.sum("ct").alias("tt"))
    tot_r = cnt_r.agg(F.sum("cr").alias("tr"))
    model = (
        cnt_r.join(cnt_t, on="bucket", how="left")
        .join(F.broadcast(tot_t))
        .join(F.broadcast(tot_r))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1)).cast("double")
                    / (F.col("tt") + F.lit(num_buckets)).cast("double")
                )
                - F.log(
                    (F.col("cr") + F.lit(1)).cast("double")
                    / (F.col("tr") + F.lit(num_buckets)).cast("double")
                )
            ).alias("lnr"),
        )
    )
    log_w = (
        feats.join(F.broadcast(model), on="bucket")
        .select(
            F.col(id_col),
            (F.col("tf").cast("double") * F.col("lnr"))
            .cast("decimal(30,15)")
            .alias("_ll"),
        )
        .groupBy(id_col)
        .agg(F.sum("_ll").alias("_lw"))
        .select(F.col(id_col), F.col("_lw").cast("double").alias("log_weight"))
    )
    u = (
        md5_hash60(F.concat_ws(":", F.lit("dsir"), F.col(id_col))).cast("double")
        + F.lit(1.0)
    ) / F.lit(1152921504606846976.0)
    keyed = log_w.select(
        F.col(id_col),
        "log_weight",
        (F.col("log_weight") + -F.log(-F.log(u))).alias("gumbel_key"),
    )
    out = (
        keyed.orderBy(F.col("gumbel_key").desc(), F.col(id_col))
        .limit(n)
        .select(id_col, "log_weight", "gumbel_key")
    )
    # top-k is eager enough to compute before unpersist only if the
    # caller collects immediately; keep lineage safe instead by leaving
    # the persisted frame to session cache hygiene (caller clearCache),
    # matching _containment_stage's contract.
    return out


def ccnet_perplexity_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    q_low: float = 0.25,
    q_high: float = 0.75,
) -> DataFrame:
    """CCNet-style per-language perplexity bucketing (Wenzek et al.
    2020, arXiv:1911.00359): score every document with a language-model
    perplexity proxy, then label it head / middle / tail WITHIN its
    language by exact quantile thresholds — the standard crawl-quality
    triage that downstream pipelines sample from (head-heavy for
    pretraining, tail for contrast sets).

    The LM is the corpus's own unigram model (text.unigram_logprob —
    the same avg_nll the perplexity-proxy query verifies); CCNet's
    KenLM 5-gram slots in here without changing the dataflow. Cut
    points are EXACT per-language percentiles (Spark `percentile` =
    DuckDB `quantile_cont` bit-for-bit, the corpus_quality_cut_quantile
    pattern) computed in one tiny groupBy-per-lang aggregate and
    broadcast back — the corpus never sorts globally and never enters
    a per-language window, so one dominant language (English at 100 TB)
    costs a partial-agg, not a single-partition sort. Production swaps
    `percentile_approx` into the threshold pass; exactness here keeps
    the oracle hash-comparable.

    Returns (id, lang, avg_nll, bucket) with bucket in
    {'head','middle','tail'}; head = lowest-perplexity ``q_low``
    fraction per language."""
    from .text import unigram_logprob

    nll = unigram_logprob(df, text_col=text_col, id_col=id_col).select(
        id_col, "avg_nll"
    )
    scored = df.select(F.col(id_col), F.col(lang_col)).join(nll, on=id_col)
    thr = scored.groupBy(lang_col).agg(
        F.expr(f"percentile(avg_nll, CAST({q_low!r} AS DOUBLE))").alias("_ql"),
        F.expr(f"percentile(avg_nll, CAST({q_high!r} AS DOUBLE))").alias("_qh"),
    )
    return (
        scored.join(F.broadcast(thr), on=lang_col)
        .select(
            F.col(id_col),
            F.col(lang_col),
            F.col("avg_nll"),
            F.when(F.col("avg_nll") <= F.col("_ql"), F.lit("head"))
            .when(F.col("avg_nll") <= F.col("_qh"), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
    )


def split_leakage_pairs(
    df: DataFrame,
    val_pct: int = 5,
    test_pct: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    min_jaccard: float = 0.5,
    shingle_n: int = 3,
) -> DataFrame:
    """Cross-split LEAKAGE audit: near-duplicate pairs that straddle the
    train/val/test boundary.  Decontamination (:func:`decontaminate`)
    protects against an EXTERNAL eval set; this guards the corpus's own
    held-out splits — a near-dup of a test doc sitting in train inflates
    eval scores exactly like external contamination, and hash-splitting
    alone cannot prevent it (near-dups hash independently).

    Composition: :func:`hash_split` (deterministic md5 split) x
    ``dedup.minhash_dedup_portable`` (banded MinHash candidates + exact
    Jaccard verify) -> each near-dup pair tagged with both splits and an
    ``is_leak`` flag (splits differ).  All pairs are returned, flagged —
    the leak RATE is as important as the leak list.  Scale: the pair
    generation is the banded-LSH path (no self-join, bucket-confined);
    the split tag joins pair ids against the tiny (id, split)
    projection — at 100 TB both sides shuffle once on doc_id."""
    from .dedup import minhash_dedup_portable

    pairs = minhash_dedup_portable(
        df,
        text_col=text_col,
        id_col=id_col,
        num_hashes=num_hashes,
        bands=bands,
        min_jaccard=min_jaccard,
        shingle_n=shingle_n,
    )
    splits = hash_split(
        df.select(id_col), val_pct=val_pct, test_pct=test_pct, id_col=id_col
    ).select(F.col(id_col), F.col("split"))
    sa = splits.select(
        F.col(id_col).alias("doc_id_a"), F.col("split").alias("split_a")
    )
    sb = splits.select(
        F.col(id_col).alias("doc_id_b"), F.col("split").alias("split_b")
    )
    return (
        pairs.join(sa, on="doc_id_a")
        .join(sb, on="doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            "jaccard",
            "split_a",
            "split_b",
            (F.col("split_a") != F.col("split_b")).alias("is_leak"),
        )
    )


def prepare_training_set(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    val_pct: int = 5,
    test_pct: int = 5,
    min_jaccard: float = 0.5,
    gate: str = "basic",
) -> DataFrame:
    """Training-set preparation capstone composing the curation stack:

    1. GATE — ``gate='gopher'`` applies :func:`text.gopher_rules` (the
       published battery; English-corpus calibrated — its stop-word and
       50-word rules reject the whole synthetic fixture, which is the
       correct verdict for that input, but a 0-row summary demonstrates
       nothing, so the registered query uses ``gate='basic'``: the
       corpus_quality_reasons thresholds — n_chars >= 100, n_tokens >=
       20, chars/token <= 12).
    2. SPLIT — :func:`hash_split` assigns deterministic train/val/test.
    3. DECONTAMINATE SPLITS — :func:`split_leakage_pairs` over the gated
       corpus; the TRAIN member of every cross-split near-dup pair is
       dropped (the held-out member is kept: eval sets stay intact, the
       train side loses its leaked copy — standard practice).
    4. SUMMARY — per split: surviving docs + whitespace-token total.

    Every stage is individually oracle-checked; this composition is too
    (the SQL oracle replays gate, split, MinHash leakage, the drop, and
    the aggregate end to end).  Scale: gate is map-only, split is a
    projection, leakage is the banded-LSH path, the drop is a broadcast
    anti-join of a pair-bounded id list."""
    if gate == "gopher":
        from .text import gopher_rules

        gated = df.join(
            gopher_rules(df, text_col=text_col, id_col=id_col)
            .filter(F.col("gate_reason") == "pass")
            .select(id_col),
            on=id_col,
        )
    elif gate == "basic":
        n_chars = F.length(text_col)
        n_tokens = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
        gated = df.filter(
            (n_chars >= 100)
            & (n_tokens >= 20)
            & (n_chars.cast("double") / n_tokens.cast("double") <= 12.0)
        )
    else:
        raise ValueError(f"unknown gate: {gate!r}")
    split = hash_split(gated, val_pct=val_pct, test_pct=test_pct, id_col=id_col)
    leaks = split_leakage_pairs(
        gated, val_pct=val_pct, test_pct=test_pct,
        text_col=text_col, id_col=id_col, min_jaccard=min_jaccard,
    ).filter(F.col("is_leak"))
    drop = (
        leaks.filter(F.col("split_a") == "train")
        .select(F.col("doc_id_a").alias(id_col))
        .unionByName(
            leaks.filter(F.col("split_b") == "train")
            .select(F.col("doc_id_b").alias(id_col))
        )
        .distinct()
    )
    final = split.join(F.broadcast(drop), on=id_col, how="left_anti")
    return final.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")))
        .cast("long")
        .alias("n_tokens"),
    )


def cdc_chunk_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    boundary_mod: int = 16,
    min_docs: int = 2,
    top_k: int = 50,
) -> DataFrame:
    """Content-defined chunking + cross-document duplicate-chunk report.

    Fixed-width chunking (corpus_chunk_documents / paragraph_dedup's
    split-on-newline) breaks under INSERTIONS: one added token shifts
    every later boundary and no downstream chunk matches its twin in
    the other copy.  Content-defined chunking (the FastCDC/rsync idea,
    applied at token granularity) places a boundary after any token
    whose hash falls in a fixed residue class (expected chunk length =
    ``boundary_mod`` tokens), so boundaries RESYNCHRONIZE after an
    edit and shared runs between near-copies still chunk identically —
    the shift-robust complement to minhash (which scores whole docs,
    not shared spans).

    Shape: token explode with positions (scan stage), a per-doc window
    for the running boundary count (partitioned by doc — never
    global), one groupBy to assemble chunks, one to count repeats; the
    portable md5-60 hash makes the ENTIRE pipeline SQL-replayable.
    Output: top ``top_k`` chunks appearing in >= ``min_docs`` distinct
    docs — (chunk_hash, n_docs, n_occurrences, n_tokens)."""
    from ..functions.text_fns import md5_hash60

    df = spread(df)
    chunks = cdc_chunks(
        df, text_col=text_col, id_col=id_col, boundary_mod=boundary_mod
    )
    return (
        chunks.select(
            F.col(id_col),
            md5_hash60(F.col("chunk")).alias("chunk_hash"),
            "n_tokens",
        )
        .groupBy("chunk_hash")
        .agg(
            F.countDistinct(F.col(id_col)).alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("n_tokens").cast("bigint").alias("n_tokens"),
        )
        .filter(F.col("n_docs") >= min_docs)
        .orderBy(F.desc("n_docs"), F.desc("n_occurrences"), "chunk_hash")
        .limit(top_k)
    )


def cdc_chunks(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    boundary_mod: int = 16,
    normalize: bool = True,
) -> DataFrame:
    """Content-defined chunk frame (see cdc_chunk_dedup for the why):
    one row per chunk — (id, chunk_idx, chunk, n_tokens,
    n_chunks_total) — same shape as chunk_fixed so the two chunkers are
    interchangeable (streaming/dedup.py::stream_chunk_dedup_load takes
    either).  ``normalize=True`` chunks the lower(trim) token stream
    (canonical form for dedup reports); ``normalize=False`` splits the
    RAW text on single spaces like chunk_fixed, so reassemble_chunks
    rebuilds documents faithfully."""
    from pyspark.sql import Window

    from ..functions.text_fns import md5_hash60, tokens

    tok_expr = (
        tokens(F.col(text_col)) if normalize else F.split(F.col(text_col), " ")
    )
    toks = docs.select(
        F.col(id_col), F.posexplode(tok_expr).alias("pos", "tok")
    )
    flag = (md5_hash60(F.col("tok")) % boundary_mod == 0).cast("int")
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    staged = toks.withColumn(
        "chunk_idx", F.coalesce(F.sum(flag).over(w), F.lit(0))
    )
    chunks = staged.groupBy(id_col, "chunk_idx").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("chunk"),
        F.count(F.lit(1)).alias("n_tokens"),
    )
    wtot = Window.partitionBy(id_col)
    return chunks.withColumn(
        "n_chunks_total", F.count(F.lit(1)).over(wtot)
    )


def ngram_novelty(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 5,
) -> DataFrame:
    """Per-document duplication-exposure profile: what fraction of each
    doc's distinct word ``shingle_n``-grams appears in at least one
    OTHER document.  The doc-level risk score between whole-doc dedup
    (which only fires at high overall similarity) and span dedup (which
    emits edits) — rank by ``shared_frac`` to find boilerplate-heavy
    and templated docs, or threshold it as a memorization-risk gate.

    Shape: one scan to distinct (doc, gram-hash) pairs (persisted — two
    bounded aggregations consume it), then NO gram-keyed join-back: a
    shared gram's count is n_grams - n_hapax, and a hapax gram (global
    doc-frequency 1 — the long tail, typically >40% of distinct grams)
    has exactly ONE owning doc, recoverable as min(doc) inside the same
    gram-keyed aggregate that computes the frequency.  The old shape
    re-shuffled every (gram, doc) pair through the df join-back — the
    one near-linear op in the r07 scale harness (4.9x at 10x data);
    this shape's shuffles are all aggregate-combined (gram-keyed state
    is one row per distinct gram, doc-keyed states one row per doc).
    Grams are reduced to portable md5-60 hashes before any shuffle so
    the pipeline replays in SQL and the exchange carries 8-byte keys,
    not text.  Output: (id, n_grams, n_shared_grams, shared_frac)."""
    from ..functions.text_fns import md5_hash60, shingles

    df = spread(df)
    grams = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(shingles(F.col(text_col), shingle_n))
        ).alias("_g"),
    ).select(F.col(id_col), md5_hash60(F.col("_g")).alias("_h")).persist()
    totals = grams.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_grams")
    )
    # (doc, gram) pairs are distinct by construction (array_distinct per
    # doc), so count(1) == countDistinct(doc) and for a hapax gram
    # min(doc) IS its sole owner
    hapax_per_doc = (
        grams.groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_nd"), F.min(id_col).alias("_owner"))
        .filter(F.col("_nd") == 1)
        .groupBy(F.col("_owner").alias(id_col))
        .agg(F.count(F.lit(1)).cast("bigint").alias("_n_hapax"))
    )
    return (
        totals.join(hapax_per_doc, on=id_col, how="left")
        .select(
            F.col(id_col),
            "n_grams",
            (
                F.col("n_grams") - F.coalesce(F.col("_n_hapax"), F.lit(0))
            ).cast("bigint").alias("n_shared_grams"),
        )
        .select(
            F.col(id_col),
            "n_grams",
            "n_shared_grams",
            (
                F.col("n_shared_grams").cast("double")
                / F.col("n_grams").cast("double")
            ).alias("shared_frac"),
        )
    )


def quantile_normalize(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str = "doc_id",
    grid_points: int = 100,
) -> DataFrame:
    """Cross-source score calibration: heterogeneous feeds score the
    same quality signal on different scales (one crawler's length
    distribution is another's tail), so per-source thresholds drift.
    Quantile normalization maps each row to its WITHIN-source percentile
    (a per-group window — deterministic ``(value, id)`` tie-break), then
    to the GLOBAL value distribution by linear interpolation over a
    broadcast (grid_points+1)-knot global quantile grid — after which
    one corpus-wide cut applies fairly to every source (the standard
    bioinformatics/LTR trick applied to corpus curation).

    Scale shape: one grouped window (per-source partitions), one 1-row
    exact-percentile aggregate broadcast to a map-side interpolation —
    no global sort, no per-source subplans.  ``percentile`` is
    bit-identical to DuckDB ``quantile_cont`` and the interpolation
    keeps one fixed association, so the whole mapping replays in SQL;
    ``approx_percentile`` is the 100 TB grid switch.  Output:
    (id, group, value, pct, normalized)."""
    fracs = [i / grid_points for i in range(grid_points + 1)]
    grid = df.agg(
        F.percentile(
            F.col(value_col).cast("double"),
            F.array(*[F.lit(f) for f in fracs]),
        ).alias("_grid")
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("value"), F.col(id_col)
    )
    staged = df.select(
        F.col(id_col),
        F.col(group_col),
        F.col(value_col).cast("double").alias("value"),
    ).withColumn("_pct", F.percent_rank().over(w))
    j = staged.crossJoin(F.broadcast(grid))
    idx = F.col("_pct") * F.lit(float(grid_points))
    lo = F.floor(idx).cast("int")
    frac = idx - F.floor(idx)
    g = F.col("_grid")
    interp = F.element_at(g, lo + 1) + (
        F.element_at(g, lo + 2) - F.element_at(g, lo + 1)
    ) * frac
    normalized = F.when(
        F.col("_pct") >= F.lit(1.0), F.element_at(g, grid_points + 1)
    ).otherwise(interp)
    return j.select(
        id_col,
        group_col,
        "value",
        F.col("_pct").alias("pct"),
        normalized.alias("normalized"),
    )


def neyman_sample(
    df: DataFrame,
    strata_col: str,
    value_col: str,
    budget: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Neyman-allocation stratified sampling: the fixed ``budget`` is
    split across strata proportional to N_h * S_h (stratum size times
    stratum standard deviation) — the classical variance-optimal
    allocation for estimating the mean of ``value_col`` (Neyman 1934).
    Against proportional allocation (stratified_sample), high-variance
    strata get oversampled and near-constant strata contribute almost
    nothing — the right sampler when strata differ wildly in spread
    (e.g. a curated feed vs a crawl dump).

    Deterministic end to end: exact DECIMAL moments per stratum (order-
    free), one fixed double association for the std and the allocation
    (floor(x + 0.5) portable rounding, capped at the stratum size),
    md5-rank selection within each stratum — rerun-identical, fully
    SQL-replayable.  Zero-variance or singleton strata get allocation 0
    by construction (S_h = 0); fall back to stratified_sample if every
    stratum must be represented.

    Scale shape: one mergeable moment aggregation (strata-cardinality
    output), a 1-row total scalar, a broadcast allocation join, and one
    partitioned rank per stratum — no global windows, no fact-row
    shuffles beyond the stratum key.

    Contract notes (r08 ADVICE): ``budget`` is a TARGET, not an exact
    output size — each stratum's allocation rounds independently with
    ``floor(x + 0.5)`` (and caps at the stratum size), so the summed
    sample can land within ±(#strata / 2) of the budget; callers that
    need an exact count should trim/backfill the returned frame by the
    same md5 rank.  Rows with a NULL stratum key carry no allocation
    (the equality join drops them) — filter or impute the key upstream
    if NULL-keyed rows must be sampleable."""
    from pyspark.sql import Window as _W

    dec = "decimal(38,6)"
    d = df.withColumn("_x", F.col(value_col).cast("double"))
    m = d.groupBy(F.col(strata_col).alias("_g")).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("_x").cast(dec)).alias("_sx"),
        F.sum((F.col("_x") * F.col("_x")).cast(dec)).alias("_ss"),
    )
    n_d = F.col("_n").cast("double")
    sx = F.col("_sx").cast("double")
    ss = F.col("_ss").cast("double")
    sd = F.when(
        F.col("_n") > 1,
        F.sqrt(
            F.greatest(
                F.lit(0.0),
                (ss - (sx * sx) / n_d) / (n_d - F.lit(1.0)),
            )
        ),
    ).otherwise(F.lit(0.0))
    w = m.select("_g", "_n", (n_d * sd).alias("_w"))
    tot = w.agg(
        F.sum(F.col("_w").cast("decimal(38,12)")).cast("double").alias("_t")
    )
    alloc = (
        w.crossJoin(F.broadcast(tot))
        .select(
            "_g",
            F.when(
                F.col("_t") > 0.0,
                F.least(
                    F.col("_n"),
                    F.floor(
                        (F.lit(float(budget)) * F.col("_w")) / F.col("_t")
                        + F.lit(0.5)
                    ).cast("long"),
                ),
            )
            .otherwise(F.lit(0).cast("long"))
            .alias("_alloc"),
        )
    )
    ranked = d.withColumn(
        "_rn",
        F.row_number().over(
            _W.partitionBy(strata_col).orderBy(
                F.md5(F.col(id_col).cast("string")), F.col(id_col)
            )
        ),
    )
    return (
        ranked.join(
            F.broadcast(alloc),
            on=ranked[strata_col] == alloc["_g"],
        )
        .filter(F.col("_rn") <= F.col("_alloc"))
        .drop("_g", "_alloc", "_rn", "_x")
    )


def temperature_mixture(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    temperature: float = 0.7,
    token_budget: int = 1_000_000,
) -> DataFrame:
    """Temperature-scaled sampling mixture over corpus sources — the
    published multi-source LM data recipe (e.g. multilingual/multi-
    domain pretraining): raw source shares p_i = tokens_i / total are
    flattened to ``w_i = p_i^T / sum_j p_j^T`` (T < 1 upweights small
    sources, T = 1 keeps natural proportions), and each source's
    ``effective_epochs = w_i * budget / tokens_i`` says how many times
    the source would repeat under the target budget — the overfitting
    early-warning (epochs >> 1 on a small source).

    Exactness: per-source token counts are exact integer sums; each
    p^T runs as ``exp(T * ln(p))`` with the result truncated to
    DECIMAL(30,15) BEFORE the normalizing sum (the unigram-logprob
    pattern: the truncation absorbs any engine libm ulp while the
    order-free DECIMAL sum keeps the normalizer exact), and every
    published ratio is one double division.

    Scale shape: one map-side token count + source-cardinality groupBy,
    a 1-row total, and a broadcast of the (tiny) source table — the
    fact scan happens once, nothing shuffles but source keys."""
    toks = df.select(
        F.col(source_col).alias("source"),
        F.size(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).cast("long").alias("_n"),
    )
    per_src = toks.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("_n").cast("bigint").alias("n_tokens"),
    )
    tot = per_src.agg(F.sum("n_tokens").cast("double").alias("_t"))
    scored = per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        (F.col("n_tokens").cast("double") / F.col("_t")).alias("p_raw"),
        F.exp(
            F.lit(temperature)
            * F.log(F.col("n_tokens").cast("double") / F.col("_t"))
        )
        .cast("decimal(30,15)")
        .alias("_w"),
    )
    wtot = scored.agg(F.sum("_w").alias("_wt"))
    return scored.crossJoin(F.broadcast(wtot)).select(
        "source",
        "n_docs",
        "n_tokens",
        "p_raw",
        (F.col("_w").cast("double") / F.col("_wt").cast("double")).alias(
            "weight"
        ),
        (
            (F.col("_w").cast("double") / F.col("_wt").cast("double"))
            * F.lit(float(token_budget))
            / F.col("n_tokens").cast("double")
        ).alias("effective_epochs"),
    )
