"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup. All UDF-free (xxhash64 / higher-order functions
stay JVM-side); the quadratic pair space is always cut by a blocking key
(LSH band bucket, simhash band, length+lang block) BEFORE any join — the
all-pairs cross join never materializes at scale.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.df_utils import spread
from ..functions.text_fns import distinct_tokens, shingles, tokens
from ..functions.vector_fns import cosine, dot, normalize


def _in_bucket_pairs(
    df: DataFrame,
    bucket_cols: list[str],
    payload,
    max_bucket_size: int,
) -> DataFrame:
    """Unordered unique pairs within each bucket, WITHOUT a self-join.

    A bucket self-join re-optimizes and re-executes the (often expensive)
    bucket-key lineage on both sides; instead the payloads are
    collect_list'd per bucket — sound because LSH/blocking buckets are
    small by construction — and pairs are expanded with array
    combinators. One shuffle; output columns ``a``/``b`` (payload pairs,
    a < b by payload sort order). Buckets above ``max_bucket_size``
    (near-universal boilerplate — the quadratic corner) are dropped."""
    buckets = (
        df.groupBy(*bucket_cols)
        .agg(F.sort_array(F.collect_list(payload)).alias("xs"))
        .filter((F.size("xs") > 1) & (F.size("xs") <= max_bucket_size))
    )
    xs = F.col("xs")
    pair_structs = F.flatten(
        F.transform(
            xs,
            lambda x, i: F.transform(
                # slice is 1-based: i+2 pairs x only with LATER elements,
                # so the sorted array gives a < b for free
                F.slice(xs, i + F.lit(2), F.size(xs)),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    return buckets.select(F.explode(pair_structs).alias("p")).select("p.a", "p.b")


# the one shared partition-spread policy (functions/df_utils.py)
_spread = spread


# -- exact ------------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct normalized text,
    keeping the smallest id as canonical. The shuffle carries (hash, id)
    only — text is pruned before the exchange."""
    h = F.md5(F.lower(F.trim(F.col(text_col)))).alias("text_hash")
    return (
        df.select(h, F.col(id_col))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("n_copies"))
    )


# -- MinHash + LSH banding --------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signature per document: for each of ``num_hashes`` seeded
    hash functions, the min over the document's shingle hashes.

    Physical shape: explode shingles -> hash each once -> groupBy(doc)
    with ``num_hashes`` min(xxhash64(h, seed)) aggregates. Aggregates run
    inside WholeStageCodegen, unlike higher-order functions which Spark
    always interprets — the previous transform+array_min formulation paid
    num_hashes interpreted array scans per row and measured 2.3x slower
    at sf0.1. The groupBy shuffle is map-side-combined: every doc's
    shingles sit in one input partition (explode of a single row), so the
    exchange carries ~one 16-long row per document — negligible against
    the text scan at 100 TB."""
    staged = _spread(df).select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(F.col(text_col), shingle_n))).alias("_sh"),
    ).select(F.col(id_col), F.xxhash64(F.col("_sh")).alias("_h"))
    # shingles() always yields >=1 element (empty text -> [""]), so the
    # explode never drops a document
    aggs = [
        F.min(F.xxhash64(F.col("_h"), F.lit(seed))).alias(f"mh_{seed}")
        for seed in range(num_hashes)
    ]
    return staged.groupBy(id_col).agg(*aggs)


def _sigs_with_sets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int,
    shingle_n: int,
) -> DataFrame:
    """(id, mh_0..mh_{n-1}, sh): MinHash signature plus the doc's distinct
    64-bit shingle hashes, from ONE explode+groupBy pass — the shared
    kernel of minhash_dedup and minhash_index."""
    staged = _spread(df).select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(F.col(text_col), shingle_n))).alias("_sh"),
    ).select(F.col(id_col), F.xxhash64(F.col("_sh")).alias("_h"))
    aggs = [
        F.min(F.xxhash64(F.col("_h"), F.lit(seed))).alias(f"mh_{seed}")
        for seed in range(num_hashes)
    ] + [F.collect_set(F.col("_h")).alias("sh")]
    return staged.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket_size: int = 10000,
) -> DataFrame:
    """Candidate near-dup pairs via LSH banding: split the signature into
    ``bands`` bands of num_hashes/bands rows each; docs sharing any band
    hash are candidates. Returns (doc_id_a, doc_id_b, n_shared_bands) with
    a < b.

    Scale shape: two narrow shuffles — the signature groupBy (16 longs
    per doc after map-side combine) and the (band_idx, band_hash)
    exchange. No self-join — a self-join would recompute (and
    re-optimize) the whole signature lineage on both sides; instead doc
    ids are collect_list'd per bucket (LSH buckets are small by
    construction) and pairs are generated in-bucket with array
    combinators. ``max_bucket_size`` guards the quadratic corner: a
    bucket larger than the cap is near-universal boilerplate and is
    dropped (standard practice in web-scale dedup — such clusters are
    handled by exact dedup upstream)."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    band_cols = [
        F.xxhash64(*[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]).alias(
            f"band_{b}"
        )
        for b in range(bands)
    ]
    banded = sigs.select(F.col(id_col), *band_cols)
    stacked = banded.select(
        F.col(id_col),
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band_idx"), F.col(f"band_{b}").alias("band_hash"))
                for b in range(bands)
            ])
        ).alias("band"),
    ).select(id_col, "band.band_idx", "band.band_hash")
    return (
        _in_bucket_pairs(stacked, ["band_idx", "band_hash"], F.col(id_col), max_bucket_size)
        .select(F.col("a").alias("doc_id_a"), F.col("b").alias("doc_id_b"))
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    min_jaccard: float = 0.8,
    shingle_n: int = 3,
    max_bucket_size: int = 10000,
) -> DataFrame:
    """Full near-dedup: LSH candidates -> exact Jaccard verification ->
    keep rows whose pair passes the threshold. Returns verified duplicate
    pairs (doc_id_a, doc_id_b, jaccard).

    One text scan total: signatures AND per-doc hashed shingle sets come
    out of the same explode+groupBy (the minhash_index shape), cached
    with persist() so the band branch and both verify branches don't
    each re-scan text and re-shingle (previously: three scans). persist
    beats localCheckpoint here: lazy, so the first action computes it in
    stream with its consumer instead of a separate eager wave, and LRU
    eviction bounds memory (A/B median 2.9s vs 5.3s at sf0.1).
    Verification intersects 64-bit hash arrays — equal to raw-shingle
    Jaccard up to 64-bit collisions (~n^2/2^64) and cheaper than
    string-array intersection. The cached frame is one row per doc
    (16 longs + the hash set) — the same thing minhash_index persists;
    at cluster scale prefer the materialized index itself."""
    rows_per_band = num_hashes // bands
    sigs = _sigs_with_sets(
        df, text_col, id_col, num_hashes, shingle_n
    ).persist()
    band_cols = [
        F.xxhash64(*[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]).alias(
            f"band_{b}"
        )
        for b in range(bands)
    ]
    stacked = sigs.select(F.col(id_col), *band_cols).select(
        F.col(id_col),
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band_idx"), F.col(f"band_{b}").alias("band_hash"))
                for b in range(bands)
            ])
        ).alias("band"),
    ).select(id_col, "band.band_idx", "band.band_hash")
    cands = (
        _in_bucket_pairs(stacked, ["band_idx", "band_hash"], F.col(id_col), max_bucket_size)
        .select(F.col("a").alias("doc_id_a"), F.col("b").alias("doc_id_b"))
        .distinct()
    )
    # merge-hint the set side: its rows carry whole hash arrays, and the
    # planner's size estimate for a derived projection can land under the
    # broadcast threshold — broadcasting the ARRAY side is exactly wrong
    # at corpus scale (observed driver OOM at 50k docs). Sort-merge
    # shuffles the arrays once, partitioned by id; scale-safe.
    v = sigs.select(F.col(id_col), F.col("sh")).hint("merge")
    joined = (
        cands.join(v.withColumnRenamed(id_col, "doc_id_a").withColumnRenamed("sh", "sh_a"), on="doc_id_a")
        .join(v.withColumnRenamed(id_col, "doc_id_b").withColumnRenamed("sh", "sh_b"), on="doc_id_b")
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
    return (
        joined.select(
            "doc_id_a",
            "doc_id_b",
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )


def minhash_dedup_portable(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    min_jaccard: float = 0.5,
    shingle_n: int = 3,
    max_bucket_size: int = 10000,
) -> DataFrame:
    """``minhash_dedup`` with every hash swapped for the portable md5
    60-bit hash (functions/text_fns.py::md5_hash60), which makes the
    END-TO-END pipeline — shingling, seeded signature mins, banding,
    in-bucket candidate generation, exact-Jaccard verify — replayable in
    DuckDB SQL. The matching oracle checks the LSH *logic* itself
    (candidate set AND verified pairs), not just row counts; the
    xxhash64 variants stay the production default (md5 costs a digest
    per shingle per signature row).

    Two structural differences from the production path, both in service
    of oracle parity: bands key on the raw signature-value tuple (no
    band re-hash — grouping on the tuple is the same equivalence
    relation), and verification intersects raw shingle-string sets
    (exact Jaccard, no 64-bit-collision caveat). Same plan shape
    otherwise: one text scan, persist-shared signatures, no self-join,
    merge-hinted verify sides."""
    from ..functions.text_fns import md5_hash60

    rpb = num_hashes // bands
    staged = _spread(df).select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(F.col(text_col), shingle_n))).alias("_sh"),
    )
    aggs = [
        F.min(md5_hash60(F.col("_sh"), seed=j)).alias(f"mh_{j}")
        for j in range(num_hashes)
    ] + [F.collect_set(F.col("_sh")).alias("sh")]
    sigs = staged.groupBy(id_col).agg(*aggs).persist()
    xcols = [f"x{r}" for r in range(rpb)]
    stacked = sigs.select(
        F.col(id_col),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band_idx"),
                    *[F.col(f"mh_{b * rpb + r}").alias(xcols[r]) for r in range(rpb)],
                )
                for b in range(bands)
            ])
        ).alias("band"),
    ).select(id_col, "band.band_idx", *[f"band.{x}" for x in xcols])
    cands = (
        _in_bucket_pairs(stacked, ["band_idx", *xcols], F.col(id_col), max_bucket_size)
        .select(F.col("a").alias("doc_id_a"), F.col("b").alias("doc_id_b"))
        .distinct()
    )
    v = sigs.select(F.col(id_col), F.col("sh")).hint("merge")
    joined = (
        cands.join(
            v.withColumnRenamed(id_col, "doc_id_a").withColumnRenamed("sh", "sh_a"),
            on="doc_id_a",
        ).join(
            v.withColumnRenamed(id_col, "doc_id_b").withColumnRenamed("sh", "sh_b"),
            on="doc_id_b",
        )
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
    return joined.select(
        "doc_id_a",
        "doc_id_b",
        (inter.cast("double") / union.cast("double")).alias("jaccard"),
    ).filter(F.col("jaccard") >= min_jaccard)


def containment_pairs_portable(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_containment: float = 0.8,
    shingle_n: int = 3,
) -> DataFrame:
    """Asymmetric near-dup detection: containment
    C = |A ∩ B| / min(|A|, |B|) flags a SMALL document embedded in a
    larger one (quoted posts, boilerplate-wrapped articles, excerpt
    spam) that symmetric Jaccard misses — at C=1.0 with a 10x size gap,
    Jaccard is only ~0.1, and MinHash banding fires with probability
    ~J, so LSH is the WRONG candidate generator here.

    Candidates come from prefix filtering (the SSJoin family), which is
    provably lossless: if |A∩B| >= ceil(t*|A|), then A's
    (|A| - ceil(t*|A|) + 1) rarest shingles (global doc-frequency
    order) must include at least one shared shingle — so probing the
    smaller doc's rarest-prefix against the full posting list finds
    every qualifying pair. Two scale choices on top of the plain
    filter (measured 126s -> ~25s on an adversarial 50k-doc corpus of
    10-replica cliques):

    * shingles are narrowed to the portable 60-bit md5 hash BEFORE any
      set is built — posting rows, prefixes, and the verify arrays all
      carry 8-byte longs instead of shingle strings (the oracle applies
      the same hash, so parity is exact, not approximate);
    * probing is direction-aware: only the SMALLER side of a pair needs
      the prefix guarantee, so a doc probes only index entries of
      larger (or equal, id-tiebroken) docs — each unordered pair is
      generated once instead of twice.

    Plan shape: one text scan -> exploded (doc, hash) persisted; one
    groupBy for global hash frequency; one window per doc for the
    prefix; the probe join shuffles on the hash; verify joins the
    per-doc hash sets and divides by the SMALLER set. Deterministic
    end to end — the DuckDB oracle replays the whole pipeline.
    Output size is inherently pair-bound: a clique of k mutual
    near-dups yields k*(k-1)/2 rows; cluster with dedup_clusters to
    collapse before downstream use."""
    staged, sets = _containment_stage(df, text_col, id_col, shingle_n)
    return _containment_core(staged, sets, id_col, min_containment)


def _containment_stage(
    df: DataFrame, text_col: str, id_col: str, shingle_n: int
) -> tuple[DataFrame, DataFrame]:
    """Shared staging for the containment family: the per-doc hash-set
    frame (``sets``: doc, sh array, n — persisted) and per-doc distinct
    md5-60 shingle hashes (``staged``: one row per (doc, hash), a
    MAP-ONLY explode of the cached sets frame, so it needs no cache of
    its own).  One shuffle total: collect_set both groups and dedups
    the hashes, replacing the previous distinct + groupBy double
    shuffle of the doc x shingle frame.  Cleanup of ``sets`` is the
    caller's (pairs fn hands it to ITS caller; the clustered fn
    unpersists after its eager clustering step)."""
    from ..functions.text_fns import md5_hash60

    sets = (
        _spread(df)
        .select(
            F.col(id_col),
            F.explode(
                F.array_distinct(shingles(F.col(text_col), shingle_n))
            ).alias("_sh"),
        )
        .select(F.col(id_col), md5_hash60(F.col("_sh")).alias("_h"))
        .groupBy(id_col)
        .agg(F.collect_set("_h").alias("sh"))
        .select(F.col(id_col), "sh", F.size("sh").cast("bigint").alias("n"))
        .persist()
    )
    # n rides along: staged is a map-only explode of the cached sets, so
    # carrying the set size costs nothing and saves _containment_core a
    # whole join-back (one fewer exchange + AQE stage job)
    staged = sets.select(F.col(id_col), F.explode("sh").alias("_h"), "n")
    return staged, sets


def _containment_core(
    staged: DataFrame,
    sets: DataFrame,
    id_col: str,
    min_containment: float,
    prefix_k: int = 3,
) -> DataFrame:
    """Prefix-filter + positional-filter candidate generation + exact
    containment verify over a (staged, sets) pair (see
    containment_pairs_portable).  ``staged`` carries the per-doc set
    size ``n`` (free — it is a map-only explode of the sets frame), so
    no join-back to ``sets`` is needed before the prefix cut.

    ``prefix_k`` (r12) is the adaptive k-prefix knob (Wang et al.,
    VLDB'12 "Can we beat the prefix filtering?"): the probe prefix is
    EXTENDED by k-1 positions and a candidate must then share at least
    min(O, k) elements inside it (O = ceil(t*np), the pair's overlap
    requirement).  Lossless by pigeonhole: a qualifying pair has
    overlap >= O common elements, of which at most np - L = O - k can
    sit outside the length-L = np - O + k extended prefix, so at least
    k land inside it (and when O < k the prefix covers the whole set,
    so all >= O do).  k=1 is the classic single-match prefix filter;
    at sf0.1 / t=0.8 the one-rare-shingle coincidences it admits
    dominated the candidate set (148 434 pairs for 241 true), k=3 cuts
    that to 292 for ~15% more prefix-join probe rows — the verify join
    then touches 500x fewer array pairs."""
    freq = staged.groupBy("_h").agg(F.count(F.lit(1)).alias("_df"))
    ranked = (
        staged.join(freq, on="_h")
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(F.col("_df"), F.col("_h"))
            ),
        )
        .persist()  # ONE ranking pass feeds both the prefix and index sides
    )
    prefix = ranked.filter(
        F.col("_rn")
        <= F.col("n") - F.ceil(F.lit(min_containment) * F.col("n")) + prefix_k
    ).select(
        F.col(id_col).alias("_p"),
        F.col("n").alias("_np"),
        F.col("_rn").alias("_kp"),
        "_h",
    )
    index = ranked.select(
        F.col(id_col).alias("_i"),
        F.col("n").alias("_ni"),
        F.col("_rn").alias("_mi"),
        "_h",
    )
    # PPJoin-style positional filter, aggregated over ALL of a pair's
    # prefix matches (r12 — tightens the r10 per-row form, lossless):
    # both docs' shingle lists are ranked by the SAME global (df, hash)
    # order, so the common elements of a pair appear in the same order
    # in both ranked lists.  The match rows of a pair are therefore its
    # FIRST c common elements (those landing in the probe's prefix);
    # every remaining common element sits strictly after the LAST match
    # in both orders, so
    #     overlap <= c + min(np - max(kp), ni - max(mi)).
    # Requiring that bound >= ceil(t * np) never loses a qualifying
    # pair (its true overlap >= ceil(t*np) is itself <= the bound) and
    # is always at least as tight as the old any-row form — with c
    # matches at probe ranks kp_1 < .. < kp_c, np - kp_c <= (np - kp_1)
    # - (c - 1), so c + min-over-last <= 1 + min-over-first.  The
    # groupBy replaces the former per-row filter + distinct: same
    # (pair-keyed, partially-aggregated) exchange, one fewer pass, and
    # the direction rule already emits each unordered pair in exactly
    # one orientation so no distinct is needed.  Combined with the
    # k-prefix match-count requirement (see ``prefix_k`` above), the
    # one-rare-shingle coincidences that dominated the candidate set
    # die here instead of in the array-intersect verify.
    req = F.ceil(F.lit(min_containment) * F.col("_np"))
    cands = (
        prefix.join(index, on="_h")
        .filter(
            (F.col("_ni") > F.col("_np"))
            | ((F.col("_ni") == F.col("_np")) & (F.col("_i") > F.col("_p")))
        )
        .groupBy("_p", "_i", "_np", "_ni")
        .agg(
            F.count(F.lit(1)).alias("_c"),
            F.max("_kp").alias("_kpx"),
            F.max("_mi").alias("_mix"),
        )
        .filter(
            (F.col("_c") >= F.least(req, F.lit(prefix_k)))
            & (
                F.col("_c")
                + F.least(
                    F.col("_np") - F.col("_kpx"), F.col("_ni") - F.col("_mix")
                )
                >= req
            )
        )
        .select(
            F.least("_p", "_i").alias("doc_id_a"),
            F.greatest("_p", "_i").alias("doc_id_b"),
        )
    )
    v = sets.select(F.col(id_col), F.col("sh")).hint("merge")
    joined = (
        cands.join(
            v.withColumnRenamed(id_col, "doc_id_a").withColumnRenamed("sh", "sh_a"),
            on="doc_id_a",
        ).join(
            v.withColumnRenamed(id_col, "doc_id_b").withColumnRenamed("sh", "sh_b"),
            on="doc_id_b",
        )
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    smaller = F.least(F.size(F.col("sh_a")), F.size(F.col("sh_b")))
    return joined.select(
        "doc_id_a",
        "doc_id_b",
        (inter.cast("double") / smaller.cast("double")).alias("containment"),
    ).filter(F.col("containment") >= min_containment)


def containment_dedup_clustered(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_containment: float = 0.8,
    shingle_n: int = 3,
) -> DataFrame:
    """Containment dedup that returns duplicate CLUSTERS (doc_id,
    canonical_id, cluster_size) without materializing the quadratic
    pair set on dense replica cliques — the keep-set path for corpora
    where containment_pairs_portable is output-bound (a k-replica
    clique emits k(k-1)/2 pairs; 250,600 pairs on the 10x adversarial
    corpus).

    The cut is SET-SIGNATURE CANONICALIZATION before pair generation:
    docs are grouped by an md5 signature of their sorted shingle-hash
    set, and only the min-id representative of each identical-set group
    enters the prefix-filter pipeline. This is exact, not approximate:

    * identical sets => identical containment with EVERY other doc, so
      group members have exactly the same near-dup neighborhood as
      their representative;
    * group members are mutual containment-1.0 duplicates of the
      representative (any threshold <= 1), contributing the
      (member, rep) edges directly;
    * therefore the graph <rep pairs + member edges> has the same
      connected components over the same node set as the full pair
      graph, and the same min-id canonicals — keep-set equivalence is
      property-tested against the pair path in tests/test_llm_ops.py.

    A k-replica exact-duplicate clique collapses to ONE representative
    (zero in-clique pairs, k-1 member edges); only genuinely distinct
    near-dup sets still pair up. Docs too short to shingle never enter
    (same as the pair path). Cache hygiene: the staged/sets frames are
    unpersisted before returning — clustering localCheckpoints, so the
    returned frame has no lineage into them."""
    from .graph import dedup_clusters

    _, sets = _containment_stage(df, text_col, id_col, shingle_n)
    grp = rep_sets = None
    try:
        # _sig is a map-only projection of the CACHED sets frame, so the
        # grouped min below is the only extra exchange; the join back
        # re-uses that exchange's partitioning under AQE (r08 verdict's
        # last lever: one persisted frame + one materialization job
        # fewer than the previous window-over-_sig formulation).
        sig = sets.select(
            F.col(id_col),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.sort_array(F.col("sh")), lambda x: x.cast("string")
                    ),
                )
            ).alias("_sig"),
        )
        grp = sig.join(
            sig.groupBy("_sig").agg(F.min(id_col).alias("_rep")), on="_sig"
        ).persist()
        reps = grp.filter(F.col(id_col) == F.col("_rep")).select(id_col)
        # ONE persisted representative frame: rep_sets is a doc-count-
        # sized semi-join of the cached sets; the (doc, hash) side the
        # core needs is a map-only explode of it, so no doc x shingle
        # frame is ever semi-joined or cached (the three-round
        # 6.5-7.1s plateau came from re-deriving these per consumer)
        rep_sets = sets.join(reps, on=id_col, how="left_semi").persist()
        rep_staged = rep_sets.select(
            F.col(id_col), F.explode("sh").alias("_h"), "n"
        )
        rep_pairs = _containment_core(
            rep_staged, rep_sets, id_col, min_containment
        )
        member_edges = (
            grp.filter(F.col(id_col) != F.col("_rep"))
            .select(
                F.col(id_col).alias("doc_id_a"), F.col("_rep").alias("doc_id_b")
            )
        )
        edges = rep_pairs.select("doc_id_a", "doc_id_b").unionByName(
            member_edges
        )
        # dedup_clusters localCheckpoints eagerly: by the time it
        # returns, labels are materialized and the inputs can be freed
        out = dedup_clusters(edges)
        return out
    finally:
        for frame in (grp, rep_sets):
            if frame is not None:
                frame.unpersist()
        sets.unpersist()


# -- incremental MinHash: persisted index + probe ---------------------------
#
# The production dedup shape: a 100 TB corpus is deduped ONCE, its LSH
# index persisted; every new ingest batch then probes the index without
# re-scanning corpus text. Write both frames bucketed — bands_df by
# (band_idx, band_hash), verify_df by the id — and the probe joins
# become co-located (zero corpus-side shuffle per batch).


def minhash_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """Build the persistent dedup index for ``df``: returns
    ``(bands_df, verify_df)``.

    * ``bands_df`` — (id, band_idx, band_hash): the LSH bucket table,
      one row per (doc, band). Candidate generation for a new batch is
      an equi-join against it.
    * ``verify_df`` — (id, sh): each doc's distinct 64-bit shingle
      hashes, for exact-Jaccard verification without touching corpus
      text again. Jaccard over hashed shingles equals Jaccard over
      shingles up to 64-bit collisions (~n^2/2^64 — negligible).

    Both are computed in one signature pass (the shingle explode feeds
    the signature aggregation; the verify set is an extra collect_set
    aggregate on the same groupBy — no second scan)."""
    rows_per_band = num_hashes // bands
    sigs = _sigs_with_sets(df, text_col, id_col, num_hashes, shingle_n)
    band_cols = [
        F.xxhash64(*[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]).alias(
            f"band_{b}"
        )
        for b in range(bands)
    ]
    bands_df = (
        sigs.select(F.col(id_col), *band_cols)
        .select(
            F.col(id_col),
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(b).alias("band_idx"), F.col(f"band_{b}").alias("band_hash")
                    )
                    for b in range(bands)
                ])
            ).alias("band"),
        )
        .select(id_col, "band.band_idx", "band.band_hash")
    )
    verify_df = sigs.select(F.col(id_col), F.sort_array(F.col("sh")).alias("sh"))
    return bands_df, verify_df


def minhash_probe(
    bands_df: DataFrame,
    verify_df: DataFrame,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    min_jaccard: float = 0.8,
    shingle_n: int = 3,
) -> DataFrame:
    """Dedup an ingest batch against a persisted index: returns verified
    (new_id, corpus_id, jaccard) pairs at >= ``min_jaccard``.

    Cost is proportional to the BATCH, not the corpus: the batch's band
    rows equi-join the bucket table (corpus side co-located when written
    bucketed by (band_idx, band_hash)); only candidate corpus docs'
    shingle sets are fetched from verify_df (join pruned by candidate
    ids). Corpus text is never re-read. ``num_hashes``/``bands``/
    ``shingle_n`` must match the index build — band hashes are seeded
    the same way on both sides."""
    new_bands, new_verify = minhash_index(
        new_docs, text_col, id_col, num_hashes, bands, shingle_n
    )
    cands = (
        new_bands.select(
            F.col(id_col).alias("new_id"), "band_idx", "band_hash"
        )
        .join(
            bands_df.select(
                F.col(id_col).alias("corpus_id"), "band_idx", "band_hash"
            ),
            on=["band_idx", "band_hash"],
        )
        .select("new_id", "corpus_id")
        .distinct()
    )
    # verify joins shuffle hash arrays — merge-hint both (broadcasting an
    # array-carrying side is the known OOM shape, see minhash_dedup)
    nv = new_verify.select(
        F.col(id_col).alias("new_id"), F.col("sh").alias("sh_new")
    ).hint("merge")
    cv = verify_df.select(
        F.col(id_col).alias("corpus_id"), F.col("sh").alias("sh_corpus")
    ).hint("merge")
    joined = cands.join(nv, on="new_id").join(cv, on="corpus_id")
    inter = F.size(F.array_intersect(F.col("sh_new"), F.col("sh_corpus")))
    union = F.size(F.col("sh_new")) + F.size(F.col("sh_corpus")) - inter
    return (
        joined.select(
            "new_id",
            "corpus_id",
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )


# -- SimHash ----------------------------------------------------------------


def simhash64(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hasher=None,
    width: int = 64,
) -> DataFrame:
    """``width``-bit SimHash over tokens: for each bit position, sum +-1
    weighted by each token's hash bit; sign of the sum is the output bit
    (bit = 1 iff 2*count_of_ones - n > 0, matching the former
    sum(2*bit-1) > 0 formulation exactly).

    Token hashes stay JVM-side (default xxhash64; ``hasher`` swaps in
    e.g. the portable md5-60 hash, with ``width`` matching its bit
    count); the per-bit tallies run in one Arrow kernel over each doc's
    collected hash list. The previous built-in-only form aggregated 64
    separate SUM(shift/mask) expressions per token row — ~100M
    expression evaluations at sf0.1 (measured 7.2s); the numpy
    unpack-and-sum does the same tallies in ~0.1s. The shuffle shape is
    unchanged in spirit (one groupBy carrying the doc's token hashes; at
    100 TB the per-doc list is bounded by doc length, the same rows the
    64-agg form shuffled as partial sums)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    hash_fn = hasher or F.xxhash64
    tok = _spread(df).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    ).select(F.col(id_col), hash_fn(F.col("tok")).alias("h"))
    per_doc = tok.groupBy(id_col).agg(F.collect_list("h").alias("hs"))

    _shifts = np.arange(width, dtype=np.uint64)

    def _sim(hs):
        out = np.empty(len(hs), dtype=np.int64)
        for i, arr in enumerate(hs):
            a = np.asarray(arr, dtype=np.int64).view(np.uint64)
            # signed tally: uint64 arithmetic would wrap negative sums
            ones = (
                ((a[:, None] >> _shifts) & np.uint64(1))
                .sum(axis=0)
                .astype(np.int64)
            )
            sel = (2 * ones - len(a)) > 0
            packed = (sel.astype(np.uint64) << _shifts).sum(dtype=np.uint64)
            out[i] = np.uint64(packed).astype(np.int64)
        return pd.Series(out)

    _sim.__annotations__ = {"hs": pd.Series, "return": pd.Series}
    sim_udf = pandas_udf(_sim, "long")
    return per_doc.select(F.col(id_col), sim_udf(F.col("hs")).alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 8,
    bands: int = 4,
    max_bucket_size: int = 10000,
    hasher=None,
    width: int = 64,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the ``width``-bit signature into
    ``bands`` contiguous chunks; group on (band_idx, chunk), expand pairs
    in-bucket, verify exact hamming distance. Returns
    (doc_id_a, doc_id_b, hamming). ``hasher``/``width`` swap the token
    hash (default xxhash64/64; md5_hash60/60 gives the SQL-replayable
    portable variant).

    Completeness (pigeonhole): a pair at hamming distance d has all its
    differing bits spread over at most d bands, so it is guaranteed to
    share an identical band only when d <= bands-1. ``bands`` is
    auto-raised to ``max_hamming + 1`` so the returned pair set is
    COMPLETE for the requested threshold — more bands cost more
    (band_idx, chunk) shuffle rows, which is the honest price of the
    guarantee. The chunk boundaries partition all 64 bits even when
    bands does not divide 64 (widths differ by at most one bit)."""
    if bands < max_hamming + 1:
        bands = max_hamming + 1
    # persist: the self-join below reads the signature table twice, and
    # recomputing it would re-run the token explode + Arrow tally per side
    sig = simhash64(df, text_col, id_col, hasher=hasher, width=width).persist()
    # band b covers bits [width*b//bands, width*(b+1)//bands) — full coverage
    bounds = [(width * b) // bands for b in range(bands + 1)]
    stacked = sig.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band_idx"),
                    F.shiftright(F.col("simhash"), bounds[b])
                    .bitwiseAND(F.lit((1 << (bounds[b + 1] - bounds[b])) - 1))
                    .alias("chunk"),
                )
                for b in range(bands)
            ])
        ).alias("band"),
    ).select(id_col, "simhash", "band.band_idx", "band.chunk")
    # SimHash band chunks of structurally-similar docs coincide, so
    # buckets here run much larger than MinHash's — the collect_list
    # array expansion (interpreted HOF slices, cost ~ sum of bucket^2
    # lambda steps) measured 5-12s at sf0.1 where this codegen'd
    # equi-self-join over the persisted signatures runs in ~1s. Oversize
    # buckets (near-universal boilerplate) are dropped, as in
    # _in_bucket_pairs.
    sizes = stacked.groupBy("band_idx", "chunk").agg(
        F.count(F.lit(1)).alias("_n")
    )
    eligible = stacked.join(
        sizes.filter(
            (F.col("_n") > 1) & (F.col("_n") <= max_bucket_size)
        ).select("band_idx", "chunk"),
        on=["band_idx", "chunk"],
    )
    a = eligible.select(
        "band_idx", "chunk",
        F.col(id_col).alias("doc_id_a"), F.col("simhash").alias("_sig_a"),
    )
    b = eligible.select(
        "band_idx", "chunk",
        F.col(id_col).alias("doc_id_b"), F.col("simhash").alias("_sig_b"),
    )
    hamming = F.bit_count(F.col("_sig_a").bitwiseXOR(F.col("_sig_b")))
    return (
        a.join(b, on=["band_idx", "chunk"])
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .select("doc_id_a", "doc_id_b", hamming.alias("hamming"))
        # a pair can collide in several bands -> distinct before threshold
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# -- n-gram Jaccard with length/lang blocking -------------------------------


def _size_bucket(n: Column, min_jaccard: float) -> Column:
    """Log-scaled size bucket for lossless length blocking: J(A,B) >= t
    implies t <= |A|/|B| <= 1/t, i.e. |ln|A| - ln|B|| <= ln(1/t) — with
    bucket width ln(1/t), every qualifying pair sits in the same or an
    adjacent bucket. The width is widened by 1e-6 relative so the
    knife-edge case (|A|/|B| exactly = t) cannot straddle two bucket
    boundaries through float rounding."""
    if min_jaccard >= 1.0:
        # J >= 1 requires identical sets, hence identical sizes
        return F.greatest(n, F.lit(1)).cast("long")
    if min_jaccard <= 0.0:
        # no size constraint derivable — one bucket (no length blocking)
        return F.lit(0).cast("long")
    width = math.log(1.0 / min_jaccard) * (1.0 + 1e-6)
    return F.floor(
        F.log(F.greatest(n, F.lit(1)).cast("double")) / F.lit(width)
    ).cast("long")


def _adjacent_bucket_probes(bucket: Column) -> Column:
    """The 3 buckets a probe-side row must visit to meet every same-or-
    adjacent-bucket partner exactly once under an equi-join (the build
    side keeps its single bucket; |bucket diff| <= 1 means exactly one of
    the three probes matches)."""
    return F.explode(F.array(bucket - 1, bucket, bucket + 1))


def _bitset_jaccard_pairs(
    df: DataFrame,
    vocab: list[str],
    text_col: str,
    id_col: str,
    block_cols: tuple[str, ...],
    min_jaccard: float,
) -> DataFrame:
    """Exact-jaccard fast path for bounded vocabularies (<=64 distinct
    tokens): each token set becomes one 64-bit mask, intersection/union
    are popcounts — the pair join then carries a single long per side
    instead of a token array, and the per-pair work is two AND/OR +
    bit_count instead of an O(|A|+|B|) array intersection. Pair
    generation is blocked on (block_cols, size bucket) like the general
    path — the bucket comes from the popcount."""
    bit_map = F.create_map(
        *[c for i, v in enumerate(vocab) for c in (F.lit(v), F.lit(1 << i).cast("long"))]
    )
    mask = F.aggregate(
        distinct_tokens(F.col(text_col)),
        F.lit(0).cast("long"),
        lambda acc, t: acc.bitwiseOR(F.element_at(bit_map, t)),
    )
    t = _spread(df).select(
        F.col(id_col), *[F.col(c) for c in block_cols], mask.alias("mask")
    ).withColumn("szb", _size_bucket(F.bit_count(F.col("mask")), min_jaccard))
    a = t.select(
        F.col(id_col).alias("doc_id_a"),
        *[F.col(c) for c in block_cols],
        "szb",
        F.col("mask").alias("mask_a"),
    )
    b = t.select(
        F.col(id_col).alias("doc_id_b"),
        *[F.col(c).alias(f"{c}_b") for c in block_cols],
        _adjacent_bucket_probes(F.col("szb")).alias("szb_b"),
        F.col("mask").alias("mask_b"),
    )
    cond = [F.col(c) == F.col(f"{c}_b") for c in block_cols] + [
        F.col("szb") == F.col("szb_b")
    ]
    inter = F.bit_count(F.col("mask_a").bitwiseAND(F.col("mask_b")))
    union = F.bit_count(F.col("mask_a").bitwiseOR(F.col("mask_b")))
    return (
        a.join(b, on=cond)
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .select(
            "doc_id_a",
            "doc_id_b",
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: tuple[str, ...] = ("lang",),
    min_jaccard: float = 0.5,
    bitset_max_vocab: int = 64,
) -> DataFrame:
    """Exact token-set Jaccard over blocked pairs: only pairs agreeing on
    ``block_cols`` AND sitting in the same-or-adjacent log-size bucket
    are compared. The size bucket makes pair GENERATION sub-quadratic:
    blocking on lang alone leaves O((n/|langs|)^2) candidate pairs per
    block at corpus scale, while J >= t mathematically confines partners
    to a ~3-bucket size neighborhood (see _size_bucket) — so the bucket
    join prunes the pair space itself, not just the verify cost, and is
    provably lossless at the threshold.

    Adaptive physical strategy: if the corpus vocabulary fits in 64
    tokens (one cheap distinct-count probe), token sets are packed into a
    64-bit mask and jaccard becomes two popcounts — identical results,
    ~10x less pair-join work. Unbounded vocabularies take the
    array-intersection path with a size-ratio prune."""
    vocab_rows = (
        df.select(F.explode(distinct_tokens(F.col(text_col))).alias("tok"))
        .distinct()
        .limit(bitset_max_vocab + 1)
        .collect()
    )
    if len(vocab_rows) <= bitset_max_vocab:
        vocab = sorted(r["tok"] for r in vocab_rows)
        return _bitset_jaccard_pairs(
            df, vocab, text_col, id_col, block_cols, min_jaccard
        )
    # hash tokens to 64-bit longs before the pair join: the blocked join
    # then shuffles ~8 bytes per token instead of the token strings, and
    # array_intersect compares longs — identical jaccard up to 64-bit
    # collisions (~n^2/2^64), same narrowing minhash_dedup's verify uses
    t = (
        _spread(df).select(
            F.col(id_col),
            *[F.col(c) for c in block_cols],
            F.array_distinct(
                F.transform(distinct_tokens(F.col(text_col)), lambda tk: F.xxhash64(tk))
            ).alias("toks"),
        )
        .withColumn("n_toks", F.size("toks"))
        .withColumn("szb", _size_bucket(F.col("n_toks"), min_jaccard))
    )
    a = t.select(
        F.col(id_col).alias("doc_id_a"),
        *[F.col(c) for c in block_cols],
        "szb",
        F.col("toks").alias("toks_a"),
        F.col("n_toks").alias("n_a"),
    )
    b = t.select(
        F.col(id_col).alias("doc_id_b"),
        *[F.col(c).alias(f"{c}_b") for c in block_cols],
        _adjacent_bucket_probes(F.col("szb")).alias("szb_b"),
        F.col("toks").alias("toks_b"),
        F.col("n_toks").alias("n_b"),
    )
    cond = [F.col(c) == F.col(f"{c}_b") for c in block_cols] + [
        F.col("szb") == F.col("szb_b")
    ]
    inter = F.size(F.array_intersect(F.col("toks_a"), F.col("toks_b")))
    union = F.size(F.col("toks_a")) + F.size(F.col("toks_b")) - inter
    # size-ratio prune BEFORE the per-pair intersection: J(A,B) <= min/max,
    # so |A| >= t*|B| and |B| >= t*|A| are necessary for J >= t — this
    # drops most candidate pairs without touching the token arrays and is
    # exact (never removes a qualifying pair)
    size_guard = (
        (F.col("n_a").cast("double") >= F.lit(min_jaccard) * F.col("n_b"))
        & (F.col("n_b").cast("double") >= F.lit(min_jaccard) * F.col("n_a"))
    )
    return (
        a.join(b, on=cond)
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .filter(size_guard)
        .select(
            "doc_id_a",
            "doc_id_b",
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )


# -- embedding-cosine near-dup ---------------------------------------------


def embedding_near_dup_exact(
    emb: DataFrame,
    min_cosine: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs cosine threshold — the correctness oracle for the
    LSH variant below. Quadratic: use only on bounded inputs (test scale /
    per-LSH-block re-verification); the 100 TB path is
    embedding_near_dup_pairs.

    Vectors are unit-normalized ONCE per row and the frame persisted
    before the cross join, so each pair evaluates a single dot fold
    instead of dot + two norms: without the persist barrier, project
    collapse re-substitutes the normalize fold into every pair row
    (measured 38s -> ~12s at sf0.1, 2M pairs)."""
    unit = emb.select(
        F.col(id_col), normalize(F.col(vec_col)).alias("_u")
    ).persist()
    a = unit.select(F.col(id_col).alias("id_a"), F.col("_u").alias("ua"))
    b = unit.select(F.col(id_col).alias("id_b"), F.col("_u").alias("ub"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dot(F.col("ua"), F.col("ub")).alias("cos_sim"))
        .filter(F.col("cos_sim") >= min_cosine)
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    min_cosine: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 6,
    num_tables: int = 4,
    seed: int = 7,
    dim: int = 64,
    max_bucket_size: int = 100000,
) -> DataFrame:
    """Near-duplicate vectors: LSH-bucket candidates (sign-random-
    projection), exact cosine verify >= threshold. In-bucket pair
    expansion — no self-join, no quadratic blowup. Vectors are
    unit-normalized once in the bucketing scan, so the per-pair verify is
    a single dot product instead of dot + two norms.

    ``num_tables`` independent hash tables (different plane seeds) lift
    recall: a pair colliding with probability p per table is found with
    probability 1-(1-p)^L overall — e.g. cos=0.9, 6 planes: p~0.40,
    L=4 -> ~0.87. Cost is linear in L (each vector lands in exactly one
    bucket per table); a pair found in several tables is deduped on
    (id_a, id_b) before the verify filter."""
    import random as _random

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    unit = emb.select(F.col(id_col), normalize(F.col(vec_col)).alias("_u"))

    # ALL T*P plane projections in one Arrow matmul per batch: the HOF
    # formulation (T*P chained fold-dots per row) pays the interpreted
    # higher-order-function cost per plane AND re-substitutes the
    # normalize fold into each — measured minutes-scale at sf0.1 for
    # 32 planes. Signs agree with the sequential fold unless |dot| is
    # within float noise of zero (probability ~1e-8 over a corpus scan).
    # Plane generation matches similarity.py::_planes_df draw order.
    planes = []
    for t in range(num_tables):
        rng = _random.Random(seed + 1000 * t)
        planes.append(
            [[rng.uniform(-1.0, 1.0) for _ in range(dim)] for _ in range(num_planes)]
        )
    M = np.array([p for table in planes for p in table])  # (T*P, D)
    W = np.array(
        [1 << (num_planes - 1 - i) for i in range(num_planes)], dtype=np.int64
    )
    _T, _P = num_tables, num_planes

    def _buckets(vs):
        A = np.stack(vs.to_numpy()).astype(np.float64)  # unit rows
        S = (A @ M.T) >= 0  # (n, T*P) sign pattern
        cols = [
            S[:, t * _P : (t + 1) * _P].astype(np.int64) @ W for t in range(_T)
        ]
        return pd.Series(list(np.stack(cols, axis=1)))

    _buckets.__annotations__ = {"vs": pd.Series, "return": pd.Series}
    bucket_udf = pandas_udf(_buckets, "array<long>")

    stacked = unit.select(
        F.col(id_col),
        F.col("_u"),
        F.posexplode(bucket_udf(F.col("_u"))).alias("tbl", "lsh_bucket"),
    )
    payload = F.struct(F.col(id_col).alias("id"), F.col("_u").alias("v"))
    pairs = _in_bucket_pairs(stacked, ["tbl", "lsh_bucket"], payload, max_bucket_size)
    return (
        pairs.select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            dot(F.col("a.v"), F.col("b.v")).alias("cos_sim"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("cos_sim") >= min_cosine)
    )


def semantic_dedup_pairs(
    emb: DataFrame,
    min_cosine: float = 0.35,
    every_nth: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_size: int = 100000,
) -> DataFrame:
    """SemDeDup-style semantic near-dedup: cluster the corpus by
    nearest-centroid assignment, then verify exact cosine only WITHIN
    each cluster — the standard trick that turns the quadratic
    all-pairs check into per-cluster work (Abbas et al. 2023,
    "SemDeDup"; same family as the reference-free curation passes used
    on web-scale pretraining corpora).

    Scale shape: centroid pick is a filter (every-Nth by id — k-means
    refinement drops in unchanged via similarity.py::kmeans_centroids);
    assignment is the map-only broadcast-centroid Arrow kernel IVF uses
    (zero shuffle); the one wide exchange groups by centroid_id, inside
    which pairs expand via the collect_list combinator (no self-join).
    A cluster is corpus_size/k on average, so per-cluster expansion is
    (n/k)^2 — tune ``every_nth`` so clusters stay bounded, and
    ``max_cluster_size`` hard-caps the quadratic corner. Recall is
    cluster-local by design: a cross-cluster near-dup pair is missed —
    that is the documented SemDeDup trade (they sit near a centroid
    boundary), bought for the ~k-fold cost reduction.

    Deterministic end to end (every-Nth centroids, argmax-cosine with
    smaller-id tie-break, sequential-fold verify dot), so the full
    pipeline is SQL-replayable -> oracle-checked.

    Pair expansion is a codegen'd equi-self-join on centroid_id, not
    the collect_list array combinator: clusters run ~corpus/k members —
    far larger than LSH buckets — and the interpreted HOF slice
    expansion measured 4x slower than the join at sf0.1 (median 1.31s
    vs 0.33s, identical pair sets; the same crossover simhash_near_pairs
    hit). The normalized frame is persisted so the fold computes once,
    and both sides are merge-hinted (broadcasting an array-carrying
    side is the known OOM shape). Oversized clusters (above
    ``max_cluster_size``) are dropped, as in every LSH path — at real
    scale such a cluster means the centroid set is too small."""
    from .similarity import assign_to_centroids, pick_centroids

    cents = pick_centroids(emb, every_nth, id_col=id_col, vec_col=vec_col)
    assigned = assign_to_centroids(emb, cents, id_col=id_col, vec_col=vec_col)
    unit = assigned.select(
        F.col("centroid_id"), F.col(id_col), normalize(F.col(vec_col)).alias("_u")
    ).persist()
    sizes = unit.groupBy("centroid_id").agg(F.count(F.lit(1)).alias("_n"))
    eligible = unit.join(
        sizes.filter((F.col("_n") > 1) & (F.col("_n") <= max_cluster_size)).select(
            "centroid_id"
        ),
        on="centroid_id",
    )
    a = eligible.select(
        "centroid_id", F.col(id_col).alias("id_a"), F.col("_u").alias("ua")
    ).hint("merge")
    b = eligible.select(
        "centroid_id", F.col(id_col).alias("id_b"), F.col("_u").alias("ub")
    ).hint("merge")
    return (
        a.join(b, on="centroid_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dot(F.col("ua"), F.col("ub")).alias("cos_sim"))
        .filter(F.col("cos_sim") >= min_cosine)
    )


def duplicate_substring_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window_tokens: int = 10,
    min_count: int = 2,
) -> DataFrame:
    """Exact-substring duplication spans (the suffix-array dedup family,
    Lee et al. 2022 "Deduplicating Training Data Makes Language Models
    Better", re-expressed for Spark): slide a ``window_tokens``-token
    window over every document, hash each window, find windows whose
    exact token sequence appears >= ``min_count`` times ANYWHERE in the
    corpus (across or within documents), and merge each document's
    overlapping duplicated windows into maximal spans — the byte ranges
    a substring-dedup pass would cut.

    Returns (doc_id, span_start, span_end, n_windows): token offsets
    [span_start, span_end) and how many duplicated windows merged into
    the span. Documents shorter than the window emit nothing.

    Scale shape, in place of the sequential suffix array: one explode
    (corpus tokens -> stride-1 windows, map-only), one map-combined
    groupBy on the 60-bit window hash (the only corpus-wide exchange —
    carries (hash, count) pairs), a shuffle semi-join back to positions,
    and a per-doc window function for the gaps-and-islands merge
    (partitioned by doc — no global sort, unlike a suffix array). The
    portable md5 hash makes the whole pipeline SQL-replayable ->
    oracle-checked; 60-bit collisions over-mark a window as duplicated
    with probability ~n/2^60, the standard hashed-dedup trade."""
    from ..functions.text_fns import md5_hash60

    k = window_tokens
    toks = _spread(df).select(F.col(id_col), tokens(F.col(text_col)).alias("_t"))
    starts = F.when(
        F.size("_t") >= k, F.sequence(F.lit(0), F.size("_t") - k)
    ).otherwise(F.array())
    win = toks.select(
        F.col(id_col), F.col("_t"), F.explode(starts).alias("pos")
    ).select(
        F.col(id_col),
        F.col("pos"),
        md5_hash60(F.concat_ws(" ", F.slice(F.col("_t"), F.col("pos") + 1, k))).alias(
            "_h"
        ),
    )
    dup = (
        win.groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= min_count)
        .select("_h")
    )
    marked = win.join(dup, on="_h", how="leftsemi")
    from pyspark.sql import Window as W

    w = W.partitionBy(id_col).orderBy("pos")
    island = (
        marked.withColumn("_prev", F.lag("pos").over(w))
        .withColumn(
            "_new",
            F.when(
                F.col("_prev").isNull() | (F.col("pos") - F.col("_prev") > k - 1),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "_island", F.sum("_new").over(w.rowsBetween(W.unboundedPreceding, 0))
        )
    )
    return island.groupBy(id_col, "_island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + k).alias("span_end"),
        F.count(F.lit(1)).alias("n_windows"),
    ).select(id_col, "span_start", "span_end", "n_windows")


# -- fuzzy string matching: q-gram blocked edit-distance join ---------------
def fuzzy_match_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_edit: int = 3,
    q: int = 3,
    prefix_len: int | None = 30,
) -> DataFrame:
    """Entity-matching self-join: pairs whose (normalized, optionally
    prefix-truncated) strings are within ``max_edit`` Levenshtein edits,
    WITHOUT the O(n^2) cross join — the fuzzy-dedup primitive for
    titles, names, and URLs.

    Blocking is q-gram existence (Gravano-style): an edit destroys at
    most ``q`` q-grams, so strings longer than ``(max_edit + 1) * q - 1``
    chars within ``max_edit`` edits MUST still share a q-gram — pairs
    are generated in-bucket per shared gram (the LSH band mechanics from
    this module), length-filtered (|len_a - len_b| <= max_edit), then
    verified with the exact ``levenshtein`` built-in. Lossless for
    strings above that length floor (enforce via ``prefix_len`` > the
    floor; shorter corpora need a short-string block — raise).

    Candidate generation uses PREFIX FILTERING (Ed-Join / ppjoin): under
    any global total order on grams, two strings within ``max_edit``
    edits must share a gram inside BOTH of their first ``q*max_edit + 1``
    grams (proof: each side's required overlap leaves at least one
    shared gram in its own prefix; take the max of those two shared
    grams — it lies in both prefixes). Ordering grams by ascending
    global frequency makes every block a RARE gram: blocking on all
    grams measured 220s at sf0.1 on this corpus (common trigrams like
    'the' put thousands of docs in one bucket, quadratic expansion),
    prefix filtering runs the same query in ~2s with the identical
    result. Output: (id_a, id_b, edit_dist), id_a < id_b."""
    floor = (max_edit + 1) * q - 1
    if prefix_len is not None and prefix_len <= floor:
        raise ValueError(f"prefix_len must exceed {floor} for lossless blocking")
    s = F.lower(F.trim(F.col(text_col)))
    if prefix_len is not None:
        s = F.substring(s, 1, prefix_len)
    base = df.select(F.col(id_col), s.alias("_s")).filter(
        F.length("_s") > floor
    )
    k = F.length("_s") - (q - 1)
    grams = base.select(
        id_col,
        "_s",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), k - 1),
                    lambda i: F.col("_s").substr(i + 1, F.lit(q)),
                )
            )
        ).alias("_g"),
    )
    # global gram order = (frequency asc, gram asc); each doc keeps only
    # its first q*max_edit + 1 grams in that order (its rarest grams)
    gram_freq = grams.groupBy("_g").agg(F.count(F.lit(1)).alias("_gf"))
    w = Window.partitionBy(id_col).orderBy(
        F.col("_gf").asc(), F.col("_g").asc()
    )
    # persist: the self-join consumes this frame twice, and its lineage
    # (explode + freq join + window) re-ran per side when lazy — measured
    # 170s vs ~10s at sf0.1. LRU-evictable, one row per (doc, prefix gram).
    prefix = (
        grams.join(gram_freq, on="_g")
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= q * max_edit + 1)
        .select("_g", id_col, "_s")
        .persist()
    )
    a = prefix.select(
        "_g", F.col(id_col).alias("id_a"), F.col("_s").alias("_sa")
    )
    b = prefix.select(
        "_g", F.col(id_col).alias("id_b"), F.col("_s").alias("_sb")
    )
    cand = (
        a.join(b, on="_g")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.abs(F.length("_sa") - F.length("_sb")) <= max_edit)
        .select("id_a", "id_b", "_sa", "_sb")
        .distinct()
    )
    return (
        cand.withColumn("edit_dist", F.levenshtein(F.col("_sa"), F.col("_sb")))
        .filter(F.col("edit_dist") <= max_edit)
        .select("id_a", "id_b", "edit_dist")
    )


def keep_best_per_cluster(
    clusters: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "quality_prob",
) -> DataFrame:
    """Quality-aware canonical selection: given duplicate clusters
    (graph.dedup_clusters output) and per-doc quality scores, pick the
    HIGHEST-scoring member of each cluster as the one to keep — the
    production dedup keep rule (min-id canonicals throw away the best
    copy whenever a cleaner duplicate has a larger id; real pipelines
    keep the best-quality member and drop the rest).

    Tie-break on ascending id makes the pick total and rerun-stable.
    Returns one row per cluster: (canonical_id, kept_doc_id,
    kept_quality, cluster_size, n_dropped). The corpus keep-set is
    (all docs not in any cluster) + kept_doc_id rows — an anti-join of
    cluster members minus winners, exactly like clean_corpus's drops.

    Scale shape: clusters is duplicate-member-sized (far smaller than
    the corpus), the score join is one id-keyed equi-join, and the pick
    is a window PARTITIONED by canonical_id — per-cluster partitions,
    never a global sort."""
    j = clusters.join(
        scores.select(F.col(id_col), F.col(score_col)), on=id_col
    )
    from pyspark.sql.types import IntegralType

    id_integral = isinstance(
        j.schema[id_col].dataType, IntegralType
    )
    if id_integral:
        # argmax as a mergeable max_by aggregate (map-side combine)
        # rather than a per-cluster rank window; ordering identical:
        # maximize (score, -id) = score desc, id asc tie-break.  The
        # negated-id trick needs an INTEGRAL id: (-id).cast('long')
        # truncates fractional ids (3.2 vs 3.9 tie after truncation ->
        # nondeterministic pick) and string negation casts to NULL —
        # both route to the type-agnostic window below.
        return (
            j.groupBy("canonical_id")
            .agg(
                F.max_by(
                    F.struct(
                        F.col(id_col).alias("_kid"),
                        F.col(score_col).alias("_kq"),
                        F.col("cluster_size").alias("_cs"),
                    ),
                    F.struct(F.col(score_col), (-F.col(id_col)).cast("long")),
                ).alias("_r")
            )
            .select(
                F.col("canonical_id"),
                F.col("_r._kid").alias("kept_doc_id"),
                F.col("_r._kq").alias("kept_quality"),
                F.col("_r._cs").alias("cluster_size"),
                (F.col("_r._cs") - F.lit(1)).alias("n_dropped"),
            )
        )
    w = Window.partitionBy("canonical_id").orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    return (
        j.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("canonical_id"),
            F.col(id_col).alias("kept_doc_id"),
            F.col(score_col).alias("kept_quality"),
            F.col("cluster_size"),
            (F.col("cluster_size") - F.lit(1)).alias("n_dropped"),
        )
    )


def minhash_probe_portable(
    corpus: DataFrame,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    min_jaccard: float = 0.5,
    shingle_n: int = 3,
    eager_cleanup: bool = False,
) -> DataFrame:
    """The incremental-dedup probe (minhash_index/minhash_probe's
    shape) through the portable md5-60 hash — the oracle-checked
    representative of ingest-batch-vs-corpus dedup: build the corpus
    side's signatures/bands once, probe them with a new batch, verify
    candidates by exact shingle-set Jaccard.  Returns (new_id,
    corpus_id, jaccard) at >= ``min_jaccard``.

    Same portable conventions as minhash_dedup_portable (raw
    signature-tuple bands, exact string-set verify) so the ENTIRE
    index-build + probe replays in DuckDB SQL; the xxhash64 pipeline
    (minhash_index + minhash_probe, registered as dedup_minhash_probe)
    stays the production default — at 100 TB the corpus band/verify
    tables are built ONCE and persisted bucketed, and each batch's
    probe joins co-locate (the registered twin rebuilds them inline
    because the oracle must see one self-contained query).

    Plan shape: one text scan per side, signature aggregation on the
    doc key, band equi-join (batch side tiny), id-keyed verify joins —
    probe cost proportional to the BATCH, never the corpus."""
    from ..functions.text_fns import md5_hash60

    rpb = num_hashes // bands
    xcols = [f"x{r}" for r in range(rpb)]

    def _sigs(df: DataFrame) -> DataFrame:
        staged = _spread(df).select(
            F.col(id_col),
            F.explode(
                F.array_distinct(shingles(F.col(text_col), shingle_n))
            ).alias("_sh"),
        )
        aggs = [
            F.min(md5_hash60(F.col("_sh"), seed=j)).alias(f"mh_{j}")
            for j in range(num_hashes)
        ] + [F.collect_set(F.col("_sh")).alias("sh")]
        return staged.groupBy(id_col).agg(*aggs)

    def _bands(sigs: DataFrame, tag: str) -> DataFrame:
        return sigs.select(
            F.col(id_col).alias(tag),
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        *[
                            F.col(f"mh_{b * rpb + r}").alias(xcols[r])
                            for r in range(rpb)
                        ],
                    )
                    for b in range(bands)
                ])
            ).alias("band"),
        ).select(tag, "band.band_idx", *[f"band.{x}" for x in xcols])

    corpus_sigs = _sigs(corpus).persist()
    batch_sigs = _sigs(new_docs).persist()
    cands = (
        _bands(batch_sigs, "new_id")
        .join(_bands(corpus_sigs, "corpus_id"), on=["band_idx", *xcols])
        .select("new_id", "corpus_id")
        .distinct()
    )
    joined = (
        cands.join(
            batch_sigs.select(
                F.col(id_col).alias("new_id"), F.col("sh").alias("sh_n")
            ).hint("merge"),
            on="new_id",
        ).join(
            corpus_sigs.select(
                F.col(id_col).alias("corpus_id"), F.col("sh").alias("sh_c")
            ).hint("merge"),
            on="corpus_id",
        )
    )
    inter = F.size(F.array_intersect(F.col("sh_n"), F.col("sh_c")))
    union = F.size(F.col("sh_n")) + F.size(F.col("sh_c")) - inter
    out = joined.select(
        "new_id",
        "corpus_id",
        (inter.cast("double") / union.cast("double")).alias("jaccard"),
    ).filter(F.col("jaccard") >= min_jaccard)
    if eager_cleanup:
        # Long-lived ingest sessions (repeated probe calls against a
        # growing corpus) must not pin one corpus-sized signature cache
        # per call (r09 ADVICE): materialize the verified-pair result
        # (bounded by the batch's duplicate count) eagerly and release
        # both persisted signature frames before returning.  The eager
        # job costs a full extra pass, so single-shot batch callers —
        # the registered query included — take the lazy default and let
        # session teardown / caller clearCache() reclaim the frames
        # (r10 VERDICT: the unconditional eager path regressed the
        # bench 1.84x for zero hygiene benefit in a one-action session).
        out = out.localCheckpoint(eager=True)
        corpus_sigs.unpersist()
        batch_sigs.unpersist()
    return out


def cross_source_matrix(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-source exact-duplicate matrix: for every (source_a <=
    source_b) pair, how many duplicate DOCUMENT PAIRS share identical
    text across (or within) the two sources, and how many distinct
    texts are involved — the provenance view of exact dedup that tells
    a corpus owner WHICH feeds copy from which (mirror detection,
    license-laundering spots, upstream-crawl overlap) before any rows
    are dropped.

    Zero pair explosion: per (text-hash, source) counts collapse first,
    and pair counts come from the closed forms ca*cb (a < b) and
    C(ca,2) (a = b) — the candidate frame is (hashes x sources), never
    (docs x docs).  All-integer arithmetic, fully SQL-replayable.

    Scale shape: one text-scan groupBy onto (hash, source) — the
    dedup_exact shuffle — then a hash-keyed self-join whose per-hash
    fan-out is bounded by the SOURCE count, and a final aggregation
    bounded by sources^2."""
    per = (
        docs.select(
            F.md5(F.col(text_col)).alias("_h"),
            F.col(source_col).alias("_s"),
        )
        .groupBy("_h", "_s")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    a = per.select(
        F.col("_h"), F.col("_s").alias("source_a"), F.col("_c").alias("_ca")
    )
    b = per.select(
        F.col("_h"), F.col("_s").alias("source_b"), F.col("_c").alias("_cb")
    )
    joined = a.join(b, on="_h").filter(F.col("source_a") <= F.col("source_b"))
    n_pairs = F.when(
        F.col("source_a") == F.col("source_b"),
        (F.col("_ca") * (F.col("_ca") - 1)) / 2,
    ).otherwise(F.col("_ca") * F.col("_cb"))
    return (
        joined.select(
            "source_a",
            "source_b",
            n_pairs.cast("bigint").alias("_np"),
        )
        .filter(F.col("_np") > 0)
        .groupBy("source_a", "source_b")
        .agg(
            F.sum("_np").cast("bigint").alias("n_dup_pairs"),
            F.count(F.lit(1)).cast("bigint").alias("n_shared_texts"),
        )
    )
