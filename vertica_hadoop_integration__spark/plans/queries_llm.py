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

from ..operators import dedup as D
from ..operators import similarity as S
from ..operators import text as T
from ..sources import load_table
from .registry import ORACLES, register
from .oracle_fragments import pq_topk_oracle as _pq_topk_oracle


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
           CAST(length(text) AS DOUBLE) /
                CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS avg_token_len,
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
        (len_chars.cast("double") / n_tokens.cast("double")).alias("avg_token_len"),
        F.when((F.length("text") >= 100) & (n_tokens >= 20), 1)
        .otherwise(0)
        .alias("quality_ok"),
    )


# -- n-gram Jaccard near-dup (blocked, exact, oracle-checked) --------------
@register(
    "dedup_ngram_jaccard",
    oracle=r"""
    WITH t AS (
        SELECT doc_id, lang,
               list_distinct(string_split_regex(lower(trim(text)), '\s+')) AS toks
        FROM documents
    )
    SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
           CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
           CAST(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) AS DOUBLE)
               AS jaccard
    FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
          CAST(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) AS DOUBLE)
          >= 0.9
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(d, block_cols=("lang",), min_jaccard=0.9)


@register(
    "dedup_threshold_sweep",
    oracle=r"""
    WITH t AS (
        SELECT doc_id, lang,
               list_distinct(string_split_regex(lower(trim(text)), '\s+')) AS toks
        FROM documents),
    j AS (
        SELECT CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
               CAST(len(a.toks) + len(b.toks)
                    - len(list_intersect(a.toks, b.toks)) AS DOUBLE) AS jac
        FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id),
    f AS (SELECT jac FROM j WHERE jac >= 0.5)
    SELECT th.threshold, CAST(SUM(CASE WHEN f.jac >= th.threshold
                                       THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs
    FROM f CROSS JOIN (
        SELECT CAST(unnest([0.5, 0.6, 0.7, 0.8, 0.9]) AS DOUBLE)
               AS threshold) th
    GROUP BY 1
    """,
)
def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-threshold calibration: pair counts at five Jaccard cuts in
    one pass — the curve an operator reads before committing a near-dup
    threshold for a new corpus (the elbow is where boilerplate ends and
    true duplication begins). Pairs come from ngram_jaccard_pairs at the
    lowest swept threshold (token-HASH narrowing before any set
    intersect — the string-array form measured 50.6s vs ~2s at sf0.1),
    then five conditional sums over the surviving pair frame; only the
    thresholds >= the floor are sweepable by construction. At 100 TB
    swap in the banded MinHash candidates unchanged."""
    d = load_table(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(
        d, block_cols=("lang",), min_jaccard=0.5
    ).select(F.col("jaccard").alias("jac"))
    th = pairs.select(
        "jac",
        F.explode(F.array(*[F.lit(x) for x in (0.5, 0.6, 0.7, 0.8, 0.9)])).alias(
            "threshold"
        ),
    )
    return th.groupBy("threshold").agg(
        F.sum(F.when(F.col("jac") >= F.col("threshold"), 1).otherwise(0))
        .cast("long")
        .alias("n_pairs")
    )


# -- MinHash-LSH near-dup (scale path; audit-oracle since r11) -------------
def _minhash_lsh_audit_oracle() -> str:
    from .dedup_audit import j1_pairs_sql_cte

    return j1_pairs_sql_cte() + """,
    gg AS (SELECT k, count(*) AS c FROM gt GROUP BY 1)
    SELECT CAST(COALESCE(sum(c * (c - 1) / 2), 0) AS BIGINT) AS n_j1_pairs,
           TRUE AS j1_complete, TRUE AS pairs_sound,
           TRUE AS jaccard_exact, TRUE AS canonical_form
    FROM gg WHERE c > 1
    """


@register("dedup_minhash_lsh", oracle=_minhash_lsh_audit_oracle())
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION xxhash64 MinHash-LSH near-dedup (operators/
    dedup.py::minhash_dedup, 16 hashes / 8 bands / verify >= 0.7 on
    3-gram shingles), audited in equivalence form since r11 (r10
    VERDICT item 3; previously rows-only — banded xxhash64 signatures
    are not SQL-replayable).  One published row certifies the pipeline
    end-to-end against RAW-TEXT ground truth computed in-engine with no
    hashing (plans/dedup_audit.py):

    * ``n_j1_pairs`` — ground-truth identical-shingle-set pair count,
      hash-compared against the oracle's own SQL replay of it;
    * ``j1_complete`` — every ground-truth j=1.0 pair was emitted
      (identical sets => identical signatures under ANY hash family =>
      all 8 bands collide — the pigeonhole guarantee the xx path must
      honor);
    * ``pairs_sound`` — every emitted pair's raw-shingle Jaccard
      really clears 0.7 (no false positives through banding);
    * ``jaccard_exact`` — the reported jaccard (computed over hashed
      shingle sets) equals the raw-set recompute bit for bit (64-bit
      collisions would surface here — and would be a real finding);
    * ``canonical_form`` — a < b, no duplicate pairs.

    Pair-set recall fixtures vs the exhaustive oracle stay pytest-
    pinned (tests/test_llm_ops.py); the raw pair list stays available
    from the operator and, oracle-green in full, from the md5-60
    portable twin dedup_minhash_portable."""
    from .dedup_audit import (
        bool_agg,
        j1_truth_pairs,
        recomputed_jaccard,
        shingle_sets,
    )

    d = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_dedup(d, num_hashes=16, bands=8, min_jaccard=0.7)
    sets_df = shingle_sets(d).localCheckpoint(eager=False)
    truth = j1_truth_pairs(sets_df)
    found = pairs.select(
        F.col("doc_id_a").alias("_a"), F.col("doc_id_b").alias("_b")
    )
    j1 = truth.join(found, on=["_a", "_b"], how="left_anti").agg(
        F.count(F.lit(1)).alias("_miss")
    )
    n_j1 = truth.agg(F.count(F.lit(1)).cast("bigint").alias("n_j1_pairs"))
    rj = recomputed_jaccard(pairs, sets_df, "doc_id_a", "doc_id_b")
    sound = rj.agg(
        bool_agg(F.col("_rj") >= F.lit(0.7)).alias("pairs_sound"),
        bool_agg(F.col("jaccard") == F.col("_rj")).alias("jaccard_exact"),
    )
    canon = pairs.agg(
        (
            bool_agg(F.col("doc_id_a") < F.col("doc_id_b"))
            & (
                F.count(F.lit(1))
                == F.count_distinct(F.col("doc_id_a"), F.col("doc_id_b"))
            )
        ).alias("canonical_form")
    )
    return (
        n_j1.crossJoin(j1)
        .crossJoin(sound)
        .crossJoin(canon)
        .select(
            "n_j1_pairs",
            (F.col("_miss") == 0).alias("j1_complete"),
            "pairs_sound",
            "jaccard_exact",
            "canonical_form",
        )
    )


# -- SimHash near-dup (audit-oracle since r11) -----------------------------
@register(
    "dedup_simhash",
    oracle="""
    WITH h AS (SELECT md5(text) AS k, count(*) AS c FROM documents
               GROUP BY 1)
    SELECT CAST(COALESCE(sum(c * (c - 1) / 2), 0) AS BIGINT)
               AS n_exact_pairs,
           TRUE AS exact_complete, TRUE AS hamming_band,
           TRUE AS hamming_match, TRUE AS canonical_form
    FROM h WHERE c > 1
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION xxhash64 SimHash near-dedup at the canonical
    operating point (operators/dedup.py::simhash_near_pairs, hamming
    <= 3 over 64 bits, 4 bands of 16 bits — the web-dedup standard),
    audited in equivalence form since r11 (r10 VERDICT item 3;
    previously rows-only — the bit-sliced xxhash64 signature is not
    SQL-replayable).  One published row certifies:

    * ``n_exact_pairs`` — ground-truth identical-TEXT pair count
      (md5 groups), hash-compared against the oracle's SQL replay;
    * ``exact_complete`` — every identical-text pair was emitted with
      hamming = 0 (identical text => identical signature => every band
      collides — pigeonhole, hash-family-free);
    * ``hamming_band`` — all reported distances lie in [0, 3];
    * ``hamming_match`` — the reported hamming equals an independent
      re-derivation: per-doc signatures recomputed once and re-joined
      by id, xor popcount in a separate expression tree (a transposed
      pair join or stale signature column breaks this);
    * ``canonical_form`` — a < b, no duplicate pairs.

    Bucket-cap/pigeonhole fixtures stay pytest-pinned
    (tests/test_llm_ops.py); the raw pair list stays available from the
    operator and oracle-green from the md5-60 portable twin."""
    from .dedup_audit import bool_agg

    d = load_table(spark, sf_dir, "documents")
    pairs = D.simhash_near_pairs(d, max_hamming=3, bands=4)
    texts = d.select(
        F.col("doc_id"), F.md5(F.col("text")).alias("_k")
    )
    truth = (
        texts.alias("x")
        .join(texts.alias("y"), on="_k")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_id_a"),
            F.col("y.doc_id").alias("doc_id_b"),
        )
    )
    n_exact = truth.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact_pairs")
    )
    miss = truth.join(
        pairs.filter(F.col("hamming") == 0).select("doc_id_a", "doc_id_b"),
        on=["doc_id_a", "doc_id_b"],
        how="left_anti",
    ).agg(F.count(F.lit(1)).alias("_miss"))
    sig = D.simhash64(d).select(
        F.col("doc_id"), F.col("simhash")
    ).localCheckpoint(eager=False)
    redo = (
        pairs.join(
            sig.select(
                F.col("doc_id").alias("doc_id_a"),
                F.col("simhash").alias("_ha"),
            ),
            on="doc_id_a",
        )
        .join(
            sig.select(
                F.col("doc_id").alias("doc_id_b"),
                F.col("simhash").alias("_hb"),
            ),
            on="doc_id_b",
        )
        .agg(
            bool_agg(
                F.col("hamming")
                == F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb")))
            ).alias("hamming_match")
        )
    )
    checks = pairs.agg(
        bool_agg(
            (F.col("hamming") >= 0) & (F.col("hamming") <= 3)
        ).alias("hamming_band"),
        (
            bool_agg(F.col("doc_id_a") < F.col("doc_id_b"))
            & (
                F.count(F.lit(1))
                == F.count_distinct(F.col("doc_id_a"), F.col("doc_id_b"))
            )
        ).alias("canonical_form"),
    )
    return (
        n_exact.crossJoin(miss)
        .crossJoin(checks)
        .crossJoin(redo)
        .select(
            "n_exact_pairs",
            (F.col("_miss") == 0).alias("exact_complete"),
            "hamming_band",
            "hamming_match",
            "canonical_form",
        )
    )


# -- embedding near-dup: exact threshold (oracle-checked) ------------------
@register(
    "dedup_embedding_cosine_exact_smalln",
    # normalized-dot form, matching the engine's normalize-once-then-dot
    # pipeline bitwise (same sequential folds both sides)
    oracle="""
    WITH n AS (SELECT vec_id,
                      list_transform(embedding::DOUBLE[],
                          x -> x / sqrt(list_dot_product(embedding::DOUBLE[],
                                                         embedding::DOUBLE[])))
                          AS u
               FROM embeddings
               WHERE vec_id < 1000)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           list_dot_product(a.u, b.u) AS cos_sim
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.u, b.u) >= 0.4
    """,
)
def dedup_embedding_cosine_exact_smalln(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact all-pairs cosine threshold, BOUNDED-INPUT CONTRACT.

    This is the O(n^2) baseline, deliberately structural-capped at
    vec_id < 1000 so the crossJoin's build side is bounded (and
    broadcastable) at ANY scale factor — the name states the contract.
    The 100 TB near-dup path is dedup_embedding_lsh (bucketed candidate
    generation, linear in rows); this entry exists as the exact recall
    oracle for it at test scale and for bounded ad-hoc audits.  The cap
    covers the full fixture at the driver's sf0.01 (vec_id 0..499), so
    correctness comparison is unaffected."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 1000)
    return D.embedding_near_dup_exact(e, min_cosine=0.4)


def _embedding_lsh_oracle(
    min_cosine: float = 0.95,
    num_planes: int = 8,
    num_tables: int = 4,
    seed: int = 7,
    dim: int = 64,
) -> str:
    """SQL replay of embedding_near_dup_pairs over the planted-dup
    corpus: union exact copies (vec_id % 5 == 0, shifted ids),
    unit-normalize, bucket by the sign pattern of the seeded plane
    literals per table (seeds seed + 1000*t, drawn planes-outer
    dims-inner — identical to the operator), pair same-bucket vectors,
    dedup across tables, exact-verify with the bitwise-matching
    sequential-fold dot."""
    import random

    unions = []
    for t in range(num_tables):
        rng = random.Random(seed + 1000 * t)
        planes = [
            "[" + ", ".join(repr(rng.uniform(-1.0, 1.0)) for _ in range(dim)) + "]"
            for _ in range(num_planes)
        ]
        bucket = " + ".join(
            f"(CASE WHEN list_dot_product(u, {p}) >= 0"
            f" THEN {1 << (num_planes - 1 - i)} ELSE 0 END)"
            for i, p in enumerate(planes)
        )
        unions.append(
            f"SELECT vec_id, u, {t} AS tbl, {bucket} AS bucket FROM n"
        )
    all_tables = " UNION ALL ".join(unions)
    return f"""
    WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    planted AS (SELECT vec_id + 100000 AS vec_id, v FROM base
                WHERE vec_id % 5 = 0),
    allv AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
    n AS (SELECT vec_id,
                 list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS u
          FROM allv),
    b AS ({all_tables}),
    cand AS (
        SELECT DISTINCT a.vec_id AS id_a, a.u AS ua,
                        x.vec_id AS id_b, x.u AS ub
        FROM b a JOIN b x ON a.tbl = x.tbl AND a.bucket = x.bucket
                         AND a.vec_id < x.vec_id)
    SELECT id_a, id_b, list_dot_product(ua, ub) AS cos_sim
    FROM cand WHERE list_dot_product(ua, ub) >= {min_cosine}
    """


# -- embedding near-dup: LSH-bucketed (the 100 TB path; oracle-checked) -----
@register("dedup_embedding_lsh", oracle=_embedding_lsh_oracle())
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-random-projection LSH buckets -> in-bucket pair expansion ->
    exact cosine verify (operators/dedup.py::embedding_near_dup_pairs).
    This is the first-class 100 TB path: candidate generation is linear
    in rows (each vector lands in exactly one bucket per table), the
    quadratic step is confined to tiny buckets (8 planes -> 256 buckets
    per table), and precision is exact (every emitted pair is verified).
    The seeded plane literals make the whole pipeline SQL-replayable ->
    oracle-checked.

    Run at the production operating point (cosine >= 0.95): the fixture
    has no natural pairs that similar (max ~0.51), so exact duplicate
    vectors are PLANTED deterministically (every 5th vector re-added
    under a shifted id) — identical vectors share every bucket, so the
    planted pairs prove end-to-end recall, while same-bucket
    non-duplicates exercise the verify-reject path. The low-threshold
    regime (0.4, where LSH cannot prune and degenerates toward all
    pairs) stays covered by the recall pytest at test scale
    (tests/test_llm_ops.py) and by dedup_embedding_cosine_exact_smalln as the
    bounded baseline."""
    e = load_table(spark, sf_dir, "embeddings")
    planted = e.filter(F.col("vec_id") % 5 == 0).withColumn(
        "vec_id", F.col("vec_id") + 100000
    )
    corpus = e.unionByName(planted)
    return D.embedding_near_dup_pairs(
        corpus, min_cosine=0.95, num_planes=8, num_tables=4
    )


# -- ANN: brute-force cosine top-k (exact baseline, oracle-checked) --------
@register(
    "ann_cosine_topk",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 10),
         c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
         scored AS (
            SELECT query_id, neighbor_id,
                   list_cosine_similarity(qv, cv) AS cos_sim
            FROM q, c WHERE neighbor_id <> query_id),
         ranked AS (
            SELECT query_id, neighbor_id, cos_sim,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cos_sim DESC, neighbor_id) AS rnk
            FROM scored)
    SELECT query_id, neighbor_id, cos_sim, CAST(rnk AS INT) AS rank
    FROM ranked WHERE rnk <= 5
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return S.brute_force_topk(e, q, k=5)


# ann_cosine_topk_arrow moved to queries_extras.py (below the correctness
# window; the exact primary above is the family's oracle-checked row)


# -- ANN: IVF approximate top-k (scale path; oracle-checked) ----------------
# The whole IVF pipeline is deterministic given every-Nth centroids, so the
# oracle replays it end-to-end in SQL: centroid set (vec_id % 50 = 0),
# nearest-centroid assignment (argmax cosine, smaller centroid_id on ties),
# nprobe=3 probe selection, in-bucket candidates, exact top-5 re-rank. The
# assignment argmax tolerates the last-ulp difference between the JVM
# normalized-dot and DuckDB's list_cosine_similarity because random
# embeddings never tie centroids to within an ulp; the FINAL cos_sim uses
# the sequential-fold cosine that is bitwise-equal to DuckDB's.
@register(
    "ann_ivf_topk",
    oracle="""
    WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cent AS (SELECT vec_id AS centroid_id, v AS cv FROM c WHERE vec_id % 50 = 0),
    assign AS (
        SELECT vec_id, centroid_id FROM (
            SELECT c.vec_id, cent.centroid_id,
                   row_number() OVER (PARTITION BY c.vec_id
                       ORDER BY list_cosine_similarity(c.v, cent.cv) DESC,
                                cent.centroid_id) AS rn
            FROM c, cent)
        WHERE rn = 1),
    q AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < 10),
    probes AS (
        SELECT query_id, centroid_id FROM (
            SELECT q.query_id, cent.centroid_id,
                   row_number() OVER (PARTITION BY q.query_id
                       ORDER BY list_cosine_similarity(q.qv, cent.cv) DESC,
                                cent.centroid_id) AS rn
            FROM q, cent)
        WHERE rn <= 3),
    cand AS (
        SELECT p.query_id, a.vec_id AS neighbor_id
        FROM probes p JOIN assign a USING (centroid_id)
        WHERE a.vec_id <> p.query_id),
    scored AS (
        SELECT cand.query_id, cand.neighbor_id,
               list_cosine_similarity(qc.v, nc.v) AS cos_sim
        FROM cand
        JOIN c qc ON qc.vec_id = cand.query_id
        JOIN c nc ON nc.vec_id = cand.neighbor_id),
    ranked AS (
        SELECT query_id, neighbor_id, cos_sim,
               row_number() OVER (PARTITION BY query_id
                   ORDER BY cos_sim DESC, neighbor_id) AS rnk
        FROM scored)
    SELECT query_id, neighbor_id, cos_sim, CAST(rnk AS INT) AS rank
    FROM ranked WHERE rnk <= 5
    """,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return S.ivf_topk(e, q, k=5, every_nth=50, nprobe=3)


# -- ANN recall evaluation (oracle-exact) -----------------------------------
# The evaluation report for the ANN stack: recall@k of the IVF index
# against the exact brute-force ranking, per query, computed IN the
# engine (both rankings are existing oracle-checked pipelines; the
# report is an equi-join + per-query aggregate over two k-row-per-query
# frames). This is the number an indexing team watches when tuning
# nprobe/every_nth — same evaluate-don't-just-run pattern as
# text_langid_confusion and text_quality_confusion.
@register(
    "ann_recall_report",
    oracle="""
    WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < 10),
    exact_topk AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.query_id, c.vec_id AS neighbor_id,
                   row_number() OVER (PARTITION BY q.query_id
                       ORDER BY list_cosine_similarity(q.qv, c.v) DESC,
                                c.vec_id) AS rn
            FROM q, c WHERE c.vec_id <> q.query_id)
        WHERE rn <= 5),
    cent AS (SELECT vec_id AS centroid_id, v AS cv FROM c WHERE vec_id % 50 = 0),
    assign AS (
        SELECT vec_id, centroid_id FROM (
            SELECT c.vec_id, cent.centroid_id,
                   row_number() OVER (PARTITION BY c.vec_id
                       ORDER BY list_cosine_similarity(c.v, cent.cv) DESC,
                                cent.centroid_id) AS rn
            FROM c, cent)
        WHERE rn = 1),
    probes AS (
        SELECT query_id, centroid_id FROM (
            SELECT q.query_id, cent.centroid_id,
                   row_number() OVER (PARTITION BY q.query_id
                       ORDER BY list_cosine_similarity(q.qv, cent.cv) DESC,
                                cent.centroid_id) AS rn
            FROM q, cent)
        WHERE rn <= 3),
    cand AS (
        SELECT p.query_id, a.vec_id AS neighbor_id
        FROM probes p JOIN assign a USING (centroid_id)
        WHERE a.vec_id <> p.query_id),
    approx_topk AS (
        SELECT query_id, neighbor_id FROM (
            SELECT cand.query_id, cand.neighbor_id,
                   row_number() OVER (PARTITION BY cand.query_id
                       ORDER BY list_cosine_similarity(qc.v, nc.v) DESC,
                                cand.neighbor_id) AS rnk
            FROM cand
            JOIN c qc ON qc.vec_id = cand.query_id
            JOIN c nc ON nc.vec_id = cand.neighbor_id)
        WHERE rnk <= 5)
    SELECT e.query_id,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
           CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL
                         THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS recall_at_k
    FROM exact_topk e
    LEFT JOIN approx_topk a USING (query_id, neighbor_id)
    GROUP BY 1
    """,
)
def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query recall@5 of the IVF probe against the exact ranking:
    two existing kernels (brute_force_topk, ivf_topk) reduced to
    k-row-per-query id sets, one equi-join, one per-query aggregate.
    The frames are #queries x k rows — evaluation cost is independent
    of corpus size once the two rankings exist."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    exact = S.brute_force_topk(e, q, k=5).select("query_id", "neighbor_id")
    approx = S.ivf_topk(e, q, k=5, every_nth=50, nprobe=3).select(
        "query_id", "neighbor_id"
    )
    hits = exact.join(approx, on=["query_id", "neighbor_id"], how="left_semi")
    n_exact = exact.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_exact"))
    n_hits = hits.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hits"))
    return (
        n_exact.join(n_hits, on="query_id", how="left")
        .fillna(0, subset=["n_hits"])
        .select(
            "query_id",
            "n_exact",
            "n_hits",
            (F.col("n_hits").cast("double") / F.col("n_exact").cast("double")).alias(
                "recall_at_k"
            ),
        )
    )


@register(
    "embedding_hard_negatives",
    oracle="""
    WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv, label AS ql FROM c
          WHERE vec_id < 10),
    scored AS (
        SELECT q.query_id, c.vec_id AS negative_id,
               list_cosine_similarity(q.qv, c.v) AS cos_sim
        FROM q, c WHERE c.label <> q.ql),
    ranked AS (
        SELECT query_id, negative_id, cos_sim,
               row_number() OVER (PARTITION BY query_id
                   ORDER BY cos_sim DESC, negative_id) AS rnk
        FROM scored)
    SELECT query_id, negative_id, cos_sim, CAST(rnk AS INT) AS rank
    FROM ranked WHERE rnk <= 5
    """,
)
def embedding_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining (operators/similarity.py::hard_negatives):
    per anchor, the top-5 most-similar OTHER-label vectors — the
    contrastive-training pair generator. Broadcast anchors, streaming
    corpus, label filter on the scored scan; the final cos_sim uses the
    sequential-fold cosine that is bitwise-equal to DuckDB's
    list_cosine_similarity."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return S.hard_negatives(e, q, k=5)


@register(
    "text_feature_hashing",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               CAST(('0x'||substr(md5(unnest(
                   string_split_regex(lower(trim(text)), '\s+'))),1,15))
                   AS BIGINT) AS h
        FROM documents),
    s AS (
        SELECT doc_id,
               CAST(h % 1024 AS INT) AS feature_idx,
               CASE WHEN ((h >> 10) & 1) = 0 THEN 1 ELSE -1 END AS sgn
        FROM toks)
    SELECT doc_id, feature_idx, CAST(SUM(sgn) AS BIGINT) AS feature_val
    FROM s GROUP BY 1, 2 HAVING SUM(sgn) <> 0
    """,
)
def text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed hashing-trick featurizer (operators/text.py::
    feature_hashing): vocabulary-free 1024-dim sparse vectors via the
    portable md5-60 bucket + sign-bit, sparse long-form output; the
    oracle replays bucketing, signs, and per-bucket sums exactly."""
    from ..operators.text import feature_hashing

    d = load_table(spark, sf_dir, "documents")
    return feature_hashing(d, num_features=1024)


@register(
    "embedding_label_noise",
    oracle="""
    WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
    scored AS (
        SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
               n.label AS n_label, q.label AS q_label,
               list_cosine_similarity(q.v, n.v) AS cos_sim
        FROM c q JOIN c n ON n.vec_id <> q.vec_id
        WHERE q.vec_id < 200),
    ranked AS (
        SELECT query_id, neighbor_id, n_label, q_label,
               row_number() OVER (PARTITION BY query_id
                   ORDER BY cos_sim DESC, neighbor_id) AS rnk
        FROM scored),
    agg AS (
        SELECT query_id, q_label,
               SUM(CASE WHEN n_label <> q_label THEN 1 ELSE 0 END) AS nd,
               count(*) AS k
        FROM ranked WHERE rnk <= 5 GROUP BY 1, 2)
    SELECT query_id AS vec_id, q_label AS label,
           CAST(nd AS BIGINT) AS n_disagree,
           CAST(nd AS DOUBLE) / CAST(k AS DOUBLE) AS noise_frac
    FROM agg WHERE CAST(nd AS DOUBLE) / CAST(k AS DOUBLE) >= 0.8
    """,
)
def embedding_label_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN label-noise audit (operators/similarity.py::
    knn_label_noise): anchors whose 5 nearest cosine neighbors are
    >= 80% other-label — probable annotation errors. Counting is
    integer-exact; the oracle replays ranking via the bitwise-equal
    cosine and the disagreement aggregation verbatim. The anchor set is
    bounded (vec_id < 200) because the bitwise-exact fold kernel pays
    the interpreted-HOF cost per pair; the full-corpus audit runs the
    Arrow kernel (scorer=cosine_arrow, count-parity pytest)."""
    e = load_table(spark, sf_dir, "embeddings")
    return S.knn_label_noise(
        e, k=5, min_disagree=0.8, anchors=e.filter(F.col("vec_id") < 200)
    )


# -- ANN: product quantization (memory-side scale path; oracle-checked) ----
# Every stage is exact DECIMAL arithmetic, so the oracle replays the
# whole pipeline: every-Nth codebooks, per-sub-space argmin encoding,
# the per-query LUT, and ADC scoring. approx_l2sq is a DECIMAL sum of
# DECIMAL sub-distances -> partial-agg-order-free on both engines.
@register("ann_pq_topk", oracle=_pq_topk_oracle(k=5))
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (operators/similarity.py::pq_topk):
    8 sub-spaces x 16 every-Nth codes compress each vector to 8 bytes;
    queries score against codes via a broadcast lookup table (ADC).
    The memory-side scale path alongside IVF (compute-side) and LSH
    (bucketing); the production zero-expansion encoder is
    pq_encode_arrow with a code-parity pytest."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    return S.pq_topk(e, q, k=5, m=8, n_codes=16, every_nth=10)


@register(
    "ann_ivf_pq_topk",
    oracle="""
    WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cent AS (SELECT vec_id AS centroid_id, v AS cv FROM c WHERE vec_id % 50 = 0),
    assign AS (
        SELECT vec_id, centroid_id FROM (
            SELECT c.vec_id, cent.centroid_id,
                   row_number() OVER (PARTITION BY c.vec_id
                       ORDER BY list_cosine_similarity(c.v, cent.cv) DESC,
                                cent.centroid_id) AS rn
            FROM c, cent) WHERE rn = 1),
    q AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < 5),
    probes AS (
        SELECT query_id, centroid_id FROM (
            SELECT q.query_id, cent.centroid_id,
                   row_number() OVER (PARTITION BY q.query_id
                       ORDER BY list_cosine_similarity(q.qv, cent.cv) DESC,
                                cent.centroid_id) AS rn
            FROM q, cent) WHERE rn <= 3),
    cand AS (
        SELECT p.query_id, a.vec_id
        FROM probes p JOIN assign a USING (centroid_id)
        WHERE a.vec_id <> p.query_id),
    cb AS (SELECT CAST(vec_id / 10 AS INT) AS j, v FROM c
           WHERE vec_id % 10 = 0 AND vec_id < 160),
    cbl AS (SELECT j, r.range AS d, v[CAST(r.range + 1 AS INT)] AS cv
            FROM cb CROSS JOIN range(64) r),
    xl AS (SELECT vec_id, r.range AS d, v[CAST(r.range + 1 AS INT)] AS xv
           FROM c CROSS JOIN range(64) r),
    ed AS (
        SELECT x.vec_id, CAST(x.d // 8 AS INT) AS s, cb.j,
               SUM(CAST((x.xv - cb.cv) * (x.xv - cb.cv) AS DECIMAL(30,15)))
                   AS dist
        FROM xl x JOIN cbl cb ON cb.d = x.d GROUP BY 1, 2, 3),
    codes AS (
        SELECT vec_id, s, j AS code FROM (
            SELECT vec_id, s, j,
                   row_number() OVER (PARTITION BY vec_id, s
                                      ORDER BY dist, j) AS rn
            FROM ed) WHERE rn = 1),
    ql AS (SELECT vec_id AS query_id, r.range AS d,
                  v[CAST(r.range + 1 AS INT)] AS xv
           FROM c CROSS JOIN range(64) r WHERE vec_id < 5),
    lut AS (
        SELECT ql.query_id, CAST(ql.d // 8 AS INT) AS s, cb.j,
               SUM(CAST((ql.xv - cb.cv) * (ql.xv - cb.cv) AS DECIMAL(30,15)))
                   AS qdist
        FROM ql JOIN cbl cb ON cb.d = ql.d GROUP BY 1, 2, 3),
    adc AS (
        SELECT cand.query_id, cd.vec_id AS neighbor_id, SUM(l.qdist) AS a
        FROM cand JOIN codes cd ON cd.vec_id = cand.vec_id
                  JOIN lut l ON l.query_id = cand.query_id
                            AND l.s = cd.s AND l.j = cd.code
        GROUP BY 1, 2),
    ranked AS (
        SELECT query_id, neighbor_id, a,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY a, neighbor_id) AS rnk
        FROM adc)
    SELECT query_id, neighbor_id, CAST(a AS DOUBLE) AS approx_l2sq,
           CAST(rnk AS INT) AS rank
    FROM ranked WHERE rnk <= 5
    """,
)
def ann_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production ANN stack composed (operators/similarity.py::
    ivf_pq_topk): IVF nprobe bucket selection cuts WHICH vectors a
    query touches; PQ codes + broadcast LUT cut WHAT each touched
    vector costs. Both stages individually oracle-proven
    (ann_ivf_topk, ann_pq_topk); here the composition itself is
    replayed end to end."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    return S.ivf_pq_topk(e, q, k=5, every_nth_ivf=50, nprobe=3)



def _lsh_planes_sql(num_planes: int = 6, seed: int = 42, dim: int = 64) -> list[str]:
    """The exact hyperplane literals lsh_bucket_signature derives from the
    seed (operators/similarity.py::_planes_df draws planes outer, dims
    inner from random.Random(seed)), rendered as DuckDB list literals.
    repr() round-trips every double exactly through DuckDB's parser."""
    import random

    rng = random.Random(seed)
    return [
        "[" + ", ".join(repr(rng.uniform(-1.0, 1.0)) for _ in range(dim)) + "]"
        for _ in range(num_planes)
    ]


def _lsh_oracle() -> str:
    planes = _lsh_planes_sql()
    # sig = fold(sig*2 + bit): plane i carries weight 2^(P-1-i)
    bucket = " + ".join(
        f"(CASE WHEN list_dot_product(v, {p}) >= 0 THEN {1 << (len(planes) - 1 - i)} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    return f"""
    WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    b AS (SELECT vec_id, v, {bucket} AS bucket FROM c),
    q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b WHERE vec_id < 10),
    cand AS (
        SELECT q.query_id, q.qv, b.vec_id AS neighbor_id, b.v AS nv
        FROM q JOIN b USING (bucket)
        WHERE b.vec_id <> q.query_id),
    scored AS (
        SELECT query_id, neighbor_id,
               list_cosine_similarity(qv, nv) AS cos_sim
        FROM cand),
    ranked AS (
        SELECT query_id, neighbor_id, cos_sim,
               row_number() OVER (PARTITION BY query_id
                   ORDER BY cos_sim DESC, neighbor_id) AS rnk
        FROM scored)
    SELECT query_id, neighbor_id, cos_sim, CAST(rnk AS INT) AS rank
    FROM ranked WHERE rnk <= 5
    """


# -- ANN: LSH-bucketed top-k (scale path; oracle-checked) -------------------
# Deterministic seeded hyperplanes make the whole bucketing replayable in
# SQL: the oracle embeds the identical plane literals and recomputes the
# sign-pattern bucket, the same-bucket candidate join, and the exact
# re-rank. A sign flip would need |dot| within one ulp of zero — random
# vectors never land there.
@register("ann_lsh_topk", oracle=_lsh_oracle())
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return S.lsh_bucket_topk(e, q, k=5, num_planes=6)


# -- language ID (heuristic, oracle-checked) -------------------------------
_LANG_SCORE_SQL = """
        len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                        x -> list_contains({markers}, x)))"""


def _lang_sql() -> str:
    from ..operators.text import LANG_MARKERS

    score_cols = ",\n".join(
        _LANG_SCORE_SQL.format(
            markers="[" + ", ".join(f"'{m}'" for m in LANG_MARKERS[lang]) + "]"
        )
        + f" AS score_{lang}"
        for lang in LANG_MARKERS
    )
    langs = sorted(LANG_MARKERS)
    m = "greatest(" + ", ".join(f"score_{lang}" for lang in langs) + ")"
    case = "CASE " + " ".join(
        f"WHEN score_{lang} = {m} THEN '{lang}'" for lang in langs
    ) + " END"
    return f"""
    WITH scored AS (SELECT doc_id, {score_cols} FROM documents)
    SELECT doc_id, {', '.join('CAST(score_' + lang + ' AS INT) AS score_' + lang for lang in ('en','de','fr','es','zh'))},
           {case} AS predicted_lang
    FROM scored
    """


@register("text_language_id", oracle=_lang_sql())
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return T.language_id(d)


def _langid_confusion_sql() -> str:
    pred = _lang_sql()
    return f"""
    WITH pred AS ({pred})
    SELECT d.lang AS actual_lang, p.predicted_lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM pred p JOIN documents d USING (doc_id)
    GROUP BY 1, 2
    """


# -- language-ID confusion matrix (oracle-checked evaluation report) --------
# The documents fixture carries ground-truth `lang`, so the classifier can
# be EVALUATED, not just run: actual x predicted counts are the report a
# curation pipeline uses to decide whether the cheap n-gram heuristic is
# good enough per language or a real model is needed. One scan + one
# small-key aggregation; the oracle replays scoring, argmax tie-break,
# and the join to truth end to end.
@register("text_langid_confusion", oracle=_langid_confusion_sql())
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pred = T.language_id(d).select("doc_id", "predicted_lang")
    return (
        pred.join(d.select("doc_id", F.col("lang").alias("actual_lang")), on="doc_id")
        .groupBy("actual_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# -- full quality features (oracle-checked) --------------------------------
@register(
    "text_quality_features",
    oracle=r"""
    WITH t AS (
        SELECT doc_id, text,
               length(text) AS n_chars,
               len(string_split_regex(lower(trim(text)), '\s+')) AS n_tok,
               length(text) - length(regexp_replace(text, '[.,!?;:''"()\[\]{}-]', '', 'g')) AS n_punct,
               len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                               x -> list_contains(['the','and','of','to','a'], x))) AS sw
        FROM documents
    )
    SELECT doc_id,
           CAST(n_chars AS BIGINT) AS len_chars,
           CAST(n_tok AS INT) AS n_tokens,
           CAST(n_chars AS DOUBLE) / CAST(n_tok AS DOUBLE) AS avg_token_len,
           CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE) AS punct_ratio,
           CAST(sw AS DOUBLE) / CAST(n_tok AS DOUBLE) AS stopword_ratio,
           CASE WHEN n_chars >= 100 AND n_tok >= 20 AND n_punct * 5 <= n_chars
                THEN 1 ELSE 0 END AS quality_ok
    FROM t
    """,
)
def text_quality_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return T.quality_features(d)


# -- document fingerprint over token stream (oracle-checked) ---------------
@register(
    "text_fingerprint_tokens",
    oracle=r"""
    SELECT doc_id,
           md5(array_to_string(string_split_regex(lower(trim(text)), '\s+'), ' '))
               AS fingerprint
    FROM documents
    """,
)
def text_fingerprint_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return T.fingerprint(d)


# -- end-to-end corpus cleaning pipeline (oracle-replayed end to end) ------
def _clean_corpus_oracle() -> str:
    from .oracle_fragments import clean_corpus_kept_ctes

    return f"""
    WITH {clean_corpus_kept_ctes(min_chars=20, min_tokens=5,
                                 num_hashes=16, bands=8)},
    drops AS (SELECT DISTINCT doc_id_b AS doc_id FROM ver
              WHERE jaccard >= 0.7)
    SELECT k.doc_id, k.text, k.lang, k.source, k.n_chars, k.predicted_lang
    FROM kept k LEFT JOIN drops d USING (doc_id)
    WHERE d.doc_id IS NULL
    """


@register("pipeline_clean_corpus", oracle=_clean_corpus_oracle())
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """quality gate -> language argmax -> exact dedup -> MinHash
    near-dedup (drop the higher-id side of each verified pair), the
    full training-data cleaning composition (operators/corpus.py).
    Upgraded r08 from rows-only: near_dedup='portable' swaps the
    xxhash64 MinHash internals for the md5-60 pipeline (same plan
    shape), so EVERY stage — gates, language scores + tie-break, exact
    canon, seeded signature mins, banding, exact-Jaccard verify,
    pair-wise drops — replays in the oracle.  The xxhash production
    default stays pytest-covered (tests/test_pipeline.py)."""
    from ..operators.corpus import clean_corpus

    d = load_table(spark, sf_dir, "documents")
    return clean_corpus(
        d, min_chars=20, min_tokens=5, min_jaccard=0.7,
        near_dedup="portable",
    )


# -- near-dup clusters via connected components (audit-oracle since r11) ---
def _minhash_clusters_audit_oracle() -> str:
    from .dedup_audit import j1_pairs_sql_cte

    return j1_pairs_sql_cte() + """,
    gg AS (SELECT k, count(*) AS c FROM gt GROUP BY 1)
    SELECT CAST(COALESCE(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_j1_groups,
           TRUE AS j1_colocated, TRUE AS canonical_is_min,
           TRUE AS sizes_consistent, TRUE AS edges_within_clusters
    FROM gg
    """


@register("dedup_minhash_clusters", oracle=_minhash_clusters_audit_oracle())
def dedup_minhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION near-dup clustering (verified xxhash64 MinHash
    pairs -> connected components -> canonical id per cluster,
    operators/graph.py::dedup_clusters), audited in equivalence form
    since r11 (r10 VERDICT item 3; previously rows-only — the pair
    graph comes from the non-replayable xxhash64 pipeline).  One
    published row certifies the CLUSTERING contract on the real
    production pair graph:

    * ``n_j1_groups`` — ground-truth count of identical-shingle-set
      groups (>1 member), hash-compared against the oracle's replay;
    * ``j1_colocated`` — docs with identical shingle sets landed in
      the SAME cluster (their pair is guaranteed emitted, so CC must
      join them);
    * ``canonical_is_min`` — every cluster's canonical_id is the
      smallest member doc_id (the keep-set contract);
    * ``sizes_consistent`` — cluster_size equals the actual member
      count, identically on every member row;
    * ``edges_within_clusters`` — every verified pair's endpoints
      share a canonical id (no edge crosses clusters — CC correctness
      on the production graph, not a fixture).

    Component-structure fixtures stay pytest-pinned
    (tests/test_llm_ops.py); the full (doc_id, canonical_id,
    cluster_size) table stays available from the operator and
    oracle-green from dedup_clusters_portable's recursive-CTE twin."""
    from ..operators.graph import dedup_clusters
    from .dedup_audit import bool_agg, j1_truth_pairs, shingle_sets

    d = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_dedup(
        d, num_hashes=16, bands=8, min_jaccard=0.7
    ).localCheckpoint(eager=False)
    clusters = dedup_clusters(pairs).localCheckpoint(eager=False)

    sets_df = shingle_sets(d)
    truth = j1_truth_pairs(sets_df)
    n_groups = (
        sets_df.groupBy("skey")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") > 1)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_j1_groups"))
    )
    canon = clusters.select("doc_id", "canonical_id")
    coloc = (
        truth.join(
            canon.select(
                F.col("doc_id").alias("_a"),
                F.col("canonical_id").alias("_ca"),
            ),
            on="_a",
            how="left",
        )
        .join(
            canon.select(
                F.col("doc_id").alias("_b"),
                F.col("canonical_id").alias("_cb"),
            ),
            on="_b",
            how="left",
        )
        .agg(
            bool_agg(
                F.col("_ca").isNotNull()
                & (F.col("_ca") == F.col("_cb"))
            ).alias("j1_colocated")
        )
    )
    per_cluster = clusters.groupBy("canonical_id").agg(
        F.min("doc_id").alias("_minid"),
        F.count(F.lit(1)).alias("_n"),
        F.min("cluster_size").alias("_szmin"),
        F.max("cluster_size").alias("_szmax"),
    )
    shape = per_cluster.agg(
        bool_agg(F.col("canonical_id") == F.col("_minid")).alias(
            "canonical_is_min"
        ),
        bool_agg(
            (F.col("_szmin") == F.col("_n"))
            & (F.col("_szmax") == F.col("_n"))
        ).alias("sizes_consistent"),
    )
    edges = (
        pairs.select(
            F.col("doc_id_a").alias("_a"), F.col("doc_id_b").alias("_b")
        )
        .join(
            canon.select(
                F.col("doc_id").alias("_a"),
                F.col("canonical_id").alias("_ca"),
            ),
            on="_a",
        )
        .join(
            canon.select(
                F.col("doc_id").alias("_b"),
                F.col("canonical_id").alias("_cb"),
            ),
            on="_b",
        )
        .agg(
            bool_agg(F.col("_ca") == F.col("_cb")).alias(
                "edges_within_clusters"
            )
        )
    )
    return (
        n_groups.crossJoin(coloc)
        .crossJoin(shape)
        .crossJoin(edges)
        .select(
            "n_j1_groups",
            "j1_colocated",
            "canonical_is_min",
            "sizes_consistent",
            "edges_within_clusters",
        )
    )


# -- logistic quality classifier (fixed weights, oracle-exact) -------------
@register(
    "text_quality_logreg",
    oracle=r"""
    WITH t AS (
        SELECT doc_id,
               length(text) AS n_chars,
               len(string_split_regex(lower(trim(text)), '\s+')) AS n_tok,
               length(text) - length(regexp_replace(text, '[.,!?;:''"()\[\]{}-]', '', 'g')) AS n_punct,
               len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                               x -> list_contains(['the','and','of','to','a'], x))) AS sw
        FROM documents),
    z AS (
        SELECT doc_id,
               -1.5 + 0.6 * ln(CAST(n_tok AS DOUBLE))
                    + 8.0 * (CAST(sw AS DOUBLE) / CAST(n_tok AS DOUBLE))
                    - 12.0 * (CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE))
                    - 0.35 * (CAST(n_chars AS DOUBLE) / CAST(n_tok AS DOUBLE)) AS z
        FROM t)
    SELECT doc_id,
           1.0 / (1.0 + exp(-z)) AS quality_prob,
           CASE WHEN 1.0 / (1.0 + exp(-z)) >= 0.5 THEN 1 ELSE 0 END AS keep
    FROM z
    """,
)
def text_quality_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-weight logistic quality classifier over the quality_features
    signals (operators/text.py::quality_logreg) — the model-based doc
    filter of a training-data pipeline, structurally identical to
    scoring with learned coefficients. Pure scan-stage projection;
    ln/exp and every ratio mirror the oracle's association exactly, so
    the probability itself is hash-compared."""
    d = load_table(spark, sf_dir, "documents")
    return T.quality_logreg(d)


# -- logistic-regression TRAINING step (oracle-exact) ----------------------
# One full-batch gradient step distilling the rule-based quality_ok gate
# into the logistic classifier text_quality_logreg serves with: the whole
# step — sigmoid residuals, per-feature gradient terms, DECIMAL order-free
# sums, the weight update — replays in SQL. VALUES-side literals are cast
# DOUBLE explicitly (the dq_rules_orders lesson: DuckDB types bare VALUES
# decimals as DECIMAL and the driver hash formats them differently).
@register(
    "text_logreg_train_step",
    oracle=r"""
    WITH t AS (
        SELECT length(text) AS n_chars,
               len(string_split_regex(lower(trim(text)), '\s+')) AS n_tok,
               length(text) - length(regexp_replace(text, '[.,!?;:''"()\[\]{}-]', '', 'g')) AS n_punct,
               len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                               x -> list_contains(['the','and','of','to','a'], x))) AS sw
        FROM documents),
    f AS (
        SELECT ln(CAST(n_tok AS DOUBLE)) AS x1,
               CAST(sw AS DOUBLE) / CAST(n_tok AS DOUBLE) AS x2,
               CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE) AS x3,
               CAST(n_chars AS DOUBLE) / CAST(n_tok AS DOUBLE) AS x4,
               CASE WHEN n_chars >= 100 AND n_tok >= 20
                         AND n_punct * 5 <= n_chars
                    THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE)
               END AS y
        FROM t),
    r AS (
        SELECT 1.0 / (1.0 + exp(-(-1.5 + 0.6 * x1 + 8.0 * x2
                                  + -12.0 * x3 + -0.35 * x4))) - y AS res,
               x1, x2, x3, x4
        FROM f),
    s AS (
        SELECT COUNT(*) AS n,
               SUM(CAST(res * 1.0 AS DECIMAL(30,15))) AS s0,
               SUM(CAST(res * x1 AS DECIMAL(30,15))) AS s1,
               SUM(CAST(res * x2 AS DECIMAL(30,15))) AS s2,
               SUM(CAST(res * x3 AS DECIMAL(30,15))) AS s3,
               SUM(CAST(res * x4 AS DECIMAL(30,15))) AS s4
        FROM r)
    SELECT u.feature, u.w_old,
           CAST(u.sj AS DOUBLE) / CAST(n AS DOUBLE) AS gradient,
           u.w_old - CAST(0.5 AS DOUBLE)
               * (CAST(u.sj AS DOUBLE) / CAST(n AS DOUBLE)) AS w_new
    FROM s, LATERAL (VALUES
        ('bias',           CAST(-1.5  AS DOUBLE), s0),
        ('ln_tokens',      CAST(0.6   AS DOUBLE), s1),
        ('stopword_ratio', CAST(8.0   AS DOUBLE), s2),
        ('punct_ratio',    CAST(-12.0 AS DOUBLE), s3),
        ('avg_token_len',  CAST(-0.35 AS DOUBLE), s4)
    ) AS u(feature, w_old, sj)
    """,
)
def text_logreg_train_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One gradient-descent step of the logistic quality classifier
    (operators/text.py::logreg_train_step): sigmoid residuals against
    the rule-based quality_ok weak label, per-feature gradients from
    ONE scan-stage aggregation with DECIMAL(30,15) order-free sums,
    and the updated weight vector — model training as an engine query,
    the same per-step shape as embedding_kmeans_step."""
    d = load_table(spark, sf_dir, "documents")
    return T.logreg_train_step(d)


# -- logreg training loop (full-replay oracle since r10) -------------------
def _logreg_train_oracle(iters: int = 3, lr: float = 0.5) -> str:
    """Unroll the training loop: each iteration is the (driver-green)
    text_logreg_train_step oracle with weights chained from the
    previous iteration's update instead of literals — the
    ann_ivf_kmeans_topk unroll pattern applied to gradient descent.
    Exactness carries because the step is bitwise-replayable (ln/exp
    parity + DECIMAL(30,15) order-free gradient sums) and the Spark
    loop re-parameterizes each step with the exact collected doubles
    the previous step's oracle-identical arithmetic produced."""
    body = r"""
    WITH t AS (
        SELECT length(text) AS n_chars,
               len(string_split_regex(lower(trim(text)), '\s+')) AS n_tok,
               length(text) - length(regexp_replace(text, '[.,!?;:''"()\[\]{}-]', '', 'g')) AS n_punct,
               len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                               x -> list_contains(['the','and','of','to','a'], x))) AS sw
        FROM documents),
    f AS (
        SELECT ln(CAST(n_tok AS DOUBLE)) AS x1,
               CAST(sw AS DOUBLE) / CAST(n_tok AS DOUBLE) AS x2,
               CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE) AS x3,
               CAST(n_chars AS DOUBLE) / CAST(n_tok AS DOUBLE) AS x4,
               CASE WHEN n_chars >= 100 AND n_tok >= 20
                         AND n_punct * 5 <= n_chars
                    THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE)
               END AS y
        FROM t),
    w0 AS (SELECT CAST(-1.5 AS DOUBLE) AS b, CAST(0.6 AS DOUBLE) AS c1,
                  CAST(8.0 AS DOUBLE) AS c2, CAST(-12.0 AS DOUBLE) AS c3,
                  CAST(-0.35 AS DOUBLE) AS c4)"""
    for i in range(1, iters + 1):
        p = f"w{i - 1}"
        body += f""",
    r{i} AS (SELECT 1.0 / (1.0 + exp(-(b + c1 * x1 + c2 * x2
                                       + c3 * x3 + c4 * x4))) - y AS res,
                    x1, x2, x3, x4
             FROM f CROSS JOIN {p}),
    s{i} AS (SELECT COUNT(*) AS n,
                    SUM(CAST(res * 1.0 AS DECIMAL(30,15))) AS s0,
                    SUM(CAST(res * x1 AS DECIMAL(30,15))) AS s1,
                    SUM(CAST(res * x2 AS DECIMAL(30,15))) AS s2,
                    SUM(CAST(res * x3 AS DECIMAL(30,15))) AS s3,
                    SUM(CAST(res * x4 AS DECIMAL(30,15))) AS s4
             FROM r{i}),
    w{i} AS (SELECT
                 b  - CAST({lr} AS DOUBLE) * (CAST(s0 AS DOUBLE) / CAST(n AS DOUBLE)) AS b,
                 c1 - CAST({lr} AS DOUBLE) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) AS c1,
                 c2 - CAST({lr} AS DOUBLE) * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)) AS c2,
                 c3 - CAST({lr} AS DOUBLE) * (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)) AS c3,
                 c4 - CAST({lr} AS DOUBLE) * (CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE)) AS c4
             FROM s{i} CROSS JOIN {p})"""
    tails = []
    for i in range(0, iters + 1):
        tails.append(f"""
    SELECT CAST({i} AS INT) AS step, u.feature, u.weight
    FROM w{i}, LATERAL (VALUES
        ('bias', b), ('ln_tokens', c1), ('stopword_ratio', c2),
        ('punct_ratio', c3), ('avg_token_len', c4)
    ) AS u(feature, weight)""")
    return body + "\n    UNION ALL".join(tails)


@register("text_logreg_train", oracle=_logreg_train_oracle())
def text_logreg_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three full-batch gradient rounds of the quality classifier
    (operators/text.py::logreg_train): the k-means-style driver loop
    over the oracle-checked step — one corpus scan + 5-value reduce per
    round, weight trajectory (step, feature, weight) out.

    Full-replay oracle since r10 (previously rows-only): the unrolled
    SQL chains three copies of the bitwise-replayable step — sigmoid
    residuals, DECIMAL(30,15) order-free gradient sums, the lr=0.5
    update — through scalar weight CTEs, exactly the
    ann_ivf_kmeans_topk loop-unroll pattern.  The driver loop
    re-parameterizes each step with the previous step's collected
    doubles, so every published trajectory cell hash-compares.
    Numpy-parity stays pytest-pinned."""
    d = load_table(spark, sf_dir, "documents")
    return T.logreg_train(d, iters=3)


# -- quality-classifier confusion vs the rule gate (oracle-exact) ----------
# The evaluation twin of text_langid_confusion for the quality model:
# served-weights predictions cross-tabulated against the rule-based
# quality_ok weak label. Disagreement cells are where distillation
# changes behavior — the report a curation team reads before swapping
# the rule gate for the model gate.
@register(
    "text_quality_confusion",
    oracle=r"""
    WITH t AS (
        SELECT length(text) AS n_chars,
               len(string_split_regex(lower(trim(text)), '\s+')) AS n_tok,
               length(text) - length(regexp_replace(text, '[.,!?;:''"()\[\]{}-]', '', 'g')) AS n_punct,
               len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                               x -> list_contains(['the','and','of','to','a'], x))) AS sw
        FROM documents),
    z AS (
        SELECT CASE WHEN n_chars >= 100 AND n_tok >= 20
                         AND n_punct * 5 <= n_chars THEN 1 ELSE 0 END AS label,
               -1.5 + 0.6 * ln(CAST(n_tok AS DOUBLE))
                    + 8.0 * (CAST(sw AS DOUBLE) / CAST(n_tok AS DOUBLE))
                    - 12.0 * (CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE))
                    - 0.35 * (CAST(n_chars AS DOUBLE) / CAST(n_tok AS DOUBLE)) AS zv
        FROM t)
    SELECT CAST(label AS INT) AS rule_label,
           CAST(CASE WHEN 1.0 / (1.0 + exp(-zv)) >= 0.5
                     THEN 1 ELSE 0 END AS INT) AS model_keep,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM z GROUP BY 1, 2
    """,
)
def text_quality_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-tab of the served logistic gate's keep decision against the
    rule-based quality_ok label. ONE pass: the score recomputes from
    quality_features' own ratio columns (identical cast shapes, so the
    probability matches text_quality_logreg to the ulp) — no self-join,
    scoring and labeling both in the scan stage, the aggregate lands on
    a <=4-cell key space."""
    d = load_table(spark, sf_dir, "documents")
    f = T.quality_features(d)
    z = (
        F.lit(-1.5)
        + F.lit(0.6) * F.log(F.col("n_tokens").cast("double"))
        + F.lit(8.0) * F.col("stopword_ratio")
        - F.lit(12.0) * F.col("punct_ratio")
        - F.lit(0.35) * F.col("avg_token_len")
    )
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return (
        f.select(
            F.col("quality_ok").cast("int").alias("rule_label"),
            F.when(prob >= 0.5, 1).otherwise(0).cast("int").alias("model_keep"),
        )
        .groupBy("rule_label", "model_keep")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# -- BM25-ranked search over posting lists (oracle-exact) ------------------
@register(
    "text_search_bm25",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id,
               unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        FROM documents),
    post AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
    sc AS (
        SELECT count(*) AS n_docs,
               CAST(SUM(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
        FROM dl),
    hits AS (SELECT * FROM post WHERE term IN ('data', 'scan', 'join')),
    dft AS (SELECT term, count(*) AS df_t FROM hits GROUP BY 1),
    s AS (
        SELECT h.doc_id,
               CAST(
                 ln(1.0 + ((CAST(sc.n_docs AS DOUBLE) - CAST(d.df_t AS DOUBLE) + 0.5)
                           / (CAST(d.df_t AS DOUBLE) + 0.5)))
                 * (CAST(h.tf AS DOUBLE) * 2.2)
                 / (CAST(h.tf AS DOUBLE)
                    + 1.2 * (0.25 + 0.75 * (CAST(l.dl AS DOUBLE) / sc.avgdl)))
                 AS DECIMAL(30,15)) AS s
        FROM hits h JOIN dft d USING (term) JOIN dl l USING (doc_id)
        CROSS JOIN sc),
    pd AS (SELECT doc_id, SUM(s) AS score FROM s GROUP BY 1)
    SELECT doc_id, CAST(score AS DOUBLE) AS bm25
    FROM pd ORDER BY score DESC, doc_id LIMIT 20
    """,
)
def text_search_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25-ranked retrieval for {data, scan, join} — any-term match,
    Lucene-style idf, length-normalized tf, top-20 by score
    (operators/text.py::bm25_search). Per-doc score sums go through
    DECIMAL(30,15) so partial-agg order is irrelevant and the ENTIRE
    ranking — idf, normalization, top-k tie-break — replays in the
    DuckDB oracle. Top-k runs as orderBy+limit
    (TakeOrderedAndProject), never a global sort materialization."""
    d = load_table(spark, sf_dir, "documents")
    return T.bm25_search(d, ["data", "scan", "join"], k=20)


# -- hybrid retrieval: BM25 x embedding cosine via RRF (oracle-exact) -------
# The retrieval pattern a curation pipeline uses to source quality
# documents: a lexical leg (BM25 top-50 for the query terms) and a
# semantic leg (cosine top-50 against the seed document's embedding),
# fused by reciprocal-rank fusion score = sum over legs of
# 1/(60 + rank), absent leg contributing 0. Both legs are existing
# oracle-replayed rankings; the fusion is integer-rank arithmetic, so
# the ENTIRE hybrid ranking replays in SQL. Rank windows run over the
# two post-limit 50-row frames only (bounded by construction).
@register(
    "text_hybrid_search",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id,
               unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        FROM documents),
    post AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
    sc AS (
        SELECT count(*) AS n_docs,
               CAST(SUM(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
        FROM dl),
    hits AS (SELECT * FROM post WHERE term IN ('data', 'scan', 'join')),
    dft AS (SELECT term, count(*) AS df_t FROM hits GROUP BY 1),
    s AS (
        SELECT h.doc_id,
               CAST(
                 ln(1.0 + ((CAST(sc.n_docs AS DOUBLE) - CAST(d.df_t AS DOUBLE) + 0.5)
                           / (CAST(d.df_t AS DOUBLE) + 0.5)))
                 * (CAST(h.tf AS DOUBLE) * 2.2)
                 / (CAST(h.tf AS DOUBLE)
                    + 1.2 * (0.25 + 0.75 * (CAST(l.dl AS DOUBLE) / sc.avgdl)))
                 AS DECIMAL(30,15)) AS s
        FROM hits h JOIN dft d USING (term) JOIN dl l USING (doc_id)
        CROSS JOIN sc),
    pd AS (SELECT doc_id, SUM(s) AS score FROM s GROUP BY 1),
    lex50 AS (SELECT doc_id, CAST(score AS DOUBLE) AS bm25 FROM pd
              ORDER BY score DESC, doc_id LIMIT 50),
    lexr AS (SELECT doc_id,
                    row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r_lex
             FROM lex50),
    c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    qv AS (SELECT v AS q FROM c WHERE vec_id = 0),
    semr AS (
        SELECT vec_id AS doc_id, rn AS r_sem FROM (
            SELECT c.vec_id,
                   row_number() OVER (
                       ORDER BY list_cosine_similarity(qv.q, c.v) DESC,
                                c.vec_id) AS rn
            FROM c, qv WHERE c.vec_id <> 0)
        WHERE rn <= 50)
    SELECT COALESCE(lexr.doc_id, semr.doc_id) AS doc_id,
           CAST(r_lex AS INT) AS r_lex,
           CAST(r_sem AS INT) AS r_sem,
           COALESCE(1.0 / (60.0 + CAST(r_lex AS DOUBLE)), 0.0)
               + COALESCE(1.0 / (60.0 + CAST(r_sem AS DOUBLE)), 0.0)
               AS rrf_score
    FROM lexr FULL OUTER JOIN semr USING (doc_id)
    ORDER BY rrf_score DESC, doc_id LIMIT 20
    """,
)
def text_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 lexical top-50 and embedding-cosine
    semantic top-50 (seed = vec 0), fused by reciprocal-rank fusion
    1/(60+rank) per leg. Legs reuse the oracle-checked bm25_search and
    brute_force_topk kernels; ranks come from windows over the
    post-limit 50-row frames (bounded), the fusion is one full-outer
    equi-join of two 50-row frames + TakeOrderedAndProject."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    lex = T.bm25_search(d, ["data", "scan", "join"], k=50)
    wl = Window.orderBy(F.col("bm25").desc(), F.col("doc_id"))
    lexr = lex.select("doc_id", F.row_number().over(wl).alias("r_lex"))
    qv = e.filter(F.col("vec_id") == 0)
    sem = S.brute_force_topk(e, qv, k=50)
    semr = sem.select(
        F.col("neighbor_id").alias("doc_id"), F.col("rank").alias("r_sem")
    )
    fused = lexr.join(semr, on="doc_id", how="full_outer")
    rrf = F.coalesce(
        F.lit(1.0) / (F.lit(60.0) + F.col("r_lex").cast("double")), F.lit(0.0)
    ) + F.coalesce(
        F.lit(1.0) / (F.lit(60.0) + F.col("r_sem").cast("double")), F.lit(0.0)
    )
    return (
        fused.select(
            "doc_id",
            F.col("r_lex").cast("int").alias("r_lex"),
            F.col("r_sem").cast("int").alias("r_sem"),
            rrf.alias("rrf_score"),
        )
        .orderBy(F.col("rrf_score").desc(), "doc_id")
        .limit(20)
    )


def _pq_rerank_oracle(k: int = 5, shortlist: int = 20) -> str:
    """Rerank oracle: reuse ann_pq_topk's full PQ/ADC replay with the
    cut widened to the shortlist, then exact-cosine rerank those pairs
    only (list_cosine_similarity matches the engine's dot/(norm*norm)
    fold bitwise — same parity every cosine oracle relies on)."""
    base = ORACLES["ann_pq_topk"]
    assert "WHERE rnk <= 5" in base
    widened = base.replace("WHERE rnk <= 5", f"WHERE rnk <= {shortlist}")
    # stage 1 runs on unit vectors (see pq_rerank_topk): swap the raw
    # vector CTE for the normalized form (same fold the engine uses)
    raw_cte = "WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)"
    assert raw_cte in widened
    widened = widened.replace(
        raw_cte,
        "WITH c AS (SELECT vec_id,"
        " list_transform(embedding::DOUBLE[],"
        " x -> x / sqrt(list_dot_product(embedding::DOUBLE[],"
        " embedding::DOUBLE[]))) AS v FROM embeddings)",
    )
    return f"""
    WITH short AS (SELECT query_id, neighbor_id FROM ({widened})),
    cvecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    rr AS (
        SELECT s.query_id, s.neighbor_id,
               list_cosine_similarity(q.v, n.v) AS cos_sim
        FROM short s
        JOIN cvecs q ON q.vec_id = s.query_id
        JOIN cvecs n ON n.vec_id = s.neighbor_id),
    ranked2 AS (
        SELECT query_id, neighbor_id, cos_sim,
               row_number() OVER (PARTITION BY query_id
                   ORDER BY cos_sim DESC, neighbor_id) AS rnk
        FROM rr)
    SELECT query_id, neighbor_id, cos_sim, CAST(rnk AS INT) AS rank
    FROM ranked2 WHERE rnk <= {k}
    """


@register("ann_pq_rerank_topk", oracle=_pq_rerank_oracle())
def ann_pq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval (operators/similarity.py::pq_rerank_topk):
    PQ/ADC over 8-byte codes shortlists 20 candidates/query, exact
    cosine re-ranks the top 5 — float vectors touched only for
    shortlist pairs.  The production ANN serving shape (FAISS-style
    IVF-PQ + refine); whole pipeline oracle-replayed."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    return S.pq_rerank_topk(e, q, k=5, shortlist=20)


# -- per-document Shannon character entropy (oracle-exact) -------------------
@register(
    "text_char_entropy",
    oracle="""
    WITH chars AS (
        SELECT doc_id, substring(text, i.i, 1) AS ch
        FROM documents, unnest(generate_series(1, length(text))) AS i(i)),
    counts AS (SELECT doc_id, ch, count(*) AS cnt FROM chars GROUP BY 1, 2),
    tot AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_chars,
                   CAST(count(*) AS BIGINT) AS n_unique_chars
            FROM counts GROUP BY 1)
    SELECT t.doc_id, t.n_chars, t.n_unique_chars,
           -CAST(SUM(CAST(
                (CAST(cnt AS DOUBLE)/CAST(t.n_chars AS DOUBLE))
                * ln(CAST(cnt AS DOUBLE)/CAST(t.n_chars AS DOUBLE))
            AS DECIMAL(30,15))) AS DOUBLE) AS entropy_nats
    FROM counts c JOIN tot t USING (doc_id)
    GROUP BY 1, 2, 3
    """,
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc Shannon character entropy (operators/text.py::
    char_entropy) — the cheap randomness/boilerplate gate: repeated
    filler scores low, base64/binary junk scores high, prose sits in a
    narrow band.  Character explode + two doc-keyed aggregations;
    p*ln(p) terms summed as DECIMAL so the oracle replays exactly."""
    from ..operators.text import char_entropy

    d = load_table(spark, sf_dir, "documents")
    return char_entropy(d)


# -- per-dimension embedding standardization (oracle-exact) ------------------
@register(
    "embedding_standardize",
    oracle="""
    WITH xl AS (
        SELECT vec_id, i.u AS d, v[i.u + 1] AS x
        FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings) e,
             unnest(generate_series(0, len(v) - 1)) AS i(u)),
    stats AS (
        SELECT d, count(*) AS n,
               SUM(CAST(x AS DECIMAL(30,15))) AS s,
               SUM(CAST(x*x AS DECIMAL(30,15))) AS ss
        FROM xl GROUP BY 1),
    st2 AS (
        SELECT d,
               CAST(s AS DOUBLE)/CAST(n AS DOUBLE) AS mu,
               sqrt(CAST(ss AS DOUBLE)/CAST(n AS DOUBLE)
                    - (CAST(s AS DOUBLE)/CAST(n AS DOUBLE))
                      * (CAST(s AS DOUBLE)/CAST(n AS DOUBLE))) AS sigma
        FROM stats)
    SELECT x.vec_id, CAST(x.d AS INT) AS d,
           CASE WHEN sigma <> 0.0 THEN (x.x - mu)/sigma END AS z
    FROM xl x JOIN st2 USING (d)
    """,
)
def embedding_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension z-score standardization (operators/similarity.py::
    standardize_embeddings) — the feature-scaling pass before k-means /
    PCA / linear probes.  The per-dim moment table is dim rows
    (broadcast at any corpus size) joined back map-side; mean/variance
    are double divisions of DECIMAL-exact sums, replayed bit-for-bit."""
    from ..operators.similarity import standardize_embeddings

    e = load_table(spark, sf_dir, "embeddings")
    return standardize_embeddings(e)


# -- embedding outlier audit (oracle-exact) -----------------------------------
@register(
    "embedding_outlier_scores",
    oracle="""
    WITH xl AS (
        SELECT vec_id, i.u AS d, v[i.u + 1] AS x
        FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings) e,
             unnest(generate_series(0, len(v) - 1)) AS i(u)),
    stats AS (
        SELECT d, count(*) AS n,
               SUM(CAST(x AS DECIMAL(30,15))) AS s,
               SUM(CAST(x*x AS DECIMAL(30,15))) AS ss
        FROM xl GROUP BY 1),
    st2 AS (
        SELECT d,
               CAST(s AS DOUBLE)/CAST(n AS DOUBLE) AS mu,
               sqrt(CAST(ss AS DOUBLE)/CAST(n AS DOUBLE)
                    - (CAST(s AS DOUBLE)/CAST(n AS DOUBLE))
                      * (CAST(s AS DOUBLE)/CAST(n AS DOUBLE))) AS sigma
        FROM stats),
    z AS (SELECT x.vec_id,
                 CASE WHEN sigma <> 0.0 THEN (x.x - mu)/sigma END AS z
          FROM xl x JOIN st2 USING (d)),
    scored AS (
        SELECT vec_id,
               CAST(SUM(CAST(z*z AS DECIMAL(30,10))) AS DOUBLE) AS maha2,
               CAST(count(*) AS BIGINT) AS n_dims_scored
        FROM z WHERE z IS NOT NULL GROUP BY 1),
    norms AS (
        SELECT vec_id,
               sqrt(list_dot_product(embedding::DOUBLE[],
                                     embedding::DOUBLE[])) AS l2_norm
        FROM embeddings)
    SELECT s.vec_id, s.maha2, n.l2_norm, s.n_dims_scored
    FROM scored s JOIN norms n USING (vec_id)
    ORDER BY s.maha2 DESC, s.vec_id
    LIMIT 50
    """,
)
def embedding_outlier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-table quality gate (operators/similarity.py::
    embedding_outliers): top-50 vectors by diagonal-covariance squared
    Mahalanobis (sum of squared per-dim z-scores) with L2 norms —
    corrupt/degenerate vectors surface at the extremes before they
    poison k-means or ANN.  Broadcast moment table, map-side z-scores,
    DECIMAL-exact sums, mergeable top-k; fully oracle-replayed."""
    from ..operators.similarity import embedding_outliers

    e = load_table(spark, sf_dir, "embeddings")
    return embedding_outliers(e, top_k=50)


# -- lexicon sentiment scoring (oracle-exact) --------------------------------
def _sentiment_oracle() -> str:
    from ..operators.text import SENTIMENT_LEXICON

    vals = ", ".join(
        f"('{w}', {v})" for w, v in sorted(SENTIMENT_LEXICON.items())
    )
    return rf"""
    WITH lex(w, v) AS (VALUES {vals}),
    toks AS (
        SELECT doc_id,
               unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
        FROM documents),
    per_doc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens
                FROM toks GROUP BY 1),
    hits AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits,
                    CAST(SUM(v) AS BIGINT) AS sentiment_sum
             FROM toks JOIN lex ON lex.w = toks.t GROUP BY 1)
    SELECT p.doc_id, p.n_tokens,
           COALESCE(h.n_hits, 0) AS n_hits,
           COALESCE(h.sentiment_sum, 0) AS sentiment_sum,
           CASE WHEN COALESCE(h.n_hits, 0) > 0
                THEN CAST(h.sentiment_sum AS DOUBLE)
                     / CAST(h.n_hits AS DOUBLE)
                ELSE 0.0 END AS sentiment_mean
    FROM per_doc p LEFT JOIN hits h USING (doc_id)
    """


@register("text_sentiment_score", oracle=_sentiment_oracle())
def text_sentiment_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon sentiment per doc (operators/text.py::sentiment_score) —
    the classic Spark-scale text-analytics workload (EDBT'16-style
    lexicon scoring): broadcast lexicon equi-join, integer-exact
    valence sums, coverage stats; fully oracle-replayed."""
    from ..operators.text import sentiment_score

    d = load_table(spark, sf_dir, "documents")
    return sentiment_score(d)


# -- quality-classifier calibration / reliability diagram (oracle-exact) -----
@register(
    "text_quality_calibration",
    oracle=r"""
    WITH t AS (
        SELECT length(text) AS n_chars,
               len(string_split_regex(lower(trim(text)), '\s+')) AS n_tok,
               length(text) - length(regexp_replace(text, '[.,!?;:''"()\[\]{}-]', '', 'g')) AS n_punct,
               len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                               x -> list_contains(['the','and','of','to','a'], x))) AS sw
        FROM documents),
    z AS (
        SELECT CASE WHEN n_chars >= 100 AND n_tok >= 20
                         AND n_punct * 5 <= n_chars THEN 1 ELSE 0 END AS label,
               1.0 / (1.0 + exp(-(-1.5 + 0.6 * ln(CAST(n_tok AS DOUBLE))
                    + 8.0 * (CAST(sw AS DOUBLE) / CAST(n_tok AS DOUBLE))
                    - 12.0 * (CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE))
                    - 0.35 * (CAST(n_chars AS DOUBLE) / CAST(n_tok AS DOUBLE)))))
                   AS p
        FROM t),
    b AS (SELECT least(CAST(floor(p * 10.0) AS INT), 9) AS bin, p, label FROM z)
    SELECT bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(CAST(p AS DECIMAL(30,15))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS mean_predicted,
           CAST(SUM(label) AS DOUBLE) / CAST(count(*) AS DOUBLE)
               AS empirical_rate
    FROM b GROUP BY 1
    """,
)
def text_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for the served quality classifier: decile
    bins of predicted keep-probability vs the empirical rule-label rate
    — the calibration check a curation team runs before trusting the
    model gate's threshold (the confusion matrix says WHERE the gate
    disagrees; this says whether the PROBABILITIES mean anything).
    One scan: scoring, binning, and the <=10-cell aggregate all in the
    scan stage; bin means via DECIMAL sums so the oracle replays
    bit-for-bit.  Score recomputation matches text_quality_logreg to
    the ulp (identical cast shapes and association)."""
    from ..operators import text as T

    d = load_table(spark, sf_dir, "documents")
    f = T.quality_features(d)
    z = (
        F.lit(-1.5)
        + F.lit(0.6) * F.log(F.col("n_tokens").cast("double"))
        + F.lit(8.0) * F.col("stopword_ratio")
        - F.lit(12.0) * F.col("punct_ratio")
        - F.lit(0.35) * F.col("avg_token_len")
    )
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return (
        f.select(
            F.least(F.floor(prob * F.lit(10.0)).cast("int"), F.lit(9)).alias(
                "bin"
            ),
            prob.alias("_p"),
            F.col("quality_ok").cast("int").alias("_label"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            (
                F.sum(F.col("_p").cast("decimal(30,15)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("mean_predicted"),
            (
                F.sum("_label").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("empirical_rate"),
        )
    )


# -- prefix-dim truncation fidelity report (oracle-exact) --------------------
@register(
    "embedding_truncation_eval",
    oracle="""
    WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    t AS (SELECT vec_id, v, v[1:16] AS v16 FROM c),
    q AS (SELECT vec_id AS query_id, v, v16 FROM t WHERE vec_id < 10),
    full_topk AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.query_id, t.vec_id AS neighbor_id,
                   row_number() OVER (PARTITION BY q.query_id
                       ORDER BY list_cosine_similarity(q.v, t.v) DESC,
                                t.vec_id) AS rn
            FROM q, t WHERE t.vec_id <> q.query_id) WHERE rn <= 5),
    tr_topk AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.query_id, t.vec_id AS neighbor_id,
                   row_number() OVER (PARTITION BY q.query_id
                       ORDER BY list_cosine_similarity(q.v16, t.v16) DESC,
                                t.vec_id) AS rn
            FROM q, t WHERE t.vec_id <> q.query_id) WHERE rn <= 5),
    ov AS (
        SELECT f.query_id, count(*) AS n_overlap
        FROM full_topk f JOIN tr_topk USING (query_id, neighbor_id)
        GROUP BY 1)
    SELECT q.query_id,
           CAST(COALESCE(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
           CAST(COALESCE(ov.n_overlap, 0) AS DOUBLE) / 5.0 AS recall_at_5
    FROM q LEFT JOIN ov USING (query_id)
    """,
)
def embedding_truncation_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-dimension truncation fidelity (the Matryoshka-embedding
    question): per query, how much of the exact 64-dim cosine top-5
    survives when vectors are truncated to their first 16 dims — the
    report that decides whether a cheaper prefix index is safe for
    first-stage retrieval.  Both legs are the same broadcast-query
    brute-force scan (operators/similarity.py::brute_force_topk), the
    truncated leg over a sliced projection; overlap by equi-join.
    Same rank-boundary tolerance argument as ann_recall_report."""
    from ..operators.similarity import brute_force_topk

    e = load_table(spark, sf_dir, "embeddings")
    full = brute_force_topk(e, e.filter(F.col("vec_id") < 10), k=5)
    t16 = e.select(
        "vec_id", F.slice(F.col("embedding"), 1, 16).alias("embedding")
    )
    tr = brute_force_topk(t16, t16.filter(F.col("vec_id") < 10), k=5)
    ov = (
        full.select("query_id", "neighbor_id")
        .join(tr.select("query_id", "neighbor_id"), on=["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    qs = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id")
    )
    return qs.join(ov, on="query_id", how="left").select(
        "query_id",
        F.coalesce(F.col("_n"), F.lit(0)).cast("bigint").alias("n_overlap"),
        (F.coalesce(F.col("_n"), F.lit(0)).cast("double") / F.lit(5.0)).alias(
            "recall_at_5"
        ),
    )


# -- LSH dedup recall/precision report vs exhaustive truth (oracle-exact) ----
def _dedup_recall_oracle() -> str:
    # oracle_fragments is import-side-effect-free: pulling the shared
    # CTE from queries_extras here would run its @register block
    # mid-file and splice ~90 queries into round-7's registration slot,
    # pushing the queries below out of the driver's first-50 sample
    from .oracle_fragments import minhash_portable_cte

    cte = minhash_portable_cte(
        num_hashes=8, bands=4,
        src="(SELECT * FROM documents WHERE doc_id < 500)",
    )
    return rf"""
    WITH {cte},
    hsets AS (
        SELECT doc_id,
               list_distinct(list_transform(shs,
                   s -> CAST(('0x'||substr(md5(s),1,15)) AS BIGINT))) AS hs
        FROM sh),
    truth AS (
        SELECT CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE)
                   / CAST(len(a.hs) + len(b.hs)
                          - len(list_intersect(a.hs, b.hs)) AS DOUBLE) AS j
        FROM hsets a JOIN hsets b ON a.doc_id < b.doc_id
        WHERE 2 * least(len(a.hs), len(b.hs))
              >= greatest(len(a.hs), len(b.hs))),
    tp AS (SELECT count(*) AS n_true FROM truth WHERE j >= 0.5),
    fo AS (SELECT count(*) AS n_found FROM ver WHERE jaccard >= 0.5)
    SELECT CAST(n_true AS BIGINT) AS n_true_pairs,
           CAST(n_found AS BIGINT) AS n_found_pairs,
           CASE WHEN n_true > 0
                THEN CAST(n_found AS DOUBLE) / CAST(n_true AS DOUBLE)
           END AS recall
    FROM tp, fo
    """


@register("dedup_recall_report", oracle=_dedup_recall_oracle())
def dedup_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-dedup recall audit, BOUNDED-INPUT CONTRACT (the dedup twin
    of ann_recall_report): on the doc_id < 500 slice, compare the
    MinHash-LSH pipeline's verified pairs (operators/dedup.py::
    minhash_dedup_portable — a SUBSET of truth, since banding only
    loses candidates and the verify is exact) against the exhaustive
    all-pairs shingle-Jaccard ground truth.  Recall < 1 quantifies the
    banding miss-rate at the operating threshold — the number a
    curation team checks before trusting 8x4 banding at 0.5.  The
    structural doc_id cap keeps the quadratic truth pass bounded (and
    its build side broadcastable) at any scale factor, exactly the
    dedup_embedding_cosine_exact_smalln contract; the production-scale
    recall knobs stay num_hashes/bands.  Truth-pass physics: shingles
    reduce to md5-60 longs BEFORE set building (8-byte intersects, not
    strings — identical Jaccard, the oracle hashes identically), and
    pairs failing the lossless size-ratio prune (J <= min/max, so at
    t=0.5: 2*min >= max) never reach the intersect — 23s -> ~3s at
    sf0.1 for identical counts."""
    from ..functions.df_utils import spread
    from ..functions.text_fns import md5_hash60, shingles
    from ..operators import dedup as D

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    lsh = D.minhash_dedup_portable(
        d, num_hashes=8, bands=4, min_jaccard=0.5, shingle_n=3
    )
    hs = (
        spread(d)
        .select(
            F.col("doc_id"),
            F.explode(F.array_distinct(shingles(F.col("text"), 3))).alias(
                "_s"
            ),
        )
        .select(F.col("doc_id"), md5_hash60(F.col("_s")).alias("_h"))
        .groupBy("doc_id")
        .agg(F.collect_set("_h").alias("hs"))
    )
    a = hs.select(F.col("doc_id").alias("da"), F.col("hs").alias("sa"))
    b = hs.select(F.col("doc_id").alias("db"), F.col("hs").alias("sb"))
    la, lb = F.size(F.col("sa")), F.size(F.col("sb"))
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    union = la + lb - inter
    truth = (
        a.join(b, F.col("da") < F.col("db"))
        .filter(F.lit(2) * F.least(la, lb) >= F.greatest(la, lb))
        .select((inter.cast("double") / union.cast("double")).alias("j"))
        .filter(F.col("j") >= 0.5)
    )
    tp = truth.agg(F.count(F.lit(1)).alias("n_true"))
    fo = lsh.agg(F.count(F.lit(1)).alias("n_found"))
    return tp.crossJoin(fo).select(
        F.col("n_true").cast("bigint").alias("n_true_pairs"),
        F.col("n_found").cast("bigint").alias("n_found_pairs"),
        F.when(
            F.col("n_true") > 0,
            F.col("n_found").cast("double") / F.col("n_true").cast("double"),
        ).alias("recall"),
    )


# -- NDCG ranking-quality report for the PQ ANN path (oracle-exact) ----------
def _ann_ndcg_oracle() -> str:
    from .oracle_fragments import pq_topk_oracle

    ap = pq_topk_oracle(k=10)
    return f"""
    WITH cx AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    qx AS (SELECT vec_id AS query_id, v AS qv FROM cx WHERE vec_id < 5),
    ex AS (
        SELECT query_id, neighbor_id, rn FROM (
            SELECT q.query_id, c.vec_id AS neighbor_id,
                   row_number() OVER (PARTITION BY q.query_id
                       ORDER BY list_cosine_similarity(q.qv, c.v) DESC,
                                c.vec_id) AS rn
            FROM qx q, cx c WHERE c.vec_id <> q.query_id)
        WHERE rn <= 10),
    ap AS (SELECT query_id, neighbor_id, rank AS pos FROM ({ap})),
    dcg AS (
        SELECT a.query_id,
               SUM(CAST(CAST(COALESCE(11 - e.rn, 0) AS DOUBLE)
                        / ln(CAST(a.pos AS DOUBLE) + 1.0)
                    AS DECIMAL(30,15))) AS d,
               CAST(SUM(CASE WHEN e.rn IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_hits
        FROM ap a LEFT JOIN ex e USING (query_id, neighbor_id)
        GROUP BY 1),
    idcg AS (
        SELECT query_id,
               SUM(CAST(CAST(11 - rn AS DOUBLE)
                        / ln(CAST(rn AS DOUBLE) + 1.0)
                    AS DECIMAL(30,15))) AS i
        FROM ex GROUP BY 1)
    SELECT d.query_id, CAST(d.d AS DOUBLE) AS dcg,
           CAST(d.d AS DOUBLE) / CAST(i.i AS DOUBLE) AS ndcg, d.n_hits
    FROM dcg d JOIN idcg i USING (query_id)
    """


@register("ann_ndcg_report", oracle=_ann_ndcg_oracle())
def ann_ndcg_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of the PQ/ADC ranking against the exact cosine ranking —
    the graded IR-quality companion to ann_recall_report's set overlap
    (recall says WHAT fraction survived; NDCG says whether the approx
    ranking put the best survivors FIRST).  Gains = 11 - exact_rank,
    ln-discounted positions, DECIMAL per-query sums, NDCG = DCG/IDCG —
    IDCG from the exact ordering itself, so a perfect PQ ranking scores
    exactly 1.0.  Composes two oracle-checked rankings through one
    equi-join + per-query aggregates, itself oracle-replayed."""
    from ..operators.similarity import brute_force_topk, pq_topk

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    exact = brute_force_topk(e, q, k=10).select(
        "query_id", "neighbor_id", F.col("rank").alias("_rn")
    )
    approx = pq_topk(e, q, k=10, m=8, n_codes=16, every_nth=10).select(
        "query_id", "neighbor_id", F.col("rank").alias("_pos")
    )
    dec = "decimal(30,15)"
    joined = approx.join(exact, on=["query_id", "neighbor_id"], how="left")
    dcg = joined.groupBy("query_id").agg(
        F.sum(
            (
                F.coalesce(F.lit(11) - F.col("_rn"), F.lit(0)).cast("double")
                / F.log(F.col("_pos").cast("double") + F.lit(1.0))
            ).cast(dec)
        ).alias("_d"),
        F.sum(F.when(F.col("_rn").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_hits"),
    )
    idcg = exact.groupBy("query_id").agg(
        F.sum(
            (
                (F.lit(11) - F.col("_rn")).cast("double")
                / F.log(F.col("_rn").cast("double") + F.lit(1.0))
            ).cast(dec)
        ).alias("_i")
    )
    return dcg.join(idcg, on="query_id").select(
        "query_id",
        F.col("_d").cast("double").alias("dcg"),
        (F.col("_d").cast("double") / F.col("_i").cast("double")).alias(
            "ndcg"
        ),
        "n_hits",
    )


# -- readability gate (oracle-exact) ------------------------------------------
@register(
    "text_readability_scores",
    oracle=r"""
    WITH t AS (
        SELECT doc_id,
               len(string_split_regex(lower(trim(text)), '\s+')) AS w,
               greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS s,
               greatest(len(regexp_extract_all(lower(trim(text)),
                                               '[aeiouy]+')), 1) AS y
        FROM documents)
    SELECT doc_id,
           CAST(w AS BIGINT) AS n_words,
           CAST(s AS BIGINT) AS n_sentences,
           CAST(y AS BIGINT) AS n_syllables,
           206.835 - 1.015 * (CAST(w AS DOUBLE) / CAST(s AS DOUBLE))
                   - 84.6 * (CAST(y AS DOUBLE) / CAST(w AS DOUBLE))
               AS flesch_ease,
           0.39 * (CAST(w AS DOUBLE) / CAST(s AS DOUBLE))
               + 11.8 * (CAST(y AS DOUBLE) / CAST(w AS DOUBLE)) - 15.59
               AS fk_grade
    FROM t
    """,
)
def text_readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading ease + Flesch-Kincaid grade per doc
    (operators/text.py::readability_scores) — the readability gate next
    to the quality classifier: vowel-group syllable proxy, [.!?]+
    sentence runs, literal coefficients.  Pure scan-stage projection
    (zero shuffle); fully oracle-replayed."""
    from ..operators.text import readability_scores

    d = load_table(spark, sf_dir, "documents")
    return readability_scores(d)


# -- interactive top-k serving: materialize once, page by rank (oracle-exact) -
@register(
    "ann_topk_paged_serving",
    oracle="""
    WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < 10),
    ranked AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               list_cosine_similarity(q.qv, c.v) AS cos_sim,
               row_number() OVER (PARTITION BY q.query_id
                   ORDER BY list_cosine_similarity(q.qv, c.v) DESC,
                            c.vec_id) AS rn
        FROM q, c WHERE c.vec_id <> q.query_id)
    SELECT query_id, neighbor_id, cos_sim, CAST(rn AS INT) AS rank
    FROM ranked WHERE rn BETWEEN 6 AND 10
    """,
)
def ann_topk_paged_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interactive-session top-k serving (the EDBT'20
    incremental-top-k-session workload, Spark-first): the expensive
    exact ranking is materialized ONCE to k_max=20 (sorted parquet, one
    brute-force scan), and every follow-up request of the session —
    top-5, page 2, page 3 — is a PRUNED read of the materialized
    ranking, never a corpus re-scan.  This query serves page 2 (ranks
    6-10): the rank/query predicates push into the parquet scan
    (PushedFilters pytest-asserted), so a page costs file-skip + a few
    row groups at any corpus size.  The oracle recomputes the exact
    ranking and slices the same page, certifying the
    materialize-then-serve path value-lossless."""
    import tempfile

    from ..operators.similarity import brute_force_topk
    from ..sources.writers import write_sorted

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    full = brute_force_topk(e, q, k=20)
    path = tempfile.mkdtemp(prefix="topk_serve_") + "/ranking"
    write_sorted(full, path, sort_cols=["rank", "query_id"], num_files=4)
    served = spark.read.parquet(path)
    return served.filter(
        (F.col("rank") >= 6) & (F.col("rank") <= 10)
    ).select("query_id", "neighbor_id", "cos_sim", "rank")


# ------------------------------------------------------------------
# Graduated from queries_round8.py (driver-green in CORRECTNESS_r08;
# see plans/__init__.py head rotation).

# -- per-label embedding diversity (one-pass all-pairs identity) -------------
# sum_{i,j}||xi-xj||^2 = 2n*sum||x||^2 - 2*||sum x||^2: the exact mean
# pairwise squared distance per label WITHOUT forming pairs — quadratic
# statistic, linear one-aggregation plan (map-side-combined; group state
# is 2*dim DECIMAL sums).  The collapsing-diversity / injected-duplication
# monitor for training corpora.
def _diversity_oracle(dim: int = 64) -> str:
    ss = ",\n           ".join(
        f"SUM(CAST(v[{d + 1}] * v[{d + 1}] AS DECIMAL(38,12))) AS ss_{d}"
        for d in range(dim)
    )
    s1 = ",\n           ".join(
        f"SUM(CAST(v[{d + 1}] AS DECIMAL(38,12))) AS s1_{d}"
        for d in range(dim)
    )
    s2 = " + ".join(f"CAST(ss_{d} AS DOUBLE)" for d in range(dim))
    musq = " + ".join(
        f"CAST(s1_{d} AS DOUBLE) * CAST(s1_{d} AS DOUBLE)" for d in range(dim)
    )
    return f"""
    WITH c AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
    m AS (SELECT label, count(*) AS n,
           {ss},
           {s1}
          FROM c GROUP BY 1),
    t AS (SELECT label, n, {s2} AS s2d,
                 {musq} AS musq
          FROM m)
    SELECT label, CAST(n AS BIGINT) AS n_vectors,
           s2d / CAST(n AS DOUBLE) AS mean_sq_norm,
           CASE WHEN n > 1 THEN
             (2.0 * CAST(n AS DOUBLE) * s2d - 2.0 * musq)
               / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
           END AS mean_pairwise_sq_dist
    FROM t
    """


@register("embedding_diversity_report", oracle=_diversity_oracle())
def embedding_diversity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean pairwise squared L2 distance via the
    sum-of-squares identity (operators/similarity.py::diversity_report)
    — exact all-pairs statistic from ONE aggregation pass, DECIMAL
    order-free, no pair materialization at any scale."""
    from ..operators.similarity import diversity_report

    e = load_table(spark, sf_dir, "embeddings")
    return diversity_report(e)


# -- filtered vector search (prefilter ANN; oracle-replayed) ------------------
@register(
    "ann_ivf_filtered_topk",
    oracle="""
    WITH c AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    cent AS (SELECT vec_id AS centroid_id, v AS cv FROM c WHERE vec_id % 50 = 0),
    assign AS (
        SELECT vec_id, centroid_id FROM (
            SELECT c.vec_id, cent.centroid_id,
                   row_number() OVER (PARTITION BY c.vec_id
                       ORDER BY list_cosine_similarity(c.v, cent.cv) DESC,
                                cent.centroid_id) AS rn
            FROM c, cent)
        WHERE rn = 1),
    q AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < 10),
    probes AS (
        SELECT query_id, centroid_id FROM (
            SELECT q.query_id, cent.centroid_id,
                   row_number() OVER (PARTITION BY q.query_id
                       ORDER BY list_cosine_similarity(q.qv, cent.cv) DESC,
                                cent.centroid_id) AS rn
            FROM q, cent)
        WHERE rn <= 3),
    cand AS (
        SELECT p.query_id, a.vec_id AS neighbor_id
        FROM probes p
        JOIN assign a USING (centroid_id)
        JOIN c lab ON lab.vec_id = a.vec_id
        WHERE a.vec_id <> p.query_id AND lab.label = 3),
    scored AS (
        SELECT cand.query_id, cand.neighbor_id,
               list_cosine_similarity(qc.v, nc.v) AS cos_sim
        FROM cand
        JOIN c qc ON qc.vec_id = cand.query_id
        JOIN c nc ON nc.vec_id = cand.neighbor_id),
    ranked AS (
        SELECT query_id, neighbor_id, cos_sim,
               row_number() OVER (PARTITION BY query_id
                   ORDER BY cos_sim DESC, neighbor_id) AS rnk
        FROM scored)
    SELECT query_id, neighbor_id, cos_sim, CAST(rnk AS INT) AS rank
    FROM ranked WHERE rnk <= 5
    """,
)
def ann_ivf_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered vector search (the vector-database "ANN + metadata
    filter" workload): top-5 cosine neighbors WITH label = 3, through
    the IVF index (operators/similarity.py::ivf_filtered_topk).
    PREFILTER semantics — the predicate semi-joins the stored
    assignment before scoring, so the k results are the true top-k
    among matching rows in the probed clusters (top-k-then-filter
    would under-return at selective filters).  Centroids stay built
    over the full corpus, matching one-index-many-filters serving."""
    from ..operators.similarity import ivf_filtered_topk

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return ivf_filtered_topk(
        e, q, F.col("label") == 3, k=5, every_nth=50, nprobe=3
    )


# -- MMR diversity rerank (RAG final stage; selection fully SQL-replayed) -----
def _mmr_oracle(
    k_final: int = 5, shortlist: int = 20, candidate_ctes: str | None = None
) -> str:
    """Chained-CTE replay of the greedy MMR selection: sel1 picks by
    relevance; each later step recomputes every remaining candidate's
    max-sim to the selected set and picks argmax(0.7*rel - 0.3*maxsim),
    ties by candidate id — exactly the operator's loop.
    ``candidate_ctes`` swaps the candidate-generation block — it must
    define ``cands(query_id, cand_id, rel)`` given ``c(vec_id, v)`` and
    ``q(query_id, qv)``; default is the brute-force top-``shortlist``."""
    steps = []
    union_sel = "SELECT query_id, cand_id FROM sel1"
    for i in range(2, k_final + 1):
        steps.append(f"""
    s{i - 1} AS ({union_sel}),
    m{i} AS (
        SELECT cd.query_id, cd.cand_id, cd.rel,
               0.7 * cd.rel - 0.3 * max(s._s) AS mmr
        FROM cands cd
        JOIN sims s ON s.query_id = cd.query_id AND s.ca = cd.cand_id
        JOIN s{i - 1} sel ON sel.query_id = s.query_id
                         AND sel.cand_id = s.cb
        WHERE NOT EXISTS (SELECT 1 FROM s{i - 1} e
                          WHERE e.query_id = cd.query_id
                            AND e.cand_id = cd.cand_id)
        GROUP BY cd.query_id, cd.cand_id, cd.rel),
    sel{i} AS (
        SELECT query_id, cand_id, rel, mmr, {i} AS rank FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY mmr DESC, cand_id) AS rn FROM m{i})
        WHERE rn = 1)""")
        union_sel += f" UNION ALL SELECT query_id, cand_id FROM sel{i}"
    finals = "\n    UNION ALL ".join(
        f"SELECT query_id, cand_id AS neighbor_id, rel AS relevance, "
        f"mmr AS mmr_score, CAST(rank AS INT) AS rank FROM sel{i}"
        for i in range(1, k_final + 1)
    )
    if candidate_ctes is None:
        candidate_ctes = f"""
    scored AS (SELECT q.query_id, c.vec_id AS cand_id,
                      list_cosine_similarity(q.qv, c.v) AS rel
               FROM q JOIN c ON c.vec_id <> q.query_id),
    cands AS (SELECT query_id, cand_id, rel FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY rel DESC, cand_id) AS rn FROM scored)
              WHERE rn <= {shortlist})"""
    return f"""
    WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < 8),
    {candidate_ctes},
    sims AS (SELECT a.query_id, a.cand_id AS ca, b.cand_id AS cb,
                    list_cosine_similarity(va.v, vb.v) AS _s
             FROM cands a
             JOIN cands b ON a.query_id = b.query_id
                         AND a.cand_id <> b.cand_id
             JOIN c va ON va.vec_id = a.cand_id
             JOIN c vb ON vb.vec_id = b.cand_id),
    sel1 AS (SELECT query_id, cand_id, rel, 0.7 * rel AS mmr, 1 AS rank
             FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                       ORDER BY rel DESC, cand_id) AS rn FROM cands)
             WHERE rn = 1),{",".join(steps)}
    {finals}
    """


@register("pipeline_mmr_rerank", oracle=_mmr_oracle())
def pipeline_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance diversity rerank
    (operators/similarity.py::mmr_rerank): each query's 20 exact-cosine
    candidates greedily reduced to 5 that balance relevance against
    redundancy (0.7*rel - 0.3*max-sim-to-selected, SIGIR'98) — the RAG
    final stage that stops near-duplicate passages crowding the prompt.
    Candidate generation broadcasts the query side over ONE corpus
    scan; the greedy rounds touch only bounded per-query candidate and
    pairwise-sim frames.  Every selection step replays in SQL."""
    from ..operators.similarity import mmr_rerank

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    return mmr_rerank(e, q, k_final=5, shortlist=20)


# -- SQ8 two-stage ANN (int8 ADC shortlist + exact rerank) ---------------------
@register(
    "ann_sq8_rerank_topk",
    oracle="""
    WITH n AS (SELECT vec_id,
                      list_transform(embedding::DOUBLE[],
                          x -> x / sqrt(list_dot_product(embedding::DOUBLE[],
                                                         embedding::DOUBLE[])))
                          AS u
               FROM embeddings),
    z AS (SELECT vec_id, u,
                 list_max(list_transform(u, x -> abs(x))) AS am
          FROM n),
    q8 AS (SELECT vec_id, u,
                  list_transform(u, x -> CAST(COALESCE(
                      floor(x * (127.0 / nullif(am, 0)) + 0.5), 0) AS INT))
                      AS c8,
                  nullif(am, 0) / 127.0 AS sc
           FROM z),
    qs AS (SELECT vec_id AS query_id, u AS qu, c8 AS qc8, sc AS qsc
           FROM q8 WHERE vec_id < 8),
    cs AS (SELECT vec_id AS neighbor_id, u AS cu, c8 AS cc8, sc AS csc
           FROM q8),
    s1 AS (SELECT qs.query_id, cs.neighbor_id,
                  list_dot_product(qc8::DOUBLE[], cc8::DOUBLE[])
                      * (qsc * csc) AS approx
           FROM qs JOIN cs ON cs.neighbor_id <> qs.query_id),
    short AS (SELECT query_id, neighbor_id FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY approx DESC, neighbor_id) AS rn FROM s1)
              WHERE rn <= 20),
    ex AS (SELECT s.query_id, s.neighbor_id,
                  list_dot_product(qs.qu, cs.cu) AS cos_sim
           FROM short s
           JOIN qs ON qs.query_id = s.query_id
           JOIN cs ON cs.neighbor_id = s.neighbor_id)
    SELECT query_id, neighbor_id, cos_sim, CAST(rnk AS INT) AS rank FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cos_sim DESC, neighbor_id) AS rnk FROM ex)
    WHERE rnk <= 5
    """,
)
def ann_sq8_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantized two-stage ANN
    (operators/similarity.py::sq8_rerank_topk): unit-normalize, int8
    symmetric-absmax quantize (4x smaller index), shortlist by the
    EXACT integer code dot rescaled by the two step sizes — order-free
    and engine-portable by construction — then exact-dot rerank of the
    20 survivors per query.  The int8 sibling of ann_pq_rerank_topk;
    every stage replays in SQL."""
    from ..operators.similarity import sq8_rerank_topk

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    return sq8_rerank_topk(e, q, k=5, shortlist=20)


_MMR_IVF_CANDS = """
    cent AS (SELECT vec_id AS centroid_id, v AS cv FROM c
             WHERE vec_id % 50 = 0),
    assign AS (
        SELECT vec_id, centroid_id FROM (
            SELECT c.vec_id, cent.centroid_id,
                   row_number() OVER (PARTITION BY c.vec_id
                       ORDER BY list_cosine_similarity(c.v, cent.cv) DESC,
                                cent.centroid_id) AS rn
            FROM c, cent)
        WHERE rn = 1),
    probes AS (
        SELECT query_id, centroid_id FROM (
            SELECT q.query_id, cent.centroid_id,
                   row_number() OVER (PARTITION BY q.query_id
                       ORDER BY list_cosine_similarity(q.qv, cent.cv) DESC,
                                cent.centroid_id) AS rn
            FROM q, cent)
        WHERE rn <= 3),
    candpool AS (
        SELECT p.query_id, a.vec_id AS cand_id
        FROM probes p
        JOIN assign a USING (centroid_id)
        WHERE a.vec_id <> p.query_id),
    relscored AS (
        SELECT cp.query_id, cp.cand_id,
               list_cosine_similarity(qc.v, nc.v) AS rel
        FROM candpool cp
        JOIN c qc ON qc.vec_id = cp.query_id
        JOIN c nc ON nc.vec_id = cp.cand_id),
    cands AS (SELECT query_id, cand_id, rel FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY rel DESC, cand_id) AS rn FROM relscored)
              WHERE rn <= 20)"""


@register(
    "pipeline_mmr_rerank_ivf",
    oracle=_mmr_oracle(candidate_ctes=_MMR_IVF_CANDS),
)
def pipeline_mmr_rerank_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-scale MMR serving path: candidates come from the IVF
    probe (operators/similarity.py::ivf_topk — nprobe/num_centroids of
    the corpus scanned instead of all of it; measured 1.6x per 10x
    corpus vs the brute-force leg's 5x) injected via mmr_rerank's
    candidates= seam; the greedy diversity selection is identical.
    IVF assignment, probe, shortlist, AND every selection step replay
    in one oracle (the assignment/probe CTEs are the proven
    ann_ivf_filtered_topk block)."""
    from ..operators.similarity import ivf_topk, mmr_rerank

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    cands = ivf_topk(e, q, k=20, every_nth=50, nprobe=3)
    return mmr_rerank(e, q, k_final=5, shortlist=20, candidates=cands)


# -- graduated from queries_round9 (driver-green in CORRECTNESS_r09) ------

# -- per-label centroid drift between embedding snapshots ---------------------
def _centroid_drift_oracle(dim: int = 64) -> str:
    """Mirror centroid_drift's fixed left-to-right double association
    term-for-term (the diversity_report oracle pattern): per-dim
    DECIMAL(38,12) sums per split, then chained double arithmetic."""
    def _sums(tag: str, parity: int) -> str:
        cols = ",\n               ".join(
            f"SUM(CAST(v[{d + 1}] AS DECIMAL(38,12))) AS s{tag}_{d}"
            for d in range(dim)
        )
        return (
            f"SELECT label, count(*) AS n_{tag},\n               {cols}\n"
            f"        FROM x WHERE vec_id % 2 = {parity} GROUP BY 1"
        )

    ca = [f"(CAST(sa_{d} AS DOUBLE) / na)" for d in range(dim)]
    cb = [f"(CAST(sb_{d} AS DOUBLE) / nb)" for d in range(dim)]
    def _chain(terms: list[str]) -> str:
        out = terms[0]
        for t in terms[1:]:
            out = f"({out} + {t})"
        return out

    dot = _chain([f"({a} * {b})" for a, b in zip(ca, cb)])
    norm_a = _chain([f"({a} * {a})" for a in ca])
    norm_b = _chain([f"({b} * {b})" for b in cb])
    shift = _chain([f"(({a} - {b}) * ({a} - {b}))" for a, b in zip(ca, cb)])
    return f"""
    WITH x AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
               FROM embeddings),
    a AS ({_sums("a", 0)}),
    b AS ({_sums("b", 1)}),
    j AS (SELECT COALESCE(a.label, b.label) AS label,
                 CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb, *
          FROM a FULL JOIN b ON a.label = b.label)
    SELECT label,
           CAST(COALESCE(n_a, 0) AS BIGINT) AS n_a,
           CAST(COALESCE(n_b, 0) AS BIGINT) AS n_b,
           {dot} / (sqrt({norm_a}) * sqrt({norm_b})) AS centroid_cos,
           {shift} AS shift_sq
    FROM j
    """


@register("embedding_centroid_drift", oracle=_centroid_drift_oracle())
def embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid drift between two snapshot halves (vec_id
    parity split — operators/similarity.py::centroid_drift): centroid
    cosine + squared L2 shift per label, the embedding-space rotation /
    class-meaning-moved monitor.  One aggregation pass per snapshot
    (label-cardinality output, 2 x dim DECIMAL state), label-keyed join
    of tiny frames; every double combination is one fixed association
    the oracle mirrors term-for-term.  (r11 note: a tagged one-scan
    variant with conditional per-side sums measured consistently SLOWER
    in interleaved A/B — 3.3-3.6s vs 2.8-3.3s — because it doubles the
    per-row aggregate-expression count while the scan it saves is
    cheap; the two-scan form stays.)"""
    from ..operators.similarity import centroid_drift

    e = load_table(spark, sf_dir, "embeddings")
    return centroid_drift(
        e.filter(F.col("vec_id") % 2 == 0),
        e.filter(F.col("vec_id") % 2 == 1),
    )
