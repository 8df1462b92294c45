"""Round-7 additions.  Registered immediately after the reference suite
so the driver's natural-order first-50 correctness sample covers each
new query in the round it is written (see plans/__init__.py).  Queries
graduate to their topical home module once their driver row lands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register

__all__: list[str] = []


# -- JDBC write->read-back round-trip against a live embedded Derby ----------
# The north star is "Spark reads Hadoop / writes Vertica via JDBC"
# (BASELINE.json); the read half is live-tested against Derby
# (tests/test_jdbc_live.py) but the driver never exercised the SINK half.
# This query runs the full sink+source cycle in-process: write a customer
# slice through write_jdbc (real CREATE TABLE + batched INSERTs through
# the embedded Derby driver), read it back with a predicate-sliced
# parallel read (4 MOD residue classes, evaluated server-side), and
# reduce to a summary the oracle predicts straight from the parquet —
# count, exact key sum, DECIMAL balance sum.  Any loss, duplication, or
# value corruption in either JDBC direction breaks the value hash.
@register(
    "jdbc_write_roundtrip",
    oracle="""
    SELECT count(*) AS n_rows,
           CAST(sum(c_custkey) AS BIGINT) AS key_sum,
           CAST(sum(CAST(c_acctbal AS DECIMAL(30,2))) AS DECIMAL(38,2))
               AS bal_sum,
           CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_keys
    FROM customer WHERE c_custkey % 3 = 0
    """,
)
def jdbc_write_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vertica-sink rehearsal (sources/jdbc.py::write_jdbc, cited to the
    reference's numLoaders throttle): write -> read-back -> summarize
    through a genuine JDBC endpoint (Spark's bundled embedded Derby —
    real driver, real batched inserts, real server-side MOD pushdown).
    The summary is computed from the READ-BACK frame only, so the oracle
    (which reads the parquet source) certifies the round-trip lossless."""
    import tempfile

    from ..sources.jdbc import (
        JdbcSource,
        mod_predicates,
        read_partitioned,
        write_jdbc,
    )

    db_dir = tempfile.mkdtemp(prefix="jdbc_rt_") + "/db"
    src = JdbcSource(
        url=f"jdbc:derby:{db_dir};create=true",
        table="customer_rt",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    )
    df = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 3 == 0)
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    )
    write_jdbc(df, src, mode="overwrite", num_partitions=2)
    # Derby folds unquoted identifiers to uppercase; Spark's JDBC writer
    # creates case-exact quoted columns — quote the key in the predicate
    back = read_partitioned(
        spark, src, predicates=mod_predicates('"c_custkey"', 4)
    )
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("c_custkey").cast("bigint").alias("key_sum"),
        F.sum(F.col("c_acctbal").cast("decimal(30,2)"))
        .cast("decimal(38,2)")
        .alias("bal_sum"),
        F.countDistinct("c_custkey").cast("bigint").alias("n_keys"),
    )


# -- one-pass pairwise correlation profile (oracle-exact) --------------------
def _corr_matrix_oracle(table: str, cols: list[str]) -> str:
    """Mirror of profile.correlation_matrix: DECIMAL(38,6) moment sums,
    double closed-form arithmetic with identical association."""
    aggs = ["count(*) AS n"]
    for c in cols:
        aggs.append(f"SUM(CAST({c} AS DECIMAL(38,6))) AS s_{c}")
        aggs.append(f"SUM(CAST({c}*{c} AS DECIMAL(38,6))) AS ss_{c}")
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            aggs.append(f"SUM(CAST({a}*{b} AS DECIMAL(38,6))) AS sp_{a}_{b}")
    sel = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            nd = "CAST(n AS DOUBLE)"
            sx, sy = f"CAST(s_{a} AS DOUBLE)", f"CAST(s_{b} AS DOUBLE)"
            dx = f"({nd}*CAST(ss_{a} AS DOUBLE) - {sx}*{sx})"
            dy = f"({nd}*CAST(ss_{b} AS DOUBLE) - {sy}*{sy})"
            num = f"({nd}*CAST(sp_{a}_{b} AS DOUBLE) - {sx}*{sy})"
            sel.append(
                f"SELECT '{a}' AS col_x, '{b}' AS col_y,"
                f" CAST(n AS BIGINT) AS n,"
                f" CASE WHEN {dx} <> 0.0 AND {dy} <> 0.0"
                f" THEN {num}/sqrt({dx}*{dy}) END AS corr FROM m"
            )
        u = "\n    UNION ALL ".join(sel)
    return f"WITH m AS (SELECT {', '.join(aggs)} FROM {table})\n    {u}"


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@register(
    "profile_correlation_matrix",
    oracle=_corr_matrix_oracle("lineitem", _CORR_COLS),
)
def profile_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations of the lineitem measures in ONE
    aggregation pass (operators/profile.py::correlation_matrix): all
    moments accumulate map-side into a single 1-row state, the pair
    expansion is a literal explode — no joins, no second scan.  The
    drift/feature-selection profiling step at 100 TB costs one scan."""
    from ..operators.profile import correlation_matrix

    li = load_table(spark, sf_dir, "lineitem")
    return correlation_matrix(li, _CORR_COLS)


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


# -- Zipf power-law fit of the token distribution (oracle-exact) -------------
@register(
    "corpus_zipf_fit",
    oracle=r"""
    WITH toks AS (
        SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        FROM documents),
    top AS (SELECT term, CAST(count(*) AS BIGINT) AS freq
            FROM toks GROUP BY 1 ORDER BY freq DESC, term LIMIT 200),
    xy AS (SELECT
               ln(CAST(row_number() OVER (ORDER BY freq DESC, term)
                       AS DOUBLE)) AS x,
               ln(CAST(freq AS DOUBLE)) AS y
           FROM top),
    m AS (SELECT count(*) AS n,
                 SUM(CAST(x AS DECIMAL(38,15))) AS sx,
                 SUM(CAST(y AS DECIMAL(38,15))) AS sy,
                 SUM(CAST(x*x AS DECIMAL(38,15))) AS sxx,
                 SUM(CAST(y*y AS DECIMAL(38,15))) AS syy,
                 SUM(CAST(x*y AS DECIMAL(38,15))) AS sxy
          FROM xy)
    SELECT CAST(n AS BIGINT) AS n_terms,
           CASE WHEN (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) <> 0.0
                THEN (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
           END AS slope,
           CASE WHEN (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) <> 0.0
                THEN (CAST(sy AS DOUBLE)
                      - ((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
                          - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
                         / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)))
                        * CAST(sx AS DOUBLE))
                     / CAST(n AS DOUBLE)
           END AS intercept,
           CASE WHEN (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) <> 0.0
                 AND (CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)
                      - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)) <> 0.0
                THEN (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
                     / sqrt((CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
                            * (CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)
                               - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)))
           END AS pearson_r
    FROM m
    """,
)
def corpus_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf power-law fit (operators/text.py::zipf_fit): OLS of
    ln(freq) on ln(rank) over the top-200 tokens — slope near -1 is
    the natural-language signature; deviations flag templated or
    machine-generated corpora.  Mergeable top-N + bounded rank window
    + one-pass DECIMAL closed-form OLS."""
    from ..operators.text import zipf_fit

    d = load_table(spark, sf_dir, "documents")
    return zipf_fit(d, top_n=200)


# -- content-defined chunk dedup (oracle-exact) ------------------------------
@register(
    "corpus_cdc_chunk_dedup",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, i.u AS pos, ts[i.u + 1] AS tok
        FROM (SELECT doc_id,
                     string_split_regex(lower(trim(text)), '\s+') AS ts
              FROM documents) d,
             unnest(generate_series(0, len(ts) - 1)) AS i(u)),
    flagged AS (
        SELECT doc_id, pos, tok,
               CASE WHEN CAST(('0x'||substr(md5(tok),1,15)) AS BIGINT)
                         % 16 = 0 THEN 1 ELSE 0 END AS b
        FROM toks),
    staged AS (
        SELECT doc_id, pos, tok,
               COALESCE(SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS chunk_id
        FROM flagged),
    chunks AS (
        SELECT doc_id, chunk_id,
               string_agg(tok, ' ' ORDER BY pos) AS chunk_text,
               CAST(count(*) AS BIGINT) AS n_tokens
        FROM staged GROUP BY 1, 2),
    hashed AS (
        SELECT doc_id,
               CAST(('0x'||substr(md5(chunk_text),1,15)) AS BIGINT)
                   AS chunk_hash,
               n_tokens
        FROM chunks)
    SELECT chunk_hash,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(min(n_tokens) AS BIGINT) AS n_tokens
    FROM hashed GROUP BY 1
    HAVING count(DISTINCT doc_id) >= 2
    ORDER BY n_docs DESC, n_occurrences DESC, chunk_hash
    LIMIT 50
    """,
)
def corpus_cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking + cross-doc duplicate-chunk report
    (operators/corpus.py::cdc_chunk_dedup): boundaries fall after
    tokens whose portable hash lands in a fixed residue class, so an
    INSERTION shifts boundaries only until the next boundary token and
    shared runs between near-copies chunk identically — the
    shift-robust complement to fixed-width chunking and whole-doc
    minhash.  Entire pipeline (tokenize, flag, running boundary count,
    chunk assembly, hash, repeat report) replayed by the oracle."""
    from ..operators.corpus import cdc_chunk_dedup

    d = load_table(spark, sf_dir, "documents")
    return cdc_chunk_dedup(d)


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


# -- RAG chunk-retrieval capstone (oracle-exact end to end) -------------------
@register(
    "pipeline_rag_retrieval_portable",
    oracle=r"""
    WITH d AS (SELECT doc_id,
                      string_split_regex(lower(trim(text)), '\s+') AS toks
               FROM documents),
    c AS (SELECT doc_id, toks,
                 CASE WHEN len(toks) <= 64 THEN 1
                      ELSE (len(toks) - 64 + 47) // 48 + 1 END AS n_chunks
          FROM d),
    x AS (SELECT doc_id, toks,
                 unnest(generate_series(0, n_chunks - 1)) AS chunk_idx
          FROM c),
    chunks AS (
        SELECT doc_id * 10000 + chunk_idx AS chunk_id,
               array_to_string(
                   list_slice(toks, chunk_idx * 48 + 1, chunk_idx * 48 + 64),
                   ' ') AS text
        FROM x WHERE doc_id <> 7),
    ctok AS (SELECT chunk_id,
                    unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
             FROM chunks),
    ch AS (SELECT chunk_id,
                  CAST(('0x'||substr(md5(t),1,15)) AS BIGINT) AS h
           FROM ctok),
    cs AS (SELECT chunk_id, CAST(h % 1024 AS INT) AS fi,
                  CASE WHEN ((h >> 10) & 1) = 0 THEN 1 ELSE -1 END AS s
           FROM ch),
    cf AS (SELECT chunk_id, fi, CAST(SUM(s) AS BIGINT) AS v
           FROM cs GROUP BY 1, 2 HAVING SUM(s) <> 0),
    qtok AS (SELECT doc_id AS query_id,
                    unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
             FROM documents WHERE doc_id = 7),
    qh AS (SELECT query_id,
                  CAST(('0x'||substr(md5(t),1,15)) AS BIGINT) AS h
           FROM qtok),
    qs AS (SELECT query_id, CAST(h % 1024 AS INT) AS fi,
                  CASE WHEN ((h >> 10) & 1) = 0 THEN 1 ELSE -1 END AS s
           FROM qh),
    qf AS (SELECT query_id, fi, CAST(SUM(s) AS BIGINT) AS v
           FROM qs GROUP BY 1, 2 HAVING SUM(s) <> 0),
    cn AS (SELECT chunk_id, CAST(SUM(v*v) AS BIGINT) AS cn2
           FROM cf GROUP BY 1),
    qn AS (SELECT query_id, CAST(SUM(v*v) AS BIGINT) AS qn2
           FROM qf GROUP BY 1),
    dots AS (SELECT q.query_id, c.chunk_id,
                    CAST(SUM(c.v * q.v) AS BIGINT) AS dot
             FROM cf c JOIN qf q ON q.fi = c.fi
             GROUP BY 1, 2),
    scored AS (
        SELECT d.query_id, d.chunk_id,
               CAST(d.dot AS DOUBLE)
                   / (sqrt(CAST(cn.cn2 AS DOUBLE))
                      * sqrt(CAST(qn.qn2 AS DOUBLE))) AS cos_sim
        FROM dots d
        JOIN cn ON cn.chunk_id = d.chunk_id
        JOIN qn ON qn.query_id = d.query_id),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY cos_sim DESC, chunk_id) AS rnk
        FROM scored)
    SELECT query_id, chunk_id, cos_sim, CAST(rnk AS INT) AS rank
    FROM ranked WHERE rnk <= 10
    """,
)
def pipeline_rag_retrieval_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG corpus-construction capstone: overlapping context chunks
    (corpus.chunk_documents, 64/16) -> signed hashing-trick vectors
    (text.feature_hashing, vocabulary-free) -> inverted-bucket cosine
    retrieval of the top-10 chunks for a query document
    (text.sparse_retrieval_topk).  Chunks join the query only where
    they share a feature bucket (posting-list intersection, an
    EQUI-join on the bucket id) — never an all-pairs scan — and every
    number is integer-exact until the final cosine division, so the
    ENTIRE chunk->featurize->retrieve pipeline replays in one oracle."""
    from ..operators.corpus import chunk_documents
    from ..operators.text import sparse_retrieval_topk

    d = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(d, chunk_size=64, overlap=16).filter(
        F.col("doc_id") != 7
    ).select(
        (F.col("doc_id") * 10000 + F.col("chunk_idx")).alias("chunk_id"),
        F.col("chunk_text").alias("text"),
    )
    query = d.filter(F.col("doc_id") == 7).select("doc_id", "text")
    return sparse_retrieval_topk(
        chunks, query, k=10, id_col="chunk_id", query_id_col="doc_id"
    )


# -- source-pair overlap matrix from grouped KMV sketches (oracle-exact) -----
@register(
    "corpus_source_overlap",
    oracle=r"""
    WITH toks AS (
        SELECT source AS src,
               string_split_regex(lower(trim(text)), '\s+') AS t
        FROM documents),
    shl AS (
        SELECT src, unnest(list_distinct(list_transform(
                   generate_series(1, greatest(len(t)-2, 1)),
                   i -> array_to_string(t[i:i+2], ' ')))) AS s
        FROM toks),
    hs AS (SELECT DISTINCT src,
                  CAST(('0x'||substr(md5(s),1,15)) AS BIGINT) AS h
           FROM shl),
    sk AS (SELECT src, h FROM (
               SELECT src, h,
                      row_number() OVER (PARTITION BY src ORDER BY h) AS rn
               FROM hs)
           WHERE rn <= 64),
    per_src AS (SELECT src, count(*) AS m, max(h) AS mx
                FROM sk GROUP BY 1),
    ests AS (SELECT src,
                    CASE WHEN m < 64 THEN CAST(m AS DOUBLE)
                         ELSE 63.0 / ((CAST(mx AS DOUBLE) + 1.0)
                                      / 1152921504606846976.0)
                    END AS est
             FROM per_src),
    pairs AS (SELECT a.src AS source_a, b.src AS source_b
              FROM (SELECT DISTINCT src FROM sk) a,
                   (SELECT DISTINCT src FROM sk) b
              WHERE a.src < b.src),
    contrib AS (
        SELECT p.source_a, p.source_b, s.h, 1 AS a, 0 AS b
        FROM sk s JOIN pairs p ON s.src = p.source_a
        UNION ALL
        SELECT p.source_a, p.source_b, s.h, 0 AS a, 1 AS b
        FROM sk s JOIN pairs p ON s.src = p.source_b),
    merged AS (SELECT source_a, source_b, h,
                      max(a) AS a, max(b) AS b
               FROM contrib GROUP BY 1, 2, 3),
    us AS (SELECT * FROM (
               SELECT *, row_number() OVER (PARTITION BY source_a, source_b
                             ORDER BY h) AS rn
               FROM merged)
           WHERE rn <= 64),
    agg AS (SELECT source_a, source_b, count(*) AS m, max(h) AS mx,
                   CAST(sum(a*b) AS BIGINT) AS nboth
            FROM us GROUP BY 1, 2)
    SELECT g.source_a, g.source_b, e1.est AS est_a, e2.est AS est_b,
           CASE WHEN g.m < 64 THEN CAST(g.m AS DOUBLE)
                ELSE 63.0 / ((CAST(g.mx AS DOUBLE) + 1.0)
                             / 1152921504606846976.0)
           END AS est_union,
           CAST(g.nboth AS DOUBLE) / CAST(g.m AS DOUBLE) AS jaccard_est,
           (CAST(g.nboth AS DOUBLE) / CAST(g.m AS DOUBLE))
               * (CASE WHEN g.m < 64 THEN CAST(g.m AS DOUBLE)
                       ELSE 63.0 / ((CAST(g.mx AS DOUBLE) + 1.0)
                                    / 1152921504606846976.0)
                  END) AS est_intersection
    FROM agg g
    JOIN ests e1 ON e1.src = g.source_a
    JOIN ests e2 ON e2.src = g.source_b
    """,
)
def corpus_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-overlap matrix from per-source KMV sketches
    (operators/sketches.py::source_overlap_matrix): which feed pairs
    share content, answered from k-hash sketches — sources^2 * k sketch
    rows, never corpus data.  The grouped sketch-algebra sibling of
    sketch_kmv_set_ops; portable md5-60 end to end, the whole grouped
    estimator (per-source bottom-k, pair union sketches, Jaccard and
    intersection estimates) replayed by the oracle."""
    from ..operators.sketches import source_overlap_matrix

    d = load_table(spark, sf_dir, "documents")
    return source_overlap_matrix(d)


# -- per-doc n-gram duplication exposure (oracle-exact) ----------------------
@register(
    "corpus_ngram_novelty",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
        FROM documents),
    grams AS (
        SELECT doc_id,
               CAST(('0x'||substr(md5(g),1,15)) AS BIGINT) AS h
        FROM (SELECT doc_id, unnest(list_distinct(list_transform(
                  generate_series(1, greatest(len(t)-4, 1)),
                  i -> array_to_string(t[i:i+4], ' ')))) AS g
              FROM toks)),
    dfc AS (SELECT h, CAST(count(DISTINCT doc_id) AS BIGINT) AS nd
            FROM grams GROUP BY 1)
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN d.nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_shared_grams,
           CAST(SUM(CASE WHEN d.nd > 1 THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS shared_frac
    FROM grams g JOIN dfc d ON d.h = g.h
    GROUP BY 1
    """,
)
def corpus_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc duplication-exposure score (operators/corpus.py::
    ngram_novelty): fraction of each doc's distinct 5-grams shared with
    other docs — the memorization-risk / boilerplate profile between
    whole-doc dedup and span dedup.  Gram-keyed count + join back, all
    equi-keyed on 8-byte portable hashes; fully oracle-replayed."""
    from ..operators.corpus import ngram_novelty

    d = load_table(spark, sf_dir, "documents")
    return ngram_novelty(d)


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


# -- cluster-balanced diversity sampling (oracle-exact) -----------------------
@register(
    "corpus_cluster_balanced_sample",
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
    keyed AS (
        SELECT vec_id, centroid_id,
               CAST(('0x'||substr(md5('cbs:'||CAST(vec_id AS VARCHAR)),1,15))
                    AS BIGINT) AS u
        FROM assign),
    ranked AS (
        SELECT vec_id, centroid_id,
               row_number() OVER (PARTITION BY centroid_id
                                  ORDER BY u, vec_id) AS rn,
               count(*) OVER (PARTITION BY centroid_id) AS n
        FROM keyed)
    SELECT centroid_id, vec_id, CAST(rn AS INT) AS sample_rank,
           CAST(n AS BIGINT) AS cluster_size
    FROM ranked WHERE rn <= 10
    """,
)
def corpus_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced diversity sampling (operators/similarity.py::
    cluster_balanced_sample): nearest-centroid assignment + a fixed
    per-cluster quota by deterministic md5 rank — flattens the SEMANTIC
    mixture the way temperature sampling flattens the source mixture,
    so dense topic blobs stop dominating the training set.  Map-only
    assignment, one centroid-keyed exchange shared by rank and size;
    assignment + quota both replayed by the oracle."""
    from ..operators.similarity import cluster_balanced_sample

    e = load_table(spark, sf_dir, "embeddings")
    return cluster_balanced_sample(e, per_cluster=10, every_nth=50)


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


# -- small-file compaction round-trip (oracle-exact) --------------------------
@register(
    "layout_compact_roundtrip",
    oracle="""
    SELECT count(*) AS n_rows,
           CAST(sum(l_orderkey) AS BIGINT) AS key_sum,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))) AS DECIMAL(38,2))
               AS price_sum,
           CAST(64 AS INT) AS files_before,
           CAST(1 AS INT) AS files_after
    FROM lineitem WHERE l_orderkey % 5 = 0
    """,
)
def layout_compact_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction round-trip (sources/maintenance.py::
    compact_path, cited to the reference's per-mapper file fanout,
    sqoop_pyhive.py:30-32): fragment a lineitem slice into 64 tiny
    parquet files (the incremental-ingest pathology), compact the
    directory atomically to ~target-size files, and summarize from the
    READ-BACK frame only — count, exact key sum, DECIMAL price sum, so
    the oracle (reading the parquet source) certifies the rewrite
    lossless.  The observed before/after file counts ride along as plan
    literals: 64 by construction, 1 after (slice ≪ target), so a
    compaction that silently stopped merging breaks the hash too."""
    import tempfile

    from ..sources.maintenance import compact_path

    path = tempfile.mkdtemp(prefix="compact_rt_") + "/t"
    sl = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 5 == 0
    )
    sl.repartition(64).write.parquet(path)
    stats = compact_path(spark, path, target_file_bytes=128 * 1024 * 1024)
    back = spark.read.parquet(path)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_orderkey").cast("bigint").alias("key_sum"),
        F.sum(F.col("l_extendedprice").cast("decimal(30,2)"))
        .cast("decimal(38,2)")
        .alias("price_sum"),
        F.lit(int(stats["files_before"])).cast("int").alias("files_before"),
        F.lit(int(stats["files_after"])).cast("int").alias("files_after"),
    )


# -- offline change-point localization per (type, day) (oracle-exact) --------
@register(
    "events_change_point",
    oracle="""
    WITH e AS (SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP)
                          AS seg_start,
                      CAST(ts AS TIMESTAMP) AS ts, event_id, value
               FROM events WHERE value IS NOT NULL),
    pre AS (
        SELECT event_type, seg_start, ts, event_id,
               row_number() OVER w AS i,
               SUM(CAST(value AS DECIMAL(30,15))) OVER w AS s
        FROM e
        WINDOW w AS (PARTITION BY event_type, seg_start
                     ORDER BY ts, event_id)),
    tot AS (
        SELECT event_type, seg_start, count(*) AS n,
               SUM(CAST(value AS DECIMAL(30,15))) AS t
        FROM e GROUP BY 1, 2),
    scored AS (
        SELECT p.event_type, p.seg_start, tot.n, p.i, p.ts,
               CAST(p.s AS DOUBLE) / CAST(p.i AS DOUBLE) AS mean_before,
               CAST(tot.t - p.s AS DOUBLE)
                   / CAST(tot.n - p.i AS DOUBLE) AS mean_after,
               abs(CAST(p.s AS DOUBLE) / CAST(p.i AS DOUBLE)
                   - CAST(tot.t - p.s AS DOUBLE)
                     / CAST(tot.n - p.i AS DOUBLE))
               * sqrt(CAST(p.i AS DOUBLE) * CAST(tot.n - p.i AS DOUBLE)
                      / CAST(tot.n AS DOUBLE)) AS score
        FROM pre p JOIN tot USING (event_type, seg_start)
        WHERE p.i >= 4 AND p.i <= tot.n - 4),
    picked AS (
        SELECT *, row_number() OVER (PARTITION BY event_type, seg_start
                      ORDER BY score DESC, i) AS rn
        FROM scored)
    SELECT event_type, seg_start, CAST(n AS BIGINT) AS n,
           CAST(i AS INT) AS split_i, ts AS change_ts,
           mean_before, mean_after, score
    FROM picked WHERE rn = 1
    """,
)
def events_change_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-shift change-point localization per (event_type, day)
    (operators/temporal.py::change_point_scan): the single-change-point
    least-squares scan via prefix sums — one cumulative DECIMAL window
    per bounded (type, day) segment scores EVERY split position without
    rescans or self-joins; argmax with earlier-split tie-break.  The
    level-shift monitoring report between the point-anomaly queries and
    the seasonal baseline; fully oracle-replayed."""
    from ..operators.temporal import change_point_scan

    e = load_table(spark, sf_dir, "events")
    return change_point_scan(e, min_segment=4)


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


# -- market-basket affinity rules (oracle-exact) ------------------------------
@register(
    "basket_affinity_rules",
    oracle="""
    WITH e AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    tot AS (SELECT count(DISTINCT o) AS n_orders FROM e),
    singles AS (SELECT p, count(*) AS n_p FROM e GROUP BY 1),
    pairs AS (
        SELECT a.p AS part_a, b.p AS part_b, count(*) AS n_both
        FROM e a JOIN e b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2),
    scored AS (
        SELECT pr.part_a, pr.part_b,
               CAST(pr.n_both AS BIGINT) AS n_both,
               CAST(sa.n_p AS BIGINT) AS n_a,
               CAST(sb.n_p AS BIGINT) AS n_b,
               CAST(pr.n_both AS DOUBLE) / CAST(sa.n_p AS DOUBLE)
                   AS conf_a_to_b,
               (CAST(pr.n_both AS DOUBLE) * CAST(t.n_orders AS DOUBLE))
                   / (CAST(sa.n_p AS DOUBLE) * CAST(sb.n_p AS DOUBLE))
                   AS lift
        FROM pairs pr
        JOIN singles sa ON sa.p = pr.part_a
        JOIN singles sb ON sb.p = pr.part_b
        CROSS JOIN tot t
        WHERE pr.n_both >= 3)
    SELECT * FROM scored
    ORDER BY lift DESC, part_a, part_b LIMIT 20
    """,
)
def basket_affinity_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity mining over co-ordered parts: support,
    confidence, and lift for every part pair with >= 3 co-orders,
    top-20 by lift — the classic association-rule workload (the
    pairwise core of Apriori/FP-growth), re-expressed Spark-first.
    Pair expansion is the bounded groupBy(order)->collect_list->double
    explode combinator (one exchange of the fact rows, arrays bounded
    by items-per-order — the same shape as the pagerank edge build,
    never a corpus self-join); the order total is a 1-row broadcast
    scalar; counts stay integer-exact until the confidence/lift
    divisions, identically associated in the oracle.  Top-k via
    orderBy+limit (TakeOrderedAndProject)."""
    li = load_table(spark, sf_dir, "lineitem")
    e = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    tot = e.agg(F.countDistinct("o").alias("n_orders"))
    singles = e.groupBy("p").agg(F.count(F.lit(1)).alias("n_p"))
    pairs = (
        e.groupBy("o")
        .agg(F.collect_list("p").alias("ps"))
        .select(F.explode("ps").alias("pa"), "ps")
        .select("pa", F.explode("ps").alias("pb"))
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    scored = (
        pairs.join(
            singles.select(F.col("p").alias("pa"), F.col("n_p").alias("n_a")),
            on="pa",
        )
        .join(
            singles.select(F.col("p").alias("pb"), F.col("n_p").alias("n_b")),
            on="pb",
        )
        .crossJoin(F.broadcast(tot))
        .filter(F.col("n_both") >= 3)
        .select(
            F.col("pa").alias("part_a"),
            F.col("pb").alias("part_b"),
            F.col("n_both").cast("bigint").alias("n_both"),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            (F.col("n_both").cast("double") / F.col("n_a").cast("double")).alias(
                "conf_a_to_b"
            ),
            (
                (F.col("n_both").cast("double") * F.col("n_orders").cast("double"))
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.desc("lift"), F.asc("part_a"), F.asc("part_b")
    ).limit(20)


# -- PSI feature-drift monitor (oracle-exact) ---------------------------------
@register(
    "dq_distribution_drift",
    oracle="""
    WITH ref AS (SELECT o_totalprice AS v FROM orders WHERE o_orderkey % 2 = 0),
    cur AS (SELECT o_totalprice AS v FROM orders WHERE o_orderkey % 2 = 1),
    cuts AS (SELECT quantile_cont(v, [0.1, 0.2, 0.3, 0.4, 0.5,
                                      0.6, 0.7, 0.8, 0.9]) AS c
             FROM ref),
    rb AS (SELECT CAST(len(list_filter(cuts.c, x -> r.v > x)) AS INT) AS bin
           FROM ref r CROSS JOIN cuts),
    cb AS (SELECT CAST(len(list_filter(cuts.c, x -> r.v > x)) AS INT) AS bin
           FROM cur r CROSS JOIN cuts),
    rc AS (SELECT bin, count(*) AS n FROM rb GROUP BY 1),
    cc AS (SELECT bin, count(*) AS n FROM cb GROUP BY 1),
    tots AS (SELECT (SELECT count(*) FROM ref) AS tr,
                    (SELECT count(*) FROM cur) AS tc),
    spine AS (SELECT CAST(range AS INT) AS bin FROM range(10)),
    j AS (SELECT s.bin,
                 COALESCE(rc.n, 0) AS n_ref,
                 COALESCE(cc.n, 0) AS n_cur
          FROM spine s
          LEFT JOIN rc ON rc.bin = s.bin
          LEFT JOIN cc ON cc.bin = s.bin)
    SELECT j.bin, CAST(j.n_ref AS BIGINT) AS n_ref,
           CAST(j.n_cur AS BIGINT) AS n_cur,
           (CAST(j.n_ref AS DOUBLE) + 1.0)
               / (CAST(t.tr AS DOUBLE) + 10.0) AS p_ref,
           (CAST(j.n_cur AS DOUBLE) + 1.0)
               / (CAST(t.tc AS DOUBLE) + 10.0) AS p_cur,
           ((CAST(j.n_cur AS DOUBLE) + 1.0) / (CAST(t.tc AS DOUBLE) + 10.0)
            - (CAST(j.n_ref AS DOUBLE) + 1.0) / (CAST(t.tr AS DOUBLE) + 10.0))
           * ln(((CAST(j.n_cur AS DOUBLE) + 1.0)
                 / (CAST(t.tc AS DOUBLE) + 10.0))
                / ((CAST(j.n_ref AS DOUBLE) + 1.0)
                   / (CAST(t.tr AS DOUBLE) + 10.0))) AS psi_term
    FROM j CROSS JOIN tots t
    """,
)
def dq_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two halves of orders
    (operators/profile.py::distribution_drift): reference-decile bin
    edges (Spark percentile == DuckDB quantile_cont bit-for-bit),
    map-side count-of-cuts-below-value binning, add-one-smoothed
    (q-p)*ln(q/p) terms per bin — sum(psi_term) is the PSI the feature-
    drift monitor alarms on.  Two mergeable aggregate passes + 1-row
    broadcast scalars; no global window; fully oracle-replayed."""
    from ..operators.profile import distribution_drift

    o = load_table(spark, sf_dir, "orders")
    ref = o.filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_totalprice").alias("v")
    )
    cur = o.filter(F.col("o_orderkey") % 2 == 1).select(
        F.col("o_totalprice").alias("v")
    )
    return distribution_drift(ref, cur, "v", num_bins=10)


# -- RFM customer segmentation (oracle-exact) ---------------------------------
@register(
    "customer_rfm_segments",
    oracle="""
    WITH base AS (
        SELECT o_custkey,
               epoch_us(max(o_orderdate)) AS r_us,
               CAST(count(*) AS BIGINT) AS freq,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS mon,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS mon_dec
        FROM orders GROUP BY 1),
    cuts AS (
        SELECT quantile_cont(CAST(r_us AS DOUBLE), [0.2, 0.4, 0.6, 0.8]) AS rc,
               quantile_cont(CAST(freq AS DOUBLE), [0.2, 0.4, 0.6, 0.8]) AS fc,
               quantile_cont(mon, [0.2, 0.4, 0.6, 0.8]) AS mc
        FROM base),
    scored AS (
        SELECT b.o_custkey,
               CAST(len(list_filter(c.rc, x -> CAST(b.r_us AS DOUBLE) > x))
                    + 1 AS INT) AS r_score,
               CAST(len(list_filter(c.fc, x -> CAST(b.freq AS DOUBLE) > x))
                    + 1 AS INT) AS f_score,
               CAST(len(list_filter(c.mc, x -> b.mon > x)) + 1 AS INT)
                   AS m_score,
               b.mon_dec
        FROM base b CROSS JOIN cuts c)
    SELECT r_score, f_score, m_score,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(SUM(mon_dec) AS DOUBLE) / CAST(count(*) AS DOUBLE)
               AS avg_monetary
    FROM scored GROUP BY 1, 2, 3
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic warehouse-offload workload: per
    customer recency (last order date), frequency (order count), and
    monetary (DECIMAL revenue sum), each scored 1-5 against its own
    exact quintile cuts, reduced to the <=125-cell segment grid with
    counts and average revenue.  Scoring is the broadcast
    count-of-cuts-below-value primitive (skew_range_rebalance /
    dq_distribution_drift — no ntile global window); recency compares
    exact unix_micros (the NTZ lesson: never second-truncating casts).
    One customer-keyed aggregation, two 1-row scalar broadcasts, all
    sums DECIMAL until the final division; fully oracle-replayed."""
    o = load_table(spark, sf_dir, "orders")
    # o_orderdate arrives TIMESTAMP_NTZ; session tz is UTC so the cast
    # is value-preserving and unix_micros matches DuckDB epoch_us
    base = o.groupBy("o_custkey").agg(
        F.unix_micros(F.max(F.col("o_orderdate").cast("timestamp"))).alias(
            "r_us"
        ),
        F.count(F.lit(1)).cast("bigint").alias("freq"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("mon_dec"),
    ).withColumn("mon", F.col("mon_dec").cast("double"))
    qs = [F.lit(x) for x in (0.2, 0.4, 0.6, 0.8)]
    cuts = base.agg(
        F.percentile(F.col("r_us").cast("double"), F.array(*qs)).alias("rc"),
        F.percentile(F.col("freq").cast("double"), F.array(*qs)).alias("fc"),
        F.percentile(F.col("mon"), F.array(*qs)).alias("mc"),
    )

    def score(arr: str, val) -> F.Column:
        return (
            F.size(F.filter(F.col(arr), lambda x: val > x)) + F.lit(1)
        ).cast("int")

    scored = base.crossJoin(F.broadcast(cuts)).select(
        score("rc", F.col("r_us").cast("double")).alias("r_score"),
        score("fc", F.col("freq").cast("double")).alias("f_score"),
        score("mc", F.col("mon")).alias("m_score"),
        F.col("mon_dec"),
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        (
            F.sum("mon_dec").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("avg_monetary"),
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


# -- trajectory similarity search over user event paths (oracle-exact) -------
def _trajectory_oracle() -> str:
    from .oracle_fragments import minhash_portable_cte

    cte = minhash_portable_cte(
        num_hashes=8, bands=4,
        src=(
            "(SELECT user_id AS doc_id, "
            "string_agg(event_type, ' ' ORDER BY ts, event_id) AS text "
            "FROM events GROUP BY user_id)"
        ),
    )
    return rf"""
    WITH {cte}
    SELECT doc_id_a AS user_id_a, doc_id_b AS user_id_b, jaccard
    FROM ver WHERE jaccard >= 0.4
    ORDER BY jaccard DESC, user_id_a, user_id_b LIMIT 20
    """


@register("events_trajectory_similarity", oracle=_trajectory_oracle())
def events_trajectory_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k trajectory similarity search (the distributed
    trajectory-top-k workload, ICDE'21 REPOSE class, re-expressed
    Spark-first): each user's ordered event-type sequence becomes a
    path string, ORDER-PRESERVING 3-step shingles feed the portable
    MinHash-LSH pipeline (banding prunes the user-pair space exactly
    like document dedup — trajectories ARE documents over a small
    alphabet), and the exact path-shingle Jaccard ranks the top-20
    most-similar journey pairs.  One groupBy builds paths (array_sort
    of (ts, event_id, type) structs — deterministic under ts ties),
    everything downstream reuses operators/dedup.py::
    minhash_dedup_portable verbatim; whole pipeline oracle-replayed,
    top-k via orderBy+limit."""
    from ..operators import dedup as D

    e = load_table(spark, sf_dir, "events")
    traj = e.groupBy("user_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda x: x["event_type"],
            ),
        ).alias("path")
    )
    pairs = D.minhash_dedup_portable(
        traj, text_col="path", id_col="user_id",
        num_hashes=8, bands=4, min_jaccard=0.4, shingle_n=3,
    )
    return (
        pairs.select(
            F.col("doc_id_a").alias("user_id_a"),
            F.col("doc_id_b").alias("user_id_b"),
            "jaccard",
        )
        .orderBy(F.desc("jaccard"), F.asc("user_id_a"), F.asc("user_id_b"))
        .limit(20)
    )


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
