"""Round-8 additions.  Registered immediately after the reference suite
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


# -- per-segment PSI drift (grouped feature-drift monitor) --------------------
@register(
    "dq_distribution_drift_by_group",
    oracle="""
    WITH ref AS (SELECT o_orderpriority AS g, o_totalprice AS v
                 FROM orders WHERE o_orderkey % 2 = 0),
    cur AS (SELECT o_orderpriority AS g, o_totalprice AS v
            FROM orders WHERE o_orderkey % 2 = 1),
    cuts AS (SELECT g, quantile_cont(v, [0.1, 0.2, 0.3, 0.4, 0.5,
                                        0.6, 0.7, 0.8, 0.9]) AS c
             FROM ref GROUP BY 1),
    rb AS (SELECT r.g, CASE WHEN r.v IS NULL THEN -1
                  ELSE CAST(len(list_filter(cuts.c, x -> r.v > x)) AS INT)
                  END AS bin
           FROM ref r JOIN cuts ON cuts.g = r.g),
    cb AS (SELECT r.g, CASE WHEN r.v IS NULL THEN -1
                  ELSE CAST(len(list_filter(cuts.c, x -> r.v > x)) AS INT)
                  END AS bin
           FROM cur r JOIN cuts ON cuts.g = r.g),
    rc AS (SELECT g, bin, count(*) AS n FROM rb GROUP BY 1, 2),
    cc AS (SELECT g, bin, count(*) AS n FROM cb GROUP BY 1, 2),
    tr AS (SELECT g, count(*) AS t FROM ref GROUP BY 1),
    tc AS (SELECT g, count(*) AS t FROM cur GROUP BY 1),
    spine AS (SELECT g, CAST(range AS INT) AS bin
              FROM (SELECT DISTINCT g FROM cuts) CROSS JOIN range(-1, 10)),
    j AS (SELECT s.g, s.bin,
                 COALESCE(rc.n, 0) AS n_ref,
                 COALESCE(cc.n, 0) AS n_cur,
                 COALESCE(tr.t, 0) AS t_ref,
                 COALESCE(tc.t, 0) AS t_cur
          FROM spine s
          LEFT JOIN rc ON rc.g = s.g AND rc.bin = s.bin
          LEFT JOIN cc ON cc.g = s.g AND cc.bin = s.bin
          LEFT JOIN tr ON tr.g = s.g
          LEFT JOIN tc ON tc.g = s.g)
    SELECT j.g AS o_orderpriority, j.bin,
           CAST(j.n_ref AS BIGINT) AS n_ref,
           CAST(j.n_cur AS BIGINT) AS n_cur,
           (CAST(j.n_ref AS DOUBLE) + 1.0)
               / (CAST(j.t_ref AS DOUBLE) + 11.0) AS p_ref,
           (CAST(j.n_cur AS DOUBLE) + 1.0)
               / (CAST(j.t_cur AS DOUBLE) + 11.0) AS p_cur,
           ((CAST(j.n_cur AS DOUBLE) + 1.0) / (CAST(j.t_cur AS DOUBLE) + 11.0)
            - (CAST(j.n_ref AS DOUBLE) + 1.0) / (CAST(j.t_ref AS DOUBLE) + 11.0))
           * ln(((CAST(j.n_cur AS DOUBLE) + 1.0)
                 / (CAST(j.t_cur AS DOUBLE) + 11.0))
                / ((CAST(j.n_ref AS DOUBLE) + 1.0)
                   / (CAST(j.t_ref AS DOUBLE) + 11.0))) AS psi_term
    FROM j
    """,
)
def dq_distribution_drift_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment PSI (operators/profile.py::distribution_drift_by_group):
    reference-decile bin edges computed PER o_orderpriority segment (one
    grouped percentile aggregate — a broadcastable groups x 9 table),
    map-side binning after the broadcast join, NULLs in the dedicated
    -1 bin, add-one smoothing over 11 bins.  sum(psi_term) per segment
    is that segment's PSI — catches drift confined to one source that
    the global monitor dilutes below threshold."""
    from ..operators.profile import distribution_drift_by_group

    o = load_table(spark, sf_dir, "orders")
    ref = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderpriority", F.col("o_totalprice").alias("v")
    )
    cur = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderpriority", F.col("o_totalprice").alias("v")
    )
    return distribution_drift_by_group(
        ref, cur, "v", "o_orderpriority", num_bins=10
    )


# -- per-source PII exposure report ------------------------------------------
def _pii_density_oracle() -> str:
    from ..operators.text import PII_PATTERNS

    cols = ",\n               ".join(
        f"len(regexp_extract_all(text, '{pat}')) AS c{i}"
        for i, (pat, _) in enumerate(PII_PATTERNS)
    )
    return f"""
    WITH s AS (SELECT source, length(text) AS l,
               {cols}
               FROM documents),
    g AS (SELECT source,
                 CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(SUM(CAST(l AS DECIMAL(38,0))) AS BIGINT) AS n_chars,
                 CAST(SUM(CAST(c0 AS DECIMAL(38,0))) AS BIGINT) AS n_emails,
                 CAST(SUM(CAST(c1 AS DECIMAL(38,0))) AS BIGINT) AS n_phones,
                 CAST(SUM(CAST(c2 AS DECIMAL(38,0))) AS BIGINT) AS n_ips
          FROM s GROUP BY 1)
    SELECT source, n_docs, n_chars, n_emails, n_phones, n_ips,
           CASE WHEN n_chars > 0 THEN
             CAST(n_emails + n_phones + n_ips AS DOUBLE) * 1000.0
               / CAST(n_chars AS DOUBLE)
           END AS pii_per_kchar
    FROM g
    """


@register("dq_pii_density", oracle=_pii_density_oracle())
def dq_pii_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII exposure (operators/text.py::pii_density): email /
    phone / IP matches per thousand characters per upstream feed — the
    quarantine-the-source dashboard upstream of redact_pii's per-doc
    scrub.  One aggregation scan, regexp_count with the same
    cross-engine-safe patterns redact_pii's green oracle pins."""
    from ..operators.text import pii_density

    d = load_table(spark, sf_dir, "documents")
    return pii_density(d)


# -- sliding-window distinct from mergeable daily HLL sketches ----------------
def _hll_sliding_oracle(p: int = 8, window_days: int = 7) -> str:
    m = 1 << p
    width = 60 - p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    amm = alpha * float(m) * float(m)
    h = "CAST(('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,15)) AS BIGINT)"
    return f"""
    WITH hashed AS (
        SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
               {h} AS h
        FROM events WHERE user_id IS NOT NULL),
    rho AS (
        SELECT d, h >> {width} AS b,
               CASE WHEN (h & {(1 << width) - 1}) = 0 THEN {width + 1}
                    ELSE {width} - length(bin(h & {(1 << width) - 1})) + 1
               END AS rho
        FROM hashed),
    day_regs AS (
        SELECT d, b, CAST(max(rho) AS INT) AS reg FROM rho GROUP BY 1, 2),
    contrib AS (
        SELECT d + i.i AS window_end, b, reg
        FROM day_regs CROSS JOIN (
            SELECT CAST(range AS INT) AS i FROM range({window_days})) i),
    merged AS (
        SELECT window_end, b, max(reg) AS reg
        FROM contrib
        WHERE window_end IN (SELECT DISTINCT d FROM day_regs)
        GROUP BY 1, 2),
    g AS (
        SELECT window_end, max(reg) AS r, count(*) AS ne, list(reg) AS regs
        FROM merged GROUP BY 1),
    est AS (
        SELECT window_end, r, ne,
               CAST(list_sum(list_transform(regs,
                        x -> (CAST(1 AS BIGINT) << (r - x))))
                    + ({m} - ne) * (CAST(1 AS BIGINT) << r) AS BIGINT)
                   AS scaled
        FROM g),
    raw AS (
        SELECT window_end, r, ne,
               {amm!r} * pow(2.0, CAST(r AS DOUBLE))
                   / CAST(scaled AS DOUBLE) AS e
        FROM est)
    SELECT window_end,
           CASE WHEN e <= {2.5 * m!r} AND ({m} - ne) > 0
                THEN {float(m)!r} * ln({float(m)!r}
                         / CAST({m} - ne AS DOUBLE))
                ELSE e END AS distinct_est
    FROM raw
    """


@register("sketch_hll_sliding", oracle=_hll_sliding_oracle())
def sketch_hll_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per day from MERGEABLE daily HLL
    register tables (operators/sketches.py::hll_sliding_distinct): the
    fact table is scanned once, each day's m registers fan forward into
    the windows they serve (map-only explode of sketch rows, never
    events), max-merge per window, shared published estimator — the
    continuous "weekly active users" metric from days x m rows of
    state.  Portable md5-60 kernel: registers, fan-out, merge, and
    estimator all replay in SQL."""
    from ..operators.sketches import hll_sliding_distinct

    e = load_table(spark, sf_dir, "events")
    return hll_sliding_distinct(e, "user_id", ts_col="ts", window_days=7)


# -- cross-source quantile normalization (score calibration) ------------------
def _quantile_normalize_oracle(grid_points: int = 100) -> str:
    fracs = ", ".join(
        repr(i / grid_points) for i in range(grid_points + 1)
    )
    gp = float(grid_points)
    return f"""
    WITH grid AS (
        SELECT quantile_cont(CAST(n_chars AS DOUBLE), [{fracs}]) AS g
        FROM documents),
    st AS (
        SELECT doc_id, source, CAST(n_chars AS DOUBLE) AS value,
               percent_rank() OVER (
                   PARTITION BY source
                   ORDER BY CAST(n_chars AS DOUBLE), doc_id) AS pct
        FROM documents)
    SELECT doc_id, source, value, pct,
           CASE WHEN pct >= 1.0 THEN g[{grid_points + 1}]
                ELSE g[CAST(floor(pct * {gp!r}) AS INT) + 1]
                     + (g[CAST(floor(pct * {gp!r}) AS INT) + 2]
                        - g[CAST(floor(pct * {gp!r}) AS INT) + 1])
                       * (pct * {gp!r} - floor(pct * {gp!r}))
           END AS normalized
    FROM st CROSS JOIN grid
    """


@register("corpus_quantile_normalize", oracle=_quantile_normalize_oracle())
def corpus_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source score calibration
    (operators/corpus.py::quantile_normalize): each doc's n_chars maps
    to its within-source percentile (grouped window, deterministic
    (value, id) tie-break) and then onto the GLOBAL length distribution
    by linear interpolation over a broadcast 101-knot exact-quantile
    grid — after which one corpus-wide cut treats every feed fairly.
    percentile == quantile_cont bit-for-bit and the interpolation keeps
    one fixed association, so the full mapping replays in SQL."""
    from ..operators.corpus import quantile_normalize

    d = load_table(spark, sf_dir, "documents")
    return quantile_normalize(d, "n_chars", "source")


# -- AMS second-moment sketch: self-join size without grouping ----------------
def _ams_f2_oracle(num_estimators: int = 16) -> str:
    h = "CAST(('0x'||substr(md5('{i}:'||CAST(user_id AS VARCHAR)),1,15)) AS BIGINT)"
    sums = ",\n           ".join(
        f"SUM(1 - 2 * ({h.format(i=i)} % 2)) AS s_{i}"
        for i in range(num_estimators)
    )
    arr = ", ".join(
        f"CAST(s_{i} * s_{i} AS DOUBLE)" for i in range(num_estimators)
    )
    mid = num_estimators // 2
    return f"""
    WITH d AS (SELECT user_id FROM events WHERE user_id IS NOT NULL),
    s AS (SELECT
           {sums}
          FROM d),
    e AS (SELECT list_sort([{arr}]) AS a FROM s),
    x AS (SELECT CAST(SUM(CAST(f * f AS DECIMAL(38,0))) AS BIGINT) AS f2_exact
          FROM (SELECT count(*) AS f FROM d GROUP BY user_id)),
    m AS (SELECT (a[{mid}] + a[{mid + 1}]) / 2.0 AS f2_est FROM e)
    SELECT m.f2_est, x.f2_exact,
           (m.f2_est - CAST(x.f2_exact AS DOUBLE))
               / CAST(x.f2_exact AS DOUBLE) AS rel_error
    FROM m CROSS JOIN x
    """


@register("sketch_ams_f2", oracle=_ams_f2_oracle())
def sketch_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS second-moment sketch (operators/sketches.py::ams_f2_estimate):
    the self-join size of events on user_id from 16 +-1 sign sums — the
    join-size statistic a planner wants, in one map-side-combined pass
    with a 16-long state, no key groupBy.  Exact F2 rides along as the
    accuracy report.  Seeded portable md5-60 signs make sketch, median,
    and exact all SQL-replayable."""
    from ..operators.sketches import ams_f2_estimate

    e = load_table(spark, sf_dir, "events")
    return ams_f2_estimate(e, "user_id")
