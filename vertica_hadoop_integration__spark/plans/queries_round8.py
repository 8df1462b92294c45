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


# -- k-anonymity / l-diversity privacy audit ----------------------------------
@register(
    "dq_k_anonymity",
    oracle="""
    SELECT c_nationkey, c_mktsegment,
           CAST(floor(c_acctbal / 1000.0) AS INT) AS acctbal_band,
           CAST(count(*) AS BIGINT) AS group_size,
           CAST(count(DISTINCT c_acctbal) AS BIGINT) AS n_distinct_sensitive
    FROM customer
    GROUP BY 1, 2, 3
    HAVING count(*) < 5 OR count(DISTINCT c_acctbal) < 2
    """,
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy-risk audit (operators/profile.py::k_anonymity): every
    (nation, segment, balance-band) quasi-identifier combination that
    fails k-anonymity (< 5 customers share it — re-identifiable by an
    outside join) or l-diversity (< 2 distinct sensitive balances — the
    group leaks its members' value even at size >= k).  ONE mergeable
    hash aggregation keyed by the quasi tuple, then a filter; output is
    bounded by the at-risk group count at any scale."""
    from ..operators.profile import k_anonymity

    c = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / F.lit(1000.0)).cast("int").alias(
            "acctbal_band"
        ),
        "c_acctbal",
    )
    return k_anonymity(
        c,
        ["c_nationkey", "c_mktsegment", "acctbal_band"],
        k=5,
        sensitive_col="c_acctbal",
        l_diversity=2,
    )


# -- binned two-sample KS drift statistic -------------------------------------
def _ks_drift_oracle(num_bins: int = 50) -> str:
    fracs = ", ".join(repr(i / num_bins) for i in range(1, num_bins))
    return f"""
    WITH ref AS (SELECT o_totalprice AS v FROM orders
                 WHERE o_orderdate < TIMESTAMP '1998-01-01'),
    cur AS (SELECT o_totalprice AS v FROM orders
            WHERE o_orderdate >= TIMESTAMP '1998-01-01'),
    cuts AS (SELECT quantile_cont(v, [{fracs}]) AS c FROM ref),
    rb AS (SELECT CAST(len(list_filter(cuts.c, x -> r.v > x)) AS INT) AS bin
           FROM ref r CROSS JOIN cuts WHERE r.v IS NOT NULL),
    cb AS (SELECT CAST(len(list_filter(cuts.c, x -> r.v > x)) AS INT) AS bin
           FROM cur r CROSS JOIN cuts WHERE r.v IS NOT NULL),
    rc AS (SELECT bin, count(*) AS n FROM rb GROUP BY 1),
    cc AS (SELECT bin, count(*) AS n FROM cb GROUP BY 1),
    tots AS (SELECT
        (SELECT count(v) FROM ref) AS tr,
        (SELECT count(*) - count(v) FROM ref) AS nullr,
        (SELECT count(v) FROM cur) AS tc,
        (SELECT count(*) - count(v) FROM cur) AS nullc),
    spine AS (SELECT CAST(range AS INT) AS bin FROM range(0, {num_bins})),
    j AS (SELECT s.bin, COALESCE(rc.n, 0) AS nr, COALESCE(cc.n, 0) AS nc
          FROM spine s
          LEFT JOIN rc ON rc.bin = s.bin
          LEFT JOIN cc ON cc.bin = s.bin),
    cum AS (SELECT bin,
                   SUM(nr) OVER (ORDER BY bin) AS cr,
                   SUM(nc) OVER (ORDER BY bin) AS cc2
            FROM j),
    ks AS (SELECT max(abs(CAST(cr AS DOUBLE) / CAST(t.tr AS DOUBLE)
                          - CAST(cc2 AS DOUBLE) / CAST(t.tc AS DOUBLE)))
               AS ks_stat
           FROM cum CROSS JOIN tots t)
    SELECT CAST(t.tr AS BIGINT) AS n_ref,
           CAST(t.tc AS BIGINT) AS n_cur,
           CAST(t.nullr AS BIGINT) AS n_null_ref,
           CAST(t.nullc AS BIGINT) AS n_null_cur,
           ks.ks_stat,
           1.358 * sqrt((CAST(t.tr AS DOUBLE) + CAST(t.tc AS DOUBLE))
                        / (CAST(t.tr AS DOUBLE) * CAST(t.tc AS DOUBLE)))
               AS threshold,
           ks.ks_stat > 1.358 * sqrt(
               (CAST(t.tr AS DOUBLE) + CAST(t.tc AS DOUBLE))
               / (CAST(t.tr AS DOUBLE) * CAST(t.tc AS DOUBLE))) AS alarm
    FROM ks CROSS JOIN tots t
    """


@register("dq_ks_drift", oracle=_ks_drift_oracle())
def dq_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned two-sample Kolmogorov-Smirnov drift statistic
    (operators/profile.py::ks_drift) between pre- and post-1998 order
    totals — the sup-CDF-distance complement to the PSI monitor
    (dq_distribution_drift), evaluated at the reference's 50-quantile
    boundaries so no global sort ever happens: two mergeable binning
    passes against a broadcast cut array, CDFs via a window over the
    BOUNDED 50-row bin spine, exact integer counts divided once."""
    from ..operators.profile import ks_drift

    o = load_table(spark, sf_dir, "orders")
    split = F.lit("1998-01-01").cast("timestamp")
    ref = o.filter(F.col("o_orderdate") < split).select(
        F.col("o_totalprice").alias("v")
    )
    cur = o.filter(F.col("o_orderdate") >= split).select(
        F.col("o_totalprice").alias("v")
    )
    return ks_drift(ref, cur, "v", num_bins=50)


# -- two-proportion A/B z-test -------------------------------------------------
@register(
    "events_ab_test",
    oracle="""
    WITH u AS (SELECT user_id, CAST(ts AS DATE) AS day,
                      CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS v,
                      MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                          AS conv
               FROM events WHERE user_id IS NOT NULL
               GROUP BY 1, 2, 3),
    agg AS (SELECT v, count(*) AS n, SUM(conv) AS c FROM u GROUP BY 1),
    a AS (SELECT n AS n_control, c AS conv_control FROM agg WHERE v = 'A'),
    b AS (SELECT n AS n_treatment, c AS conv_treatment FROM agg
          WHERE v = 'B'),
    j AS (SELECT * FROM a CROSS JOIN b),
    t AS (SELECT *,
            CAST(conv_control AS DOUBLE) / CAST(n_control AS DOUBLE) AS pa,
            CAST(conv_treatment AS DOUBLE) / CAST(n_treatment AS DOUBLE) AS pb,
            CAST((conv_control + conv_treatment) AS DOUBLE)
                / CAST((n_control + n_treatment) AS DOUBLE) AS pp
          FROM j)
    SELECT CAST(n_control AS BIGINT) AS n_control,
           CAST(conv_control AS BIGINT) AS conv_control,
           CAST(n_treatment AS BIGINT) AS n_treatment,
           CAST(conv_treatment AS BIGINT) AS conv_treatment,
           pa AS rate_control,
           pb AS rate_treatment,
           pb - pa AS lift,
           CASE WHEN pp > 0.0 AND pp < 1.0 THEN
             (pb - pa) / sqrt(pp * (1.0 - pp)
                 * (1.0 / CAST(n_control AS DOUBLE)
                    + 1.0 / CAST(n_treatment AS DOUBLE)))
           END AS z_score,
           CASE WHEN pp > 0.0 AND pp < 1.0 THEN
             abs((pb - pa) / sqrt(pp * (1.0 - pp)
                 * (1.0 / CAST(n_control AS DOUBLE)
                    + 1.0 / CAST(n_treatment AS DOUBLE)))) > 1.96
           END AS significant
    FROM t
    """,
)
def events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion conversion z-test
    (operators/profile.py::ab_test_proportions): units are (user, day)
    pairs — conversion = any purchase event that day — split into
    control/treatment by the deterministic user_id parity (the hash
    split an experimentation platform assigns).  One mergeable unit
    aggregation, one variant aggregation, two 1-row scalars crossed;
    counts exact, every double expression one fixed association the
    oracle mirrors."""
    from ..operators.profile import ab_test_proportions

    e = load_table(spark, sf_dir, "events")
    units = (
        e.filter(F.col("user_id").isNotNull())
        .groupBy(
            "user_id",
            F.to_date("ts").alias("day"),
            F.when(F.col("user_id") % 2 == 0, F.lit("A"))
            .otherwise(F.lit("B"))
            .alias("variant"),
        )
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("converted")
        )
    )
    return ab_test_proportions(units, "variant", "converted")


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


# -- Laplace-mechanism DP histogram release (calibration report) ---------------
@register(
    "dq_dp_release",
    oracle="""
    WITH counts AS (SELECT event_type, count(*) AS true_count
                    FROM events GROUP BY 1),
    n AS (SELECT *,
            (CAST(CAST(('0x' || substr(md5('8:' || CAST(event_type AS VARCHAR)),
                                       1, 15)) AS BIGINT) AS DOUBLE) + 0.5)
                / 1152921504606846976.0 AS u
          FROM counts)
    SELECT event_type,
           CAST(true_count AS BIGINT) AS true_count,
           CAST(true_count AS DOUBLE)
             + (-1.0) * sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5))
               AS noisy_count,
           abs((-1.0) * sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5)))
               AS abs_error
    FROM n
    """,
)
def dq_dp_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private histogram release
    (operators/profile.py::dp_histogram): per-event-type counts with
    Laplace(1/epsilon) noise, epsilon=1 — the aggregate-publication
    mechanism for sensitive tables, in report form (true count and
    absolute error ride along for calibration; the release view is
    (group, noisy_count)).  Seeded md5-uniform inverse-CDF draw makes
    the mechanism deterministic for testing and fully SQL-replayed;
    production must keep the seed secret (documented in the operator).
    One mergeable aggregation; noise is map-side arithmetic on the
    group-cardinality result."""
    from ..operators.profile import dp_histogram

    e = load_table(spark, sf_dir, "events")
    return dp_histogram(e, "event_type", epsilon=1.0, seed=8)


# -- Benford first-digit conformance ------------------------------------------
@register(
    "dq_benford",
    oracle="""
    WITH pos AS (SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders
                 WHERE o_totalprice > 0),
    d AS (SELECT CAST(floor(v / pow(10.0, floor(log10(v)))) AS INT) AS digit
          FROM pos),
    counts AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
    tot AS (SELECT count(*) AS t FROM pos)
    SELECT digit,
           CAST(n AS BIGINT) AS n,
           CAST(n AS DOUBLE) / CAST(t AS DOUBLE) AS observed_p,
           ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0) AS expected_p,
           CAST(t AS DOUBLE) * (
             (CAST(n AS DOUBLE) / CAST(t AS DOUBLE)
              - ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0))
             * (CAST(n AS DOUBLE) / CAST(t AS DOUBLE)
                - ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0))
             / (ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0))
           ) AS chi2_term
    FROM counts CROSS JOIN tot
    """,
)
def dq_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit conformance over order totals
    (operators/profile.py::benford_report): leading digit by pure
    double arithmetic (floor(v / 10^floor(log10 v)) — no string
    formatting), observed vs log-uniform expected frequency, Pearson
    chi-square terms (sum = the 8-dof test statistic) — the classic
    fabricated-amounts screen.  One mergeable 9-key aggregation + a
    1-row total scalar."""
    from ..operators.profile import benford_report

    o = load_table(spark, sf_dir, "orders")
    return benford_report(o, "o_totalprice")


# -- label-propagation communities (iteration-replay oracle) -------------------
def _lpa_oracle(iters: int = 3) -> str:
    body = """
    WITH li AS (SELECT l_orderkey AS o, l_partkey AS p FROM lineitem
                WHERE l_orderkey % 3 = 0),
    pairs AS (SELECT a.p AS u, b.p AS v FROM li a
              JOIN li b ON a.o = b.o AND a.p <> b.p),
    e AS (SELECT u, v, CAST(count(*) AS BIGINT) AS w FROM pairs
          GROUP BY 1, 2),
    n AS (SELECT DISTINCT u AS node FROM e),
    l0 AS (SELECT node, node AS label FROM n)"""
    prev = "l0"
    for i in range(1, iters + 1):
        body += f""",
    c{i} AS (SELECT e.u, l.label, SUM(e.w) AS ws
             FROM e JOIN {prev} l ON l.node = e.v GROUP BY 1, 2),
    p{i} AS (SELECT u, label FROM (
               SELECT *, row_number() OVER (PARTITION BY u
                   ORDER BY ws DESC, label) AS rn FROM c{i})
             WHERE rn = 1),
    l{i} AS (SELECT n.node, COALESCE(p{i}.label, n.node) AS label
             FROM n LEFT JOIN p{i} ON p{i}.u = n.node)"""
        prev = f"l{i}"
    return body + f"""
    SELECT node AS l_partkey, CAST(label AS BIGINT) AS community
    FROM {prev}
    """


@register("graph_label_propagation", oracle=_lpa_oracle())
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted synchronous label-propagation communities
    (operators/graph.py::label_propagation) over the part co-order
    graph (orderkey % 3 slice) — the community-detection member of the
    graph family (components = identity, pagerank = importance,
    triangles = cohesion, LPA = modularity-ish grouping).  Every sweep
    adopts the neighbor label with the largest exact summed co-order
    weight, ties by smallest label; three sweeps replayed one-for-one
    in the oracle (the pagerank pattern).  Pair expansion is the
    bounded collect_list double-explode; per-sweep plans stay flat via
    lineage truncation."""
    from ..operators.graph import label_propagation

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 3 == 0
    )
    pairs = (
        li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .groupBy("o")
        .agg(F.collect_list("p").alias("ps"))
        .select(F.explode("ps").alias("p"), "ps")
        .select("p", F.explode("ps").alias("q"))
        .filter(F.col("p") != F.col("q"))
    )
    edges = pairs.groupBy("p", "q").agg(F.count(F.lit(1)).alias("w"))
    out = label_propagation(edges, src="p", dst="q", weight="w", iters=3)
    return out.select(
        F.col("node").alias("l_partkey"),
        F.col("community").cast("bigint").alias("community"),
    )


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


# -- Neyman-allocation stratified sampling -------------------------------------
@register(
    "corpus_neyman_sample",
    oracle="""
    WITH d AS (SELECT doc_id, source, n_chars,
                      CAST(n_chars AS DOUBLE) AS x FROM documents),
    m AS (SELECT source, count(*) AS n,
                 SUM(CAST(x AS DECIMAL(38,6))) AS sx,
                 SUM(CAST(x * x AS DECIMAL(38,6))) AS ss
          FROM d GROUP BY 1),
    s AS (SELECT source, n,
                 CASE WHEN n > 1 THEN sqrt(greatest(0.0,
                     (CAST(ss AS DOUBLE)
                      - (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        / CAST(n AS DOUBLE))
                     / (CAST(n AS DOUBLE) - 1.0)))
                 ELSE 0.0 END AS sd
          FROM m),
    w AS (SELECT source, n, CAST(n AS DOUBLE) * sd AS wgt FROM s),
    t AS (SELECT CAST(SUM(CAST(wgt AS DECIMAL(38,12))) AS DOUBLE) AS tot
          FROM w),
    a AS (SELECT w.source,
                 CASE WHEN t.tot > 0.0 THEN
                   least(w.n, CAST(floor((500.0 * w.wgt) / t.tot + 0.5)
                              AS BIGINT))
                 ELSE 0 END AS alloc
          FROM w CROSS JOIN t),
    r AS (SELECT doc_id, source, n_chars,
                 row_number() OVER (PARTITION BY source
                     ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
          FROM d)
    SELECT r.doc_id, r.source, r.n_chars
    FROM r JOIN a ON a.source = r.source WHERE r.rn <= a.alloc
    """,
)
def corpus_neyman_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-optimal stratified sampling
    (operators/corpus.py::neyman_sample): a 500-doc budget allocated
    across sources proportional to N_h * S_h of the length column
    (Neyman 1934) — high-variance feeds oversampled, near-constant
    feeds nearly skipped — then md5-rank selection inside each
    stratum.  Exact DECIMAL moments, one fixed double association,
    portable floor(+0.5) rounding: allocation AND selection fully
    SQL-replayed."""
    from ..operators.corpus import neyman_sample

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return neyman_sample(d, "source", "n_chars", budget=500)


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
