"""Round-10 additions.  Registered immediately after the reference suite
so the driver's natural-order first-50 correctness sample covers each
new query in the round it is written (see plans/__init__.py).  Queries
graduate to their topical home module once their driver row lands.

The round-9 module's jsonl_probe_* diagnostics are deleted (they did
their job: the r08 hash mismatch is isolated to the driver hasher's
typed serialization of DECIMAL(38,0) aggregates — finding + evidence in
reports/NOTES.md, recurrence guarded by tools/audit_oracle_types.py's
banned-type rule), and its eight real queries graduated to their
topical modules with driver-green r09 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register

__all__: list[str] = []


# -- chi-square test of independence ------------------------------------------
@register(
    "stats_chi2_independence",
    oracle="""
    WITH cells AS (
        SELECT event_type,
               CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
               CAST(count(*) AS BIGINT) AS n_observed
        FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2),
    rt AS (SELECT event_type, sum(n_observed) AS _rt FROM cells GROUP BY 1),
    ct AS (SELECT variant, sum(n_observed) AS _ct FROM cells GROUP BY 1),
    g AS (SELECT sum(n_observed) AS _n FROM cells),
    x AS (SELECT rt.event_type, ct.variant,
                 CAST(COALESCE(c.n_observed, 0) AS BIGINT) AS n_observed,
                 (CAST(_rt AS DOUBLE) * CAST(_ct AS DOUBLE))
                     / CAST(_n AS DOUBLE) AS e
          FROM rt CROSS JOIN ct
          LEFT JOIN cells c ON c.event_type = rt.event_type
                           AND c.variant = ct.variant
          CROSS JOIN g)
    SELECT event_type, variant, n_observed, e AS n_expected,
           ((CAST(n_observed AS DOUBLE) - e) * (CAST(n_observed AS DOUBLE) - e))
               / e AS chi2_contrib
    FROM x
    """,
)
def stats_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence test (operators/profile.py::
    chi2_independence) between event mix and the deterministic parity
    variant — the contingency-table member of the testing family
    (events_ab_test = proportions z, stats_welch_ttest = continuous
    means, this = categorical mix).  Full per-cell diagnostic table:
    (event_type, variant, observed, expected, contribution); the
    statistic is the contribution sum with df = (r-1)(c-1).  Exact
    BIGINT counts from bounded aggregations; expected/contribution are
    one fixed double association the oracle mirrors."""
    from ..operators.profile import chi2_independence

    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    units = e.select(
        "event_type",
        F.when(F.col("user_id") % 2 == 0, F.lit("A"))
        .otherwise(F.lit("B"))
        .alias("variant"),
    )
    return chi2_independence(units, "event_type", "variant")


# -- Kaplan-Meier retention survival curve -------------------------------------
@register(
    "events_survival_km",
    oracle="""
    WITH pu AS (SELECT user_id, min(epoch_us(ts)) AS f, max(epoch_us(ts)) AS l
                FROM events GROUP BY 1),
    cm AS (SELECT max(epoch_us(ts)) AS c FROM events),
    obs AS (SELECT
                CAST(floor(CAST(l - f AS DOUBLE) / 86400000000.0) AS BIGINT)
                    AS t_days,
                (c - l) > CAST(1 AS BIGINT) * 86400000000 AS churned
            FROM pu CROSS JOIN cm),
    nt AS (SELECT count(*) AS n FROM obs),
    sp AS (SELECT t_days, count(*) AS ended,
                  CAST(sum(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT)
                      AS n_churned
           FROM obs GROUP BY 1),
    st AS (SELECT t_days, n_churned,
                  CAST(n - COALESCE(sum(ended) OVER (ORDER BY t_days
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                      AS BIGINT) AS n_at_risk
           FROM sp CROSS JOIN nt),
    lf AS (SELECT t_days, n_churned, n_at_risk,
                  CASE WHEN n_churned = 0 THEN CAST(0 AS DECIMAL(30,15))
                       WHEN n_churned < n_at_risk THEN
                           CAST(ln(CAST(n_at_risk - n_churned AS DOUBLE)
                                   / CAST(n_at_risk AS DOUBLE))
                                AS DECIMAL(30,15))
                  END AS lnf,
                  CASE WHEN n_churned > 0 AND n_churned >= n_at_risk
                       THEN 1 ELSE 0 END AS zf
           FROM st),
    cum AS (SELECT t_days, n_churned, n_at_risk,
                   max(zf) OVER w AS zero_hit,
                   sum(lnf) OVER w AS lnsum
            FROM lf
            WINDOW w AS (ORDER BY t_days
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    SELECT t_days, n_at_risk, n_churned,
           CASE WHEN zero_hit = 1 THEN 0.0
                ELSE exp(CAST(lnsum AS DOUBLE)) END AS survival
    FROM cum WHERE n_churned > 0
    """,
)
def events_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier retention survival curve (operators/temporal.py::
    survival_km): users observed from first to last event; inactive for
    >1 day before the corpus edge = churned at their duration (the
    fixture's events span ~30 days of dense activity, so the
    operator's 60-day production default censors everyone; the horizon
    is the caller's contract), still active near the edge = CENSORED —
    the estimator's whole point vs a naive churn histogram.  One
    user-keyed aggregation is the only fact
    shuffle; the KM product runs as exp(sum(ln)) with DECIMAL(30,15)
    per-step factors over the calendar-bounded duration spine (the
    unigram-logprob pattern), every step replayed in the oracle."""
    from ..operators.temporal import survival_km

    e = load_table(spark, sf_dir, "events")
    return survival_km(e, horizon_days=1)


# -- deterministic Poisson bootstrap CI ---------------------------------------
def _bootstrap_oracle(replicates: int = 40) -> str:
    from ..operators.profile import POISSON1_CDF

    ladder = "CASE "
    for k, c in enumerate(POISSON1_CDF):
        ladder += f"WHEN ud < {c!r} THEN {k} "
    ladder += "ELSE 8 END"
    return f"""
    WITH units AS (
        SELECT user_id,
               CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS metric
        FROM events WHERE user_id IS NOT NULL GROUP BY 1),
    r AS (SELECT range AS replicate FROM range({replicates})),
    x AS (SELECT u.metric, r.replicate,
                 CAST(('0x' || substr(md5(CAST(u.user_id AS VARCHAR) || ':'
                     || CAST(r.replicate AS VARCHAR)), 1, 15)) AS BIGINT) AS h
          FROM units u CROSS JOIN r),
    w AS (SELECT replicate, metric, {ladder} AS w
          FROM (SELECT *,
                       CAST(h AS DOUBLE) / 1152921504606846976.0 AS ud
                FROM x) t)
    SELECT CAST(replicate AS INT) AS replicate,
           CAST(sum(w) AS BIGINT) AS n_effective,
           CAST(sum(CAST(w * metric AS DECIMAL(38,6))) AS DOUBLE)
               / CAST(sum(w) AS DOUBLE) AS boot_mean
    FROM w GROUP BY 1
    """


@register("stats_bootstrap_mean", oracle=_bootstrap_oracle())
def stats_bootstrap_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Poisson bootstrap of mean revenue-per-user
    (operators/profile.py::poisson_bootstrap_means, B=40): each unit's
    weight in replicate b is Poisson(1) by inverse-CDF on the
    md5(user:b) uniform, so the resampling distribution — the
    uncertainty estimate welch_ttest's normal approximation assumes
    away — is itself a replayable artifact: reruns AND the oracle
    reproduce the identical 40 resample means.  One scan with a B-way
    map-side explode collapsed by partial aggregation; output is B
    rows, never fact-sized."""
    from ..operators.profile import poisson_bootstrap_means

    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    units = e.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(38,6)"))
        .cast("double")
        .alias("metric")
    )
    return poisson_bootstrap_means(units, "user_id", "metric", replicates=40)


# -- modularity of the LPA communities ----------------------------------------
def _modularity_oracle(iters: int = 3) -> str:
    from .oracle_fragments import lpa_cte

    body, lbl = lpa_cte(iters)
    return body + f""",
    msym AS (SELECT u, v, CAST(sum(w) AS BIGINT) AS w FROM (
                 SELECT u, v, w FROM e
                 UNION ALL SELECT v AS u, u AS v, w FROM e) t
             WHERE u <> v GROUP BY 1, 2),
    twom AS (SELECT CAST(sum(w) AS BIGINT) AS m2 FROM msym),
    dg AS (SELECT u, CAST(sum(w) AS BIGINT) AS d FROM msym GROUP BY 1),
    dc AS (SELECT l.label AS community, CAST(count(*) AS BIGINT) AS n_nodes,
                  CAST(sum(d) AS BIGINT) AS degree_w
           FROM dg JOIN {lbl} l ON l.node = dg.u GROUP BY 1),
    ic AS (SELECT la.label AS community, CAST(sum(s.w) AS BIGINT) AS internal_w
           FROM msym s JOIN {lbl} la ON la.node = s.u
                       JOIN {lbl} lb ON lb.node = s.v
           WHERE la.label = lb.label GROUP BY 1)
    SELECT CAST(dc.community AS BIGINT) AS community, dc.n_nodes,
           CAST(COALESCE(ic.internal_w, 0) AS BIGINT) AS internal_w,
           dc.degree_w,
           CAST(COALESCE(ic.internal_w, 0) AS DOUBLE) / CAST(m2 AS DOUBLE)
               - (CAST(dc.degree_w AS DOUBLE) / CAST(m2 AS DOUBLE))
                 * (CAST(dc.degree_w AS DOUBLE) / CAST(m2 AS DOUBLE))
               AS q_contrib
    FROM dc LEFT JOIN ic USING (community) CROSS JOIN twom
    """


@register("graph_modularity", oracle=_modularity_oracle())
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the label-propagation communities on the
    part co-order graph (operators/graph.py::modularity over
    label_propagation's output) — the quality score that closes the
    community-detection loop: detect with LPA, then MEASURE whether the
    partition beats random (sum of q_contrib = Q).  The oracle replays
    the identical LPA sweeps via the shared lpa_cte fragment, then the
    exact-BIGINT in/degree/2m aggregates and the one fixed double
    association.  Two node-keyed label joins + community-bounded
    aggregates — the LPA per-round shape, nothing quadratic.

    r11: derives the labels per invocation (the r10 cross-invocation
    memo was result caching — removed).  Within THIS invocation the
    co-order pair expansion is built and checkpointed once
    (plans/shared_graph.py::coorder_edges) and feeds both the LPA
    sweeps and the modularity aggregates; both take the
    symmetric-input fast path, so neither pays the union+groupBy
    symmetrization (the doubled weights modularity reports are applied
    in place — bit-identical sums)."""
    from ..operators.graph import label_propagation, modularity
    from .shared_graph import coorder_edges

    edges = coorder_edges(spark, sf_dir)
    labels = label_propagation(
        edges, src="p", dst="q", weight="w", iters=3, input_symmetric=True
    )
    return modularity(
        edges, labels, src="p", dst="q", weight="w",
        node_col="node", label_col="community", input_symmetric=True,
    )


# -- cross-source exact-duplicate matrix ---------------------------------------
@register(
    "dedup_cross_source_matrix",
    oracle="""
    WITH per AS (SELECT md5(text) AS h, source AS s, count(*) AS c
                 FROM documents GROUP BY 1, 2),
    j AS (SELECT a.s AS source_a, b.s AS source_b,
                 CASE WHEN a.s = b.s
                      THEN CAST((a.c * (a.c - 1)) / 2 AS BIGINT)
                      ELSE CAST(a.c * b.c AS BIGINT) END AS np
          FROM per a JOIN per b ON a.h = b.h AND a.s <= b.s)
    SELECT source_a, source_b,
           CAST(sum(np) AS BIGINT) AS n_dup_pairs,
           CAST(count(*) AS BIGINT) AS n_shared_texts
    FROM j WHERE np > 0 GROUP BY 1, 2
    """,
)
def dedup_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source exact-duplicate provenance matrix (operators/
    dedup.py::cross_source_matrix): duplicate document-pair counts per
    (source_a <= source_b) combination — WHICH feeds copy from which
    (mirror detection, crawl overlap) before any dedup drops rows.
    Zero pair explosion: per-(hash, source) counts collapse first and
    pair counts are the closed forms ca*cb / C(ca,2); all-integer,
    fully SQL-replayed."""
    from ..operators.dedup import cross_source_matrix

    d = load_table(spark, sf_dir, "documents")
    return cross_source_matrix(d)


# -- RAKE keyphrase extraction --------------------------------------------------
def _rake_oracle(top: int = 50) -> str:
    from ..operators.text import RAKE_STOPWORDS

    stops = ", ".join(f"'{w}'" for w in RAKE_STOPWORDS)
    return f"""
    WITH d AS (SELECT doc_id,
                      string_split_regex(trim(regexp_replace(lower(text),
                          '[^a-z0-9 ]', ' ', 'g')), ' +') AS t
               FROM documents),
    win AS (SELECT doc_id, w['pos'] AS pos, w['tok'] AS tok FROM (
                SELECT doc_id, unnest(list_transform(
                    generate_series(1, len(t)),
                    i -> {{'pos': CAST(i AS INT), 'tok': t[i]}})) AS w
                FROM d) u),
    g AS (SELECT doc_id, pos, tok,
                 tok IN ({stops}) AS stop,
                 sum(CASE WHEN tok IN ({stops}) THEN 1 ELSE 0 END)
                     OVER (PARTITION BY doc_id ORDER BY pos) AS grp
          FROM win),
    nz AS (SELECT doc_id, grp, pos, tok FROM g
           WHERE NOT stop AND tok <> ''),
    ph AS (SELECT doc_id, grp,
                  string_agg(tok, ' ' ORDER BY pos) AS phrase,
                  count(*) AS len
           FROM nz GROUP BY 1, 2),
    ws AS (SELECT tok,
                  CAST(CAST(sum(len) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                       AS DECIMAL(30,15)) AS wscore
           FROM (SELECT nz.tok, ph.len
                 FROM nz JOIN ph USING (doc_id, grp)) t
           GROUP BY 1),
    dp AS (SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences
           FROM ph GROUP BY 1),
    mem AS (SELECT phrase, n_occurrences,
                   unnest(string_split(phrase, ' ')) AS tok
            FROM dp),
    sc AS (SELECT phrase, n_occurrences,
                  CAST(count(*) AS INT) AS n_words,
                  CAST(sum(wscore) AS DOUBLE) AS rake_score
           FROM mem JOIN ws USING (tok) GROUP BY 1, 2)
    SELECT phrase, n_words, n_occurrences, rake_score
    FROM sc ORDER BY rake_score DESC, phrase LIMIT {top}
    """


@register("text_rake_keywords", oracle=_rake_oracle())
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction (operators/text.py::rake_keywords,
    Rose et al. 2010): maximal stopword-free token runs scored by the
    sum of member-word degree/frequency ratios — the corpus keyphrase
    inventory next to text_tfidf_topterms (per-term) and
    text_collocations_pmi (bigram).  Phrase islands are per-doc running
    stopword counts (doc-keyed windows only); word stats aggregate on
    the token key; DECIMAL(30,15) word scores make the per-phrase sum
    order-free; mergeable top-50 tail.  The stoplist is a frozen
    literal embedded in BOTH the operator and the oracle."""
    from ..operators.text import rake_keywords

    d = load_table(spark, sf_dir, "documents")
    return rake_keywords(d, top=50)


# -- PCA ANN lossless-rotation equivalence audit -------------------------------
@register(
    "ann_pca_lossless_audit",
    oracle="""
    SELECT vec_id AS query_id, CAST(5 AS BIGINT) AS n_results,
           TRUE AS ids_match, TRUE AS cos_dev_ok
    FROM embeddings WHERE vec_id < 10
    """,
)
def ann_pca_lossless_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equivalence audit for the PCA ANN path (the
    ann_cosine_topk_arrow audit pattern): at pca_k = d the projection
    is a pure rotation, so the projected-space L2 candidate cut is
    mathematically lossless — pca_topk's distributed machinery
    (map-side projection, per-batch partial top-k, candidate shuffle,
    exact rerank) must return the IDENTICAL ranked list as a trusted
    exact leg (brute-force L2 candidates through the same cosine
    rerank).  Published per query: n_results plus ids_match /
    cos_dev_ok booleans computed FOR REAL by joining the two legs on
    (query_id, rank).  This upgrades tests/test_pca.py's
    lossless-rotation pytest to a driver-verified row; the production
    bottleneck config (pca_k=16) stays registered as ann_pca_topk
    (rows-only: the eigensolve is not SQL-expressible and a 16-dim cut
    on isotropic random embeddings has no invariant recall)."""
    from pyspark.sql import Window
    from ..operators.similarity import (
        brute_force_topk,
        cosine,
        dot,
        pca_topk,
    )

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    dim = len(e.select("embedding").first()[0])
    leg_a = pca_topk(e, q, k=5, pca_k=dim, oversample=4)

    def neg_d2(a, b):
        return -(dot(a, a) - F.lit(2.0) * dot(a, b) + dot(b, b))

    cand_b = brute_force_topk(e, q, k=20, scorer=neg_d2).select(
        "query_id", "neighbor_id"
    )
    rer = (
        cand_b.join(
            e.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("_cv"),
            ),
            on="neighbor_id",
        )
        .join(
            F.broadcast(
                q.select(
                    F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("_qv"),
                )
            ),
            on="query_id",
        )
        .withColumn("cos_sim", cosine(F.col("_qv"), F.col("_cv")))
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    leg_b = (
        rer.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
    j = (
        leg_a.select(
            "query_id", "rank",
            F.col("neighbor_id").alias("_an"), F.col("cos_sim").alias("_ac"),
        )
        .join(
            leg_b.select(
                "query_id", "rank",
                F.col("neighbor_id").alias("_bn"),
                F.col("cos_sim").alias("_bc"),
            ),
            on=["query_id", "rank"],
            how="full",
        )
    )
    return j.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_results"),
        F.bool_and(
            F.col("_an").isNotNull()
            & F.col("_bn").isNotNull()
            & (F.col("_an") == F.col("_bn"))
        ).alias("ids_match"),
        F.bool_and(
            F.abs(F.col("_ac") - F.col("_bc")) <= F.lit(1e-9)
        ).alias("cos_dev_ok"),
    )


# -- Adamic-Adar link prediction ------------------------------------------------
@register(
    "graph_adamic_adar",
    oracle="""
    WITH li AS (SELECT l_orderkey AS o, l_partkey AS p FROM lineitem
                WHERE l_orderkey % 3 = 0),
    pairs AS (SELECT DISTINCT a.p AS u, b.p AS v FROM li a
              JOIN li b ON a.o = b.o AND a.p <> b.p),
    deg AS (SELECT u, count(*) AS d FROM pairs GROUP BY 1),
    capped AS (SELECT u, v FROM (
        SELECT u, v, row_number() OVER (PARTITION BY u
            ORDER BY md5(CAST(u AS VARCHAR) || ':' || CAST(v AS VARCHAR)))
            AS hr
        FROM pairs) t WHERE hr <= 64),
    wedge AS (SELECT x.v AS a, y.v AS b, x.u AS w FROM capped x
              JOIN capped y ON x.u = y.u WHERE x.v < y.v),
    weighted AS (SELECT a, b,
                        CAST(1.0 / ln(CAST(d.d AS DOUBLE)) AS DECIMAL(30,15))
                            AS wt
                 FROM wedge JOIN deg d ON d.u = wedge.w),
    common AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n_common,
                      sum(wt) AS aa
               FROM weighted GROUP BY 1, 2 HAVING count(*) >= 2),
    cand AS (SELECT c.a, c.b, c.n_common, c.aa FROM common c
             LEFT JOIN pairs p ON p.u = c.a AND p.v = c.b
             WHERE p.u IS NULL)
    SELECT a, b, n_common, CAST(aa AS DOUBLE) AS adamic_adar
    FROM cand ORDER BY adamic_adar DESC, a, b LIMIT 50
    """,
)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction over the part co-order graph
    (operators/graph.py::adamic_adar_link_prediction; Adamic & Adar
    2003): top-50 unlinked pairs by the degree-discounted
    shared-neighbor score sum(1/ln(deg(w))) — the companion ranking to
    graph_link_prediction's Jaccard: a shared RARE neighbor is strong
    evidence, a shared hub nearly none, which is the discounting the
    Jaccard score lacks.  Same hub-capped (max_degree=64, md5-rank)
    wedge machinery, weights from the FULL exact degrees,
    DECIMAL(30,15) order-free score sums, mergeable top-k; the oracle
    replays cap, wedges, weights and the ranking end to end."""
    from ..operators.graph import adamic_adar_link_prediction

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
    # the double-explode expansion emits both directions: symmetric-
    # input fast path (r11 — skip the union, halve the distinct input)
    return adamic_adar_link_prediction(
        pairs, top=50, min_common=2, src="p", dst="q", max_degree=64,
        input_symmetric=True,
    )
