"""Round-11 operator additions, registered at the head of the driver's
correctness sample (plans/__init__.py) so each earns its first driver
row this round:

* ``events_markov_stationary`` — stationary distribution of the
  estimated behavioral Markov chain (power iterations over the bounded
  type-space, absorbing self-loops; the long-run state-mix baseline).
* ``stats_mann_whitney`` — binned Mann-Whitney U rank-sum test, the
  distribution-free companion to stats_welch_ttest.
* ``corpus_source_novelty`` — per-source n-gram novelty: the
  content-level overlap report between whole-document dedup and
  eval-set decontamination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register


# -- stationary distribution of the behavioral Markov chain -------------------
def _stationary_oracle(iters: int = 8) -> str:
    body = """
    WITH seq AS (
        SELECT event_type AS ft,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS tt
        FROM events),
    tc AS (SELECT ft, tt, count(*) AS n FROM seq WHERE tt IS NOT NULL
           GROUP BY 1, 2),
    tr AS (SELECT ft, tt,
                  CAST(n AS DOUBLE)
                  / CAST(sum(n) OVER (PARTITION BY ft) AS DOUBLE) AS p
           FROM tc),
    st AS (SELECT DISTINCT s FROM (
               SELECT ft AS s FROM tr UNION SELECT tt FROM tr)),
    pm AS (SELECT ft, tt, p FROM tr
           UNION ALL
           SELECT s, s, 1.0 FROM st
           WHERE s NOT IN (SELECT DISTINCT ft FROM tr)),
    kk AS (SELECT count(*) AS k FROM st),
    v0 AS (SELECT s, 1.0 / CAST(k AS DOUBLE) AS p FROM st CROSS JOIN kk)"""
    prev = "v0"
    for i in range(1, iters + 1):
        body += f""",
    c{i} AS (SELECT pm.tt AS s, CAST({prev}.p * pm.p AS DECIMAL(30,15)) AS c
             FROM pm JOIN {prev} ON {prev}.s = pm.ft),
    v{i} AS (SELECT st.s, CAST(COALESCE(sum(c{i}.c), 0) AS DOUBLE) AS p
             FROM st LEFT JOIN c{i} ON c{i}.s = st.s GROUP BY 1)"""
        prev = f"v{i}"
    return body + f"""
    SELECT s AS event_type, p AS p_stationary FROM {prev}
    """


@register("events_markov_stationary", oracle=_stationary_oracle())
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the estimated behavioral Markov chain
    (operators/temporal.py::markov_stationary, 8 power iterations) —
    the long-run state-mix baseline that closes the loop
    events_transition_matrix opens, the behavioral analogue of
    PageRank's importance vector.  Absorbing self-loops conserve mass
    for types seen only as final events; every iteration's
    contributions are DECIMAL(30,15) order-free sums (the pagerank
    oracle pattern), so the full 8-step unroll replays in SQL.  After
    the one user-keyed window pass everything is |event types|- or
    types^2-bounded."""
    from ..operators.temporal import markov_stationary

    e = load_table(spark, sf_dir, "events")
    return markov_stationary(e, iters=8)


# -- binned Mann-Whitney U rank-sum test --------------------------------------
def _mann_whitney_oracle(num_bins: int = 50) -> str:
    fracs = ", ".join(repr(i / num_bins) for i in range(1, num_bins))
    return f"""
    WITH units AS (
        SELECT user_id,
               CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS g,
               CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS v
        FROM events WHERE user_id IS NOT NULL GROUP BY 1),
    cuts AS (SELECT quantile_cont(v, [{fracs}]) AS c FROM units),
    b AS (SELECT g,
                 CAST(len(list_filter(cuts.c, x -> u.v > x)) AS INT) AS bin
          FROM units u CROSS JOIN cuts),
    bc AS (SELECT bin,
                  sum(CASE WHEN g = 'A' THEN 1 ELSE 0 END) AS na,
                  sum(CASE WHEN g = 'B' THEN 1 ELSE 0 END) AS nb
           FROM b GROUP BY 1),
    pb AS (SELECT na, nb, na + nb AS t,
                  2 * COALESCE(sum(na + nb) OVER (
                      ORDER BY bin
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) + na + nb + 1 AS dm
           FROM bc),
    tot AS (SELECT CAST(sum(na) AS BIGINT) AS n_a,
                   CAST(sum(nb) AS BIGINT) AS n_b,
                   sum(CAST(na * dm AS DECIMAL(38,1))) AS r2,
                   CAST(sum(t * t * t - t) AS BIGINT) AS s3
            FROM pb)
    SELECT n_a, n_b,
           CAST(r2 AS DOUBLE) / 2.0
               - CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) + 1.0) / 2.0
               AS u_a,
           (CAST(r2 AS DOUBLE) / 2.0
               - CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) + 1.0) / 2.0
               - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0)
           / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0 * (
                 (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) + 1.0)
                 - CAST(s3 AS DOUBLE)
                   / ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                      * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 1.0))))
               AS z_stat,
           abs((CAST(r2 AS DOUBLE) / 2.0
               - CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) + 1.0) / 2.0
               - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0)
           / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0 * (
                 (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) + 1.0)
                 - CAST(s3 AS DOUBLE)
                   / ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                      * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 1.0)))))
               > 1.96 AS reject_at_95
    FROM tot
    """


@register("stats_mann_whitney", oracle=_mann_whitney_oracle())
def stats_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned Mann-Whitney U rank-sum test on revenue-per-user between
    the parity A/B variants (operators/profile.py::mann_whitney_binned)
    — the distribution-free companion to stats_welch_ttest for the
    heavy-tailed metrics where a mean comparison misleads.  Exact ranks
    need a global sort; the statistic is evaluated on the pooled
    50-quantile bins (the ks_drift move) with bins as tie groups and
    the tie-corrected normal approximation — two mergeable aggregation
    passes, a window over the bounded bin spine, DECIMAL-exact doubled
    midrank sums; the closed form replays in SQL."""
    from ..operators.profile import mann_whitney_binned

    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    units = e.groupBy(
        "user_id",
        F.when(F.col("user_id") % 2 == 0, F.lit("A"))
        .otherwise(F.lit("B"))
        .alias("variant"),
    ).agg(
        F.sum(F.col("value").cast("decimal(38,6)"))
        .cast("double")
        .alias("metric")
    )
    return mann_whitney_binned(units, "variant", "metric", num_bins=50)


# -- per-source n-gram novelty -------------------------------------------------
@register(
    "corpus_source_novelty",
    oracle=r"""
    WITH tk AS (SELECT source,
                       string_split_regex(lower(trim(text)), '\s+') AS t
                FROM documents),
    sh AS (SELECT DISTINCT source, sh FROM (
               SELECT source,
                      unnest(list_distinct(list_transform(
                          generate_series(1, greatest(len(t) - 4, 1)),
                          i -> array_to_string(t[i:i+4], ' ')))) AS sh
               FROM tk)),
    sc AS (SELECT sh, count(*) AS ns FROM sh GROUP BY 1)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_distinct_ngrams,
           CAST(sum(CASE WHEN ns >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_shared_ngrams,
           1.0 - CAST(sum(CASE WHEN ns >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) AS novelty_frac
    FROM sh JOIN sc USING (sh)
    GROUP BY 1 ORDER BY novelty_frac, source
    """,
)
def corpus_source_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source word-5-gram novelty
    (operators/corpus.py::source_ngram_novelty): of each source's
    distinct shingles, the fraction absent from every other source —
    the content-level mirror/re-crawl detector sitting between
    dedup_cross_source_matrix (whole-doc exact copies) and
    corpus_decontaminate (one fixed eval set).  One scan, shingle-keyed
    exchange, source-bounded output; overlap is counted through each
    shingle's source-count — never a source x source join."""
    from ..operators.corpus import source_ngram_novelty

    d = load_table(spark, sf_dir, "documents")
    return source_ngram_novelty(d, shingle_n=5)
