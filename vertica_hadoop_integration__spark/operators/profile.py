"""Table profiling: per-column stats in ONE scan.

Catalog-adjacent, like the reference's schema reflection
(``sqoop_table.py:114-129`` reads names/types from ``v_catalog.columns``;
this adds the value-level stats a migration needs to validate a load).
All columns are profiled in a single aggregation job — never one scan
per column. Exact distinct counts expand the aggregate per column;
``approx=True`` switches to HLL++ for the 100 TB path (single pass,
fixed state)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.df_utils import spread


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    approx: bool = False,
) -> DataFrame:
    """Profile numeric/string columns: (col_name, n_rows, n_nulls,
    n_distinct, min_value, max_value) — min/max as DOUBLE for numeric
    columns, NULL for strings (kept cross-engine comparable)."""
    names = cols or df.columns
    numeric = {
        f.name
        for f in df.schema.fields
        if f.dataType.typeName() in
        ("integer", "long", "short", "byte", "double", "float", "decimal")
    }
    distinct = (
        (lambda c: F.approx_count_distinct(c)) if approx else (lambda c: F.countDistinct(c))
    )
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in names:
        aggs += [
            F.count(F.col(c)).alias(f"_nn_{c}"),
            distinct(F.col(c)).alias(f"_nd_{c}"),
            (F.min(F.col(c)).cast("double") if c in numeric else F.lit(None).cast("double")).alias(f"_mn_{c}"),
            (F.max(F.col(c)).cast("double") if c in numeric else F.lit(None).cast("double")).alias(f"_mx_{c}"),
        ]
    one = df.agg(*aggs)
    rows = F.array(*[
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("_n").alias("n_rows"),
            (F.col("_n") - F.col(f"_nn_{c}")).alias("n_nulls"),
            F.col(f"_nd_{c}").alias("n_distinct"),
            F.col(f"_mn_{c}").alias("min_value"),
            F.col(f"_mx_{c}").alias("max_value"),
        )
        for c in names
    ])
    return one.select(F.inline(rows))


def dq_rule_report(
    df: DataFrame,
    rules: list[tuple[str, "Column"]],
) -> DataFrame:
    """Rule-based data-quality report (the dbt-test / Deequ shape): each
    rule is (name, violation-predicate Column); the report is one row
    per rule with its violation count and the checked total — all rules
    evaluated in a SINGLE aggregation scan (conditional sums), not one
    scan per rule. At 100 TB that is the difference between one pass
    and len(rules) passes."""
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.when(pred, 1).otherwise(0)).alias(f"_r{i}")
        for i, (_, pred) in enumerate(rules)
    ]
    wide = df.agg(*aggs)
    # long format via inline of an array of structs — rule names travel
    # as string LITERALS, never as SQL identifiers, so any name (quotes,
    # spaces, reserved words) is safe
    rows = F.array(*[
        F.struct(
            F.lit(name).alias("rule"),
            F.col(f"_r{i}").cast("long").alias("n_violations"),
        )
        for i, (name, _) in enumerate(rules)
    ])
    return wide.select(F.inline(rows), F.col("n_rows").cast("long").alias("n_rows"))


def linreg_per_group(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group simple OLS (y = a + b*x) in ONE aggregation pass via
    closed-form sums — the distributed shape for per-segment trend
    fitting (no per-group model loop, no Python): slope =
    (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2), intercept = (Sy - b*Sx)/n, plus
    Pearson r. All five sums accumulate as DECIMAL(38,6) so the result
    is partial-aggregation-order-free (bit-identical across engines);
    the final arithmetic is double. Groups with zero x-variance yield
    NULL slope/r (guarded division)."""
    d = df.select(
        F.col(group_col).alias("grp"),
        F.col(x_col).cast("double").alias("x"),
        F.col(y_col).cast("double").alias("y"),
    )
    dec = "decimal(38,6)"
    agg = d.groupBy("grp").agg(
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
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    den_x = n * sxx - sx * sx
    den_y = n * syy - sy * sy
    num = n * sxy - sx * sy
    slope = F.when(den_x != 0.0, num / den_x)
    return agg.select(
        F.col("grp").alias(group_col),
        F.col("n").cast("long").alias("n"),
        slope.alias("slope"),
        F.when(den_x != 0.0, (sy - slope * sx) / n).alias("intercept"),
        F.when(
            (den_x != 0.0) & (den_y != 0.0), num / F.sqrt(den_x * den_y)
        ).alias("pearson_r"),
    )


def correlation_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlation of k numeric columns in ONE
    aggregation pass — the profiling step a feature-selection or
    data-drift pipeline runs before training.  All k first moments,
    k second moments, and k*(k-1)/2 cross moments accumulate in a
    single groupBy-less agg (one scan, partial aggregation combines
    map-side, the reduced state is one row of scalars regardless of
    input size); the pair expansion is a literal array explode of that
    1-row frame — no joins, no second scan.

    Exactness contract (same as linreg_per_group): moment sums are
    DECIMAL(38,6) so they are partial-order-free and bit-identical
    across engines; the closed-form correlation arithmetic is double
    with a fixed association the oracle mirrors term-for-term.
    Zero-variance columns yield NULL correlations (guarded).  Output:
    (col_x, col_y, n, corr) for every x < y pair."""
    dec = "decimal(38,6)"
    d = df.select(*[F.col(c).cast("double").alias(c) for c in cols])
    # the moment pass is CPU-bound (k^2/2 decimal cast-sums per row) and
    # reduces to ONE row, so parallelism should be cores, not the file
    # count: a small parquet scans as 1-3 partitions and serializes the
    # whole pass onto as many cores (measured 5.7s -> 1.9s at sf0.1 on
    # local[32]).  The repartition exchanges only the k projected
    # doubles; at real scale the scan already exceeds defaultParallelism
    # and this is a no-op.
    d = spread(d)
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).cast(dec)).alias(f"s_{c}"))
        aggs.append(F.sum((F.col(c) * F.col(c)).cast(dec)).alias(f"ss_{c}"))
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            aggs.append(
                F.sum((F.col(a) * F.col(b)).cast(dec)).alias(f"sp_{a}_{b}")
            )
    m = d.agg(*aggs)
    n = F.col("n").cast("double")
    pairs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            sx = F.col(f"s_{a}").cast("double")
            sy = F.col(f"s_{b}").cast("double")
            den_x = n * F.col(f"ss_{a}").cast("double") - sx * sx
            den_y = n * F.col(f"ss_{b}").cast("double") - sy * sy
            num = n * F.col(f"sp_{a}_{b}").cast("double") - sx * sy
            corr = F.when(
                (den_x != 0.0) & (den_y != 0.0),
                num / F.sqrt(den_x * den_y),
            )
            pairs.append(
                F.struct(
                    F.lit(a).alias("col_x"),
                    F.lit(b).alias("col_y"),
                    corr.alias("corr"),
                )
            )
    return m.select(
        F.explode(F.array(*pairs)).alias("p"), F.col("n").cast("long").alias("n")
    ).select("p.col_x", "p.col_y", "n", "p.corr")


def referential_integrity(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    relationship: str,
) -> DataFrame:
    """Orphan check for one FK relationship: child rows whose key has no
    parent. One anti-join (the parent side carries only its key column,
    so the exchange is key-narrow; broadcast when dimension-sized).
    Returns a single (relationship, n_orphans, n_child_rows) row —
    union several calls for a full-constellation report."""
    orphans = child.select(F.col(child_key)).join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        on=child_key,
        how="left_anti",
    )
    return (
        orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
        .join(child.agg(F.count(F.lit(1)).alias("n_child_rows")))
        .select(
            F.lit(relationship).alias("relationship"),
            F.col("n_orphans").cast("long").alias("n_orphans"),
            F.col("n_child_rows").cast("long").alias("n_child_rows"),
        )
    )


def distribution_drift(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    num_bins: int = 10,
) -> DataFrame:
    """Population Stability Index between a reference and a current
    split of one numeric column — the standard ML feature-drift
    monitor: bin edges are the reference's exact interpolated deciles,
    both splits are histogrammed against THOSE edges, and each bin
    contributes ``(q - p) * ln(q / p)`` with add-one smoothing (a bin
    the current split abandoned still scores finite).  Sum of psi_term
    over the output is the PSI; > 0.2 is the conventional retrain/
    investigate alarm.

    NULLs get a dedicated bin (-1) rather than being silently folded
    into bin 0: ``percentile`` ignores NULLs when computing the cuts,
    so a NULL surge in the monitored column would otherwise inflate
    lowest-decile mass instead of surfacing — with the NULL bin, a
    NULL-rate shift IS drift and moves the PSI like any other bin.
    Totals therefore count all rows and smoothing uses num_bins + 1.

    Scale shape: two mergeable aggregate passes (the percentile cuts
    and the per-split totals are 1-row broadcast scalars), binning is a
    map-side count-of-cuts-below-value against the broadcast cut array
    (the skew_range_rebalance primitive — no global window, no sort),
    and the report joins two ``num_bins``-row count frames to a literal
    bin spine.  Spark ``percentile`` is bit-identical to DuckDB
    ``quantile_cont`` (verified by skew_range_rebalance), so the whole
    report replays in SQL; ``approx_percentile`` is the 100 TB switch,
    same plan shape."""
    fracs = [i / num_bins for i in range(1, num_bins)]
    cuts = ref.agg(
        F.percentile(F.col(col), F.array(*[F.lit(f) for f in fracs])).alias(
            "c"
        )
    )

    def _bins(df: DataFrame) -> DataFrame:
        return (
            df.crossJoin(F.broadcast(cuts))
            .select(
                F.when(F.col(col).isNull(), F.lit(-1))
                .otherwise(
                    F.size(F.filter(F.col("c"), lambda x: F.col(col) > x))
                )
                .cast("int")
                .alias("bin")
            )
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    spark = ref.sparkSession
    spine = spark.range(-1, num_bins).select(F.col("id").cast("int").alias("bin"))
    rc = _bins(ref).withColumnRenamed("n", "_nr")
    cc = _bins(cur).withColumnRenamed("n", "_nc")
    tots = ref.agg(F.count(F.lit(1)).alias("_tr")).crossJoin(
        cur.agg(F.count(F.lit(1)).alias("_tc"))
    )
    j = (
        spine.join(rc, on="bin", how="left")
        .join(cc, on="bin", how="left")
        .crossJoin(F.broadcast(tots))
        .select(
            "bin",
            F.coalesce(F.col("_nr"), F.lit(0)).cast("bigint").alias("n_ref"),
            F.coalesce(F.col("_nc"), F.lit(0)).cast("bigint").alias("n_cur"),
            "_tr",
            "_tc",
        )
    )
    p = (F.col("n_ref").cast("double") + F.lit(1.0)) / (
        F.col("_tr").cast("double") + F.lit(float(num_bins + 1))
    )
    q = (F.col("n_cur").cast("double") + F.lit(1.0)) / (
        F.col("_tc").cast("double") + F.lit(float(num_bins + 1))
    )
    return j.select(
        "bin",
        "n_ref",
        "n_cur",
        p.alias("p_ref"),
        q.alias("p_cur"),
        ((q - p) * F.log(q / p)).alias("psi_term"),
    )


def distribution_drift_by_group(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    group_col: str,
    num_bins: int = 10,
) -> DataFrame:
    """Per-segment PSI: distribution_drift generalized over a group key
    — the monitor that catches drift confined to ONE segment (a single
    source, region, or tenant) that the global PSI dilutes below the
    alarm threshold.  Same binning contract as the ungrouped twin
    (reference-decile edges per group, NULLs in the dedicated -1 bin,
    add-one smoothing over num_bins + 1 bins), grouped end to end:

    * per-group cut arrays come from ONE grouped percentile aggregate
      (groups x (num_bins-1) doubles — a broadcastable table at any
      fact size);
    * binning joins the cut table on the group key and stays map-side
      after that join;
    * the report joins per-(group, bin) counts to a groups x bins spine
      so abandoned bins still score.

    Output: (group, bin, n_ref, n_cur, p_ref, p_cur, psi_term);
    sum(psi_term) per group is that segment's PSI."""
    fracs = [i / num_bins for i in range(1, num_bins)]
    cuts = ref.groupBy(F.col(group_col).alias("_g")).agg(
        F.percentile(F.col(col), F.array(*[F.lit(f) for f in fracs])).alias(
            "c"
        )
    )

    def _bins(df: DataFrame) -> DataFrame:
        return (
            df.join(
                F.broadcast(cuts), on=df[group_col] == cuts["_g"], how="inner"
            )
            .select(
                F.col("_g"),
                F.when(F.col(col).isNull(), F.lit(-1))
                .otherwise(
                    F.size(F.filter(F.col("c"), lambda x: F.col(col) > x))
                )
                .cast("int")
                .alias("bin"),
            )
            .groupBy("_g", "bin")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    spark = ref.sparkSession
    spine = (
        cuts.select("_g")
        .crossJoin(
            spark.range(-1, num_bins).select(
                F.col("id").cast("int").alias("bin")
            )
        )
    )
    rc = _bins(ref).withColumnRenamed("n", "_nr")
    cc = _bins(cur).withColumnRenamed("n", "_nc")
    tr = ref.groupBy(F.col(group_col).alias("_g")).agg(
        F.count(F.lit(1)).alias("_tr")
    )
    tc = cur.groupBy(F.col(group_col).alias("_g")).agg(
        F.count(F.lit(1)).alias("_tc")
    )
    j = (
        spine.join(rc, on=["_g", "bin"], how="left")
        .join(cc, on=["_g", "bin"], how="left")
        .join(F.broadcast(tr), on="_g", how="left")
        .join(F.broadcast(tc), on="_g", how="left")
        .select(
            F.col("_g").alias(group_col),
            "bin",
            F.coalesce(F.col("_nr"), F.lit(0)).cast("bigint").alias("n_ref"),
            F.coalesce(F.col("_nc"), F.lit(0)).cast("bigint").alias("n_cur"),
            F.coalesce(F.col("_tr"), F.lit(0)).alias("_tr"),
            F.coalesce(F.col("_tc"), F.lit(0)).alias("_tc"),
        )
    )
    p = (F.col("n_ref").cast("double") + F.lit(1.0)) / (
        F.col("_tr").cast("double") + F.lit(float(num_bins + 1))
    )
    q = (F.col("n_cur").cast("double") + F.lit(1.0)) / (
        F.col("_tc").cast("double") + F.lit(float(num_bins + 1))
    )
    return j.select(
        group_col,
        "bin",
        "n_ref",
        "n_cur",
        p.alias("p_ref"),
        q.alias("p_cur"),
        ((q - p) * F.log(q / p)).alias("psi_term"),
    )


def ks_drift(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    num_bins: int = 50,
    alpha_coeff: float = 1.358,
) -> DataFrame:
    """Binned two-sample Kolmogorov-Smirnov drift statistic between a
    reference and a current split of one numeric column — the
    complementary monitor to PSI (``distribution_drift``): PSI weights
    relative density shifts per bin; KS is the sup-distance between the
    empirical CDFs, sensitive to a consistent location/scale shift that
    spreads thinly over many bins.

    The statistic is evaluated at the reference's ``num_bins``-quantile
    boundaries (the classic histogram KS): exact KS needs a global sort
    of both samples — a single-partition funnel at 100 TB — while the
    binned form is two mergeable aggregation passes against a broadcast
    cut array, and its value is the true KS restricted to the cut
    points (a lower bound that converges as bins grow; 50 bins resolve
    CDF steps of 2%).  NULLs are excluded from the CDFs (KS is defined
    over values) and reported as per-split counts so a NULL surge stays
    visible next to the statistic.

    Returns ONE row: (n_ref, n_cur, n_null_ref, n_null_cur, ks_stat,
    threshold, alarm) where ``threshold`` is the large-sample critical
    value ``alpha_coeff * sqrt((n1+n2)/(n1*n2))`` (1.358 = alpha 0.05)
    and ``alarm = ks_stat > threshold``.

    Plan shape: one percentile aggregate (1-row broadcast cut array),
    one map-side binning pass + bin-keyed count per split, cumulative
    CDFs via a window over the BOUNDED bin spine (num_bins rows — never
    fact rows), and a final max-abs-diff aggregate.  Counts are exact
    integers; each CDF value is one integer/integer double division, so
    the whole report replays bit-for-bit in SQL.

    Degenerate splits (r08 ADVICE): if either split is EMPTY or
    all-NULL, the quantile cuts and/or a CDF denominator are NULL and
    the row comes back with NULL ks_stat/threshold/alarm — deliberately
    distinct from ``alarm = false`` so a monitoring consumer that gates
    on the boolean sees "statistic undefined", not "no drift".  Treat a
    NULL alarm as a data-availability page (the n_ref/n_cur/n_null_*
    counts in the same row say which split vanished).  The streaming
    twin ``streaming.drift.ks_from_counts`` returns Python ``None`` for
    the same condition — one contract, two spellings (SQL NULL vs
    driver-side None)."""
    fracs = [i / num_bins for i in range(1, num_bins)]
    cuts = ref.agg(
        F.percentile(F.col(col), F.array(*[F.lit(f) for f in fracs])).alias(
            "c"
        )
    )

    def _bins(df: DataFrame) -> DataFrame:
        return (
            df.filter(F.col(col).isNotNull())
            .crossJoin(F.broadcast(cuts))
            .select(
                F.size(F.filter(F.col("c"), lambda x: F.col(col) > x))
                .cast("int")
                .alias("bin")
            )
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    spark = ref.sparkSession
    spine = spark.range(0, num_bins).select(
        F.col("id").cast("int").alias("bin")
    )
    rc = _bins(ref).withColumnRenamed("n", "_nr")
    cc = _bins(cur).withColumnRenamed("n", "_nc")
    tots = (
        ref.agg(
            F.count(F.col(col)).alias("_tr"),
            (F.count(F.lit(1)) - F.count(F.col(col))).alias("_nullr"),
        )
        .crossJoin(
            cur.agg(
                F.count(F.col(col)).alias("_tc"),
                (F.count(F.lit(1)) - F.count(F.col(col))).alias("_nullc"),
            )
        )
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        spine.join(rc, on="bin", how="left")
        .join(cc, on="bin", how="left")
        .select(
            "bin",
            F.coalesce(F.col("_nr"), F.lit(0)).alias("_nr"),
            F.coalesce(F.col("_nc"), F.lit(0)).alias("_nc"),
        )
        .select(
            "bin",
            F.sum("_nr").over(w).alias("_cr"),
            F.sum("_nc").over(w).alias("_cc"),
        )
    )
    ks = cum.crossJoin(F.broadcast(tots)).agg(
        F.max(
            F.abs(
                F.col("_cr").cast("double") / F.col("_tr").cast("double")
                - F.col("_cc").cast("double") / F.col("_tc").cast("double")
            )
        ).alias("ks_stat")
    )
    # casts BEFORE the multiply: long * long would overflow (ANSI mode
    # throws) once both splits exceed ~3e9 rows — the 100 TB case
    thr = F.lit(alpha_coeff) * F.sqrt(
        (F.col("_tr").cast("double") + F.col("_tc").cast("double"))
        / (F.col("_tr").cast("double") * F.col("_tc").cast("double"))
    )
    return ks.crossJoin(F.broadcast(tots)).select(
        F.col("_tr").cast("bigint").alias("n_ref"),
        F.col("_tc").cast("bigint").alias("n_cur"),
        F.col("_nullr").cast("bigint").alias("n_null_ref"),
        F.col("_nullc").cast("bigint").alias("n_null_cur"),
        "ks_stat",
        thr.alias("threshold"),
        (F.col("ks_stat") > thr).alias("alarm"),
    )


def k_anonymity(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
    sensitive_col: str | None = None,
    l_diversity: int = 2,
) -> DataFrame:
    """Privacy-risk audit for a table about to enter a training corpus:
    list every quasi-identifier combination that fails k-anonymity
    (fewer than ``k`` rows share the combination — those rows are
    re-identifiable by joining the quasi-identifiers against any outside
    dataset) and, when ``sensitive_col`` is given, l-diversity (a group
    where everyone shares one sensitive value leaks that value even at
    group size >= k).

    Output: the quasi-identifier columns + ``group_size`` (+
    ``n_distinct_sensitive`` when audited), one row per AT-RISK group —
    ``group_size < k`` or ``n_distinct_sensitive < l_diversity``.  An
    empty result certifies the projection safe to release at (k, l).

    Scale shape: ONE hash aggregation keyed by the quasi-identifier
    tuple (mergeable count + exact distinct), then a filter — no joins,
    no windows; output is bounded by the at-risk group count, never the
    table."""
    aggs = [F.count(F.lit(1)).alias("group_size")]
    risk = F.col("group_size") < k
    if sensitive_col is not None:
        aggs.append(
            F.countDistinct(F.col(sensitive_col)).alias(
                "n_distinct_sensitive"
            )
        )
    out = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(*aggs)
    if sensitive_col is not None:
        risk = risk | (F.col("n_distinct_sensitive") < l_diversity)
    return out.filter(risk)


def ab_test_proportions(
    df: DataFrame,
    variant_col: str,
    convert_col: str,
    control: str = "A",
    treatment: str = "B",
    z_critical: float = 1.96,
) -> DataFrame:
    """Two-proportion z-test between a control and a treatment variant —
    the experiment-analysis primitive (conversion-rate A/B test).  Input
    is one row per UNIT (user) with its variant and a 0/1 conversion
    flag; aggregating events to units is the caller's join (sessions and
    repeat events must not inflate n).

    Returns ONE row: per-variant unit and conversion counts, rates, the
    absolute lift, the pooled-variance z-score, and
    ``significant = |z| > z_critical`` (1.96 = two-sided alpha 0.05).
    Degenerate pools (p_pool 0 or 1 — zero or universal conversion)
    yield NULL z rather than a division blow-up.

    Exactness: counts are integers; every double expression has ONE
    fixed association mirrored by the SQL oracle (p = c/n computed
    per-variant FIRST, then differenced; the pooled variance term is
    p*(1-p)*(1/na+1/nb) in that order).  Scale shape: one mergeable
    variant-keyed aggregation, two 1-row scalar frames crossed — no
    windows, no fact-row joins."""
    agg = (
        df.groupBy(F.col(variant_col).alias("_v"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(convert_col).cast("long")).alias("c"),
        )
    )
    a = agg.filter(F.col("_v") == control).select(
        F.col("n").alias("n_control"), F.col("c").alias("conv_control")
    )
    b = agg.filter(F.col("_v") == treatment).select(
        F.col("n").alias("n_treatment"), F.col("c").alias("conv_treatment")
    )
    j = a.crossJoin(b)
    na = F.col("n_control").cast("double")
    nb = F.col("n_treatment").cast("double")
    pa = F.col("conv_control").cast("double") / na
    pb = F.col("conv_treatment").cast("double") / nb
    pp = (F.col("conv_control") + F.col("conv_treatment")).cast("double") / (
        (F.col("n_control") + F.col("n_treatment")).cast("double")
    )
    se = F.sqrt(pp * (F.lit(1.0) - pp) * (F.lit(1.0) / na + F.lit(1.0) / nb))
    z = F.when(
        (pp > F.lit(0.0)) & (pp < F.lit(1.0)), (pb - pa) / se
    )
    return j.select(
        F.col("n_control").cast("bigint").alias("n_control"),
        F.col("conv_control").cast("bigint").alias("conv_control"),
        F.col("n_treatment").cast("bigint").alias("n_treatment"),
        F.col("conv_treatment").cast("bigint").alias("conv_treatment"),
        pa.alias("rate_control"),
        pb.alias("rate_treatment"),
        (pb - pa).alias("lift"),
        z.alias("z_score"),
        F.when(z.isNotNull(), F.abs(z) > F.lit(z_critical)).alias(
            "significant"
        ),
    )


def dp_histogram(
    df: DataFrame,
    group_col: str,
    epsilon: float = 1.0,
    seed: int = 8,
) -> DataFrame:
    """Laplace-mechanism histogram release: per-group counts with
    Laplace(sensitivity/epsilon) noise — the standard way to publish
    aggregate statistics about a sensitive table (the release view is
    (group, noisy_count); this REPORT form keeps the true count and
    absolute error alongside for calibration, the same convention as
    the sketch accuracy reports).  Sensitivity is 1 under the
    one-row-per-unit contract (each unit contributes one row to one
    group — pre-aggregate to units first, as with ab_test_proportions).

    The Laplace draw inverts a uniform derived from a seeded md5 of the
    group key: u = (h + 0.5) / 2^60 in (0,1), noise =
    -(1/eps) * sign(u - 1/2) * ln(1 - 2*|u - 1/2|).  Seeded determinism
    makes the mechanism testable and SQL-replayable; a PRODUCTION
    release must draw the seed secretly per release (a public seed
    de-randomizes the mechanism and voids the epsilon guarantee) — the
    noise SHAPE, dataflow, and accuracy are what this operator pins.

    Scale shape: one mergeable count aggregation; the noise expression
    is map-side arithmetic on the group-cardinality-sized result."""
    b = 1.0 / epsilon
    counts = df.groupBy(F.col(group_col)).agg(
        F.count(F.lit(1)).alias("true_count")
    )
    from ..functions.text_fns import md5_hash60

    u = (
        md5_hash60(F.col(group_col).cast("string"), seed=seed).cast("double")
        + F.lit(0.5)
    ) / F.lit(1152921504606846976.0)
    noise = (
        F.lit(-b)
        * F.signum(u - F.lit(0.5))
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u - F.lit(0.5)))
    )
    return counts.select(
        group_col,
        F.col("true_count").cast("bigint").alias("true_count"),
        (F.col("true_count").cast("double") + noise).alias("noisy_count"),
        F.abs(noise).alias("abs_error"),
    )


def benford_report(
    df: DataFrame,
    col: str,
) -> DataFrame:
    """First-digit Benford's-law conformance report — the classic
    anomaly screen for naturally-occurring amount columns (fabricated
    or gamed values rarely follow log-uniform digit frequencies).  For
    every leading digit d in 1..9: observed count and frequency over
    the positive values, the Benford expectation ln(1+1/d)/ln(10), and
    the Pearson chi-square term n*(p_obs-p_exp)^2/p_exp — sum of the
    column is the test statistic (8 degrees of freedom).

    The leading digit is pure double arithmetic — floor(v / 10^
    floor(log10(v))) — so no string formatting is involved and the
    whole report replays in SQL.  One mergeable aggregation keyed by
    the 9-value digit; the total rides as a 1-row broadcast scalar."""
    pos = df.filter(F.col(col) > 0).select(F.col(col).cast("double").alias("v"))
    digit = F.floor(
        F.col("v") / F.pow(F.lit(10.0), F.floor(F.log10(F.col("v"))))
    ).cast("int")
    counts = pos.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = pos.agg(F.count(F.lit(1)).alias("_t"))
    obs = F.col("n").cast("double") / F.col("_t").cast("double")
    exp = F.log(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double")) / F.log(
        F.lit(10.0)
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.col("n").cast("bigint").alias("n"),
            obs.alias("observed_p"),
            exp.alias("expected_p"),
            (
                F.col("_t").cast("double")
                * ((obs - exp) * (obs - exp) / exp)
            ).alias("chi2_term"),
        )
    )


def welch_ttest(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str = "A",
    group_b: str = "B",
) -> DataFrame:
    """Welch's unequal-variance two-sample t-test on a CONTINUOUS
    metric — the companion to ab_test_proportions (that one tests
    conversion rates; this one tests revenue-per-user, latency,
    tokens-per-doc).  Returns ONE row: (n_a, n_b, mean_a, mean_b,
    t_stat, df_welch, reject_at_95) with the Welch-Satterthwaite
    degrees of freedom and a fixed 1.96 large-sample critical value
    (the exact t quantile needs an incomplete-beta inverse; at the
    corpus sizes this engine targets, df is in the thousands and the
    normal approximation is the published practice).

    Exactness: per-group count/sum/sum-of-squares accumulate as
    DECIMAL(38,6) (order-free, one mergeable aggregation pass); every
    downstream quantity is closed-form double arithmetic in one fixed
    association the oracle mirrors.

    Degenerate inputs: a singleton group (n=1) has undefined sample
    variance — the division by (n-1) yields NULL/Infinity downstream
    rather than a silent wrong answer; a group entirely absent from
    ``group_col`` produces an EMPTY result frame (the cross join has
    nothing to pair).  Gate upstream if either can occur."""
    dec = "decimal(38,6)"
    x = F.col(value_col).cast("double")
    g = (
        df.filter(F.col(group_col).isin(group_a, group_b))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(x.cast(dec)).alias("_s"),
            F.sum((x * x).cast(dec)).alias("_ss"),
        )
    )
    a = g.filter(F.col(group_col) == group_a).select(
        F.col("_n").alias("na"), F.col("_s").alias("sa"), F.col("_ss").alias("ssa")
    )
    b = g.filter(F.col(group_col) == group_b).select(
        F.col("_n").alias("nb"), F.col("_s").alias("sb"), F.col("_ss").alias("ssb")
    )
    j = a.crossJoin(b)
    na, nb = F.col("na").cast("double"), F.col("nb").cast("double")
    ma = F.col("sa").cast("double") / na
    mb = F.col("sb").cast("double") / nb
    va = (F.col("ssa").cast("double") - na * ma * ma) / (na - F.lit(1.0))
    vb = (F.col("ssb").cast("double") - nb * mb * mb) / (nb - F.lit(1.0))
    sea = va / na
    seb = vb / nb
    t = (ma - mb) / F.sqrt(sea + seb)
    dfw = (sea + seb) * (sea + seb) / (
        sea * sea / (na - F.lit(1.0)) + seb * seb / (nb - F.lit(1.0))
    )
    return j.select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        ma.alias("mean_a"),
        mb.alias("mean_b"),
        t.alias("t_stat"),
        dfw.alias("df_welch"),
        (F.abs(t) > F.lit(1.96)).alias("reject_at_95"),
    )


def mann_whitney_binned(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str = "A",
    group_b: str = "B",
    num_bins: int = 50,
) -> DataFrame:
    """Binned Mann-Whitney U rank-sum test — the DISTRIBUTION-FREE
    companion to welch_ttest (that one compares means and leans on
    normality; this one asks "does one variant stochastically dominate
    the other", robust to the heavy-tailed revenue metrics A/B units
    actually produce).

    Exact ranks need a global sort of the pooled sample — a
    single-partition funnel at scale — so the statistic is evaluated on
    the pooled distribution's ``num_bins``-quantile bins (the ks_drift
    move): every value in a bin shares that bin's MIDRANK, which is
    precisely the standard tie-handling rule with bins as tie groups,
    and the tie-corrected normal approximation is exact FOR THE BINNED
    statistic.  Two mergeable aggregation passes (percentile cuts, bin
    counts per group); cumulative ranks via a window over the BOUNDED
    bin spine; never fact rows.

    Exactness: bin counts are exact integers; rank sums accumulate as
    DECIMAL(38,1) of exact half-integer midrank terms (doubled to stay
    integral, halved once at the end); the z closed form is double
    arithmetic in one fixed association the oracle mirrors, with the
    tie correction sum(t^3 - t) as exact BIGINTs.

    Returns ONE row: (n_a, n_b, u_a, z_stat, reject_at_95) where
    ``u_a`` counts (a, b) pairs with a ranked higher (ties half).

    ``F.percentile`` here is the EXACT aggregate (bit-identical to
    DuckDB quantile_cont — the oracle contract); like ks_drift, the
    100 TB switch is ``approx_percentile`` for the cuts, which changes
    only WHERE the bin boundaries fall, not the statistic's validity
    (any fixed binning yields a legitimate binned U)."""
    pooled = df.filter(
        F.col(group_col).isin(group_a, group_b)
        & F.col(value_col).isNotNull()
    ).select(
        F.col(group_col).alias("_g"),
        F.col(value_col).cast("double").alias("_v"),
    )
    fracs = [i / num_bins for i in range(1, num_bins)]
    cuts = pooled.agg(
        F.percentile(F.col("_v"), F.array(*[F.lit(f) for f in fracs])).alias(
            "c"
        )
    )
    binned = (
        pooled.crossJoin(F.broadcast(cuts))
        .select(
            "_g",
            F.size(F.filter(F.col("c"), lambda x: F.col("_v") > x))
            .cast("int")
            .alias("bin"),
        )
        .groupBy("bin")
        .agg(
            F.sum(F.when(F.col("_g") == group_a, 1).otherwise(0))
            .cast("bigint")
            .alias("_na"),
            F.sum(F.when(F.col("_g") == group_b, 1).otherwise(0))
            .cast("bigint")
            .alias("_nb"),
        )
    )
    w = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, -1
    )
    t_i = F.col("_na") + F.col("_nb")
    # doubled midrank stays integral: 2*(below + (t+1)/2) = 2*below+t+1
    dm = F.lit(2) * F.coalesce(
        F.sum(t_i).over(w), F.lit(0).cast("bigint")
    ) + t_i + F.lit(1)
    per_bin = binned.select(
        "_na",
        "_nb",
        t_i.alias("_t"),
        dm.alias("_dm"),
    )
    tot = per_bin.agg(
        F.sum("_na").cast("bigint").alias("n_a"),
        F.sum("_nb").cast("bigint").alias("n_b"),
        # DECIMAL(38,1) exact: na * doubled-midrank is integral
        F.sum((F.col("_na") * F.col("_dm")).cast("decimal(38,1)")).alias(
            "_2ra"
        ),
        F.sum(F.col("_t") * F.col("_t") * F.col("_t") - F.col("_t"))
        .cast("bigint")
        .alias("_s3"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    n = na + nb
    ra = F.col("_2ra").cast("double") / F.lit(2.0)
    ua = ra - na * (na + F.lit(1.0)) / F.lit(2.0)
    mean_u = na * nb / F.lit(2.0)
    var_u = na * nb / F.lit(12.0) * (
        (n + F.lit(1.0))
        - F.col("_s3").cast("double") / (n * (n - F.lit(1.0)))
    )
    z = (ua - mean_u) / F.sqrt(var_u)
    return tot.select(
        "n_a",
        "n_b",
        ua.alias("u_a"),
        z.alias("z_stat"),
        (F.abs(z) > F.lit(1.96)).alias("reject_at_95"),
    )


def chi2_independence(
    df: DataFrame,
    row_col: str,
    col_col: str,
) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns — the contingency-table companion to ab_test_proportions
    (2-proportion z) and welch_ttest (continuous): does event mix
    differ by variant, does language mix differ by source?

    Returns the full per-cell diagnostic table — (row value, col value,
    n_observed, n_expected, chi2_contrib) — rather than only the
    statistic: the cells ARE the product (which combination deviates),
    and the statistic is their sum with df = (r-1)(c-1).

    Exactness: observed counts and the row/col/grand totals are exact
    BIGINTs from bounded aggregations; expected and contribution are
    closed-form doubles in one fixed association the oracle mirrors
    ((rt * ct) / n, then ((o - e) * (o - e)) / e).

    Zero cells count: the grid is the CROSS of the observed row and
    column margins, not just observed combinations — a (row, col) pair
    that never co-occurs carries its full e contribution (observed 0),
    which is exactly the dependence signal a sparse contingency table
    exists to surface.

    Scale shape: one fact-scan groupBy onto the (r x c)-bounded cell
    table; margins are two more bounded aggregations, the grid is a
    margins cross join (r x c rows), the grand total a 1-row cross
    join — no global windows, nothing fact-sized downstream."""
    cells = df.groupBy(row_col, col_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_observed")
    )
    row_t = cells.groupBy(row_col).agg(F.sum("n_observed").alias("_rt"))
    col_t = cells.groupBy(col_col).agg(F.sum("n_observed").alias("_ct"))
    grand = cells.agg(F.sum("n_observed").alias("_n"))
    o = F.col("n_observed").cast("double")
    e = (F.col("_rt").cast("double") * F.col("_ct").cast("double")) / F.col(
        "_n"
    ).cast("double")
    grid = row_t.crossJoin(col_t)
    out = (
        grid.join(cells, on=[row_col, col_col], how="left")
        .na.fill({"n_observed": 0})
        .crossJoin(F.broadcast(grand))
        .select(
            row_col,
            col_col,
            F.col("n_observed").cast("bigint").alias("n_observed"),
            e.alias("n_expected"),
            (((o - e) * (o - e)) / e).alias("chi2_contrib"),
        )
    )
    return out


# Poisson(1) inverse-CDF thresholds: cumulative P(X <= k) for k = 0..7;
# weights above the last threshold cap at 8 (P ~ 1e-6 at corpus sizes).
# Literals are shortest-round-trip doubles so the oracle SQL parses the
# bit-identical values.
POISSON1_CDF = [
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238463,
    0.9963401531726563,
    0.9994058151824183,
    0.999916758850712,
    0.9999897508033253,
]


def poisson_bootstrap_means(
    df: DataFrame,
    key_col: str,
    value_col: str,
    replicates: int = 40,
) -> DataFrame:
    """Deterministic Poisson bootstrap of a mean: every unit's weight in
    replicate b is Poisson(1) drawn by inverse-CDF on a uniform derived
    from md5(key:b) — the streaming-friendly bootstrap (Chamandy et al.,
    "Estimating Uncertainty for Massive Data Streams", Google 2012):
    no resample materialization, no shared state, each row computes its
    own B weights map-side.  md5 makes the draw portable: reruns AND
    the DuckDB oracle reproduce the identical resamples, so the CI is
    a replayable artifact, not a seed-lottery ticket.

    Returns ``replicates`` rows: (replicate, n_effective, boot_mean).
    Percentiles of boot_mean over this bounded frame are the CI.

    Exactness: the uniform is md5_hash60 / 2^60 (both engines round the
    60-bit int to the same nearest double; the power-of-two division is
    exact), thresholds are shortest-round-trip literals, weighted sums
    accumulate as DECIMAL(38,6) (order-free) with exact BIGINT weight
    totals.

    Scale shape: one scan with a replicates-way explode, collapsed by
    map-side partial aggregation to ``replicates`` rows per task before
    the only shuffle — output is B rows, never fact-sized."""
    from ..functions.text_fns import md5_hash60

    x = F.col(value_col).cast("double")
    rows = df.select(
        F.col(key_col).cast("string").alias("_k"),
        x.alias("_x"),
        F.explode(
            F.sequence(F.lit(0), F.lit(replicates - 1))
        ).alias("replicate"),
    )
    u = md5_hash60(
        F.concat_ws(":", F.col("_k"), F.col("replicate").cast("string"))
    ).cast("double") / F.lit(1152921504606846976.0)  # 2^60
    w = F.lit(8)
    for k in range(len(POISSON1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(POISSON1_CDF[k]), F.lit(k)).otherwise(w)
    weighted = rows.select(
        "replicate",
        w.cast("long").alias("_w"),
        F.col("_x"),
    )
    return weighted.groupBy("replicate").agg(
        F.sum("_w").cast("bigint").alias("n_effective"),
        (
            F.sum((F.col("_w") * F.col("_x")).cast("decimal(38,6)")).cast(
                "double"
            )
            / F.sum("_w").cast("double")
        ).alias("boot_mean"),
    ).select(F.col("replicate").cast("int").alias("replicate"),
             "n_effective", "boot_mean")
