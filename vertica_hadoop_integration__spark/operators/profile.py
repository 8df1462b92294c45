"""Table profiling: per-column stats in ONE scan.

Catalog-adjacent, like the reference's schema reflection
(``sqoop_table.py:114-129`` reads names/types from ``v_catalog.columns``;
this adds the value-level stats a migration needs to validate a load).
All columns are profiled in a single aggregation job — never one scan
per column. Exact distinct counts expand the aggregate per column;
``approx=True`` switches to HLL++ for the 100 TB path (single pass,
fixed state)."""

from __future__ import annotations

from pyspark.sql import DataFrame
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
