"""Approximate/sketch aggregates: KMV distinct-count, HLL++ (Spark
built-in), approximate quantiles.

The reference's only aggregates are count/min (``sqoop_table.py:55``,
``sqoop_json.py:31``); at 100 TB the exact forms of COUNT(DISTINCT) and
exact percentiles are shuffle-heavy (distinct carries every key;
percentile sorts), so sketch forms are first-class here:

* ``kmv_distinct`` — k-minimum-values estimator built from Catalyst
  primitives only: deterministic given the hash function, mergeable
  (the k smallest of a union is computable from each side's k smallest),
  and the shuffle carries at most k longs per group.
* ``hll_distinct`` — Spark's native HLL++ (``approx_count_distinct``),
  the production default: single pass, fixed ~KB state per group.
* ``approx_quantiles`` — ``percentile_approx`` (Greenwald-Khanna):
  single pass, bounded state, vs. a full sort for exact percentiles.

Estimates are engine-specific, so these register rows-only with the
driver; error bounds vs the exact answers are asserted in
tests/test_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.df_utils import spread


def kmv_distinct(
    df: DataFrame,
    col: str,
    group_cols: tuple[str, ...] = (),
    k: int = 64,
) -> DataFrame:
    """K-minimum-values distinct estimate per group.

    Hash each value to (0, 1]; with n distinct values the k-th smallest
    hash sits at ~k/n, so n_hat = (k-1)/h_k. Exact when a group has < k
    distinct values (falls back to the observed count). Relative error
    ~1/sqrt(k-2) (~13% at k=64).

    Plan shape: distinct on (group, hash) — the only wide exchange, and
    it carries hashes, not values — then a bounded top-k window (rank
    <= k prunes partial-sort-side) per group, then a tiny groupBy; the
    UNGROUPED sketch instead takes its bottom-k with orderBy+limit
    (TakeOrderedAndProject — per-partition partial bottom-k heaps,
    never a single-partition global window). No value ever crosses the
    wire; memory per group is O(k)."""
    gcols = [F.col(g) for g in group_cols]
    # signed long -> (0, 1]: shift to unsigned range, scale by 2^64
    u = (F.col("_h").cast("double") + 9223372036854775808.0) / 18446744073709551616.0
    hashed = df.select(*gcols, F.xxhash64(F.col(col)).alias("_h")).distinct()
    if group_cols:
        w = Window.partitionBy(*[F.col(g) for g in group_cols]).orderBy(
            F.col("_h").asc()
        )
        topk = (
            hashed.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .withColumn("_u", u)
        )
    else:
        topk = hashed.orderBy(F.col("_h").asc()).limit(k).withColumn("_u", u)
    agg = topk.groupBy(*[F.col(g) for g in group_cols]).agg(
        F.count(F.lit(1)).alias("_m"),
        F.max("_u").alias("_hk"),
    )
    est = F.when(F.col("_m") < k, F.col("_m").cast("double")).otherwise(
        (F.lit(float(k - 1))) / F.col("_hk")
    )
    return agg.select(
        *[F.col(g) for g in group_cols],
        F.round(est).cast("long").alias("distinct_est"),
    )


def kmv_distinct_portable(
    df: DataFrame,
    col: str,
    group_cols: tuple[str, ...] = (),
    k: int = 64,
) -> DataFrame:
    """KMV distinct estimate with the portable md5 60-bit hash
    (functions/text_fns.py::md5_hash60) instead of xxhash64, which makes
    the WHOLE estimator — hash, top-k selection, estimate arithmetic —
    replayable in DuckDB SQL, so the driver's oracle verifies the sketch
    logic exactly rather than rows-only. Same plan shape and O(k)
    per-group state as ``kmv_distinct``; the estimate is returned as the
    raw DOUBLE (no rounding) so both engines emit the identical IEEE
    value: u = (h+1)/2^60 in (0,1], n_hat = (k-1)/u_k, exact fallback to
    the observed count below k. xxhash64 ``kmv_distinct`` remains the
    production default (cheaper hash)."""
    from ..functions.text_fns import md5_hash60

    gcols = [F.col(g) for g in group_cols]
    hashed = df.select(
        *gcols, md5_hash60(F.col(col).cast("string")).alias("_h")
    ).distinct()
    # 60-bit hash -> (0, 1]: (h + 1) / 2^60, associated exactly as the
    # oracle writes it so the doubles match bitwise
    u = (F.col("_h").cast("double") + F.lit(1.0)) / F.lit(1152921504606846976.0)
    if group_cols:
        w = Window.partitionBy(*[F.col(g) for g in group_cols]).orderBy(
            F.col("_h").asc()
        )
        topk = (
            hashed.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .withColumn("_u", u)
        )
    else:
        # mergeable bottom-k (TakeOrderedAndProject), not a global window
        topk = hashed.orderBy(F.col("_h").asc()).limit(k).withColumn("_u", u)
    agg = topk.groupBy(*[F.col(g) for g in group_cols]).agg(
        F.count(F.lit(1)).alias("_m"),
        F.max("_u").alias("_hk"),
    )
    est = F.when(F.col("_m") < k, F.col("_m").cast("double")).otherwise(
        F.lit(float(k - 1)) / F.col("_hk")
    )
    return agg.select(
        *[F.col(g) for g in group_cols],
        est.alias("distinct_est"),
    )


def hll_distinct(
    df: DataFrame,
    col: str,
    group_cols: tuple[str, ...] = (),
    rsd: float = 0.05,
) -> DataFrame:
    """HLL++ distinct estimate per group (Spark built-in). rsd = target
    relative standard deviation; state size grows as 1/rsd^2."""
    return df.groupBy(*[F.col(g) for g in group_cols]).agg(
        F.approx_count_distinct(col, rsd).alias("distinct_est")
    )


def approx_quantiles(
    df: DataFrame,
    col: str,
    group_cols: tuple[str, ...] = (),
    probabilities: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
    accuracy: int = 10000,
) -> DataFrame:
    """Greenwald-Khanna approximate percentiles per group; max rank error
    is 1/accuracy. Output: group cols + q_<p> per probability."""
    probs = F.array(*[F.lit(p) for p in probabilities])
    agg = df.groupBy(*[F.col(g) for g in group_cols]).agg(
        F.percentile_approx(col, probs, F.lit(accuracy)).alias("_q")
    )
    return agg.select(
        *[F.col(g) for g in group_cols],
        *[
            F.col("_q")[i].alias(f"q_{str(p).replace('.', '_')}")
            for i, p in enumerate(probabilities)
        ],
    )


def countmin_cells(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Count-min sketch cells for the value stream in ``df[col]``:
    one row per (seed, pos) with the summed hit count, ``depth`` rows of
    ``width`` counters each.

    The sketch answers "how often does value X occur?" with bounded
    overestimate (eps ~ e/width, prob 1 - e^-depth) using fixed
    depth*width state — at 100 TB the exact per-value count table can be
    billions of rows (unbroadcastable), while these <= depth*width cells
    are a few KB, broadcastable to every probe site, and mergeable
    across corpus shards by cell-wise addition.

    Plan shape: one scan, map-side expansion to ``depth`` (seed, pos)
    pairs per row (a generator, not a join), then a single partial-agg
    shuffle that carries at most depth*width cells per map task.
    Positions use the portable md5-60 hash (functions/text_fns.py::
    md5_hash60) so the whole sketch replays in DuckDB SQL."""
    from ..functions.text_fns import md5_hash60

    v = F.col(col).cast("string")
    pairs = F.array(
        *[
            F.struct(
                F.lit(s).alias("seed"),
                F.pmod(md5_hash60(v, seed=s), F.lit(width)).alias("pos"),
            )
            for s in range(depth)
        ]
    )
    return (
        df.select(F.explode(pairs).alias("_sp"))
        .select(F.col("_sp.seed").alias("seed"), F.col("_sp.pos").alias("pos"))
        .groupBy("seed", "pos")
        .agg(F.count(F.lit(1)).alias("cell"))
    )


def countmin_estimate(
    cells: DataFrame,
    probes: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Estimated occurrence count for each probe value: the minimum over
    the ``depth`` sketch cells the value hashes to. Never underestimates;
    collisions only inflate. ``cells`` is structurally small (<=
    depth*width rows) and is broadcast, so probing is map-side — no
    shuffle of the probe stream beyond the final per-value min, which
    groups on the probe's own key."""
    from ..functions.text_fns import md5_hash60

    v = F.col(col).cast("string")
    pairs = F.array(
        *[
            F.struct(
                F.lit(s).alias("seed"),
                F.pmod(md5_hash60(v, seed=s), F.lit(width)).alias("pos"),
            )
            for s in range(depth)
        ]
    )
    exploded = probes.select(F.col(col), F.explode(pairs).alias("_sp")).select(
        F.col(col), F.col("_sp.seed").alias("seed"), F.col("_sp.pos").alias("pos")
    )
    joined = exploded.join(F.broadcast(cells), on=["seed", "pos"], how="left")
    return joined.groupBy(col).agg(
        F.min(F.coalesce(F.col("cell"), F.lit(0))).alias("est_cnt")
    )


def kmv_set_ops_portable(
    df_a: DataFrame,
    col_a: str,
    df_b: DataFrame,
    col_b: str,
    k: int = 64,
) -> DataFrame:
    """KMV SET-OPERATION estimates from two bottom-k sketches — the
    join-planning primitive: estimated distinct |A|, |B|, |A u B|,
    Jaccard, and |A n B| WITHOUT touching full data (each side reduces
    to k hashes; at 100 TB the sketches are built in each table's
    ingest pass and this merge is driver-trivial). Standard KMV
    algebra: the union sketch is the bottom-k of the merged sketches,
    J_est = |{h in union sketch : h in both sketches}| / k, and
    |A n B| ~= J_est * |A u B|_est. Portable md5-60 hashing end to
    end, estimate arithmetic associated exactly as the oracle writes
    it — the whole estimator replays in SQL. Exact-count error bounds
    are pytest-asserted; xxhash64 remains the production hash."""
    from ..functions.text_fns import md5_hash60

    def bottom_k(df, col):
        # orderBy + limit plans as TakeOrderedAndProject: per-partition
        # partial bottom-k merged on the driver — the mergeable-sketch
        # shape, no single-partition window
        hashed = df.select(md5_hash60(F.col(col).cast("string")).alias("_h")).distinct()
        return hashed.orderBy(F.col("_h").asc()).limit(k)

    ka = bottom_k(df_a, col_a).withColumn("_in_a", F.lit(1))
    kb = bottom_k(df_b, col_b).withColumn("_in_b", F.lit(1))
    merged = (
        ka.select("_h", "_in_a", F.lit(0).alias("_in_b"))
        .unionByName(kb.select("_h", F.lit(0).alias("_in_a"), "_in_b"))
        .groupBy("_h")
        .agg(F.max("_in_a").alias("a"), F.max("_in_b").alias("b"))
    )
    u_sketch = merged.orderBy(F.col("_h").asc()).limit(k)
    uval = (F.col("_mx").cast("double") + F.lit(1.0)) / F.lit(
        1152921504606846976.0
    )
    agg = u_sketch.agg(
        F.count(F.lit(1)).alias("_m"),
        F.max("_h").alias("_mx"),
        F.sum(F.col("a") * F.col("b")).alias("_both"),
    )
    union_est = F.when(F.col("_m") < k, F.col("_m").cast("double")).otherwise(
        F.lit(float(k - 1)) / uval
    )
    j_est = F.col("_both").cast("double") / F.col("_m").cast("double")
    est_a = kmv_distinct_portable(df_a, col_a, k=k).select(
        F.col("distinct_est").alias("est_a")
    )
    est_b = kmv_distinct_portable(df_b, col_b, k=k).select(
        F.col("distinct_est").alias("est_b")
    )
    out = agg.select(
        union_est.alias("est_union"),
        j_est.alias("jaccard_est"),
        (j_est * union_est).alias("est_intersection"),
    )
    return out.crossJoin(F.broadcast(est_a)).crossJoin(F.broadcast(est_b)).select(
        "est_a", "est_b", "est_union", "jaccard_est", "est_intersection"
    )


def hll_partial_rollup(
    df: DataFrame,
    col: str,
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("event_type",),
    lg_k: int = 12,
) -> DataFrame:
    """Mergeable-sketch rollup: per-(group, HOUR) Datasketches HLL
    partials, re-aggregated to per-(group, DAY) distinct estimates by
    UNIONING the partials — the raw stream is scanned ONCE.

    This is the distinct-count analogue of hypertable_rollup_events'
    cascading sums: sums re-aggregate for free, but COUNT(DISTINCT)
    does not — the hour partials of a naive distinct count cannot be
    added. The sketch partial is the fix: at 100 TB the hour-level
    sketch table (one ~2^lg_k-byte blob per group-hour) is the stored
    continuous-aggregate state, and every coarser window (day, week,
    month, all-time) is a cheap union over it; re-scanning the raw
    events for each window would cost a full pass per rollup level.

    Returns (group cols, day, distinct_users) with the day estimate
    rounded to BIGINT. Rows-only by design (the Datasketches estimator
    is not SQL-replayable); accuracy and union-consistency are
    pytest-bounded."""
    gcols = [F.col(g) for g in group_cols]
    hourly = df.groupBy(
        *gcols, F.date_trunc("hour", F.col(ts_col)).alias("hour")
    ).agg(F.hll_sketch_agg(F.col(col), F.lit(lg_k)).alias("sketch"))
    daily = hourly.groupBy(
        *gcols, F.to_date(F.col("hour")).alias("day")
    ).agg(F.hll_union_agg(F.col("sketch")).alias("day_sketch"))
    return daily.select(
        *gcols,
        "day",
        F.round(F.hll_sketch_estimate(F.col("day_sketch")))
        .cast("long")
        .alias("distinct_users"),
    )


def hll_distinct_portable(
    df: DataFrame,
    col: str,
    group_cols: tuple[str, ...] = (),
    p: int = 8,
) -> DataFrame:
    """Classic HyperLogLog (Flajolet et al. 2007) through the portable
    md5-60 hash — the HLL family's oracle-checked representative (the
    production default stays the built-in HLL++
    ``approx_count_distinct``, whose Spark-internal hash an external
    engine cannot replay).

    m = 2^p registers; bucket = top p hash bits; rho = leading-zero
    count of the remaining (60-p) bits + 1; register = max rho.  The
    harmonic sum is computed INTEGER-EXACT: sum(2^-rho_j) is scaled by
    2^R (R = the group's max register) so each term 2^(R-rho_j) is a
    BIGINT — with p=8 and 60-bit hashes the sum is <= 2^61, no overflow
    and no float-order drift; the single double division happens at the
    end.  Small-range correction (E <= 2.5m with empty registers ->
    linear counting m*ln(m/V)) matches the published estimator; ln/exp
    double parity with DuckDB is already relied on by the logreg oracle.

    Scale shape: one scan, partial max per (group, bucket) combines
    map-side; per-group state is <= m rows regardless of input size —
    the mergeable-sketch contract, same as hll_partial_rollup."""
    from ..functions.text_fns import md5_hash60

    # NULL values are ignored (approx_count_distinct semantics): a NULL
    # hashes to a NULL bucket that would otherwise form a phantom
    # register — counted in _nonempty but contributing NULL to the
    # harmonic sum, skewing both the empty-register credit and the sum
    df = df.filter(F.col(col).isNotNull())
    m = 1 << p
    h = md5_hash60(F.col(col).cast("string"))
    bucket = F.shiftright(h, 60 - p)
    rest = h.bitwiseAND(F.lit((1 << (60 - p)) - 1))
    # rho: 1-based position of the highest set bit counted from the MSB
    # of the (60-p)-bit field; all-zero field -> (60-p)+1.  bit_length
    # comes from the base-2 string (conv strips leading zeros), which is
    # INTEGER-EXACT — floor(log2(double)) can be off by one exactly at
    # register boundaries
    width = 60 - p
    rho = (
        F.when(rest == 0, F.lit(width + 1))
        .otherwise(F.lit(width) - F.length(F.conv(rest, 10, 2)) + 1)
        .cast("int")
    )
    regs = (
        df.select(*[F.col(g) for g in group_cols], bucket.alias("_b"), rho.alias("_rho"))
        .groupBy(*[F.col(g) for g in group_cols], F.col("_b"))
        .agg(F.max("_rho").alias("_reg"))
    )
    return _hll_estimate_from_regs(regs, group_cols, m)


def _hll_estimate_from_regs(
    regs: DataFrame, group_cols: tuple[str, ...], m: int
) -> DataFrame:
    """Published HLL estimator over a (group..., _b, _reg) register
    table — shared by hll_distinct_portable and the sliding-window
    merge (registers are max-mergeable, the estimator is identical).

    Integer-exact harmonic sum: each register contributes 2^(R - reg)
    with R = the group's max register, so the sum is a plain BIGINT
    (<= m * 2^R <= 2^61 for p=8 / 60-bit hashes) — float summation
    would round order-dependently once the term span exceeds the
    53-bit mantissa.  R comes from a window over the register table,
    which is <= m rows per group by construction (bounded input)."""
    gcols = [F.col(g) for g in group_cols]
    wr = Window.partitionBy(*[F.col(g) for g in group_cols])
    staged = regs.withColumn("_R", F.max("_reg").over(wr)).withColumn(
        "_term", F.expr("shiftleft(CAST(1 AS BIGINT), _R - _reg)")
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    per_group = staged.groupBy(*gcols).agg(
        F.max("_reg").alias("_R"),
        F.count(F.lit(1)).alias("_nonempty"),
        F.sum("_term").cast("long").alias("_sum_int"),
    )
    # E = alpha * m^2 / sum(2^-reg_j over ALL m registers); empty
    # registers contribute 2^0 = 1 each -> add (m - nonempty) * 2^R to
    # the scaled integer sum
    scaled = F.col("_sum_int") + (
        F.lit(m).cast("long") - F.col("_nonempty")
    ) * F.expr("shiftleft(CAST(1 AS BIGINT), _R)")
    e_raw = (
        F.lit(alpha * float(m) * float(m))
        * F.pow(F.lit(2.0), F.col("_R").cast("double"))
        / scaled.cast("double")
    )
    empties = F.lit(m).cast("long") - F.col("_nonempty")
    e_corr = F.when(
        (e_raw <= F.lit(2.5 * m)) & (empties > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / empties.cast("double")),
    ).otherwise(e_raw)
    return per_group.select(
        *gcols, e_corr.alias("distinct_est")
    )


def hll_sliding_distinct(
    df: DataFrame,
    col: str,
    ts_col: str = "ts",
    window_days: int = 7,
    p: int = 8,
) -> DataFrame:
    """Sliding-window distinct counts from MERGEABLE daily HLL sketches:
    one register table per day (the hll_partial_rollup shape), each
    day's registers fanned forward into the ``window_days`` windows
    they belong to (a map-only explode of day x m register rows — never
    fact rows), register-wise max-merge per window, then the shared
    published estimator.  The pattern that answers "distinct users over
    the trailing 7 days, every day" from state that is days x m rows
    total — the raw fact table is scanned ONCE regardless of how many
    windows it feeds, and adding a day merges m registers instead of
    recounting the window (the mergeable-sketch contract).

    Same portable md5-60 kernel as hll_distinct_portable, so the whole
    pipeline — daily registers, window fan-out, max-merge, estimator —
    replays in SQL.  Output: (window_end DATE, distinct_est DOUBLE),
    one row per day present in the data (windows ending on event-less
    days are not emitted)."""
    from ..functions.text_fns import md5_hash60

    df = df.filter(F.col(col).isNotNull())
    m = 1 << p
    h = md5_hash60(F.col(col).cast("string"))
    bucket = F.shiftright(h, 60 - p)
    rest = h.bitwiseAND(F.lit((1 << (60 - p)) - 1))
    width = 60 - p
    rho = (
        F.when(rest == 0, F.lit(width + 1))
        .otherwise(F.lit(width) - F.length(F.conv(rest, 10, 2)) + 1)
        .cast("int")
    )
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    day_regs = (
        df.select(day.alias("_day"), bucket.alias("_b"), rho.alias("_rho"))
        .groupBy("_day", "_b")
        .agg(F.max("_rho").alias("_reg"))
    )
    contrib = day_regs.select(
        F.explode(
            F.sequence(F.lit(0), F.lit(window_days - 1))
        ).alias("_i"),
        "_day",
        "_b",
        "_reg",
    ).select(
        F.date_add(F.col("_day"), F.col("_i")).alias("window_end"),
        "_b",
        "_reg",
    )
    merged = contrib.groupBy("window_end", "_b").agg(
        F.max("_reg").alias("_reg")
    )
    # only emit windows ending on a day that actually has events (the
    # fan-out also lands on the trailing ghost days after the last day)
    days = day_regs.select(F.col("_day").alias("window_end")).distinct()
    merged = merged.join(F.broadcast(days), on="window_end", how="left_semi")
    return _hll_estimate_from_regs(merged, ("window_end",), m)


def source_overlap_matrix(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    shingle_n: int = 3,
    k: int = 64,
) -> DataFrame:
    """Pairwise content-overlap matrix BETWEEN data sources from
    per-source KMV sketches — the provenance-dedup planning report: a
    crawl pipeline mixing N feeds wants to know which pairs share
    content (mirror sites, syndication) BEFORE paying a cross-source
    dedup pass, and at 100 TB that answer must come from sketches, not
    from the shingle sets themselves.

    Per source: bottom-``k`` of the portable-md5 shingle hashes (built
    in the source's ingest pass; k rows per source is the ENTIRE state
    this operator keeps — the sketch-algebra contract of
    kmv_set_ops_portable, grouped).  Per pair: the union sketch is the
    bottom-k of the two merged sketches, J = |both|/|union sketch|,
    |AnB| ~= J * |AuB|.  The pair expansion touches only sketch rows
    (sources^2 * k), never corpus data.  Portable hash end to end ->
    the whole grouped estimator replays in SQL.  Output one row per
    unordered source pair: (source_a, source_b, est_a, est_b,
    est_union, jaccard_est, est_intersection)."""
    from ..functions.text_fns import md5_hash60, shingles

    df = spread(df)
    sh = df.select(
        F.col(group_col).alias("_src"),
        F.explode(
            F.array_distinct(shingles(F.col(text_col), shingle_n))
        ).alias("_s"),
    ).select("_src", md5_hash60(F.col("_s")).alias("_h")).distinct()
    wk = Window.partitionBy("_src").orderBy(F.col("_h").asc())
    # persist: the sketch frame is k rows per source (KB) but its
    # LINEAGE is the full shingle explode + distinct — four consumers
    # (per-source estimates, the source list, both pair-contribution
    # sides) would otherwise re-scan the corpus four times.  Cache
    # hygiene is the caller's (bench clearCache contract, same as
    # dsir_sample's feats).
    sk = (
        sh.withColumn("_rn", F.row_number().over(wk))
        .filter(F.col("_rn") <= k)
        .select("_src", "_h")
        .persist()
    )
    # per-source distinct estimate from its own sketch (KMV formula)
    per_src = sk.groupBy("_src").agg(
        F.count(F.lit(1)).alias("_m"), F.max("_h").alias("_mx")
    )
    est1 = F.when(
        F.col("_m") < k, F.col("_m").cast("double")
    ).otherwise(
        F.lit(float(k - 1))
        / ((F.col("_mx").cast("double") + F.lit(1.0)) / F.lit(1152921504606846976.0))
    )
    ests = per_src.select(F.col("_src"), est1.alias("_est"))
    srcs = sk.select("_src").distinct()
    pairs = (
        srcs.select(F.col("_src").alias("source_a"))
        .crossJoin(F.broadcast(srcs.select(F.col("_src").alias("source_b"))))
        .filter(F.col("source_a") < F.col("source_b"))
    )
    contrib = (
        sk.join(F.broadcast(pairs), sk._src == pairs.source_a)
        .select("source_a", "source_b", "_h",
                F.lit(1).alias("_a"), F.lit(0).alias("_b"))
        .unionByName(
            sk.join(F.broadcast(pairs), sk._src == pairs.source_b)
            .select("source_a", "source_b", "_h",
                    F.lit(0).alias("_a"), F.lit(1).alias("_b"))
        )
    )
    merged = contrib.groupBy("source_a", "source_b", "_h").agg(
        F.max("_a").alias("a"), F.max("_b").alias("b")
    )
    wp = Window.partitionBy("source_a", "source_b").orderBy(F.col("_h").asc())
    u_sketch = (
        merged.withColumn("_rn", F.row_number().over(wp))
        .filter(F.col("_rn") <= k)
    )
    agg = u_sketch.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("_m"),
        F.max("_h").alias("_mx"),
        F.sum(F.col("a") * F.col("b")).alias("_both"),
    )
    uval = (F.col("_mx").cast("double") + F.lit(1.0)) / F.lit(
        1152921504606846976.0
    )
    union_est = F.when(
        F.col("_m") < k, F.col("_m").cast("double")
    ).otherwise(F.lit(float(k - 1)) / uval)
    j_est = F.col("_both").cast("double") / F.col("_m").cast("double")
    out = agg.select(
        "source_a",
        "source_b",
        union_est.alias("est_union"),
        j_est.alias("jaccard_est"),
        (j_est * union_est).alias("est_intersection"),
    )
    return (
        out.join(
            F.broadcast(ests.select(F.col("_src").alias("source_a"),
                                    F.col("_est").alias("est_a"))),
            on="source_a",
        )
        .join(
            F.broadcast(ests.select(F.col("_src").alias("source_b"),
                                    F.col("_est").alias("est_b"))),
            on="source_b",
        )
        .select("source_a", "source_b", "est_a", "est_b",
                "est_union", "jaccard_est", "est_intersection")
    )


def ams_f2_estimate(
    df: DataFrame,
    col: str,
    num_estimators: int = 16,
) -> DataFrame:
    """AMS (Alon-Matias-Szegedy) second-moment sketch: estimate
    F2 = sum_k f(k)^2 — the SELF-JOIN SIZE on ``col`` — from
    ``num_estimators`` independent +-1 sign sums, without grouping by
    the key at all.  F2 is what a join planner needs to size a
    key-equi self-join (and, with one sketch per side, any equi-join:
    the same S_a * S_b product estimates the inner product of the two
    frequency vectors); the exact answer needs a full groupBy over the
    key space, the sketch needs ``num_estimators`` integers.

    Each estimator i: S_i = sum over ROWS of sign_i(key), where
    sign_i is a +-1 hash (low bit of the seeded portable md5-60, so
    the whole sketch replays in SQL); E[S_i^2] = F2, and the median of
    the squared sums concentrates (median-of-even-count = mean of the
    two middle order statistics — deterministic).  One aggregation
    pass, map-side combined to ONE row of longs; NULL keys are ignored
    (they join nothing).

    Output: 1 row (f2_est DOUBLE, f2_exact BIGINT, rel_error DOUBLE) —
    the exact F2 rides along (one grouped pass) so the query doubles
    as the estimator's own accuracy report, like dedup_recall_report
    and ann_recall_report do for their families."""
    from ..functions.text_fns import md5_hash60

    d = df.filter(F.col(col).isNotNull())
    signs = [
        (
            F.lit(1)
            - F.lit(2) * (md5_hash60(F.concat(F.lit(f"{i}:"), F.col(col).cast("string"))) % 2)
        ).cast("long")
        for i in range(num_estimators)
    ]
    sums = d.agg(
        *[F.sum(s).alias(f"_s{i}") for i, s in enumerate(signs)]
    )
    ests = F.array_sort(
        F.array(*[
            (F.col(f"_s{i}") * F.col(f"_s{i}")).cast("double")
            for i in range(num_estimators)
        ])
    )
    mid = num_estimators // 2
    est = (
        F.element_at(ests, mid) + F.element_at(ests, mid + 1)
    ) / F.lit(2.0)
    exact = (
        d.groupBy(F.col(col))
        .agg(F.count(F.lit(1)).alias("_f"))
        .agg(
            F.sum((F.col("_f") * F.col("_f")).cast("decimal(38,0)"))
            .cast("bigint")
            .alias("f2_exact")
        )
    )
    return (
        sums.select(est.alias("f2_est"))
        .crossJoin(F.broadcast(exact))
        .select(
            "f2_est",
            "f2_exact",
            (
                (F.col("f2_est") - F.col("f2_exact").cast("double"))
                / F.col("f2_exact").cast("double")
            ).alias("rel_error"),
        )
    )
