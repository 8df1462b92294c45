"""Property-based checks (hypothesis) for the custom operators whose
edge cases a fixed oracle query can miss: as-of join against a naive
per-row reference, salted join against the plain join.

max_examples is kept small — every example runs real Spark jobs."""

from __future__ import annotations

import datetime

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from vertica_hadoop_integration__spark.operators import relational as R
from vertica_hadoop_integration__spark.operators import temporal as T

T0 = datetime.datetime(2024, 1, 1)

_EVENT = st.tuples(
    st.integers(min_value=0, max_value=3),  # user_id (few keys -> collisions)
    st.integers(min_value=0, max_value=20),  # ts offset seconds (ties likely)
    st.integers(min_value=0, max_value=9),  # value
)

_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)


def _df(spark, rows):
    data = [
        (u, T0 + datetime.timedelta(seconds=s), float(v)) for u, s, v in rows
    ]
    return spark.createDataFrame(data, _SCHEMA)


@settings(max_examples=10, deadline=None)
@given(
    left=st.lists(_EVENT, min_size=1, max_size=12),
    right=st.lists(_EVENT, min_size=0, max_size=12),
)
def test_asof_join_matches_naive(spark, left, right):
    # dedup right on (user, ts) — as-of is tie-ambiguous otherwise
    # (same contract the registered query enforces)
    rdeduped: dict[tuple[int, int], int] = {}
    for u, s, v in right:
        key = (u, s)
        rdeduped[key] = max(rdeduped.get(key, -1), v)
    rrows = [(u, s, v) for (u, s), v in rdeduped.items()]

    out = T.asof_join(
        _df(spark, left), _df(spark, rrows), on="user_id"
    ).collect()

    # naive reference: newest right row with ts' <= ts, same user
    def expected(u, s):
        cands = [(s2, v) for (u2, s2), v in rdeduped.items() if u2 == u and s2 <= s]
        if not cands:
            return (None, None)
        s2, v = max(cands)
        return (T0 + datetime.timedelta(seconds=s2), float(v))

    assert len(out) == len(left)
    got = sorted(
        (r["user_id"], r["ts"], r["value"], r["asof_ts"], r["asof_value"])
        for r in out
    )
    want = sorted(
        (u, T0 + datetime.timedelta(seconds=s), float(v), *expected(u, s))
        for u, s, v in left
    )
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    left=st.lists(_EVENT, min_size=1, max_size=10),
    right=st.lists(_EVENT, min_size=0, max_size=10),
    direction=st.sampled_from(["forward", "nearest"]),
)
def test_asof_join_directions_match_naive(spark, left, right, direction):
    rdeduped: dict[tuple[int, int], int] = {}
    for u, s, v in right:
        rdeduped[(u, s)] = max(rdeduped.get((u, s), -1), v)
    rrows = [(u, s, v) for (u, s), v in rdeduped.items()]

    out = T.asof_join(
        _df(spark, left), _df(spark, rrows), on="user_id", direction=direction
    ).collect()

    def expected(u, s):
        back = [(s2, v) for (u2, s2), v in rdeduped.items() if u2 == u and s2 <= s]
        fwd = [(s2, v) for (u2, s2), v in rdeduped.items() if u2 == u and s2 >= s]
        if direction == "forward":
            pick = min(fwd) if fwd else None
        else:  # nearest: closer wins, tie -> backward
            b = max(back) if back else None
            f = min(fwd) if fwd else None
            if b is None:
                pick = f
            elif f is None:
                pick = b
            else:
                pick = b if (s - b[0]) <= (f[0] - s) else f
        if pick is None:
            return (None, None)
        return (T0 + datetime.timedelta(seconds=pick[0]), float(pick[1]))

    got = sorted(
        (r["user_id"], r["ts"], r["value"], r["asof_ts"], r["asof_value"])
        for r in out
    )
    want = sorted(
        (u, T0 + datetime.timedelta(seconds=s), float(v), *expected(u, s))
        for u, s, v in left
    )
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    left=st.lists(_EVENT, min_size=1, max_size=10),
    right=st.lists(_EVENT, min_size=0, max_size=10),
)
def test_asof_join_interpolate_matches_naive(spark, left, right):
    rdeduped: dict[tuple[int, int], int] = {}
    for u, s, v in right:
        rdeduped[(u, s)] = max(rdeduped.get((u, s), -1), v)
    rrows = [(u, s, v) for (u, s), v in rdeduped.items()]

    out = T.asof_join(
        _df(spark, left), _df(spark, rrows), on="user_id",
        direction="interpolate",
    ).collect()

    def expected(u, s):
        back = [(s2, v) for (u2, s2), v in rdeduped.items() if u2 == u and s2 <= s]
        fwd = [(s2, v) for (u2, s2), v in rdeduped.items() if u2 == u and s2 >= s]
        b = max(back) if back else None
        f = min(fwd) if fwd else None
        ts = lambda p: T0 + datetime.timedelta(seconds=p[0])  # noqa: E731
        if b is None and f is None:
            return (None, None, None)
        if b is None:
            return (None, ts(f), float(f[1]))
        if f is None:
            return (ts(b), None, float(b[1]))
        frac = (s - b[0]) / (f[0] - b[0]) if f[0] > b[0] else 0.0
        return (ts(b), ts(f), float(b[1]) + (float(f[1]) - float(b[1])) * frac)

    got = sorted(
        (r["user_id"], r["ts"], r["value"],
         r["asof_prev_ts"], r["asof_next_ts"], r["asof_value"])
        for r in out
    )
    want = sorted(
        (u, T0 + datetime.timedelta(seconds=s), float(v), *expected(u, s))
        for u, s, v in left
    )
    for g, w in zip(got, want):
        assert g[:5] == w[:5]
        if w[5] is None:
            assert g[5] is None
        else:
            assert abs(g[5] - w[5]) < 1e-9


@settings(max_examples=10, deadline=None)
@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 99)), min_size=1, max_size=15
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 99)), min_size=0, max_size=8
    ),
    how=st.sampled_from(["inner", "left"]),
)
def test_salted_join_equals_plain_join(spark, left, right, how):
    kv = lambda name: StructType(
        [StructField("k", LongType()), StructField(name, LongType())]
    )
    l = spark.createDataFrame(left, kv("lv"))
    r = spark.createDataFrame(right, kv("rv"))
    got = sorted(
        map(tuple, R.salted_join(l, r, on=["k"], how=how, salt=4).collect())
    )
    want = sorted(map(tuple, l.join(r, on=["k"], how=how).collect()))
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    points=st.lists(st.integers(0, 100), min_size=1, max_size=20),
    intervals=st.lists(
        st.tuples(st.integers(0, 100), st.integers(0, 40)),  # (lo, span)
        min_size=1,
        max_size=8,
    ),
    width=st.sampled_from([1.0, 7.0, 25.0, 1000.0]),
)
def test_range_join_bucketed_equals_broadcast(spark, points, intervals, width):
    """Bucketing rewrite must be result-identical to the broadcast
    nested-loop plan for any bucket width, including overlapping and
    zero-length intervals and boundary-exact points."""
    pdf = spark.createDataFrame(
        [(i, float(p)) for i, p in enumerate(points)], ["pid", "p"]
    )
    idf = spark.createDataFrame(
        [(i, float(lo), float(lo + span)) for i, (lo, span) in enumerate(intervals)],
        ["iid", "lo", "hi"],
    )
    got = sorted(
        (r.pid, r.iid)
        for r in T.range_join_bucketed(
            pdf, idf, "p", bucket_width=width
        ).collect()
    )
    want = sorted(
        (r.pid, r.iid) for r in T.range_join_point(pdf, idf, "p").collect()
    )
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=12),
        min_size=2,
        max_size=14,
    ),
    threshold=st.sampled_from([0.5, 0.7, 0.9]),
)
def test_length_bucket_blocking_is_lossless(spark, docs, threshold):
    """The size-bucket blocking in ngram_jaccard_pairs must NEVER drop a
    qualifying pair — for any token multiset population and threshold,
    blocked pairs == unblocked pairs (the 'provably lossless' claim)."""
    from vertica_hadoop_integration__spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"]).withColumn(
        "lang", F.lit("xx")
    )
    blocked = {
        (r.doc_id_a, r.doc_id_b)
        for r in ngram_jaccard_pairs(df, min_jaccard=threshold).collect()
    }
    unblocked = {
        (r.doc_id_a, r.doc_id_b)
        for r in ngram_jaccard_pairs(df, min_jaccard=0.0).collect()
        if r.jaccard >= threshold
    }
    assert blocked == unblocked


@settings(max_examples=8, deadline=None)
@given(
    vec=st.lists(
        st.floats(
            min_value=-1e3, max_value=1e3, allow_nan=False, allow_infinity=False,
            width=32,
        ),
        min_size=1,
        max_size=16,
    )
)
def test_quantize_int8_roundtrip_error_bound(spark, vec):
    """For any float vector: quantized values stay in [-127, 127] and
    |x - q*scale| <= scale/2 elementwise (zero vectors: q all 0)."""
    from pyspark.sql.types import ArrayType, FloatType

    from vertica_hadoop_integration__spark.functions.vector_fns import (
        quantize_int8,
        quantize_scale,
    )

    schema = StructType([StructField("embedding", ArrayType(FloatType()))])
    df = spark.createDataFrame([([float(x) for x in vec],)], schema)
    row = df.select(
        quantize_int8(F.col("embedding")).alias("q"),
        quantize_scale(F.col("embedding")).alias("scale"),
    ).collect()[0]
    q, scale = row["q"], row["scale"]
    assert all(-127 <= v <= 127 for v in q)
    if scale is None:
        assert all(v == 0 for v in q)
    else:
        import numpy as np

        x = np.array(vec, dtype=np.float32).astype(np.float64)
        err = np.abs(x - np.array(q, dtype=np.float64) * scale)
        assert (err <= scale / 2 + 1e-9).all()


@settings(max_examples=8, deadline=None)
@given(
    n_tokens=st.integers(1, 200),
    chunk_size=st.sampled_from([8, 64]),
    overlap=st.sampled_from([0, 3, 7]),
)
def test_chunk_documents_covers_every_token(spark, n_tokens, chunk_size, overlap):
    """Chunking invariants for any (doc length, size, overlap): chunks
    tile the token stream with the exact stride, every token appears in
    at least one chunk, only the last chunk may run short, and docs at
    most chunk_size long are exactly one chunk."""
    from vertica_hadoop_integration__spark.operators.corpus import chunk_documents

    text = " ".join(f"t{i}" for i in range(n_tokens))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(
        chunk_documents(df, chunk_size=chunk_size, overlap=overlap).collect(),
        key=lambda r: r.chunk_idx,
    )
    stride = chunk_size - overlap
    if n_tokens <= chunk_size:
        assert len(rows) == 1
    covered = set()
    for r in rows:
        toks = r.chunk_text.split(" ")
        assert r.n_chunk_tokens == len(toks)
        start = r.chunk_idx * stride
        assert toks == [f"t{i}" for i in range(start, min(start + chunk_size, n_tokens))]
        covered.update(range(start, start + len(toks)))
        if r.chunk_idx < len(rows) - 1:
            assert r.n_chunk_tokens == chunk_size  # only the last runs short
    assert covered == set(range(n_tokens))


@settings(max_examples=5, deadline=None)
@given(ids=st.lists(st.integers(0, 10**9), min_size=1, max_size=50, unique=True))
def test_hash_split_deterministic_and_total(spark, ids):
    """Every row gets exactly one split; reruns and subsets agree (a
    doc's split never depends on what else is in the corpus)."""
    from vertica_hadoop_integration__spark.operators.corpus import hash_split

    df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    full = {r.doc_id: r.split for r in hash_split(df).collect()}
    assert set(full) == set(ids)
    assert set(full.values()) <= {"train", "val", "test"}
    half = spark.createDataFrame([(i,) for i in ids[: len(ids) // 2 + 1]], ["doc_id"])
    sub = {r.doc_id: r.split for r in hash_split(half).collect()}
    assert all(full[k] == v for k, v in sub.items())


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(max_examples=8, deadline=None)
@given(
    strings=st.lists(
        st.text(alphabet="abc", min_size=12, max_size=20),
        min_size=2,
        max_size=12,
    ),
    max_edit=st.sampled_from([1, 2, 3]),
)
def test_fuzzy_match_blocking_is_lossless(spark, strings, max_edit):
    """q-gram blocked fuzzy match == brute-force pairs for any string
    population above the length floor and any threshold (small alphabet
    forces near matches and shared-gram collisions)."""
    from vertica_hadoop_integration__spark.operators.dedup import (
        fuzzy_match_pairs,
    )

    floor = (max_edit + 1) * 3 - 1
    rows = [(i, s) for i, s in enumerate(strings)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.id_a, r.id_b, r.edit_dist)
        for r in fuzzy_match_pairs(
            df, max_edit=max_edit, q=3, prefix_len=30
        ).collect()
    }
    want = {
        (i, j, _lev(a.lower().strip(), b.lower().strip()))
        for i, a in rows
        for j, b in rows
        if i < j
        and len(a.lower().strip()) > floor
        and len(b.lower().strip()) > floor
        and _lev(a.lower().strip(), b.lower().strip()) <= max_edit
    }
    assert got == want


@settings(max_examples=25, deadline=None)
@given(
    vals=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
            max_size=40,
        ),
        min_size=1,
        max_size=20,
        unique=True,
    ),
    seed=st.one_of(st.none(), st.integers(min_value=0, max_value=63)),
)
def test_md5_hash60_matches_duckdb(spark, vals, seed):
    """md5_hash60 is THE keystone of every *_portable oracle: Spark's
    conv(substring(md5(x),1,15),16,10) must equal DuckDB's
    CAST(('0x'||substr(md5(x),1,15)) AS BIGINT) for arbitrary unicode
    input and any signature seed."""
    import duckdb

    from vertica_hadoop_integration__spark.functions.text_fns import md5_hash60

    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {
        r["s"]: r["h"]
        for r in df.select("s", md5_hash60(F.col("s"), seed=seed).alias("h")).collect()
    }
    con = duckdb.connect()
    for v in vals:
        x = v if seed is None else f"{seed}:{v}"
        [(want,)] = con.execute(
            "SELECT CAST(('0x'||substr(md5(?),1,15)) AS BIGINT)", [x]
        ).fetchall()
        assert got[v] == want, f"hash mismatch for {v!r} seed={seed}"


def test_salted_join_parity_on_zipf_skew(spark):
    """Deliberately Zipf-skewed fixture (P(k) ~ 1/k^2: the hottest key
    holds ~half the rows — the README skew-robustness fixture at 1/100
    scale): salted result must equal the plain join exactly, hot key
    included."""
    from pyspark.sql import functions as F

    K, N = 1000, 400_000
    u = (
        F.pmod(F.xxhash64("id"), F.lit(1_000_000)).cast("double") + 1.0
    ) / 1_000_000.0
    fact = spark.range(N).select(
        F.least(F.lit(K), F.floor(1.0 / u)).cast("long").alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    dim = spark.range(1, K + 1).select(
        F.col("id").alias("k"), (F.col("id") * 3 % 11).cast("double").alias("w")
    )
    hot = fact.groupBy("k").count().orderBy(F.desc("count")).first()
    assert hot["count"] > N * 0.4  # the fixture really is skewed

    agg = lambda j: j.agg(
        F.sum((F.col("v") * F.col("w")).cast("decimal(30,6)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    plain = agg(fact.join(dim, on="k"))
    salted = agg(R.salted_join(fact, dim, on=["k"], salt=32))
    assert (plain.s, plain.n) == (salted.s, salted.n)


@given(
    n_rows=st.integers(min_value=50, max_value=400),
    buckets=st.integers(min_value=2, max_value=16),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=6, deadline=None)
def test_range_rebalance_buckets_ordered_and_even(spark, n_rows, buckets, seed):
    """range_rebalance (exact percentile cuts): bucket value-ranges are
    disjoint and ordered, every row is bucketed, and sizes are near-even
    (each bucket within 2x of the ideal share for continuous-ish data)."""
    df = spark.range(n_rows).select(
        F.col("id"),
        (F.pmod(F.xxhash64(F.col("id") + seed), F.lit(100_000)).cast("double")
         / 7.0).alias("x"),
    )
    out = R.range_rebalance(df, "x", buckets, exact=True)
    rows = out.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("x").alias("lo"), F.max("x").alias("hi"),
    ).orderBy("bucket").collect()
    assert sum(r["n"] for r in rows) == n_rows
    for a, b in zip(rows, rows[1:]):
        assert b["bucket"] == a["bucket"] + 1
        assert a["hi"] <= b["lo"]  # ordered, disjoint ranges
    ideal = n_rows / buckets
    for r in rows:
        assert r["n"] <= 2 * ideal + 1, (r["bucket"], r["n"], ideal)


@given(
    rows_per_bucket=st.integers(min_value=10, max_value=200),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=6, deadline=None)
def test_skew_fanout_proportional_and_bounded(spark, rows_per_bucket, seed):
    """skew_fanout: fanout = ceil(cnt / rows_per_bucket) for every hot
    key, no tail keys materialized, and the map size is bounded by
    total_rows / rows_per_bucket (the broadcastability contract)."""
    import math

    df = spark.range(500).select(
        F.pmod(F.xxhash64(F.col("id") + seed), F.lit(7)).alias("k")
    )
    counts = {r["k"]: r["n"] for r in
              df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    fan = {r["k"]: r["_fanout"] for r in
           R.skew_fanout(df, ["k"], rows_per_bucket).collect()}
    for k, c in counts.items():
        if c > rows_per_bucket:
            assert fan[k] == math.ceil(c / rows_per_bucket), (k, c, fan[k])
        else:
            assert k not in fan
    assert len(fan) <= 500 / rows_per_bucket


@settings(max_examples=8, deadline=None)
@given(
    docs=st.lists(
        st.lists(
            st.integers(min_value=0, max_value=500).map(lambda i: f"t{i}"),
            min_size=1,
            max_size=80,
        ),
        min_size=1,
        max_size=5,
    )
)
def test_cdc_chunks_reassemble_losslessly(spark, docs):
    """Content-defined chunking is a PARTITION of the token stream:
    concatenating each doc's chunks in chunk order must rebuild the
    exact original text, for any token content (boundary density
    varies with the hashes, but no token may be lost, duplicated, or
    reordered)."""
    from vertica_hadoop_integration__spark.operators.corpus import (
        cdc_chunks,
    )

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    chunks = cdc_chunks(df, normalize=False).collect()
    rebuilt = {}
    for r in sorted(chunks, key=lambda r: (r.doc_id, r.chunk_idx)):
        rebuilt.setdefault(r.doc_id, []).append(r.chunk)
    for i, toks in enumerate(docs):
        assert " ".join(rebuilt[i]) == " ".join(toks)
        # chunk_idx values are dense 0..n-1 per doc
        n = len(rebuilt[i])
        got_idx = sorted(
            r.chunk_idx for r in chunks if r.doc_id == i
        )
        assert got_idx == list(range(n))


@settings(max_examples=8, deadline=None)
@given(
    vals=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False,
                  allow_infinity=False, width=32),
        min_size=10,
        max_size=40,
    ),
    offset=st.floats(min_value=-1000, max_value=1000, allow_nan=False,
                     allow_infinity=False, width=32),
)
def test_change_point_split_is_shift_invariant(spark, vals, offset):
    """Adding a constant to every value cannot move the located split:
    both segment means shift by the constant, so the mean gap — and
    therefore every candidate's score ranking — is unchanged."""
    import datetime as dt

    from vertica_hadoop_integration__spark.operators.temporal import (
        change_point_scan,
    )

    base = dt.datetime(2024, 5, 1)
    rows = [
        ("t", base + dt.timedelta(minutes=i), i, float(v))
        for i, v in enumerate(vals)
    ]
    shifted = [
        ("t", ts, eid, v + float(offset)) for (_, ts, eid, v) in rows
    ]
    schema = "event_type string, ts timestamp, event_id long, value double"
    a = change_point_scan(
        spark.createDataFrame(rows, schema), min_segment=2
    ).collect()
    b = change_point_scan(
        spark.createDataFrame(shifted, schema), min_segment=2
    ).collect()
    assert len(a) == len(b) == 1
    assert a[0]["split_i"] == b[0]["split_i"]
    assert abs(
        (a[0]["mean_after"] - a[0]["mean_before"])
        - (b[0]["mean_after"] - b[0]["mean_before"])
    ) < 1e-6
