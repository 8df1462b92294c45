"""Corpus-curation operators: deterministic sampling, stratification,
mixture reporting, quantization, radius search, cluster-canonical
cleaning. Correctness invariants + the plan-shape properties the 100 TB
story depends on (map-only sampling, broadcast query side)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vertica_hadoop_integration__spark.operators import corpus as C
from vertica_hadoop_integration__spark.operators.similarity import range_search
from vertica_hadoop_integration__spark.sources import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def embs(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_systematic_sample_deterministic_and_map_only(docs):
    s1 = C.systematic_sample(docs, modulus=7, residue=2)
    ids1 = sorted(r.doc_id for r in s1.select("doc_id").collect())
    ids2 = sorted(r.doc_id for r in C.systematic_sample(docs, modulus=7, residue=2)
                  .select("doc_id").collect())
    assert ids1 == ids2 and ids1
    assert all(i % 7 == 2 for i in ids1)
    # map-only: no exchange in the plan
    assert "Exchange" not in s1._jdf.queryExecution().executedPlan().toString()


def test_stratified_sample_exact_quota_and_rerun_stable(docs):
    out = C.stratified_sample(docs, strata_col="lang", n_per_stratum=5)
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    strata = {r["lang"]: r["n"] for r in
              docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, n in counts.items():
        assert n == min(5, strata[lang])
    again = C.stratified_sample(docs, strata_col="lang", n_per_stratum=5)
    assert sorted(r.doc_id for r in out.select("doc_id").collect()) == \
           sorted(r.doc_id for r in again.select("doc_id").collect())


def test_quality_stratified_keeps_longest(docs):
    kept = C.quality_stratified_keep(docs, keep_frac=0.3, strata_col="lang")
    # within each lang, min kept token count >= max dropped token count
    ntok = F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
    with_tok = docs.withColumn("ntok", ntok)
    kept_tok = with_tok.join(kept.select("doc_id"), "doc_id", "left_semi")
    dropped_tok = with_tok.join(kept.select("doc_id"), "doc_id", "left_anti")
    mins = {r["lang"]: r["m"] for r in
            kept_tok.groupBy("lang").agg(F.min("ntok").alias("m")).collect()}
    maxs = {r["lang"]: r["m"] for r in
            dropped_tok.groupBy("lang").agg(F.max("ntok").alias("m")).collect()}
    for lang, lo in mins.items():
        if lang in maxs:
            assert lo >= maxs[lang]


def test_mixture_report_shares_sum_to_one(docs):
    rep = C.mixture_report(docs)
    total_share = rep.agg(F.sum("token_share")).collect()[0][0]
    assert total_share == pytest.approx(1.0, abs=1e-9)
    total_docs = rep.agg(F.sum("n_docs")).collect()[0][0]
    assert total_docs == docs.count()


def test_length_histogram_partitions_corpus(docs):
    hist = C.length_histogram(docs, length_col="n_chars")
    rows = hist.collect()
    assert sum(r["n_docs"] for r in rows) == docs.filter(F.col("n_chars") > 0).count()
    for r in rows:
        assert r["log2_bucket"] >= 0


def test_quantize_int8_bounds_and_reconstruction(spark, embs):
    from vertica_hadoop_integration__spark.functions.vector_fns import (
        quantize_int8,
        quantize_scale,
    )

    q = embs.select(
        "vec_id",
        F.col("embedding").alias("v"),
        quantize_int8(F.col("embedding")).alias("q"),
        quantize_scale(F.col("embedding")).alias("scale"),
    )
    # every quantized value in [-127, 127]
    oob = q.filter(
        F.exists(F.col("q"), lambda x: (x > 127) | (x < -127))
    ).count()
    assert oob == 0
    # reconstruction error bounded by half a step: |x - q*scale| <= scale/2
    bad = q.filter(
        F.exists(
            F.zip_with(
                F.col("v"), F.col("q"),
                lambda x, qi: F.abs(x.cast("double") - qi * F.col("scale"))
                > F.col("scale") * 0.5 + 1e-12,
            ),
            lambda b: b,
        )
    ).count()
    assert bad == 0


def test_range_search_matches_exact_filter(spark, embs):
    q = embs.filter(F.col("vec_id") < 5)
    got = range_search(embs, q, min_cosine=0.3)
    # oracle: brute-force top-k with huge k, filtered to the radius
    from vertica_hadoop_integration__spark.operators.similarity import brute_force_topk

    exact = brute_force_topk(embs, q, k=10**6).filter(F.col("cos_sim") >= 0.3)
    got_pairs = {(r.query_id, r.neighbor_id) for r in got.collect()}
    exact_pairs = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    assert got_pairs == exact_pairs
    # scale shape: the query side is broadcast, corpus side streams
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_clean_corpus_clusters_subset_of_pairs_strategy(docs):
    pairs_kept = C.clean_corpus(docs, min_chars=20, min_tokens=5,
                                min_jaccard=0.7, dedup_strategy="pairs")
    clust_kept = C.clean_corpus(docs, min_chars=20, min_tokens=5,
                                min_jaccard=0.7, dedup_strategy="clusters")
    p_ids = {r.doc_id for r in pairs_kept.select("doc_id").collect()}
    c_ids = {r.doc_id for r in clust_kept.select("doc_id").collect()}
    # cluster mode can only drop MORE (transitive closure), never less
    assert c_ids <= p_ids
    # both keep at least one doc per exact-text group that passed gates
    assert c_ids


def test_decontaminate_flags_eval_docs_and_drop_matches_flag(docs):
    ev_docs = docs.filter(F.col("doc_id") % 97 == 0)
    ev = C.eval_shingle_set(ev_docs, shingle_n=5)
    flagged = C.decontaminate(docs, ev, shingle_n=5, mode="flag")
    # every eval doc shares its own shingles -> must be flagged
    ev_ids = {r.doc_id for r in ev_docs.select("doc_id").collect()}
    hit_ids = {r.doc_id for r in
               flagged.filter(F.col("is_contaminated") == 1).collect()}
    assert ev_ids <= hit_ids
    # drop mode keeps exactly the unflagged rows
    clean = C.decontaminate(docs, ev, shingle_n=5, mode="drop")
    assert clean.count() == flagged.filter(F.col("is_contaminated") == 0).count()
    assert {r.doc_id for r in clean.select("doc_id").collect()} & hit_ids == set()


def test_minhash_probe_matches_batch_dedup(docs):
    """Probing a batch against a prebuilt index finds exactly the
    cross-parity pairs the one-shot dedup finds on the union (same
    hash family both sides), without re-reading corpus text."""
    from vertica_hadoop_integration__spark.operators import dedup as D

    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    bands_df, verify_df = D.minhash_index(corpus, num_hashes=16, bands=8)
    probed = D.minhash_probe(
        bands_df, verify_df, batch, num_hashes=16, bands=8, min_jaccard=0.7
    )
    got = {(min(r.new_id, r.corpus_id), max(r.new_id, r.corpus_id))
           for r in probed.collect()}
    full = D.minhash_dedup(docs, num_hashes=16, bands=8, min_jaccard=0.7)
    want = {(r.doc_id_a, r.doc_id_b) for r in full.collect()
            if r.doc_id_a % 2 != r.doc_id_b % 2}
    assert got == want
    # self-probe sanity: a batch probed against its own index pairs every
    # doc with itself at jaccard 1.0
    b2, v2 = D.minhash_index(batch, num_hashes=16, bands=8)
    self_pairs = D.minhash_probe(b2, v2, batch, num_hashes=16, bands=8,
                                 min_jaccard=0.99)
    ids = {r.doc_id for r in batch.select("doc_id").collect()}
    self_hits = {r.new_id for r in self_pairs.filter(
        F.col("new_id") == F.col("corpus_id")).collect()}
    assert self_hits == ids


def test_gap_fill_locf_dense_grid(spark):
    import datetime as dt

    from vertica_hadoop_integration__spark.operators.temporal import gap_fill_locf

    t0 = dt.datetime(2024, 1, 1, 0, 0)
    rows = [
        ("a", t0, 1.0),
        ("a", t0 + dt.timedelta(minutes=3), 2.0),
        ("b", t0 + dt.timedelta(minutes=1), 5.0),
    ]
    ev = spark.createDataFrame(rows, ["event_type", "ts", "value"])
    got = sorted(
        gap_fill_locf(ev).collect(), key=lambda r: (r.event_type, r.bucket_ts)
    )
    a = [r for r in got if r.event_type == "a"]
    b = [r for r in got if r.event_type == "b"]
    # dense: every minute in [min, max] for every key
    assert len(a) == 4 and len(b) == 4
    assert [r.n_events for r in a] == [1, 0, 0, 1]
    assert [r.locf_value for r in a] == [1.0, 1.0, 1.0, 2.0]
    # key b: NULL until first observation, then carried forward
    assert [r.locf_value for r in b] == [None, 5.0, 5.0, 5.0]


def test_funnel_respects_event_order(spark):
    import datetime as dt

    from vertica_hadoop_integration__spark.operators.temporal import funnel

    t0 = dt.datetime(2024, 1, 1)
    m = lambda k: t0 + dt.timedelta(minutes=k)  # noqa: E731
    rows = [
        # user 1: full ordered funnel
        (1, "view", m(0)), (1, "click", m(1)), (1, "purchase", m(2)),
        # user 2: clicked BEFORE viewing -> reaches view only
        (2, "click", m(0)), (2, "view", m(1)),
        # user 3: view+click but purchase precedes the click -> stops at click
        (3, "view", m(0)), (3, "purchase", m(1)), (3, "click", m(2)),
        # user 4: never viewed -> in no stage
        (4, "purchase", m(0)),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    got = {r.stage: r.n_users for r in funnel(ev).collect()}
    assert got == {"view": 3, "click": 2, "purchase": 1}
    # attribution window: user 3's click came 2 min after view -> a
    # 1-minute max_lag cuts them from the click stage (and user 1 stays)
    windowed = {r.stage: r.n_users
                for r in funnel(ev, max_lag="1 minute").collect()}
    assert windowed == {"view": 3, "click": 1, "purchase": 1}


def test_gap_fill_interpolate_blends_linearly(spark):
    import datetime as dt

    from vertica_hadoop_integration__spark.operators.temporal import (
        gap_fill_interpolate,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0)
    rows = [
        ("a", t0, 1.0),
        ("a", t0 + dt.timedelta(minutes=3), 4.0),
        ("b", t0 + dt.timedelta(minutes=2), 7.0),
    ]
    ev = spark.createDataFrame(rows, ["event_type", "ts", "value"])
    got = sorted(
        gap_fill_interpolate(ev).collect(),
        key=lambda r: (r.event_type, r.bucket_ts),
    )
    a = [r.interp_value for r in got if r.event_type == "a"]
    b = [r.interp_value for r in got if r.event_type == "b"]
    assert a == [1.0, 2.0, 3.0, 4.0]  # linear blend across the gap
    # no extrapolation: NULL before first / after last observation
    assert b == [None, None, 7.0, None]


def test_repetition_signals_flag_degenerate_docs(spark):
    from vertica_hadoop_integration__spark.operators.text import repetition_signals

    rows = [
        (1, "spam spam spam spam spam spam"),
        (2, "a perfectly ordinary sentence with distinct words throughout"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in repetition_signals(df).collect()}
    assert got[1].repetitive == 1 and got[1].top_token_frac == 1.0
    assert got[1].dup_2gram_frac == pytest.approx(0.8)  # 5 bigrams, 1 distinct
    assert got[2].repetitive == 0 and got[2].top_token_frac < 0.3


def test_pack_sequences_partitions_token_stream(spark):
    from vertica_hadoop_integration__spark.operators.text import pack_sequences

    text = " ".join(f"tok{i}" for i in range(130))
    df = spark.createDataFrame([(7, text)], ["doc_id", "text"])
    chunks = sorted(
        pack_sequences(df, max_tokens=64).collect(), key=lambda r: r.chunk_idx
    )
    assert [r.n_tokens for r in chunks] == [64, 64, 2]
    reassembled = " ".join(r.chunk_text for r in chunks)
    assert reassembled == text
    # short doc -> exactly one chunk
    one = pack_sequences(
        spark.createDataFrame([(1, "just a few words")], ["doc_id", "text"]),
        max_tokens=64,
    ).collect()
    assert len(one) == 1 and one[0].n_tokens == 4


def test_redact_pii_scrubs_planted_pii(spark):
    from vertica_hadoop_integration__spark.operators.text import redact_pii

    rows = [
        (1, "contact bob@example.com or +1 (555) 123-4567 today"),
        (2, "server at 192.168.1.100 is fine"),
        (3, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: (r.clean_text, r.n_redactions)
           for r in redact_pii(df).collect()}
    assert "<EMAIL>" in got[1][0] and "<PHONE>" in got[1][0]
    assert "bob@" not in got[1][0] and "555" not in got[1][0]
    assert got[1][1] == 2
    assert got[2] == ("server at <IP> is fine", 1)
    assert got[3] == ("nothing sensitive here", 0)


def test_embedding_kmeans_covers_corpus(spark, embs):
    from vertica_hadoop_integration__spark.operators import similarity as S

    cents = S.kmeans_centroids(embs, k=8, iters=2)
    assert cents.count() == 8
    assigned = S.assign_to_centroids(embs, cents)
    sizes = assigned.groupBy("centroid_id").agg(F.count(F.lit(1)).alias("n"))
    rows = sizes.collect()
    assert sum(r["n"] for r in rows) == embs.count()
    assert all(r["n"] > 0 for r in rows)


def test_bpe_estimate_tracks_whitespace_tokens(docs):
    from vertica_hadoop_integration__spark.functions.text_fns import (
        bpe_token_estimate,
        token_count,
    )

    stats = docs.select(
        bpe_token_estimate(F.col("text")).alias("bpe"),
        token_count(F.col("text")).alias("ws"),
    ).agg(F.sum("bpe").alias("bpe"), F.sum("ws").alias("ws")).collect()[0]
    # BPE-ish count splits punctuation out, so it is >= whitespace count
    assert stats["bpe"] >= stats["ws"]
    assert stats["bpe"] <= stats["ws"] * 3  # and not absurdly larger


# -- Bloom-bitmap decontamination ------------------------------------------


def test_bloom_decontaminate_exact_vs_plain(spark, docs):
    """Bloom pre-filter + exact verify must produce the SAME contamination
    flags as the plain broadcast semi-join (no false negatives)."""
    ev = C.eval_shingle_set(docs.filter(F.col("doc_id") % 97 == 0), shingle_n=5)
    plain = {
        r["doc_id"]: r["is_contaminated"]
        for r in C.decontaminate(docs, ev, shingle_n=5, mode="flag").collect()
    }
    bloom = {
        r["doc_id"]: (r["is_contaminated"], r["bloom_candidate"])
        for r in C.bloom_decontaminate(docs, ev, shingle_n=5).collect()
    }
    assert plain.keys() == bloom.keys()
    for doc_id, exact_flag in plain.items():
        flag, cand = bloom[doc_id]
        assert flag == exact_flag, f"doc {doc_id}: bloom flag diverged"
        # no false negatives: every contaminated doc is a candidate
        if exact_flag == 1:
            assert cand == 1, f"doc {doc_id}: contaminated but not a candidate"


def test_bloom_bitmap_bounded(spark, docs):
    """The bitmap never exceeds m rows — the broadcastability guarantee."""
    ev = C.eval_shingle_set(docs.filter(F.col("doc_id") % 97 == 0), shingle_n=5)
    m = 512
    bits = C.bloom_bitmap(ev, m=m)
    assert bits.count() <= m
    assert bits.agg(F.min("pos"), F.max("pos")).collect()[0][1] < m


def test_bloom_small_m_still_exact(spark, docs):
    """Shrinking m floods the filter with false positives but the final
    flag must stay exact (verify step catches every FP)."""
    ev = C.eval_shingle_set(docs.filter(F.col("doc_id") % 97 == 0), shingle_n=5)
    exact = {
        r["doc_id"]: r["is_contaminated"]
        for r in C.decontaminate(docs, ev, shingle_n=5, mode="flag").collect()
    }
    tiny = {
        r["doc_id"]: r["is_contaminated"]
        for r in C.bloom_decontaminate(docs, ev, shingle_n=5, m=64).collect()
    }
    assert tiny == exact


def test_clean_corpus_portable_invariants(spark, docs):
    """Survivors contain no exact dups, no contaminated docs, and no
    higher-id member of a containment pair."""
    from vertica_hadoop_integration__spark.operators.corpus import (
        clean_corpus_portable,
        decontaminate,
        eval_shingle_set,
    )

    ev = eval_shingle_set(docs.filter(F.col("doc_id") % 97 == 0), shingle_n=5)
    out = clean_corpus_portable(docs, ev, min_prob=0.25)
    ids = {r["doc_id"] for r in out.collect()}
    assert ids  # pipeline keeps something
    kept_docs = docs.filter(F.col("doc_id").isin(list(ids)))
    # no surviving exact duplicates
    n_texts = kept_docs.select(F.md5(F.lower(F.trim("text")))).distinct().count()
    assert n_texts == len(ids)
    # no contaminated survivors
    flags = decontaminate(kept_docs, ev, mode="flag")
    assert flags.filter("is_contaminated = 1").count() == 0


def test_semantic_decontaminate_flags_planted_leak(spark):
    """A corpus vector identical to an eval vector (a paraphrase in the
    limit) is flagged at cos ~1 with the right eval id; an orthogonal
    vector is not flagged; ties resolve to the larger eval id."""
    from vertica_hadoop_integration__spark.operators.corpus import (
        semantic_decontaminate,
    )

    def vec(*nonzero):
        v = [0.0] * 8
        for i, x in nonzero:
            v[i] = float(x)
        return v

    ev = spark.createDataFrame(
        [(100, vec((0, 1.0))), (200, vec((1, 2.0)))],
        "vec_id long, embedding array<double>",
    )
    corpus = spark.createDataFrame(
        [
            (1, vec((0, 5.0))),       # parallel to eval 100 -> cos 1
            (2, vec((2, 1.0))),       # orthogonal to both -> clean
            (3, vec((0, 1.0), (1, 1.0))),  # 45 deg to both
        ],
        "vec_id long, embedding array<double>",
    )
    got = {
        r.vec_id: r for r in semantic_decontaminate(corpus, ev, 0.5).collect()
    }
    assert set(got) == {1, 3}
    assert got[1].best_eval_id == 100 and abs(got[1].cos_sim - 1.0) < 1e-12
    # vec 3 is cos 0.7071 to BOTH eval vectors: the (cos, id) struct max
    # must break the tie toward the larger eval id
    assert got[3].best_eval_id == 200


# -- quality-aware canonical selection (dedup_keep_best) --------------------


def test_keep_best_picks_highest_quality_with_id_tiebreak(spark):
    from vertica_hadoop_integration__spark.operators.dedup import (
        keep_best_per_cluster,
    )

    clusters = spark.createDataFrame(
        [(1, 1, 3), (2, 1, 3), (5, 1, 3), (7, 7, 2), (9, 7, 2)],
        "doc_id long, canonical_id long, cluster_size long",
    )
    scores = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (5, 0.9), (7, 0.5), (9, 0.4)],
        "doc_id long, quality_prob double",
    )
    rows = {r.canonical_id: r for r in keep_best_per_cluster(clusters, scores).collect()}
    assert set(rows) == {1, 7}
    # ties on quality break toward the smaller id (2 beats 5)
    assert rows[1].kept_doc_id == 2 and rows[1].kept_quality == 0.9
    assert rows[1].cluster_size == 3 and rows[1].n_dropped == 2
    assert rows[7].kept_doc_id == 7 and rows[7].n_dropped == 1


def test_keep_best_kept_member_maximizes_cluster_quality(spark, docs):
    from vertica_hadoop_integration__spark.operators import dedup as D
    from vertica_hadoop_integration__spark.operators import graph as G
    from vertica_hadoop_integration__spark.operators import text as T

    pairs = D.minhash_dedup_portable(
        docs, num_hashes=8, bands=4, min_jaccard=0.5, shingle_n=3
    )
    clusters = G.dedup_clusters(pairs)
    scores = T.quality_logreg(docs)
    kept = D.keep_best_per_cluster(clusters, scores)
    # the kept member's quality equals the cluster's max quality
    best = (
        clusters.join(scores.select("doc_id", "quality_prob"), on="doc_id")
        .groupBy("canonical_id")
        .agg(F.max("quality_prob").alias("max_q"), F.count(F.lit(1)).alias("n"))
    )
    j = kept.join(best, on="canonical_id").collect()
    assert len(j) == kept.count() and len(j) > 0
    for r in j:
        assert r.kept_quality == r.max_q
        assert r.cluster_size == r.n
    # every kept doc is a member of its own cluster
    member = kept.join(
        clusters,
        (kept.kept_doc_id == clusters.doc_id)
        & (kept.canonical_id == clusters.canonical_id),
        "left_semi",
    )
    assert member.count() == kept.count()


# -- DSIR importance resampling ---------------------------------------------


def _dsir_fixture(spark):
    target_like = "alpha beta gamma delta epsilon zeta eta theta"
    off_dist = "zulu yankee xray whiskey victor uniform tango sierra"
    rows = []
    for i in range(30):
        # target split: lang='en', on-distribution text
        rows.append((i, target_like + f" alpha beta {i % 3}", "en"))
    for i in range(30, 60):
        # raw-only docs that LOOK like the target
        rows.append((i, target_like + f" gamma delta {i % 3}", "xx"))
    for i in range(60, 90):
        # raw-only docs far from the target
        rows.append((i, off_dist + f" zulu yankee {i % 3}", "xx"))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_dsir_prefers_target_like_documents(spark):
    df = _dsir_fixture(spark)
    # n >= corpus so every doc's weight is visible
    out = C.dsir_sample(df, F.col("lang") == "en", n=1000).collect()
    w = {r.doc_id: r.log_weight for r in out}
    assert len(w) == 90
    on_dist = [w[i] for i in range(30, 60)]
    off = [w[i] for i in range(60, 90)]
    # every target-like raw doc outweighs every off-distribution doc
    assert min(on_dist) > max(off)
    spark.catalog.clearCache()


def test_dsir_top_k_deterministic_and_target_heavy(spark):
    df = _dsir_fixture(spark)
    a = [r.doc_id for r in C.dsir_sample(df, F.col("lang") == "en", n=20).collect()]
    spark.catalog.clearCache()
    b = [r.doc_id for r in C.dsir_sample(df, F.col("lang") == "en", n=20).collect()]
    assert a == b  # md5-derived Gumbel draw, no RNG state
    # the far-off-distribution docs should not crowd the sample
    assert sum(1 for i in a if 60 <= i < 90) <= 2
    spark.catalog.clearCache()


# -- CCNet perplexity buckets -----------------------------------------------


def test_ccnet_buckets_cover_and_order(spark, docs):
    out = C.ccnet_perplexity_buckets(docs).collect()
    assert len(out) == docs.count()
    by_lang: dict[str, dict[str, list[float]]] = {}
    for r in out:
        by_lang.setdefault(r.lang, {}).setdefault(r.bucket, []).append(r.avg_nll)
    assert set(b for d in by_lang.values() for b in d) <= {"head", "middle", "tail"}
    for lang, d in by_lang.items():
        # threshold semantics: head <= ql < middle <= qh < tail
        if "head" in d and "middle" in d:
            assert max(d["head"]) <= min(d["middle"])
        if "middle" in d and "tail" in d:
            assert max(d["middle"]) <= min(d["tail"])
        n = sum(len(v) for v in d.values())
        if n >= 8:
            # the head is a minority slice, never the bulk
            assert len(d.get("head", [])) <= n * 0.5


def test_split_leakage_flags_cross_split_near_dup(spark):
    """A planted near-dup pair whose members hash into different splits
    must surface with is_leak=true; a same-split near-dup pair must
    appear flagged false (the leak RATE needs both populations)."""
    from pyspark.sql import functions as F

    from vertica_hadoop_integration__spark.operators.corpus import (
        hash_split,
        split_leakage_pairs,
    )

    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep green forest tonight"
    )
    # find doc ids landing in different splits under the real hash
    ids = spark.range(0, 200).select(F.col("id").alias("doc_id"))
    splits = {
        r["doc_id"]: r["split"]
        for r in hash_split(ids, id_col="doc_id").collect()
    }
    train_ids = [i for i, s in splits.items() if s == "train"]
    other = next((i, s) for i, s in splits.items() if s != "train")
    a, b = train_ids[0], other[0]          # cross-split near-dup pair
    c, d = train_ids[1], train_ids[2]      # same-split near-dup pair
    rows = [
        (a, base), (b, base + " extra"),
        (c, base.replace("fox", "cat")), (d, base.replace("fox", "cat") + " extra"),
    ] + [
        (i, f"unique filler document number {i} with nothing shared {i * 7}")
        for i in train_ids[3:10]
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        (r["doc_id_a"], r["doc_id_b"]): r["is_leak"]
        for r in split_leakage_pairs(docs).collect()
    }
    key_ab = (min(a, b), max(a, b))
    key_cd = (min(c, d), max(c, d))
    assert out.get(key_ab) is True, out
    assert out.get(key_cd) is False, out


def test_gopher_rules_planted_violations(spark):
    """Each Gopher rule must fire on a document engineered to violate
    exactly it (and pass on a clean one) — the fixture corpus is
    single-line so the line-based rules are only exercised here."""
    from vertica_hadoop_integration__spark.operators.text import gopher_rules

    good_words = ("the cat and the dog have been to many of those "
                  "places that we know with great joy ") * 3  # 60 words
    docs = [
        (1, good_words),
        (2, "short text that ends now"),                     # word_count
        (3, " ".join(["ab"] * 60)),                          # mean_word_length (and stop_words)
        (4, good_words + " " + "#tag " * 12),                # symbol_ratio
        (5, "\n".join(["- bullet item here now"] * 10)),     # bullet_lines
        (6, "\n".join([good_words, "trailing thing...", "another one...",
                       "third line..."])),                   # ellipsis_lines
        (7, good_words + " " + "1234 5678 " * 30),           # alpha_words
        (8, " ".join(["zebra", "quartz", "mango"] * 20)),    # stop_words
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r["doc_id"]: r.asDict() for r in gopher_rules(df).collect()}
    assert out[1]["gate_reason"] == "pass", out[1]
    assert out[2]["gate_reason"] == "word_count"
    assert not out[3]["ok_mean_word_length"]
    assert out[4]["gate_reason"] == "symbol_ratio"
    assert out[5]["ok_word_count"] and not out[5]["ok_bullet_lines"]
    assert not out[6]["ok_ellipsis_lines"]
    assert out[7]["gate_reason"] == "alpha_words"
    assert out[8]["gate_reason"] == "stop_words"


def test_dedup_lines_within_doc_planted(spark):
    """Repeated lines drop, first occurrence kept in order; unique docs
    pass through unchanged (the fixture corpus is single-line, so the
    semantics live here)."""
    from vertica_hadoop_integration__spark.operators.text import (
        dedup_lines_within_doc,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha\nbeta\nalpha\ngamma\nbeta"),
            (2, "only one line"),
            (3, "x\nx\nx\nx"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r.asDict() for r in dedup_lines_within_doc(docs).collect()}
    assert out[1]["text"] == "alpha\nbeta\ngamma"
    assert (out[1]["n_lines"], out[1]["n_kept"]) == (5, 3)
    assert out[2]["text"] == "only one line"
    assert out[3] == {"doc_id": 3, "text": "x", "n_lines": 4, "n_kept": 1}


def test_keep_best_string_ids_take_type_agnostic_path(spark):
    """r06 ADVICE: the max_by (score, -id) trick silently breaks on a
    non-numeric id (negating a string casts to NULL -> nondeterministic
    tie).  String-keyed clusters must route through the window fallback
    and keep the id-ascending tie-break."""
    from vertica_hadoop_integration__spark.operators.dedup import (
        keep_best_per_cluster,
    )

    clusters = spark.createDataFrame(
        [("a", "a", 3), ("b", "a", 3), ("c", "a", 3), ("x", "x", 2), ("y", "x", 2)],
        "doc_id string, canonical_id string, cluster_size long",
    )
    scores = spark.createDataFrame(
        [("a", 0.2), ("b", 0.9), ("c", 0.9), ("x", 0.5), ("y", 0.4)],
        "doc_id string, quality_prob double",
    )
    rows = {
        r.canonical_id: r
        for r in keep_best_per_cluster(clusters, scores).collect()
    }
    assert set(rows) == {"a", "x"}
    # quality ties break toward the LEXICOGRAPHICALLY smaller id
    assert rows["a"].kept_doc_id == "b" and rows["a"].kept_quality == 0.9
    assert rows["a"].n_dropped == 2
    assert rows["x"].kept_doc_id == "x" and rows["x"].n_dropped == 1


def test_keep_best_fractional_ids_tiebreak_by_id_not_truncation(spark):
    """r07 ADVICE: NumericType includes fractional types, but
    (-id).cast('long') truncates — score ties between ids equal after
    truncation (3.2 vs 3.9) broke nondeterministically.  Fractional ids
    must route through the type-agnostic window and tie-break by the
    EXACT ascending id."""
    from vertica_hadoop_integration__spark.operators.dedup import (
        keep_best_per_cluster,
    )

    clusters = spark.createDataFrame(
        [(3.2, 1.0, 3), (3.9, 1.0, 3), (7.5, 1.0, 3)],
        "doc_id double, canonical_id double, cluster_size long",
    )
    scores = spark.createDataFrame(
        [(3.2, 0.9), (3.9, 0.9), (7.5, 0.1)],  # tie between 3.2 and 3.9
        "doc_id double, quality_prob double",
    )
    (row,) = keep_best_per_cluster(clusters, scores).collect()
    assert row.kept_doc_id == 3.2  # exact id asc, not long-truncated tie
    assert row.kept_quality == 0.9 and row.n_dropped == 2
