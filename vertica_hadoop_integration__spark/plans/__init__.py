"""Query registry: every operator from SURVEY.md §2 exposed as a named
(spark, sf_dir) -> DataFrame program, with (where SQL-expressible) a
matching DuckDB oracle SQL string.

Importing this package populates the registry.
"""

# Registration order is significant: the driver's correctness harness checks
# the first 50 queries in registration order.  The WINDOW list below rotates
# which 50 sit in that head, with the explicit goal of getting a driver-
# verified row for EVERY registered query across rounds (union of green
# driver rows r01-r03 = 98/175; this round's window is drawn entirely from
# the never-driver-green remainder).  Nothing is removed, only reordered;
# the full registry is always checked by tools/check_correctness.py, and
# once every query has a driver row the WINDOW indirection will be deleted.
from . import (  # noqa: F401  (imported for registration side effects)
    queries_reference,
    queries_llm,
    queries_temporal,
    queries_events,
    queries_multimodal,
    queries_curation,
    queries_extras,
    queries_relational,
)
from .registry import ORACLES, QUERIES

# Round-5 window: COMPLETES driver coverage.  41 queries have never had a
# driver CORRECTNESS row across r01-r04 (27 oracle-checked + 14 rows-only;
# the list below matches ROADMAP.md and the round-4 verdict's independent
# recomputation).  The remaining 9 slots: dq_rules_orders (the one red r04
# row — oracle BIGINT cast fixed this round, must show green), the two
# queries whose registered plan changed this round (corpus_weighted_sample
# and sketch_countmin_topk moved from a global row_number window to
# mergeable orderBy+limit — result-identical, but the driver must confirm),
# and 6 previously-green SENTINELS spanning the rotated-out families
# (advisor ask: keep cross-round regressions in rotated-out queries visible
# to the driver, not only to tools/check_correctness.py).  After r05 every
# registered query has a driver row; the WINDOW indirection is then deleted.
WINDOW = [
    # --- never-sampled, oracle-checked (27) ---
    "dedup_threshold_sweep", "dedup_containment_clustered",
    "embedding_hard_negatives", "embedding_label_noise",
    "embedding_quantize_int8", "ann_pq_topk", "ann_ivf_pq_topk",
    "text_feature_hashing", "text_redact_pii", "text_bigram_logprob",
    "text_bpe_merge_step",
    "corpus_sample_systematic", "corpus_length_histogram",
    "corpus_curriculum_order", "corpus_mixture_rebalance",
    "corpus_length_bucketing", "corpus_vocab_stats", "corpus_hash_split",
    "corpus_domain_cap",
    "events_dedup_exact", "events_anomaly_zscore",
    "events_seasonal_anomaly", "events_value_histogram",
    "multimodal_dedup_exact", "stats_linreg_per_group",
    "graph_triangle_count", "sketch_kmv_set_ops",
    # --- never-sampled, rows-only by design (14) ---
    "multimodal_phash_dedup", "multimodal_audio_dedup",
    "multimodal_audio_spectrum", "dedup_minhash_probe",
    "embedding_kmeans", "pipeline_clean_corpus_clustered",
    "ann_cosine_topk_arrow", "text_bpe_learn_merges", "text_bpe_encode",
    "sketch_hll_distinct", "sketch_approx_quantiles",
    "jsonl_ingest_roundtrip", "corpus_dedup_summary",
    "ann_ivf_kmeans_topk",
    # --- red-row re-verification (oracle BIGINT cast fixed r05) ---
    "dq_rules_orders",
    # --- plan changed r05 (global window -> mergeable top-k) ---
    "corpus_weighted_sample", "sketch_countmin_topk",
    # --- new this round (registered after the r05 plan was drawn): put
    # them in the head so NO query is ever without a driver row and the
    # WINDOW list can be deleted next round with coverage complete ---
    "corpus_shuffle_shards", "embedding_pca_project", "multimodal_resize",
    "multimodal_video_decode",
    # --- sentinels: previously driver-green, one per rotated-out family.
    # Four of the original six yielded their slots to new r05 queries
    # (ANN, text, events, dedup — each of those families is already
    # represented in this window by 3+ never-sampled members, so a
    # shared-machinery regression stays driver-visible); the relational
    # and reference-pipeline families have no other in-window member and
    # keep their sentinels.  multimodal_video_frames (registered after
    # the last free slot was taken) goes in the r06 window. ---
    "q1_pricing_summary", "s10_pending_pipeline",
]
assert len(WINDOW) == 50 and len(set(WINDOW)) == 50
_missing = [n for n in WINDOW if n not in QUERIES]
assert not _missing, f"WINDOW names not registered: {_missing}"
_order = WINDOW + [n for n in QUERIES if n not in set(WINDOW)]
_reordered = {n: QUERIES[n] for n in _order}
QUERIES.clear()
QUERIES.update(_reordered)

__all__ = ["QUERIES", "ORACLES"]
