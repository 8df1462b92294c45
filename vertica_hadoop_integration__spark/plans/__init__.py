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

# Round-6 window: closes driver coverage COMPLETELY.  18 queries
# (r05's late additions) have never had a driver CORRECTNESS row; they
# head the window, followed by this round's changed-or-new queries that
# need a (re-)verification row:
#   - text_bpe_merge_step: r05's only red row — oracle typing artifact
#     (uncast sum(wc) -> DuckDB HUGEINT); CAST AS BIGINT applied, values
#     were already bit-identical.  Must show green.
#   - dedup_threshold_sweep: oracle threshold literal cast to DOUBLE
#     this round (was DECIMAL(2,1) — same typing class, found by the new
#     tools/audit_oracle_types.py sweep).  Re-verify.
#   - dedup_embedding_cosine_exact_smalln: r05's dedup_embedding_cosine
#     renamed + structurally bounded (vec_id < 1000 pushed into both
#     scan sides); new name needs its first driver row.
# Everything after the explicit head falls back to natural registration
# order (the reference relational suite first — all driver-green since
# r01 — acting as the regression sentinels).  Once this round's rows
# land, every registered query has appeared in some CORRECTNESS_r*.json.
WINDOW = [
    # --- never-driver-sampled (18; r05 late additions) ---
    "ann_pca_topk", "ann_recall_report", "corpus_ccnet_buckets",
    "corpus_dsir_sample", "corpus_quality_threshold_sweep",
    "corpus_semantic_decontaminate", "csv_ingest_errors",
    "dedup_keep_best", "jsonl_ingest_errors", "multimodal_decode_errors",
    "multimodal_video_frames", "multimodal_video_thumbnails",
    "sketch_hll_rollup", "text_hybrid_search", "text_langid_confusion",
    "text_logreg_train", "text_logreg_train_step",
    "text_quality_confusion",
    # --- changed this round: red-fix / oracle-cast / rename re-verify ---
    "text_bpe_merge_step", "dedup_threshold_sweep",
    "dedup_embedding_cosine_exact_smalln",
    # --- new r06 queries get appended here as they are registered ---
    "skew_rebalance_report", "skew_salted_join_events",
    "skew_range_rebalance", "corpus_split_leakage", "layout_zorder_profile",
    "text_kn_bigram_logprob", "text_gopher_rules", "ann_pq_rerank_topk",
    "pipeline_training_set_summary", "sketch_hll_portable",
    "corpus_dedup_summary",  # upgraded rows-only -> oracle this round
    "text_dedup_lines", "dq_freshness", "asof_join_tolerance",
]
assert len(WINDOW) <= 50 and len(set(WINDOW)) == len(WINDOW)
_missing = [n for n in WINDOW if n not in QUERIES]
assert not _missing, f"WINDOW names not registered: {_missing}"
_order = WINDOW + [n for n in QUERIES if n not in set(WINDOW)]
_reordered = {n: QUERIES[n] for n in _order}
QUERIES.clear()
QUERIES.update(_reordered)

__all__ = ["QUERIES", "ORACLES"]
