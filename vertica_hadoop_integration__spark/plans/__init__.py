"""Query registry: every operator from SURVEY.md §2 exposed as a named
(spark, sf_dir) -> DataFrame program, with (where SQL-expressible) a
matching DuckDB oracle SQL string.

Importing this package populates the registry.

Registration order is significant: the driver's correctness harness
samples the first 50 queries in registration order.  Rounds 1-6 rotated
an explicit WINDOW list through that head until every registered query
had a driver-verified CORRECTNESS row (coverage completed with
CORRECTNESS_r06: 230/230 sampled, 0 outstanding failures) — the WINDOW
indirection is now deleted and the head is natural registration order:

* ``queries_reference`` first — the reference suite (S1-S20,
  driver-green every round since r01) is the standing regression
  sentinel set.
* ``queries_roundN`` second — NEW queries each round register here so
  they fall inside the driver's first-50 sample and earn their first
  driver row the round they are written; once a round's rows land
  green, its queries graduate to their home module (keeping this slot
  small) and the next round's module takes the position.
* Everything after slot 50 is covered by the full local gate
  (tools/check_correctness.py runs ALL registered queries + oracles at
  sf0.01) and the cumulative r01-r06 driver history.
"""

from . import (  # noqa: F401  (imported for registration side effects)
    queries_reference,
    queries_round11,
    queries_round10,
    queries_llm,
    queries_temporal,
    queries_events,
    queries_multimodal,
    queries_curation,
    queries_extras,
    queries_relational,
)
from .registry import ORACLES, QUERIES

# Queries whose ORACLE was added/changed after their last driver
# appearance get one promoted pass through the sample head so the driver
# certifies the new oracle (judge-verified locally; r07 verdict item 1).
# Drop entries once their driver-green row lands.
_HEAD_PROMOTE: list[str] = [
    # (r10 entries all landed driver-green — embedding_kmeans,
    # ann_ivf_kmeans_topk, embedding_pca_project,
    # multimodal_audio_spectrum, text_logreg_train,
    # graph_link_prediction — and were dropped; the queries_round10
    # module graduated out of the head with them.)
    # r11: rows-only -> oracle-checked upgrades (BPE merge-loop unroll,
    # PCA/xxhash-dedup equivalence audits); first driver rows with the
    # new oracles.
    "text_bpe_learn_merges",
    "text_bpe_encode",
    "ann_pca_topk",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_minhash_probe",
    "dedup_minhash_clusters",
    # r11: implementation changed (shared materialized LPA label table;
    # lazy-by-default cache hygiene) — re-certify against the unchanged
    # oracles.
    "graph_label_propagation",
    "graph_modularity",
    "dedup_minhash_probe_portable",
    "pipeline_mmr_rerank",
    "pipeline_mmr_rerank_ivf",
]

# r10 VERDICT item 7: ~100 queries last earned a driver row in r01-r06
# and have since seen shared-kernel rewrites (portable hash,
# brute_force_topk, oracle_fragments).  Rotate a named batch of the
# OLDEST-certified through the sample head each round until the backlog
# drains; replace the batch each round once its rows land green.
_HEAD_RECERTIFY: list[str] = [
    # r11 batch: the r01/r02-era relational core.
    "agg_cube",
    "agg_distinct_stats",
    "agg_exact_percentiles",
    "agg_grouping_sets",
    "agg_rollup",
    "agg_variance_stats",
    "join_broadcast_dim",
    "join_left_outer",
    "join_salted_skew",
    "join_semi",
    "pivot_status_revenue",
    "profile_orders",
    "q18_large_volume_customer",
    "q3_shipping_priority",
    "q5_local_volume",
]


def _reorder() -> None:
    order = list(QUERIES)
    ref = [n for n in order if QUERIES[n].__module__.endswith("queries_reference")]
    new = [n for n in order if QUERIES[n].__module__.endswith("queries_round11")]
    head = ref + new + [
        n for n in _HEAD_PROMOTE + _HEAD_RECERTIFY if n in QUERIES
    ]
    seen = set(head)
    full = head + [n for n in order if n not in seen]
    snapshot = {n: QUERIES[n] for n in full}
    QUERIES.clear()
    QUERIES.update(snapshot)


_reorder()

__all__ = ["QUERIES", "ORACLES"]
