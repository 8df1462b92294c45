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
    # (r09 entries all landed driver-green — jsonl_ingest_roundtrip's
    # BIGINT retype, the four sketch audit oracles, ann_cosine_topk_arrow
    # and the normalized events_transition_matrix — and were dropped.)
    # r10: rows-only -> oracle-checked upgrades; first driver rows with
    # the new oracles.
    "embedding_kmeans",
    "ann_ivf_kmeans_topk",
    "embedding_pca_project",
    "multimodal_audio_spectrum",
    "text_logreg_train",
    # r10: hub-degree cap added to the wedge expansion (plan + oracle
    # changed together; the oracle replays the cap).
    "graph_link_prediction",
]


def _reorder() -> None:
    order = list(QUERIES)
    ref = [n for n in order if QUERIES[n].__module__.endswith("queries_reference")]
    new = [n for n in order if QUERIES[n].__module__.endswith("queries_round10")]
    head = ref + new + [n for n in _HEAD_PROMOTE if n in QUERIES]
    seen = set(head)
    full = head + [n for n in order if n not in seen]
    snapshot = {n: QUERIES[n] for n in full}
    QUERIES.clear()
    QUERIES.update(snapshot)


_reorder()

__all__ = ["QUERIES", "ORACLES"]
