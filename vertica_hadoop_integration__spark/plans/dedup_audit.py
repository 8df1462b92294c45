"""Equivalence-audit plumbing for the xxhash64 production dedup paths.

r10 VERDICT item 3: ``dedup_minhash_lsh`` / ``dedup_simhash`` /
``dedup_minhash_probe`` / ``dedup_minhash_clusters`` were the four
standing rows-only registry entries — their xxhash64 signature pipelines
cannot be replayed in DuckDB SQL.  What CAN be certified end-to-end,
in-engine, with an oracle-predictable result (the ann_cosine_topk_arrow
audit pattern) is the contract every LSH family must satisfy regardless
of hash family:

* **soundness** — every emitted pair's similarity, recomputed from RAW
  text through an independent path (string shingle sets, no hashing),
  clears the registered threshold, and the reported value is exactly
  the recomputed one;
* **j=1 completeness** — docs with IDENTICAL shingle sets produce
  identical signatures under ANY hash family, collide in every band,
  and therefore MUST be emitted; the ground-truth identical-shingle
  pair count is itself SQL-computable, so the oracle replays it;
* **canonical form** — a < b, no duplicate pairs.

Each audit publishes one row of booleans computed FOR REAL plus the
oracle-replayed ground-truth counts; the xxhash pair lists themselves
stay available from the operators, and pair-set parity fixtures stay
pytest-pinned (tests/test_llm_ops.py, tests/test_curation.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text_fns import shingles

#: chr(30) record separator — never appears in whitespace-token text
_RS = chr(30)


def shingle_sets(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, shs, skey): each doc's DISTINCT word-3-gram shingle set as
    a sorted string array plus its canonical md5 key — the raw-text
    ground truth the hashed pipelines approximate.  Mirrors the
    portable oracle convention (greatest(n_tokens - 2, 1) shingles, so
    short docs contribute their one partial shingle)."""
    return docs.select(
        F.col(id_col).alias("_id"),
        F.sort_array(
            F.array_distinct(shingles(F.col(text_col), 3))
        ).alias("shs"),
    ).select(
        "_id",
        "shs",
        F.md5(F.concat_ws(_RS, F.col("shs"))).alias("skey"),
    )


def j1_truth_pairs(sets_df: DataFrame) -> DataFrame:
    """Ground-truth j=1.0 pairs (_a < _b): doc pairs with IDENTICAL
    shingle sets, generated inside identical-key groups only (group
    sizes are duplicate-multiplicities — tiny by construction)."""
    g = sets_df.select("skey", F.col("_id"))
    return (
        g.alias("x")
        .join(g.alias("y"), on="skey")
        .filter(F.col("x._id") < F.col("y._id"))
        .select(F.col("x._id").alias("_a"), F.col("y._id").alias("_b"))
    )


def recomputed_jaccard(
    pairs: DataFrame,
    sets_df: DataFrame,
    a_col: str,
    b_col: str,
) -> DataFrame:
    """Attach ``_rj`` — exact Jaccard over the RAW string shingle sets —
    to each pair, via two id-keyed joins (no hashing anywhere on this
    path, so it is independent of the xxhash64 pipeline under audit up
    to 64-bit collisions, which are measure-zero and WOULD be a real
    finding)."""
    sa = sets_df.select(F.col("_id").alias(a_col), F.col("shs").alias("_sa"))
    sb = sets_df.select(F.col("_id").alias(b_col), F.col("shs").alias("_sb"))
    inter = F.size(F.array_intersect(F.col("_sa"), F.col("_sb")))
    union = F.size(F.col("_sa")) + F.size(F.col("_sb")) - inter
    return (
        pairs.join(sa, on=a_col)
        .join(sb, on=b_col)
        .withColumn(
            "_rj", inter.cast("double") / union.cast("double")
        )
        .drop("_sa", "_sb")
    )


def j1_pairs_sql_cte(src: str = "documents") -> str:
    r"""DuckDB WITH-body computing ``gt`` (k = shingle-set md5 key per
    doc_id) — the oracle-side ground truth mirroring shingle_sets."""
    return rf"""
    WITH tk_ AS (SELECT doc_id,
                        string_split_regex(lower(trim(text)), '\s+') AS tk
                 FROM {src}),
    gt AS (SELECT doc_id,
                  md5(array_to_string(list_sort(list_distinct(
                      list_transform(
                          generate_series(1, greatest(len(tk) - 2, 1)),
                          i -> array_to_string(tk[i:i+2], ' ')))),
                      chr(30))) AS k
           FROM tk_)"""


def bool_agg(col, default: bool = True):
    """min() of a boolean column, TRUE on empty input (vacuous audit
    legs must not publish NULL)."""
    return F.coalesce(F.min(col), F.lit(default))
