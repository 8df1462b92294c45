"""Shared DuckDB-oracle SQL fragments, import-side-effect-free.

Oracle generators that multiple query modules compose (the minhash
pipeline replay) live here so importing them can never trigger another
module's @register side effects — registration ORDER is the driver's
natural-order correctness sample, and a mid-file import of a query
module would splice its whole registry block into the importer's slot
(this bit queries_round7's recall report: its decoration-time import of
queries_extras pushed four late round-7 queries out of the first-50
sample window).
"""

from __future__ import annotations

_H60 = "CAST(('0x'||substr(md5({x}),1,15)) AS BIGINT)"


def minhash_portable_cte(
    num_hashes: int = 8, bands: int = 4, src: str = "documents",
) -> str:
    """The WITH-body of the minhash_dedup_portable replay (CTEs toks,
    sh, sig, bands, cand, ver) — shared by the full-pipeline oracle in
    queries_extras and the recall-report oracle in queries_round7."""
    rpb = num_hashes // bands
    sig_cols = ",\n           ".join(
        "list_min(list_transform(shs, s -> "
        + _H60.format(x=f"'{j}:'||s")
        + f")) AS mh{j}"
        for j in range(num_hashes)
    )
    band_sel = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, "
        + ", ".join(f"mh{b * rpb + r} AS x{r}" for r in range(rpb))
        + " FROM sig"
        for b in range(bands)
    )
    on = " AND ".join(f"a.x{r} = b.x{r}" for r in range(rpb))
    return rf"""toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
      FROM {src}),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(t)-2, 1)),
               i -> array_to_string(t[i:i+2], ' '))) AS shs
      FROM toks),
    sig AS (SELECT doc_id, shs, {sig_cols} FROM sh),
    bands AS ({band_sel}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND {on} AND a.doc_id < b.doc_id),
    ver AS (
      SELECT c.doc_id_a, c.doc_id_b,
             CAST(len(list_intersect(sa.shs, sb.shs)) AS DOUBLE) /
             CAST(len(sa.shs) + len(sb.shs)
                  - len(list_intersect(sa.shs, sb.shs)) AS DOUBLE) AS jaccard
      FROM cand c JOIN sig sa ON sa.doc_id = c.doc_id_a
                  JOIN sig sb ON sb.doc_id = c.doc_id_b)"""
