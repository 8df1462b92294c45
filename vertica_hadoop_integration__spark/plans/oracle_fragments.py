"""Shared DuckDB-oracle SQL fragments, import-side-effect-free.

Oracle generators that multiple query modules compose (the minhash
pipeline replay) live here so importing them can never trigger another
module's @register side effects — registration ORDER is the driver's
natural-order correctness sample, and a mid-file import of a query
module would splice its whole registry block into the importer's slot
(this bit queries_llm's recall report (formerly queries_round7): its decoration-time import of
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
    queries_extras and the recall-report oracle in queries_llm."""
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


def pq_topk_oracle(k: int = 5) -> str:
    """SQL replay of pq_topk (every-10th 16-code codebooks, DECIMAL
    sub-distance encoding, per-query LUT, ADC scoring) with the rank
    cut parameterized — queries_llm registers it at k=5 (ann_pq_topk);
    the NDCG report composes it at k=10."""
    return f"""
    WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cb AS (SELECT CAST(vec_id / 10 AS INT) AS j, v FROM c
           WHERE vec_id % 10 = 0 AND vec_id < 160),
    cbl AS (SELECT j, r.range AS d, v[CAST(r.range + 1 AS INT)] AS cv
            FROM cb CROSS JOIN range(64) r),
    xl AS (SELECT vec_id, r.range AS d, v[CAST(r.range + 1 AS INT)] AS xv
           FROM c CROSS JOIN range(64) r),
    ed AS (
        SELECT x.vec_id, CAST(x.d // 8 AS INT) AS s, cb.j,
               SUM(CAST((x.xv - cb.cv) * (x.xv - cb.cv) AS DECIMAL(30,15)))
                   AS dist
        FROM xl x JOIN cbl cb ON cb.d = x.d
        GROUP BY 1, 2, 3),
    codes AS (
        SELECT vec_id, s, j AS code FROM (
            SELECT vec_id, s, j,
                   row_number() OVER (PARTITION BY vec_id, s
                                      ORDER BY dist, j) AS rn
            FROM ed) WHERE rn = 1),
    ql AS (SELECT vec_id AS query_id, r.range AS d,
                  v[CAST(r.range + 1 AS INT)] AS xv
           FROM c CROSS JOIN range(64) r WHERE vec_id < 5),
    lut AS (
        SELECT q.query_id, CAST(q.d // 8 AS INT) AS s, cb.j,
               SUM(CAST((q.xv - cb.cv) * (q.xv - cb.cv) AS DECIMAL(30,15)))
                   AS qdist
        FROM ql q JOIN cbl cb ON cb.d = q.d
        GROUP BY 1, 2, 3),
    adc AS (
        SELECT l.query_id, cd.vec_id AS neighbor_id, SUM(l.qdist) AS a
        FROM codes cd JOIN lut l ON l.s = cd.s AND l.j = cd.code
        WHERE cd.vec_id <> l.query_id
        GROUP BY 1, 2),
    ranked AS (
        SELECT query_id, neighbor_id, a,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY a, neighbor_id) AS rnk
        FROM adc)
    SELECT query_id, neighbor_id, CAST(a AS DOUBLE) AS approx_l2sq,
           CAST(rnk AS INT) AS rank
    FROM ranked WHERE rnk <= {k}"""


def clean_corpus_kept_ctes(
    min_chars: int = 20,
    min_tokens: int = 5,
    num_hashes: int = 16,
    bands: int = 8,
) -> str:
    """WITH-body replaying clean_corpus(near_dedup='portable') up to the
    verified near-dup pairs: quality gate (length / token / punctuation,
    same expressions the green text_quality_logreg oracle uses),
    stopword-marker language argmax (same CASE tie-break as the green
    text_language_id oracle), exact dedup (min doc per md5 of normalized
    text), then the portable MinHash pipeline over the kept rows
    (CTEs through ``ver``; consumers filter ``ver.jaccard`` and derive
    drops). Final kept columns: doc_id, text, lang, source, n_chars,
    predicted_lang (the ``kept`` CTE)."""
    from ..operators.text import LANG_MARKERS

    langs = sorted(LANG_MARKERS)
    score_cols = ",\n           ".join(
        "len(list_filter(string_split_regex(lower(trim(text)), '\\s+'), "
        "x -> list_contains(["
        + ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
        + f"], x))) AS score_{lang}"
        for lang in langs
    )
    m = "greatest(" + ", ".join(f"score_{lang}" for lang in langs) + ")"
    case = (
        "CASE "
        + " ".join(f"WHEN score_{lang} = {m} THEN '{lang}'" for lang in langs)
        + " END"
    )
    punct = (
        "length(text) - length(regexp_replace(text,"
        " '[.,!?;:''\"()\\[\\]{}-]', '', 'g'))"
    )
    return rf"""gate AS (
      SELECT doc_id, text, lang, source, n_chars
      FROM documents
      WHERE length(text) >= {min_chars}
        AND len(string_split_regex(lower(trim(text)), '\s+')) >= {min_tokens}
        AND ({punct}) * 5 <= length(text)),
    lsc AS (
      SELECT doc_id, text, lang, source, n_chars,
           {score_cols}
      FROM gate),
    gated AS (
      SELECT doc_id, text, lang, source, n_chars,
             {case} AS predicted_lang
      FROM lsc),
    kept AS (
      SELECT doc_id, text, lang, source, n_chars, predicted_lang FROM (
        SELECT g.*, row_number() OVER (
                 PARTITION BY md5(lower(trim(text))) ORDER BY doc_id) AS _rn
        FROM gated g) WHERE _rn = 1),
    {minhash_portable_cte(num_hashes, bands, src="kept")}"""


def minhash_probe_portable_cte(
    num_hashes: int = 8,
    bands: int = 4,
    corpus_src: str = "corpus",
    batch_src: str = "batch",
) -> str:
    """The WITH-body of the minhash_probe_portable replay: the
    single-source fragment's toks/sh/sig/bands chain duplicated per
    side (corpus index + probe batch), candidate probe join, exact
    shingle-set Jaccard verify.  Callers define ``corpus_src`` /
    ``batch_src`` CTEs with (doc_id, text) first."""
    rpb = num_hashes // bands

    def _side(tag: str, src: str) -> str:
        sig_cols = ",\n           ".join(
            "list_min(list_transform(shs, s -> "
            + _H60.format(x=f"'{j}:'||s")
            + f")) AS mh{j}"
            for j in range(num_hashes)
        )
        band_sel = " UNION ALL ".join(
            f"SELECT doc_id, {b} AS band, "
            + ", ".join(f"mh{b * rpb + r} AS x{r}" for r in range(rpb))
            + f" FROM sig_{tag}"
            for b in range(bands)
        )
        return rf"""toks_{tag} AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
      FROM {src}),
    sh_{tag} AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(t)-2, 1)),
               i -> array_to_string(t[i:i+2], ' '))) AS shs
      FROM toks_{tag}),
    sig_{tag} AS (SELECT doc_id, shs, {sig_cols} FROM sh_{tag}),
    bands_{tag} AS ({band_sel})"""

    on = " AND ".join(f"n.x{r} = c.x{r}" for r in range(rpb))
    return rf"""{_side("c", corpus_src)},
    {_side("n", batch_src)},
    cand AS (
      SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corpus_id
      FROM bands_n n JOIN bands_c c ON n.band = c.band AND {on}),
    ver AS (
      SELECT cand.new_id, cand.corpus_id,
             CAST(len(list_intersect(sn.shs, sc.shs)) AS DOUBLE) /
             CAST(len(sn.shs) + len(sc.shs)
                  - len(list_intersect(sn.shs, sc.shs)) AS DOUBLE) AS jaccard
      FROM cand JOIN sig_n sn ON sn.doc_id = cand.new_id
                JOIN sig_c sc ON sc.doc_id = cand.corpus_id)"""


def lpa_cte(iters: int = 3) -> tuple[str, str]:
    """The label-propagation replay over the part co-order graph
    (orderkey % 3 slice) as a reusable WITH-body: returns (cte_body,
    final_label_table) so graph_label_propagation's oracle and any
    consumer of its communities (graph_modularity) replay the IDENTICAL
    sweeps.  The body defines ``e`` (u, v, w — both directions, exact
    co-order counts) and ``l{iters}`` (node, label)."""
    body = """
    WITH li AS (SELECT l_orderkey AS o, l_partkey AS p FROM lineitem
                WHERE l_orderkey % 3 = 0),
    pairs AS (SELECT a.p AS u, b.p AS v FROM li a
              JOIN li b ON a.o = b.o AND a.p <> b.p),
    e AS (SELECT u, v, CAST(count(*) AS BIGINT) AS w FROM pairs
          GROUP BY 1, 2),
    n AS (SELECT DISTINCT u AS node FROM e),
    l0 AS (SELECT node, node AS label FROM n)"""
    prev = "l0"
    for i in range(1, iters + 1):
        body += f""",
    c{i} AS (SELECT e.u, l.label, SUM(e.w) AS ws
             FROM e JOIN {prev} l ON l.node = e.v GROUP BY 1, 2),
    p{i} AS (SELECT u, label FROM (
               SELECT *, row_number() OVER (PARTITION BY u
                   ORDER BY ws DESC, label) AS rn FROM c{i})
             WHERE rn = 1),
    l{i} AS (SELECT n.node, COALESCE(p{i}.label, n.node) AS label
             FROM n LEFT JOIN p{i} ON p{i}.u = n.node)"""
        prev = f"l{i}"
    return body, prev


def bpe_learn_cte(num_merges: int = 8) -> tuple[str, list[str]]:
    r"""The BPE merge-loop replay (operators/text.py::bpe_learn) as a
    reusable WITH-body: returns (cte_body, [t0..t{k-1}]) where each
    ``t{r}`` is the round-r winning merge (l, r, cnt) — the logreg
    gradient-unroll pattern applied to the tokenizer trainer, so
    text_bpe_learn_merges / text_bpe_encode graduate from rows-only.

    Each round's symbol state rides in ONE delimited string per word:
    ``SEP SEP sym1 SEP SEP sym2 SEP SEP`` with SEP = chr(31) (never in
    whitespace-token text).  The greedy left-to-right non-overlapping
    merge then IS SQL ``replace``: the pattern ``SEP l SEP SEP r SEP``
    consumes the inner half of each double boundary, so consecutive
    matches (e.g. aaaa under merge a+a -> [aa, aa]) still fire, while a
    multi-char symbol's suffix can never false-match (property-checked
    against the operator's fold semantics in tests/test_round11_ops.py
    and 2000 randomized trials during development).  Pair counting per
    round splits the delimited string back to its symbol list."""
    S = "'\x1f'"  # chr(31) literal
    S2 = "'\x1f\x1f'"
    body = rf"""
    WITH toks AS (
        SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
        FROM documents),
    wc AS (SELECT w, count(*) AS wc FROM toks GROUP BY 1),
    w0 AS (SELECT wc, {S2} || regexp_replace(w, '(.)', '\1' || {S2}, 'g') AS s
           FROM wc)"""
    names: list[str] = []
    for r in range(num_merges):
        body += f""",
    v{r} AS (SELECT wc, string_split(trim(s, {S}), {S2}) AS syms FROM w{r}),
    p{r} AS (SELECT syms[i] AS l, syms[i + 1] AS r, wc
             FROM (SELECT wc, syms,
                          unnest(generate_series(1, len(syms) - 1)) AS i
                   FROM v{r} WHERE len(syms) >= 2)),
    t{r} AS (SELECT l, r, CAST(sum(wc) AS BIGINT) AS cnt
             FROM p{r} GROUP BY 1, 2 ORDER BY cnt DESC, l, r LIMIT 1),
    w{r + 1} AS (SELECT wc,
                        replace(s, {S} || t.l || {S2} || t.r || {S},
                                {S} || t.l || t.r || {S}) AS s
                 FROM w{r} CROSS JOIN t{r} t)"""
        names.append(f"t{r}")
    return body, names
