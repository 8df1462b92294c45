"""Generic pagerank (operators/graph.py): dangling-node handling vs a
pure-Python reference, flat plan growth under high iteration counts,
and cache hygiene (no persisted frames leaked into the session)."""

import pytest

from vertica_hadoop_integration__spark.operators.graph import pagerank


def _ref_pagerank(edges, damping=0.85, teleport=0.15, iters=10,
                  redistribute=True):
    """Reference implementation: dict-based weighted PageRank."""
    nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    outw = {}
    for u, _, w in edges:
        outw[u] = outw.get(u, 0.0) + w
    n = len(nodes)
    r = {p: 1.0 / n for p in nodes}
    for _ in range(iters):
        s = {p: 0.0 for p in nodes}
        for u, v, w in edges:
            s[v] += r[u] * w / outw[u]
        dm = sum(r[p] for p in nodes if p not in outw) if redistribute else 0.0
        r = {p: teleport / n + damping * (s[p] + dm / n) for p in nodes}
    return r


def test_pagerank_redistributes_dangling_mass(spark):
    # 4 -> dangling sink (no out-edges); 1..3 form a weighted cycle
    edges = [(1, 2, 2.0), (2, 3, 1.0), (3, 1, 1.0), (1, 4, 1.0), (2, 4, 3.0)]
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    got = {
        r.node: r.pagerank
        for r in pagerank(df, weight="w", iters=7).collect()
    }
    want = _ref_pagerank(edges, iters=7)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)
    # total mass conserved (sums to 1 with redistribution)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_dangling_error_mode(spark):
    df = spark.createDataFrame([(1, 2, 1.0)], ["src", "dst", "w"])
    with pytest.raises(ValueError, match="dangling"):
        pagerank(df, weight="w", iters=1, dangling="error")
    # symmetric graph passes the probe
    sym = spark.createDataFrame([(1, 2, 1.0), (2, 1, 1.0)], ["src", "dst", "w"])
    out = pagerank(sym, weight="w", iters=2, dangling="error").collect()
    assert len(out) == 2


def test_pagerank_plan_stays_flat_and_unpersists(spark):
    spark.catalog.clearCache()
    edges = [(1, 2, 1.0), (2, 3, 1.0), (3, 1, 1.0)]
    df = spark.createDataFrame(edges, ["src", "dst", "w"])

    def plan_len(iters):
        out = pagerank(df, weight="w", iters=iters, dangling="assume_none")
        return len(out._jdf.queryExecution().optimizedPlan().toString())

    p2, p20 = plan_len(2), plan_len(20)
    # lineage is truncated per iteration -> plan size independent of iters
    assert p20 <= p2 * 1.5, (p2, p20)
    # values still correct at depth
    got = {
        r.node: r.pagerank
        for r in pagerank(df, weight="w", iters=20,
                          dangling="assume_none").collect()
    }
    want = _ref_pagerank(edges, iters=20, redistribute=False)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)
    # no persisted frames leak into the shared session (ADVICE r03);
    # localCheckpoint RDDs are exempt (they ARE the returned data)
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    leaked = [
        str(rdd.toString())
        for rdd in jmap.values()
        if "localcheckpoint" not in str(rdd.toString()).lower()
    ]
    assert leaked == [], leaked


# -- triangle count: edge-iterator parity vs brute force -------------------


def _ref_triangles(pairs):
    """O(n^3) reference: count unordered triangles of the undirected
    simple graph induced by the pair list (self-loops and duplicate /
    reversed edges collapse)."""
    import itertools

    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return sum(
        1
        for x, y, z in itertools.combinations(sorted(adj), 3)
        if y in adj[x] and z in adj[x] and z in adj[y]
    )


def test_triangle_count_random_graph_parity(spark):
    import random

    from vertica_hadoop_integration__spark.operators.graph import (
        triangle_count,
    )

    rng = random.Random(11)
    for trial, (n, m) in enumerate([(12, 30), (25, 80), (40, 90)]):
        pairs = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]  # includes self-loops, duplicates, both orientations
        df = spark.createDataFrame(
            [(a, b) for a, b in pairs], "doc_id_a long, doc_id_b long"
        )
        got = triangle_count(df).collect()[0]["n_triangles"]
        want = _ref_triangles(pairs)
        assert got == want, f"trial {trial}: {got} != {want}"


def test_triangle_count_edge_cases(spark):
    from vertica_hadoop_integration__spark.operators.graph import (
        triangle_count,
    )

    # a single triangle, duplicated and reversed edges, plus a self-loop
    rows = [(1, 2), (2, 1), (2, 3), (1, 3), (3, 3), (1, 2)]
    df = spark.createDataFrame(rows, "doc_id_a long, doc_id_b long")
    assert triangle_count(df).collect()[0]["n_triangles"] == 1
    # a path graph has none
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "doc_id_a long, doc_id_b long"
    )
    assert triangle_count(path).collect()[0]["n_triangles"] == 0
    # K4 has exactly 4
    k4 = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a < b],
        "doc_id_a long, doc_id_b long",
    )
    assert triangle_count(k4).collect()[0]["n_triangles"] == 4


class TestLinkPredictionHubCap:
    """r09 verdict item 2: the wedge expansion must be bounded under
    hub skew.  A planted hub of degree >> max_degree contributes at
    most max_degree^2 wedges (deterministic md5-rank neighbor sample);
    pairs whose wedge centers are below the cap are byte-identical to
    the uncapped run."""

    def _graph(self, spark):
        edges = []
        for c in (1, 3):  # two degree-2 wedge centers -> pair (100,101)
            edges += [(c, 100), (c, 101)]
        for h in (2, 4):  # two planted hubs, degree 40 each
            edges += [(h, x) for x in range(200, 240)]
        return spark.createDataFrame(edges, "u long, v long")

    def _canon(self, df):
        return {
            (r.a, r.b): (r.n_common, round(r.jaccard, 9))
            for r in df.collect()
        }

    def test_non_hub_pairs_unchanged_and_hub_fanout_cut(self, spark):
        from vertica_hadoop_integration__spark.operators.graph import (
            jaccard_link_prediction,
        )

        g = self._graph(spark)
        capped = self._canon(
            jaccard_link_prediction(g, top=2000, min_common=2, max_degree=5)
        )
        uncapped = self._canon(
            jaccard_link_prediction(
                g, top=2000, min_common=2, max_degree=None
            )
        )
        # the low-degree-center pair survives the cap bit-identically
        assert capped[(100, 101)] == uncapped[(100, 101)] == (2, 1.0)
        # capping only removes wedges: no new pairs, no higher counts
        assert set(capped) <= set(uncapped)
        for k, (nc, _) in capped.items():
            assert nc <= uncapped[k][0]
        # hub-mediated pairs (both endpoints in the hubs' leaf range)
        # collapse from C(40,2)=780 to at most C(5,2)-ish survivors
        hub_pairs = lambda d: [  # noqa: E731
            k for k in d if 200 <= k[0] < 240 and 200 <= k[1] < 240
        ]
        assert len(hub_pairs(uncapped)) == 780
        assert len(hub_pairs(capped)) < 40, (
            "hub cap did not bound the wedge fan-out"
        )

    def test_cap_is_deterministic_across_runs(self, spark):
        from vertica_hadoop_integration__spark.operators.graph import (
            jaccard_link_prediction,
        )

        g = self._graph(spark)
        r1 = self._canon(
            jaccard_link_prediction(
                g.repartition(7), top=2000, min_common=2, max_degree=5
            )
        )
        r2 = self._canon(
            jaccard_link_prediction(
                g.repartition(3), top=2000, min_common=2, max_degree=5
            )
        )
        assert r1 == r2
