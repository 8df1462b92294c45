"""Bench harness integrity: every headline name must be a registered
query (a typo here would silently record an error line in the round's
BENCH artifact), with no duplicates (a duplicate would double-count the
suite total)."""

from __future__ import annotations


def test_headline_names_registered():
    from bench import HEADLINE
    from vertica_hadoop_integration__spark.plans import QUERIES

    missing = [n for n in HEADLINE if n not in QUERIES]
    assert not missing, f"bench names not registered: {missing}"
    assert len(HEADLINE) == len(set(HEADLINE)), "duplicate bench entries"


def test_every_headline_query_has_budget_row():
    """r06 verdict item 8: a query enters the headline and the budget
    file in the SAME commit — otherwise it runs unguarded until the next
    budget refreeze.  Budget for a new query = 2x its best-known min
    (bench a quiet host, take min of trials)."""
    import json
    import os

    from bench import HEADLINE

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "reports", "bench_budget.json")) as fh:
        budget = json.load(fh)["budget_seconds"]
    unbudgeted = [q for q in HEADLINE if q not in budget]
    assert not unbudgeted, f"headline queries without budget: {unbudgeted}"


def test_per_query_budget_vs_round5():
    """Per-query perf regression gate (r05 verdict item 5): every
    headline query's min-of-trials in the CLOSE-OUT bench report must
    stay within 3x the suite-normalized round-5 min
    (reports/bench_budget.json); set SPARK_GRAFT_SKIP_BENCH_GATE=1 to
    skip when the host is known-loaded.  Queries added after round 5
    have no budget row and are not gated (they enter the budget when it
    is refrozen).

    Hermeticity (r08 verdict item 2): this test reads
    reports/bench_closeout.json — written only when the builder runs
    bench.py with SPARK_GRAFT_CLOSEOUT=1 on a quiet host — NOT
    reports/bench_full_latest.json, which the driver overwrites every
    round with runs from a possibly-loaded host (r08: a 153s ambient
    burst in a driver trial failed this suite with zero code change).

    Known sensitivity: Arrow/Python-worker-bound queries (multimodal_*)
    pay worker-pool spin-up that host-level ambient load inflates far
    more than JVM queries, so they can trip this gate without a code
    change; the confirmation protocol is an interleaved A/B in a fresh
    session (see reports/NOTES.md round 6) before treating a flag as a
    regression."""
    import json
    import os

    import pytest

    if os.environ.get("SPARK_GRAFT_SKIP_BENCH_GATE"):
        pytest.skip("ambient-load flag set")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    budget_path = os.path.join(root, "reports", "bench_budget.json")
    latest_path = os.path.join(root, "reports", "bench_closeout.json")
    if not (os.path.exists(budget_path) and os.path.exists(latest_path)):
        pytest.skip("bench artifacts not present")
    with open(budget_path) as fh:
        budget = json.load(fh)["budget_seconds"]
    with open(latest_path) as fh:
        latest = json.load(fh)
    if latest.get("sf") != 0.1:
        pytest.skip(f"latest bench ran at sf={latest.get('sf')}, budget is sf0.1")
    # Host noise moves same-code timings up to ~2.1x between runs
    # (observed: dedup_minhash_lsh 2.07s -> 4.35s, identical code), and
    # it moves the WHOLE suite together.  So normalize by the suite-wide
    # median inflation: a real regression is a query whose ratio vs its
    # round-5 min is an outlier against the suite's ambient ratio, not a
    # query that merely rode a loaded host.
    import statistics

    ratios = {
        name: sec / (budget[name] / 2.0)
        for name, sec in latest.get("queries", {}).items()
        if name in budget and budget[name] > 0
    }
    if len(ratios) < 10:
        pytest.skip("too few common queries to estimate ambient inflation")
    ambient = max(1.0, statistics.median(ratios.values()))
    # Threshold 3x: single-query noise alone reaches ~2.1x on this host
    # (same-code reruns), so 2x would flake; the regression class this
    # gate exists for — an edit that de-broadcasts a join or defeats a
    # pushed filter — shows up as 5-10x (r05's join_bloom_filtered was
    # 10x before its fix).  Sub-0.5s queries are all noise at this SF.
    over = {
        name: round(r, 2)
        for name, r in ratios.items()
        if r > 3.0 * ambient and latest["queries"][name] >= 0.5
    }
    assert not over, (
        f"queries over 3x the suite's ambient inflation ({ambient:.2f}x): "
        + json.dumps(over, sort_keys=True)
    )
