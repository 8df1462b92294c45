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
