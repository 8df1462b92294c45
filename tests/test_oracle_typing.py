"""The type-kind gate in tools/check_correctness.py must reproduce the
driver's hash-mismatch verdicts that string-normalized value comparison
missed (r04 dq_rules_orders, r05 text_bpe_merge_step — both DuckDB
HUGEINT sums vs Spark BIGINT)."""

import sys

sys.path.insert(0, "/root/repo")

from tools.check_correctness import _kind  # noqa: E402


def test_kind_catches_hugeint_vs_bigint():
    # exact type pair from the r05 red row
    assert _kind("bigint") != _kind("HUGEINT")
    assert _kind("HUGEINT") == "decimal"


def test_kind_catches_decimal_vs_double():
    # dedup_threshold_sweep threshold literal pre-cast
    assert _kind("double") != _kind("DECIMAL(2,1)")


def test_kind_equates_benign_aliases():
    assert _kind("bigint") == _kind("BIGINT") == _kind("int64") == "int"
    assert _kind("double") == _kind("DOUBLE") == _kind("FLOAT") == "float"
    assert _kind("timestamp_ntz") == _kind("TIMESTAMP") == "timestamp"
    assert _kind("array<double>") == _kind("DOUBLE[]") == "array"
    assert _kind("string") == _kind("VARCHAR") == "str"


def test_registered_oracles_kind_clean_smoke():
    """Every oracle's projected literal types must kind-match Spark.

    Full-registry audit is tools/audit_oracle_types.py (ran clean this
    round); here we pin the two historical reds plus the one this-round
    fix so a regression in any of them fails fast without Spark."""
    from __spark_entry__ import oracle_sql

    sqls = oracle_sql()
    assert "CAST(sum(wc) AS BIGINT) AS pair_count" in sqls["text_bpe_merge_step"]
    assert "AS DOUBLE)" in sqls["dedup_threshold_sweep"]
