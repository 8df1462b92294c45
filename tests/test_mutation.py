"""MERGE / SCD2 semantics (operators/relational.py): matched rows take
update values, unmatched updates insert, untouched rows pass through;
SCD2 closes exactly the open row of each changed key and appends one new
open version."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from vertica_hadoop_integration__spark.operators.relational import (
    merge_upsert,
    scd2_apply,
)

T1 = datetime.datetime(2024, 6, 1)


def test_merge_upsert_update_insert_passthrough(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["k", "s", "v"]
    )
    updates = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], ["k", "s", "v"]
    )
    got = {r.k: (r.s, r.v) for r in merge_upsert(target, updates, ["k"]).collect()}
    assert got == {
        1: ("a", 10.0),   # untouched
        2: ("B", 99.0),   # matched -> update wins
        3: ("c", 30.0),   # untouched
        4: ("d", 40.0),   # not matched -> insert
    }


def test_merge_upsert_partial_update_columns(spark):
    """Updates missing a non-key column leave that column at the target
    value for matched rows (NULL for pure inserts)."""
    target = spark.createDataFrame([(1, "a", 10.0)], ["k", "s", "v"])
    updates = spark.createDataFrame([(1, "A")], ["k", "s"])
    row = merge_upsert(target, updates, ["k"]).collect()[0]
    assert (row.k, row.s, row.v) == (1, "A", 10.0)


def test_scd2_apply_close_and_append(spark):
    dim = spark.createDataFrame(
        [
            # key 1: one closed historical row + one open row
            (1, 100, datetime.datetime(2020, 1, 1), datetime.datetime(2022, 1, 1)),
            (1, 101, datetime.datetime(2022, 1, 1), None),
            # key 2: open only, unchanged
            (2, 200, datetime.datetime(2020, 1, 1), None),
        ],
        ["k", "attr", "valid_from", "valid_to"],
    )
    changes = spark.createDataFrame([(1, 102, T1)], ["k", "attr", "change_ts"])
    out = scd2_apply(dim, changes, ["k"]).collect()
    rows = sorted((r.k, r.attr, r.valid_from, r.valid_to) for r in out)
    assert rows == [
        (1, 100, datetime.datetime(2020, 1, 1), datetime.datetime(2022, 1, 1)),
        (1, 101, datetime.datetime(2022, 1, 1), T1),          # closed
        (1, 102, T1, None),                                    # new open
        (2, 200, datetime.datetime(2020, 1, 1), None),         # untouched
    ]
    # invariant: exactly one open row per key after the batch
    open_per_key = {}
    for k, _, _, vt in rows:
        if vt is None:
            open_per_key[k] = open_per_key.get(k, 0) + 1
    assert open_per_key == {1: 1, 2: 1}


# -- CDC apply -------------------------------------------------------------


def test_cdc_apply_semantics(spark):
    """Max-seq wins; D removes; I inserts; untouched rows pass through."""
    from vertica_hadoop_integration__spark.operators.relational import cdc_apply

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "v"]
    )
    log = spark.createDataFrame(
        [
            ("U", 1, 1, "a2"),   # update k=1
            ("D", 2, 1, None),   # ...then delete it (higher seq wins)
            ("U", 1, 2, "b2"),   # update k=2
            ("I", 1, 9, "new"),  # insert k=9
        ],
        ["op", "seq", "k", "v"],
    )
    got = {(r.k, r.v) for r in cdc_apply(base, log, key_cols=["k"]).collect()}
    assert got == {(2, "b2"), (3, "c"), (9, "new")}
