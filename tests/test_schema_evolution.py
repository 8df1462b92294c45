"""read_evolved (sources/readers.py): schema-generation merging and
target-schema conforming for long-lived parquet directories."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vertica_hadoop_integration__spark.sources.readers import read_evolved


def test_read_evolved_merges_generations_and_conforms(spark, tmp_path):
    path = str(tmp_path / "evolving")
    # generation 1: (id int, v float)
    spark.createDataFrame([(1, 1.5), (2, 2.5)], "id int, v float").write.parquet(
        path, mode="append"
    )
    # generation 2: adds a column and widens id usage downstream
    spark.createDataFrame(
        [(3, 3.5, "x"), (4, 4.5, "y")], "id int, v float, tag string"
    ).write.parquet(path, mode="append")

    # plain merge: union schema, old files read tag as NULL
    merged = read_evolved(spark, path)
    assert set(merged.columns) == {"id", "v", "tag"}
    rows = {r.id: (r.v, r.tag) for r in merged.collect()}
    assert rows[1] == (1.5, None) and rows[3] == (3.5, "x")

    # conform to a v3 contract: id widened to long, v to double, a new
    # not-yet-written column materialized as typed NULL, fixed order
    target = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v", T.DoubleType()),
            T.StructField("tag", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    conformed = read_evolved(spark, path, target)
    assert conformed.columns == ["id", "v", "tag", "score"]
    assert [f.dataType.simpleString() for f in conformed.schema.fields] == [
        "bigint", "double", "string", "double",
    ]
    got = {r.id: (r.v, r.tag, r.score) for r in conformed.collect()}
    assert got[2] == (2.5, None, None) and got[4] == (4.5, "y", None)

    # a file with an extra column not in the contract: dropped silently
    spark.createDataFrame(
        [(5, 5.5, "z", 9)], "id int, v float, tag string, extra int"
    ).write.parquet(path, mode="append")
    again = read_evolved(spark, path, target)
    assert again.columns == ["id", "v", "tag", "score"]
    assert again.count() == 5
