"""Catalog + JDBC option/DDL construction tests (no live DB: the JDBC
module's pure parts are fully testable; the read/write wrappers are
integration-gated exactly like the reference's DSN env)."""

import pytest
from pyspark.sql import types as T

from vertica_hadoop_integration__spark import catalog as C
from vertica_hadoop_integration__spark.sources import jdbc as J
from vertica_hadoop_integration__spark.sources import load_table


def test_vertica_type_map_reference_patches():
    # the two patches the reference applies by string replace
    # (sqoop_pyhive.py:33-34,55-56)
    assert C.vertica_type_to_spark("numeric(18,4)") == T.DecimalType(18, 4)
    assert C.vertica_type_to_spark("timestamp(6)") == T.TimestampType()
    # surrounding surface
    assert C.vertica_type_to_spark("int") == T.LongType()
    assert C.vertica_type_to_spark("varchar(255)") == T.StringType()
    assert C.vertica_type_to_spark("float8") == T.DoubleType()
    assert C.vertica_type_to_spark("DATE") == T.DateType()
    with pytest.raises(ValueError):
        C.vertica_type_to_spark("geometry")


def test_type_map_roundtrip():
    assert C.spark_type_to_vertica(T.DecimalType(12, 2)) == "numeric(12,2)"
    assert C.spark_type_to_vertica(T.TimestampType()) == "timestamp"
    assert C.spark_type_to_vertica(T.LongType()) == "int"


def test_reflection_and_ddl_export(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    assert C.reflect_columns(o)[0] == "o_orderkey"
    pairs = C.reflect_columns_with_types(o)
    assert "o_orderkey bigint" in pairs
    ddl = C.export_ddl(o, "dw.orders")
    assert ddl.startswith("CREATE TABLE dw.orders")
    assert "o_totalprice double" in ddl


def test_partition_read_options_mirror_reference_envelope():
    src = J.JdbcSource(url="jdbc:vertica://host:5433/dw", table="dw.t", user="u")
    opts = J.partition_read_options(src, partition_column="rowId", num_partitions=8)
    # NUM_MAPPERS=8 -> 8 partitions over rowId in [0, 8) — the exact
    # boundary query the reference injected (sqoop_json.py:31)
    assert opts["numPartitions"] == "8"
    assert opts["lowerBound"] == "0" and opts["upperBound"] == "8"
    assert opts["partitionColumn"] == "rowId"
    assert opts["fetchsize"] == "10000"


def test_mod_predicates_cover_all_buckets():
    preds = J.mod_predicates("order_id", 4)
    assert len(preds) == 4
    assert preds[0] == "MOD(order_id, 4) = 0"
    assert len(set(preds)) == 4


def test_salted_subquery_shape():
    q = J.salted_subquery("dw.t", ["a", "b"], 8)
    assert "ROW_NUMBER() OVER" in q and "MOD" in q and q.endswith("salted")


def test_external_table_ddl(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    ddl = J.vertica_external_table_ddl(o, "dw.orders", "hdfs://nn/warehouse/orders")
    assert ddl.startswith("CREATE EXTERNAL TABLE dw.orders_ext (")
    assert "o_orderkey int" in ddl
    assert ddl.endswith("ON ANY NODE ORC")
    assert "COPY FROM 'hdfs://nn/warehouse/orders/*'" in ddl


def test_cli_runs_yaml_job(spark, sf_dir, tmp_path):
    import yaml

    spec = {
        "table_name": "orders",
        "source_path": sf_dir,
        "target_path": str(tmp_path / "out"),
        "primary_id": "order_month",
        "num_partitions": 2,
        "output_format": "parquet",
        "partition_source_column": "o_orderdate",
    }
    yml = tmp_path / "orders.yaml"
    yml.write_text(yaml.safe_dump(spec))
    from vertica_hadoop_integration__spark.cli import main

    rc = main(["run", str(yml), "--ledger", str(tmp_path / "ledger")])
    assert rc == 0
    import os

    assert len(os.listdir(tmp_path / "out")) > 0
