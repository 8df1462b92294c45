"""Catalog operations: schema reflection, existence probes, DDL export,
and the Vertica<->Spark type map.

The reference reflects schemas from Vertica's catalog at runtime
(v_catalog.columns, sqoop_table.py:114-129; export_objects DDL,
sqoop_table.py:131-135) and patches two type incompatibilities by string
replacement (numeric->decimal, timestamp(6)->timestamp,
sqoop_pyhive.py:33-34,55-56). Here reflection is ``df.schema`` /
``spark.catalog`` (single catalog — the cross-engine schema-drift bug
class the reference had is structurally gone), and the type map is an
explicit table applied at the JDBC boundary.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# -- D11: Vertica type string -> Spark DataType ----------------------------
# Patterns are matched case-insensitively against v_catalog-style names.
_VERTICA_TYPE_PATTERNS: list[tuple[str, "T.DataType | None"]] = [
    (r"^(numeric|number|money)\s*(\(\s*(\d+)\s*,\s*(\d+)\s*\))?$", None),  # decimal, handled below
    (r"^decimal\s*(\(\s*(\d+)\s*,\s*(\d+)\s*\))?$", None),
    (r"^(int|integer|bigint|int8|smallint|tinyint)$", T.LongType()),  # Vertica ints are 64-bit
    (r"^(float|float8|double precision|real)\s*(\(\d+\))?$", T.DoubleType()),
    (r"^boolean$", T.BooleanType()),
    (r"^(char|varchar|long varchar)\s*(\(\d+\))?$", T.StringType()),
    (r"^(varbinary|binary|long varbinary|bytea|raw)\s*(\(\d+\))?$", T.BinaryType()),
    (r"^date$", T.DateType()),
    (r"^(timestamp|datetime|smalldatetime)\s*(\(\d+\))?$", T.TimestampType()),
    (r"^timestamptz\s*(\(\d+\))?$", T.TimestampType()),
    (r"^(time|timetz)\s*(\(\d+\))?$", T.StringType()),  # Spark has no TIME; carry as string
    (r"^(interval.*|uuid)$", T.StringType()),
]


def vertica_type_to_spark(vertica_type: str) -> T.DataType:
    """Map a Vertica catalog type name to a Spark DataType (D11). The two
    reference patches fall out naturally: numeric(p,s) -> DecimalType(p,s)
    and timestamp(6) -> TimestampType."""
    vt = vertica_type.strip().lower()
    m = re.match(r"^(numeric|number|decimal|money)\s*(\(\s*(\d+)\s*,\s*(\d+)\s*\))?$", vt)
    if m:
        if m.group(2):
            return T.DecimalType(int(m.group(3)), int(m.group(4)))
        return T.DecimalType(38, 18)
    for pattern, dtype in _VERTICA_TYPE_PATTERNS:
        if dtype is not None and re.match(pattern, vt):
            return dtype
    raise ValueError(f"unmapped Vertica type: {vertica_type!r}")


def spark_type_to_vertica(dtype: T.DataType) -> str:
    """Reverse map for sink DDL generation (D9). Arrays map to Vertica's
    complex-type syntax (ARRAY[T]), valid for ORC/parquet external
    tables since Vertica 10 — covers the embeddings fixture."""
    if isinstance(dtype, T.DecimalType):
        return f"numeric({dtype.precision},{dtype.scale})"
    if isinstance(dtype, T.ArrayType):
        return f"array[{spark_type_to_vertica(dtype.elementType)}]"
    mapping = {
        T.TimestampNTZType: "timestamp",
        T.LongType: "int",
        T.IntegerType: "int",
        T.ShortType: "int",
        T.ByteType: "int",
        T.DoubleType: "float",
        T.FloatType: "float",
        T.BooleanType: "boolean",
        T.StringType: "varchar(65000)",
        T.BinaryType: "varbinary(65000)",
        T.DateType: "date",
        T.TimestampType: "timestamp",
    }
    for klass, name in mapping.items():
        if isinstance(dtype, klass):
            return name
    raise ValueError(f"no Vertica mapping for Spark type: {dtype}")


# -- D2/D3: existence probes ------------------------------------------------
def table_exists(spark: SparkSession, name: str) -> bool:
    return spark.catalog.tableExists(name)


# -- D4: column reflection --------------------------------------------------
def reflect_columns(df: DataFrame) -> list[str]:
    """Column-name list (the reference's get_column_names,
    sqoop_table.py:114-120)."""
    return list(df.columns)


def reflect_columns_with_types(df: DataFrame) -> list[str]:
    """``name type`` pairs (the reference's `name || ' ' || data_type`,
    sqoop_table.py:125)."""
    return [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]


# -- D5: DDL export ---------------------------------------------------------
def export_ddl(df: DataFrame, table_name: str) -> str:
    """CREATE TABLE DDL from a DataFrame schema (the reference's
    export_objects + first-statement split, sqoop_table.py:131-135)."""
    cols = ",\n  ".join(
        f"{f.name} {f.dataType.simpleString()}{'' if f.nullable else ' not null'}"
        for f in df.schema.fields
    )
    return f"CREATE TABLE {table_name} (\n  {cols}\n)"
