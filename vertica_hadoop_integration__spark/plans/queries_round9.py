"""Round-9 additions.  Registered immediately after the reference suite
so the driver's natural-order first-50 correctness sample covers each
new query in the round it is written (see plans/__init__.py).  Queries
graduate to their topical home module once their driver row lands.

Leads with the ``jsonl_probe_*`` diagnostics for the r08 verdict's one
correctness failure (``jsonl_ingest_roundtrip``: driver hash FAIL, local
PASS, rows+schema green): the four aggregate cells split into four
single-cell queries over the identical JSON-staging hop, so the r09
driver run isolates WHICH cell its typed value hasher rejects.  The
main query's checksum cell is simultaneously retyped BIGINT-everywhere
(bit_xor instead of a DECIMAL(38,0) sum) — the prime suspect was
typed-serialization divergence on the one non-BIGINT cell.  Probes are
removed once the main query's driver-green row lands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register

__all__: list[str] = []


def _jsonl_staged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared hop under every probe: write a deterministic documents
    slice as JSON-lines, read it back schema-on-read, land it parquet,
    return the parquet read-back (same staging path as
    queries_extras.jsonl_ingest_roundtrip)."""
    import tempfile

    from ..sources.writers import write_columnar

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    tmp = tempfile.mkdtemp(prefix="jsonl_probe_")
    d.write.mode("overwrite").json(f"{tmp}/staging")
    staged = spark.read.schema(d.schema).json(f"{tmp}/staging")
    write_columnar(staged, f"{tmp}/parquet", output_format="parquet")
    return spark.read.parquet(f"{tmp}/parquet")


@register(
    "jsonl_probe_nrows",
    oracle="SELECT count(*) AS n_rows FROM documents WHERE doc_id < 400",
)
def jsonl_probe_nrows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe cell 1/4 of jsonl_ingest_roundtrip: row count through the
    JSONL→parquet hop, as the only output column (BIGINT both sides)."""
    back = _jsonl_staged(spark, sf_dir)
    return back.agg(F.count(F.lit(1)).alias("n_rows"))


@register(
    "jsonl_probe_idsum",
    oracle="""
    SELECT CAST(sum(doc_id) AS BIGINT) AS id_sum
    FROM documents WHERE doc_id < 400
    """,
)
def jsonl_probe_idsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe cell 2/4: doc_id sum through the hop (BIGINT both sides)."""
    back = _jsonl_staged(spark, sf_dir)
    return back.agg(F.sum("doc_id").cast("bigint").alias("id_sum"))


@register(
    "jsonl_probe_lensum",
    oracle="""
    SELECT CAST(sum(length(text)) AS BIGINT) AS len_sum
    FROM documents WHERE doc_id < 400
    """,
)
def jsonl_probe_lensum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe cell 3/4: character-length sum of every text value through
    the JSON escape/unescape hop (BIGINT both sides).  A driver FAIL
    here (with nrows/idsum green) would mean the JSON hop mangles text
    content under the driver session — not a hasher typing issue."""
    back = _jsonl_staged(spark, sf_dir)
    return back.agg(F.sum(F.length("text")).cast("bigint").alias("len_sum"))


@register(
    "jsonl_probe_checksum_decimal",
    oracle="""
    SELECT CAST(sum(CAST(('0x'||substr(md5(text),1,15)) AS BIGINT))
                AS DECIMAL(38,0)) AS text_checksum
    FROM documents WHERE doc_id < 400
    """,
)
def jsonl_probe_checksum_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe cell 4/4: the ORIGINAL DECIMAL(38,0) md5-sum checksum cell,
    exactly as jsonl_ingest_roundtrip published it through r08.  If this
    probe is the lone driver FAIL, the r08 hash mismatch was typed
    serialization of the one DECIMAL cell (Spark java BigDecimal vs
    DuckDB HUGEINT→DECIMAL rendering in the driver's value hasher) —
    confirming the main query's r09 retype to BIGINT bit_xor."""
    from ..functions.text_fns import md5_hash60

    back = _jsonl_staged(spark, sf_dir)
    return back.agg(
        F.sum(md5_hash60(F.col("text")).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("text_checksum")
    )
