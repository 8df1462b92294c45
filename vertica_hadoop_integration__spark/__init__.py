"""spark-etl-engine: a PySpark-native analytics/ETL engine.

Rebuilds the capabilities of the reference ETL orchestrator
(atuldata/Vertica-Hadoop-Integration-, surveyed in SURVEY.md) idiomatically on
Spark: partitioned JDBC extract, incremental partition-at-a-time backup with a
checkpoint ledger, columnar ORC/parquet sinks, the full generated-SQL operator
surface, and LLM-data-pipeline extensions (dedup, similarity search, text
analysis, multimodal columns, streaming windows) designed for 100 TB scale.
"""

__version__ = "0.1.0"
