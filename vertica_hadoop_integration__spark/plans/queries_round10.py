"""Round-10 additions.  Registered immediately after the reference suite
so the driver's natural-order first-50 correctness sample covers each
new query in the round it is written (see plans/__init__.py).  Queries
graduate to their topical home module once their driver row lands.

The round-9 module's jsonl_probe_* diagnostics are deleted (they did
their job: the r08 hash mismatch is isolated to the driver hasher's
typed serialization of DECIMAL(38,0) aggregates — finding + evidence in
reports/NOTES.md, recurrence guarded by tools/audit_oracle_types.py's
banned-type rule), and its eight real queries graduated to their
topical modules with driver-green r09 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register

__all__: list[str] = []
