"""Round-8 additions.  Registered immediately after the reference suite
so the driver's natural-order first-50 correctness sample covers each
new query in the round it is written (see plans/__init__.py).  Queries
graduate to their topical home module once their driver row lands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register

__all__: list[str] = []
