"""Job specification: the engine's equivalent of the reference's per-table
YAML config (SURVEY.md §1.3 — agg_geo_lucid_daily.yaml:1-12).

Key mapping (reference key -> JobSpec field):
  NUM_MAPPERS        -> num_partitions (extract/write parallelism)
  PRIMARY_ID         -> primary_id ('' = whole-table mode, advertiser_dim.yaml:4)
  SKIP_LATEST_MONTHS -> skip_latest
  HIVE_DB            -> target_db (namespace label carried into the ledger)
  DW_DB / SEQUENCE   -> subsumed by source_path + engine salting
  SQOOP_COMPRESSION / OUTPUT_FILE_FORMAT / ORC_STRIPE_SIZE / ORC_INDEX_STRIDE
                     -> compression / output_format / orc_stripe_size /
                        orc_index_stride (sinks honor them)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any


@dataclass
class JobSpec:
    table_name: str
    source_path: str  # parquet/csv/orc path or jdbc:... url
    target_path: str  # sink directory (one subdir per partition value)
    primary_id: str = ""  # partition column expression name; '' = whole table
    num_partitions: int = 8  # NUM_MAPPERS equivalent
    skip_latest: int = 0  # SKIP_LATEST_MONTHS equivalent
    target_db: str = "default"  # HIVE_DB equivalent (ledger namespace)
    output_format: str = "orc"  # orc|parquet|csv
    compression: str = "snappy"
    orc_stripe_size: int = 268435456  # 256 MiB, sqoop_pyhive.py:53
    orc_index_stride: int = 500000
    extra: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_yaml(cls, path: str) -> "JobSpec":
        """Load a job spec from a YAML file (reference: one yaml per table,
        run_sqoop_job.sh:15-25). Unknown keys land in ``extra``."""
        import yaml

        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        known = {f_.name for f_ in cls.__dataclass_fields__.values()}  # type: ignore[attr-defined]
        kwargs = {k: v for k, v in raw.items() if k in known}
        extra = {k: v for k, v in raw.items() if k not in known}
        kwargs.setdefault("extra", {}).update(extra)
        return cls(**kwargs)
