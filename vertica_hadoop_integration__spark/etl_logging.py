"""Structured per-job step logging — the reference's ``EtlLogger``
(sqoop_etl.py:28). The reference logs every generated SQL statement
BEFORE shipping it to Vertica/Hive (e.g. sqoop_table.py:104,146); the
engine's equivalent is logging every pipeline step — with its
parameters — before the Spark action that executes it, so a failed run's
log always shows the step that was in flight.

Format: ``job=<name> step=<step> k=v ...`` on the standard ``logging``
tree under ``spark_etl.<job>`` — greppable, and capturable in tests via
pytest's caplog. Ledger rows still carry start/end timestamps; this adds
the step-by-step audit trail between them.
"""

from __future__ import annotations

import logging


class EtlLogger:
    """Per-job audit logger. One instance per job run."""

    def __init__(self, job_name: str):
        self.job = job_name
        self._log = logging.getLogger(f"spark_etl.{job_name}")

    def step(self, step: str, **kv) -> None:
        """Record a pipeline step (log-before-execute, like the
        reference's SQL logging)."""
        detail = " ".join(f"{k}={v}" for k, v in kv.items())
        self._log.info("job=%s step=%s%s", self.job, step, f" {detail}" if detail else "")

    def warn(self, step: str, **kv) -> None:
        detail = " ".join(f"{k}={v}" for k, v in kv.items())
        self._log.warning(
            "job=%s step=%s%s", self.job, step, f" {detail}" if detail else ""
        )
