"""Vanilla-session parity: every registered query must build AND execute
(limit(1)) on a bare SparkSession with none of session.py's engine confs
— the driver's harness constructs its own session, so any hidden
dependence on AQE settings, the UTC timezone pin, the parquet-nanos
legacy flag, or shuffle-partition sizing would pass the local gate and
fail only at the driver. Runs tools/vanilla_smoke.py in a SUBPROCESS:
inside this process getOrCreate() would return the tuned engine session
and the test would prove nothing."""

from __future__ import annotations

import subprocess
import sys


def test_all_queries_green_on_bare_session():
    proc = subprocess.run(
        [sys.executable, "/root/repo/tools/vanilla_smoke.py", "/root/testdata/sf0.001"],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    tail = "\n".join(proc.stdout.splitlines()[-25:])
    assert proc.returncode == 0, (
        f"vanilla smoke failed (rc={proc.returncode}):\n{tail}\n{proc.stderr[-2000:]}"
    )
    # belt-and-braces: the summary line must report full coverage
    import re

    m = re.search(r"(\d+)/(\d+) queries green", proc.stdout)
    assert m and m.group(1) == m.group(2), f"summary line missing/partial: {tail}"
