"""Bench-branch correctness (ADVICE r4, medium): the SPARK_GRAFT_BENCH=1
production paths the benchmark times must themselves be verified.

The flag must be in the environment BEFORE the JVM / Python-worker
processes spawn (fold_dots reads it inside a pandas UDF on the worker),
so this runs ``tools/bench_mode_check.py`` as a subprocess with its own
SparkSession rather than toggling the env var in-process.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_bench_mode_branches_verified():
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "bench_mode_check.py")],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    report = json.loads(proc.stdout)
    assert report["ok"] is True
    # every flagged bench branch is present and individually green
    expected = {
        "sim_topk_bruteforce",
        "sim_topk_ivf",
        "sim_topk_lsh",
        "multimodal_ann_pipeline",
        "percentiles_approx_order_value",
        "agg_approx_distinct",
        "sim_incremental_ivf_assign",
    }
    assert set(report["checks"]) == expected
    assert all(c["ok"] for c in report["checks"].values())
