#!/usr/bin/env python
"""Quiet-machine bench pin: 5 timed runs per query, median + repeat spread.

The per-round `bench.py` totals carry ±25% ambient noise (BASELINE.md);
this pin is the attributable evidence — run it with NOTHING else on the
machine. Writes per-query ``{median, spread}`` where ``spread`` is
``(max - min) / median`` over the timed runs; the suite-level
``max_spread``/``p90_spread`` summarize run-to-run stability (target
<10% per VERDICT r3 Next-round #6).

Usage::

    python tools/bench_pinned.py [--sf-dir /root/testdata/sf0.1]
        [--repeats 5] [--out BENCH_PINNED_r04.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# production path, same as bench.py (must be set before engine imports)
os.environ["SPARK_GRAFT_BENCH"] = "1"

from pubic_multi_platform_to_postgres_spark.queries import REGISTRY  # noqa: E402
from pubic_multi_platform_to_postgres_spark.session import get_session  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--out", default=str(REPO / "BENCH_PINNED_r04.json"))
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated query names: re-pin just these rows and merge "
        "into an existing --out artifact — the pin protocol's remedy for a "
        "mid-run ambient window (re-run until repeats agree, never keep a "
        "contaminated row)",
    )
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    spark = get_session(app_name="spark_graft_bench_pinned")
    sf = float(os.path.basename(args.sf_dir.rstrip("/")).removeprefix("sf") or "0.1")

    # Python-worker PREWARM (VERDICT r11 Next #7): populate the daemon
    # worker pool across every core before any timed run. Rows whose
    # plan crosses the Python boundary in a 1-task stage (the sf0.1
    # single-row-group parquet leaves the pandas-UDF fingerprint stages
    # at scan parallelism = 1) otherwise time bimodally on whether THAT
    # task lands on a warm worker — the "worker-reuse jitter" the r8 and
    # r11 rows needed adjudicating. Warm the pool once, deterministically,
    # instead of refuting the mode per row.
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _prewarm(s):
        import numpy as np  # noqa: F401 — the import cost IS the warmup
        return s

    n_cores = spark.sparkContext.defaultParallelism
    spark.range(n_cores * 4, numPartitions=n_cores).select(
        _prewarm("id")
    ).write.format("noop").mode("overwrite").save()

    queries: dict[str, dict] = {}
    if only and Path(args.out).exists():
        queries = json.loads(Path(args.out).read_text())["queries"]
    for name in sorted(REGISTRY):
        if only and name not in only:
            continue
        fn = REGISTRY[name].fn
        try:
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            runs = []
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
            med = statistics.median(runs)
            queries[name] = {
                "median": round(med, 4),
                "spread": round((max(runs) - min(runs)) / med, 4),
                "runs": [round(r, 4) for r in runs],
            }
        except Exception as exc:  # noqa: BLE001
            print(f"pinned bench: {name} failed: {exc}", file=sys.stderr)
            queries[name] = {"median": -1.0, "spread": -1.0, "runs": []}
        print(f"  {name}: {queries[name]['median']} s "
              f"(spread {queries[name]['spread']})", file=sys.stderr)

    ok = [q for q in queries.values() if q["median"] >= 0]
    spreads = sorted(q["spread"] for q in ok)
    doc = {
        "metric": "pinned_suite_median_per_query_sum",
        "value": round(sum(q["median"] for q in ok), 4),
        "unit": "sec",
        "sf": sf,
        "repeats": args.repeats,
        "max_spread": spreads[-1] if spreads else None,
        "p90_spread": spreads[int(0.9 * (len(spreads) - 1))] if spreads else None,
        "queries": queries,
    }
    Path(args.out).write_text(json.dumps(doc, indent=2) + "\n")
    print(json.dumps({k: doc[k] for k in
                      ("metric", "value", "unit", "sf", "max_spread", "p90_spread")}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
