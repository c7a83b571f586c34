#!/usr/bin/env python
"""Benchmark harness: run every catalog query at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {name: sec},
"sf": 0.1}``

Methodology (BASELINE.md): warm session, 1 warm-up + N timed runs per query
(default 3), report the median. Results are materialized with the ``noop``
data source — full distributed execution, no driver collect.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

# Bench measures the PRODUCTION path: gate-only verification machinery
# (strict-fold IEEE scoring, in-plan sketch rank checks) is switched off.
# The correctness gate never sets this, so its hash matches stay real.
os.environ["SPARK_GRAFT_BENCH"] = "1"

from pubic_multi_platform_to_postgres_spark.queries import REGISTRY
from pubic_multi_platform_to_postgres_spark.session import get_session


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_session(app_name="spark_graft_bench")

    timings: dict[str, float] = {}
    for name in sorted(REGISTRY):
        fn = REGISTRY[name].fn
        try:
            materialize(fn(spark, sf_dir))  # warm-up (also JIT + cache file footers)
            runs = []
            for _ in range(repeats):
                t0 = time.perf_counter()
                materialize(fn(spark, sf_dir))
                runs.append(time.perf_counter() - t0)
            timings[name] = round(statistics.median(runs), 4)
        except Exception as exc:  # noqa: BLE001 — a broken query must not kill the suite
            print(f"bench: {name} failed: {exc}", file=sys.stderr)
            timings[name] = -1.0

    total = round(sum(t for t in timings.values() if t >= 0), 4)
    payload = {
        "metric": "suite_wall_clock_median_per_query_sum",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    line = json.dumps(payload)
    # The driver captures only the stdout TAIL, which truncated the
    # ~4 KB per-query map every round (BENCH_r05–r07 all landed
    # "parsed: null" — VERDICT r7 Next #8). The FULL table goes to a
    # file; stdout's FINAL line is a compact summary with the same
    # metric/value/unit/sf schema (plus the five slowest queries and a
    # pointer to the full table) so any tail window ending at EOF
    # contains one complete, valid JSON line.
    #
    # Default out is the UNCOMMITTED run file (gitignored) — VERDICT
    # r14 Next #4: the committed BENCH_LOCAL.json is written only by
    # the round-close protocol (SPARK_GRAFT_BENCH_OUT=BENCH_LOCAL.json
    # on a controlled 3-repeat run), so ad-hoc and driver benches stop
    # dirtying the tree.
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_LOCAL_run.json"),
    )
    try:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")
    except OSError as exc:
        print(f"bench: could not write {out_path}: {exc}", file=sys.stderr)
    # Self-explain the WindowExec warnings in the raw tail: the
    # single-partition windows Spark warns about are the PLAN_AUDIT
    # allowlist (structurally bounded frames), not corpus-sized sorts.
    audit_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "PLAN_AUDIT.json"
    )
    try:
        with open(audit_path) as fh:
            audit = json.load(fh)
        allow = sorted(
            name
            for name, row in audit.get("queries", {}).items()
            if row.get("n_unpartitioned_windows", 0) > 0
        )
        print(
            "bench: WindowExec 'No Partition Defined' warnings above come "
            f"from the {len(allow)} plan-audit-allowlisted queries with "
            "structurally bounded single-partition frames "
            f"(tests/test_plan_quality.py pins the list): {', '.join(allow)}",
            file=sys.stderr,
        )
    except (OSError, ValueError):
        pass  # census file absent — the warning stays unexplained, not fatal
    top5 = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:5])
    summary = {
        "metric": payload["metric"],
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "n_failed": sum(1 for t in timings.values() if t < 0),
        "queries": top5,
        "queries_truncated_to_top5_slowest": True,
        "full_table": out_path,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
