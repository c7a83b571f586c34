#!/usr/bin/env python
"""Full correctness sweep: every registry query vs its DuckDB oracle.

Replicates the driver's gate (row count, column-name set, order-insensitive
value multiset with columns sorted by name) over the ENTIRE registry — the
driver samples at most 50 queries per round, so this sweep is the committed
evidence that the never-sampled remainder is green too (VERDICT round 2,
"Next round" #7).

Usage::

    python tools/gate_sweep.py [--sf-dir /root/testdata/sf0.01] [--out GATE_SWEEP.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

from oracle import run_oracle, to_multiset  # noqa: E402  (tests helper)

import __spark_entry__ as entry  # noqa: E402
from pubic_multi_platform_to_postgres_spark.session import get_session  # noqa: E402


def sweep(spark, queries, oracles, sf_dir) -> tuple[dict[str, dict], int]:
    """Run every query against its oracle; return (results, failure count).

    An ``oracle=None`` registration is a rows-only row: PASS iff the query
    ran AND returned >0 rows; it is reported separately and never counted
    in the headline green tally.
    """
    results: dict[str, dict] = {}
    failures = 0
    for name in sorted(queries):
        row = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            spdf = queries[name](spark, sf_dir).toPandas()
            row["spark_rows"] = len(spdf)
            sql = oracles.get(name)
            if sql is None:
                # Legitimate non-SQL-expressible op (registry oracle=None):
                # mirror the driver's weaker rows-only check — the query
                # must actually RETURN rows to count (an empty result is a
                # failure, not a pass). Reported separately from the
                # headline green count either way.
                row["rows_only"] = len(spdf) > 0
            else:
                opdf = run_oracle(sql, sf_dir)
                row["oracle_rows"] = len(opdf)
                row["rows_match"] = len(spdf) == len(opdf)
                row["schema_match"] = sorted(spdf.columns) == sorted(opdf.columns)
                row["hash_match"] = (
                    row["schema_match"] and to_multiset(spdf) == to_multiset(opdf)
                )
        except Exception as exc:  # noqa: BLE001 — record, keep sweeping
            row["err"] = f"{type(exc).__name__}: {exc}"[:300]
        results[name] = row
        ok = row["hash_match"] is True or row.get("rows_only") is True
        if not ok:
            failures += 1
        tag = "PASS(rows-only)" if row.get("rows_only") else ("PASS" if ok else "FAIL")
        print(f"  {tag} {name} "
              f"(spark={row['spark_rows']} oracle={row['oracle_rows']} err={row['err']})",
              file=sys.stderr)
    return results, failures


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=str(REPO / "GATE_SWEEP.json"))
    ap.add_argument("--only", default=None,
                    help="comma-separated query names (exact) to gate; "
                         "skips writing --out unless given explicitly")
    args = ap.parse_args()

    spark = get_session(app_name="spark_graft_gate_sweep")
    t_start = time.perf_counter()
    queries = entry.queries()
    if args.only:
        keep = set(args.only.split(","))
        unknown = keep - set(queries)
        if unknown:
            ap.error(f"unknown query names: {sorted(unknown)}")
        queries = {k: v for k, v in queries.items() if k in keep}
        if args.out == str(REPO / "GATE_SWEEP.json"):
            args.out = "/tmp/GATE_SWEEP_partial.json"
    results, failures = sweep(spark, queries, entry.oracle_sql(), args.sf_dir)
    elapsed = round(time.perf_counter() - t_start, 1)
    Path(args.out).write_text(json.dumps(results, indent=2) + "\n")
    green = sum(1 for r in results.values() if r["hash_match"] is True)
    rows_only = sum(1 for r in results.values() if r.get("rows_only") is True)
    note = f" (+{rows_only} rows-only)" if rows_only else ""
    print(f"gate sweep: {green}/{len(results)} green{note} in {elapsed}s -> {args.out}",
          file=sys.stderr)
    return 0 if failures == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
