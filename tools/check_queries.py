#!/usr/bin/env python
"""Oracle-check a comma-separated subset of catalog queries at one SF.

Round-15 iteration helper: the full ``tools/gate_sweep.py`` runs all 201
rows; this checks just the rows touched by an optimization so the
edit→verify loop stays minutes, not an hour.

Usage::

    python tools/check_queries.py --queries a,b,c
        [--sf-dir /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

from oracle import run_oracle, to_multiset  # noqa: E402

from pubic_multi_platform_to_postgres_spark.queries import REGISTRY  # noqa: E402
from pubic_multi_platform_to_postgres_spark.session import get_session  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--queries", required=True)
    args = ap.parse_args()

    names = [n for n in args.queries.split(",") if n]
    spark = get_session(app_name="spark_graft_check_queries")
    n_fail = 0
    for name in names:
        reg = REGISTRY[name]
        try:
            got = reg.fn(spark, args.sf_dir).toPandas()
            want = run_oracle(reg.oracle, args.sf_dir)
            rows = len(got) == len(want)
            cols = set(got.columns) == set(want.columns)
            vals = to_multiset(got) == to_multiset(want)
            ok = rows and cols and vals
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: {exc}")
            n_fail += 1
            continue
        if ok:
            print(f"PASS {name} (rows={len(got)})")
        else:
            print(
                f"FAIL {name}: rows_match={rows} cols_match={cols} "
                f"vals_match={vals} (spark={len(got)} oracle={len(want)})"
            )
            n_fail += 1
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
