#!/usr/bin/env python
"""Capture ``.explain("formatted")`` for named catalog queries.

Round-15 evidence helper: writes ``plans/r15/<query>_<tag>.txt`` for each
requested query so plan claims in OPTIMIZATION_r15.md are checkable
without running Spark. Optionally times each query with the noop sink
(same methodology as bench.py: 1 warm-up + N timed runs, median).

Usage::

    python tools/explain_pin.py --tag before --queries a,b,c
        [--sf-dir /root/testdata/sf0.1] [--repeats 3] [--time]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

os.environ["SPARK_GRAFT_BENCH"] = "1"  # production path, same as bench.py

from pubic_multi_platform_to_postgres_spark.queries import REGISTRY  # noqa: E402
from pubic_multi_platform_to_postgres_spark.session import get_session  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--queries", required=True)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--outdir", default=str(REPO / "plans" / "r15"))
    ap.add_argument("--time", action="store_true")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    names = [n for n in args.queries.split(",") if n]
    missing = [n for n in names if n not in REGISTRY]
    if missing:
        print(f"unknown queries: {missing}", file=sys.stderr)
        return 1

    outdir = Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    spark = get_session(app_name="spark_graft_explain_pin")

    for name in names:
        fn = REGISTRY[name].fn
        df = fn(spark, args.sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = outdir / f"{name}_{args.tag}.txt"
        path.write_text(plan)
        line = f"{name}: wrote {path}"
        if args.time:
            spark.sparkContext.setJobDescription(f"{name} [{args.tag}]")
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            runs = []
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                fn(spark, args.sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
            med = statistics.median(runs)
            line += f"  median={med:.3f}s runs={[round(r, 3) for r in runs]}"
        print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
