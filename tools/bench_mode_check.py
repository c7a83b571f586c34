#!/usr/bin/env python
"""Bench-mode correctness pass (ADVICE r4, medium).

``bench.py`` times the PRODUCTION branches (``SPARK_GRAFT_BENCH=1``:
GEMM similarity scoring, sketch-only percentiles/distinct) while the
correctness gate verifies the gate branches — so a bug confined to a
bench branch would yield wrong-but-green benchmark evidence. This tool
closes that hole: it builds a session WITH the flag set (the flag must
be in the environment before the JVM/Python-worker processes spawn —
an in-process toggle would not reach the UDF workers) and checks every
flagged query against independent DuckDB references:

- ``sim_topk_bruteforce`` / ``sim_topk_ivf`` / ``sim_topk_lsh`` /
  ``multimodal_ann_pipeline``: the GEMM path must return the same ids
  as the strict-fold oracle with per-id |Δcosine| ≤ 1e-9 (GEMM's
  pairwise accumulation differs from the fold only in the low bits).
- ``percentiles_approx_order_value``: the sketch-only percentiles must
  satisfy the GK rank guarantee |rank(a) − p·N| ≤ N/accuracy + 1
  against ranks recomputed exactly in DuckDB.
- ``agg_approx_distinct``: the HLL-only counts must sit within
  3·rsd·exact of exact distinct counts recomputed in DuckDB.

Usage::

    python tools/bench_mode_check.py [--sf-dir /root/testdata/sf0.01]

Exit 0 = all bench branches verified.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

os.environ["SPARK_GRAFT_BENCH"] = "1"  # before any Spark process spawns

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

from oracle import run_oracle  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from pubic_multi_platform_to_postgres_spark.session import get_session  # noqa: E402

SIM_QUERIES = (
    "sim_topk_bruteforce",
    "sim_topk_ivf",
    "sim_topk_lsh",
    "multimodal_ann_pipeline",
)
COS_TOL = 1e-9


def check_sim(spark, sf_dir: str, name: str) -> dict:
    """GEMM top-k vs the strict-fold oracle: same ids, cosines to 1e-9."""
    qs, os_ = entry.queries(), entry.oracle_sql()
    spdf = qs[name](spark, sf_dir).toPandas()
    opdf = run_oracle(os_[name], sf_dir)
    id_col = spdf.columns[0]
    sp = dict(zip(spdf[id_col], spdf["cosine"]))
    op = dict(zip(opdf[id_col], opdf["cosine"]))
    same_ids = set(sp) == set(op)
    max_d = max((abs(sp[i] - op[i]) for i in sp if i in op), default=float("inf"))
    ok = same_ids and len(sp) == len(op) and max_d <= COS_TOL
    return {"ok": bool(ok), "same_ids": bool(same_ids),
            "max_cosine_delta": float(max_d)}


def check_ivf_occupancy(spark, sf_dir: str) -> dict:
    """sim_incremental_ivf_assign: the GEMM-scored cell argmax must
    reproduce the strict-fold oracle's occupancy vector exactly (a
    ulp-level cosine flip would move a count between cells)."""
    spdf = (
        entry.queries()["sim_incremental_ivf_assign"](spark, sf_dir)
        .toPandas()
        .sort_values("cidx")
        .reset_index(drop=True)
    )
    opdf = (
        run_oracle(entry.oracle_sql()["sim_incremental_ivf_assign"], sf_dir)
        .sort_values("cidx")
        .reset_index(drop=True)
    )
    cols = ["cidx", "n_corpus", "n_batch"]
    same = bool((spdf[cols].values == opdf[cols].values).all())
    return {"ok": same}


def check_percentiles(spark, sf_dir: str) -> dict:
    """Sketch-only percentiles obey the GK rank bound vs exact ranks."""
    spdf = entry.queries()["percentiles_approx_order_value"](
        spark, sf_dir
    ).toPandas()
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{sf_dir}/orders.parquet')"
    )
    worst = 0.0
    for _, row in spdf.iterrows():
        grp = row["o_orderpriority"]
        n, = con.execute(
            "SELECT COUNT(*) FROM orders WHERE o_orderpriority = ?", [grp]
        ).fetchone()
        bound = n / 10000 + 1.0
        for p, col in ((0.50, "p50"), (0.90, "p90"), (0.99, "p99")):
            r, = con.execute(
                "SELECT COUNT(*) FROM orders"
                " WHERE o_orderpriority = ? AND o_totalprice <= ?",
                [grp, float(row[col])],
            ).fetchone()
            worst = max(worst, abs(r - p * n) - bound)
    return {"ok": bool(worst <= 0), "worst_rank_excess": float(worst)}


def check_distinct(spark, sf_dir: str) -> dict:
    """HLL-only counts within 3·rsd of exact distinct counts."""
    spdf = entry.queries()["agg_approx_distinct"](spark, sf_dir).toPandas()
    import duckdb

    con = duckdb.connect()
    exact = dict(
        con.execute(
            f"SELECT l_returnflag, COUNT(DISTINCT l_orderkey)"
            f" FROM read_parquet('{sf_dir}/lineitem.parquet') GROUP BY 1"
        ).fetchall()
    )
    worst = 0.0
    for _, row in spdf.iterrows():
        ex = exact[row["l_returnflag"]]
        worst = max(worst, abs(int(row["n_orders"]) - ex) / ex)
    return {"ok": bool(worst <= 3 * 0.02), "worst_rel_err": float(worst)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    spark = get_session(app_name="spark_graft_bench_mode_check")
    results: dict[str, dict] = {}
    for name in SIM_QUERIES:
        results[name] = check_sim(spark, args.sf_dir, name)
    results["percentiles_approx_order_value"] = check_percentiles(
        spark, args.sf_dir
    )
    results["agg_approx_distinct"] = check_distinct(spark, args.sf_dir)
    results["sim_incremental_ivf_assign"] = check_ivf_occupancy(
        spark, args.sf_dir
    )

    n_ok = sum(1 for r in results.values() if r["ok"])
    print(json.dumps({"checks": results, "ok": n_ok == len(results)}, indent=2))
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main())
