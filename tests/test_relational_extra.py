"""Contracts for queries whose values are engine-specific (rows-only in
the driver gate): approx-distinct error bound, IVF recall vs brute force."""

from __future__ import annotations

from pubic_multi_platform_to_postgres_spark.operators.similarity import (
    topk_cosine_bruteforce,
    topk_cosine_ivf,
)
from pubic_multi_platform_to_postgres_spark.queries.registry import REGISTRY, load

SF = "/root/testdata/sf0.01"


def test_approx_distinct_within_5pct(spark):
    rows = REGISTRY["agg_approx_distinct"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        rel_err = abs(r["approx_orders"] - r["exact_orders"]) / r["exact_orders"]
        assert rel_err <= 0.05, (r["l_returnflag"], rel_err)


def test_ivf_recall_vs_bruteforce(spark):
    emb = load(spark, SF, "embeddings")
    qv = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    exact = {r["vec_id"] for r in
             topk_cosine_bruteforce(emb, "embedding", "vec_id", qv, k=10).collect()}
    approx = {r["vec_id"] for r in
              topk_cosine_ivf(emb, "embedding", "vec_id", qv, k=10,
                              n_cells=16, nprobe=4).collect()}
    # clustered fixture: the query's neighborhood lives in few cells
    assert len(exact & approx) >= 8, exact & approx
