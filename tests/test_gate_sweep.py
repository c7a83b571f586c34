"""Sweep-harness contract tests (ADVICE r4 / VERDICT r4 #6).

The sweep itself runs over the real registry via ``tools/gate_sweep.py``;
these tests pin the harness's own semantics — in particular that an
``oracle=None`` registration is a rows-only row that (a) passes and exits
0 when the query returns rows, (b) FAILS when it returns an empty frame,
and (c) never inflates the headline green count.
"""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from gate_sweep import sweep  # noqa: E402

SF = "/root/testdata/sf0.01"


def test_oracleless_query_with_rows_passes(spark):
    queries = {
        "no_oracle_ok": lambda sp, sf: sp.range(3).select(F.col("id")),
    }
    results, failures = sweep(spark, queries, {}, SF)
    assert failures == 0
    assert results["no_oracle_ok"]["rows_only"] is True
    assert results["no_oracle_ok"]["hash_match"] is None  # not headline-green


def test_oracleless_query_empty_result_fails(spark):
    queries = {
        "no_oracle_empty": lambda sp, sf: sp.range(3).filter(F.lit(False)),
    }
    results, failures = sweep(spark, queries, {}, SF)
    assert failures == 1
    assert results["no_oracle_empty"]["rows_only"] is False


def test_mixed_registry_headline_count_excludes_rows_only(spark):
    queries = {
        "with_oracle": lambda sp, sf: sp.range(5).select(
            F.col("id").cast("long").alias("id")
        ),
        "no_oracle": lambda sp, sf: sp.range(2).select(F.col("id")),
    }
    oracles = {"with_oracle": "SELECT * FROM range(5) t(id)"}
    results, failures = sweep(spark, queries, oracles, SF)
    assert failures == 0
    green = sum(1 for r in results.values() if r["hash_match"] is True)
    assert green == 1  # rows-only row stays out of the headline tally
    assert results["with_oracle"]["hash_match"] is True
    assert results["no_oracle"]["rows_only"] is True


def test_readme_counts_current():
    """README's architecture-tree query counts are effectively
    generated: this pin fails the suite the moment the registry grows
    without the doc line following (VERDICT r10 Next #6)."""
    import re
    from pathlib import Path

    from pubic_multi_platform_to_postgres_spark.queries import REGISTRY

    readme = (Path(__file__).parent.parent / "README.md").read_text()
    m = re.search(
        r"(\d+) named queries, (\d+) with DuckDB oracles", readme
    )
    assert m, "README architecture tree lost its catalog-count line"
    n_oracles = sum(1 for q in REGISTRY.values() if q.oracle is not None)
    assert int(m.group(1)) == len(REGISTRY)
    assert int(m.group(2)) == n_oracles


def test_erroring_query_is_a_failure(spark):
    def boom(sp, sf):
        raise RuntimeError("synthetic failure")

    results, failures = sweep(spark, {"boom": boom}, {}, SF)
    assert failures == 1
    assert "synthetic failure" in results["boom"]["err"]
