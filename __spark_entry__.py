"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` exposes
the full operator catalog (one entry per SURVEY.md §2 item); ``oracle_sql()``
gives the DuckDB-equivalent SQL per query for the differential correctness
gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pubic_multi_platform_to_postgres_spark.queries import REGISTRY

FLAGSHIP = "q02_order_durations"
_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (dbt duration-model semantics) on sf0.001."""
    return REGISTRY[FLAGSHIP].fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted for non-SQL ops)."""
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
