"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` exposes
the full operator catalog (one entry per SURVEY.md §2 item); ``oracle_sql()``
gives the DuckDB-equivalent SQL per query for the differential correctness
gate.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from glob import glob

from pyspark.sql import DataFrame, SparkSession

from pubic_multi_platform_to_postgres_spark.queries import REGISTRY

FLAGSHIP = "q02_order_durations"
_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (dbt duration-model semantics) on sf0.001."""
    return REGISTRY[FLAGSHIP].fn(spark, _SMOKE_SF_DIR)


def _rotation() -> int:
    """Rotate the catalog order so the driver's fixed-size CORRECTNESS
    sample (a prefix of ``queries()``) covers a fresh window each round.

    Rounds 1–7 all sampled the same first-50 registration prefix, leaving
    the catalog tail driver-unverified (VERDICT r7 Next #1). The offset is
    self-advancing — 50 × (completed rounds − 6), counted from the
    ``CORRECTNESS_r*.json`` artifacts the driver leaves beside this file —
    so round 8 starts the window at index 50, round 9 at 100, and the
    window keeps cycling (mod catalog size) as rounds accumulate.
    ``SPARK_GRAFT_REGISTRY_ROT`` overrides for local testing.
    """
    env = os.environ.get("SPARK_GRAFT_REGISTRY_ROT")
    if env is not None:
        return int(env)
    here = os.path.dirname(os.path.abspath(__file__))
    done = len(glob(os.path.join(here, "CORRECTNESS_r*.json")))
    return 50 * max(0, done - 6)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (rotated)."""
    names = list(REGISTRY)
    off = _rotation() % len(names) if names else 0
    return {name: REGISTRY[name].fn for name in names[off:] + names[:off]}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted for non-SQL ops)."""
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
