"""spark-graft: a PySpark-native multi-source ELT + analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference ELT orchestrator (``thong-pm/pubic.multi-platform-to-postgres``: Singer taps
for HubSpot/Wrike/Xero -> Postgres upsert -> dbt views), re-expressed
idiomatically on Spark:

- REST extraction  -> DataFrame-producing paginated sources (``sources/``)
- JSON flatten / child-stream split -> StructType-driven selects + ``explode``
  (``operators/flatten.py``, ``operators/unnest.py``)
- keyed Postgres upsert -> dedup-merge writer (``operators/upsert.py``)
- bookmark/state files -> checkpointed state manager (``sources/state.py``)
- dbt view models -> SQL view registry (``plans/views.py``)
- plus the full built-in relational surface (joins, aggregations, windows,
  rollup/cube, set ops) and large-scale training-data ops (dedup, similarity
  search, text analysis, multimodal plumbing) in ``queries/`` + ``operators/``.

Everything here is pure PySpark DataFrame/SQL — logical plans go through
Catalyst; no RDD hand-scheduling, Python UDFs only where built-ins cannot
express the semantics (and then Arrow-vectorized).
"""

__version__ = "0.1.0"

from pubic_multi_platform_to_postgres_spark.session import get_session  # noqa: F401
