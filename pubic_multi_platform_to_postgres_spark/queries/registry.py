"""Query catalog: named PySpark queries paired with DuckDB oracle SQL.

Each operator from SURVEY.md §2 registers here as a ``(fn, oracle_sql)``
pair. The driver (``__spark_entry__.py``) exposes the catalog; the
correctness gate runs both sides at sf0.01 and compares row count, schema
and an order-insensitive value hash.

Hash-stability rules used throughout the catalog:

- **Decimal-exact aggregation.** ``SUM(double)`` is order-dependent in the
  low bits, and Spark and DuckDB will not sum partitions in the same order.
  Both sides therefore aggregate through ``DECIMAL`` (exact, associative,
  order-independent) and cast the final value back to ``DOUBLE``:
  ``CAST(SUM(CAST(x AS DECIMAL(30,10))) AS DOUBLE)``. Per-row double
  arithmetic (products, divisions) is deterministic and needs no such care.
- **Aliases.** Every computed column is aliased identically on both sides —
  the driver sorts columns by name before hashing.
- **Deterministic top-k.** Any LIMIT is preceded by an ORDER BY whose key
  set is unique (tie-broken by primary key).
- **Integer sums.** DuckDB's ``SUM(BIGINT)`` returns ``HUGEINT``; oracle SQL
  casts back to ``BIGINT`` to match Spark's ``LongType``.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@dataclass(frozen=True)
class Query:
    """A registered query: Spark implementation + optional DuckDB oracle."""

    name: str
    fn: QueryFn
    oracle: str | None
    doc: str


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name`` with an optional DuckDB oracle SQL.

    ``oracle=None`` marks a genuinely non-SQL-expressible operator; the
    driver then records a weaker rows-only check.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read one driver-generated parquet table (TESTDATA.md).

    ``events.parquet`` is written with a TIMESTAMP(NANOS) physical type,
    which Spark's vectorized parquet reader rejects; read it as raw nanos
    (``nanosAsLong``) and convert to a microsecond TimestampType (same
    truncation DuckDB applies when it reads nanos as TIMESTAMP).
    """
    if table == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def dsum(col: Column | str, alias: str, scale: int = 6) -> Column:
    """Order-independent double sum: route through DECIMAL(30, scale)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(30,{scale})")).cast("double").alias(alias)


def davg(col: Column | str, alias: str, scale: int = 6) -> Column:
    """Order-independent double mean: decimal sum / non-null count."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(f"decimal(30,{scale})")).cast("double") / F.count(c)).alias(alias)


def sql_dsum(expr: str, alias: str, scale: int = 6) -> str:
    """Oracle-side twin of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(30,{scale}))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str, scale: int = 6) -> str:
    """Oracle-side twin of :func:`davg`."""
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(30,{scale}))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )
