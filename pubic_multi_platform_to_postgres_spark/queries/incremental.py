"""Incremental-sync + sink semantics as driver-checkable queries.

These run the engine's real bookmark filter and dedup-upsert operators
over the fixtures, with oracles expressing the reference contract in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pubic_multi_platform_to_postgres_spark.functions.dates import format_date_ms
from pubic_multi_platform_to_postgres_spark.operators.upsert import dedup_latest
from pubic_multi_platform_to_postgres_spark.queries.registry import load, query
from pubic_multi_platform_to_postgres_spark.sources.state import filter_newer


@query(
    "incremental_bookmark_filter",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S.%gZ') AS updated_at
    FROM orders
    WHERE o_orderdate > TIMESTAMP '1999-06-01 00:00:00'
    """,
)
def incremental_bookmark_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F6: strictly-greater bookmark filter through :func:`filter_newer`.

    The replication key is a timestamp here (file-source path); Catalyst
    pushes the comparison into the parquet scan — the engine's analog of
    the reference's server-side bookmark pushdown (F1/F2).
    """
    o = load(spark, sf_dir, "orders")
    newer = filter_newer(o, "o_orderdate", "1999-06-01T00:00:00.000Z")
    return newer.select(
        "o_orderkey", format_date_ms(F.col("o_orderdate")).alias("updated_at")
    )


@query(
    "upsert_redelivery_dedup",
    oracle="""
    SELECT CAST(o_orderkey AS VARCHAR) AS id,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS order_date
    FROM orders
    """,
)
def upsert_redelivery_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2: at-least-once re-delivery collapses under PK dedup.

    Simulates the bookmark-overlap double delivery (the same extraction
    window replayed) by unioning the batch with itself, then applies the
    sink's ``row_number`` dedup on the PK — the result must equal exactly
    one row per key, i.e. the original table.
    """
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("string").alias("id"),
        "o_totalprice",
        "o_orderdate",
    )
    redelivered = o.unionByName(o)  # at-least-once replay
    deduped = dedup_latest(redelivered, ["id"], order_col="o_orderdate")
    return deduped.select(
        "id",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("order_date"),
    )
