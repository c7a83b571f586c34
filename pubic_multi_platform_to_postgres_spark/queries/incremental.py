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


@query(
    "merge_cdc_orders",
    oracle="""
    WITH base AS (SELECT * FROM orders),
    changes AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               o_totalprice + 100.0 AS o_totalprice, o_orderdate,
               o_orderpriority, 'U' AS op, 2 AS seq
        FROM base WHERE o_orderkey % 97 = 0
        UNION ALL
        SELECT o_orderkey, o_custkey, o_orderstatus,
               o_totalprice + 50.0, o_orderdate, o_orderpriority, 'U', 1
        FROM base WHERE o_orderkey % 97 = 0
        UNION ALL
        SELECT o_orderkey, NULL, NULL, NULL, NULL, NULL, 'D', 3
        FROM base WHERE o_orderkey % 101 = 0
        UNION ALL
        SELECT o_orderkey + 20000000, o_custkey, o_orderstatus,
               o_totalprice, o_orderdate, o_orderpriority, 'I', 1
        FROM base WHERE o_orderkey % 103 = 0
        UNION ALL
        SELECT o_orderkey + 30000000, NULL, NULL, NULL, NULL, NULL, 'D', 1
        FROM base WHERE o_orderkey % 105 = 0
    ),
    latest AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                         ORDER BY seq DESC) AS rn
            FROM changes
        ) WHERE rn = 1
    )
    SELECT COALESCE(t.o_orderkey, c.o_orderkey) AS o_orderkey,
           CASE WHEN c.o_orderkey IS NOT NULL AND c.op <> 'D'
                THEN c.o_custkey ELSE t.o_custkey END AS o_custkey,
           CASE WHEN c.o_orderkey IS NOT NULL AND c.op <> 'D'
                THEN c.o_orderstatus ELSE t.o_orderstatus END AS o_orderstatus,
           CASE WHEN c.o_orderkey IS NOT NULL AND c.op <> 'D'
                THEN c.o_totalprice ELSE t.o_totalprice END AS o_totalprice,
           strftime(CASE WHEN c.o_orderkey IS NOT NULL AND c.op <> 'D'
                    THEN c.o_orderdate ELSE t.o_orderdate END,
                    '%Y-%m-%d %H:%M:%S') AS order_date,
           CASE WHEN c.o_orderkey IS NOT NULL AND c.op <> 'D'
                THEN c.o_orderpriority ELSE t.o_orderpriority END AS o_orderpriority
    FROM base t FULL JOIN latest c ON t.o_orderkey = c.o_orderkey
    WHERE c.op IS NULL OR c.op <> 'D'
    """,
)
def merge_cdc_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MERGE INTO surface (operators/merge.py): apply a CDC
    changelog — out-of-order updates (latest seq wins), deletes,
    inserts, and a delete-for-absent-key no-op — to the orders snapshot
    in ONE full-outer join pass. The changelog is derived
    deterministically from the fixture (key-modulus selections) so both
    engines build the identical change stream. This is the lakehouse
    op the reference's INSERT..ON CONFLICT loader cannot express
    (no deletes, no conditional clauses)."""
    from pubic_multi_platform_to_postgres_spark.operators.merge import apply_cdc

    base = load(spark, sf_dir, "orders")
    cols = base.columns
    nulls = [F.lit(None).cast(base.schema[c].dataType).alias(c)
             for c in cols if c != "o_orderkey"]

    def tagged(df, op, seq):
        return df.withColumn("op", F.lit(op)).withColumn("seq", F.lit(seq))

    upd2 = tagged(
        base.filter(F.col("o_orderkey") % 97 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + 100.0), "U", 2)
    upd1 = tagged(
        base.filter(F.col("o_orderkey") % 97 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + 50.0), "U", 1)
    dels = tagged(
        base.filter(F.col("o_orderkey") % 101 == 0)
        .select("o_orderkey", *nulls), "D", 3)
    ins = tagged(
        base.filter(F.col("o_orderkey") % 103 == 0)
        .withColumn("o_orderkey", F.col("o_orderkey") + 20000000), "I", 1)
    dabs = tagged(
        base.filter(F.col("o_orderkey") % 105 == 0)
        .select((F.col("o_orderkey") + 30000000).alias("o_orderkey"), *nulls),
        "D", 1)
    changes = upd2.unionByName(upd1).unionByName(dels).unionByName(ins).unionByName(dabs)

    merged = apply_cdc(base, changes, ["o_orderkey"], "seq", "op")
    return merged.select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("order_date"),
        "o_orderpriority",
    )
