"""Physical-layout tests: bucketed co-located joins plan with no shuffle;
salted joins preserve exact join semantics while spreading hot keys."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pubic_multi_platform_to_postgres_spark.operators.layout import (
    bucketed_join,
    salted_join,
    write_bucketed,
)
from pubic_multi_platform_to_postgres_spark.queries.registry import load

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("bucketed_wh")
    orders = load(spark, SF, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    items = load(spark, SF, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    write_bucketed(orders, "orders_b", ["o_orderkey"], 8,
                   sort_cols=["o_orderkey"], path=str(wh / "orders_b"))
    write_bucketed(items, "items_b", ["o_orderkey"], 8,
                   sort_cols=["o_orderkey"], path=str(wh / "items_b"))
    yield "orders_b", "items_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS items_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    """Co-bucketed tables join shuffle-free: the write-time shuffle is
    amortized over every later join on the bucket key.

    Broadcast is disabled for the check — bucketing matters exactly when
    both sides are too big to broadcast (at fixture scale the planner
    would broadcast and skip bucketed reads entirely)."""
    lt, rt = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, lt, rt, on=["o_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Exchange" not in plan, plan
    # and it computes the same thing as the plain join
    plain = (
        load(spark, SF, "orders")
        .select("o_orderkey")
        .join(
            load(spark, SF, "lineitem").select(F.col("l_orderkey").alias("o_orderkey")),
            "o_orderkey",
        )
        .count()
    )
    assert joined.count() == plain


def test_bucketed_agg_has_no_exchange(spark, bucketed_tables):
    """groupBy on the bucket key also skips the exchange."""
    lt, _ = bucketed_tables
    agg = spark.table(lt).groupBy("o_orderkey").agg(F.sum("o_totalprice"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_salted_join_matches_plain_join(spark):
    """Salting must not change the join result — row multiplicity and
    values identical to the unsalted equi-join."""
    orders = load(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    items = load(spark, SF, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_linenumber"
    )
    plain = orders.join(items, "o_orderkey").groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_linenumber").alias("s")
    ).first()
    salted = salted_join(items, orders, on="o_orderkey", salt=4).groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_linenumber").alias("s")
    ).first()
    assert (salted["n"], salted["s"]) == (plain["n"], plain["s"])


def test_salted_join_spreads_hot_key(spark):
    """A pathologically hot key ends up in multiple salt partitions."""
    hot = spark.range(10_000).select(F.lit(1).alias("k"), F.col("id"))
    dim = spark.createDataFrame([(1, "x")], ["k", "v"])
    out = salted_join(hot, dim, on="k", salt=8)
    assert out.count() == 10_000
    # salt distribution on the hot side: every salt bucket non-trivially used
    salts = (
        hot.withColumn(
            "_salt",
            F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(8)).cast("int"),
        )
        .groupBy("_salt").count().collect()
    )
    assert len(salts) == 8


def test_compact_merges_small_files_and_preserves_rows(spark, tmp_path):
    from pubic_multi_platform_to_postgres_spark.operators.layout import compact

    p = tmp_path / "t"
    for i in range(12):  # 12 micro-batch-sized files
        spark.createDataFrame([(i * 10 + j, f"r{i}") for j in range(10)],
                              "id int, tag string").coalesce(1).write.mode(
            "append").parquet(str(p))
    before = {tuple(r) for r in spark.read.parquet(str(p)).collect()}

    stats = compact(spark, p, target_mb=128, sort_by=["id"])
    assert stats["files_before"] >= 12 and stats["files_after"] <= 2

    after_df = spark.read.parquet(str(p))
    assert {tuple(r) for r in after_df.collect()} == before
    assert after_df.count() == 120
