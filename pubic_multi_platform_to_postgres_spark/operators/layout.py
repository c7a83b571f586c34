"""Physical-layout tools for 100 TB tables: bucketing and skew salting.

These are the two levers the query-side operators assume exist when data
outgrows broadcast + AQE:

- **Bucketing** (`write_bucketed`): persist a fact table hash-bucketed
  (and sorted) by its join key. Two tables bucketed the same way join
  with ZERO exchange — the shuffle is paid once at write time, amortized
  over every subsequent join/aggregation on that key. This is Spark's
  answer to the reference's "land it keyed in Postgres and let the DB
  index it" (K2) at lake scale.
- **Salting** (`salted_join`): explode a hot key into ``salt`` synthetic
  sub-keys so one reducer doesn't own the whole key. AQE's skew-join
  split handles moderate skew automatically; salting is for the
  pathological case (a single key holding >1 partition-budget of rows on
  BOTH sides, where AQE cannot split the build side).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (+sorted) managed table.

    Joins/aggregations between tables bucketed identically on the join
    key plan with no Exchange on either side (verified in
    tests/test_layout.py). ``sort_cols`` additionally pre-sorts within
    buckets, turning sort-merge joins into merge-only.
    """
    writer = df.write.bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.mode("overwrite").format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed tables (shuffle-free when bucket specs match)."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the key salted ``salt`` ways.

    The (typically larger / skewed) ``left`` side gets a random salt per
    row; ``right`` is replicated ``salt`` times (explode of a literal
    range — cheap when right is the smaller side). The join key becomes
    (key, salt), so a hot key's rows spread over ``salt`` reducers.

    Row multiplicity is preserved exactly: each left row joins the single
    replica of its salt value. Salt is derived from a hash of the full
    left row position via ``rand``-free ``xxhash64`` on monotonically
    increasing id — deterministic for testing.
    """
    l_salted = left.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt)).cast("int"),
    )
    r_replicated = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = l_salted.join(r_replicated, on=[on, "_salt"], how=how)
    return out.drop("_salt")


def compact(
    spark,
    path: str | Path,
    target_mb: int = 128,
    sort_by: list[str] | None = None,
) -> dict:
    """Small-file compaction: rewrite a parquet directory into
    ``ceil(total_size / target_mb)`` files, optionally sort-clustered.

    Streaming/incremental sinks accrete one small file per micro-batch;
    a 100 TB table read through thousands of tiny files pays task-launch
    and footer overhead per file, so periodic compaction is standard
    lakehouse maintenance (Delta OPTIMIZE). ``sort_by`` additionally
    clusters rows (sortWithinPartitions after a range repartition) so
    min/max row-group statistics prune range predicates — the poor
    man's OPTIMIZE ZORDER for one key. The rewrite reuses the
    crash-safe staging swap; returns {files_before, files_after,
    bytes}.
    """
    from pubic_multi_platform_to_postgres_spark.operators.upsert import atomic_swap

    p = Path(path)
    files = [f for f in p.rglob("*.parquet") if f.is_file()]
    total = sum(f.stat().st_size for f in files)
    n_out = max(1, -(-total // (target_mb * 1024 * 1024)))  # ceil div
    df = spark.read.parquet(str(p))
    if sort_by:
        df = df.repartitionByRange(n_out, *sort_by).sortWithinPartitions(*sort_by)
    else:
        df = df.coalesce(n_out)

    atomic_swap(spark, p, df)
    after = len([f for f in p.rglob("*.parquet") if f.is_file()])
    return {"files_before": len(files), "files_after": after, "bytes": total}
