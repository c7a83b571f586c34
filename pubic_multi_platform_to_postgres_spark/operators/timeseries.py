"""Time-series resampling: bucket + gap-fill + last-observation-carried-
forward — the hypertable-continuous-aggregate shape (SURVEY §2.8 /
brief's custom-operator family).

Plan: one bucket aggregation (shuffle on (key, bucket)), a per-key dense
bucket spine generated with ``sequence()`` (no driver loop, no cross
join), a left join of spine to aggregates (same partitioning → AQE keeps
it local), and an ``ignorenulls`` window for the carry-forward. At 100 TB
the spine explode is proportional to keys × buckets-in-range — bound the
range per key (as here, each key's own [min, max]) rather than a global
calendar.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bucketize(ts_col: str, bucket_s: int) -> Column:
    """Epoch-second floor bucket of a timestamp column."""
    return (F.unix_timestamp(F.col(ts_col)) / bucket_s).cast("long") * bucket_s


def gapfill_locf(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    agg: Column,
    bucket_s: int = 3600,
    value_name: str = "value",
) -> DataFrame:
    """Resample per key to ``bucket_s`` buckets over the key's own
    [min, max] range; empty buckets get the last prior bucket's value
    (LOCF). Output: (key, bucket_start epoch-s, <value_name>, filled).

    ``filled`` marks carried-forward rows — downstream consumers (and the
    oracle) can tell observation from interpolation.
    """
    bucketed = (
        df.withColumn("_b", bucketize(ts_col, bucket_s))
        .groupBy(key_col, "_b")
        .agg(agg.alias("_v"))
    )
    spine = (
        bucketed.groupBy(key_col)
        .agg(F.min("_b").alias("_lo"), F.max("_b").alias("_hi"))
        .select(
            key_col,
            F.explode(
                F.sequence(F.col("_lo"), F.col("_hi"), F.lit(bucket_s))
            ).alias("bucket_start"),
        )
    )
    joined = spine.join(
        bucketed.select(
            key_col, F.col("_b").alias("bucket_start"), F.col("_v")
        ),
        [key_col, "bucket_start"],
        "left",
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        key_col,
        "bucket_start",
        F.last(F.col("_v"), ignorenulls=True).over(w).alias(value_name),
        F.col("_v").isNull().alias("filled"),
    )
