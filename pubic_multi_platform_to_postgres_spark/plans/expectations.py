"""Data-quality expectations: dbt's built-in test surface (unique /
not_null / accepted_values / relationships), Spark-first.

The reference wires dbt into its cycle (``scheduler.py:38-42``) and
declares sources (``dbt/models/sources.yml``) but ships no tests; this
module supplies the four checks every dbt consumer adds first, each
compiled to a violation-COUNT aggregate:

- **not_null** — rows with a NULL in the column.
- **unique** — rows beyond the first per key (duplicates counted, not
  distinct keys, matching dbt's ``unique`` failure rows).
- **accepted_values** — rows whose value is outside the allowed set
  (NULLs pass, as in dbt).
- **relationships** — child rows whose non-null FK has no parent
  (dbt's referential-integrity test), planned as a LEFT ANTI join —
  one shuffle, broadcast when the parent key set is small.

Each check is a tiny aggregate plan; ``summary`` unions them into one
(check, table, n_violations) frame so a whole suite runs as one job.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tag(df: DataFrame, check: str, table: str) -> DataFrame:
    return df.select(
        F.lit(check).alias("check"),
        F.lit(table).alias("table_name"),
        F.col("n_violations").cast("long").alias("n_violations"),
    )


def expect_not_null(df: DataFrame, column: str, table: str) -> DataFrame:
    v = df.filter(F.col(column).isNull()).agg(F.count(F.lit(1)).alias("n_violations"))
    return _tag(v, f"not_null:{column}", table)


def expect_unique(df: DataFrame, columns: list[str], table: str) -> DataFrame:
    dup = (
        df.groupBy(*columns)
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(F.coalesce(F.sum(F.col("_n") - 1), F.lit(0)).alias("n_violations"))
    )
    return _tag(dup, "unique:" + ",".join(columns), table)


def expect_accepted_values(
    df: DataFrame, column: str, values: list, table: str
) -> DataFrame:
    v = (
        df.filter(F.col(column).isNotNull() & ~F.col(column).isin(values))
        .agg(F.count(F.lit(1)).alias("n_violations"))
    )
    return _tag(v, f"accepted_values:{column}", table)


def expect_relationship(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
    table: str,
) -> DataFrame:
    orphans = (
        child.filter(F.col(child_col).isNotNull())
        .join(
            parent.select(F.col(parent_col).alias(child_col)).distinct(),
            child_col,
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_violations"))
    )
    return _tag(orphans, f"relationships:{child_col}", table)


def summary(checks: list[DataFrame]) -> DataFrame:
    """Union the per-check counts into one suite result."""
    return reduce(lambda a, b: a.unionByName(b), checks)


def expect_freshness(
    df: DataFrame,
    ts_col: str,
    max_age_s: int,
    as_of_epoch_s: int,
    table: str,
) -> DataFrame:
    """dbt source-freshness: stale (1) when the newest row is older than
    ``max_age_s`` at ``as_of_epoch_s`` — the as-of instant is an explicit
    argument, never wall-clock, so the check is reproducible (and
    oracle-checkable). An empty/all-NULL table counts as stale.

    Instant-typed columns compare on ``unix_micros`` (session-tz-proof);
    TIMESTAMP_NTZ columns are wall-clock values with no instant, so the
    cutoff is rendered as a tz-free literal and compared directly —
    ``unix_micros`` would reject NTZ outright, and casting NTZ→TIMESTAMP
    would silently re-interpret it in the session timezone.
    """
    from datetime import datetime, timezone

    cutoff_s = as_of_epoch_s - max_age_s
    if df.schema[ts_col].dataType.typeName() == "timestamp_ntz":
        cutoff = datetime.fromtimestamp(cutoff_s, tz=timezone.utc)
        lit = F.to_timestamp_ntz(F.lit(cutoff.strftime("%Y-%m-%d %H:%M:%S")))
        fresh_max = F.max(F.col(ts_col))
        is_stale = F.coalesce(fresh_max < lit, F.lit(True))
    else:
        fresh_max = F.max(F.unix_micros(F.col(ts_col)))
        is_stale = F.coalesce(fresh_max, F.lit(-(1 << 62))) < cutoff_s * 1_000_000
    v = df.agg(
        F.when(is_stale, F.lit(1)).otherwise(F.lit(0)).alias("n_violations")
    )
    return _tag(v, f"freshness:{ts_col}", table)
