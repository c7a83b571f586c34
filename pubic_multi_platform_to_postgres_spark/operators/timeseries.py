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


def ewma_weights(alpha: float = 0.25, depth: int = 16) -> list[float]:
    """Exponential weights ``alpha * (1-alpha)**(i-1)`` for lags 1..depth.

    A bounded-depth EWMA: the true recursive EWMA's weight on lag i decays
    geometrically, so truncating at ``depth`` drops a tail of total mass
    ``(1-alpha)**depth`` (1.0% at the 0.25/16 default) and renormalizing
    over the PRESENT lags makes the estimate exact over its window. The
    truncation is what makes the statistic a plain windowed expression —
    one keyed window, no recursion, no iterative state — and therefore
    both Catalyst-friendly and replayable by any SQL engine.
    """
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha!r}")
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth!r}")
    return [alpha * (1.0 - alpha) ** (i - 1) for i in range(1, depth + 1)]


def ewma_anomaly(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.25,
    depth: int = 16,
    min_prior: int = 4,
    factor: float = 2.0,
) -> DataFrame:
    """Per-key EWMA baseline + spike flags, as ONE keyed window.

    For each row, the exponentially-weighted moving average of the
    previous ``depth`` values (weights renormalized over the lags that
    exist) is the baseline; rows with at least ``min_prior`` history and
    ``value > factor * ewma`` are emitted as anomalies. Everything is
    ``lag()`` columns over a single window — one shuffle keyed on
    ``key_col``, whole-stage codegen, zero UDFs — and the numerator /
    denominator folds run in a FIXED left-to-right order so an external
    SQL engine replaying the same chain reproduces the doubles bit-
    for-bit (the catalog's hash-parity discipline).

    Returns (key, order..., value, n_prior, ewma) for flagged rows.
    """
    import functools
    import operator as _op

    w = Window.partitionBy(key_col).orderBy(*order_cols)
    weights = ewma_weights(alpha, depth)
    lags = [F.lag(value_col, i).over(w) for i in range(1, depth + 1)]
    num_terms = [
        F.when(lag.isNull(), F.lit(0.0)).otherwise(F.lit(wt) * lag)
        for wt, lag in zip(weights, lags)
    ]
    den_terms = [
        F.when(lag.isNull(), F.lit(0.0)).otherwise(F.lit(wt))
        for wt, lag in zip(weights, lags)
    ]
    cnt_terms = [
        F.when(lag.isNull(), F.lit(0)).otherwise(F.lit(1)) for lag in lags
    ]
    num = functools.reduce(_op.add, num_terms)
    den = functools.reduce(_op.add, den_terms)
    n_prior = functools.reduce(_op.add, cnt_terms).cast("int")
    scored = df.select(
        key_col,
        *order_cols,
        F.col(value_col),
        n_prior.alias("n_prior"),
        (num / den).alias("ewma"),
    )
    return scored.filter(
        (F.col("n_prior") >= min_prior)
        & (F.col(value_col) > F.lit(factor) * F.col("ewma"))
    )


def ewma_anomaly_oracle_sql(
    table: str,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.25,
    depth: int = 16,
    min_prior: int = 4,
    factor: float = 2.0,
    select_cols: str | None = None,
) -> str:
    """The ANSI-SQL replay of :func:`ewma_anomaly` — same weight
    literals (``repr`` of the float64, cast from a QUOTED string so the
    engine's correctly-rounded strtod parses it — DuckDB's bare decimal
    literal path is off by 1 ulp for some values), same left-to-right addition chains, same
    predicate, so the result hash-matches the Spark plan."""
    weights = ewma_weights(alpha, depth)
    order = ", ".join(order_cols)
    lag = lambda i: f"LAG({value_col}, {i}) OVER w"  # noqa: E731
    num = " + ".join(
        f"(CASE WHEN {lag(i)} IS NULL THEN CAST(0 AS DOUBLE)"
        f" ELSE CAST('{wt!r}' AS DOUBLE) * {lag(i)} END)"
        for i, wt in enumerate(weights, start=1)
    )
    den = " + ".join(
        f"(CASE WHEN {lag(i)} IS NULL THEN CAST(0 AS DOUBLE)"
        f" ELSE CAST('{wt!r}' AS DOUBLE) END)"
        for i, wt in enumerate(weights, start=1)
    )
    cnt = " + ".join(
        f"(CASE WHEN {lag(i)} IS NULL THEN 0 ELSE 1 END)"
        for i in range(1, depth + 1)
    )
    cols = select_cols or f"{key_col}, {order}, {value_col}"
    return f"""
    WITH scored AS (
        SELECT {cols},
               CAST(({cnt}) AS INTEGER) AS n_prior,
               ({num}) / ({den}) AS ewma
        FROM {table}
        WINDOW w AS (PARTITION BY {key_col} ORDER BY {order})
    )
    SELECT * FROM scored
    WHERE n_prior >= {min_prior}
      AND {value_col} > CAST('{factor!r}' AS DOUBLE) * ewma
    """
