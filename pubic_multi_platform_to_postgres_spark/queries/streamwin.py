"""Event-time window queries over ``events`` — the batch faces of the
streaming operators (``streaming/windows.py``).

Each runs the SAME window builder the streaming path uses (batch and
streaming share the plan constructs), so the DuckDB oracle here plus the
batch≡streaming equivalence tests in ``tests/test_streaming.py`` jointly
verify the streaming operators end-to-end.

Window boundaries are epoch-microsecond longs: exact, order-insensitive,
timezone-proof (SURVEY.md §2.8 streaming row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pubic_multi_platform_to_postgres_spark.queries.registry import (
    dsum,
    load,
    query,
    sql_dsum,
)
from pubic_multi_platform_to_postgres_spark.streaming.windows import (
    session_agg,
    sliding_agg,
    tumbling_agg,
)


@query(
    "stream_tumbling_hourly",
    oracle=f"""
    SELECT epoch_us(date_trunc('hour', ts)) AS window_start,
           epoch_us(date_trunc('hour', ts) + INTERVAL 1 HOUR) AS window_end,
           event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value', 'sum_value')}
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def stream_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event_type: count + exact value sum.
    Single shuffle on (window, event_type); map-side partial aggregation
    applies as usual."""
    return tumbling_agg(
        load(spark, sf_dir, "events"),
        "ts",
        "1 hour",
        ["event_type"],
        [F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value")],
    )


@query(
    "stream_sliding_30m_15m",
    oracle=f"""
    WITH slid AS (
        SELECT (FLOOR(epoch_us(ts) / 900000000) - k) * 900000000 AS window_start,
               value
        FROM events, (VALUES (0), (1)) offs(k)
    )
    SELECT CAST(window_start AS BIGINT) AS window_start,
           CAST(window_start + 1800000000 AS BIGINT) AS window_end,
           COUNT(*) AS n_events,
           {sql_dsum('value', 'sum_value')}
    FROM slid
    GROUP BY 1, 2
    """,
)
def stream_sliding_30m_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 30-minute windows every 15 minutes (each event in exactly
    two windows). The oracle reproduces Spark's epoch-aligned window set
    arithmetically: starts at floor(ts/15min)·15min and 15min earlier."""
    return sliding_agg(
        load(spark, sf_dir, "events"),
        "ts",
        "30 minutes",
        "15 minutes",
        [],
        [F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value")],
    )


@query(
    "stream_session_30m",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT epoch_us(MIN(ts)) AS session_start,
           epoch_us(MAX(ts) + INTERVAL 30 MINUTE) AS session_end,
           user_id,
           COUNT(*) AS n_events,
           {sql_dsum('value', 'sum_value')}
    FROM numbered
    GROUP BY user_id, sid
    """,
)
def stream_session_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap
    (session_end = last event + gap). The oracle is the classic
    gaps-and-islands construction — an independent derivation of Spark's
    session_window semantics."""
    return session_agg(
        load(spark, sf_dir, "events"),
        "ts",
        "30 minutes",
        ["user_id"],
        [F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value")],
    )


@query(
    "stream_dedup_redelivery",
    oracle=f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {sql_dsum('value', 'sum_value')}
    FROM events
    GROUP BY event_type
    """,
)
def stream_dedup_redelivery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once ingest under at-least-once delivery: every 7th event
    is redelivered (union with itself — the duplicate feed a retrying
    source produces), then keyed dedup collapses the replays before a
    per-type aggregate. The oracle aggregates the CLEAN feed directly, so
    the hash only matches if dedup removed exactly the redeliveries.
    Batch face of :func:`streaming.windows.dedup_exactly_once`; the
    streaming face (dropDuplicatesWithinWatermark, bounded state) is
    asserted batch≡streaming in ``test_streaming.py``."""
    from pubic_multi_platform_to_postgres_spark.streaming.windows import (
        dedup_exactly_once,
    )

    ev = load(spark, sf_dir, "events")
    redelivered = ev.unionAll(ev.filter(F.col("event_id") % 7 == 0))
    clean = dedup_exactly_once(redelivered, ["event_id"])
    return clean.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value")
    )


@query(
    "stream_interval_join_attribution",
    oracle="""
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS lag_us,
           p.value AS purchase_value
    FROM events c JOIN events p
      ON c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.user_id = c.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
)
def stream_interval_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase attribution: every purchase within 30 minutes of a
    same-user click — the canonical stream-stream interval join. Batch
    face of :func:`streaming.windows.interval_join_stream` (this IS the
    builder the streaming path runs; the streaming face is asserted
    batch≡streaming in ``test_streaming.py`` with two-sided watermarks,
    so join state stays bounded by the watermark + interval horizon).
    Plan: one equi-shuffle on user_id with the time range as a join
    residual — no cross product; at 100 TB both streams hash-partition
    by user and state eviction follows the watermark."""
    from pubic_multi_platform_to_postgres_spark.streaming.windows import (
        interval_join_stream,
    )

    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    joined = interval_join_stream(
        clicks, purchases, key="user_id", left_ts="ts", right_ts="ts",
        max_delay_s=1800,
    )
    return joined.select(
        F.col("l_key").alias("user_id"),
        F.col("l_event_id").alias("click_id"),
        F.col("r_event_id").alias("purchase_id"),
        (F.unix_micros("r_ts") - F.unix_micros("l_ts")).alias("lag_us"),
        F.col("r_value").alias("purchase_value"),
    )


@query(
    "stream_unattributed_clicks",
    oracle="""
    SELECT c.user_id, c.event_id AS click_id,
           epoch_us(c.ts) AS click_ts_us
    FROM events c
    WHERE c.event_type = 'click'
      AND NOT EXISTS (
          SELECT 1 FROM events p
          WHERE p.event_type = 'purchase'
            AND p.user_id = c.user_id
            AND p.ts >= c.ts
            AND p.ts <= c.ts + INTERVAL 30 MINUTE
      )
    """,
)
def stream_unattributed_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OTHER half of attribution — clicks that converted to NOTHING
    within the 30-minute window (the funnel-leak feed a marketing
    pipeline alerts on). Batch face of the stream-stream LEFT OUTER
    interval join (:func:`streaming.windows.interval_join_stream` with
    ``join_type='left_outer'``): in streaming, an unmatched click emits
    with null purchase columns exactly when the purchase-side watermark
    passes its join window — the state store can then PROVE no match
    will arrive; the batch limit of that semantics is the null-filtered
    left join this query runs (oracle: NOT EXISTS). Streaming parity —
    including the watermark-driven emission — is asserted in
    ``test_streaming.py``.

    Operational caveat the parity test encodes: each side's watermark
    tracks ITS OWN filtered stream's max event time, so a quiet click
    stream holds the global watermark back and the LAST clicks' outer
    results wait until new clicks (or an idle-timeout heartbeat)
    advance it — the standard outer-join-emission latency trade.

    Plan: the same single user-keyed equi-shuffle as the inner
    attribution join with the time range as a residual; at 100 TB both
    streams hash-partition by user and outer-state eviction follows
    the watermark + interval horizon."""
    from pubic_multi_platform_to_postgres_spark.streaming.windows import (
        interval_join_stream,
    )

    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    joined = interval_join_stream(
        clicks, purchases, key="user_id", left_ts="ts", right_ts="ts",
        max_delay_s=1800, join_type="left_outer",
    )
    return joined.filter(F.col("r_event_id").isNull()).select(
        F.col("l_key").alias("user_id"),
        F.col("l_event_id").alias("click_id"),
        F.unix_micros("l_ts").alias("click_ts_us"),
    )


def _ewma_alerts_oracle() -> str:
    from pubic_multi_platform_to_postgres_spark.operators.timeseries import (
        ewma_anomaly_oracle_sql,
    )

    return ewma_anomaly_oracle_sql(
        "events", "user_id", ["ts", "event_id"], "value",
        alpha=0.25, depth=16, min_prior=4, factor=2.0,
    )


@query("stream_ewma_alerts", oracle=_ewma_alerts_oracle())
def stream_ewma_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom-STATEFUL streaming face of ``ts_ewma_anomaly``: per-key
    EWMA spike alerts whose state is the last-16-values array
    (``applyInPandasWithState`` in-flight; this gate row runs the batch
    face, ``ewma_alerts_batch`` — the same per-row fold over one Arrow
    group per key). Three-way equivalence: this row hash-matches the
    windowed-SQL oracle, and ``tests/test_streaming.py`` pins streaming
    micro-batch union ≡ batch face ≡ the JVM window expression — so the
    streaming operator inherits the oracle transitively.

    Scale: state is O(depth) doubles per key; each micro-batch shuffles
    only its own rows on the key — the standard stateful-streaming
    contract (state store size = keys × 16 doubles, not history)."""
    from pubic_multi_platform_to_postgres_spark.streaming.stateful import (
        ewma_alerts_batch,
    )

    return ewma_alerts_batch(load(spark, sf_dir, "events"))
