"""Event-time window operators: tumbling / sliding / session.

The reference has no streaming engine — its only streaming notion is the
micro-batch scheduler loop (O1, ``scheduler.py:158-225``); SURVEY.md §2.8
commits these as the Structured-Streaming-native completion of that gap.

Every builder here works on BOTH a batch DataFrame and a streaming
DataFrame — ``window()`` / ``session_window()`` are plan-level constructs;
the same function is used by the oracle-checked batch queries
(``queries/streamwin.py``) and the streaming equivalence tests, which is
exactly how correctness is established for the streaming path.

Scale notes: windowed aggregation shuffles on (window, keys) — at 100 TB
the partition count follows from AQE; session windows additionally require
a sort within (key) partitions, which Spark's session-window exec handles
with spillable buffers. Watermarks bound state: without one, a streaming
session/tumbling agg keeps all windows open forever.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_watermark(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    """Late-data bound for streaming inputs; identity on batch frames
    (watermarks are meaningless in batch and Spark rejects them there)."""
    return df.withWatermark(ts_col, delay) if df.isStreaming else df


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Fixed windows: one aggregate row per (window, keys).

    Output carries ``window_start``/``window_end`` as epoch-microsecond
    longs — exact, timezone-proof, cross-engine comparable.
    """
    if watermark:
        df = with_watermark(df, ts_col, watermark)
    out = df.groupBy(F.window(F.col(ts_col), duration).alias("w"), *keys).agg(*aggs)
    return out.select(
        F.unix_micros(F.col("w.start")).alias("window_start"),
        F.unix_micros(F.col("w.end")).alias("window_end"),
        *keys,
        *[c for c in out.columns if c != "w" and c not in keys],
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping windows (each event lands in ``duration/slide`` of
    them); same output contract as :func:`tumbling_agg`."""
    if watermark:
        df = with_watermark(df, ts_col, watermark)
    out = df.groupBy(
        F.window(F.col(ts_col), duration, slide).alias("w"), *keys
    ).agg(*aggs)
    return out.select(
        F.unix_micros(F.col("w.start")).alias("window_start"),
        F.unix_micros(F.col("w.end")).alias("window_end"),
        *keys,
        *[c for c in out.columns if c != "w" and c not in keys],
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Session windows: a session extends while consecutive events per key
    arrive within ``gap``; ``session_end`` = last event + gap (Spark's
    session_window contract, reproduced by the gaps-and-islands oracle)."""
    if watermark:
        df = with_watermark(df, ts_col, watermark)
    out = df.groupBy(
        F.session_window(F.col(ts_col), gap).alias("w"), *keys
    ).agg(*aggs)
    return out.select(
        F.unix_micros(F.col("w.start")).alias("session_start"),
        F.unix_micros(F.col("w.end")).alias("session_end"),
        *keys,
        *[c for c in out.columns if c != "w" and c not in keys],
    )


def dedup_exactly_once(
    df: DataFrame,
    keys: list[str],
    ts_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Exactly-once keyed deduplication — the at-least-once-source →
    exactly-once-sink bridge (K2's streaming ingest analog).

    Streaming: ``dropDuplicatesWithinWatermark`` — the state store keeps
    a key only until the event-time watermark passes it, so redelivered
    rows within the watermark horizon are dropped with BOUNDED state
    (a plain streaming ``dropDuplicates`` would grow state forever).
    Batch: ``dropDuplicates`` on the same keys, which is the limit of the
    streaming semantics when every row is in one batch — the equivalence
    the streaming test asserts across redelivering micro-batches.
    """
    if df.isStreaming:
        if not (ts_col and watermark):
            raise ValueError("streaming dedup requires ts_col + watermark")
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_delay_s: int,
    watermark: str = "2 hours",
    join_type: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: right rows within
    ``[left_ts, left_ts + max_delay_s]`` per key (click→purchase
    attribution). Works identically on batch frames (watermark is a no-op
    there) — the batch-equivalence test relies on that.

    Output columns are side-prefixed: ``l_key``/``l_ts``/``l_<col>`` and
    ``r_key``/``r_ts``/``r_<col>`` — collision-proof by construction.

    Scale contract: BOTH sides carry event-time watermarks and the join
    has a two-sided time-range predicate, so the state store evicts a
    row as soon as the other side's watermark passes its join window —
    bounded state. Without the range bound (or with one-sided bounds)
    Spark must keep the whole history of both streams in state.
    """
    # Prefix EVERY payload column with its side (l_/r_): the join below
    # would otherwise emit ambiguous duplicate columns whenever both
    # inputs share a non-key attribute name (e.g. user agent fields).
    l = left.select(
        F.col(key).alias("l_key"),
        F.col(left_ts).alias("l_ts"),
        *[F.col(c).alias(f"l_{c}") for c in left.columns if c not in (key, left_ts)],
    )
    r = right.select(
        F.col(key).alias("r_key"),
        F.col(right_ts).alias("r_ts"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c not in (key, right_ts)],
    )
    # Watermark each side based on ITS OWN streaming-ness: a mixed
    # stream/batch call must still bound state on the streaming side.
    if left.isStreaming:
        l = l.withWatermark("l_ts", watermark)
    if right.isStreaming:
        r = r.withWatermark("r_ts", watermark)
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {max_delay_s} SECONDS"))
    )
    # left_outer: unmatched left rows emit with null right columns once
    # the right watermark passes their join window — same bounded-state
    # contract; Spark requires the watermark + time-range bound for outer
    # interval joins precisely so it can DECIDE "no match will arrive".
    return l.join(r, cond, join_type)
