"""Custom stateful streaming operators (``applyInPandasWithState``).

SURVEY.md §2.8: the reference has no streaming engine; Structured
Streaming's arbitrary-state API is the Spark-native home for operators
that need per-key state beyond windows/watermarks. Two canonical ones:

- :func:`running_totals` — per-key running count/sum maintained across
  micro-batches (the "profile accumulator" shape every training-data
  pipeline grows: per-source token counts, per-user activity, …).
- :func:`first_seen_filter` — per-key first-occurrence pass-through: the
  streaming form of at-least-once → exactly-once dedup (the reference
  gets this from PK upserts at the sink, K2; here it happens in-flight,
  so downstream operators never see the replay).

State is per group, partitioned by the grouping key — the same shuffle
contract as a streaming aggregation; state size is O(distinct keys) and
is the thing to watch at 100 TB (bound it with timeouts where the domain
allows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals(
    grouped_key: str,
    value_col: str,
) -> tuple:
    """Build (func, output_schema, state_schema) for per-key running
    count/sum. Apply with::

        df.groupBy(key).applyInPandasWithState(
            func, out_schema, state_schema, "update",
            GroupStateTimeout.NoTimeout)

    Each micro-batch emits the updated cumulative row per key present in
    the batch (update-mode semantics — pair with a keyed upsert sink).
    """
    out_schema = T.StructType(
        [
            T.StructField(grouped_key, T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("sum_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("s", T.DoubleType()),
        ]
    )

    def func(key, pdfs, state: GroupState):
        import pandas as pd

        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf[value_col].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {grouped_key: [key[0]], "n_events": [n], "sum_value": [s]}
        )

    return func, out_schema, state_schema


def apply_running_totals(
    df: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Wire :func:`running_totals` onto a (streaming) DataFrame."""
    func, out_schema, state_schema = running_totals(key_col, value_col)
    return df.groupBy(key_col).applyInPandasWithState(
        func, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def first_seen_filter(
    df: DataFrame,
    key_col: str,
    payload_cols: list[str],
) -> DataFrame:
    """Emit only the FIRST row ever seen per key (in-flight replay dedup).

    State per key is a single boolean; later deliveries of the same key
    (at-least-once replay, bookmark overlap) are dropped before they
    reach downstream operators.
    """
    out_schema = T.StructType(
        [T.StructField(key_col, T.LongType())]
        + [T.StructField(c, T.StringType()) for c in payload_cols]
    )
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])

    def func(key, pdfs, state: GroupState):
        import pandas as pd

        emitted = False
        for pdf in pdfs:
            if state.exists or emitted or len(pdf) == 0:
                continue
            first = pdf.iloc[:1]
            out = {key_col: [key[0]]}
            for c in payload_cols:
                out[c] = [str(first[c].iloc[0])]
            emitted = True
            yield pd.DataFrame(out)
        if emitted:
            state.update((True,))

    return df.groupBy(key_col).applyInPandasWithState(
        func, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def transition_pairs(
    df: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """Per-key consecutive-event pairing — the stateful front half of
    the Markov transition matrix (``journey_transition_matrix``) in
    streaming form: state per user is the LAST event type seen; each
    micro-batch sorts its own rows by ``order_cols``, stitches the
    stored last event onto the batch's first, emits one
    ``(src_event, dst_event)`` row per consecutive pair, and stores the
    batch's last event. Downstream, a plain streaming count aggregate
    turns the pair stream into transition counts — batch==streaming is
    asserted by ``test_streaming_transition_pairs_match_batch``.

    Ordering contract: correctness requires per-key batch-monotone
    event time (a later micro-batch never carries an EARLIER event for
    a user than one already processed) — the file-source replay /
    log-compacted topic case. Out-of-order arrivals need the
    watermarked window operators instead; this operator is the
    exactly-ordered fast path. State is one string per user —
    O(distinct users), the minimum any journey model can hold."""
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField("src_event", T.StringType()),
            T.StructField("dst_event", T.StringType()),
        ]
    )
    state_schema = T.StructType([T.StructField("last_type", T.StringType())])

    def func(key, pdfs, state: GroupState):
        rows = pd.concat(list(pdfs), ignore_index=True)
        if len(rows) == 0:
            return
        rows = rows.sort_values(list(order_cols))
        seq = rows[type_col].tolist()
        prev = state.get[0] if state.exists else None
        srcs, dsts = [], []
        if prev is not None:
            srcs.append(prev)
            dsts.append(seq[0])
        srcs.extend(seq[:-1])
        dsts.extend(seq[1:])
        state.update((seq[-1],))
        if srcs:
            yield pd.DataFrame({"src_event": srcs, "dst_event": dsts})

    return df.groupBy(key_col).applyInPandasWithState(
        func, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


# ---------------------------------------------------------------------------
# Per-key EWMA spike alerts — the streaming face of
# ``operators/timeseries.py:ewma_anomaly`` (same bounded-depth fold,
# bit-identical output when events arrive in per-key event-time order)


def _ewma_step(
    history: list, value: float, weights: list, min_prior: int, factor: float
) -> tuple:
    """REFERENCE implementation of one fold step — the production path
    is the vectorized :func:`_ewma_scan`; this per-row form is kept (and
    pinned equal to the scan, bit-for-bit, by
    ``tests/test_streaming.py::test_ewma_step_matches_scan``)
    because it states the ordering argument in its simplest form.
    ``history`` is most-recent-first previous values (len ≤ depth).
    Returns (n_prior, ewma | None, is_alert).

    The accumulation runs in the SAME left-to-right order as the batch
    window expression (lag 1 → lag depth); missing lags are always a
    SUFFIX there (adding literal 0.0 — an exact identity on finite
    doubles), so folding only the present terms reproduces the batch
    doubles bit-for-bit."""
    num = 0.0
    den = 0.0
    n = 0
    for w, v in zip(weights, history):
        num = num + w * v
        den = den + w
        n += 1
    if n == 0:
        return 0, None, False
    ewma = num / den
    return n, ewma, (n >= min_prior and value > factor * ewma)


def _ewma_out_schema(
    in_schema: T.StructType,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
) -> T.StructType:
    """Output schema DERIVED from the input frame's field types (r11
    advisory: hard-coding Long/Timestamp silently mis-typed any table
    whose key or id is not bigint — Arrow cast errors or nulls at
    runtime). ``key``/``ts``/``id`` pass through with their input types;
    ``value`` must be numeric (the fold is IEEE-double arithmetic) and
    is emitted as double — asserted up front with a clear error."""
    by_name = {f.name: f for f in in_schema.fields}
    for c in (key_col, ts_col, id_col, value_col):
        if c not in by_name:
            raise ValueError(f"ewma_alerts: column {c!r} not in input schema")
    vt = by_name[value_col].dataType
    if not isinstance(vt, T.NumericType):
        raise TypeError(
            f"ewma_alerts: value column {value_col!r} must be numeric, "
            f"got {vt.simpleString()}"
        )
    return T.StructType(
        [
            T.StructField(key_col, by_name[key_col].dataType),
            T.StructField(ts_col, by_name[ts_col].dataType),
            T.StructField(id_col, by_name[id_col].dataType),
            T.StructField(value_col, T.DoubleType()),
            T.StructField("n_prior", T.IntegerType()),
            T.StructField("ewma", T.DoubleType()),
        ]
    )


def _ewma_scan(rows, history, weights, depth, min_prior, factor,
               key_val, ts_col, id_col, value_col, key_col):
    """Scan a time-sorted pandas frame, emitting alert rows and the
    updated history (most-recent-first, truncated to depth).

    Vectorized with the strict-fold ``np.cumsum`` device the ANN scorers
    use (``operators/similarity.py:fold_dots``): the lag matrix carries
    literal 0.0 where a lag is missing — exactly the batch window
    expression's CASE terms — and the row-wise cumsum's last column IS
    the left-to-right fold, so every emitted double stays bit-identical
    to the per-row loop and the SQL oracle while the scan runs as a few
    C passes (the per-row Python loop pinned 3.9 s at sf0.1; this shape
    is ~an order of magnitude less)."""
    import numpy as np
    import pandas as pd

    v = rows[value_col].to_numpy(dtype=np.float64)
    t = len(v)
    pre = np.asarray(list(reversed(history)), dtype=np.float64)
    ext = np.concatenate([pre, v]) if len(pre) else v
    off = len(pre)
    w = np.asarray(weights, dtype=np.float64)
    lagm = np.zeros((t, depth), dtype=np.float64)
    mask = np.zeros((t, depth), dtype=np.float64)
    pos = np.arange(t)
    for i in range(1, depth + 1):
        idx = pos + off - i
        ok = idx >= 0
        lagm[ok, i - 1] = ext[idx[ok]]
        mask[ok, i - 1] = 1.0
    num = np.cumsum(lagm * w[None, :], axis=1)[:, -1]
    den = np.cumsum(mask * w[None, :], axis=1)[:, -1]
    n_prior = mask.sum(axis=1).astype(np.int64)
    ewma = np.divide(num, den, out=np.full(t, np.nan), where=den > 0.0)
    alert = (n_prior >= min_prior) & (v > factor * ewma)
    # key/id keep their incoming pandas dtypes (the output schema is
    # derived from the input schema, so no int64 coercion here — a
    # string or int32 key passes through untouched)
    n_out = int(alert.sum())
    pdf = pd.DataFrame(
        {
            key_col: pd.Series([key_val] * n_out),
            ts_col: rows[ts_col].to_numpy()[alert],
            id_col: rows[id_col].to_numpy()[alert],
            value_col: v[alert],
            "n_prior": n_prior[alert].astype("int32"),
            "ewma": ewma[alert],
        }
    )
    new_hist = [float(x) for x in ext[::-1][:depth]]
    return pdf, new_hist


def apply_ewma_alerts(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    alpha: float = 0.25,
    depth: int = 16,
    min_prior: int = 4,
    factor: float = 2.0,
) -> DataFrame:
    """Streaming per-key EWMA spike alerts (``applyInPandasWithState``).

    State per key is the last ``depth`` values (most-recent-first array —
    O(depth) doubles per key, constant at any corpus). Each micro-batch
    sorts its rows by (ts, id) within the key, runs them through the
    vectorized :func:`_ewma_scan` (whose per-row reference fold is
    :func:`_ewma_step`, pinned bit-equal), emits only the ALERT rows,
    and carries the updated tail forward — so alerts stream out with bounded latency and
    the union of all batches equals the batch operator exactly, provided
    per-key arrival order is event-time order across batches (the file
    source's modification-time ordering; an out-of-order source needs a
    watermark-sorted buffer upstream, which Spark's state API does not
    give applyInPandasWithState for free — documented trade)."""
    import pandas as pd

    weights = _ewma_weights_cached(alpha, depth)
    out_schema = _ewma_out_schema(df.schema, key_col, ts_col, id_col, value_col)
    state_schema = T.StructType(
        [T.StructField("hist", T.ArrayType(T.DoubleType()))]
    )

    def func(key, pdfs, state: GroupState):
        rows = pd.concat(list(pdfs), ignore_index=True)
        if len(rows) == 0:
            return
        rows = rows.sort_values([ts_col, id_col])
        history = list(state.get[0]) if state.exists else []
        pdf, history = _ewma_scan(
            rows, history, weights, depth, min_prior, factor,
            key[0], ts_col, id_col, value_col, key_col,
        )
        state.update((history,))
        if len(pdf):
            yield pdf

    return df.groupBy(key_col).applyInPandasWithState(
        func, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def ewma_alerts_batch(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    alpha: float = 0.25,
    depth: int = 16,
    min_prior: int = 4,
    factor: float = 2.0,
    min_parallelism: int | None = None,
) -> DataFrame:
    """The batch face of :func:`apply_ewma_alerts`: one ``applyInPandas``
    over the same per-row fold (each key's full history is one Arrow
    group), so batch output ≡ streaming union and both are oracle-
    checkable against the windowed-SQL replay.

    PARTITION FLOOR (VERDICT r11 Next #2, SCALE.md §Python-boundary
    policy): AQE's bytes-based coalescing underprices Python stages — a
    ~3.5 MB grouped shuffle coalesces to ONE task, serializing every
    key's Arrow round-trip through one Python worker (measured: the
    sf0.1 stage ran 1 task, ~2.5 s of fixed per-group overhead at width
    1). The input is therefore ``repartition(n, key)``-ed explicitly:
    a user-specified partition COUNT (shuffle origin
    ``REPARTITION_BY_NUM``) is exempt from AQE coalescing, and
    hash-partitioning on the grouping key already satisfies
    ``applyInPandas``'s clustering requirement, so the plan keeps ONE
    exchange — same shuffle, pinned width. ``min_parallelism`` defaults
    to the session's ``defaultParallelism`` (executor cores here; on a
    real cluster, cores × executors — exactly the floor a small-bytes
    many-key Python stage should never dip under)."""
    import pandas as pd

    weights = _ewma_weights_cached(alpha, depth)
    out_schema = _ewma_out_schema(df.schema, key_col, ts_col, id_col, value_col)

    def func(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, id_col])
        out, _ = _ewma_scan(
            pdf, [], weights, depth, min_prior, factor,
            pdf[key_col].iloc[0], ts_col, id_col, value_col, key_col,
        )
        return out

    n_floor = (
        min_parallelism
        if min_parallelism is not None
        else df.sparkSession.sparkContext.defaultParallelism
    )
    return (
        df.repartition(n_floor, key_col)
        .groupBy(key_col)
        .applyInPandas(func, out_schema)
    )


def _ewma_weights_cached(alpha: float, depth: int) -> list:
    from pubic_multi_platform_to_postgres_spark.operators.timeseries import (
        ewma_weights,
    )

    return ewma_weights(alpha, depth)
