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
