"""Streaming-path tests: the same window builders that pass the DuckDB
oracle in batch mode must produce identical results when driven as a
Structured Streaming query through the foreachBatch keyed-upsert sink,
across multiple micro-batches (SURVEY.md §2.8 streaming completion)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pubic_multi_platform_to_postgres_spark.operators.upsert import ParquetUpsertSink
from pubic_multi_platform_to_postgres_spark.queries.registry import dsum, load
from pubic_multi_platform_to_postgres_spark.streaming.runner import (
    run_available_now_cycle,
    stream_from_directory,
)
from pubic_multi_platform_to_postgres_spark.streaming.windows import (
    session_agg,
    tumbling_agg,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_batch(spark):
    # registry.load handles the TIMESTAMP(NANOS) parquet quirk
    return load(spark, SF, "events").cache()


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory, events_batch):
    """events sf0.001 rewritten as 3 time-ordered parquet files.

    Time-ordering matters: micro-batches arriving in event-time order mean
    (a) nothing falls behind the watermark mid-test and (b) a session's
    start is fixed by its first batch, so the upsert key stays stable while
    later batches extend the session. The file source processes files in
    modification-time order, hence the separate sequential writes.
    """
    import time as _time

    d = tmp_path_factory.mktemp("events_stream_src")
    lo, hi = events_batch.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).first()
    cuts = [lo + (hi - lo) / 3, lo + 2 * (hi - lo) / 3]
    ranges = [
        events_batch.filter(F.col("ts") <= F.lit(cuts[0])),
        events_batch.filter((F.col("ts") > F.lit(cuts[0])) & (F.col("ts") <= F.lit(cuts[1]))),
        events_batch.filter(F.col("ts") > F.lit(cuts[1])),
    ]
    for chunk in ranges:
        chunk.coalesce(1).write.mode("append").parquet(str(d))
        _time.sleep(1.1)  # distinct mtimes -> deterministic batch order
    return d


def _collect_sorted(df, cols):
    return sorted(
        [tuple(r[c] for c in cols) for r in df.collect()],
        key=lambda t: tuple(str(x) for x in t),
    )


def test_streaming_tumbling_equals_batch(spark, events_dir, events_batch, tmp_path):
    aggs = lambda: [F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value")]  # noqa: E731
    batch_result = tumbling_agg(events_batch, "ts", "1 hour", ["event_type"], aggs())

    stream = stream_from_directory(
        spark, events_dir, events_batch.schema, max_files_per_trigger=1
    )
    windowed = tumbling_agg(
        stream, "ts", "1 hour", ["event_type"], aggs(), watermark="2 hours"
    )
    sink = ParquetUpsertSink(
        spark, tmp_path / "agg", keys=["window_start", "event_type"]
    )
    run_available_now_cycle(windowed, sink, tmp_path / "ckpt")

    cols = ["window_start", "window_end", "event_type", "n_events", "sum_value"]
    got = _collect_sorted(spark.read.parquet(str(tmp_path / "agg")), cols)
    want = _collect_sorted(batch_result, cols)
    assert got == want  # update-mode upsert across 3 micro-batches == batch


def test_streaming_cycle_is_incremental(spark, events_dir, events_batch, tmp_path):
    """Second AvailableNow cycle with no new files processes nothing —
    the checkpoint is the bookmark (K3's streaming analog)."""
    stream = stream_from_directory(spark, events_dir, events_batch.schema)
    windowed = tumbling_agg(
        stream, "ts", "1 hour", ["event_type"],
        [F.count(F.lit(1)).alias("n_events")], watermark="2 hours",
    )
    sink = ParquetUpsertSink(spark, tmp_path / "agg", keys=["window_start", "event_type"])
    run_available_now_cycle(windowed, sink, tmp_path / "ckpt")
    first = spark.read.parquet(str(tmp_path / "agg")).count()

    # rerun: same checkpoint, no new input files
    stream2 = stream_from_directory(spark, events_dir, events_batch.schema)
    windowed2 = tumbling_agg(
        stream2, "ts", "1 hour", ["event_type"],
        [F.count(F.lit(1)).alias("n_events")], watermark="2 hours",
    )
    run_available_now_cycle(windowed2, sink, tmp_path / "ckpt")
    assert spark.read.parquet(str(tmp_path / "agg")).count() == first


def test_streaming_session_equals_batch(spark, events_dir, events_batch, tmp_path):
    """Session windows are mergeable state: sessions split across
    micro-batches must coalesce to the batch answer. Streaming session
    aggregation supports append/complete only (update is rejected); in
    complete mode every batch re-emits the merged state, so the final
    upsert holds exactly the batch answer."""
    aggs = lambda: [F.count(F.lit(1)).alias("n_events")]  # noqa: E731
    batch_result = session_agg(events_batch, "ts", "30 minutes", ["user_id"], aggs())

    stream = stream_from_directory(
        spark, events_dir, events_batch.schema, max_files_per_trigger=1
    )
    sessions = session_agg(
        stream, "ts", "30 minutes", ["user_id"], aggs(), watermark="365 days"
    )
    sink = ParquetUpsertSink(
        spark, tmp_path / "sess", keys=["user_id", "session_start"]
    )
    run_available_now_cycle(sessions, sink, tmp_path / "ckpt", output_mode="complete")

    cols = ["session_start", "session_end", "user_id", "n_events"]
    got = _collect_sorted(spark.read.parquet(str(tmp_path / "sess")), cols)
    want = _collect_sorted(batch_result, cols)
    assert got == want


def test_stateful_running_totals_equals_batch(spark, events_dir, events_batch, tmp_path):
    """applyInPandasWithState: per-user running totals accumulated across
    micro-batches must converge to the batch groupBy answer."""
    from pubic_multi_platform_to_postgres_spark.queries.registry import dsum
    from pubic_multi_platform_to_postgres_spark.streaming.stateful import (
        apply_running_totals,
    )

    batch = (
        events_batch.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
    )
    want = {
        r["user_id"]: (r["n_events"], round(r["sum_value"], 6)) for r in batch.collect()
    }

    stream = stream_from_directory(
        spark, events_dir, events_batch.schema, max_files_per_trigger=1
    )
    totals = apply_running_totals(stream, "user_id", "value")
    sink = ParquetUpsertSink(spark, tmp_path / "totals", keys=["user_id"])
    run_available_now_cycle(totals, sink, tmp_path / "ckpt")

    got = {
        r["user_id"]: (r["n_events"], round(r["sum_value"], 6))
        for r in spark.read.parquet(str(tmp_path / "totals")).collect()
    }
    assert got == want


def test_stateful_first_seen_filter_drops_replays(spark, events_dir, events_batch, tmp_path):
    """In-flight replay dedup: re-delivering the same keys in later
    micro-batches emits nothing new."""
    from pubic_multi_platform_to_postgres_spark.streaming.stateful import (
        first_seen_filter,
    )

    stream = stream_from_directory(
        spark, events_dir, events_batch.schema, max_files_per_trigger=1
    )
    firsts = first_seen_filter(stream, "user_id", ["event_type"])
    sink = ParquetUpsertSink(spark, tmp_path / "firsts", keys=["user_id"])
    run_available_now_cycle(firsts, sink, tmp_path / "ckpt")

    out = spark.read.parquet(str(tmp_path / "firsts"))
    n_users = events_batch.select("user_id").distinct().count()
    assert out.count() == n_users
    assert out.select("user_id").distinct().count() == n_users


def test_streaming_sliding_equals_batch(spark, events_dir, events_batch, tmp_path):
    from pubic_multi_platform_to_postgres_spark.streaming.windows import sliding_agg

    aggs = lambda: [F.count(F.lit(1)).alias("n_events")]  # noqa: E731
    batch_result = sliding_agg(
        events_batch, "ts", "30 minutes", "15 minutes", ["event_type"], aggs()
    )
    stream = stream_from_directory(
        spark, events_dir, events_batch.schema, max_files_per_trigger=1
    )
    windowed = sliding_agg(
        stream, "ts", "30 minutes", "15 minutes", ["event_type"], aggs(),
        watermark="2 hours",
    )
    sink = ParquetUpsertSink(
        spark, tmp_path / "slide", keys=["window_start", "event_type"]
    )
    run_available_now_cycle(windowed, sink, tmp_path / "ckpt")

    cols = ["window_start", "window_end", "event_type", "n_events"]
    got = _collect_sorted(spark.read.parquet(str(tmp_path / "slide")), cols)
    want = _collect_sorted(batch_result, cols)
    assert got == want


def test_streaming_dedup_drops_cross_batch_redelivery(spark, events_batch, tmp_path):
    """dedup_exactly_once on a stream: rows REDELIVERED in a later
    micro-batch are dropped by dropDuplicatesWithinWatermark state, so
    the sink holds exactly the distinct events — the batch answer."""
    import time as _time

    from pubic_multi_platform_to_postgres_spark.streaming.windows import (
        dedup_exactly_once,
    )

    src = tmp_path / "redelivery_src"
    subset = events_batch.filter(F.col("event_id") % 7 == 0)
    events_batch.coalesce(1).write.mode("append").parquet(str(src))
    _time.sleep(1.1)  # distinct mtime -> replay arrives as a LATER batch
    subset.coalesce(1).write.mode("append").parquet(str(src))

    stream = stream_from_directory(
        spark, src, events_batch.schema, max_files_per_trigger=1
    )
    clean = dedup_exactly_once(stream, ["event_id"], ts_col="ts", watermark="365 days")
    out_dir, ckpt = tmp_path / "clean", tmp_path / "ckpt"
    q = (
        clean.writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = spark.read.parquet(str(out_dir))
    assert got.count() == events_batch.count()
    assert got.select("event_id").distinct().count() == events_batch.count()


def test_crash_recovery_restart_from_checkpoint_exactly_once(
    spark, events_dir, events_batch, tmp_path
):
    """Kill the query mid-stream — AFTER the foreachBatch sink write but
    BEFORE Spark commits the epoch — then restart from the checkpoint.
    Spark replays the uncommitted micro-batch (at-least-once delivery);
    the keyed upsert absorbs the replay idempotently, so the sink ends
    EXACTLY equal to the batch answer: at-least-once replay + idempotent
    MERGE = exactly-once observable effect (VERDICT r4 #8)."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    aggs = lambda: [F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value")]  # noqa: E731
    batch_result = tumbling_agg(events_batch, "ts", "1 hour", ["event_type"], aggs())

    sink = ParquetUpsertSink(
        spark, tmp_path / "agg", keys=["window_start", "event_type"]
    )
    crash_flag = tmp_path / "crashed_once"
    ckpt = tmp_path / "ckpt"

    def write_then_maybe_crash(batch, epoch):
        sink.write(batch)  # delivered to the sink...
        if epoch >= 1 and not crash_flag.exists():
            crash_flag.write_text("boom")
            raise RuntimeError("injected crash after sink write")  # ...then die

    def start():
        stream = stream_from_directory(
            spark, events_dir, events_batch.schema, max_files_per_trigger=1
        )
        windowed = tumbling_agg(
            stream, "ts", "1 hour", ["event_type"], aggs(), watermark="2 hours"
        )
        return (
            windowed.writeStream.outputMode("update")
            .option("checkpointLocation", str(ckpt))
            .foreachBatch(write_then_maybe_crash)
            .trigger(availableNow=True)
            .start()
        )

    q = start()
    with pytest.raises(StreamingQueryException, match="injected crash"):
        q.awaitTermination(180)
    assert crash_flag.exists()  # the failure really was the injected one

    q2 = start()  # same checkpoint: resumes at the uncommitted epoch
    assert q2.awaitTermination(180)

    cols = ["window_start", "window_end", "event_type", "n_events", "sum_value"]
    got = _collect_sorted(spark.read.parquet(str(tmp_path / "agg")), cols)
    want = _collect_sorted(batch_result, cols)
    assert got == want  # replayed epoch upserted, not duplicated


def test_crash_recovery_dedup_state_survives_restart(spark, events_batch, tmp_path):
    """dropDuplicatesWithinWatermark state must RECOVER from the
    checkpoint: ids seen before a crash, redelivered in a file that only
    arrives after the restart, are still dropped — the bounded-state
    exactly-once dedup claim holds across process death, not just across
    micro-batches of one run."""
    import time as _time

    from pubic_multi_platform_to_postgres_spark.streaming.windows import (
        dedup_exactly_once,
    )

    src, out_dir, ckpt = tmp_path / "src", tmp_path / "clean", tmp_path / "ckpt"
    subset = events_batch.filter(F.col("event_id") % 7 == 0)

    def run_cycle():
        stream = stream_from_directory(
            spark, src, events_batch.schema, max_files_per_trigger=1
        )
        clean = dedup_exactly_once(
            stream, ["event_id"], ts_col="ts", watermark="365 days"
        )
        q = (
            clean.writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)

    # cycle 1: full corpus lands, state records every event_id, query stops
    events_batch.coalesce(1).write.mode("append").parquet(str(src))
    run_cycle()
    # "crash": the query object is gone; only the checkpoint remains.
    _time.sleep(1.1)  # distinct mtime -> new file is a post-restart batch
    subset.coalesce(1).write.mode("append").parquet(str(src))
    run_cycle()  # fresh query, same checkpoint -> state restored

    got = spark.read.parquet(str(out_dir))
    assert got.count() == events_batch.count()  # replays after restart dropped
    assert got.select("event_id").distinct().count() == events_batch.count()


def test_stream_stream_interval_join_equals_batch(spark, events_dir, events_batch, tmp_path):
    """Click→purchase attribution as a watermarked stream-stream interval
    join must equal the same join run in batch — including pairs whose
    click and purchase arrive in DIFFERENT micro-batches (join state)."""
    from pubic_multi_platform_to_postgres_spark.streaming.windows import (
        interval_join_stream,
    )

    def split(df):
        clicks = df.filter(F.col("event_type") == "click").select(
            "user_id", "ts", F.col("event_id").alias("click_id")
        )
        buys = df.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", F.col("event_id").alias("purchase_id")
        )
        return clicks, buys

    def attribute(clicks, buys):
        return interval_join_stream(
            clicks, buys, "user_id", "ts", "ts", max_delay_s=3600
        ).select(
            F.col("l_click_id").alias("click_id"),
            F.col("r_purchase_id").alias("purchase_id"),
        )

    expected = _collect_sorted(attribute(*split(events_batch)), ["click_id", "purchase_id"])
    assert expected, "fixture must produce at least one attributed pair"

    schema = events_batch.schema
    stream = stream_from_directory(spark, events_dir, schema, max_files_per_trigger=1)
    # nanosAsLong quirk is only in the raw parquet read path used by load();
    # events_dir was rewritten by Spark with micros, so the stream matches.
    out_dir, ckpt = tmp_path / "out", tmp_path / "ckpt"
    q = (
        attribute(*split(stream))
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = _collect_sorted(spark.read.parquet(str(out_dir)), ["click_id", "purchase_id"])
    assert got == expected


def test_streaming_cms_cells_match_batch(spark, tmp_path):
    """The CMS cell grid built as a Structured Streaming aggregation over
    micro-batched documents must equal the batch sketch exactly — and its
    state is the bounded d x w grid (1024 keys), the reason the sketch is
    the streaming answer to heavy hitters at all."""
    import time as _time

    from pubic_multi_platform_to_postgres_spark.operators.sketches import (
        cms_cells,
        cms_cells_from_occurrences,
        cms_token_rows,
    )

    docs = load(spark, SF, "documents").select("doc_id", "text")
    src = tmp_path / "docs_stream_src"
    for third in range(3):
        docs.filter(F.col("doc_id") % 3 == third).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
        _time.sleep(1.1)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        cms_cells_from_occurrences(stream, "text")
        .writeStream.format("memory")
        .queryName("cms_cells_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = _collect_sorted(spark.table("cms_cells_stream"), ["r", "bucket", "cell"])
    want = _collect_sorted(cms_cells(cms_token_rows(docs, "text")), ["r", "bucket", "cell"])
    assert got == want and len(got) > 0
    assert len(got) <= 4 * 256  # bounded state: the whole point


def test_streaming_content_addressed_dedup_matches_batch(spark, tmp_path):
    """The content-addressed ingest collapse (fingerprint -> min-uid +
    copy count) built as a stateful Structured Streaming aggregation
    over micro-batched uploads must equal the batch query exactly —
    re-uploads arriving in LATER micro-batches still collapse onto the
    first copy, and state is bounded by distinct content (one row per
    fingerprint), not by feed volume."""
    import time as _time

    from pubic_multi_platform_to_postgres_spark.operators.multimodal import (
        ahash64,
    )
    from pubic_multi_platform_to_postgres_spark.queries.llmdata import (
        render_image_fixture,
    )
    from pubic_multi_platform_to_postgres_spark.queries.registry import REGISTRY

    docs = load(spark, SF, "documents").select("doc_id")
    feed = docs.select(
        F.col("doc_id").alias("uid"), F.col("doc_id").alias("d")
    ).unionAll(
        docs.filter(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + 10_000_000).alias("uid"),
            F.col("doc_id").alias("d"),
        )
    )
    # originals in two files, re-uploads in a LATER third file — the
    # cross-micro-batch redelivery case
    src = tmp_path / "uploads_src"
    for part, flt in enumerate([
        feed.filter((F.col("uid") < 10_000_000) & (F.col("d") % 2 == 0)),
        feed.filter((F.col("uid") < 10_000_000) & (F.col("d") % 2 == 1)),
        feed.filter(F.col("uid") >= 10_000_000),
    ]):
        flt.coalesce(1).write.mode("append").parquet(str(src))
        _time.sleep(1.1)

    stream = (
        spark.readStream.schema("uid long, d long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    fp = ahash64(render_image_fixture(stream), "blob", "uid").filter(
        F.col("decode_ok"))
    q = (
        fp.groupBy("ahash64")
        .agg(F.min("id").cast("long").alias("doc_id"),
             F.count(F.lit(1)).cast("long").alias("n_copies"))
        .select("doc_id", "n_copies")
        .writeStream.format("memory")
        .queryName("cad_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "cad_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = _collect_sorted(spark.table("cad_stream"), ["doc_id", "n_copies"])
    want = _collect_sorted(
        REGISTRY["multimodal_content_addressed_dedup"].fn(spark, SF),
        ["doc_id", "n_copies"])
    assert got == want and len(got) > 0
    # every re-upload collapsed: no kept id is from the re-upload range
    assert all(r["doc_id"] < 10_000_000 for r in spark.table("cad_stream").collect())


def test_streaming_transition_pairs_match_batch(spark, tmp_path):
    """The stateful per-user event pairing (applyInPandasWithState, one
    last-event string per user) over time-ordered micro-batches must
    reproduce the BATCH transition matrix exactly: pairs spanning
    micro-batch boundaries are stitched through state, so total counts
    per (src, dst) — and therefore the normalized probabilities — are
    identical."""
    import time as _time

    from pubic_multi_platform_to_postgres_spark.queries.registry import REGISTRY
    from pubic_multi_platform_to_postgres_spark.streaming.stateful import (
        transition_pairs,
    )

    ev = load(spark, SF, "events").select("event_id", "ts", "user_id", "event_type")
    # three time-ordered files: per-user batch-monotone event time
    from pyspark.sql import Window as W

    ranked = ev.withColumn(
        "part", F.ntile(3).over(W.orderBy("ts", "event_id"))
    )
    src = tmp_path / "events_src"
    for p in (1, 2, 3):
        ranked.filter(F.col("part") == p).drop("part").coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
        _time.sleep(1.1)

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        transition_pairs(stream)
        .writeStream.format("memory")
        .queryName("trans_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "trans_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["src_event"], r["dst_event"]): r["n"]
        for r in spark.table("trans_stream")
        .groupBy("src_event", "dst_event")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    want = {
        (r["src_event"], r["dst_event"]): r["n"]
        for r in REGISTRY["journey_transition_matrix"].fn(spark, SF).collect()
    }
    assert got == want and len(got) > 0


def test_streaming_transition_pairs_custom_order_cols(spark, tmp_path):
    """``transition_pairs`` must honor its configurable schema end to
    end: a frame whose key/type/ordering columns are all renamed (no
    ``ts``/``event_id`` anywhere) pairs correctly when ``order_cols`` is
    passed — the round-8 advisory was a KeyError from hardcoded batch
    ordering columns despite the parameterized signature."""
    src = tmp_path / "renamed_src"
    spark.createDataFrame(
        [(1, "a", 10, 1), (1, "b", 20, 2), (1, "c", 20, 3), (2, "x", 5, 4),
         (2, "y", 6, 5)],
        "uid long, etype string, t long, seq long",
    ).coalesce(1).write.parquet(str(src))
    stream = (
        spark.readStream.schema("uid long, etype string, t long, seq long")
        .parquet(str(src))
    )
    from pubic_multi_platform_to_postgres_spark.streaming.stateful import (
        transition_pairs,
    )

    q = (
        transition_pairs(stream, key_col="uid", type_col="etype",
                         order_cols=("t", "seq"))
        .writeStream.format("memory")
        .queryName("trans_renamed")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "renamed_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["src_event"], r["dst_event"])
        for r in spark.table("trans_renamed").collect()
    )
    assert got == [("a", "b"), ("b", "c"), ("x", "y")]


def test_stream_left_outer_interval_join_emits_unmatched(
    spark, events_batch, tmp_path
):
    """The LEFT OUTER stream-stream interval join must emit every
    unattributed click with null purchase columns once the purchase-side
    watermark passes its join window — equal to the batch left join.
    Far-future sentinel purchases (for a user with no clicks) push the
    watermark past every real click's horizon so outer state fully
    evicts before the comparison."""
    import time as _time

    from pubic_multi_platform_to_postgres_spark.streaming.windows import (
        interval_join_stream,
    )

    def split(df):
        clicks = df.filter(F.col("event_type") == "click").select(
            "user_id", "ts", F.col("event_id").alias("click_id")
        )
        buys = df.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", F.col("event_id").alias("purchase_id")
        )
        return clicks, buys

    def unattributed(clicks, buys):
        j = interval_join_stream(
            clicks, buys, "user_id", "ts", "ts", max_delay_s=1800,
            watermark="1 second", join_type="left_outer",
        )
        return j.filter(F.col("r_purchase_id").isNull()).select(
            F.col("l_click_id").alias("click_id")
        )

    expected = _collect_sorted(unattributed(*split(events_batch)), ["click_id"])
    assert expected, "fixture must produce at least one unattributed click"

    # stream source: the real corpus first, then sentinel files that
    # advance BOTH side watermarks (each side's watermark tracks ITS OWN
    # filtered stream's max event time — purchase-only sentinels would
    # leave the click watermark at the last real click, and the final
    # click would never evict); a watermark update computed at the end
    # of one batch applies in the NEXT, so two sentinel batches follow
    # the jump
    src = tmp_path / "src"
    events_batch.coalesce(1).write.mode("append").parquet(str(src))
    far = events_batch.agg(F.max("ts")).first()[0]
    for k in (1, 2, 3):
        _time.sleep(1.1)  # distinct mtimes: file source orders by mtime
        spark.createDataFrame(
            [(-(1000 + k), far, -999, "purchase", 0.0, "{}"),
             (-(2000 + k), far, -999, "click", 0.0, "{}")],
            events_batch.schema,
        ).withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {10 * k} DAYS")) \
            .coalesce(1).write.mode("append").parquet(str(src))

    stream = stream_from_directory(
        spark, src, events_batch.schema, max_files_per_trigger=1
    )
    out_dir, ckpt = tmp_path / "out", tmp_path / "ckpt"
    q = (
        unattributed(*split(stream))
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = _collect_sorted(
        spark.read.parquet(str(out_dir)).filter(F.col("click_id") >= 0),
        ["click_id"],
    )  # sentinel clicks are themselves unattributed by construction
    assert got == expected


def test_stateful_ewma_alerts_equals_batch(spark, events_dir, events_batch, tmp_path):
    """Per-key EWMA alert state (last-16 array) carried across
    micro-batches: the union of streamed alerts must BIT-equal both the
    batch face and the pure-JVM window expression (three-way
    equivalence — the gate oracle then covers the streaming operator
    transitively)."""
    from pubic_multi_platform_to_postgres_spark.operators.timeseries import (
        ewma_anomaly,
    )
    from pubic_multi_platform_to_postgres_spark.streaming.stateful import (
        apply_ewma_alerts,
        ewma_alerts_batch,
    )

    cols = ["user_id", "event_id", "value", "n_prior", "ewma"]
    want_window = _collect_sorted(
        ewma_anomaly(events_batch, "user_id", ["ts", "event_id"], "value"),
        cols,
    )
    want_batch_face = _collect_sorted(ewma_alerts_batch(events_batch), cols)
    assert want_batch_face == want_window

    stream = stream_from_directory(
        spark, events_dir, events_batch.schema, max_files_per_trigger=1
    )
    alerts = apply_ewma_alerts(stream)
    sink = ParquetUpsertSink(spark, tmp_path / "alerts", keys=["event_id"])
    run_available_now_cycle(alerts, sink, tmp_path / "ckpt")

    got = _collect_sorted(
        spark.read.parquet(str(tmp_path / "alerts")), cols
    )
    assert got == want_window


def test_ewma_step_matches_scan():
    """The per-row reference fold (`_ewma_step`) and the vectorized
    production scan (`_ewma_scan`) must agree BIT-for-bit: same alert
    rows, same n_prior, same ewma doubles, same carried history — on a
    series long enough to exercise empty/partial/full lag frames and a
    non-empty incoming history."""
    import datetime as dt

    import numpy as np
    import pandas as pd

    from pubic_multi_platform_to_postgres_spark.operators.timeseries import (
        ewma_weights,
    )
    from pubic_multi_platform_to_postgres_spark.streaming.stateful import (
        _ewma_scan,
        _ewma_step,
    )

    depth, min_prior, factor = 16, 4, 2.0
    weights = ewma_weights(0.25, depth)
    rng = np.random.default_rng(7)
    vals = np.round(rng.uniform(1.0, 50.0, size=60), 3)
    vals[[10, 25, 40]] *= 9.0  # planted spikes
    base = dt.datetime(2024, 1, 1)
    for pre in ([], [12.5, 3.25, 40.0]):  # fresh key and carried state
        rows = pd.DataFrame(
            {
                "user_id": np.full(len(vals), 5, dtype=np.int64),
                "ts": [base + dt.timedelta(minutes=i) for i in range(len(vals))],
                "event_id": np.arange(len(vals), dtype=np.int64),
                "value": vals,
            }
        )
        got_pdf, got_hist = _ewma_scan(
            rows, list(pre), weights, depth, min_prior, factor,
            5, "ts", "event_id", "value", "user_id",
        )
        hist = list(pre)
        want = []
        for i, v in enumerate(vals):
            n, ewma, is_alert = _ewma_step(
                hist, float(v), weights, min_prior, factor
            )
            if is_alert:
                want.append((i, n, ewma))
            hist = [float(v)] + hist
            hist = hist[:depth]
        assert [
            (int(r.event_id), int(r.n_prior), float(r.ewma))
            for r in got_pdf.itertuples()
        ] == want
        assert got_hist == hist
        assert len(want) > 0  # the fixture must actually alert


def test_ewma_out_schema_derived_from_input(spark):
    """r11 advisory: the output schema must track the INPUT field types
    for key/ts/id (not hard-coded bigint/timestamp), and a non-numeric
    value column must fail fast with a clear error."""
    import datetime as dt

    import pytest as _pytest
    from pyspark.sql import types as T

    from pubic_multi_platform_to_postgres_spark.streaming.stateful import (
        _ewma_out_schema,
        ewma_alerts_batch,
    )

    schema = T.StructType(
        [
            T.StructField("sensor", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("reading_id", T.IntegerType()),
            T.StructField("value", T.FloatType()),
        ]
    )
    out = _ewma_out_schema(schema, "sensor", "ts", "reading_id", "value")
    assert out["sensor"].dataType == T.StringType()
    assert out["reading_id"].dataType == T.IntegerType()
    assert out["value"].dataType == T.DoubleType()  # fold is double math

    with _pytest.raises(TypeError, match="must be numeric"):
        _ewma_out_schema(
            T.StructType(
                [
                    T.StructField("k", T.LongType()),
                    T.StructField("ts", T.TimestampType()),
                    T.StructField("id", T.LongType()),
                    T.StructField("value", T.StringType()),
                ]
            ),
            "k", "ts", "id", "value",
        )
    with _pytest.raises(ValueError, match="not in input schema"):
        _ewma_out_schema(schema, "nope", "ts", "reading_id", "value")

    # end-to-end: a string-keyed, int32-id table runs through the batch
    # face and keeps its types (the r11 hard-coded schema raised Arrow
    # cast errors here)
    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            ("a", base + dt.timedelta(minutes=i), i, v)
            for i, v in enumerate([10.0, 11.0, 9.0, 10.5, 10.2, 99.0, 10.0])
        ],
        schema,
    )
    alerts = ewma_alerts_batch(
        df, key_col="sensor", ts_col="ts", id_col="reading_id",
        value_col="value",
    )
    assert alerts.schema["sensor"].dataType == T.StringType()
    assert alerts.schema["reading_id"].dataType == T.IntegerType()
    rows = alerts.collect()
    assert [r["reading_id"] for r in rows] == [5]
    assert rows[0]["sensor"] == "a"
