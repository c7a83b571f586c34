"""Streaming execution: file-source streams, keyed micro-batch upsert, and
the AvailableNow cycle — the Structured Streaming analog of the reference's
scheduler + Singer sink (O1 + K2, SURVEY.md §1.3 mapping table).

``foreach_batch_upsert`` is the streaming twin of
``operators/upsert.ParquetUpsertSink``: each micro-batch is MERGEd by
primary key, so at-least-once replay (the reference's bookmark contract)
lands idempotently — identical semantics, now driven by Spark's own
checkpointing instead of a Singer state file.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from pubic_multi_platform_to_postgres_spark.operators.upsert import ParquetUpsertSink


def stream_from_directory(
    spark: SparkSession,
    path: str | Path,
    schema: T.StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream: new files in ``path`` become micro-batches.
    ``max_files_per_trigger`` caps batch size (lets tests force multiple
    micro-batches; in production it bounds per-batch work)."""
    reader = spark.readStream.schema(schema).format(fmt)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(str(path))


def foreach_batch_upsert(
    df: DataFrame,
    sink: ParquetUpsertSink,
    checkpoint_dir: str | Path,
    available_now: bool = True,
    output_mode: str = "update",
) -> StreamingQuery:
    """Write a (possibly aggregated) stream through the keyed upsert sink.

    ``update`` output mode + PK upsert = last-write-wins per key across
    micro-batches — the streaming form of the reference's
    ``target-postgres`` upsert (K2). ``available_now`` processes exactly
    the data present now and stops (the batch-cycle analog of O1's
    "run every stream once, then sleep").
    """
    writer = (
        df.writeStream.outputMode(output_mode)
        .option("checkpointLocation", str(checkpoint_dir))
        .foreachBatch(lambda batch, _epoch: sink.write(batch))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_available_now_cycle(
    df: DataFrame,
    sink: ParquetUpsertSink,
    checkpoint_dir: str | Path,
    output_mode: str = "update",
    timeout_s: float = 300.0,
) -> None:
    """One full micro-batch cycle: start, drain everything available,
    stop. Re-invoking later picks up only new files (checkpoint state) —
    the incremental-bookmark behavior, natively."""
    q = foreach_batch_upsert(df, sink, checkpoint_dir, True, output_mode)
    try:
        if not q.awaitTermination(timeout_s):
            raise TimeoutError(f"streaming cycle exceeded {timeout_s}s")
    finally:
        if q.isActive:
            q.stop()


def foreach_batch_cdc(
    df: DataFrame,
    sink,
    checkpoint_dir: str | Path,
    available_now: bool = True,
) -> StreamingQuery:
    """Stream a CDC changelog (op/seq columns) into a
    :class:`~pubic_multi_platform_to_postgres_spark.operators.merge.ParquetCdcSink`:
    each micro-batch is version-check-merged (insert/update/delete) into
    the snapshot. Checkpointing gives exactly-once batch delivery; the
    stored per-row seq makes replays and cross-batch stragglers no-ops,
    so the pipeline is idempotent end to end."""
    writer = (
        df.writeStream.outputMode("append")
        .option("checkpointLocation", str(checkpoint_dir))
        .foreachBatch(lambda batch, _epoch: sink.write(batch))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
