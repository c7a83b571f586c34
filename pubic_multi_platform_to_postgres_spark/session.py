"""SparkSession factory tuned for this engine.

Local-mode defaults mirror what we would set on a real cluster: AQE on
(runtime re-planning, skew-join splitting, partition coalescing), shuffle
partitions sized to cores rather than the 200 default, UTC session timezone
(the reference pipelines normalize all timestamps to UTC ISO-8601 with ms
precision — ``tap_wrike/utility.py:242-245`` — and the DuckDB oracle is
UTC-naive), and Arrow enabled for the Python boundary.

At 100 TB the same settings scale: AQE coalesces the shuffle map output to
target sizes instead of a fixed partition count, and the skew-join config
splits hot keys without manual salting for the common cases.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(
    app_name: str = "spark_graft",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default ``*``).
    ``shuffle_partitions`` defaults to the core count, not Spark's 200 —
    tiny local runs over-parallelize otherwise; AQE coalesces further at
    runtime.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(int(cpus), 1)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batches of 1024 rows instead of Spark's 10000 (r12,
        # VERDICT r11 Next #7): a single corpus-sized batch through a
        # Python stage serializes the whole transfer before compute
        # starts and spikes the worker's allocations to the batch size —
        # measured as the bimodal wall-clock on the fingerprint UDFs
        # (dedup_simhash_pairs median 1.96 s spread 1.67 at the default;
        # 0.85 s with steady repeats at 1024 — smaller batches pipeline
        # JVM→Python transfer with compute and bound every allocation).
        # Codec/blob rows are unaffected (their tables are smaller than
        # one batch either way).
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        # push COUNT/MIN/MAX to parquet footers (manifest-style metadata
        # queries read statistics instead of data; off by default upstream)
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # r16: InferFiltersFromGenerate synthesizes `size(e) > 0 AND
        # isnotnull(e)` below every Generate, and CollapseProject inlines
        # the generator's FULL child expression into that filter — for the
        # engine's computed-array explodes (winnow fingerprints, shingle
        # windows, token n-grams: all interpreted higher-order-function
        # trees) the array expression is then evaluated 2-3x per input
        # row. Measured on the sf0.1 winnow stream: explode 3.40 s with
        # the rule, 0.38 s without; the rule's own benefit (dropping
        # empty-array rows before the Generate) is nil here because every
        # explode follows the map-side projection that builds the array —
        # there is no exchange or join below the Generate for the filter
        # to save. Results are identical either way (the inferred filter
        # only removes rows Generate itself drops), so the correctness
        # gate's vanilla driver session (rule ON) stays a valid oracle of
        # the tuned session's output.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
