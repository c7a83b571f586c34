"""merge_into / apply_cdc contracts: clause semantics, duplicate-source
rejection, NULL-condition handling, CDC precedence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pubic_multi_platform_to_postgres_spark.operators.merge import (
    apply_cdc,
    apply_cdc_versioned,
    latest_changes,
    merge_into,
)


def _target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id int, name string, v double",
    )


def test_merge_update_insert_delete(spark):
    src = spark.createDataFrame(
        [(2, "b2", 21.0, False), (3, "c", 30.0, True), (4, "d", 40.0, False)],
        "id int, name string, v double, del boolean",
    )
    out = merge_into(
        _target(spark),
        src,
        ["id"],
        matched_update={"name": F.col("_src_name"), "v": F.col("_src_v")},
        matched_delete=F.col("_src_del"),
    )
    rows = {r["id"]: (r["name"], r["v"]) for r in out.collect()}
    assert rows == {
        1: ("a", 10.0),   # untouched target row
        2: ("b2", 21.0),  # updated
        4: ("d", 40.0),   # inserted (source-only)
    }  # 3 deleted


def test_merge_insert_condition_and_no_insert(spark):
    src = spark.createDataFrame(
        [(4, "d", 40.0, True), (5, "e", 50.0, False)],
        "id int, name string, v double, ok boolean",
    )
    cond = merge_into(_target(spark), src, ["id"], insert=F.col("_src_ok"))
    assert {r["id"] for r in cond.collect()} == {1, 2, 3, 4}  # 5 filtered
    none = merge_into(_target(spark), src, ["id"], insert=False)
    assert {r["id"] for r in none.collect()} == {1, 2, 3}


def test_merge_null_delete_condition_keeps_row(spark):
    # SQL MERGE: a NULL-valued condition is NOT satisfied -> row kept
    src = spark.createDataFrame([(2, None)], "id int, del boolean")
    out = merge_into(_target(spark), src, ["id"], matched_delete=F.col("_src_del"))
    assert {r["id"] for r in out.collect()} == {1, 2, 3}


def test_merge_duplicate_source_keys_raise(spark):
    src = spark.createDataFrame(
        [(2, "x", 1.0), (2, "y", 2.0)], "id int, name string, v double"
    )
    with pytest.raises(Exception, match="duplicate source key"):
        merge_into(_target(spark), src, ["id"]).collect()


def test_latest_changes_keeps_highest_seq(spark):
    ch = spark.createDataFrame(
        [(1, "old", 1), (1, "new", 2), (2, "only", 1)],
        "id int, name string, seq int",
    )
    rows = {r["id"]: r["name"] for r in latest_changes(ch, ["id"], "seq").collect()}
    assert rows == {1: "new", 2: "only"}


def test_apply_cdc_end_to_end(spark):
    changes = spark.createDataFrame(
        [
            (2, "b-v1", 1, "U"),
            (2, "b-v2", 2, "U"),   # out-of-order: latest seq wins
            (3, None, 5, "D"),     # delete existing
            (4, "d", 1, "I"),      # insert new
            (9, None, 1, "D"),     # delete absent key: no-op
            (5, "e-v1", 1, "I"),
            (5, None, 2, "D"),     # insert then delete -> absent
        ],
        "id int, name string, seq int, op string",
    )
    tgt = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id int, name string"
    )
    rows = {r["id"]: r["name"] for r in
            apply_cdc(tgt, changes, ["id"], "seq", "op").collect()}
    assert rows == {1: "a", 2: "b-v2", 4: "d"}


def test_apply_cdc_versioned_ignores_stale_cross_batch_update(spark):
    tgt = spark.createDataFrame([(1, "v2", 2)], "id int, name string, seq int")
    stale = spark.createDataFrame([(1, "v1", 1, "U")], "id int, name string, seq int, op string")
    rows = apply_cdc_versioned(tgt, stale, ["id"], "seq").collect()
    assert [(r["id"], r["name"], r["seq"]) for r in rows] == [(1, "v2", 2)]
    # replaying the winning change is a no-op too
    replay = spark.createDataFrame([(1, "v2", 2, "U")], "id int, name string, seq int, op string")
    rows = apply_cdc_versioned(tgt, replay, ["id"], "seq").collect()
    assert [(r["id"], r["name"], r["seq"]) for r in rows] == [(1, "v2", 2)]


def test_streaming_cdc_sink_end_to_end(spark, tmp_path):
    """CDC change files stream through foreach_batch_cdc in two
    AvailableNow cycles; the snapshot converges to the versioned apply
    of all changes, with a stale cross-batch update ignored."""
    import time

    from pubic_multi_platform_to_postgres_spark.operators.merge import ParquetCdcSink
    from pubic_multi_platform_to_postgres_spark.streaming.runner import (
        foreach_batch_cdc,
        stream_from_directory,
    )

    src_dir = tmp_path / "changes"
    src_dir.mkdir()
    schema = "id int, name string, seq int, op string"

    def arrive(rows, fname):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / "stage" / fname))
        import shutil as sh
        for f in (tmp_path / "stage" / fname).glob("*.parquet"):
            sh.copy(f, src_dir / f"{fname}.parquet")
        time.sleep(1.1)  # file-source orders batches by mtime

    sink = ParquetCdcSink(spark, tmp_path / "snap", ["id"], "seq")
    ckpt = tmp_path / "ckpt"

    def cycle():
        stream = stream_from_directory(
            spark, src_dir, spark.createDataFrame([], schema).schema,
            max_files_per_trigger=1,
        )
        q = foreach_batch_cdc(stream, sink, ckpt)
        assert q.awaitTermination(120)

    arrive([(1, "a", 1, "I"), (2, "b", 2, "I")], "c1")
    cycle()
    arrive([(1, "a2", 5, "U"), (3, "c", 1, "I")], "c2")
    arrive([(1, "a-stale", 3, "U"), (2, None, 9, "D")], "c3")
    cycle()

    rows = {r["id"]: (r["name"], r["seq"]) for r in
            spark.read.parquet(str(tmp_path / "snap")).collect()}
    assert rows == {1: ("a2", 5), 3: ("c", 1)}  # stale U ignored, 2 deleted


def test_additive_agg_sink_incremental_equals_full_recompute(spark, tmp_path):
    """Folding batches into stored partials must equal aggregating all
    rows at once — incremental view maintenance for groupBy-sum."""
    from pubic_multi_platform_to_postgres_spark.operators.merge import AdditiveAggSink

    rows1 = [("a", 10), ("a", 5), ("b", 7)]
    rows2 = [("a", 1), ("c", 2), ("c", 3)]
    schema = "grp string, v int"
    measures = {
        "n": F.count(F.lit(1)),
        "total": F.sum(F.col("v").cast("long")),
    }
    sink = AdditiveAggSink(spark, tmp_path / "agg", ["grp"], measures)
    sink.write(spark.createDataFrame(rows1, schema))
    sink.write(spark.createDataFrame(rows2, schema))

    got = {r["grp"]: (r["n"], r["total"]) for r in
           spark.read.parquet(str(tmp_path / "agg")).collect()}
    full = spark.createDataFrame(rows1 + rows2, schema).groupBy("grp").agg(
        *[e.alias(n) for n, e in measures.items()]
    )
    want = {r["grp"]: (r["n"], r["total"]) for r in full.collect()}
    assert got == want == {"a": (3, 16), "b": (1, 7), "c": (2, 5)}


def test_additive_agg_sink_streaming_cycles(spark, tmp_path):
    """Driven per micro-batch through foreachBatch, the additive sink is
    a streaming materialized view: the stored rollup after two
    AvailableNow cycles equals the batch aggregate of all files."""
    import time

    from pubic_multi_platform_to_postgres_spark.operators.merge import AdditiveAggSink
    from pubic_multi_platform_to_postgres_spark.streaming.runner import (
        stream_from_directory,
    )

    src = tmp_path / "src"
    src.mkdir()
    schema = "grp string, v int"

    def arrive(rows, name):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite").parquet(str(tmp_path / "stage" / name))
        import shutil as sh
        for f in (tmp_path / "stage" / name).glob("*.parquet"):
            sh.copy(f, src / f"{name}.parquet")
        time.sleep(1.1)

    sink = AdditiveAggSink(
        spark, tmp_path / "agg", ["grp"],
        {"n": F.count(F.lit(1)), "total": F.sum(F.col("v").cast("long"))},
    )

    def cycle():
        stream = stream_from_directory(
            spark, src, spark.createDataFrame([], schema).schema,
            max_files_per_trigger=1)
        q = (stream.writeStream.outputMode("append")
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .foreachBatch(lambda b, _e: sink.write(b))
             .trigger(availableNow=True).start())
        assert q.awaitTermination(120)

    arrive([("a", 1), ("b", 2)], "c1")
    cycle()
    arrive([("a", 3)], "c2")
    arrive([("b", 4), ("c", 5)], "c3")
    cycle()

    got = {r["grp"]: (r["n"], r["total"]) for r in
           spark.read.parquet(str(tmp_path / "agg")).collect()}
    assert got == {"a": (2, 4), "b": (2, 6), "c": (1, 5)}


def test_additive_agg_sink_hll_distinct_across_batches(spark, tmp_path):
    """HLL-sketch state makes approx-distinct incrementally maintainable:
    the union of per-batch sketches estimates the distinct count over
    ALL batches (overlapping users counted once), which no additive
    counter can do."""
    from pubic_multi_platform_to_postgres_spark.operators.merge import AdditiveAggSink

    schema = "grp string, user int"
    sink = AdditiveAggSink(
        spark, tmp_path / "agg", ["grp"],
        measures={"n_events": F.count(F.lit(1))},
        sketch_measures={"users_sk": F.hll_sketch_agg("user")},
    )
    sink.write(spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 2), ("b", 9)], schema))
    sink.write(spark.createDataFrame(
        [("a", 2), ("a", 3), ("b", 9), ("b", 10)], schema))

    got = {r["grp"]: (r["n_events"], r["users"]) for r in
           spark.read.parquet(str(tmp_path / "agg"))
           .select("grp", "n_events",
                   F.hll_sketch_estimate("users_sk").alias("users"))
           .collect()}
    # events add; distinct users dedup across batches (HLL exact at tiny n)
    assert got == {"a": (5, 3), "b": (3, 2)}


def test_additive_agg_sink_min_max_merge_fns(spark, tmp_path):
    """min/max measures need least/greatest merges — the default additive
    merge would sum two minima into nonsense."""
    from pubic_multi_platform_to_postgres_spark.operators.merge import AdditiveAggSink

    schema = "grp string, v int"
    sink = AdditiveAggSink(
        spark, tmp_path / "agg", ["grp"],
        measures={"lo": F.min("v"), "hi": F.max("v"), "total": F.sum(F.col("v").cast("long"))},
        merge_fns={"lo": F.least, "hi": F.greatest},
    )
    sink.write(spark.createDataFrame([("a", 5), ("a", 9)], schema))
    sink.write(spark.createDataFrame([("a", 3), ("a", 7)], schema))
    row = spark.read.parquet(str(tmp_path / "agg")).collect()[0]
    assert (row["lo"], row["hi"], row["total"]) == (3, 9, 24)
