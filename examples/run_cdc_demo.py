#!/usr/bin/env python
"""Streaming CDC demo: a Debezium-shaped changelog replayed into a
parquet snapshot with the version-check merge sink.

    python examples/run_cdc_demo.py

1. Change files (op ∈ I/U/D + monotone seq) land in a directory.
2. A Structured Streaming AvailableNow cycle drains them through
   ``foreach_batch_cdc`` → ``ParquetCdcSink``: per micro-batch the
   changelog collapses to latest-per-key and MERGEs into the snapshot —
   a change lands only if its seq beats the stored row's, so replays and
   cross-batch stragglers are no-ops.
3. More changes arrive (including a stale update and a delete); a second
   cycle picks up ONLY the new files (checkpoint) and converges.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

from pubic_multi_platform_to_postgres_spark.operators.merge import ParquetCdcSink  # noqa: E402
from pubic_multi_platform_to_postgres_spark.session import get_session  # noqa: E402
from pubic_multi_platform_to_postgres_spark.streaming.runner import (  # noqa: E402
    foreach_batch_cdc,
    stream_from_directory,
)

SCHEMA = "id int, name string, price double, seq int, op string"


def main() -> None:
    spark = get_session(app_name="cdc_demo", master="local[4]", shuffle_partitions=4)
    root = Path(tempfile.mkdtemp(prefix="cdc_demo_"))
    changes_dir = root / "changes"
    changes_dir.mkdir()

    def arrive(rows: list, fname: str) -> None:
        stage = root / "stage" / fname
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(str(stage))
        for f in stage.glob("*.parquet"):
            shutil.copy(f, changes_dir / f"{fname}.parquet")
        time.sleep(1.1)  # the file source orders micro-batches by mtime

    sink = ParquetCdcSink(spark, root / "snapshot", ["id"], "seq")

    def cycle(label: str) -> None:
        stream = stream_from_directory(
            spark, changes_dir, spark.createDataFrame([], SCHEMA).schema,
            max_files_per_trigger=1,
        )
        q = foreach_batch_cdc(stream, sink, root / "ckpt")
        assert q.awaitTermination(120), "cycle did not drain"
        print(f"--- snapshot after {label} ---")
        spark.read.parquet(str(root / "snapshot")).orderBy("id").show()

    arrive([(1, "widget", 9.99, 1, "I"), (2, "gadget", 19.99, 1, "I")], "c1")
    cycle("initial load")

    arrive([(1, "widget-v3", 12.49, 3, "U"), (3, "doohickey", 5.00, 1, "I")], "c2")
    arrive(
        [(1, "widget-STALE", 10.00, 2, "U"),   # loses: seq 2 < stored 3
         (2, None, None, 9, "D")],             # delete
        "c3",
    )
    cycle("updates + stale straggler + delete")

    final = {r["id"]: (r["name"], r["seq"])
             for r in spark.read.parquet(str(root / "snapshot")).collect()}
    assert final == {1: ("widget-v3", 3), 3: ("doohickey", 1)}, final
    print("converged:", final)
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
