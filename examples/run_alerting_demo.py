#!/usr/bin/env python
"""Anomaly-alerting demo: the metrics-pipeline shape end to end.

    python examples/run_alerting_demo.py

1. A per-user event stream with planted spikes lands as time-ordered
   parquet files.
2. BATCH pass: `ts_ewma_anomaly`'s operator (one keyed window, 16 lags,
   zero UDFs) flags every event worth >2x its own EWMA baseline; the
   rolling MEDIAN face shows the robust baseline shrugging off the very
   spike the mean-based EWMA flags.
3. STREAMING pass: the same detection via `applyInPandasWithState`
   (state = last-16 values per key) over micro-batches; alerts stream
   out with bounded latency and their union equals the batch answer
   bit-for-bit.
"""

from __future__ import annotations

import datetime as dt
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

import pandas as pd  # noqa: E402

from pubic_multi_platform_to_postgres_spark.operators.timeseries import (  # noqa: E402
    ewma_anomaly,
)
from pubic_multi_platform_to_postgres_spark.operators.upsert import (  # noqa: E402
    ParquetUpsertSink,
)
from pubic_multi_platform_to_postgres_spark.session import get_session  # noqa: E402
from pubic_multi_platform_to_postgres_spark.streaming.runner import (  # noqa: E402
    run_available_now_cycle,
    stream_from_directory,
)
from pubic_multi_platform_to_postgres_spark.streaming.stateful import (  # noqa: E402
    apply_ewma_alerts,
)


def make_events() -> pd.DataFrame:
    """3 users × 40 minutes of calm ~10.0 traffic with planted spikes."""
    base = dt.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for user in (1, 2, 3):
        for minute in range(40):
            value = 10.0 + (eid % 7) * 0.5  # calm, slightly varying
            if user == 2 and minute in (25, 26):
                value = 95.0  # a two-event incident
            if user == 3 and minute == 38:
                value = 60.0  # a late single spike
            rows.append(
                (eid, base + dt.timedelta(minutes=minute), user,
                 "metric", value, "{}")
            )
            eid += 1
    return pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type",
                       "value", "props"]
    )


def main() -> None:
    spark = get_session(
        app_name="alerting_demo", master="local[4]", shuffle_partitions=4
    )
    root = Path(tempfile.mkdtemp(prefix="alerting_demo_"))
    try:
        pdf = make_events()

        # ---- batch detection -------------------------------------------
        events = spark.createDataFrame(pdf)
        alerts = ewma_anomaly(
            events, "user_id", ["ts", "event_id"], "value"
        ).orderBy("event_id")
        print("== batch EWMA alerts (value > 2x own baseline) ==")
        got = alerts.collect()
        for r in got:
            print(f"  user {r['user_id']}  event {r['event_id']}  "
                  f"value {r['value']:6.1f}  baseline {r['ewma']:5.2f}")
        users_flagged = sorted({r["user_id"] for r in got})
        assert users_flagged == [2, 3], users_flagged

        # ---- streaming: same detection, stateful, micro-batched --------
        src = root / "stream_src"
        # chunks written by Spark (pandas' to_parquet emits INT64-nanos
        # ts, which the streaming schema rejects) in per-key event-time
        # order across files — the arrival contract the operator states
        lo, hi = pdf["ts"].min(), pdf["ts"].max()
        cuts = [lo + (hi - lo) / 3, lo + 2 * (hi - lo) / 3]
        from pyspark.sql import functions as F

        chunks = (
            events.filter(F.col("ts") <= F.lit(cuts[0])),
            events.filter(
                (F.col("ts") > F.lit(cuts[0])) & (F.col("ts") <= F.lit(cuts[1]))
            ),
            events.filter(F.col("ts") > F.lit(cuts[1])),
        )
        for chunk in chunks:
            chunk.coalesce(1).write.mode("append").parquet(str(src))
            time.sleep(1.1)  # distinct mtimes -> deterministic order

        stream = stream_from_directory(
            spark, src, events.schema, max_files_per_trigger=1
        )
        sink = ParquetUpsertSink(spark, root / "alerts", keys=["event_id"])
        run_available_now_cycle(
            apply_ewma_alerts(stream), sink, root / "ckpt"
        )
        streamed = spark.read.parquet(str(root / "alerts"))
        s_rows = {(r["event_id"], r["ewma"]) for r in streamed.collect()}
        b_rows = {(r["event_id"], r["ewma"]) for r in got}
        assert s_rows == b_rows, "streamed alerts must bit-equal batch"
        print(f"== streaming pass: {len(s_rows)} alerts across 3 "
              f"micro-batches — bit-identical to batch ==")
        print("demo OK")
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
