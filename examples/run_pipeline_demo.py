#!/usr/bin/env python
"""End-to-end demo: what `./run.sh` does in the reference, Spark-first.

One cycle of the full replacement workflow, runnable standalone:

    python examples/run_pipeline_demo.py

1. "Extract" Wrike-shaped task records from a canned API (swap the canned
   transport for `UrllibTransport` + real credentials in production).
2. Sync them through the pipeline: flatten (dash-joined names), schema
   projection, keyed upsert into a parquet lake, run-start bookmarks.
3. Materialize the reference's dbt view models (proposal/quote durations)
   over the landed table.
4. Query the views; re-run the cycle to show idempotency.
"""

from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

from pubic_multi_platform_to_postgres_spark.operators.flatten import flatten  # noqa: E402
from pubic_multi_platform_to_postgres_spark.plans.catalog import Catalog
from pubic_multi_platform_to_postgres_spark.plans.views import reference_models
from pubic_multi_platform_to_postgres_spark.session import get_session
from pubic_multi_platform_to_postgres_spark.sources.pipeline import Pipeline, StreamSpec

TASKS_SCHEMA = {
    "type": "object",
    "additionalProperties": False,
    "properties": {
        "id": {"type": "string"},
        "title": {"type": ["null", "string"]},
        "status": {"type": ["null", "string"]},
        "createddate": {"type": ["null", "string"], "format": "date-time"},
        "updateddate": {"type": ["null", "string"], "format": "date-time"},
        "completeddate": {"type": ["null", "string"], "format": "date-time"},
    },
}

RAW_API_TASKS = [
    {
        "id": "T1",
        "title": "Write proposal for Acme",
        "status": "Completed",
        "dates": {"created": "2026-01-01T09:00:00", "completed": "2026-01-03T15:00:00"},
    },
    {
        "id": "T2",
        "title": "Quote for Globex renewal",
        "status": "Completed",
        "dates": {"created": "2026-01-05T08:00:00", "completed": "2026-01-05T20:00:00"},
    },
    {
        "id": "T3",
        "title": "Internal sync",
        "status": "Active",
        "dates": {"created": "2026-01-06T10:00:00", "completed": None},
    },
]


def main() -> None:
    spark = get_session(app_name="pipeline_demo", master="local[4]", shuffle_partitions=4)
    lake = Path(tempfile.mkdtemp(prefix="spark_graft_demo_"))

    catalog = Catalog()
    catalog.register_json_schema(
        "tasks", TASKS_SCHEMA, key_properties=["id"],
        replication_key="updateddate", source="wrike",
    )

    def transform(df):
        if "dates" not in df.columns:
            return {"tasks": df}
        flat = flatten(df)  # dates.created -> `dates-created`, ...
        from pyspark.sql import functions as F

        # land typed timestamps, as the reference's target-postgres would
        return {
            "tasks": flat.select(
                "id", "title", "status",
                F.col("dates-created").cast("timestamp").alias("createddate"),
                F.col("dates-created").cast("timestamp").alias("updateddate"),
                F.col("dates-completed").cast("timestamp").alias("completeddate"),
            )
        }

    pipe = Pipeline(
        "wrike", catalog,
        [StreamSpec(catalog.get("tasks"), lambda bm: RAW_API_TASKS, transform)],
        lake,
    )

    for cycle in (1, 2):  # second cycle shows upsert idempotency
        reports = pipe.run(spark)
        print(f"cycle {cycle}:", [(r.stream, r.tables, r.ok) for r in reports])

    landed = spark.read.parquet(str(lake / "tasks"))
    landed.createOrReplaceTempView("tasks")
    built = reference_models().materialize(spark)
    print("views built:", built)

    for view in ("proposal_durations", "quote_durations"):
        rows = spark.sql(f"SELECT id, title, duration_in_days FROM {view}").collect()
        print(view, "->", [(r["id"], r["duration_in_days"]) for r in rows])

    state = json.loads((lake / "state_wrike.json").read_text())
    print("bookmarks:", state["value"])

    assert landed.count() == 3
    p = spark.table("proposal_durations").collect()
    q = spark.table("quote_durations").collect()
    assert [r["id"] for r in p] == ["T1"] and float(p[0]["duration_in_days"]) == 2.25
    assert [r["id"] for r in q] == ["T2"] and float(q[0]["duration_in_days"]) == 0.5
    print("demo OK")


if __name__ == "__main__":
    main()
