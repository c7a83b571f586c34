"""Singer message emitter (K1) — the interop EGRESS face.

The reference's pipelines speak the Singer specification on stdout:
``SCHEMA`` (table DDL intent + key properties, ``internal.py:141-159``),
``RECORD`` (one row, schema-projected, ``tap_wrike/utility.py:275-284``),
and ``STATE`` (bookmark map, ``internal.py:125,170``), consumed by any
Singer target (the reference pins ``pipelinewise-target-postgres``).
In-engine those hops are typed DataFrames + ``BookmarkManager``
(SURVEY.md §2.5) — the message layer adds nothing between two Spark
stages. What it DOES buy is interop: a user migrating from the
reference can still feed any existing Singer target. This module is
that adapter — it serializes a landed DataFrame back into spec-shaped
Singer JSONL.

Design notes:

- **Driver-side by protocol.** Singer is a single ordered stdout pipe;
  emission is inherently a driver egress stream, not a distributed
  compute path. Records stream through ``toLocalIterator()`` (one
  partition in driver memory at a time — never a full ``collect()``);
  the engine's scale path remains the parquet/JDBC upsert sink.
- **Schema projection (P4)** is applied exactly like the reference's
  ``write_record``: only keys present in the stream schema are emitted.
- **Timestamps/dates** serialize to the reference's wire format:
  ISO-8601 with milliseconds + ``Z`` for instants (``format_date``,
  ``tap_wrike/utility.py:242-245``), ``YYYY-MM-DD`` for dates.
- **SCHEMA messages** carry the stream's JSON-Schema in the reference's
  dialect via ``plans.jsonschema.to_json_schema`` (round-trip-pinned),
  so a Singer target creates the same table the reference's would.
"""

from __future__ import annotations

import datetime
import json
import math
from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame

from pubic_multi_platform_to_postgres_spark.plans.catalog import Stream
from pubic_multi_platform_to_postgres_spark.plans.jsonschema import to_json_schema


def _json_value(v: Any) -> Any:
    """One cell → its Singer wire value (reference date formats)."""
    if isinstance(v, datetime.datetime):
        # format_date parity: ms precision + 'Z' (naive values are UTC
        # instants by the engine's session contract)
        return v.strftime("%Y-%m-%dT%H:%M:%S.") + f"{v.microsecond // 1000:03d}Z"
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, float) and not math.isfinite(v):
        return None  # JSON has no NaN/Inf; Singer targets reject them
    return v


def schema_message(stream: Stream) -> dict[str, Any]:
    """``SCHEMA`` envelope (``singer.write_schema`` shape)."""
    return {
        "type": "SCHEMA",
        "stream": stream.name,
        "schema": to_json_schema(stream.schema),
        "key_properties": list(stream.key_properties),
    }


def record_message(stream_name: str, row: dict[str, Any], keep: set[str]) -> dict[str, Any]:
    """``RECORD`` envelope with the reference's projection rule: keys
    outside the schema are silently dropped (``write_record``)."""
    return {
        "type": "RECORD",
        "stream": stream_name,
        "record": {k: _json_value(v) for k, v in row.items() if k in keep},
    }


def state_message(bookmarks: dict[str, Any]) -> dict[str, Any]:
    """``STATE`` envelope (``singer.write_state`` shape)."""
    return {"type": "STATE", "value": dict(bookmarks)}


def emit_stream(
    df: DataFrame,
    stream: Stream,
    bookmarks: dict[str, Any] | None = None,
) -> Iterator[str]:
    """Serialize one stream to Singer JSONL lines: SCHEMA, then every
    row as a RECORD (schema-projected, wire-formatted), then — when
    bookmarks are given — a final STATE, mirroring the reference's
    message order (schema first, state last;
    ``internal.py:141,155-159,170``). Rows stream through
    ``toLocalIterator()``; peak driver memory is one partition."""
    keep = {f.name for f in stream.schema.fields}
    yield json.dumps(schema_message(stream), separators=(",", ":"))
    for row in df.toLocalIterator():
        yield json.dumps(
            record_message(stream.name, row.asDict(recursive=True), keep),
            separators=(",", ":"),
        )
    if bookmarks is not None:
        yield json.dumps(state_message(bookmarks), separators=(",", ":"))
