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
    """One cell → its Singer wire value (reference date formats).

    RECURSIVE: the JSON-Schema dialect supports nested objects/arrays,
    and ``row.asDict(recursive=True)`` surfaces them as dicts/lists
    whose leaf datetimes/dates/NaN would otherwise reach ``json.dumps``
    unconverted — a ``TypeError`` for datetimes, invalid JSON for
    NaN/Inf (ADVICE r7)."""
    if isinstance(v, dict):
        return {k: _json_value(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_json_value(x) for x in v]
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


class SingerProtocolError(ValueError):
    """A message stream violated the Singer specification."""


class SingerTarget:
    """Minimal spec-validating Singer TARGET — the consumer half of the
    interop claim (the reference pipes tap stdout → target stdin,
    ``runner/__init__.py:152-155``; this is the smallest conforming
    stand-in for ``pipelinewise-target-postgres``). Feed it JSONL lines
    (e.g. straight from :func:`emit_stream`); it enforces, per the spec
    and the reference's conventions:

    - every line is a JSON object with a known ``type``
      (SCHEMA/RECORD/STATE);
    - SCHEMA arrives BEFORE any RECORD of its stream, carries an
      object-typed ``schema`` and a ``key_properties`` list naming only
      declared properties;
    - RECORD carries only declared properties
      (``additionalProperties: false``) with every key property present
      and non-null;
    - STATE replaces the current bookmark value (last one wins — the
      reference emits state last).

    Landed rows accumulate per stream in :attr:`records` (wire-format
    values); :meth:`typed_records` converts them back to Python values
    through the SAME JSON-Schema the message declared (date-time →
    datetime, date → date), so tests can round-trip emitter output
    against the original DataFrame value-for-value.
    """

    def __init__(self) -> None:
        self.schemas: dict[str, dict[str, Any]] = {}
        self.key_properties: dict[str, list[str]] = {}
        self.records: dict[str, list[dict[str, Any]]] = {}
        self.state: dict[str, Any] | None = None
        self.counts = {"SCHEMA": 0, "RECORD": 0, "STATE": 0}

    def consume(self, lines) -> "SingerTarget":
        for n, line in enumerate(lines, start=1):
            try:
                msg = json.loads(line)
            except json.JSONDecodeError as exc:
                raise SingerProtocolError(f"line {n}: invalid JSON: {exc}") from exc
            if not isinstance(msg, dict) or "type" not in msg:
                raise SingerProtocolError(f"line {n}: not a Singer envelope")
            mtype = msg["type"]
            if mtype == "SCHEMA":
                self._on_schema(n, msg)
            elif mtype == "RECORD":
                self._on_record(n, msg)
            elif mtype == "STATE":
                if "value" not in msg:
                    raise SingerProtocolError(f"line {n}: STATE without value")
                self.state = msg["value"]
            else:
                raise SingerProtocolError(f"line {n}: unknown type {mtype!r}")
            self.counts[mtype] += 1
        return self

    def _on_schema(self, n: int, msg: dict[str, Any]) -> None:
        stream = msg.get("stream")
        schema = msg.get("schema")
        keys = msg.get("key_properties")
        if not stream or not isinstance(schema, dict):
            raise SingerProtocolError(f"line {n}: malformed SCHEMA")
        if schema.get("type") not in ("object", ["null", "object"]):
            raise SingerProtocolError(f"line {n}: SCHEMA not an object schema")
        props = schema.get("properties", {})
        if not isinstance(keys, list) or any(k not in props for k in keys):
            raise SingerProtocolError(
                f"line {n}: key_properties {keys!r} not all declared in schema"
            )
        self.schemas[stream] = schema
        self.key_properties[stream] = list(keys)
        self.records.setdefault(stream, [])

    def _on_record(self, n: int, msg: dict[str, Any]) -> None:
        stream = msg.get("stream")
        if stream not in self.schemas:
            raise SingerProtocolError(
                f"line {n}: RECORD for {stream!r} before its SCHEMA"
            )
        rec = msg.get("record")
        if not isinstance(rec, dict):
            raise SingerProtocolError(f"line {n}: RECORD without record object")
        props = self.schemas[stream].get("properties", {})
        extra = set(rec) - set(props)
        if extra:
            raise SingerProtocolError(
                f"line {n}: undeclared properties {sorted(extra)} "
                f"(additionalProperties is false)"
            )
        for k in self.key_properties[stream]:
            if rec.get(k) is None:
                raise SingerProtocolError(f"line {n}: null/missing key property {k!r}")
        self.records[stream].append(rec)

    def typed_records(self, stream: str) -> list[dict[str, Any]]:
        """Landed rows with wire strings parsed back through the
        declared JSON-Schema (the inverse of :func:`_json_value`)."""
        props = self.schemas[stream].get("properties", {})
        return [
            {k: _from_wire(v, props.get(k, {})) for k, v in rec.items()}
            for rec in self.records[stream]
        ]


def _from_wire(v: Any, prop: dict[str, Any]) -> Any:
    """One wire value → Python, guided by its JSON-Schema node."""
    if v is None:
        return None
    decl = prop.get("type", "string")
    if isinstance(decl, list):
        decl = next((t for t in decl if t != "null"), "string")
    if decl == "object":
        sub = prop.get("properties", {})
        return {k: _from_wire(x, sub.get(k, {})) for k, x in v.items()}
    if decl == "array":
        return [_from_wire(x, prop.get("items", {})) for x in v]
    fmt = prop.get("format")
    if fmt == "date-time":
        return datetime.datetime.strptime(v, "%Y-%m-%dT%H:%M:%S.%fZ")
    if fmt == "date":
        return datetime.date.fromisoformat(v)
    return v


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
