"""Stream catalog: the engine's analog of Singer discovery + selection.

The reference builds a catalog of ``{stream, schema, metadata,
key_properties}`` from its schema files (``tap_wrike/internal.py:66-84``),
marks per-stream primary keys from a static ``ID_COLUMNS`` map
(``tap_*/config.py``), replication keys from ``INCREMENTAL_FIELDS``
(``tap_wrike/utility.py:19-23``), parent→child stream links from
``SUB_STREAMS`` (``tap_wrike/config.py:12``, ``tap_hubspot/config.py:24-28``,
``tap_xero/config.py:9-12``), and syncs only streams marked ``selected``
(``internal.py:93-110``, patched from the ``select:`` list in ``config.yml``).

Here a :class:`Stream` carries the same contract as typed metadata over a
compiled ``StructType``; a :class:`Catalog` is the registry the extraction
layer and sinks consult. ``discover()`` mirrors ``--discover`` (S8): it
lists every registered stream with its schema and metadata.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import types as T

from pubic_multi_platform_to_postgres_spark.plans.jsonschema import compile_schema


@dataclass
class Stream:
    """One extractable stream ↦ one landed table."""

    name: str
    schema: T.StructType
    key_properties: list[str] = field(default_factory=list)
    replication_key: str | None = None
    selected: bool = False
    parent: str | None = None  # set on child (sub-)streams
    source: str | None = None  # owning source system, e.g. "wrike"

    @property
    def is_incremental(self) -> bool:
        return self.replication_key is not None

    def columns(self) -> list[str]:
        return [f.name for f in self.schema.fields]


class Catalog:
    """Registry of streams for one source system (or the whole engine)."""

    def __init__(self) -> None:
        self._streams: dict[str, Stream] = {}
        self._children: dict[str, list[str]] = {}

    def register(self, stream: Stream) -> Stream:
        if stream.name in self._streams:
            raise ValueError(f"duplicate stream: {stream.name}")
        self._streams[stream.name] = stream
        if stream.parent:
            self._children.setdefault(stream.parent, []).append(stream.name)
        return stream

    def register_json_schema(
        self,
        name: str,
        json_schema: dict[str, Any],
        key_properties: list[str] | None = None,
        replication_key: str | None = None,
        parent: str | None = None,
        source: str | None = None,
    ) -> Stream:
        """Register from the reference's JSON-Schema dialect (schemas/*.json)."""
        return self.register(
            Stream(
                name=name,
                schema=compile_schema(json_schema),
                key_properties=key_properties or [],
                replication_key=replication_key,
                parent=parent,
                source=source,
            )
        )

    def select(self, names: list[str]) -> None:
        """Patch ``selected`` like the runner's catalog edit
        (``runner/__init__.py:283-295``). Unknown names raise."""
        for n in names:
            self._streams[n].selected = True

    def get(self, name: str) -> Stream:
        return self._streams[name]

    def __contains__(self, name: str) -> bool:
        return name in self._streams

    def children(self, name: str) -> list[Stream]:
        """Child (sub-)streams of a parent stream (SUB_STREAMS analog)."""
        return [self._streams[c] for c in self._children.get(name, [])]

    def streams(self, selected_only: bool = False) -> list[Stream]:
        out = list(self._streams.values())
        return [s for s in out if s.selected] if selected_only else out

    def discover(self) -> list[dict[str, Any]]:
        """Catalog listing (the ``--discover`` / S8 analog): one entry per
        stream with schema + metadata, shaped like the reference's catalog
        (``internal.py:66-84``) minus the Singer envelope."""
        return [
            {
                "stream": s.name,
                "tap_stream_id": s.name,
                "schema": s.schema.jsonValue(),
                "key_properties": s.key_properties,
                "replication_key": s.replication_key,
                "selected": s.selected,
                "parent": s.parent,
                "source": s.source,
            }
            for s in self._streams.values()
        ]
