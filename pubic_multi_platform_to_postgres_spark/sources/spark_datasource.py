"""A real Spark data source for REST extraction: ``spark.read.format(
"singer_rest")`` (PySpark 4 Python DataSource API).

This is the DataSource-V2-style completion of ``sources/rest.py``: the
same pagination scans (S1–S7), but planned and executed BY Spark —
one :class:`InputPartition` per *extraction unit* (tenant, form id,
window, or stream shard), fetched executor-side in parallel. That is
exactly the parallelism structure the reference reaches for with
``asyncio.gather`` across streams (O2, ``internal.py:127-164``), now
expressed as Spark task parallelism: 100 units → 100 concurrent tasks
under normal scheduling, straight into downstream DataFrame operators
with no driver materialization.

Options (all strings, per the DataSource contract):

- ``scan``: ``cursor`` | ``token`` | ``numbered`` | ``full``
- ``path``: resource path; ``{unit}`` is substituted per unit
- ``units``: JSON list of unit keys (one InputPartition each; default
  one unnamed unit)
- ``unit_field``: optional column to stamp the unit key into (tenant
  enrichment P6 / form-key threading U4)
- ``page_size``, ``results_key``/``data_key``: per-scan knobs
- ``base_url``: live HTTP via the stdlib transport, OR
- ``fixture``: JSON dict of canned responses (tests / replay) —
  ``{url: response}`` or ``{url: [page0, page1, ...]}`` consumed in
  request order

Schema: pass with ``.schema(ddl)``; fields are projected out of the raw
JSON rows by name (P4 schema-projection at the source — unknown keys
dropped, missing keys NULL), so the source emits exactly the declared
columns.

Bookmarks ride in as an option too (``params_json``) — server-side
incremental pushdown (F1/F2) stays a source concern, as in the
reference.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from dataclasses import dataclass
from typing import Any

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from pubic_multi_platform_to_postgres_spark.sources.rest import (
    Fetcher,
    RetryPolicy,
    UrllibTransport,
    scan_cursor,
    scan_full,
    scan_numbered,
    scan_token,
)


class CannedTransport:
    """Replay transport: serves pre-recorded responses (picklable, so it
    ships to executors). ``{url: [resp, resp, ...]}`` lists are consumed
    in request order — enough to script pagination."""

    def __init__(self, fixture: dict[str, Any]) -> None:
        self.fixture = fixture
        self._consumed: dict[str, int] = {}

    def get(self, url, params=None, headers=None):
        resp = self.fixture[url]
        if isinstance(resp, list):
            i = self._consumed.get(url, 0)
            self._consumed[url] = min(i + 1, len(resp) - 1)
            return resp[i]
        return resp

    def post(self, url, data=None, headers=None):  # pragma: no cover
        return self.get(url, data)


@dataclass
class _UnitPartition(InputPartition):
    unit: str | None


class RestReader(DataSourceReader):
    def __init__(self, schema, options) -> None:
        self.schema = schema
        self.options = options
        self.field_names = [f.name for f in schema.fields]

    def partitions(self):
        units = json.loads(self.options.get("units", "null"))
        if not units:
            return [_UnitPartition(None)]
        return [_UnitPartition(str(u)) for u in units]

    def _fetcher(self) -> Fetcher:
        fixture = self.options.get("fixture")
        if fixture:
            transport = CannedTransport(json.loads(fixture))
            retry = RetryPolicy(attempts=1, sleep=lambda s: None)
            return Fetcher(transport=transport, retry=retry)
        return Fetcher(
            transport=UrllibTransport(),
            base_url=self.options.get("base_url", ""),
        )

    def read(self, partition: _UnitPartition) -> Iterator[tuple]:
        fetcher = self._fetcher()
        scan = self.options.get("scan", "full")
        path = self.options.get("path", "")
        if partition.unit is not None:
            path = path.replace("{unit}", partition.unit)
        params = json.loads(self.options.get("params_json", "{}"))
        page_size = int(self.options.get("page_size", "100"))

        if scan == "cursor":
            rows = scan_cursor(
                fetcher, path, page_size, params,
                results_key=self.options.get("results_key", "results"),
            )
        elif scan == "token":
            rows = scan_token(
                fetcher, path, page_size, params,
                data_key=self.options.get("data_key", "data"),
            )
        elif scan == "numbered":
            rows = scan_numbered(
                fetcher, path, params,
                results_key=self.options.get("results_key"),
            )
        elif scan == "full":
            rows = scan_full(
                fetcher, path, params, data_key=self.options.get("data_key", "data")
            )
        else:
            raise ValueError(f"unknown scan style: {scan}")

        unit_field = self.options.get("unit_field")
        for row in rows:
            if unit_field:
                row = {**row, unit_field: partition.unit}
            # P4 schema projection at the source: declared fields only,
            # missing -> NULL
            yield tuple(row.get(name) for name in self.field_names)


class RestStreamReader(SimpleDataSourceStreamReader):
    """Streaming REST source: the Singer bookmark IS the stream offset.

    Each micro-batch fetches rows with ``replication_key`` strictly newer
    than the previous offset (the reference's F3 contract: ISO strings at
    equal precision compare lexicographically), and the new offset is the
    max observed key — persisted by Spark's checkpoint instead of a
    ``state_{system}.json`` file (K3's streaming analog, SURVEY §1.3).
    ``readBetweenOffsets`` replays a committed range deterministically
    from the recorded bounds, which is what makes the source recoverable.
    """

    def __init__(self, schema, options) -> None:
        self.schema = schema
        self.options = options
        self.field_names = [f.name for f in schema.fields]
        self.replication_key = options.get("replication_key", "updatedAt")
        self._batch_reader = RestReader(schema, options)

    def initialOffset(self) -> dict:
        return {"bookmark": self.options.get("start_bookmark", "")}

    def _fetch_all(self) -> list[tuple]:
        rows: list[tuple] = []
        for part in self._batch_reader.partitions():
            rows.extend(self._batch_reader.read(part))
        return rows

    def read(self, start: dict):
        bm = start.get("bookmark", "")
        rk_idx = self.field_names.index(self.replication_key)
        fresh = [
            r for r in self._fetch_all()
            if r[rk_idx] is not None and str(r[rk_idx]) > bm
        ]
        new_bm = max((str(r[rk_idx]) for r in fresh), default=bm)
        return iter(fresh), {"bookmark": new_bm}

    def readBetweenOffsets(self, start: dict, end: dict):
        lo, hi = start.get("bookmark", ""), end.get("bookmark", "")
        rk_idx = self.field_names.index(self.replication_key)
        return iter(
            [
                r for r in self._fetch_all()
                if r[rk_idx] is not None and lo < str(r[rk_idx]) <= hi
            ]
        )

    def commit(self, end: dict) -> None:  # offsets live in the checkpoint
        pass


class RestDataSource(DataSource):
    """``spark.read.format("singer_rest")`` / ``spark.readStream.format(
    "singer_rest")`` — register with
    ``spark.dataSource.register(RestDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "singer_rest"

    def schema(self):
        ddl = self.options.get("schema_ddl")
        if not ddl:
            raise ValueError("singer_rest requires .schema(...) or schema_ddl option")
        return ddl

    def reader(self, schema) -> RestReader:
        return RestReader(schema, self.options)

    def simpleStreamReader(self, schema) -> RestStreamReader:
        return RestStreamReader(schema, self.options)
