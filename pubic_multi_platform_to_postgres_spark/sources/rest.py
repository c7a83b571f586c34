"""REST extraction layer: transports, throttling, and pagination scans.

Implements the reference's extraction operators S1–S7 (SURVEY.md §2.1) as
transport-agnostic *driver-side* generators. Design stance:

- The fetch layer yields **raw JSON rows only** — every transformation
  (flatten, unnest, key synthesis, projection) happens Spark-side on the
  DataFrame, where it is columnar and optimizable. The reference instead
  interleaves transforms into its row loop (``tap_hubspot/utility.py:99``);
  we deliberately do not.
- Page cursors are inherently sequential, so scale comes from running
  *streams / tenants / forms / windows* concurrently (reference O2,
  ``internal.py:127-164``), not pages — see ``sources/pipeline.py``.
- ``Transport`` is a two-method protocol so tests inject canned responses
  and production wires the stdlib ``urllib`` client (no extra deps).

Reference parity notes per scan are in each generator's docstring.
"""

from __future__ import annotations

import json
import time
import urllib.parse
import urllib.request
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field
from datetime import datetime
from typing import Any, Protocol

Row = dict[str, Any]


class Transport(Protocol):
    """Minimal HTTP surface the extraction layer needs."""

    def get(
        self,
        url: str,
        params: dict[str, Any] | None = None,
        headers: dict[str, str] | None = None,
    ) -> Any: ...

    def post(
        self,
        url: str,
        data: dict[str, Any] | None = None,
        headers: dict[str, str] | None = None,
    ) -> Any: ...


class UrllibTransport:
    """Stdlib JSON-over-HTTP transport (no third-party HTTP deps).

    30 s total timeout mirrors ``aiohttp.ClientTimeout(total=30)``
    (``tap_wrike/__init__.py:18``).
    """

    def __init__(self, timeout: float = 30.0) -> None:
        self.timeout = timeout

    def get(self, url, params=None, headers=None):
        if params:
            url = f"{url}?{urllib.parse.urlencode(params)}"
        req = urllib.request.Request(url, headers=headers or {})
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:  # noqa: S310
            return json.loads(resp.read().decode("utf-8"))

    def post(self, url, data=None, headers=None):
        body = urllib.parse.urlencode(data or {}).encode("utf-8")
        req = urllib.request.Request(url, data=body, headers=headers or {})
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:  # noqa: S310
            return json.loads(resp.read().decode("utf-8"))


class RecordedTransport:
    """Replay transport: serves canned JSON responses per path, FIFO.

    The offline face of the extraction layer (the VCR/cassette pattern):
    a recording maps each path to the ordered list of page payloads a
    live API returned; each ``get`` pops the next one, so every
    pagination scan (S1–S7) walks a recorded session exactly as it
    walked the live one. Used by the ``elt_end_to_end_land`` gate query
    to drive the REAL scan → flatten/unnest → upsert pipeline without a
    network, and by integration tests. A path with an exhausted (or
    missing) recording raises ``KeyError`` — a scan requesting more
    pages than were recorded is a pagination bug, not an empty page.
    """

    def __init__(self, recording: dict[str, list[Any]]) -> None:
        self._pages = {path: list(pages) for path, pages in recording.items()}
        self.calls: list[tuple[str, dict[str, Any] | None]] = []

    def get(self, url, params=None, headers=None):
        self.calls.append((url, dict(params) if params else None))
        pages = self._pages.get(url)
        if not pages:
            raise KeyError(f"RecordedTransport: no recorded page left for {url!r}")
        return pages.pop(0)

    def post(self, url, data=None, headers=None):
        return self.get(url, data, headers)


class RateLimiter:
    """Token-bucket throttle, default 1.2 req/s (reference O3: identical
    class in all three taps, ``tap_wrike/utility.py:211-239``)."""

    def __init__(
        self,
        rate: float = 1.2,
        capacity: float = 1.0,
        clock: Callable[[], float] = time.monotonic,
        sleep: Callable[[float], None] = time.sleep,
    ) -> None:
        self.rate = rate
        self.capacity = capacity
        self._tokens = capacity
        self._clock = clock
        self._sleep = sleep
        self._last = clock()

    def acquire(self) -> None:
        while True:
            now = self._clock()
            self._tokens = min(self.capacity, self._tokens + (now - self._last) * self.rate)
            self._last = now
            if self._tokens >= 1.0:
                self._tokens -= 1.0
                return
            self._sleep((1.0 - self._tokens) / self.rate)


@dataclass
class RetryPolicy:
    """Exponential backoff: 5 attempts, wait 1–10 s doubling (reference O4,
    tenacity ``stop_after_attempt(5)`` + ``wait_exponential(1..10)``,
    ``tap_xero/utility.py:25-29``)."""

    attempts: int = 5
    wait_initial: float = 1.0
    wait_max: float = 10.0
    sleep: Callable[[float], None] = field(default=time.sleep)

    def call(self, fn: Callable[[], Any]) -> Any:
        wait = self.wait_initial
        for attempt in range(1, self.attempts + 1):
            try:
                return fn()
            except Exception:
                if attempt == self.attempts:
                    raise
                self.sleep(wait)
                wait = min(wait * 2, self.wait_max)


@dataclass
class Fetcher:
    """Throttled + retried GET against one API base URL."""

    transport: Transport
    base_url: str = ""
    headers: dict[str, str] = field(default_factory=dict)
    limiter: RateLimiter | None = None
    retry: RetryPolicy = field(default_factory=RetryPolicy)

    def get(self, path: str, params: dict[str, Any] | None = None,
            extra_headers: dict[str, str] | None = None) -> Any:
        if self.limiter is not None:
            self.limiter.acquire()
        url = f"{self.base_url}{path}" if self.base_url else path
        headers = {**self.headers, **(extra_headers or {})}
        return self.retry.call(lambda: self.transport.get(url, params, headers))


# ---------------------------------------------------------------------------
# Pagination scans S1–S7 — each yields raw JSON rows


def scan_cursor(
    fetcher: Fetcher,
    path: str,
    page_size: int = 100,
    params: dict[str, Any] | None = None,
    results_key: str = "results",
    cursor_param: str = "after",
) -> Iterator[Row]:
    """S1 — cursor pagination (HubSpot ``crm/v3`` style): follow
    ``paging.next.after`` until absent (``tap_hubspot/utility.py:75-106``).

    Column/association pushdown: the reference asks the API for only the
    configured ``properties``/``associations`` (projection pushdown to the
    source, §4) — callers pass them via ``params``.
    """
    query: dict[str, Any] = {**(params or {}), "limit": page_size}
    after: str | None = None
    while True:
        if after is not None:
            query[cursor_param] = after
        page = fetcher.get(path, query)
        yield from page.get(results_key, [])
        after = page.get("paging", {}).get("next", {}).get("after")
        if not after:
            break


def scan_token(
    fetcher: Fetcher,
    path: str,
    page_size: int = 1000,
    params: dict[str, Any] | None = None,
    data_key: str = "data",
) -> Iterator[Row]:
    """S2 — token pagination (Wrike ``api/v4`` style): loop on
    ``nextPageToken``; stop when the token is absent **or**
    ``responseSize == 0`` (``tap_wrike/utility.py:108-143``)."""
    base: dict[str, Any] = {**(params or {}), "pageSize": page_size}
    token: str | None = None
    while True:
        query = dict(base)
        if token:
            query["nextPageToken"] = token
        page = fetcher.get(path, query)
        yield from page.get(data_key, [])
        token = page.get("nextPageToken")
        if not token or page.get("responseSize") == 0:
            break


def scan_numbered(
    fetcher: Fetcher,
    path: str,
    params: dict[str, Any] | None = None,
    headers: dict[str, str] | None = None,
    results_key: str | None = None,
) -> Iterator[Row]:
    """S3 — page-number pagination (Xero style): fetch page 1, read
    ``pagination.pageCount``, then fetch every page.

    Fidelity note (SURVEY §2.1 S3): the reference fetches page 1, drops its
    records, and yields only pages ≥ 2 (``tap_xero/utility.py:89-102``) —
    single-page resources yield nothing. We implement the evident intent
    and yield **all** pages, page 1 included, without refetching it.
    """
    key = results_key if results_key is not None else path.title()
    first = fetcher.get(path, {**(params or {}), "page": 1}, headers)
    yield from first.get(key, [])
    total = first.get("pagination", {}).get("pageCount", 1) or 1
    for page_no in range(2, total + 1):
        page = fetcher.get(path, {**(params or {}), "page": page_no}, headers)
        yield from page.get(key, [])


def year_windows(start: str, final: datetime) -> Iterator[tuple[str, str]]:
    """S4 helper — 1-year ``[DateFrom, DateTo)`` windows from ``start``
    (reference ``INITIAL_START_DATE = 2021-01-01``) up to ``final``
    (next-April-1, ``compute_final_date``, ``tap_xero/utility.py:196-198``)."""
    cur = datetime.strptime(start, "%Y-%m-%d")
    while cur < final:
        try:
            nxt = cur.replace(year=cur.year + 1)
        except ValueError:  # Feb 29 → Feb 28
            nxt = cur.replace(year=cur.year + 1, day=28)
        nxt = min(nxt, final)
        yield cur.strftime("%Y-%m-%d"), nxt.strftime("%Y-%m-%d")
        cur = nxt


def scan_windowed(
    fetcher: Fetcher,
    path_for_key: Callable[[str], str],
    keys: list[str],
    start: str,
    final: datetime,
    params: dict[str, Any] | None = None,
    headers: dict[str, str] | None = None,
    results_key: str = "Budgets",
) -> Iterator[Row]:
    """S4 — windowed range scan (Xero budgets): per key (budget id), fetch
    each 1-year window ``[DateFrom, DateTo)`` (``tap_xero/utility.py:201-240``)."""
    for key in keys:
        for date_from, date_to in year_windows(start, final):
            page = fetcher.get(
                path_for_key(key),
                {**(params or {}), "DateFrom": date_from, "DateTo": date_to},
                headers,
            )
            yield from page.get(results_key, [])


def scan_keyed(
    fetcher: Fetcher,
    path_for_key: Callable[[str], str],
    keys: list[str],
    page_size: int = 50,
    params: dict[str, Any] | None = None,
    key_field: str | None = None,
) -> Iterator[Row]:
    """S5 — keyed detail scan (HubSpot form submissions): for each driver
    key, run a cursor scan (``tap_hubspot/utility.py:119-148``); optionally
    stamp the driving key onto each row (the reference threads ``form_id``
    through to build the surrogate PK, ``tap_hubspot/fetch.py:239-240``)."""
    for key in keys:
        for row in scan_cursor(fetcher, path_for_key(key), page_size, params):
            if key_field is not None:
                row = {**row, key_field: key}
            yield row


def scan_analytics(
    fetcher: Fetcher,
    path: str,
    params: dict[str, Any] | None = None,
) -> Iterator[tuple[str, list[Row]]]:
    """S6 — pre-aggregated analytics scan: response is a map
    ``{date_key: [rows-by-breakdown]}``; yield ``(date_key, rows)`` pairs
    (``tap_hubspot/utility.py:109-116``). The date→rows explode happens
    Spark-side."""
    page = fetcher.get(path, params)
    for date_key, rows in page.items():
        yield date_key, rows


def scan_full(
    fetcher: Fetcher,
    path: str,
    params: dict[str, Any] | None = None,
    data_key: str = "data",
) -> Iterator[Row]:
    """S7 — full-table scan: single unparameterized fetch (resources
    outside the incremental/paginated sets, ``tap_wrike/utility.py:96-101``)."""
    page = fetcher.get(path, params)
    rows = page.get(data_key) if isinstance(page, dict) else page
    yield from rows or []
