"""Timestamp/date functions matching the reference's utilities (P8-P10).

Every function here is a composition of built-in ``pyspark.sql.functions``
— JVM-side, codegen'd, no Python in the row path. Reference sites:

- ``format_date`` (ISO-8601, 3-decimal ms, trailing Z):
  ``tap_wrike/utility.py:242-245`` (same in the other taps)
- ``to_wrike_date`` (ms stripped): ``tap_wrike/utility.py:198-206``
- ``iso_to_unix`` / ``parse_unix_string``: ``tap_wrike/utility.py:248-265``
- epoch-ms → ISO (form submissions): ``tap_hubspot/fetch.py:224-228``
- ``/Date(ms±offset)/`` .NET parse: ``parse_xero_date``,
  ``tap_xero/utility.py:354-372`` — the numeric offset is split off and
  DISCARDED (epoch ms treated as UTC); reproduced exactly.
"""

from __future__ import annotations

import datetime

from pyspark.sql import Column
from pyspark.sql import functions as F

ISO_MS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"
ISO_SEC_FMT = "yyyy-MM-dd'T'HH:mm:ss'Z'"

_DOTNET_RE = r"/Date\((-?\d+)"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def format_date_ms(c: Column | str) -> Column:
    """Timestamp → ISO-8601 string with millisecond precision + 'Z'
    (the reference's canonical landed-timestamp format)."""
    return F.date_format(_col(c), ISO_MS_FMT)


def to_wrike_date(c: Column | str) -> Column:
    """Timestamp → ISO-8601 seconds precision + 'Z' (Wrike query params)."""
    return F.date_format(_col(c), ISO_SEC_FMT)


def iso_to_unix(c: Column | str) -> Column:
    """ISO string/timestamp → unix epoch seconds (long)."""
    return F.unix_timestamp(_col(c))


def epoch_ms_to_ts(c: Column | str) -> Column:
    """Epoch milliseconds (long) → timestamp (P8, form submittedAt)."""
    return F.timestamp_millis(_col(c).cast("long"))


def epoch_ms_to_iso(c: Column | str) -> Column:
    """Epoch milliseconds → ISO-8601 UTC ms string ('Z' suffix).

    ONE plan: pure epoch arithmetic. Day/time fields derive from
    integer division; only a DATE (timezone-less by type) is ever
    formatted, so the rendering is session-timezone-proof at EVERY
    build/execute zone combination — no branch, no ``date_format`` over
    a timestamp, nothing whose zone binds at analysis time.

    History (why not a ``date_format`` fast path): ``date_format``
    renders a timestamp in the SESSION zone, which under a non-UTC
    session labels local wall-clock with a literal 'Z'. r6 gated it on
    the zone at Column-build time (stale after a zone change — ADVICE
    r6); r7 gated it at execution time via a ``current_timezone()``
    CASE, which fixed that direction but left the inverse hole: the
    formatter's ``timeZoneId`` binds at ANALYSIS while the CASE folds
    at OPTIMIZATION, so build-non-UTC → switch-to-UTC → execute took
    the fast branch with the stale non-UTC formatter zone (ADVICE r7).
    Measured at 2M rows × local[32], the CASE plan was no faster than
    the plain arithmetic plan anyway (184 vs 177 ms — the branch
    overhead ate the formatter's gain; raw ``date_format`` alone is
    135 ms, i.e. zone-change safety costs ~1.3×, and a
    ``convert_timezone``→NTZ rendering costs 234 ms), so the branch is
    gone: correctness by construction at the same speed.
    """
    ms_total = _col(c).cast("long")
    days = F.floor(ms_total / 86400000)
    d = F.date_add(F.lit(datetime.date(1970, 1, 1)), days.cast("int"))
    rem = ms_total - days * F.lit(86400000)
    # Zero-padding via ONE integer: 1hhmmssSSS as a 10-digit long, cast to
    # string once, sliced — faster than four lpad(cast(...)) chains, and
    # integer-only, so session-timezone-proof. (Still ~2× the single
    # date_format call — that's why the UTC fast path above exists; this
    # branch is the correctness fallback for non-UTC sessions.)
    packed = (
        F.lit(1000000000)
        + (rem / 3600000).cast("long") * 10000000
        + (rem % 3600000 / 60000).cast("long") * 100000
        + (rem % 60000 / 1000).cast("long") * 1000
        + rem % 1000
    ).cast("string")
    return F.concat(
        F.date_format(d, "yyyy-MM-dd"),
        F.lit("T"),
        F.substring(packed, 2, 2),
        F.lit(":"),
        F.substring(packed, 4, 2),
        F.lit(":"),
        F.substring(packed, 6, 2),
        F.lit("."),
        F.substring(packed, 8, 3),
        F.lit("Z"),
    )


def utc_day(ts: Column | str) -> Column:
    """Instant → its UTC calendar DATE, session-timezone-proof (epoch-day
    arithmetic on ``unix_micros``; never a tz-sensitive cast)."""
    days = F.floor(F.unix_micros(_col(ts)) / F.lit(86400_000_000))
    return F.date_add(F.lit(datetime.date(1970, 1, 1)), days.cast("int"))


def parse_dotnet_date(c: Column | str) -> Column:
    """P9: ``"/Date(1672531200000+0000)/"`` → timestamp.

    The embedded value is epoch **milliseconds**; any ``+hhmm`` suffix is
    discarded (reference splits on ``+``/``-`` and keeps the ms part only,
    ``tap_xero/utility.py:360-366``). Non-matching strings fall through to
    a plain ISO parse (the reference's passthrough branch).
    """
    col = _col(c)
    ms = F.regexp_extract(col, _DOTNET_RE, 1)
    return F.when(ms != "", F.timestamp_millis(ms.cast("long"))).otherwise(
        F.try_to_timestamp(col)
    )


def parse_date_fallback(c: Column | str, fmts: tuple[str, ...]) -> Column:
    """P10 ``parse_date``: try each format in order, first non-null wins."""
    col = _col(c)
    attempts = [F.try_to_timestamp(col, F.lit(f)) for f in fmts]
    return F.coalesce(*attempts, F.try_to_timestamp(col))
