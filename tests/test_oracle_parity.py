"""Run every registered query against its DuckDB oracle (driver-gate mirror).

Parity runs at sf0.001 for speed; the driver's real gate runs sf0.01. Any
query registered without an oracle gets a rows-only smoke check here, same
as the driver's weaker check.
"""

from __future__ import annotations

import os

import pytest

from pubic_multi_platform_to_postgres_spark.queries import REGISTRY
from tests.conftest import SF_SMOKE
from tests.oracle import assert_frames_match, run_oracle

ALL = sorted(REGISTRY)


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, name):
    q = REGISTRY[name]
    sdf = q.fn(spark, SF_SMOKE)
    spark_pdf = sdf.toPandas()
    if q.oracle is None:
        assert len(spark_pdf) >= 0  # rows-only smoke: just runs
        return
    oracle_pdf = run_oracle(q.oracle, SF_SMOKE)
    assert_frames_match(spark_pdf, oracle_pdf, name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_FULL_GATE"),
    reason="10x-scale oracle sweep; set SPARK_GRAFT_FULL_GATE=1 (adds ~3 min)",
)
@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle_sf01(spark, name):
    """The same differential gate at sf0.1 — 10x the driver's gate scale.
    Catches bounds that only break with more data (this run found the
    range join's floor-to-second boundary bug and exercises the exact-sum
    overflow margins)."""
    q = REGISTRY[name]
    sdf = q.fn(spark, "/root/testdata/sf0.1")
    if q.oracle is None:
        assert sdf.count() >= 0
        return
    assert_frames_match(sdf.toPandas(), run_oracle(q.oracle, "/root/testdata/sf0.1"), name)


_TZ_SENSITIVE = [
    "elt_epoch_ms_to_iso",      # instant -> ISO-Z string rendering
    "elt_analytics_explode",    # day bucketing of instants
    "elt_dotnet_date_roundtrip",
    "incremental_bookmark_filter",
    "scd2_user_event_state",
    "sessionize_events",
    "rfm_customer_segments",
]


@pytest.mark.parametrize("name", _TZ_SENSITIVE)
def test_query_matches_oracle_under_non_utc_session_tz(spark, name):
    """The queries that render or bucket instants must hash-match the
    oracle even when the session timezone is not UTC (the driver runs
    vanilla sessions inheriting the host zone). Caught two real bugs:
    ISO-Z strings rendered in local time, and day buckets shifting at
    midnight."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        q = REGISTRY[name]
        assert_frames_match(
            q.fn(spark, SF_SMOKE).toPandas(), run_oracle(q.oracle, SF_SMOKE), name
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
