"""Shared pytest fixtures: one SparkSession per test session."""

from __future__ import annotations

import pytest

from pubic_multi_platform_to_postgres_spark.session import get_session

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_session(
        app_name="spark_graft_tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.autoBroadcastJoinThreshold": "10MB"},
    )
    yield spark
