"""Unit tests for the ELT core: schema compiler, flatten, unnest, dates.

Fixture shapes follow FIXTURES.md §2 (raw pre-flatten ingestion records),
which mirror the reference's API payloads.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pubic_multi_platform_to_postgres_spark.functions.dates import (
    epoch_ms_to_iso,
    format_date_ms,
    parse_date_fallback,
    parse_dotnet_date,
    to_wrike_date,
)
from pubic_multi_platform_to_postgres_spark.operators.flatten import (
    flatten,
    infer_array_limits,
    merge_struct,
)
from pubic_multi_platform_to_postgres_spark.operators.unnest import (
    rename_with_prefix,
    split_substream,
    unnest_association,
    unnest_budget_lines,
    with_surrogate_key,
)
from pubic_multi_platform_to_postgres_spark.plans.catalog import Catalog
from pubic_multi_platform_to_postgres_spark.plans.jsonschema import compile_schema

# ---------------------------------------------------------------------------
# JSON-Schema compiler


def test_compile_schema_types():
    js = {
        "type": "object",
        "additionalProperties": False,
        "properties": {
            "id": {"type": "string"},
            "createdDate": {"type": ["null", "string"], "format": "date-time"},
            "trackedDate": {"type": ["null", "string"], "format": "date"},
            "primaryEmail": {"type": ["null", "string"], "format": "email"},
            "amount": {"type": ["null", "number"]},
            "duration": {"type": ["null", "integer"]},
            "deleted": {"type": ["null", "boolean"]},
        },
    }
    st = compile_schema(js)
    got = {f.name: f.dataType for f in st.fields}
    assert got["id"] == T.StringType()
    assert got["createdDate"] == T.TimestampType()
    assert got["trackedDate"] == T.DateType()
    assert got["primaryEmail"] == T.StringType()
    assert got["amount"] == T.DoubleType()
    assert got["duration"] == T.LongType()
    assert got["deleted"] == T.BooleanType()
    assert all(f.nullable for f in st.fields)


def test_compile_schema_nested():
    js = {
        "type": "object",
        "properties": {
            "dates": {
                "type": ["null", "object"],
                "properties": {
                    "start": {"type": ["null", "string"], "format": "date-time"},
                    "duration": {"type": ["null", "integer"]},
                },
            },
            "tags": {"type": ["null", "array"], "items": {"type": "string"}},
        },
    }
    st = compile_schema(js)
    dates = st["dates"].dataType
    assert isinstance(dates, T.StructType)
    assert dates["start"].dataType == T.TimestampType()
    assert st["tags"].dataType == T.ArrayType(T.StringType(), True)


def test_compile_schema_rejects_unions():
    with pytest.raises(ValueError):
        compile_schema({"type": "object", "properties": {"x": {"type": ["string", "integer"]}}})


# ---------------------------------------------------------------------------
# Flatten (P1/P2)


def _raw_task_df(spark):
    # raw_wrike_task: nested dates struct (FIXTURES.md §2)
    return spark.createDataFrame(
        [
            Row(
                id="T1",
                title="Proposal X",
                dates=Row(type="Planned", duration=5, start="2026-01-01", due="2026-01-06"),
            ),
            Row(id="T2", title="Quote Y", dates=Row(type=None, duration=None, start=None, due=None)),
        ]
    )


def test_flatten_struct_dash_names(spark):
    out = flatten(_raw_task_df(spark))
    assert out.columns == ["id", "title", "dates-type", "dates-duration", "dates-start", "dates-due"]
    row = {r["id"]: r for r in out.collect()}
    assert row["T1"]["dates-duration"] == 5
    assert row["T2"]["dates-start"] is None


def test_flatten_preserves_substream_lists(spark):
    df = spark.createDataFrame(
        [
            Row(
                id="C1",
                firstName="A",
                profiles=[Row(accountId="ACC1", email="a@x", role="User")],
            )
        ]
    )
    out = flatten(df, preserve=("profiles",))
    assert "profiles" in out.columns
    assert out.schema["profiles"].dataType.typeName() == "array"


def test_flatten_indexed_arrays(spark):
    df = spark.createDataFrame([Row(id="1", xs=[10, 20, 30]), Row(id="2", xs=[7])])
    limits = infer_array_limits(df, ["xs"])
    assert limits == {"xs": 3}
    out = flatten(df, array_limits=limits)
    assert out.columns == ["id", "xs-0", "xs-1", "xs-2"]
    rows = {r["id"]: r for r in out.collect()}
    assert rows["1"]["xs-2"] == 30
    assert rows["2"]["xs-1"] is None


def test_merge_struct_properties_win(spark):
    df = spark.createDataFrame(
        [Row(id="D1", amount=0.0, properties=Row(amount=99.5, dealname="Big"))]
    )
    out = merge_struct(df, "properties")
    row = out.collect()[0]
    assert set(out.columns) == {"id", "amount", "dealname"}
    assert row["amount"] == 99.5  # struct (dict.update) wins


# ---------------------------------------------------------------------------
# Unnest / child streams (U1-U3, P3, P5)


def test_split_substream_profiles(spark):
    df = spark.createDataFrame(
        [
            Row(
                id="C1",
                profiles=[
                    Row(accountId="ACC1", email="a@x", role="User"),
                    Row(accountId="ACC2", email="b@x", role="Admin"),
                ],
            ),
            Row(id="C2", profiles=[]),
        ]
    )
    child = split_substream(df, "profiles", "id", key_parts=["accountId"])
    rows = child.orderBy("id").collect()
    assert [r["id"] for r in rows] == ["C1_ACC1", "C1_ACC2"]
    assert all(r["parent_id"] == "C1" for r in rows)
    assert child.count() == 2  # empty list parent contributes nothing


def test_unnest_association(spark):
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField(
                "associations",
                T.StructType(
                    [
                        T.StructField(
                            "companies",
                            T.StructType(
                                [
                                    T.StructField(
                                        "results",
                                        T.ArrayType(
                                            T.StructType(
                                                [
                                                    T.StructField("id", T.StringType()),
                                                    T.StructField("type", T.StringType()),
                                                ]
                                            )
                                        ),
                                    )
                                ]
                            ),
                        )
                    ]
                ),
            ),
        ]
    )
    df = spark.createDataFrame(
        [("D1", (([("CO1", "deal_to_company")],),))], schema=schema
    )
    child = unnest_association(df, "companies", "id")
    row = child.collect()[0]
    assert row["id"] == "D1_CO1"
    assert row["parent_id"] == "D1"
    assert row["companies_id"] == "CO1"
    assert row["companies_type"] == "deal_to_company"


def test_unnest_budget_lines(spark):
    df = spark.createDataFrame(
        [
            Row(
                BudgetID="B1",
                tenant_id="TEN1",
                BudgetLines=[
                    Row(
                        AccountID="A1",
                        AccountCode="400",
                        BudgetBalances=[
                            Row(Period="2023-01", Amount=100.0, Notes="n1"),
                            Row(Period="2023-02", Amount=110.0, Notes=None),
                        ],
                    )
                ],
            )
        ]
    )
    out = unnest_budget_lines(df, keep_parent_cols=("tenant_id",))
    rows = out.orderBy("Period").collect()
    assert [r["ID"] for r in rows] == ["B1_400_2023-01", "B1_400_2023-02"]
    assert rows[0]["Amount"] == 100.0
    assert rows[0]["AccountID"] == "A1"
    assert rows[0]["tenant_id"] == "TEN1"
    assert "BudgetBalances" not in out.columns


def test_rename_with_prefix_and_surrogate(spark):
    df = spark.createDataFrame([Row(id="X", type="t")])
    out = rename_with_prefix(df, "companies_")
    assert out.columns == ["companies_id", "companies_type"]
    keyed = with_surrogate_key(spark.createDataFrame([Row(a="P", b=7)]), ["a", "b"])
    assert keyed.collect()[0]["id"] == "P_7"


# ---------------------------------------------------------------------------
# Date functions (P8-P10)


def test_parse_dotnet_date(spark):
    df = spark.createDataFrame(
        [
            Row(s="/Date(1672531200000+0000)/"),   # offset discarded
            Row(s="/Date(1672531200123+1300)/"),   # ms precision, nonzero offset
            Row(s="/Date(-86400000)/"),             # negative epoch
            Row(s="2023-01-01T00:00:00.000Z"),      # ISO passthrough
            Row(s="garbage"),
        ]
    )
    out = df.select(parse_dotnet_date("s").alias("ts")).collect()
    assert out[0]["ts"] == dt.datetime(2023, 1, 1)
    assert out[1]["ts"] == dt.datetime(2023, 1, 1, 0, 0, 0, 123000)
    assert out[2]["ts"] == dt.datetime(1969, 12, 31)
    assert out[3]["ts"] == dt.datetime(2023, 1, 1)
    assert out[4]["ts"] is None


def test_format_roundtrip(spark):
    df = spark.createDataFrame([Row(ms=1672531200123)])
    row = df.select(
        epoch_ms_to_iso("ms").alias("iso"),
        format_date_ms(F.timestamp_millis(F.col("ms"))).alias("fmt"),
        to_wrike_date(F.timestamp_millis(F.col("ms"))).alias("wrike"),
    ).collect()[0]
    assert row["iso"] == "2023-01-01T00:00:00.123Z"
    assert row["fmt"] == row["iso"]
    assert row["wrike"] == "2023-01-01T00:00:00Z"


def test_epoch_ms_to_iso_zone_proof_all_combos(spark):
    """The arithmetic ISO renderer must produce identical, truthful UTC
    strings at EVERY build/execute session-zone combination — including
    both stale-Column directions the r6 and r7 advisories flagged
    (build-UTC/exec-NY and build-NY/exec-UTC) — for negative epochs,
    day boundaries, and ms edges. The plan must contain no CASE and no
    zone-sensitive expression (``date_format`` over a timestamp,
    ``current_timezone``)."""
    from pubic_multi_platform_to_postgres_spark.functions import dates as D

    ms_values = [
        0,
        1,
        999,
        1000,
        86399999,            # last ms of epoch day 0
        86400000,            # first ms of day 1
        -1,                  # 1969-12-31T23:59:59.999Z
        -86400000,
        1672531200123,
        1705322096789,
        253402300799999,     # 9999-12-31T23:59:59.999Z
    ]
    df = spark.createDataFrame([Row(ms=v) for v in ms_values])

    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        built_utc = df.select(D.epoch_ms_to_iso("ms").alias("iso"))
        utc_utc = [r.iso for r in built_utc.collect()]
        opt = built_utc._jdf.queryExecution().optimizedPlan().toString()
        assert "CASE WHEN" not in opt, opt
        assert "current_timezone" not in opt, opt
        # r6 advisory direction: build UTC, execute after zone change
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        utc_ny = [r.iso for r in built_utc.collect()]
        # build AND execute under NY
        built_ny = df.select(D.epoch_ms_to_iso("ms").alias("iso"))
        ny_ny = [r.iso for r in built_ny.collect()]
        # r7 advisory direction: build NY, execute after switch to UTC
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        ny_utc = [r.iso for r in built_ny.collect()]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert utc_utc == utc_ny == ny_ny == ny_utc
    assert utc_utc[0] == "1970-01-01T00:00:00.000Z"
    assert utc_utc[6] == "1969-12-31T23:59:59.999Z"
    assert utc_utc[10] == "9999-12-31T23:59:59.999Z"


def test_parse_date_fallback(spark):
    df = spark.createDataFrame([Row(s="2023-01-02 03:04:05"), Row(s="02/01/2023")])
    out = df.select(
        parse_date_fallback("s", ("yyyy-MM-dd HH:mm:ss", "dd/MM/yyyy")).alias("ts")
    ).collect()
    assert out[0]["ts"] == dt.datetime(2023, 1, 2, 3, 4, 5)
    assert out[1]["ts"] == dt.datetime(2023, 1, 2)


# ---------------------------------------------------------------------------
# Catalog


def test_catalog_register_select_children():
    cat = Catalog()
    cat.register_json_schema(
        "contacts",
        {"type": "object", "properties": {"id": {"type": "string"}}},
        key_properties=["id"],
        source="wrike",
    )
    cat.register_json_schema(
        "contacts_profiles",
        {"type": "object", "properties": {"id": {"type": "string"}}},
        key_properties=["id"],
        parent="contacts",
        source="wrike",
    )
    cat.select(["contacts"])
    assert cat.get("contacts").selected
    assert not cat.get("contacts_profiles").selected
    assert [s.name for s in cat.children("contacts")] == ["contacts_profiles"]
    assert [s.name for s in cat.streams(selected_only=True)] == ["contacts"]
    disc = cat.discover()
    assert disc[0]["key_properties"] == ["id"]
    with pytest.raises(ValueError):
        cat.register_json_schema("contacts", {"type": "object", "properties": {}})


def test_expectations_count_real_violations(spark):
    """Each dbt-style check must count constructed violations correctly
    (the fixture suite's zeros alone prove nothing)."""
    from pubic_multi_platform_to_postgres_spark.plans.expectations import (
        expect_accepted_values,
        expect_not_null,
        expect_relationship,
        expect_unique,
        summary,
    )

    t = spark.createDataFrame(
        [(1, "ok"), (1, "dup"), (1, "dup2"), (2, None), (3, "weird")],
        "id int, status string",
    )
    parent = spark.createDataFrame([(1,), (2,)], "pid int")
    child = spark.createDataFrame([(1,), (2,), (9,), (None,)], "fk int")

    got = {r["check"]: r["n_violations"] for r in summary([
        expect_unique(t, ["id"], "t"),                      # 3 rows for id=1 -> 2
        expect_not_null(t, "status", "t"),                  # 1 NULL
        expect_accepted_values(t, "status", ["ok", "dup", "dup2"], "t"),  # 'weird'
        expect_relationship(child, "fk", parent, "pid", "c"),  # 9 orphan; NULL passes
    ]).collect()}
    assert got == {
        "unique:id": 2,
        "not_null:status": 1,
        "accepted_values:status": 1,
        "relationships:fk": 1,
    }


def test_expect_freshness_fresh_stale_empty(spark):
    from pyspark.sql import functions as F

    from pubic_multi_platform_to_postgres_spark.plans.expectations import (
        expect_freshness,
    )

    df = spark.createDataFrame([(1,)], "x int").select(
        F.timestamp_seconds(F.lit(1000)).alias("ts")
    )
    fresh = expect_freshness(df, "ts", max_age_s=100, as_of_epoch_s=1050, table="t")
    stale = expect_freshness(df, "ts", max_age_s=100, as_of_epoch_s=1200, table="t")
    empty = expect_freshness(df.filter("ts IS NULL"), "ts", 100, 1050, "t")
    assert fresh.collect()[0]["n_violations"] == 0
    assert stale.collect()[0]["n_violations"] == 1
    assert empty.collect()[0]["n_violations"] == 1  # no data = stale


def test_expect_freshness_ntz_column(spark):
    """NTZ (wall-clock) timestamp columns must work and compare tz-free —
    unix_micros rejects NTZ, and casting NTZ->TIMESTAMP would shift by
    the session timezone."""
    from pyspark.sql import functions as F

    from pubic_multi_platform_to_postgres_spark.plans.expectations import (
        expect_freshness,
    )

    df = spark.createDataFrame([("2024-01-01 00:00:00",)], "s string").select(
        F.to_timestamp_ntz("s").alias("ts")
    )
    assert df.schema["ts"].dataType.typeName() == "timestamp_ntz"
    jan1 = 1704067200  # 2024-01-01T00:00:00Z
    fresh = expect_freshness(df, "ts", max_age_s=3600, as_of_epoch_s=jan1 + 100, table="t")
    stale = expect_freshness(df, "ts", max_age_s=3600, as_of_epoch_s=jan1 + 7200, table="t")
    assert fresh.collect()[0]["n_violations"] == 0
    assert stale.collect()[0]["n_violations"] == 1
