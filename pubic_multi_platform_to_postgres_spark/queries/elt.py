"""ELT-operator semantics as driver-checkable query/oracle pairs.

The driver fixtures are flat parquet, so each query first *constructs* the
nested shape the reference receives from its APIs (struct / array-of-struct
columns), applies the real engine operator (flatten / substream split /
key synthesis / date parse), and lands the flat result — which the oracle
expresses directly over the flat tables. This proves the operator's
semantics end-to-end, not just its plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pubic_multi_platform_to_postgres_spark.functions.dates import (
    epoch_ms_to_iso,
    format_date_ms,
    parse_dotnet_date,
    utc_day,
)
from pubic_multi_platform_to_postgres_spark.operators.flatten import flatten, merge_struct
from pubic_multi_platform_to_postgres_spark.operators.unnest import (
    rename_with_prefix,
    split_substream,
    unnest_association,
    unnest_budget_lines,
)
from pubic_multi_platform_to_postgres_spark.plans.jsonschema import compile_schema
from pubic_multi_platform_to_postgres_spark.queries.registry import load, query


@query(
    "elt_flatten_struct",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S.%gZ') AS "dates-start",
           o_orderpriority AS "dates-type"
    FROM orders
    """,
)
def elt_flatten_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: recursive struct flatten with dash-joined names.

    Builds the raw_wrike_task nested shape (FIXTURES.md §2) from orders,
    then flattens ``dates.{start,type}`` → ``dates-start``/``dates-type``
    exactly as ``flatten_json`` (``tap_wrike/utility.py:34-56``) would.
    """
    nested = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.struct(
            F.col("o_orderdate").alias("start"),
            F.col("o_orderpriority").alias("type"),
        ).alias("dates"),
    )
    flat = flatten(nested)
    return flat.select(
        "o_orderkey",
        format_date_ms(F.col("dates-start")).alias("dates-start"),
        F.col("dates-type"),
    )


@query(
    "elt_substream_split",
    oracle="""
    SELECT CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR) AS id,
           CAST(l_orderkey AS VARCHAR) AS parent_id,
           l_linenumber,
           CAST(l_quantity AS DOUBLE) AS l_quantity
    FROM lineitem
    """,
)
def elt_substream_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1+U3: child-stream split with parent back-ref + composite key.

    Rolls lineitems up into a per-order array (the raw nested API shape),
    then splits it back out through ``split_substream`` — each element
    becomes a child row with ``parent_id`` and the synthesized key
    ``parent_id_linenumber`` (``process_sub_streams`` +
    ``tap_wrike/fetch.py:13-20`` semantics).
    """
    li = load(spark, sf_dir, "lineitem")
    nested = li.groupBy("l_orderkey").agg(
        F.collect_list(F.struct("l_linenumber", "l_quantity")).alias("lines")
    )
    child = split_substream(nested, "lines", "l_orderkey", key_parts=["l_linenumber"])
    return child.select("id", "parent_id", "l_linenumber", "l_quantity")


@query(
    "elt_properties_merge",
    oracle="""
    SELECT c_custkey,
           c_mktsegment,
           CAST(c_acctbal AS DOUBLE) AS c_acctbal,
           c_name
    FROM customer
    """,
)
def elt_properties_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: HubSpot one-level properties merge (struct wins on collision).

    Packs customer attributes into a ``properties`` struct (with a
    deliberately colliding stale top-level ``c_acctbal``), merges, and
    checks the struct's value survives — ``row.update(row.pop(
    "properties"))``, ``tap_hubspot/utility.py:99``.
    """
    nested = load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.lit(-1.0).alias("c_acctbal"),  # stale pre-merge value, must lose
        F.struct(F.col("c_acctbal"), F.col("c_name")).alias("properties"),
    )
    return merge_struct(nested, "properties")


@query(
    "elt_dotnet_date_roundtrip",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S.%gZ') AS parsed_date
    FROM orders
    """,
)
def elt_dotnet_date_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9: ``/Date(ms±offset)/`` parse (offset discarded, epoch-ms UTC).

    Serializes each order date into the .NET wire format Xero emits —
    with a nonzero zone suffix that must be ignored — and parses it back
    via ``parse_dotnet_date`` (``tap_xero/utility.py:354-372`` parity).
    """
    o = load(spark, sf_dir, "orders")
    wire = o.select(
        "o_orderkey",
        F.concat(
            F.lit("/Date("),
            # parquet timestamps may infer as NTZ; unix_millis needs LTZ
            F.unix_millis(F.col("o_orderdate").cast("timestamp_ltz")),
            F.lit("+1300)/"),
        ).alias("dotnet"),
    )
    return wire.select(
        "o_orderkey",
        format_date_ms(parse_dotnet_date("dotnet")).alias("parsed_date"),
    )


@query(
    "elt_epoch_ms_to_iso",
    oracle="""
    SELECT event_id,
           strftime(date_trunc('milliseconds', ts), '%Y-%m-%dT%H:%M:%S.%gZ')
               AS submitted_at
    FROM events
    """,
)
def elt_epoch_ms_to_iso(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: epoch-ms integer → ISO ms string (form submittedAt semantics,
    ``tap_hubspot/fetch.py:224-228``)."""
    ev = load(spark, sf_dir, "events")
    as_ms = ev.select(
        "event_id",
        F.unix_millis("ts").alias("submitted_ms"),
    )
    return as_ms.select("event_id", epoch_ms_to_iso("submitted_ms").alias("submitted_at"))


@query(
    "elt_prefix_rename",
    oracle="""
    SELECT n_nationkey AS companies_n_nationkey,
           n_name AS companies_n_name,
           n_regionkey AS companies_n_regionkey
    FROM nation
    """,
)
def elt_prefix_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: association key-prefix rename (``tap_hubspot/utility.py:202-206``)."""
    return rename_with_prefix(load(spark, sf_dir, "nation"), "companies_")


@query(
    "elt_budget_lines_unnest",
    oracle="""
    SELECT CAST(o_custkey AS VARCHAR) || '_' || CAST(o_orderkey AS VARCHAR)
               || '_' || CAST(l_linenumber AS VARCHAR) AS "ID",
           CAST(o_custkey AS VARCHAR) AS parent_id,
           CAST(o_orderkey AS VARCHAR) AS "AccountCode",
           CAST(o_totalprice AS DOUBLE) AS line_amount,
           l_linenumber AS "Period",
           CAST(l_quantity AS DOUBLE) AS balance_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    """,
)
def elt_budget_lines_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: Xero two-level budget-line unnest with field merge.

    Reconstructs the nested ``Budget → BudgetLines[] → BudgetBalances[]``
    wire shape from orders/lineitem (customer=budget, order=line,
    lineitem=balance), then runs ``unnest_budget_lines`` — each line ×
    balance pair lands flat with ``parent_id`` and the composite
    ``ID = parent_id_AccountCode_Period`` (``process_budget_lines``,
    ``tap_xero/utility.py:243-292``; key at ``tap_xero/fetch.py:100-104``).
    """
    o, li = load(spark, sf_dir, "orders"), load(spark, sf_dir, "lineitem")
    balances = li.groupBy("l_orderkey").agg(
        F.collect_list(
            F.struct(F.col("l_linenumber").alias("Period"),
                     F.col("l_quantity").alias("balance_qty"))
        ).alias("BudgetBalances")
    )
    lines = (
        o.join(balances, o.o_orderkey == balances.l_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("o_orderkey").cast("string").alias("AccountCode"),
                    F.col("o_totalprice").alias("line_amount"),
                    F.col("BudgetBalances"),
                )
            ).alias("BudgetLines")
        )
    )
    return unnest_budget_lines(lines, parent_key="o_custkey")


@query(
    "elt_association_unnest",
    oracle="""
    SELECT CAST(r_regionkey AS VARCHAR) || '_' || CAST(n_nationkey AS VARCHAR) AS id,
           CAST(r_regionkey AS VARCHAR) AS parent_id,
           n_nationkey AS companies_id,
           n_name AS companies_name
    FROM region JOIN nation ON n_regionkey = r_regionkey
    """,
)
def elt_association_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2+P5+U3: HubSpot association unnest.

    Rebuilds the ``associations.companies.results`` nested wire shape
    (region=parent object, nations=associated companies), explodes it,
    prefixes child keys, and synthesizes ``id = parent_id_companies_id``
    (``process_sub_streams``, ``tap_hubspot/utility.py:151-226``).
    """
    r, n = load(spark, sf_dir, "region"), load(spark, sf_dir, "nation")
    assoc = n.groupBy("n_regionkey").agg(
        F.collect_list(
            F.struct(F.col("n_nationkey").alias("id"), F.col("n_name").alias("name"))
        ).alias("results")
    )
    nested = r.join(assoc, r.r_regionkey == assoc.n_regionkey).select(
        "r_regionkey",
        F.struct(F.struct(F.col("results")).alias("companies")).alias("associations"),
    )
    return unnest_association(nested, "companies", "r_regionkey")


@query(
    "elt_analytics_explode",
    oracle="""
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') || '-' || event_type AS id,
           strftime(CAST(ts AS DATE), '%Y-%m-%d') || ' 00:00:00.000' AS date_parsed,
           event_type AS breakdown,
           COUNT(*) AS visits
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def elt_analytics_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6+P7: pre-aggregated analytics map explode + row synthesis.

    Builds the ``{date_key: [rows-by-breakdown]}`` response shape (one map
    — the API returns one dict per request), explodes it back to rows, and
    synthesizes ``id = date_key-breakdown`` plus the reference's ms-precision
    date re-format (``tap_hubspot/utility.py:109-116``, ``fetch.py:131-135``).
    At scale the map is per-response, so the explode is bounded per request.
    """
    ev = load(spark, sf_dir, "events")
    # bucket by the UTC calendar day of the instant — date_format on a
    # TIMESTAMP renders in the session timezone, which re-buckets events
    # near midnight on a non-UTC host (caught by the TZ=America/New_York
    # gate sweep: 155 buckets instead of 150)
    per_day = (
        ev.select(F.date_format(utc_day("ts"), "yyyy-MM-dd").alias("date_key"), "event_type")
        .groupBy("date_key", "event_type")
        .agg(F.count(F.lit(1)).alias("visits"))
        .groupBy("date_key")
        .agg(
            F.collect_list(
                F.struct(F.col("event_type").alias("breakdown"), F.col("visits"))
            ).alias("rows")
        )
    )
    response = per_day.groupBy().agg(
        F.map_from_entries(
            F.collect_list(F.struct("date_key", "rows"))
        ).alias("payload")
    )
    exploded = response.select(
        F.explode("payload").alias("date_key", "rows")
    ).select("date_key", F.explode("rows").alias("r"))
    return exploded.select(
        F.concat_ws("-", "date_key", "r.breakdown").alias("id"),
        F.concat(F.col("date_key"), F.lit(" 00:00:00.000")).alias("date_parsed"),
        F.col("r.breakdown").alias("breakdown"),
        F.col("r.visits").alias("visits"),
    )


_PART_STREAM_SCHEMA = {
    "type": "object",
    "additionalProperties": False,
    "properties": {
        "p_partkey": {"type": ["null", "integer"]},
        "p_name": {"type": ["null", "string"]},
        "p_retailprice": {"type": ["null", "number"]},
        "not_in_source": {"type": ["null", "string"]},
    },
}


@query(
    "elt_schema_projection",
    oracle="""
    SELECT p_partkey, p_name, CAST(p_retailprice AS DOUBLE) AS p_retailprice
    FROM part
    """,
)
def elt_schema_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: schema-driven projection — keep only columns declared in the
    stream's JSON-Schema, silently drop the rest (``write_record``,
    ``tap_wrike/utility.py:275-284``). Declared-but-absent fields are
    skipped, extra source columns (p_brand/p_type/p_size) are pruned."""
    st = compile_schema(_PART_STREAM_SCHEMA)
    df = load(spark, sf_dir, "part")
    keep = [f.name for f in st.fields if f.name in df.columns]
    return df.select(*keep)


def _manifest_oracle() -> str:
    from pubic_multi_platform_to_postgres_spark.queries.registry import TABLES

    parts = [
        f"SELECT '{t}' AS table_name, COUNT(*) AS n_rows FROM {t}" for t in TABLES
    ]
    return "\nUNION ALL\n".join(parts)


@query("catalog_table_manifest", oracle=_manifest_oracle())
def catalog_table_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 discovery surface: one manifest row per registered source table
    (name + row count) — the engine's analog of the reference's
    ``--discover`` catalog listing (``tap_wrike/internal.py:66-90``),
    grounded against the physical data."""
    from functools import reduce

    from pubic_multi_platform_to_postgres_spark.queries.registry import TABLES

    frames = [
        load(spark, sf_dir, t).groupBy().agg(
            F.lit(t).alias("table_name"), F.count(F.lit(1)).alias("n_rows")
        ).select("table_name", "n_rows")
        for t in TABLES
    ]
    return reduce(lambda a, b: a.unionByName(b), frames)


@query(
    "dq_expectations_summary",
    oracle="""
    SELECT 'unique:o_orderkey' AS check, 'orders' AS table_name,
           CAST(COALESCE(SUM(n - 1), 0) AS BIGINT) AS n_violations
    FROM (SELECT COUNT(*) AS n FROM orders GROUP BY o_orderkey)
    UNION ALL
    SELECT 'not_null:o_custkey', 'orders',
           CAST(COUNT(*) FILTER (o_custkey IS NULL) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'accepted_values:o_orderstatus', 'orders',
           CAST(COUNT(*) FILTER (o_orderstatus IS NOT NULL
                AND o_orderstatus NOT IN ('F', 'O', 'P')) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'relationships:l_orderkey', 'lineitem',
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem l
    WHERE l.l_orderkey IS NOT NULL
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'accepted_values:event_type', 'events',
           CAST(COUNT(*) FILTER (event_type IS NOT NULL
                AND event_type NOT IN ('click', 'view', 'purchase', 'error'))
                AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'freshness:ts', 'events',
           CAST(CASE WHEN COALESCE(MAX(epoch_us(ts)), -4611686018427387904)
                     < 1706832000000000
                THEN 1 ELSE 0 END AS BIGINT)
    FROM events
    """,
)
def dq_expectations_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt-test parity (plans/expectations.py): the four built-in dbt
    checks — unique, not_null, accepted_values, relationships — compiled
    to violation-count aggregates and unioned into one suite result.
    The event_type check deliberately omits 'signup' so the suite shows
    a real non-zero violation row (a DQ harness that can only ever print
    zeros verifies nothing). Referential integrity plans as a LEFT ANTI
    join against the distinct parent keys; everything else is a
    single-pass conditional aggregate."""
    from pubic_multi_platform_to_postgres_spark.plans.expectations import (
        expect_accepted_values,
        expect_freshness,
        expect_not_null,
        expect_relationship,
        expect_unique,
        summary,
    )

    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    events = load(spark, sf_dir, "events")
    return summary([
        expect_unique(orders, ["o_orderkey"], "orders"),
        expect_not_null(orders, "o_custkey", "orders"),
        expect_accepted_values(orders, "o_orderstatus", ["F", "O", "P"], "orders"),
        expect_relationship(lineitem, "l_orderkey", orders, "o_orderkey", "lineitem"),
        expect_accepted_values(
            events, "event_type", ["click", "view", "purchase", "error"], "events"
        ),
        # as-of 2024-02-05 UTC with a 72h budget: the fixture's newest
        # event (Jan 30) is stale -> a deliberate non-zero freshness row
        expect_freshness(events, "ts", 259200, 1707091200, "events"),
    ])


# --- end-to-end REST -> land -> query integration gate (VERDICT r6 #7) -----

# Recorded API session (the VCR/cassette pattern): two sync cycles against a
# Wrike-shaped source. Cycle 1 pages a token-paginated `tasks` endpoint
# (S2: two pages, stop on missing nextPageToken) and full-scans `contacts`
# (S7) whose rows carry a nested `profiles` sub-stream. Cycle 2 redelivers
# t1 unchanged (PK dedup must collapse it), re-sends t2 with a newer
# updatedDate (upsert must take the new version), and adds t4.
_E2E_TASK = {
    "t1": {"id": "t1", "title": "Proposal alpha", "status": "Active",
           "updatedDate": "2024-01-01T00:00:00.000Z",
           "dates": {"start": "2024-01-01", "due": "2024-03-01"},
           "droppedByProjection": "x"},
    "t2": {"id": "t2", "title": "Quote beta", "status": "Active",
           "updatedDate": "2024-01-02T00:00:00.000Z",
           "dates": {"start": "2024-01-05", "due": "2024-03-05"}},
    "t3": {"id": "t3", "title": "Proposal gamma", "status": "Completed",
           "updatedDate": "2024-01-03T00:00:00.000Z",
           "dates": {"start": "2024-01-06", "due": "2024-02-06"}},
    "t2v2": {"id": "t2", "title": "Quote beta v2", "status": "Completed",
             "updatedDate": "2024-01-10T00:00:00.000Z",
             "dates": {"start": "2024-01-05", "due": "2024-03-05"}},
    "t4": {"id": "t4", "title": "Proposal delta", "status": "Active",
           "updatedDate": "2024-01-09T00:00:00.000Z",
           "dates": {"start": "2024-01-09", "due": "2024-04-09"}},
}
_E2E_CONTACTS = [
    {"id": "c1", "firstName": "Ada", "profiles": [
        {"accountId": "A1", "email": "ada@a1.example"},
        {"accountId": "A2", "email": "ada@a2.example"},
    ]},
    {"id": "c2", "firstName": "Grace", "profiles": []},
]
_E2E_CYCLES = [
    {
        "tasks": [
            {"data": [_E2E_TASK["t1"], _E2E_TASK["t2"]],
             "nextPageToken": "p2", "responseSize": 2},
            {"data": [_E2E_TASK["t3"]], "responseSize": 1},
        ],
        "contacts": [{"data": _E2E_CONTACTS}],
    },
    {
        "tasks": [
            {"data": [_E2E_TASK["t1"], _E2E_TASK["t2v2"], _E2E_TASK["t4"]],
             "responseSize": 3},
        ],
        "contacts": [{"data": _E2E_CONTACTS}],
    },
]

_E2E_TASKS_SCHEMA = {
    "type": "object",
    "properties": {
        "id": {"type": "string"},
        "title": {"type": ["null", "string"]},
        "status": {"type": ["null", "string"]},
        "updatedDate": {"type": ["null", "string"]},
        "dates-start": {"type": ["null", "string"]},
        "dates-due": {"type": ["null", "string"]},
    },
    "additionalProperties": False,
}
_E2E_CONTACTS_SCHEMA = {
    "type": "object",
    "properties": {
        "id": {"type": "string"},
        "firstName": {"type": ["null", "string"]},
    },
    "additionalProperties": False,
}
_E2E_PROFILES_SCHEMA = {
    "type": "object",
    "properties": {
        "id": {"type": "string"},
        "parent_id": {"type": ["null", "string"]},
        "accountId": {"type": ["null", "string"]},
        "email": {"type": ["null", "string"]},
    },
    "additionalProperties": False,
}


@query(
    "elt_end_to_end_land",
    oracle="""
    SELECT * FROM (VALUES
        ('tasks', 't1', 'Proposal alpha|Active|2024-01-01|2024-01-01T00:00:00.000Z'),
        ('tasks', 't2', 'Quote beta v2|Completed|2024-01-05|2024-01-10T00:00:00.000Z'),
        ('tasks', 't3', 'Proposal gamma|Completed|2024-01-06|2024-01-03T00:00:00.000Z'),
        ('tasks', 't4', 'Proposal delta|Active|2024-01-09|2024-01-09T00:00:00.000Z'),
        ('contacts', 'c1', 'Ada'),
        ('contacts', 'c2', 'Grace'),
        ('contacts_profiles', 'c1_A1', 'c1|ada@a1.example'),
        ('contacts_profiles', 'c1_A2', 'c1|ada@a2.example')
    ) AS t(tbl, id, info)
    """,
)
def elt_end_to_end_land(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end extraction integration gate: a RECORDED two-cycle API
    session drives the REAL pipeline — token-paginated REST scan (S2) +
    full scan (S7) through ``Fetcher``/``RecordedTransport``, raw JSON →
    nested DataFrame, recursive flatten (P1: ``dates`` → ``dates-start``),
    sub-stream split with surrogate keys (U1/U3: ``c1_A1``), typed schema
    projection (P4: ``droppedByProjection`` never lands), keyed parquet
    upsert (K2: cycle 2 redelivers t1 unchanged → dedup, re-sends t2 with
    a newer ``updatedDate`` → overwrite, adds t4 → append), and §2.7
    run-start bookmark persistence. The landed lake is then read back and
    compared to a hand-computed golden oracle — the FIXTURES.md golden-ELT
    test promoted into the sweep (VERDICT r6 #7). The fixture is constant,
    so the result is sf-independent by design; the moving parts under
    test are the operators, not the data volume.

    Reference parity: tap_wrike/utility.py:82-143 (S2 token scan),
    tap_wrike/utility.py:34-56 (flatten), tap_wrike/fetch.py:13-20
    (profiles surrogate key), runner/__init__.py:342-366 (state file).
    """
    import tempfile
    from pathlib import Path

    from pubic_multi_platform_to_postgres_spark.plans.catalog import Catalog
    from pubic_multi_platform_to_postgres_spark.sources.pipeline import (
        Pipeline,
        StreamSpec,
    )
    from pubic_multi_platform_to_postgres_spark.sources.rest import (
        Fetcher,
        RecordedTransport,
        RetryPolicy,
        scan_full,
        scan_token,
    )

    cat = Catalog()
    cat.register_json_schema(
        "tasks", _E2E_TASKS_SCHEMA, key_properties=["id"],
        replication_key="updatedDate", source="wrike",
    )
    cat.register_json_schema(
        "contacts", _E2E_CONTACTS_SCHEMA, key_properties=["id"], source="wrike"
    )
    cat.register_json_schema(
        "contacts_profiles", _E2E_PROFILES_SCHEMA, key_properties=["id"],
        parent="contacts", source="wrike",
    )

    def tasks_transform(df: DataFrame) -> dict[str, DataFrame]:
        return {"tasks": flatten(df) if df.columns else df}

    def contacts_transform(df: DataFrame) -> dict[str, DataFrame]:
        if "profiles" not in df.columns:
            return {"contacts": df}
        profiles = split_substream(
            df, "profiles", parent_key="id", key_parts=["accountId"]
        )
        return {"contacts": df.drop("profiles"), "contacts_profiles": profiles}

    # per-cycle recorded transport; the extract closures read `fetch[0]`
    # so the SAME specs replay each cycle's recording in turn
    fetch: list[Fetcher] = [None]  # type: ignore[list-item]
    specs = [
        StreamSpec(
            cat.get("tasks"),
            lambda bm: scan_token(fetch[0], "tasks", page_size=1000),
            tasks_transform,
        ),
        StreamSpec(
            cat.get("contacts"),
            lambda bm: scan_full(fetch[0], "contacts"),
            contacts_transform,
        ),
    ]
    root = Path(tempfile.mkdtemp(prefix="spark_graft_e2e_"))
    pipe = Pipeline("wrike", cat, specs, root)
    for cycle in _E2E_CYCLES:
        fetch[0] = Fetcher(
            transport=RecordedTransport(cycle),
            retry=RetryPolicy(sleep=lambda s: None),
        )
        reports = pipe.run(spark)
        errs = [r.error for r in reports if not r.ok]
        if errs:
            raise RuntimeError(f"elt_end_to_end_land sync failed: {errs}")

    tasks = spark.read.parquet(str(root / "tasks")).select(
        F.lit("tasks").alias("tbl"),
        "id",
        F.concat_ws(
            "|", "title", "status", F.col("dates-start"), "updatedDate"
        ).alias("info"),
    )
    contacts = spark.read.parquet(str(root / "contacts")).select(
        F.lit("contacts").alias("tbl"), "id", F.col("firstName").alias("info")
    )
    profiles = spark.read.parquet(str(root / "contacts_profiles")).select(
        F.lit("contacts_profiles").alias("tbl"),
        "id",
        F.concat_ws("|", "parent_id", "email").alias("info"),
    )
    return tasks.unionByName(contacts).unionByName(profiles)
