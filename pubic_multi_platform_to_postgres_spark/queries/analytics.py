"""Wider analytic surface: pivot / unpivot, exact percentiles, corpus
n-gram top-k — the reshaping and distribution operators downstream
consumers of the reference's Postgres tables would otherwise hand-write
in SQL (SURVEY.md §2.8 completion)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pubic_multi_platform_to_postgres_spark.operators.dedup import tokenize
from pubic_multi_platform_to_postgres_spark.queries.registry import gate_verify, load, query

_EVENT_TYPES = ["click", "view", "purchase", "error"]


@query(
    "pivot_user_event_matrix",
    oracle=f"""
    SELECT user_id,
           {", ".join(f'''COUNT(*) FILTER (event_type = '{t}') AS n_{t}''' for t in _EVENT_TYPES)},
           {", ".join(
               "CAST(COALESCE(SUM(CAST(value AS DECIMAL(30,6))) FILTER (event_type = '"
               + t + "'), 0) AS DOUBLE) AS value_" + t
               for t in _EVENT_TYPES
           )}
    FROM events
    GROUP BY user_id
    """,
)
def pivot_user_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: one row per user, one (count, value-sum) column pair per
    event type. The pivot values are declared explicitly so the plan is a
    single-pass conditional aggregation — no extra distinct-values job,
    no second shuffle (the `pivot(col)` no-values form runs a collect
    first; never do that at 100 TB)."""
    ev = load(spark, sf_dir, "events")
    aggs = []
    for t in _EVENT_TYPES:
        is_t = F.col("event_type") == t
        aggs.append(F.count(F.when(is_t, 1)).alias(f"n_{t}"))
        aggs.append(
            F.coalesce(
                F.sum(F.when(is_t, F.col("value").cast("decimal(30,6)"))), F.lit(0)
            ).cast("double").alias(f"value_{t}")
        )
    return ev.groupBy("user_id").agg(*aggs)


@query(
    "unpivot_part_metrics",
    oracle="""
    SELECT p_partkey, 'retailprice' AS metric, CAST(p_retailprice AS DOUBLE) AS val
    FROM part
    UNION ALL
    SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS val
    FROM part
    """,
)
def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide part columns → long (key, metric, value) rows
    via the built-in ``unpivot`` — a projection-time explode, no shuffle."""
    return (
        load(spark, sf_dir, "part")
        .select("p_partkey", F.col("p_retailprice").cast("double"),
                F.col("p_size").cast("double"))
        .unpivot(
            "p_partkey",
            ["p_retailprice", "p_size"],
            "metric",
            "val",
        )
        .withColumn(
            "metric",
            F.when(F.col("metric") == "p_retailprice", "retailprice").otherwise("size"),
        )
    )


@query(
    "percentiles_order_value",
    oracle="""
    SELECT o_orderpriority,
           CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE) AS p50,
           CAST(quantile_cont(o_totalprice, 0.9) AS DOUBLE) AS p90,
           CAST(quantile_cont(o_totalprice, 0.99) AS DOUBLE) AS p99
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def percentiles_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles per group (Spark
    ``percentile`` ≡ DuckDB ``quantile_cont``). Exact needs a per-group
    sort; at 100 TB swap in ``approx_percentile`` (t-digest sketch, fixed
    memory) — same call shape, rows-only check."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.percentile("o_totalprice", F.lit(0.5)).alias("p50"),
            F.percentile("o_totalprice", F.lit(0.9)).alias("p90"),
            F.percentile("o_totalprice", F.lit(0.99)).alias("p99"),
        )
    )


@query(
    "text_top_tokens",
    oracle="""
    WITH toks AS (
        SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
        FROM documents
    )
    SELECT token, COUNT(*) AS n
    FROM toks
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT 50
    """,
)
def text_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide token frequency top-50 (vocabulary head): explode →
    map-side partial count → single shuffle on token → TakeOrdered top-k.
    Ties broken by token for determinism."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokenize(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.col("token"))
        .limit(50)
    )


@query(
    "ts_gapfill_hourly",
    oracle="""
    WITH b AS (
        -- epoch_us is an exact BIGINT; epoch(ts)::BIGINT would ROUND and
        -- push last-sub-second events into the next hour
        SELECT user_id,
               (epoch_us(ts) // 3600000000) * 3600 AS bucket_start,
               CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS v
        FROM events
        GROUP BY 1, 2
    ),
    spine AS (
        SELECT user_id, unnest(range(lo, hi + 3600, 3600)) AS bucket_start
        FROM (SELECT user_id, MIN(bucket_start) AS lo, MAX(bucket_start) AS hi
              FROM b GROUP BY user_id)
    )
    SELECT s.user_id,
           s.bucket_start,
           last_value(b.v IGNORE NULLS) OVER (
               PARTITION BY s.user_id ORDER BY s.bucket_start
               ROWS UNBOUNDED PRECEDING) AS hourly_value,
           b.v IS NULL AS filled
    FROM spine s LEFT JOIN b USING (user_id, bucket_start)
    """,
)
def ts_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample: per-user hourly value sums over each user's
    own time range, empty hours gap-filled by carrying the last
    observation forward (operators/timeseries.py). The hypertable
    continuous-aggregate shape: bucket agg -> sequence() spine ->
    left join -> ignorenulls window."""
    from pubic_multi_platform_to_postgres_spark.operators.timeseries import (
        gapfill_locf,
    )

    ev = load(spark, sf_dir, "events")
    return gapfill_locf(
        ev, "user_id", "ts",
        agg=F.sum(F.col("value").cast("decimal(30,6)")).cast("double"),
        bucket_s=3600, value_name="hourly_value",
    )


def _ewma_oracle() -> str:
    from pubic_multi_platform_to_postgres_spark.operators.timeseries import (
        ewma_anomaly_oracle_sql,
    )

    return ewma_anomaly_oracle_sql(
        "events", "user_id", ["ts", "event_id"], "value",
        alpha=0.25, depth=16, min_prior=4, factor=2.0,
    )


@query("ts_ewma_anomaly", oracle=_ewma_oracle())
def ts_ewma_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series anomaly detection: per-user bounded-depth EWMA
    baseline (α=0.25, 16 lags, weights renormalized over present
    history) and a spike flag for events worth more than 2× their own
    baseline with ≥4 events of history — the standard streaming-metrics
    alert rule, expressed as ONE keyed window (no recursion, no UDF,
    whole-stage codegen; see ``operators/timeseries.py:ewma_anomaly``
    for the truncation argument — the dropped tail mass is
    ``0.75^16 ≈ 1.0%``). Numerator/denominator are FIXED-ORDER addition
    chains with float64 weight literals, so the oracle's identical
    chains hash-match bit-for-bit.

    Scale: one shuffle keyed on user_id; the 16 ``lag()`` columns share
    a single WindowExec pass over each partition — per-key state is 16
    values regardless of history length, the same bounded-frame
    contract as the allowlisted decile windows."""
    from pubic_multi_platform_to_postgres_spark.operators.timeseries import (
        ewma_anomaly,
    )

    ev = load(spark, sf_dir, "events")
    return ewma_anomaly(
        ev, "user_id", ["ts", "event_id"], "value",
        alpha=0.25, depth=16, min_prior=4, factor=2.0,
    )


@query(
    "udaf_mad_order_value",
    oracle="""
    WITH m AS (
        SELECT o_orderpriority, quantile_cont(o_totalprice, 0.5) AS med
        FROM orders GROUP BY 1
    )
    SELECT o.o_orderpriority,
           CAST(quantile_cont(abs(o.o_totalprice - m.med), 0.5) AS DOUBLE)
               AS mad_price
    FROM orders o JOIN m USING (o_orderpriority)
    GROUP BY o.o_orderpriority
    """,
)
def udaf_mad_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF surface (§2.8): median absolute deviation per group as
    an Arrow grouped-agg pandas UDF (functions/udafs.py) — the JVM
    shuffles/groups, Python sees each group once as one Arrow batch.
    Selection-based, so bit-reproducible against the oracle's nested
    quantile construction."""
    from pubic_multi_platform_to_postgres_spark.functions.udafs import mad

    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(mad(F.col("o_totalprice")).alias("mad_price"))
    )


@query(
    "percentiles_disc_order_value",
    oracle="""
    SELECT o_orderpriority,
           CAST(quantile_disc(o_totalprice, 0.5) AS DOUBLE) AS p50_disc,
           CAST(quantile_disc(o_totalprice, 0.9) AS DOUBLE) AS p90_disc
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def percentiles_disc_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discontinuous (nearest-rank) percentiles per group — the
    selection-based quantile that returns an actual data value, needed
    when the metric must be attributable to a real row (a real order
    value, not an interpolation). Both engines' DISC definitions select
    the value at ``ceil(q·n)`` in sort order, so the result is exact and
    hash-stable; same single-aggregation plan as the CONT variant."""
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)")
        .cast("double")
        .alias("p50_disc"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)")
        .cast("double")
        .alias("p90_disc"),
    )


@query(
    "window_distinct_priorities_7d",
    oracle="""
    SELECT o1.o_orderkey,
           (SELECT COUNT(DISTINCT o2.o_orderpriority) FROM orders o2
            WHERE o2.o_custkey = o1.o_custkey
              AND o2.o_orderdate <= o1.o_orderdate
              AND o2.o_orderdate >= o1.o_orderdate - INTERVAL 7 DAYS
           ) AS n_priorities_7d
    FROM orders o1
    """,
)
def window_distinct_priorities_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct count over a trailing event-time window — the windowed
    cardinality ask (distinct sellers/devices per entity per week) that
    plain window COUNT can't answer (no DISTINCT over a frame in SQL).
    Expressed as ``size(array_distinct(collect_list))`` over a RANGE
    frame: state per row is bounded by the 7-day window's own rows, one
    window shuffle on the entity key. The oracle derives the same count
    with a correlated subquery — an independent construction."""
    orders = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_date(F.col("o_orderdate").cast("date")))
        .rangeBetween(-7, 0)
    )
    return orders.select(
        "o_orderkey",
        F.size(F.array_distinct(F.collect_list("o_orderpriority").over(w)))
        .cast("long")
        .alias("n_priorities_7d"),
    )


@query(
    "udtf_doc_windows",
    # ORACLE FIXTURE CAP: generate_series(0,127) assumes ≤ 128 4-word
    # windows per document (≤ 512 whitespace tokens — TESTDATA.md docs
    # are ~≤300). The engine side is unbounded; if a future fixture grows
    # longer documents, widen the series — a gate mismatch here is a
    # fixture-cap artifact, not an engine regression (ADVICE r4).
    oracle="""
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS ws
        FROM documents WHERE doc_id % 50 = 0
    )
    SELECT doc_id, g.i AS pos,
           array_to_string(list_slice(ws, g.i * 4 + 1, g.i * 4 + 4), ' ')
               AS wtext
    FROM w, generate_series(0, 127) g(i)
    WHERE g.i < CAST(ceil(len(ws) / 4.0) AS BIGINT)
    """,
)
def udtf_doc_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface (§2.8 completion alongside UDF/UDAF): a
    table-valued function LATERAL-joined per document, fanning each doc
    out to its 4-word windows. Arrow-optimized UDTF; the engine's
    PRODUCTION window splitter is the pure-JVM
    ``remove_repeated_windows`` path (see `corpus_remove_repetition`) —
    this entry exists because the UDTF API is part of the engine surface
    users port custom table functions onto, and its fan-out semantics
    are gate-checked against the same SQL reconstruction."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="pos int, wtext string", useArrow=True)
    class SplitWindows:
        def eval(self, text: str, w: int):
            words = (text or "").split(" ")
            for i in range(0, max(1, -(-len(words) // w))):
                yield i, " ".join(words[i * w : (i + 1) * w])

    spark.udtf.register("split_windows_udtf", SplitWindows)
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 50 == 0)
    docs.createOrReplaceTempView("udtf_docs_v")
    return spark.sql(
        "SELECT d.doc_id, s.pos, s.wtext "
        "FROM udtf_docs_v d, LATERAL split_windows_udtf(d.text, 4) s"
    )


@query(
    "window_trailing_7d_spend",
    oracle="""
    SELECT o_orderkey,
           o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate
               RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS spend_7d
    FROM orders
    """,
)
def window_trailing_7d_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval RANGE window frame (value-based, not row-count-based):
    per customer, total spend in the trailing 7 days including the
    current order. Spark expresses interval frames as rangeBetween over
    epoch seconds; the sum routes through DECIMAL so the frame total is
    order-independent (frames are recomputed per row — exactness matters
    doubly)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-7 * 86400, 0)
    )
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast("decimal(30,6)"))
        .over(w)
        .cast("double")
        .alias("spend_7d"),
    )


@query(
    "sql_scalar_subquery_parts",
    oracle="""
    SELECT p_partkey, CAST(p_retailprice AS DOUBLE) AS p_retailprice
    FROM part
    WHERE p_retailprice > 1.05 * (SELECT AVG(p_retailprice) FROM part)
    """,
)
def sql_scalar_subquery_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-text entry path (spark.sql) with a scalar subquery —
    Catalyst plans the subquery once as a broadcast scalar, not per-row
    (subquery handling is §2.8's 'free from Catalyst' row, exercised
    here explicitly). Predicate comparison is done in double on both
    sides; the AVG itself is compared only through the (identical)
    filter outcome, so low-bit aggregate order cannot flip membership
    unless a part sits within ~1e-12 of the threshold — prices have one
    decimal, so the nearest gap is ~1e-3. The 1.05 multiplier selects the
    top price tail (~2.5% of parts, 50 rows at sf0.01) so the oracle
    comparison runs on real rows at every tested scale factor."""
    load(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql("""
        SELECT p_partkey, CAST(p_retailprice AS DOUBLE) AS p_retailprice
        FROM part
        WHERE p_retailprice > 1.05 * (SELECT AVG(p_retailprice) FROM part)
    """)


# Per-user chain-length bound: one hot key (bot traffic) must never build
# an unbounded array in a single aggregation buffer. 10k events is far
# beyond any human session; beyond it the chain truncates (first 10k by
# time) while n_events still reports the true total. See SCALE.md.
JOURNEY_CAP = 10_000


@query(
    "user_event_journey",
    oracle=f"""
    WITH r AS (
        SELECT user_id, event_type, ts, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS total
        FROM events
    )
    SELECT user_id,
           string_agg(CASE WHEN rn <= {JOURNEY_CAP} THEN event_type END,
                      '>' ORDER BY ts, event_id) AS journey,
           MAX(total) AS n_events
    FROM r
    GROUP BY user_id
    """,
)
def user_event_journey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence assembly: per user, the time-ordered chain of
    event types — the op that builds training sequences (conversations,
    session traces) out of an event log. ``collect_list`` gives no order
    guarantee; determinism comes from collecting (ts, event_id, type)
    structs and ``sort_array`` (lexicographic struct order = the ORDER BY
    key).

    Bounded state: a ``row_number`` tail-filter caps each user's chain at
    ``JOURNEY_CAP`` events BEFORE the collect, so a hot key (bot traffic)
    can never grow an aggregation buffer past the cap — the filter bounds
    what enters the buffer, unlike a post-hoc ``slice``. The window and
    the groupBy share the ``user_id`` hash partitioning, so the cap costs
    a sort within the one existing shuffle, not an extra exchange;
    ``n_events`` still reports the true total via the same window."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    capped = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_total", F.count(F.lit(1)).over(Window.partitionBy("user_id")))
        .filter(F.col("_rn") <= JOURNEY_CAP)
    )
    seq = F.sort_array(
        F.collect_list(F.struct("ts", "event_id", "event_type"))
    )
    return (
        capped.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(seq, lambda x: x["event_type"]), ">"
            ).alias("journey"),
            F.max("_total").alias("n_events"),
        )
    )


@query(
    "window_rank_family_orders",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(NTILE(4) OVER w AS INTEGER) AS spend_quartile,
           ROUND(PERCENT_RANK() OVER w, 9) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 9) AS cume,
           CAST(RANK() OVER w AS INTEGER) AS rnk,
           CAST(DENSE_RANK() OVER w AS INTEGER) AS drnk
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_rank_family_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ranking-window family in one pass: ntile quartiles,
    percent_rank, cume_dist, rank, dense_rank per priority group — the
    feature-bucketing transform (spend quartiles) ML feature pipelines
    derive from fact tables. All five functions share ONE window spec,
    so Catalyst plans a single shuffle + sort; the order key is
    tie-broken by primary key to keep every rank deterministic.
    percent_rank/cume_dist round at 1e-9 (per-row double division is
    deterministic, but the two engines' (n-1) denominators must agree
    through division, so pin the printable precision)."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("spend_quartile"),
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@query(
    "sql_exists_customers_with_urgent",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND LOWER(o.o_orderpriority) LIKE '%urgent%'
    )
    """,
)
def sql_exists_customers_with_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS through the SQL text path: Catalyst rewrites the
    subquery to a left-semi join (RewritePredicateSubquery), so the plan
    is the same single-shuffle semi join the DataFrame API would give —
    the correlated-subquery entry users port straight from Postgres."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql("""
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND LOWER(o.o_orderpriority) LIKE '%urgent%'
        )
    """)


@query(
    "percentiles_approx_order_value",
    oracle="""
    SELECT o_orderpriority,
           CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE) AS p50,
           CAST(quantile_cont(o_totalprice, 0.9) AS DOUBLE) AS p90,
           CAST(quantile_cont(o_totalprice, 0.99) AS DOUBLE) AS p99,
           TRUE AS sketch_rank_ok
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def percentiles_approx_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB percentile path: ``approx_percentile`` (mergeable
    quantile sketch, fixed memory per group, partial+final aggregation)
    with the same call shape as the exact query — swap one function name
    when the per-group sort stops fitting.

    Hash-checkable sketch contract: the sketch's value is engine-specific,
    so the EXPORTED percentiles are the exact ones and the sketch is
    checked in-plan — ``sketch_rank_ok`` verifies the GK guarantee (rank
    error ≤ ε·N + 1, ε = 1/accuracy), which holds for ANY merge order /
    partitioning, against ranks recomputed from the data. The oracle
    asserts the literal TRUE: a sketch breaking its bound flips the
    column and fails the hash match.

    Under ``SPARK_GRAFT_BENCH=1`` (bench.py) only the production path
    runs: one partial+final ``approx_percentile`` aggregation, no exact
    percentiles, no rank-check join — the cost a user actually pays at
    100 TB. The gate always runs the full verification plan."""
    orders = load(spark, sf_dir, "orders")
    if not gate_verify():
        return orders.groupBy("o_orderpriority").agg(
            F.approx_percentile("o_totalprice", F.lit(0.5), F.lit(10000)).alias("p50"),
            F.approx_percentile("o_totalprice", F.lit(0.9), F.lit(10000)).alias("p90"),
            F.approx_percentile("o_totalprice", F.lit(0.99), F.lit(10000)).alias("p99"),
            F.lit(True).alias("sketch_rank_ok"),
        )
    sketch = orders.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("p50"),
        F.percentile("o_totalprice", F.lit(0.9)).alias("p90"),
        F.percentile("o_totalprice", F.lit(0.99)).alias("p99"),
        F.approx_percentile("o_totalprice", F.lit(0.5), F.lit(10000)).alias("a50"),
        F.approx_percentile("o_totalprice", F.lit(0.9), F.lit(10000)).alias("a90"),
        F.approx_percentile("o_totalprice", F.lit(0.99), F.lit(10000)).alias("a99"),
        F.count(F.lit(1)).alias("n"),
    )
    ranks = (
        orders.join(
            F.broadcast(sketch.select("o_orderpriority", "a50", "a90", "a99", "n")),
            "o_orderpriority",
        )
        .groupBy("o_orderpriority")
        .agg(*[
            F.sum((F.col("o_totalprice") <= F.col(a)).cast("long")).alias(f"r{p}")
            for a, p in (("a50", 50), ("a90", 90), ("a99", 99))
        ])
    )
    eps_n = F.col("n") / F.lit(10000) + F.lit(1.0)
    ok = (
        (F.abs(F.col("r50") - 0.50 * F.col("n")) <= eps_n)
        & (F.abs(F.col("r90") - 0.90 * F.col("n")) <= eps_n)
        & (F.abs(F.col("r99") - 0.99 * F.col("n")) <= eps_n)
    )
    return (
        sketch.join(ranks, "o_orderpriority")
        .select("o_orderpriority", "p50", "p90", "p99", ok.alias("sketch_rank_ok"))
    )


@query(
    "window_ratio_to_report",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS group_revenue,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE)
                 / CAST(SUM(SUM(CAST(l_extendedprice AS DECIMAL(30,6))))
                        OVER (PARTITION BY l_returnflag) AS DOUBLE), 9)
               AS share_of_flag
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def window_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each (flag, status) group's revenue share within
    its flag — aggregate + window-over-aggregate in ONE plan (the window
    input is the groups-sized aggregate, so the second pass is
    negligible; never a self-join back to recompute totals). Decimal
    sums keep both levels exact; the final ratio is one double division
    rounded at 1e-9."""
    li = load(spark, sf_dir, "lineitem")
    grouped = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(30,6)")).alias("_rev_dec")
    )
    w = Window.partitionBy("l_returnflag")
    return grouped.select(
        "l_returnflag",
        "l_linestatus",
        F.col("_rev_dec").cast("double").alias("group_revenue"),
        F.round(
            F.col("_rev_dec").cast("double")
            / F.sum("_rev_dec").over(w).cast("double"),
            9,
        ).alias("share_of_flag"),
    )


@query(
    "window_rolling_5_purchases",
    oracle="""
    SELECT event_id, user_id,
           CAST(COUNT(*) FILTER (event_type = 'purchase') OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING
           ) AS BIGINT) AS purchases_in_last5
    FROM events
    """,
)
def window_rolling_5_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded ROWS frame: for every event, how many of the user's
    previous 5 events were purchases — the recent-behavior feature
    (propensity models) computed per row. Completes the frame matrix:
    unbounded-preceding (running), RANGE interval (trailing 7d), and now
    a bounded rows-preceding frame, all one shuffle on the user key.
    The frame excludes the current row (1 PRECEDING) so the feature
    never leaks the label event itself."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-5, -1)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.when(F.col("event_type") == "purchase", 1))
        .over(w)
        .alias("purchases_in_last5"),
    )


@query(
    "window_rolling_median_value",
    oracle="""
    WITH framed AS (
        SELECT event_id, user_id, value,
               list(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
               ) AS vals
        FROM events
        WHERE value IS NOT NULL
    )
    SELECT event_id, user_id, value,
           CAST(len(vals) AS INTEGER) AS n_window,
           list_sort(vals)[CAST(ceil(len(vals) / 2.0) AS INTEGER)]
               AS med_value
    FROM framed
    """,
)
def window_rolling_median_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling ROBUST baseline: per user, the exact discrete median
    (nearest-rank-lower) of the trailing 7 values — the smoother that
    shrugs off the spikes `ts_ewma_anomaly` exists to flag (a mean-based
    baseline is dragged by the very outlier it should ignore; the
    median is not). Median-by-SELECTION, not arithmetic: the emitted
    value is one of the inputs, so cross-engine hash parity is free.

    NULL policy (r11 advisory): ``value`` is nullable per FIXTURES.md,
    and Spark's ``collect_list`` DROPS nulls while DuckDB's ``list()``
    keeps them — so NULL rows are filtered out SYMMETRICALLY on both
    sides before framing (a NULL reading carries no signal for a
    median baseline; excluding it is the analyst semantics too).

    Scale: one shuffle on the user key; the frame is 7 rows by
    construction (collect over a bounded ROWS frame, array_sort of ≤7
    elements per row) — per-row state is O(frame), independent of
    history length, the same bounded-frame contract as the lag family."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
    )
    vals = F.array_sort(F.collect_list("value").over(w))
    n = F.size(vals)
    return ev.select(
        "event_id",
        "user_id",
        "value",
        n.cast("int").alias("n_window"),
        F.element_at(vals, F.ceil(n / F.lit(2.0)).cast("int")).alias(
            "med_value"
        ),
    )


@query(
    "window_longest_streak",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rnt
        FROM events
    ),
    islands AS (
        SELECT user_id, event_type,
               CAST(COUNT(*) AS BIGINT) AS streak_len,
               MIN(event_id) AS first_event,
               MAX(event_id) AS last_event
        FROM seq GROUP BY user_id, event_type, rn - rnt
    ),
    best AS (
        SELECT user_id, event_type, streak_len, first_event, last_event,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id
                   ORDER BY streak_len DESC, first_event
               ) AS pick
        FROM islands WHERE event_type = 'purchase'
    )
    SELECT user_id, streak_len, first_event, last_event
    FROM best WHERE pick = 1
    """,
)
def window_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's LONGEST unbroken run of consecutive
    purchase events (no other event type in between), with the island's
    first/last event ids — the classic streak/retention device (login
    streaks, consecutive-day activity) via the two-row_number trick:
    ``rn - rnt`` is constant exactly within an unbroken same-type run,
    so one groupBy on it materializes every island without a self-join.
    Ties (equal longest streaks) break to the earliest island.

    Scale: both row_numbers ride ONE user-keyed window shuffle (same
    partitioning, Catalyst plans a single exchange), the island groupBy
    re-shuffles island keys (≤ one per event), and the final pick is a
    per-user window over islands — every stage keyed, nothing global."""
    ev = load(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wt = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        "event_id",
        (F.row_number().over(wu) - F.row_number().over(wt)).alias("island"),
    )
    islands = (
        seq.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "event_type", "island")
        .agg(
            F.count(F.lit(1)).cast("long").alias("streak_len"),
            F.min("event_id").alias("first_event"),
            F.max("event_id").alias("last_event"),
        )
    )
    pick = Window.partitionBy("user_id").orderBy(
        F.desc("streak_len"), "first_event"
    )
    return (
        islands.withColumn("pick", F.row_number().over(pick))
        .filter(F.col("pick") == 1)
        .select("user_id", "streak_len", "first_event", "last_event")
    )


# Mega-basket cap for the pair self-join (VERDICT r11 Next #1): C(items, 2)
# per basket is quadratic on a power key, so baskets above the cap are
# deterministically down-sampled to exactly the cap before pairing. 64 is
# ~9× the largest TPC-H basket (7 distinct parts per order), so the gate
# fixture's output is bit-identical to the uncapped plan, while a planted
# 10⁵-item basket costs C(64,2) = 2,016 pair rows instead of ~5×10⁹.
_BASKET_ITEM_CAP = 64


def basket_pair_supports(
    items: DataFrame, min_support: int, cap: int | None
) -> DataFrame:
    """Co-occurrence supports ``(part_a, part_b, n_pair)`` over distinct
    ``(l_orderkey, l_partkey)`` basket items, with the mega-basket cap.

    ``cap=None`` is the exact uncapped self-join (the measurement face
    ``tools/bench_skew.py`` runs to price the cap); otherwise baskets
    with more than ``cap`` distinct items keep only their top-``cap``
    items by a GLOBAL deterministic priority — ``xxhash64(l_partkey)``
    with the key itself as tiebreak. Priority is a pure function of the
    part key (not the basket), so two mega baskets sharing a part set
    keep the SAME subset and kept×kept pair supports stay exact; only
    pairs touching a dropped item undercount (see the loss contract in
    ``basket_lift_part_pairs``).

    Plan shape: basket sizes are one partial-agg shuffle; the (few, by
    definition skew-headed) over-cap basket keys broadcast, so the
    common path pays one broadcast ANTI join and only over-cap rows pay
    the rank. The rank over a 10⁷-item power basket is one O(m log m)
    sort group — the bounded replacement for the m² join fan-out it
    prevents."""
    if cap is not None:
        mega = (
            items.groupBy("l_orderkey")
            .agg(F.count(F.lit(1)).alias("_bsz"))
            .filter(F.col("_bsz") > cap)
            .select("l_orderkey")
        )
        keep_w = Window.partitionBy("l_orderkey").orderBy(
            F.xxhash64("l_partkey"), "l_partkey"
        )
        capped_mega = (
            items.join(F.broadcast(mega), "l_orderkey", "left_semi")
            .withColumn("_rk", F.row_number().over(keep_w))
            .filter(F.col("_rk") <= cap)
            .drop("_rk")
        )
        items = items.join(
            F.broadcast(mega), "l_orderkey", "left_anti"
        ).unionAll(capped_mega)
    a = items.alias("a")
    b = items.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
        .filter(F.col("n_pair") >= min_support)
    )


@query(
    "basket_lift_part_pairs",
    oracle="""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
          FROM items),
    freq AS (
        SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_part
        FROM items GROUP BY l_partkey
    ),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               CAST(COUNT(*) AS BIGINT) AS n_pair
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    )
    SELECT p.part_a, p.part_b, p.n_pair, fa.n_part AS n_a,
           fb.n_part AS n_b,
           CAST(p.n_pair AS DOUBLE) / CAST(fa.n_part AS DOUBLE)
               AS conf_a_to_b,
           (CAST(p.n_pair AS DOUBLE) * CAST(n.n_orders AS DOUBLE))
               / (CAST(fa.n_part AS DOUBLE) * CAST(fb.n_part AS DOUBLE))
               AS lift
    FROM pairs p
    JOIN freq fa ON fa.l_partkey = p.part_a
    JOIN freq fb ON fb.l_partkey = p.part_b
    CROSS JOIN n
    WHERE p.n_pair >= 3
    """,
)
def basket_lift_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over orders-as-baskets: for every
    part pair co-purchased in ≥3 orders, support, confidence(a→b) and
    LIFT (co-occurrence vs independence) — the a-priori first pass /
    recommender bootstrap the reference's Postgres consumers would
    hand-write. Counts are exact integers; confidence/lift are single
    mirrored double divisions, so the gate hash-checks them.

    Scale: the pair generator is a SELF-JOIN of distinct basket items on
    the basket key — fan-out per order is C(items, 2), so a single power
    key (a crawl sitemap page, a B2B catalog order with 10⁵ lines) costs
    m² alone. The MEGA-BASKET CAP (``_BASKET_ITEM_CAP``) bounds it:
    baskets above the cap are deterministically sampled down to the cap
    BEFORE the self-join (top-N by a global xxhash64 priority on the
    part key — the same subset of a part set is kept in EVERY basket, so
    co-occurrence among kept items stays exact). TPC-H baskets are ≤7
    items, far under the cap, so the fixture output — and the oracle —
    is unchanged; ``BENCH_SKEW_r12.json``'s basket section measures the
    capped-vs-uncapped curve on a planted power basket.

    LOSS CONTRACT (stated, enforced, measured): pair supports only
    UNDERCOUNT — never over — and only baskets over the cap can drop a
    vote. Within one over-cap basket the kept top-N is ranked by a
    global hash priority on the part key, so kept×kept supports are
    exact across baskets sharing the SAME part set (the planted-fixture
    case); a pair spanning differently-composed mega baskets may
    additionally undercount, because each basket keeps its own top-N
    and a part kept in one mix can be dropped in another.
    ``freq`` and ``n_orders`` come from the UNCAPPED items, so
    confidence and lift for an affected pair are biased DOWN (never up)
    — a capped run can hide a rule, never invent one.

    Frequencies broadcast (parts is a dimension); the 1-row order count
    rides in as a broadcast too. Min-support prunes BEFORE the frequency
    joins, keeping the joined stream output-sized."""
    li = load(spark, sf_dir, "lineitem")
    # materialize the distinct basket items ONCE: the order count, the
    # part frequencies, the mega-basket size pass, and both pair-join
    # sides all read this subtree — without the checkpoint Catalyst
    # replays the scan+distinct per consumer (measured: 20 lineitem
    # scans / 26 exchanges in the uncheckpointed plan; at 100 TB that
    # is re-reading the fact table per consumer). Lazy (eager=False):
    # materializes at the n_orders fetch below, not at plan
    # construction, and repeated invocations in one session don't each
    # queue an extra eager job before first use.
    items = (
        li.select("l_orderkey", "l_partkey")
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_orders = items.select("l_orderkey").distinct().count()
    freq = items.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_part")
    )
    pairs = basket_pair_supports(items, min_support=3,
                                 cap=_BASKET_ITEM_CAP)
    fa = freq.select(
        F.col("l_partkey").alias("part_a"), F.col("n_part").alias("n_a")
    )
    fb = freq.select(
        F.col("l_partkey").alias("part_b"), F.col("n_part").alias("n_b")
    )
    return (
        pairs.join(fa, "part_a")
        .join(fb, "part_b")
        .select(
            "part_a",
            "part_b",
            "n_pair",
            "n_a",
            "n_b",
            (F.col("n_pair").cast("double") / F.col("n_a").cast("double"))
            .alias("conf_a_to_b"),
            (
                (F.col("n_pair").cast("double") * F.lit(float(n_orders)))
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
            ).alias("lift"),
        )
    )


from pubic_multi_platform_to_postgres_spark.operators import graph as _graph  # noqa: E402


def purchase_graph(spark: SparkSession, sf_dir: str):
    """The customer↔supplier purchase graph: undirected edges weighted
    by lineitem count (node encoding 2·custkey / 2·suppkey+1), nodes =
    all customers and suppliers. Shared by the gate query below and by
    ``tools/bench_scale.py``'s convergence-early-exit measurement."""
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    customer = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")

    base = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.count(F.lit(1)).alias("w"))
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
            "w",
        )
    )
    edges = base.unionAll(
        base.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    nodes = (
        customer.select((F.col("c_custkey") * 2).alias("node"))
        .unionAll(supplier.select((F.col("s_suppkey") * 2 + 1).alias("node")))
    )
    return nodes, edges


@query(
    "graph_pagerank_purchases",
    oracle=_graph.purchase_pagerank_oracle_sql(iters=10),
)
def graph_pagerank_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the customer↔supplier purchase graph —
    the iterative join+aggregate family behind link-graph corpus
    weighting (PageRank, Brin & Page 1998; Common Crawl ranks pages the
    same way before corpus builders sample them). Nodes are all
    customers and suppliers (isolated customers keep their
    teleport-only rank); edges are undirected purchase relations
    weighted by lineitem count; ranks are integer-quantized and every
    one of the 10 fixed iterations is replayed CTE-by-CTE by the DuckDB
    oracle, so the gate proves each distributed rank round bit-exact —
    see ``operators/graph.py`` for the arithmetic, damping, overflow
    bound, and the 100 TB shuffle shape (edge and node tables built and
    partitioned ONCE, per-round shuffles bounded by |nodes| + |edges|,
    rank-vector broadcast kicking in automatically on small graphs)."""
    nodes, edges = purchase_graph(spark, sf_dir)
    # r16 (VERDICT r15 Next #1): |nodes| = |customer| + |supplier| read
    # from the parquet FOOTER metadata (plans/stats.py parquet_rows — the
    # manifest statistic a real catalog maintains), so the regime route
    # costs zero live jobs per run; a missing footer (non-file source)
    # falls back to the operator's one cached-scan count().
    from pubic_multi_platform_to_postgres_spark.plans.stats import parquet_rows

    base = sf_dir.rstrip("/")
    n_cust = parquet_rows(f"{base}/customer.parquet")
    n_supp = parquet_rows(f"{base}/supplier.parquet")
    n_nodes = (n_cust + n_supp) if (n_cust is not None and n_supp is not None) else None
    ranks = _graph.weighted_pagerank(nodes, edges, iters=10, n_nodes=n_nodes)
    return ranks.select(
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("kind"),
        F.floor(F.col("node") / 2).cast("long").alias("ref_id"),
        "rank_q",
    )


@query(
    "graph_cluster_coefficient",
    oracle="""
    WITH t AS (
        SELECT doc_id, lang, n_chars // 50 AS len_bucket,
               list_distinct(string_split_regex(trim(lower(text)), '\\s+'))
                   AS grams
        FROM documents
    ),
    p AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM t a JOIN t b
          ON a.lang = b.lang AND a.len_bucket = b.len_bucket
         AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
              / CAST(len(a.grams) + len(b.grams)
                     - len(list_intersect(a.grams, b.grams)) AS DOUBLE) >= 0.5
    ),
    tri AS (
        SELECT e1.id_a AS a, e1.id_b AS b, e2.id_b AS c
        FROM p e1 JOIN p e2 ON e2.id_a = e1.id_b
                  JOIN p e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b
    ),
    tcnt AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
            SELECT a AS node FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri
        ) GROUP BY node
    ),
    deg AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
            SELECT id_a AS node FROM p UNION ALL SELECT id_b FROM p
        ) GROUP BY node
    )
    SELECT d.node AS doc_id, d.degree,
           COALESCE(tc.n_triangles, 0) AS n_triangles,
           CASE WHEN d.degree >= 2
                THEN CAST(2 * COALESCE(tc.n_triangles, 0) AS DOUBLE)
                     / CAST(d.degree * (d.degree - 1) AS DOUBLE)
                ELSE CAST(0 AS DOUBLE)
           END AS clustering_coef
    FROM deg d LEFT JOIN tcnt tc ON tc.node = d.node
    """,
)
def graph_cluster_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle count and local clustering coefficient over the
    exact-Jaccard near-dup pair graph — the cluster-QUALITY signal a
    dedup pipeline reads before collapsing: coefficient ≈ 1 means the
    component is a genuine duplicate clique (safe to keep one doc);
    low coefficient flags chain-shaped components, the signature of
    banding false positives or threshold-straddling pairs, where
    keep-one collapse would destroy non-duplicates. Triangles come from
    the standard oriented enumeration (``a < b < c`` via two edge
    self-joins on the ordered pair list — each triangle counted exactly
    once, then credited to all three corners); degree from the
    symmetrized edge list; coefficient = 2·T / (deg·(deg−1)).

    Scale: the pair graph is the measured prefix-filter output (near-dup
    pairs, ≪ corpus); the triangle join is edge-list⨝edge-list on node
    keys — the oriented form keeps it to two equi-joins with no
    direction double-count, and at 100 TB you run it per connected
    component (bounded by the cluster-size cap every production dedup
    imposes). One IEEE division of exact integers per node. The oracle
    replays pairs, orientation, both joins, and the coefficient."""
    docs = load(spark, sf_dir, "documents").withColumn(
        "len_bucket", F.floor(F.col("n_chars") / 50)
    )
    from pubic_multi_platform_to_postgres_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    p = (
        ngram_jaccard_pairs(
            docs, "text", "doc_id",
            block_cols=["lang", "len_bucket"], threshold=0.5, ngram=1,
        )
        .select("id_a", "id_b")
        .localCheckpoint(eager=False)
    )
    # r15 (guide §2.3/§3): per-edge common-neighbor counting replaced the
    # oriented wedge enumeration (12.2M wedge rows at sf0.1). r16
    # (VERDICT r15 Next #5): the adjacency attach is now degree-CAPPED —
    # a hub endpoint's array never ships per-edge; hub-incident edges
    # count candidates through a narrow-row membership join instead.
    # Same exact integers; see operators/graph.py local_clustering for
    # the payload bound and the planted-hub measurements
    # (BENCH_SKEW_r16.json: 50k-degree hub 14.7–28.1 s → 3.2 s).
    return _graph.local_clustering(p)


@query(
    "journey_transition_matrix",
    oracle="""
    WITH nxt AS (
        SELECT event_type AS src_event,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS dst_event
        FROM events
    ),
    t AS (
        SELECT src_event, dst_event, CAST(COUNT(*) AS BIGINT) AS n
        FROM nxt WHERE dst_event IS NOT NULL
        GROUP BY src_event, dst_event
    )
    SELECT src_event, dst_event, n,
           CAST(n AS DOUBLE)
           / CAST(SUM(n) OVER (PARTITION BY src_event) AS DOUBLE) AS prob
    FROM t
    """,
)
def journey_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over user event journeys —
    the behavioral-analytics table next-event prediction, funnel
    leakage analysis, and bot detection all start from: for every
    (current, next) event-type pair, the transition count and the
    row-normalized probability (one IEEE division of exact counts, so
    the gate hash-checks it). Successor pairs come from a LEAD window
    per user ordered by (ts, event_id) — the deterministic journey
    order ``user_event_journey`` established.

    Scale: one shuffle on user_id for the LEAD window (the same
    partitioning every sessionization query pays), then a bounded
    aggregate — the transition table is |event_types|² whatever the
    corpus, and the row normalization windows over that tiny table."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = ev.select(
        F.col("event_type").alias("src_event"),
        F.lead("event_type").over(w).alias("dst_event"),
    ).filter(F.col("dst_event").isNotNull())
    t = nxt.groupBy("src_event", "dst_event").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    wr = Window.partitionBy("src_event")
    return t.select(
        "src_event", "dst_event", "n",
        (F.col("n").cast("double") / F.sum("n").over(wr).cast("double"))
        .alias("prob"),
    )
