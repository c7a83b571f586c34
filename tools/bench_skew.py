#!/usr/bin/env python
"""Adversarial-skew curves for the pair-generator family (VERDICT r10
Next #1).

``BENCH_SF1_*.json``'s growth curves run on the benign replica corpora
(`make_scaled_sf.py`: token-disjoint replicas, no hot keys). This bench
re-measures the pair-generator faces (the five the r10 verdict named
plus the two round-11 collapse re-plans) on the Zipfian boilerplate
fixture from ``make_skew_fixture.py`` (one dominant language, a 15%
stratum sharing a 30-token boilerplate passage, exact clones, verbatim
quotes) at 1×/10×/30× — recording, per query per scale point: wall
clock, OUTPUT rows, and for the prefix-filter generators the CANDIDATE
volume (the quantity that must stay output-bounded for the 100-TB story
to hold under skew). A second fixture face plants a hot relational key
(one customer owning 30% of orders) and measures the plain vs salted
join, the hot-key aggregate, and the skew audit's detection of the key
(``relational_hot_key``). A third fixture face (r12) plants a POWER
BASKET whose distinct item count grows with the corpus plus a dense
repeated-basket stratum, and prices the mega-basket item cap:
capped-vs-uncapped pair-stage wall clock and the pairs the cap loses
(``basket_mega_cap``). Two more r12 sections: ``collapse_strategy``
records the measured duplication mass + the planner rule's decision per
corpus (including a CLONE-HEAVY point where the rule flips to
'collapse'), and ``url_hot_canon`` prices the aggregate-only vs
rank-window keep-doc election under a planted Zipf-head URL.

Usage::

    python tools/bench_skew.py --out BENCH_SKEW_r12.json
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

import __spark_entry__ as entry  # noqa: E402
from make_skew_fixture import build  # noqa: E402

from pubic_multi_platform_to_postgres_spark.session import get_session  # noqa: E402

SKEW1 = "/tmp/spark_graft_skew1"
SKEW10 = "/tmp/spark_graft_skew10"
SKEW30 = "/tmp/spark_graft_skew30"
POINTS = (("skew1", SKEW1, 1), ("skew10", SKEW10, 10), ("skew30", SKEW30, 30))

# The r10-named faces + the r11 collapse re-plans + the r12 planner
# rows. All read only `documents`. The two forced `_collapsed` faces
# were retired from the registry in r12 (planner rule, VERDICT r11 Next
# #3) but stay measured here via their demoted module functions.
QUERIES = [
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_collapsed",
    "dedup_ngram_jaccard_auto",
    "dedup_containment_pairs",
    "dedup_containment_pairs_collapsed",
    "dedup_containment_pairs_auto",
    "dedup_shared_substrings",
    "corpus_leakage_safe_split",
    "dedup_minhash_pairs",
]


def _resolve_query(qs: dict, name: str):
    """Registry row, or a demoted measurement face from queries.llmdata."""
    if name in qs:
        return qs[name]
    from pubic_multi_platform_to_postgres_spark.queries import llmdata

    return getattr(llmdata, name)


def _run_guarded(spark, fn, timeout_s: float):
    """(wall_s, row_count | None, timed_out) for one .count() action."""
    group = f"skew-{time.monotonic_ns()}"
    sc = spark.sparkContext
    done = threading.Event()

    def watchdog():
        if not done.wait(timeout_s):
            sc.cancelJobGroup(group)

    t = threading.Thread(target=watchdog, daemon=True)
    sc.setJobGroup(group, "bench_skew", interruptOnCancel=True)
    t.start()
    t0 = time.perf_counter()
    try:
        n = fn().count()
        return time.perf_counter() - t0, int(n), False
    except Exception:  # noqa: BLE001
        el = time.perf_counter() - t0
        if el < timeout_s:
            raise
        return el, None, True
    finally:
        done.set()
        sc.setJobGroup("", "")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(REPO / "BENCH_SKEW_r12.json"))
    ap.add_argument("--timeout", type=float, default=600.0)
    ap.add_argument(
        "--sections",
        default="queries,candidates,relational,basket,strategy,urlhot,asofhot,asoffwd,asofnear,asofauto,cchub",
        help="comma list of sections to (re)run; others merge from --out",
    )
    args = ap.parse_args()
    sections = set(args.sections.split(","))

    for out, factor in ((SKEW1, 1), (SKEW10, 10), (SKEW30, 30)):
        if not Path(out, "documents.parquet").exists():
            build("/root/testdata/sf0.1", factor, out)

    spark = get_session(app_name="spark_graft_bench_skew")
    spark.sparkContext.setLogLevel("ERROR")

    report: dict = {
        "fixture": {
            "generator": "tools/make_skew_fixture.py",
            "strata_per_mille": {"clone": 3, "quote": 1, "boiler": 150,
                                 "body": 846},
            "points": {lbl: f for lbl, _, f in POINTS},
        },
        "queries": {},
    }
    out_path = Path(args.out)
    if out_path.exists():
        prior = json.loads(out_path.read_text())
        for key in ("queries", "candidate_counts", "relational_hot_key",
                    "basket_mega_cap", "collapse_strategy", "url_hot_canon",
                    "asof_hot_key", "asof_hot_key_forward",
                    "asof_hot_key_nearest", "asof_auto_route", "cc_hub_star"):
            if key in prior:
                report[key] = prior[key]
    qs = entry.queries()
    for name in QUERIES if "queries" in sections else []:
        fn = _resolve_query(qs, name)
        report["queries"][name] = {}
        for label, sf_dir, _ in POINTS:
            wall, rows, to = _run_guarded(
                spark, lambda: fn(spark, sf_dir), args.timeout
            )
            row = (
                {"timed_out": True, "timeout_s": args.timeout}
                if to
                else {"wall_s": round(wall, 3), "output_rows": rows}
            )
            report["queries"][name][label] = row
            print(f"  {label:7s} {name}: {row}", file=sys.stderr)
            out_path.write_text(json.dumps(report, indent=2) + "\n")

    # Candidate volume for the two prefix-filter generators — the
    # pre-verification probe size that must stay output-bounded under
    # boilerplate for the rarest-first ordering argument to survive.
    from pyspark.sql import functions as F

    from pubic_multi_platform_to_postgres_spark.operators.dedup import (
        containment_candidates,
        ngram_jaccard_candidates,
    )
    from pubic_multi_platform_to_postgres_spark.queries.registry import load

    cand: dict = report.get(
        "candidate_counts", {"jaccard": {}, "containment": {}}
    )
    for label, sf_dir, _ in POINTS if "candidates" in sections else []:
        docs = load(spark, sf_dir, "documents")
        blocked = docs.withColumn("len_bucket", F.floor(F.col("n_chars") / 50))
        t0 = time.perf_counter()
        nj = ngram_jaccard_candidates(
            blocked, "text", "doc_id",
            block_cols=["lang", "len_bucket"], threshold=0.5, ngram=1,
        ).count()
        cand["jaccard"][label] = {
            "wall_s": round(time.perf_counter() - t0, 3),
            "candidate_pairs": int(nj),
        }
        t0 = time.perf_counter()
        nc = containment_candidates(
            docs, "text", "doc_id", ["lang"], threshold=0.5, ngram=3
        ).count()
        cand["containment"][label] = {
            "wall_s": round(time.perf_counter() - t0, 3),
            "candidate_pairs": int(nc),
        }
        print(f"  cand    {label}: {cand['jaccard'][label]} / "
              f"{cand['containment'][label]}", file=sys.stderr)
        report["candidate_counts"] = cand
        out_path.write_text(json.dumps(report, indent=2) + "\n")

    # Hot-KEY relational skew (one customer owns 30% of orders at every
    # scale — the Zipf head): the plain AQE-skew-split join, the salted
    # join, and the hot-key aggregate must all track |orders|, not the
    # hot key's square; dq_join_skew_audit must SEE the hot key.
    from make_skew_fixture import build_relational_skew

    from pubic_multi_platform_to_postgres_spark.operators.layout import (
        salted_join,
    )

    rel: dict = report.get("relational_hot_key", {})
    for label, sf_dir, factor in POINTS if "relational" in sections else []:
        build_relational_skew("/root/testdata/sf0.1", factor, sf_dir)
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
            F.col("c_custkey").alias("o_custkey"), "c_name"
        )
        row: dict = {}
        t0 = time.perf_counter()
        row["join_plain_rows"] = int(orders.join(cust, "o_custkey").count())
        row["join_plain_s"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        row["join_salted_rows"] = int(
            salted_join(orders, cust, "o_custkey", salt=8).count()
        )
        row["join_salted_s"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        agg = (
            orders.groupBy("o_custkey")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("o_totalprice").cast("decimal(30,6)")).alias("s"))
        )
        top = agg.orderBy(F.desc("n")).limit(1).first()
        row["agg_s"] = round(time.perf_counter() - t0, 3)
        row["hot_key_rows"] = int(top["n"])
        t0 = time.perf_counter()
        audit = (
            qs["dq_join_skew_audit"](spark, sf_dir)
            .filter(F.col("rank") == 1)
            .first()
        )
        row["skew_audit_s"] = round(time.perf_counter() - t0, 3)
        row["skew_audit_hot_key_rows"] = int(audit["key_rows"])
        row["skew_audit_salting_recommended"] = bool(
            audit["salting_recommended"]
        )
        rel[label] = row
        print(f"  rel     {label}: {row}", file=sys.stderr)
        report["relational_hot_key"] = rel
        out_path.write_text(json.dumps(report, indent=2) + "\n")

    # Mega-basket cap (VERDICT r11 Next #1): the planted power basket's
    # distinct item count grows linearly with the corpus, so the
    # UNCAPPED pair self-join is quadratic in the factor (expected to
    # blow past the watchdog by 30×) while the capped plan — the
    # registered query's only mode — stays output-bounded. The repeat
    # stratum's dense above-support pairs price the cap's LOSS.
    from make_skew_fixture import build_basket_skew

    from pubic_multi_platform_to_postgres_spark.queries.analytics import (
        _BASKET_ITEM_CAP,
        basket_pair_supports,
    )

    bas: dict = report.get("basket_mega_cap", {})
    for label, sf_dir, factor in POINTS if "basket" in sections else []:
        build_basket_skew("/root/testdata/sf0.1", factor, sf_dir)
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        items = (
            li.select("l_orderkey", "l_partkey").distinct()
            .localCheckpoint()  # price the pair stage, not the scan
        )
        row: dict = {
            "cap": _BASKET_ITEM_CAP,
            "power_basket_items": int(
                items.filter(F.col("l_orderkey") == -1).count()
            ),
        }
        for face, cap in (("capped", _BASKET_ITEM_CAP), ("uncapped", None)):
            wall, rows_, to = _run_guarded(
                spark,
                lambda c=cap: basket_pair_supports(items, 3, cap=c),
                args.timeout,
            )
            row[face] = (
                {"timed_out": True, "timeout_s": args.timeout}
                if to
                else {"wall_s": round(wall, 3), "pairs_out": rows_}
            )
        if "pairs_out" in row["capped"] and "pairs_out" in row["uncapped"]:
            # loss contract, measured: capped output is a subset
            row["pairs_lost_to_cap"] = (
                row["uncapped"]["pairs_out"] - row["capped"]["pairs_out"]
            )
        wall, rows_, to = _run_guarded(
            spark, lambda: qs["basket_lift_part_pairs"](spark, sf_dir),
            args.timeout,
        )
        row["rule_query_end_to_end"] = (
            {"timed_out": True, "timeout_s": args.timeout}
            if to
            else {"wall_s": round(wall, 3), "rules_out": rows_}
        )
        bas[label] = row
        print(f"  basket  {label}: {row}", file=sys.stderr)
        report["basket_mega_cap"] = bas
        out_path.write_text(json.dumps(report, indent=2) + "\n")

    # Collapse planner rule (VERDICT r11 Next #3): record the measured
    # duplication mass and the decision per corpus, and on a CLONE-HEAVY
    # fixture (10% of docs byte-identical copies of one page — the
    # crawl-head case) show the rule flipping to 'collapse' and the
    # collapse plan beating the forced-direct one there.
    from make_skew_fixture import build as build_docs

    from pubic_multi_platform_to_postgres_spark.operators.dedup import (
        clone_mass,
        collapse_strategy,
    )
    from pubic_multi_platform_to_postgres_spark.queries.registry import (
        load as load_table,
    )

    CLONEHEAVY = "/tmp/spark_graft_cloneheavy"
    strat: dict = report.get("collapse_strategy", {})
    spoints = list(POINTS) + [("cloneheavy", CLONEHEAVY, 3)]
    for label, sf_dir, factor in spoints if "strategy" in sections else []:
        if label == "cloneheavy" and not Path(
            CLONEHEAVY, "documents.parquet"
        ).exists():
            build_docs("/root/testdata/sf0.1", factor, CLONEHEAVY,
                       clone_mod=100)
        docs = load_table(spark, sf_dir, "documents")
        n_rows, clique_pairs = clone_mass(docs, "text")
        row = {
            "n_docs": n_rows,
            "clique_pairs": clique_pairs,
            "decision": collapse_strategy(n_rows, clique_pairs),
        }
        names = ["dedup_ngram_jaccard_auto", "dedup_containment_pairs_auto"]
        if label == "cloneheavy":
            # forced faces beside the planner rows: the rule must have
            # picked the measured winner
            names += [
                "dedup_ngram_jaccard", "dedup_ngram_jaccard_collapsed",
                "dedup_containment_pairs",
                "dedup_containment_pairs_collapsed",
            ]
        for name in names:
            fn = _resolve_query(qs, name)
            wall, rows_, to = _run_guarded(
                spark, lambda f=fn: f(spark, sf_dir), args.timeout
            )
            row[name] = (
                {"timed_out": True, "timeout_s": args.timeout}
                if to
                else {"wall_s": round(wall, 3), "output_rows": rows_}
            )
        strat[label] = row
        print(f"  strat   {label}: {row}", file=sys.stderr)
        report["collapse_strategy"] = strat
        out_path.write_text(json.dumps(report, indent=2) + "\n")

    # Hot-canon URL dedup (VERDICT r11 Next #4): plant a Zipf-head
    # canonical URL cited by 10% of every corpus point and measure the
    # registered AGGREGATE-ONLY keep-doc election against the retired
    # rank-window face — the sort group the aggregate plan deleted.
    from pubic_multi_platform_to_postgres_spark.queries.llmdata import (
        _url_wrap_hot_col,
        url_dedup_over,
    )

    urlhot: dict = report.get("url_hot_canon", {})
    for label, sf_dir, _ in POINTS if "urlhot" in sections else []:
        docs = load(spark, sf_dir, "documents")
        wrapped = docs.select(
            "doc_id", "n_chars", _url_wrap_hot_col().alias("body")
        ).localCheckpoint()  # price the election, not the wrap/scan
        row = {}
        for face, use_window in (("aggregate", False), ("window", True)):
            wall, rows_, to = _run_guarded(
                spark,
                lambda w=use_window: url_dedup_over(wrapped, use_window=w),
                args.timeout,
            )
            row[face] = (
                {"timed_out": True, "timeout_s": args.timeout}
                if to
                else {"wall_s": round(wall, 3), "output_rows": rows_}
            )
        hot = (
            url_dedup_over(wrapped)
            .filter(F.col("canon") == "hub.example/front")
            .first()
        )
        row["hot_canon_citing_docs"] = int(hot["n_docs"]) if hot else 0
        urlhot[label] = row
        print(f"  urlhot  {label}: {row}", file=sys.stderr)
        report["url_hot_canon"] = urlhot
        out_path.write_text(json.dumps(report, indent=2) + "\n")

    # Hot-key AS-OF join (VERDICT r12 Next #5): the market-data shape —
    # ONE symbol owning 90% of both quotes and trades — serializes the
    # base union+window plan into a single per-key sort group. Measure
    # base vs the (key, time-bucket) salted plan at 1×/10×/30×, with
    # output equality asserted at 1×.
    from pubic_multi_platform_to_postgres_spark.operators.asof import (
        asof_join,
        asof_join_salted,
    )

    def _asof_fixture(f: int):
        """Deterministic hot-key quote/trade frames at factor f: 90% of
        rows on symbol 0, unique (key, ts) on the quote side."""
        n_q, n_t = 1_500_000 * f, 500_000 * f
        quotes = spark.range(n_q).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(1 + F.col("id") % 997).alias("sym"),
            # unique per key: hot rows get even ts by row index; cold
            # rows odd ts (row index is unique, so (key, ts) is too)
            (F.col("id") * 2 + (F.col("id") % 2)).alias("qts"),
            (F.col("id") % 1000).cast("double").alias("bid"),
        )
        trades = spark.range(n_t).select(
            F.col("id").alias("trade_id"),
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(1 + F.col("id") % 997).alias("sym"),
            (F.col("id") * 6 + 1).alias("tts"),
        )
        return trades, quotes

    def _asof_face(f: int, salted: bool):
        trades, quotes = _asof_fixture(f)
        fn = asof_join_salted if salted else asof_join
        kw = {"n_buckets": 32} if salted else {}
        joined = fn(
            trades, quotes, "sym", "sym", "tts", "qts", ["bid"], **kw
        )
        # count MATCHED rows: a bare count() lets Catalyst prune the
        # payload and delete the window itself — the timing must pay
        # for the fill
        return joined.where(F.col("bid").isNotNull())

    asof: dict = report.get("asof_hot_key", {})
    if "asofhot" in sections:
        asof["design"] = (
            "90% of quotes AND trades on one symbol; 1.5M/0.5M rows per "
            "factor; unique (key, ts) quotes; salted n_buckets=32"
        )
        spark.range(1_000_000).groupBy((F.col("id") % 7)).count().count()  # warm the JVM/codegen paths before timing
    for label, _sf_dir, factor in POINTS if "asofhot" in sections else []:
        row = {}
        for face, salted in (("base", False), ("salted", True)):
            wall, rows_, to = _run_guarded(
                spark, lambda s=salted, f=factor: _asof_face(f, s),
                args.timeout,
            )
            row[face] = (
                {"timed_out": True, "timeout_s": args.timeout}
                if to
                else {"wall_s": round(wall, 3), "output_rows": rows_}
            )
        if factor == 1:
            b = _asof_face(1, False)
            s = _asof_face(1, True)
            row["outputs_identical"] = bool(
                b.exceptAll(s).isEmpty() and s.exceptAll(b).isEmpty()
            )
        asof[label] = row
        print(f"  asofhot {label}: {row}", file=sys.stderr)
        report["asof_hot_key"] = asof
        out_path.write_text(json.dumps(report, indent=2) + "\n")

    # FORWARD salted mirror (r14): the follow-up/label join under the
    # same hot key — base forward (descending growing-frame fill, one
    # sort group) vs the forward-salted stitch (bucket-initial min_by +
    # later-bucket carry). r15 (VERDICT r14 Next #2): the curve runs to
    # 30× like backward's, pinning the base plan's super-linear
    # single-sort-group growth at the same depth. Output equality
    # asserted at 1×.
    def _dir_face(f: int, salted: bool, direction: str):
        trades, quotes = _asof_fixture(f)
        fn = asof_join_salted if salted else asof_join
        kw = {"n_buckets": 32} if salted else {}
        joined = fn(
            trades, quotes, "sym", "sym", "tts", "qts", ["bid"],
            direction=direction, **kw
        )
        return joined.where(F.col("bid").isNotNull())

    def _dir_section(section_key: str, direction: str, tag: str):
        sec: dict = report.get(section_key, {})
        sec["design"] = (
            f"same 90%-hot fixture as asof_hot_key; direction="
            f"'{direction}'; salted n_buckets=32"
        )
        for label, factor in (("skew1", 1), ("skew10", 10), ("skew30", 30)):
            row = {}
            for face, salted in (("base", False), ("salted", True)):
                wall, rows_, to = _run_guarded(
                    spark,
                    lambda s=salted, f=factor: _dir_face(f, s, direction),
                    args.timeout,
                )
                row[face] = (
                    {"timed_out": True, "timeout_s": args.timeout}
                    if to
                    else {"wall_s": round(wall, 3), "output_rows": rows_}
                )
            if factor == 1:
                b = _dir_face(1, False, direction)
                s_ = _dir_face(1, True, direction)
                row["outputs_identical"] = bool(
                    b.exceptAll(s_).isEmpty() and s_.exceptAll(b).isEmpty()
                )
            sec[label] = row
            print(f"  {tag} {label}: {row}", file=sys.stderr)
            report[section_key] = sec
            out_path.write_text(json.dumps(report, indent=2) + "\n")

    if "asoffwd" in sections:
        _dir_section("asof_hot_key_forward", "forward", "asoffwd")

    # NEAREST two-face salted plan (r15, VERDICT r14 Next #1): the last
    # as-of direction gains its hot-key remedy — base nearest (both
    # fills in one sort group) vs the salted arbitration of per-side
    # coalesce(in-bucket, carry), measured on the same fixture.
    if "asofnear" in sections:
        _dir_section("asof_hot_key_nearest", "nearest", "asofnear")

    # As-of AUTO route (VERDICT r13 Next #2): record the planner
    # decision + its measured inputs per corpus — the skew-free
    # orders/events corpus must route base (salting overhead priced in
    # asof_hot_key/base above), the planted 90%-hot fixture must flip
    # to salted once the hot sort group clears the breakeven
    # (default thresholds: share>=0.25 AND hot rows>=4M).
    if "asofauto" in sections:
        from pubic_multi_platform_to_postgres_spark.operators.asof import (
            asof_route,
        )
        from pubic_multi_platform_to_postgres_spark.plans.stats import (
            StatsRegistry,
        )
        from pubic_multi_platform_to_postgres_spark.queries.registry import (
            load,
        )

        auto: dict = {"design": (
            "asof_route(default thresholds) per corpus; events = the "
            "skew-free sf0.1 orders/events pair (the join_asof_auto_"
            "events gate row), hotN = the planted 90%-hot fixture at "
            "factor N (the asof_hot_key faces above)"
        )}

        def _route_events():
            sf = "/root/testdata/sf0.1"
            orders = load(spark, sf, "orders")
            events = load(spark, sf, "events")
            return asof_route(
                orders, events, "o_custkey", "user_id",
                registry=StatsRegistry(),
            )

        faces = [("events_sf0.1", _route_events)]
        for f in (1, 10, 30):
            def _route_hot(f=f):
                trades, quotes = _asof_fixture(f)
                return asof_route(
                    trades, quotes, "sym", "sym", registry=StatsRegistry()
                )
            faces.append((f"hot{f}", _route_hot))
        for label, fn in faces:
            t0 = time.monotonic()
            strategy, n_rows, top_share = fn()
            auto[label] = {
                "strategy": strategy,
                "n_rows": n_rows,
                "top_key_share": round(top_share, 4),
                "probe_wall_s": round(time.monotonic() - t0, 3),
            }
            print(f"  asofauto {label}: {auto[label]}", file=sys.stderr)
        report["asof_auto_route"] = auto
        out_path.write_text(json.dumps(report, indent=2) + "\n")

    # Planted-hub clustering (r16, VERDICT r15 Next #5): a star hub of
    # degree D plus background 30-cliques. The r15 shape ships the hub's
    # full adjacency array onto every incident edge (O(D²) payload); the
    # degree-capped local_clustering ships at most deg_cap longs per
    # edge and counts hub-edge candidates through a narrow-row
    # membership join. Output equality asserted at the smallest point.
    if "cchub" in sections:
        from pubic_multi_platform_to_postgres_spark.operators.graph import (
            local_clustering,
        )

        def _hub_graph(n_spokes: int):
            rows = [(0, i) for i in range(1, n_spokes + 1)]
            rows += [(i, i + 1) for i in range(1, n_spokes)]
            base = n_spokes + 10
            for c in range(200):
                ids = [base + c * 30 + j for j in range(30)]
                for x in range(30):
                    for y in range(x + 1, 30):
                        rows.append((ids[x], ids[y]))
            return (
                spark.createDataFrame(rows, "id_a long, id_b long")
                .repartition(32)
                .localCheckpoint(eager=True)
            )

        def _cc_uncapped(p):
            # the r15 reference shape: full adjacency attached per edge
            nbrs = (
                p.select(F.col("id_a").alias("node"), F.col("id_b").alias("u"))
                .unionAll(p.select(F.col("id_b").alias("node"),
                                   F.col("id_a").alias("u")))
                .groupBy("node")
                .agg(F.array_sort(F.collect_list("u")).alias("nb"))
                .localCheckpoint(eager=False)
            )
            ecnt = (
                p.join(nbrs.select(F.col("node").alias("id_a"),
                                   F.col("nb").alias("nb_a")), "id_a")
                .join(nbrs.select(F.col("node").alias("id_b"),
                                  F.col("nb").alias("nb_b")), "id_b")
                .select("id_a", "id_b",
                        F.size(F.array_intersect("nb_a", "nb_b")).alias("t"))
            )
            tcnt = (
                ecnt.select(F.explode(F.array("id_a", "id_b")).alias("node"), "t")
                .groupBy("node")
                .agg(F.expr("sum(t) DIV 2").cast("long").alias("n_triangles"))
            )
            deg = nbrs.select("node", F.size("nb").cast("long").alias("degree"))
            return deg.join(tcnt, "node", "left").select(
                F.col("node").alias("doc_id"), "degree",
                F.coalesce("n_triangles", F.lit(0)).cast("long")
                .alias("n_triangles"),
            )

        cch: dict = report.get("cc_hub_star", {})
        cch["design"] = (
            "star hub degree D + spoke chain + 200 background 30-cliques; "
            "uncapped = r15 full-adjacency attach, capped = "
            "local_clustering(deg_cap=1024); timed with the NOOP SINK "
            "(a bare .count() lets Catalyst prune the triangle subtree "
            "through the final left join and times only the degree scan)"
        )
        def _noop_guarded(fn):
            """(wall_s, timed_out) for one noop-sink materialization."""
            group = f"cchub-{time.monotonic_ns()}"
            sc = spark.sparkContext
            done = threading.Event()

            def watchdog():
                if not done.wait(args.timeout):
                    sc.cancelJobGroup(group)

            t = threading.Thread(target=watchdog, daemon=True)
            sc.setJobGroup(group, "bench_skew cchub", interruptOnCancel=True)
            t.start()
            t0 = time.perf_counter()
            try:
                fn().write.format("noop").mode("overwrite").save()
                return time.perf_counter() - t0, False
            except Exception:  # noqa: BLE001
                el = time.perf_counter() - t0
                if el < args.timeout:
                    raise
                return el, True
            finally:
                done.set()
                sc.setJobGroup("", "")

        for label, d in (("hub20k", 20_000), ("hub50k", 50_000),
                         ("hub100k", 100_000)):
            p = _hub_graph(d)
            row = {}
            for face, fn in (
                ("uncapped_r15", lambda: _cc_uncapped(p)),
                ("capped", lambda: local_clustering(p).drop("clustering_coef")),
            ):
                wall, to = _noop_guarded(fn)
                row[face] = (
                    {"timed_out": True, "timeout_s": args.timeout}
                    if to
                    else {
                        "wall_s": round(wall, 3),
                        "output_rows": int(fn().count()),
                    }
                )
            if d == 20_000:
                a = _cc_uncapped(p)
                b = local_clustering(p).drop("clustering_coef")
                row["outputs_identical"] = bool(
                    a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
                )
            cch[label] = row
            print(f"  cchub {label}: {row}", file=sys.stderr)
            report["cc_hub_star"] = cch
            out_path.write_text(json.dumps(report, indent=2) + "\n")

    # Growth ratios vs skew1, normalized per 10× of data.
    for section in ("queries",):
        for pts in report[section].values():
            base = pts.get("skew1", {}).get("wall_s")
            for label, mult in (("skew10", 10), ("skew30", 30)):
                cur = pts.get(label, {})
                if base and cur.get("wall_s") is not None:
                    cur["growth_vs_skew1"] = round(cur["wall_s"] / base, 2)
    out_path.write_text(json.dumps(report, indent=2) + "\n")
    print(f"-> {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    main()
