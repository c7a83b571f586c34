#!/usr/bin/env python
"""Dedup planner demo: the measured-duplication-mass rule end to end.

    python examples/run_dedup_planner_demo.py

Two synthetic corpora, one near-dup pair job, two different plans:

1. A CLONE-LIGHT corpus (every page distinct, a few organic near-dups)
   — ``clone_mass`` measures ~zero exact-clone clique mass, so
   ``collapse_strategy`` picks the DIRECT prefix-filter plan (the
   collapse's class groupBy would be pure overhead here).
2. A CRAWL-HEAD corpus (one page mass-duplicated across 40% of the
   corpus) — clique pair mass dwarfs the row count, the rule flips to
   COLLAPSE, and the clique costs the candidate/verify stages ONE row
   instead of m².

Both plans produce the IDENTICAL pair multiset (asserted below) — the
planner rule is a pure cost decision, never a semantics switch. This is
the same rule behind the registered rows ``dedup_ngram_jaccard_auto``
and ``dedup_containment_pairs_auto``.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

from pubic_multi_platform_to_postgres_spark.operators.dedup import (  # noqa: E402
    clone_mass,
    collapse_strategy,
    ngram_jaccard_pairs,
)
from pubic_multi_platform_to_postgres_spark.session import get_session  # noqa: E402


def corpus(spark, clone_frac: float, n: int = 4000):
    """``n`` docs; ``clone_frac`` of them byte-identical copies of one
    page, the rest unique with planted organic near-dup pairs."""
    clone_every = int(1 / clone_frac) if clone_frac > 0 else n + 1
    # the mass-duplicated page is LONG (150 tokens) — the realistic case:
    # the direct plan pays an array_intersect over the full gram arrays
    # for every one of the clique's m^2 pairs, which is exactly the cost
    # the collapse deletes
    clone_page = " ".join(f"wire{w}" for w in range(150))
    rows = []
    for i in range(n):
        if i % clone_every == 0:
            text = clone_page
        elif i % 97 == 0:  # organic near-dup pair (i, i+1)
            text = f"report alpha{i} beta{i} gamma{i} delta{i} epsilon{i}"
        elif i % 97 == 1:
            j = i - 1
            text = f"report alpha{j} beta{j} gamma{j} delta{j} zeta{j}"
        else:
            text = f"unique{i} page{i} body{i} tokens{i} here{i}"
        rows.append((i, "en", text))
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def run(spark, label: str, docs):
    n_rows, clique_pairs = clone_mass(docs, "text")
    decision = collapse_strategy(n_rows, clique_pairs)
    print(f"\n== {label}: {n_rows} docs, {clique_pairs} exact-clone "
          f"clique pairs -> planner says {decision.upper()}")
    from pyspark.sql import functions as F

    results = {}
    for face, collapse in (("direct", False), ("collapse", True)):
        t0 = time.perf_counter()
        pairs = ngram_jaccard_pairs(
            docs, "text", "doc_id", ["lang"], threshold=0.5, ngram=1,
            collapse_exact=collapse,
        )
        # distributed count + order-insensitive checksum — nothing
        # output-sized reaches the driver (the property tests pin true
        # row-level equality; this demo prices the plans)
        row = pairs.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.xxhash64("id_a", "id_b", F.round("jaccard", 9))
                % F.lit(1_000_003)
            ).alias("chk"),
        ).first()
        wall = time.perf_counter() - t0
        marker = " <- chosen" if face == decision else ""
        print(f"   {face:9s}: {row['n']:>9,} pairs in {wall:5.2f} s{marker}")
        results[face] = (row["n"], row["chk"])
    assert results["direct"] == results["collapse"], "plans must agree"
    print("   both plans agree (count + order-insensitive checksum)")


def main() -> int:
    spark = get_session(app_name="dedup_planner_demo")
    spark.sparkContext.setLogLevel("ERROR")
    # untimed warmup of both plan shapes (JIT/codegen/Python workers) so
    # the printed walls compare plans, not first-run warmup
    tiny = corpus(spark, clone_frac=0.25, n=200)
    for collapse in (False, True):
        ngram_jaccard_pairs(tiny, "text", "doc_id", ["lang"],
                            threshold=0.5, ngram=1,
                            collapse_exact=collapse).count()
    run(spark, "clone-light corpus", corpus(spark, clone_frac=0.0))
    run(spark, "crawl-head corpus (40% one page)", corpus(spark, clone_frac=0.4))

    # r13: the statistic as CATALOG state — a landing pipeline folds
    # each ingest batch into a CloneHistogram (batch-sized aggregates,
    # the corpus is never rescanned) and publishes the summary; the
    # planner then reads it for free instead of probing.
    from pyspark.sql import functions as F

    from pubic_multi_platform_to_postgres_spark.plans.stats import (
        CloneHistogram,
        StatsRegistry,
    )

    docs = corpus(spark, clone_frac=0.4)
    hist, reg = CloneHistogram(), StatsRegistry()
    for b in range(4):  # four daily deliveries
        hist.merge_batch(docs.filter(F.col("doc_id") % 4 == b), "text")
    n, cp = hist.publish(reg, "demo://crawl", "text",
                         fingerprint=(("demo", 0, 0),))
    assert (n, cp) == clone_mass(docs, "text")
    print(f"\n== landing path: 4 batches folded into the histogram -> "
          f"published ({n} docs, {cp:,} clique pairs); planner reads it "
          f"free -> {collapse_strategy(n, cp).upper()}")

    # r14: in production nobody calls merge_batch by hand — the PK
    # upsert sink maintains and publishes the statistic itself
    # (clone_stat_col), exactly under at-least-once redelivery. Land
    # the same corpus in four overlapping deliveries and read the
    # ingest-published statistic back probe-free.
    import tempfile
    from pathlib import Path

    from pubic_multi_platform_to_postgres_spark.operators.upsert import (
        ParquetUpsertSink,
    )

    root = Path(tempfile.mkdtemp(prefix="dedup_planner_demo_"))
    reg2 = StatsRegistry()
    sink = ParquetUpsertSink(
        spark, root / "crawl", ["doc_id"],
        clone_stat_col="text", stats_registry=reg2,
    )
    for b in range(4):  # each delivery redelivers the previous batch too
        sink.write(docs.filter((F.col("doc_id") % 4).isin(max(0, b - 1), b)))
    n2, cp2 = reg2.clone_summary(  # df=None: throws if it had to probe
        None, "text", source_path=str(root / "crawl")
    )
    assert (n2, cp2) == (n, cp)
    print(f"== sink-maintained: 4 overlapping deliveries through the PK "
          f"upsert -> ingest published ({n2} docs, {cp2:,} clique pairs) "
          f"with zero planner probes")
    print("\ndemo complete: one job, two corpora, two plans, one answer")
    return 0


if __name__ == "__main__":
    sys.exit(main())
