#!/usr/bin/env python
"""Generate the ADVERSARIAL-SKEW documents fixture (VERDICT r10 Next #1).

``make_scaled_sf.py``'s replica corpora are deliberately benign: replicas
are token-disjoint, languages keep the base mix, and no key is hot — so
every committed growth curve measures the pair generators on a corpus
with NO cross-document boilerplate. A real web crawl is the opposite:
Zipfian language mix, massive shared boilerplate, mass-duplicated pages,
and short quotes of hot passages. This tool builds that corpus,
deterministically (pure ``doc_id`` arithmetic, no RNG), at 1×/10×/30×
the sf0.1 document count, as four strata interleaved by ``doc_id %
1000`` so every replica file carries the same mix:

- **body** (84.6%): the base sf0.1 documents with ``make_scaled_sf``'s
  replica-disjoint token mutation, but with the language remapped so
  ~70% of the corpus lands in ``en`` — one dominant language block
  (Zipf head) instead of the base's uniform mix.
- **boiler** (15%): every document shares the same 30-token boilerplate
  passage (nav/disclaimer analog) followed by 60 per-document-unique
  tokens. Each boilerplate 3-gram's posting list is ~15% of the corpus
  (the hot-shingle worst case), pairwise Jaccard ≈ 0.19 stays BELOW the
  0.4/0.5 pair thresholds (these docs are NOT near-dups — the fan-out a
  generator pays for them is pure skew overhead), and they all share
  one (lang='en', length-bucket) blocking cell.
- **quote** (0.1%): a 16-token verbatim slice of the boilerplate plus
  ONE unique token — fully contained (containment ≈ 0.88) in every
  boiler document, so the TRUE asymmetric-containment output is
  quote_count × boiler_count: the posting-list worst case for the
  contained-side prefix probe.
- **clone** (0.3%): byte-identical copies of one 41-token page — the
  mass-duplicated-page case; every pair generator sees a clique whose
  candidate AND output volume is quadratic in the clone count.

Usage::

    python tools/make_skew_fixture.py --factor 10 --out /tmp/spark_graft_skew10
"""

from __future__ import annotations

import argparse
from pathlib import Path

import duckdb

BASE = "/root/testdata/sf0.1"

BOILER_TOKENS = [f"bp{i}" for i in range(30)]
BOILER = " ".join(BOILER_TOKENS)
QUOTE = " ".join(BOILER_TOKENS[5:21])  # 16-token verbatim slice
CLONE = " ".join(f"cl{i}" for i in range(41))

# strata by doc_id % 1000 (per-mille): [0,3) clone, [3,4) quote,
# [4,154) boiler, rest body
_CLONE_MOD, _QUOTE_MOD, _BOILER_MOD = 3, 4, 154


def build(
    base: str, factor: int, out: str, clone_mod: int = _CLONE_MOD
) -> None:
    """``clone_mod`` widens the clone stratum (per-mille of docs that are
    byte-identical copies of one page) while keeping the quote and
    boiler strata their default SIZES — the CLONE-HEAVY face
    ``tools/bench_skew.py``'s strategy section uses to exercise the
    collapse branch of ``operators/dedup.py collapse_strategy``. The
    default reproduces the committed r11 fixture bit-for-bit."""
    quote_mod = clone_mod + (_QUOTE_MOD - _CLONE_MOD)
    boiler_mod = clone_mod + (_BOILER_MOD - _CLONE_MOD)
    con = duckdb.connect()
    outp = Path(out) / "documents.parquet"
    outp.mkdir(parents=True, exist_ok=True)

    n_docs, = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{base}/documents.parquet')"
    ).fetchone()

    for k in range(factor):
        mut = "text" if k == 0 else f"'r{k}q' || replace(text, ' ', ' r{k}q')"
        shifted = f"doc_id + {k * n_docs}"
        con.execute(
            f"""
            COPY (
                WITH s AS (
                    SELECT {shifted} AS doc_id,
                           {mut} AS body_text,
                           lang AS base_lang, source
                    FROM read_parquet('{base}/documents.parquet')
                )
                SELECT doc_id,
                       CASE
                         WHEN doc_id % 1000 < {clone_mod} THEN '{CLONE}'
                         WHEN doc_id % 1000 < {quote_mod}
                           THEN '{QUOTE} uq' || doc_id
                         WHEN doc_id % 1000 < {boiler_mod}
                           THEN '{BOILER} ' || array_to_string(
                                    list_transform(range(60),
                                        j -> 'u' || doc_id || 'w' || j), ' ')
                         ELSE body_text
                       END AS text,
                       CASE
                         WHEN doc_id % 1000 < {boiler_mod} THEN 'en'
                         WHEN doc_id % 10 < 7 THEN 'en'
                         ELSE base_lang
                       END AS lang,
                       source,
                       CAST(length(CASE
                         WHEN doc_id % 1000 < {clone_mod} THEN '{CLONE}'
                         WHEN doc_id % 1000 < {quote_mod}
                           THEN '{QUOTE} uq' || doc_id
                         WHEN doc_id % 1000 < {boiler_mod}
                           THEN '{BOILER} ' || array_to_string(
                                    list_transform(range(60),
                                        j -> 'u' || doc_id || 'w' || j), ' ')
                         ELSE body_text
                       END) AS BIGINT) AS n_chars
                FROM s
            ) TO '{outp}/part-{k:05d}.parquet' (FORMAT PARQUET)
            """
        )
    total, n_en, n_boiler, n_clone, n_quote = con.execute(
        f"""
        SELECT COUNT(*),
               COUNT(*) FILTER (lang = 'en'),
               COUNT(*) FILTER (doc_id % 1000 >= {quote_mod}
                                AND doc_id % 1000 < {boiler_mod}),
               COUNT(*) FILTER (doc_id % 1000 < {clone_mod}),
               COUNT(*) FILTER (doc_id % 1000 >= {clone_mod}
                                AND doc_id % 1000 < {quote_mod})
        FROM read_parquet('{outp}/*.parquet')
        """
    ).fetchone()
    assert total == factor * n_docs, (total, factor, n_docs)
    print(
        f"built {out}: {total} docs ({n_en} en, {n_boiler} boiler, "
        f"{n_clone} clone, {n_quote} quote)"
    )


def build_relational_skew(base: str, factor: int, out: str) -> None:
    """Hot-KEY relational fixture: replica-scaled ``customer`` and
    ``orders`` where ONE global customer key owns 30% of every
    replica's orders (``o_orderkey % 10 < 3 → o_custkey = 1``) — the
    Zipf-head join/aggregation case the benign replicas never produce
    (their key skew is the base table's, bounded per customer). The hot
    key's row count grows LINEARLY with the corpus, so a plan that
    serializes it into one task degrades linearly while a skew-split or
    salted plan holds. Idempotent (skips existing table dirs)."""
    con = duckdb.connect()
    counts = {
        t: con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{base}/{t}.parquet')"
        ).fetchone()[0]
        for t in ("customer", "orders")
    }
    specs = {
        "customer": """
            SELECT c_custkey + {kc} AS c_custkey,
                   'Customer#' || lpad(CAST(c_custkey + {kc} AS VARCHAR), 9, '0')
                       AS c_name,
                   c_nationkey, c_acctbal, c_mktsegment
            FROM read_parquet('{base}/customer.parquet')""",
        "orders": """
            SELECT o_orderkey + {ko} AS o_orderkey,
                   CASE WHEN (o_orderkey + {ko}) % 10 < 3 THEN 1
                        ELSE o_custkey + {kc} END AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM read_parquet('{base}/orders.parquet')""",
    }
    for table, sql in specs.items():
        tdir = Path(out) / f"{table}.parquet"
        if tdir.exists():
            continue
        tdir.mkdir(parents=True, exist_ok=True)
        for k in range(factor):
            sel = sql.format(
                base=base, kc=k * counts["customer"], ko=k * counts["orders"]
            )
            con.execute(
                f"COPY ({sel}) TO '{tdir}/part-{k:05d}.parquet' (FORMAT PARQUET)"
            )
    n, hot = con.execute(
        f"""SELECT COUNT(*), COUNT(*) FILTER (o_custkey = 1)
            FROM read_parquet('{out}/orders.parquet/*.parquet')"""
    ).fetchone()
    print(f"built {out} relational: {n} orders, hot key owns {hot}")


def build_basket_skew(base: str, factor: int, out: str) -> None:
    """MEGA-BASKET lineitem fixture (VERDICT r11 Next #1): two planted
    strata on top of replica-scaled ``(l_orderkey, l_partkey)`` rows —

    - **power** (0.5% of rows → basket key ``-1``): part keys keep their
      per-replica shift, so the basket's DISTINCT item count grows
      linearly with the corpus — the C(m,2) fan-out case the item cap
      exists for (uncapped pair volume grows quadratically; these pairs
      co-occur once, so they never reach min-support and the cap loses
      NO output here).
    - **repeat** (0.1% of rows → basket keys ``-2/-3/-4``, parts folded
      into a dense 600-key universe shared across replicas): three
      near-identical dense baskets of BOUNDED size, so true
      above-support pair output exists at every factor — the stratum
      that makes the cap's loss contract measurable (capped output is
      the kept-64-priority subset of these pairs).

    Idempotent (skips an existing lineitem dir)."""
    con = duckdb.connect()
    tdir = Path(out) / "lineitem.parquet"
    if tdir.exists():
        return
    tdir.mkdir(parents=True, exist_ok=True)
    max_o, max_p = con.execute(
        f"SELECT MAX(l_orderkey), MAX(l_partkey) "
        f"FROM read_parquet('{base}/lineitem.parquet')"
    ).fetchone()
    for k in range(factor):
        ko, kp = k * max_o, k * max_p
        con.execute(
            f"""
            COPY (
                SELECT CASE
                         WHEN (l_orderkey + {ko}) % 1000 < 5 THEN -1
                         WHEN (l_orderkey + {ko}) % 1000 = 5
                           THEN -(2 + (l_orderkey + {ko}) % 3)
                         ELSE l_orderkey + {ko}
                       END AS l_orderkey,
                       CASE
                         WHEN (l_orderkey + {ko}) % 1000 = 5
                           THEN l_partkey % 600
                         ELSE l_partkey + {kp}
                       END AS l_partkey
                FROM read_parquet('{base}/lineitem.parquet')
            ) TO '{tdir}/part-{k:05d}.parquet' (FORMAT PARQUET)
            """
        )
    n, power_items, repeat_items = con.execute(
        f"""SELECT COUNT(*),
                   COUNT(DISTINCT l_partkey) FILTER (l_orderkey = -1),
                   COUNT(DISTINCT l_partkey) FILTER (l_orderkey < -1)
            FROM read_parquet('{tdir}/*.parquet')"""
    ).fetchone()
    print(
        f"built {out} basket lineitem: {n} rows, power basket "
        f"{power_items} distinct items, repeat universe {repeat_items}"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default=BASE)
    ap.add_argument("--factor", type=int, required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    build(args.base, args.factor, args.out)
    build_relational_skew(args.base, args.factor, args.out)
    build_basket_skew(args.base, args.factor, args.out)
    return 0


if __name__ == "__main__":
    main()
