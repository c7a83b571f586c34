#!/usr/bin/env python
"""Generate scaled-up documents/embeddings fixtures for scale-proof benches.

Replicates the driver's sf0.1 fixtures ``factor``× with DETERMINISTIC
per-replica mutation, so a 10×/100× corpus keeps the per-replica duplicate
/ language / length structure of the original while adding NO artificial
cross-replica near-duplicates (which would turn linear operators into
quadratic pair-explosions and invalidate the scaling measurement):

- ``documents``: ``doc_id + k·N``; every token of replica ``k>0`` gets a
  replica-specific prefix (``r{k}q``), so cross-replica shingle/minhash/
  simhash similarity collapses to ~0 while token counts and length
  distributions are preserved. ``n_chars`` is recomputed.
- ``embeddings``: ``vec_id + k·M``; the vector is rotated by ``k % dim``
  positions (norm-preserving, direction-changing), labels unchanged.

Output is one parquet file PER REPLICA under ``<out>/documents.parquet/``
and ``<out>/embeddings.parquet/`` (directory tables — the same layout
Spark writes), so scans parallelize across files instead of collapsing
to one row-group task.

These scaled fixtures live OUTSIDE /root/testdata (which is read-only
driver ground truth); they exist only for timing evidence — no oracle
runs at these scales. Usage::

    python tools/make_scaled_sf.py --factor 10 --out /tmp/spark_graft_sf1
"""

from __future__ import annotations

import argparse
from pathlib import Path

import duckdb

BASE = "/root/testdata/sf0.1"


def build(base: str, factor: int, out: str) -> None:
    con = duckdb.connect()
    outp = Path(out)
    (outp / "documents.parquet").mkdir(parents=True, exist_ok=True)
    (outp / "embeddings.parquet").mkdir(parents=True, exist_ok=True)

    n_docs, = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{base}/documents.parquet')"
    ).fetchone()
    n_vecs, dim = con.execute(
        f"SELECT COUNT(*), max(len(embedding))"
        f" FROM read_parquet('{base}/embeddings.parquet')"
    ).fetchone()

    for k in range(factor):
        mut = (
            "text"
            if k == 0
            else f"'r{k}q' || replace(text, ' ', ' r{k}q')"
        )
        con.execute(
            f"""
            COPY (
                SELECT doc_id + {k * n_docs} AS doc_id,
                       {mut} AS text,
                       lang, source,
                       CAST(length({mut}) AS BIGINT) AS n_chars
                FROM read_parquet('{base}/documents.parquet')
            ) TO '{out}/documents.parquet/part-{k:05d}.parquet'
              (FORMAT PARQUET)
            """
        )
        rot = k % dim
        vec = (
            "embedding"
            if rot == 0
            else f"embedding[{rot + 1}:] || embedding[:{rot}]"
        )
        con.execute(
            f"""
            COPY (
                SELECT vec_id + {k * n_vecs} AS vec_id,
                       CAST({vec} AS FLOAT[]) AS embedding,
                       label
                FROM read_parquet('{base}/embeddings.parquet')
            ) TO '{out}/embeddings.parquet/part-{k:05d}.parquet'
              (FORMAT PARQUET)
            """
        )
    total, = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{out}/documents.parquet/*.parquet')"
    ).fetchone()
    assert total == factor * n_docs, (total, factor, n_docs)
    build_relational(base, factor, out, con)
    print(f"built {out}: {total} docs, {factor * n_vecs} embeddings")


def build_relational(base: str, factor: int, out: str, con=None) -> None:
    """Replica-scale the relational tables the graph/ER queries read
    (customer, supplier, orders, lineitem, events): replica ``k``
    shifts every
    key by ``k · n_rows`` of its table and REGENERATES the name columns
    from the shifted key (the ER fixture derives corruption and blocking
    from the name's digit positions, so a shifted key with a stale name
    would break the name↔key invariant). Replicas are key-disjoint, so
    the purchase graph becomes ``factor`` disconnected copies — same
    degree distribution, ``factor×`` nodes and edges. Skips tables that
    already exist (idempotent top-up of cached fixture dirs)."""
    con = con or duckdb.connect()
    counts = {
        t: con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{base}/{t}.parquet')"
        ).fetchone()[0]
        for t in ("customer", "supplier", "orders", "events")
    }
    specs = {
        "customer": """
            SELECT c_custkey + {kc} AS c_custkey,
                   'Customer#' || lpad(CAST(c_custkey + {kc} AS VARCHAR), 9, '0')
                       AS c_name,
                   c_nationkey, c_acctbal, c_mktsegment
            FROM read_parquet('{base}/customer.parquet')""",
        "supplier": """
            SELECT s_suppkey + {ks} AS s_suppkey,
                   'Supplier#' || lpad(CAST(s_suppkey + {ks} AS VARCHAR), 9, '0')
                       AS s_name,
                   s_nationkey, s_acctbal
            FROM read_parquet('{base}/supplier.parquet')""",
        "orders": """
            SELECT o_orderkey + {ko} AS o_orderkey, o_custkey + {kc} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM read_parquet('{base}/orders.parquet')""",
        "lineitem": """
            SELECT l_orderkey + {ko} AS l_orderkey, l_partkey,
                   l_suppkey + {ks} AS l_suppkey, l_linenumber, l_quantity,
                   l_extendedprice, l_discount, l_tax, l_returnflag,
                   l_linestatus, l_shipdate
            FROM read_parquet('{base}/lineitem.parquet')""",
        "events": """
            SELECT event_id + {ke} AS event_id, ts,
                   user_id + {kc} AS user_id, event_type, value, props
            FROM read_parquet('{base}/events.parquet')""",
    }
    # part is a SHARED dimension: lineitem replicas keep l_partkey
    # unchanged (a parts catalog does not grow with order volume), so
    # the scaled fixture carries one verbatim copy of the base table.
    pdir = Path(out) / "part.parquet"
    if not pdir.exists():
        pdir.mkdir(parents=True, exist_ok=True)
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{base}/part.parquet'))"
            f" TO '{pdir}/part-00000.parquet' (FORMAT PARQUET)"
        )
    for table, sql in specs.items():
        tdir = Path(out) / f"{table}.parquet"
        if tdir.exists():
            continue
        tdir.mkdir(parents=True, exist_ok=True)
        for k in range(factor):
            sel = sql.format(
                base=base,
                kc=k * counts["customer"],
                ks=k * counts["supplier"],
                ko=k * counts["orders"],
                ke=k * counts["events"],
            )
            con.execute(
                f"COPY ({sel}) TO '{tdir}/part-{k:05d}.parquet' (FORMAT PARQUET)"
            )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default=BASE)
    ap.add_argument("--factor", type=int, required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    build(args.base, args.factor, args.out)
    return 0


if __name__ == "__main__":
    main()
