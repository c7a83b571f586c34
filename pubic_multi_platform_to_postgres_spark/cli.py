"""Command-line surface — the engine's analog of the reference's console
scripts (``tap-X --discover`` etc., ``pyproject.toml:37-40``).

    python -m pubic_multi_platform_to_postgres_spark discover --schemas DIR
    python -m pubic_multi_platform_to_postgres_spark list
    python -m pubic_multi_platform_to_postgres_spark query NAME [--sf-dir D] [--limit N]

``discover`` consumes a directory of the reference's JSON-Schema files
(one file per stream, ``readme.md:126``) and emits a Singer-style catalog
document; ``query`` runs any registered catalog query and prints rows.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def cmd_discover(args: argparse.Namespace) -> int:
    from pubic_multi_platform_to_postgres_spark.plans.catalog import Catalog

    cat = Catalog()
    schema_dir = Path(args.schemas)
    for f in sorted(schema_dir.glob("*.json")):
        cat.register_json_schema(f.stem, json.loads(f.read_text()))
    print(json.dumps({"streams": cat.discover()}, indent=2, default=str))
    return 0


def cmd_list(args: argparse.Namespace) -> int:
    from pubic_multi_platform_to_postgres_spark.queries import REGISTRY

    for name, q in sorted(REGISTRY.items()):
        head = (q.doc or "").splitlines()[0] if q.doc else ""
        kind = "oracle" if q.oracle else "rows-only"
        print(f"{name:32s} [{kind}] {head}")
    return 0


def cmd_query(args: argparse.Namespace) -> int:
    from pubic_multi_platform_to_postgres_spark.queries import REGISTRY
    from pubic_multi_platform_to_postgres_spark.session import get_session

    if args.name not in REGISTRY:
        print(f"unknown query: {args.name}", file=sys.stderr)
        return 2
    spark = get_session(app_name=f"cli_{args.name}")
    df = REGISTRY[args.name].fn(spark, args.sf_dir)
    df.show(args.limit, truncate=False)
    return 0


def cmd_explain(args) -> int:
    """Print the optimized physical plan — the artifact to review before
    believing an operator scales (pushdown, broadcast, exchange count)."""
    from pubic_multi_platform_to_postgres_spark.queries import REGISTRY
    from pubic_multi_platform_to_postgres_spark.session import get_session

    spark = get_session(app_name="spark_graft_cli")
    df = REGISTRY[args.name].fn(spark, args.sf_dir)
    df.explain(args.mode)
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="pubic_multi_platform_to_postgres_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("discover", help="compile schemas/*.json into a catalog document")
    d.add_argument("--schemas", required=True)
    d.set_defaults(fn=cmd_discover)

    ls = sub.add_parser("list", help="list registered catalog queries")
    ls.set_defaults(fn=cmd_list)

    q = sub.add_parser("query", help="run one catalog query and print rows")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    q.add_argument("--limit", type=int, default=20)
    q.set_defaults(fn=cmd_query)

    ex = sub.add_parser("explain", help="print a catalog query's physical plan")
    ex.add_argument("name")
    ex.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ex.add_argument("--mode", default="formatted",
                    choices=["simple", "extended", "formatted", "cost", "codegen"])
    ex.set_defaults(fn=cmd_explain)

    args = p.parse_args(argv)
    return int(args.fn(args))


if __name__ == "__main__":
    raise SystemExit(main())
