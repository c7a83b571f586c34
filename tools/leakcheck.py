#!/usr/bin/env python
"""Leak hygiene census: everything in this repo must derive from public
knowledge (PySpark/DuckDB APIs, the public reference repo, published
papers). This scans every tracked text file for the classes of
non-public material that must never appear and writes LEAKCHECK.json.

Usage::

    python tools/leakcheck.py --round 11 [--out LEAKCHECK.json]
"""

from __future__ import annotations

import argparse
import json
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# Python imports that are legitimately available/public in this repo.
PUBLIC_IMPORT_ROOTS = {
    # baked-in third-party
    "pyspark", "pyarrow", "pandas", "numpy", "duckdb", "pytest",
    "hypothesis", "py4j",
    # own package + test/tool helpers
    "pubic_multi_platform_to_postgres_spark", "__spark_entry__", "oracle",
    "conftest", "make_scaled_sf", "make_skew_fixture", "bench_scale",
    "plan_audit", "gate_sweep", "leakcheck", "bench_skew", "bench_pinned",
    "bench_mode_check", "tests", "doccheck", "bench_ab_pin",
    # stdlib (the scan treats anything in sys.stdlib_module_names as public)
}

# Public hosts that are fine to mention (docs, specs, papers).
PUBLIC_HOST_RE = re.compile(
    r"(apache\.org|github\.com|python\.org|duckdb\.org|example\.com|"
    r"example\.org|localhost|127\.0\.0\.1|arxiv\.org|wikipedia\.org|"
    r"postgresql\.org|json-schema\.org|getdbt\.com|singer\.io|w3\.org|"
    r"hubapi\.com|xero\.com|wrike\.com|ietf\.org|hubspot\.com)"
)
# hubapi/xero/wrike: the REFERENCE's public SaaS API hosts — part of the
# public repo being re-expressed, cited in SURVEY.md and source docstrings.

CHECKS = {
    "internal-import": None,  # handled structurally below
    "internal-url": re.compile(r"https?://[^\s'\")>\]]+"),
    "internal-pkg2": re.compile(
        r"^\s*(?:from|import)\s+(?:anthropic|claude|axon)[._\w]*", re.M
    ),
    "internal-bucket": re.compile(r"(?:s3|gs|s3a|abfss)://[\w./-]+"),
    "slack-link": re.compile(r"(?:slack\.com/|go/[a-z][\w-]{2,}|#[a-z]+-[a-z-]+-\d)"),
    "api-key": re.compile(
        r"(?:sk-[A-Za-z0-9]{20,}|AKIA[0-9A-Z]{16}|xox[bp]-[\w-]{20,}|"
        r"-----BEGIN (?:RSA |EC )?PRIVATE KEY-----)"
    ),
    "axon-env": re.compile(r"\b(?:AXON|ANTHROPIC|CLAUDE)_[A-Z_]+\b"),
}

IMPORT_RE = re.compile(r"^\s*(?:from\s+([\w.]+)\s+import|import\s+([^\n#;]+))", re.M)


def tracked_files() -> list[Path]:
    out = subprocess.run(
        ["git", "ls-files"], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout.splitlines()
    keep = []
    for rel in out:
        p = REPO / rel
        if p.suffix in {".py", ".md", ".json", ".sql", ".toml", ".cfg",
                        ".yml", ".yaml", ".txt"} and p.exists():
            keep.append(p)
    return keep


def scan() -> dict[str, list[str]]:
    stdlib = set(getattr(sys, "stdlib_module_names", ()))
    hits: dict[str, list[str]] = {k: [] for k in CHECKS}
    for p in tracked_files():
        rel = str(p.relative_to(REPO))
        text = p.read_text(errors="replace")
        if p.suffix == ".py":
            for m in IMPORT_RE.finditer(text):
                mods = [m.group(1)] if m.group(1) else [
                    x.strip().split(" as ")[0] for x in m.group(2).split(",")
                ]
                for mod in mods:
                    root = (mod or "").split(".")[0]
                    if not root or root.startswith("_"):
                        continue
                    if root in stdlib or root in PUBLIC_IMPORT_ROOTS:
                        continue
                    hits["internal-import"].append(f"{rel}: import {mod}")
        for key, rx in CHECKS.items():
            if rx is None:
                continue
            for m in rx.finditer(text):
                tok = m.group(0)
                if key == "internal-url" and PUBLIC_HOST_RE.search(tok):
                    continue
                # synthetic in-test hosts (FIXTURES.md): single-label or
                # obviously placeholder authorities with no registrable
                # domain — they resolve nowhere and name nothing real
                if key == "internal-url" and re.search(
                    r"https?://(?:api\.test|mock|test|site|id|api|host|"
                    r"example)(?:[/.:]|$)", tok
                ):
                    continue
                # RFC 2606/6761 reserved TLDs (.example/.test/.invalid/
                # .localhost) can never name a real host — the fixture
                # URL device (hub.example etc.) lives there by design
                if key == "internal-url" and re.search(
                    r"https?://[\w.-]*\.(?:example|test|invalid|localhost)"
                    r"(?:[/:?]|$)", tok
                ):
                    continue
                hits[key].append(f"{rel}: {tok[:120]}")
    return hits


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--out", default=str(REPO / "LEAKCHECK.json"))
    args = ap.parse_args()
    hits = scan()
    payload = {
        "round": args.round,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    Path(args.out).write_text(json.dumps(payload, indent=2) + "\n")
    print(json.dumps({"n_hits": payload["n_hits"]}))
    return 0 if payload["n_hits"] == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
