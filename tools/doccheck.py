#!/usr/bin/env python
"""Doc-number checker: every measurement a TAGGED section of SCALE.md /
BASELINE.md quotes must appear in the artifact(s) the tag names
(VERDICT r12 Next #3 — quoted-number drift appeared in two consecutive
rounds; this stops fixing it by hand).

Tagging
-------
A tagged region starts with an HTML comment naming its artifacts and
ends at ``doccheck:end`` (or the next tag)::

    <!-- doccheck: BENCH_SKEW_r12.json BENCH_SF1_r12.json -->
    ... prose quoting numbers from those artifacts ...
    <!-- doccheck:end -->

Inside a region, every measurement token must round-match some numeric
leaf of a named artifact:

- decimals (``3.881``, ``0.94``), optionally ``k``/``M`` suffixed
  (``11.2M``) or comma-grouped,
- comma-grouped or ≥1000 plain integers (``11,255``, ``83570``); small
  bare integers (caps, "7 items", "×32") are config/prose and skipped.

Escapes: ``~``-prefixed numbers are approximations (exempt); a line
containing ``unpinned`` (e.g. ``<!-- unpinned -->``) is narrative from
outside any committed artifact — same-session before/afters, superseded
intermediate runs — and is skipped whole. Round tags (``r11``), scale
ids (``sf0.1``/``skew10``/``geo30``), integer factors (``10×``),
percentages derived in prose (``8.6%``) and scientific/superscript
magnitudes are scrubbed before matching.

Each ROUND'S close checklist tags its new sections; history stays
untagged (its artifacts are frozen and were adjudicated in-round).

Exit 1 with a MISS listing on any failure::

    python tools/doccheck.py            # checks SCALE.md BASELINE.md
    python tools/doccheck.py --json DOCCHECK.json
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
DOCS = ["SCALE.md", "BASELINE.md"]

TAG_RE = re.compile(r"<!--\s*doccheck:\s*(end|[A-Za-z0-9_.,\s]+?)\s*-->")
# Census counts ("106 measured / 91 exempt / 0 undispositioned") are the
# one class of load-bearing SMALL integers: the <1000 skip hid a stale
# exempt-count for a round (VERDICT r13 What's-wrong #1), so any integer
# attached to a census word is checked regardless of magnitude.
CENSUS_RE = re.compile(r"\b(\d+)\s+(measured|exempt|undispositioned)\b")
NUM_RE = re.compile(
    r"(~?)(\d{1,3}(?:,\d{3})+(?:\.\d+)?|\d+\.\d+|\d+)"
    r"((?:\s?[KMGT]B)|[kMB]?)\b"
)
SUFFIX = {"": 1.0, "k": 1e3, "M": 1e6, "B": 1e9,
          "KB": 1e3, "MB": 1e6, "GB": 1e9, "TB": 1e12}


def artifact_numbers(path: Path) -> set[float]:
    nums: set[float] = set()

    def walk(v):
        if isinstance(v, bool):
            return
        if isinstance(v, (int, float)):
            nums.add(float(v))
        elif isinstance(v, dict):
            for x in v.values():
                walk(x)
        elif isinstance(v, list):
            for x in v:
                walk(x)

    walk(json.loads(path.read_text()))
    return nums


def regions(text: str):
    """(start_line, artifact_names, region_text) for each tagged region."""
    lines = text.splitlines()
    out, cur_names, cur_start, cur_lines = [], None, 0, []
    for i, line in enumerate(lines, 1):
        m = TAG_RE.search(line)
        if m:
            if cur_names is not None:
                out.append((cur_start, cur_names, cur_lines))
            spec = m.group(1)
            if spec == "end":
                cur_names = None
            else:
                cur_names = [s for s in re.split(r"[,\s]+", spec) if s]
                cur_start, cur_lines = i, []
            continue
        if cur_names is not None:
            cur_lines.append((i, line))
    if cur_names is not None:
        out.append((cur_start, cur_names, cur_lines))
    return out


def scrub(line: str) -> str:
    s = re.sub(r"\b[A-Z][A-Za-z0-9_]*\.json\b", " ", line)
    s = re.sub(r"\br\d+\b", " ", s)                    # round tags r04..r13
    s = re.sub(r"\bsf\d+(?:\.\d+)?\b", " ", s)         # scale-point ids
    s = re.sub(r"\b(skew|geo)\d+\b", " ", s)
    s = re.sub(r"\b\d+×", " ", s)                      # integer factors 10×/30×
    s = re.sub(r"\b\d+(?:\.\d+)?%", " ", s)            # prose-derived percentages
    s = re.sub(r"\bC\([^)]*\)", " ", s)                # combinatorics notation
    s = re.sub(r"\b\d+(?:\.\d+)?e[+-]?\d+\b", " ", s)
    s = re.sub(r"(10|2)[⁻⁰¹²³⁴⁵⁶⁷⁸⁹]+", " ", s)        # magnitude prose
    return s


def token_matches(raw: str, suffix: str, nums: set[float]) -> bool:
    clean = raw.replace(",", "")
    v = float(clean)
    scale = SUFFIX[suffix.strip()]
    frac = len(clean.split(".")[1]) if "." in clean else 0
    tol = 0.5 * 10**-frac
    return any(abs(a / scale - v) <= tol + 1e-12 for a in nums)


def check_doc(doc: Path) -> tuple[int, list[dict]]:
    misses, n_checked = [], 0
    for start, names, body in regions(doc.read_text()):
        missing_art = [n for n in names if not (REPO / n).is_file()]
        if missing_art:
            misses.append(
                {"doc": doc.name, "line": start,
                 "token": None, "artifacts": missing_art,
                 "context": "tag names artifact(s) not in the repo root"}
            )
            continue
        nums: set[float] = set()
        for n in names:
            nums |= artifact_numbers(REPO / n)
        for lineno, line in body:
            if "unpinned" in line:
                continue
            for m in CENSUS_RE.finditer(line):
                n_checked += 1
                if not token_matches(m.group(1), "", nums):
                    misses.append(
                        {"doc": doc.name, "line": lineno,
                         "token": m.group(0), "artifacts": names,
                         "context": line.strip()}
                    )
            for m in NUM_RE.finditer(scrub(line)):
                approx, raw, suffix = m.groups()
                if approx == "~":
                    continue
                clean = raw.replace(",", "")
                if "." not in clean and "," not in raw and float(clean) < 1000:
                    continue
                n_checked += 1
                if not token_matches(raw, suffix, nums):
                    misses.append(
                        {"doc": doc.name, "line": lineno,
                         "token": m.group(0), "artifacts": names,
                         "context": line.strip()}
                    )
    return n_checked, misses


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("docs", nargs="*", default=None)
    ap.add_argument("--json", dest="out", default=None)
    args = ap.parse_args()
    docs = args.docs or DOCS
    misses, total = [], 0
    for name in docs:
        n, m = check_doc(REPO / name)
        total += n
        misses.extend(m)
    report = {
        "docs": docs, "n_checked": total,
        "n_misses": len(misses), "misses": misses,
    }
    if args.out:
        (REPO / args.out).write_text(json.dumps(report, indent=1) + "\n")
    for miss in misses:
        print(
            f"MISS {miss['doc']}:{miss['line']} token {miss['token']!r} "
            f"not in {miss['artifacts']} — {miss['context']}",
            file=sys.stderr,
        )
    print(f"doccheck: {total} token(s) checked, {len(misses)} miss(es)")
    return 1 if misses else 0


if __name__ == "__main__":
    sys.exit(main())
