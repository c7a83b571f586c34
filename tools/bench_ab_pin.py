#!/usr/bin/env python
"""Interleaved A/B pin re-anchor (VERDICT r12 Next #2).

Two consecutive rounds showed ~10% common-suite pin drift, both
adjudicated ambient. This runs the experiment instead of a third
adjudication: the CURRENT tree (B) and a REPLAY of the round-11 tree
(A, git worktree at the r11 close commit) are pinned in interleaved
windows inside one machine session — A B B A (first window order
swapped in the second half to cancel slow machine trends). Both trees
run the SAME pin protocol file (this repo's ``tools/bench_pinned.py``
is copied into the replay worktree, so the r12 prewarm + noop-sink
protocol applies to both) and the SAME session configuration resolved
by each tree's own ``session.py``.

Per tree, per query: runs from all its windows are pooled and the
median taken; the suite is compared over the common rows. Verdicts:

- ratio ≈ 1 → the r11→r12→r13 drift does NOT replay tree-to-tree: it
  was ambient (machine window), and the r13 pin becomes the new anchor.
- ratio ≈ the observed drift → the drift IS attributable to the tree
  (bisect next, starting with the 1024-row Arrow default on JVM rows).

Usage::

    python tools/bench_ab_pin.py --out BENCH_AB_r13.json \
        --r11-commit a78c018 [--repeats 2] [--windows 2]
"""

from __future__ import annotations

import argparse
import json
import statistics
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
WORKTREE = Path("/tmp/spark_graft_ab_r11")


def ensure_worktree(commit: str) -> Path:
    if not (WORKTREE / "tools").exists():
        subprocess.run(
            ["git", "worktree", "add", "--detach", str(WORKTREE), commit],
            cwd=REPO, check=True,
        )
    # both trees must run the SAME protocol file
    (WORKTREE / "tools" / "bench_pinned.py").write_bytes(
        (REPO / "tools" / "bench_pinned.py").read_bytes()
    )
    return WORKTREE


def run_pin(tree: Path, out: Path, repeats: int) -> dict:
    subprocess.run(
        [sys.executable, str(tree / "tools" / "bench_pinned.py"),
         "--repeats", str(repeats), "--out", str(out)],
        cwd=tree, check=True,
    )
    return json.loads(out.read_text())["queries"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--r11-commit", required=True)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--windows", type=int, default=2,
                    help="windows PER TREE (total pin invocations = 2x)")
    ap.add_argument("--out", default=str(REPO / "BENCH_AB_r13.json"))
    args = ap.parse_args()

    tree_a = ensure_worktree(args.r11_commit)
    tree_b = REPO
    tmp = Path(tempfile.mkdtemp(prefix="ab_pin_"))

    # interleave, swapping order at the midpoint: A B B A (windows=2)
    schedule = []
    for w in range(args.windows):
        pair = [("a", tree_a), ("b", tree_b)]
        if w >= args.windows / 2:
            pair.reverse()
        schedule.extend((label, tree, w) for label, tree in pair)

    runs: dict[str, dict[str, list[float]]] = {"a": {}, "b": {}}
    order = []
    for i, (label, tree, w) in enumerate(schedule):
        out = tmp / f"pin_{label}_{w}.json"
        print(f"== window {i + 1}/{len(schedule)}: tree {label} "
              f"({tree})", file=sys.stderr)
        q = run_pin(tree, out, args.repeats)
        order.append(label)
        for name, row in q.items():
            runs[label].setdefault(name, []).extend(row["runs"])

    med = {
        label: {n: statistics.median(r) for n, r in byq.items()}
        for label, byq in runs.items()
    }
    common = sorted(set(med["a"]) & set(med["b"]))
    suite_a = sum(med["a"][n] for n in common)
    suite_b = sum(med["b"][n] for n in common)
    ratios = sorted(med["b"][n] / med["a"][n] for n in common if med["a"][n] > 0)
    report = {
        "design": (
            "interleaved same-machine windows, order "
            + "".join(order)
            + f", {args.repeats} timed repeats per window per tree, "
            "shared pin protocol file (r12 prewarm), each tree's own "
            "session.py config"
        ),
        "r11_commit": args.r11_commit,
        "n_common": len(common),
        "suite_r11_replay_s": round(suite_a, 2),
        "suite_r13_s": round(suite_b, 2),
        "suite_ratio_r13_over_r11": round(suite_b / suite_a, 4),
        "median_per_query_ratio": round(
            statistics.median(ratios), 4
        ),
        "p90_per_query_ratio": round(
            ratios[int(0.9 * (len(ratios) - 1))], 4
        ),
        "rows_over_2x": {
            n: round(med["b"][n] / med["a"][n], 2)
            for n in common
            if med["a"][n] > 0 and med["b"][n] / med["a"][n] > 2
        },
        "per_query": {
            n: {"r11_replay_median_s": round(med["a"][n], 4),
                "r13_median_s": round(med["b"][n], 4)}
            for n in common
        },
    }
    Path(args.out).write_text(json.dumps(report, indent=1) + "\n")

    # The B side IS the controlled r13 pin — emit it in the
    # BENCH_PINNED format (median/spread over the pooled interleaved
    # runs) so BASELINE.md can anchor on it.
    pinned_q = {}
    for n, r in runs["b"].items():
        med_n = statistics.median(r)
        pinned_q[n] = {
            "median": round(med_n, 4),
            "spread": round((max(r) - min(r)) / med_n, 4) if med_n else 0.0,
            "runs": [round(x, 4) for x in sorted(r, reverse=True)],
        }
    spreads = sorted(v["spread"] for v in pinned_q.values())
    pinned = {
        "metric": "pinned_suite_median_per_query_sum",
        "value": round(sum(v["median"] for v in pinned_q.values()), 4),
        "unit": "sec",
        "sf": 0.1,
        "repeats": args.repeats * args.windows,
        "protocol": (
            "interleaved A/B windows (tools/bench_ab_pin.py): runs pooled "
            "across this tree's windows of the controlled experiment"
        ),
        "max_spread": spreads[-1] if spreads else 0.0,
        "p90_spread": spreads[int(0.9 * (len(spreads) - 1))] if spreads else 0.0,
        "queries": pinned_q,
    }
    pinned_path = REPO / "BENCH_PINNED_r13.json"
    pinned_path.write_text(json.dumps(pinned, indent=1) + "\n")
    print(f"-> {args.out} + {pinned_path.name}", file=sys.stderr)
    print(json.dumps({k: v for k, v in report.items()
                      if k not in ("per_query",)}, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
