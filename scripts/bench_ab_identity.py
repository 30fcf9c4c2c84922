#!/usr/bin/env python
"""Targeted matched-set A/B vs the r14 close (a5e2bbb) for the three
entries VERDICT r15 flagged as driver regressions >1.5×:

  identity_column_appends   3.02 → 6.90  (2.28×)
  versioned_widen_column    2.50 → 4.23
  table_history_roundtrip   3.39 → 5.50

All three gained correctness-mandated work in r15 (eager
(pid,position) identity checkpoint + flock-serialized property; bloom
full rebuild across a widen; restore-time constraint validation +
rename-map carry), and all hold fresh r15 hash-matched verdicts — but
the r14 anchor-drift lesson says: attribute the cost with the right
instrument before it compounds. Protocol = BENCH_AB_R15's exactly:
same host, same runner (scripts/bench_ab_runner.py) timing both
trees, pinned alphabetical order, fresh .scratch per sweep, trees
counterbalanced A B B A, REPEAT=5 (three entries only, so the deeper
repeat is affordable and shrinks single-run ±20-30% noise).

Verdict rule: per-entry warm ratio within ±30% → noise/parity; above
it, the honest-cost attribution in VERDICT r15 stands quantified (the
named r15 work is the delta), or the delta is unexplained and needs a
fix. Writes BENCH_AB_IDENTITY_R16.json. Run on a QUIET host.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R14_TAG = "a5e2bbb"
R14_TREE = "/tmp/ab_r14_tree"
WORK = "/tmp/bench_ab_identity_r16"
ENTRIES = [
    "identity_column_appends",
    "table_history_roundtrip",
    "versioned_widen_column",
]


def fresh_scratch(tree: str) -> None:
    shutil.rmtree(os.path.join(tree, ".scratch"), ignore_errors=True)


def sweep(tree: str, names_path: str, out_path: str) -> dict:
    env = dict(os.environ, REPEAT="5")
    subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "bench_ab_runner.py"),
            tree,
            names_path,
            out_path,
        ],
        env=env,
        check=True,
    )
    return json.load(open(out_path))


def main() -> None:
    os.makedirs(WORK, exist_ok=True)
    if not os.path.isdir(R14_TREE):
        subprocess.run(
            ["git", "worktree", "add", "--detach", R14_TREE, R14_TAG],
            cwd=REPO,
            check=True,
        )
    names_path = os.path.join(WORK, "names.json")
    with open(names_path, "w") as fh:
        json.dump(ENTRIES, fh)

    plan = [("A1", REPO), ("B1", R14_TREE), ("B2", R14_TREE), ("A2", REPO)]
    results = {}
    for label, tree in plan:
        fresh_scratch(tree)
        t0 = time.time()
        results[label] = sweep(
            tree, names_path, os.path.join(WORK, f"sweep_{label}.json")
        )
        print(
            f"{label} ({tree}): warm={results[label]['warm']} "
            f"cold={results[label]['cold']} "
            f"({time.time() - t0:.0f}s wall)",
            flush=True,
        )

    def mean(xs):
        return sum(xs) / len(xs)

    per_entry = {}
    for n in ENTRIES:
        aw = mean([results["A1"]["warm"][n], results["A2"]["warm"][n]])
        bw = mean([results["B1"]["warm"][n], results["B2"]["warm"][n]])
        ac = mean([results["A1"]["cold"][n], results["A2"]["cold"][n]])
        bc = mean([results["B1"]["cold"][n], results["B2"]["cold"][n]])
        per_entry[n] = {
            "a_warm_mean": round(aw, 3),
            "b_warm_mean": round(bw, 3),
            "warm_ratio": round(aw / bw, 3) if bw else None,
            "a_cold_mean": round(ac, 3),
            "b_cold_mean": round(bc, 3),
            "cold_ratio": round(ac / bc, 3) if bc else None,
            "within_30pct_warm": bool(bw) and abs(aw / bw - 1.0) <= 0.30,
        }

    summary = {
        "r14_tag": R14_TAG,
        "entries": ENTRIES,
        "protocol": (
            "A B B A, pinned alpha order, repeat=5, fresh .scratch per "
            "sweep, shared runner (scripts/bench_ab_runner.py)"
        ),
        "per_entry": per_entry,
        "driver_r14_vs_r15_readings": {
            "identity_column_appends": [3.02, 6.9],
            "versioned_widen_column": [2.5, 4.23],
            "table_history_roundtrip": [3.39, 5.5],
        },
    }
    with open(os.path.join(REPO, "BENCH_AB_IDENTITY_R16.json"), "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
