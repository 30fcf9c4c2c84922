#!/usr/bin/env python
"""Full matched-set A/B of the current tree vs the r13 tag (4a21961).

VERDICT r14 task 1: two consecutive rounds re-baselined the quiet
bench anchor upward (warm 192.0 → 258.6 s) and the >1.8×-movers A/B
could not distinguish genuine per-entry regressions from a uniform
global constant. This sweep can: SAME host, SAME session protocol,
SAME pinned alphabetical order, SAME matched entry set (intersection
of both registries), FRESH .scratch for both trees (accumulated
scratch state is itself a drift hypothesis), trees alternated
A B B A so linear host drift cancels instead of loading onto one arm.

Each arm runs in its own subprocess (bench_ab_runner.py) with
sys.path pinned to its tree — no package shadowing. Verdict rule:
matched warm totals within ±10% exonerates the current tree (the
anchor drift was measurement conditions, e.g. rotation/cold-position
or driver-window contention); outside it, the per-entry warm deltas
in the output name the regressing code paths.

Writes BENCH_AB_R15.json. Run on a QUIET host (no concurrent pytest).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R13_TAG = "4a21961"
R13_TREE = "/tmp/ab_r13_tree"
WORK = "/tmp/bench_ab_r15"
EXCLUDED = {"ngram_jaccard_pairs", "embedding_near_dup_pairs"}


def registry_names(tree: str) -> list[str]:
    out = subprocess.run(
        [
            sys.executable,
            "-c",
            "import sys, json; sys.path.insert(0, sys.argv[1]); "
            "from data_ingestion_pipeline_spark.registry import REGISTRY; "
            "print(json.dumps(sorted(REGISTRY)))",
            tree,
        ],
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def fresh_scratch(tree: str) -> None:
    shutil.rmtree(os.path.join(tree, ".scratch"), ignore_errors=True)


def sweep(tree: str, names_path: str, out_path: str) -> dict:
    env = dict(os.environ, REPEAT="2")
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
    if not os.path.isdir(R13_TREE):
        subprocess.run(
            ["git", "worktree", "add", "--detach", R13_TREE, R13_TAG],
            cwd=REPO,
            check=True,
        )

    matched = sorted(
        (set(registry_names(REPO)) & set(registry_names(R13_TREE))) - EXCLUDED
    )
    names_path = os.path.join(WORK, "matched_names.json")
    with open(names_path, "w") as fh:
        json.dump(matched, fh)
    print(f"matched entries: {len(matched)}", flush=True)

    # A = current tree, B = r13 tag; counterbalanced A B B A
    plan = [("A1", REPO), ("B1", R13_TREE), ("B2", R13_TREE), ("A2", REPO)]
    results = {}
    for label, tree in plan:
        fresh_scratch(tree)  # both arms start every sweep cold on scratch
        t0 = time.time()
        results[label] = sweep(
            tree, names_path, os.path.join(WORK, f"sweep_{label}.json")
        )
        print(
            f"{label} ({tree}): warm_total={results[label]['warm_total']} "
            f"cold_total={results[label]['cold_total']} "
            f"({time.time() - t0:.0f}s wall)",
            flush=True,
        )

    def mean(xs):
        return sum(xs) / len(xs)

    a_warm = mean([results["A1"]["warm_total"], results["A2"]["warm_total"]])
    b_warm = mean([results["B1"]["warm_total"], results["B2"]["warm_total"]])
    ratio = a_warm / b_warm if b_warm else float("nan")
    # per-entry warm deltas (mean A vs mean B), largest regressions first
    deltas = []
    for n in matched:
        aw = mean([results["A1"]["warm"][n], results["A2"]["warm"][n]])
        bw = mean([results["B1"]["warm"][n], results["B2"]["warm"][n]])
        deltas.append({"entry": n, "a_warm": round(aw, 3), "b_warm": round(bw, 3),
                       "delta": round(aw - bw, 3)})
    deltas.sort(key=lambda d: d["delta"], reverse=True)

    summary = {
        "r13_tag": R13_TAG,
        "matched_entries": len(matched),
        "protocol": "A B B A, pinned alpha order, repeat=2, fresh .scratch per sweep",
        "a_warm_totals": [results["A1"]["warm_total"], results["A2"]["warm_total"]],
        "b_warm_totals": [results["B1"]["warm_total"], results["B2"]["warm_total"]],
        "a_cold_totals": [results["A1"]["cold_total"], results["A2"]["cold_total"]],
        "b_cold_totals": [results["B1"]["cold_total"], results["B2"]["cold_total"]],
        "a_warm_mean": round(a_warm, 2),
        "b_warm_mean": round(b_warm, 2),
        "a_over_b": round(ratio, 4),
        "within_10pct": abs(ratio - 1.0) <= 0.10,
        "per_entry_warm_deltas": deltas,
    }
    with open(os.path.join(REPO, "BENCH_AB_R15.json"), "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps({k: v for k, v in summary.items()
                      if k != "per_entry_warm_deltas"}, indent=1))


if __name__ == "__main__":
    main()
