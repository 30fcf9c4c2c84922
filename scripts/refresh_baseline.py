"""Regenerate BASELINE.md's measured table from BENCH_SELF.json.

Run after `SPARK_GRAFT_BENCH_REPEAT=2 python bench.py`; rewrites the
markdown table (everything between the `| query |` header and the
first blank line after it) and the cold/warm totals line, leaving the
surrounding prose untouched.
"""

from __future__ import annotations

import json
import pathlib
import re
import sys

root = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(root))
bench = json.loads((root / "BENCH_SELF.json").read_text())
cold, warm = bench["queries"], bench.get("warm", {})

lines = [
    "| query | sf | sec (cold) | sec (warm) | config |",
    "|---|---|---|---|---|",
]
for name, c in cold.items():
    w = warm.get(name, "")
    lines.append(f"| {name} | {bench['sf']} | {c:.2f} | {w:.2f} | 〃 |")
# bench.py's EXCLUDED set (quadratic ground-truth fixtures) still gets
# a named row so registry ⊆ BASELINE.md holds for the 2× audit.
import bench as _bench  # noqa: E402

for name in sorted(_bench.EXCLUDED):
    lines.append(
        f"| {name} | {bench['sf']} | excluded | excluded |"
        f" quadratic oracle fixture (see bench.py) |"
    )
table = "\n".join(lines)

md = (root / "BASELINE.md").read_text()
md = re.sub(
    r"\| query \| sf \|.*?(?=\n\n|\n#|\Z)",
    table,
    md,
    count=1,
    flags=re.S,
)
md = re.sub(
    r"\*\*[\d.]+ s cold / [\d.]+ s warm\*\*",
    f"**{bench['value']:.1f} s cold / {bench.get('warm_total', 0):.1f} s warm**",
    md,
    count=1,
)
md = re.sub(
    r"Totals over the \d+-entry bench set",
    f"Totals over the {len(cold)}-entry bench set",
    md,
    count=1,
)
(root / "BASELINE.md").write_text(md)
print(f"BASELINE.md refreshed: {len(cold)} entries, "
      f"{bench['value']:.1f}s cold / {bench.get('warm_total', 0):.1f}s warm")
