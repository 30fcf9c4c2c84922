#!/usr/bin/env python
"""Dump `.explain("formatted")` for named registry entries to files.

Usage:
  python scripts/dump_plans.py <outdir> <suffix> <entry> [<entry> ...]

Writes <outdir>/<entry>_<suffix>.txt for each entry. Plans are built at
sf0.001 (shapes are scale-invariant). Streaming lifecycles cannot be
planned without running a drain; for those the file records the plan of
the RESULT READ plus a note — the job-level evidence for lifecycle
entries lives in OPTIMIZATION_r16.md (profile_entry.py job counts).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_ingestion_pipeline_spark.registry import REGISTRY  # noqa: E402
from data_ingestion_pipeline_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_PLAN_SF", "/root/testdata/sf0.001")


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    bad = [n for n in names if n not in REGISTRY]
    if bad:
        raise SystemExit(f"unknown entries: {bad}")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump-plans")
    for name in names:
        spec = REGISTRY[name]
        fn = spec.bench_fn or spec.fn
        note = ""
        if name.startswith("stream_"):
            note = (
                "NOTE: streaming lifecycle entry — this is the plan of the\n"
                "final result read after the drain; the per-batch sink work\n"
                "is profiled at the job level (see OPTIMIZATION_r16.md).\n\n"
            )
        df = fn(spark, SF)
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(note + plan_of(df))
        print(f"wrote {name}_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
