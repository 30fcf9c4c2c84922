"""Phase-tagged timing for stream_session_windows_bounded
(VERDICT r14 task 2).

The entry's quiet reading grew monotonically three rounds running
(6.03 → 6.7 → 8.49 s) with a 33.1 s driver-window reading in r14 —
the sweep's most expensive entry and the round's sole perf-weak. This
harness attributes its wall time at phase granularity so growth can
be pinned to a code path (or exonerated as measurement conditions,
the semantic_dedup r13 outcome):

  fixture      build_ordered_feed (marker-cached; ~0 when warm)
  drain        the availableNow drain, decomposed into:
    sink_read    read_version calls inside the foreachBatch sink
                 (replica re-read per batch)
    sink_commit  commit_version calls inside the sink (manifest
                 publish per batch)
    engine       the remainder — micro-batch planning, state store
                 ops, timeout sweep, Python worker execution; the
                 per-batch durationMs + stateOperators metrics from
                 the query's own progress events are recorded raw
  readback     count() of the drained replica

Usage:
  python scripts/session_windows_phases.py                # solo
  python scripts/session_windows_phases.py --contended    # vs bench.py
  python scripts/session_windows_phases.py --n 3          # repetitions

Appends one record per run to SESSION_WINDOWS_PHASES.json (committed).
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from pyspark.sql.streaming import StreamingQueryListener  # noqa: E402

from data_ingestion_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = ROOT / "SESSION_WINDOWS_PHASES.json"


class ProgressTap(StreamingQueryListener):
    """Collect every progress event's raw JSON (durationMs +
    stateOperators) — recentProgress truncates, listener events
    don't."""

    def __init__(self) -> None:
        self.progress: list[dict] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        self.progress.append(json.loads(event.progress.json))

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def run_once(spark, sf_dir: str) -> dict:
    from data_ingestion_pipeline_spark.operators import versioned as V
    from data_ingestion_pipeline_spark.streaming import pipeline as P

    sf_name = os.path.basename(sf_dir.rstrip("/"))
    t0 = time.perf_counter()
    P.build_ordered_feed(
        spark, sf_dir, P.scratch_path("stream_ordered", sf_name, "feed")
    )
    fixture = round(time.perf_counter() - t0, 3)

    acc = {"sink_read": 0.0, "sink_commit": 0.0, "reads": 0, "commits": 0}
    real_commit, real_read = V.commit_version, V.read_version
    real_merge = V.merge_into_mor

    def commit(*a, **k):
        t = time.perf_counter()
        try:
            return real_commit(*a, **k)
        finally:
            acc["sink_commit"] += time.perf_counter() - t
            acc["commits"] += 1

    def merge(*a, **k):
        t = time.perf_counter()
        try:
            return real_merge(*a, **k)
        finally:
            acc["sink_commit"] += time.perf_counter() - t
            acc["commits"] += 1

    def read(*a, **k):
        t = time.perf_counter()
        try:
            return real_read(*a, **k)
        finally:
            acc["sink_read"] += time.perf_counter() - t
            acc["reads"] += 1

    tap = ProgressTap()
    spark.streams.addListener(tap)
    V.commit_version, V.read_version = commit, read
    V.merge_into_mor = merge
    try:
        t0 = time.perf_counter()
        df = P.stream_session_windows_bounded(spark, sf_dir)
        drain = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        n_rows = df.count()
        readback = round(time.perf_counter() - t0, 3)
    finally:
        V.commit_version, V.read_version = real_commit, real_read
        V.merge_into_mor = real_merge
        spark.streams.removeListener(tap)

    batches = []
    for p in tap.progress:
        so = (p.get("stateOperators") or [{}])[0]
        batches.append(
            {
                "batchId": p.get("batchId"),
                "numInputRows": p.get("numInputRows"),
                "durationMs": p.get("durationMs"),
                "state": {
                    k: so.get(k)
                    for k in (
                        "numRowsTotal",
                        "numRowsUpdated",
                        "numRowsRemoved",
                        "allUpdatesTimeMs",
                        "allRemovalsTimeMs",
                        "commitTimeMs",
                        "memoryUsedBytes",
                    )
                },
            }
        )
    return {
        "fixture": fixture,
        "drain": drain,
        "sink_read": round(acc["sink_read"], 3),
        "sink_commit": round(acc["sink_commit"], 3),
        "engine": round(drain - acc["sink_read"] - acc["sink_commit"], 3),
        "sink_calls": {"reads": acc["reads"], "commits": acc["commits"]},
        "readback": readback,
        "result_rows": n_rows,
        "batches": batches,
    }


def main() -> None:
    contended = "--contended" in sys.argv
    n = int(sys.argv[sys.argv.index("--n") + 1]) if "--n" in sys.argv else 1
    bench = None
    if contended:
        bench = subprocess.Popen(
            [sys.executable, str(ROOT / "bench.py")],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        time.sleep(45)  # let the sweep ramp to saturation

    spark = get_spark("session-windows-phases")
    # same untimed JVM warmup bench.py applies
    from data_ingestion_pipeline_spark.registry import REGISTRY

    REGISTRY["raw_filter_sort"].fn(spark, SF_DIR).write.mode(
        "overwrite"
    ).format("noop").save()

    runs = [run_once(spark, SF_DIR) for _ in range(n)]
    rec = {
        "mode": "contended" if contended else "solo",
        "sf_dir": SF_DIR,
        "git": subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=ROOT,
            capture_output=True,
            text=True,
        ).stdout.strip(),
        "ts": time.time(),
        "runs": runs,
    }
    history = json.loads(OUT.read_text()) if OUT.exists() else []
    history.append(rec)
    OUT.write_text(json.dumps(history, indent=1))
    print(json.dumps(rec["runs"], indent=1))
    spark.stop()
    if bench is not None:
        bench.wait()


if __name__ == "__main__":
    main()
