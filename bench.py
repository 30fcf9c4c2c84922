#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on local[N].

Prints EXACTLY ONE JSON line on stdout:
  {"queries": {"q1_pricing_summary": sec, ...},
   "metric": "total_wall_sec", "value": N, "unit": "sec",
   "sf": 0.1, "cpus": 32}
sized to fit the driver's ~2000-char stdout capture (keys compress to
alphabetical indices "qN" + centisecond values if full names overflow
the window — every entry stays itemized; scalar fields last so a tail
capture always retains them). The COMPLETE per-query map under full
names (cold + warm) is additionally written to BENCH_SELF.json,
committed each round.

Each query is materialized through the `noop` sink — full execution of
the physical plan (scan, shuffles, codegen) with no driver-side
collect, so the timing reflects the distributed work, not result
transfer.

Env knobs:
  SPARK_GRAFT_SF_DIR        testdata dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS          local parallelism (default 32)
  SPARK_GRAFT_BENCH_REPEAT  runs per query (default 1). With >1 the
                            JSON reports the FIRST (cold) timing and a
                            parallel "warm" map of the best timing —
                            used to fill BASELINE.md.
  SPARK_GRAFT_BENCH_ONLY    comma-separated entry names: run exactly
                            these (unknown names error loudly — a
                            silent skip would fake a faster sweep).
                            For matched-set A/B comparisons.
  SPARK_GRAFT_BENCH_ORDER   'alpha' (default since r16: pinned
                            alphabetical order, stable across rounds
                            — removes rotation reshuffling as a
                            variable in round-over-round comparisons;
                            VERDICT r14 task 1 made this the only
                            valid cross-round protocol, and the r16
                            rotation front-loading the 15 heaviest
                            streaming lifecycles made registry-order
                            sweeps unreadable) or 'registry' (the
                            verification-rotation order).

`ngram_jaccard_pairs` is deliberately excluded: it is the quadratic
ground-truth fixture for the LSH dedup operators (see operators/
dedup.py), not a production path; benching it at sf0.1 would measure
an O(n²) oracle, not the engine.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_ingestion_pipeline_spark.registry import REGISTRY  # noqa: E402
from data_ingestion_pipeline_spark.session import get_spark  # noqa: E402

EXCLUDED = {
    "ngram_jaccard_pairs",  # quadratic oracle fixture, not a production path
    "embedding_near_dup_pairs",  # same: exact all-pairs ground truth for the LSH variant
}


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


# The driver records the LAST ~2000 chars of stdout (BENCH_r04's
# capture cut the first ~11 timings — exactly the slowest entries,
# which the verification order had put first). The registry (156
# entries × ~19-char names) outgrew that window in r6-r8, which
# forced a lossy "rest" roll-up; itemized per-entry evidence now
# fits by SHORTENING THE KEYS, not dropping entries: if the
# full-name line exceeds the window, keys become q<i> with i the
# entry's index in the ALPHABETICALLY SORTED name list and values
# whole centiseconds ("qkeys"/"qunit" fields declare the scheme;
# BENCH_SELF.json, committed, carries the same timings under full
# names). Degradation cascade: full names → compact keys → roll-up of
# the fastest entries → totals-only. The last step means a reporting
# size problem can never crash the bench after the timing work is done.
MAX_LINE = 1900


def stdout_line(
    cold: dict, full: dict, sf: float, cpus: int, repeat: int = 1
) -> str:
    def scalars(out: dict) -> dict:
        out.update(
            metric="total_wall_sec",
            value=full["value"],
            unit="sec",
            sf=sf,
            cpus=cpus,
        )
        if repeat > 1:
            out["warm_total"] = full["warm_total"]
        return out

    def full_line() -> str:
        asc = sorted(cold, key=cold.get)
        return json.dumps(
            scalars({"queries": {n: cold[n] for n in asc}}),
            separators=(",", ":"),
        )

    def compact_line() -> str:
        alpha = sorted(cold)
        out = {
            "queries": {
                f"q{i}": int(round(cold[n] * 100)) for i, n in enumerate(alpha)
            },
            "qkeys": "qN = Nth name, alphabetical; full map in BENCH_SELF.json",
            "qunit": "centisec",
        }
        return json.dumps(scalars(out), separators=(",", ":"))

    def rollup_line() -> str | None:
        # itemize the slowest entries, roll the rest into one bucket —
        # a parseable line beats a head-cut one; BENCH_SELF.json still
        # carries every entry under full names.
        desc = sorted(cold, key=cold.get, reverse=True)
        out = None
        for keep in range(len(desc), 0, -1):
            head = {n: cold[n] for n in desc[:keep]}
            rest = [cold[n] for n in desc[keep:]]
            q = dict(head)
            if rest:
                q["rest"] = round(sum(rest), 2)
                q["rest_n"] = len(rest)
            out = json.dumps(scalars({"queries": q}), separators=(",", ":"))
            if len(out) <= MAX_LINE:
                return out
        return out

    def totals_line() -> str:
        # absolute floor: even rollup_line's keep=1 form overflowed
        # (pathological name lengths / timing inflation) — totals-only
        # is still parseable; never crash after the timing work.
        return json.dumps(scalars({"queries": {}}), separators=(",", ":"))

    line = full_line()
    if len(line) > MAX_LINE:
        line = compact_line()
    if len(line) > MAX_LINE:
        line = rollup_line()
    if line is None or len(line) > MAX_LINE:
        line = totals_line()
    return line


def _stream_warmup(spark) -> None:
    """One minimal availableNow drain (rate source → noop foreachBatch)
    to compile the micro-batch engine untimed."""
    import tempfile

    ckpt = tempfile.mkdtemp(prefix="bench-stream-warmup-")
    q = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "2")
        .load()
        .writeStream.foreachBatch(lambda bdf, bid: bdf.count())
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeat = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "1"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark("bench", cpus=cpus)
    names = [n for n in REGISTRY if n not in EXCLUDED]
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").strip()
    if only:
        want = [n for n in (s.strip() for s in only.split(",")) if n]
        unknown = sorted(set(want) - set(REGISTRY))
        if unknown:
            raise SystemExit(f"SPARK_GRAFT_BENCH_ONLY unknown entries: {unknown}")
        keep = set(want)
        names = [n for n in names if n in keep]
    order = os.environ.get("SPARK_GRAFT_BENCH_ORDER", "alpha")
    if order == "alpha":
        names = sorted(names)
    elif order != "registry":
        raise SystemExit(f"SPARK_GRAFT_BENCH_ORDER must be registry|alpha, got {order!r}")

    # Untimed warmup: JVM/codegen/session initialization otherwise
    # lands entirely on whichever query happens to run first (round 2
    # reported raw_filter_sort at 9.4 s vs 0.57 s warm for this
    # reason). One cheap query absorbs it; every timed number below is
    # then an engine measurement, not a JVM-boot measurement.
    materialize(REGISTRY["raw_filter_sort"].fn(spark, sf_dir))
    # Stream-source fixtures (the simulated Kafka backlog) are harness
    # setup, not engine work — build them untimed like testdata.
    from data_ingestion_pipeline_spark.streaming.pipeline import prewarm_feeds

    prewarm_feeds(spark, sf_dir)
    # Streaming-machinery warmup, same rationale as the batch warmup
    # above: the first streaming query of a session pays ~10 s of
    # micro-batch-engine/codegen compile that lands on whichever
    # streaming entry the verification rotation put first (BASELINE.md
    # r13: stream_enriched_revenue read 15.0 cold vs 3.8 warm purely
    # by rotation position). One untimed two-row drain absorbs it.
    _stream_warmup(spark)

    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    for name in names:
        # audit entries time their raw production path (bench_fn):
        # the grading joins exist for the correctness gate, not the
        # throughput story, and BASELINE.md timed the raw operators
        fn = REGISTRY[name].bench_fn or REGISTRY[name].fn
        runs = []
        for _ in range(max(repeat, 1)):
            t0 = time.perf_counter()
            materialize(fn(spark, sf_dir))
            runs.append(time.perf_counter() - t0)
        cold[name] = round(runs[0], 2)
        warm[name] = round(min(runs), 2)

    # Complete evidence (all per-query timings, cold + warm) goes to a
    # repo file committed per round — the stdout line below is
    # capacity-limited by the driver's capture window and may roll up
    # the fastest entries.
    full = {
        "metric": "total_wall_sec",
        "value": round(sum(cold.values()), 2),
        "unit": "sec",
        "queries": cold,
        "sf": sf,
        "cpus": cpus,
        # Self-description (VERDICT r15): which series each field is,
        # so cross-round per-entry comparisons never silently mix
        # cold and warm semantics. `queries` and `value` are always
        # the FIRST (cold) timing of each entry; with --repeat>1 the
        # `warm` map / `warm_total` are the best-of-N timings.
        "per_entry_metric": "cold_first_run",
        "total_metric": "sum_of_cold_first_runs",
        "repeat": max(repeat, 1),
        "order": order,
    }
    if repeat > 1:
        full["warm"] = warm
        full["warm_total"] = round(sum(warm.values()), 2)
        full["warm_metric"] = "best_of_repeat_runs"
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_SELF.json"), "w") as f:
        json.dump(full, f, indent=1)

    print(stdout_line(cold, full, sf, cpus, repeat))
    spark.stop()


if __name__ == "__main__":
    main()
