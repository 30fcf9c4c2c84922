#!/usr/bin/env python
"""Per-entry job-level profile: run one registry entry's bench path
with the Spark event log enabled, then break its wall time down into
the individual Spark jobs (description, duration, task time) plus the
driver-side gaps between jobs.

Usage:
  python scripts/profile_entry.py <entry> [<entry> ...]

Writes a human-readable breakdown to stdout. This is the measurement
instrument for the optimization rounds (guide §1: measure first —
know whether an entry's seconds are executor compute, many small
jobs' fixed overhead, or driver-side Python between jobs).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_ingestion_pipeline_spark.registry import REGISTRY  # noqa: E402
from data_ingestion_pipeline_spark.session import get_spark  # noqa: E402

EVDIR = "/tmp/spark-events-profile"


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def parse_eventlog(path: str) -> tuple[list[dict], list[dict]]:
    jobs: dict[int, dict] = {}
    stage_names: dict[int, str] = {}
    stages: dict[int, dict] = {}
    with open(path) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                jobs[jid] = {
                    "job": jid,
                    "start": ev["Submission Time"],
                    "desc": props.get("spark.job.description", ""),
                    "callsite": props.get("callSite.short", ""),
                    "stages": [
                        s["Stage ID"] for s in ev.get("Stage Infos", [])
                    ],
                }
                for s in ev.get("Stage Infos", []):
                    stage_names[s["Stage ID"]] = s.get("Stage Name", "")
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["end"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev.get("Stage Info", {})
                sid = si.get("Stage ID")
                sub = si.get("Submission Time")
                com = si.get("Completion Time")
                if sid is not None and sub and com:
                    # merge: TaskEnd events for this stage may already
                    # have buffered task_time under the same id
                    st = stages.setdefault(sid, {"stage": sid})
                    st.update(
                        start=sub,
                        end=com,
                        dur=(com - sub) / 1000.0,
                        name=si.get("Stage Name", ""),
                        tasks=si.get("Number of Tasks", 0),
                    )
            elif e == "SparkListenerTaskEnd":
                sid = ev.get("Stage ID")
                tm = (ev.get("Task Metrics") or {})
                if sid in stages:
                    stages[sid].setdefault("task_time", 0.0)
                    stages[sid]["task_time"] += (
                        tm.get("Executor Run Time", 0) / 1000.0
                    )
                elif sid is not None:
                    # task events precede StageCompleted; buffer by id
                    stages.setdefault(sid, {"stage": sid})
                    stages[sid].setdefault("task_time", 0.0)
                    stages[sid]["task_time"] += (
                        tm.get("Executor Run Time", 0) / 1000.0
                    )
    out = []
    for jid in sorted(jobs):
        j = jobs[jid]
        if "end" not in j:
            continue
        j["dur"] = (j["end"] - j["start"]) / 1000.0
        j["name"] = j["desc"] or stage_names.get(
            j["stages"][0] if j["stages"] else -1, j["callsite"]
        )
        out.append(j)
    st = [s for s in stages.values() if "dur" in s]
    return out, st


def main() -> None:
    names = sys.argv[1:]
    bad = [n for n in names if n not in REGISTRY]
    if bad:
        raise SystemExit(f"unknown entries: {bad}")
    os.makedirs(EVDIR, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVDIR,
            # Spark 4 compresses rolling event logs by default; keep
            # them plain text so this script can parse them directly.
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    app_id = spark.sparkContext.applicationId

    # warmups, mirroring bench.py
    materialize(REGISTRY["raw_filter_sort"].fn(spark, sf_dir))
    from data_ingestion_pipeline_spark.streaming.pipeline import prewarm_feeds

    prewarm_feeds(spark, sf_dir)

    marks = []
    for name in names:
        fn = REGISTRY[name].bench_fn or REGISTRY[name].fn
        t0 = time.time()
        materialize(fn(spark, sf_dir))
        t1 = time.time()
        marks.append((name, t0 * 1000, t1 * 1000, t1 - t0))

    spark.stop()
    time.sleep(1.0)
    evlog = os.path.join(EVDIR, app_id)
    if not os.path.exists(evlog):
        # Spark 4 rolling layout: eventlog_v2_<appid>/events_N_<appid>[.suffix]
        cands = [
            p for p in os.listdir(EVDIR)
            if p.startswith(app_id) or p == f"eventlog_v2_{app_id}"
        ]
        if not cands:
            raise SystemExit(f"no event log for {app_id} in {EVDIR}")
        evlog = os.path.join(EVDIR, cands[0])
    if os.path.isdir(evlog):
        parts = sorted(
            os.path.join(evlog, p)
            for p in os.listdir(evlog)
            if p.startswith("events_")
        )
        jobs, stages = [], []
        for p in parts:
            js, st = parse_eventlog(p)
            jobs.extend(js)
            stages.extend(st)
    else:
        jobs, stages = parse_eventlog(evlog)

    for name, ms0, ms1, wall in marks:
        mine = [j for j in jobs if ms0 <= j["start"] <= ms1]
        jsum = sum(j["dur"] for j in mine)
        print(f"\n=== {name}: wall {wall:.2f}s, {len(mine)} jobs, "
              f"job time {jsum:.2f}s, driver/gap {wall - jsum:.2f}s ===")
        # largest driver-side gaps between consecutive jobs (planning,
        # py4j, manifest I/O, Python between actions)
        prev_end, gaps = ms0, []
        for j in sorted(mine, key=lambda j: j["start"]):
            gaps.append((j["start"] - prev_end, j))
            prev_end = max(prev_end, j["end"])
        gaps.append((ms1 - prev_end, {"job": -1, "name": "<end>"}))
        for g, j in sorted(gaps, key=lambda t: -t[0])[:6]:
            if g > 200:
                print(f"  gap {g/1000:6.2f}s before job {j['job']} "
                      f"[{(j.get('desc') or j.get('callsite') or '')[:70]}]")
        # stage-level: aggregate by stage name (operator callsite)
        smine = [s for s in stages if ms0 <= s["start"] <= ms1]
        agg: dict[str, list] = {}
        for s in smine:
            k = " ".join(s.get("name", "").split())[:90]
            agg.setdefault(k, [0, 0.0, 0.0, 0])
            agg[k][0] += 1
            agg[k][1] += s["dur"]
            agg[k][2] += s.get("task_time", 0.0)
            agg[k][3] += s.get("tasks", 0)
        for k, (n, d, tt, nt) in sorted(
            agg.items(), key=lambda kv: -kv[1][1]
        )[:30]:
            print(f"  {d:7.2f}s wall  {tt:7.2f}s task  x{n:<3d} "
                  f"({nt} tasks)  {k}")


if __name__ == "__main__":
    main()
