#!/usr/bin/env python
"""ONE matched-set bench sweep over an arbitrary repo tree.

Subprocess worker for scripts/bench_ab.py (VERDICT r14 task 1: the
quiet-anchor drift investigation needs the SAME harness code timing
BOTH trees — the r13 tag's bench.py predates the BENCH_ONLY/ORDER
knobs, so this runner replicates bench.py's protocol verbatim —
noop-sink materialization, untimed batch + feed + streaming warmups —
against whichever tree is passed in, in PINNED ALPHABETICAL order so
the verification rotation cannot reshuffle which entries run cold).

Usage: bench_ab_runner.py <tree> <names.json> <out.json>
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, REPEAT (default 2).
"""

from __future__ import annotations

import importlib
import json
import os
import sys
import time


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    tree, names_path, out_path = sys.argv[1:4]
    names = sorted(json.load(open(names_path)))
    repeat = int(os.environ.get("REPEAT", "2"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    sys.path.insert(0, tree)
    registry = importlib.import_module(
        "data_ingestion_pipeline_spark.registry"
    ).REGISTRY
    session = importlib.import_module("data_ingestion_pipeline_spark.session")
    spark = session.get_spark("bench-ab", cpus=cpus)

    # untimed warmups — bench.py's exact protocol
    materialize(registry["raw_filter_sort"].fn(spark, sf_dir))
    pipeline = importlib.import_module(
        "data_ingestion_pipeline_spark.streaming.pipeline"
    )
    pipeline.prewarm_feeds(spark, sf_dir)
    import tempfile

    ckpt = tempfile.mkdtemp(prefix="bench-ab-stream-warmup-")
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

    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    for name in names:
        spec = registry[name]
        fn = getattr(spec, "bench_fn", None) or spec.fn
        runs = []
        for _ in range(max(repeat, 1)):
            t0 = time.perf_counter()
            materialize(fn(spark, sf_dir))
            runs.append(time.perf_counter() - t0)
        cold[name] = round(runs[0], 3)
        warm[name] = round(min(runs), 3)

    with open(out_path, "w") as fh:
        json.dump(
            {
                "tree": tree,
                "order": "alpha",
                "repeat": repeat,
                "sf_dir": sf_dir,
                "cpus": cpus,
                "cold_total": round(sum(cold.values()), 2),
                "warm_total": round(sum(warm.values()), 2),
                "cold": cold,
                "warm": warm,
                "finished_at": time.time(),
            },
            fh,
            indent=1,
        )
    spark.stop()


if __name__ == "__main__":
    main()
