#!/usr/bin/env python
"""Merge-sink vs rewrite-sink growth pair for the session-window
stream (VERDICT r15 task 2: "close the weak flag with a measurement,
not prose").

Claim under test: the r15 sink rewrite (per-batch full-table
commit_version → one three-clause merge_into_mor) changed the
per-batch sink cost from O(table) to O(emitted). At toy SF the merge
carries a ~1.2 s fixed overhead and LOSES a single-sweep timing, so
the r15 verdict asked for the crossover measured: replay the SAME
stateful session pipeline at table scale ×1 and ×10 with per-batch
row counts held constant (ntile slicing: scale× files of equal rows,
maxFilesPerTrigger=2), under BOTH sink shapes, timing ONLY the sink
commit. If the claim holds, tail-batch sink cost grows ~linearly with
table size under rewrite and stays ~flat under merge.

Scale construction: events sf0.01 replicated K× with disjoint
user_id/event_id offsets at identical timestamps — K× sessions, K×
table rows, same per-batch arrival volume. Bounded mode (watermark +
EventTimeTimeout, 1 h horizon) — the production deployment shape.

Writes SESSION_SINK_GROWTH.json. Run on a QUIET host.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
SCALES = (1, 10)
BASE_FILES = 4  # ×1 file count; scale K uses K*BASE_FILES equal-row files


def build_scaled_feed(spark, sf_dir: str, feed_dir: str, scale: int) -> int:
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from data_ingestion_pipeline_spark.sources.tables import load_table
    from data_ingestion_pipeline_spark.streaming.pipeline import FEED_COLS

    shutil.rmtree(feed_dir, ignore_errors=True)
    ev = load_table(spark, sf_dir, "events").select(*FEED_COLS)
    parts = [
        ev.withColumn("user_id", F.col("user_id") + F.lit(i * 10_000_000))
        .withColumn("event_id", F.col("event_id") + F.lit(i * 1_000_000_000))
        for i in range(scale)
    ]
    scaled = parts[0]
    for p in parts[1:]:
        scaled = scaled.unionByName(p)
    n_files = BASE_FILES * scale
    sliced = scaled.withColumn(
        "_slice", F.ntile(n_files).over(W.orderBy("ts", "event_id"))
    ).cache()
    total = sliced.count()
    for k in range(1, n_files + 1):
        sliced.filter(F.col("_slice") == k).drop("_slice").coalesce(
            1
        ).write.mode("append").parquet(feed_dir)
    sliced.unpersist()
    return total


def run_stream(spark, feed: str, table: str, ckpt: str, sink_mode: str):
    """One availableNow drain of the bounded session pipeline with the
    given sink shape; returns per-batch sink timings."""
    from pyspark.sql import DataFrame
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    from data_ingestion_pipeline_spark.operators import versioned as V
    from data_ingestion_pipeline_spark.streaming.pipeline import (
        FEED_SCHEMA,
        SESSION_OUT,
        SESSION_STATE,
        _session_merge_fn_factory,
        _stream_shuffle,
    )

    horizon_s = 3600
    shutil.rmtree(table, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    os.makedirs(table, exist_ok=True)

    source = (
        spark.readStream.schema(FEED_SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .parquet(feed)
        .withWatermark("ts", f"{horizon_s} seconds")
    )
    stream = source.groupBy("user_id").applyInPandasWithState(
        _session_merge_fn_factory(horizon_s * 1_000_000),
        outputStructType=SESSION_OUT,
        stateStructType=SESSION_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )

    timings: list[dict] = []
    attrs = ["session_end", "event_count", "avg_value"]

    def _sink(bdf: DataFrame, batch_id: int) -> None:
        sess = bdf.sparkSession
        emitted = bdf.cache()
        n_emit = emitted.count()  # materialize BEFORE the timed commit
        t0 = time.perf_counter()
        if V.current_version(table) == 0:
            V.commit_version(
                sess,
                table,
                emitted.filter(F.col("event_count") > 0),
                meta={"batch_id": batch_id},
            )
        elif sink_mode == "merge":
            V.merge_into_mor(
                sess,
                table,
                emitted,
                ["user_id", "session_start"],
                when_matched=[
                    ("update", {c: f"s.{c}" for c in attrs},
                     "s.event_count > 0"),
                    ("delete", None, "s.event_count = 0"),
                ],
                insert_not_matched={
                    c: f"s.{c}"
                    for c in ["user_id", "session_start", *attrs]
                },
                insert_not_matched_cond="s.event_count > 0",
                meta={"batch_id": batch_id},
            )
        else:  # the pre-r15 rewrite shape: full-table snapshot commit
            cur = V.read_version(sess, table)
            keep = cur.join(
                emitted.select("user_id", "session_start"),
                ["user_id", "session_start"],
                "left_anti",
            )
            V.commit_version(
                sess,
                table,
                keep.unionByName(
                    emitted.filter(F.col("event_count") > 0).select(
                        *cur.columns
                    )
                ),
                meta={"batch_id": batch_id},
            )
        timings.append(
            {
                "batch_id": int(batch_id),
                "emitted": int(n_emit),
                "table_rows_before": None,
                "sink_sec": round(time.perf_counter() - t0, 3),
            }
        )
        emitted.unpersist()

    with _stream_shuffle(spark):
        q = (
            stream.writeStream.foreachBatch(_sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    final_rows = V.read_version(spark, table).count()
    return timings, final_rows


def seeded_sink_sweep(spark, work: str) -> dict:
    """The isolating experiment: the replay pair above holds per-batch
    volume constant but its ×10 table (≈100k rows) is still so small
    that BOTH sink shapes sit on their fixed-overhead floor — rewrite
    reads flat 0.46 s/batch because rewriting 100k rows is free, not
    because the claim is false. This sweep isolates the claimed term
    directly: seed the session table at N rows, apply ONE fixed-size
    emitted batch (60% updates / 20% tombstones / 20% inserts — the
    session sink's delta mix) through each sink shape, and time the
    commit. sink_cost(N) for fixed batch is exactly the quantity the
    O(table)-vs-O(emitted) claim is about, with no stateful engine
    noise in the timing."""
    from pyspark.sql import functions as F

    from data_ingestion_pipeline_spark.operators import versioned as V

    def dirbytes(p: str) -> int:
        tot = 0
        for root, _, fs in os.walk(p):
            for f in fs:
                tot += os.path.getsize(os.path.join(root, f))
        return tot

    attrs = ["session_end", "event_count", "avg_value"]
    cols = ["user_id", "session_start", *attrs]
    batch_rows = 5_000
    sweep: dict = {"batch_rows": batch_rows, "points": []}
    for n in (100_000, 1_000_000, 4_000_000, 40_000_000):
        base = (
            spark.range(n)
            .select(
                (F.col("id") % 500_000).alias("user_id"),
                F.timestamp_seconds(
                    F.lit(1_600_000_000) + F.col("id") * 7200
                ).alias("session_start"),
            )
            .withColumn(
                "session_end",
                F.col("session_start") + F.expr("INTERVAL 10 MINUTES"),
            )
            .withColumn("event_count", F.lit(3).cast("long"))
            .withColumn("avg_value", F.lit(1.5))
            .select(*cols)
        )
        # the emitted delta: touch a deterministic 0.1% slice spread
        # over the whole key range (60/20/20 update/tombstone/insert)
        touched = base.filter(
            F.col("user_id") % (n // (batch_rows * 4 // 5)) == 0
        ).limit(batch_rows * 4 // 5)
        emitted = (
            touched.withColumn(
                "event_count",
                F.when(F.rand(7) < 0.25, F.lit(0)).otherwise(
                    F.col("event_count") + 1
                ),
            )
            .unionByName(
                base.limit(batch_rows // 5)
                .withColumn("user_id", F.col("user_id") + 900_000_000)
            )
            .localCheckpoint(eager=True)
        )
        n_emit = emitted.count()
        point: dict = {"table_rows": n, "emitted": n_emit, "modes": {}}
        for mode in ("merge", "rewrite"):
            table = os.path.join(work, f"seed_{n}_{mode}")
            shutil.rmtree(table, ignore_errors=True)
            os.makedirs(table, exist_ok=True)
            V.commit_version(
                spark, table, base.repartition(16 if n > 4_000_000 else 8)
            )
            before_bytes = dirbytes(table)
            t0 = time.perf_counter()
            if mode == "merge":
                V.merge_into_mor(
                    spark,
                    table,
                    emitted,
                    ["user_id", "session_start"],
                    when_matched=[
                        ("update", {c: f"s.{c}" for c in attrs},
                         "s.event_count > 0"),
                        ("delete", None, "s.event_count = 0"),
                    ],
                    insert_not_matched={c: f"s.{c}" for c in cols},
                    insert_not_matched_cond="s.event_count > 0",
                )
            else:
                cur = V.read_version(spark, table)
                keep = cur.join(
                    emitted.select("user_id", "session_start"),
                    ["user_id", "session_start"],
                    "left_anti",
                )
                V.commit_version(
                    spark,
                    table,
                    keep.unionByName(
                        emitted.filter(F.col("event_count") > 0).select(
                            *cur.columns
                        )
                    ),
                )
            sec = round(time.perf_counter() - t0, 3)
            point["modes"][mode] = {
                "sink_sec": sec,
                # the host-independent term: bytes the sink commit
                # added under the table root (data files + DV sidecar
                # + manifest) — O(emitted) for merge, O(table) for
                # rewrite, regardless of how fast local NVMe hides
                # the difference in wall time
                "bytes_written": dirbytes(table) - before_bytes,
            }
            print(f"seeded N={n} {mode}: {sec}s", flush=True)
            shutil.rmtree(table, ignore_errors=True)
        sweep["points"].append(point)
    return sweep


def recent_touch_sweep(spark, work: str) -> dict:
    """The production-shaped experiment: a session table MAINTAINED BY
    THE STREAM is naturally range-clustered on session_start (each
    micro-batch appends recent sessions), and the emitted batch only
    ever touches sessions within the disorder horizon — the newest
    span. Model that directly: table range-clustered on session_start
    at FIXED file size (250k rows/file, so file count grows with N —
    the real layout), one 5k-row batch touching only the newest ids,
    three sink shapes:

      rewrite      — O(table) WRITE per batch
      merge        — O(table) SCAN per batch (write already O(emitted))
      merge_pruned — prune_on='session_start': stats-index candidate
                     files only = O(touched files + emitted); the
                     r16 stats-pruned MERGE

    Expectation at growing N: rewrite grows (write), merge grows
    (scan), merge_pruned stays FLAT — the complete 100 TB session-sink
    story with every O(table) term eliminated."""
    from pyspark.sql import functions as F

    from data_ingestion_pipeline_spark.operators import versioned as V

    attrs = ["session_end", "event_count", "avg_value"]
    cols = ["user_id", "session_start", *attrs]
    batch_rows = 5_000
    rows_per_file = 250_000
    sweep: dict = {
        "batch_rows": batch_rows,
        "rows_per_file": rows_per_file,
        "points": [],
    }
    for n in (1_000_000, 4_000_000, 40_000_000):
        base = (
            spark.range(n)
            .select(
                (F.col("id") % 500_000).alias("user_id"),
                F.timestamp_seconds(
                    F.lit(1_600_000_000) + F.col("id") * 7
                ).alias("session_start"),
            )
            .withColumn(
                "session_end",
                F.col("session_start") + F.expr("INTERVAL 10 MINUTES"),
            )
            .withColumn("event_count", F.lit(3).cast("long"))
            .withColumn("avg_value", F.lit(1.5))
            .select(*cols)
        )
        # the batch: updates/tombstones over the NEWEST 4k sessions,
        # inserts strictly newer than everything in the table
        touched = spark.range(n - batch_rows * 4 // 5, n).select(
            (F.col("id") % 500_000).alias("user_id"),
            F.timestamp_seconds(
                F.lit(1_600_000_000) + F.col("id") * 7
            ).alias("session_start"),
            F.timestamp_seconds(
                F.lit(1_600_000_000) + F.col("id") * 7 + 600
            ).alias("session_end"),
            F.when(F.rand(7) < 0.25, F.lit(0))
            .otherwise(F.lit(4))
            .cast("long")
            .alias("event_count"),
            F.lit(2.5).alias("avg_value"),
        )
        inserts = spark.range(n, n + batch_rows // 5).select(
            (F.col("id") % 500_000 + 900_000_000).alias("user_id"),
            F.timestamp_seconds(
                F.lit(1_600_000_000) + F.col("id") * 7
            ).alias("session_start"),
            F.timestamp_seconds(
                F.lit(1_600_000_000) + F.col("id") * 7 + 600
            ).alias("session_end"),
            F.lit(1).cast("long").alias("event_count"),
            F.lit(1.0).alias("avg_value"),
        )
        emitted = touched.unionByName(inserts).localCheckpoint(eager=True)
        n_emit = emitted.count()
        point: dict = {
            "table_rows": n,
            "n_files": n // rows_per_file,
            "emitted": n_emit,
            "modes": {},
        }
        for mode in ("merge_pruned", "merge", "rewrite"):
            table = os.path.join(work, f"recent_{mode}")
            shutil.rmtree(table, ignore_errors=True)
            os.makedirs(table, exist_ok=True)
            V.commit_version(
                spark,
                table,
                base.repartitionByRange(
                    max(4, n // rows_per_file), "session_start"
                ),
            )
            if mode == "merge_pruned":
                # write-time stats, Delta-style: the index exists
                # before the first batch; each merge refreshes it
                # incrementally (O(new files) footers)
                V.build_column_stats(spark, table, "session_start")
            before_bytes = dirbytes_top(table)
            t0 = time.perf_counter()
            if mode.startswith("merge"):
                V.merge_into_mor(
                    spark,
                    table,
                    emitted,
                    ["user_id", "session_start"],
                    when_matched=[
                        ("update", {c: f"s.{c}" for c in attrs},
                         "s.event_count > 0"),
                        ("delete", None, "s.event_count = 0"),
                    ],
                    insert_not_matched={c: f"s.{c}" for c in cols},
                    insert_not_matched_cond="s.event_count > 0",
                    prune_on=(
                        "session_start" if mode == "merge_pruned" else None
                    ),
                )
            else:
                cur = V.read_version(spark, table)
                keep = cur.join(
                    emitted.select("user_id", "session_start"),
                    ["user_id", "session_start"],
                    "left_anti",
                )
                V.commit_version(
                    spark,
                    table,
                    keep.unionByName(
                        emitted.filter(F.col("event_count") > 0).select(
                            *cur.columns
                        )
                    ),
                )
            sec = round(time.perf_counter() - t0, 3)
            entry = {
                "sink_sec": sec,
                "bytes_written": dirbytes_top(table) - before_bytes,
            }
            if mode == "merge_pruned":
                mm = V.manifest_meta(table)["merge"]
                entry["files_scanned"] = mm["files_scanned"]
                entry["files_pruned"] = mm["files_pruned"]
            point["modes"][mode] = entry
            print(f"recent N={n} {mode}: {sec}s {entry}", flush=True)
            shutil.rmtree(table, ignore_errors=True)
        sweep["points"].append(point)
    return sweep


def dirbytes_top(p: str) -> int:
    tot = 0
    for root, _, fs in os.walk(p):
        for f in fs:
            tot += os.path.getsize(os.path.join(root, f))
    return tot


def main() -> None:
    from data_ingestion_pipeline_spark.session import get_spark

    spark = get_spark("session-sink-growth", cpus=32)
    work = "/tmp/session_sink_growth"
    out: dict = {
        "sf_dir": SF_DIR,
        "protocol": (
            "bounded session pipeline (watermark+EventTimeTimeout 1h), "
            "ntile-sliced feed: scale*4 equal-row files, "
            "maxFilesPerTrigger=2 (constant per-batch volume), timing "
            "ONLY the sink commit; tail = last half of batches"
        ),
        "scales": {},
    }
    for scale in SCALES:
        feed = os.path.join(work, f"feed_x{scale}")
        total = build_scaled_feed(spark, SF_DIR, feed, scale)
        per_scale: dict = {"feed_rows": total, "modes": {}}
        for mode in ("merge", "rewrite"):
            t0 = time.time()
            timings, final_rows = run_stream(
                spark,
                feed,
                os.path.join(work, f"table_x{scale}_{mode}"),
                os.path.join(work, f"ckpt_x{scale}_{mode}"),
                mode,
            )
            tail = [t["sink_sec"] for t in timings[len(timings) // 2:]]
            per_scale["modes"][mode] = {
                "batches": len(timings),
                "final_table_rows": final_rows,
                "tail_mean_sink_sec": round(sum(tail) / len(tail), 3),
                "tail_max_sink_sec": max(tail),
                "total_sink_sec": round(
                    sum(t["sink_sec"] for t in timings), 2
                ),
                "wall_sec": round(time.time() - t0, 1),
                "per_batch": timings,
            }
            print(
                f"x{scale} {mode}: batches={len(timings)} "
                f"tail_mean={per_scale['modes'][mode]['tail_mean_sink_sec']} "
                f"rows={final_rows}",
                flush=True,
            )
        out["scales"][f"x{scale}"] = per_scale

    out["seeded_sink_sweep"] = seeded_sink_sweep(spark, work)
    out["recent_touch_sweep"] = recent_touch_sweep(spark, work)

    m1 = out["scales"]["x1"]["modes"]
    m10 = out["scales"]["x10"]["modes"]
    out["tail_growth_x1_to_x10"] = {
        "merge": round(
            m10["merge"]["tail_mean_sink_sec"]
            / m1["merge"]["tail_mean_sink_sec"],
            2,
        ),
        "rewrite": round(
            m10["rewrite"]["tail_mean_sink_sec"]
            / m1["rewrite"]["tail_mean_sink_sec"],
            2,
        ),
    }
    with open(os.path.join(REPO, "SESSION_SINK_GROWTH.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out["tail_growth_x1_to_x10"], indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
