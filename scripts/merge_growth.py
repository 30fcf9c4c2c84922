"""Merge-on-read vs full-rewrite commit cost as the TABLE grows.

The scale claim under test (SCALING.md "MERGE INTO" row): with a
FIXED-size change batch, merge_into_mor's commit cost is
O(live-scan + matched) and writes only O(matched) bytes (DV extension
+ image files), while the whole-snapshot upsert (upsert_version)
re-reads AND re-writes the entire table. Both pay the scan, so both
wall times grow with table size — the separator is the WRITE side:
the upsert/merge wall-time RATIO must grow with table size, and
merge's written-bytes must stay flat while upsert's grow linearly.

Method: deterministic generated events-shaped tables of 10⁴ / 10⁵ /
10⁶ rows, a fixed 1,000-key update batch (value +1.0). Per size and
variant the table is rebuilt untimed, the op alone is timed (best of
2), and written bytes are measured as the table directory's size
delta. Results merge into GROWTH_CURVE.json under "merge_commit".

Usage: python scripts/merge_growth.py   (~3-5 min, local[32])
"""

from __future__ import annotations

import json
import os
import pathlib
import shutil
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from data_ingestion_pipeline_spark.operators import versioned as V  # noqa: E402
from data_ingestion_pipeline_spark.session import get_spark  # noqa: E402

SIZES = [10_000, 100_000, 1_000_000]
BATCH_KEYS = 1_000
SCRATCH = "/root/repo/.scratch/merge_growth"


def _gen(spark, n):
    return (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            F.timestamp_seconds(
                F.lit(1704067200) + (F.col("id") % 86_400)
            ).alias("ts"),
            (F.col("id") % 1000).alias("user_id"),
            F.element_at(
                F.array(*[F.lit(x) for x in ("click", "view", "purchase")]),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("event_type"),
            (F.col("id") % 97).cast("double").alias("value"),
        )
    )


def _dir_bytes(path):
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def _run(spark, n, variant):
    best = None
    written = None
    for _ in range(2):
        path = os.path.join(SCRATCH, f"{variant}_{n}")
        shutil.rmtree(path, ignore_errors=True)
        os.makedirs(path)
        V.commit_version(spark, path, _gen(spark, n).repartition(16))
        batch = _gen(spark, BATCH_KEYS).withColumn(
            "value", F.col("value") + 1.0
        )
        before = _dir_bytes(path)
        t0 = time.perf_counter()
        if variant == "merge":
            V.merge_into_mor(
                spark,
                path,
                batch,
                ["event_id"],
                when_matched=[("update", {"value": "s.value"}, None)],
            )
        else:
            V.upsert_version(spark, path, batch, ["event_id"])
        dt = time.perf_counter() - t0
        wrote = _dir_bytes(path) - before
        best = dt if best is None else min(best, dt)
        written = wrote if written is None else min(written, wrote)
    return round(best, 3), written


ROWS_PER_DAY = 10_000


def _gen_days(spark, n):
    """events-shaped rows at a FIXED per-day density (ROWS_PER_DAY):
    growing n grows the DAY COUNT, which is the axis the CDC-loop
    flatness claim is about — a one-day change batch must cost one
    day regardless of how much history the replica holds."""
    return (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            F.timestamp_seconds(
                F.lit(1704067200)
                + (F.col("id") / ROWS_PER_DAY).cast("long") * 86_400
                + (F.col("id") % ROWS_PER_DAY) * 8 % 86_400
            ).alias("ts"),
            (F.col("id") % 1000).alias("user_id"),
            F.element_at(
                F.array(*[F.lit(x) for x in ("click", "view", "purchase")]),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("event_type"),
            (F.col("id") % 97).cast("double").alias("value"),
        )
    )


def _run_cdc_loop(spark, n):
    """One consume→apply→verify round against an n-row day-partitioned
    source/replica pair: a 1,000-key single-day change batch lands on
    the source via COW MERGE, the consumer diffs source versions
    (metadata-pruned to the one changed day), applies the batch to the
    replica (apply_changes → merge_into_cow, rewrite ∝ touched days),
    and the checksums must agree (untimed — the verify is O(n) by
    design, one scan per side; the FLATNESS claim is about consume +
    apply). Returns (consume_sec, apply_sec, replica_written_bytes)."""
    root = os.path.join(SCRATCH, f"cdc_{n}")
    shutil.rmtree(root, ignore_errors=True)
    src = os.path.join(root, "src")
    rep = os.path.join(root, "rep")
    cursor = os.path.join(root, "cursor.json")
    os.makedirs(src)
    os.makedirs(rep)
    df = _gen_days(spark, n)
    V.commit_version_partitioned(spark, src, df)
    V.commit_version_partitioned(spark, rep, df)
    V.init_changes_cursor(cursor, V.current_version(src))

    # the change batch: 1,000 keys, all inside day 0
    batch = _gen_days(spark, BATCH_KEYS).withColumn(
        "value", F.col("value") + 1.0
    )
    V.merge_into_cow(
        spark, src, batch, ["event_id"],
        when_matched=[("update", {"value": "s.value"}, None)],
    )

    t0 = time.perf_counter()
    changes, v = V.consume_changes(spark, src, cursor, ["event_id"])
    changes = changes.localCheckpoint(eager=True)
    consume_sec = time.perf_counter() - t0

    before = _dir_bytes(rep)
    t0 = time.perf_counter()
    V.apply_changes(spark, rep, changes, ["event_id"])
    apply_sec = time.perf_counter() - t0
    wrote = _dir_bytes(rep) - before
    V.ack_changes(cursor, v)

    assert V.verify_replica(spark, src, rep), f"replica diverged at n={n}"
    shutil.rmtree(root, ignore_errors=True)
    return round(consume_sec, 3), round(apply_sec, 3), wrote


def main() -> None:
    spark = get_spark(
        "merge-growth", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    _run(spark, 1000, "merge")  # session warmup, untimed
    out = {"sizes": SIZES, "batch_keys": BATCH_KEYS}
    for variant in ("merge", "upsert"):
        secs, bts = [], []
        for n in SIZES:
            dt, wrote = _run(spark, n, variant)
            secs.append(dt)
            bts.append(wrote)
            print(f"{variant} n={n}: {dt}s, wrote {wrote/1e6:.1f} MB", flush=True)
        out[f"{variant}_sec"] = secs
        out[f"{variant}_bytes"] = bts
    out["ratio_sec"] = [
        round(u / m, 2) for u, m in zip(out["upsert_sec"], out["merge_sec"])
    ]
    out["ratio_bytes"] = [
        round(u / max(m, 1), 1)
        for u, m in zip(out["upsert_bytes"], out["merge_bytes"])
    ]
    # the claim: merge's written bytes are flat in table size (the
    # final point may not exceed the first by more than small-file
    # constants), while upsert's written bytes grow ~linearly
    flat = out["merge_bytes"][-1] < out["merge_bytes"][0] * 3
    linear = out["upsert_bytes"][-1] > out["upsert_bytes"][0] * 10
    out["verdict"] = "pass" if (flat and linear) else "FAIL"

    # CDC loop: consume→apply→verify with a FIXED one-day change
    # batch as the replica's history grows 100×. Flatness gate: the
    # largest replica's consume+apply may not exceed the smallest's
    # by more than 3× (fixed job overheads dominate the small point),
    # and written bytes stay within small-file constants.
    _run_cdc_loop(spark, 1000)  # warmup, untimed
    cdc = {"sizes": SIZES, "batch_keys": BATCH_KEYS,
           "rows_per_day": ROWS_PER_DAY,
           "consume_sec": [], "apply_sec": [], "replica_bytes": []}
    for n in SIZES:
        c, a, w = _run_cdc_loop(spark, n)
        cdc["consume_sec"].append(c)
        cdc["apply_sec"].append(a)
        cdc["replica_bytes"].append(w)
        print(f"cdc_loop n={n}: consume {c}s apply {a}s "
              f"wrote {w/1e6:.1f} MB", flush=True)
    loop = [c + a for c, a in zip(cdc["consume_sec"], cdc["apply_sec"])]
    cdc["loop_sec"] = [round(x, 3) for x in loop]
    cdc_flat = (
        loop[-1] < loop[0] * 3
        and cdc["replica_bytes"][-1] < cdc["replica_bytes"][0] * 3
    )
    cdc["verdict"] = "pass" if cdc_flat else "FAIL"

    gc_path = pathlib.Path(__file__).resolve().parents[1] / "GROWTH_CURVE.json"
    gc = json.loads(gc_path.read_text()) if gc_path.exists() else {}
    gc["merge_commit"] = out
    gc["cdc_loop"] = cdc
    gc_path.write_text(json.dumps(gc, indent=1))
    print(json.dumps(out))
    print(json.dumps(cdc))
    shutil.rmtree(SCRATCH, ignore_errors=True)
    if out["verdict"] != "pass" or cdc["verdict"] != "pass":
        sys.exit(1)


if __name__ == "__main__":
    main()
