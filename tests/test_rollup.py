"""Incremental rollup maintenance: correctness vs full recompute, and
physical evidence that a refresh rewrites ONLY the touched day."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_ingestion_pipeline_spark.operators import rollup as R
from data_ingestion_pipeline_spark.operators.upsert import (
    PARTITION_COL,
    read_table,
    upsert_into_table,
    with_partition_col,
    write_time_partitioned,
)
from data_ingestion_pipeline_spark.sources.tables import load_table
from tests.conftest import SF_TEST


def _listing(table: str, day: str) -> dict[str, float]:
    d = os.path.join(table, f"p_date={day}")
    return {f: os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d)}


def test_incremental_refresh_touches_only_its_day(spark, tmp_path):
    base = str(tmp_path / "base")
    roll = str(tmp_path / "roll")
    ev = load_table(spark, SF_TEST, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    write_time_partitioned(ev, base)
    write_time_partitioned(R.hourly_rollup(read_table(spark, base)), roll, "hour_bucket")

    updates = ev.filter(
        F.date_format("ts", "yyyy-MM-dd") == R.ROLLUP_DAY
    ).withColumn("value", F.col("value") + F.lit(1000.0))
    assert updates.count() > 0
    upsert_into_table(spark, base, updates, ["user_id", "ts"])

    untouched_day = "2024-01-10"
    before_untouched = _listing(roll, untouched_day)
    before_touched = _listing(roll, R.ROLLUP_DAY)

    touched = [
        r[0]
        for r in with_partition_col(updates).select("p_date").distinct().collect()
    ]
    assert touched == [R.ROLLUP_DAY]
    R.refresh_rollup(spark, base, roll, touched)

    # untouched rollup partition: identical files, identical mtimes
    assert _listing(roll, untouched_day) == before_untouched
    # touched partition: rewritten
    assert _listing(roll, R.ROLLUP_DAY) != before_touched

    # incrementally-maintained rollup == full recompute, bit-for-bit
    maintained = {
        tuple(r) for r in read_table(spark, roll).collect()
    }
    full = {tuple(r) for r in R.hourly_rollup(read_table(spark, base)).collect()}
    assert maintained == full


def test_realtime_rollup_prunes_both_sides(spark, tmp_path):
    """Real-time continuous aggregate: result == from-scratch
    aggregate, the materialized side reads the ROLLUP (pruned to
    ≤ watermark), and the raw side scans ONLY tail day-partitions."""
    base = str(tmp_path / "base")
    roll = str(tmp_path / "roll")
    ev = load_table(spark, SF_TEST, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    write_time_partitioned(ev, base)
    wm = "2024-01-03"
    mat_slice = (
        with_partition_col(read_table(spark, base))
        .filter(F.col(PARTITION_COL) <= wm)
        .drop(PARTITION_COL)
    )
    write_time_partitioned(R.hourly_rollup(mat_slice), roll, "hour_bucket")

    view = R.realtime_rollup(spark, base, roll, wm)
    got = {tuple(r) for r in view.select(
        "hour_bucket", "event_type", "n_events", "sum_value").collect()}
    want = {tuple(r) for r in R.hourly_rollup(read_table(spark, base)).select(
        "hour_bucket", "event_type", "n_events", "sum_value").collect()}
    assert got == want

    # partition pruning, both sides — asserted on the files the
    # executed scan ACTUALLY read (input_file_name survives pruning;
    # DataFrame.inputFiles() ignores filter pushdown): the BASE scan
    # reads only post-watermark days, the ROLLUP scan only
    # materialized (≤ watermark) days
    def scanned_days(path, cmp):
        scan = spark.read.parquet(path).filter(cmp)
        return {
            r.f.split(f"{PARTITION_COL}=")[1].split("/")[0]
            for r in scan.select(F.input_file_name().alias("f")).collect()
        }

    base_days = scanned_days(base, F.col(PARTITION_COL) > wm)
    roll_days = scanned_days(roll, F.col(PARTITION_COL) <= wm)
    assert base_days and all(d > wm for d in base_days)
    assert roll_days and all(d <= wm for d in roll_days)
