"""Incrementally-maintained time rollup — the continuous-aggregate
analog of the reference's TimescaleDB hypertable (migrations/db.sql:
14-15 chunks the base table; the reference recomputes every
time_bucket query from raw rows, services/query/main.py:324,345).

A 100 TB deployment cannot re-aggregate the full history whenever a
correction batch lands. The pattern built here:

- the ROLLUP TABLE stores re-mergeable partial aggregates (count +
  exact decimal sum — never bare averages, which don't merge),
  day-partitioned by the SAME derived key as the base table, so a
  base partition maps 1:1 onto a rollup partition;
- an upsert's touched-day list (already collected as partition
  metadata by upsert_into_table) doubles as the rollup refresh list:
  re-aggregate ONLY those days — a partition-pruned scan of the base
  — and dynamic-partition-overwrite exactly those rollup partitions.

Refresh cost is proportional to the corrected days, not the table.
tests/test_rollup.py proves untouched rollup partition files are
byte-identical (same names, same mtimes) across a refresh.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_pipeline_spark.functions.exact import dec_sum
from data_ingestion_pipeline_spark.operators.upsert import (
    PARTITION_COL,
    read_table,
    scratch_path,
    upsert_into_table,
    with_partition_col,
    write_time_partitioned,
)
from data_ingestion_pipeline_spark.sources.tables import load_table

# The correction batch's day — at sf0.01 one of 30 day-partitions.
ROLLUP_DAY = "2024-01-07"


def hourly_rollup(df: DataFrame) -> DataFrame:
    """Hourly per-type partial aggregates: count + exact decimal sum
    (order-independent, hence identical whether computed in one full
    build or per-day refreshes), avg derived from the two."""
    agg = df.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour_bucket"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        dec_sum("value").alias("sum_value"),
    )
    return agg.withColumn(
        "avg_value", F.col("sum_value") / F.col("n_events")
    )


def refresh_rollup(
    spark: SparkSession, base_path: str, rollup_path: str, touched_days: list[str]
) -> None:
    """Recompute the rollup for ``touched_days`` only: partition-pruned
    base scan → re-aggregate → dynamic partition overwrite of exactly
    those rollup day-partitions. Hour buckets never span days, so the
    day mapping between base and rollup partitions is exact."""
    if not touched_days:
        return
    base_slice = (
        spark.read.parquet(base_path)
        .filter(F.col(PARTITION_COL).isin(touched_days))
        .drop(PARTITION_COL)
    )
    fresh = with_partition_col(hourly_rollup(base_slice), "hour_bucket")
    sess = fresh.sparkSession
    prev = sess.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    sess.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        fresh.write.mode("overwrite").partitionBy(PARTITION_COL).parquet(rollup_path)
    finally:
        sess.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def rollup_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end continuous-aggregate lifecycle: full build → a
    one-day correction batch upserted into the base → rollup refreshed
    for that day alone → final rollup read back.

    Oracle: the hourly rollup of the corrected event history — the
    incrementally-maintained table must equal the from-scratch
    aggregate exactly (exact decimal sums make this bit-for-bit).
    """
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    base = scratch_path("rollup", sf_name, "base")
    roll = scratch_path("rollup", sf_name, "rollup")
    shutil.rmtree(base, ignore_errors=True)
    shutil.rmtree(roll, ignore_errors=True)

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    write_time_partitioned(ev, base)
    write_time_partitioned(hourly_rollup(read_table(spark, base)), roll, "hour_bucket")

    updates = ev.filter(F.date_format("ts", "yyyy-MM-dd") == ROLLUP_DAY).withColumn(
        "value", F.col("value") + F.lit(1000.0)
    )
    upsert_into_table(spark, base, updates, ["user_id", "ts"])
    touched = [
        r[0]
        for r in with_partition_col(updates)
        .select(PARTITION_COL)
        .distinct()
        .collect()
    ]
    refresh_rollup(spark, base, roll, touched)
    return read_table(spark, roll).select(
        "hour_bucket", "event_type", "n_events", "sum_value", "avg_value"
    )
