"""Partitioned-upsert mechanics: the property that matters at 100 TB
is that merging an update batch rewrites ONLY the day-partitions the
batch touches — verified here at the filesystem level.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F

from data_ingestion_pipeline_spark.operators.upsert import (
    read_table,
    scratch_path,
    upsert_into_table,
    write_time_partitioned,
)
from data_ingestion_pipeline_spark.sources.tables import load_table
from data_ingestion_pipeline_spark.streaming.pipeline import FEED_COLS
from tests.conftest import SF_TEST

TOUCHED_DAY = "2024-01-05"
UNTOUCHED_DAY = "2024-01-10"


def _files(table: str, day: str) -> dict[str, tuple[float, int]]:
    return {
        p: (os.path.getmtime(p), os.path.getsize(p))
        for p in glob.glob(f"{table}/p_date={day}/*.parquet")
    }


def test_upsert_rewrites_only_touched_partitions(spark):
    table = scratch_path("t_prune", "table")
    shutil.rmtree(table, ignore_errors=True)

    ev = load_table(spark, SF_TEST, "events").select(*FEED_COLS)
    write_time_partitioned(ev, table)
    n = ev.count()

    before_touched = _files(table, TOUCHED_DAY)
    before_untouched = _files(table, UNTOUCHED_DAY)
    assert before_touched and before_untouched, "both days must exist"

    updates = ev.filter(F.to_date("ts") == TOUCHED_DAY).withColumn(
        "value", F.col("value") + F.lit(7.0)
    )
    n_upd = updates.count()
    assert n_upd > 0
    upsert_into_table(spark, table, updates, ["user_id", "ts"])

    # untouched day: byte-identical files, not even re-written
    assert _files(table, UNTOUCHED_DAY) == before_untouched
    # touched day: rewritten
    assert _files(table, TOUCHED_DAY) != before_touched

    merged = read_table(spark, table)
    assert merged.count() == n
    got_updated = merged.filter(
        (F.to_date("ts") == TOUCHED_DAY)
    ).agg(F.sum("value")).first()[0]
    want_updated = updates.agg(F.sum("value")).first()[0]
    assert abs(got_updated - want_updated) < 1e-6


def test_written_table_prunes_partitions(spark):
    """A date predicate on the day-partitioned table must prune at the
    scan (PartitionFilters), standing in for TimescaleDB chunk
    exclusion — the read-side payoff of the write layout."""
    import contextlib
    import io

    table = scratch_path("t_prune2", "table")
    shutil.rmtree(table, ignore_errors=True)
    ev = load_table(spark, SF_TEST, "events").select(*FEED_COLS)
    write_time_partitioned(ev, table)

    df = spark.read.parquet(table).filter(
        F.col("p_date") == TOUCHED_DAY
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "p_date" in pf, pf
    # and the pruned read returns exactly that day's rows
    assert df.count() == ev.filter(F.to_date("ts") == TOUCHED_DAY).count()


def test_upsert_after_empty_create_heals_layout(spark, tmp_path):
    """An empty first batch creates the plain-layout placeholder (no
    partition dirs); a later non-empty upsert must RE-CREATE the
    table partitioned rather than dynamic-overwriting on top of it —
    mixing root-level files with partition dirs breaks partition
    discovery on read."""
    from data_ingestion_pipeline_spark.operators.upsert import (
        read_table,
        upsert_into_table,
    )
    from data_ingestion_pipeline_spark.sources.tables import load_table
    from tests.conftest import SF_TEST

    path = str(tmp_path / "t")
    ev = load_table(spark, SF_TEST, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    upsert_into_table(spark, path, ev.limit(0), ["user_id", "ts"])  # empty create
    assert read_table(spark, path).count() == 0
    rows = ev.limit(200)
    upsert_into_table(spark, path, rows, ["user_id", "ts"])  # must heal
    got = read_table(spark, path)
    assert got.count() == 200
    assert set(got.columns) == {"event_id", "ts", "user_id", "event_type", "value"}
