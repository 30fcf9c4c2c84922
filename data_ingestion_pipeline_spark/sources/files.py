"""File-format sources beyond parquet (reader surface).

The reference ingests only via HTTP/Kafka (SURVEY.md §2.9 — no file
readers); a Spark engine gets CSV/JSON/parquet readers natively, and
a 100 TB pipeline inevitably ingests file drops. The round-trip here
exercises the CSV path with the same design rules as the wire format
(operators/wire.py): explicit schema (never inferSchema — a schema
scan of 100 TB is a second full read), timestamps as epoch micros
(CSV timestamp formats are lossy), doubles round-tripping via
shortest-repr text.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_pipeline_spark.operators.upsert import scratch_path
from data_ingestion_pipeline_spark.sources.tables import load_table, to_micros

CSV_SCHEMA = "event_id long, ts_us long, user_id long, event_type string, value double"
JSONL_SCHEMA = (
    "event_id long, ts_us long, user_id long, event_type string, "
    "value double, props string"
)


def csv_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write events as headered CSV, read back with an explicit
    schema, reconstruct the timestamp losslessly. Oracle = the
    original table: the round trip must be the identity."""
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    path = scratch_path("csv_src", sf_name, "t")

    src = load_table(spark, sf_dir, "events")
    ev = src.select(
        "event_id",
        to_micros(src, "ts").alias("ts_us"),
        "user_id",
        "event_type",
        "value",
    )
    ev.write.mode("overwrite").option("header", True).csv(path)
    back = spark.read.schema(CSV_SCHEMA).option("header", True).csv(path)
    return back.select(
        "event_id",
        F.timestamp_micros(F.col("ts_us")).alias("ts"),
        "user_id",
        "event_type",
        "value",
    )


def orc_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write events as ORC (the other columnar standard a lakehouse
    ingests; Spark reads/writes it natively with predicate pushdown),
    read back, reconstruct the timestamp losslessly. Same design
    rules: explicit schema on read, epoch-micros timestamps (ORC
    timestamp encoding is writer-timezone-sensitive; a 100 TB
    pipeline cannot depend on writer TZ), identity oracle."""
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    path = scratch_path("orc_src", sf_name, "t")

    src = load_table(spark, sf_dir, "events")
    ev = src.select(
        "event_id",
        to_micros(src, "ts").alias("ts_us"),
        "user_id",
        "event_type",
        "value",
    )
    ev.write.mode("overwrite").orc(path)
    back = spark.read.schema(CSV_SCHEMA).orc(path)
    return back.select(
        "event_id",
        F.timestamp_micros(F.col("ts_us")).alias("ts"),
        "user_id",
        "event_type",
        "value",
    )


def jsonl_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write events as JSON-lines (the dominant drop format for LLM
    training corpora), read back with an explicit schema, reconstruct
    the timestamp losslessly. Same rules as CSV: no inferSchema,
    epoch-micros timestamps, doubles via Jackson's shortest
    round-trip repr. The nested `props` JSON survives as an opaque
    string column (it is itself JSON — double-encoded on the wire,
    decoded back to the original text on read). Oracle = identity.
    """
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    path = scratch_path("jsonl_src", sf_name, "t")

    src = load_table(spark, sf_dir, "events")
    ev = src.select(
        "event_id",
        to_micros(src, "ts").alias("ts_us"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    ev.write.mode("overwrite").json(path)
    back = spark.read.schema(JSONL_SCHEMA).json(path)
    return back.select(
        "event_id",
        F.timestamp_micros(F.col("ts_us")).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
