"""Kafka source/sink builders (SURVEY.md §2.1 S3, §2.2 K1).

The reference consumes topic ``weather_data`` with a consumer group
from the earliest offset and auto-commits every second
(services/consumer/main.py:284-299), and produces valid records /
DLQ envelopes to ``weather_data``/``weather_data_dlq``
(services/collector/main.py:129-146). The Spark equivalents below
are thin, deliberate configuration: the value-decode chain reuses
the same PERMISSIVE ``from_json`` split as the batch wire path
(operators/wire.py), so batch and streaming ingestion share one
schema and one corrupt-record policy.

NOT EXERCISED IN TESTS: this environment has no Kafka broker (and no
spark-sql-kafka package loaded). The functions build the exact
readStream/writeStream chains a deployment uses; the downstream
logic they feed (watermarked dedup → foreachBatch upsert) is the
broker-independent part and IS tested via the file-stream replay in
streaming/pipeline.py — swapping `file_stream_source` for
`kafka_source` is the only deployment delta.

Delivery semantics: checkpointed offsets + the idempotent
partition-overwrite upsert give effectively-exactly-once into the
table — strictly stronger than the reference's at-least-once +
PK-upsert (README.md:94-97).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_pipeline_spark.operators.wire import EVENT_WIRE

DEFAULT_TOPIC = "events"
DEFAULT_DLQ_TOPIC = "events_dlq"


def kafka_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = DEFAULT_TOPIC,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = 100_000,
) -> DataFrame:
    """Streaming source: raw Kafka records.

    maxOffsetsPerTrigger bounds micro-batch size (the analog of the
    consumer's BATCH_SIZE flush threshold, T2); offset commits are
    checkpoint-managed — no auto-commit races.
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    return reader.load()


def decode_values(kafka_df: DataFrame) -> DataFrame:
    """Kafka value bytes → typed rows + _corrupt_record, identical
    policy to the batch wire path (S4/P1)."""
    return kafka_df.select(
        F.from_json(
            F.col("value").cast("string"),
            EVENT_WIRE,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("p"),
        F.col("value").cast("string").alias("raw"),
    ).select(
        F.col("p.event_id").alias("event_id"),
        F.timestamp_micros(F.col("p.ts_us")).alias("ts"),
        F.col("p.user_id").alias("user_id"),
        F.col("p.event_type").alias("event_type"),
        F.col("p.value").alias("value"),
        F.col("p._corrupt_record").alias("_corrupt_record"),
        "raw",
    )


def kafka_sink(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
    key_col: str | None = None,
):
    """Streaming sink: serialize rows back to a topic (K1/K2).

    The caller provides a single string `value` column (use
    operators/wire.wire_feed-style marshal or to_json); key_col, when
    given, drives Kafka partition routing (e.g. user_id for
    per-station ordering, matching the reference's implicit
    single-partition ordering).
    """
    out = df
    if key_col is not None:
        out = out.withColumn("key", F.col(key_col).cast("string"))
    return (
        out.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
    )
