"""Wire-format ingestion: raw JSON strings → typed rows + corrupt-DLQ.

The reference ingests raw JSON over HTTP/Kafka and routes anything
that fails structural validation to a dead-letter topic
(services/collector/main.py:114-149, services/consumer/main.py:
312-324). The Spark-native equivalent: a DataFrame of raw JSON
strings parsed with ``from_json`` in PERMISSIVE mode, where a
``_corrupt_record`` column captures unparseable payloads — one pass
splits the feed into typed rows and a DLQ side-output (S1/S4/P1/K3,
F10 in SURVEY.md §2).

Wire format (ours to define — the reference's is Pydantic JSON):
``{"event_id":N,"ts_us":N,"user_id":N,"event_type":"s","value":X.XX}``
with the timestamp as epoch MICROSECONDS — deliberately not an ISO
string, because JSON timestamp formats truncate to milliseconds and
the round-trip must be lossless. The feed is built with
format_string (not to_json) so the oracle can construct
byte-identical messages with printf.

Corruption model: every 97th event's payload is prefixed with
``CORRUPT<`` — unparseable JSON, standing in for the reference's
ValidationError path. Deterministic, so the valid/DLQ split is
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_ingestion_pipeline_spark.sources.tables import load_table, to_micros

CORRUPT_EVERY = 97
CORRUPT_PREFIX = "CORRUPT<"

# In-flight schema (S4). _corrupt_record is PERMISSIVE mode's capture
# column for rows that fail to parse.
EVENT_WIRE = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts_us", T.LongType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("_corrupt_record", T.StringType(), True),
    ]
)

_WIRE_FMT = (
    '{"event_id":%d,"ts_us":%d,"user_id":%d,"event_type":"%s","value":%.2f}'
)


def wire_feed(ev: DataFrame) -> DataFrame:
    """Events rendered as raw JSON wire messages, with deterministic
    corruption injected (every CORRUPT_EVERY-th event)."""
    enc = F.format_string(
        _WIRE_FMT,
        F.col("event_id"),
        to_micros(ev, "ts"),
        F.col("user_id"),
        F.col("event_type"),
        F.col("value"),
    )
    raw = F.when(
        F.col("event_id") % CORRUPT_EVERY == 0, F.concat(F.lit(CORRUPT_PREFIX), enc)
    ).otherwise(enc)
    return ev.select(raw.alias("raw"))


def _parsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    feed = wire_feed(load_table(spark, sf_dir, "events"))
    return feed.withColumn(
        "p",
        F.from_json(
            "raw",
            EVENT_WIRE,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ),
    )


def wire_parse_valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed rows from the raw JSON feed (S4 + P1 pass-route).

    ts is reconstructed losslessly from epoch micros. At scale this is
    the Kafka-value decode path: one pass, JVM-side Jackson parse, no
    Python.
    """
    parsed = _parsed(spark, sf_dir)
    return parsed.filter(F.col("p._corrupt_record").isNull()).select(
        F.col("p.event_id").alias("event_id"),
        F.timestamp_micros(F.col("p.ts_us")).alias("ts"),
        F.col("p.user_id").alias("user_id"),
        F.col("p.event_type").alias("event_type"),
        F.col("p.value").alias("value"),
    )


def wire_parse_dlq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DLQ side-output for unparseable payloads (P1 fail-route → K3).

    {error, original_message} mirrors the reference's DLQ envelope
    (services/collector/main.py:136-145); original_message is the raw
    wire bytes, untouched, so the message can be replayed after a
    parser fix.
    """
    parsed = _parsed(spark, sf_dir)
    return parsed.filter(F.col("p._corrupt_record").isNotNull()).select(
        F.lit("malformed json").alias("error"),
        F.col("raw").alias("original_message"),
    )
