"""Canonical schemas (SURVEY.md §1).

The reference declares its record schema three times (Pydantic at the
collector `services/collector/main.py:69-75`, Pydantic-with-validators
at the consumer `services/consumer/main.py:134-161`, and DDL
`migrations/db.sql:5-12`). Here there is exactly one declaration per
entity, as a Spark StructType.
"""

from __future__ import annotations

from pyspark.sql import types as T

# The reference's core record (weather reading). `timestamp` is a
# string in flight (ISO-8601) and a timestamp at rest; WEATHER_WIRE is
# the in-flight shape, WEATHER is at-rest.
WEATHER_WIRE = T.StructType(
    [
        T.StructField("station_id", T.StringType(), False),
        T.StructField("temperature", T.DoubleType(), False),
        T.StructField("humidity", T.DoubleType(), False),
        T.StructField("wind_speed", T.DoubleType(), False),
        T.StructField("timestamp", T.StringType(), False),
        T.StructField("trace_id", T.StringType(), True),
    ]
)

WEATHER = T.StructType(
    [
        T.StructField("station_id", T.StringType(), False),
        T.StructField("temperature", T.DoubleType(), False),
        T.StructField("humidity", T.DoubleType(), False),
        T.StructField("wind_speed", T.DoubleType(), False),
        T.StructField("timestamp", T.TimestampType(), False),
    ]
)

# Batch ingestion envelope (`services/collector/main.py:77-79`).
WEATHER_BATCH = T.StructType(
    [
        T.StructField("batch_id", T.StringType(), True),
        T.StructField("records", T.ArrayType(WEATHER_WIRE), False),
    ]
)

# Dead-letter envelope (`services/collector/main.py:136-140`).
DLQ = T.StructType(
    [
        T.StructField("error", T.StringType(), False),
        T.StructField("original_message", T.StringType(), False),
        T.StructField("trace_id", T.StringType(), True),
    ]
)

# Driver testdata: the `events` table is the weather-reading analog
# (entity id + event time + numeric measure, TESTDATA.md).
EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("props", T.StringType(), True),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
