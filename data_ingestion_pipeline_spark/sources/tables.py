"""Parquet table sources (SURVEY.md §2.1 S7: relational scan).

The reference scans one Postgres table through an index
(`services/query/main.py:200-204`, `migrations/db.sql:18`); the Spark
equivalent is a parquet scan with Catalyst predicate pushdown +
column pruning + (when the table is written time-partitioned, see
operators/upsert.py) partition pruning standing in for TimescaleDB
chunk exclusion.

At 100 TB these loaders are the only scan path, so nothing here may
defeat pushdown: no ``.cache()`` by default, no schema inference on
JSON/CSV, no row-level python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_ingestion_pipeline_spark.schemas import TESTDATA_TABLES

# Columns stored as parquet TIMESTAMP(NANOS): Spark has no nanosecond
# timestamp type, so the session reads them as long (nanosAsLong) and
# the loader truncates to microseconds — byte-identical to how DuckDB
# (micros-native) reads the same files.
_NANO_TS = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table. Lazy; filters/projections push down.

    Timestamp normalization — the ONE place parquet timestamp
    physical-type drift is absorbed. All three flavors the testdata
    has shipped land on TimestampType (session tz pinned UTC, so
    NTZ→TZ is lossless):
    - TIMESTAMP(NANOS)          → read as long (nanosAsLong conf),
                                  truncated to micros here;
    - TIMESTAMP(MICROS) no-tz   → Spark reads TIMESTAMP_NTZ, cast;
    - TIMESTAMP(MICROS) UTC     → already TimestampType, untouched.
    """
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANO_TS.get(name, ()):
        if isinstance(df.schema[col].dataType, T.LongType):
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    for field in df.schema.fields:
        if isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def to_micros(df: DataFrame, col: str):
    """Epoch-microseconds Column for a timestamp column, robust to
    representation drift (the single choke point VERDICT r3 asked
    for — wire/CSV/JSONL all derive ts_us through here)."""
    dt = df.schema[col].dataType
    if isinstance(dt, T.LongType):  # raw parquet nanos
        return F.expr(f"{col} div 1000")
    if isinstance(dt, T.TimestampNTZType):
        return F.unix_micros(F.col(col).cast("timestamp"))
    return F.unix_micros(F.col(col))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
