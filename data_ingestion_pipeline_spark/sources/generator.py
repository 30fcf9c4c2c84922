"""Synthetic weather-reading generator with seeded duplicate injection.

The reference's generator service emits uniform-random readings —
temp ∈ [-10, 35], humidity ∈ [0, 100], wind ∈ [0, 30], one decimal —
and re-emits ~20% of records verbatim with a fresh trace_id
(services/generator/main.py:71-83, 157-166). S5/S6 + F5/F8/F9 in
SURVEY.md §2.

Spark-native design decisions:

- **Portable seeded randomness.** NOT ``rand(seed)``: Spark seeds
  rand per *partition index*, so results change with partitioning —
  useless for a deterministic oracle or a resumable 100 TB job.
  Instead a Knuth-style multiplicative hash of (row id, stream salt)
  in plain 64-bit integer arithmetic: identical on any engine, any
  partitioning, any cluster size.
- **One-decimal values by construction** (integer mod, then /10), not
  ``round(x, 1)``: floating-point round is implemented differently
  across engines near ties; integer construction has no ties.
- **Deterministic trace ids**: md5 of a per-row tag (F5's uuid() is
  nondeterministic by design — wrong tool for replayable feeds).

``spark.range(n)`` partitions the id space evenly, so generation is
embarrassingly parallel at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_ROWS = 5000
N_STATIONS = 10
DUP_EVERY = 5  # 20% duplicate injection, the reference's default rate
BASE_EPOCH = 1704067200  # 2024-01-01T00:00:00Z
_MULT = 2654435761  # Knuth multiplicative hash constant
_INC = 12345
_MOD = 2147483648  # 2^31


def _u(salt: int) -> F.Column:
    """Uniform-ish 31-bit draw for (id, salt) — pure integer ops."""
    return ((F.col("id") + F.lit(salt)) * F.lit(_MULT) + F.lit(_INC)) % F.lit(_MOD)


def synthetic_readings(spark: SparkSession, n: int = N_ROWS) -> DataFrame:
    """n deterministic weather readings, one per second from BASE_EPOCH."""
    return spark.range(n).select(
        F.concat(F.lit("station_"), (_u(1) % N_STATIONS).cast("string")).alias(
            "station_id"
        ),
        (F.lit(-10.0) + (_u(2) % 451).cast("double") / F.lit(10.0)).alias(
            "temperature"
        ),
        ((_u(3) % 1001).cast("double") / F.lit(10.0)).alias("humidity"),
        ((_u(4) % 301).cast("double") / F.lit(10.0)).alias("wind_speed"),
        F.timestamp_seconds(F.lit(BASE_EPOCH) + F.col("id")).alias("timestamp"),
        F.md5(F.concat(F.lit("trace_"), F.col("id").cast("string"))).alias("trace_id"),
        F.col("id").alias("reading_id"),
    )


def synthetic_feed(
    spark: SparkSession, n: int = N_ROWS, dup_every: int = DUP_EVERY
) -> DataFrame:
    """Readings + injected duplicates: every dup_every-th reading is
    re-emitted verbatim except for a fresh trace_id — exactly the
    generator's duplicate model, so dedup stages downstream can verify
    a known rate (as tests/test_streaming.py does for the stream)."""
    base = synthetic_readings(spark, n)
    dups = base.filter(F.col("reading_id") % dup_every == 0).withColumn(
        "trace_id", F.md5(F.concat(F.lit("dup_"), F.col("reading_id").cast("string")))
    )
    return base.unionByName(dups)


def synthetic_weather(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry wrapper (generator ignores sf_dir — it is a source)."""
    return synthetic_readings(spark)


def synthetic_weather_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry wrapper for the duplicated feed."""
    return synthetic_feed(spark)
