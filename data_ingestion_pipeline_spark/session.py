"""SparkSession factory tuned for both local testing and cluster scale.

The reference delegates all execution to Postgres/TimescaleDB
(SURVEY.md §4); here the equivalent knobs are Spark confs. Settings
chosen for 100 TB posture:

- AQE on (runtime coalescing, skew-join splitting) — replaces the
  hand-tuning a static planner would need at scale.
- shuffle.partitions sized to local cores for tests; on a real
  cluster AQE's coalescePartitions makes the initial number mostly
  a ceiling, so a high static value + AQE is the scalable config.
- maxPartitionBytes 128m: standard scan granularity so a 100 TB scan
  yields ~800k well-sized tasks rather than a few huge ones.
- session timezone pinned UTC: timestamp semantics must not depend
  on cluster locale (also required for DuckDB-oracle comparison).
- Arrow enabled: all pandas interchange (Pandas UDFs, toPandas) is
  vectorized.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "data_ingestion_pipeline_spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cpus`` controls local parallelism; defaults to $SPARK_GRAFT_CPUS
    or all cores. On a real cluster the master/resource confs come
    from spark-submit and everything here still applies.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # testdata stores TIMESTAMP(NANOS) which Spark has no native
        # type for; read as long and convert in the loader (the
        # loader truncates to micros — exactly what DuckDB does).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Spark's default parquet timestamp encoding is the deprecated
        # INT96, which carries NO footer statistics — every
        # min/max-based optimization (the _STATS_ skipping index,
        # stats-pruned MERGE, zorder range skipping) silently saw
        # has_stats=False on timestamp columns and kept every file as
        # a candidate. INT64 micros is smaller, vectorizes, matches
        # Spark's own timestamp precision exactly, and every modern
        # reader (DuckDB, pyarrow, Trino) prefers it.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def apply_session_conf(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable confs to an externally-created session.

    The driver hands us its own SparkSession; timezone and AQE are
    runtime-settable and required for deterministic results, so set
    them defensively.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # runtime-settable; see get_spark — INT96 timestamps carry no
    # footer stats, which disables min/max skipping on ts columns
    spark.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    return spark
