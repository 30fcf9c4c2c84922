"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API):
the synthetic weather generator as a REGISTERED SOURCE.

`sources/generator.py` expresses the generator as a DataFrame over
`spark.range` — the right shape for SQL-expressible generation. This
module expresses the SAME generator through Spark's data-source
extension point instead, the idiomatic integration for sources that
are NOT SQL-expressible (an HTTP poller, a proprietary wire format, a
device feed — the reference's generator service
`services/generator/main.py` is exactly such a standalone producer):

- `partitions()` splits the id space → Spark schedules one task per
  slice; generation is embarrassingly parallel at any cluster size.
- `read(partition)` yields one Arrow RecordBatch per id-slice,
  produced by vectorized numpy math (the API's fast path; the
  per-row-tuple shape measured 6.7 s for the same rows). No driver
  materialization, no collect.
- Rows are a pure function of (row id) using the SAME portable
  integer-hash draws as generator.py — so the registered source is
  oracle-checkable against the identical DuckDB SQL, and a resumed /
  retried task regenerates identical rows (deterministic restart, the
  property a replayable 100 TB backfill needs).
"""

from __future__ import annotations

import hashlib
import math
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from data_ingestion_pipeline_spark.sources.generator import (
    _INC,
    _MOD,
    _MULT,
    N_ROWS,
    N_STATIONS,
)

_BASE = datetime(2024, 1, 1)  # naive; session timezone is pinned UTC

SCHEMA = (
    "station_id string, temperature double, humidity double, "
    "wind_speed double, timestamp timestamp, trace_id string, "
    "reading_id long"
)


class _IdSlice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class WeatherSyntheticReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", N_ROWS))
        self.num_partitions = int(options.get("numPartitions", 8))

    def partitions(self):
        step = max(1, math.ceil(self.n / self.num_partitions))
        return [
            _IdSlice(lo, min(lo + step, self.n)) for lo in range(0, self.n, step)
        ]

    def read(self, partition: _IdSlice):
        """Yield ARROW RECORD BATCHES, not per-row tuples.

        The Python DataSource API accepts either; the tuple path costs
        a Python-object row per record (r8 measured it regressing to
        6.7 s — generation-bound, not I/O-bound). Here the whole slice
        is produced as numpy vector math (hash draws, field decode,
        timestamps) plus one C-speed md5 loop for trace ids, then
        handed to Spark as a single zero-copy Arrow batch per slice.
        Row values are bit-identical to the tuple path (same integer
        draws), so the DuckDB oracle and deterministic-restart
        contracts are unchanged.
        """
        import numpy as np
        import pyarrow as pa

        ids = np.arange(partition.start, partition.end, dtype=np.int64)
        if len(ids) == 0:
            return iter(())

        def u(salt: int) -> np.ndarray:
            # (i+salt)*_MULT ≤ n·2.7e9 ≪ 2^63 — no int64 wraparound
            return ((ids + salt) * _MULT + _INC) % _MOD

        station = np.char.add("station_", (u(1) % N_STATIONS).astype(str))
        temperature = -10.0 + (u(2) % 451) / 10.0
        humidity = (u(3) % 1001) / 10.0
        wind_speed = (u(4) % 301) / 10.0
        ts = np.datetime64(_BASE, "us") + ids * np.timedelta64(1_000_000, "us")
        trace = [
            hashlib.md5(f"trace_{int(i)}".encode()).hexdigest() for i in ids
        ]
        batch = pa.RecordBatch.from_arrays(
            [
                pa.array(station),
                pa.array(temperature),
                pa.array(humidity),
                pa.array(wind_speed),
                pa.array(ts, type=pa.timestamp("us")),
                pa.array(trace, type=pa.string()),
                pa.array(ids),
            ],
            names=[
                "station_id",
                "temperature",
                "humidity",
                "wind_speed",
                "timestamp",
                "trace_id",
                "reading_id",
            ],
        )
        return iter([batch])


class WeatherSyntheticDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "weather_synthetic"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return WeatherSyntheticReader(self.options)


def register(spark: SparkSession) -> None:
    """Idempotent registration (latest registration wins in Spark)."""
    spark.dataSource.register(WeatherSyntheticDataSource)


def synthetic_weather_pysource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: the generator through the registered Python
    data source — must hash-match the same oracle as the DataFrame
    twin `synthetic_weather` (identical row math, different
    integration point)."""
    register(spark)
    return spark.read.format("weather_synthetic").option("n", str(N_ROWS)).load()
