"""Loader contract: every parquet timestamp flavor lands on TimestampType.

Round 3 regression root cause: the driver's testdata switched events.ts
from TIMESTAMP(NANOS) to TIMESTAMP(MICROS) without timezone, Spark read
it as TIMESTAMP_NTZ, and every unix_micros(ts) call failed analysis.
load_table is the single normalization point; this test pins all three
flavors the testdata has shipped so the next physical-type drift fails
loudly here instead of in 5 registry entries.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from data_ingestion_pipeline_spark.sources.tables import load_table, to_micros

# One event row; micros-precision instant (nanos truncate to this).
_INSTANT_US = 1704499200123456  # 2024-01-06 00:00:00.123456 UTC
_ROW = {
    "event_id": [1],
    "user_id": [7],
    "event_type": ["click"],
    "value": [1.5],
    "props": ["{}"],
}


def _write_events(tmpdir, ts_arrow_type, ts_values) -> str:
    table = pa.table({**_ROW, "ts": pa.array(ts_values, type=ts_arrow_type)})
    sf_dir = str(tmpdir)
    pq.write_table(table, f"{sf_dir}/events.parquet")
    return sf_dir


@pytest.mark.parametrize(
    "arrow_type,values",
    [
        (pa.timestamp("ns"), [_INSTANT_US * 1000]),  # round-1/2 testdata format
        (pa.timestamp("us"), [_INSTANT_US]),  # round-3 format (no tz → NTZ)
        (pa.timestamp("us", tz="UTC"), [_INSTANT_US]),  # tz-aware variant
    ],
    ids=["nanos", "micros_ntz", "micros_utc"],
)
def test_load_table_normalizes_timestamp_flavor(spark, tmp_path, arrow_type, values):
    sf_dir = _write_events(tmp_path, arrow_type, values)
    df = load_table(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    row = df.select("ts", to_micros(df, "ts").alias("us")).collect()[0]
    assert row["us"] == _INSTANT_US
    assert row["ts"] == dt.datetime(2024, 1, 6, 0, 0, 0, 123456)


def test_to_micros_handles_raw_long_nanos(spark):
    # to_micros must also work on a frame that bypassed the loader
    # (raw nanosAsLong read), truncating exactly like DuckDB.
    df = spark.createDataFrame(
        [(_INSTANT_US * 1000 + 999,)], "ts long"
    )  # sub-micro nanos truncate
    assert df.select(to_micros(df, "ts").alias("us")).collect()[0]["us"] == _INSTANT_US


def test_schema_evolution_read(spark, tmp_path):
    """Corpus schema drift: files written before a column existed and
    files written after must read as ONE table under an explicit
    unified schema (old rows → NULL for the new column). Explicit
    schema, not mergeSchema=true: schema inference over 100 TB of
    footers is a full metadata scan, and the unified schema is the
    contract a production pipeline pins anyway."""
    from pyspark.sql import Row

    path = str(tmp_path / "evolving")
    v1 = spark.createDataFrame(
        [Row(doc_id=1, text="a"), Row(doc_id=2, text="b")]
    )
    v1.write.mode("append").parquet(path)
    v2 = spark.createDataFrame(
        [Row(doc_id=3, text="c", quality=0.9)]
    )
    v2.write.mode("append").parquet(path)

    unified = "doc_id bigint, text string, quality double"
    got = {
        (r.doc_id, r.text, r.quality)
        for r in spark.read.schema(unified).parquet(path).collect()
    }
    assert got == {(1, "a", None), (2, "b", None), (3, "c", 0.9)}
