"""Kafka boundary (S3/K1): everything testable without a broker.

The environment conclusively cannot run the socket path (no
spark-sql-kafka connector jar in the PySpark distribution, no broker
binary, no Python Kafka client — see README). What remains testable:

- `decode_values` is a pure DataFrame transform over Kafka's wire
  schema (binary `value` column) — its valid/corrupt split semantics
  are asserted on synthetic records, proving the decode chain shares
  the batch wire path's policy for real.
- `kafka_source` is probed: in this environment it must fail with
  DATA_SOURCE_NOT_FOUND (documenting the gap precisely); if the
  environment ever gains the connector, the probe passes through and
  this file is the flag to add a live roundtrip test.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_ingestion_pipeline_spark.streaming.kafka import decode_values, kafka_source


def _kafka_shaped(spark, payloads: list[str]):
    """A batch frame with Kafka's value column shape (binary)."""
    return spark.createDataFrame(
        [(p,) for p in payloads], "value string"
    ).select(F.col("value").cast("binary").alias("value"))


def test_decode_values_splits_valid_and_corrupt(spark):
    valid = '{"event_id": 7, "ts_us": 1704412800000000, "user_id": 3, "event_type": "reading", "value": 21.5}'
    corrupt = '{"event_id": oops'
    rows = decode_values(_kafka_shaped(spark, [valid, corrupt])).collect()
    by_raw = {r.raw: r for r in rows}

    ok = by_raw[valid]
    assert ok._corrupt_record is None
    assert (ok.event_id, ok.user_id, ok.event_type, ok.value) == (7, 3, "reading", 21.5)
    assert ok.ts.isoformat().startswith("2024-01-05")

    bad = by_raw[corrupt]
    assert bad._corrupt_record is not None
    assert bad.event_id is None


def test_kafka_source_probe(spark):
    """Pin the environment claim: the connector is absent, and the
    failure is source resolution — not an error in our option chain
    (a malformed option map would fail differently)."""
    try:
        kafka_source(spark, "localhost:9092")
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        assert "DATA_SOURCE_NOT_FOUND" in msg or "Failed to find" in msg, msg
    else:
        pytest.fail(
            "connector now available — add a live kafka_roundtrip test "
            "(embedded broker) and drop this probe"
        )


KAFKA_BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP")


@pytest.mark.skipif(
    not KAFKA_BOOTSTRAP,
    reason="set KAFKA_BOOTSTRAP=host:port (with spark-sql-kafka on the "
    "classpath) to run the live broker contract test",
)
def test_kafka_live_roundtrip(spark, tmp_path):
    """Live-broker contract (S3/K1): marshal events → kafka_sink →
    broker → kafka_source → decode_values must reproduce every record.
    Skips in broker-less environments (this sandbox); any deployment
    with a reachable broker can validate the exact option chains the
    config builders emit by exporting KAFKA_BOOTSTRAP."""
    import json
    import uuid

    from data_ingestion_pipeline_spark.streaming.kafka import kafka_sink

    topic = f"cc_contract_{uuid.uuid4().hex[:8]}"
    recs = [
        {
            "event_id": i,
            "ts_us": 1704412800000000 + i,
            "user_id": i % 3,
            "event_type": "click",
            "value": float(i),
        }
        for i in range(20)
    ]
    feed = tmp_path / "feed"
    feed.mkdir()
    (feed / "batch.json").write_text("\n".join(json.dumps(r) for r in recs))
    src = (
        spark.readStream.schema(
            "event_id bigint, ts_us bigint, user_id bigint, "
            "event_type string, value double"
        )
        .json(str(feed))
        .select(
            F.to_json(
                F.struct("event_id", "ts_us", "user_id", "event_type", "value")
            ).alias("value")
        )
    )
    wq = (
        kafka_sink(src, KAFKA_BOOTSTRAP, topic, str(tmp_path / "ck_w"))
        .trigger(availableNow=True)
        .start()
    )
    assert wq.awaitTermination(120), "kafka_sink drain timed out"

    sink_name = f"kb_{topic}"
    rq = (
        decode_values(kafka_source(spark, KAFKA_BOOTSTRAP, topic))
        .writeStream.format("memory")
        .queryName(sink_name)
        .option("checkpointLocation", str(tmp_path / "ck_r"))
        .trigger(availableNow=True)
        .start()
    )
    assert rq.awaitTermination(120), "kafka_source drain timed out"
    rows = spark.sql(f"SELECT * FROM {sink_name}").collect()
    assert all(r._corrupt_record is None for r in rows)
    got = {(r.event_id, r.user_id, r.event_type, r.value) for r in rows}
    want = {
        (r["event_id"], r["user_id"], r["event_type"], r["value"])
        for r in recs
    }
    assert got == want
