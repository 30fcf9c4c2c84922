"""Small-file compaction: row identity + file-count reduction."""

from __future__ import annotations

from data_ingestion_pipeline_spark.operators.maintenance import (
    compact_roundtrip,
    data_file_count,
)
from data_ingestion_pipeline_spark.operators.upsert import scratch_path
from tests.conftest import SF_TEST


def test_compaction_shrinks_files_preserves_rows(spark):
    out_df = compact_roundtrip(spark, SF_TEST)
    sf_name = SF_TEST.rstrip("/").rsplit("/", 1)[1]
    frag = scratch_path("compact", sf_name, "frag")
    out = scratch_path("compact", sf_name, "out")

    n_frag = data_file_count(frag)
    n_out = data_file_count(out)
    assert n_frag == 64
    # tiny test table → bytes/128MiB rounds up to a single file
    assert n_out < n_frag and n_out >= 1, (n_frag, n_out)

    from data_ingestion_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, SF_TEST, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    assert sorted(map(tuple, out_df.collect())) == sorted(map(tuple, ev.collect()))
