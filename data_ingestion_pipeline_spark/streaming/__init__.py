"""Structured Streaming surface (SURVEY.md §2.7 T1-T5)."""

from data_ingestion_pipeline_spark.streaming.pipeline import (  # noqa: F401
    run_dedup_ingest,
    stream_dedup_to_table,
    stream_timeseries_1h,
)
