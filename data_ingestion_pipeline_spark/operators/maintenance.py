"""Table-maintenance operators: small-file compaction.

A streaming/micro-batch ingest (streaming/pipeline.py) or an
over-parallel write leaves tables fragmented into thousands of
kilobyte files; at 100 TB the resulting file-listing and task-setup
overhead dominates scan cost (one task per file floor). Compaction is
the standing maintenance pass every lakehouse runs: rewrite a table
into size-targeted files without changing its rows.

Spark-first construction: size the output partition count from the
table's physical bytes and `repartition()` (round-robin — uniform
output files) before a rewrite. On a real cluster the byte count
comes from the FileSystem API / catalog statistics; the computation
is a listing, never a data read.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession

from data_ingestion_pipeline_spark.operators.upsert import scratch_path
from data_ingestion_pipeline_spark.sources.tables import load_table

TARGET_FILE_BYTES = 128 * 1024 * 1024  # lakehouse-standard 128 MiB target


def table_bytes(path: str) -> int:
    """Physical size of a parquet table directory (data files only).
    Local-FS walk here; the HDFS/S3 equivalent is one
    `FileSystem.getContentSummary` call — metadata, not data."""
    total = 0
    for root, _dirs, names in os.walk(path):
        for name in names:
            if not name.startswith((".", "_")):
                total += os.path.getsize(os.path.join(root, name))
    return total


def compact_table(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_bytes: int = TARGET_FILE_BYTES,
) -> DataFrame:
    """Rewrite a fragmented table into ceil(bytes/target) files.

    `repartition(n)` (not `coalesce`): coalesce merges whole input
    partitions and inherits their skew — a 10,000-small-files table
    coalesced to 8 yields 8 tasks each reading ~1,250 files serially;
    repartition's round-robin shuffle costs one pass and yields
    uniform outputs, which is what the next thousand scans of this
    table pay for. Row content is untouched (oracle: identity).
    """
    df = spark.read.parquet(src_path)
    n = max(1, math.ceil(table_bytes(src_path) / target_bytes))
    df.repartition(n).write.mode("overwrite").parquet(dst_path)
    return spark.read.parquet(dst_path)


def data_file_count(path: str) -> int:
    return sum(
        1
        for _root, _dirs, names in os.walk(path)
        for name in names
        if name.endswith(".parquet")
    )


def compact_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: fragment the events table into 64 small files
    (the shape a micro-batching ingest leaves behind), compact to the
    byte-target file count, return the compacted table — which must
    be row-identical to the original (identity oracle). File-count
    reduction itself is asserted in tests/test_maintenance.py."""
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    frag = scratch_path("compact", sf_name, "frag")
    out = scratch_path("compact", sf_name, "out")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    ev.repartition(64).write.mode("overwrite").parquet(frag)
    return compact_table(spark, frag, out)
