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


# ---- Z-order clustering: the data-skipping layout pass -------------
# Directory-level rewrite (plain parquet in/out, min-max-scaled
# Morton key). The VERSIONED-TABLE sibling is
# operators/versioned.py::zorder_cluster — quantile-bucketed,
# committed through the atomic publish protocol, with write-time
# stats maintenance and a multi-column intersection probe
# (stats_lookup_multi) on top.

ZORDER_BITS = 16  # per-dimension resolution of the interleaved key


def _spread16(c):
    """Spread a 16-bit value's bits to the even positions of a 32-bit
    lane (classic Morton magic-number sequence) — five shift/mask ops,
    all JVM-side inside whole-stage codegen."""
    from pyspark.sql import functions as F

    x = c.cast("long")
    x = x.bitwiseOR(F.shiftleft(x, 8)).bitwiseAND(F.lit(0x00FF00FF))
    x = x.bitwiseOR(F.shiftleft(x, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
    x = x.bitwiseOR(F.shiftleft(x, 2)).bitwiseAND(F.lit(0x33333333))
    x = x.bitwiseOR(F.shiftleft(x, 1)).bitwiseAND(F.lit(0x55555555))
    return x


def zorder_key(a, b, a_min, a_max, b_min, b_max):
    """Morton (Z-order) key interleaving two columns, each min-max
    scaled to ZORDER_BITS bits. Linear scaling (not rank) keeps the
    key a pure per-row expression — no window, no second shuffle; the
    min/max bounds come from a one-row aggregate (metadata-cheap, and
    on a catalog-backed table free from column statistics)."""
    from pyspark.sql import functions as F

    top = (1 << ZORDER_BITS) - 1

    def scale(c, lo, hi):
        lo_l, hi_l = F.lit(lo).cast("double"), F.lit(hi).cast("double")
        span = F.when(hi_l > lo_l, hi_l - lo_l).otherwise(F.lit(1.0))
        return F.floor(
            ((c.cast("double") - lo_l) / span) * F.lit(float(top))
        ).cast("long")

    return F.shiftleft(_spread16(scale(a, a_min, a_max)), 1).bitwiseOR(
        _spread16(scale(b, b_min, b_max))
    )


def zorder_cluster_table(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    cols: tuple[str, str] = ("user_id", "ts"),
    target_bytes: int = TARGET_FILE_BYTES,
) -> DataFrame:
    """Rewrite a table clustered by the Morton order of two columns —
    the OPTIMIZE ... ZORDER BY pass of the lakehouse world.

    Why: parquet readers skip row groups whose min/max stats exclude
    the predicate. A round-robin layout gives every file the full
    value range of every column — zero skipping; sorting by one
    column skips on that column only. Z-order interleaving bounds
    BOTH columns' ranges per file, so point/range predicates on
    either column (station scans AND time scans) prune most files of
    a 100 TB table.

    Shape: one tiny min/max aggregate → per-row JVM Morton key →
    `repartitionByRange` on the key (sampled range exchange, the
    same machinery as a global sort) → `sortWithinPartitions` so row
    groups inside each file get tight stats too → size-targeted
    write. Row content is untouched (identity oracle); the skipping
    claim is asserted per-file in tests/test_maintenance.py.
    """
    from pyspark.sql import functions as F

    df = spark.read.parquet(src_path)
    # Timestamp columns convert to epoch seconds IN-ENGINE (session
    # timezone) on both the bounds aggregate and the per-row key.
    # Collecting datetimes and calling .timestamp() would interpret
    # them in the OS-local zone — off-UTC hosts would skew the bounds,
    # push scaled values out of [0, top], and silently destroy the
    # clustering (rows stay correct; skipping doesn't).
    types = dict(df.dtypes)
    a, b = (
        _epoch(F.col(c)) if types[c].startswith("timestamp") else F.col(c)
        for c in cols
    )
    bounds = df.agg(
        F.min(a).alias("a_min"),
        F.max(a).alias("a_max"),
        F.min(b).alias("b_min"),
        F.max(b).alias("b_max"),
    ).first()
    a_min, a_max = bounds.a_min, bounds.a_max
    b_min, b_max = bounds.b_min, bounds.b_max
    n = max(1, math.ceil(table_bytes(src_path) / target_bytes))
    keyed = df.withColumn("_zkey", zorder_key(a, b, a_min, a_max, b_min, b_max))
    (
        keyed.repartitionByRange(n, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(dst_path)
    )
    return spark.read.parquet(dst_path)


def _epoch(c):
    from pyspark.sql import functions as F

    return F.unix_timestamp(c)


def zorder_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: fragment the events table round-robin (the
    zero-skipping worst case), rewrite it Z-ordered on
    (user_id, ts), and return the clustered table — row-identical to
    the source (identity oracle). The per-file range-tightening that
    justifies the pass is asserted in tests/test_maintenance.py."""
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    frag = scratch_path("zorder", sf_name, "frag")
    out = scratch_path("zorder", sf_name, "out")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    ev.repartition(16).write.mode("overwrite").parquet(frag)
    return zorder_cluster_table(
        spark, frag, out, target_bytes=table_bytes(frag) // 8
    )


def optimize_table(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    zorder_cols: tuple[str, str] | None = ("user_id", "ts"),
    target_bytes: int = TARGET_FILE_BYTES,
) -> dict:
    """The standing OPTIMIZE pass as one call: size-targeted rewrite,
    optionally Z-ordered on two columns, returning the before/after
    report a maintenance scheduler logs (files, bytes, rows). Row
    identity is the compact/zorder contract (oracle-checked by their
    registry entries); this orchestrator just sequences them and
    measures."""
    before = {
        "files": data_file_count(src_path),
        "bytes": table_bytes(src_path),
    }
    if zorder_cols:
        df = zorder_cluster_table(
            spark, src_path, dst_path, cols=zorder_cols, target_bytes=target_bytes
        )
    else:
        df = compact_table(spark, src_path, dst_path, target_bytes=target_bytes)
    return {
        "before": before,
        "after": {
            "files": data_file_count(dst_path),
            "bytes": table_bytes(dst_path),
        },
        "rows": df.count(),
        "zordered": bool(zorder_cols),
    }
