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


def test_zorder_tightens_per_file_ranges(spark):
    """The Z-ordered layout must bound BOTH clustering columns per
    file: the summed per-file user_id range must shrink by a large
    factor vs the round-robin fragments (where every file spans
    ~the full station range — zero data-skipping), and the ts ranges
    must shrink too. Rows are untouched (the registry's identity
    oracle re-checks that at sf0.01)."""
    import glob
    import os

    from data_ingestion_pipeline_spark.operators.maintenance import zorder_roundtrip
    from data_ingestion_pipeline_spark.sources.tables import load_table

    out_df = zorder_roundtrip(spark, SF_TEST)
    sf_name = SF_TEST.rstrip("/").rsplit("/", 1)[1]
    frag = scratch_path("zorder", sf_name, "frag")
    out = scratch_path("zorder", sf_name, "out")

    def ranges(path):
        spans_uid, spans_ts = [], []
        for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
            import pyarrow.parquet as pq

            t = pq.read_table(f, columns=["user_id", "ts"])
            uid = t.column("user_id").to_pylist()
            ts = t.column("ts").to_pylist()
            if uid:
                spans_uid.append(max(uid) - min(uid))
                spans_ts.append((max(ts) - min(ts)).total_seconds())
        return spans_uid, spans_ts

    frag_uid, frag_ts = ranges(frag)
    out_uid, out_ts = ranges(out)
    assert len(out_uid) > 1, "need multiple output files to measure clustering"
    # round-robin: every fragment spans ~the whole station range
    assert sum(out_uid) / len(out_uid) < 0.5 * sum(frag_uid) / len(frag_uid), (
        out_uid,
        frag_uid,
    )
    assert sum(out_ts) / len(out_ts) < 0.75 * sum(frag_ts) / len(frag_ts), (
        out_ts,
        frag_ts,
    )

    ev = load_table(spark, SF_TEST, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    assert sorted(map(tuple, out_df.collect())) == sorted(map(tuple, ev.collect()))


def test_optimize_table_reports_and_preserves_rows(spark, tmp_path):
    from data_ingestion_pipeline_spark.operators.maintenance import (
        optimize_table,
        table_bytes,
    )
    from data_ingestion_pipeline_spark.sources.tables import load_table

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ev = load_table(spark, SF_TEST, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    ev.repartition(32).write.mode("overwrite").parquet(src)
    report = optimize_table(
        spark, src, dst, target_bytes=table_bytes(src) // 4
    )
    assert report["before"]["files"] == 32
    assert report["after"]["files"] < report["before"]["files"]
    assert report["rows"] == ev.count()
    assert report["zordered"]
