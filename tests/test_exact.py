"""The exactness core: results must be BIT-identical under any
partitioning — the property that lets a 1000-executor cluster and the
single-threaded oracle agree, and the reason functions/exact.py and
the fixed-point dot products exist at all.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_pipeline_spark.functions.exact import dec_avg, dec_sum
from data_ingestion_pipeline_spark.operators.similarity import _fixed_dot
from data_ingestion_pipeline_spark.sources.tables import load_table
from tests.conftest import SF_TEST


def _agg_rows(df):
    out = df.groupBy("user_id").agg(
        dec_avg("value").alias("a"),
        dec_sum("value").alias("s"),
        F.count(F.lit(1)).alias("c"),
    )
    return sorted(tuple(r) for r in out.collect())


def test_dec_aggregates_partition_independent(spark):
    """Same aggregate, radically different partitionings → identical
    bits. (A plain SUM(double) would differ in the last ulps between
    these runs — that is the failure mode this guards against.)"""
    ev = load_table(spark, SF_TEST, "events")
    baseline = _agg_rows(ev.coalesce(1))
    for n in (7, 32):
        assert _agg_rows(ev.repartition(n)) == baseline, f"n={n}"
    # and under a skewed-ish repartitioning by an unrelated key
    assert _agg_rows(ev.repartition(16, "event_type")) == baseline


def test_fixed_dot_partition_independent(spark):
    emb = load_table(spark, SF_TEST, "embeddings")
    expr = _fixed_dot(F.col("embedding"), F.col("embedding")).alias("d")
    baseline = sorted(
        tuple(r) for r in emb.coalesce(1).select("vec_id", expr).collect()
    )
    shuffled = sorted(
        tuple(r) for r in emb.repartition(13).select("vec_id", expr).collect()
    )
    assert shuffled == baseline
