"""Approximate aggregates: bounded error vs the exact twin."""

from __future__ import annotations

from data_ingestion_pipeline_spark.operators import analytics
from tests.conftest import SF_TEST


def test_approx_distinct_within_rsd(spark):
    """approx_count_distinct (HLL++) must stay within 15% relative
    error of the exact distinct count per group (rsd=0.05 default →
    3σ = 15%; measured error at sf0.001 is 0 for every group)."""
    exact = {
        r.event_type: r.distinct_users
        for r in analytics.event_type_cardinality(spark, SF_TEST).collect()
    }
    approx = {
        r.event_type: r.approx_distinct_users
        for r in analytics.event_type_cardinality_approx(spark, SF_TEST).collect()
    }
    assert set(exact) == set(approx)
    for t in exact:
        rel = abs(approx[t] - exact[t]) / exact[t]
        assert rel <= 0.15, (t, exact[t], approx[t])
