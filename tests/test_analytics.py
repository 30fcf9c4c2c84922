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


def test_approx_percentile_within_bound(spark):
    """approx_percentile (Greenwald-Khanna sketch, accuracy=10000)
    returns an actual data point whose RANK must be within
    1/accuracy (+ one discrete step for small groups) of the target
    quantile — the correct error model for a rank-sketch; a value-
    space bound would be wrong because the sketch never interpolates.
    This is the scale path for high-cardinality groups where
    value_quantiles_by_type's exact per-group sort is too expensive."""
    import bisect

    from pyspark.sql import functions as F

    from data_ingestion_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, SF_TEST, "events")
    qs = list(analytics.QUANTILES)
    approx = {
        r.event_type: list(r.ap)
        for r in ev.groupBy("event_type")
        .agg(
            F.approx_percentile(
                "value", F.array(*[F.lit(q) for q in qs]), F.lit(10000)
            ).alias("ap")
        )
        .collect()
    }
    values = {}
    for r in ev.select("event_type", "value").collect():
        values.setdefault(r.event_type, []).append(r.value)
    assert set(approx) == set(values)
    for t, vs in values.items():
        vs.sort()
        n = len(vs)
        for q, a in zip(qs, approx[t]):
            lo = bisect.bisect_left(vs, a) / n
            hi = bisect.bisect_right(vs, a) / n
            err = 0.0 if lo <= q <= hi else min(abs(lo - q), abs(hi - q))
            assert err <= 1 / 10000 + 1 / n, (t, q, a, err)


def test_hll_rollup_error_and_merge(spark):
    """HLL rollup ground truth (registry rows-only evidence): every
    per-day estimate within 5% of its exact count; the total row's
    estimate — computed by UNIONING daily sketches, not rescanning —
    within 5% of the exact overall distinct count; deterministic
    across runs."""
    from pyspark.sql import functions as F

    from data_ingestion_pipeline_spark.operators.analytics import hll_user_rollup
    from data_ingestion_pipeline_spark.sources.tables import load_table

    rows = hll_user_rollup(spark, SF_TEST).collect()
    per_day = [r for r in rows if r.bucket is not None]
    totals = [r for r in rows if r.bucket is None]
    assert per_day and len(totals) == 1

    for r in per_day:
        assert r.exact_users > 0
        assert abs(r.approx_users - r.exact_users) / r.exact_users < 0.05, r

    exact_total = (
        load_table(spark, SF_TEST, "events")
        .agg(F.count_distinct("user_id").alias("n"))
        .first()
        .n
    )
    assert abs(totals[0].approx_users - exact_total) / exact_total < 0.05
    assert totals[0].exact_users is None

    again = hll_user_rollup(spark, SF_TEST).collect()
    assert sorted(map(tuple, rows), key=repr) == sorted(map(tuple, again), key=repr)


def test_cms_never_undercounts_and_collides(spark):
    """The count-min invariant: est ≥ exact for EVERY key (a sketch
    can only overcount), and at w=64 against the test key domain the
    overcount path is actually exercised — at least one key must
    collide in all four hash rows, otherwise the fixture degenerates
    to an identity test."""
    rows = analytics.cms_heavy_hitters(spark, SF_TEST).collect()
    assert rows
    assert all(r.n_est >= r.n_exact for r in rows)
    assert any(r.n_est > r.n_exact for r in rows)


def test_histogram_quantile_within_half_bin(spark):
    """The histogram sketch's midpoint estimates must sit within w/2
    of the exact rank-r order statistics for EVERY group — the error
    contract is by construction (the r-th value lives in the chosen
    bin), so the verdicts must all be True, not just mostly."""
    rows = analytics.histogram_quantile_rollup(spark, SF_TEST).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.p50_ok and r.p95_ok, r
        assert abs(r.p50_est - r.p50_disc) <= analytics.HIST_BIN_WIDTH / 2
        assert abs(r.p95_est - r.p95_disc) <= analytics.HIST_BIN_WIDTH / 2
