"""Toolkit operators whose evidence is not a SQL oracle: LTTB
downsampling (sequential pick-dependent selection) against an
independent pure-Python reference.

The oracle-expressible toolkit ops (OHLC, interpolation, TWA,
uptime) are covered by tests/test_oracle_parity.py; their plan
shapes by tests/test_plans.py.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from data_ingestion_pipeline_spark.operators import toolkit
from tests.conftest import SF_TEST


def _reference_lttb(points, k):
    """Independent scalar LTTB (Steinarsson 2013, §4.2): points are
    (x, y) sorted; returns picked indices. Left-to-right scalar sums
    — bit-identical to numpy's sequential accumulation for the
    <128-element buckets this test constructs."""
    n = len(points)
    if n <= k:
        return list(range(n))
    edges = [i * (n - 2) // (k - 2) + 1 for i in range(k - 1)]
    idx = [0]
    a = 0
    for b in range(k - 2):
        lo, hi = edges[b], edges[b + 1]
        nlo = edges[b + 1]
        nhi = edges[b + 2] if b + 2 < len(edges) else n
        cx = cy = 0.0
        for j in range(nlo, nhi):
            cx += points[j][0]
            cy += points[j][1]
        cx /= nhi - nlo
        cy /= nhi - nlo
        xa, ya = points[a]
        best, best_area = lo, -1.0
        for j in range(lo, hi):
            area = abs((xa - cx) * (points[j][1] - ya) - (xa - points[j][0]) * (cy - ya))
            if area > best_area:  # strict: ties keep the earliest
                best, best_area = j, area
        idx.append(best)
        a = best
    idx.append(n - 1)
    return idx


def _series_df(spark, n_stations=3, n_points=500):
    """Deterministic multi-station series; bucket sizes ≈ n_points /
    LTTB_POINTS ≪ 128 so numpy sums sequentially (see reference)."""
    return (
        spark.range(n_stations * n_points)
        .select(
            (F.col("id") % n_stations).alias("user_id"),
            F.col("id").alias("event_id"),
            (
                F.to_timestamp(F.lit("2024-01-01 00:00:00"))
                + F.make_interval(secs=(F.col("id") / n_stations).cast("int") * 60)
            ).alias("ts"),
            (
                F.sin(F.col("id").cast("double") / 7.0) * 10.0
                + F.cos(F.col("id").cast("double") / 23.0) * 5.0
            ).alias("value"),
        )
    )


def test_lttb_matches_reference(spark, monkeypatch, tmp_path):
    df = _series_df(spark)
    path = str(tmp_path / "events.parquet")
    df.write.parquet(path)

    got = toolkit.lttb_downsample(spark, str(tmp_path)).collect()
    by_station = {}
    for r in got:
        by_station.setdefault(r.user_id, []).append(r)

    src = {}
    for r in df.select("user_id", "ts", "event_id", "value").collect():
        src.setdefault(r.user_id, []).append(r)

    assert set(by_station) == set(src)
    for uid, rows in src.items():
        rows.sort(key=lambda r: (r.ts, r.event_id))
        pts = [(float(r.ts.timestamp() * 1e9), r.value) for r in rows]
        want_idx = _reference_lttb(pts, toolkit.LTTB_POINTS)
        picked = sorted(by_station[uid], key=lambda r: r.pick)
        assert len(picked) == len(want_idx)
        for p, j in zip(picked, want_idx):
            assert p.ts == rows[j].ts and p.value == rows[j].value, (
                uid,
                p.pick,
                p.ts,
                rows[j].ts,
            )


def test_lttb_passthrough_when_small(spark, tmp_path):
    """Stations with ≤ LTTB_POINTS readings come back whole, in
    order, with consecutive pick ranks."""
    df = _series_df(spark, n_stations=2, n_points=toolkit.LTTB_POINTS - 5)
    path = str(tmp_path / "events.parquet")
    df.write.parquet(path)
    got = toolkit.lttb_downsample(spark, str(tmp_path)).collect()
    per = {}
    for r in got:
        per.setdefault(r.user_id, []).append(r)
    for uid, rows in per.items():
        rows.sort(key=lambda r: r.pick)
        assert len(rows) == toolkit.LTTB_POINTS - 5
        assert [r.pick for r in rows] == list(range(len(rows)))
        assert all(a.ts <= b.ts for a, b in zip(rows, rows[1:]))


def test_lttb_keeps_endpoints_and_count(spark):
    """On the real events table: every station returns min(n, K)
    points, first/last reading always kept."""
    got = toolkit.lttb_downsample(spark, SF_TEST).collect()
    from data_ingestion_pipeline_spark.sources.tables import load_table

    ev = (
        load_table(spark, SF_TEST, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("ts").alias("lo"),
            F.max("ts").alias("hi"),
        )
        .collect()
    )
    stats = {r.user_id: r for r in ev}
    per = {}
    for r in got:
        per.setdefault(r.user_id, []).append(r)
    assert set(per) == set(stats)
    for uid, rows in per.items():
        s = stats[uid]
        assert len(rows) == min(s.n, toolkit.LTTB_POINTS)
        ts = sorted(r.ts for r in rows)
        assert ts[0] == s.lo and ts[-1] == s.hi
