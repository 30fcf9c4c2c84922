"""K6 analog: TTL'd result cache behavior."""

from __future__ import annotations

import glob
import os
import shutil

from data_ingestion_pipeline_spark.functions.result_cache import cached, plan_key
from data_ingestion_pipeline_spark.operators.queries import grouped_agg_all_stations
from data_ingestion_pipeline_spark.operators.upsert import scratch_path
from tests.conftest import SF_TEST


def _entry_files(root: str, key: str):
    return {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(root, key, "*"))
    }


def test_cache_hit_serves_stored_result_and_expires(spark):
    # cache_root CONTAINS the entries (entry dir = root/<plan_key>)
    root = scratch_path("t_cache")
    shutil.rmtree(root, ignore_errors=True)

    df = grouped_agg_all_stations(spark, SF_TEST)
    key = plan_key(df)
    expected = sorted(tuple(r) for r in df.collect())

    first = sorted(tuple(r) for r in cached(df, cache_root=root).collect())
    files_after_first = _entry_files(root, key)
    assert first == expected and files_after_first

    # hit: same rows, stored files untouched (no rewrite)
    second = sorted(tuple(r) for r in cached(df, cache_root=root).collect())
    assert second == expected
    assert _entry_files(root, key) == files_after_first

    # same query text in a fresh plan object → same key (expr ids normalized)
    assert plan_key(grouped_agg_all_stations(spark, SF_TEST)) == key

    # ttl=0: entry is stale, gets rewritten
    third = sorted(tuple(r) for r in cached(df, ttl_seconds=0, cache_root=root).collect())
    assert third == expected
    assert _entry_files(root, key) != files_after_first
