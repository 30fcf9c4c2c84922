"""TTL'd query-result cache (K6 analog) on parquet.

The reference caches marshaled query results in Redis under
SHA-256(query + params) with a 300 s TTL
(services/query/main.py:66-79,226-234). The engine-level equivalent:
key the OPTIMIZED LOGICAL PLAN (Catalyst has already folded the
parameters into it), store the result as parquet in scratch space,
and serve reads from the stored file while it is younger than the
TTL. ``df.cache()`` covers intra-session reuse; this layer is the
cross-session / serving-tier analog with explicit expiry, kept
deliberately tiny.

Plan keys normalize away per-session expression ids (``#123``), so
the same query text from two sessions hits the same entry. Two
different queries collide only if their optimized plans are
identical modulo ids — i.e. they are the same query.
"""

from __future__ import annotations

import hashlib
import os
import re
import shutil
import time

from pyspark.sql import DataFrame

from data_ingestion_pipeline_spark.operators.upsert import scratch_path

DEFAULT_TTL_SECONDS = 300  # the reference's CACHE_TTL


def plan_key(df: DataFrame) -> str:
    """Stable cache key for a DataFrame's optimized plan."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    normalized = re.sub(r"#\d+L?", "#", plan)
    return hashlib.sha256(normalized.encode()).hexdigest()


def _is_fresh(path: str, ttl_seconds: int) -> bool:
    marker = os.path.join(path, "_SUCCESS")
    return os.path.exists(marker) and (time.time() - os.path.getmtime(marker)) < ttl_seconds


def cached(
    df: DataFrame,
    ttl_seconds: int = DEFAULT_TTL_SECONDS,
    cache_root: str | None = None,
) -> DataFrame:
    """Serve `df`'s result from the cache if a fresh entry exists;
    otherwise materialize, store, and serve the stored copy.

    Reading the stored parquet (not the live plan) makes repeated
    calls O(result size), matching the Redis-hit path of the
    reference.
    """
    spark = df.sparkSession
    root = cache_root or scratch_path("result_cache")
    path = os.path.join(root, plan_key(df))
    if not _is_fresh(path, ttl_seconds):
        shutil.rmtree(path, ignore_errors=True)
        df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)
