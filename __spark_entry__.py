"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``data_ingestion_pipeline_spark``; the
registry (name → callable + oracle SQL) is the single source of
truth, mirrored by tests/test_oracle_parity.py locally.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_ingestion_pipeline_spark.registry import oracle_dict, queries_dict  # noqa: E402
from data_ingestion_pipeline_spark.session import apply_session_conf  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: per-station 15-minute timeseries.

    The reference's headline capability (`/weather/timeseries`,
    services/query/main.py:318-398) over the events table.
    """
    apply_session_conf(spark)
    from data_ingestion_pipeline_spark.operators.queries import timeseries_15m_all

    return timeseries_15m_all(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    fns = queries_dict()

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_session_conf(spark)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in fns.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each queries() entry."""
    return oracle_dict()
