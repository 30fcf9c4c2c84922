"""Central query registry: name → (spark callable, DuckDB oracle SQL).

Single source of truth consumed by __spark_entry__.py (the driver
contract) and tests/test_oracle_parity.py (the local replica of the
driver's correctness gate). Oracle SQL is ANSI/DuckDB dialect over
the pre-registered views region/nation/customer/supplier/part/
orders/lineitem/events/documents/embeddings.

Conventions keeping Spark and DuckDB hash-identical:
- every computed column aliased identically on both sides;
- float aggregates via exact decimal sums (functions/exact.py);
- integer SUMs cast to BIGINT in DuckDB (it widens to HUGEINT);
- deterministic tie-breaks on any top-k / per-group-top-1.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from data_ingestion_pipeline_spark.operators import ingest, queries

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: str | None  # None → non-SQL-expressible, rows-only check


_KNOWN_TYPES_SQL = "('click', 'view', 'purchase', 'signup', 'error')"
_TIME_PRED = (
    "ts BETWEEN TIMESTAMP '2024-01-05 00:00:00' AND TIMESTAMP '2024-01-20 00:00:00'"
)
_DEC_AVG_VALUE = (
    "CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(value)"
)

REGISTRY: dict[str, QuerySpec] = {
    # ---- reference query surface (SURVEY.md §2.3-§2.6) ----
    "raw_filter_sort": QuerySpec(
        queries.raw_filter_sort,
        f"""
        SELECT event_id, ts, user_id, event_type, value
        FROM events
        WHERE user_id = 7 AND {_TIME_PRED}
        ORDER BY ts DESC
        """,
    ),
    "raw_filter_open_range": QuerySpec(
        queries.raw_filter_open_range,
        """
        SELECT event_id, ts, user_id, event_type, value
        FROM events WHERE user_id = 7 ORDER BY ts DESC
        """,
    ),
    "grouped_agg": QuerySpec(
        queries.grouped_agg,
        f"""
        SELECT user_id,
               {_DEC_AVG_VALUE} AS avg_value,
               MIN(value) AS min_value,
               MAX(value) AS max_value,
               COUNT(*) AS reading_count
        FROM events
        WHERE user_id = 7 AND {_TIME_PRED}
        GROUP BY user_id
        """,
    ),
    "grouped_agg_all_stations": QuerySpec(
        queries.grouped_agg_all_stations,
        f"""
        SELECT user_id,
               {_DEC_AVG_VALUE} AS avg_value,
               MIN(value) AS min_value,
               MAX(value) AS max_value,
               COUNT(*) AS reading_count
        FROM events GROUP BY user_id
        """,
    ),
    "timeseries_1h": QuerySpec(
        queries.timeseries_1h,
        f"""
        SELECT date_trunc('hour', ts) AS bucket,
               {_DEC_AVG_VALUE} AS avg_value,
               COUNT(*) AS reading_count
        FROM events
        WHERE user_id = 7 AND {_TIME_PRED}
        GROUP BY 1 ORDER BY 1
        """,
    ),
    "timeseries_15m_all": QuerySpec(
        queries.timeseries_15m_all,
        f"""
        SELECT time_bucket(INTERVAL '15 minutes', ts) AS bucket,
               user_id, event_type,
               {_DEC_AVG_VALUE} AS avg_value,
               COUNT(*) AS reading_count
        FROM events GROUP BY 1, 2, 3
        """,
    ),
    "latest_per_station": QuerySpec(
        queries.latest_per_station,
        """
        SELECT user_id, event_id, ts, event_type, value
        FROM events
        QUALIFY row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        """,
    ),
    # ---- ingestion path (SURVEY.md §2.3 P1/P2, §2.2 K2-K4, §2.7 T1) ----
    "validate_route_valid": QuerySpec(
        ingest.validate_route_valid,
        f"""
        SELECT event_id, ts, user_id, event_type, value
        FROM events
        WHERE value IS NOT NULL
          AND value BETWEEN 0.0 AND 300.0
          AND event_type IN {_KNOWN_TYPES_SQL}
        """,
    ),
    "validate_route_dlq": QuerySpec(
        ingest.validate_route_dlq,
        f"""
        SELECT CASE
                 WHEN value IS NULL THEN 'value: missing'
                 WHEN value NOT BETWEEN 0.0 AND 300.0
                   THEN 'value out of range: ' || CAST(value AS VARCHAR)
                 ELSE 'unknown event_type: ' || event_type
               END AS error,
               to_json(struct_pack(event_id := event_id, user_id := user_id,
                                   event_type := event_type, value := value))
                 AS original_message,
               event_id AS source_event_id
        FROM events
        WHERE value IS NULL
           OR value NOT BETWEEN 0.0 AND 300.0
           OR event_type NOT IN {_KNOWN_TYPES_SQL}
        """,
    ),
    "dedup_exact": QuerySpec(
        ingest.dedup_exact,
        """
        WITH feed AS (
            SELECT * FROM events
            UNION ALL
            SELECT * FROM events WHERE event_id % 5 = 0
        )
        SELECT event_id, ts, user_id, event_type, value FROM feed
        QUALIFY row_number() OVER (
            PARTITION BY user_id, ts ORDER BY event_id) = 1
        """,
    ),
    "upsert_merge": QuerySpec(
        ingest.upsert_merge,
        """
        WITH base AS (
            SELECT event_id, ts, user_id, event_type, value FROM events
        ), updates AS (
            SELECT event_id, ts, user_id, event_type, value + 1000.0 AS value
            FROM events WHERE event_id % 10 = 0
        )
        SELECT * FROM updates
        UNION ALL
        SELECT b.* FROM base b
        WHERE NOT EXISTS (
            SELECT 1 FROM updates u
            WHERE u.user_id = b.user_id AND u.ts = b.ts)
        """,
    ),
    "batch_report": QuerySpec(
        ingest.batch_report,
        f"""
        SELECT 'batch_' || CAST(user_id AS VARCHAR) AS batch_id,
               COUNT(*) AS total,
               CAST(SUM(CASE WHEN value BETWEEN 0.0 AND 300.0
                              AND event_type IN {_KNOWN_TYPES_SQL}
                        THEN 1 ELSE 0 END) AS BIGINT) AS successful,
               CAST(SUM(CASE WHEN value BETWEEN 0.0 AND 300.0
                              AND event_type IN {_KNOWN_TYPES_SQL}
                        THEN 0 ELSE 1 END) AS BIGINT) AS failed
        FROM events GROUP BY user_id
        """,
    ),
}


def queries_dict() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_dict() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}
