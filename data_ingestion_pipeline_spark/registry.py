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

from data_ingestion_pipeline_spark.operators import (
    analytics,
    corpus,
    dedup,
    expectations,
    ingest,
    maintenance,
    multimodal,
    queries,
    rollup,
    sampling,
    similarity,
    text,
    toolkit,
    upsert,
    versioned,
    wire,
)
from data_ingestion_pipeline_spark import api
from data_ingestion_pipeline_spark.functions import skew
from data_ingestion_pipeline_spark.sources import files, generator, pysource
from data_ingestion_pipeline_spark.streaming import pipeline as streaming

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: str | None  # None → non-SQL-expressible, rows-only check
    # For oracle=None entries: the pytest node that supplies the
    # ground-truth check (hash-family-specific / approximate outputs
    # can't be SQL-oracled; the driver records rows-only, and this
    # names the evidence that makes the rows-only verdict auditable).
    ground_truth: str | None = None
    # For recall/structure-AUDIT entries (fn grades the production
    # operator against an exact ground truth): the raw production
    # path bench.py times instead, so benchmark numbers measure the
    # engine, not the grading join, and stay comparable to
    # BASELINE.md. None → bench times fn itself.
    bench_fn: QueryFn | None = None


_KNOWN_TYPES_SQL = "('click', 'view', 'purchase', 'signup', 'error')"

# Exact cosine top-k in fixed-point (floor(x·y·1e12) summed as longs —
# engine-identical; see operators/similarity.py module docstring).
# Used directly by the cosine_topk entry and as the exact side of the
# four ANN recall-audit oracles.
_COSINE_TOPK_SQL = """
        WITH e AS (
            SELECT vec_id, unnest(embedding) AS x,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings
        ), norms AS (
            SELECT vec_id,
                   SQRT(CAST(SUM(CAST(floor(
                       (CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) * 1e12
                   ) AS BIGINT)) AS DOUBLE) / 1e12) AS nrm
            FROM e GROUP BY vec_id
        ), dots AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   CAST(SUM(CAST(floor(
                       (CAST(q.x AS DOUBLE) * CAST(c.x AS DOUBLE)) * 1e12
                   ) AS BIGINT)) AS DOUBLE) / 1e12 AS dot
            FROM e q JOIN e c ON q.i = c.i
            WHERE q.vec_id < 10 AND c.vec_id >= 10
            GROUP BY 1, 2
        )
        SELECT query_id, neighbor_id,
               dot / (nq.nrm * nc.nrm) AS cosine,
               CAST(row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY dot / (nq.nrm * nc.nrm) DESC, neighbor_id) AS INTEGER) AS rank
        FROM dots
        JOIN norms nq ON nq.vec_id = query_id
        JOIN norms nc ON nc.vec_id = neighbor_id
        QUALIFY rank <= 5
"""

# Shared oracle for the ANN recall audits: per-query exact k and k-th
# cosine plus an all-TRUE recall verdict (the Spark side flips the
# verdict if measured recall drops below the documented floor).
_ANN_AUDIT_SQL = f"""
        WITH topk AS ({_COSINE_TOPK_SQL})
        SELECT query_id, CAST(COUNT(*) AS BIGINT) AS k,
               MIN(cosine) AS kth_cosine, TRUE AS recall_ok
        FROM topk GROUP BY 1
        UNION ALL
        SELECT NULL, CAST(COUNT(*) AS BIGINT), NULL, TRUE FROM topk
"""

# Exact all-pairs embedding cosine at the near-dup threshold (same
# fixed-point math as _COSINE_TOPK_SQL) — the ground-truth side of the
# embedding near-dup / SemDeDup audits.
_EMB_PAIRS_SQL = """
        WITH e AS (
            SELECT vec_id, unnest(embedding) AS x,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings
        ), norms AS (
            SELECT vec_id,
                   SQRT(CAST(SUM(CAST(floor(
                       (CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) * 1e12
                   ) AS BIGINT)) AS DOUBLE) / 1e12) AS nrm
            FROM e GROUP BY vec_id
        ), dots AS (
            SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
                   CAST(SUM(CAST(floor(
                       (CAST(a.x AS DOUBLE) * CAST(c.x AS DOUBLE)) * 1e12
                   ) AS BIGINT)) AS DOUBLE) / 1e12 AS dot
            FROM e a JOIN e c ON a.i = c.i AND a.vec_id < c.vec_id
            GROUP BY 1, 2
        )
        SELECT vec_a, vec_b, dot / (na.nrm * nb.nrm) AS cosine
        FROM dots
        JOIN norms na ON na.vec_id = vec_a
        JOIN norms nb ON nb.vec_id = vec_b
        WHERE dot / (na.nrm * nb.nrm) >= 0.45
"""

# Exact n-gram-shingle Jaccard pairs at the 0.5 threshold — shared by
# ngram_jaccard_pairs, jaccard_prefix_join, and the MinHash audit.
_NGRAM_JACCARD_SQL = """
        WITH sh AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       generate_series(1, greatest(len(w) - 2, 0)),
                       i -> array_to_string(w[i:i+2], ' '))) AS sh
            FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        )
        SELECT doc_a, doc_b, jaccard FROM (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                     / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS jaccard
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE len(a.sh) > 0 AND len(b.sh) > 0
        ) WHERE jaccard >= 0.5
"""

# SimHash fingerprints recomputed whole in SQL (md5-leaf variant):
# per-token 64 bits from the first 16 md5 hex chars, majority vote per
# bit, fingerprint + the four 16-bit bands rebuilt from the bits (no
# signed-shift tricks — bit 63 lands via an explicit −2⁶³ term).
_SIMHASH_FP_SQL = """
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents
        ), th AS (
            SELECT doc_id,
                   CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) AS hi,
                   CAST(concat('0x', substr(md5(tok), 9, 8)) AS BIGINT) AS lo
            FROM toks
        ), tb AS (
            SELECT doc_id, j,
                   SUM(CASE WHEN j < 32 THEN (lo >> j) & 1
                            ELSE (hi >> (j - 32)) & 1 END) AS c,
                   COUNT(*) AS n
            FROM th, (SELECT unnest(range(0, 64)) AS j) grid
            GROUP BY 1, 2
        ), bits AS (
            SELECT doc_id, j,
                   CAST(CASE WHEN 2 * c > n THEN 1 ELSE 0 END AS BIGINT) AS bit
            FROM tb
        )
        SELECT doc_id,
               CAST(SUM(CASE WHEN j = 63
                    THEN bit * (-9223372036854775807 - 1)
                    ELSE bit << CAST(j AS INTEGER) END) AS BIGINT) AS simhash,
               CAST(SUM(CASE WHEN j // 16 = 0
                    THEN bit << CAST(j % 16 AS INTEGER) ELSE 0 END) AS BIGINT) AS band0,
               CAST(SUM(CASE WHEN j // 16 = 1
                    THEN bit << CAST(j % 16 AS INTEGER) ELSE 0 END) AS BIGINT) AS band1,
               CAST(SUM(CASE WHEN j // 16 = 2
                    THEN bit << CAST(j % 16 AS INTEGER) ELSE 0 END) AS BIGINT) AS band2,
               CAST(SUM(CASE WHEN j // 16 = 3
                    THEN bit << CAST(j % 16 AS INTEGER) ELSE 0 END) AS BIGINT) AS band3
        FROM bits GROUP BY doc_id
"""
_TIME_PRED = (
    "ts BETWEEN TIMESTAMP '2024-01-05 00:00:00' AND TIMESTAMP '2024-01-20 00:00:00'"
)
_DEC_AVG_VALUE = (
    "CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(value)"
)

# Gaps-and-islands sessionization (break on gap >= 30 min, session end
# exclusive = last event + gap). Shared verbatim by the batch operator
# and its streaming twin: streamed-then-drained must equal batch,
# hash-for-hash.
_SESSION_SQL = f"""
    WITH marked AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), islands AS (
        -- event_id tiebreaker keeps the running sum deterministic
        -- even if a station ever has two events at one timestamp
        SELECT *, SUM(brk) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS sess
        FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           COUNT(*) AS event_count,
           {_DEC_AVG_VALUE} AS avg_value
    FROM islands GROUP BY user_id, sess
"""

# Shared by dup_clusters / dedup_canonical_corpus: the df-capped
# word-n-gram edge set and its recursive transitive closure.
_DUP_CLOSURE_CTE = f"""
        WITH RECURSIVE docs_l AS (
            SELECT doc_id, string_split(text, ' ') AS l FROM documents
        ), g AS (
            SELECT DISTINCT doc_id, md5(gram) AS gh FROM (
                SELECT doc_id,
                       unnest(list_transform(
                           generate_series(1, len(l) - {dedup.DECON_GRAM_N - 1}),
                           i -> array_to_string(
                               list_slice(l, i, i + {dedup.DECON_GRAM_N - 1}), ' ')))
                           AS gram
                FROM docs_l)
        ), capped AS (
            SELECT gh FROM g GROUP BY gh
            HAVING COUNT(*) BETWEEN {dedup.CLUSTER_GRAM_DF_MIN}
                                AND {dedup.CLUSTER_GRAM_DF_MAX}
        ), e AS (
            SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
            FROM g a JOIN g b USING (gh) JOIN capped USING (gh)
            WHERE a.doc_id <> b.doc_id
        ), reach(a, b) AS (
            SELECT src, dst FROM e
            UNION
            SELECT r.a, e2.dst FROM reach r JOIN e e2 ON r.b = e2.src
        )
"""

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
    "raw_filter_page": QuerySpec(
        queries.raw_filter_page,
        """
        SELECT event_id, ts, user_id, event_type, value
        FROM events WHERE user_id = 7
        ORDER BY ts DESC, event_id DESC
        LIMIT 20 OFFSET 20
        """,
    ),
    "raw_marshal_json": QuerySpec(
        queries.raw_marshal_json,
        f"""
        SELECT event_id,
               printf('{{"event_id":%d,"ts":"%s","user_id":%d,"event_type":"%s","value":%.2f}}',
                      event_id, strftime(ts, '%Y-%m-%dT%H:%M:%S.%f'),
                      user_id, event_type, value) AS json
        FROM events
        WHERE user_id = 7 AND {_TIME_PRED}
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
    "timeseries_1h_gapfill": QuerySpec(
        queries.timeseries_1h_gapfill,
        f"""
        WITH hourly AS (
            SELECT user_id, date_trunc('hour', ts) AS bucket,
                   {_DEC_AVG_VALUE} AS avg_value
            FROM events GROUP BY 1, 2
        ), bounds AS (
            SELECT user_id, MIN(bucket) AS lo, MAX(bucket) AS hi
            FROM hourly GROUP BY 1
        ), grid AS (
            SELECT user_id,
                   unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS bucket
            FROM bounds
        ), joined AS (
            SELECT g.user_id, g.bucket, h.avg_value,
                   h.avg_value IS NULL AS filled
            FROM grid g LEFT JOIN hourly h USING (user_id, bucket)
        )
        SELECT user_id, bucket,
               last_value(avg_value IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY bucket
                   ROWS UNBOUNDED PRECEDING) AS avg_value,
               filled
        FROM joined
        """,
    ),
    "timeseries_30m_api": QuerySpec(
        api.timeseries_30m_api,
        f"""
        SELECT time_bucket(INTERVAL '30 minutes', ts) AS bucket,
               {_DEC_AVG_VALUE} AS avg_value,
               COUNT(*) AS reading_count
        FROM events
        WHERE user_id = 7 AND {_TIME_PRED}
        GROUP BY 1
        """,
    ),
    "timeseries_ohlc_1h": QuerySpec(
        toolkit.timeseries_ohlc_1h,
        """
        SELECT user_id, date_trunc('hour', ts) AS bucket,
               first(value ORDER BY ts, event_id) AS open,
               MAX(value) AS high,
               MIN(value) AS low,
               last(value ORDER BY ts, event_id) AS close,
               COUNT(*) AS n_readings
        FROM events GROUP BY 1, 2
        """,
    ),
    "timeseries_1h_interpolate": QuerySpec(
        toolkit.timeseries_1h_interpolate,
        f"""
        WITH hourly AS (
            SELECT user_id, date_trunc('hour', ts) AS bucket,
                   {_DEC_AVG_VALUE} AS avg_value
            FROM events GROUP BY 1, 2
        ), bounds AS (
            SELECT user_id, MIN(bucket) AS lo, MAX(bucket) AS hi
            FROM hourly GROUP BY 1
        ), grid AS (
            SELECT user_id,
                   unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS bucket
            FROM bounds
        ), joined AS (
            SELECT g.user_id, g.bucket, h.avg_value
            FROM grid g LEFT JOIN hourly h USING (user_id, bucket)
        ), ctx AS (
            SELECT user_id, bucket, avg_value,
                   last_value(avg_value IGNORE NULLS) OVER wp AS prev_v,
                   last_value(CASE WHEN avg_value IS NOT NULL THEN bucket END
                              IGNORE NULLS) OVER wp AS prev_b,
                   first_value(avg_value IGNORE NULLS) OVER wn AS next_v,
                   first_value(CASE WHEN avg_value IS NOT NULL THEN bucket END
                               IGNORE NULLS) OVER wn AS next_b
            FROM joined
            WINDOW wp AS (PARTITION BY user_id ORDER BY bucket
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   wn AS (PARTITION BY user_id ORDER BY bucket
                          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
        )
        SELECT user_id, bucket,
               COALESCE(avg_value,
                        prev_v + (next_v - prev_v) *
                        (CAST(date_diff('second', prev_b, bucket) AS DOUBLE)
                         / CAST(date_diff('second', prev_b, next_b) AS DOUBLE))
               ) AS avg_value,
               avg_value IS NULL AS interpolated
        FROM ctx
        """,
    ),
    "station_time_weighted_avg": QuerySpec(
        toolkit.station_time_weighted_avg,
        """
        WITH paired AS (
            SELECT user_id, value,
                   date_diff('second', ts, lead(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)) AS dt
            FROM events
        )
        SELECT user_id,
               CAST(SUM(CAST(value AS DECIMAL(18,6))
                        * CAST(dt AS DECIMAL(12,0))) AS DOUBLE)
                   / CAST(SUM(dt) AS DOUBLE) AS twa_value,
               CAST(SUM(dt) AS BIGINT) AS span_seconds,
               COUNT(*) AS n_readings
        FROM paired GROUP BY user_id
        HAVING SUM(dt) > 0
        """,
    ),
    "station_uptime_heartbeat": QuerySpec(
        toolkit.station_uptime_heartbeat,
        """
        WITH paired AS (
            SELECT user_id, ts,
                   date_diff('second', ts, lead(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)) AS dt
            FROM events
        )
        SELECT user_id,
               CAST(SUM(LEAST(COALESCE(dt, 900), 900)) AS BIGINT) AS alive_seconds,
               CAST(date_diff('second', MIN(ts), MAX(ts)) + 900 AS BIGINT)
                   AS span_seconds,
               CAST(SUM(LEAST(COALESCE(dt, 900), 900)) AS DOUBLE)
                   / CAST(date_diff('second', MIN(ts), MAX(ts)) + 900 AS DOUBLE)
                   AS uptime_ratio,
               COUNT(*) AS n_readings
        FROM paired GROUP BY user_id
        """,
    ),
    "station_counter_total": QuerySpec(
        toolkit.station_counter_total,
        """
        WITH paired AS (
            SELECT user_id,
                   CAST(CASE WHEN value - lag(value) OVER w < 0 THEN value
                             ELSE value - lag(value) OVER w END
                        AS DECIMAL(38,6)) AS contrib,
                   CAST(value - lag(value) OVER w < 0 AS INTEGER) AS is_reset
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id,
               COALESCE(CAST(SUM(contrib) AS DOUBLE), 0.0) AS counter_total,
               CAST(COALESCE(SUM(is_reset), 0) AS BIGINT) AS resets,
               COUNT(*) AS n_readings
        FROM paired GROUP BY user_id
        """,
    ),
    "station_variance_rollup": QuerySpec(
        toolkit.station_variance_rollup,
        # single-level oracle: the two-level decimal partials
        # recompose EXACTLY, so direct aggregation is bit-identical
        """
        WITH m AS (
            SELECT user_id,
                   COUNT(*) AS n,
                   SUM(CAST(value AS DECIMAL(18,6))) AS s,
                   SUM(CAST(value AS DECIMAL(18,6))
                       * CAST(value AS DECIMAL(18,6))) AS s2
            FROM events GROUP BY user_id
            HAVING COUNT(*) > 1
        )
        SELECT user_id, CAST(n AS BIGINT) AS n,
               CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean_value,
               (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                   / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
                   AS var_value,
               sqrt((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                   / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
                   AS stddev_value
        FROM m
        """,
    ),
    "lttb_downsample": QuerySpec(
        # structural-audit form (toolkit.lttb_structure_audit): pick
        # counts, endpoints, n≤k series fully, and in-bucket verdicts
        # are SQL-checkable; the sequential triangle choice itself is
        # pinned by the pure-Python pytest twin. Raw picks stay in
        # toolkit.lttb_downsample.
        toolkit.lttb_structure_audit,
        f"""
        WITH s AS (
            SELECT user_id, ts, event_id, value,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) - 1 AS idx,
                   COUNT(*) OVER (PARTITION BY user_id) AS n
            FROM events
        ), g AS (
            SELECT user_id, n, least(n, {toolkit.LTTB_POINTS}) AS m
            FROM s WHERE idx = 0
        ), p AS (
            SELECT user_id, n, m, unnest(range(0, m)) AS pick FROM g
        )
        SELECT p.user_id, CAST(p.pick AS INTEGER) AS pick,
               CAST(p.n AS BIGINT) AS n_points,
               s.ts AS sel_ts, s.value AS sel_value,
               TRUE AS ok
        FROM p LEFT JOIN s ON s.user_id = p.user_id AND s.idx =
            CASE WHEN p.n <= {toolkit.LTTB_POINTS} THEN p.pick
                 WHEN p.pick = 0 THEN 0
                 WHEN p.pick = p.m - 1 THEN p.n - 1 END
        """,
        ground_truth="tests/test_toolkit.py::test_lttb_matches_reference",
        bench_fn=toolkit.lttb_downsample,
    ),
    "timeseries_sliding_1h15m": QuerySpec(
        queries.timeseries_sliding_1h15m,
        # each event belongs to the 4 slide-aligned windows covering it
        f"""
        SELECT time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes' AS bucket,
               {_DEC_AVG_VALUE} AS avg_value,
               COUNT(*) AS reading_count
        FROM events, generate_series(0, 3) t(k)
        WHERE user_id = 7
        GROUP BY 1
        """,
    ),
    "session_windows_30m": QuerySpec(
        queries.session_windows_30m,
        _SESSION_SQL,
    ),
    "rollup_multires_1d": QuerySpec(
        queries.rollup_multires_1d,
        # oracle aggregates the RAW data directly — the two-level
        # partials recomposition must be bit-identical to it
        f"""
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket, user_id,
               {_DEC_AVG_VALUE} AS avg_value,
               COUNT(*) AS reading_count
        FROM events GROUP BY 1, 2
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
    "wire_parse_valid": QuerySpec(
        wire.wire_parse_valid,
        """
        SELECT event_id, ts, user_id, event_type, value
        FROM events WHERE event_id % 97 <> 0
        """,
    ),
    "wire_parse_dlq": QuerySpec(
        wire.wire_parse_dlq,
        """
        SELECT 'malformed json' AS error,
               'CORRUPT<' || printf(
                   '{"event_id":%d,"ts_us":%d,"user_id":%d,"event_type":"%s","value":%.2f}',
                   event_id, epoch_us(ts), user_id, event_type, value
               ) AS original_message
        FROM events WHERE event_id % 97 = 0
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
    "csv_source_roundtrip": QuerySpec(
        files.csv_source_roundtrip,
        """
        SELECT event_id, ts, user_id, event_type, value FROM events
        """,
    ),
    "jsonl_source_roundtrip": QuerySpec(
        files.jsonl_source_roundtrip,
        """
        SELECT event_id, ts, user_id, event_type, value, props FROM events
        """,
    ),
    "orc_source_roundtrip": QuerySpec(
        files.orc_source_roundtrip,
        """
        SELECT event_id, ts, user_id, event_type, value FROM events
        """,
    ),
    "compact_roundtrip": QuerySpec(
        maintenance.compact_roundtrip,
        # compaction must be row-identity; file-count reduction is
        # asserted in tests/test_maintenance.py
        """
        SELECT event_id, ts, user_id, event_type, value FROM events
        """,
    ),
    "zorder_roundtrip": QuerySpec(
        maintenance.zorder_roundtrip,
        # Z-order clustering must be row-identity; the per-file
        # range-tightening is asserted in tests/test_maintenance.py
        """
        SELECT event_id, ts, user_id, event_type, value FROM events
        """,
    ),
    # ---- window-function surface (lag / range-frame / as-of) ----
    "station_deltas": QuerySpec(
        queries.station_deltas,
        """
        SELECT user_id, event_id, ts, value,
               value - lag(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS delta
        FROM events
        """,
    ),
    "station_moving_avg_24h": QuerySpec(
        queries.station_moving_avg_24h,
        # frame on floor(epoch seconds) — Spark's unix_timestamp
        # truncates to seconds, so both engines bound the same frame;
        # decimal window sums keep the average order-independent
        """
        SELECT user_id, event_id, ts, value,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE)
                   / COUNT(*) OVER w AS avg_24h,
               COUNT(*) OVER w AS n_24h
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                     RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW)
        """,
    ),
    "asof_latest_click": QuerySpec(
        queries.asof_latest_click,
        # DuckDB's native ASOF JOIN is the independent spelling of the
        # union+last(ignorenulls) plan; (user_id, ts) is unique so the
        # match is deterministic in both engines
        """
        SELECT p.event_id, p.user_id, p.ts, p.value,
               c.event_id AS click_id, c.ts AS click_ts,
               c.value AS click_value
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts
        """,
    ),
    # ---- synthetic source (SURVEY.md §2.1 S5/S6) ----
    "synthetic_weather": QuerySpec(
        generator.synthetic_weather,
        """
        SELECT 'station_' || CAST((((id + 1) * 2654435761 + 12345) % 2147483648) % 10 AS VARCHAR) AS station_id,
               -10.0 + CAST((((id + 2) * 2654435761 + 12345) % 2147483648) % 451 AS DOUBLE) / 10.0 AS temperature,
               CAST((((id + 3) * 2654435761 + 12345) % 2147483648) % 1001 AS DOUBLE) / 10.0 AS humidity,
               CAST((((id + 4) * 2654435761 + 12345) % 2147483648) % 301 AS DOUBLE) / 10.0 AS wind_speed,
               TIMESTAMP '2024-01-01 00:00:00' + id * INTERVAL 1 SECOND AS "timestamp",
               md5('trace_' || CAST(id AS VARCHAR)) AS trace_id,
               id AS reading_id
        FROM range(5000) t(id)
        """,
    ),
    "synthetic_weather_pysource": QuerySpec(
        pysource.synthetic_weather_pysource,
        # identical oracle to synthetic_weather: the registered Python
        # data source (Spark 4 extension point) must reproduce the
        # DataFrame twin bit-for-bit
        """
        SELECT 'station_' || CAST((((id + 1) * 2654435761 + 12345) % 2147483648) % 10 AS VARCHAR) AS station_id,
               -10.0 + CAST((((id + 2) * 2654435761 + 12345) % 2147483648) % 451 AS DOUBLE) / 10.0 AS temperature,
               CAST((((id + 3) * 2654435761 + 12345) % 2147483648) % 1001 AS DOUBLE) / 10.0 AS humidity,
               CAST((((id + 4) * 2654435761 + 12345) % 2147483648) % 301 AS DOUBLE) / 10.0 AS wind_speed,
               TIMESTAMP '2024-01-01 00:00:00' + id * INTERVAL 1 SECOND AS "timestamp",
               md5('trace_' || CAST(id AS VARCHAR)) AS trace_id,
               id AS reading_id
        FROM range(5000) t(id)
        """,
    ),
    "synthetic_weather_feed": QuerySpec(
        generator.synthetic_weather_feed,
        """
        WITH g AS (
            SELECT 'station_' || CAST((((id + 1) * 2654435761 + 12345) % 2147483648) % 10 AS VARCHAR) AS station_id,
                   -10.0 + CAST((((id + 2) * 2654435761 + 12345) % 2147483648) % 451 AS DOUBLE) / 10.0 AS temperature,
                   CAST((((id + 3) * 2654435761 + 12345) % 2147483648) % 1001 AS DOUBLE) / 10.0 AS humidity,
                   CAST((((id + 4) * 2654435761 + 12345) % 2147483648) % 301 AS DOUBLE) / 10.0 AS wind_speed,
                   TIMESTAMP '2024-01-01 00:00:00' + id * INTERVAL 1 SECOND AS "timestamp",
                   id AS reading_id
            FROM range(5000) t(id)
        )
        SELECT station_id, temperature, humidity, wind_speed, "timestamp",
               md5('trace_' || CAST(reading_id AS VARCHAR)) AS trace_id, reading_id
        FROM g
        UNION ALL
        SELECT station_id, temperature, humidity, wind_speed, "timestamp",
               md5('dup_' || CAST(reading_id AS VARCHAR)) AS trace_id, reading_id
        FROM g WHERE reading_id % 5 = 0
        """,
    ),
    # ---- streaming slice (SURVEY.md §2.7 T1-T5) ----
    "stream_dedup_upsert": QuerySpec(
        streaming.stream_dedup_to_table,
        # the drained stream must equal the batch dedup of the same
        # duplicated feed — same oracle as dedup_exact
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
    "stream_corpus_ingest": QuerySpec(
        streaming.stream_corpus_ingest,
        # first-wins content dedup over originals + injected re-crawls:
        # survivor per content hash = global min doc_id (originals
        # always beat the offset re-crawl ids), independent of batch
        # boundaries
        f"""
        WITH feed AS (
            SELECT doc_id, text, lang, source, n_chars FROM documents
            UNION ALL
            SELECT doc_id + {streaming.DOC_DUP_ID_OFFSET},
                   text, lang, source, n_chars
            FROM documents WHERE doc_id % 7 = 0
        )
        SELECT doc_id, text, lang, source, n_chars FROM feed
        QUALIFY row_number() OVER (
            PARTITION BY md5(text) ORDER BY doc_id) = 1
        """,
    ),
    "stream_first_seen": QuerySpec(
        streaming.stream_first_seen,
        # batch argmin — the feed's injected duplicates are verbatim
        # copies, so they cannot move the minimum
        """
        SELECT user_id, event_type, ts AS first_ts,
               event_id AS first_event_id, value AS first_value
        FROM events
        QUALIFY row_number() OVER (
            PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1
        """,
    ),
    "stream_session_windows": QuerySpec(
        streaming.stream_session_windows,
        # identical SQL to the batch twin session_windows_30m: the
        # incremental interval-merge drain must equal batch
        # sessionization under any batching/disorder
        _SESSION_SQL,
    ),
    "stream_session_windows_bounded": QuerySpec(
        streaming.stream_session_windows_bounded,
        # deployment mode: watermark + EventTimeTimeout eviction at a
        # 1-hour disorder horizon over a time-ordered replay. Same
        # oracle — with the horizon covering the feed's disorder,
        # bounded state changes the footprint, never the answer.
        _SESSION_SQL,
    ),
    "stream_timeseries_1h": QuerySpec(
        streaming.stream_timeseries_1h,
        f"""
        SELECT date_trunc('hour', ts) AS bucket,
               {_DEC_AVG_VALUE} AS avg_value,
               COUNT(*) AS reading_count
        FROM events
        WHERE user_id = 7 AND {_TIME_PRED}
        GROUP BY 1
        """,
    ),
    "stream_ohlc_1h": QuerySpec(
        streaming.stream_ohlc_1h,
        f"""
        SELECT date_trunc('hour', ts) AS bucket,
               first(value ORDER BY ts, event_id) AS open,
               MAX(value) AS high,
               MIN(value) AS low,
               last(value ORDER BY ts, event_id) AS close,
               COUNT(*) AS n_readings
        FROM events
        WHERE user_id = 7 AND {_TIME_PRED}
        GROUP BY 1
        """,
    ),
    "stream_validate_fanout": QuerySpec(
        streaming.stream_validate_fanout,
        # one drain, two idempotent sinks: the union view reproduces
        # the batch validity split exactly (routes disjoint + complete)
        f"""
        SELECT CASE WHEN value BETWEEN 0.0 AND 300.0
                     AND event_type IN {_KNOWN_TYPES_SQL}
                    THEN 'valid' ELSE 'dlq' END AS route,
               event_id, ts, user_id, event_type, value,
               CASE WHEN value IS NULL THEN 'value: missing'
                    WHEN value NOT BETWEEN 0.0 AND 300.0
                    THEN 'value out of range: ' || CAST(value AS VARCHAR)
                    WHEN event_type NOT IN {_KNOWN_TYPES_SQL}
                    THEN 'unknown event_type: ' || event_type
               END AS error
        FROM events
        """,
    ),
    "stream_enriched_revenue": QuerySpec(
        streaming.stream_enriched_revenue,
        # stream-static broadcast enrich + daily segment revenue ==
        # the batch join-aggregate (exact decimal sums)
        """
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
               c_mktsegment,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_purchases
        FROM events JOIN customer ON user_id = c_custkey
        WHERE event_type = 'purchase'
        GROUP BY 1, 2
        """,
    ),
    "stream_click_purchase_join": QuerySpec(
        streaming.stream_click_purchase_join,
        # watermarked stream-stream inner join == the batch range join
        # (the feed's disorder is inside the 2h horizon, so eviction
        # never drops a matchable row)
        """
        WITH c AS (
            SELECT user_id, event_id AS click_id, ts AS click_ts
            FROM events WHERE event_type = 'click'
        ), p AS (
            SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
            FROM events WHERE event_type = 'purchase'
        )
        SELECT c.user_id, click_id, click_ts, purchase_id, purchase_ts
        FROM c JOIN p ON c.user_id = p.user_id
         AND p.purchase_ts >= c.click_ts
         AND p.purchase_ts <= c.click_ts + INTERVAL 1 HOUR
        """,
    ),
    "stream_click_purchase_left_join": QuerySpec(
        streaming.stream_click_purchase_left_join,
        # sentinel-flushed outer join == the batch LEFT JOIN: matched
        # pairs plus every matchless click with NULL purchase columns
        """
        WITH c AS (
            SELECT user_id, event_id AS click_id, ts AS click_ts
            FROM events WHERE event_type = 'click'
        ), p AS (
            SELECT user_id AS p_user, event_id AS purchase_id,
                   ts AS purchase_ts
            FROM events WHERE event_type = 'purchase'
        )
        SELECT c.user_id, click_id, click_ts, purchase_id, purchase_ts
        FROM c LEFT JOIN p ON c.user_id = p.p_user
         AND p.purchase_ts >= c.click_ts
         AND p.purchase_ts <= c.click_ts + INTERVAL 1 HOUR
        """,
    ),
    "stream_dedup_within_watermark": QuerySpec(
        streaming.stream_dedup_within_watermark,
        # first-wins on exact-copy duplicates keyed by event_id ==
        # the plain events table, arrival-order-independent
        """
        SELECT event_id, ts, user_id, event_type, value FROM events
        """,
    ),
    "stream_trending_topk": QuerySpec(
        streaming.stream_trending_topk,
        # append-mode finalized windows == the batch hourly counts;
        # top-K per window ranked (count DESC, type ASC) for a
        # deterministic tiebreak
        """
        WITH c AS (
            SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
                   event_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        )
        SELECT bucket, event_type, n, rk FROM (
            SELECT *, CAST(ROW_NUMBER() OVER (
                PARTITION BY bucket ORDER BY n DESC, event_type
            ) AS INT) AS rk FROM c
        ) WHERE rk <= 3
        """,
    ),
    "stream_versioned_ingest": QuerySpec(
        streaming.stream_versioned_ingest,
        # exactly-once versioned sink: drained snapshot == source
        """
        SELECT event_id, ts, user_id, event_type, value FROM events
        """,
    ),
    "stream_versioned_append_ingest": QuerySpec(
        # O(micro-batch) exactly-once ingest: bloom-pruned first-wins
        # key dedup + append-shaped commits (all prior files carried
        # by reference) + incremental per-batch index maintenance —
        # the long-lived-stream shape where the upsert twin's
        # whole-snapshot rewrite dies. Duplicates are verbatim copies,
        # so the drained table equals the source (identity oracle).
        streaming.stream_versioned_append_ingest,
        """
        SELECT event_id, ts, user_id, event_type, value FROM events
        """,
    ),
    "stream_cdc_merge_ingest": QuerySpec(
        # streaming CDC MERGE sink (r13): a Debezium-shaped change
        # stream (insert/update_postimage/delete) applied per
        # micro-batch through ONE three-clause apply_changes_mor,
        # exactly-once via the batch_id replay guard — per batch one
        # change-sized equi-join + O(changed rows) DV/image writes,
        # zero rewritten files (the long-lived CDC-apply shape); the
        # drained table replays the three stages
        streaming.stream_cdc_merge_ingest,
        """
        SELECT event_id, ts, user_id, event_type,
               CASE WHEN event_id % 4 = 0 THEN value + 100.0
                    ELSE value END AS value
        FROM events WHERE event_id % 4 <> 1
        """,
        ground_truth="tests/test_streaming.py::test_stream_cdc_merge_versions_and_replay",
    ),
    "stream_versioned_ingest_compacted": QuerySpec(
        # maintenance composition (r10): exactly-once drain, then
        # OPTIMIZE bin-packs the micro-batch debris — snapshot must
        # STILL equal the batch source, with the replay batch_id meta
        # riding through the compaction manifest
        streaming.stream_versioned_ingest_compacted,
        """
        SELECT event_id, ts, user_id, event_type, value FROM events
        """,
        ground_truth="tests/test_streaming.py::test_versioned_ingest_compaction_composes",
    ),
    "purge_roundtrip": QuerySpec(
        versioned.purge_roundtrip,
        # hard purge across history: time-traveled v1 == source minus
        # the purged stations (COW-shared and rewritten files alike)
        """
        SELECT event_id, ts, user_id, event_type, value FROM events
        WHERE user_id NOT IN (7, 11)
        """,
    ),
    "versioned_table_changes": QuerySpec(
        versioned.versioned_table_changes,
        # CDF between v1 and the +1000 upsert: every change is an
        # update pre/post pair, nothing else
        """
        WITH u AS (
            SELECT event_id, ts, user_id, event_type, value
            FROM events WHERE event_id % 10 = 0
        )
        SELECT event_id, ts, user_id, event_type, value,
               'update_preimage' AS _change_type
        FROM u
        UNION ALL
        SELECT event_id, ts, user_id, event_type, value + 1000.0,
               'update_postimage'
        FROM u
        """,
    ),
    "versioned_drop_column": QuerySpec(
        # DROP COLUMN (r13): metadata-only narrowing commit — files
        # byte-identical, readers project through the narrower schema
        # (parquet never decodes the dropped column's pages), time
        # travel still serves it, and the dropped NAME is retired
        # (name-mapped format: re-adding it would resurrect pre-drop
        # values — refused, pinned). Post-drop writability proven by
        # an upsert in the entry itself
        versioned.versioned_drop_column,
        versioned.versioned_drop_column_oracle_sql(),
        ground_truth="tests/test_versioned.py::test_drop_column_is_metadata_only_and_name_retires",
    ),
    "identity_column_appends": QuerySpec(
        # IDENTITY columns (r14): gap-free monotonic row ids as the
        # deterministic global rank of a unique order key — one range
        # exchange + per-partition offsets, never the single-partition
        # row_number window; high-watermark rides in commit meta
        # across appends (Delta identity, made oracle-replayable)
        versioned.identity_column_appends,
        versioned.identity_column_oracle_sql(),
        ground_truth="tests/test_versioned.py::test_identity_assignment_distributed",
    ),
    "versioned_widen_column": QuerySpec(
        # ALTER COLUMN TYPE widening (r14): metadata-only — the
        # manifest records the wider type and Spark's parquet reader
        # upcasts narrow physical pages losslessly at the scan
        # (Delta's type-widening feature on this format). Entry reads
        # MIXED narrow/wide physical generations (originals int/float,
        # MOR update images bigint/double) through one logical schema;
        # narrowing refusal + time travel + RENAME composition pinned
        versioned.versioned_widen_column,
        versioned.versioned_widen_column_oracle_sql(),
        ground_truth="tests/test_versioned.py::test_widen_column_type_metadata_only",
    ),
    "shallow_clone_roundtrip": QuerySpec(
        # SHALLOW CLONE (r14): zero-copy table copy — the clone's v1
        # manifest references the source's files across table roots
        # (../-relative), O(manifest) at any size; writes on the clone
        # localize only what they touch (COW day rewrite), schema DDL
        # works immediately, the source never changes. DV/MOR/index/
        # purge refuse until localize_clone (the bookkeeping-safety
        # contract, pinned); Delta's shallow-clone vacuum caveat
        # applies and is documented
        versioned.shallow_clone_roundtrip,
        versioned.shallow_clone_oracle_sql(),
        ground_truth="tests/test_versioned.py::test_shallow_clone_lifecycle",
    ),
    "versioned_rename_column": QuerySpec(
        # RENAME COLUMN (r14): metadata-only rename on the name-mapped
        # format via per-file physical-name map sidecars (Delta needs
        # column-mapping IDs for this verb). The entry chains two
        # renames around a MOR update so the final snapshot reads
        # files of MIXED physical generations (`value` originals +
        # `reading` update images) through one logical schema; old
        # names retire, time travel serves every generation (pinned)
        versioned.versioned_rename_column,
        versioned.versioned_rename_column_oracle_sql(),
        ground_truth="tests/test_versioned.py::test_rename_column_lifecycle",
    ),
    "constrained_ingest": QuerySpec(
        # write-time CHECK constraints (r13): Delta's ADD CONSTRAINT on
        # this format — table-level row contracts enforced INLINE in
        # every ingest write scan (assert_true guards; zero extra
        # passes), violating commits refuse before any manifest
        # publishes, add-time validation of existing data; the
        # reference's consumer range validation moved from app code
        # into the table (services/consumer/main.py:142-161)
        versioned.constrained_ingest,
        versioned.constrained_ingest_oracle_sql(),
        ground_truth="tests/test_versioned.py::test_check_constraints_enforced_on_every_ingest_path",
    ),
    "cdf_incremental_consume": QuerySpec(
        # durable-cursor CDF consumer (r13): the Delta streaming-source
        # consumption loop — consume nets changes between the acked and
        # current versions, the caller processes then acks
        # (at-least-once; idempotent applier → exactly-once). Two-batch
        # lifecycle: upsert → update pairs, DV delete → delete images
        # carrying the upserted values; empty re-consume and ack
        # monotonicity pinned in tests/test_versioned.py
        versioned.cdf_incremental_consume,
        versioned.cdf_incremental_consume_oracle_sql(),
        ground_truth="tests/test_versioned.py::test_cdf_consumer_replays_unacked_batch",
    ),
    "table_checksum_audit": QuerySpec(
        # order-insensitive content checksum (r13): one scan, one
        # 3-field aggregate (rows / bit_xor / decimal-sum of portable
        # per-row md5 hashes) — the replica-verification primitive
        # (equal checksums ⇒ skip the row diff; compare 3 numbers,
        # never data). The oracle recomputes the hash with DuckDB's
        # own md5, pinning cross-engine canonical-row portability
        versioned.table_checksum_audit,
        versioned.table_checksum_oracle_sql(),
        ground_truth="tests/test_versioned.py::test_verify_replica_and_checksum_sensitivity",
    ),
    "cdf_replica_sync": QuerySpec(
        # CDF → MERGE replication, loop-closed (r13): one net change
        # batch (upsert + DV delete collapsed) applied to a replica
        # through one three-clause merge_into_mor; the replica's
        # snapshot must equal the source's. Content-idempotent
        # re-apply (at-least-once consumer ⇒ exactly-once replica)
        # pinned in tests/test_versioned.py
        versioned.cdf_replica_sync,
        versioned.cdf_replica_sync_oracle_sql(),
        ground_truth="tests/test_versioned.py::test_cdf_replica_reapply_is_content_idempotent",
    ),
    "stream_cdf_replica": QuerySpec(
        # CDF as a STREAMING source (r15): the commit log is already a
        # file stream (one atomic JSON manifest per version), so
        # readStream over it gives Delta's readStream.format("delta")
        # shape on this format — checkpointed offsets, backlog replay,
        # per-commit micro-batches; foreachBatch seeds then applies
        # net diffs through the idempotent three-clause merge. Same
        # final-state oracle as the batch-cursor twin; exactly-once
        # under checkpoint replay pinned in tests/test_streaming.py
        streaming.stream_cdf_replica,
        versioned.cdf_replica_sync_oracle_sql(),
        ground_truth="tests/test_streaming.py::test_stream_cdf_replica_replay_is_noop",
    ),
    "versioned_cow_roundtrip": QuerySpec(
        versioned.versioned_cow_roundtrip,
        # COW upsert of one day's updates over the day-partitioned v1:
        # current snapshot == full merge; file reuse + pruned reads
        # pinned in tests/test_versioned.py
        """
        WITH base AS (
            SELECT event_id, ts, user_id, event_type, value FROM events
        ), updates AS (
            SELECT event_id, ts, user_id, event_type, value + 1000.0 AS value
            FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-10'
        )
        SELECT * FROM updates
        UNION ALL
        SELECT b.* FROM base b
        WHERE NOT EXISTS (
            SELECT 1 FROM updates u WHERE u.event_id = b.event_id)
        """,
    ),
    "versioned_table_roundtrip": QuerySpec(
        versioned.versioned_table_roundtrip,
        # time travel back to v1 after a later commit must be identity
        # — snapshot isolation IS this assertion; merge semantics and
        # crash-window atomicity pinned in tests/test_versioned.py
        """
        SELECT event_id, ts, user_id, event_type, value FROM events
        """,
    ),
    "deletion_vector_roundtrip": QuerySpec(
        # row-level DELETE via deletion vectors (Delta DV / Iceberg
        # positional-delete analog): two cumulative position-keyed
        # delete commits that rewrite NO data file; the read path
        # anti-joins the (file, row ordinal) sidecar during the scan.
        # Zero-rewrite + time-travel-visibility pinned in
        # tests/test_versioned.py.
        versioned.deletion_vector_roundtrip,
        """
        SELECT event_id, ts, user_id, event_type, value FROM events
        WHERE NOT (event_type = 'error') AND NOT (value < 10.0)
        """,
    ),
    "deletion_vector_maintenance_roundtrip": QuerySpec(
        # the DV maintenance lifecycle: soft-delete -> materialize
        # (REORG APPLY PURGE analog) -> compact (unblocked exactly by
        # the materialize). Snapshot must still equal the anti-filter
        # after three maintenance commits.
        versioned.deletion_vector_maintenance_roundtrip,
        """
        SELECT event_id, ts, user_id, event_type, value FROM events
        WHERE NOT (event_type = 'error')
        """,
    ),
    "stats_skipping_roundtrip": QuerySpec(
        # min/max data-skipping (r10): footer-harvested per-file stats
        # (pure metadata, no Spark job) serve a range probe that reads
        # only interval-overlapping files — the Delta/Iceberg skipping
        # core, complementing the bloom index's equality probes; the
        # few-file read is pinned in tests/test_versioned.py
        versioned.stats_skipping_roundtrip,
        """
        SELECT event_id, ts, user_id, event_type, value FROM events
        WHERE event_id BETWEEN 2500 AND 4999
        """,
        ground_truth="tests/test_versioned.py::test_stats_index_prunes_files_and_serves_ranges",
    ),
    "table_history_roundtrip": QuerySpec(
        # DESCRIBE HISTORY + RESTORE (r13): a four-commit lifecycle
        # (commit -> DV delete -> MOR update -> metadata-only RESTORE
        # to v1) emitting per-version row and DV counts — history
        # listing is pure manifest metadata, the counts re-read every
        # snapshot, so the one entry proves time travel across
        # delete/update/rollback. Restore commits FORWARD (the bad
        # state stays time-travelable); vacuum reference-counting of
        # restored manifests pinned in tests/test_versioned.py
        versioned.table_history_roundtrip,
        """
        WITH s AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS total,
                 CAST(COUNT(*) FILTER (WHERE event_type = 'error')
                      AS BIGINT) AS errs,
                 CAST(COUNT(*) FILTER (WHERE event_type <> 'error'
                                         AND value < 10.0)
                      AS BIGINT) AS low
          FROM events
        )
        SELECT 4 AS version, total AS n_rows,
               CAST(0 AS BIGINT) AS dv_rows FROM s
        UNION ALL SELECT 3, total - errs, errs + low FROM s
        UNION ALL SELECT 2, total - errs, errs FROM s
        UNION ALL SELECT 1, total, CAST(0 AS BIGINT) FROM s
        """,
        ground_truth="tests/test_versioned.py::test_restore_is_forward_and_reference_counted",
    ),
    "update_mor_roundtrip": QuerySpec(
        # merge-on-read UPDATE (r13): one atomic commit extends the
        # deletion vector with matched LIVE rows' positions and
        # appends files holding their updated images — O(matched)
        # cost, zero rewritten files (the Delta DV-update / Iceberg
        # MOR construction). Old images anti-join out through the one
        # shared read path; file reuse, time travel and double-update
        # semantics pinned in tests/test_versioned.py
        versioned.update_mor_roundtrip,
        """
        SELECT event_id, ts, user_id, event_type,
               CASE WHEN event_type = 'error' THEN value + 1000.0
                    ELSE value END AS value
        FROM events
        """,
        ground_truth="tests/test_versioned.py::test_update_mor_appends_without_rewrite",
    ),
    "merge_mor_roundtrip": QuerySpec(
        # three-clause MERGE INTO (r13): conditional matched-UPDATE,
        # matched-DELETE and not-matched-INSERT in ONE merge-on-read
        # commit — one equi-keyed join of the live snapshot against
        # the source (AQE broadcasts a small CDC batch) feeding a DV
        # extension + appended image files; zero rewritten files,
        # Delta clause-order + source-cardinality semantics (clause
        # ordering, ambiguity refusal, file reuse and time travel
        # pinned in tests/test_versioned.py)
        versioned.merge_mor_roundtrip,
        versioned.merge_mor_oracle_sql(),
        ground_truth="tests/test_versioned.py::test_merge_mor_three_clauses",
    ),
    "merge_pruned_roundtrip": QuerySpec(
        # stats-pruned MERGE (r16): same three-clause semantics on a
        # range-clustered table whose source touches only the top
        # quartile of the key range — prune_on='event_id' makes the
        # target scan O(candidate files) via the footer min/max index
        # (files_pruned >= 1 guarded in the entry itself; the oracle
        # is pruning-blind, so a hash match proves pruning never
        # changed the answer). The production continuous-ingest shape:
        # recent keys hot, cold files never scanned.
        versioned.merge_pruned_roundtrip,
        versioned.merge_pruned_oracle_sql(),
        ground_truth="tests/test_versioned.py::test_merge_prune_matches_unpruned_exactly",
    ),
    "merge_cow_roundtrip": QuerySpec(
        # three-clause MERGE, COW granularity (r13): merge_into_mor's
        # semantics on a day-partitioned table — only source-touched
        # days read/merged/rewritten, untouched days' files carried by
        # reference (rewrite ∝ touched slice); same oracle as the MOR
        # twin, different physical shape
        versioned.merge_cow_roundtrip,
        versioned.merge_mor_oracle_sql(),
        ground_truth="tests/test_versioned.py::test_merge_cow_rewrites_only_touched_days",
    ),
    "zorder_skipping_roundtrip": QuerySpec(
        # Z-order clustering maintenance (r13): OPTIMIZE ... ZORDER BY
        # (event_id, value) — quantile-bucket each column, interleave
        # the bucket bits into a Morton z-value (pure JVM shift/or
        # tree), range-partition + sort by it, commit + refresh both
        # stats indexes. A 2-D range probe then intersects the
        # per-column interval candidates and reads only surviving
        # files — multi-column skipping a single-column range layout
        # cannot give (each dimension's strict pruning pinned in
        # tests/test_versioned.py)
        versioned.zorder_skipping_roundtrip,
        """
        SELECT event_id, ts, user_id, event_type, value FROM events
        WHERE event_id BETWEEN 2000 AND 3999
          AND value BETWEEN 20.0 AND 60.0
        """,
        ground_truth="tests/test_versioned.py::test_zorder_prunes_both_dimensions",
    ),
    "zorder_incremental_roundtrip": QuerySpec(
        # incremental OPTIMIZE ZORDER (r13): cluster ONLY the files
        # added since the last z-order over the same columns — O(new
        # data), never O(table), the liquid-clustering shape a
        # per-ingest OPTIMIZE needs at 100 TB; per-file stats keep
        # every layer pruned independently (carried-file byte
        # identity, no-op/fallback paths and DV interplay pinned in
        # tests/test_versioned.py)
        versioned.zorder_incremental_roundtrip,
        versioned.zorder_incremental_oracle_sql(),
        ground_truth="tests/test_versioned.py::test_zorder_incremental_rewrites_only_new_files",
    ),
    "compaction_roundtrip": QuerySpec(
        # OPTIMIZE / small-file compaction (r10): 6-file-per-day debris
        # bin-packed to one file per partition, committed as v2 with a
        # footer row-count publish guard — the snapshot after MUST be
        # row-identical to the table before (file-count shrinkage and
        # carried-file reuse pinned in tests/test_versioned.py)
        versioned.compaction_roundtrip,
        """
        SELECT event_id, ts, user_id, event_type, value FROM events
        """,
        ground_truth="tests/test_versioned.py::test_compaction_binpacks_and_preserves_rows",
    ),
    "scd2_customer_history": QuerySpec(
        upsert.scd2_customer_history,
        """
        WITH c AS (
            SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer
        ), mx AS (
            SELECT MAX(c_custkey) AS m FROM c
        )
        SELECT c_custkey, c_name, c_acctbal, c_mktsegment,
               1 AS version,
               TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
               CASE WHEN c_custkey % 7 = 0 OR c_custkey % 13 = 0
                    THEN TIMESTAMP '2024-06-01 00:00:00' END AS valid_to,
               NOT (c_custkey % 7 = 0 OR c_custkey % 13 = 0) AS is_current
        FROM c
        UNION ALL
        SELECT c_custkey, c_name,
               CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0
                    ELSE c_acctbal END,
               CASE WHEN c_custkey % 13 = 0 THEN 'RESEGMENTED'
                    ELSE c_mktsegment END,
               2, TIMESTAMP '2024-06-01 00:00:00',
               CASE WHEN c_custkey % 7 = 0
                    THEN TIMESTAMP '2024-09-01 00:00:00' END,
               NOT (c_custkey % 7 = 0)
        FROM c WHERE c_custkey % 7 = 0 OR c_custkey % 13 = 0
        UNION ALL
        SELECT c_custkey, c_name, c_acctbal + 200.0,
               CASE WHEN c_custkey % 13 = 0 THEN 'RESEGMENTED'
                    ELSE c_mktsegment END,
               3, TIMESTAMP '2024-09-01 00:00:00', NULL, TRUE
        FROM c WHERE c_custkey % 7 = 0
        UNION ALL
        SELECT m + 1, 'Customer#NEW', 0.0, 'BUILDING',
               1, TIMESTAMP '2024-06-01 00:00:00',
               TIMESTAMP '2024-09-01 00:00:00', FALSE
        FROM mx
        UNION ALL
        SELECT m + 1, 'Customer#NEW', 0.0, 'MACHINERY',
               2, TIMESTAMP '2024-09-01 00:00:00', NULL, TRUE
        FROM mx
        """,
    ),
    "pit_join_orders": QuerySpec(
        upsert.pit_join_orders,
        # dim CTE = scd2_customer_history's oracle verbatim; probes
        # pick their era from o_orderkey % 3, then the point-in-time
        # interval match (disjoint per key -> exactly one row/probe).
        """
        WITH c AS (
            SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer
        ), mx AS (
            SELECT MAX(c_custkey) AS m FROM c
        ), dim AS (
            SELECT c_custkey, c_acctbal, c_mktsegment,
                   1 AS version,
                   TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
                   CASE WHEN c_custkey % 7 = 0 OR c_custkey % 13 = 0
                        THEN TIMESTAMP '2024-06-01 00:00:00' END AS valid_to
            FROM c
            UNION ALL
            SELECT c_custkey,
                   CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0
                        ELSE c_acctbal END,
                   CASE WHEN c_custkey % 13 = 0 THEN 'RESEGMENTED'
                        ELSE c_mktsegment END,
                   2, TIMESTAMP '2024-06-01 00:00:00',
                   CASE WHEN c_custkey % 7 = 0
                        THEN TIMESTAMP '2024-09-01 00:00:00' END
            FROM c WHERE c_custkey % 7 = 0 OR c_custkey % 13 = 0
            UNION ALL
            SELECT c_custkey, c_acctbal + 200.0,
                   CASE WHEN c_custkey % 13 = 0 THEN 'RESEGMENTED'
                        ELSE c_mktsegment END,
                   3, TIMESTAMP '2024-09-01 00:00:00', NULL
            FROM c WHERE c_custkey % 7 = 0
            UNION ALL
            SELECT m + 1, 0.0, 'BUILDING',
                   1, TIMESTAMP '2024-06-01 00:00:00',
                   TIMESTAMP '2024-09-01 00:00:00'
            FROM mx
            UNION ALL
            SELECT m + 1, 0.0, 'MACHINERY',
                   2, TIMESTAMP '2024-09-01 00:00:00', NULL
            FROM mx
        ), probes AS (
            SELECT o_orderkey, o_custkey,
                   CASE o_orderkey % 3
                        WHEN 0 THEN TIMESTAMP '2024-01-01 00:00:00'
                        WHEN 1 THEN TIMESTAMP '2024-06-01 00:00:00'
                        ELSE TIMESTAMP '2024-09-01 00:00:00' END AS probe_ts
            FROM orders
        )
        SELECT o_orderkey, o_custkey, probe_ts,
               version, c_acctbal, c_mktsegment
        FROM probes p JOIN dim d ON p.o_custkey = d.c_custkey
         AND d.valid_from <= p.probe_ts
         AND (d.valid_to IS NULL OR p.probe_ts < d.valid_to)
        """,
    ),
    "debounce_events": QuerySpec(
        queries.debounce_events,
        # gap on WHOLE seconds (FLOOR(EPOCH) = Spark's ts CAST AS LONG
        # truncation for positive epochs) so the contract is
        # engine-exact by construction, not coincidental to the feed's
        # minute-scale cadence: a 59.4 s gap straddling a second
        # boundary must debounce identically in both engines.
        """
        SELECT event_id, ts, user_id, event_type, value FROM (
            SELECT *, CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                      - LAG(CAST(FLOOR(EPOCH(ts)) AS BIGINT)) OVER (
                PARTITION BY user_id, event_type
                ORDER BY ts, event_id) AS gap
            FROM events
        ) WHERE gap IS NULL OR gap >= 60
        """,
    ),
    "cdc_apply_events": QuerySpec(
        upsert.cdc_apply_events,
        # replay the same deterministic CDC feed in SQL: updates win,
        # deletes vanish, inserts append, untouched rows carry over
        """
        WITH ev AS (
            SELECT event_id, ts, user_id, event_type, value FROM events
        )
        SELECT event_id, ts, user_id, event_type, value + 1000.0 AS value
        FROM ev WHERE event_id % 10 = 0 AND event_id % 17 <> 0
        UNION ALL
        SELECT event_id + 10000000, ts, user_id, 'replay', value
        FROM ev WHERE event_id % 23 = 0
        UNION ALL
        SELECT * FROM ev
        WHERE event_id % 10 <> 0 AND event_id % 17 <> 0
        """,
    ),
    "upsert_table_roundtrip": QuerySpec(
        upsert.upsert_table_roundtrip,
        # same semantics (and oracle) as upsert_merge, but through real
        # day-partitioned parquet files with partition-overwrite
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
    "batch_envelope_explode": QuerySpec(
        ingest.batch_envelope_explode,
        """
        SELECT 'batch_' || CAST(event_id // 100 AS VARCHAR) AS batch_id,
               event_id, ts, user_id, event_type, value
        FROM events
        """,
    ),
    # ---- star-schema analytics (north-star joins, SURVEY.md §7.8) ----
    "q1_pricing_summary": QuerySpec(
        analytics.q1_pricing_summary,
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
               CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """,
    ),
    "revenue_by_nation": QuerySpec(
        analytics.revenue_by_nation,
        """
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
        """,
    ),
    "shipping_priority_top10": QuerySpec(
        analytics.shipping_priority_top10,
        """
        SELECT l_orderkey, o_orderdate,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
        """,
    ),
    "top_customers": QuerySpec(
        analytics.top_customers,
        """
        WITH per_order AS (
            SELECT l_orderkey,
                   CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS order_rev
            FROM lineitem GROUP BY l_orderkey
        ), per_cust AS (
            SELECT o_custkey,
                   CAST(SUM(CAST(order_rev AS DECIMAL(38,6))) AS DOUBLE) AS revenue
            FROM per_order JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_custkey
        )
        SELECT c_custkey, c_name, revenue
        FROM per_cust JOIN customer ON o_custkey = c_custkey
        ORDER BY revenue DESC, c_custkey
        LIMIT 10
        """,
    ),
    "revenue_by_part_type": QuerySpec(
        analytics.revenue_by_part_type,
        """
        SELECT p_type,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS line_count
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_type ORDER BY p_type
        """,
    ),
    "supplier_revenue": QuerySpec(
        analytics.supplier_revenue,
        """
        SELECT s_suppkey, s_name, n_name,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY s_suppkey, s_name, n_name
        ORDER BY s_suppkey
        """,
    ),
    "top_orders_per_customer": QuerySpec(
        analytics.top_orders_per_customer,
        """
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rank
        FROM orders
        QUALIFY rank <= 3
        """,
    ),
    "rollup_pricing": QuerySpec(
        analytics.rollup_pricing,
        """
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS count_order
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
    ),
    "grouped_agg_salted": QuerySpec(
        skew.grouped_agg_salted,
        # identical oracle to grouped_agg_all_stations: the salted
        # two-phase plan must be bit-identical to the direct aggregate
        f"""
        SELECT user_id,
               {_DEC_AVG_VALUE} AS avg_value,
               MIN(value) AS min_value,
               MAX(value) AS max_value,
               COUNT(*) AS reading_count
        FROM events GROUP BY user_id
        """,
    ),
    "events_customer_join_salted": QuerySpec(
        skew.events_customer_join_salted,
        # identical oracle to the plain equi-join: the salted
        # replicate-join must not change a row
        """
        SELECT e.event_id, e.ts, e.user_id, e.value, c.c_name, c.c_nationkey
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        """,
    ),
    "big_order_customers": QuerySpec(
        analytics.big_order_customers,
        """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        """,
    ),
    "orders_without_lineitem": QuerySpec(
        analytics.orders_without_lineitem,
        """
        SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
        FROM orders
        WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        """,
    ),
    "power_users_intersect": QuerySpec(
        analytics.power_users_intersect,
        """
        SELECT DISTINCT user_id FROM events
        WHERE event_type = 'click' AND value > 150
        INTERSECT
        SELECT DISTINCT user_id FROM events
        WHERE event_type = 'purchase' AND value > 150
        """,
    ),
    "cube_pricing": QuerySpec(
        analytics.cube_pricing,
        """
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS count_order
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        """,
    ),
    "grouping_sets_pricing": QuerySpec(
        analytics.grouping_sets_pricing,
        """
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS count_order
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """,
    ),
    "props_json_extract": QuerySpec(
        analytics.props_json_extract,
        """
        SELECT event_type,
               COUNT(*) AS event_count,
               CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
               MIN(CAST(props->>'k' AS BIGINT)) AS min_k,
               MAX(CAST(props->>'k' AS BIGINT)) AS max_k
        FROM events GROUP BY event_type
        """,
    ),
    "station_trend_slope": QuerySpec(
        analytics.station_trend_slope,
        """
        WITH s AS (
            SELECT user_id,
                   COUNT(*) AS n,
                   SUM((epoch_us(ts) // 1000000) - 1705276800) AS sx,
                   CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sy,
                   CAST(SUM(CAST(((epoch_us(ts) // 1000000) - 1705276800) * value
                        AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
                   SUM(((epoch_us(ts) // 1000000) - 1705276800)
                       * ((epoch_us(ts) // 1000000) - 1705276800)) AS sxx
            FROM events GROUP BY user_id
        )
        SELECT user_id,
               (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
               n AS reading_count
        FROM s
        """,
    ),
    "event_type_cardinality": QuerySpec(
        analytics.event_type_cardinality,
        """
        SELECT event_type,
               COUNT(DISTINCT user_id) AS distinct_users,
               COUNT(*) AS event_count
        FROM events GROUP BY event_type
        """,
    ),
    "hll_user_rollup": QuerySpec(
        # quantitative oracle form: exact counts + within-bound verdict
        # per day and for the sketch-union total (raw estimates stay in
        # analytics.hll_user_rollup, ground-truthed by the same pytest)
        analytics.hll_rollup_within_bound,
        """
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
               COUNT(DISTINCT user_id) AS exact_users,
               TRUE AS within_bound
        FROM events GROUP BY 1
        UNION ALL
        SELECT NULL, COUNT(DISTINCT user_id), TRUE FROM events
        """,
        ground_truth="tests/test_analytics.py::test_hll_rollup_error_and_merge",
    ),
    "bucketed_join_roundtrip": QuerySpec(
        analytics.bucketed_join_roundtrip,
        """
        SELECT o_orderkey, o_custkey,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2
        """,
    ),
    "histogram_quantile_rollup": QuerySpec(
        analytics.histogram_quantile_rollup,
        # every estimate step is deterministic integer/IEEE math —
        # the oracle REPRODUCES the sketch (not just bounds it), and
        # the p*_ok verdicts audit it against the exact rank-r order
        # statistics (raw data values — engine-identical).
        """
        WITH ev AS (SELECT event_type, value FROM events),
        tot AS (SELECT event_type, COUNT(*) AS n FROM ev GROUP BY 1),
        h AS (
            SELECT event_type, CAST(FLOOR(value / 1.0) AS BIGINT) AS bin,
                   COUNT(*) AS c
            FROM ev GROUP BY 1, 2
        ),
        cum AS (
            SELECT event_type, bin,
                   SUM(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum
            FROM h
        ),
        est AS (
            SELECT c.event_type,
                   MIN(CASE WHEN cum >= CEIL(0.5 * n) THEN bin END) AS bin50,
                   MIN(CASE WHEN cum >= CEIL(0.95 * n) THEN bin END) AS bin95
            FROM cum c JOIN tot t USING (event_type) GROUP BY 1
        ),
        rk AS (
            SELECT event_type, value,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type ORDER BY value) AS rn
            FROM ev
        ),
        x AS (
            SELECT r.event_type,
                   MAX(CASE WHEN rn = CEIL(0.5 * n) THEN value END) AS p50_disc,
                   MAX(CASE WHEN rn = CEIL(0.95 * n) THEN value END) AS p95_disc
            FROM rk r JOIN tot t USING (event_type) GROUP BY 1
        )
        SELECT t.event_type, CAST(n AS BIGINT) AS n,
               p50_disc, bin50 * 1.0 + 0.5 AS p50_est,
               ABS(bin50 * 1.0 + 0.5 - p50_disc) <= 0.5 AS p50_ok,
               p95_disc, bin95 * 1.0 + 0.5 AS p95_est,
               ABS(bin95 * 1.0 + 0.5 - p95_disc) <= 0.5 AS p95_ok
        FROM tot t JOIN est USING (event_type) JOIN x USING (event_type)
        """,
    ),
    "events_expectations": QuerySpec(
        expectations.events_expectations,
        """
        WITH agg AS (
            SELECT COUNT(*) AS total,
                   COALESCE(SUM(CASE WHEN event_id IS NULL
                        THEN 1 ELSE 0 END), 0) AS v0,
                   COALESCE(SUM(CASE WHEN NOT COALESCE(
                        ts BETWEEN TIMESTAMP '2024-01-01 00:00:00'
                               AND TIMESTAMP '2024-12-31 23:59:59', FALSE)
                        THEN 1 ELSE 0 END), 0) AS v1,
                   COALESCE(SUM(CASE WHEN NOT COALESCE(event_type IN
                        ('click', 'view', 'purchase', 'signup', 'error'),
                        FALSE) THEN 1 ELSE 0 END), 0) AS v2,
                   COALESCE(SUM(CASE WHEN value IS NULL
                        THEN 1 ELSE 0 END), 0) AS v3,
                   COUNT(event_id) - COUNT(DISTINCT event_id) AS u0
            FROM events
        )
        SELECT rule, CAST(violations AS BIGINT) AS violations,
               CAST(total AS BIGINT) AS total, violations = 0 AS passed
        FROM agg, LATERAL (VALUES
            ('event_id_not_null', v0), ('ts_within_2024', v1),
            ('event_type_known', v2), ('value_not_null', v3),
            ('event_id_unique', u0)) t(rule, violations)
        """,
    ),
    "event_transition_counts": QuerySpec(
        analytics.event_transition_counts,
        """
        WITH pairs AS (
            SELECT event_type AS from_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS to_type
            FROM events
        ), counts AS (
            SELECT from_type, to_type, COUNT(*) AS n
            FROM pairs WHERE to_type IS NOT NULL GROUP BY 1, 2
        )
        SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
               CAST(n AS DOUBLE)
                   / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
        FROM counts
        """,
    ),
    "funnel_conversion": QuerySpec(
        analytics.funnel_conversion,
        """
        WITH per_user AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t1
            FROM events GROUP BY user_id
        ), s2 AS (
            SELECT e.user_id, p.t1, MIN(e.ts) AS t2
            FROM events e JOIN per_user p USING (user_id)
            WHERE e.event_type = 'click' AND e.ts > p.t1
            GROUP BY e.user_id, p.t1
        ), s3 AS (
            SELECT e.user_id, MIN(e.ts) AS t3
            FROM events e JOIN s2 USING (user_id)
            WHERE e.event_type = 'purchase' AND e.ts > s2.t2
            GROUP BY e.user_id
        )
        SELECT '1_signup' AS stage, COUNT(*) AS users
        FROM per_user WHERE t1 IS NOT NULL
        UNION ALL
        SELECT '2_click_after_signup', COUNT(*) FROM s2
        UNION ALL
        SELECT '3_purchase_after_click', COUNT(*) FROM s3
        """,
    ),
    "retention_cohorts": QuerySpec(
        analytics.retention_cohorts,
        # week_offset is exact (both weeks are Monday-truncated, so
        # the division is integer-valued — no rounding-mode hazard)
        """
        WITH first_wk AS (
            -- DuckDB date_trunc('week') yields DATE; Spark yields
            -- TIMESTAMP — align the types at the source
            SELECT user_id,
                   CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
            FROM events GROUP BY user_id
        ), active AS (
            SELECT DISTINCT user_id,
                   CAST(date_trunc('week', ts) AS TIMESTAMP) AS activity_week
            FROM events
        ), sizes AS (
            SELECT cohort_week, COUNT(*) AS cohort_users
            FROM first_wk GROUP BY 1
        ), grid AS (
            SELECT f.cohort_week, a.activity_week, COUNT(*) AS retained
            FROM active a JOIN first_wk f USING (user_id)
            GROUP BY 1, 2
        )
        SELECT g.cohort_week, g.activity_week,
               CAST(date_diff('second', g.cohort_week, g.activity_week)
                    / 604800 AS INTEGER) AS week_offset,
               CAST(g.retained AS BIGINT) AS retained,
               CAST(s.cohort_users AS BIGINT) AS cohort_users,
               CAST(g.retained AS DOUBLE) / CAST(s.cohort_users AS DOUBLE)
                   AS retention_rate
        FROM grid g JOIN sizes s USING (cohort_week)
        """,
    ),
    "event_type_cardinality_approx": QuerySpec(
        # quantitative oracle form (hll_user_rollup pattern): exact
        # per-type distincts + within-bound verdict on the HLL++
        # estimate; raw estimates stay in event_type_cardinality_approx
        analytics.event_type_cardinality_within_bound,
        """
        SELECT event_type,
               COUNT(DISTINCT user_id) AS exact_distinct_users,
               TRUE AS within_bound
        FROM events GROUP BY 1
        """,
        ground_truth="tests/test_analytics.py::test_approx_distinct_within_rsd",
        bench_fn=analytics.event_type_cardinality_approx,
    ),
    # ---- text analysis (north-star LLM-pipeline ops) ----
    "doc_stats": QuerySpec(
        text.doc_stats,
        """
        SELECT doc_id, lang,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS token_count,
               CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
                 / CAST(len(string_split(text, ' ')) AS DOUBLE) AS avg_token_len,
               CAST(len(list_filter(string_split(text, ' '),
                        t -> t IN ('the','a','and','of','to','in','is'))) AS DOUBLE)
                 / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio
        FROM documents
        """,
    ),
    "doc_quality": QuerySpec(
        text.doc_quality,
        """
        WITH stats AS (
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS token_count,
                   CAST(len(list_filter(string_split(text, ' '),
                            t -> t IN ('the','a','and','of','to','in','is'))) AS DOUBLE)
                     / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio
            FROM documents
        )
        SELECT doc_id, token_count, stopword_ratio FROM stats
        WHERE token_count BETWEEN 20 AND 1000 AND stopword_ratio >= 0.01
        """,
    ),
    "lang_id": QuerySpec(
        text.lang_id,
        """
        SELECT doc_id, lang,
               CASE WHEN CAST(len(list_filter(string_split(text, ' '),
                              t -> t IN ('the','a','and','of','to','in','is'))) AS DOUBLE)
                         / CAST(len(string_split(text, ' ')) AS DOUBLE) >= 0.03
                    THEN 'en' ELSE 'other' END AS predicted_lang
        FROM documents
        """,
    ),
    "doc_fingerprint": QuerySpec(
        text.doc_fingerprint,
        """
        SELECT doc_id,
               sha256(regexp_replace(lower(text), ' +', ' ', 'g')) AS fingerprint,
               CAST(length(text) AS BIGINT) AS n_chars_actual,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS token_count
        FROM documents
        """,
    ),
    "token_counts": QuerySpec(
        text.token_counts,
        """
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
               CAST(len(regexp_extract_all(text,
                    '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]')) AS BIGINT) AS bpeish_tokens
        FROM documents
        """,
    ),
    "doc_rolling_hash": QuerySpec(
        text.doc_rolling_hash,
        # full-fingerprint oracle: the md5-leaf variant's fold is
        # engine-portable, so DuckDB reproduces every hash bit-for-bit
        # (the xxhash64-leaf production variant shares the fold and is
        # pinned by the same pytest)
        f"""
        SELECT doc_id,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(string_split(text, ' '),
                           tok -> CAST(concat('0x', substr(md5(tok), 1, 8))
                                       AS BIGINT) % {text.ROLLING_M})),
                   (acc, x) -> (acc * {text.ROLLING_B} + x) % {text.ROLLING_M}
               ) AS rolling_hash
        FROM documents
        """,
        ground_truth="tests/test_dedup.py::test_rolling_hash_order_sensitive_and_deterministic",
    ),
    "docs_exact_dedup": QuerySpec(
        text.docs_exact_dedup,
        """
        SELECT doc_id, lang, source, n_chars
        FROM documents
        QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
        """,
    ),
    "docs_incremental_dedup": QuerySpec(
        text.docs_incremental_dedup,
        """
        WITH fresh AS (
            SELECT * FROM documents WHERE doc_id % 10 <> 0
        ), batch_unique AS (
            SELECT * FROM fresh
            QUALIFY row_number() OVER (
                PARTITION BY md5(text) ORDER BY doc_id) = 1
        )
        SELECT doc_id, lang, source, n_chars FROM batch_unique b
        WHERE NOT EXISTS (
            SELECT 1 FROM documents i
            WHERE i.doc_id % 10 = 0 AND md5(i.text) = md5(b.text))
        """,
    ),
    # ---- near-duplicate detection ----
    "ngram_jaccard_pairs": QuerySpec(
        dedup.ngram_jaccard_pairs,
        _NGRAM_JACCARD_SQL,
    ),
    "jaccard_prefix_join": QuerySpec(
        dedup.jaccard_prefix_join,
        # SAME oracle as ngram_jaccard_pairs by design: the prefix-
        # filtered equi-join must reproduce the quadratic ground truth
        # bit-for-bit (the oracle itself is all-pairs — fine at the
        # driver's sf0.01, deselect from any sf0.1 parity sweep).
        _NGRAM_JACCARD_SQL,
    ),
    "minhash_lsh_candidates": QuerySpec(
        # quantitative recall-audit form: exact Jaccard pairs + found
        # verdicts + aggregate recall row (dedup.minhash_lsh_recall_audit);
        # raw candidate pairs stay in dedup.minhash_lsh_candidates
        dedup.minhash_lsh_recall_audit,
        f"""
        WITH ex AS ({_NGRAM_JACCARD_SQL})
        SELECT 'pair' AS kind, doc_a, doc_b, jaccard,
               CAST(NULL AS BIGINT) AS n, TRUE AS ok
        FROM ex
        UNION ALL
        SELECT 'recall', NULL, NULL, NULL,
               CAST(COUNT(*) AS BIGINT), TRUE
        FROM ex
        """,
        ground_truth="tests/test_dedup.py::test_minhash_lsh_vs_exact",
        bench_fn=dedup.minhash_lsh_candidates,
    ),
    "minhash_incremental_probe": QuerySpec(
        # persisted band index + O(batch) probe (r15): the standing
        # corpus (doc_id % 3 != 0) is indexed once as a versioned
        # band-clustered table; the crawl batch (% 3 == 0) is
        # shingled/hashed once and probed via one (band, bucket)
        # equi-join — indexed texts never re-shingled, appends carry
        # prior index files by reference. Graded as a recall audit
        # against exact Jaccard restricted to batch-involving pairs
        # (the minhash_lsh_candidates evidence pattern); probe ≡
        # batch-LSH on the same pairs is pinned in tests.
        dedup.minhash_incremental_audit,
        f"""
        WITH ex AS ({_NGRAM_JACCARD_SQL}),
        fx AS (
            SELECT * FROM ex
            WHERE doc_a % 3 = 0 OR doc_b % 3 = 0
        )
        SELECT 'pair' AS kind, doc_a, doc_b, jaccard,
               CAST(NULL AS BIGINT) AS n, TRUE AS ok
        FROM fx
        UNION ALL
        SELECT 'recall', NULL, NULL, NULL,
               CAST(COUNT(*) AS BIGINT), TRUE
        FROM fx
        """,
        ground_truth="tests/test_dedup.py::test_minhash_index_probe_matches_batch_lsh",
        bench_fn=dedup.minhash_incremental_candidates,
    ),
    "simhash_buckets": QuerySpec(
        # md5-leaf twin for grading; bench times the xxhash64
        # production path (r9 VERDICT §wrong 4: md5-per-token is a
        # real constant-factor tax at 100 TB — same split _gram_hashes
        # makes for MinHash grams)
        dedup.simhash_buckets_md5,
        # FULL hash-match oracle: the md5-leaf fingerprints are
        # engine-portable, so DuckDB recomputes simhash + all four
        # bands bit-for-bit (_SIMHASH_FP_SQL)
        f"""
        {_SIMHASH_FP_SQL}
        """,
        ground_truth="tests/test_dedup.py::test_simhash_buckets_structure",
        bench_fn=dedup.simhash_buckets,
    ),
    "simhash_candidates": QuerySpec(
        dedup.simhash_candidates_md5,
        # FULL exact oracle: band-bucket LSH at Hamming ≤ 3 has
        # perfect recall by pigeonhole, so the result set EQUALS all
        # pairs at Hamming ≤ 3 — reproduced by a quadratic
        # bit_count(xor) join over the recomputed fingerprints (fine
        # at the driver's 500-doc sf0.01)
        f"""
        WITH fp AS ({_SIMHASH_FP_SQL})
        SELECT doc_a, doc_b, hamming FROM (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(bit_count(xor(a.band0, b.band0))
                      + bit_count(xor(a.band1, b.band1))
                      + bit_count(xor(a.band2, b.band2))
                      + bit_count(xor(a.band3, b.band3)) AS INTEGER) AS hamming
            FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        ) WHERE hamming <= 3
        """,
        ground_truth="tests/test_dedup.py::test_simhash_candidates_find_near_identicals",
        bench_fn=dedup.simhash_candidates,
    ),
    "station_outliers": QuerySpec(
        analytics.station_outliers,
        """
        WITH s AS (
            SELECT user_id, COUNT(*) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sy,
                   CAST(SUM(CAST(value * value AS DECIMAL(38,6))) AS DOUBLE) AS s2
            FROM events GROUP BY user_id
        )
        SELECT event_id, e.user_id, ts, value,
               (value - sy / n) / sqrt(s2 / n - (sy / n) * (sy / n)) AS zscore
        FROM events e JOIN s ON e.user_id = s.user_id
        WHERE value > sy / n + 3.0 * sqrt(s2 / n - (sy / n) * (sy / n))
        """,
    ),
    "embedding_near_dup_pairs": QuerySpec(
        similarity.embedding_near_dup_pairs,
        """
        WITH e AS (
            SELECT vec_id, unnest(embedding) AS x,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings
        ), norms AS (
            SELECT vec_id,
                   SQRT(CAST(SUM(CAST(floor(
                       (CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) * 1e12
                   ) AS BIGINT)) AS DOUBLE) / 1e12) AS nrm
            FROM e GROUP BY vec_id
        ), dots AS (
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   CAST(SUM(CAST(floor(
                       (CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE)) * 1e12
                   ) AS BIGINT)) AS DOUBLE) / 1e12 AS dot
            FROM e a JOIN e b ON a.i = b.i AND a.vec_id < b.vec_id
            GROUP BY 1, 2
        )
        SELECT vec_a, vec_b, dot / (na.nrm * nb.nrm) AS cosine
        FROM dots
        JOIN norms na ON na.vec_id = vec_a
        JOIN norms nb ON nb.vec_id = vec_b
        WHERE dot / (na.nrm * nb.nrm) >= 0.45
        """,
    ),
    "embedding_near_dup_lsh": QuerySpec(
        # recall-audit form: exact ≥-threshold cosine pairs + found
        # verdicts + aggregate recall row; raw banded pairs stay in
        # similarity.embedding_near_dup_lsh
        similarity.embedding_near_dup_recall_audit,
        f"""
        WITH ep AS ({_EMB_PAIRS_SQL})
        SELECT 'pair' AS kind, vec_a, vec_b, cosine,
               CAST(NULL AS BIGINT) AS n, TRUE AS ok
        FROM ep
        UNION ALL
        SELECT 'recall', NULL, NULL, NULL,
               CAST(COUNT(*) AS BIGINT), TRUE
        FROM ep
        """,
        ground_truth="tests/test_similarity.py::test_embedding_near_dup_lsh_recall_and_pruning",
        bench_fn=similarity.embedding_near_dup_lsh,
    ),
    "embedding_index_probe": QuerySpec(
        # persisted embedding-LSH band index + O(batch) incremental
        # probe (r16, VERDICT r15 task 4): the standing corpus
        # (vec_id % 3 != 0) is band-keyed + signed ONCE into two
        # versioned tables (band rows clustered by table id; vectors
        # + sigs clustered by id bucket); the crawl batch (% 3 == 0)
        # is hashed once and probed via one (band_table, band_key)
        # equi-join, with an O(candidates) vector fetch for the
        # Hamming + exact-cosine verify — the indexed corpus is never
        # re-hashed, appends carry prior files by reference. Graded
        # as a recall audit against exact cosine restricted to
        # batch-involving pairs (the minhash_incremental_probe
        # evidence pattern); probe ≡ batch-LSH on the same pairs is
        # pinned in tests.
        similarity.embedding_index_recall_audit,
        f"""
        WITH ep AS ({_EMB_PAIRS_SQL}),
        fx AS (
            SELECT * FROM ep
            WHERE vec_a % 3 = 0 OR vec_b % 3 = 0
        )
        SELECT 'pair' AS kind, vec_a, vec_b, cosine,
               CAST(NULL AS BIGINT) AS n, TRUE AS ok
        FROM fx
        UNION ALL
        SELECT 'recall', NULL, NULL, NULL,
               CAST(COUNT(*) AS BIGINT), TRUE
        FROM fx
        """,
        ground_truth="tests/test_similarity.py::test_embedding_index_probe_matches_batch_lsh",
        bench_fn=similarity.embedding_index_incremental_pairs,
    ),
    "semantic_dedup": QuerySpec(
        # audit form: per-vector SQL-reproducible ground truth
        # (has_true_dup from the exact pair SQL) + precision verdict
        # (dropped ⇒ true dup, exact by construction) + aggregate
        # recall row; raw keep/drop decisions stay in
        # similarity.semantic_dedup
        similarity.semantic_dedup_audit,
        f"""
        WITH ep AS ({_EMB_PAIRS_SQL}),
        td AS (SELECT DISTINCT vec_b AS vec_id FROM ep)
        SELECT 'vec' AS kind, v.vec_id,
               (t.vec_id IS NOT NULL) AS has_true_dup,
               CAST(NULL AS BIGINT) AS n, TRUE AS ok
        FROM embeddings v LEFT JOIN td t USING (vec_id)
        UNION ALL
        SELECT 'recall', NULL, NULL, CAST(COUNT(*) AS BIGINT), TRUE
        FROM td
        """,
        ground_truth="tests/test_similarity.py::test_semantic_dedup_verdicts_and_determinism",
        bench_fn=similarity.semantic_dedup,
    ),
    # ---- multimodal binary columns (north-star scope) ----
    "binary_file_ingest": QuerySpec(
        # raw-file-tree ingestion through Spark's binaryFile source:
        # the fixture materializes doc_id < 64 as .bin files; the scan
        # is the production distributed file-read shape. Hash rides on
        # hex(content) so both engines agree byte-for-byte.
        multimodal.binary_file_ingest,
        f"""
        SELECT printf('doc_%05d.bin', doc_id) AS file_name,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               sha256(hex(encode(text))) AS content_sha256
        FROM documents WHERE doc_id < {multimodal.BINARY_FILE_DOCS}
        """,
    ),
    "binary_metadata": QuerySpec(
        multimodal.binary_metadata,
        # DuckDB sha256(VARCHAR) hashes the string's UTF-8 bytes — the
        # same bytes Spark's encode(text,'UTF-8') payload holds
        """
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               sha256(text) AS content_sha256,
               'unknown' AS sniffed_format
        FROM documents
        """,
    ),
    # The mapInPandas histogram IS SQL-oracle-checkable once exploded
    # flat: DuckDB recomputes the upper-nibble counts from the hex
    # encoding of the same UTF-8 payload. Bit-exact (integer counts,
    # one IEEE double division on both sides).
    "video_frame_sample": QuerySpec(
        multimodal.video_frame_sample,
        # char-sliced twin of the byte slicing — exact because the
        # stand-in payload is UTF-8 of pure-ASCII text (see operator
        # docstring); DuckDB sha256(VARCHAR) hashes the same bytes
        f"""
        WITH f AS (
            SELECT doc_id, text,
                   unnest(range(0,
                       CAST(ceil(length(text)
                           / {float(multimodal.FRAME_BYTES)}) AS INT),
                       {multimodal.FRAME_SAMPLE_EVERY})) AS frame_idx
            FROM documents
        )
        SELECT doc_id,
               CAST(frame_idx AS INTEGER) AS frame_idx,
               CAST(frame_idx * {multimodal.FRAME_BYTES} AS BIGINT)
                   AS frame_offset,
               CAST(length(substring(text,
                    frame_idx * {multimodal.FRAME_BYTES} + 1,
                    {multimodal.FRAME_BYTES})) AS INTEGER) AS frame_bytes,
               sha256(substring(text,
                    frame_idx * {multimodal.FRAME_BYTES} + 1,
                    {multimodal.FRAME_BYTES})) AS frame_sha256
        FROM f
        """,
    ),
    "binary_byte_histogram": QuerySpec(
        multimodal.binary_byte_histogram,
        """
        WITH b AS (
            SELECT doc_id, hex(encode(text)) AS h,
                   GREATEST(octet_length(encode(text)), 1) AS n
            FROM documents
        ), pos AS (
            SELECT doc_id, h,
                   unnest(range(1, length(h) + 1, 2)) AS i
            FROM b
        ), cnt AS (
            SELECT doc_id,
                   strpos('0123456789ABCDEF',
                          substr(h, CAST(i AS INTEGER), 1)) - 1 AS bin,
                   COUNT(*) AS c
            FROM pos GROUP BY 1, 2
        ), grid AS (
            SELECT doc_id, n, unnest(range(0, 16)) AS bin FROM b
        )
        SELECT g.doc_id, CAST(g.bin AS INTEGER) AS bin,
               CAST(COALESCE(c.c, 0) AS DOUBLE) / g.n AS frac
        FROM grid g
        LEFT JOIN cnt c ON c.doc_id = g.doc_id AND c.bin = g.bin
        """,
        ground_truth="tests/test_multimodal.py::test_byte_histogram_matches_numpy",
    ),
    # ---- similarity search over embeddings ----
    "cosine_topk": QuerySpec(
        similarity.cosine_topk,
        _COSINE_TOPK_SQL,
    ),
    "hard_negative_mining": QuerySpec(
        similarity.hard_negative_mining,
        # cosine_topk's oracle with the cross-label predicate
        """
        WITH e AS (
            SELECT vec_id, label, unnest(embedding) AS x,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings
        ), norms AS (
            SELECT vec_id,
                   SQRT(CAST(SUM(CAST(floor(
                       (CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) * 1e12
                   ) AS BIGINT)) AS DOUBLE) / 1e12) AS nrm
            FROM e GROUP BY vec_id
        ), dots AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ANY_VALUE(c.label) AS c_label,
                   CAST(SUM(CAST(floor(
                       (CAST(q.x AS DOUBLE) * CAST(c.x AS DOUBLE)) * 1e12
                   ) AS BIGINT)) AS DOUBLE) / 1e12 AS dot
            FROM e q JOIN e c ON q.i = c.i
            WHERE q.vec_id < 10 AND c.vec_id >= 10 AND q.label <> c.label
            GROUP BY 1, 2
        )
        SELECT query_id, neighbor_id, c_label,
               dot / (nq.nrm * nc.nrm) AS cosine,
               CAST(row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY dot / (nq.nrm * nc.nrm) DESC, neighbor_id) AS INTEGER) AS rank
        FROM dots
        JOIN norms nq ON nq.vec_id = query_id
        JOIN norms nc ON nc.vec_id = neighbor_id
        QUALIFY rank <= 5
        """,
    ),
    "embedding_quantize_int8": QuerySpec(
        # long (exploded) form: every quantized element individually
        # value-hashed — the quantizer itself is contract-checked, not
        # just its downstream recall (that floor is pytest-pinned)
        similarity.embedding_quantize_int8_long,
        """
        WITH m AS (
            SELECT vec_id,
                   list_max(list_transform(
                       embedding, x -> ABS(CAST(x AS DOUBLE)))) AS max_abs,
                   unnest(embedding) AS x,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings
        )
        SELECT vec_id, max_abs, i,
               CASE WHEN max_abs = 0 THEN 0
               ELSE CAST(floor(
                   CAST(x AS DOUBLE) / max_abs * 127.0) AS INT)
               END AS q
        FROM m
        """,
    ),
    # approximate by construction → quantitative recall-audit form:
    # each entry grades its ANN result against the exact fixed-point
    # cosine top-k and emits only engine-identical columns + verdicts
    # (similarity._ann_recall_audit); raw top-k stays in ann_*_topk
    "ann_hamming_topk": QuerySpec(
        similarity.ann_hamming_recall_audit,
        _ANN_AUDIT_SQL,
        ground_truth="tests/test_similarity.py::test_ann_hamming_recall",
        bench_fn=similarity.ann_hamming_topk,
    ),
    "ann_ivf_topk": QuerySpec(
        similarity.ann_ivf_recall_audit,
        _ANN_AUDIT_SQL,
        ground_truth="tests/test_similarity.py::test_ann_ivf_recall",
        bench_fn=similarity.ann_ivf_topk,
    ),
    "ann_pq_topk": QuerySpec(
        similarity.ann_pq_recall_audit,
        _ANN_AUDIT_SQL,
        ground_truth="tests/test_similarity.py::test_ann_pq_recall",
        bench_fn=similarity.ann_pq_topk,
    ),
    "ann_ivfpq_topk": QuerySpec(
        similarity.ann_ivfpq_recall_audit,
        _ANN_AUDIT_SQL,
        ground_truth="tests/test_similarity.py::test_ann_ivfpq_recall",
        bench_fn=similarity.ann_ivfpq_topk,
    ),
    "ann_ivfpq_index_roundtrip": QuerySpec(
        # persisted-index lifecycle: build once into a cell-partitioned
        # manifest-versioned table (model in manifest meta), serve the
        # query batch via metadata-pruned cell reads with NO training
        # scan, grade recall vs exact cosine top-k (same audit oracle)
        similarity.ann_ivfpq_index_roundtrip,
        _ANN_AUDIT_SQL,
        ground_truth="tests/test_similarity.py::test_ivfpq_index_persists_and_prunes",
        bench_fn=similarity.ann_ivfpq_index_serve,
    ),
    "ann_ivfpq_index_append_roundtrip": QuerySpec(
        # index GROWTH lifecycle (r10): v1 built on the even half, odd
        # half appended through the FROZEN v1 model (no retraining,
        # O(new data) — FAISS `add` semantics), probe served against
        # the appended manifest, recall graded vs exact top-k over the
        # whole corpus with the same audit oracle
        similarity.ann_ivfpq_index_append_roundtrip,
        _ANN_AUDIT_SQL,
        ground_truth="tests/test_similarity.py::test_ivfpq_index_append_grows_without_retrain",
        bench_fn=similarity.ann_ivfpq_index_append_serve,
    ),
    # ---- round-4 additions: window/range-join/sampling surface ----
    "user_running_total": QuerySpec(
        queries.user_running_total,
        """
        SELECT user_id, event_id, ts, value,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS running_value
        FROM events
        """,
    ),
    "range_join_error_context": QuerySpec(
        queries.range_join_error_context,
        f"""
        SELECT e.event_id, e.ts,
               COUNT(*) AS n_ctx,
               CAST(SUM(CAST(c.value AS DECIMAL(38,6))) AS DOUBLE) AS sum_ctx_value
        FROM events e JOIN events c
          ON c.ts > e.ts - INTERVAL {queries.CTX_WINDOW_SEC} SECOND
         AND c.ts <= e.ts
        WHERE e.event_type = 'error'
        GROUP BY e.event_id, e.ts
        """,
    ),
    "stratified_sample_docs": QuerySpec(
        sampling.stratified_sample_docs,
        sampling.stratified_sample_oracle_sql(),
    ),
    "shuffle_shard_docs": QuerySpec(
        sampling.shuffle_shard_docs,
        sampling.shuffle_shard_oracle_sql(),
    ),
    "corpus_token_budget": QuerySpec(
        corpus.corpus_token_budget,
        corpus.token_budget_oracle_sql(),
    ),
    "weighted_sample_docs": QuerySpec(
        sampling.weighted_sample_docs,
        sampling.weighted_sample_oracle_sql(),
    ),
    "value_quantiles_by_type": QuerySpec(
        analytics.value_quantiles_by_type,
        """
        SELECT event_type,
               quantile_cont(value, 0.25) AS p25,
               quantile_cont(value, 0.50) AS p50,
               quantile_cont(value, 0.75) AS p75,
               quantile_cont(value, 0.95) AS p95
        FROM events GROUP BY event_type
        """,
    ),
    "bpe_pair_counts": QuerySpec(
        # round-0 BPE pair statistics: adjacent character pairs per
        # word type, weighted by corpus word frequency — the exact
        # table the first tokenizer merge decision maxes over. The
        # full greedy trainer (text.train_bpe) consumes this shape
        # iteratively driver-side over the bounded word-type table and
        # is verified against a pure-Python reference in
        # tests/test_dedup.py.
        text.bpe_pair_counts,
        """
        WITH w AS (
          SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
          FROM (SELECT unnest(string_split(text, ' ')) AS word
                FROM documents)
          WHERE word <> '' GROUP BY word
        ), p AS (
          SELECT substr(word, CAST(i AS INT), 1) AS pair_left,
                 substr(word, CAST(i AS INT) + 1, 1) AS pair_right,
                 freq
          FROM w, unnest(range(1, length(word))) AS t(i)
        )
        SELECT pair_left, pair_right,
               CAST(SUM(freq) AS BIGINT) AS weight
        FROM p GROUP BY 1, 2
        """,
    ),
    "bpe_encode_corpus": QuerySpec(
        # the APPLY half of tokenizer support: distributed BPE encode
        # of every document under the frozen BPE_MERGES_V1 artifact
        # (trained once by text.train_bpe on sf0.001 and shipped as a
        # constant — the deployment shape: encoding always runs under
        # a frozen merge list). ONE Arrow-batched mapInPandas stage
        # running the GPT-2 rank kernel with a per-task word-type
        # memo: per-row cost is flat in merge count, so the same plan
        # holds at a real 32k-merge vocabulary (VERDICT r12 finding
        # a). Emits per-doc token accounting + md5 fingerprint of the
        # encoded sequence, which DuckDB recomputes bit-for-bit
        # through a sentinel-anchored (whole-symbol) replace chain.
        # Fuzz-pinned against a pure-Python sequential-apply encoder
        # on random strings in tests/test_dedup.py (ADVICE r12).
        text.bpe_encode_corpus,
        text.bpe_encode_oracle_sql(),
    ),
    "bpe_encode_ids_corpus": QuerySpec(
        # tokenizer apply END-TO-END: documents -> BPE token-ID
        # sequences under the frozen artifact (merges + GPT-2-style
        # vocab ids, both pure functions of BPE_MERGES_V1). Rank-
        # kernel Arrow encode + dict id lookup; per-doc count, id sum,
        # and order-sensitive id-sequence fingerprint, DuckDB-replayed
        # bit-for-bit through the sentinel-anchored chain + MAP
        # literal.
        text.bpe_encode_ids_corpus,
        text.bpe_encode_ids_oracle_sql(),
    ),
    "vocab_top_tokens": QuerySpec(
        text.vocab_top_tokens,
        """
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents
        ), freq AS (
            SELECT token, CAST(COUNT(*) AS BIGINT) AS tf,
                   CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
            FROM tok WHERE token <> '' GROUP BY token
        )
        SELECT CAST(row_number() OVER (ORDER BY tf DESC, token) AS INTEGER) AS rank,
               token, tf, df
        FROM freq
        QUALIFY rank <= 100
        """,
    ),
    "doc_length_histogram": QuerySpec(
        text.doc_length_histogram,
        """
        WITH lens AS (
            SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n
            FROM documents
        )
        SELECT (n // 50) * 50 AS len_bucket,
               CAST(COUNT(*) AS BIGINT) AS doc_count,
               CAST(SUM(n) AS BIGINT) AS token_count
        FROM lens GROUP BY 1
        """,
    ),
    "doc_unigram_logprob": QuerySpec(
        text.doc_unigram_logprob,
        # each token's ln p is quantized once to DECIMAL(38,6) before
        # the exact sum — the only libm-dependent op, made
        # engine-identical at 1e-6 resolution (see the operator doc)
        """
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents
        ), clean AS (
            SELECT * FROM tok WHERE token <> ''
        ), vocab AS (
            SELECT token, COUNT(*) AS tf FROM clean GROUP BY token
        ), tot AS (
            SELECT SUM(tf) AS total FROM vocab
        ), scored AS (
            SELECT c.doc_id,
                   CAST(ln(CAST(v.tf AS DOUBLE) / CAST(t.total AS DOUBLE))
                        AS DECIMAL(38,6)) AS lnp
            FROM clean c JOIN vocab v USING (token) CROSS JOIN tot t
        )
        SELECT doc_id,
               CAST(SUM(lnp) AS DOUBLE) / COUNT(*) AS avg_logprob,
               COUNT(*) AS n_tokens
        FROM scored GROUP BY doc_id
        """,
    ),
    "doc_bigram_logprob": QuerySpec(
        # word-ORDER quality signal (r10): self-model MLE bigram
        # conditional logprob, unigram entry's quantize-once float
        # discipline; empties filtered BEFORE pairing in both engines
        # so adjacency is over real tokens
        text.doc_bigram_logprob,
        """
        WITH d AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS toks
            FROM documents
        ), idx AS (
            SELECT doc_id, toks,
                   generate_subscripts(toks, 1) AS i
            FROM d WHERE len(toks) >= 2
        ), bi AS (
            SELECT doc_id, toks[i] AS t1, toks[i + 1] AS t2
            FROM idx WHERE i < len(toks)
        ), counts AS (
            SELECT t1, t2, COUNT(*) AS c_bi FROM bi GROUP BY t1, t2
        ), margins AS (
            SELECT t1, SUM(c_bi) AS c_ctx FROM counts GROUP BY t1
        ), scored AS (
            SELECT b.doc_id,
                   CAST(ln(CAST(c.c_bi AS DOUBLE) / CAST(m.c_ctx AS DOUBLE))
                        AS DECIMAL(38,6)) AS lnp
            FROM bi b
            JOIN counts c USING (t1, t2)
            JOIN margins m USING (t1)
        )
        SELECT doc_id,
               CAST(SUM(lnp) AS DOUBLE) / COUNT(*) AS avg_bigram_logprob,
               COUNT(*) AS n_bigrams
        FROM scored GROUP BY doc_id
        """,
    ),
    "bm25_topk": QuerySpec(
        text.bm25_topk,
        # formula mirrored parenthesis-for-parenthesis; each term
        # score quantized once to DECIMAL(38,6) before the exact sum
        # (ln is the only libm-dependent op — logprob pattern)
        """
        WITH dl AS (
            SELECT doc_id,
                   CAST(len(list_filter(string_split(text, ' '),
                            x -> x <> '')) AS BIGINT) AS dl
            FROM documents
        ), stats AS (
            SELECT COUNT(*) AS n_docs, SUM(dl) AS total_tokens FROM dl
        ), tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents
        ), qtf AS (
            SELECT doc_id, token, COUNT(*) AS tf
            FROM tok WHERE token IN ('hash', 'join', 'vector')
            GROUP BY doc_id, token
        ), qdf AS (
            SELECT token, COUNT(*) AS df FROM qtf GROUP BY token
        ), scored AS (
            SELECT q.doc_id,
                   CAST(
                       ln((CAST(s.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5)
                          / (CAST(d.df AS DOUBLE) + 0.5) + 1.0)
                       * (CAST(q.tf AS DOUBLE) * 2.2
                          / (CAST(q.tf AS DOUBLE) + 1.2 *
                             (0.25 + 0.75 * (CAST(l.dl AS DOUBLE)
                              / (CAST(s.total_tokens AS DOUBLE)
                                 / CAST(s.n_docs AS DOUBLE))))))
                       AS DECIMAL(38,6)) AS s
            FROM qtf q JOIN dl l USING (doc_id)
                       JOIN qdf d USING (token)
                       CROSS JOIN stats s
        )
        SELECT doc_id,
               CAST(SUM(s) AS DOUBLE) AS score,
               COUNT(*) AS matched_terms
        FROM scored GROUP BY doc_id
        ORDER BY score DESC, doc_id
        LIMIT 20
        """,
    ),
    "doc_tfidf_topk": QuerySpec(
        text.doc_tfidf_topk,
        """
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents
        ), clean AS (
            SELECT * FROM tok WHERE token <> ''
        ), tf AS (
            SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
            FROM clean GROUP BY doc_id, token
        ), df AS (
            SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
            FROM clean GROUP BY token
        )
        SELECT t.doc_id,
               CAST(row_number() OVER (
                   PARTITION BY t.doc_id
                   ORDER BY CAST(t.tf AS DOUBLE) / CAST(d.df AS DOUBLE) DESC,
                            t.token) AS INTEGER) AS rank,
               t.token, t.tf, d.df,
               CAST(t.tf AS DOUBLE) / CAST(d.df AS DOUBLE) AS score
        FROM tf t JOIN df d USING (token)
        QUALIFY rank <= 3
        """,
    ),
    # ---- corpus construction (north-star scope) ----
    "span_dedup_docs": QuerySpec(
        corpus.span_dedup_docs,
        f"""
        WITH d AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS toks
            FROM documents
        ), s AS (
            SELECT doc_id, toks,
                   unnest(range(0, CAST(ceil(len(toks) / {corpus.SPAN_TOKENS}.0)
                                   AS BIGINT))) AS span_id
            FROM d WHERE len(toks) > 0
        ), spans AS (
            SELECT doc_id, CAST(span_id AS INTEGER) AS span_id,
                   array_to_string(list_slice(toks,
                        span_id * {corpus.SPAN_TOKENS} + 1,
                        span_id * {corpus.SPAN_TOKENS} + {corpus.SPAN_TOKENS}),
                        ' ') AS span_text
            FROM s
        ), ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY span_text ORDER BY doc_id, span_id) AS rn
            FROM spans
        )
        SELECT doc_id,
               string_agg(span_text, ' ' ORDER BY span_id) AS kept_text,
               COUNT(*) AS kept_spans
        FROM ranked WHERE rn = 1
        GROUP BY doc_id
        """,
    ),
    "corpus_report": QuerySpec(
        corpus.corpus_report,
        """
        WITH per AS (
            SELECT source, lang,
                   CAST(len(list_filter(string_split(text, ' '),
                        x -> x <> '')) AS BIGINT) AS n_tokens,
                   CAST(len(list_filter(string_split(text, ' '),
                        x -> list_contains(
                            ['the', 'a', 'and', 'of', 'to', 'in', 'is'], x)))
                        AS BIGINT) AS stop_hits,
                   sha256(text) AS h
            FROM documents
        )
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
               CAST(SUM(CASE WHEN n_tokens >= 20 AND n_tokens <= 1000
                        AND CAST(stop_hits AS DOUBLE)
                            / CAST(n_tokens AS DOUBLE) >= 0.01
                        THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS quality_pass_rate,
               CAST(COUNT(*) - COUNT(DISTINCT h) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS exact_dup_rate
        FROM per GROUP BY source
        """,
    ),
    "doc_chunks": QuerySpec(
        corpus.doc_chunks,
        # identical window arithmetic: starts at 1, 1+48, ... ≤ n;
        # slice is end-clamped on both engines
        f"""
        WITH d AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ), s AS (
            SELECT doc_id, toks,
                   unnest(range(1, GREATEST(len(toks), 1) + 1,
                                {corpus.CHUNK_STRIDE})) AS start
            FROM d
        )
        SELECT doc_id,
               CAST((start - 1) // {corpus.CHUNK_STRIDE} AS BIGINT) AS chunk_id,
               CAST(len(list_slice(toks, start,
                    LEAST(start + {corpus.CHUNK_TOKENS} - 1, len(toks))))
                    AS BIGINT) AS n_tokens,
               array_to_string(list_slice(toks, start,
                    LEAST(start + {corpus.CHUNK_TOKENS} - 1, len(toks))), ' ')
                    AS chunk_text
        FROM s
        """,
    ),
    "doc_pseudonymize": QuerySpec(
        corpus.doc_pseudonymize,
        # md5 hex is lowercase on both engines; the blocklist literal
        # mirrors corpus.PSEUDO_BLOCKLIST
        """
        SELECT doc_id,
               CAST(len(list_filter(string_split(text, ' '),
                    t -> t IN ('customer', 'spark'))) AS BIGINT) AS n_masked,
               array_to_string(list_transform(string_split(text, ' '),
                    t -> CASE WHEN t IN ('customer', 'spark')
                         THEN 'ent_' || substr(md5(t), 1, 8) ELSE t END),
                    ' ') AS text_pseudo
        FROM documents
        """,
    ),
    "corpus_split_assign": QuerySpec(
        corpus.corpus_split_assign,
        f"""
        SELECT doc_id, lang, source,
               CASE WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)
                         < '{corpus.SPLIT_TRAIN_LT}' THEN 'train'
                    WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)
                         < '{corpus.SPLIT_VALID_LT}' THEN 'valid'
                    ELSE 'test' END AS split
        FROM documents
        """,
    ),
    "doc_repetition": QuerySpec(
        text.doc_repetition,
        # Spark computes multiplicities map-only (sorted-array fold);
        # the oracle uses explode+GROUP BY — same quantities.
        """
        WITH d AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ), tok AS (
            SELECT doc_id, unnest(toks) AS token FROM d
        ), tf AS (
            SELECT doc_id, token, COUNT(*) AS c FROM tok GROUP BY doc_id, token
        ), top_tok AS (
            SELECT doc_id, MAX(c) AS m FROM tf GROUP BY doc_id
        ), big AS (
            SELECT doc_id,
                   unnest(list_transform(generate_series(1, len(toks) - 1),
                          i -> list_extract(toks, i) || ' '
                               || list_extract(toks, i + 1))) AS gram
            FROM d
        ), bf AS (
            SELECT doc_id, gram, COUNT(*) AS c FROM big GROUP BY doc_id, gram
        ), top_big AS (
            SELECT doc_id, MAX(c) AS m FROM bf GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(len(toks) AS BIGINT) AS token_count,
               CAST(len(list_distinct(toks)) AS DOUBLE)
                   / CAST(len(toks) AS DOUBLE) AS distinct_token_ratio,
               CAST(tt.m AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS top_token_frac,
               CASE WHEN len(toks) > 1
                    THEN CAST(tb.m AS DOUBLE) / CAST(len(toks) - 1 AS DOUBLE)
                    ELSE 0.0 END AS top_bigram_frac
        FROM d
        JOIN top_tok tt USING (doc_id)
        LEFT JOIN top_big tb USING (doc_id)
        """,
    ),
    "quality_filter_verdicts": QuerySpec(
        text.quality_filter_verdicts,
        f"""
        WITH d AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ), big AS (
            SELECT doc_id, gram, COUNT(*) AS c FROM (
                SELECT doc_id,
                       unnest(list_transform(generate_series(1, len(toks) - 1),
                              i -> list_extract(toks, i) || ' '
                                   || list_extract(toks, i + 1))) AS gram
                FROM d) GROUP BY doc_id, gram
        ), top_big AS (
            SELECT doc_id, MAX(c) AS m FROM big GROUP BY doc_id
        ), v AS (
            SELECT d.doc_id,
                   len(toks) AS n,
                   len(list_filter(toks,
                       t -> t IN {str(tuple(text.STOPWORDS))})) AS stop_hits,
                   len(list_distinct(toks)) AS n_distinct,
                   COALESCE(tb.m, 0) AS m_big
            FROM d LEFT JOIN top_big tb USING (doc_id)
        )
        SELECT doc_id,
               (n >= {text.QF_MIN_TOKENS} AND n <= {text.QF_MAX_TOKENS})
                   AS ok_length,
               (CAST(stop_hits AS DOUBLE) / CAST(n AS DOUBLE)
                   >= {text.QF_MIN_STOPWORD_RATIO}) AS ok_stopwords,
               (CAST(n_distinct AS DOUBLE) / CAST(n AS DOUBLE)
                   >= {text.QF_MIN_DISTINCT_RATIO}) AS ok_distinct,
               ((CASE WHEN n > 1 THEN CAST(m_big AS DOUBLE) / CAST(n - 1 AS DOUBLE)
                      ELSE 0.0 END) <= {text.QF_MAX_TOP_BIGRAM_FRAC})
                   AS ok_repetition,
               ((n >= {text.QF_MIN_TOKENS} AND n <= {text.QF_MAX_TOKENS})
                AND (CAST(stop_hits AS DOUBLE) / CAST(n AS DOUBLE)
                     >= {text.QF_MIN_STOPWORD_RATIO})
                AND (CAST(n_distinct AS DOUBLE) / CAST(n AS DOUBLE)
                     >= {text.QF_MIN_DISTINCT_RATIO})
                AND ((CASE WHEN n > 1
                           THEN CAST(m_big AS DOUBLE) / CAST(n - 1 AS DOUBLE)
                           ELSE 0.0 END) <= {text.QF_MAX_TOP_BIGRAM_FRAC}))
                   AS keep
        FROM v
        """,
    ),
    "decontaminate_ngram": QuerySpec(
        dedup.decontaminate_ngram,
        f"""
        WITH d AS (
            SELECT doc_id, string_split(text, ' ') AS l FROM documents
        ), g AS (
            SELECT DISTINCT doc_id, md5(gram) AS gh FROM (
                SELECT doc_id,
                       unnest(list_transform(
                           generate_series(1, len(l) - {dedup.DECON_GRAM_N - 1}),
                           i -> array_to_string(
                               list_slice(l, i, i + {dedup.DECON_GRAM_N - 1}), ' ')))
                           AS gram
                FROM d)
        ), bench AS (
            SELECT DISTINCT gh FROM g WHERE doc_id % 97 = 0
        )
        SELECT g.doc_id,
               CAST(COUNT(DISTINCT g.gh) AS BIGINT) AS n_shared_grams
        FROM g JOIN bench USING (gh)
        WHERE g.doc_id % 97 <> 0
        GROUP BY g.doc_id
        """,
    ),
    "dup_clusters": QuerySpec(
        dedup.dup_clusters,
        # Recursive-CTE transitive closure = engine-independent ground
        # truth for the iterative min-label propagation.
        f"""
        {_DUP_CLOSURE_CTE}
        SELECT a AS doc_id, CAST(LEAST(a, MIN(b)) AS BIGINT) AS cluster_id
        FROM reach GROUP BY a
        """,
    ),
    "dedup_canonical_corpus": QuerySpec(
        dedup.dedup_canonical_corpus,
        f"""
        {_DUP_CLOSURE_CTE},
        comp AS (
            SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
            FROM reach GROUP BY a
        )
        SELECT d.doc_id, d.lang, d.source, d.n_chars
        FROM documents d
        WHERE d.doc_id NOT IN
              (SELECT doc_id FROM comp WHERE doc_id <> cluster_id)
        """,
    ),
    "rollup_incremental_refresh": QuerySpec(
        rollup.rollup_incremental_refresh,
        # incrementally-maintained hourly rollup == from-scratch
        # aggregate over the corrected history (exact decimal sums
        # make the comparison bit-for-bit)
        f"""
        SELECT date_trunc('hour', ts) AS hour_bucket, event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(
                   (CASE WHEN strftime(ts, '%Y-%m-%d') = '{rollup.ROLLUP_DAY}'
                         THEN value + 1000.0 ELSE value END)
                   AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
               CAST(SUM(CAST(
                   (CASE WHEN strftime(ts, '%Y-%m-%d') = '{rollup.ROLLUP_DAY}'
                         THEN value + 1000.0 ELSE value END)
                   AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_value
        FROM events GROUP BY 1, 2
        """,
    ),
    "realtime_rollup_view": QuerySpec(
        # real-time continuous aggregate (r13): buckets ≤ the refresh
        # watermark served from MATERIALIZED partials (pruned rollup
        # read, no raw I/O), buckets after it aggregated on the fly
        # from only the raw tail's day-partitions — always-current
        # results with refresh cadence as a cost dial, O(materialized
        # buckets + tail days) per query, never O(history)
        rollup.realtime_rollup_view,
        """
        SELECT date_trunc('hour', ts) AS hour_bucket, event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
                   AS sum_value,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
                   / COUNT(*) AS avg_value
        FROM events GROUP BY 1, 2
        """,
        ground_truth="tests/test_rollup.py::test_realtime_rollup_prunes_both_sides",
    ),
    "dedup_report": QuerySpec(
        dedup.dedup_report,
        f"""
        {_DUP_CLOSURE_CTE},
        comp AS (
            SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
            FROM reach GROUP BY a
        )
        SELECT d.source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(c.cluster_id) AS BIGINT) AS n_clustered,
               CAST(SUM(CASE WHEN c.cluster_id IS NOT NULL
                              AND d.doc_id <> c.cluster_id
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
        GROUP BY d.source
        """,
    ),
    "label_centroids": QuerySpec(
        similarity.label_centroids,
        """
        WITH ex AS (
            SELECT label,
                   CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS dim,
                   unnest(embedding) AS x
            FROM embeddings
        )
        SELECT label, dim,
               CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(38,6))) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS mean_val,
               CAST(COUNT(*) AS BIGINT) AS n_vecs
        FROM ex GROUP BY label, dim
        """,
    ),
    "corpus_mix_resample": QuerySpec(
        corpus.corpus_mix_resample,
        corpus.mix_resample_oracle_sql(),
    ),
    "pack_sequences": QuerySpec(
        corpus.pack_sequences,
        corpus.pack_sequences_oracle_sql(),
    ),
    "customer_order_reconciliation": QuerySpec(
        analytics.customer_order_reconciliation,
        """
        WITH per_cust AS (
            SELECT o_custkey,
                   COUNT(*) AS order_count,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
                       AS total_spend
            FROM orders GROUP BY o_custkey
        )
        SELECT COALESCE(c.c_custkey, p.o_custkey) AS custkey,
               c.c_name, c.c_acctbal,
               CAST(COALESCE(p.order_count, 0) AS BIGINT) AS order_count,
               COALESCE(p.total_spend, 0.0) AS total_spend
        FROM customer c FULL OUTER JOIN per_cust p
          ON c.c_custkey = p.o_custkey
        """,
    ),
    "inactive_users_except": QuerySpec(
        analytics.inactive_users_except,
        """
        SELECT DISTINCT user_id FROM events
        EXCEPT
        SELECT user_id FROM events WHERE event_type = 'purchase'
        """,
    ),
    # The stand-in codec's dimensions are pure functions of the two
    # leading payload bytes: width = 16 + (byte0 % 16), height =
    # 16 + (byte1 % 16). byte % 16 is the LOW nibble = the 2nd hex
    # digit of that byte in hex(encode(text)) — same extraction
    # pattern as the byte-histogram oracle.
    "decoded_image_meta": QuerySpec(
        multimodal.decoded_image_meta,
        """
        WITH b AS (SELECT doc_id, hex(encode(text)) AS h FROM documents)
        SELECT doc_id,
               CAST(16 + CASE WHEN length(h) >= 2
                    THEN strpos('0123456789ABCDEF', substr(h, 2, 1)) - 1
                    ELSE 0 END AS INTEGER) AS width,
               CAST(16 + CASE WHEN length(h) >= 4
                    THEN strpos('0123456789ABCDEF', substr(h, 4, 1)) - 1
                    ELSE 0 END AS INTEGER) AS height
        FROM b
        """,
    ),
    "decoded_audio_meta": QuerySpec(
        multimodal.decoded_audio_meta,
        # the fake codec's rate/count are pure functions of the
        # payload bytes — recomputed from hex(encode(text)), the
        # decoded_image_meta pattern on the audio branch
        """
        WITH b AS (
            SELECT doc_id, encode(text) AS p, hex(encode(text)) AS h
            FROM documents
        )
        SELECT doc_id,
               CAST(8000 * (1 + CASE WHEN length(h) >= 2
                    THEN (16 * (strpos('0123456789ABCDEF', substr(h, 1, 1)) - 1)
                          + (strpos('0123456789ABCDEF', substr(h, 2, 1)) - 1)) % 3
                    ELSE 0 END) AS INTEGER) AS sample_rate,
               CAST(octet_length(p) // 2 AS BIGINT) AS n_samples
        FROM b
        """,
    ),
    "audio_window_rms": QuerySpec(
        multimodal.audio_window_rms,
        # full decode → windowed-RMS oracle: samples are the payload's
        # byte pairs as little-endian int16, rms = sqrt(Σs²/n) per
        # 256-sample window — Σs² is an exact integer (≤256·2¹⁵² ≪ 2⁵³)
        # in both engines, then one correctly-rounded divide + sqrt, so
        # the doubles agree bit-for-bit; a zero-sample doc still emits
        # frame 0 with n=0, rms=0 (the operator's max(len,1) loop)
        """
        WITH raw AS (
            SELECT doc_id, hex(encode(text)) AS h,
                   octet_length(encode(text)) // 2 AS ns
            FROM documents
        ), frames AS (
            SELECT doc_id, ns, unnest(range(0,
                CASE WHEN ns = 0 THEN 1 ELSE (ns + 255) // 256 END
            )) AS frame_idx
            FROM raw
        ), samp AS (
            SELECT doc_id, i // 256 AS frame_idx,
                   (strpos('0123456789ABCDEF', substr(h, 4*i+1, 1)) - 1) * 16
                   + strpos('0123456789ABCDEF', substr(h, 4*i+2, 1)) - 1
                   + ((strpos('0123456789ABCDEF', substr(h, 4*i+3, 1)) - 1) * 16
                      + strpos('0123456789ABCDEF', substr(h, 4*i+4, 1)) - 1
                     ) * 256 AS u16
            FROM (SELECT doc_id, h, unnest(range(0, ns)) AS i FROM raw)
        ), sq AS (
            SELECT doc_id, frame_idx, COUNT(*) AS n,
                   SUM(CAST(
                       (CASE WHEN u16 >= 32768 THEN u16 - 65536 ELSE u16 END)
                       * (CASE WHEN u16 >= 32768 THEN u16 - 65536 ELSE u16 END)
                   AS BIGINT)) AS ss
            FROM samp GROUP BY 1, 2
        )
        SELECT f.doc_id, CAST(f.frame_idx AS INTEGER) AS frame_idx,
               CAST(COALESCE(s.n, 0) AS INTEGER) AS n,
               CASE WHEN COALESCE(s.n, 0) = 0 THEN 0.0
                    ELSE sqrt(CAST(s.ss AS DOUBLE) / s.n) END AS rms
        FROM frames f
        LEFT JOIN sq s ON s.doc_id = f.doc_id AND s.frame_idx = f.frame_idx
        """,
        ground_truth="tests/test_multimodal.py::test_audio_rms_matches_python",
    ),
    "decoded_image_stats": QuerySpec(
        multimodal.decoded_image_stats,
        # the full pixel pipeline IS SQL-expressible because the
        # stand-in codec is pure byte math: dims from the two leading
        # bytes, pixel (y,x,c) of the 8×8 NN-resize = payload byte at
        # ((⌊y·h/8⌋·w + ⌊x·w/8⌋)·3 + c) mod L, channel mean = exact
        # integer sum / 64 (power-of-two divide — IEEE-exact in both
        # engines; numpy's float64 mean of ≤64 uint8s is the same sum)
        """
        WITH raw AS (
            SELECT doc_id, hex(encode(text)) AS h,
                   octet_length(encode(text)) AS L
            FROM documents
        ), dims AS (
            SELECT doc_id, h, L,
                   16 + (CASE WHEN L > 0 THEN
                       (strpos('0123456789ABCDEF', substr(h, 1, 1)) - 1) * 16
                       + strpos('0123456789ABCDEF', substr(h, 2, 1)) - 1
                   ELSE 0 END) % 16 AS w,
                   16 + (CASE WHEN L > 1 THEN
                       (strpos('0123456789ABCDEF', substr(h, 3, 1)) - 1) * 16
                       + strpos('0123456789ABCDEF', substr(h, 4, 1)) - 1
                   ELSE 0 END) % 16 AS hh
            FROM raw
        ), gy AS (
            SELECT *, unnest(range(0, 8)) AS y FROM dims
        ), gx AS (
            SELECT *, unnest(range(0, 8)) AS x FROM gy
        ), gc AS (
            SELECT *, unnest(range(0, 3)) AS c FROM gx
        ), px AS (
            SELECT doc_id, c,
                   CASE WHEN L = 0 THEN 0 ELSE
                       (strpos('0123456789ABCDEF', substr(h,
                           2 * ((((y * hh // 8) * w + (x * w // 8)) * 3 + c)
                                % L) + 1, 1)) - 1) * 16
                       + strpos('0123456789ABCDEF', substr(h,
                           2 * ((((y * hh // 8) * w + (x * w // 8)) * 3 + c)
                                % L) + 2, 1)) - 1
                   END AS byte
            FROM gc
        )
        SELECT doc_id, CAST(8 AS INTEGER) AS width,
               CAST(8 AS INTEGER) AS height,
               SUM(CASE WHEN c = 0 THEN byte ELSE 0 END) / 64.0 AS mean_r,
               SUM(CASE WHEN c = 1 THEN byte ELSE 0 END) / 64.0 AS mean_g,
               SUM(CASE WHEN c = 2 THEN byte ELSE 0 END) / 64.0 AS mean_b
        FROM px GROUP BY doc_id
        """,
        ground_truth="tests/test_multimodal.py::test_image_pipeline_matches_python",
    ),
    "video_frame_overlap": QuerySpec(
        # video near-dup via content-addressed frame overlap (r13):
        # sampled frames' sha256 keys equi-join across videos →
        # per-pair shared-frame counts; document-frequency cap drops
        # stop-frames and bounds per-key fan-out (sub-quadratic,
        # never all-pairs). Fixture re-emits every 10th doc as a
        # shifted id — the duplicated-upload case
        multimodal.video_frame_overlap,
        f"""
        WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 1000000, text FROM documents
            WHERE doc_id % 10 = 0
        ), f AS (
            SELECT DISTINCT doc_id,
                   sha256(substring(text,
                       fi * {multimodal.FRAME_BYTES} + 1,
                       {multimodal.FRAME_BYTES})) AS h
            FROM (
                SELECT doc_id, text,
                       unnest(range(0,
                           CAST(ceil(length(text)
                               / {float(multimodal.FRAME_BYTES)}) AS INT),
                           {multimodal.FRAME_SAMPLE_EVERY})) AS fi
                FROM corpus
            )
        ), rare AS (
            SELECT h FROM f GROUP BY h
            HAVING COUNT(*) <= {multimodal.FRAME_DF_CAP}
        ), k AS (
            SELECT f.doc_id, f.h FROM f JOIN rare USING (h)
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(COUNT(*) AS BIGINT) AS shared_frames
        FROM k a JOIN k b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY 1, 2
        HAVING COUNT(*) >= {multimodal.MIN_SHARED_FRAMES}
        """,
        ground_truth="tests/test_multimodal.py::test_video_frame_overlap_finds_injected_pairs",
    ),
    "image_phash_index": QuerySpec(
        # perceptual dHash index (r13): decode → 8×8 NN-resize →
        # integer-floor grayscale → 8×7 adjacent comparisons packed
        # into a 56-bit hash + 4 LSH bands — SimHash's banded
        # candidate generation applied to images (equal band ⇒
        # Hamming-≤3 pigeonhole; bucketed join, never all-pairs). The
        # oracle replays the whole three-stage Arrow pipeline in pure
        # SQL (the shared _IMAGE_PHASH_CORE_SQL CTE, r14)
        multimodal.image_phash_index,
        multimodal.image_phash_oracle_sql(),
        ground_truth="tests/test_multimodal.py::test_image_phash_buckets_duplicates",
    ),
    "image_near_dup_pairs": QuerySpec(
        # image near-dup candidates end to end (r14): melt the 4 LSH
        # bands, drop stop-buckets (df-cap), band-keyed equi-join,
        # Hamming ≤ 3 verify over the full 56-bit hash — perfect
        # recall for the radius by pigeonhole, never all-pairs. The
        # phash table is pinned once (at scale: the persisted
        # image_phash_index). Fixture injects duplicated uploads;
        # recall pinned in pytest
        multimodal.image_near_dup_pairs,
        multimodal.image_near_dup_oracle_sql(),
        ground_truth="tests/test_multimodal.py::test_image_near_dup_finds_injected_pairs",
    ),
    "audio_fingerprint_index": QuerySpec(
        # audio near-dup substrate (r14): decode → 8-sample window
        # energies → 7-bit-mantissa log-quantized levels → 4-gram
        # base-128 shingle keys. Completes the multimodal dedup triad
        # (image phash r13, video frame overlap r13); all arithmetic
        # is exact integers, so the oracle replays the whole pipeline
        # (Arrow energy stage included) bit-for-bit in SQL
        multimodal.audio_fingerprint_index,
        multimodal.audio_fingerprint_oracle_sql(),
    ),
    "audio_near_dup_pairs": QuerySpec(
        # Shazam-style candidate join (r14): df-capped fingerprint-key
        # equi-join + alignment-offset voting — a shared-footage pair
        # accumulates votes at ONE consistent offset, chance
        # collisions scatter. Fixture injects shifted (2-window intro)
        # + truncated re-uploads; recall is pinned in pytest. Never
        # all-pairs: per-key fan-out bounded by AUDIO_FP_DF_CAP
        multimodal.audio_near_dup_pairs,
        multimodal.audio_near_dup_oracle_sql(),
        ground_truth="tests/test_multimodal.py::test_audio_near_dup_finds_injected_pairs",
    ),
    "event_type_pivot": QuerySpec(
        analytics.event_type_pivot,
        """
        SELECT user_id,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) FILTER (WHERE event_type = 'click') AS DOUBLE)
                   / COUNT(value) FILTER (WHERE event_type = 'click') AS click_avg,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) FILTER (WHERE event_type = 'view') AS DOUBLE)
                   / COUNT(value) FILTER (WHERE event_type = 'view') AS view_avg,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) FILTER (WHERE event_type = 'purchase') AS DOUBLE)
                   / COUNT(value) FILTER (WHERE event_type = 'purchase') AS purchase_avg,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) FILTER (WHERE event_type = 'signup') AS DOUBLE)
                   / COUNT(value) FILTER (WHERE event_type = 'signup') AS signup_avg,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) FILTER (WHERE event_type = 'error') AS DOUBLE)
                   / COUNT(value) FILTER (WHERE event_type = 'error') AS error_avg
        FROM events GROUP BY user_id
        """,
    ),
    "event_type_unpivot": QuerySpec(
        analytics.event_type_unpivot,
        # pivot → melt with NULL cells dropped == plain long-form agg
        """
        SELECT user_id, event_type,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
                   / COUNT(value) AS avg_value
        FROM events
        WHERE event_type IN ('click','view','purchase','signup','error')
        GROUP BY 1, 2
        """,
    ),
    "doc_pii_redact": QuerySpec(
        corpus.doc_pii_redact,
        corpus.pii_redact_oracle_sql(),
    ),
    "bloom_index_lookup": QuerySpec(
        versioned.bloom_index_lookup,
        # the oracle is the plain filter; the file PRUNING is pinned in
        # tests/test_versioned.py::test_bloom_index_prunes_files
        """
        SELECT event_id, ts, user_id, event_type, value
        FROM events WHERE event_id IN (7, 123, 555, 901)
        """,
    ),
    "retention_roundtrip": QuerySpec(
        versioned.retention_roundtrip,
        # drop_chunks before the cutoff == whole-day filter; the
        # metadata-only mechanics are pinned in tests/test_versioned.py
        """
        SELECT event_id, ts, user_id, event_type, value
        FROM events WHERE CAST(ts AS DATE) >= DATE '2024-01-12'
        """,
    ),
    "versioned_schema_evolution": QuerySpec(
        versioned.versioned_schema_evolution,
        # v2 adds `quality` metadata-only; v3 upserts every 10th event
        """
        SELECT event_id, ts, user_id, event_type, value,
               CASE WHEN event_id % 10 = 0 THEN 'checked' END AS quality
        FROM events
        """,
    ),
    "cms_heavy_hitters": QuerySpec(
        analytics.cms_heavy_hitters,
        analytics.cms_oracle_sql(),
    ),
}


# --- self-rotating verification window -------------------------------
# The driver's correctness window walks REGISTRY in declaration order
# and can run out of budget before the tail (r2 verified the first 50
# of 62; r3's hand-rolled front-load silently starved 17 entries of
# re-verification — VERDICT r3 §wrong 3). Instead of a hand-ordered
# list, order by STALENESS of driver evidence, parsed from the
# CORRECTNESS_r*.json files the driver itself writes into the repo:
#   1. entries with no clean verdict ever (new code / last-round
#      failures) run first,
#   2. then ascending by the round of their last clean verdict, so
#      whatever fell outside last round's budget is automatically at
#      the front of this round's window.
# The ordering is deterministic per round (pure function of committed
# evidence files); the union of K consecutive rounds covers every
# entry once K·budget exceeds the registry size. Through r4
# (82 entries, 50-slot window) two rounds sufficed; the r5 surface
# growth (125 entries) makes it three — the ~47 never-verified r5
# additions fill r5's window, the r3/r4-verified backlog drains over
# r6-r7, and nothing can be starved indefinitely because a clean
# verdict pushes an entry behind every staler one.


def _last_clean_round(names: list[str]) -> dict[str, tuple[int, int]]:
    """name → (round of last clean driver verdict, round last attempted).

    Clean = oracle hash match, or a rows-only entry (err == "no_oracle")
    that produced rows. Missing/unparseable evidence → (0, 0).
    """
    import json
    import pathlib

    out = {n: [0, 0] for n in names}
    root = pathlib.Path(__file__).resolve().parents[1]
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        try:
            rnd = int(p.stem.rsplit("_r", 1)[1])
            data = json.loads(p.read_text())
        except (ValueError, OSError, json.JSONDecodeError):
            continue
        for n, rec in data.items():
            if n not in out or not isinstance(rec, dict):
                continue
            out[n][1] = max(out[n][1], rnd)
            clean = bool(rec.get("hash_match")) or (
                rec.get("err") == "no_oracle" and rec.get("spark_rows") is not None
            )
            if clean:
                out[n][0] = max(out[n][0], rnd)
    return {n: (v[0], v[1]) for n, v in out.items()}


# Entries whose IMPLEMENTATION was rewritten this round: a historical
# clean verdict no longer vouches for the current code, so the
# rotation treats them as never-verified. Staleness-by-name cannot see
# code changes — this list is the explicit signal; prune it once the
# next CORRECTNESS file contains fresh verdicts for these names.
#
# STANDING RULE (VERDICT r15): any registry entry whose implementing
# function (or a helper it calls in its data path) is named in the
# current round's git diff joins this list in the same commit as the
# change, and stays until a fresh hash-matched driver verdict lands.
_REVERIFY: set[str] = {
    # r13 rewrite that escaped the discipline (VERDICT r15 "What's
    # wrong"): jaccard_prefix_join gained the PPJoin positional filter
    # (c97447c), size-gated broadcast verify (232dff) and a durable
    # checkpoint option in r13, but its newest driver verdict is r11 —
    # the exactness claim rests on local tests alone until re-verified.
    "jaccard_prefix_join",
    # r15 sink rewrite that escaped the discipline (ADVICE r15 #1):
    # both session-window sinks moved from per-batch full-table commits
    # to a three-clause merge_into_mor (streaming/pipeline.py) — a
    # material commit-shape change with no post-change driver verdict.
    "stream_session_windows",
    "stream_session_windows_bounded",
    # r16 (standing rule): _norm_input_path moved from
    # input_file_name() to _metadata.file_path (byte-identical —
    # pinned in test_dv_file_tag_byte_stable_on_encoded_paths — but a
    # change in the expression every DV-tagged scan evaluates), and
    # purge's probe moved with it. Re-verify the DV/merge/CDF/
    # maintenance lifecycles that persist or match __dv_file bytes.
    "merge_mor_roundtrip",
    "merge_cow_roundtrip",
    "deletion_vector_roundtrip",
    "deletion_vector_maintenance_roundtrip",
    "purge_roundtrip",
    "compaction_roundtrip",
    "versioned_table_changes",
    "cdf_incremental_consume",
    "cdf_replica_sync",
    "stream_cdf_replica",
    "zorder_incremental_roundtrip",
    # r16 (standing rule): the minhash index param read moved to a
    # history walk (meta-riding fix) and gained a remove op — the
    # incremental entry's data path changed.
    "minhash_incremental_probe",
}
# r15 prune history: all 7 r15 names (restore/rename/drop/bloom/widen/
# identity/clone) hold clean r15 hash-matched verdicts
# (CORRECTNESS_r15).
# r14 prune history: all 7 r14 names (COW/MOR merge, checksum,
# drop-column, constraints, core snapshot + DV reads) hold clean r14
# hash-matched verdicts (CORRECTNESS_r14).
# r13 prune history: all 11 r13 names (BPE encode pair, versioned
# roundtrips, DV lifecycles, streaming append sink + index probes,
# table_changes, zorder) hold clean r13 hash-matched verdicts
# (CORRECTNESS_r13). Earlier prunes: six r12 names after
# CORRECTNESS_r12, four r11 names after CORRECTNESS_r11, 8 r10 names
# after CORRECTNESS_r10, 22 r9 names after CORRECTNESS_r09, r7
# rewrites after CORRECTNESS_r07. ADVICE r11 asked why the OTHER
# versioned-format writers were not listed when the delta-log
# encoding changed under them: their r11 driver verdicts were
# produced WITH the delta-log format live — settled by direct
# evidence.


def _verification_order(names: list[str]) -> list[str]:
    evidence = _last_clean_round(names)
    pos = {n: i for i, n in enumerate(names)}
    return sorted(
        names,
        key=lambda n: (
            *((0, 0) if n in _REVERIFY else evidence[n]),
            pos[n],
        ),
    )


REGISTRY = {n: REGISTRY[n] for n in _verification_order(list(REGISTRY))}


def queries_dict() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_dict() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}
