"""Degenerate-input sweep: every registry entry must run on EMPTY
tables (0 rows, full schema) and produce an empty result.

Why this matters operationally: at 100 TB a partition-pruned scan, a
fresh tenant, or a filtered replay routinely hands an operator zero
rows — an operator that crashes on empty input (a `.first()[0]` sizing
probe, an unguarded np.stack) takes down a whole pipeline run. The
synthetic-source entries are exempt from the zero-rows assertion (they
generate rows by design) but must still execute.
"""

from __future__ import annotations

import pytest

from data_ingestion_pipeline_spark.registry import REGISTRY
from data_ingestion_pipeline_spark.schemas import TESTDATA_TABLES
from data_ingestion_pipeline_spark.sources.tables import load_table
from tests.conftest import SF_TEST

# sources: generate rows regardless of input tables
_GENERATES_ROWS = {
    "synthetic_weather",
    "synthetic_weather_feed",
    "synthetic_weather_pysource",
}

# fixed-shape summaries: one row per stage/total whose COUNTS are zero
# on empty input — the rows are the report's schema, not data
_ANN_AUDIT_EMPTY = lambda rows: (  # noqa: E731
    len(rows) == 1
    and rows[0].query_id is None
    and rows[0].k == 0
    and rows[0].recall_ok
)
_PAIR_AUDIT_EMPTY = lambda rows: (  # noqa: E731
    len(rows) == 1
    and rows[0].kind == "recall"
    and rows[0].n == 0
    and rows[0].ok
)

_SUMMARY_ROWS = {
    # four lifecycle versions exist even over an empty table — the
    # rows are the history's schema; every count must be zero
    "table_history_roundtrip": lambda rows: (
        sorted(r.version for r in rows) == [1, 2, 3, 4]
        and all(r.n_rows == 0 and r.dv_rows == 0 for r in rows)
    ),
    "funnel_conversion": lambda rows: all(r.users == 0 for r in rows),
    "hll_user_rollup": lambda rows: all(
        r.exact_users == 0 and r.within_bound for r in rows
    ),
    "events_expectations": lambda rows: all(
        r.violations == 0 and r.total == 0 and r.passed for r in rows
    ),
    # recall-audit entries: empty input leaves only the aggregate
    # summary row, which must report zero ground truth and a vacuous
    # (TRUE, never NULL) verdict
    "ann_hamming_topk": _ANN_AUDIT_EMPTY,
    "ann_ivf_topk": _ANN_AUDIT_EMPTY,
    "ann_pq_topk": _ANN_AUDIT_EMPTY,
    "ann_ivfpq_topk": _ANN_AUDIT_EMPTY,
    "ann_ivfpq_index_roundtrip": _ANN_AUDIT_EMPTY,
    "ann_ivfpq_index_append_roundtrip": _ANN_AUDIT_EMPTY,
    "minhash_lsh_candidates": _PAIR_AUDIT_EMPTY,
    "minhash_incremental_probe": _PAIR_AUDIT_EMPTY,
    "embedding_near_dup_lsh": _PAIR_AUDIT_EMPTY,
    "embedding_index_probe": _PAIR_AUDIT_EMPTY,
    "semantic_dedup": _PAIR_AUDIT_EMPTY,
    # the audit checksum of an EMPTY snapshot is the defined zero
    # element (0 rows, xor identity 0, sum '0') in one summary row
    "table_checksum_audit": lambda rows: (
        len(rows) == 1
        and rows[0].n_rows == 0
        and rows[0].xor_checksum == 0
        and rows[0].sum_checksum == "0"
    ),
}


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_empty")
    for t in TESTDATA_TABLES:
        load_table(spark, SF_TEST, t).limit(0).write.mode("overwrite").parquet(
            f"{d}/{t}.parquet"
        )
    return str(d)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_entry_runs_on_empty_input(spark, empty_sf_dir, name):
    df = REGISTRY[name].fn(spark, empty_sf_dir)
    if name in _SUMMARY_ROWS:
        rows = df.collect()
        assert _SUMMARY_ROWS[name](rows), f"{name} summary not all-zero: {rows}"
        return
    n = df.count()
    if name not in _GENERATES_ROWS:
        assert n == 0, f"{name} returned {n} rows from empty input"
