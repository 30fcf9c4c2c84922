"""Local replica of the driver's correctness gate.

For every registry entry with an oracle: run the Spark query and the
DuckDB SQL on the same parquet, then compare row count, column names,
and an order-insensitive value multiset (exact equality — the
engine's decimal-sum arithmetic is designed to make this hold
bit-for-bit, see functions/exact.py).

Runs at sf0.001 by default (fast, every commit) and at the driver's
sf0.01 when SPARK_GRAFT_PARITY_SF_DIR says so.
"""

from __future__ import annotations

import datetime
import math
import os
from collections import Counter

import pytest

from data_ingestion_pipeline_spark.registry import REGISTRY
from tests.conftest import duck_con

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF_DIR", "/root/testdata/sf0.001")


def _norm(v):
    """Normalize a cell for cross-engine comparison."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _multiset(rows, colnames):
    """Order-insensitive multiset of rows with columns sorted by name."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return Counter(tuple(_norm(r[i]) for i in order) for r in rows)


ORACLE_CASES = [(n, s) for n, s in REGISTRY.items() if s.oracle]


@pytest.mark.parametrize("name,spec", ORACLE_CASES, ids=[n for n, _ in ORACLE_CASES])
def test_oracle_parity(spark, name, spec):
    sdf = spec.fn(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = duck_con(SF_DIR)
    # Driver-fidelity type gate: the driver compares via pandas/Arrow
    # conversion, where DuckDB HUGEINT (e.g. an uncast SUM(BIGINT))
    # silently becomes float64 and hash-mismatches Spark's int64 even
    # when every value is identical (the r6 corpus_token_budget bug).
    # fetchall() here returns Python ints and cannot see it, so gate
    # on the declared types instead.
    otypes = con.execute(f"DESCRIBE {spec.oracle}").fetchall()
    hugeint_cols = [r[0] for r in otypes if "HUGEINT" in str(r[1]).upper()]
    assert not hugeint_cols, (
        f"{name}: oracle emits HUGEINT column(s) {hugeint_cols} — the "
        f"driver's pandas conversion turns these into float64 and the "
        f"value-hash diverges from Spark's int64; add an explicit "
        f"CAST(... AS BIGINT) in the oracle SQL"
    )
    res = con.execute(spec.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    sm, dm = _multiset(spark_rows, spark_cols), _multiset(duck_rows, duck_cols)
    if sm != dm:
        only_s = list((sm - dm).items())[:5]
        only_d = list((dm - sm).items())[:5]
        raise AssertionError(
            f"{name}: value mismatch\n only-spark: {only_s}\n only-duck: {only_d}"
        )


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert set(e.oracle_sql()) <= set(e.queries())
