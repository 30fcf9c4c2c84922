"""Table expectations: declarative data-quality rules evaluated in
one scan — the Delta constraints / dbt-test / Great Expectations
surface for this engine.

`operators/ingest.py` enforces ROW-level validity by routing (each
record keeps or loses its place in the pipeline); expectations are
TABLE-level observability: every rule's violation count in a single
aggregate pass, so a 100 TB audit costs one scan regardless of how
many rules it checks. Row rules are boolean columns (nulls count as
violations — a rule that can't evaluate has failed); set-level rules
(uniqueness) ride in the same aggregate as count-distinct deltas.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_pipeline_spark.sources.tables import load_table


def validate_expectations(
    df: DataFrame,
    row_rules: dict[str, Column],
    unique_keys: dict[str, list[str]] | None = None,
) -> DataFrame:
    """One-scan rule report: (rule, violations, total, passed) per
    rule. `row_rules` maps rule name → boolean Column (True = row
    passes; NULL counts as a violation). `unique_keys` maps rule
    name → key columns whose combinations must be unique (checked as
    count − distinct-count inside the same aggregate)."""
    aggs = [F.count(F.lit(1)).alias("_total")]
    names = []
    for i, (name, pred) in enumerate(row_rules.items()):
        # outer coalesce: SUM over an EMPTY table is NULL, and an
        # empty table has zero violations, not unknown ones
        aggs.append(
            F.coalesce(
                F.sum((~F.coalesce(pred, F.lit(False))).cast("bigint")), F.lit(0)
            ).alias(f"_v{i}")
        )
        names.append(name)
    for j, (name, keys) in enumerate((unique_keys or {}).items()):
        aggs.append(
            (
                F.count(F.struct(*keys)) - F.countDistinct(F.struct(*keys))
            ).alias(f"_u{j}")
        )
        names.append(name)
    one = df.agg(*aggs)
    n_row = len(row_rules)
    cells = ", ".join(
        f"'{name}', {'_v' + str(i) if i < n_row else '_u' + str(i - n_row)}"
        for i, name in enumerate(names)
    )
    return one.select(
        F.expr(f"stack({len(names)}, {cells}) AS (rule, violations)"),
        F.col("_total").alias("total"),
    ).select(
        "rule",
        "violations",
        "total",
        (F.col("violations") == 0).alias("passed"),
    )


def events_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: the standing expectation suite for the events
    table — key completeness, temporal domain, enum membership, value
    presence, and key uniqueness — one scan, five rules."""
    ev = load_table(spark, sf_dir, "events")
    known = ["click", "view", "purchase", "signup", "error"]
    return validate_expectations(
        ev,
        {
            "event_id_not_null": F.col("event_id").isNotNull(),
            "ts_within_2024": F.col("ts").between(
                F.lit("2024-01-01 00:00:00").cast("timestamp"),
                F.lit("2024-12-31 23:59:59").cast("timestamp"),
            ),
            "event_type_known": F.col("event_type").isin(*known),
            "value_not_null": F.col("value").isNotNull(),
        },
        unique_keys={"event_id_unique": ["event_id"]},
    )
