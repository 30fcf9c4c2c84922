"""Salted two-phase aggregation for skewed group keys.

At 100 TB a hot key (one station producing 100× the traffic, one
document source dominating a crawl) concentrates a whole group on one
reducer. AQE's skew-join splitting does not help *aggregations*; the
standard fix is salting: aggregate on (key, salt) first — spreading a
hot key over SALT_BUCKETS reducers — then combine the partials per
key. Works for any algebraic aggregate; exactness is preserved here
because the partials are decimal sums (associative) and counts.

The salt is ``pmod(xxhash64(<row id>), SALT_BUCKETS)`` — deterministic
per row, uniform across buckets, and independent of partitioning, so
the plan (and the oracle comparison) is stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_ingestion_pipeline_spark.functions.exact import SCALE

SALT_BUCKETS = 16


def salt_col(row_id: Column, buckets: int = SALT_BUCKETS) -> Column:
    return F.pmod(F.xxhash64(row_id), F.lit(buckets))


def salted_stats(
    df: DataFrame,
    key: str,
    value: str,
    row_id: str,
    buckets: int = SALT_BUCKETS,
) -> DataFrame:
    """avg/min/max/count of `value` per `key`, two-phase over a salt.

    Result is bit-identical to the unsalted aggregate: decimal
    partial sums re-sum exactly, counts add, min/max compose.
    """
    dec = f"decimal(38,{SCALE})"
    p1 = (
        df.withColumn("_salt", salt_col(F.col(row_id), buckets))
        .groupBy(key, "_salt")
        .agg(
            F.sum(F.col(value).cast(dec)).alias("_s"),
            F.count(value).alias("_c"),
            F.min(value).alias("_mn"),
            F.max(value).alias("_mx"),
        )
    )
    return p1.groupBy(key).agg(
        (F.sum("_s").cast("double") / F.sum("_c")).alias("avg_value"),
        F.min("_mn").alias("min_value"),
        F.max("_mx").alias("max_value"),
        F.sum("_c").alias("reading_count"),
    )


def grouped_agg_salted(spark, sf_dir: str) -> DataFrame:
    """Registry entry: A1 per-station stats via the salted two-phase
    plan. Same oracle as grouped_agg_all_stations — salting must not
    change a single bit of the result."""
    from data_ingestion_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    return salted_stats(ev, "user_id", "value", "event_id")
