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


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    row_id: str,
    buckets: int = SALT_BUCKETS,
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small
    side `buckets`×, join on (key, salt).

    A hot join key concentrates its rows on ONE reducer of a shuffled
    join; salting spreads each key over `buckets` reducers at the cost
    of a `buckets`× blow-up of the (much smaller) build side — the
    standard fix when the small side exceeds the broadcast threshold
    AND keys skew (AQE's skew-join split handles sort-merge skew at
    runtime, but only per-partition; salting bounds worst-case reducer
    load by construction). The shuffle_hash hint keeps the
    demonstration honest — without it this size would broadcast and
    never shuffle at all.
    """
    b = big.withColumn("_salt", salt_col(F.col(row_id), buckets))
    s = small.withColumn(
        "_salt",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.lit(buckets - 1).cast("long"))
        ),
    )
    return b.join(
        s.hint("shuffle_hash"),
        (F.col(big_key) == F.col(small_key)) & (b["_salt"] == s["_salt"]),
    ).drop("_salt")


def events_customer_join_salted(spark, sf_dir: str) -> DataFrame:
    """Registry entry: events⋈customer through the salted shuffled
    join — 15 hot station keys over the whole fact table is exactly
    the skew shape. Oracle = the plain equi-join; salting must not
    change a row."""
    from data_ingestion_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    return salted_join(ev, cust, "user_id", "c_custkey", "event_id").select(
        "event_id", "ts", "user_id", "value", "c_name", "c_nationkey"
    )
