"""Ingestion-path operators: validate → route DLQ → dedup → upsert.

The reference's collector+consumer pipeline (SURVEY.md §3.1) as pure
DataFrame transforms. Each stage returns a DataFrame so the whole
chain stays one Catalyst plan; the valid/DLQ split is two filters
over the same validated scan (Catalyst collapses the common subplan;
at scale, one pass over the data feeding two sinks via persist or
foreachBatch).

Validation rules are the analog of the consumer's range gates
(`services/consumer/main.py:142-161`: -100≤temp≤60, 0≤humidity≤100,
wind≥0) applied to the events table: 0 ≤ value ≤ 300 and a known
event_type vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestion_pipeline_spark.sources.tables import load_table

VALUE_MIN = 0.0
VALUE_MAX = 300.0
KNOWN_TYPES = ("click", "view", "purchase", "signup", "error")


def _validity(df: DataFrame) -> DataFrame:
    """Attach a validation-error column (null ⇔ valid).

    One expression, evaluated once, drives both routes — the Spark
    analog of the consumer's per-record try/except
    (`services/consumer/main.py:317-324`).
    """
    err = (
        F.when(F.col("value").isNull(), F.lit("value: missing"))
        .when(
            ~F.col("value").between(VALUE_MIN, VALUE_MAX),
            F.concat(F.lit("value out of range: "), F.col("value").cast("string")),
        )
        .when(
            ~F.col("event_type").isin(*KNOWN_TYPES),
            F.concat(F.lit("unknown event_type: "), F.col("event_type")),
        )
        .otherwise(F.lit(None).cast("string"))
    )
    return df.withColumn("validation_error", err)


def validate_route_valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows passing all range gates (P2), DLQ columns dropped."""
    ev = _validity(load_table(spark, sf_dir, "events"))
    return ev.filter(F.col("validation_error").isNull()).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


def validate_route_dlq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter side-output: failing rows + error envelope.

    ≡ the consumer's DLQ produce (`services/consumer/main.py:163-187`):
    {error, original_message, trace_id}. original_message here is the
    JSON re-encoding of the rejected row.
    """
    ev = _validity(load_table(spark, sf_dir, "events"))
    return ev.filter(F.col("validation_error").isNotNull()).select(
        F.col("validation_error").alias("error"),
        # ignoreNullFields=false: a null `value` must serialize as
        # "value":null (Spark's default omits null fields; DuckDB's
        # to_json — and the reference's json.dumps — emit them).
        F.to_json(
            F.struct("event_id", "user_id", "event_type", "value"),
            {"ignoreNullFields": "false"},
        ).alias("original_message"),
        F.col("event_id").alias("source_event_id"),
    )


def _with_injected_duplicates(ev: DataFrame) -> DataFrame:
    """Deterministic analog of the generator's duplicate injector.

    The reference re-emits ~20% of records verbatim
    (`services/generator/main.py:157-166`); here every 5th event_id
    is unioned back in. Verbatim copies ⇒ first-wins vs last-wins is
    observably equivalent (SURVEY.md §2.7 T1).
    """
    return ev.unionAll(ev.filter(F.col("event_id") % 5 == 0))


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on the key (user_id, ts) over a 20%-duplicated feed.

    ≡ the consumer's keyed-overwrite buffer
    (`services/consumer/main.py:326-346`). Implemented as
    row_number()=1 per key (ties broken by event_id) rather than
    dropDuplicates so the surviving row is deterministic under any
    partitioning — same guarantee the PK upsert gives the reference.
    One shuffle on the dedup key; at 100 TB this is the same shuffle
    the subsequent key-partitioned write needs, so it's free overall.
    """
    ev = _with_injected_duplicates(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


def upsert(base: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """Last-write-wins MERGE as a plan: updates ∪ (base ⟕̸ updates).

    The reference's `INSERT ... ON CONFLICT DO UPDATE`
    (`services/consumer/main.py:225-249`) has no built-in on plain
    parquet; the anti-join rewrite is the scalable equivalent. The
    anti join shuffles both sides on the key — on a cluster, write
    the base table bucketed/partitioned by key so only updates
    shuffle. updates must be unique per key (pre-dedup upstream).
    """
    return updates.unionByName(base.join(updates, on=keys, how="left_anti"))


def upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert demo: +1000 corrections for every 10th event, merged.

    Result = base with every (user_id, ts) key of the update batch
    replaced last-write-wins (K4 semantics).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    updates = ev.filter(F.col("event_id") % 10 == 0).withColumn(
        "value", F.col("value") + F.lit(1000.0)
    )
    return upsert(ev, updates, ["user_id", "ts"])


def batch_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-batch ingestion accounting: {batch_id, total, successful,
    failed} — the collector's batch endpoint response
    (`services/collector/main.py:215-222`).

    Straight conditional-sum aggregation — one partial-agg shuffle on
    the group key, no row materialization. (An earlier version built
    collect_list envelopes first; at scale a hot key would OOM an
    executor, and the accounting never needed the round-trip. The
    envelope/explode plumbing itself is exercised separately by
    batch_envelope_explode with bounded envelope sizes.)
    """
    ev = load_table(spark, sf_dir, "events")
    ok = F.col("value").between(VALUE_MIN, VALUE_MAX) & F.col("event_type").isin(
        *KNOWN_TYPES
    )
    return (
        ev.select(
            F.concat(F.lit("batch_"), F.col("user_id")).alias("batch_id"),
            ok.alias("ok"),
        )
        .groupBy("batch_id")
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.sum(F.when(F.col("ok"), 1).otherwise(0)).alias("successful"),
            F.sum(F.when(F.col("ok"), 0).otherwise(1)).alias("failed"),
        )
    )


def batch_envelope_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-envelope round-trip (S2): build {batch_id, records:[...]}
    envelopes, then explode back to flat records.

    Envelopes are keyed by event_id div 100, so every envelope holds at
    most 100 records regardless of data scale — the collect_list here
    is bounded by construction (unlike grouping by a potentially-hot
    natural key). Exercises ArrayType(StructType) plumbing both ways.
    """
    ev = load_table(spark, sf_dir, "events")
    envelopes = ev.groupBy(
        (F.col("event_id") - (F.col("event_id") % 100)).alias("batch_no")
    ).agg(
        F.collect_list(F.struct("event_id", "ts", "user_id", "event_type", "value")).alias(
            "records"
        )
    )
    records = envelopes.select(
        F.concat(F.lit("batch_"), (F.col("batch_no") / 100).cast("long").cast("string")).alias(
            "batch_id"
        ),
        F.explode("records").alias("r"),
    )
    return records.select(
        "batch_id",
        F.col("r.event_id").alias("event_id"),
        F.col("r.ts").alias("ts"),
        F.col("r.user_id").alias("user_id"),
        F.col("r.event_type").alias("event_type"),
        F.col("r.value").alias("value"),
    )
