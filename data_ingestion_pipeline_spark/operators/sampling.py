"""Deterministic sampling operators for training-data curation.

A 100 TB corpus is never trained on raw: over-represented strata
(dominant languages, crawl-heavy sources) are downsampled to a target
mix. The reference has no sampling surface (SURVEY.md §2.9); this is
north-star scope alongside dedup/similarity.

Design rules:

- **Hash-gated, not rand().** ``sample()``/``rand()`` draws depend on
  partitioning and re-execution (a retried task would re-draw) —
  unacceptable for reproducible corpus construction. The gate here is
  a pure function of the row key: md5("salt:" + key) compared against
  a per-stratum threshold. Same row → same verdict on any cluster, any
  retry, any engine (the DuckDB oracle evaluates the identical
  expression).
- **Threshold as hex-string compare.** The first 8 hex chars of the
  digest are a uniform 32-bit draw; comparing them lexicographically
  against ``floor(rate · 16^8)`` rendered as 8 lowercase hex digits is
  a numeric compare (fixed width, same alphabet) that needs no
  hex→int conversion — portable across engines that disagree on
  integer-parsing builtins.
- **Map-only plan.** The filter is a per-row predicate on a scan: no
  shuffle, no state, perfectly parallel, and Catalyst still prunes
  columns/partitions beneath it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestion_pipeline_spark.sources.tables import load_table

# Per-language keep rates: downsample dominant English, keep half of
# the tail languages (a classic rebalancing mix). Single source of
# truth — the registry builds the DuckDB oracle CASE from this dict.
SAMPLE_RATES: dict[str, float] = {"en": 0.125}
SAMPLE_DEFAULT_RATE = 0.5
SAMPLE_SALT = "docsample"


def rate_to_hex(rate: float) -> str:
    """floor(rate · 16^8) as 8 lowercase hex digits (rate ∈ [0, 1))."""
    if not 0.0 <= rate < 1.0:
        raise ValueError(f"rate must be in [0, 1): {rate}")
    return format(int(rate * 16**8), "08x")


def hash_gate(key: F.Column, rate_hex: F.Column, salt: str = SAMPLE_SALT) -> F.Column:
    """Deterministic Bernoulli gate: keep iff the row's 32-bit md5
    draw falls below the stratum threshold."""
    draw = F.substring(F.md5(F.concat(F.lit(salt + ":"), key.cast("string"))), 1, 8)
    return draw < rate_hex


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float,
    salt: str = SAMPLE_SALT,
) -> DataFrame:
    """Per-stratum deterministic downsample of ``df``."""
    thr = F.lit(rate_to_hex(default_rate))
    for stratum, rate in sorted(rates.items()):
        thr = F.when(F.col(stratum_col) == stratum, F.lit(rate_to_hex(rate))).otherwise(
            thr
        )
    return df.filter(hash_gate(F.col(key_col), thr, salt))


def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: language-rebalanced document sample (en ↓ to
    12.5%, other languages 50%), reproducible row-for-row."""
    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(
        docs, "doc_id", "lang", SAMPLE_RATES, SAMPLE_DEFAULT_RATE
    ).select("doc_id", "lang", "source", "n_chars")


WEIGHTED_SALT = "wsample"
WEIGHTED_BASE_RATE = 0.5
WEIGHTED_CHAR_CAP = 2000  # weight = min(n_chars, cap)/cap


def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic probability-proportional-to-size sample: each
    document kept with probability base_rate · min(n_chars, cap)/cap —
    the upweight-longer/higher-quality-docs curation sampler (the
    third of the family: uniform stratified, PPS weighted, shuffle
    shard).

    The per-row threshold is no longer a constant, so the gate
    compares the NUMERIC 32-bit draw against floor(p_i · 2^32). Every
    step is engine-exact: the draw is an integer parse of 8 md5 hex
    digits, and the threshold is integer n_chars → one correctly-
    rounded double product chain → floor (IEEE-defined). Still
    map-only: no shuffle, no state, prunable scan underneath.
    """
    docs = load_table(spark, sf_dir, "documents")
    draw = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(WEIGHTED_SALT + ":"), F.col("doc_id").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    w = F.least(F.col("n_chars"), F.lit(WEIGHTED_CHAR_CAP)).cast("double") / F.lit(
        float(WEIGHTED_CHAR_CAP)
    )
    thr = F.floor(F.lit(WEIGHTED_BASE_RATE) * w * F.lit(float(2**32)))
    return docs.filter(draw < thr).select("doc_id", "lang", "source", "n_chars")


def weighted_sample_oracle_sql() -> str:
    """DuckDB twin: the 32-bit draw is reassembled nibble-by-nibble
    (DuckDB has no hex→int builtin); the threshold math mirrors the
    Spark expression term-for-term."""
    digest = f"md5('{WEIGHTED_SALT}:' || CAST(doc_id AS VARCHAR))"
    nibbles = " + ".join(
        f"(strpos('0123456789abcdef', substr({digest}, {k + 1}, 1)) - 1) "
        f"* {16 ** (7 - k)}"
        for k in range(8)
    )
    return f"""
        SELECT doc_id, lang, source, n_chars
        FROM documents
        WHERE ({nibbles}) <
              FLOOR({WEIGHTED_BASE_RATE} *
                    (CAST(LEAST(n_chars, {WEIGHTED_CHAR_CAP}) AS DOUBLE)
                     / {float(WEIGHTED_CHAR_CAP)}) * {float(2**32)})
    """


N_SHARDS = 16
SHARD_SALT = "shard"
_HEX = "0123456789abcdef"


def shuffle_shard_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus shuffle + sharding — the write-side of a
    training-data pipeline: every document gets a pseudorandom but
    reproducible (shard, pos) so shards are balanced, intra-shard
    order is decorrelated from ingest order, and a re-run (or a
    different engine) produces the identical layout.

    Shard = first hex nibble of md5(salt:doc_id) → 16 shards, each a
    uniform 1/16 slice; pos = rank of the full digest within the
    shard. The shard map is a per-row projection (no shuffle); the
    within-shard ordering is ONE row_number window partitioned by
    shard — at 100 TB that is a range-partitioned sort per shard,
    which is precisely the physical plan a sharded-shuffle writer
    needs anyway (`.repartition("shard").sortWithinPartitions(...)`
    followed by a partitioned write reuses this exact ordering).
    """
    docs = load_table(spark, sf_dir, "documents")
    skey = F.md5(F.concat(F.lit(SHARD_SALT + ":"), F.col("doc_id").cast("string")))
    keyed = docs.select("doc_id", skey.alias("skey")).withColumn(
        "shard",
        (F.expr(f"locate(substring(skey, 1, 1), '{_HEX}')") - 1).cast("int"),
    )
    w = Window.partitionBy("shard").orderBy("skey", "doc_id")
    return keyed.select(
        "doc_id", "shard", F.row_number().over(w).alias("pos")
    )


def shuffle_shard_oracle_sql() -> str:
    return f"""
        WITH k AS (
            SELECT doc_id,
                   md5('{SHARD_SALT}:' || CAST(doc_id AS VARCHAR)) AS skey
            FROM documents
        )
        SELECT doc_id,
               CAST(strpos('{_HEX}', substr(skey, 1, 1)) - 1 AS INTEGER) AS shard,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY strpos('{_HEX}', substr(skey, 1, 1))
                   ORDER BY skey, doc_id) AS INTEGER) AS pos
        FROM k
    """


def stratified_sample_oracle_sql() -> str:
    """DuckDB twin of stratified_sample_docs, built from the same
    rate table so the two can never drift."""
    cases = " ".join(
        f"WHEN lang = '{stratum}' THEN '{rate_to_hex(rate)}'"
        for stratum, rate in sorted(SAMPLE_RATES.items())
    )
    return f"""
        SELECT doc_id, lang, source, n_chars
        FROM documents
        WHERE substr(md5('{SAMPLE_SALT}:' || CAST(doc_id AS VARCHAR)), 1, 8) <
              CASE {cases} ELSE '{rate_to_hex(SAMPLE_DEFAULT_RATE)}' END
    """
