"""Training-corpus construction operators: sequence chunking,
PII-style pseudonymization, split assignment.

The reference has no corpus surface (SURVEY.md §2.9); these are
north-star scope (BASELINE.json) — the operations that turn a cleaned
document table into model-ready training data. All pure
`pyspark.sql.functions` over one scan: no Python in the row path, no
shuffle (each is a map-only transform or a per-row explode), so the
identical plan runs over 100 TB of documents with linear cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_pipeline_spark.sources.tables import load_table

CHUNK_TOKENS = 64  # training-sequence length (whitespace tokens)
CHUNK_STRIDE = 48  # window stride → 16-token overlap between chunks

# "Entity" vocabulary for pseudonymization — stands in for the
# PII-term dictionary a real scrubber loads; mirrored literally in the
# oracle SQL.
PSEUDO_BLOCKLIST = ("customer", "spark")

# Deterministic corpus split: fixed-width lowercase-hex thresholds on
# substr(md5('split:'||doc_id),1,8) — the portable hash-gate pattern
# shared with operators/sampling.py (no rand(), stable under retries
# and any partitioning). ~90% / ~5% / ~5%.
SPLIT_TRAIN_LT = "e6666666"
SPLIT_VALID_LT = "f3333333"


def _tokens(col: str = "text") -> F.Column:
    return F.split(F.col(col), " ")


def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-length training sequences: a CHUNK_TOKENS-token window at
    every CHUNK_STRIDE offset of each document's token stream (tail
    windows run short) — the packing step that turns documents into
    model inputs, with overlap so no next-token context is lost at
    chunk boundaries.

    Shape: one scan → per-row `sequence()` of window starts →
    `explode` → `slice`/`array_join`. The fan-out is tokens/stride
    rows per document (data-proportional, no shuffle); at 100 TB this
    is the same map-only cost as reading the corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(CHUNK_STRIDE)
    )
    exploded = docs.select(
        "doc_id", toks.alias("toks"), F.explode(starts).alias("start")
    )
    chunk = F.slice(F.col("toks"), F.col("start"), CHUNK_TOKENS)
    return exploded.select(
        "doc_id",
        F.floor((F.col("start") - 1) / CHUNK_STRIDE).cast("bigint").alias("chunk_id"),
        F.size(chunk).cast("bigint").alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def doc_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style token scrubbing: every blocklisted token is replaced
    by a deterministic pseudonym (`ent_` + md5-prefix), preserving
    corpus statistics (same token everywhere → same pseudonym
    everywhere) while removing the surface form — the shape of a
    name/email scrubbing pass over training text. Map-only: token
    transform + rejoin inside whole-stage codegen, one scan.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    masked = F.transform(
        toks,
        lambda t: F.when(
            t.isin(*PSEUDO_BLOCKLIST),
            F.concat(F.lit("ent_"), F.substring(F.md5(t), 1, 8)),
        ).otherwise(t),
    )
    n_masked = F.size(F.filter(toks, lambda t: t.isin(*PSEUDO_BLOCKLIST)))
    return docs.select(
        "doc_id",
        n_masked.cast("bigint").alias("n_masked"),
        F.array_join(masked, " ").alias("text_pseudo"),
    )


def corpus_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/valid/test assignment (~90/5/5) by hash
    gate on doc_id: portable (md5 hex, no engine RNG), stable under
    retries, reshuffles, and incremental corpus growth — adding
    documents never reassigns existing ones, the property a training
    pipeline needs to keep its eval set uncontaminated across
    refreshes. Map-only filter-free projection; one scan.
    """
    docs = load_table(spark, sf_dir, "documents")
    gate = F.substring(
        F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 8
    )
    split = (
        F.when(gate < SPLIT_TRAIN_LT, F.lit("train"))
        .when(gate < SPLIT_VALID_LT, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    return docs.select("doc_id", "lang", "source", split.alias("split"))
