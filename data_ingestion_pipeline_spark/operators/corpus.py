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

from pyspark.sql import DataFrame, SparkSession, Window
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


# Per-source target mixing weights (epochs over each source). >1 →
# upsample with replacement, <1 → downsample; fractional parts resolve
# by the shared hash-gate. Mirrored literally in the oracle SQL.
MIX_WEIGHTS: dict[str, float] = {"src0": 2.5, "src1": 2.0, "src2": 0.5}
MIX_DEFAULT_WEIGHT = 1.0
MIX_SALT = "mix"


def corpus_mix_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus mixing: replicate each document
    floor(weight[source]) times plus one more iff its hash-gate draw
    falls under the fractional part — the "N epochs of wiki, 0.5
    epochs of web" data-mixture step every pre-training run performs
    (weights per source, not per row). Expected copy count = weight,
    exactly; realized counts are a pure function of doc_id, so the
    mixture is identical across retries, engines, and cluster layouts
    (same design rule as operators/sampling.py — no rand()).

    Map-only: per-row CASE weight → `sequence`/`explode` fan-out
    (rows out = Σ weights · rows in, no shuffle); documents with zero
    copies drop out via the empty-array explode. At 100 TB the only
    cost is the write amplification the mixture itself demands.
    """
    docs = load_table(spark, sf_dir, "documents")
    from data_ingestion_pipeline_spark.operators.sampling import (
        hash_gate,
        rate_to_hex,
    )

    base = F.lit(int(MIX_DEFAULT_WEIGHT))
    frac_hex = F.lit(rate_to_hex(MIX_DEFAULT_WEIGHT - int(MIX_DEFAULT_WEIGHT)))
    for src, w in sorted(MIX_WEIGHTS.items()):
        base = F.when(F.col("source") == src, F.lit(int(w))).otherwise(base)
        frac_hex = F.when(
            F.col("source") == src, F.lit(rate_to_hex(w - int(w)))
        ).otherwise(frac_hex)
    copies = (
        base
        + F.when(hash_gate(F.col("doc_id"), frac_hex, MIX_SALT), 1).otherwise(0)
    ).cast("int")
    reps = F.when(copies >= 1, F.sequence(F.lit(1), copies)).otherwise(
        F.array().cast("array<int>")
    )
    ex = docs.select("doc_id", "source", F.explode(reps).alias("copy_nr"))
    return ex.select(
        "doc_id", "source", F.col("copy_nr").cast("bigint").alias("copy_nr")
    )


def mix_resample_oracle_sql() -> str:
    """DuckDB twin built from the same weight table (cannot drift)."""
    from data_ingestion_pipeline_spark.operators.sampling import rate_to_hex

    base_cases = " ".join(
        f"WHEN source = '{s}' THEN {int(w)}" for s, w in sorted(MIX_WEIGHTS.items())
    )
    frac_cases = " ".join(
        f"WHEN source = '{s}' THEN '{rate_to_hex(w - int(w))}'"
        for s, w in sorted(MIX_WEIGHTS.items())
    )
    return f"""
        WITH c AS (
            SELECT doc_id, source,
                   (CASE {base_cases} ELSE {int(MIX_DEFAULT_WEIGHT)} END)
                   + (CASE WHEN substr(md5('{MIX_SALT}:' || CAST(doc_id AS VARCHAR)), 1, 8)
                           < (CASE {frac_cases}
                              ELSE '{rate_to_hex(MIX_DEFAULT_WEIGHT - int(MIX_DEFAULT_WEIGHT))}' END)
                      THEN 1 ELSE 0 END) AS copies
            FROM documents
        )
        SELECT doc_id, source,
               CAST(unnest(generate_series(1, copies)) AS BIGINT) AS copy_nr
        FROM c
    """


PACK_TOKENS = 512  # training-sequence capacity (whitespace tokens)
N_PACK_SHARDS = 16
PACK_SALT = "pack"
_HEX = "0123456789abcdef"


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing by cumulative-sum binning: lay the (shuffled)
    token stream of each shard end-to-end and cut it every PACK_TOKENS
    tokens — each document gets (shard, seq_id, seq_offset), the
    address of its first token in the packed training sequences.
    Documents straddle cuts exactly as contiguous-packing trainers
    expect (a doc spanning seq k and k+1 contributes its tail to k+1).

    Shard = first md5 nibble of the salted doc_id (16 uniform shards,
    same portable pattern as shuffle_shard_docs); within-shard order =
    (digest, doc_id), i.e. decorrelated from ingest order. The packing
    itself is ONE running-sum window per shard — a range-partitioned
    sort, the minimal physical plan any deterministic packer needs —
    with integer-only arithmetic so Spark and the oracle agree
    bit-for-bit. Shard count is a parameter: at 100 TB it is set to
    O(cluster cores) so each per-shard sort fits an executor.
    """
    docs = load_table(spark, sf_dir, "documents")
    skey = F.md5(F.concat(F.lit(PACK_SALT + ":"), F.col("doc_id").cast("string")))
    n = F.size(_tokens()).cast("bigint")
    keyed = docs.select(
        "doc_id",
        n.alias("n_tokens"),
        skey.alias("skey"),
    ).withColumn(
        "shard",
        (F.expr(f"locate(substring(skey, 1, 1), '{_HEX}')") - 1).cast("int"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("skey", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start")
    return keyed.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor(start / PACK_TOKENS).cast("bigint").alias("seq_id"),
        (start % PACK_TOKENS).cast("bigint").alias("seq_offset"),
    )


def pack_sequences_oracle_sql() -> str:
    return f"""
        WITH k AS (
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   md5('{PACK_SALT}:' || CAST(doc_id AS VARCHAR)) AS skey
            FROM documents
        ), c AS (
            SELECT doc_id, n_tokens, skey,
                   CAST(strpos('{_HEX}', substr(skey, 1, 1)) - 1 AS INTEGER) AS shard,
                   SUM(n_tokens) OVER (
                       PARTITION BY substr(skey, 1, 1)
                       ORDER BY skey, doc_id
                       ROWS UNBOUNDED PRECEDING) - n_tokens AS start
            FROM k
        )
        SELECT doc_id, shard, n_tokens,
               CAST(FLOOR(start / {PACK_TOKENS}) AS BIGINT) AS seq_id,
               CAST(start % {PACK_TOKENS} AS BIGINT) AS seq_offset
        FROM c
    """


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


SPAN_TOKENS = 8  # exact-span dedup granularity (non-overlapping)


def span_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document exact SPAN deduplication — the "remove repeated
    substrings" pass (boilerplate headers, license blocks, navigation
    chrome) that pipelines run alongside whole-doc dedup: each doc's
    token stream splits into non-overlapping SPAN_TOKENS-token spans;
    a span survives only at its FIRST corpus occurrence (lowest
    (doc_id, span_id)); each doc is reassembled from its surviving
    spans.

    Shape: explode to spans (fan-out data-proportional) → one
    aggregate on span text for the global first-occurrence (map-side
    combinable min of a (doc_id, span_id) struct; at 100 TB the key
    would be xxhash64(span) to keep the shuffle narrow — text key
    here keeps the oracle trivial) → equi-join survivors back →
    per-doc ordered reassembly (array_sort of collected structs, not
    a window: one shuffle on doc_id). Docs whose spans all lose
    disappear — the gate emits what remains.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(_tokens(), lambda t: t != "")
    n_spans = F.ceil(F.size(toks) / F.lit(SPAN_TOKENS)).cast("int")
    spans = (
        # token-less docs are excluded up front: sequence(0, n-1)
        # would otherwise run DESCENDING for n=0 (Spark defaults the
        # step to -1 when start > stop) and emit phantom spans
        docs.filter(F.size(toks) > 0)
        .select(
            "doc_id",
            toks.alias("toks"),
            F.explode(F.sequence(F.lit(0), n_spans - 1)).alias("span_id"),
        )
        .select(
            "doc_id",
            "span_id",
            F.array_join(
                F.slice(
                    F.col("toks"),
                    F.col("span_id") * SPAN_TOKENS + 1,
                    SPAN_TOKENS,
                ),
                " ",
            ).alias("span_text"),
        )
    )
    first = spans.groupBy("span_text").agg(
        F.min(F.struct("doc_id", "span_id")).alias("f")
    )
    survivors = spans.join(first, "span_text").filter(
        (F.col("doc_id") == F.col("f.doc_id")) & (F.col("span_id") == F.col("f.span_id"))
    )
    return (
        survivors.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("span_id", "span_text"))),
                    lambda x: x.getField("span_text"),
                ),
                " ",
            ).alias("kept_text"),
            F.count(F.lit(1)).alias("kept_spans"),
        )
    )


def corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset card: the summary table a corpus release
    ships — document/token counts, language spread, quality-gate pass
    rate, exact-duplicate rate. One scan computes every per-doc
    signal JVM-side; one aggregate per source; the dup rate uses
    sha256 content hashes so it matches docs_exact_dedup's notion of
    identity. All counts are exact integers; the two rates are single
    double divides — oracle hash-stable.
    """
    from data_ingestion_pipeline_spark.operators.text import (
        QF_MIN_STOPWORD_RATIO,
        QF_MIN_TOKENS,
        QF_MAX_TOKENS,
        STOPWORDS,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(_tokens(), lambda t: t != "")
    n = F.size(toks).cast("bigint")
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("bigint")
    ok = (
        (n >= QF_MIN_TOKENS)
        & (n <= QF_MAX_TOKENS)
        & (stop_hits.cast("double") / n.cast("double") >= QF_MIN_STOPWORD_RATIO)
    )
    per_doc = docs.select(
        "source",
        "lang",
        n.alias("n_tokens"),
        ok.cast("int").alias("ok"),
        F.sha2(F.col("text"), 256).alias("h"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.countDistinct("lang").alias("n_langs"),
        (F.sum("ok").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "quality_pass_rate"
        ),
        (
            (F.count(F.lit(1)) - F.countDistinct("h")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("exact_dup_rate"),
    )


BUDGET_TOKENS_PER_SOURCE = 30_000  # per-source whitespace-token budget
BUDGET_SALT = "tokbudget"


def corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget capping: every source contributes at
    most ~BUDGET_TOKENS_PER_SOURCE whitespace tokens to the training
    mix, enforced as a deterministic hash-gated downsample at rate
    min(1, budget / source_tokens) — the "don't let one crawl dominate
    the mixture" curation step (the dual of corpus_mix_resample's
    upweighting).

    Shape: one aggregate to source-domain-sized totals, broadcast back
    onto the corpus scan, then the same map-only integer-draw gate as
    weighted_sample_docs (draw < floor(rate·2^32); rate 1.0 keeps all
    — the 32-bit draw is always < 2^32). Expected kept tokens per
    gated source ≈ the budget; exact capping would need a sequential
    running sum (pack_sequences territory) for no curation benefit.
    Every step is engine-exact, so the oracle reproduces the kept set
    row-for-row.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.size(_tokens()).cast("bigint")
    per_source = (
        docs.select("source", toks.alias("t"))
        .groupBy("source")
        .agg(F.sum("t").alias("source_tokens"))
    )
    rate = F.least(
        F.lit(1.0),
        F.lit(float(BUDGET_TOKENS_PER_SOURCE))
        / F.col("source_tokens").cast("double"),
    )
    draw = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(BUDGET_SALT + ":"), F.col("doc_id").cast("string")
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return (
        docs.join(F.broadcast(per_source), "source")
        .filter(draw < F.floor(rate * F.lit(float(2**32))))
        .select("doc_id", "source", "source_tokens", toks.alias("ws_tokens"))
    )


def token_budget_oracle_sql() -> str:
    """DuckDB twin: nibble-reassembled 32-bit draw (shared pattern
    with weighted_sample_docs) against the per-source rate."""
    digest = f"md5('{BUDGET_SALT}:' || CAST(doc_id AS VARCHAR))"
    nibbles = " + ".join(
        f"(strpos('0123456789abcdef', substr({digest}, {k + 1}, 1)) - 1) "
        f"* {16 ** (7 - k)}"
        for k in range(8)
    )
    return f"""
        WITH t AS (
            SELECT doc_id, source,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens
            FROM documents
        ), s AS (
            SELECT source, CAST(SUM(ws_tokens) AS BIGINT) AS source_tokens
            FROM t GROUP BY source
        )
        SELECT doc_id, t.source, source_tokens, ws_tokens
        FROM t JOIN s ON t.source = s.source
        WHERE ({nibbles}) < FLOOR(
            LEAST(1.0, {float(BUDGET_TOKENS_PER_SOURCE)}
                        / CAST(source_tokens AS DOUBLE)) * {float(2**32)})
    """


# --- PII detection / redaction ---------------------------------------
# Pattern subset chosen to mean THE SAME THING in Java regex (Spark)
# and RE2 (DuckDB): bounded repeats and plain character classes only —
# no lookaround, no backreferences, no \b (word-boundary semantics
# differ at string edges across engines).
PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
PII_PHONE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"  # NNN-NNN-NNNN
PII_ID = "[0-9]{3}-[0-9]{2}-[0-9]{4}"  # NNN-NN-NNNN (SSN shape)


def doc_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII detection + redaction — the scrubbing pass a
    training-data pipeline runs before text leaves quarantine
    (complements doc_pseudonymize's token-blocklist approach with
    pattern-shaped entities: emails, phone numbers, SSN-like ids).

    The synthetic corpus contains no organic PII, so the entry first
    DERIVES a contaminated twin of each document — a deterministic
    contact trailer appended from doc_id (same construction in the
    oracle SQL, the duplicate-injector pattern of sources/generator) —
    then detects and redacts. Counts come from the DETECTION pass
    (regexp_extract_all length), the redacted text from three chained
    regexp_replace calls; ID before PHONE so the 3-2-4 shape is
    consumed before the 3-3-4 pattern scans. Everything is a per-row
    JVM string expression: map-only, one scan, zero shuffles —
    at 100 TB this runs at I/O speed like every other quality gate.
    """
    docs = load_table(spark, sf_dir, "documents")
    pii_text = F.concat(
        F.col("text"),
        F.lit(" Contact: user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com tel 555-"),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" ssn "),
        F.lpad((F.col("doc_id") % 900).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((F.col("doc_id") % 90).cast("string"), 2, "0"),
        F.lit("-"),
        F.lpad((F.col("doc_id") % 9000).cast("string"), 4, "0"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(pii_text, PII_EMAIL, "<EMAIL>"),
            PII_ID,
            "<ID>",
        ),
        PII_PHONE,
        "<PHONE>",
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(pii_text, F.lit(PII_EMAIL), F.lit(0)))
        .cast("bigint")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(pii_text, F.lit(PII_ID), F.lit(0)))
        .cast("bigint")
        .alias("n_ids"),
        F.size(F.regexp_extract_all(pii_text, F.lit(PII_PHONE), F.lit(0)))
        .cast("bigint")
        .alias("n_phones"),
        redacted.alias("text_redacted"),
    )


def pii_redact_oracle_sql() -> str:
    """DuckDB twin: identical derived trailer, identical patterns,
    identical replace order (ID consumed before PHONE)."""
    trailer = (
        "text || ' Contact: user' || CAST(doc_id AS VARCHAR)"
        " || '@example.com tel 555-'"
        " || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'"
        " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
        " || ' ssn '"
        " || lpad(CAST(doc_id % 900 AS VARCHAR), 3, '0') || '-'"
        " || lpad(CAST(doc_id % 90 AS VARCHAR), 2, '0') || '-'"
        " || lpad(CAST(doc_id % 9000 AS VARCHAR), 4, '0')"
    )
    return f"""
        WITH t AS (SELECT doc_id, {trailer} AS pii FROM documents)
        SELECT doc_id,
               CAST(len(regexp_extract_all(pii, '{PII_EMAIL}')) AS BIGINT)
                   AS n_emails,
               CAST(len(regexp_extract_all(pii, '{PII_ID}')) AS BIGINT)
                   AS n_ids,
               CAST(len(regexp_extract_all(pii, '{PII_PHONE}')) AS BIGINT)
                   AS n_phones,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(pii, '{PII_EMAIL}', '<EMAIL>', 'g'),
                       '{PII_ID}', '<ID>', 'g'),
                   '{PII_PHONE}', '<PHONE>', 'g') AS text_redacted
        FROM t
    """
