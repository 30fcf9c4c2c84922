"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (oracle-checked);
the LSH-bucketed variant is the scale path: random-hyperplane
signatures turn the n·m scoring into per-bucket scoring.

Exactness design: dot products and norms accumulate as FIXED-POINT
LONGS — each elementwise product is quantized once via
``floor(x*y*1e12)`` (floor of a double is IEEE-defined, no
rounding-mode ambiguity) and summed as 64-bit integers, which is
exact, associative, and commutative. The result is therefore
identical under any partitioning, on one core or 1000 executors, and
matches the DuckDB oracle computing the same expression bit-for-bit.
The only float ops afterwards are divide/sqrt on identical inputs —
correctly-rounded IEEE, so engine-identical too.

Overflow headroom: testdata embeddings are 64-dim with |x| ≤ 0.6, so
|floor(x·y·1e12)| ≤ 3.6e11 and a 64-dim sum ≤ 2.4e13 ≪ 2^63; even
4096-dim unit vectors stay < 4.1e15.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestion_pipeline_spark.sources.tables import load_table

TOP_K = 5
N_QUERIES = 10  # vec_id < 10 are the query vectors
N_PLANES = 16
FIXED_SCALE = 1e12  # fixed-point quantum for exact dot products


def _fixed_dot(a, b) -> F.Column:
    """Exact fixed-point dot product of two float-array columns, as double.

    Quantizes each product once (floor at 1e-12 resolution), then sums
    longs — see module docstring for why this is engine- and
    partitioning-independent.
    """
    terms = F.zip_with(
        a,
        b,
        lambda x, y: F.floor(
            (x.cast("double") * y.cast("double")) * F.lit(FIXED_SCALE)
        ),
    )
    total = F.aggregate(terms, F.lit(0).cast("long"), lambda acc, t: acc + t)
    return total.cast("double") / F.lit(FIXED_SCALE)


def _with_norm(df: DataFrame, vec: str = "embedding") -> DataFrame:
    return df.withColumn("nrm", F.sqrt(_fixed_dot(F.col(vec), F.col(vec))))


def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Queries (vec_id < N_QUERIES) are broadcast — the candidate side
    streams through once, so the plan reads the 100 TB embedding
    table exactly once regardless of query count. Ranking tie-breaks
    on neighbor_id.
    """
    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    c = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    scored = c.join(F.broadcast(q)).withColumn(
        "cosine", _fixed_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def hyperplane_signature(vec, n_planes: int = N_PLANES) -> F.Column:
    """Random-hyperplane LSH signature (packed into a long).

    Plane weights are pseudo-random but fully deterministic:
    w[p][d] = (xxhash64(p·100003 + d) % 1000003) − 501501 — a seeded
    hash in expression form, so signatures need no driver-side
    randomness and are reproducible everywhere. The projection sign
    uses the same fixed-point long accumulation as _fixed_dot, so the
    bit is partition-order independent.
    """
    dims = F.sequence(F.lit(0), F.size(vec) - 1)
    bit = lambda p: F.when(  # noqa: E731
        F.aggregate(
            F.zip_with(
                vec,
                dims,
                lambda x, d: F.floor(
                    x.cast("double")
                    * (
                        (F.xxhash64(F.lit(p) * 100003 + d) % 1000003) - F.lit(501501)
                    ).cast("double")
                    * F.lit(1e6)
                ),
            ),
            F.lit(0).cast("long"),
            lambda acc, t: acc + t,
        )
        > 0,
        F.lit(1).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    sig = None
    for p in range(n_planes):
        term = bit(p) * F.lit(1 << p).cast("long")
        sig = term if sig is None else sig + term
    return sig


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: score only candidates whose hyperplane
    signature is Hamming-close (here: equal in at least one of two
    8-bit bands) to the query's.

    The scale story: bucket keys replace the full cross product, so
    the scored pair count tracks bucket collision rates. Recall vs
    cosine_topk is measured in tests/test_similarity.py.
    """
    emb = _with_norm(load_table(spark, sf_dir, "embeddings")).withColumn(
        "sig", hyperplane_signature(F.col("embedding"))
    )
    bands = emb.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col("sig"), 8 * i)
                        .bitwiseAND(F.lit(0xFF))
                        .alias("bucket"),
                    )
                    for i in range(N_PLANES // 8)
                ]
            )
        ).alias("bb"),
    ).select("vec_id", "embedding", "nrm", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    q = bands.filter(F.col("vec_id") < N_QUERIES).select(
        "band",
        "bucket",
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    c = bands.filter(F.col("vec_id") >= N_QUERIES).select(
        "band",
        "bucket",
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    cand = (
        q.join(c, ["band", "bucket"])
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn(
            "cosine", _fixed_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
