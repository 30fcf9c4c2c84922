"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (oracle-checked);
the LSH-bucketed variant is the scale path: random-hyperplane
signatures turn the n·m scoring into per-bucket scoring.

Exactness design: dot products and norms accumulate as DECIMAL so
the result is identical under any partitioning and matches the
single-threaded oracle bit-for-bit; the only float ops are the final
divide/sqrt, which are order-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestion_pipeline_spark.sources.tables import load_table

TOP_K = 5
N_QUERIES = 10  # vec_id < 10 are the query vectors
N_PLANES = 16


def _dec_dot(a, b) -> F.Column:
    """Exact dot product of two float-array columns, as double."""
    prods = F.zip_with(
        a, b, lambda x, y: (x.cast("double") * y.cast("double")).cast("decimal(38,12)")
    )
    return F.aggregate(
        prods,
        F.lit(0).cast("decimal(38,12)"),
        # re-cast: Spark widens/narrows decimal '+' to (38,11); the cast
        # keeps the exact 12-digit scale (values are ≪ the 26 integer digits)
        lambda acc, x: (acc + x).cast("decimal(38,12)"),
    ).cast("double")


def _with_norm(df: DataFrame, vec: str = "embedding") -> DataFrame:
    return df.withColumn("nrm", F.sqrt(_dec_dot(F.col(vec), F.col(vec))))


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
        "cosine", _dec_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
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
    randomness and are reproducible everywhere.
    """
    dims = F.sequence(F.lit(0), F.size(vec) - 1)
    bit = lambda p: F.when(  # noqa: E731
        F.aggregate(
            F.zip_with(
                vec,
                dims,
                lambda x, d: (
                    x.cast("double")
                    * (
                        (F.xxhash64(F.lit(p) * 100003 + d) % 1000003) - F.lit(501501)
                    ).cast("double")
                ).cast("decimal(38,6)"),
            ),
            F.lit(0).cast("decimal(38,6)"),
            lambda acc, x: (acc + x).cast("decimal(38,6)"),
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
            "cosine", _dec_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
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
