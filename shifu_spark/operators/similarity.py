"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exactness baseline; LSH (random
hyperplane) bucketing as the 100 TB path. Dot products run JVM-side via
``aggregate``/``zip_with`` (no Python in the loop).

Scale notes: brute force is O(Q·N) — fine for Q small with N partitioned
(each task scans its slice against the broadcast query set). The LSH
variant buckets vectors by sign-pattern against H fixed hyperplanes:
candidates share a bucket (shuffle = N rows once), then exact cosine
re-ranks — the standard recall/throughput trade.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    """Σ a_i·b_i in double, sequential fold (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def brute_force_topk(
    embeddings: DataFrame,
    query_filter: Column,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, rank, neighbor_id, cosine).

    Query set = rows matching ``query_filter`` (broadcast); ties broken
    by neighbor_id asc for determinism; self-matches excluded.
    """
    # precompute each side's norm ONCE — inlining cosine_expr would fold
    # both norms per (query, neighbor) pair, tripling the array work
    q = embeddings.filter(query_filter).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        norm_expr(F.col(vec_col)).alias("qnorm"),
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nvec"),
        norm_expr(F.col(vec_col)).alias("nnorm"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", dot_expr(F.col("qvec"), F.col("nvec")) / (F.col("qnorm") * F.col("nnorm")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cosine", 6).alias("cosine"))
        .orderBy("query_id", "rank")
    )


def hyperplane_bucket_expr(vec: Column, hyperplanes: list[list[float]]) -> Column:
    """Sign-pattern bucket id against fixed hyperplanes (random-projection
    LSH). Hyperplanes are literals — broadcast into codegen."""
    bucket = F.lit(0)
    for i, h in enumerate(hyperplanes):
        arr = F.array(*[F.lit(float(x)) for x in h])
        s = dot_expr(vec, arr)
        bucket = bucket + F.when(s >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    embeddings: DataFrame,
    query_filter: Column,
    hyperplanes: list[list[float]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates must share the LSH bucket with the
    query, then exact cosine re-rank. Recall < 1; throughput ~N/2^H."""
    b = hyperplane_bucket_expr(F.col(vec_col), hyperplanes)
    emb = embeddings.withColumn("bucket", b)
    # norms once per side, not per candidate pair (same trick as brute force)
    q = emb.filter(query_filter).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        norm_expr(F.col(vec_col)).alias("qnorm"),
        F.col("bucket"),
    )
    c = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nvec"),
        norm_expr(F.col(vec_col)).alias("nnorm"),
        "bucket",
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", dot_expr(F.col("qvec"), F.col("nvec")) / (F.col("qnorm") * F.col("nnorm")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cosine", 6).alias("cosine"))
        .orderBy("query_id", "rank")
    )


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs (doc-level semantic dedup):
    all pairs with cosine ≥ threshold. Test-scale exact form; at scale,
    bucket with :func:`hyperplane_bucket_expr` first."""
    a = embeddings.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), norm_expr(F.col(vec_col)).alias("na")
    )
    b = embeddings.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), norm_expr(F.col(vec_col)).alias("nb")
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", dot_expr(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )
