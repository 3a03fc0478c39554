"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exactness baseline. Dot products are computed
  JVM-side with ``zip_with`` + ``aggregate`` (no Python); the k-cut is a window
  row_number with deterministic tie-break.
- LSH-bucketed (random hyperplane / SRP) variant: the scale path — queries only
  compare against same-bucket candidates; hyperplanes are a deterministic seeded
  pseudo-random matrix generated from (seed, dim) with splitmix arithmetic, so
  buckets are reproducible across runs and engines.
- IVF-style coarse quantization: assign vectors to the nearest of k seeded
  centroids (one pass), probe the nearest ``nprobe`` centroids at query time.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    query_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for each query (brute force).

    Plan shape: broadcast the (small) query side against the big vector table —
    a BroadcastNestedLoopJoin where each vector partition scores all queries
    JVM-side, then a per-query window keeps k. Tie-break: (score desc, vec_id).
    """
    q = queries.select(F.col(query_id).alias("_qid"), F.col(query_col).alias("_qv"))
    v = vectors.select(F.col(vec_id).alias("_vid"), F.col(vec_col).alias("_vv"))
    scored = v.crossJoin(F.broadcast(q)).select(
        F.col("_qid").alias(query_id),
        F.col("_vid").alias(vec_id),
        cosine(F.col("_vv"), F.col("_qv")).alias("score"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("score").desc(), F.col(vec_id))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    """Deterministic pseudo-random ±-ish hyperplanes from splitmix64 — no RNG state."""
    idx = np.arange(dim * n_planes, dtype=np.uint64) + np.uint64(seed) * np.uint64(0x9E3779B97F4A7C15)
    x = idx
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    x = x ^ (x >> np.uint64(31))
    vals = (x.astype(np.float64) / 2**64) * 2.0 - 1.0
    return vals.reshape(n_planes, dim)


def srp_bucket(vec: Column, dim: int, *, n_planes: int = 12, seed: int = 7) -> Column:
    """Signed-random-projection bucket id (JVM arithmetic over the plane matrix)."""
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for j in range(n_planes):
        w = planes[j]
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(c)) for c in w]),
                lambda x, c: x.cast("double") * c,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0))
    return bucket


def srp_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    dim: int,
    n_planes: int = 8,
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    query_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: compare only within matching SRP buckets (equi-join on
    bucket — the scale path; recall grows as n_planes shrinks)."""
    v = vectors.select(
        F.col(vec_id).alias("_vid"),
        F.col(vec_col).alias("_vv"),
        srp_bucket(F.col(vec_col), dim, n_planes=n_planes).alias("_bucket"),
    )
    q = queries.select(
        F.col(query_id).alias("_qid"),
        F.col(query_col).alias("_qv"),
        srp_bucket(F.col(query_col), dim, n_planes=n_planes).alias("_bucket"),
    )
    scored = v.join(F.broadcast(q), "_bucket").select(
        F.col("_qid").alias(query_id),
        F.col("_vid").alias(vec_id),
        cosine(F.col("_vv"), F.col("_qv")).alias("score"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("score").desc(), F.col(vec_id))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_near_dups(
    vectors: DataFrame,
    *,
    threshold: float = 0.95,
    dim: int,
    n_planes: int = 8,
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold, LSH-bucketed
    (id_a < id_b). The embedding-space member of the dedup family."""
    v = vectors.select(
        F.col(vec_id).alias("id"),
        F.col(vec_col).alias("v"),
        srp_bucket(F.col(vec_col), dim, n_planes=n_planes).alias("bucket"),
    )
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, "bucket")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine(F.col("a.v"), F.col("b.v")).alias("score"),
        )
        .filter(F.col("score") >= threshold)
        .distinct()
    )
