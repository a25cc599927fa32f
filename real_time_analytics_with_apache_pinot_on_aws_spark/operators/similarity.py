"""Embedding similarity search: brute-force cosine top-k + LSH-bucketed ANN (C2).

Spark-first: the dot product is ``aggregate(zip_with(a, b, (x,y)->x*y), ...)``
— a single codegen'd expression over the array column, no UDF.  Top-k per
query via window ``row_number`` (one shuffle on query id).

Scale path (100 TB of vectors):
- brute force = broadcast the (few) query vectors against the corpus — scans
  the corpus once, no corpus shuffle at all; this is the exact baseline.
- ANN = random-hyperplane sign LSH: bucket corpus vectors by a ``nbits``-bit
  signature, probe only matching buckets (optionally multi-probe).  Buckets
  are computed with deterministic pseudo-random planes derived from hashes,
  so signatures are reproducible across runs/clusters with no stored model.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def _norm(col: Column) -> Column:
    return F.sqrt(F.aggregate(col, F.lit(0.0), lambda s, x: s + x.cast("double") * x))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y), F.lit(0.0), lambda s, v: s + v
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector (self-matches excluded).

    ``queries`` is broadcast (it is small by construction); the corpus is
    scanned once with the score computed in codegen; per-query top-k uses a
    window over query_id — shuffle size = corpus x n_queries scored rows,
    bounded by selecting only (ids, score).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6))
        .select("query_id", "neighbor_id", "score")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def _plane_component(plane: int, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane component in [-1, 1).

    Derived from xxhash64(plane, dim) — reproducible everywhere, no RNG state,
    no model to persist (Date.now/random are unavailable by design here).
    """
    h = F.xxhash64(F.lit(plane), F.lit(dim))
    return (h % 10_000).cast("double") / 10_000.0


def lsh_signature(vec: Column, dim: int, nbits: int = 8) -> Column:
    """nbits-bit sign signature: bit i = sign(<vec, plane_i>)."""
    sig = F.lit(0)
    for p in range(nbits):
        proj = F.lit(0.0)
        # static unroll over dimensions: one codegen expression, no UDF
        for d in range(dim):
            proj = proj + F.element_at(vec, d + 1).cast("double") * _plane_component(p, d)
        sig = sig + F.when(proj > 0, F.lit(2**p)).otherwise(F.lit(0))
    return sig.cast("int")


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    nbits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's LSH bucket.

    Recall < 1.0 by design (single-probe).  At scale the corpus is
    pre-partitioned by signature so a probe touches one partition.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        lsh_signature(F.col(vec_col), dim, nbits).alias("sig"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        lsh_signature(F.col(vec_col), dim, nbits).alias("sig"),
    )
    scored = (
        c.join(F.broadcast(q), "sig")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6))
        .select("query_id", "neighbor_id", "score")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )
