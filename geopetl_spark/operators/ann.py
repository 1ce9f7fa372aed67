"""Similarity search over embedding columns.

* :func:`cosine_topk` — exact brute-force top-k (the correctness baseline):
  broadcast the (small) query set against the corpus, window top-k. At
  cluster scale the corpus side stays partitioned and never shuffles; only
  the per-partition top-k rows move (the final window input is ≤ k rows per
  query per partition after the partial prune).
* :func:`lsh_bucketed_topk` — the scale path: random-hyperplane LSH buckets
  (deterministic integer hyperplanes, cross-engine reproducible), equi-join
  on bucket, top-k within bucket. Recall < 1 by construction; bucket width
  (``n_bits``) trades recall for candidate count.
* :func:`embedding_near_dup_pairs` — cosine-threshold near-dup pairs.

All vector math is built-in (zip_with/aggregate → codegen); similarities are
rounded to 6dp for cross-engine hash determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.arrays import cosine, dot, to_double_array


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine (excludes self-matches).
    Ties break on neighbor id for full determinism."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("_qv"), F.col("_cv")).alias("similarity"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("similarity"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "similarity", "rank")
    )


def _hyperplane_sign_bits(vec, n_bits: int, dim: int):
    """Deterministic integer 'random' hyperplanes shared with the SQL oracle:
    w(d, j) = ((1103515245*(d + 31*j) + 12345) mod 2001) - 1000.
    Returns the bucket id column: sum_j sign_bit_j * 2^j."""
    v = to_double_array(vec)
    bucket = F.lit(0).cast("long")
    for j in range(n_bits):
        w_j = F.array(*[F.lit(float((1103515245 * (d + 31 * j) + 12345) % 2001 - 1000)) for d in range(dim)])
        s = dot(v, w_j)
        bucket = bucket + F.when(s > 0, F.lit(1 << j)).otherwise(F.lit(0)).cast("long")
    return bucket


def lsh_bucket(df: DataFrame, n_bits: int, dim: int, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("bucket", _hyperplane_sign_bits(F.col(vec_col), n_bits, dim))


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_bits: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's LSH bucket.
    The bucket equi-join replaces the cross join — at scale, corpus rows are
    hash-partitioned by bucket and only same-bucket pairs are scored."""
    qb = lsh_bucket(queries, n_bits, dim, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"), "bucket"
    )
    cb = lsh_bucket(corpus, n_bits, dim, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"), "bucket"
    )
    scored = (
        cb.join(F.broadcast(qb), ["bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col("_qv"), F.col("_cv")).alias("similarity"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("similarity"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "similarity", "rank")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim ≥ threshold).
    Brute force here (correctness baseline); the scale path blocks through
    :func:`lsh_bucket` first."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("_va"), F.col("_vb")).alias("similarity"))
        .filter(F.col("similarity") >= threshold)
    )
