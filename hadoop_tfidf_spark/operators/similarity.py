"""Similarity search over an embedding column (``array<float>``): exact
brute-force cosine top-k as the correctness baseline, and a sign-bit
LSH-bucketed variant as the scale path. North-star engine surface — the
reference has nothing vector-shaped (SURVEY.md §2 gap table).

All vector math is built-in higher-order functions (``zip_with`` +
``aggregate``) evaluated JVM-side in codegen — no Python, no UDF. Elements
are cast to double before arithmetic so Spark and the DuckDB oracle
(``list_cosine_similarity`` on ``DOUBLE[]``) agree to well past the 6
rounded digits the declared queries compare.

Scale design (100 TB of embeddings):

* brute-force top-k is O(n·q) — correct baseline, used when the query set
  is small (it's a broadcast nested-loop join: the n-side streams, never
  shuffles, and per-partition TakeOrdered keeps memory flat).
* the LSH variant buckets vectors by the sign pattern of the first
  ``n_bits`` dimensions (coordinate hyperplanes — a valid random-projection
  family for centered data). Candidates come from an equi-join on the
  bucket id, cutting the scan to ~n/2^bits per query; recall/latency trades
  by ``n_bits``. An IVF refinement (k-means centroids) drops in by replacing
  ``sign_bucket`` with a nearest-centroid id — same join shape.
* dedup by embedding (cosine ≥ t) uses the same bucket as a blocking key on
  BOTH sides — an equi-join self-join, never the O(n²) cross join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array columns (double math, element order
    summation — matches the oracle's left-to-right sum)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array columns."""
    return dot(a, b) / (norm(a) * norm(b))


def sign_bucket(vec: Column, n_bits: int = 8) -> Column:
    """LSH bucket id in ``[0, 2^n_bits)``: bit ``d`` set iff element ``d+1``
    is positive (coordinate-hyperplane random projection)."""
    bits = [
        F.when(F.element_at(vec, d + 1) > 0, F.lit(1 << d)).otherwise(F.lit(0))
        for d in range(n_bits)
    ]
    total = bits[0]
    for b in bits[1:]:
        total = total + b
    return total.cast("int")


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: every query vector against the full corpus.

    ``queries`` is broadcast (small by contract); ranking uses the rounded
    score with id tie-breaks so results are total-ordered and
    engine-portable. Returns ``(query_id, vec_id, cos_sim, rn)``.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    joined = embeddings.crossJoin(F.broadcast(q)).where(
        F.col(id_col) != F.col("query_id")
    )
    scored = joined.select(
        "query_id",
        F.col(id_col).alias("vec_id"),
        F.round(cosine(F.col(vec_col), F.col("q_vec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .where(F.col("rn") <= k)
    )


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: candidates restricted to the query's LSH
    bucket, then exact cosine rank within it. Same output shape as
    :func:`brute_force_topk`; recall < 1 by design."""
    emb_b = embeddings.withColumn("bucket", sign_bucket(F.col(vec_col), n_bits))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        sign_bucket(F.col(vec_col), n_bits).alias("bucket"),
    )
    joined = emb_b.join(F.broadcast(q), "bucket").where(
        F.col(id_col) != F.col("query_id")
    )
    scored = joined.select(
        "query_id",
        F.col(id_col).alias("vec_id"),
        F.round(cosine(F.col(vec_col), F.col("q_vec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .where(F.col("rn") <= k)
    )


def embedding_near_dup(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs with LSH-bucket blocking:
    pairs must share a sign bucket (vectors with cosine ≥ 0.9 almost always
    do for centered data), then the exact cosine filter. Equi-join, not a
    cross join. Returns ``(id_a, id_b, cos_sim)`` with ``id_a < id_b``."""
    b = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        sign_bucket(F.col(vec_col), n_bits).alias("bucket"),
    )
    left = b.select("bucket", F.col("id").alias("id_a"), F.col("vec").alias("vec_a"))
    right = b.select("bucket", F.col("id").alias("id_b"), F.col("vec").alias("vec_b"))
    return (
        left.join(right, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
        .distinct()
    )
