"""Similarity search over embedding columns (SURVEY.md §2.8).

- brute-force top-k: broadcast the (small) query set against the corpus;
  cosine is a sequential JVM-side fold (functions.similarity.dot), rank
  via per-query window. At 100 TB the corpus side stays partitioned and
  the only wide step is the final per-query top-k merge
  (TakeOrderedAndProject shape after the window filter).
- hyperplane-LSH bucketed variant: both sides bucket on deterministic
  random hyperplanes; the join becomes bucket-equi — the scale path that
  trades recall for avoiding the full cross product. An IVF variant is
  the same plan with learned centroids instead of hyperplanes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import similarity as S

N_PLANES = 8
EMB_DIM = 64


def _cosine_col() -> "F.Column":
    return F.round(
        S.cosine(
            S.to_double(F.col("q.embedding")), S.to_double(F.col("c.embedding"))
        ),
        6,
    )


def brute_force_topk(
    emb: DataFrame, query_ids: list[int], k: int = 10
) -> DataFrame:
    """Exact cosine top-k per query (self excluded); rounded similarity is
    the rank key so ordering is engine-portable."""
    q = emb.filter(F.col("vec_id").isin(query_ids)).alias("q")
    c = emb.alias("c")
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("q.vec_id") != F.col("c.vec_id"))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            _cosine_col().alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def lsh_buckets(emb: DataFrame, n_planes: int = N_PLANES) -> DataFrame:
    """Deterministic hyperplane bucket per vector."""
    return emb.select(
        "vec_id",
        S.hyperplane_bucket(F.col("embedding"), n_planes, EMB_DIM).alias("bucket"),
    )


def lsh_bucketed_topk(
    emb: DataFrame, query_ids: list[int], k: int = 10, n_planes: int = N_PLANES
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's bucket."""
    with_bucket = emb.join(lsh_buckets(emb, n_planes), "vec_id")
    q = with_bucket.filter(F.col("vec_id").isin(query_ids)).alias("q")
    c = with_bucket.alias("c")
    scored = (
        F.broadcast(q)
        .join(c, F.col("q.bucket") == F.col("c.bucket"))
        .filter(F.col("q.vec_id") != F.col("c.vec_id"))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            _cosine_col().alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )
