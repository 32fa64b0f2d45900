"""Approximate-nearest-neighbor search over an embedding column.

  brute_force_topk   exact cosine top-k: query-set broadcast x full scan,
                     per-query row_number window — the correctness baseline
  lsh_topk           sign-bucketed candidate pruning (same buckets as
                     dedup.embedding_dup_pairs) then exact re-rank — the
                     scale path: each query only scores its bucket

All dot products / norms are JVM-side higher-order array expressions
(F.zip_with + F.aggregate) — no Python in the loop. At 100 TB the scan side
stays partition-parallel and the tiny query set broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _norm(v):
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k of each query vector against the corpus.

    queries: (query_id, embedding). Self-matches (same id) are kept; filter
    upstream if undesired. Returns (query_id, vec_id, cosine, rank)."""
    corpus = embeddings.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("cv"),
    ).withColumn("cn", _norm(F.col("cv")))
    q = queries.select(
        F.col(query_id_col), _as_double(F.col(vec_col)).alias("qv"),
    ).withColumn("qn", _norm(F.col("qv")))
    scored = corpus.crossJoin(F.broadcast(q)).withColumn(
        "cosine", _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def sign_bucket(vec_col, sign_bits: int = 8):
    """Axis-aligned sign-pattern bucket id over the first n dims."""
    v = _as_double(vec_col)
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(sign_bits - 1)),
        F.lit(0).cast("long"),
        lambda acc, i: acc * 2 + F.when(F.element_at(v, i + 1) >= 0, 1).otherwise(0),
    )


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    sign_bits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Bucketed ANN: candidates share the query's sign bucket; exact cosine
    re-rank inside the bucket. Recall < 1 by construction (documented);
    raise sign_bits for tighter buckets, lower for higher recall."""
    corpus = embeddings.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("cv"),
        sign_bucket(F.col(vec_col), sign_bits).alias("bucket"),
    ).withColumn("cn", _norm(F.col("cv")))
    q = queries.select(
        F.col(query_id_col), _as_double(F.col(vec_col)).alias("qv"),
        sign_bucket(F.col(vec_col), sign_bits).alias("bucket"),
    ).withColumn("qn", _norm(F.col("qv")))
    scored = corpus.join(F.broadcast(q), on="bucket").withColumn(
        "cosine", _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def embedding_stats(embeddings: DataFrame, group_col: str = "label",
                    vec_col: str = "embedding") -> DataFrame:
    """Per-group embedding statistics (mean L2 norm, count) — sanity/EDA op."""
    v = _as_double(F.col(vec_col))
    return (
        embeddings.withColumn("__n", _norm(v))
        .groupBy(group_col)
        .agg(F.avg("__n").alias("mean_norm"), F.count("*").alias("n"))
    )
