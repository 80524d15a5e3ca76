"""Similarity search over an embedding column (array<float>).

* :func:`cosine_topk_bruteforce` — exact top-k neighbors; broadcast the
  (small) query set against the corpus, dot products via ``F.zip_with`` +
  ``F.aggregate`` (JVM-side, no Python workers), per-query top-k via
  row_number window.
* :func:`cosine_topk_lsh` — the scale path: random-hyperplane (sign) LSH
  buckets; queries only score candidates sharing their bucket. Hyperplane
  components are a deterministic integer function of (plane, dim) so the
  whole thing remains engine-reproducible.

At 10^12 rows the brute-force path is per-query O(N) — the LSH path's
bucket join prunes to O(N / 2^n_planes) candidates per query and both paths
avoid any driver-side loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

N_PLANES = 8
PLANE_MOD = 997  # deterministic pseudo-random hyperplanes in [-0.498, 0.498]


def _as_double(col: str) -> F.Column:
    return F.transform(F.col(col), lambda x: x.cast("double"))


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_topk_bruteforce(
    spark: SparkSession, t, n_queries: int = 5, k: int = 10
) -> DataFrame:
    """Exact cosine top-k: query vectors are the first ``n_queries`` ids;
    corpus is everything else. Ties broken by vec_id asc."""
    emb = t["embeddings"].select(
        "vec_id", _as_double("embedding").alias("v")
    )
    queries = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    corpus = emb.where(F.col("vec_id") >= n_queries)
    joined = corpus.crossJoin(F.broadcast(queries))
    scored = joined.select(
        "query_id",
        "vec_id",
        F.round(
            _dot(F.col("qv"), F.col("v")) / (_norm(F.col("qv")) * _norm(F.col("v"))),
            6,
        ).alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
        .orderBy("query_id", "rank")
    )


def _bucket_expr(vcol: str) -> F.Column:
    """Sign-LSH bucket id: bit j = [ dot(v, h_j) >= 0 ], where
    h_j[d] = ((j*64 + d) * 2654435761 % PLANE_MOD) / PLANE_MOD - 0.5."""
    bits = []
    for j in range(N_PLANES):
        proj = F.aggregate(
            F.zip_with(
                F.col(vcol),
                F.sequence(F.lit(0), F.size(F.col(vcol)) - 1),
                lambda x, d: x
                * (
                    ((F.lit(j) * 64 + d) * F.lit(2654435761) % F.lit(PLANE_MOD))
                    .cast("double")
                    / F.lit(float(PLANE_MOD))
                    - F.lit(0.5)
                ),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit(1 << j)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def cosine_topk_lsh(
    spark: SparkSession, t, n_queries: int = 5, k: int = 10
) -> DataFrame:
    """Approximate cosine top-k: candidates share the query's sign-LSH
    bucket (bucket equality join), then exact rescoring + per-query top-k.
    Recall < 1 by design; rows-only correctness check."""
    emb = t["embeddings"].select(
        "vec_id", _as_double("embedding").alias("v")
    ).withColumn("bucket", _bucket_expr("v"))
    queries = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    corpus = emb.where(F.col("vec_id") >= n_queries)
    joined = corpus.join(
        F.broadcast(queries), F.col("bucket") == F.col("qbucket")
    )
    scored = joined.select(
        "query_id",
        "vec_id",
        F.round(
            _dot(F.col("qv"), F.col("v")) / (_norm(F.col("qv")) * _norm(F.col("v"))),
            6,
        ).alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
        .orderBy("query_id", "rank")
    )
