"""Embedding-cosine near-duplicate detection — the 5th dedup modality
(exact / MinHash+LSH / SimHash / n-gram Jaccard / embedding-cosine).

Same OR-of-ANDs sign-LSH construction as ``similarity.cosine_topk_lsh``
but tuned for the near-DUP regime (cosine >= ~0.9, i.e. theta <= ~26deg):
more planes per table (b=6) prune harder, and the per-pair miss
probability at theta <= 12deg is (1 - 0.936^6)^8 ~ 1e-4 — low enough that
the DuckDB oracle can be the exact all-pairs computation and the blocked
Spark result still hash-matches it on the fixed fixtures.

The corpus is ``embeddings UNION twin(embeddings)`` where the twin
perturbs dim 0 by +0.2 (a deterministic, engine-identical transform):
the fixture's organic pairs top out at cosine ~0.51 while every twin
pair lands at 0.98+, so the operator demonstrably finds exactly the
planted near-dups — the embedding analog of ``dedup_exact``'s
``documents UNION documents`` trick.

Scale notes: bucket ids are computed map-side (pure JVM expressions);
the only shuffles are the bucket self-join (explicitly repartitioned on
the join key — see the AQE expansion note in ``dedup``) and the two
id-keyed joins that fetch candidate vectors for exact verification.
Nothing is quadratic in the corpus: candidates are bounded by bucket
collisions, which the b/L knobs control.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from unichem2index_spark.operators.similarity import (
    _as_double,
    _dot,
    _norm,
    _table_bucket_expr,
)

ND_TABLES = 8
ND_PLANES = 6
TWIN_OFFSET = 1_000_000
TWIN_DELTA = 0.2


def _twin(emb: DataFrame) -> DataFrame:
    """Deterministic near-duplicate of every vector: dim 0 += TWIN_DELTA."""
    return emb.select(
        (F.col("vec_id") + F.lit(TWIN_OFFSET)).alias("vec_id"),
        F.concat(
            F.array(F.element_at("v", 1) + F.lit(TWIN_DELTA)),
            F.slice("v", 2, F.size("v") - 1),
        ).alias("v"),
    )


def embedding_neardup_pairs(
    spark: SparkSession,
    t,
    threshold: float = 0.9,
    n_tables: int = ND_TABLES,
    n_planes: int = ND_PLANES,
) -> DataFrame:
    """(vec_a, vec_b, cosine) pairs with cosine >= threshold over the
    augmented corpus, found via multi-table sign-LSH blocking + exact
    rescoring of candidates."""
    emb = t["embeddings"].select("vec_id", _as_double("embedding").alias("v"))
    aug = emb.unionAll(_twin(emb))
    buckets = F.array(
        *[_table_bucket_expr("v", l, n_planes) for l in range(n_tables)]
    )
    n_part = aug.sparkSession.sparkContext.defaultParallelism * 2
    bucketed = (
        aug.select("vec_id", F.posexplode(buckets).alias("tbl", "bucket"))
        .repartition(n_part, "tbl", "bucket")
    )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )
    va, vb = aug.alias("va"), aug.alias("vb")
    return (
        cand.join(va, F.col("vec_a") == F.col("va.vec_id"))
        .join(vb, F.col("vec_b") == F.col("vb.vec_id"))
        .select(
            "vec_a",
            "vec_b",
            F.round(
                _dot(F.col("va.v"), F.col("vb.v"))
                / (_norm(F.col("va.v")) * _norm(F.col("vb.v"))),
                6,
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
        .orderBy("vec_a", "vec_b")
    )
