"""Deduplication operators for a large-scale training-data pipeline:
exact, MinHash+LSH, SimHash, and token-shingle Jaccard.

Everything stays JVM-side (explode / groupBy / join expressions — no Python
workers): hashes are integer arithmetic over dense token ids so the exact
same computation is expressible in the DuckDB oracle SQL.

Scale notes
-----------
* ``vocab_ids`` ranks the distinct vocabulary. At 10^12-doc scale the
  vocabulary is still orders of magnitude smaller than the corpus and the
  rank is a one-off job; the id table broadcasts (or bucket-joins) onto the
  token stream.
* LSH banding turns O(n²) near-dup search into a groupBy on band buckets —
  the shuffle key is (band_idx, band_value), and only bucket-mates join.
* Candidate verification (exact Jaccard) touches candidate pairs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from unichem2index_spark.functions.hashing import (
    BAND_SIZE,
    MINHASH_A,
    MINHASH_B,
    MOD,
    NUM_HASHES,
    SIMHASH_P,
)
from unichem2index_spark.functions.tokenize import tokens_col


def _tok(d: DataFrame) -> DataFrame:
    return d.select("doc_id", "source", tokens_col("text").alias("tokens"))


def vocab_ids(tok: DataFrame) -> DataFrame:
    """Dense token ids: row_number over the sorted distinct vocabulary.

    The single-partition window is fine here because the *distinct
    vocabulary* is tiny relative to the corpus; at extreme vocab sizes
    swap in rank-by-range (repartitionByRange + local ranks + offsets).
    """
    vocab = tok.select(F.explode("tokens").alias("term")).distinct()
    w = W.orderBy("term")
    return vocab.select(
        "term", (F.row_number().over(w) - 1).cast("long").alias("token_id")
    )


def doc_token_ids(d: DataFrame) -> DataFrame:
    """(doc_id, source, token_id) — DISTINCT tokens per doc (set semantics)."""
    tok = _tok(d)
    ids = vocab_ids(tok)
    return (
        tok.select("doc_id", "source", F.explode("tokens").alias("term"))
        .distinct()
        .join(F.broadcast(ids), "term")
        .select("doc_id", "source", "token_id")
    )


# ----------------------------------------------------------------- exact
def dedup_exact(spark: SparkSession, t) -> DataFrame:
    """Exact dedup by full text over a corpus with guaranteed duplicates
    (documents ∪ documents): keep min doc_id per text group."""
    d = t["documents"].select("doc_id", "text")
    doubled = d.unionAll(d)
    return (
        doubled.groupBy("text")
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("keeper_doc_id", "n_copies", F.md5(F.col("text").cast("binary")).alias("text_md5"))
        .orderBy("keeper_doc_id")
    )


# ----------------------------------------------------------------- MinHash
def minhash_signatures(d: DataFrame) -> DataFrame:
    """doc_id, source, m0..m15 — MinHash over distinct-token sets."""
    ids = doc_token_ids(d)
    aggs = [
        F.min((F.lit(a) * (F.col("token_id") + 1) + F.lit(b)) % F.lit(MOD)).alias(
            f"m{i}"
        )
        for i, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    ]
    return ids.groupBy("doc_id", "source").agg(*aggs)


def minhash_lsh_pairs(
    spark: SparkSession, t, threshold: float = 0.8
) -> DataFrame:
    """MinHash+LSH near-dup pairs: band bucketing → candidate pairs →
    exact-Jaccard verification (shingle→minhash→band→bucket-join)."""
    d = t["documents"]
    sig = minhash_signatures(d)
    n_bands = NUM_HASHES // BAND_SIZE
    band_cols = [
        F.struct(
            F.lit(bi).alias("band_idx"),
            F.concat_ws(
                "_", *[F.col(f"m{bi * BAND_SIZE + j}") for j in range(BAND_SIZE)]
            ).alias("band_val"),
        )
        for bi in range(n_bands)
    ]
    bands = sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("band")
    ).select("doc_id", "band.band_idx", "band.band_val")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.countDistinct("a.band_idx").alias("n_bands"))
    )
    # exact verification on candidates only
    ids = doc_token_ids(d).select("doc_id", "token_id")
    sizes = ids.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    ia, ib = ids.alias("ia"), ids.alias("ib")
    inter = (
        cand.join(ia, F.col("doc_a") == F.col("ia.doc_id"))
        .join(
            ib,
            (F.col("doc_b") == F.col("ib.doc_id"))
            & (F.col("ia.token_id") == F.col("ib.token_id")),
        )
        .groupBy("doc_a", "doc_b", "n_bands")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    out = (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            "n_bands",
            F.round(
                F.col("inter")
                / (F.col("sa.sz") + F.col("sb.sz") - F.col("inter")),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )
    return out


# ----------------------------------------------------------------- SimHash
def simhash_docs(d: DataFrame) -> DataFrame:
    """doc_id, simhash (16-bit, tf-weighted)."""
    tok = _tok(d)
    ids = vocab_ids(tok)
    counts = (
        tok.select("doc_id", F.explode("tokens").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .join(F.broadcast(ids), "term")
    )
    half = MOD // 2
    bit_sums = [
        F.sum(
            F.col("cnt")
            * F.when(
                ((F.col("token_id") + 1) * F.lit(p)) % F.lit(MOD) >= half,
                F.lit(1),
            ).otherwise(F.lit(-1))
        ).alias(f"s{j}")
        for j, p in enumerate(SIMHASH_P)
    ]
    per_doc = counts.groupBy("doc_id").agg(*bit_sums)
    sim = None
    for j in range(len(SIMHASH_P)):
        term = F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sim = term if sim is None else (sim + term)
    return per_doc.select("doc_id", sim.cast("long").alias("simhash"))


def simhash_groups(spark: SparkSession, t) -> DataFrame:
    """SimHash near-dup buckets: groups of docs sharing a 16-bit simhash."""
    return (
        simhash_docs(t["documents"])
        .groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
        .where(F.col("n_docs") > 1)
        .orderBy("simhash")
    )


# ------------------------------------------------------- n-gram Jaccard
def shingles_expr() -> str:
    """3-token shingles as a SQL expr over a `tokens` array column."""
    return (
        "CASE WHEN size(tokens) >= 3 THEN "
        "transform(sequence(0, size(tokens)-3), "
        "i -> concat_ws(' ', tokens[i], tokens[i+1], tokens[i+2])) "
        "ELSE array() END"
    )


def ngram_jaccard_pairs(
    spark: SparkSession, t, threshold: float = 0.5
) -> DataFrame:
    """Near-dup pairs by exact Jaccard over distinct 3-token shingles,
    restricted to same-source pairs (blocking key → bounded join)."""
    d = _tok(t["documents"])
    sh = (
        d.select("doc_id", "source", F.expr(shingles_expr()).alias("shingles"))
        .select("doc_id", "source", F.explode("shingles").alias("shingle"))
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.col("inter").alias("shared_shingles"),
            F.round(
                F.col("inter") / (F.col("sa.sz") + F.col("sb.sz") - F.col("inter")),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )
