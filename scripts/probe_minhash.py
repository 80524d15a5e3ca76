"""Stage-level probe for dedup_minhash (guide §1.4: noop-sink isolation).

Times each sub-stage of minhash_lsh_pairs separately so the expensive part
is identified before anything is changed. Not part of the frozen bench.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import functions as F

from unichem2index_spark.operators import dedup
from unichem2index_spark.session import get_spark
from unichem2index_spark.sources.tables import load_tables


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe_minhash")
    sc = spark.sparkContext
    t = load_tables(spark, sf_dir)
    d = t["documents"]
    d.count()  # warm scan

    # Full pipeline, twice (cold + warm)
    for tag in ("cold", "warm"):
        sc.setJobDescription(f"minhash full {tag}")
        t0 = time.time()
        mh = dedup.minhash_lsh_pairs(spark, t)
        n = mh.count()
        print(f"full_{tag}: {time.time()-t0:.2f}s rows={n}", flush=True)
        mh._u2i_persisted.unpersist()

    # Sub-stages
    tok = dedup._tok(d)
    sc.setJobDescription("tokenize only")
    t0 = time.time()
    noop(tok)
    print(f"tokenize_noop: {time.time()-t0:.2f}s", flush=True)

    sc.setJobDescription("vocab_ids")
    t0 = time.time()
    vids = dedup.vocab_ids(tok)
    noop(vids)
    print(f"vocab_ids_noop: {time.time()-t0:.2f}s vocab={vids.count()}", flush=True)

    sc.setJobDescription("doc_token_ids")
    t0 = time.time()
    ids = dedup.doc_token_ids(d).select("doc_id", "token_id")
    noop(ids)
    print(f"doc_token_ids_noop: {time.time()-t0:.2f}s", flush=True)

    sc.setJobDescription("ids persist+count")
    ids = dedup.doc_token_ids(d).select("doc_id", "token_id").persist(
        StorageLevel.DISK_ONLY
    )
    t0 = time.time()
    n_ids = ids.count()
    print(f"ids_persist_count: {time.time()-t0:.2f}s rows={n_ids}", flush=True)

    sc.setJobDescription("signatures from persisted ids")
    sig = dedup.minhash_signatures_from_ids(ids)
    t0 = time.time()
    noop(sig)
    print(f"signatures_noop: {time.time()-t0:.2f}s", flush=True)

    from unichem2index_spark.functions.hashing import BAND_SIZE, NUM_HASHES

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
    n_part = sc.defaultParallelism * 2
    bands = (
        sig.select("doc_id", F.explode(F.array(*band_cols)).alias("band"))
        .select("doc_id", "band.band_idx", "band.band_val")
        .repartition(n_part, "band_idx", "band_val")
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )
    sc.setJobDescription("candidates")
    t0 = time.time()
    n_cand = cand.count()
    print(f"candidates_count: {time.time()-t0:.2f}s cand={n_cand}", flush=True)

    sc.setJobDescription("docsets")
    docsets = ids.groupBy("doc_id").agg(F.collect_list("token_id").alias("toks"))
    t0 = time.time()
    noop(docsets)
    print(f"docsets_noop: {time.time()-t0:.2f}s", flush=True)

    sc.setJobDescription("verify join")
    da, db = docsets.alias("da"), docsets.alias("db")
    inter_c = F.size(F.array_intersect("da.toks", "db.toks"))
    out = (
        cand.join(da, F.col("doc_a") == F.col("da.doc_id"))
        .join(db, F.col("doc_b") == F.col("db.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            "n_bands",
            F.round(
                inter_c / (F.size("da.toks") + F.size("db.toks") - inter_c), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= 0.8)
        .orderBy("doc_a", "doc_b")
    )
    t0 = time.time()
    n_out = out.count()
    print(f"verify_count: {time.time()-t0:.2f}s out={n_out}", flush=True)
    ids.unpersist()


if __name__ == "__main__":
    main()
