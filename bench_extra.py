"""Round-6 isolation benchmarks (guide §1.4: noop-sink / per-stage
timing, SEPARATE from the frozen bench.py).

Times the computation of each heavy operator in isolation so before/
after claims in OPTIMIZATION_r06.md are reproducible. Prints one line
per probe; not part of the driver's measurement.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from pyspark.sql import functions as F

    from unichem2index_spark.operators import dedup, query as Q, similarity
    from unichem2index_spark.operators.build import build_index
    from unichem2index_spark.session import get_spark
    from unichem2index_spark.sources.tables import load_tables
    from unichem2index_spark.synth import gen_queries

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("bench_extra", master=f"local[{cpus}]")
    sc = spark.sparkContext
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    docs.count()

    def p(name: str, sec: float, extra: str = "") -> None:
        print(f"{name}: {sec:.3f}s {extra}".rstrip(), flush=True)

    # ---- dedup_minhash: cold then warm (bench.py only ever sees cold) --
    for tag in ("cold", "warm"):
        sc.setJobDescription(f"minhash {tag}")
        t0 = time.time()
        mh = dedup.minhash_lsh_pairs(spark, t)
        n = mh.count()
        p(f"dedup_minhash_{tag}", time.time() - t0, f"rows={n}")
        mh._u2i_persisted.unpersist()

    # ---- index build: steady state (2nd build) ------------------------
    idx = tempfile.mkdtemp(prefix="u2i_extra_idx_")
    shutil.rmtree(idx, ignore_errors=True)
    build_index(spark, docs, idx, n_shards=max(8, int(cpus)), build_id="x0")
    shutil.rmtree(idx, ignore_errors=True)
    sc.setJobDescription("index_build steady")
    t0 = time.time()
    build_index(spark, docs, idx, n_shards=max(8, int(cpus)), build_id="x1")
    p("index_build_steady", time.time() - t0)

    # ---- serving: hot wand set + batch, steady ------------------------
    qset = gen_queries(20, seed=42)
    h = Q.IndexHandle.open(spark, idx, cache=True)
    for q in qset[:5]:
        Q.bm25_topk_wand(spark, h, q["terms"], q["k"]).collect()
    sc.setJobDescription("hot wand 20q")
    t0 = time.time()
    for q in qset:
        Q.bm25_topk_wand(spark, h, q["terms"], q["k"]).collect()
    p("bm25_wand_20q_hot", time.time() - t0)
    Q.bm25_topk_batch(spark, h, qset).count()
    sc.setJobDescription("batch 20q steady")
    t0 = time.time()
    Q.bm25_topk_batch(spark, h, qset).count()
    sec = time.time() - t0
    p("bm25_batch_20q_steady", sec, f"ms_per_query={sec / len(qset) * 1000:.1f}")

    # parallelism guard: the per-shard kernel must not run in one task
    import collections

    import pandas as pd

    seg = h.segments(spark).where(F.col("term").isin(["the", "merge"]))
    dist = (
        seg.groupBy("shard")
        .applyInPandas(
            lambda pp: pd.DataFrame({"s": [int(pp["shard"].iloc[0])]}), "s int"
        )
        .withColumn("pid", F.spark_partition_id())
        .toPandas()
    )
    cc = collections.Counter(dist["pid"])
    p("shard_kernel_partitions", 0.0, f"nonempty={len(cc)} max_groups={max(cc.values())}")
    h.close()
    shutil.rmtree(idx, ignore_errors=True)

    # ---- cosine_topk_ivf steady ---------------------------------------
    similarity.cosine_topk_ivf(spark, t).count()
    sc.setJobDescription("ivf steady")
    t0 = time.time()
    similarity.cosine_topk_ivf(spark, t).count()
    p("cosine_topk_ivf_steady", time.time() - t0)

    # ---- bm25_exact steady --------------------------------------------
    Q.bm25_topk_exact(docs, ["the", "merge", "vector"], 12).collect()
    sc.setJobDescription("bm25 exact steady")
    t0 = time.time()
    Q.bm25_topk_exact(docs, ["the", "merge", "vector"], 12).collect()
    p("bm25_exact_steady", time.time() - t0)


if __name__ == "__main__":
    main()
