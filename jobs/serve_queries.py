"""spark-submit entry: the QUERY-SERVING twin of jobs/index_job.py — open
an existing index hot (``cache=True``: segments pinned in executor
memory, the ES hot-index analog) and drain a query workload through the
batched serving paths.

    spark-submit --master <cluster> \\
        --py-files dist/unichem2index_spark.zip \\
        jobs/serve_queries.py --index /path/to/idx \\
        --queries 200 --rounds 3 --metrics-out serve.json

Workload per round (all steady-state serving shapes — ONE Spark job per
batch, never per query):
  1. bm25_topk_batch      — the whole term-query set in one job
  2. per-query WAND loop  — p50/p95 latency of the interactive path
  3. phrase_topk_batch    — a phrase set in one job (positional indexes
                            only; skipped with a note otherwise)

The first round pays plan/Python-worker setup and the cache fill; later
rounds are the serving numbers (all rounds reported so the warmup cost
stays disclosed — same policy as bench.py).
"""

from __future__ import annotations

import argparse
import json
import statistics
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True, help="index dir (from index_job)")
    ap.add_argument("--queries", type=int, default=100)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--latency-sample", type=int, default=20,
                    help="per-query loop size for the p50/p95 probe")
    ap.add_argument("--metrics-out", default=None)
    args = ap.parse_args()

    # Imports AFTER spark-submit has prepended --py-files to sys.path.
    from pyspark.sql import SparkSession

    from unichem2index_spark.operators import query as Q
    from unichem2index_spark.synth import gen_queries

    spark = SparkSession.builder.appName("u2i-serve-job").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    handle = Q.IndexHandle.open(spark, args.index, cache=True)
    qset = gen_queries(args.queries, seed=42)
    for q in qset:
        q["k"] = args.k
    phrase_set = [
        {"query_id": i, "phrase": p, "k": args.k}
        for i, p in enumerate(
            [["merge", "group"], ["the", "merge"], ["group", "by"],
             ["filter", "merge"], ["the", "vector"]]
        )
    ]

    metrics: dict = {
        "master": spark.sparkContext.master,
        "n_queries": len(qset),
        "rounds": [],
    }
    for rnd in range(args.rounds):
        r: dict = {"round": rnd}
        t0 = time.time()
        n = Q.bm25_topk_batch(spark, handle, qset).count()
        r["batch_sec"] = round(time.time() - t0, 3)
        r["batch_rows"] = n
        r["batch_ms_per_query"] = round(r["batch_sec"] / len(qset) * 1e3, 2)

        lat = []
        for q in qset[: args.latency_sample]:
            tq = time.time()
            Q.bm25_topk_wand(spark, handle, q["terms"], q["k"]).collect()
            lat.append(time.time() - tq)
        lat.sort()
        r["wand_p50_sec"] = round(statistics.median(lat), 4)
        r["wand_p95_sec"] = round(lat[max(0, int(len(lat) * 0.95) - 1)], 4)

        if handle.has_positions:
            t0 = time.time()
            Q.phrase_topk_batch(spark, handle, phrase_set).count()
            r["phrase_batch_sec"] = round(time.time() - t0, 3)
        else:
            r["phrase_batch_sec"] = None  # tf-only index: no positions
        metrics["rounds"].append(r)
        print(json.dumps(r), flush=True)

    if args.metrics_out:
        with open(args.metrics_out, "w") as f:
            json.dump(metrics, f, indent=2)
    print(json.dumps({"done": True, "rounds": len(metrics["rounds"])}))


if __name__ == "__main__":
    main()
