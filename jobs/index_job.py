"""spark-submit entry: webtext -> inverted-index build -> BM25 query set.

The north-rule deployment shape (``spark-submit --py-files``):

    python scripts/package_pyfiles.py            # -> dist/unichem2index_spark.zip
    spark-submit --master local[32] \\
        --py-files dist/unichem2index_spark.zip \\
        jobs/index_job.py --input /path/webtext.parquet \\
        --out /tmp/idx --n-shards 32 --queries 20 --metrics-out m.json

On a real cluster only ``--master`` changes (yarn/k8s); the job itself is
cluster-agnostic — no local filesystem assumptions beyond --out, which
would be an object-store / Iceberg-warehouse URI there.

Phases, each timed into the metrics JSON:
  1. ingest+build: dedup -> Arrow extract -> deterministic doc_ids ->
     SPIMI -> skew-aware (shard,term) shuffle -> block-max segments,
     with per-shard lineage/metrics rows (resume with --resume).
  2. query: the frozen reference query set (synth.gen_queries) through
     block-max WAND; p50/p95 latency recorded.
"""

from __future__ import annotations

import argparse
import json
import statistics
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="webtext parquet path")
    ap.add_argument("--out", required=True, help="index output dir")
    ap.add_argument("--n-shards", type=int, default=32)
    ap.add_argument("--queries", type=int, default=20)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--metrics-out", default=None)
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument("--expect-cores", type=int, default=0,
                    help="block until this many executor cores register "
                    "(local-cluster/standalone: session creation returns "
                    "before the fleet is up; timing a build that starts "
                    "on a partial fleet is unfair to the level under test)")
    args = ap.parse_args()

    # Imports AFTER spark-submit has prepended --py-files to sys.path.
    from pyspark.sql import SparkSession

    from unichem2index_spark.operators import query as Q
    from unichem2index_spark.operators.ingest import build_index_from_webtext
    from unichem2index_spark.synth import gen_queries

    spark = SparkSession.builder.appName("u2i-index-job").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if args.expect_cores:
        deadline = time.time() + 120
        while (spark.sparkContext.defaultParallelism < args.expect_cores
               and time.time() < deadline):
            time.sleep(0.5)
    metrics: dict = {
        "master": spark.sparkContext.master,
        "default_parallelism": spark.sparkContext.defaultParallelism,
    }

    webtext = spark.read.parquet(args.input)

    if not args.skip_build:
        t0 = time.time()
        res = build_index_from_webtext(
            spark,
            webtext,
            args.out,
            n_shards=args.n_shards,
            resume=args.resume,
            build_id=f"job-{int(t0)}",
        )
        build_s = time.time() - t0
        metrics.update(
            {
                "n_docs": res.n_docs,
                "build_sec": round(build_s, 3),
                "build_docs_per_sec": round(res.n_docs / build_s, 2),
                "built_shards": len(res.built_shards),
            }
        )

    handle = Q.IndexHandle.open(spark, args.out, cache=True)
    if args.queries:
        # Untimed warmup: first query pays python-worker fleet cold start,
        # which is session overhead, not per-query serving latency.
        Q.bm25_topk_wand(spark, handle, ["the"], 1).collect()
    lat = []
    for q in gen_queries(args.queries, seed=42):
        t0 = time.time()
        rows = Q.bm25_topk_wand(spark, handle, q["terms"], q["k"]).collect()
        lat.append(time.time() - t0)
        assert len(rows) <= q["k"]
    if lat:
        lat_sorted = sorted(lat)
        metrics.update(
            {
                "n_queries": len(lat),
                "query_p50_sec": round(statistics.median(lat_sorted), 4),
                "query_p95_sec": round(
                    lat_sorted[max(0, int(len(lat_sorted) * 0.95) - 1)], 4
                ),
                "query_total_sec": round(sum(lat), 3),
            }
        )

    line = json.dumps(metrics)
    print("METRICS " + line)
    if args.metrics_out:
        with open(args.metrics_out, "w") as f:
            f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
