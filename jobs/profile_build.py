"""Phase-level build profiler: times each build stage separately at the
current --master so per-phase scaling (2 vs 8 cores) can be compared.

Replicates build_index_from_webtext's action sequence with explicit
timers, using only public package functions — the phases are:

  p1_ingest   extract -> range shuffle -> fused dedup+rank (both passes)
  p2_tokstats tokenize persist + corpus stats agg
  p3_docs     forward docs table write
  p4_spimi    SPIMI runs persist (mapInPandas) + term_stats write
  p5_merge    (shard,term) k-way merge + block encode + segment write
  p6_urlmap   url_map write

Usage: spark-submit --master local[N] --py-files dist/u2i.zip \
    jobs/profile_build.py --input <webtext parquet> --out /tmp/profidx
"""

from __future__ import annotations

import argparse
import json
import shutil
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-shards", type=int, default=16)
    ap.add_argument("--metrics-out", default=None)
    args = ap.parse_args()

    from pyspark import StorageLevel
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from unichem2index_spark.operators.build import (
        corpus_stats,
        docs_table,
        merge_runs_to_segments,
        spimi_runs,
        term_stats_from_runs,
        tokenized_docs,
    )
    from unichem2index_spark.operators.ingest import webtext_docs
    from unichem2index_spark.sources.tables import SegmentStore

    spark = SparkSession.builder.appName("u2i-profile").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    shutil.rmtree(args.out, ignore_errors=True)
    store = SegmentStore(args.out)
    phases: dict[str, float] = {}

    webtext = spark.read.parquet(args.input)

    t0 = time.time()
    docs = webtext_docs(webtext)
    n = docs.count()  # materializes extract + range shuffle + rank passes
    phases["p1_ingest"] = round(time.time() - t0, 2)

    t0 = time.time()
    tok = tokenized_docs(docs).persist(StorageLevel.DISK_ONLY)
    stats = corpus_stats(tok)
    phases["p2_tokstats"] = round(time.time() - t0, 2)

    t0 = time.time()
    store.write_gen_partition(
        docs_table(tok).withColumn("gen", F.lit(0)), "docs"
    )
    phases["p3_docs"] = round(time.time() - t0, 2)

    t0 = time.time()
    runs = spimi_runs(tok, args.n_shards).persist()
    tstats = term_stats_from_runs(runs, stats["n_docs"])
    store.write_table(tstats, "term_stats", max_files=8)
    tstats = store.read(spark, "term_stats")
    phases["p4_spimi"] = round(time.time() - t0, 2)

    t0 = time.time()
    segments = merge_runs_to_segments(
        runs, tstats, stats["avgdl"], 128
    )
    store.write_segments(segments)
    phases["p5_merge"] = round(time.time() - t0, 2)

    t0 = time.time()
    # from the tok persist (url/warc_ts ride along) — the real build's
    # aux-write path; deriving from `docs` would re-materialize the
    # whole ingest a second time.
    store.write_gen_partition(
        tok.select("doc_id", "url", "warc_ts", "lang", "source")
        .withColumn("gen", F.lit(0)),
        "url_map",
    )
    phases["p6_urlmap"] = round(time.time() - t0, 2)

    out = {
        "master": spark.sparkContext.master,
        "n_docs": n,
        "phases": phases,
        "total": round(sum(phases.values()), 2),
    }
    line = json.dumps(out)
    print("PROFILE " + line)
    if args.metrics_out:
        with open(args.metrics_out, "w") as f:
            f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
