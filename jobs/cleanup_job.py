"""spark-submit job: the fused training-data CLEANUP pass over webtext —
quality-filter signals (token count, mean token length, duplicate
3-gram ratio, stopword hits), repetition-collapse byte savings, and the
keep/drop verdict — one map-only scan + one tiny global aggregate.
Used by scripts/run_cleanup_scaling.py for the two-parallelism probe of
the training-prep suite (the map-only complement to the index-build
scaling headline)."""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("cleanup-job").getOrCreate()
    t0 = time.time()
    docs = spark.read.parquet(args.input).select("url", "text")
    toks = F.split(F.lower(F.col("text")), " ")
    n = F.size(toks)
    tok_chars = F.aggregate(
        F.transform(toks, lambda x: F.length(x).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    mean_len = tok_chars / F.greatest(n.cast("double"), F.lit(1.0))
    # At-scale variant of the oracle-checked dup_ngram_ratio: trigrams are
    # HASHED (xxhash64 of the three tokens), never materialized as strings
    # — same distinct-fraction semantics up to a ~1.7e-6 per-doc collision
    # probability, ~10x less per-row work. The string-exact form lives in
    # operators/trainprep.py where the DuckDB oracle checks it.
    grams = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(0), n - 3),
            lambda i: F.xxhash64(
                F.element_at(toks, i + 1),
                F.element_at(toks, i + 2),
                F.element_at(toks, i + 3),
            ),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    dup = F.when(
        F.size(grams) > 0,
        1.0
        - F.size(F.array_distinct(grams)).cast("double")
        / F.size(grams).cast("double"),
    ).otherwise(F.lit(0.0))
    stops = F.size(
        F.filter(toks, lambda x: x.isin(["the", "a", "of", "and", "is"]))
    )
    collapsed = F.filter(
        toks,
        lambda x, i: (i == F.lit(0))
        | (x != F.element_at(toks, F.greatest(i, F.lit(1)))),
    )
    keep = (
        n.between(15, 5000)
        & mean_len.between(2.0, 10.0)
        & (dup <= 0.05)
        & (stops >= 1)
    )
    out = docs.select(
        keep.alias("keep"),
        n.alias("n_tokens"),
        (F.size(toks) - F.size(collapsed)).alias("n_collapsed"),
    ).agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.col("keep").cast("long")).alias("kept"),
        F.sum("n_tokens").alias("tokens"),
        F.sum("n_collapsed").alias("collapsed"),
    )
    row = out.collect()[0]
    elapsed = time.time() - t0
    print(
        json.dumps(
            {
                "docs": row.docs,
                "kept": row.kept,
                "tokens": int(row.tokens),
                "collapsed": int(row.collapsed),
                "elapsed_sec": round(elapsed, 2),
                "docs_per_sec": round(row.docs / elapsed, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
