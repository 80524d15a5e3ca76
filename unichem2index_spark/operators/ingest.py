"""Webtext ingest: the north-rule input table -> indexable docs -> segments.

Input per BASELINE.json input_hint: ``(url:string, warc_ts:timestamp,
html:binary, text:string, lang:string)``. The pipeline mirrors the
reference's extract half (extractor/extractor.go:91-186 streams rows and
transforms each; here the transform is the HTML extractor instead of the
InChI divider) re-expressed Spark-first:

    webtext
      -> dedup by url, keep latest warc_ts        (T3 upsert semantics,
                                                   extractor/loader.go:186)
      -> extract_text (Arrow pandas_udf, byte-identical to the pure oracle)
      -> deterministic dense doc_id = rank of url  (stable across ANY
         parallelism — required for rank-identical BM25 results)
      -> build_index (SPIMI -> skew-aware shuffle -> block-max segments)

Scale note on doc_id assignment: a global ``row_number() OVER (ORDER BY
url)`` funnels the corpus through ONE reducer. Instead we range-partition
by url, count rows per partition (tiny driver-side list), and add the
exclusive prefix-sum offset to each partition-local rank — every stage
stays fully parallel and the result is the identical dense rank by url.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql import Window as W

from unichem2index_spark.functions.extract import extract_text_udf
from unichem2index_spark.operators.build import BuildResult, build_index


def dedup_latest_by_url(webtext: DataFrame) -> DataFrame:
    """One row per url, newest warc_ts wins (ties: stable on url only —
    identical urls with identical ts are exact duplicates by contract).
    The reference gets the same idempotency from doc_as_upsert keyed bulks.
    """
    w = W.partitionBy("url").orderBy(F.desc_nulls_last("warc_ts"))
    return (
        webtext.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def extracted_webtext(webtext: DataFrame) -> DataFrame:
    """Replace ``text`` with the frozen extractor's output over ``html``.

    Arrow-vectorized (no per-row Python, input_hint mandate); rows with a
    NULL html keep the provided text (Common Crawl WET-style fallback).
    """
    return webtext.select(
        "url",
        "warc_ts",
        F.when(
            F.col("html").isNotNull(), extract_text_udf(F.col("html"))
        )
        .otherwise(F.coalesce(F.col("text"), F.lit("")))
        .alias("text"),
        "lang",
    )


def assign_doc_ids(df: DataFrame, key: str = "url", num_partitions: int | None = None) -> DataFrame:
    """Deterministic dense doc_id = rank of ``key`` (0-based), computed
    without a global single-reducer sort.

    1. ``repartitionByRange(key)``: partitions hold disjoint, ordered key
       ranges (parallel sample-based partitioner).
    2. Per-partition sort + local 0-based index (mapInPandas, streaming).
    3. Partition row-counts -> exclusive prefix sums on the driver
       (one tiny list, never row data) -> broadcast offsets.

    The result equals ``row_number() OVER (ORDER BY key) - 1`` for unique
    keys under ANY parallelism — the property BM25 rank-identity needs
    (SURVEY.md §7 hard-point 2).
    """
    sc = df.sparkSession
    if num_partitions:
        ranged = df.repartitionByRange(num_partitions, key)
    else:
        ranged = df.repartitionByRange(key)
    ranged = ranged.sortWithinPartitions(key).withColumn(
        "_pid", F.spark_partition_id()
    )
    # Persist so the count pass and the rank pass see the SAME range
    # boundaries (and the extractor UDF upstream runs once, not twice).
    # At cluster scale this would be StorageLevel.DISK_ONLY or a checkpoint.
    ranged = ranged.persist()

    counts = {
        r._pid: r.n
        for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = sc.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()],
        T.StructType(
            [
                T.StructField("_pid", T.IntegerType(), False),
                T.StructField("_offset", T.LongType(), False),
            ]
        ),
    )

    out_schema = T.StructType(
        [T.StructField("doc_id", T.LongType(), False)] + list(ranged.schema.fields)
    )

    def add_local_rank(batches):
        seen = 0
        for pdf in batches:
            n = len(pdf)
            pdf = pdf.copy()
            pdf.insert(0, "doc_id", range(seen, seen + n))
            seen += n
            yield pdf

    with_rank = ranged.mapInPandas(add_local_rank, out_schema)
    return (
        with_rank.join(F.broadcast(off_df), "_pid")
        .withColumn("doc_id", F.col("doc_id") + F.col("_offset"))
        .drop("_pid", "_offset")
    )


def webtext_docs(webtext: DataFrame) -> DataFrame:
    """Full ingest transform: dedup -> extract -> doc_id. Output columns:
    ``doc_id, url, warc_ts, text, lang, source`` (source = url host, the
    per-source analytics key — counts_by_source analog)."""
    extracted = extracted_webtext(dedup_latest_by_url(webtext))
    with_ids = assign_doc_ids(extracted, key="url")
    return with_ids.select(
        "doc_id",
        "url",
        "warc_ts",
        "text",
        "lang",
        F.parse_url(F.col("url"), F.lit("HOST")).alias("source"),
    )


def build_index_from_webtext(
    spark: SparkSession,
    webtext: DataFrame,
    out_dir: str,
    n_shards: int = 8,
    resume: bool = False,
    build_id: str = "webtext",
) -> BuildResult:
    """End-to-end north-rule pipeline: webtext table -> BM25-ready segment
    index. The url<->doc_id mapping is persisted so query results can be
    joined back to urls (ES _id analog)."""
    docs = webtext_docs(webtext)
    result = build_index(
        spark, docs, out_dir, n_shards=n_shards, resume=resume, build_id=build_id
    )
    if not result.store.exists("url_map"):
        result.store.write_table(
            docs.select("doc_id", "url", "warc_ts", "lang", "source"), "url_map"
        )
    return result
