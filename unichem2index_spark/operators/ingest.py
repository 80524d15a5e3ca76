"""Webtext ingest: the north-rule input table -> indexable docs -> segments.

Input per BASELINE.json input_hint: ``(url:string, warc_ts:timestamp,
html:binary, text:string, lang:string)``. The pipeline mirrors the
reference's extract half (extractor/extractor.go:91-186 streams rows and
transforms each; here the transform is the HTML extractor instead of the
InChI divider) re-expressed Spark-first:

    webtext
      -> extract_text (Arrow pandas_udf, byte-identical to the pure oracle)
         FIRST, map-side — the heavy html binary never crosses a shuffle
      -> ONE range shuffle on url: dedup-by-url (latest warc_ts wins,
         T3 upsert semantics, extractor/loader.go:186) + deterministic
         dense doc_id = rank of url, fused in a single mapInPandas pass
      -> build_index (SPIMI -> skew-aware shuffle -> block-max segments)

Scale notes
-----------
* A global ``row_number() OVER (ORDER BY url)`` funnels the corpus through
  ONE reducer. Instead: range-partition by url (parallel sample-based
  partitioner), count kept rows per partition (tiny driver-side list), and
  add the exclusive prefix-sum offset to each partition-local rank — every
  stage stays fully parallel and the result is the identical dense rank.
* Extraction before the shuffle cuts shuffle bytes ~5-10x (html >> text)
  and is the right order at 10^12 docs: the binary column is dropped at
  the scan-adjacent stage, never serialized again.
* Dedup and rank share the same range shuffle: same-url rows are
  guaranteed co-located and ordered, so "keep newest per url" is a local
  streaming pass, not a second window shuffle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql import Window as W

from unichem2index_spark.functions.extract import extract_text_udf
from unichem2index_spark.operators.build import BuildResult, build_index
from unichem2index_spark.sources.tables import SegmentStore


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


def dedup_latest_by_url(webtext: DataFrame) -> DataFrame:
    """One row per url, newest warc_ts wins (window form — used standalone;
    the ingest hot path fuses this into the doc-id shuffle instead)."""
    w = W.partitionBy("url").orderBy(F.desc_nulls_last("warc_ts"))
    return (
        webtext.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def dedup_and_assign_doc_ids(
    df: DataFrame,
    key: str = "url",
    ts_col: str | None = "warc_ts",
    num_partitions: int | None = None,
) -> DataFrame:
    """Fused dedup-by-key + deterministic dense doc_id = rank of ``key``.

    1. ``repartitionByRange(key)``: partitions hold disjoint, ordered key
       ranges; same-key rows co-locate.
    2. Per-partition sort (key asc, ts desc) + streaming keep-first-per-key
       + local 0-based index over KEPT rows (one mapInPandas pass).
    3. Kept-row counts -> exclusive prefix sums on the driver (one tiny
       list, never row data) -> broadcast offsets.

    Equals ``row_number() OVER (ORDER BY key) - 1`` over the deduped set
    under ANY parallelism — the property BM25 rank-identity needs
    (SURVEY.md §7 hard-point 2). Ties on (key, ts): smallest remaining
    column tuple wins (fully deterministic).
    """
    if ts_col is None:
        ts_col = key  # degenerate: no dedup ordering column
    from pyspark import StorageLevel

    # Persist the INPUT before the range exchange: repartitionByRange runs
    # a separate bound-sampling job over its child, which would otherwise
    # re-execute everything upstream (including the Arrow html-extract
    # UDF) over the full corpus a second time. With the persist, the
    # sampling pass builds the (compressed) blocks and the shuffle-map
    # pass reads them back — extraction runs exactly once. Released below
    # as soon as the post-shuffle persist is materialized.
    pre = df.persist(StorageLevel.DISK_ONLY)
    ranged = None
    # try/finally: the full-corpus persists must not outlive a failure in
    # the count pass — `pre` is released on every path (its two scans,
    # bound sampling + shuffle map, are done once the collect returns),
    # and `ranged` (still needed downstream on success, exposed via
    # `_u2i_persisted`) is released on the failure path only.
    try:
        if num_partitions:
            ranged = pre.repartitionByRange(num_partitions, key)
        else:
            ranged = pre.repartitionByRange(key)
        other = [c for c in df.columns if c not in (key, ts_col)]
        ranged = ranged.sortWithinPartitions(
            F.asc(key), F.desc_nulls_last(ts_col), *[F.asc(c) for c in other]
        ).withColumn("_pid", F.spark_partition_id())
        # Persist so the count pass and the rank pass see the SAME range
        # boundaries (one shuffle, stable partitioning). DISK_ONLY:
        # building an in-memory object cache of the full corpus is
        # GC-bound at high task concurrency; local-disk re-reads are
        # cheap and this is also the only level that holds at cluster
        # scale.
        ranged = ranged.persist(StorageLevel.DISK_ONLY)

        out_schema = T.StructType(
            [T.StructField("doc_id", T.LongType(), False)]
            + list(ranged.schema.fields)
        )

        def keep_first_with_rank(batches):
            seen = 0
            last_key = None
            for pdf in batches:
                keys = pdf[key]
                keep_mask = []
                for k in keys:
                    keep_mask.append(k != last_key)
                    last_key = k
                kept = pdf[pd.Series(keep_mask, index=pdf.index)].copy()
                n = len(kept)
                kept.insert(0, "doc_id", range(seen, seen + n))
                seen += n
                yield kept

        with_rank = ranged.mapInPandas(keep_first_with_rank, out_schema)

        counts = {
            r._pid: r.n
            for r in with_rank.groupBy("_pid")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
    except BaseException:
        if ranged is not None:
            ranged.unpersist()
        raise
    finally:
        pre.unpersist()
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = df.sparkSession.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()],
        T.StructType(
            [
                T.StructField("_pid", T.IntegerType(), False),
                T.StructField("_offset", T.LongType(), False),
            ]
        ),
    )
    out = (
        with_rank.join(F.broadcast(off_df), "_pid")
        .withColumn("doc_id", F.col("doc_id") + F.col("_offset"))
        .drop("_pid", "_offset")
    )
    # Expose the persisted upstream so the pipeline owner can release it
    # once downstream materialization is done (heap left occupied during
    # query serving = GC pressure).
    out._u2i_persisted = ranged  # type: ignore[attr-defined]
    return out


def assign_doc_ids(
    df: DataFrame, key: str = "url", num_partitions: int | None = None
) -> DataFrame:
    """Deterministic dense doc_id = rank of unique ``key`` (no dedup)."""
    return dedup_and_assign_doc_ids(
        df, key=key, ts_col=None, num_partitions=num_partitions
    )


def webtext_docs(webtext: DataFrame) -> DataFrame:
    """Full ingest transform: extract -> fused dedup+doc_id (one shuffle).
    Output columns: ``doc_id, url, warc_ts, text, lang, source``
    (source = url host, the per-source analytics key)."""
    extracted = extracted_webtext(webtext)
    with_ids = dedup_and_assign_doc_ids(extracted, key="url", ts_col="warc_ts")
    out = with_ids.select(
        "doc_id",
        "url",
        "warc_ts",
        "text",
        "lang",
        F.parse_url(F.col("url"), F.lit("HOST")).alias("source"),
    )
    out._u2i_persisted = getattr(with_ids, "_u2i_persisted", None)  # type: ignore[attr-defined]
    return out


def build_index_from_webtext(
    spark: SparkSession,
    webtext: DataFrame,
    out_dir: str,
    n_shards: int = 8,
    resume: bool = False,
    build_id: str = "webtext",
    positions: bool = False,
) -> BuildResult:
    """End-to-end north-rule pipeline: webtext table -> BM25-ready segment
    index. The url<->doc_id mapping is persisted so query results can be
    joined back to urls (ES _id analog)."""
    docs = webtext_docs(webtext)
    store = SegmentStore(out_dir)

    def write_url_map() -> None:
        # Runs on a build_index driver thread overlapping the merge phase
        # (its input is the materialized ingest persist); joined before the
        # manifest commit, so an index never commits without its url_map.
        if not store.exists("url_map"):
            store.write_gen_partition(
                docs.select("doc_id", "url", "warc_ts", "lang", "source")
                .withColumn("gen", F.lit(0)),
                "url_map",
            )

    try:
        result = build_index(
            spark, docs, out_dir, n_shards=n_shards, resume=resume,
            build_id=build_id, aux_writes=[write_url_map],
            positions=positions,
        )
        write_url_map()  # no-op unless an early return skipped aux writes
    finally:
        persisted = getattr(docs, "_u2i_persisted", None)
        if persisted is not None:
            persisted.unpersist()
    return result
