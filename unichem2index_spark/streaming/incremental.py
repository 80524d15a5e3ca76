"""Incremental / streaming semantics (SURVEY.md §2.8).

The reference is batch with explicit incremental machinery:

* T1 high-watermark resume (extractor/init.go:128-151): re-extract from
  ``max(doc_id) - overlap`` — :func:`watermark_increment`.
* T2 late-data repair with a fixed 15-day lookback
  (extractor/init.go:153-210) — :func:`lookback_repair_frame`.
* T3 upsert idempotency (doc_as_upsert, extractor/loader.go:186) —
  :func:`upsert_merge` (dedup-by-key MERGE semantics).

Plus a true Structured Streaming path: :func:`stream_windowed_counts`
(file-source readStream + watermark + tumbling window), used for streaming
ingest of new webtext partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def watermark_increment(
    source: DataFrame, indexed_docs: DataFrame, overlap: int = 10
) -> DataFrame:
    """T1: rows with doc_id >= max(indexed) - overlap (the reference's
    ``[last-10, last+10M)`` update window, extractor/init.go:148-149)."""
    last = indexed_docs.agg(F.max("doc_id").alias("m"))
    return source.join(F.broadcast(last)).where(
        F.col("doc_id") >= F.col("m") - overlap
    ).drop("m")


def lookback_repair_frame(
    source: DataFrame,
    ts_col: str,
    max_indexed_ts,
    lookback_days: int = 15,
) -> DataFrame:
    """T2: everything updated since (index max ts - lookback) —
    extractor/init.go:195-205's semi-join input."""
    cutoff = F.lit(max_indexed_ts) - F.expr(f"INTERVAL {lookback_days} DAYS")
    return source.where(
        F.col(ts_col).isNotNull() & (F.col(ts_col) >= cutoff)
    )


def upsert_merge(
    current: DataFrame, updates: DataFrame, key: str = "doc_id"
) -> DataFrame:
    """T3: MERGE-style upsert — updates win over current on key collisions.

    On Iceberg this is ``MERGE INTO ... WHEN MATCHED UPDATE WHEN NOT
    MATCHED INSERT``; expressed here engine-neutrally as a
    prioritized dedup (no full-table rewrite semantics implied)."""
    tagged = updates.withColumn("_prio", F.lit(0)).unionByName(
        current.withColumn("_prio", F.lit(1))
    )
    w = W.partitionBy(key).orderBy("_prio")
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_prio", "_rn")
    )


def stream_windowed_counts(
    spark: SparkSession,
    input_dir: str,
    schema,
    ts_col: str = "warc_ts",
    window: str = "1 hour",
    watermark: str = "15 days",
):
    """Structured Streaming: file source → watermark → tumbling-window
    counts per lang. Callers attach their own sink/trigger
    (tests use ``availableNow`` + memory sink)."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col("lang"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            F.col("w.start").alias("window_start"),
            "lang",
            "n_docs",
        )
    )


def batch_windowed_counts(spark: SparkSession, t) -> DataFrame:
    """Batch twin of the streaming aggregation (oracle-checkable):
    tumbling 1-hour windows over events."""
    return (
        t["events"]
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .orderBy("window_start", "event_type")
    )


def stream_index_webtext(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    schema=None,
    checkpoint: str | None = None,
    n_shards: int = 8,
):
    """Continuous index maintenance: Structured Streaming file source over
    a growing directory of webtext parquet, each micro-batch folded into
    the index as one segment generation (``foreachBatch`` →
    :func:`operators.update.add_generation`; the first batch builds the
    base index). Runs with ``availableNow`` — callers invoke repeatedly
    (or swap the trigger) for a long-lived stream.

    Exactly-once-per-batch semantics come from two layers: the streaming
    checkpoint replays a failed micro-batch, and the replay is safe
    because (a) an UNcommitted generation's partitions are invisible and
    get overwritten by the retry (the SegmentStore gen-gating contract),
    and (b) a batch whose generation DID commit before the crash is
    re-applied as url-keyed upserts — the reference's doc_as_upsert
    idempotency (extractor/loader.go:186), at the cost of one extra
    generation that the next compaction folds away.
    """
    from unichem2index_spark.operators.ingest import build_index_from_webtext
    from unichem2index_spark.operators.update import add_generation
    from unichem2index_spark.sources.tables import SegmentStore

    if schema is None:
        from unichem2index_spark.schemas import WEBTEXT_SCHEMA as schema  # noqa: N811

    stream = spark.readStream.schema(schema).parquet(input_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        s = batch_df.sparkSession
        if SegmentStore(index_dir).exists():
            add_generation(s, index_dir, batch_df, build_id=f"stream-{batch_id}")
        else:
            build_index_from_webtext(
                s, batch_df, index_dir,
                n_shards=n_shards, build_id=f"stream-{batch_id}",
            )

    return (
        stream.writeStream.foreachBatch(process)
        .option(
            "checkpointLocation",
            checkpoint or os.path.join(index_dir, "_stream_checkpoint"),
        )
        .trigger(availableNow=True)
        .start()
    )


def stream_percolate(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    queries: list[tuple[int, list[str], int]],
    phrase_queries: list[tuple[int, list[str]]] | None = None,
    schema=None,
    checkpoint: str | None = None,
):
    """Streaming percolation — the ES alerting/watcher pipeline: a file
    stream of incoming docs, each micro-batch matched against the
    broadcast stored-query registry (operators/query.py::percolate),
    matches appended to a parquet sink of (query_id, doc_id, batch_id)
    notifications. The registry join is map-side per batch (broadcast,
    no shuffle beyond percolate's own pair groupBy), so the stream
    sustains registry sizes that ES evaluates doc-by-doc.

    availableNow trigger. Delivery contract: foreachBatch is
    at-least-once, so the sink is made IDEMPOTENT instead — matches are
    partitioned by batch_id and written with dynamic partition
    overwrite, so a replay of batch N atomically replaces exactly
    partition batch_id=N (effective exactly-once per batch, the
    standard Spark idempotent-foreachBatch pattern). doc_id is derived
    deterministically from row content (xxhash64(url)), never
    monotonically_increasing_id, so the two plan branches that
    reference ``docs`` (percolate input and the url join) agree under
    any recomputation or repartitioning."""
    import os as _os

    from unichem2index_spark.operators.query import percolate

    if schema is None:
        from unichem2index_spark.schemas import WEBTEXT_SCHEMA as schema  # noqa: N811

    stream = spark.readStream.schema(schema).parquet(input_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        docs = batch_df.select(
            F.xxhash64("url").alias("doc_id"), "text", "url"
        )
        hits = percolate(
            batch_df.sparkSession,
            docs,
            queries,
            phrase_queries=phrase_queries,
        )
        out = hits.join(docs.select("doc_id", "url"), "doc_id").select(
            "query_id", "url", F.lit(batch_id).alias("batch_id")
        )
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(_os.path.join(out_dir, "matches"))
        )

    return (
        stream.writeStream.foreachBatch(process)
        .option(
            "checkpointLocation",
            checkpoint or _os.path.join(out_dir, "_checkpoint"),
        )
        .trigger(availableNow=True)
        .start()
    )
