"""Incremental index maintenance: generation appends + compaction.

The reference's update mode (`-u`, main.go:112-115) re-extracts a key window
and re-upserts into ES; Lucene underneath turns that into new segments plus
tombstones on the replaced docs, folded together by background merges. This
module implements that contract natively:

* :func:`add_generation` — index a new webtext batch as segment generation
  g+1. Replaced urls (doc_as_upsert analog, extractor/loader.go:186) get
  their OLD doc_id tombstoned in ``deletes`` and a NEW doc_id in the new
  generation. Corpus stats (N, avgdl, df/idf) are updated to cover every
  posting physically in the index — including tombstoned docs, exactly like
  Lucene's BM25 stats before a merge — so scoring is well-defined and
  reproducible at any point between compactions.
* :func:`compact` — fold all generations into gen 0: decode, drop
  tombstoned postings, re-chunk, recompute stats over live docs only.
  After compaction, scores equal a fresh build over the live corpus
  (same doc_ids — compaction never renumbers).

Scale notes: each stage is the same shuffle shape as the base build
(mapInPandas decode → groupBy(shard, term) applyInPandas re-chunk); the
deletes set rides along as a broadcast (per-shard bitmap files at real
scale). Generations are separate parquet partitions (``gen=<g>/shard=<s>``)
so queries prune by term within every generation independently and a
generation append never rewrites existing files — object-store friendly.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from unichem2index_spark.functions import bm25
from unichem2index_spark.functions.codec import PostingBlock, chunk_postings
from unichem2index_spark.operators.build import (
    docs_table,
    idf_col,
    merge_runs_to_segments,
    spimi_runs,
    term_stats_from_runs,
    tokenized_docs,
)
from unichem2index_spark.operators.ingest import (
    dedup_and_assign_doc_ids,
    extracted_webtext,
)
from unichem2index_spark.schemas import (
    DELETES_SCHEMA,
    SEGMENT_SCHEMA,
    TERM_STATS_SCHEMA,
)
from unichem2index_spark.sources.tables import SegmentStore


@dataclass
class UpdateResult:
    store: SegmentStore
    gen: int
    n_new_docs: int
    n_replaced: int
    elapsed_sec: float


def _current_url_map(spark: SparkSession, store: SegmentStore) -> DataFrame:
    """url -> live doc_id (tombstoned mappings excluded)."""
    um = store.read(spark, "url_map")
    if store.exists("deletes"):
        dele = store.read(spark, "deletes").select("doc_id")
        um = um.join(F.broadcast(dele), "doc_id", "left_anti")
    return um


def add_generation(
    spark: SparkSession,
    index_dir: str,
    new_webtext: DataFrame,
    build_id: str = "update",
) -> UpdateResult:
    t0 = time.time()
    store = SegmentStore(index_dir)
    mf = store.read_manifest()
    n_shards, block_size = mf["n_shards"], mf["block_size"]
    gen = max(mf.get("generations", [0])) + 1
    next_id = mf["next_doc_id"]

    with_ids = dedup_and_assign_doc_ids(
        extracted_webtext(new_webtext), key="url", ts_col="warc_ts"
    ).withColumn("doc_id", F.col("doc_id") + F.lit(next_id))
    new_docs = with_ids.select(
        "doc_id",
        "url",
        "warc_ts",
        "text",
        "lang",
        F.parse_url(F.col("url"), F.lit("HOST")).alias("source"),
    ).persist()

    # Tombstone live docs whose url is being replaced (doc_as_upsert).
    # Materialized EAGERLY: the plan reads url_map, which gains this very
    # batch's rows below — a lazy re-evaluation would tombstone the new docs.
    replaced_rows = (
        _current_url_map(spark, store)
        .join(new_docs.select(F.col("url").alias("u")), F.col("url") == F.col("u"), "left_semi")
        .select("doc_id")
        .withColumn("gen", F.lit(gen))
        .collect()
    )
    n_replaced = len(replaced_rows)

    tok = tokenized_docs(new_docs).persist()
    batch = tok.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("doclen").alias("tt"),
        F.max("doc_id").alias("mx"),
    ).collect()[0]
    n_new, new_tokens = int(batch.n), int(batch.tt or 0)
    if n_new == 0:
        return UpdateResult(store, gen, 0, 0, time.time() - t0)

    # Index-wide stats: every posting physically present counts (tombstoned
    # docs included until compaction — the Lucene pre-merge contract).
    n_total = mf["n_docs"] + n_new
    total_tokens = mf["total_tokens"] + new_tokens
    avgdl = float(total_tokens) / float(n_total)

    runs = spimi_runs(tok, n_shards).persist()
    delta_stats = runs.groupBy("term").agg(
        F.sum("n_docs").alias("df_d"), F.sum("cf").alias("cf_d")
    )
    old_stats = store.read(spark, "term_stats").select("term", "df", "cf")
    combined = (
        old_stats.join(delta_stats, "term", "full_outer")
        .select(
            "term",
            (F.coalesce("df", F.lit(0)) + F.coalesce("df_d", F.lit(0))).alias("df"),
            (F.coalesce("cf", F.lit(0)) + F.coalesce("cf_d", F.lit(0))).alias("cf"),
        )
        .withColumn("idf", idf_col(n_total))
    )
    # Stage the new stats next to the old, swap at the end (atomic-last).
    store.write_table(combined, "term_stats_next", max_files=8)
    tstats = store.read(spark, "term_stats_next")

    segments = merge_runs_to_segments(runs, tstats, avgdl, block_size, gen=gen)
    store.write_segments(segments)

    store.append_table(docs_table(tok), "docs")
    store.append_table(
        new_docs.select("doc_id", "url", "warc_ts", "lang", "source"), "url_map"
    )
    if n_replaced:
        store.append_table(
            spark.createDataFrame(replaced_rows, DELETES_SCHEMA), "deletes"
        )

    seg_read = store.read(spark, "segments").where(F.col("gen") == gen)
    lineage = (
        seg_read.groupBy("shard")
        .agg(
            F.sum("n_docs").alias("postings"),
            F.count(F.lit(1)).alias("blocks"),
            F.sum(
                F.length("doc_gaps") + F.length("tfs") + F.length("dls")
            ).alias("bytes"),
        )
        .withColumn("build_id", F.lit(f"{build_id}-g{gen}"))
        .withColumn("status", F.lit("done"))
        .withColumn("elapsed_sec", F.lit(time.time() - t0))
    )
    docs_per_shard = tok.groupBy(
        (F.col("doc_id") % n_shards).cast("int").alias("shard")
    ).agg(F.count(F.lit(1)).alias("docs"))
    lineage = lineage.join(docs_per_shard, "shard", "left").select(
        "shard", "build_id", "status",
        F.coalesce("docs", F.lit(0)).alias("docs"),
        "postings", "blocks", "bytes", "elapsed_sec",
    )
    store.append_lineage(lineage)

    # Swap stats + manifest last: a crash before this point leaves the old
    # manifest/stats valid and the new gen partitions unreferenced (the
    # resume/idempotency contract, SURVEY.md §7 hard-point 5).
    store.swap_table("term_stats_next", "term_stats")
    mf.update(
        {
            "n_docs": n_total,
            "total_tokens": total_tokens,
            "avgdl": avgdl,
            "next_doc_id": int(batch.mx) + 1,
            "generations": sorted(set(mf.get("generations", [0])) | {gen}),
        }
    )
    store.write_manifest(mf)
    tok.unpersist()
    runs.unpersist()
    new_docs.unpersist()
    ranged = getattr(with_ids, "_u2i_persisted", None)
    if ranged is not None:
        ranged.unpersist()
    return UpdateResult(store, gen, n_new, n_replaced, time.time() - t0)


# ---------------------------------------------------------------- compact
def _recount_partials(deleted: frozenset[int]):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            terms, dfs, cfs = [], [], []
            for term, gaps, tfs, dls in zip(
                pdf["term"], pdf["doc_gaps"], pdf["tfs"], pdf["dls"]
            ):
                blk = PostingBlock.decode(bytes(gaps), bytes(tfs), bytes(dls))
                live = [
                    (d, tf) for d, tf in zip(blk.doc_ids, blk.tfs)
                    if d not in deleted
                ]
                if not live:
                    continue
                terms.append(term)
                dfs.append(len(live))
                cfs.append(sum(tf for _, tf in live))
            yield pd.DataFrame({"term": terms, "df": dfs, "cf": cfs})

    return fn


def _compact_group(deleted: frozenset[int], avgdl: float, block_size: int):
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        term = str(pdf["term"].iloc[0])
        idf_t = float(pdf["idf"].iloc[0])
        pdf = pdf.sort_values(["gen", "block_id"])
        ids: list[int] = []
        tfs: list[int] = []
        dls: list[int] = []
        for gaps, btfs, bdls in zip(pdf["doc_gaps"], pdf["tfs"], pdf["dls"]):
            blk = PostingBlock.decode(bytes(gaps), bytes(btfs), bytes(bdls))
            for d, tf, dl in zip(blk.doc_ids, blk.tfs, blk.dls):
                if d not in deleted:
                    ids.append(d)
                    tfs.append(tf)
                    dls.append(dl)
        out = []
        for block_id, blk in enumerate(chunk_postings(ids, tfs, dls, block_size)):
            g, t_, d_ = blk.encode()
            bms = max(
                bm25.score_term(tf, dl, avgdl, idf_t)
                for tf, dl in zip(blk.tfs, blk.dls)
            )
            out.append(
                {
                    "gen": 0,
                    "shard": shard,
                    "term": term,
                    "block_id": block_id,
                    "n_docs": len(blk.doc_ids),
                    "max_doc_id": blk.doc_ids[-1],
                    "doc_gaps": g,
                    "tfs": t_,
                    "dls": d_,
                    "block_max_tf": int(max(blk.tfs)),
                    "block_min_dl": int(min(blk.dls)),
                    "block_max_score": bms,
                }
            )
        return pd.DataFrame(out, columns=[f.name for f in SEGMENT_SCHEMA.fields])

    return fn


def compact(spark: SparkSession, index_dir: str) -> dict:
    """Fold all generations into gen 0, dropping tombstoned postings and
    recomputing stats over live docs only. Idempotent; no doc renumbering."""
    t0 = time.time()
    store = SegmentStore(index_dir)
    mf = store.read_manifest()
    deleted = (
        frozenset(
            r.doc_id for r in store.read(spark, "deletes").collect()
        )
        if store.exists("deletes")
        else frozenset()
    )

    # Live corpus stats from the forward docs table.
    docs = store.read(spark, "docs")
    if deleted:
        dele_df = store.read(spark, "deletes").select("doc_id")
        docs = docs.join(F.broadcast(dele_df), "doc_id", "left_anti")
    live = docs.agg(
        F.count(F.lit(1)).alias("n"), F.sum("doclen").alias("tt")
    ).collect()[0]
    n_live, total_tokens = int(live.n), int(live.tt or 0)
    avgdl = (float(total_tokens) / float(n_live)) if n_live else 0.0

    seg = store.read(spark, "segments")
    partials = seg.select("term", "doc_gaps", "tfs", "dls").mapInPandas(
        _recount_partials(deleted),
        "term string, df long, cf long",
    )
    tstats = (
        partials.groupBy("term")
        .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
        .withColumn("idf", idf_col(n_live))
    )
    store.write_table(tstats, "term_stats_next", max_files=8)
    tstats = store.read(spark, "term_stats_next")

    enriched = seg.join(tstats.select("term", "idf"), "term")
    compacted = enriched.groupBy("shard", "term").applyInPandas(
        _compact_group(deleted, avgdl, mf["block_size"]), SEGMENT_SCHEMA
    )
    # Stage, then swap: static overwrite of the live segment tree only after
    # the compacted copy fully materialized.
    compacted.write.mode("overwrite").partitionBy("gen", "shard").parquet(
        store.path("segments_next")
    )
    store.swap_table("segments_next", "segments")

    # Stage-and-swap everything that reads its own live path.
    store.write_table(docs, "docs_next")
    store.swap_table("docs_next", "docs")
    store.write_table(_current_url_map(spark, store), "url_map_next")
    store.swap_table("url_map_next", "url_map")
    store.swap_table("term_stats_next", "term_stats")
    store.remove_table("deletes")
    mf.update(
        {
            "n_docs": n_live,
            "total_tokens": total_tokens,
            "avgdl": avgdl,
            "generations": [0],
        }
    )
    store.write_manifest(mf)
    return {
        "n_live": n_live,
        "n_deleted_dropped": len(deleted),
        "elapsed_sec": time.time() - t0,
    }
