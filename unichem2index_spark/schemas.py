"""All fixed StructType schemas, declared once (SURVEY.md §1.3).

The reference declares schemas in Go struct tags (extractor/loader.go:18-45,
extractor/Inchi.go:6-22) and an external ES mapping string
(extractor/config.go:36). We declare them here as Spark types.
"""

from __future__ import annotations

from pyspark.sql import types as T

# BASELINE.json input_hint — the primary engine input table.
WEBTEXT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# /root/testdata/sf*/documents.parquet — driver-provided corpus.
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

# Uncompressed postings (the exact/oracle path).
POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("tf", T.LongType(), False),
        T.StructField("doclen", T.LongType(), False),
    ]
)

# SPIMI per-input-partition posting runs (pre-merge).
RUN_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("run_id", T.LongType(), False),
        T.StructField("n_docs", T.IntegerType(), False),
        T.StructField("doc_gaps", T.BinaryType(), False),
        T.StructField("tfs", T.BinaryType(), False),
        T.StructField("dls", T.BinaryType(), False),
    ]
)

# Final compressed block-max segments (our Lucene-segment analog;
# SURVEY.md §1.1 'Inverted index' row). ``gen`` is the segment generation:
# incremental updates append new generations (Lucene flush analog) and
# compaction folds them back to gen 0 (merge analog).
SEGMENT_SCHEMA = T.StructType(
    [
        T.StructField("gen", T.IntegerType(), False),
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("block_id", T.IntegerType(), False),
        T.StructField("n_docs", T.IntegerType(), False),
        T.StructField("max_doc_id", T.LongType(), False),
        T.StructField("doc_gaps", T.BinaryType(), False),
        T.StructField("tfs", T.BinaryType(), False),
        T.StructField("dls", T.BinaryType(), False),
        T.StructField("block_max_tf", T.LongType(), False),
        T.StructField("block_min_dl", T.LongType(), False),
        T.StructField("block_max_score", T.DoubleType(), False),
    ]
)

# Positional variant (``build_index(positions=True)``): one extra varbyte
# blob per block — per-doc delta-encoded token positions, concatenated in
# doc order (block tf list gives the per-doc counts). Enables exact-phrase
# / proximity queries (ES gives these by default on the index the
# reference creates, extractor/loader.go:121; its own calls never issue
# one, so this is beyond-reference capability).
POS_SEGMENT_SCHEMA = T.StructType(
    list(SEGMENT_SCHEMA.fields)
    + [T.StructField("positions", T.BinaryType(), False)]
)

TERM_STATS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("df", T.LongType(), False),
        T.StructField("cf", T.LongType(), False),
        T.StructField("idf", T.DoubleType(), False),
    ]
)

CORPUS_STATS_SCHEMA = T.StructType(
    [
        T.StructField("n_docs", T.LongType(), False),
        T.StructField("avgdl", T.DoubleType(), False),
        T.StructField("total_tokens", T.LongType(), False),
        T.StructField("vocab_size", T.LongType(), False),
    ]
)

# Per-doc forward table (the ES 'document store' analog).
DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("doclen", T.LongType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

# Per-shard lineage/metrics (SURVEY.md §1.1 watermark row; T1 resume).
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("build_id", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("docs", T.LongType(), False),
        T.StructField("postings", T.LongType(), False),
        T.StructField("blocks", T.LongType(), False),
        T.StructField("bytes", T.LongType(), False),
        T.StructField("elapsed_sec", T.DoubleType(), False),
    ]
)

# Tombstoned doc_ids (doc_as_upsert replace analog, extractor/loader.go:186;
# Lucene live-docs bitmap analog). Postings stay in place until compaction.
DELETES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("gen", T.IntegerType(), False),
    ]
)

# Top-k query result.
TOPK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)
