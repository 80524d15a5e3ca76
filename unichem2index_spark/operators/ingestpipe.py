"""ES ingest-pipeline simulate endpoint (`_ingest/pipeline/_simulate`):
run a declarative processor chain over a table and return the
transformed documents. The chain compiles through
functions/ingestpipeline.py's dual renderer — the DuckDB oracle is the
SAME compiled walk, so the correctness gate checks the compiler, not a
hand-written twin."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from unichem2index_spark.functions.ingestpipeline import (
    compile_pipeline_spark,
)

# The demo pipeline the entry registers: uppercase a keyword field,
# normalize the source naming, stamp the pipeline version, split the
# body into words (keeping a count, dropping the body), rename a
# numeric field — one of each processor family.
DOC_PIPELINE: list[dict] = [
    {"uppercase": {"field": "lang"}},
    {"gsub": {"field": "source", "pattern": "^src", "replacement": "feed-"}},
    {"set": {"field": "pipeline_ver", "value": "v1"}},
    {"split": {"field": "text", "separator": " ", "target_field": "words"}},
    {"remove": {"field": "text"}},
    {"rename": {"field": "n_chars", "target_field": "char_count"}},
]

# Grok demo pipeline (ES ingest-node `grok` processor): structure the
# text's lead bigram and decompose the source key, ES-style — named
# captures become new fields, source fields kept then pruned.
GROK_PIPELINE: list[dict] = [
    {"grok": {"field": "text",
              "pattern": "%{WORD:first_word} %{WORD:second_word}"}},
    {"grok": {"field": "source",
              "pattern": "%{ALPHA:src_family}%{INT:src_idx}"}},
    {"remove": {"field": "text"}},
]


def ingest_pipeline_simulate(
    spark: SparkSession, t, procs: list[dict] | None = None
) -> DataFrame:
    """Map-only projection (fuses into the scan — the ingest-node shape);
    emits word_count + a words fingerprint column plus the transformed
    scalar fields, ordered by doc_id."""
    procs = DOC_PIPELINE if procs is None else procs
    docs = t["documents"]
    base = {
        "doc_id": F.col("doc_id"),
        "text": F.col("text"),
        "lang": F.col("lang"),
        "source": F.col("source"),
        "n_chars": F.col("n_chars"),
    }
    out = compile_pipeline_spark(procs, base)
    cols = []
    for name, col in out.items():
        if name == "words":
            cols.append(F.size(col).alias("word_count"))
            cols.append(F.md5(F.concat_ws("\x1f", col)).alias("words_fp"))
        else:
            cols.append(col.alias(name))
    return docs.select(*cols).orderBy("doc_id")
