"""Ingest-pipeline compiler unit tests + engine-level recompute."""

from __future__ import annotations

import pytest

from unichem2index_spark.functions.ingestpipeline import (
    compile_pipeline_sql,
    compile_pipeline_spark,
)
from unichem2index_spark.operators import ingestpipe
from unichem2index_spark.sources.tables import load_tables

from tests.conftest import SF_SMOKE


def test_compiler_field_lifecycle(spark):
    # F.lit needs an active SparkContext — take the session fixture.
    from pyspark.sql import functions as F

    procs = [
        {"rename": {"field": "a", "target_field": "b"}},
        {"set": {"field": "c", "value": "x"}},
        {"remove": {"field": "d"}},
    ]
    out = compile_pipeline_spark(procs, {"a": F.lit(1), "d": F.lit(2)})
    assert set(out) == {"b", "c"}
    out_sql = compile_pipeline_sql(procs, {"a": "a", "d": "d"})
    assert set(out_sql) == {"b", "c"}
    assert out_sql["c"] == "'x'"
    with pytest.raises(ValueError):
        compile_pipeline_spark([{"grok": {"field": "a"}}], {"a": F.lit(1)})


def test_pipeline_transforms_documents(spark):
    import hashlib

    t = load_tables(spark, SF_SMOKE)
    rows = ingestpipe.ingest_pipeline_simulate(spark, t).collect()
    raw = {r.doc_id: r for r in t["documents"].collect()}
    assert len(rows) == len(raw)
    for r in rows[:20]:
        src = raw[r.doc_id]
        assert r.lang == src.lang.upper()
        assert r.source == src.source.replace("src", "feed-", 1)
        assert r.pipeline_ver == "v1"
        assert r.char_count == src.n_chars
        words = src.text.split(" ")
        assert r.word_count == len(words)
        fp = hashlib.md5("\x1f".join(words).encode()).hexdigest()
        assert r.words_fp == fp
        assert not hasattr(r, "text")  # removed by the pipeline
