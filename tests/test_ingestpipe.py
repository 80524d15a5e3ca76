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
        compile_pipeline_spark(
            [{"geoip": {"field": "a"}}], {"a": F.lit(1)}
        )


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


def test_grok_to_regex_translation():
    from unichem2index_spark.functions.ingestpipeline import grok_to_regex

    rx, names = grok_to_regex("%{WORD:w1} %{WORD:w2}")
    assert names == ["w1", "w2"] and rx == r"(\w+) (\w+)"
    rx, names = grok_to_regex("%{ALPHA}%{INT:n}")
    assert names == ["n"] and rx == r"(?:[a-zA-Z]+)(\d+)"
    import pytest

    with pytest.raises(ValueError):
        grok_to_regex("%{NOSUCH:x}")


def test_grok_pipeline_recompute(spark):
    import re

    from unichem2index_spark.operators.ingestpipe import (
        GROK_PIPELINE,
        ingest_pipeline_simulate,
    )
    from unichem2index_spark.sources.tables import load_tables

    from tests.conftest import SF_SMOKE

    t = load_tables(spark, SF_SMOKE)
    rows = ingest_pipeline_simulate(spark, t, GROK_PIPELINE).collect()
    src = {
        r.doc_id: r
        for r in t["documents"].collect()
    }
    assert len(rows) == len(src)
    pat_t = re.compile(r"(\w+) (\w+)")
    pat_s = re.compile(r"([a-zA-Z]+)(\d+)")
    for r in rows:
        o = src[r.doc_id]
        m = pat_t.search(o.text or "")
        assert (r.first_word, r.second_word) == (
            (m.group(1), m.group(2)) if m else ("", "")
        )
        m2 = pat_s.search(o.source or "")
        assert (r.src_family, r.src_idx) == (
            (m2.group(1), m2.group(2)) if m2 else ("", "")
        )
        # ES grok keeps the source field (text was then removed by the
        # explicit remove processor; source survives)
        assert r.source == o.source
