"""Structured Streaming, incremental semantics (T1-T3) and multimodal
binary plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from unichem2index_spark.operators.multimodal import (
    decode_media,
    media_from_documents,
)
from unichem2index_spark.schemas import WEBTEXT_SCHEMA
from unichem2index_spark.sources.tables import write_webtext
from unichem2index_spark.streaming.incremental import (
    lookback_repair_frame,
    stream_windowed_counts,
    upsert_merge,
    watermark_increment,
)
from unichem2index_spark.synth import gen_webtext

from tests.conftest import SF_SMOKE


def test_watermark_increment(spark):
    docs = spark.range(0, 100).select(F.col("id").alias("doc_id"))
    indexed = docs.where("doc_id < 60")
    got = sorted(
        r.doc_id for r in watermark_increment(docs, indexed, overlap=10).collect()
    )
    assert got == list(range(49, 100))  # [max(59) - 10, ...)


def test_lookback_repair_frame(spark):
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    mx = events.agg(F.max("ts")).collect()[0][0]
    out = lookback_repair_frame(events, "ts", mx, lookback_days=15)
    assert 0 < out.count() < events.count()
    assert out.agg(F.min("ts")).collect()[0][0] >= mx.replace(
        day=1
    ) or True  # just bounds sanity; exact filter checked below
    cutoff_count = events.where(
        F.col("ts") >= F.lit(mx) - F.expr("INTERVAL 15 DAYS")
    ).count()
    assert out.count() == cutoff_count


def test_upsert_merge_idempotent(spark):
    cur = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, v string"
    )
    upd = spark.createDataFrame([(2, "B"), (4, "D")], "doc_id long, v string")
    out = {(r.doc_id, r.v) for r in upsert_merge(cur, upd).collect()}
    assert out == {(1, "a"), (2, "B"), (3, "c"), (4, "D")}
    # re-applying the same updates changes nothing (doc_as_upsert analog)
    out2 = {
        (r.doc_id, r.v)
        for r in upsert_merge(upsert_merge(cur, upd), upd).collect()
    }
    assert out2 == out


def test_stream_windowed_counts(spark, tmp_path):
    rows = gen_webtext(200, seed=42)
    src = str(tmp_path / "webtext_stream")
    write_webtext(spark, rows, src)
    agg = stream_windowed_counts(spark, src, WEBTEXT_SCHEMA, window="1 day")
    q = (
        agg.writeStream.format("memory")
        .queryName("wt_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT sum(n_docs) AS n FROM wt_counts").collect()[0].n
    assert got == 200
    langs = {
        r.lang for r in spark.sql("SELECT DISTINCT lang FROM wt_counts").collect()
    }
    assert langs == {"en", "de", "es", "fr", "zh"}


def test_multimodal_decode_fake(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(50)
    media = media_from_documents(docs)
    out = decode_media(media, fake=True)
    rows = out.collect()
    assert len(rows) == 50
    for r in rows:
        assert r.n_bytes > 0
        assert len(r.sha256) == 64
        assert len(r.feature) == 8
        if r.kind == "image":
            assert 64 <= r.width <= 319 and 64 <= r.height <= 319
        else:
            assert r.width is None
    # deterministic: same payload → same sha/feature
    rows2 = decode_media(media, fake=True).collect()
    assert {(r.media_id, r.sha256) for r in rows} == {
        (r.media_id, r.sha256) for r in rows2
    }


def test_multimodal_real_decode_is_stubbed(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(5)
    with pytest.raises(NotImplementedError):
        decode_media(media_from_documents(docs), fake=False)
