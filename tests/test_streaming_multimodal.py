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


def _png(w, h):
    import struct

    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", w, h)
        + b"\x08\x02\x00\x00\x00"
    )


def _wav(rate, channels):
    import struct

    return (
        b"RIFF"
        + struct.pack("<I", 36)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, 4, 16)
        + b"data"
        + struct.pack("<I", 0)
    )


def _gif(w, h):
    import struct

    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 5


def _jpeg(w, h):
    import struct

    return (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
        + struct.pack(">HH", h, w) + b"\x03" + b"\x00" * 9
        + b"\xff\xd9"
    )


def test_header_parsers_pure():
    from unichem2index_spark.operators.multimodal import (
        _byte_histogram,
        _parse_header,
    )

    assert _parse_header(_png(640, 480)) == {
        "format": "png", "width": 640, "height": 480,
    }
    assert _parse_header(_gif(320, 200)) == {
        "format": "gif", "width": 320, "height": 200,
    }
    assert _parse_header(_jpeg(1024, 768)) == {
        "format": "jpeg", "width": 1024, "height": 768,
    }
    wav = _parse_header(_wav(44100, 2))
    assert wav == {"format": "wav", "sample_rate": 44100, "channels": 2}
    assert _parse_header(b"plain text payload") == {"format": "unknown"}
    assert _parse_header(b"") == {"format": "unknown"}
    hist = _byte_histogram(bytes(range(256)))
    assert len(hist) == 8 and abs(sum(hist) - 1.0) < 1e-9
    assert all(abs(x - 1 / 8) < 1e-9 for x in hist)


def test_multimodal_real_decode(spark):
    rows = [
        (0, "image", bytearray(_png(640, 480)), None),
        (1, "image", bytearray(_gif(320, 200)), None),
        (2, "image", bytearray(_jpeg(1024, 768)), None),
        (3, "audio", bytearray(_wav(16000, 1)), None),
        (4, "video", bytearray(b"opaque-video-bytes"), None),
    ]
    from unichem2index_spark.operators.multimodal import MEDIA_SCHEMA

    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in decode_media(media, fake=False).collect()}
    assert (got[0].format, got[0].width, got[0].height) == ("png", 640, 480)
    assert (got[1].format, got[1].width, got[1].height) == ("gif", 320, 200)
    assert (got[2].format, got[2].width, got[2].height) == ("jpeg", 1024, 768)
    assert (got[3].format, got[3].sample_rate, got[3].channels) == (
        "wav", 16000, 1,
    )
    assert got[4].format == "unknown" and got[4].width is None
    for r in got.values():
        assert len(r.feature) == 8
        assert abs(sum(r.feature) - 1.0) < 1e-6
        assert len(r.sha256) == 64 and r.n_bytes > 0


def test_stream_index_webtext(spark, tmp_path):
    """Structured Streaming index maintenance: first micro-batch builds
    the base index, the next (after new files land) becomes generation 1
    with url-keyed replacements tombstoned; the checkpoint ensures the
    second run only processes the new files."""
    import datetime as dt

    from unichem2index_spark.operators import query as Q
    from unichem2index_spark.streaming.incremental import stream_index_webtext
    from unichem2index_spark.synth import gen_webtext_row

    in_dir = str(tmp_path / "in")
    idx = str(tmp_path / "idx")
    rows = gen_webtext(120, seed=21)
    spark.createDataFrame(rows, WEBTEXT_SCHEMA).write.mode("append").parquet(in_dir)
    stream_index_webtext(spark, in_dir, idx, n_shards=4).awaitTermination()
    h = Q.IndexHandle.open(spark, idx)
    assert h.docs(spark).count() == 120
    assert not h.multi_gen

    wave = []
    for j, r in enumerate(rows[:10]):
        nr = gen_webtext_row(40_000 + j, seed=22)
        nr["url"] = r["url"]
        nr["warc_ts"] = r["warc_ts"] + dt.timedelta(days=30)
        wave.append(nr)
    wave += [gen_webtext_row(41_000 + j, seed=22) for j in range(15)]
    spark.createDataFrame(wave, WEBTEXT_SCHEMA).write.mode("append").parquet(in_dir)
    stream_index_webtext(spark, in_dir, idx, n_shards=4).awaitTermination()

    h2 = Q.IndexHandle.open(spark, idx)
    assert h2.multi_gen
    assert h2.docs(spark).count() == 120 + 15  # 10 replaced, 15 net-new
    assert h2.n_docs == 120 + 25  # physical postings incl. tombstoned
    assert len(Q.bm25_topk_wand(spark, h2, ["the"], 5).collect()) == 5


def test_resize_and_frame_sample_plumbing(spark):
    import hashlib

    from unichem2index_spark.operators.multimodal import (
        resize_images,
        sample_frames,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    media = media_from_documents(docs)
    payloads = {
        r.media_id: (bytes(r.payload), r.kind)
        for r in media.select("media_id", "kind", "payload").collect()
    }

    w, h = 8, 4
    thumbs = resize_images(media, out_width=w, out_height=h).collect()
    # images only, one row each, fixed-size output
    img_ids = {m for m, (_, k) in payloads.items() if k == "image"}
    assert {r.media_id for r in thumbs} == img_ids
    for r in thumbs:
        assert len(bytes(r.thumb)) == w * h
        raw = payloads[r.media_id][0]
        idx = [(i * len(raw)) // (w * h) for i in range(w * h)]
        want = bytes(raw[i] for i in idx)
        assert bytes(r.thumb) == want
        assert r.thumb_sha256 == hashlib.sha256(want).hexdigest()

    k = 3
    frames = sample_frames(media, n_frames=k).collect()
    vid_ids = {m for m, (_, kk) in payloads.items() if kk == "video"}
    per = {}
    for r in frames:
        per.setdefault(r.media_id, []).append(r)
    assert set(per) == vid_ids
    for mid, rs in per.items():
        assert sorted(x.frame_idx for x in rs) == list(range(k))
        raw = payloads[mid][0]
        for x in rs:
            assert x.byte_offset == (x.frame_idx * len(raw)) // k
            assert bytes(x.frame) == raw[
                x.byte_offset : x.byte_offset + max(1, len(raw) // (k * 2))
            ]
