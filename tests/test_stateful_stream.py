"""applyInPandasWithState newest-per-key dedup: state must carry across
micro-batches (stale update suppressed batches later), mirroring the
reference's doc_as_upsert stale-drop (extractor/loader.go:186)."""

import os
import time

import pandas as pd

from unichem2index_spark.streaming.stateful import stream_dedup_latest


def _write(path: str, rows: list[tuple], mtime: float) -> None:
    pd.DataFrame(rows, columns=["url", "warc_ts", "text"]).to_parquet(path)
    os.utime(path, (mtime, mtime))


SCHEMA = "url string, warc_ts long, text string"


def test_state_suppresses_stale_across_batches(spark, tmp_path):  # noqa: F811
    src = tmp_path / "in"
    src.mkdir()
    now = time.time()
    # Batch 1: A@10, B@20. Batch 2: A@5 (STALE), B@30 (newer), C@1 (new).
    _write(str(src / "f1.parquet"), [("A", 10, "a1"), ("B", 20, "b1")], now - 60)
    _write(
        str(src / "f2.parquet"),
        [("A", 5, "a-stale"), ("B", 30, "b2"), ("C", 1, "c1")],
        now - 30,
    )

    out = stream_dedup_latest(
        spark, str(src), SCHEMA, key_col="url", ts_col="warc_ts",
        max_files_per_trigger=1,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_state_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = {
        (r.url, r.warc_ts, r.text)
        for r in spark.table("dedup_state_test").collect()
    }
    # A's stale batch-2 row must NOT appear; B emits once per improvement.
    assert rows == {
        ("A", 10, "a1"),
        ("B", 20, "b1"),
        ("B", 30, "b2"),
        ("C", 1, "c1"),
    }


def test_within_batch_keeps_only_newest(spark, tmp_path):  # noqa: F811
    src = tmp_path / "in2"
    src.mkdir()
    _write(
        str(src / "f1.parquet"),
        [("A", 3, "old"), ("A", 9, "new"), ("A", 7, "mid")],
        time.time() - 60,
    )
    out = stream_dedup_latest(
        spark, str(src), SCHEMA, key_col="url", ts_col="warc_ts"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_batch_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = [
        (r.url, r.warc_ts, r.text)
        for r in spark.table("dedup_batch_test").collect()
    ]
    assert rows == [("A", 9, "new")]


def test_stream_sessionize_merges_sessions_across_batches(spark, tmp_path):
    from datetime import datetime

    from unichem2index_spark.streaming.stateful import stream_sessionize

    src = tmp_path / "sess_in"
    src.mkdir()
    now = time.time()
    ts = lambda m: datetime(2026, 1, 1, 12, m, 0)
    # user 1: events at 12:00 and 12:10 land in DIFFERENT micro-batches
    # but are 600s apart (< gap 1800) -> ONE merged session of 3 events;
    # user 2: 12:00 then 13:30 -> TWO sessions despite same-batch arrival.
    f1 = [(1, ts(0)), (2, ts(0)), (2, datetime(2026, 1, 1, 13, 30, 0))]
    f2 = [(1, ts(10)), (1, ts(11))]
    cols = ["user_id", "ts"]
    kw = dict(coerce_timestamps="us", allow_truncated_timestamps=True)
    pd.DataFrame(f1, columns=cols).to_parquet(str(src / "f1.parquet"), **kw)
    os.utime(str(src / "f1.parquet"), (now - 60, now - 60))
    pd.DataFrame(f2, columns=cols).to_parquet(str(src / "f2.parquet"), **kw)
    os.utime(str(src / "f2.parquet"), (now - 30, now - 30))

    out = stream_sessionize(
        spark, str(src), "user_id long, ts timestamp",
        gap_sec=1800, max_files_per_trigger=1,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sess_state_test")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = sorted(
        (r.user_id, r.n_events, r.start_ts, r.end_ts)
        for r in spark.table("sess_state_test").collect()
    )
    assert rows == [
        (1, 3, ts(0), ts(11)),  # merged across the batch boundary
        (2, 1, ts(0), ts(0)),
        (2, 1, datetime(2026, 1, 1, 13, 30), datetime(2026, 1, 1, 13, 30)),
    ]
