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
