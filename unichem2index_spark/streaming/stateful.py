"""Custom stateful streaming operator: newest-per-key dedup with state.

The reference applies every document as a url-keyed upsert and silently
drops stale re-extractions (``doc_as_upsert``, extractor/loader.go:186;
the update loop re-reads an overlapping keyspace window, extractor/
init.go:148-149, so duplicates are the NORMAL case, not an error). Batch
mode expresses that as :func:`operators.ingest.dedup_latest_by_url`; this
module is the Structured Streaming twin — an ``applyInPandasWithState``
operator that remembers, per key, the newest recency value seen across
ALL previous micro-batches and emits a row only when it beats that state.

Semantics ("newest-so-far stream"):

* Within one micro-batch, only the newest row per key is considered
  (ties on the recency value: first in batch order wins — callers who
  need total determinism pass a unique recency column, e.g. doc_id).
* Across batches, a row is emitted iff its recency is STRICTLY greater
  than the stored state — an equal value is a duplicate delivery and is
  suppressed, which is what makes checkpoint-replayed micro-batches
  idempotent end to end.
* Output mode is append: downstream applies emissions in order as
  upserts (each emission was the newest known version at emit time).

Scale notes: state lives in the executor state store, partitioned by the
grouping key — no driver state, no global structure; keys hash across
however many executors exist (the same doc-sharded property the index
build relies on). For unbounded keyspaces (every url on the web), pass
``ttl_minutes`` so idle keys age out via ProcessingTimeTimeout: the cost
of an evicted key is one spurious re-emission (an upsert no-op
downstream), never wrong data.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def newest_per_key_stream(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    out_cols: list[str] | None = None,
    ttl_minutes: int | None = None,
) -> DataFrame:
    """Stateful streaming dedup over ``stream`` (a streaming DataFrame).

    Emits, per micro-batch, at most one row per ``key_col`` — the batch's
    newest by ``ts_col`` — and only if it is strictly newer than anything
    previously emitted for that key (cross-batch state). ``ts_col`` must
    be numerically comparable (numeric or timestamp).
    """
    out_cols = out_cols or stream.columns
    if key_col not in out_cols:
        out_cols = [key_col] + out_cols
    in_fields = {f.name: f for f in stream.schema.fields}
    out_schema = T.StructType([in_fields[c] for c in out_cols])
    state_schema = T.StructType([T.StructField("max_ts", T.DoubleType())])
    is_ts = isinstance(in_fields[ts_col].dataType, T.TimestampType)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # Idle key aged out: forget it. Worst case a later row for
            # this key re-emits (downstream upsert no-op), never stale
            # data served as fresh.
            state.remove()
            return
        best: pd.DataFrame | None = None
        best_ts: float | None = None
        for pdf in pdfs:
            if pdf.empty:
                continue
            col = pdf[ts_col]
            vals = (
                col.astype("int64") / 1e6 if is_ts else col.astype("float64")
            )
            i = vals.idxmax()
            v = float(vals[i])
            if best_ts is None or v > best_ts:
                best, best_ts = pdf.loc[[i], out_cols], v
        if best is None:
            return
        prev = float(state.get[0]) if state.exists else None
        if prev is None or best_ts > prev:
            state.update((best_ts,))
            if ttl_minutes is not None:
                state.setTimeoutDuration(ttl_minutes * 60_000)
            yield best

    return stream.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_minutes is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def stream_dedup_latest(
    spark,
    input_dir: str,
    schema,
    key_col: str = "url",
    ts_col: str = "warc_ts",
    out_cols: list[str] | None = None,
    ttl_minutes: int | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source wrapper: stream a growing parquet directory through
    :func:`newest_per_key_stream`. ``max_files_per_trigger`` splits the
    backlog into multiple micro-batches (tests use 1 to force state to
    carry across batches)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return newest_per_key_stream(
        reader.parquet(input_dir),
        key_col=key_col,
        ts_col=ts_col,
        out_cols=out_cols,
        ttl_minutes=ttl_minutes,
    )


def stream_sessionize(
    spark,
    input_dir: str,
    schema,
    gap_sec: int = 1800,
    max_files_per_trigger: int | None = None,
):
    """Streaming sessionization — the SAME ``session_window`` operator
    the batch :func:`operators.eventseq.sessionize` uses, over a file
    stream: Spark merges a user's session state across micro-batches
    natively (late rows extend or fuse sessions, no custom state code).
    Returns the un-emitted aggregate; run with outputMode("complete")
    (sessions can GROW or MERGE retroactively, so append-mode emission
    would need a watermark and would hold back the tail — complete mode
    re-emits the current truth every trigger, which is the right
    contract for a bounded dashboard-size result; per-user session
    counts are small even when the event stream is not).

    Scale shape identical to the batch twin: ONE shuffle on user_id,
    state partitioned by key in the executor state store, no driver
    state. The batch query IS this query — Trigger.Once over a static
    directory reproduces sessionize() row for row (pytest + shared
    DuckDB oracle)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    ev = reader.parquet(input_dir)
    return (
        ev.groupBy(
            "user_id", F.session_window("ts", f"{int(gap_sec)} seconds")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
        )
        .drop("session_window")
    )
