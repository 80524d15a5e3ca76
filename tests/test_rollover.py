"""Rollover alias: bounded write indexes, alias-wide search, retention
by dropping the oldest sub-index."""

from __future__ import annotations

from unichem2index_spark.operators import query as Q
from unichem2index_spark.operators.rollover import RolloverAlias
from unichem2index_spark.schemas import WEBTEXT_SCHEMA
from unichem2index_spark.synth import gen_webtext_row


def _wave(spark, start, n, seed=11):
    rows = [gen_webtext_row(start + j, seed=seed) for j in range(n)]
    return spark.createDataFrame(rows, schema=WEBTEXT_SCHEMA)


def test_rollover_bounds_write_index(spark, tmp_path):
    alias = RolloverAlias(str(tmp_path / "alias"))
    # 3 waves of 80 docs with max_docs=100: wave 1 -> ix0 (80), wave 2
    # appends to ix0 (160 >= 100 only AFTER the bulk, ES semantics),
    # wave 3 must roll over to ix1.
    alias.ingest(spark, _wave(spark, 0, 80), max_docs=100)
    assert len(alias.indexes()) == 1
    alias.ingest(spark, _wave(spark, 1000, 80), max_docs=100)
    assert len(alias.indexes()) == 1
    assert Q.IndexHandle.open(spark, alias.indexes()[0]).n_docs == 160
    alias.ingest(spark, _wave(spark, 2000, 80), max_docs=100)
    idxs = alias.indexes()
    assert len(idxs) == 2
    assert Q.IndexHandle.open(spark, idxs[0]).n_docs == 160  # sealed
    assert Q.IndexHandle.open(spark, idxs[1]).n_docs == 80
    assert alias.total_docs(spark) == 240

    # Alias search spans every sub-index and attributes hits.
    rows = alias.search(spark, ["the", "merge"], 20).collect()
    assert rows
    assert {r.index_id for r in rows} <= {0, 1}
    # Hits from BOTH generations of the stream appear (the query terms
    # are corpus-wide stopword-class, so both indexes contribute).
    assert len({r.index_id for r in rows}) == 2
    keys = [(-r.score, r.index_id, r.doc_id) for r in rows]
    assert keys == sorted(keys)

    # Retention: dropping the oldest sub-index removes exactly its docs.
    alias._commit(idxs[1:])
    assert alias.total_docs(spark) == 80
    rows2 = alias.search(spark, ["the", "merge"], 20).collect()
    assert rows2 and all(r.index_id == 0 for r in rows2)


def test_stream_percolate_alerts(spark, tmp_path):
    import os

    from unichem2index_spark.streaming.incremental import stream_percolate

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    os.makedirs(in_dir)
    _wave(spark, 0, 60).write.mode("append").parquet(in_dir)
    registry = [(1, ["merge", "group"], 2), (2, ["vector"], 1)]
    stream_percolate(spark, in_dir, out_dir, registry).awaitTermination()
    # Second batch arrives; checkpoint must not re-emit batch 0.
    _wave(spark, 5000, 60).write.mode("append").parquet(in_dir)
    stream_percolate(spark, in_dir, out_dir, registry).awaitTermination()

    m = spark.read.parquet(os.path.join(out_dir, "matches"))
    rows = m.collect()
    assert rows
    assert {r.batch_id for r in rows} >= {0}
    # Every notification is genuine: the url's text matches its query.
    texts = {}
    for d in (in_dir,):
        for r in spark.read.parquet(d).collect():
            texts[r.url] = set(r.text.lower().split())
    for r in rows:
        toks = texts[r.url]
        if r.query_id == 1:
            assert "merge" in toks and "group" in toks
        else:
            assert "vector" in toks
    # No duplicate notifications across replayed starts.
    assert m.count() == m.distinct().count()


def test_cat_indices(spark, tmp_path):
    from unichem2index_spark.operators.rollover import (
        RolloverAlias,
        cat_indices,
    )

    alias = RolloverAlias(str(tmp_path / "al"))
    alias.ingest(spark, _wave(spark, 0, 60), max_docs=50)
    alias.ingest(spark, _wave(spark, 900, 60), max_docs=50)
    cats = cat_indices(spark, alias.indexes())
    assert len(cats) == 2
    assert [c["docs"] for c in cats] == [60, 60]
    assert all(c["n_shards"] == 4 for c in cats)
