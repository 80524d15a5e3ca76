"""ES _delete_by_query lifecycle: tombstones-only generation, gen-gated
visibility, pre-compaction stats contract, and post-compaction
rank+score identity with a fresh build over the survivors."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from unichem2index_spark.operators import query as Q
from unichem2index_spark.operators.build import build_index
from unichem2index_spark.operators.ingest import build_index_from_webtext
from unichem2index_spark.operators.update import delete_by_query, compact
from unichem2index_spark.schemas import WEBTEXT_SCHEMA
from unichem2index_spark.synth import gen_webtext

QUERIES = [(["the", "merge"], 10), (["vector", "dup", "the"], 25)]


@pytest.fixture(scope="module")
def deleted_index(spark, tmp_path_factory):
    rows = gen_webtext(300, seed=42)
    base = spark.createDataFrame(rows, schema=WEBTEXT_SCHEMA).repartition(5)
    out = str(tmp_path_factory.mktemp("dbq_index"))
    build_index_from_webtext(spark, base, out, n_shards=4)
    h0 = Q.IndexHandle.open(spark, out)
    expected = h0.docs(spark).where("doclen >= 60").count()
    res = delete_by_query(spark, out, "doclen >= 60", build_id="t-dbq")
    return out, base, res, expected


def test_delete_count_and_visibility(spark, deleted_index):
    out, base, res, expected = deleted_index
    assert expected > 0
    assert res.n_replaced == expected
    h = Q.IndexHandle.open(spark, out)
    # Live docs no longer contain any matching doc...
    assert h.docs(spark).where("doclen >= 60").count() == 0
    # ...and queries never return a tombstoned doc.
    deleted = h.deleted_ids(spark)
    assert len(deleted) == expected
    for terms, k in QUERIES:
        got = Q.bm25_topk_wand(spark, h, terms, k).collect()
        assert got, terms
        assert all(r.doc_id not in deleted for r in got)
    # Pre-compaction stats keep counting tombstoned postings
    # (Lucene pre-merge contract): n_docs is unchanged.
    assert h.n_docs == 300


def test_delete_zero_matches_is_noop(spark, deleted_index):
    out, *_ = deleted_index
    before = Q.IndexHandle.open(spark, out)
    gens_before = list(before.generations)
    res = delete_by_query(spark, out, "doclen < 0")
    assert res.n_replaced == 0
    after = Q.IndexHandle.open(spark, out)
    assert list(after.generations) == gens_before  # no generation burned


def test_compact_after_delete_equals_fresh(spark, deleted_index, tmp_path_factory):
    out, base, res, expected = deleted_index
    stats = compact(spark, out)
    assert stats["n_deleted_dropped"] == expected
    h = Q.IndexHandle.open(spark, out)
    assert h.n_docs == 300 - expected
    assert not h.store.exists("deletes")

    # Fresh build over the surviving corpus with the SAME doc_ids.
    um = h.store.read(spark, "url_map").select("doc_id", "url")
    texts = {r["url"]: r["text"] for r in base.select("url", "text").collect()}
    rows = [(r.doc_id, texts[r.url]) for r in um.collect()]
    fresh_df = spark.createDataFrame(rows, "doc_id long, text string")
    fresh_out = str(tmp_path_factory.mktemp("dbq_fresh"))
    build_index(spark, fresh_df, fresh_out, n_shards=4)
    fresh = Q.IndexHandle.open(spark, fresh_out)
    assert abs(fresh.avgdl - h.avgdl) < 1e-9
    for terms, k in QUERIES:
        got = [
            (r.doc_id, r.score)
            for r in Q.bm25_topk_wand(spark, h, terms, k).collect()
        ]
        exp = [
            (r.doc_id, r.score)
            for r in Q.bm25_topk_wand(spark, fresh, terms, k).collect()
        ]
        assert got == exp, terms


def test_snapshot_survives_mutation_and_gc(spark, tmp_path_factory):
    """ES _snapshot contract: a snapshot taken before mutations serves
    the EXACT pre-mutation results after the source index is updated,
    deleted-from, compacted, and GC'd."""
    from unichem2index_spark.operators.update import add_generation
    from unichem2index_spark.schemas import WEBTEXT_SCHEMA
    from unichem2index_spark.sources.tables import SegmentStore
    from unichem2index_spark.synth import gen_webtext_row

    rows = gen_webtext(200, seed=13)
    base = spark.createDataFrame(rows, schema=WEBTEXT_SCHEMA).repartition(4)
    out = str(tmp_path_factory.mktemp("snap_src"))
    build_index_from_webtext(spark, base, out, n_shards=4)
    h0 = Q.IndexHandle.open(spark, out)
    before = {
        tuple(terms): [
            (r.doc_id, r.score)
            for r in Q.bm25_topk_wand(spark, h0, terms, k).collect()
        ]
        for terms, k in QUERIES
    }

    snap = str(tmp_path_factory.mktemp("snap_dst"))
    info = SegmentStore(out).snapshot_to(snap)
    assert "segments" in info["tables"]

    # Mutate the source: update wave + delete + compact (GC runs inside).
    upd = spark.createDataFrame(
        [gen_webtext_row(50_000 + j, seed=3) for j in range(40)],
        schema=WEBTEXT_SCHEMA,
    )
    add_generation(spark, out, upd, build_id="t-snap-upd")
    delete_by_query(spark, out, "doclen >= 60")
    compact(spark, out)
    mutated = Q.IndexHandle.open(spark, out)
    assert mutated.n_docs != 200  # the source really changed

    hs = Q.IndexHandle.open(spark, snap)
    assert hs.n_docs == 200
    for terms, k in QUERIES:
        got = [
            (r.doc_id, r.score)
            for r in Q.bm25_topk_wand(spark, hs, terms, k).collect()
        ]
        assert got == before[tuple(terms)], terms


def test_snapshot_race_resolves_from_read_manifest(
    spark, tmp_path_factory, monkeypatch
):
    """ADVICE r4 regression: a commit landing between snapshot_to's
    manifest read and its table copies must not redirect the copies to
    a physical version the copied manifest does not reference.
    Simulated by doctoring the ON-DISK manifest (segments ->
    segments_v99) right after the in-memory read returns — the copies
    must follow the already-read dict, never re-resolve from disk
    (the pre-fix code silently skipped the nonexistent v99 path and
    produced a snapshot with no segments table at all)."""
    import json

    from unichem2index_spark.sources.tables import SegmentStore

    rows = gen_webtext(120, seed=21)
    base = spark.createDataFrame(rows, schema=WEBTEXT_SCHEMA).repartition(4)
    out = str(tmp_path_factory.mktemp("race_src"))
    build_index_from_webtext(spark, base, out, n_shards=4)
    store = SegmentStore(out)
    n0 = Q.IndexHandle.open(spark, out).n_docs

    real_read = SegmentStore.read_manifest

    def racing_read(self):
        mf = real_read(self)
        doctored = dict(mf)
        doctored["tables"] = {
            **mf.get("tables", {}), "segments": "segments_v99",
        }
        with open(self.path("manifest.json"), "w") as f:
            json.dump(doctored, f)
        return mf

    monkeypatch.setattr(SegmentStore, "read_manifest", racing_read)
    snap = str(tmp_path_factory.mktemp("race_dst"))
    info = store.snapshot_to(snap)
    monkeypatch.undo()

    assert "segments" in info["tables"]
    hs = Q.IndexHandle.open(spark, snap)
    assert hs.n_docs == n0
    assert Q.bm25_topk_wand(spark, hs, ["the", "merge"], 5).count() > 0
