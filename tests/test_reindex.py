"""ES _reindex lifecycle: postings-space copy into a fresh destination
index — tombstone + predicate filtering, re-sharding, stats recompute —
verified by rank+score identity with a fresh build over exactly the
copied docs (same doc_ids)."""

from __future__ import annotations

import pytest

from unichem2index_spark.operators import query as Q
from unichem2index_spark.operators.build import build_index
from unichem2index_spark.operators.ingest import build_index_from_webtext
from unichem2index_spark.operators.update import delete_by_query, reindex
from unichem2index_spark.schemas import WEBTEXT_SCHEMA
from unichem2index_spark.synth import gen_webtext

QUERIES = [(["the", "merge"], 10), (["vector", "dup", "the"], 25)]


@pytest.fixture(scope="module")
def src_index(spark, tmp_path_factory):
    """Source index WITH live tombstones (a delete generation that has
    not been compacted) so reindex must honour both the tombstones and
    its own predicate."""
    rows = gen_webtext(250, seed=42)
    base = spark.createDataFrame(rows, schema=WEBTEXT_SCHEMA).repartition(5)
    out = str(tmp_path_factory.mktemp("reidx_src"))
    build_index_from_webtext(spark, base, out, n_shards=4)
    delete_by_query(spark, out, "doclen >= 140", build_id="t-reidx-del")
    return out, base


def _fresh_twin(spark, dest_handle, base, fresh_out, n_shards):
    """Fresh build over EXACTLY the docs the destination holds, with the
    SAME doc_ids (via the copied url_map), so (doc_id, score) compares
    exactly."""
    um = dest_handle.store.read(spark, "url_map").select("doc_id", "url")
    texts = {r["url"]: r["text"] for r in base.select("url", "text").collect()}
    rows = [(r.doc_id, texts[r.url]) for r in um.collect()]
    fresh_df = spark.createDataFrame(rows, "doc_id long, text string")
    build_index(spark, fresh_df, fresh_out, n_shards=n_shards)
    return Q.IndexHandle.open(spark, fresh_out)


def test_reindex_filtered_resharded_equals_fresh(
    spark, src_index, tmp_path_factory
):
    out, base = src_index
    h0 = Q.IndexHandle.open(spark, out)
    deleted = h0.deleted_ids(spark)
    live = h0.docs(spark)
    expected = live.where("doclen < 80").count()
    assert 0 < expected < 250

    dest = str(tmp_path_factory.mktemp("reidx_dst")) + "/idx"
    info = reindex(spark, out, dest, predicate="doclen < 80", n_shards=8)
    assert info["n_docs"] == expected
    assert info["n_shards"] == 8

    h = Q.IndexHandle.open(spark, dest)
    assert h.n_docs == expected
    # doc_ids preserved, tombstoned + non-matching docs absent.
    dest_ids = {r.doc_id for r in h.docs(spark).select("doc_id").collect()}
    live_ids = {
        r.doc_id
        for r in live.where("doclen < 80").select("doc_id").collect()
    }
    assert dest_ids == live_ids
    assert not (dest_ids & set(deleted))

    fresh = _fresh_twin(
        spark, h, base, str(tmp_path_factory.mktemp("reidx_fresh")), 8
    )
    assert abs(fresh.avgdl - h.avgdl) < 1e-9
    assert fresh.n_docs == h.n_docs
    for terms, k in QUERIES:
        got = [
            (r.doc_id, r.score)
            for r in Q.bm25_topk_wand(spark, h, terms, k).collect()
        ]
        exp = [
            (r.doc_id, r.score)
            for r in Q.bm25_topk_wand(spark, fresh, terms, k).collect()
        ]
        assert got and got == exp, terms


def test_reindex_positional_phrase_identity(spark, tmp_path_factory):
    """Reindexing a positional index keeps positions intact: phrase
    queries over the destination equal the source's (the copied docs are
    the whole live corpus, so scores are stats-identical too)."""
    rows = gen_webtext(120, seed=7)
    base = spark.createDataFrame(rows, schema=WEBTEXT_SCHEMA).repartition(4)
    out = str(tmp_path_factory.mktemp("reidx_pos_src"))
    build_index_from_webtext(spark, base, out, n_shards=4, positions=True)
    dest = str(tmp_path_factory.mktemp("reidx_pos_dst")) + "/idx"
    reindex(spark, out, dest)

    hs = Q.IndexHandle.open(spark, out)
    hd = Q.IndexHandle.open(spark, dest)
    assert hd.n_docs == hs.n_docs
    for phrase in (["the", "merge"], ["dup", "vector"]):
        got = [
            (r.doc_id, r.score)
            for r in Q.phrase_topk(spark, hd, phrase, 10).collect()
        ]
        exp = [
            (r.doc_id, r.score)
            for r in Q.phrase_topk(spark, hs, phrase, 10).collect()
        ]
        assert got == exp, phrase


def test_reindex_guards(spark, src_index, tmp_path_factory):
    out, _ = src_index
    dest = str(tmp_path_factory.mktemp("reidx_guard")) + "/idx"
    with pytest.raises(ValueError, match="0 live documents"):
        reindex(spark, out, dest, predicate="doclen < 0")
    reindex(spark, out, dest, predicate="doclen < 80")
    with pytest.raises(ValueError, match="already exists"):
        reindex(spark, out, dest, predicate="doclen < 80")
