"""Index build + BM25 query engine tests: exact path vs Python oracle,
WAND vs exact (rank+score identity), codec integrity, lineage/resume."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from unichem2index_spark.functions.bm25 import Bm25Oracle
from unichem2index_spark.functions.tokenize import tokenize
from unichem2index_spark.operators import query as Q
from unichem2index_spark.operators.build import build_index
from unichem2index_spark.synth import gen_queries

from tests.conftest import SF_SMOKE

N_SHARDS = 4


@pytest.fixture(scope="module")
def corpus(spark):
    df = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    rows = df.select("doc_id", "text").collect()
    oracle = Bm25Oracle([(r.doc_id, tokenize(r.text)) for r in rows])
    return df, oracle


@pytest.fixture(scope="module")
def index(spark, corpus, tmp_path_factory):
    df, _ = corpus
    out = str(tmp_path_factory.mktemp("index"))
    res = build_index(
        spark, df, out, n_shards=N_SHARDS, block_size=16, build_id="t0"
    )
    return Q.IndexHandle.open(spark, out), res


# Spark-side plumbing checks only — the WAND kernel itself is tested
# exhaustively against the oracle in test_wand_pure.py (no Spark).
EXACT_QUERIES = [
    (["the", "merge", "vector"], 12),
    (["dup", "spark", "nosuchterm"], 10),
]
WAND_QUERIES = (
    EXACT_QUERIES
    + [(["the"], 10)]  # df == N stopword
    + [(q["terms"], q["k"]) for q in gen_queries(4, seed=42)]
)


def test_build_stats_match_oracle(spark, corpus, index):
    _, oracle = corpus
    handle, res = index
    assert res.n_docs == oracle.n_docs
    assert res.avgdl == pytest.approx(oracle.avgdl, rel=1e-12)
    ts = {r.term: r for r in handle.term_stats(spark).collect()}
    assert len(ts) == len(oracle.postings)
    for term, plist in oracle.postings.items():
        assert ts[term].df == len(plist)
        assert ts[term].idf == pytest.approx(oracle.idf(term), rel=1e-12)
        assert ts[term].cf == sum(plist.values())


def test_segments_decode_to_exact_postings(spark, corpus, index):
    _, oracle = corpus
    handle, _ = index
    from unichem2index_spark.functions.codec import PostingBlock

    seg = handle.segments(spark).collect()
    seen: dict[str, dict[int, int]] = {}
    for row in seg:
        blk = PostingBlock.decode(
            bytes(row.doc_gaps), bytes(row.tfs), bytes(row.dls)
        )
        assert row.n_docs == len(blk.doc_ids) <= 16
        assert row.max_doc_id == blk.doc_ids[-1]
        assert row.block_max_tf == max(blk.tfs)
        assert row.block_min_dl == min(blk.dls)
        for d, tf, dl in zip(blk.doc_ids, blk.tfs, blk.dls):
            assert d % N_SHARDS == row.shard  # doc-sharding invariant
            assert dl == oracle.doclen[d]
            seen.setdefault(row.term, {})[d] = tf
    assert seen == oracle.postings


@pytest.mark.parametrize("terms,k", EXACT_QUERIES)
def test_exact_topk_matches_oracle(spark, corpus, terms, k):
    df, oracle = corpus
    got = Q.bm25_topk_exact(df, terms, k).collect()
    want = oracle.topk(terms, k)
    assert [r.doc_id for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert r.score == pytest.approx(s, abs=1e-5)


@pytest.mark.parametrize("terms,k", WAND_QUERIES)
def test_wand_topk_rank_identical(spark, corpus, index, terms, k):
    _, oracle = corpus
    handle, _ = index
    got = Q.bm25_topk_wand(spark, handle, terms, k).collect()
    want = oracle.topk(terms, k)
    assert [r.doc_id for r in got] == [d for d, _ in want], terms
    for r, (_, s) in zip(got, want):
        assert r.score == pytest.approx(s, abs=1e-5)


@pytest.mark.parametrize("terms,k", WAND_QUERIES)
def test_maxscore_topk_rank_identical(spark, corpus, index, terms, k):
    """The MaxScore serving path must reproduce the brute-force oracle
    exactly, like the WAND path — Lucene swaps these strategies per
    query, so the two kernels being interchangeable is the contract."""
    _, oracle = corpus
    handle, _ = index
    got = Q.bm25_topk_maxscore(spark, handle, terms, k).collect()
    want = oracle.topk(terms, k)
    assert [r.doc_id for r in got] == [d for d, _ in want], terms
    for r, (_, s) in zip(got, want):
        assert r.score == pytest.approx(s, abs=1e-5)


def test_lineage_reconciliation(spark, corpus, index):
    """E1 invariant: input count == docs table count == sum(lineage.docs)
    (extractor/init.go:44-126 analog)."""
    df, oracle = corpus
    handle, _ = index
    lineage = handle.store.read(spark, "lineage")
    assert df.count() == handle.docs(spark).count()
    assert lineage.agg(F.sum("docs")).collect()[0][0] == oracle.n_docs
    # postings reconciliation: sum over lineage == total postings
    total_postings = sum(len(p) for p in oracle.postings.values())
    assert lineage.agg(F.sum("postings")).collect()[0][0] == total_postings


def test_resume_after_partial_build(spark, corpus, tmp_path):
    """T1: build shards {0,1}, 'crash', resume → identical final index."""
    df, oracle = corpus
    full_dir, part_dir = str(tmp_path / "full"), str(tmp_path / "part")
    build_index(spark, df, full_dir, n_shards=N_SHARDS, block_size=16)
    r1 = build_index(
        spark, df, part_dir, n_shards=N_SHARDS, block_size=16,
        shard_filter=[0, 1], build_id="b1",
    )
    assert r1.built_shards == [0, 1]
    r2 = build_index(
        spark, df, part_dir, n_shards=N_SHARDS, block_size=16,
        resume=True, build_id="b2",
    )
    assert r2.built_shards == [2, 3]
    # resuming again is a no-op
    r3 = build_index(
        spark, df, part_dir, n_shards=N_SHARDS, block_size=16,
        resume=True, build_id="b3",
    )
    assert r3.built_shards == []

    cols = ["shard", "term", "block_id", "n_docs", "max_doc_id",
            "block_max_tf", "block_min_dl"]
    a = {tuple(r) for r in Q.IndexHandle.open(spark, full_dir)
         .segments(spark).select(cols).collect()}
    b = {tuple(r) for r in Q.IndexHandle.open(spark, part_dir)
         .segments(spark).select(cols).collect()}
    assert a == b
    # and the resumed index answers queries identically
    h = Q.IndexHandle.open(spark, part_dir)
    got = Q.bm25_topk_wand(spark, h, ["the", "merge"], 10).collect()
    want = oracle.topk(["the", "merge"], 10)
    assert [r.doc_id for r in got] == [d for d, _ in want]


def test_analytics_ops(spark, corpus, index):
    df, _ = corpus
    handle, _ = index
    assert Q.index_count(spark, handle).collect()[0].doc_count == df.count()
    assert (
        Q.last_doc_id(spark, handle).collect()[0].last_doc_id
        == df.agg(F.max("doc_id")).collect()[0][0]
    )
    top = Q.counts_by_source(spark, handle, size=5).collect()
    assert len(top) == 5
    assert all(
        top[i].doc_count >= top[i + 1].doc_count for i in range(len(top) - 1)
    )


def test_batch_queries_match_single(spark, corpus, index):
    """bm25_topk_batch == per-query bm25_topk_wand, ranks and scores."""
    from unichem2index_spark.operators.query import bm25_topk_batch

    handle, _ = index
    qs = [
        {"query_id": i, "terms": t, "k": k}
        for i, (t, k) in enumerate(WAND_QUERIES[:6])
    ]
    batch = bm25_topk_batch(spark, handle, qs).collect()
    by_q = {}
    for r in batch:
        by_q.setdefault(r.query_id, []).append((r.rank, r.doc_id, r.score))
    for q in qs:
        single = Q.bm25_topk_wand(spark, handle, q["terms"], q["k"]).collect()
        exp = [(i + 1, r.doc_id, r.score) for i, r in enumerate(single)]
        assert by_q.get(q["query_id"], []) == exp, f"query {q}"


@pytest.mark.parametrize("min_match", [1, 2, 3, 4])
def test_wand_min_should_match(spark, corpus, index, min_match):
    """ES minimum_should_match: WAND with the kernel-level eligibility
    count == brute-force filter of the full oracle ranking by the number
    of distinct query terms present; min_match=1 is bit-identical to the
    plain query; min_match > |terms| is empty."""
    df, oracle = corpus
    handle, _ = index
    terms = ["the", "merge", "vector"]
    k = 12
    got = Q.bm25_topk_wand(
        spark, handle, terms, k, min_match=min_match
    ).collect()
    if min_match > len(terms):
        assert got == []
        return
    toks = {
        r.doc_id: set(tokenize(r.text))
        for r in df.select("doc_id", "text").collect()
    }
    eligible = {
        d for d, ts in toks.items() if len(ts & set(terms)) >= min_match
    }
    want = [
        (d, s) for d, s in oracle.topk(terms, len(toks)) if d in eligible
    ][:k]
    assert [r.doc_id for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert r.score == pytest.approx(s, abs=1e-5)
    if min_match == 1:
        plain = Q.bm25_topk_wand(spark, handle, terms, k).collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in plain]
