"""Pure-Python block-max WAND kernel vs the exact BM25 oracle — exhaustive
rank+score identity without Spark (the Spark test then only checks
plumbing)."""

from __future__ import annotations

import random

import pytest

from unichem2index_spark.functions.bm25 import Bm25Oracle
from unichem2index_spark.functions.codec import chunk_postings
from unichem2index_spark.functions.wand import TermBlocks, wand_topk
from unichem2index_spark.functions.bm25 import score_term
from unichem2index_spark.synth import VOCAB, gen_queries, gen_webtext
from unichem2index_spark.functions.tokenize import tokenize


def build_term_blocks(oracle: Bm25Oracle, block_size: int = 8) -> dict[str, TermBlocks]:
    out = {}
    for term, plist in oracle.postings.items():
        ids = sorted(plist)
        tfs = [plist[d] for d in ids]
        dls = [oracle.doclen[d] for d in ids]
        blocks = chunk_postings(ids, tfs, dls, block_size)
        enc, maxids, bms = [], [], []
        idf_t = oracle.idf(term)
        for b in blocks:
            enc.append(b.encode())
            maxids.append(b.doc_ids[-1])
            bms.append(
                max(
                    score_term(tf, dl, oracle.avgdl, idf_t)
                    for tf, dl in zip(b.tfs, b.dls)
                )
            )
        out[term] = TermBlocks(
            term=term, idf=idf_t, max_doc_ids=maxids,
            block_max_scores=bms, enc_blocks=enc,
        )
    return out


def run_query(oracle, tbs, terms, k):
    cursors = []
    for t in sorted(set(terms)):
        if t in tbs:
            src = tbs[t]
            cursors.append(
                TermBlocks(
                    term=src.term, idf=src.idf,
                    max_doc_ids=list(src.max_doc_ids),
                    block_max_scores=list(src.block_max_scores),
                    enc_blocks=list(src.enc_blocks),
                )
            )
    got = wand_topk(cursors, oracle.avgdl, k)
    want = oracle.topk(terms, k)
    assert [d for d, _ in got] == [d for d, _ in want], (terms, k)
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-12)


@pytest.fixture(scope="module")
def corpus():
    rows = gen_webtext(400, seed=42)
    docs = [(i, tokenize(r["text"])) for i, r in enumerate(rows)]
    oracle = Bm25Oracle(docs)
    return oracle, build_term_blocks(oracle, block_size=8)


def test_wand_reference_query_set(corpus):
    oracle, tbs = corpus
    for q in gen_queries(30, seed=42):
        run_query(oracle, tbs, q["terms"], q["k"])


def test_wand_edge_cases(corpus):
    oracle, tbs = corpus
    run_query(oracle, tbs, ["the"], 1)
    run_query(oracle, tbs, ["the"], 10_000)  # k > n
    run_query(oracle, tbs, ["nosuchterm"], 10)
    run_query(oracle, tbs, ["the", "nosuchterm"], 10)
    run_query(oracle, tbs, list(VOCAB), 50)  # all terms
    run_query(oracle, tbs, ["the", "the", "a"], 7)  # dup terms
    run_query(oracle, tbs, [], 10)


def test_wand_randomized_queries(corpus):
    oracle, tbs = corpus
    rng = random.Random(7)
    for _ in range(150):
        n = rng.randint(1, 6)
        terms = rng.sample(VOCAB, n)
        k = rng.choice([1, 2, 5, 10, 37, 100])
        run_query(oracle, tbs, terms, k)


def test_wand_tie_heavy_corpus():
    """Many identical docs → equal scores → tie-breaks dominate."""
    docs = [(i, ["x", "y"] if i % 2 else ["x"]) for i in range(100)]
    oracle = Bm25Oracle(docs)
    tbs = build_term_blocks(oracle, block_size=4)
    for k in (1, 3, 10, 50, 100):
        run_query(oracle, tbs, ["x"], k)
        run_query(oracle, tbs, ["x", "y"], k)
        run_query(oracle, tbs, ["y"], k)


def test_wand_single_posting_blocks():
    docs = [(i * 7, ["solo"]) for i in range(5)]
    oracle = Bm25Oracle(docs)
    tbs = build_term_blocks(oracle, block_size=1)  # 1 posting per block
    run_query(oracle, tbs, ["solo"], 3)
