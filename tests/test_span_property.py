"""Property-based tests (hypothesis) for the positional span kernels:
on arbitrary random corpora, block sizes, and windows, min_span must
equal the itertools cross-product brute force, and span_near_match_topk /
span_first_match_topk must equal a positions-scan brute force with BM25
scores from the shared Bm25Oracle.

Complements tests/test_phrase.py's fixed corpora the same way
test_wand_property.py complements test_wand_pure.py: hypothesis shrinks
any failure to a minimal corpus, keeping codec/window edge cases
(single-position lists, ties, absent terms, boundary-exact spans)
covered as the span family grows.
"""

from __future__ import annotations

import itertools

from hypothesis import given, settings
from hypothesis import strategies as st

from unichem2index_spark.functions.bm25 import Bm25Oracle
from unichem2index_spark.functions.codec import chunk_postings, encode_positions
from unichem2index_spark.functions.phrase import (
    PosTermPostings,
    min_span,
    span_first_match_topk,
    span_near_match_topk,
    span_not_match_topk,
)

ALPHABET = ["a", "b", "c", "d"]

corpora = st.lists(
    st.lists(st.sampled_from(ALPHABET), min_size=1, max_size=10),
    min_size=1,
    max_size=25,
)
term_sets = st.lists(
    st.sampled_from(ALPHABET + ["zzz"]), min_size=1, max_size=3
)
pos_lists = st.lists(
    st.lists(st.integers(0, 30), min_size=1, max_size=5).map(
        lambda xs: sorted(set(xs))
    ),
    min_size=1,
    max_size=4,
)


def _posts_from_corpus(
    corpus: list[list[str]], block_size: int
) -> tuple[dict[str, PosTermPostings], Bm25Oracle]:
    rows = list(enumerate(corpus))
    oracle = Bm25Oracle(rows)
    posts: dict[str, PosTermPostings] = {}
    occ: dict[str, dict[int, list[int]]] = {}
    for d, toks in rows:
        for i, t in enumerate(toks):
            occ.setdefault(t, {}).setdefault(d, []).append(i)
    for term, doc_pos in occ.items():
        ids = sorted(doc_pos)
        tfs = [len(doc_pos[d]) for d in ids]
        dls = [len(corpus[d]) for d in ids]
        plists = [doc_pos[d] for d in ids]
        enc, maxids = [], []
        for i, blk in enumerate(chunk_postings(ids, tfs, dls, block_size)):
            gaps_b, tfs_b, dls_b = blk.encode()
            lo = i * block_size
            enc.append(
                (gaps_b, tfs_b, dls_b,
                 encode_positions(plists[lo : lo + block_size]))
            )
            maxids.append(blk.doc_ids[-1])
        posts[term] = PosTermPostings(
            term=term, max_doc_ids=maxids, enc_blocks=enc, df=len(ids)
        )
    return posts, oracle


@given(pos_lists)
@settings(max_examples=300, deadline=None)
def test_min_span_equals_bruteforce(plists):
    brute = min(max(c) - min(c) for c in itertools.product(*plists))
    assert min_span(plists) == brute


@given(corpora, term_sets, st.integers(0, 3), st.sampled_from([1, 2, 4, 16]))
@settings(max_examples=150, deadline=None)
def test_span_near_equals_bruteforce(corpus, terms, slop, block_size):
    posts, oracle = _posts_from_corpus(corpus, block_size)
    uniq = sorted(set(terms))
    idfs = {t: oracle.idf(t) for t in uniq if t in posts}
    # absent terms leave idfs short; the kernel must return [] on its own
    got = span_near_match_topk(
        posts, terms, idfs, oracle.avgdl, 10, slop=slop
    )
    window = slop + len(uniq) - 1
    want = []
    for d, toks in enumerate(corpus):
        plists = [
            [i for i, t in enumerate(toks) if t == u] for u in uniq
        ]
        if any(not p for p in plists):
            continue
        if min(
            max(c) - min(c) for c in itertools.product(*plists)
        ) > window:
            continue
        want.append((d, oracle.score_doc(uniq, d)))
    want.sort(key=lambda p: (-p[1], p[0]))
    assert [(d, round(s, 6)) for d, s in got] == [
        (d, round(s, 6)) for d, s in want[:10]
    ]


@given(
    corpora,
    st.sampled_from(ALPHABET + ["zzz"]),
    st.integers(1, 6),
    st.sampled_from([1, 2, 4, 16]),
)
@settings(max_examples=150, deadline=None)
def test_span_first_equals_bruteforce(corpus, term, end, block_size):
    posts, oracle = _posts_from_corpus(corpus, block_size)
    idf = oracle.idf(term) if term in posts else 0.0
    got = span_first_match_topk(posts, term, idf, oracle.avgdl, 10, end)
    want = sorted(
        (
            (d, oracle.score_doc([term], d))
            for d, toks in enumerate(corpus)
            if term in toks[:end]
        ),
        key=lambda p: (-p[1], p[0]),
    )[:10]
    assert [(d, round(s, 6)) for d, s in got] == [
        (d, round(s, 6)) for d, s in want
    ]


@given(
    corpora,
    st.sampled_from(ALPHABET),
    st.sampled_from(ALPHABET + ["zzz"]),
    st.integers(0, 3),
    st.sampled_from([1, 2, 4, 16]),
)
@settings(max_examples=150, deadline=None)
def test_span_not_equals_bruteforce(corpus, inc, exc, dist, block_size):
    posts, oracle = _posts_from_corpus(corpus, block_size)
    idf = oracle.idf(inc) if inc in posts else 0.0
    got = span_not_match_topk(
        posts, inc, exc, idf, oracle.avgdl, 10, dist=dist
    )
    want = []
    for d, toks in enumerate(corpus):
        apos = [i for i, t in enumerate(toks) if t == inc]
        bpos = [i for i, t in enumerate(toks) if t == exc]
        if any(all(abs(a - b) > dist for b in bpos) for a in apos):
            want.append((d, oracle.score_doc([inc], d)))
    want.sort(key=lambda p: (-p[1], p[0]))
    assert [(d, round(s, 6)) for d, s in got] == [
        (d, round(s, 6)) for d, s in want[:10]
    ]
