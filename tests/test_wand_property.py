"""Property-based WAND kernel tests (hypothesis): on arbitrary random
corpora, block sizes, and queries, the block-max WAND top-k must equal
the brute-force Bm25Oracle ranking — including every eligibility path
(deleted set, allowed set, min_match, search_after cursor).

These complement tests/test_wand_pure.py's fixed corpora: hypothesis
shrinks any failure to a minimal corpus, which is how codec/bound edge
cases (single-doc blocks, tie-heavy scores, empty intersections) stay
covered as the kernel grows features.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from unichem2index_spark.functions.bm25 import Bm25Oracle, score_term
from unichem2index_spark.functions.codec import chunk_postings
from unichem2index_spark.functions.wand import TermBlocks, wand_topk

ALPHABET = ["a", "b", "c", "d", "e"]

corpora = st.lists(
    st.lists(st.sampled_from(ALPHABET), min_size=1, max_size=12),
    min_size=1,
    max_size=40,
)
queries = st.lists(
    st.sampled_from(ALPHABET + ["zzz"]), min_size=1, max_size=4
)


def _blocks(oracle: Bm25Oracle, block_size: int) -> list[TermBlocks]:
    out = []
    for term, plist in oracle.postings.items():
        ids = sorted(plist)
        tfs = [plist[d] for d in ids]
        dls = [oracle.doclen[d] for d in ids]
        idf_t = oracle.idf(term)
        enc, maxids, bms = [], [], []
        for b in chunk_postings(ids, tfs, dls, block_size):
            enc.append(b.encode())
            maxids.append(b.doc_ids[-1])
            bms.append(
                max(
                    score_term(tf, dl, oracle.avgdl, idf_t)
                    for tf, dl in zip(b.tfs, b.dls)
                )
            )
        out.append(
            TermBlocks(
                term=term, idf=idf_t, max_doc_ids=maxids,
                block_max_scores=bms, enc_blocks=enc,
            )
        )
    return out


def _cursors(oracle, terms, block_size):
    tb = {t.term: t for t in _blocks(oracle, block_size)}
    return [tb[t] for t in sorted(set(terms)) if t in tb]


def _full_ranking(oracle: Bm25Oracle, terms) -> list[tuple[int, float]]:
    acc: dict[int, float] = {}
    for t in sorted(set(terms)):
        for d, tf in oracle.postings.get(t, {}).items():
            acc[d] = acc.get(d, 0.0) + score_term(
                tf, oracle.doclen[d], oracle.avgdl, oracle.idf(t)
            )
    return sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))


def _check(got, want):
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-12)


@settings(max_examples=150, deadline=None)
@given(corpora, queries, st.integers(1, 10), st.integers(1, 6))
def test_wand_equals_bruteforce(docs, terms, k, block_size):
    oracle = Bm25Oracle(list(enumerate(docs)))
    got = wand_topk(_cursors(oracle, terms, block_size), oracle.avgdl, k)
    _check(got, _full_ranking(oracle, terms)[:k])


@settings(max_examples=100, deadline=None)
@given(
    corpora, queries, st.integers(1, 8), st.integers(1, 5),
    st.sets(st.integers(0, 39)),
)
def test_wand_deleted_set(docs, terms, k, block_size, deleted):
    oracle = Bm25Oracle(list(enumerate(docs)))
    got = wand_topk(
        _cursors(oracle, terms, block_size), oracle.avgdl, k,
        deleted=frozenset(deleted),
    )
    want = [p for p in _full_ranking(oracle, terms) if p[0] not in deleted]
    _check(got, want[:k])


@settings(max_examples=100, deadline=None)
@given(
    corpora, queries, st.integers(1, 8), st.integers(1, 5),
    st.sets(st.integers(0, 39)),
)
def test_wand_allowed_set(docs, terms, k, block_size, allowed):
    oracle = Bm25Oracle(list(enumerate(docs)))
    got = wand_topk(
        _cursors(oracle, terms, block_size), oracle.avgdl, k,
        allowed=frozenset(allowed),
    )
    want = [p for p in _full_ranking(oracle, terms) if p[0] in allowed]
    _check(got, want[:k])


@settings(max_examples=100, deadline=None)
@given(corpora, queries, st.integers(1, 8), st.integers(1, 5),
       st.integers(1, 4))
def test_wand_min_match(docs, terms, k, block_size, m):
    oracle = Bm25Oracle(list(enumerate(docs)))
    got = wand_topk(
        _cursors(oracle, terms, block_size), oracle.avgdl, k, min_match=m
    )
    uniq = sorted(set(terms))
    eligible = {
        d
        for d in oracle.doclen
        if sum(1 for t in uniq if d in oracle.postings.get(t, {})) >= m
    }
    want = [p for p in _full_ranking(oracle, terms) if p[0] in eligible]
    _check(got, want[:k])


@settings(max_examples=150, deadline=None)
@given(corpora, queries, st.integers(1, 8), st.integers(1, 5),
       st.integers(0, 45))
def test_wand_search_after_cursor(docs, terms, k, block_size, rank):
    """Paging from ANY rank: wand(after=sort values of rank r) must equal
    the ranking slice [r, r+k) — the tiling invariant. The cursor is
    taken from the KERNEL's own emitted (raw_score, doc_id), which is
    the ES search_after contract (sort values come from the previous
    RESPONSE, never recomputed elsewhere): a cursor score recomputed by
    a different float summation order can sit 1 ulp off the kernel's
    and flip the strict-inequality eligibility test (hypothesis found
    such a corpus), so an oracle-derived raw cursor is outside the
    API contract. Order identity vs the brute-force oracle is covered
    by test_wand_equals_bruteforce; here we assert self-consistent
    tiling."""
    oracle = Bm25Oracle(list(enumerate(docs)))
    full = wand_topk(
        _cursors(oracle, terms, block_size), oracle.avgdl, 64
    )
    if not full:
        return
    rank = min(rank, len(full) - 1)
    after = (full[rank][1], full[rank][0])
    got = wand_topk(
        _cursors(oracle, terms, block_size), oracle.avgdl, k, after=after
    )
    _check(got, full[rank + 1 : rank + 1 + k])


@settings(max_examples=100, deadline=None)
@given(corpora, queries, st.integers(1, 8), st.integers(1, 5))
def test_wand_mult_equals_bruteforce(docs, terms, k, block_size):
    """Per-doc multiplier (field_value_factor served in-kernel): pruning
    on bound * mult_bound must stay exact for the MULTIPLIED ranking,
    including docs absent from the map (ineligible)."""
    oracle = Bm25Oracle(list(enumerate(docs)))
    # deterministic per-doc multiplier in (0, 1.05]; every 7th doc absent
    mult = {
        d: 0.05 + ((d * 37) % 100) / 100.0
        for d in oracle.doclen
        if d % 7 != 3
    }
    bound = max(mult.values(), default=1.0)
    got = wand_topk(
        _cursors(oracle, terms, block_size), oracle.avgdl, k,
        mult=mult, mult_bound=bound,
    )
    want = sorted(
        (
            (d, s * mult[d])
            for d, s in _full_ranking(oracle, terms)
            if d in mult
        ),
        key=lambda kv: (-kv[1], kv[0]),
    )
    _check(got, want[:k])


@settings(max_examples=100, deadline=None)
@given(corpora, queries, st.integers(1, 8), st.integers(1, 5),
       st.integers(0, 9))
def test_wand_callable_mult_equals_bruteforce(docs, terms, k, block_size, seed):
    """Callable multiplier (closed-form random_score): same exactness
    guarantee as the dict path, zero side data."""
    oracle = Bm25Oracle(list(enumerate(docs)))
    MULT, MOD = 2654435761, 4294967296

    def r(d):
        return ((d + seed) * MULT) % MOD / float(MOD)

    got = wand_topk(
        _cursors(oracle, terms, block_size), oracle.avgdl, k,
        mult=r, mult_bound=1.0,
    )
    want = sorted(
        ((d, s * r(d)) for d, s in _full_ranking(oracle, terms)),
        key=lambda kv: (-kv[1], kv[0]),
    )
    _check(got, want[:k])


# ---------------------------------------------------------------- maxscore


@settings(max_examples=150, deadline=None)
@given(corpora, queries, st.integers(1, 10), st.integers(1, 6))
def test_maxscore_equals_bruteforce(docs, terms, k, block_size):
    from unichem2index_spark.functions.wand import maxscore_topk

    oracle = Bm25Oracle(list(enumerate(docs)))
    got = maxscore_topk(
        _cursors(oracle, terms, block_size), oracle.avgdl, k
    )
    _check(got, _full_ranking(oracle, terms)[:k])


@settings(max_examples=100, deadline=None)
@given(
    corpora, queries, st.integers(1, 8), st.integers(1, 5),
    st.sets(st.integers(0, 39)),
)
def test_maxscore_deleted_set(docs, terms, k, block_size, deleted):
    from unichem2index_spark.functions.wand import maxscore_topk

    oracle = Bm25Oracle(list(enumerate(docs)))
    got = maxscore_topk(
        _cursors(oracle, terms, block_size), oracle.avgdl, k,
        deleted=frozenset(deleted),
    )
    want = [
        (d, s) for d, s in _full_ranking(oracle, terms)
        if d not in deleted
    ][:k]
    _check(got, want)


@settings(max_examples=150, deadline=None)
@given(corpora, queries, st.integers(1, 10), st.integers(1, 6))
def test_maxscore_bit_equal_to_wand(docs, terms, k, block_size):
    """Both kernels accumulate full evaluations in canonical term order,
    so their (doc_id, score) outputs must be BIT-equal — the property
    that lets serving swap strategies per query (as Lucene does) without
    a visible ranking flip."""
    from unichem2index_spark.functions.wand import maxscore_topk

    oracle = Bm25Oracle(list(enumerate(docs)))
    a = wand_topk(_cursors(oracle, terms, block_size), oracle.avgdl, k)
    b = maxscore_topk(
        _cursors(oracle, terms, block_size), oracle.avgdl, k
    )
    assert a == b
