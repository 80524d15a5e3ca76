"""Positional index + exact-phrase BM25 (beyond-reference: ES answers
match_phrase by default on the index the reference creates,
extractor/loader.go:121, but its own calls never issue one).

Contract under test:
* position codec round-trips per-doc position lists against the block tf
  counts;
* phrase_topk == pure-Python oracle (phrase filter over consecutive
  tokens + the frozen BM25 bag score) on the fixture corpus;
* the BM25/WAND paths are unchanged by the positional layout (rank- and
  score-identical on the same corpus);
* updates and compaction preserve positions (phrase results after
  add_generation + compact equal a fresh positional build over the live
  corpus).
"""

from __future__ import annotations

import pytest

from unichem2index_spark.functions.bm25 import Bm25Oracle
from unichem2index_spark.functions.codec import (
    decode_positions,
    encode_positions,
)
from unichem2index_spark.functions.tokenize import tokenize
from unichem2index_spark.operators import query as Q
from unichem2index_spark.operators.build import build_index

from tests.conftest import SF_SMOKE

PHRASES = [
    ["merge", "group"],
    ["the"],
    ["part", "filter"],
    ["merge", "group", "nosuchword"],
]


def phrase_oracle(corpus, phrase, k):
    """corpus: [(doc_id, tokens)]. Docs containing the phrase as
    consecutive tokens, BM25-scored over the unique phrase terms."""
    oracle = Bm25Oracle(corpus)
    n = len(phrase)
    uniq = sorted(set(phrase))
    out = []
    for doc_id, toks in corpus:
        if not any(toks[i : i + n] == phrase for i in range(len(toks) - n + 1)):
            continue
        out.append((doc_id, round(oracle.score_doc(uniq, doc_id), 6)))
    out.sort(key=lambda p: (-p[1], p[0]))
    return out[:k]


def test_position_codec_roundtrip():
    pos_lists = [[0, 3, 7], [2], [], [5, 6, 100, 4096], [0]]
    tfs = [len(p) for p in pos_lists]
    blob = encode_positions(pos_lists)
    assert decode_positions(blob, tfs) == pos_lists
    with pytest.raises(ValueError):
        decode_positions(blob, tfs[:-1])  # count mismatch detected


@pytest.fixture(scope="module")
def pos_index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pos_idx"))
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    build_index(spark, docs, out, n_shards=4, positions=True)
    rows = [
        (r.doc_id, tokenize(r.text))
        for r in docs.select("doc_id", "text").collect()
    ]
    return out, rows


def test_phrase_topk_matches_oracle(spark, pos_index):
    out, corpus = pos_index
    h = Q.IndexHandle.open(spark, out)
    assert h.has_positions
    for phrase in PHRASES:
        got = [
            (r.doc_id, r.score)
            for r in Q.phrase_topk(spark, h, phrase, 10).collect()
        ]
        assert got == phrase_oracle(corpus, phrase, 10), f"phrase {phrase}"


def phrase_match_py(toks, phrase, slop):
    """Pure-Python slop oracle: ordered match, each adjacent pair at most
    ``slop`` extra tokens apart."""
    live = {i for i, t in enumerate(toks) if t == phrase[0]}
    for term in phrase[1:]:
        pos = [i for i, t in enumerate(toks) if t == term]
        live = {q for q in pos if any(p < q <= p + 1 + slop for p in live)}
        if not live:
            return False
    return bool(live)


def test_phrase_slop_matches_oracle(spark, pos_index):
    from unichem2index_spark.functions.bm25 import Bm25Oracle

    out, corpus = pos_index
    h = Q.IndexHandle.open(spark, out)
    oracle = Bm25Oracle(corpus)
    for phrase, slop in [
        (["merge", "group"], 1),
        (["merge", "group"], 3),
        (["the", "merge", "group"], 2),
    ]:
        uniq = sorted(set(phrase))
        want = sorted(
            (
                (d, round(oracle.score_doc(uniq, d), 6))
                for d, toks in corpus
                if phrase_match_py(toks, phrase, slop)
            ),
            key=lambda p: (-p[1], p[0]),
        )[:10]
        got = [
            (r.doc_id, r.score)
            for r in Q.phrase_topk(spark, h, phrase, 10, slop=slop).collect()
        ]
        assert got == want, f"phrase {phrase} slop {slop}"
        # slop strictly widens the exact-phrase match set
        exact_docs = {
            r.doc_id for r in Q.phrase_topk(spark, h, phrase, 10**6).collect()
        }
        slop_docs = {
            r.doc_id
            for r in Q.phrase_topk(spark, h, phrase, 10**6, slop=slop).collect()
        }
        assert exact_docs <= slop_docs


def _make_ptp(term, doc_pos, block_size=8, stats=None, dl=10):
    """Encode one term's positional blocks. doc_pos: {doc_id: [positions]}
    (sorted by doc_id)."""
    from unichem2index_spark.functions.codec import (
        chunk_postings,
        encode_positions,
    )
    from unichem2index_spark.functions.phrase import PosTermPostings

    ids = sorted(doc_pos)
    tfs = [len(doc_pos[d]) for d in ids]
    dls = [dl] * len(ids)
    pos_lists = [doc_pos[d] for d in ids]
    enc, maxids = [], []
    for i, blk in enumerate(chunk_postings(ids, tfs, dls, block_size)):
        gaps_b, tfs_b, dls_b = blk.encode()
        lo = i * block_size
        enc.append(
            (gaps_b, tfs_b, dls_b,
             encode_positions(pos_lists[lo : lo + block_size]))
        )
        maxids.append(blk.doc_ids[-1])
    return PosTermPostings(
        term=term, max_doc_ids=maxids, enc_blocks=enc, df=len(ids),
        stats=stats,
    )


def test_phrase_block_skipping_stopword():
    """Verdict r3 item 2: a phrase containing the corpus's highest-df term
    must NOT decode that term's full per-shard postings — candidates come
    from the rarest term and other terms are probed via per-block
    max_doc_id. 2000-doc stopword, 2-doc rare term, block_size=8: at most
    a handful of the stopword's 250 blocks may decode."""
    from unichem2index_spark.functions.phrase import (
        DecodeStats,
        phrase_match_topk,
    )

    stats = DecodeStats()
    n = 2000
    stop = _make_ptp("the", {d: [0, 5] for d in range(n)}, stats=stats)
    rare = _make_ptp("zebra", {100: [1], 1500: [1]}, stats=stats)
    idfs = {"the": 0.01, "zebra": 5.0}
    top = phrase_match_topk(
        {"the": stop, "zebra": rare}, ["the", "zebra"], idfs, 10.0, 10
    )
    assert [d for d, _ in top] == [100, 1500]
    # the stopword decoded only the blocks its 2 candidates touch
    assert stats.postings["zebra"] == 2
    assert stats.postings["the"] <= 4 * 8  # <= 4 blocks of 8 << df 2000
    assert stats.positions["the"] <= 4 * 16
    # no-match phrase: zero positions decoded anywhere
    stats2 = DecodeStats()
    stop2 = _make_ptp("the", {d: [0] for d in range(n)}, stats=stats2)
    rare2 = _make_ptp("zebra", {100: [5]}, stats=stats2)  # not adjacent
    top2 = phrase_match_topk(
        {"the": stop2, "zebra": rare2}, ["the", "zebra"], idfs, 10.0, 10
    )
    assert top2 == []
    assert stats2.postings["the"] <= 2 * 8


def test_phrase_batch_rank_identity(spark, pos_index):
    """phrase_topk_batch == phrase_topk run one-by-one (rank, doc, score),
    including slop variants and a no-hit phrase in the same batch."""
    out, corpus = pos_index
    h = Q.IndexHandle.open(spark, out)
    batch = [
        {"query_id": 0, "phrase": ["merge", "group"], "k": 10},
        {"query_id": 1, "phrase": ["the"], "k": 5},
        {"query_id": 2, "phrase": ["part", "filter"], "k": 10},
        {"query_id": 3, "phrase": ["merge", "group"], "k": 10, "slop": 2},
        {"query_id": 4, "phrase": ["merge", "nosuchword"], "k": 10},
        {"query_id": 5, "phrase": [], "k": 5},  # must not crash the batch
    ]
    got = [
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in Q.phrase_topk_batch(spark, h, batch).collect()
    ]
    exp = []
    for q in batch:
        rows = Q.phrase_topk(
            spark, h, q["phrase"], q["k"], slop=q.get("slop", 0)
        ).collect()
        exp.extend(
            (q["query_id"], i + 1, r.doc_id, r.score)
            for i, r in enumerate(rows)
        )
    assert got == exp and len(got) > 10


def test_bm25_filtered_matches_oracle(spark, pos_index):
    """ES bool filter semantics: candidates restricted, scores identical
    to the unfiltered query for surviving docs."""
    from unichem2index_spark.functions.bm25 import Bm25Oracle

    from tests.conftest import SF_SMOKE

    out, corpus = pos_index
    h = Q.IndexHandle.open(spark, out)
    docs_meta = {
        r.doc_id: r.lang
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "lang")
        .collect()
    }
    oracle = Bm25Oracle(corpus)
    terms, k = ["the", "merge", "vector"], 12
    full = oracle.topk(terms, len(corpus))
    want = [
        (d, round(s, 6)) for d, s in full if docs_meta.get(d) == "en"
    ][:k]
    got = [
        (r.doc_id, r.score)
        for r in Q.bm25_topk_filtered(
            spark, h, terms, k, "lang = 'en'"
        ).collect()
    ]
    assert got == want
    # empty filter -> empty result, no crash
    assert (
        Q.bm25_topk_filtered(spark, h, terms, k, "lang = 'zz'").count() == 0
    )


def test_bm25_filtered_mode_equivalence(spark, pos_index):
    """Verdict r3 item 5: the bitset (allowed-set) and complement
    (disallowed-set) plans must return identical top-k — auto picks by
    measured selectivity, so broad predicates stop shipping a bitset of
    nearly the whole shard."""
    out, corpus = pos_index
    h = Q.IndexHandle.open(spark, out)
    terms, k = ["the", "merge", "vector"], 12
    preds = [
        "lang = 'en'",        # whatever the corpus majority is
        "doclen > 5",         # broad: nearly every doc
        "doclen % 7 = 0",     # selective-ish
        "lang = 'zz'",        # empty
    ]
    for pred in preds:
        res = {
            m: [
                (r.doc_id, r.score)
                for r in Q.bm25_topk_filtered(
                    spark, h, terms, k, pred, mode=m
                ).collect()
            ]
            for m in ("bitset", "complement", "auto")
        }
        assert res["bitset"] == res["complement"] == res["auto"], pred
    with pytest.raises(ValueError, match="mode"):
        Q.bm25_topk_filtered(spark, h, terms, k, "doclen > 5", mode="nope")


def test_phrase_requires_positions(spark, tmp_path):
    out = str(tmp_path / "plain")
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(50)
    build_index(spark, docs, out, n_shards=2)
    h = Q.IndexHandle.open(spark, out)
    assert not h.has_positions
    with pytest.raises(ValueError, match="positional"):
        Q.phrase_topk(spark, h, ["merge", "group"], 5)


def test_wand_unchanged_on_positional_index(spark, pos_index):
    """BM25 results must be independent of the index layout — the WAND
    kernel prunes the positions column out of its Arrow transfer."""
    out, corpus = pos_index
    h = Q.IndexHandle.open(spark, out)
    oracle = Bm25Oracle(corpus)
    got = [
        (r.doc_id, r.score)
        for r in Q.bm25_topk_wand(spark, h, ["the", "merge", "vector"], 12).collect()
    ]
    want = [(d, round(s, 6)) for d, s in oracle.topk(["the", "merge", "vector"], 12)]
    assert got == want


def test_positions_survive_update_and_compact(spark, tmp_path):
    import datetime as dt

    from unichem2index_spark.operators.ingest import build_index_from_webtext
    from unichem2index_spark.operators.update import add_generation, compact
    from unichem2index_spark.schemas import WEBTEXT_SCHEMA
    from unichem2index_spark.synth import gen_webtext, gen_webtext_row

    rows = gen_webtext(120, seed=23)
    wt = spark.createDataFrame(rows, schema=WEBTEXT_SCHEMA)
    out = str(tmp_path / "poswt")
    # url_map is what makes replacements tombstone (doc_as_upsert) —
    # build through the webtext pipeline, positional layout on
    build_index_from_webtext(spark, wt, out, n_shards=4, positions=True)

    upd = []
    for j, r in enumerate(rows[:15]):
        nr = gen_webtext_row(60_000 + j, seed=29)
        nr["url"] = r["url"]
        nr["warc_ts"] = r["warc_ts"] + dt.timedelta(days=400)
        upd.append(nr)
    add_generation(spark, out, spark.createDataFrame(upd, schema=WEBTEXT_SCHEMA))
    h_upd = Q.IndexHandle.open(spark, out)
    assert h_upd.has_positions and h_upd.multi_gen
    # phrase queries answer across generations (new gen carries positions).
    # Capture the full MATCH SET pre-compact: phrase membership depends
    # only on positions, never on corpus stats, so compaction must
    # preserve it exactly. (Scores DO drift at compaction by design:
    # multi-gen stats still count tombstoned docs — the ES/Lucene
    # deleted-docs-until-merge analog — while compact recomputes over
    # live docs; test_compact_equals_fresh_build pins the post-compact
    # scores to a fresh build.)
    pre_compact_matches = {
        p: sorted(
            r.doc_id
            for r in Q.phrase_topk(spark, h_upd, list(p), 10**6).collect()
        )
        for p in (("the", "merge"), ("the",))
    }
    assert len(pre_compact_matches[("the",)]) >= 10

    compact(spark, out)
    h = Q.IndexHandle.open(spark, out)
    assert h.has_positions

    # fresh positional build over the live corpus with the same doc_ids
    um = h.store.read(spark, "url_map").select("doc_id", "url")
    base_texts = {r["url"]: r["text"] for r in wt.select("url", "text").collect()}
    upd_texts = {r["url"]: r["text"] for r in upd}
    fresh_rows = [
        (r.doc_id, upd_texts.get(r.url, base_texts.get(r.url)))
        for r in um.collect()
    ]
    fresh_out = str(tmp_path / "posfresh")
    build_index(
        spark,
        spark.createDataFrame(fresh_rows, "doc_id long, text string"),
        fresh_out,
        n_shards=4,
        positions=True,
    )
    fresh = Q.IndexHandle.open(spark, fresh_out)
    for phrase in (["the", "merge"], ["the"]):
        got = [
            (r.doc_id, r.score)
            for r in Q.phrase_topk(spark, h, phrase, 10).collect()
        ]
        exp = [
            (r.doc_id, r.score)
            for r in Q.phrase_topk(spark, fresh, phrase, 10).collect()
        ]
        assert got == exp and got, f"phrase {phrase}"
        # compaction preserved the exact phrase-match set
        post_matches = sorted(
            r.doc_id for r in Q.phrase_topk(spark, h, phrase, 10**6).collect()
        )
        assert post_matches == pre_compact_matches[tuple(phrase)]


def test_min_span_pure():
    from unichem2index_spark.functions.phrase import min_span

    assert min_span([[3], [5], [1]]) == 4
    assert min_span([[0, 10], [11], [12, 30]]) == 2
    assert min_span([[7], [7]]) == 0
    # sweep must advance past a local optimum to find the tight cluster
    assert min_span([[1, 100, 102], [2, 101], [3, 103]]) == 2
    # single list: span is zero
    assert min_span([[4, 9]]) == 0
    # brute-force cross-check on a small random-ish instance
    import itertools

    lists = [[0, 6, 13], [2, 7], [5, 14, 20]]
    brute = min(
        max(c) - min(c) for c in itertools.product(*lists)
    )
    assert min_span(lists) == brute


def span_near_py(toks, terms, slop):
    """Brute-force unordered-near oracle: some choice of one position per
    distinct term spans <= slop + n - 1."""
    import itertools

    uniq = sorted(set(terms))
    plists = [[i for i, t in enumerate(toks) if t == u] for u in uniq]
    if any(not p for p in plists):
        return False
    window = slop + len(uniq) - 1
    return any(
        max(c) - min(c) <= window for c in itertools.product(*plists)
    )


def test_span_near_matches_bruteforce(spark, pos_index):
    from unichem2index_spark.functions.bm25 import Bm25Oracle

    out, corpus = pos_index
    h = Q.IndexHandle.open(spark, out)
    oracle = Bm25Oracle(corpus)
    for terms, slop in [
        (["merge", "group"], 0),
        (["merge", "group", "key"], 1),
        (["the", "merge"], 2),
        (["group", "merge"], 0),  # order-insensitive by construction
    ]:
        uniq = sorted(set(terms))
        want = sorted(
            (
                (d, round(oracle.score_doc(uniq, d), 6))
                for d, toks in corpus
                if span_near_py(toks, terms, slop)
            ),
            key=lambda p: (-p[1], p[0]),
        )[:10]
        got = [
            (r.doc_id, r.score)
            for r in Q.span_near_topk(spark, h, terms, 10, slop=slop).collect()
        ]
        assert got == want, f"span_near {terms} slop {slop}"
    # unordered-near at slop s admits every ordered slop-s phrase match
    phrase = ["merge", "group"]
    ordered = {
        r.doc_id
        for r in Q.phrase_topk(spark, h, phrase, 10**6, slop=1).collect()
    }
    unordered = {
        r.doc_id
        for r in Q.span_near_topk(spark, h, phrase, 10**6, slop=1).collect()
    }
    assert ordered <= unordered


def test_span_first_matches_bruteforce(spark, pos_index):
    from unichem2index_spark.functions.bm25 import Bm25Oracle

    out, corpus = pos_index
    h = Q.IndexHandle.open(spark, out)
    oracle = Bm25Oracle(corpus)
    for term, end in [("merge", 3), ("the", 1), ("dup", 5)]:
        want = sorted(
            (
                (d, round(oracle.score_doc([term], d), 6))
                for d, toks in corpus
                if term in toks[:end]
            ),
            key=lambda p: (-p[1], p[0]),
        )[:10]
        got = [
            (r.doc_id, r.score)
            for r in Q.span_first_topk(spark, h, term, 10, end).collect()
        ]
        assert got == want, f"span_first {term} end={end}"
    # end larger than any doc = plain single-term BM25
    full = {
        r.doc_id
        for r in Q.span_first_topk(spark, h, "merge", 10**6, 10**6).collect()
    }
    assert full == {d for d, toks in corpus if "merge" in toks}


def test_span_not_matches_bruteforce(spark, pos_index):
    from unichem2index_spark.functions.bm25 import Bm25Oracle

    out, corpus = pos_index
    h = Q.IndexHandle.open(spark, out)
    oracle = Bm25Oracle(corpus)

    def survives(toks, inc, exc, dist):
        apos = [i for i, t in enumerate(toks) if t == inc]
        bpos = [i for i, t in enumerate(toks) if t == exc]
        return any(
            all(abs(a - b) > dist for b in bpos) for a in apos
        )

    for inc, exc, dist in [
        ("merge", "group", 1),
        ("the", "merge", 0),
        ("merge", "nosuchterm", 2),  # nothing excluded: plain term query
    ]:
        want = sorted(
            (
                (d, round(oracle.score_doc([inc], d), 6))
                for d, toks in corpus
                if survives(toks, inc, exc, dist)
            ),
            key=lambda p: (-p[1], p[0]),
        )[:10]
        got = [
            (r.doc_id, r.score)
            for r in Q.span_not_topk(spark, h, inc, exc, 10, dist=dist).collect()
        ]
        assert got == want, f"span_not {inc} !~ {exc} dist={dist}"
    # widening dist can only shrink the match set
    wide = {
        r.doc_id
        for r in Q.span_not_topk(spark, h, "merge", "group", 10**6, dist=4).collect()
    }
    narrow = {
        r.doc_id
        for r in Q.span_not_topk(spark, h, "merge", "group", 10**6, dist=0).collect()
    }
    assert wide <= narrow


def span_near_or_py(toks, groups, slop):
    """Brute-force nested-span oracle: one position per GROUP (any
    member) spans <= slop + n_groups - 1."""
    import itertools

    plists = []
    for g in groups:
        ps = [i for i, t in enumerate(toks) if t in set(g)]
        if not ps:
            return False
        plists.append(ps)
    window = slop + len(groups) - 1
    return any(
        max(c) - min(c) <= window for c in itertools.product(*plists)
    )


def test_span_near_or_matches_bruteforce(spark, pos_index):
    from unichem2index_spark.functions.bm25 import (
        Bm25Oracle,
        score_term,
    )

    out, corpus = pos_index
    h = Q.IndexHandle.open(spark, out)
    oracle = Bm25Oracle(corpus)

    def blend_score(groups, doc_toks):
        # synonym discipline: tf summed over members, idf at max df
        s = 0.0
        for g in groups:
            tf = sum(1 for t in doc_toks if t in set(g))
            df = max(len(oracle.postings.get(t, {})) for t in g)
            from unichem2index_spark.functions.bm25 import idf as idf_fn

            s += score_term(
                tf, len(doc_toks), oracle.avgdl, idf_fn(oracle.n_docs, df)
            )
        return s

    for groups, slop in [
        ([["fast", "slow"], ["merge"]], 2),
        ([["merge"], ["group", "key"]], 0),
        ([["the"], ["merge", "group"], ["key"]], 1),
    ]:
        want = sorted(
            (
                (d, round(blend_score(groups, toks), 6))
                for d, toks in corpus
                if span_near_or_py(toks, groups, slop)
            ),
            key=lambda p: (-p[1], p[0]),
        )[:10]
        got = [
            (r.doc_id, r.score)
            for r in Q.span_near_or_topk(
                spark, h, groups, 10, slop=slop
            ).collect()
        ]
        assert got == want, f"span_near_or {groups} slop {slop}"

    # singleton groups degenerate to plain span_near
    terms = ["merge", "group"]
    a = [
        (r.doc_id, r.score)
        for r in Q.span_near_or_topk(
            spark, h, [[t] for t in terms], 10, slop=1
        ).collect()
    ]
    b = [
        (r.doc_id, r.score)
        for r in Q.span_near_topk(spark, h, terms, 10, slop=1).collect()
    ]
    assert a == b


def intervals_ordered_py(toks, terms, max_gaps):
    """Brute-force oracle: exists strictly-increasing positions in
    query order with total span <= max_gaps + n - 1."""
    import itertools

    plists = []
    for t in terms:
        ps = [i for i, x in enumerate(toks) if x == t]
        if not ps:
            return False
        plists.append(ps)
    window = max_gaps + len(terms) - 1
    return any(
        all(c[i] < c[i + 1] for i in range(len(c) - 1))
        and c[-1] - c[0] <= window
        for c in itertools.product(*plists)
    )


def test_intervals_ordered_matches_bruteforce(spark, pos_index):
    from unichem2index_spark.functions.bm25 import Bm25Oracle

    out, corpus = pos_index
    h = Q.IndexHandle.open(spark, out)
    oracle = Bm25Oracle(corpus)
    for terms, gaps in [
        (["merge", "group"], 0),
        (["merge", "group", "key"], 2),
        (["group", "merge"], 1),  # ORDER-sensitive, unlike span_near
        (["the", "merge"], 3),
    ]:
        uniq = sorted(set(terms))
        want = sorted(
            (
                (d, round(oracle.score_doc(uniq, d), 6))
                for d, toks in corpus
                if intervals_ordered_py(toks, terms, gaps)
            ),
            key=lambda p: (-p[1], p[0]),
        )[:10]
        got = [
            (r.doc_id, r.score)
            for r in Q.intervals_ordered_topk(
                spark, h, terms, 10, max_gaps=gaps
            ).collect()
        ]
        assert got == want, f"intervals_ordered {terms} gaps {gaps}"
    # an ordered chain inside budget B always fits the unordered
    # window at slop B: intervals matches are a subset of span_near's
    terms, b = ["merge", "group", "key"], 2
    ordered = {
        r.doc_id
        for r in Q.intervals_ordered_topk(
            spark, h, terms, 10**6, max_gaps=b
        ).collect()
    }
    unordered = {
        r.doc_id
        for r in Q.span_near_topk(spark, h, terms, 10**6, slop=b).collect()
    }
    assert ordered <= unordered
    # order sensitivity: reversed query must not be forced equal
    rev = {
        r.doc_id
        for r in Q.intervals_ordered_topk(
            spark, h, list(reversed(terms)), 10**6, max_gaps=b
        ).collect()
    }
    assert rev <= unordered


def phrase_prefix_py(toks, fixed, members, slop):
    """Brute-force: a fixed-term chain with per-adjacent-pair gaps in
    [1, slop+1], then ANY expansion member within the same gap."""
    live = {i for i, t in enumerate(toks) if t == fixed[0]}
    for term in fixed[1:]:
        pos = [i for i, t in enumerate(toks) if t == term]
        live = {q for q in pos if any(p < q <= p + 1 + slop for p in live)}
        if not live:
            return False
    mem = set(members)
    return any(
        p < q <= p + 1 + slop
        for q, t in enumerate(toks)
        if t in mem
        for p in live
    )


def test_match_phrase_prefix_matches_bruteforce(spark, pos_index):
    from unichem2index_spark.functions.bm25 import (
        Bm25Oracle,
        idf as idf_fn,
        score_term,
    )

    out, corpus = pos_index
    h = Q.IndexHandle.open(spark, out)
    oracle = Bm25Oracle(corpus)
    vocab = sorted(oracle.postings)

    def expansion(prefix, fixed, cap):
        exp = [t for t in vocab if t.startswith(prefix)][:cap]
        return [t for t in exp if t not in set(fixed)]

    def pp_score(fixed, members, doc_id):
        dl = oracle.doclen[doc_id]
        s = oracle.score_doc(sorted(set(fixed)), doc_id)
        gtf = sum(oracle.postings.get(t, {}).get(doc_id, 0) for t in members)
        gdf = max(len(oracle.postings.get(t, {})) for t in members)
        return s + score_term(gtf, dl, oracle.avgdl, idf_fn(oracle.n_docs, gdf))

    for fixed, prefix, cap, slop in [
        (["merge"], "s", 4, 0),  # cap trims spark/stream
        (["merge"], "s", 50, 0),  # full 6-way expansion
        (["merge"], "s", 50, 1),  # slop-budgeted chain
        (["the", "merge"], "g", 50, 0),  # two fixed slots
        (["key"], "d", 50, 0),  # data | dup (rare member)
    ]:
        members = expansion(prefix, fixed, cap)
        want = sorted(
            (
                (d, round(pp_score(fixed, members, d), 6))
                for d, toks in corpus
                if phrase_prefix_py(toks, fixed, members, slop)
            ),
            key=lambda p: (-p[1], p[0]),
        )[:10]
        got = [
            (r.doc_id, r.score)
            for r in Q.match_phrase_prefix_topk(
                spark, h, fixed, prefix, 10, max_expansions=cap, slop=slop
            ).collect()
        ]
        assert got == want, f"match_phrase_prefix {fixed} {prefix}*"

    # a single-member expansion degenerates to the plain phrase: the
    # blended slot's tf/idf collapse to that member's own tf/idf
    a = [
        (r.doc_id, r.score)
        for r in Q.match_phrase_prefix_topk(
            spark, h, ["merge"], "gro", 10
        ).collect()
    ]
    b = [
        (r.doc_id, r.score)
        for r in Q.phrase_topk(spark, h, ["merge", "group"], 10).collect()
    ]
    assert a == b and a
    # unknown prefix and prefix-eats-fixed both yield empty, not error
    assert Q.match_phrase_prefix_topk(spark, h, ["merge"], "zz", 10).count() == 0
    assert (
        Q.match_phrase_prefix_topk(spark, h, ["group"], "group", 10).count()
        == 0
    )


def test_span_containing_within_bruteforce(spark, pos_index):
    from unichem2index_spark.functions.bm25 import Bm25Oracle

    out, corpus = pos_index
    h = Q.IndexHandle.open(spark, out)
    oracle = Bm25Oracle(corpus)

    def matches(toks, big, little, slop):
        window = slop + len(big) - 1
        pls = [[i for i, t in enumerate(toks) if t == b] for b in big]
        cps = [i for i, t in enumerate(toks) if t == little]
        if not cps or any(not p for p in pls):
            return False
        from itertools import product as prod

        for combo in prod(*pls):
            s, e = min(combo), max(combo)
            if e - s <= window and any(s <= c <= e for c in cps):
                return True
        return False

    for big, little, slop in [
        (["merge", "group"], "key", 3),
        (["fast", "slow"], "scan", 4),
        (["merge", "group"], "nosuchterm", 3),  # empty: absent little
    ]:
        for mode in ("containing", "within"):
            score_over = sorted(set(big)) if mode == "containing" else [little]
            want = sorted(
                (
                    (d, round(oracle.score_doc(score_over, d), 6))
                    for d, toks in corpus
                    if matches(toks, sorted(set(big)), little, slop)
                ),
                key=lambda p: (-p[1], p[0]),
            )[:10]
            got = [
                (r.doc_id, r.score)
                for r in Q.span_containing_topk(
                    spark, h, big, little, 10, slop=slop, mode=mode
                ).collect()
            ]
            assert got == want, (big, little, slop, mode)
    # the two modes share the SAME match set, different scores
    c_ids = {
        r.doc_id
        for r in Q.span_containing_topk(
            spark, h, ["merge", "group"], "key", 10**6, slop=3
        ).collect()
    }
    w_ids = {
        r.doc_id
        for r in Q.span_containing_topk(
            spark, h, ["merge", "group"], "key", 10**6, slop=3, mode="within"
        ).collect()
    }
    assert c_ids == w_ids and c_ids
    with pytest.raises(ValueError):
        Q.span_containing_topk(spark, h, ["a"], "b", 5, mode="nope")
