"""Round-4 query-surface extras: per-term boosts, bool must_not,
prefix/fuzzy expansion, from/size pagination, field_value_factor scoring,
and the extended_stats/histogram/filters/top_hits aggregation analogs.

Every index-path test checks rank+score identity against an independent
pure-Python recompute from the raw corpus (Bm25Oracle), the same oracle
discipline as test_build_query.py.
"""

from __future__ import annotations

import heapq
import math

import pytest

from unichem2index_spark.functions.bm25 import Bm25Oracle, score_term
from unichem2index_spark.functions.tokenize import tokenize
from unichem2index_spark.operators import query as Q
from unichem2index_spark.operators import textstats
from unichem2index_spark.operators.build import build_index
from unichem2index_spark.sources.tables import load_tables

from tests.conftest import SF_SMOKE

N_SHARDS = 4
TERMS = ["the", "merge", "vector"]
K = 12


@pytest.fixture(scope="module")
def corpus(spark):
    df = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    rows = df.select("doc_id", "text", "lang", "n_chars").collect()
    oracle = Bm25Oracle([(r.doc_id, tokenize(r.text)) for r in rows])
    meta = {r.doc_id: (r.lang, r.n_chars) for r in rows}
    toks = {r.doc_id: set(tokenize(r.text)) for r in rows}
    return df, oracle, meta, toks


@pytest.fixture(scope="module")
def index(spark, corpus, tmp_path_factory):
    df = corpus[0]
    out = str(tmp_path_factory.mktemp("xidx"))
    build_index(spark, df, out, n_shards=N_SHARDS, block_size=16,
                build_id="tx")
    return Q.IndexHandle.open(spark, out)


def _topk(acc: dict[int, float], k: int) -> list[tuple[int, float]]:
    return heapq.nsmallest(k, acc.items(), key=lambda kv: (-kv[1], kv[0]))


def _scores(oracle: Bm25Oracle, terms, boosts=None) -> dict[int, float]:
    acc: dict[int, float] = {}
    for t in sorted(set(terms)):
        plist = oracle.postings.get(t)
        if not plist:
            continue
        idf_t = oracle.idf(t) * (boosts or {}).get(t, 1.0)
        for doc_id in sorted(plist):
            acc[doc_id] = acc.get(doc_id, 0.0) + score_term(
                plist[doc_id], oracle.doclen[doc_id], oracle.avgdl, idf_t
            )
    return acc


# ---------------------------------------------------------------- boosts
BOOST_SETS = [{"merge": 2.0, "the": 0.25}, {"vector": 10.0}, {"the": 1.0}]


@pytest.mark.parametrize("boosts", BOOST_SETS)
def test_boosted_wand_and_exact_match_python(spark, corpus, index, boosts):
    df, oracle, _, _ = corpus
    want = _topk(_scores(oracle, TERMS, boosts), K)
    for got in (
        Q.bm25_topk_wand(spark, index, TERMS, K, boosts=boosts).collect(),
        Q.bm25_topk_exact(df, TERMS, K, boosts=boosts).collect(),
    ):
        assert [r.doc_id for r in got] == [d for d, _ in want]
        for r, (_, s) in zip(got, want):
            assert r.score == pytest.approx(s, abs=1e-5)


def test_boost_one_equals_plain(spark, index):
    plain = Q.bm25_topk_wand(spark, index, TERMS, K).collect()
    b1 = Q.bm25_topk_wand(
        spark, index, TERMS, K, boosts={t: 1.0 for t in TERMS}
    ).collect()
    assert [(r.doc_id, r.score) for r in plain] == [
        (r.doc_id, r.score) for r in b1
    ]


# -------------------------------------------------------------- must_not
def test_must_not_excludes_and_preserves_scores(spark, corpus, index):
    _, oracle, _, toks = corpus
    excl = ["dup"]
    acc = {
        d: s
        for d, s in _scores(oracle, TERMS).items()
        if "dup" not in toks[d]
    }
    want = _topk(acc, K)
    assert want, "fixture must produce non-trivial exclusion results"
    got = Q.bm25_topk_must_not(spark, index, TERMS, K, excl).collect()
    assert [r.doc_id for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert r.score == pytest.approx(s, abs=1e-5)
    assert all("dup" not in toks[r.doc_id] for r in got)


def test_must_not_exclusion_wins_over_scoring(spark, index):
    got = Q.bm25_topk_must_not(spark, index, ["dup"], 10, ["dup"]).collect()
    assert got == []


# ------------------------------------------------------- prefix / fuzzy
def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_prefix_expansion_capped_and_topk(spark, corpus, index):
    _, oracle, _, _ = corpus
    vocab = sorted(oracle.postings)
    want_terms = [t for t in vocab if t.startswith("s")][:4]
    assert len(want_terms) == 4
    assert Q.expand_prefix(spark, index, "s", 4) == want_terms
    want = _topk(_scores(oracle, want_terms), 10)
    got = Q.bm25_topk_prefix(spark, index, "s", 10, max_expansions=4)
    got = got.collect()
    assert [r.doc_id for r in got] == [d for d, _ in want]
    assert Q.bm25_topk_prefix(spark, index, "zzz", 10).collect() == []


def test_fuzzy_expansion_and_topk(spark, corpus, index):
    _, oracle, _, _ = corpus
    vocab = sorted(oracle.postings)
    cand = sorted(
        (
            (_lev(t, "dat"), t)
            for t in vocab
            if abs(len(t) - 3) <= 2 and _lev(t, "dat") <= 2
        )
    )
    want_terms = [t for _, t in cand[:50]]
    assert len(want_terms) >= 3  # data + several 2-edit neighbours
    assert Q.expand_fuzzy(spark, index, "dat", 2) == want_terms
    want = _topk(_scores(oracle, want_terms), 10)
    got = Q.bm25_topk_fuzzy(spark, index, "dat", 10, max_edits=2).collect()
    assert [r.doc_id for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert r.score == pytest.approx(s, abs=1e-5)


# ------------------------------------------------------------ pagination
def test_pages_tile_the_full_ranking(spark, corpus, index):
    _, oracle, _, _ = corpus
    full = _topk(_scores(oracle, TERMS), 15)
    p1 = Q.bm25_topk_paged(spark, index, TERMS, 5, 0).collect()
    p2 = Q.bm25_topk_paged(spark, index, TERMS, 5, 5).collect()
    p3 = Q.bm25_topk_paged(spark, index, TERMS, 5, 10).collect()
    got = p1 + p2 + p3
    assert [r.rank for r in got] == list(range(1, len(got) + 1))
    assert [r.doc_id for r in got] == [d for d, _ in full[: len(got)]]
    # Beyond the last match: empty page, not an error.
    n_match = len(_scores(oracle, TERMS))
    assert (
        Q.bm25_topk_paged(spark, index, TERMS, 5, n_match).collect() == []
    )


# ------------------------------------------------------------ field boost
def test_field_boost_matches_python(spark, corpus):
    df, oracle, meta, _ = corpus
    acc = _scores(oracle, TERMS)
    boosted = {
        d: s * math.log(1.0 + 0.001 * meta[d][1]) for d, s in acc.items()
    }
    want = _topk(boosted, K)
    got = Q.bm25_topk_field_boost(df, TERMS, K, factor=0.001).collect()
    assert [r.doc_id for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert r.score == pytest.approx(s, abs=1e-5)


# ------------------------------------------------------------- agg analogs
@pytest.fixture(scope="module")
def tables(spark):
    return load_tables(spark, SF_SMOKE)


def test_extended_stats_agg(spark, corpus, tables):
    _, oracle, meta, _ = corpus
    by_lang: dict[str, list[int]] = {}
    for d, dl in oracle.doclen.items():
        by_lang.setdefault(meta[d][0], []).append(dl)
    got = {r.lang: r for r in
           textstats.extended_stats_agg(spark, tables).collect()}
    assert set(got) == set(by_lang)
    for lang, dls in by_lang.items():
        r = got[lang]
        n = len(dls)
        assert (r.n, r.min_dl, r.max_dl, r.sum_dl) == (
            n, min(dls), max(dls), sum(dls)
        )
        avg = sum(dls) / n
        var = sum(x * x for x in dls) / n - avg * avg
        assert r.avg_dl == pytest.approx(avg, abs=1e-5)
        assert r.var_dl == pytest.approx(var, abs=1e-4)
        assert r.std_dl == pytest.approx(math.sqrt(max(var, 0.0)), abs=1e-5)


def test_histogram_and_filters_agg(spark, corpus, tables):
    _, oracle, meta, _ = corpus
    iv = textstats.HISTOGRAM_INTERVAL
    want_hist: dict[int, int] = {}
    for dl in oracle.doclen.values():
        want_hist[dl - dl % iv] = want_hist.get(dl - dl % iv, 0) + 1
    got = textstats.histogram_agg(spark, tables).collect()
    assert {r.bucket: r.doc_count for r in got} == want_hist
    assert [r.bucket for r in got] == sorted(want_hist)

    f = textstats.filters_agg(spark, tables).collect()[0]
    langs = [m[0] for m in meta.values()]
    chars = {d: m[1] for d, m in meta.items()}
    assert f.n_total == len(meta)
    assert f.n_en == sum(1 for x in langs if x == "en")
    assert f.n_long == sum(1 for c in chars.values() if c >= 800)
    assert f.n_long_en == sum(
        1 for d, (lg, c) in meta.items() if lg == "en" and c >= 800
    )


def test_top_hits_by_lang(spark, corpus, tables):
    _, oracle, meta, _ = corpus
    acc = _scores(oracle, textstats.TOP_HITS_TERMS)
    want: dict[str, list[int]] = {}
    for lang in sorted({m[0] for m in meta.values()}):
        scored = [(d, s) for d, s in acc.items() if meta[d][0] == lang]
        scored.sort(key=lambda p: (-p[1], p[0]))
        if scored:
            want[lang] = [d for d, _ in scored[: textstats.TOP_HITS_PER_GROUP]]
    got: dict[str, list[int]] = {}
    for r in textstats.top_hits_by_lang(spark, tables).collect():
        got.setdefault(r.lang, []).append(r.doc_id)
    assert got == want
