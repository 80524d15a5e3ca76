"""Round-4 query-surface extras, part 2: search_after cursor pagination,
wildcard expansion, more_like_this, dis_max, boosting-query demotion,
highlighting, and the matrix_stats/adjacency_matrix/rare_terms/composite
aggregation analogs.

Same oracle discipline as test_query_extras.py: every index-path result is
checked for rank+score identity against an independent pure-Python
recompute from the raw corpus.
"""

from __future__ import annotations

import math
from collections import Counter

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
    rows = df.select(
        "doc_id", "text", "lang", "source", "n_chars"
    ).collect()
    oracle = Bm25Oracle([(r.doc_id, tokenize(r.text)) for r in rows])
    return df, oracle, {r.doc_id: r for r in rows}


@pytest.fixture(scope="module")
def index(spark, corpus, tmp_path_factory):
    df = corpus[0]
    out = str(tmp_path_factory.mktemp("x2idx"))
    build_index(spark, df, out, n_shards=N_SHARDS, block_size=16,
                build_id="tx2")
    return Q.IndexHandle.open(spark, out)


@pytest.fixture(scope="module")
def tables(spark):
    return load_tables(spark, SF_SMOKE)


def _scores(oracle: Bm25Oracle, terms) -> dict[int, float]:
    acc: dict[int, float] = {}
    for t in sorted(set(terms)):
        plist = oracle.postings.get(t)
        if not plist:
            continue
        idf_t = oracle.idf(t)
        for doc_id in sorted(plist):
            acc[doc_id] = acc.get(doc_id, 0.0) + score_term(
                plist[doc_id], oracle.doclen[doc_id], oracle.avgdl, idf_t
            )
    return acc


def _ranking(acc: dict[int, float]) -> list[tuple[int, float]]:
    return sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))


# ------------------------------------------------------------ search_after
def test_search_after_continues_the_ranking(spark, corpus, index):
    _, oracle, _ = corpus
    full = _ranking(_scores(oracle, TERMS))
    cursor = Q.bm25_cursor_at(spark, index, TERMS, 5)
    assert cursor is not None
    assert cursor[1] == full[4][0]
    assert cursor[0] == pytest.approx(full[4][1], abs=1e-9)
    got = Q.bm25_topk_search_after(spark, index, TERMS, 8, cursor).collect()
    assert [r.doc_id for r in got] == [d for d, _ in full[5:13]]
    for r, (_, s) in zip(got, full[5:]):
        assert r.score == pytest.approx(s, abs=1e-5)


def test_search_after_pages_tile_and_drain(spark, corpus, index):
    _, oracle, _ = corpus
    full = _ranking(_scores(oracle, TERMS))
    seen: list[int] = []
    cursor = None
    while True:
        if cursor is None:
            page = Q.bm25_topk_wand(spark, index, TERMS, 5).collect()
        else:
            page = Q.bm25_topk_search_after(
                spark, index, TERMS, 5, cursor
            ).collect()
        if not page:
            break
        seen.extend(r.doc_id for r in page)
        if len(seen) >= 15:  # three pages is enough to prove tiling
            break
        # client-style cursor: recompute raw sort values at the new depth
        cursor = Q.bm25_cursor_at(spark, index, TERMS, len(seen))
    assert seen == [d for d, _ in full[: len(seen)]]
    # a cursor past the last match yields an empty page, not an error
    last = (full[-1][1], full[-1][0])
    assert (
        Q.bm25_topk_search_after(spark, index, TERMS, 5, last).collect()
        == []
    )


# --------------------------------------------------------------- wildcard
def test_wildcard_expansion_and_topk(spark, corpus, index):
    _, oracle, _ = corpus
    vocab = sorted(oracle.postings)
    want_terms = [
        t for t in vocab if len(t) >= 2 and t[1] == "a"
    ][:5]  # "?a*" with cap 5
    assert len(want_terms) == 5
    assert Q.expand_wildcard(spark, index, "?a*", 5) == want_terms
    want = _ranking(_scores(oracle, want_terms))[:10]
    got = Q.bm25_topk_wildcard(
        spark, index, "?a*", 10, max_expansions=5
    ).collect()
    assert [r.doc_id for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert r.score == pytest.approx(s, abs=1e-5)
    assert Q.bm25_topk_wildcard(spark, index, "zz*q", 10).collect() == []


# ---------------------------------------------------------- more_like_this
def test_more_like_this_selects_tfidf_terms_and_excludes_source(
    spark, corpus, index
):
    df, oracle, rows = corpus
    src = 42
    tf = Counter(tokenize(rows[src].text))
    ranked = sorted(
        ((t, tf[t] * oracle.idf(t)) for t in tf), key=lambda p: (-p[1], p[0])
    )
    want_terms = [t for t, _ in ranked[:5]]
    acc = _scores(oracle, want_terms)
    acc.pop(src, None)
    want = _ranking(acc)[:10]
    got = Q.more_like_this(spark, index, df, src, 10).collect()
    assert src not in {r.doc_id for r in got}
    assert [r.doc_id for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert r.score == pytest.approx(s, abs=1e-5)
    # missing source doc -> empty result, not an error
    assert Q.more_like_this(spark, index, df, 10**9, 10).collect() == []


# ------------------------------------------------------------------ dis_max
def test_dismax_matches_python_and_degenerates_to_sum(spark, corpus):
    df, oracle, _ = corpus
    contrib: dict[int, list[float]] = {}
    for t in sorted(set(TERMS)):
        plist = oracle.postings.get(t, {})
        idf_t = oracle.idf(t)
        for d, tf in plist.items():
            contrib.setdefault(d, []).append(
                score_term(tf, oracle.doclen[d], oracle.avgdl, idf_t)
            )
    acc = {
        d: max(cs) + 0.3 * (sum(cs) - max(cs)) for d, cs in contrib.items()
    }
    want = _ranking(acc)[:K]
    got = Q.bm25_topk_dismax(df, TERMS, K, tie_breaker=0.3).collect()
    assert [r.doc_id for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert r.score == pytest.approx(s, abs=1e-5)
    # tie_breaker=1 collapses to the plain bool/sum query
    plain = Q.bm25_topk_exact(df, TERMS, K).collect()
    tb1 = Q.bm25_topk_dismax(df, TERMS, K, tie_breaker=1.0).collect()
    assert [r.doc_id for r in plain] == [r.doc_id for r in tb1]
    for a, b in zip(plain, tb1):
        assert a.score == pytest.approx(b.score, abs=1e-6)


# ----------------------------------------------------------------- boosting
def test_boosting_demotes_but_keeps_matches(spark, corpus):
    df, oracle, _ = corpus
    neg_docs = set(oracle.postings.get("dup", {}))
    acc = {
        d: s * (0.4 if d in neg_docs else 1.0)
        for d, s in _scores(oracle, TERMS).items()
    }
    want = _ranking(acc)[:K]
    got = Q.bm25_topk_boosting(
        df, TERMS, ["dup"], K, negative_boost=0.4
    ).collect()
    assert [r.doc_id for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert r.score == pytest.approx(s, abs=1e-5)
    # demotion != exclusion: with boost 1.0 the result is the plain query
    plain = Q.bm25_topk_exact(df, TERMS, K).collect()
    nb1 = Q.bm25_topk_boosting(
        df, TERMS, ["dup"], K, negative_boost=1.0
    ).collect()
    assert [r.doc_id for r in plain] == [r.doc_id for r in nb1]


# ---------------------------------------------------------------- highlight
def test_highlight_snippets_contain_earliest_term(spark, corpus):
    df, oracle, rows = corpus
    got = Q.highlight_topk(df, TERMS, K).collect()
    want_ids = [d for d, _ in _ranking(_scores(oracle, TERMS))[:K]]
    assert [r.doc_id for r in got] == want_ids
    for r in got:
        text = rows[r.doc_id].text.lower()
        positions = {
            t: text.find(t) for t in TERMS if text.find(t) >= 0
        }
        assert positions, "top-k doc must contain a query term"
        best = min(positions.values())
        expect_term = min(t for t, p in positions.items() if p == best)
        assert r.matched_term == expect_term
        assert r.matched_term in r.snippet.lower()
        # fragment window: starts at most `before` chars earlier
        assert len(r.snippet) <= 50
        start = max(0, best - 20)
        assert rows[r.doc_id].text[start:start + 50] == r.snippet


# --------------------------------------------------------------- agg analogs
def test_matrix_stats_matches_python(spark, corpus, tables):
    _, oracle, rows = corpus
    xs = [rows[d].n_chars for d in sorted(rows)]
    ys = [oracle.doclen[d] for d in sorted(rows)]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    vx = sum(x * x for x in xs) / n - mx * mx
    vy = sum(y * y for y in ys) / n - my * my
    cov = sum(x * y for x, y in zip(xs, ys)) / n - mx * my
    r = textstats.matrix_stats_agg(spark, tables).collect()[0]
    assert r.n == n
    assert r.mean_chars == pytest.approx(mx, abs=1e-5)
    assert r.mean_tokens == pytest.approx(my, abs=1e-5)
    assert r.var_chars == pytest.approx(vx, abs=1e-3)
    assert r.var_tokens == pytest.approx(vy, abs=1e-3)
    assert r.covariance == pytest.approx(cov, abs=1e-3)
    assert r.correlation == pytest.approx(
        cov / math.sqrt(vx * vy), abs=1e-5
    )
    # chars/token correlation on this corpus must be strongly positive
    assert r.correlation > 0.9


def test_adjacency_matrix_counts(spark, corpus, tables):
    _, _, rows = corpus
    a = {d for d, r in rows.items() if r.lang == "en"}
    b = {
        d for d, r in rows.items()
        if r.n_chars >= textstats.ADJACENCY_LONG_CHARS
    }
    c = {
        d for d, r in rows.items() if r.source in ("src0", "src1", "src2")
    }
    got = textstats.adjacency_matrix_agg(spark, tables).collect()[0]
    assert (got.en, got.long_docs, got.early_src) == (
        len(a), len(b), len(c)
    )
    assert (got.en_long, got.en_early_src, got.long_early_src) == (
        len(a & b), len(a & c), len(b & c)
    )


def _shingles(tokens: list[str]) -> set[str]:
    return {
        " ".join(tokens[i:i + 3]) for i in range(len(tokens) - 2)
    } if len(tokens) >= 3 else set()


def test_rare_terms_tail(spark, corpus, tables):
    _, _, rows = corpus
    df_count: dict[str, int] = {}
    for r in rows.values():
        for sh in _shingles(tokenize(r.text)):
            df_count[sh] = df_count.get(sh, 0) + 1
    tail = sorted(
        (
            (c, s) for s, c in df_count.items()
            if c <= textstats.RARE_MAX_DOC_COUNT
        )
    )[: textstats.RARE_OUT_CAP]
    got = textstats.rare_terms_agg(spark, tables).collect()
    assert [(r.doc_count, r.shingle) for r in got] == tail
    assert all(r.doc_count <= textstats.RARE_MAX_DOC_COUNT for r in got)


def test_composite_pages_drain_the_bucket_space(spark, corpus, tables):
    _, _, rows = corpus
    buckets = sorted(
        Counter((r.lang, r.source) for r in rows.values()).items()
    )
    # the registered page: strictly after the configured cursor
    after = textstats.COMPOSITE_AFTER
    want = [b for b in buckets if b[0] > after][
        : textstats.COMPOSITE_PAGE_SIZE
    ]
    got = textstats.composite_agg(spark, tables).collect()
    assert [((r.lang, r.source), r.doc_count) for r in got] == want
    # cursor chaining: pages starting from the first bucket tile the space
    # (drive the operator's own cursor rule in plain python)
    out: list[tuple[str, str]] = []
    cursor = ("", "")
    while True:
        page = [b for b, _ in buckets if b > cursor][
            : textstats.COMPOSITE_PAGE_SIZE
        ]
        if not page:
            break
        out.extend(page)
        cursor = page[-1]
    assert out == [b for b, _ in buckets]


# ----------------------------------------------------- collapse / explain
def test_collapse_keeps_best_per_field_value(spark, corpus):
    df, oracle, rows = corpus
    acc = _scores(oracle, TERMS)
    best: dict[str, tuple[int, float]] = {}
    for d, s in acc.items():
        src = rows[d].source
        cur = best.get(src)
        if cur is None or (-s, d) < (-cur[1], cur[0]):
            best[src] = (d, s)
    want = sorted(
        ((d, src, s) for src, (d, s) in best.items()),
        key=lambda x: (-x[2], x[0]),
    )[:K]
    got = Q.collapse_topk(df, TERMS, K).collect()
    assert [(r.doc_id, r.source) for r in got] == [
        (d, src) for d, src, _ in want
    ]
    for r, (_, _, s) in zip(got, want):
        assert r.score == pytest.approx(s, abs=1e-5)
    # collapsed result never repeats a source
    srcs = [r.source for r in got]
    assert len(srcs) == len(set(srcs))


def test_explain_score_breakdown_sums_to_score(spark, corpus):
    df, oracle, rows = corpus
    doc = next(
        d for d in sorted(rows)
        if all(t in oracle.postings and d in oracle.postings[t]
               for t in TERMS)
    )
    got = Q.explain_score(df, TERMS, doc).collect()
    assert [r.term for r in got] == sorted(TERMS)
    total = 0.0
    for r in got:
        tf = oracle.postings[r.term][doc]
        assert r.tf == tf
        assert r.df == len(oracle.postings[r.term])
        assert r.idf == pytest.approx(oracle.idf(r.term), abs=1e-5)
        contrib = score_term(
            tf, oracle.doclen[doc], oracle.avgdl, oracle.idf(r.term)
        )
        assert r.contrib == pytest.approx(contrib, abs=1e-5)
        total += contrib
    assert total == pytest.approx(oracle.score_doc(TERMS, doc), abs=1e-9)


# ------------------------------------------------------- diversified_topk
def test_diversified_bounds_per_key_and_degenerates_to_collapse(
    spark, corpus
):
    df, oracle, meta = corpus
    got = Q.diversified_topk(df, TERMS, K, field="source", per_key=2).collect()
    # bound respected inside the page
    per_src = Counter(r.source for r in got)
    assert all(v <= 2 for v in per_src.values())
    # python recompute: rank per source, keep rn<=2, global top-k
    full = _ranking(_scores(oracle, TERMS))
    kept, seen = [], Counter()
    for d, s in full:
        src = meta[d].source
        seen[src] += 1
        if seen[src] <= 2:
            kept.append((d, src, round(s, 6)))
    assert [(r.doc_id, r.source, r.score) for r in got] == kept[:K]
    # per_key=1 is exactly field collapsing
    div1 = Q.diversified_topk(df, TERMS, K, field="source", per_key=1)
    col = Q.collapse_topk(df, TERMS, K, collapse_field="source")
    assert [tuple(r) for r in div1.collect()] == [tuple(r) for r in col.collect()]


# ------------------------------------------------------------ match_count
def test_match_count_matches_python(spark, corpus):
    df, oracle, _ = corpus
    want = sum(
        1
        for d in oracle.doclen
        if all(d in oracle.postings.get(t, {}) for t in set(TERMS))
    )
    row = Q.match_count(df, TERMS).collect()
    assert len(row) == 1 and row[0].n_matching == want
    assert Q.match_count(df, ["nosuchterm"]).collect()[0].n_matching == 0


# ----------------------------------------------------------- random_score
def test_random_score_deterministic_and_matches_python(spark, corpus):
    df, oracle, _ = corpus
    acc = _scores(oracle, TERMS)
    seed = 7
    jittered = {
        d: s
        * ((((d + seed) * Q._RS_MULT) % Q._RS_MOD) / float(Q._RS_MOD))
        for d, s in acc.items()
    }
    want = [
        (d, round(s, 6))
        for d, s in sorted(jittered.items(), key=lambda kv: (-kv[1], kv[0]))
    ][:K]
    got = [
        (r.doc_id, r.score)
        for r in Q.random_score_topk(df, TERMS, K, seed=seed).collect()
    ]
    assert got == want
    # same seed reproduces; different seed permutes
    again = [
        (r.doc_id, r.score)
        for r in Q.random_score_topk(df, TERMS, K, seed=seed).collect()
    ]
    assert again == got
    other = [
        (r.doc_id, r.score)
        for r in Q.random_score_topk(df, TERMS, K, seed=8).collect()
    ]
    assert other != got


# -------------------------------------------------------------- percolate
def test_percolate_matches_bruteforce(spark, corpus):
    df, oracle, _ = corpus
    registry = [
        (0, ["merge", "group", "key"], 3),
        (1, ["dup", "spark"], 1),
        (2, ["nosuchterm", "dup"], 2),
    ]
    got = [
        (r.query_id, r.doc_id)
        for r in Q.percolate(spark, df, registry).collect()
    ]
    want = []
    for qid, terms, mm in registry:
        uniq = sorted(set(terms))
        for d in sorted(oracle.doclen):
            n = sum(1 for t in uniq if d in oracle.postings.get(t, {}))
            if n >= mm:
                want.append((qid, d))
    assert got == sorted(want)
    assert not [p for p in got if p[0] == 2]  # unsatisfiable query


# -------------------------------------------------------------- rank_eval
def test_rank_eval_metrics_match_python(spark, corpus):
    df, oracle, _ = corpus
    terms, k, marker = ["merge", "group"], 10, "key"
    topk = _ranking(_scores(oracle, terms))[:k]
    relevant = set(oracle.postings.get(marker, {}))
    hits = [i + 1 for i, (d, _) in enumerate(topk) if d in relevant]
    p_at_k = len(hits) / len(topk)
    r_at_k = len(hits) / len(relevant)
    mrr = 1.0 / hits[0] if hits else 0.0
    row = Q.rank_eval(df, terms, k, marker).collect()[0]
    assert row.precision_at_k == round(p_at_k, 6)
    assert row.recall_at_k == round(r_at_k, 6)
    assert row.mrr == round(mrr, 6)
    # a marker that never appears in the top-k yields zero metrics
    row0 = Q.rank_eval(df, terms, k, "nosuchterm").collect()[0]
    assert (row0.precision_at_k, row0.mrr) == (0.0, 0.0)


# ------------------------------------------------------------- scroll_page
def test_scroll_pages_tile_the_match_set(spark, corpus):
    df, oracle, _ = corpus
    terms = ["merge", "group"]
    matches = sorted(
        d
        for d in oracle.doclen
        if all(d in oracle.postings.get(t, {}) for t in terms)
    )
    # keyset-walk the whole match set in pages of 7
    seen, cursor = [], -1
    while True:
        page = Q.scroll_page(df, terms, 7, after_doc_id=cursor).collect()
        if not page:
            break
        ids = [r.doc_id for r in page]
        assert ids == sorted(ids)
        seen.extend(ids)
        cursor = ids[-1]
        if len(page) < 7:
            break
    assert seen == matches  # pages tile: no dup, no gap, full drain


# ------------------------------------------------------------ term_vectors
def test_term_vectors_matches_python(spark, corpus):
    df, oracle, meta = corpus
    doc = 7
    toks = tokenize(meta[doc].text)
    got = Q.term_vectors(df, doc).collect()
    assert [r.term for r in got] == sorted(set(toks))
    for r in got:
        want_pos = [i for i, t in enumerate(toks) if t == r.term]
        assert r.positions == ",".join(str(i) for i in want_pos)
        assert r.tf == len(want_pos)
        assert r.df == len(oracle.postings[r.term])
        assert r.ttf == sum(oracle.postings[r.term].values())


# -------------------------------------------------------- percentile_ranks
def test_percentile_ranks_matches_python(spark, corpus, tables):
    _, oracle, _ = corpus
    from unichem2index_spark.operators import textstats

    vals = (100.0, 300.0, 600.0)
    row = textstats.percentile_ranks(spark, tables, values=vals).collect()[0]
    n = len(oracle.doclen)
    assert row.n_docs == n
    for v in vals:
        want = round(
            sum(1 for dl in oracle.doclen.values() if dl <= v) / n * 100.0, 6
        )
        assert getattr(row, f"rank_{int(v)}") == want
    # ranks are monotone in the probe value
    assert row.rank_100 <= row.rank_300 <= row.rank_600


# --------------------------------------------------------------- terms_set
def test_terms_set_dynamic_threshold_matches_python(spark, corpus):
    df, oracle, meta = corpus
    terms = ["merge", "group", "key", "vector"]
    req = "CASE WHEN lang = 'en' THEN 3 ELSE 2 END"
    acc = _scores(oracle, terms)
    matched_n = {
        d: sum(1 for t in set(terms) if d in oracle.postings.get(t, {}))
        for d in acc
    }
    want = sorted(
        (
            (d, round(s, 6))
            for d, s in acc.items()
            if matched_n[d] >= (3 if meta[d].lang == "en" else 2)
        ),
        key=lambda kv: (-kv[1], kv[0]),
    )[:K]
    got = [
        (r.doc_id, r.score)
        for r in Q.terms_set_topk(df, terms, K, required_expr=req).collect()
    ]
    assert got == want
    # a constant required = n_terms degenerates to bool-must scoring
    all_req = Q.terms_set_topk(df, terms, 10**6, required_expr="4").collect()
    assert {r.doc_id for r in all_req} == {
        d for d, n in matched_n.items() if n == 4
    }


# ----------------------------------------------------------- phrase_suggest
def test_phrase_suggest_finds_the_frequent_bigram(spark, corpus, tables):
    from unichem2index_spark.operators import textstats

    df, oracle, meta = corpus
    got = textstats.phrase_suggest(
        spark, tables, phrase=("mrge", "grup"), max_dist=1, size=5
    ).collect()
    # python recompute: bigram counts + levenshtein-1 candidate sets
    def lev1(a, b):
        if a == b:
            return 0
        la, lb = len(a), len(b)
        if abs(la - lb) > 1:
            return 2
        # one edit suffices?
        if la == lb:
            diffs = sum(1 for x, y in zip(a, b) if x != y)
            return 1 if diffs == 1 else 2
        s, l = (a, b) if la < lb else (b, a)
        for i in range(len(l)):
            if l[:i] + l[i + 1 :] == s:
                return 1
        return 2

    bg = Counter()
    for r in meta.values():
        toks = tokenize(r.text)
        for x, y in zip(toks, toks[1:]):
            bg[(x, y)] += 1
    vocab = set(oracle.postings)
    c0 = {t: lev1(t, "mrge") for t in vocab if lev1(t, "mrge") <= 1}
    c1 = {t: lev1(t, "grup") for t in vocab if lev1(t, "grup") <= 1}
    want = sorted(
        (
            (w1, w2, n, c0[w1] + c1[w2])
            for (w1, w2), n in bg.items()
            if w1 in c0 and w2 in c1
        ),
        key=lambda x: (-x[2], x[3], x[0], x[1]),
    )[:5]
    assert [(r.w1, r.w2, r.n_occurrences, r.total_edits) for r in got] == want
    assert got and (got[0].w1, got[0].w2) == ("merge", "group")


# ------------------------------------------------------------ fvf via WAND
def test_fvf_wand_matches_python_and_corpus_path(spark, corpus, tmp_path_factory):
    import math

    from unichem2index_spark.operators.build import build_index
    from pyspark.sql import functions as F
    from unichem2index_spark.functions.tokenize import tokens_col

    df, oracle, _ = corpus
    out = str(tmp_path_factory.mktemp("fvfidx"))
    build_index(spark, df, out, n_shards=N_SHARDS, block_size=16,
                build_id="fvf")
    h = Q.IndexHandle.open(spark, out)
    factor = 0.01
    got = [
        (r.doc_id, r.score)
        for r in Q.bm25_topk_field_boost_wand(
            spark, h, TERMS, K, field="doclen", factor=factor
        ).collect()
    ]
    acc = _scores(oracle, TERMS)
    want = sorted(
        (
            (d, round(s * math.log(1.0 + factor * oracle.doclen[d]), 6))
            for d, s in acc.items()
        ),
        key=lambda kv: (-kv[1], kv[0]),
    )[:K]
    assert got == want
    # rank+score identical to the corpus path on the same field
    aug = df.withColumn("doclen", F.size(tokens_col("text")))
    corpus_side = [
        (r.doc_id, r.score)
        for r in Q.bm25_topk_field_boost(
            aug, TERMS, K, field="doclen", factor=factor
        ).collect()
    ]
    assert got == corpus_side


def test_gauss_and_random_wand_match_corpus_paths(
    spark, corpus, tmp_path_factory
):
    from unichem2index_spark.operators.build import build_index

    df, oracle, _ = corpus
    out = str(tmp_path_factory.mktemp("fsidx"))
    build_index(spark, df, out, n_shards=N_SHARDS, block_size=16,
                build_id="fs")
    h = Q.IndexHandle.open(spark, out)
    # random_score: kernel callable path == corpus path, same seed
    for seed in (0, 7):
        idx_side = [
            tuple(r)
            for r in Q.bm25_topk_random_score_wand(
                spark, h, TERMS, K, seed=seed
            ).collect()
        ]
        corpus_side = [
            tuple(r)
            for r in Q.random_score_topk(df, TERMS, K, seed=seed).collect()
        ]
        assert idx_side == corpus_side and len(idx_side) == K
    # gauss decay on doclen: kernel dict path == python recompute
    import math

    origin, denom = 100.0, 22500.0 / math.log(2.0)
    got = [
        tuple(r)
        for r in Q.bm25_topk_gauss_decay_wand(
            spark, h, TERMS, K, origin=origin, denom=denom, field="doclen"
        ).collect()
    ]
    acc = _scores(oracle, TERMS)
    want = sorted(
        (
            (
                d,
                round(
                    s
                    * math.exp(
                        -((oracle.doclen[d] - origin) ** 2) / denom
                    ),
                    6,
                ),
            )
            for d, s in acc.items()
        ),
        key=lambda kv: (-kv[1], kv[0]),
    )[:K]
    assert got == want


def test_percolate_phrase_registrations(spark, corpus):
    df, oracle, meta = corpus
    registry = [(0, ["dup", "spark"], 2)]
    phrases = [(10, ["merge", "group"]), (11, ["group", "merge"])]
    got = [
        (r.query_id, r.doc_id)
        for r in Q.percolate(
            spark, df, registry, phrase_queries=phrases
        ).collect()
    ]
    want = []
    for d in sorted(oracle.doclen):
        if d in oracle.postings.get("dup", {}) and d in oracle.postings.get(
            "spark", {}
        ):
            want.append((0, d))
    for qid, p in phrases:
        needle = " " + " ".join(p) + " "
        for d, r in meta.items():
            s = " " + " ".join(tokenize(r.text)) + " "
            if needle in s:
                want.append((qid, d))
    assert got == sorted(want)
    # order matters for phrases: the two registrations differ
    m10 = {d for q, d in got if q == 10}
    m11 = {d for q, d in got if q == 11}
    assert m10 != m11


# -------------------------------------------------------------- field sort
def test_field_sort_keyset_pages_tile(spark, corpus):
    df, oracle, meta = corpus
    terms = ["merge", "group"]
    matches = [
        d
        for d in oracle.doclen
        if all(d in oracle.postings.get(t, {}) for t in terms)
    ]
    full = sorted(matches, key=lambda d: (-meta[d].n_chars, d))
    # keyset-walk in pages of 5: tiles the full sorted match set
    seen, cursor = [], None
    while True:
        page = Q.sort_topk(df, terms, 5, field="n_chars", after=cursor).collect()
        if not page:
            break
        seen.extend(r.doc_id for r in page)
        last = page[-1]
        cursor = (last.n_chars, last.doc_id)
        if len(page) < 5:
            break
    assert seen == full


# ------------------------------------------------------------- multi-index
def test_multi_index_uses_per_index_stats_and_boosts(
    spark, corpus, tmp_path_factory
):
    from unichem2index_spark.functions.tokenize import tokenize as tk
    from unichem2index_spark.operators.build import build_index

    df, _, meta = corpus
    handles = []
    for name, parity in (("a", 0), ("b", 1)):
        out = str(tmp_path_factory.mktemp(f"midx{name}"))
        build_index(
            spark, df.where(f"doc_id % 2 = {parity}"), out, n_shards=4,
            build_id=f"midx{name}",
        )
        handles.append(Q.IndexHandle.open(spark, out))
    boosts = (1.0, 1.5)
    got = [
        (r.index_id, r.doc_id, r.score)
        for r in Q.bm25_topk_multi_index(
            spark, list(zip(handles, boosts)), TERMS, K
        ).collect()
    ]
    # python recompute with SUBSET-LOCAL oracles
    want_all = []
    for i, parity in enumerate((0, 1)):
        sub = Bm25Oracle(
            [(d, tk(r.text)) for d, r in meta.items() if d % 2 == parity]
        )
        for d, s in _scores(sub, TERMS).items():
            want_all.append((i, d, s * boosts[i]))
    want_all.sort(key=lambda x: (-x[2], x[0], x[1]))
    want = [(i, d, round(s, 6)) for i, d, s in want_all[:K]]
    assert got == want
    # with the 1.5 boost index 1 sweeps this page; at equal boosts both
    # indexes appear and the composition differs (the boost matters)
    flat = [
        (r.index_id, r.doc_id)
        for r in Q.bm25_topk_multi_index(
            spark, list(zip(handles, (1.0, 1.0))), TERMS, K
        ).collect()
    ]
    assert {i for i, _ in flat} == {0, 1}
    assert flat != [(i, d) for i, d, _ in got]


# ---------------------------------------------------------------- synonyms
def test_synonyms_blend_and_degeneration(spark, corpus):
    from unichem2index_spark.functions.bm25 import score_term
    import math

    df, oracle, meta = corpus
    groups = [["merge", "join"], ["fast", "quick"], ["vector"]]
    got = [
        (r.doc_id, r.score)
        for r in Q.bm25_topk_synonyms(spark, df, groups, K).collect()
    ]
    # python recompute: tf summed per group, df blended as max member df
    n = len(oracle.doclen)
    acc = {}
    for g in groups:
        members = sorted(set(g))
        df_g = max(len(oracle.postings.get(t, {})) for t in members)
        if df_g == 0:
            continue
        idf_g = math.log(1.0 + (n - df_g + 0.5) / (df_g + 0.5))
        tf_g = {}
        for t in members:
            for d, tf in oracle.postings.get(t, {}).items():
                tf_g[d] = tf_g.get(d, 0) + tf
        for d, tf in tf_g.items():
            acc[d] = acc.get(d, 0.0) + score_term(
                tf, oracle.doclen[d], oracle.avgdl, idf_g
            )
    want = [
        (d, round(s, 6))
        for d, s in sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))
    ][:K]
    assert got == want
    # all-singleton groups degenerate to the plain bool query
    single = Q.bm25_topk_synonyms(
        spark, df, [[t] for t in TERMS], K
    ).collect()
    plain = Q.bm25_topk_exact(df, TERMS, K).collect()
    assert [tuple(r) for r in single] == [tuple(r) for r in plain]


# ---------------------------------------------------- constant_score / floor
def test_constant_score_and_min_score(spark, corpus):
    df, oracle, _ = corpus
    terms = ["merge", "group"]
    cs = Q.constant_score_page(df, terms, 8, boost=1.2).collect()
    matches = sorted(
        d
        for d in oracle.doclen
        if all(d in oracle.postings.get(t, {}) for t in terms)
    )
    assert [r.doc_id for r in cs] == matches[:8]
    assert all(r.score == 1.2 for r in cs)
    # min_score == full ranking filtered at the raw floor
    acc = _scores(oracle, TERMS)
    floor = sorted(acc.values(), reverse=True)[5]  # binds inside top-K
    got = [
        (r.doc_id, r.score)
        for r in Q.bm25_topk_min_score(df, TERMS, K, floor).collect()
    ]
    want = [
        (d, round(s, 6))
        for d, s in _ranking({d: s for d, s in acc.items() if s >= floor})
    ][:K]
    assert got == want and 0 < len(got) < K


# ---------------------------------------- mult ops on an updated index
def test_fvf_wand_respects_tombstones_and_compaction(spark, tmp_path):
    import datetime as dt

    from unichem2index_spark.operators.ingest import build_index_from_webtext
    from unichem2index_spark.operators.update import add_generation, compact
    from unichem2index_spark.schemas import WEBTEXT_SCHEMA
    from unichem2index_spark.synth import gen_webtext, gen_webtext_row

    rows = gen_webtext(120, seed=31)
    wt = spark.createDataFrame(rows, schema=WEBTEXT_SCHEMA)
    out = str(tmp_path / "fvfwt")
    build_index_from_webtext(spark, wt, out, n_shards=4)
    h0 = Q.IndexHandle.open(spark, out)
    pre = {r.doc_id for r in Q.bm25_topk_wand(spark, h0, ["the"], 10**6).collect()}

    upd = []
    for j, r in enumerate(rows[:20]):
        nr = gen_webtext_row(70_000 + j, seed=37)
        nr["url"] = r["url"]
        nr["warc_ts"] = r["warc_ts"] + dt.timedelta(days=400)
        upd.append(nr)
    add_generation(spark, out, spark.createDataFrame(upd, schema=WEBTEXT_SCHEMA))
    h = Q.IndexHandle.open(spark, out)
    assert h.multi_gen
    tombstoned = {
        r.doc_id for r in h.store.read(spark, "deletes").collect()
    }
    assert tombstoned
    for fn in (
        lambda: Q.bm25_topk_field_boost_wand(spark, h, TERMS, 10**6),
        lambda: Q.bm25_topk_gauss_decay_wand(
            spark, h, TERMS, 10**6, origin=100.0, denom=1000.0
        ),
        lambda: Q.bm25_topk_random_score_wand(spark, h, TERMS, 10**6, seed=3),
    ):
        got_ids = {r.doc_id for r in fn().collect()}
        assert got_ids and not (got_ids & tombstoned)

    # after compaction, the kernel-served result equals the same op on a
    # fresh index built from the live corpus with the same doc_ids
    compact(spark, out)
    hc = Q.IndexHandle.open(spark, out)
    um = hc.store.read(spark, "url_map").select("doc_id", "url")
    base_texts = {r["url"]: r["text"] for r in wt.select("url", "text").collect()}
    upd_texts = {r["url"]: r["text"] for r in upd}
    fresh_rows = [
        (r.doc_id, upd_texts.get(r.url, base_texts.get(r.url)))
        for r in um.collect()
    ]
    fresh_out = str(tmp_path / "fvffresh")
    from unichem2index_spark.operators.build import build_index

    build_index(
        spark,
        spark.createDataFrame(fresh_rows, "doc_id long, text string"),
        fresh_out,
        n_shards=4,
    )
    hf = Q.IndexHandle.open(spark, fresh_out)
    got = [
        tuple(r)
        for r in Q.bm25_topk_field_boost_wand(spark, hc, TERMS, K).collect()
    ]
    exp = [
        tuple(r)
        for r in Q.bm25_topk_field_boost_wand(spark, hf, TERMS, K).collect()
    ]
    assert got == exp and got


# --------------------------------------------------- sampler / stats_bucket
def test_sampler_and_stats_bucket_match_python(spark, corpus, tables):
    from unichem2index_spark.operators import textstats

    df, oracle, meta = corpus
    terms, size = ["merge", "group"], 20
    got = [
        (r.source, r.doc_count)
        for r in textstats.sampler_terms(
            spark, tables, terms, shard_size=size
        ).collect()
    ]
    sample = [d for d, _ in _ranking(_scores(oracle, terms))[:size]]
    cnt = Counter(meta[d].source for d in sample)
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    assert got == want
    assert sum(c for _, c in got) == min(size, len(_scores(oracle, terms)))

    rows = textstats.stats_bucket(spark, tables).collect()
    ev = tables["events"].selectExpr(
        "event_type", "date_trunc('hour', ts) AS b"
    ).collect()
    per = {}
    for r in ev:
        per.setdefault(r.event_type, Counter())[r.b] += 1
    assert [r.event_type for r in rows] == sorted(per)
    for r in rows:
        counts = list(per[r.event_type].values())
        assert r.n_buckets == len(counts)
        assert (r.min_bucket, r.max_bucket) == (min(counts), max(counts))
        assert r.sum_events == sum(counts)
        assert r.avg_per_bucket == round(sum(counts) / len(counts), 6)


# ------------------------------------------------------- match_bool_prefix
def test_match_bool_prefix_matches_bruteforce(spark, corpus):
    from unichem2index_spark.functions.bm25 import score_term
    import math

    df, oracle, _ = corpus
    vocab = sorted(oracle.postings)
    n = len(oracle.doclen)

    def blend(fixed, prefix, cap):
        fx = sorted(set(fixed))
        exp = [t for t in vocab if t.startswith(prefix)][:cap]
        grp = [t for t in exp if t not in set(fx)]
        acc = {}
        for g in [[t] for t in fx] + ([grp] if grp else []):
            df_g = max(len(oracle.postings.get(t, {})) for t in g)
            if df_g == 0:
                continue
            idf_g = math.log(1.0 + (n - df_g + 0.5) / (df_g + 0.5))
            tf_g = {}
            for t in g:
                for d, tf in oracle.postings.get(t, {}).items():
                    tf_g[d] = tf_g.get(d, 0) + tf
            for d, tf in tf_g.items():
                acc[d] = acc.get(d, 0.0) + score_term(
                    tf, oracle.doclen[d], oracle.avgdl, idf_g
                )
        return sorted(
            ((d, round(s, 6)) for d, s in acc.items()),
            key=lambda kv: (-kv[1], kv[0]),
        )[:K]

    for fixed, prefix, cap in [
        (["dup"], "f", 50),   # rare term OR common expansion
        (["merge"], "s", 4),  # cap trims the expansion
        (["merge", "key"], "zz", 50),  # empty expansion -> plain bool OR
    ]:
        got = [
            (r.doc_id, r.score)
            for r in Q.match_bool_prefix_topk(
                spark, df, fixed, prefix, K, max_expansions=cap
            ).collect()
        ]
        assert got == blend(fixed, prefix, cap), f"mbp {fixed} {prefix}*"

    # empty-expansion degeneration: equals the plain bool-should query
    got = Q.match_bool_prefix_topk(spark, df, ["merge", "key"], "zz", K)
    plain = Q.bm25_topk_exact(df, ["merge", "key"], K)
    assert [tuple(r) for r in got.collect()] == [
        tuple(r) for r in plain.collect()
    ]
    # OR semantics: an absent fixed term does NOT veto expansion-only
    # matches — the query degenerates to the blended prefix clause
    only_exp = [
        (r.doc_id, r.score)
        for r in Q.match_bool_prefix_topk(spark, df, ["zzzz"], "f", K).collect()
    ]
    assert only_exp == blend(["zzzz"], "f", 50) and only_exp


# ----------------------------------------------------- rank_feature / enum
def test_rank_feature_matches_bruteforce(spark, corpus):
    df, oracle, meta = corpus
    terms, pivot, boost = ["merge", "vector"], 300.0, 1.5
    want = sorted(
        (
            (d, round(s + boost * meta[d].n_chars /
                      (meta[d].n_chars + pivot), 6))
            for d, s in _scores(oracle, terms).items()
        ),
        key=lambda kv: (-kv[1], kv[0]),
    )[:K]
    got = [
        (r.doc_id, r.score)
        for r in Q.rank_feature_topk(
            df, terms, K, pivot=pivot, boost=boost
        ).collect()
    ]
    assert got == want
    # saturation is bounded: the feature can add at most `boost`
    plain = {
        r.doc_id: r.score for r in Q.bm25_topk_exact(df, terms, 10**6).collect()
    }
    for d, s in got:
        assert 0.0 < s - plain[d] < boost + 1e-9
    # monotone in the feature at equal BM25: larger n_chars never hurts
    s1 = 1.0 + boost * 100 / (100 + pivot)
    s2 = 1.0 + boost * 500 / (500 + pivot)
    assert s2 > s1


def test_terms_enum_prefix_cap(spark, index):
    got = [r.term for r in Q.terms_enum(spark, index, "s", size=4).collect()]
    assert got == ["scan", "slow", "small", "sort"]
    full = [r.term for r in Q.terms_enum(spark, index, "s", size=50).collect()]
    assert full == ["scan", "slow", "small", "sort", "spark", "stream"]
    assert Q.terms_enum(spark, index, "zz", size=5).count() == 0


def test_simple_query_string_shared_ast(spark, corpus):
    """The simple dialect compiles to the same AST shapes as
    query_string; an operator-equivalent pair of queries in the two
    dialects returns identical (doc_id, score) rows; lenient fallback
    never throws on garbage."""
    from unichem2index_spark.functions.querystring import (
        parse_query_string,
        parse_simple_query_string,
    )

    df, oracle, _ = corpus
    assert parse_simple_query_string(
        'merge + group + -vector | "slow fast"'
    ) == parse_query_string('(merge AND group AND NOT vector) OR "slow fast"')
    got = [
        tuple(r)
        for r in Q.query_string_topk(
            spark, df, 'merge + group + -vector | "slow fast"', 10,
            syntax="simple",
        ).collect()
    ]
    want = [
        tuple(r)
        for r in Q.query_string_topk(
            spark, df, '(merge AND group AND NOT vector) OR "slow fast"', 10
        ).collect()
    ]
    assert got == want and got
    # leniency: operator soup degrades to OR-of-terms, never raises
    assert parse_simple_query_string("merge )( + | group") == (
        "or", [("term", "merge"), ("term", "group")]
    )
    sloppy = [
        tuple(r)
        for r in Q.query_string_topk(
            spark, df, "merge )( + | group", 10, syntax="simple"
        ).collect()
    ]
    clean = [
        tuple(r)
        for r in Q.query_string_topk(
            spark, df, "merge OR group", 10
        ).collect()
    ]
    assert sloppy == clean


def test_combined_fields_bm25f_recompute(spark, corpus):
    """combined_fields == brute-force BM25F over the weighted pseudo
    field (wtf = 2*tf_title + tf_body, dl = 2*len_title + len_body,
    one df/avgdl)."""
    df, _, rows = corpus
    W, L = 2, 8
    toks = {d: tokenize(r.text) for d, r in rows.items()}
    dl = {
        d: W * min(len(t), L) + (len(t) - min(len(t), L))
        for d, t in toks.items()
    }
    n = len(dl)
    avgdl = sum(dl.values()) / n
    wtf: dict[int, Counter] = {}
    dfreq: Counter = Counter()
    for d, t in toks.items():
        c = Counter()
        for i, term in enumerate(t):
            c[term] += W if i < L else 1
        wtf[d] = c
        dfreq.update(set(t))
    scores = {}
    for d in toks:
        s = 0.0
        for term in set(TERMS):
            f = wtf[d].get(term, 0)
            if not f:
                continue
            idf = math.log(1.0 + (n - dfreq[term] + 0.5) / (dfreq[term] + 0.5))
            s += idf * (f / (f + 1.2 * (0.25 + 0.75 * dl[d] / avgdl)))
        if s:
            scores[d] = s
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:K]
    got = [
        (r.doc_id, r.score)
        for r in Q.combined_fields_topk(
            spark, df, TERMS, K, title_len=L, title_weight=W
        ).collect()
    ]
    assert [(d, round(s, 6)) for d, s in want] == got
    # weight 1 degenerates to plain BM25 rank/score
    plain = [
        (r.doc_id, r.score)
        for r in Q.combined_fields_topk(
            spark, df, TERMS, K, title_weight=1
        ).collect()
    ]
    base = [
        (r.doc_id, r.score)
        for r in Q.bm25_topk_exact(df, TERMS, K).collect()
    ]
    assert plain == base


def test_distance_feature_bounded_additive(spark, corpus):
    """distance_feature == BM25 + boost*pivot/(pivot+|id-origin|):
    recompute exactly; the delta is bounded by boost and maximal AT the
    origin."""
    df, oracle, _ = corpus
    origin, pivot, boost = 250, 60.0, 1.5
    base = {
        d: s
        for d, s in (
            (d, oracle.score_doc(TERMS, d)) for d in oracle.doclen
        )
        if s > 0.0
    }
    want = sorted(
        (
            (d, s + boost * pivot / (pivot + float(abs(d - origin))))
            for d, s in base.items()
        ),
        key=lambda kv: (-kv[1], kv[0]),
    )[:K]
    got = [
        (r.doc_id, r.score)
        for r in Q.distance_feature_topk(
            df, TERMS, K, origin=origin, pivot=pivot, boost=boost
        ).collect()
    ]
    assert [(d, round(s, 6)) for d, s in want] == got
    for d, s in got:
        # returned scores are rounded to 6 dp -> epsilon 1e-6
        delta = s - base.get(d, 0.0)
        assert 0.0 < delta <= boost + 1e-6
        if d == origin:
            assert abs(delta - boost) < 1e-6


def test_terms_lookup_broadcast_semijoin(spark, corpus):
    """terms_lookup == docs sharing the lookup doc's field value; the
    plan is a broadcast join (no collect); missing lookup doc -> empty."""
    df, _, rows = corpus
    out = Q.terms_lookup(spark, df, 42, "source", 15)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan
    src = rows[42].source
    want = sorted(d for d, r in rows.items() if r.source == src)[:15]
    assert [r.doc_id for r in out.collect()] == want
    assert Q.terms_lookup(spark, df, 10**9, "source", 15).count() == 0


def test_search_template_renders_then_shares_path(spark, corpus):
    """The template result is IDENTICAL to running the rendered string;
    missing params raise (never a silent hole)."""
    from unichem2index_spark.functions.querystring import (
        render_search_template,
    )

    df, _, _ = corpus
    tpl = '({{a}} AND {{b}}) OR "{{p}} {{p}}"'
    params = {"a": "merge", "b": "group", "p": "batch"}
    rendered = render_search_template(tpl, params)
    assert rendered == '(merge AND group) OR "batch batch"'
    got = [
        tuple(r)
        for r in Q.query_string_topk(spark, df, rendered, 10).collect()
    ]
    direct = [
        tuple(r)
        for r in Q.query_string_topk(
            spark, df, '(merge AND group) OR "batch batch"', 10
        ).collect()
    ]
    assert got == direct and got
    with pytest.raises(ValueError):
        render_search_template(tpl, {"a": "merge"})


def test_collapse_inner_hits_recompute(spark, corpus):
    """group_rank rows tile the collapse_topk page; inner hits are each
    group's top-inner_size by (score desc, doc_id); every group carries
    rank 1."""
    df, oracle, rows = corpus
    k, inner = 8, 2
    got = Q.collapse_inner_hits_topk(
        df, TERMS, k, inner_size=inner
    ).collect()
    # brute force
    acc = _scores(oracle, TERMS)
    per: dict = {}
    for d, s in acc.items():
        per.setdefault(rows[d].source, []).append((d, s))
    best = sorted(
        ((max(v, key=lambda p: (p[1], -p[0]))[1],
          min(d for d, s in v if s == max(p[1] for p in v)), src)
         for src, v in per.items()),
        key=lambda t: (-t[0], t[1]),
    )[:k]
    want_groups = [src for _, _, src in best]
    groups_got = [r.source for r in got if r.inner_rank == 1]
    assert groups_got == want_groups
    # winners agree with collapse_topk's page
    page = Q.collapse_topk(df, TERMS, k).collect()
    assert groups_got == [r.source for r in page]
    for src in want_groups:
        inner_got = [
            (r.inner_rank, r.doc_id)
            for r in got
            if r.source == src
        ]
        want_inner = sorted(
            per[src], key=lambda p: (-p[1], p[0])
        )[:inner]
        assert sorted(inner_got) == [
            (i + 1, d) for i, (d, _) in enumerate(want_inner)
        ]


def test_mterm_vectors_batches_term_vectors(spark, corpus):
    """_mtermvectors rows == the union of per-doc _termvectors rows;
    absent ids contribute nothing."""
    df, _, _ = corpus
    got = Q.mterm_vectors(df, [7, 42, 10**9]).collect()
    assert {r.doc_id for r in got} == {7, 42}
    for d in (7, 42):
        single = [
            (r.term, r.tf, r.df, r.ttf, r.positions)
            for r in Q.term_vectors(df, d).collect()
        ]
        batched = [
            (r.term, r.tf, r.df, r.ttf, r.positions)
            for r in got
            if r.doc_id == d
        ]
        assert batched == single and single


def test_analyze_shingles_positions(spark):
    """Shingles sit at their first word's position alongside the
    unigrams (output_unigrams=true); short input emits unigrams only."""
    got = [
        (r.position, r.token)
        for r in Q.analyze_shingles(spark, "Fast merge sort").collect()
    ]
    assert got == [
        (0, "fast"), (0, "fast merge"),
        (1, "merge"), (1, "merge sort"),
        (2, "sort"),
    ]
    single = [
        (r.position, r.token)
        for r in Q.analyze_shingles(spark, "solo").collect()
    ]
    assert single == [(0, "solo")]


def test_msearch_template_batch_identity(spark, corpus):
    """Each batched sub-search == its standalone rendered query."""
    from unichem2index_spark.functions.querystring import (
        render_search_template,
    )

    df, _, _ = corpus
    tpl = '({{a}} AND {{b}}) OR "{{p1}} {{p2}}"'
    psets = [
        (0, {"a": "merge", "b": "group", "p1": "batch", "p2": "batch"}),
        (1, {"a": "fast", "b": "window", "p1": "slow", "p2": "fast"}),
    ]
    got = Q.msearch_template_topk(spark, df, tpl, psets, 8).collect()
    for qid, params in psets:
        sub = [(r.doc_id, r.score) for r in got if r.query_id == qid]
        alone = [
            (r.doc_id, r.score)
            for r in Q.query_string_topk(
                spark, df, render_search_template(tpl, params), 8
            ).collect()
        ]
        assert sorted(sub) == sorted(alone) and alone
    with pytest.raises(ValueError):
        Q.msearch_template_topk(spark, df, tpl, [], 8)


def test_sparse_vector_dot_product(spark, corpus):
    """sparse_vector == exact integer dot product of query weights with
    per-doc tf; no idf, no length norm."""
    df, _, _ = corpus
    weights = {"merge": 3, "group": 2, "fast": 1}
    got = [
        (r.doc_id, r.score)
        for r in Q.sparse_vector_topk(df, weights, 8).collect()
    ]
    scores = {}
    for r in df.collect():
        toks = tokenize(r.text)
        s = sum(w * toks.count(term) for term, w in weights.items())
        if s > 0:
            scores[r.doc_id] = s
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:8]
    assert got == want and got
    with pytest.raises(ValueError):
        Q.sparse_vector_topk(df, {}, 8)


def test_analyze_edge_ngrams_recompute(spark):
    """Edge-ngram grams + preserve_original vs pure Python."""
    from unichem2index_spark.functions.tokenize import tokenize

    text = "a searching over windowed merge run"
    want = []
    for pos, tok in enumerate(tokenize(text)):
        if len(tok) >= 2:
            for g in range(2, min(len(tok), 5) + 1):
                want.append((pos, tok[:g]))
        if len(tok) < 2 or len(tok) > 5:
            want.append((pos, tok))
    got = [
        (r.position, r.token)
        for r in Q.analyze_edge_ngrams(spark, text, 2, 5).collect()
    ]
    assert got == sorted(want)
    with pytest.raises(ValueError):
        Q.analyze_edge_ngrams(spark, text, 0, 5)


def test_scroll_sliced_disjoint_exhaustive(spark, corpus):
    """Slices are disjoint, rank-in-slice follows _doc order, and a
    huge page covers every doc exactly once."""
    from unichem2index_spark.functions.hashing import FP_MULT, MOD

    df, _, _ = corpus
    n = df.count()
    full = Q.scroll_sliced(df, 3, page=10**6).collect()
    assert len(full) == n  # exhaustive, disjoint
    per: dict = {}
    for r in full:
        assert r.slice_id == (((r.doc_id % MOD) + 1) * FP_MULT) % MOD % 3
        per.setdefault(r.slice_id, []).append((r.slice_rank, r.doc_id))
    for ranks in per.values():
        ordered = sorted(ranks)
        assert [r for r, _ in ordered] == list(range(1, len(ordered) + 1))
        docs = [d for _, d in ordered]
        assert docs == sorted(docs)  # _doc order within the slice
    page1 = Q.scroll_sliced(df, 3, page=5).collect()
    assert len(page1) == sum(min(5, len(v)) for v in per.values())
    with pytest.raises(ValueError):
        Q.scroll_sliced(df, 0)


# -------------------------------------------------- avg_precision / redde
def test_avg_precision_matches_python(spark, corpus):
    df, oracle, _ = corpus
    queries = [
        (0, ["merge", "group"], "key"),
        (1, ["fast", "window"], "scan"),
        (2, ["the", "vector"], "merge"),
    ]
    k = 20
    got = {r.query_id: r for r in
           Q.avg_precision_eval(df, queries, k).collect()}
    assert set(got) == {q[0] for q in queries}
    for qid, terms, marker in queries:
        topk = _ranking(_scores(oracle, terms))[:k]
        relevant = set(oracle.postings.get(marker, {}))
        hit_ranks = [
            i + 1 for i, (d, _) in enumerate(topk) if d in relevant
        ]
        # exact-integer accumulation, one final divide — same as the op
        num = sum(
            (j + 1) * (Q.AP_LCM // r)
            for j, r in enumerate(hit_ranks)
        )
        ap = num / (float(Q.AP_LCM) * len(relevant))
        row = got[qid]
        assert row.n_rel == len(relevant)
        assert row.n_hits == len(hit_ranks)
        assert row.ap == round(ap, 6)
    # AP is order-sensitive where P@k is not: a relevant doc at rank 1
    # must contribute more than the same doc at rank k, so ap <= 1 and
    # ap > 0 whenever any hit landed
    assert all(0.0 <= r.ap <= 1.0 for r in got.values())


def test_redde_estimates_match_python(spark, corpus):
    df, oracle, _ = corpus
    terms, n_shards, every, top_n = ["the", "merge", "vector"], 4, 3, 40
    sampled = sorted(d for d in oracle.doclen if d % every == 0)
    # CSI oracle: rebuilt from the sampled docs only (ReDDE scores with
    # the sample's own stats, never the full corpus')
    import unichem2index_spark.functions.tokenize as _tk
    texts = {r.doc_id: r.text for r in df.collect()}
    csi = Bm25Oracle(
        [(d, _tk.tokenize(texts[d])) for d in sampled]
    )
    top = csi.topk(terms, top_n)
    votes: dict[int, int] = {}
    for d, _ in top:
        votes[d % n_shards] = votes.get(d % n_shards, 0) + 1
    got = {r.shard: r for r in
           Q.redde_resource_selection(
               df, terms, n_shards, every, top_n
           ).collect()}
    assert set(got) == set(range(n_shards))
    est = {}
    for s in range(n_shards):
        sd = sum(1 for d in oracle.doclen if d % n_shards == s)
        cd = sum(1 for d in sampled if d % n_shards == s)
        v = votes.get(s, 0)
        row = got[s]
        assert (row.shard_docs, row.csi_docs, row.n_votes) == (sd, cd, v)
        est[s] = (float(v) * float(sd)) / float(cd) if cd else 0.0
        assert row.est_rel == round(est[s], 6)
    # votes must sum to the CSI top-n actually retrieved
    assert sum(votes.values()) == len(top)


def test_cori_beliefs_match_python(spark, corpus):
    import math as _m

    df, oracle, rows = corpus
    terms, n_shards = ["the", "merge", "vector"], 4
    toks = {d: tokenize(r.text) for d, r in rows.items()}
    cw = {s: 0 for s in range(n_shards)}
    df_tc: dict[tuple[int, str], int] = {}
    for d, ts in toks.items():
        sh = d % n_shards
        cw[sh] += len(ts)
        for t in set(ts) & set(terms):
            df_tc[(sh, t)] = df_tc.get((sh, t), 0) + 1
    avg_cw = sum(cw.values()) / n_shards
    cf_t = {
        t: sum(1 for s in range(n_shards) if (s, t) in df_tc)
        for t in terms
    }
    want = {}
    for s in range(n_shards):
        sc = 0.0
        for t in terms:
            if cf_t[t] == 0:
                sc += 0.4
                continue
            dd = df_tc.get((s, t), 0)
            T = dd / (dd + 50.0 + 150.0 * cw[s] / avg_cw)
            I = _m.log((n_shards + 0.5) / cf_t[t]) / _m.log(
                n_shards + 1.0
            )
            sc += 0.4 + 0.6 * T * I
        want[s] = sc
    got = {r.shard: r for r in Q.cori_selection(df, terms, n_shards).collect()}
    assert set(got) == set(range(n_shards))
    for s in range(n_shards):
        assert got[s].cw == cw[s]
        assert abs(got[s].score - round(want[s], 6)) < 1e-6
    # each term contributes at least the belief floor and at most 1
    lo, hi = 0.4 * len(terms), 1.0 * len(terms)
    assert all(lo <= r.score <= hi for r in got.values())


def test_rbp_matches_python_and_is_exact(spark, corpus):
    df, oracle, _ = corpus
    queries = [
        (0, ["merge", "group"], "key"),
        (1, ["fast", "window"], "scan"),
        (2, ["the", "vector"], "merge"),
    ]
    k = 20
    got = {r.query_id: r for r in Q.rbp_eval(df, queries, k).collect()}
    assert set(got) == {q[0] for q in queries}
    for qid, terms, marker in queries:
        topk = _ranking(_scores(oracle, terms))[:k]
        relevant = set(oracle.postings.get(marker, {}))
        hit_ranks = [
            i + 1 for i, (d, _) in enumerate(topk) if d in relevant
        ]
        num = sum(1 << (k - r) for r in hit_ranks)
        rbp = 0.5 * num / float(1 << (k - 1))
        row = got[qid]
        assert row.n_rel == len(relevant)
        assert row.n_hits == len(hit_ranks)
        # dyadic accumulation: EQUALITY, not tolerance
        assert row.rbp == round(rbp, 6)
        # RBP is bounded by the geometric tail: <= 1 - p^k
        assert 0.0 <= row.rbp <= 1.0 - 0.5 ** k + 1e-12


def test_err_matches_python_fold(spark, corpus):
    df, oracle, rows = corpus
    from unichem2index_spark.functions.tokenize import tokenize as _tok

    queries = [
        (0, ["merge", "group"], "key"),
        (1, ["fast", "window"], "scan"),
        (2, ["the", "vector"], "merge"),
    ]
    k = 20
    toks = {d: _tok(r.text) for d, r in rows.items()}
    got = {r.query_id: r for r in Q.err_eval(df, queries, k).collect()}
    assert set(got) == {q[0] for q in queries}
    for qid, terms, marker in queries:
        topk = _ranking(_scores(oracle, terms))[:k]
        e, p, graded = 0.0, 1.0, 0
        for i, (d, _) in enumerate(topk):
            g = min(toks[d].count(marker), 3)
            R = ((1 << g) - 1.0) / 8.0
            if R > 0:
                graded += 1
            e += p * (R / (i + 1))
            p *= 1.0 - R
        row = got[qid]
        assert row.n_graded == graded
        assert abs(row.err - round(e, 6)) < 1e-9
        # cascade bound: ERR <= 1 and monotone in any prefix
        assert 0.0 <= row.err <= 1.0


def test_trec_pool_matches_python(spark, corpus):
    df, oracle, rows = corpus
    queries = [
        (0, ["merge", "group"], "key"),
        (1, ["fast", "window"], "scan"),
        (2, ["the", "vector"], "merge"),
    ]
    d = Q.POOL_DEPTH
    toks = {did: tokenize(r.text) for did, r in rows.items()}
    dl = {did: len(ts) for did, ts in toks.items()}
    n = len(dl)
    avgdl = sum(dl.values()) / n
    got = {r.query_id: r for r in Q.trec_pool(df, queries).collect()}
    assert set(got) == {q[0] for q in queries}
    import math as _m

    for qid, terms, _ in queries:
        sa: dict[int, float] = {}
        sb: dict[int, float] = {}
        for t in sorted(set(terms)):
            dfreq = sum(1 for ts in toks.values() if t in ts)
            if not dfreq:
                continue
            idf = _m.log(1.0 + (n - dfreq + 0.5) / (dfreq + 0.5))
            for did, ts in toks.items():
                tf = ts.count(t)
                if not tf:
                    continue
                sa[did] = sa.get(did, 0.0) + idf * (
                    tf / (tf + 1.2 * (0.25 + 0.75 * dl[did] / avgdl))
                )
                sb[did] = sb.get(did, 0.0) + idf * (tf / (tf + 1.2))
        ta = {x for x, _ in sorted(
            sa.items(), key=lambda kv: (-kv[1], kv[0]))[:d]}
        tb = {x for x, _ in sorted(
            sb.items(), key=lambda kv: (-kv[1], kv[0]))[:d]}
        r = got[qid]
        assert r.pool_size == len(ta | tb)
        assert r.n_overlap == len(ta & tb)
        assert r.n_only_a == len(ta - tb)
        assert r.n_only_b == len(tb - ta)
        assert r.jaccard == round(len(ta & tb) / len(ta | tb), 6)
        # two correlated systems must overlap but not coincide
        assert 0 < r.n_overlap < r.pool_size


def test_pivoted_length_audit_recompute(spark, corpus):
    import math as _m

    df, oracle, rows = corpus
    queries = [
        (0, ["merge", "group"], "key"),
        (1, ["fast", "window"], "scan"),
        (2, ["the", "vector"], "merge"),
    ]
    depth = Q.PIVOT_DEPTH
    toks = {d: tokenize(r.text) for d, r in rows.items()}
    dl = {d: len(ts) for d, ts in toks.items()}
    from collections import Counter

    cnt = Counter(dl.values())
    total = sum(cnt.values())
    bucket_of = {}
    cum = 0
    for v in sorted(cnt):
        bucket_of[v] = (cum * Q.PIVOT_BUCKETS) // total
        cum += cnt[v]
    retr: Counter = Counter()
    n_retr = 0
    for qid, terms, _ in queries:
        topd = _ranking(_scores(oracle, terms))[:depth]
        for d, _ in topd:
            retr[bucket_of[dl[d]]] += 1
            n_retr += 1
    docs_b: Counter = Counter(bucket_of[v2] for v2 in dl.values())
    got = {r.bucket: r for r in
           Q.pivoted_length_audit(df, queries).collect()}
    assert set(got) == set(docs_b)
    for b in docs_b:
        r = got[b]
        assert r.n_docs == docs_b[b]
        assert r.n_retrieved == retr.get(b, 0)
        assert r.doc_share == round(docs_b[b] / total, 6)
        assert r.retr_share == round(retr.get(b, 0) / n_retr, 6)
    # shares each sum to ~1
    assert abs(sum(r.doc_share for r in got.values()) - 1.0) < 1e-3
    assert abs(sum(r.retr_share for r in got.values()) - 1.0) < 1e-3


def test_qpp_postretrieval_matches_python(spark, corpus):
    import math as _m

    df, oracle, _ = corpus
    queries = [
        (0, ["merge", "group"], "key"),
        (1, ["fast", "window"], "scan"),
        (2, ["the", "vector"], "merge"),
    ]
    k = Q.QPP_K
    got = {r.query_id: r for r in
           Q.qpp_postretrieval(df, queries).collect()}
    for qid, terms, _ in queries:
        sc = _scores(oracle, terms)
        n = len(sc)
        mu_all = sum(sc.values()) / n
        topk = [s for _, s in _ranking(sc)[:k]]
        mu_k = sum(topk) / len(topk)
        m2 = sum(s * s for s in topk) / len(topk)
        sigma = _m.sqrt(m2 - mu_k * mu_k)
        nq = len(sorted(set(terms)))
        r = got[qid]
        assert r.n_matched == n
        assert abs(r.mu_k - round(mu_k, 6)) < 1e-5
        assert abs(r.wig - round((mu_k - mu_all) / _m.sqrt(nq), 6)) < 1e-5
        assert abs(r.nqc - round(sigma / mu_all, 6)) < 1e-5
        # peaked rankings: top-k mean must beat the all-matched mean
        assert r.wig > 0


def test_hard_negatives_matches_python(spark, corpus):
    df, oracle, _ = corpus
    queries = [
        (0, ["merge", "group"], "key"),
        (1, ["fast", "window"], "scan"),
        (2, ["the", "vector"], "merge"),
    ]
    n = Q.NEG_PER_QUERY
    got: dict[int, list] = {}
    for r in Q.hard_negatives(df, queries).collect():
        got.setdefault(r.query_id, []).append(
            (r.neg_rank, r.doc_id, r.score)
        )
    for qid, terms, marker in queries:
        ranked = _ranking(_scores(oracle, terms))
        relevant = set(oracle.postings.get(marker, {}))
        negs = [
            (d, s) for d, s in ranked if d not in relevant
        ][:n]
        want = [
            (i + 1, d, round(s, 6)) for i, (d, s) in enumerate(negs)
        ]
        rows = got[qid]
        assert [(rk, d) for rk, d, _ in rows] == [
            (rk, d) for rk, d, _ in want
        ]
        for (_, _, s_got), (_, _, s_want) in zip(rows, want):
            assert abs(s_got - s_want) < 1e-6
        # negatives must be lexically matched yet non-relevant
        assert all(d not in relevant for _, d, _ in rows)
