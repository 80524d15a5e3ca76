"""query_string parser unit tests (pure Python) + engine-level
invariants for query_string_topk and rescore_topk."""

from __future__ import annotations

import pytest

from unichem2index_spark.functions.querystring import (
    parse_query_string,
    positive_terms,
    render_sql,
)
from unichem2index_spark.operators import query as Q
from unichem2index_spark.sources.tables import load_tables

from tests.conftest import SF_SMOKE


def test_parser_shapes():
    assert parse_query_string("merge") == ("term", "merge")
    assert parse_query_string('"batch batch"') == (
        "phrase",
        ["batch", "batch"],
    )
    assert parse_query_string("a AND b") == (
        "and",
        [("term", "a"), ("term", "b")],
    )
    # implicit adjacency == OR (Lucene default_operator=OR)
    assert parse_query_string("a b") == parse_query_string("a OR b")
    node = parse_query_string('(a AND b) OR ("x y" AND NOT c)')
    assert node[0] == "or"
    assert node[1][0] == ("and", [("term", "a"), ("term", "b")])
    assert node[1][1] == (
        "and",
        [("phrase", ["x", "y"]), ("not", ("term", "c"))],
    )


def test_parser_precedence_and_errors():
    # NOT binds tighter than AND, AND tighter than OR.
    node = parse_query_string("a OR b AND NOT c")
    assert node == (
        "or",
        [("term", "a"), ("and", [("term", "b"), ("not", ("term", "c"))])],
    )
    for bad in ["(a", '""', ""]:
        with pytest.raises(ValueError):
            parse_query_string(bad)


def test_positive_terms_excludes_negated():
    node = parse_query_string('(a AND b) OR ("x y" AND NOT c)')
    # phrase terms are filter-context, negated terms excluded
    assert positive_terms(node) == ["a", "b"]


def test_render_sql_is_well_formed():
    node = parse_query_string("a AND NOT b")
    sql = render_sql(node)
    assert "list_contains(toks, 'a')" in sql
    assert "NOT list_contains(toks, 'b')" in sql


def test_query_string_eligibility(spark):
    t = load_tables(spark, SF_SMOKE)
    docs = t["documents"]
    rows = Q.query_string_topk(
        spark, docs, '(merge AND group) OR ("batch batch" AND NOT vector)', 10
    ).collect()
    assert rows
    texts = {r.doc_id: r.text.lower().split() for r in docs.collect()}
    for r in rows:
        toks = texts[r.doc_id]
        s = " " + " ".join(toks) + " "
        ok = ("merge" in toks and "group" in toks) or (
            " batch batch " in s and "vector" not in toks
        )
        assert ok, r


def test_rescore_applies_phrase_bonus(spark):
    t = load_tables(spark, SF_SMOKE)
    docs = t["documents"]
    base = {
        r.doc_id: r.score
        for r in Q.bm25_topk_exact(docs, ["the", "merge", "vector"], 50).collect()
    }
    rows = Q.rescore_topk(
        spark, docs, ["the", "merge", "vector"], ["merge", "group"],
        window=50, k=10,
    ).collect()
    assert rows
    flipped = 0
    for r in rows:
        assert r.doc_id in base  # rescore never leaves the window
        bonus = 2.0 if r.phrase_match else 0.0
        assert abs(r.score - (base[r.doc_id] + bonus)) < 1e-5
        flipped += int(r.phrase_match)
    # The fixture's window genuinely contains phrase matches.
    assert flipped >= 1


def test_multi_match_per_field_stats(spark):
    """Recompute both field scores in pure Python (per-field df/avgdl —
    the Lucene per-field statistics contract) and check best_fields
    combine = max + tie*min."""
    import math
    import re

    t = load_tables(spark, SF_SMOKE)
    docs = t["documents"]
    rows = Q.multi_match_topk(spark, docs, ["the", "merge", "vector"], 10).collect()
    assert rows
    texts = {
        r.doc_id: re.findall(r"[a-z0-9]+", r.text.lower())
        for r in docs.collect()
    }
    fields = {
        "t": {d: toks[:8] for d, toks in texts.items()},
        "b": {d: toks[8:] for d, toks in texts.items()},
    }

    def field_score(fld, doc, terms):
        col = fields[fld]
        present = {d: v for d, v in col.items() if v}
        n = len(present)
        avgdl = sum(len(v) for v in present.values()) / n
        s = 0.0
        for term in sorted(set(terms)):
            tf = present.get(doc, []).count(term)
            if tf == 0:
                continue
            df = sum(1 for v in present.values() if term in v)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s += idf * (tf / (tf + 1.2 * (0.25 + 0.75 * len(present[doc]) / avgdl)))
        return s

    for r in rows[:5]:
        ts = field_score("t", r.doc_id, ["the", "merge", "vector"])
        bs = field_score("b", r.doc_id, ["the", "merge", "vector"])
        want = max(ts, bs) + 0.3 * min(ts, bs)
        assert abs(r.score - want) < 1e-5, (r.doc_id, r.score, want)


def test_pinned_order_and_exclusion(spark):
    t = load_tables(spark, SF_SMOKE)
    docs = t["documents"]
    pinned = [7, 3, 11]
    rows = Q.pinned_topk(spark, docs, ["the", "merge", "vector"], pinned, 10).collect()
    assert [r.doc_id for r in rows[:3]] == pinned  # editorial order kept
    assert all(r.is_pinned for r in rows[:3])
    organic = rows[3:]
    assert len(organic) == 7
    assert all(not r.is_pinned for r in organic)
    assert not set(r.doc_id for r in organic) & set(pinned)
    keys = [(-r.score, r.doc_id) for r in organic]
    assert keys == sorted(keys)


def test_linear_hybrid_normalization(spark):
    from unichem2index_spark.operators import similarity

    t = load_tables(spark, SF_SMOKE)
    rows = similarity.linear_hybrid(
        spark, t, ["the", "merge", "vector"], w_lex=0.7, w_knn=0.3
    ).collect()
    assert rows
    # Scores are bounded by the weight sum; the best doc of a retriever
    # normalizes to 1.0, so the page max is >= max single weight.
    assert all(0.0 <= r.score <= 1.0 + 1e-9 for r in rows)
    assert rows[0].score >= 0.7 - 1e-9
    keys = [(-r.score, r.doc_id) for r in rows]
    assert keys == sorted(keys)


def test_percolate_query_strings_compiled(spark):
    """Every emitted (query_id, doc_id) match satisfies its registered
    tree, every non-match doesn't (checked on a sample), and the plan
    contains no join or exchange — the compiled-registry contract."""
    t = load_tables(spark, SF_SMOKE)
    docs = t["documents"]
    regs = [(1, "merge AND group"), (2, '"batch batch" AND NOT vector')]
    df = Q.percolate_query_strings(spark, docs, regs)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    rows = df.collect()
    assert rows
    texts = {r.doc_id: r.text.lower().split() for r in docs.collect()}
    got = {(r.query_id, r.doc_id) for r in rows}
    for doc_id, toks in texts.items():
        s = " " + " ".join(toks) + " "
        want1 = "merge" in toks and "group" in toks
        want2 = " batch batch " in s and "vector" not in toks
        assert ((1, doc_id) in got) == want1
        assert ((2, doc_id) in got) == want2
