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
