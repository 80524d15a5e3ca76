"""Property test for the ES|QL dual compiler: random integer/boolean
expression trees rendered to an ES|QL pipeline must produce identical
results from the Spark program and the DuckDB SQL render. This checks
the compiler pair (precedence, operator mapping, literal quoting) far
beyond the hand-picked entry queries."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from unichem2index_spark.functions.esql import compile_spark, compile_sql, parse_esql
from unichem2index_spark.sources.tables import load_tables

from tests.conftest import SF_SMOKE

INT_COLS = ["n_chars", "doc_id"]

# Bounded literals + depth keep every intermediate far from int64 range
# (Spark 4 runs ANSI: an overflow would error, not wrap).
_lit = st.integers(1, 20).map(str)
_col = st.sampled_from(INT_COLS)


def _int_exprs(depth: int):
    if depth == 0:
        return st.one_of(_lit, _col)
    sub = _int_exprs(depth - 1)
    return st.one_of(
        _lit,
        _col,
        st.tuples(sub, st.sampled_from(["+", "-", "*"]), sub).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"
        ),
        st.tuples(sub, st.integers(2, 9)).map(
            lambda t: f"({t[0]} % {t[1]})"
        ),
    )


def _bool_exprs(depth: int):
    ints = _int_exprs(2)
    base = st.tuples(
        ints, st.sampled_from(["==", "!=", "<", "<=", ">", ">="]), ints
    ).map(lambda t: f"({t[0]} {t[1]} {t[2]})")
    if depth == 0:
        return base
    sub = _bool_exprs(depth - 1)
    return st.one_of(
        base,
        st.tuples(sub, st.sampled_from(["AND", "OR"]), sub).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"
        ),
        sub.map(lambda s: f"(NOT {s})"),
    )


@pytest.fixture(scope="module")
def duck_small():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{SF_SMOKE}/documents.parquet'"
    )
    yield con
    con.close()


@settings(max_examples=20, deadline=None)
@given(_bool_exprs(1), _int_exprs(2))
def test_random_pipeline_matches_duckdb(spark, duck_small, cond, val):
    q = (
        f"FROM documents | WHERE {cond} | EVAL x = {val}"
        " | STATS s = SUM(x), c = COUNT(*)"
    )
    stages = parse_esql(q)
    got = compile_spark(stages, load_tables(spark, SF_SMOKE)).first()
    want = duck_small.execute(compile_sql(stages)).fetchone()
    g = (None if got.s is None else int(got.s), int(got.c))
    w = (None if want[0] is None else int(want[0]), int(want[1]))
    assert g == w, (q, g, w)


# ---------------------------------------------------------- query_string
from unichem2index_spark.functions.querystring import (  # noqa: E402
    parse_query_string,
    positive_terms,
    render_sql,
)

_WORDS = ["merge", "group", "vector", "batch", "the", "zebra"]


def _qs_exprs(depth: int):
    term = st.sampled_from(_WORDS)
    phrase = st.tuples(
        st.sampled_from(_WORDS), st.sampled_from(_WORDS)
    ).map(lambda t: f'"{t[0]} {t[1]}"')
    if depth == 0:
        return st.one_of(term, phrase)
    sub = _qs_exprs(depth - 1)
    return st.one_of(
        term,
        phrase,
        st.tuples(sub, st.sampled_from(["AND", "OR"]), sub).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"
        ),
        sub.map(lambda s: f"(NOT {s})"),
    )


@settings(max_examples=30, deadline=None)
@given(_qs_exprs(2))
def test_query_string_eligibility_matches_duckdb(duck_small, qstr):
    """The SAME parsed AST's SQL render must select exactly the doc set
    a pure-Python evaluation of the tree selects."""
    import re as _re

    node = parse_query_string(qstr)
    sql = (
        "SELECT doc_id FROM ("
        "SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks,"
        " ' ' || array_to_string(regexp_extract_all(lower(text), "
        "'[a-z0-9]+'), ' ') || ' ' AS s FROM documents) WHERE "
        + render_sql(node)
    )
    got = {r[0] for r in duck_small.execute(sql).fetchall()}

    docs = duck_small.execute("SELECT doc_id, text FROM documents").fetchall()

    def ev(n, toks, sent):
        k = n[0]
        if k == "term":
            return n[1] in toks
        if k == "phrase":
            return (" " + " ".join(n[1]) + " ") in sent
        if k == "not":
            return not ev(n[1], toks, sent)
        vals = [ev(c, toks, sent) for c in n[1]]
        return all(vals) if k == "and" else any(vals)

    want = set()
    for doc_id, text in docs:
        toks = _re.findall(r"[a-z0-9]+", text.lower())
        sent = " " + " ".join(toks) + " "
        if ev(node, set(toks), sent):
            want.add(doc_id)
    assert got == want, (qstr, len(got), len(want))
    # positive_terms never includes negated-or-phrase-only terms
    for t in positive_terms(node):
        assert t in _WORDS
