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
