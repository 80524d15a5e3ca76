"""Driver-contract tests: queries()/oracle_sql() coherence, oracle SQL
validity in DuckDB, and fast Spark-vs-DuckDB spot checks (the full sweep
lives in scripts/check_correctness.py)."""

from __future__ import annotations

import math

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_CORRECT

# documented non-SQL ops (UDTF fan-out / approximate recall / index
# lifecycle / HLL estimate)
ROWS_ONLY = {
    "key_components",
    "cosine_topk_lsh",
    "cosine_topk_ivf",
    "index_update_lifecycle",
    "cardinality_agg",
    "resize_images",
    "frame_sample",
    "delete_by_query_lifecycle",
    "cosine_topk_sq",
    "doclen_percentiles_approx",
}


def test_queries_and_oracles_align():
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    assert set(qs) - set(os_) == ROWS_ONLY
    assert len(qs) >= 35


def test_oracle_sql_all_valid_duckdb(duck):
    for name, sql in entrymod.oracle_sql().items():
        duck.execute(f"SELECT * FROM ({sql}) LIMIT 0")  # parse + bind


def _norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.9g}"
    if hasattr(v, "isoformat"):
        return v.isoformat().replace("+00:00", "")
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


@pytest.mark.parametrize(
    "name",
    ["bm25_topk", "term_stats", "tpch_q1", "doc_fingerprint", "dedup_exact"],
)
def test_spot_check_vs_duckdb(spark, duck, name):
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    sdf = qs[name](spark, SF_CORRECT)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(os_[name])
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    assert sorted(s_cols) == sorted(d_cols)
    assert len(s_rows) == len(d_rows)
    order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
    a = sorted(tuple(_norm(r[i]) for i in order_s) for r in s_rows)
    b = sorted(tuple(_norm(r[i]) for i in order_d) for r in d_rows)
    assert a == b
