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
    "reindex_lifecycle",
    "cosine_topk_sq",
    "doclen_percentiles_approx",
    "cosine_topk_pq",
}


def test_queries_and_oracles_align():
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    assert set(qs) - set(os_) == ROWS_ONLY
    assert len(qs) >= 35


def test_pyfiles_zip_is_fresh():
    """The committed --py-files deployment zip must byte-match the
    package sources (ADVICE r4: a stale zip shipped a pre-fix WAND
    kernel and lacked 7 new modules). Re-run scripts/package_pyfiles.py
    and commit the zip whenever this fails."""
    import pathlib
    import zipfile

    root = pathlib.Path(__file__).parent.parent
    pkg = root / "unichem2index_spark"
    zpath = root / "dist" / "unichem2index_spark.zip"
    assert zpath.exists(), "dist/unichem2index_spark.zip missing"
    want = {
        str(p.relative_to(root)): p.read_bytes()
        for p in pkg.rglob("*.py")
        if "__pycache__" not in p.parts
    }
    with zipfile.ZipFile(zpath) as zf:
        got = {n: zf.read(n) for n in zf.namelist() if n.endswith(".py")}
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    stale = sorted(n for n in set(want) & set(got) if want[n] != got[n])
    assert not (missing or extra or stale), (
        f"zip drift: missing={missing} extra={extra} stale={stale} — "
        "run scripts/package_pyfiles.py and commit dist/"
    )


def test_gate_window_r5_composition():
    """The driver gate checks the FIRST 50 queries() entries. The r5
    window must be: the two r4 repairs first, then the 6 fixed latent
    type-hazard entries, and every window entry must carry a DuckDB
    oracle (no rows-only slots wasted on the hash-checking window)."""
    qs = list(entrymod.queries())
    os_ = entrymod.oracle_sql()
    assert qs[:2] == ["esql", "term_vectors"]
    assert set(qs[2:8]) == {
        "stats_bucket", "bucket_script_selector", "train_eval_split",
        "pack_sequences", "quality_filter", "quality_filter_fast",
    }
    window = qs[:50]
    assert all(name in os_ for name in window), [
        n for n in window if n not in os_
    ]
    # the full order list covers every entry exactly once
    assert len(qs) == len(set(qs))


def test_oracle_sql_all_valid_duckdb(duck):
    for name, sql in entrymod.oracle_sql().items():
        duck.execute(f"SELECT * FROM ({sql}) LIMIT 0")  # parse + bind


# Canon-compat contract (CORRECTNESS_r04 postmortem): the driver's
# pandas-based canonicalizer converts DuckDB HUGEINT to float64 (hash
# mismatch vs Spark's int64 for value-equal integer SUMs) and crashes
# sorting LIST/STRUCT cells ("unhashable type: 'list'"). No oracle may
# therefore emit those output types — integer SUMs must be CAST to
# BIGINT and list outputs serialized (concat_ws / array_to_string) on
# BOTH sides. DESCRIBE binds without executing, so this sweeps all
# oracles cheaply.
_CANON_HOSTILE = ("HUGEINT", "[]", "STRUCT", "MAP(")


def test_oracle_output_types_are_canon_compatible(duck):
    bad = []
    for name, sql in entrymod.oracle_sql().items():
        rows = duck.execute(f"DESCRIBE SELECT * FROM ({sql}) q").fetchall()
        for col, typ, *_ in rows:
            t = typ.upper()
            if any(h in t for h in _CANON_HOSTILE):
                bad.append((name, col, typ))
    assert not bad, f"canon-hostile oracle output columns: {bad}"


def test_spark_entry_schemas_are_canon_compatible(spark):
    """Spark half of the canon contract: no queries() entry may emit a
    top-level ArrayType/StructType/MapType column — the driver's pandas
    sort crashes on such cells. Schema-only (no collect), so this is a
    plan-construction sweep over every entry."""
    from pyspark.sql import types as T

    bad = []
    for name, fn in entrymod.queries().items():
        sdf = fn(spark, SF_CORRECT)
        for f in sdf.schema.fields:
            if isinstance(
                f.dataType, (T.ArrayType, T.StructType, T.MapType)
            ):
                bad.append((name, f.name, f.dataType.simpleString()))
    assert not bad, f"canon-hostile Spark output columns: {bad}"


def test_local_twin_canon_catches_driver_hazards():
    """Regression test of the twin itself: the pre-fix esql (HUGEINT →
    float64 vs int64, value-equal) and term_vectors (list cells) shapes
    must FAIL under scripts/check_correctness.canon — the old str()-
    based normalizer hid both, which is why local green did not predict
    driver red in r4."""
    import importlib.util
    import pathlib

    import pandas as pd
    import pytest as _pytest

    spec = importlib.util.spec_from_file_location(
        "check_correctness",
        pathlib.Path(__file__).parent.parent
        / "scripts" / "check_correctness.py",
    )
    cc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cc)

    # HUGEINT shape: same values, int64 vs float64 — kinds must differ.
    spark_side = pd.DataFrame({"s": [149174], "g": ["a"]})
    duck_side = pd.DataFrame({"s": [149174.0], "g": ["a"]})
    sk, sr = cc.canon(spark_side)
    dk, dr = cc.canon(duck_side)
    assert sk != dk  # the esql r4 failure reproduces locally now
    assert sr == dr  # ... even though the values normalize identically

    # LIST shape: pandas sort_values must crash exactly as the driver's.
    listy = pd.DataFrame({"positions": [[1, 2], [0]], "t": ["a", "b"]})
    with _pytest.raises(TypeError):
        cc.canon(listy)


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
