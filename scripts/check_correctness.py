"""Local twin of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry at sf0.01 and compare against its
``oracle_sql()`` via DuckDB.

Canonicalization deliberately mirrors the driver's pandas-based canon
(CORRECTNESS_r04 showed the old ``str(v)``-over-``fetchall()`` twin
HIDES two hazard classes the driver trips on):

- both sides go through pandas DataFrames (``duckdb .df()`` vs
  ``sdf.toPandas()``), so DuckDB dtype coercions surface — e.g. a
  HUGEINT integer-SUM output becomes float64 while Spark emits int64,
  a value-equal but hash-breaking mismatch;
- rows are sorted with ``DataFrame.sort_values`` over all columns, so
  an unhashable list/array output column crashes here exactly as it
  crashes the driver (``TypeError: unhashable type: 'list'``);
- the value comparison includes each column's dtype KIND (int vs float
  vs object/bool), the part a ``str()`` normalization erases.

Floats are rounded to 9 significant digits before comparison,
mirroring a value-hash check with float tolerance.

Usage: python scripts/check_correctness.py [name ...]
"""

from __future__ import annotations

import math
import sys
import time
import traceback

import duckdb

sys.path.insert(0, ".")

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def _dtype_kind(series) -> str:
    """Collapse pandas dtype to the kind classes the driver's hash is
    sensitive to: integer vs float vs everything-else-stringified."""
    k = series.dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "ts"
    return "obj"


def _norm_cell(v):
    if v is None:
        return "null"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if hasattr(v, "isoformat"):
        return v.isoformat().replace("+00:00", "")
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def canon(pdf):
    """Driver-style canon: columns sorted by name, rows sorted with
    pandas ``sort_values`` over every column (raises on list cells,
    like the driver), then (dtype-kinds, normalized cell tuples)."""
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    kinds = tuple(_dtype_kind(pdf[c]) for c in pdf.columns)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    return kinds, rows


def main():
    import __spark_entry__ as e
    from unichem2index_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark("check", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs, os_ = e.queries(), e.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            s_pdf = sdf.toPandas()
        except Exception:
            print(f"FAIL  {name}: SPARK ERROR")
            traceback.print_exc(limit=4)
            n_fail += 1
            continue
        if name not in os_:
            print(f"ROWS  {name}: rows={len(s_pdf)} (rows-only, no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            d_pdf = con.execute(os_[name]).df()
        except Exception as ex:
            print(f"FAIL  {name}: DUCKDB ERROR: {ex}")
            n_fail += 1
            continue
        problems = []
        if sorted(s_pdf.columns) != sorted(d_pdf.columns):
            problems.append(
                f"cols spark={list(s_pdf.columns)} duck={list(d_pdf.columns)}"
            )
        elif len(s_pdf) != len(d_pdf):
            problems.append(f"rowcount spark={len(s_pdf)} duck={len(d_pdf)}")
        else:
            try:
                s_kinds, s_rows = canon(s_pdf)
            except Exception as ex:
                problems.append(f"spark canon crash: {type(ex).__name__}: {ex}")
                s_kinds = s_rows = None
            try:
                d_kinds, d_rows = canon(d_pdf)
            except Exception as ex:
                problems.append(f"oracle canon crash: {type(ex).__name__}: {ex}")
                d_kinds = d_rows = None
            if not problems:
                if s_kinds != d_kinds:
                    cols = sorted(s_pdf.columns)
                    diff = [
                        (c, a, b)
                        for c, a, b in zip(cols, s_kinds, d_kinds)
                        if a != b
                    ]
                    problems.append(f"dtype kinds differ: {diff}")
                if s_rows != d_rows:
                    diffs = [
                        (x, y) for x, y in zip(s_rows, d_rows) if x != y
                    ][:3]
                    problems.append(f"values differ; first diffs={diffs}")
        if problems:
            print(f"FAIL  {name}: " + " | ".join(problems))
            n_fail += 1
        else:
            print(f"PASS  {name} rows={len(s_pdf)} [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
