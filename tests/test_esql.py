"""ES|QL mini-language: parser shapes, validation, and engine execution
vs hand-written DataFrame equivalents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from unichem2index_spark.functions.esql import (
    compile_spark,
    compile_sql,
    parse_esql,
)
from unichem2index_spark.sources.tables import load_tables

from tests.conftest import SF_SMOKE


def test_parse_shapes():
    st = parse_esql(
        'FROM documents | WHERE lang == "en" | STATS c = COUNT(*) BY source'
        " | SORT c DESC | LIMIT 3"
    )
    assert [s[0] for s in st] == ["from", "where", "stats", "sort", "limit"]
    assert st[0][1] == "documents"
    assert st[2][2] == [("source", None)]  # BY pairs: (name, expr|None)
    assert st[2][1][0][2] is None  # agg triples: (alias, expr, filter)
    assert st[3][1] == [("c", True)]
    assert st[4][1] == 3


def test_parse_validation():
    with pytest.raises(ValueError):
        parse_esql("WHERE x == 1")  # must start with FROM
    with pytest.raises(ValueError):
        parse_esql("FROM t | FROBNICATE x")
    with pytest.raises(ValueError):
        parse_esql("FROM t | SORT a | WHERE x == 1")  # tail must trail
    with pytest.raises(ValueError):
        parse_esql("FROM t | WHERE NOSUCHFN(x)")


def test_sql_render_is_wellformed():
    sql = compile_sql(
        parse_esql('FROM documents | WHERE lang == "en" | LIMIT 5')
    )
    assert sql.startswith("SELECT * FROM (SELECT * FROM documents)")
    assert "(lang = 'en')" in sql and sql.endswith("LIMIT 5")


def test_execution_matches_dataframe(spark):
    t = load_tables(spark, SF_SMOKE)
    got = compile_spark(
        parse_esql(
            "FROM documents | EVAL b = n_chars % 5"
            ' | WHERE lang == "en" | KEEP doc_id, b'
            " | STATS c = COUNT(*), mx = MAX(doc_id) BY b"
            " | SORT b ASC"
        ),
        t,
    ).collect()
    want = (
        t["documents"]
        .withColumn("b", F.col("n_chars") % 5)
        .where(F.col("lang") == "en")
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("c"), F.max("doc_id").alias("mx"))
        .orderBy("b")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert got and sum(r.c for r in got) > 0


def test_avg_is_exact_division(spark):
    t = load_tables(spark, SF_SMOKE)
    got = compile_spark(
        parse_esql("FROM documents | STATS a = AVG(n_chars), c = COUNT(*)"),
        t,
    ).first()
    rows = t["documents"].agg(F.sum("n_chars"), F.count(F.lit(1))).first()
    assert got.a == rows[0] / rows[1]
    assert got.c == rows[1]


def test_enrich_is_broadcast_left_join(spark):
    t = load_tables(spark, SF_SMOKE)
    df = compile_spark(
        parse_esql(
            "FROM orders"
            " | ENRICH customer ON o_custkey == c_custkey WITH c_nationkey"
            " | KEEP o_orderkey, c_nationkey"
        ),
        t,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    got = {r.o_orderkey: r.c_nationkey for r in df.collect()}
    nat = {
        r.c_custkey: r.c_nationkey for r in t["customer"].collect()
    }
    for r in t["orders"].limit(50).collect():
        assert got[r.o_orderkey] == nat.get(r.o_custkey)
    with pytest.raises(ValueError):
        parse_esql("FROM orders | ENRICH customer WITH c_name")  # no ON


def test_query_string_wand_routes_and_matches(spark):
    """Flat shapes serve via the kernel and match the corpus path;
    nested/phrase shapes raise (the corpus-path routing contract)."""
    import __spark_entry__ as entry
    from unichem2index_spark.operators import query as Q

    idx = entry._index_for(spark, SF_SMOKE)
    t = load_tables(spark, SF_SMOKE)
    docs = t["documents"]
    for qs in ["merge OR group OR vector", "merge AND group",
               "merge AND group AND NOT vector"]:
        kern = [
            (r.doc_id, r.score)
            for r in Q.query_string_topk_wand(spark, idx, qs, 10).collect()
        ]
        corpus = [
            (r.doc_id, r.score)
            for r in Q.query_string_topk(spark, docs, qs, 10).collect()
        ]
        assert kern == corpus, qs
    for bad in ['(a AND b) OR c', '"x y" AND z', "NOT a"]:
        with pytest.raises(ValueError):
            Q.query_string_topk_wand(spark, idx, bad, 10)


def test_dissect_extracts_holes(spark):
    t = load_tables(spark, SF_SMOKE)
    df = compile_spark(
        parse_esql(
            "FROM events | DISSECT props '{\"k\": %{kval}}'"
            " | KEEP event_id, kval | LIMIT 5"
        ),
        t,
    )
    rows = df.collect()
    assert rows
    raw = {r.event_id: r.props for r in t["events"].limit(100).collect()}
    import json

    for r in rows:
        assert r.kval == str(json.loads(raw[r.event_id])["k"])
    with pytest.raises(ValueError):
        parse_esql("FROM events | DISSECT props 'no holes here'")


def test_contains_term_uses_analyzer(spark):
    t = load_tables(spark, SF_SMOKE)
    rows = compile_spark(
        parse_esql(
            'FROM documents | WHERE CONTAINS_TERM(text, "merge")'
            " | KEEP doc_id | LIMIT 1000"
        ),
        t,
    ).collect()
    assert rows
    import re as _re

    got = {r.doc_id for r in rows}
    want = {
        r.doc_id
        for r in t["documents"].collect()
        if "merge" in _re.findall(r"[a-z0-9]+", r.text.lower())
    }
    assert got == want


def test_inlinestats_window_semantics(spark):
    t = load_tables(spark, SF_SMOKE)
    rows = compile_spark(
        parse_esql(
            "FROM documents"
            " | INLINESTATS lang_max = MAX(n_chars), a = AVG(n_chars) BY lang"
            " | KEEP doc_id, lang, n_chars, lang_max, a"
        ),
        t,
    ).collect()
    assert len(rows) == t["documents"].count()  # rows never collapse
    by_lang: dict = {}
    for r in t["documents"].collect():
        by_lang.setdefault(r.lang, []).append(r.n_chars)
    for r in rows[:50]:
        assert r.lang_max == max(by_lang[r.lang])
        assert r.a == sum(by_lang[r.lang]) / len(by_lang[r.lang])
    with pytest.raises(ValueError):
        # non-aggregate expressions are rejected at compile time
        compile_spark(
            parse_esql("FROM documents | INLINESTATS x = n_chars + 1 BY lang"),
            t,
        )


def test_drop_rename_both_engines(spark):
    import duckdb as _duck

    t = load_tables(spark, SF_SMOKE)
    q = (
        "FROM documents | DROP text, n_chars | RENAME lang AS language"
        " | STATS c = COUNT(*) BY language | SORT language ASC | LIMIT 5"
    )
    stages = parse_esql(q)
    got = [(r.language, r.c) for r in compile_spark(stages, t).collect()]
    con = _duck.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_SMOKE}/documents.parquet'"
    )
    want = con.execute(compile_sql(stages)).fetchall()
    con.close()
    assert got == [(l, int(c)) for l, c in want]
    with pytest.raises(ValueError):
        parse_esql("FROM t | RENAME lang language")  # missing AS


def test_like_and_in_both_engines(spark):
    import duckdb as _duck

    t = load_tables(spark, SF_SMOKE)
    q = (
        'FROM documents | WHERE source LIKE "src1*" OR lang IN ("en", "de")'
        " | STATS c = COUNT(*) BY source | SORT source ASC | LIMIT 25"
    )
    stages = parse_esql(q)
    got = [(r.source, r.c) for r in compile_spark(stages, t).collect()]
    con = _duck.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_SMOKE}/documents.parquet'"
    )
    want = [(s_, int(c)) for s_, c in con.execute(compile_sql(stages)).fetchall()]
    con.close()
    assert got == want and got
    # src1* matches src1 and src10..src19
    assert {s_ for s_, _ in got} >= {"src1", "src10", "src19"}
    with pytest.raises(ValueError):
        parse_esql('FROM t | WHERE source LIKE "a%b"')


def test_lookup_join_both_engines(spark):
    import duckdb as _duck

    t = load_tables(spark, SF_SMOKE)
    q = (
        "FROM orders | RENAME o_custkey AS c_custkey"
        " | LOOKUP JOIN customer ON c_custkey"
        ' | WHERE c_mktsegment == "BUILDING"'
        " | STATS n = COUNT(*) BY c_nationkey"
        " | SORT c_nationkey ASC | LIMIT 30"
    )
    stages = parse_esql(q)
    got = [(r.c_nationkey, r.n) for r in compile_spark(stages, t).collect()]
    con = _duck.connect()
    for tbl in ("orders", "customer"):
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM '{SF_SMOKE}/{tbl}.parquet'"
        )
    want = [(k, int(n)) for k, n in con.execute(compile_sql(stages)).fetchall()]
    con.close()
    assert got == want and got
    # manual recompute: join semantics are plain left-equi + filter
    o = t["orders"].collect()
    c = {r.c_custkey: r for r in t["customer"].collect()}
    cnt: dict = {}
    for r in o:
        cr = c.get(r.o_custkey)
        if cr is not None and cr.c_mktsegment == "BUILDING":
            cnt[cr.c_nationkey] = cnt.get(cr.c_nationkey, 0) + 1
    assert got == sorted(cnt.items())[:30]
    with pytest.raises(ValueError):
        parse_esql("FROM t | LOOKUP customer ON k")  # missing JOIN


def test_mv_expand_and_split_both_engines(spark):
    import duckdb as _duck

    t = load_tables(spark, SF_SMOKE)
    q = (
        "FROM documents | WHERE doc_id < 40"
        ' | EVAL tok = SPLIT(text, " ") | MV_EXPAND tok'
        " | STATS n = COUNT(*) BY tok | SORT n DESC, tok ASC | LIMIT 10"
    )
    stages = parse_esql(q)
    got = [(r.tok, r.n) for r in compile_spark(stages, t).collect()]
    con = _duck.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_SMOKE}/documents.parquet'"
    )
    want = [(s_, int(n)) for s_, n in con.execute(compile_sql(stages)).fetchall()]
    con.close()
    assert got == want and got
    # manual recompute: literal-space split, one row per token
    from collections import Counter

    cnt = Counter()
    for r in t["documents"].where("doc_id < 40").collect():
        cnt.update(r.text.split(" "))
    assert got == sorted(
        cnt.items(), key=lambda kv: (-kv[1], kv[0])
    )[:10]
    with pytest.raises(ValueError):
        # non-literal delimiter rejected at compile time (both renders)
        compile_sql(parse_esql("FROM t | EVAL x = SPLIT(text, lang)"))
    with pytest.raises(ValueError):
        parse_esql("FROM t | MV_EXPAND a b")


def test_stats_where_conditional_agg(spark):
    """Per-agg WHERE (8.16) == conditional aggregation: filtered counts
    equal separately-run filtered queries; Spark matches DuckDB."""
    import duckdb as _duck

    t = load_tables(spark, SF_SMOKE)
    q = (
        "FROM events"
        ' | STATS e = COUNT(*) WHERE event_type == "error",'
        "         n = COUNT(*), mx = MAX(value) WHERE value < 50.0"
        "   BY ub = user_id % 3"
        " | SORT ub ASC"
    )
    stages = parse_esql(q)
    got = [(r.ub, r.e, r.n, r.mx) for r in compile_spark(stages, t).collect()]
    con = _duck.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_SMOKE}/events.parquet'"
    )
    want = [
        (int(a), int(b), int(c), float(d))
        for a, b, c, d in con.execute(compile_sql(stages)).fetchall()
    ]
    con.close()
    assert got == want and len(got) == 3
    # manual recompute of one group from the raw rows
    rows = t["events"].where("user_id % 3 = 0").collect()
    assert got[0][1] == sum(1 for r in rows if r.event_type == "error")
    assert got[0][2] == len(rows)
    assert got[0][3] == max(r.value for r in rows if r.value < 50.0)
    with pytest.raises(ValueError):
        # the filter must hang off an aggregate call
        compile_sql(parse_esql("FROM t | STATS a = b WHERE c == 1"))


def test_bucket_and_by_expression(spark):
    """BY alias = BUCKET(ts, 1 day) groups by the day truncation on
    both engines; bad spans/items are rejected at parse time."""
    t = load_tables(spark, SF_SMOKE)
    q = (
        "FROM events | STATS n = COUNT(*) BY d = BUCKET(ts, 1 day)"
        " | SORT d ASC | LIMIT 5"
    )
    got = compile_spark(parse_esql(q), t).collect()
    want = (
        t["events"]
        .groupBy(F.date_trunc("day", "ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("d")
        .limit(5)
        .collect()
    )
    assert [(r.d, r.n) for r in got] == [(r.d, r.n) for r in want]
    with pytest.raises(ValueError):
        parse_esql("FROM t | STATS n = COUNT(*) BY d = BUCKET(ts, 3 hours)")
    with pytest.raises(ValueError):
        parse_esql("FROM t | STATS n = COUNT(*) BY a == b")


def test_case_and_grok(spark):
    """CASE chains WHEN (first matching arm wins, default otherwise);
    GROK expands the shared pattern library unanchored."""
    t = load_tables(spark, SF_SMOKE)
    rows = compile_spark(
        parse_esql(
            "FROM events"
            ' | EVAL band = CASE(value < 25.0, "low", value < 75.0,'
            ' "mid", "high")'
            " | KEEP value, band | SORT value ASC | LIMIT 2000"
        ),
        t,
    ).collect()
    assert rows
    for r in rows:
        want = "low" if r.value < 25 else ("mid" if r.value < 75 else "high")
        assert r.band == want
    with pytest.raises(ValueError):
        compile_sql(parse_esql('FROM t | EVAL b = CASE(a < 1.0, "x")'))
    grokked = compile_spark(
        parse_esql(
            "FROM events | GROK props '\"k\": %{INT:kval}'"
            " | KEEP props, kval | LIMIT 50"
        ),
        t,
    ).collect()
    assert grokked
    for r in grokked:
        assert r.props == '{"k": %s}' % r.kval
    with pytest.raises(ValueError):
        parse_esql("FROM t | GROK props '%{NOPE:x}'")
    with pytest.raises(ValueError):
        parse_esql("FROM t | GROK props 'no captures here'")


def test_row_source_both_engines(spark):
    """ROW: a literal one-row table; SPLIT/MV_EXPAND/STATS run on it
    identically on both engines; empty ROW rejected."""
    import duckdb as _duck

    q = (
        'ROW s = "a b a", n = 3 | EVAL t = SPLIT(s, " ") | MV_EXPAND t'
        " | STATS c = COUNT(*), mx = MAX(n) BY t | SORT t ASC"
    )
    stages = parse_esql(q)
    got = [(r.t, r.c, r.mx) for r in compile_spark(stages, {}).collect()]
    assert got == [("a", 2, 3), ("b", 1, 3)]
    want = [
        (t, int(c), int(m))
        for t, c, m in _duck.sql(compile_sql(stages)).fetchall()
    ]
    assert got == want
    with pytest.raises(ValueError):
        parse_esql("ROW | LIMIT 1")
    with pytest.raises(ValueError):
        parse_esql("SHOW tables")


def test_change_point_command_matches_agg(spark):
    """The CHANGE_POINT pipe command over a BUCKET'd STATS series ==
    textstats.change_point_agg row for row; bad clause rejected."""
    from unichem2index_spark.operators import textstats

    t = load_tables(spark, SF_SMOKE)
    got = [
        tuple(r)
        for r in compile_spark(
            parse_esql(
                "FROM events"
                " | STATS n = COUNT(*) BY day = BUCKET(ts, 1 day), event_type"
                " | CHANGE_POINT n ON day BY event_type"
                " | SORT event_type ASC"
            ),
            t,
        ).collect()
    ]
    want = [
        (r.event_type, r.change_bucket, r.stat, r.mean_before, r.mean_after)
        for r in textstats.change_point_agg(spark, t).collect()
    ]
    assert got == want and got
    with pytest.raises(ValueError):
        parse_esql("FROM t | CHANGE_POINT n day")
    # keyless form: one global change point row
    one = compile_spark(
        parse_esql(
            "FROM events | STATS n = COUNT(*) BY day = BUCKET(ts, 1 day)"
            " | CHANGE_POINT n ON day"
        ),
        t,
    ).collect()
    assert len(one) == 1 and one[0].stat > 0


def test_median_percentile_count_distinct(spark):
    """Exact interpolated median/percentile (numpy-checked) and exact
    count_distinct; order-statistic aggs rejected in INLINESTATS."""
    import numpy as np

    t = load_tables(spark, SF_SMOKE)
    got = {
        r.lang: r
        for r in compile_spark(
            parse_esql(
                "FROM documents"
                " | STATS med = MEDIAN(n_chars),"
                "         p90 = ROUND(PERCENTILE(n_chars, 0.9), 6),"
                "         nsrc = COUNT_DISTINCT(source) BY lang"
            ),
            t,
        ).collect()
    }
    per: dict = {}
    for r in t["documents"].collect():
        per.setdefault(r.lang, []).append(r)
    assert set(got) == set(per)
    for lang, rows in per.items():
        xs = np.array(sorted(r.n_chars for r in rows), dtype=float)
        assert got[lang].med == np.quantile(xs, 0.5)
        assert abs(got[lang].p90 - np.quantile(xs, 0.9)) < 1e-6
        assert got[lang].nsrc == len({r.source for r in rows})
    with pytest.raises(ValueError):
        compile_spark(
            parse_esql(
                "FROM documents | INLINESTATS m = MEDIAN(n_chars) BY lang"
            ),
            t,
        )
    with pytest.raises(ValueError):
        # non-literal p is a render-time error (both renders raise)
        compile_sql(parse_esql("FROM t | STATS p = PERCENTILE(x, y)"))


def test_mv_functions_both_engines(spark):
    """MV_COUNT/MV_MIN/MV_MAX over a SPLIT column: exact per-row size
    and lexicographic extremes."""
    t = load_tables(spark, SF_SMOKE)
    rows = compile_spark(
        parse_esql(
            "FROM documents | WHERE doc_id < 30"
            ' | EVAL t = SPLIT(text, " ")'
            " | EVAL n = MV_COUNT(t), lo = MV_MIN(t), hi = MV_MAX(t)"
            " | KEEP doc_id, n, lo, hi"
        ),
        t,
    ).collect()
    raw = {r.doc_id: r.text for r in t["documents"].where("doc_id < 30").collect()}
    assert rows and len(rows) == len(raw)
    for r in rows:
        parts = raw[r.doc_id].split(" ")
        assert (r.n, r.lo, r.hi) == (len(parts), min(parts), max(parts))


def test_string_fns_both_engines(spark):
    """String scalar family: recompute per row in Python."""
    t = load_tables(spark, SF_SMOKE)
    rows = compile_spark(
        parse_esql(
            "FROM documents | WHERE doc_id < 25"
            ' | EVAL a = CONCAT(lang, "_", TO_UPPER(source)),'
            " b = SUBSTRING(text, 3, 5), c = LEFT(text, 4),"
            ' d = RIGHT(text, 6), e = STARTS_WITH(source, "src1"),'
            ' f = ENDS_WITH(lang, "n"), g = REPLACE(LEFT(text, 10), " ", "-"),'
            ' h = TRIM(CONCAT(" ", lang, " ")), i = TO_LOWER(TO_UPPER(lang))'
            " | KEEP doc_id, a, b, c, d, e, f, g, h, i"
        ),
        t,
    ).collect()
    raw = {r.doc_id: r for r in t["documents"].where("doc_id < 25").collect()}
    assert len(rows) == len(raw)
    for r in rows:
        s = raw[r.doc_id]
        assert r.a == f"{s.lang}_{s.source.upper()}"
        assert r.b == s.text[2:7]
        assert r.c == s.text[:4]
        assert r.d == s.text[-6:]
        assert r.e == s.source.startswith("src1")
        assert r.f == s.lang.endswith("n")
        assert r.g == s.text[:10].replace(" ", "-")
        assert r.h == s.lang
        assert r.i == s.lang


def test_string_fns_validation():
    with pytest.raises(ValueError):
        # zero-start SUBSTRING rejected (engine semantics differ)
        compile_sql(parse_esql("FROM t | EVAL x = SUBSTRING(s, 0, 3)"))
    with pytest.raises(ValueError):
        parse_esql("FROM t | EVAL x = LOCATE(s, 'a')")  # unknown fn
    with pytest.raises(ValueError):
        # REPLACE pattern must be literal on the SQL render
        compile_sql(parse_esql("FROM t | EVAL x = REPLACE(s, p, 'y')"))
    with pytest.raises(ValueError):
        compile_sql(parse_esql("FROM t | EVAL x = LEFT(s, n)"))


def test_top_values_aggs(spark):
    """TOP slices after a full sort; VALUES is the sorted distinct set —
    both serialized."""
    t = load_tables(spark, SF_SMOKE)
    rows = compile_spark(
        parse_esql(
            "FROM documents"
            ' | STATS t3 = TOP(n_chars, 3, "desc"),'
            ' ta = TOP(n_chars, 2, "asc"), v = VALUES(lang) BY source'
        ),
        t,
    ).collect()
    per: dict = {}
    for r in load_tables(spark, SF_SMOKE)["documents"].collect():
        per.setdefault(r.source, []).append((r.n_chars, r.lang))
    assert len(rows) == len(per)
    for r in rows:
        chars = sorted(c for c, _ in per[r.source])
        assert r.t3 == ",".join(str(c) for c in sorted(chars, reverse=True)[:3])
        assert r.ta == ",".join(str(c) for c in chars[:2])
        assert r.v == ",".join(sorted({l for _, l in per[r.source]}))


def test_top_values_validation():
    with pytest.raises(ValueError):
        compile_sql(parse_esql('FROM t | STATS x = TOP(a, 0, "desc")'))
    with pytest.raises(ValueError):
        compile_sql(parse_esql('FROM t | STATS x = TOP(a, 2, "sideways")'))
    with pytest.raises(ValueError):
        # per-agg WHERE composes with scalar aggs only
        compile_sql(parse_esql('FROM t | STATS x = VALUES(a) WHERE b > 1'))
    with pytest.raises(ValueError):
        compile_sql(parse_esql("FROM t | INLINESTATS x = VALUES(a) BY b"))


def test_date_fns_both_engines(spark):
    """DATE_TRUNC/DATE_EXTRACT/DATE_FORMAT recompute per row."""
    t = load_tables(spark, SF_SMOKE)
    rows = compile_spark(
        parse_esql(
            "FROM events | WHERE event_id < 40"
            " | EVAL day = DATE_TRUNC(1 day, ts),"
            ' y = DATE_EXTRACT("year", ts), d = DATE_EXTRACT("day", ts),'
            ' mi = DATE_EXTRACT("minute", ts),'
            ' f = DATE_FORMAT("yyyy-MM", ts)'
            " | KEEP event_id, day, y, d, mi, f"
        ),
        t,
    ).collect()
    raw = {r.event_id: r.ts for r in
           t["events"].where("event_id < 40").collect()}
    assert rows and len(rows) == len(raw)
    for r in rows:
        ts = raw[r.event_id]
        assert r.day == ts.replace(hour=0, minute=0, second=0, microsecond=0)
        assert (r.y, r.d, r.mi) == (ts.year, ts.day, ts.minute)
        assert r.f == ts.strftime("%Y-%m")


def test_date_fns_validation():
    with pytest.raises(ValueError):
        # dayofweek deliberately unsupported (engine week-start clash)
        compile_sql(parse_esql('FROM t | EVAL x = DATE_EXTRACT("dayofweek", ts)'))
    with pytest.raises(ValueError):
        compile_sql(parse_esql('FROM t | EVAL x = DATE_FORMAT("EEE dd", ts)'))
    with pytest.raises(ValueError):
        parse_esql("FROM t | EVAL x = DATE_TRUNC(3 hours, ts)")


def test_null_predicates_lookup_misses(spark):
    """IS NULL/IS NOT NULL: lookup misses are null; the two conditional
    counts tile each group."""
    t = load_tables(spark, SF_SMOKE)
    rows = compile_spark(
        parse_esql(
            "FROM documents | EVAL n_nationkey = doc_id % 30"
            " | LOOKUP JOIN nation ON n_nationkey"
            " | STATS missing = COUNT(*) WHERE n_name IS NULL,"
            " matched = COUNT(*) WHERE n_name IS NOT NULL BY n_nationkey"
            " | SORT n_nationkey ASC"
        ),
        t,
    ).collect()
    per: dict = {}
    for r in t["documents"].collect():
        per[r.doc_id % 30] = per.get(r.doc_id % 30, 0) + 1
    assert {r.n_nationkey for r in rows} == set(per)
    for r in rows:
        assert r.missing + r.matched == per[r.n_nationkey]
        if r.n_nationkey < 25:
            assert r.missing == 0 and r.matched > 0
        else:
            assert r.matched == 0 and r.missing > 0
    with pytest.raises(ValueError):
        parse_esql("FROM t | WHERE x IS")  # dangling IS


def test_sort_null_order_is_es_contract(spark):
    """ES|QL: null sorts as LARGER than any value — asc puts lookup
    misses last, desc puts them first, identically on both engines."""
    import duckdb as _duck

    t = load_tables(spark, SF_SMOKE)
    q_asc = (
        "FROM documents | WHERE doc_id < 60"
        " | EVAL n_nationkey = doc_id % 30"
        " | LOOKUP JOIN nation ON n_nationkey"
        " | KEEP doc_id, n_name | SORT n_name ASC, doc_id ASC"
    )
    q_desc = q_asc.replace("SORT n_name ASC", "SORT n_name DESC")
    con = _duck.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_SMOKE}/documents.parquet'"
    )
    con.execute(
        f"CREATE VIEW nation AS SELECT * FROM '{SF_SMOKE}/nation.parquet'"
    )
    for q, nulls_at_end in ((q_asc, True), (q_desc, False)):
        stages = parse_esql(q)
        got = [(r.doc_id, r.n_name) for r in compile_spark(stages, t).collect()]
        want = con.execute(compile_sql(stages)).fetchall()
        assert got == want, q
        null_idx = [i for i, (_, n) in enumerate(got) if n is None]
        assert null_idx, "need lookup misses in the slice"
        if nulls_at_end:
            assert min(null_idx) == len(got) - len(null_idx)
        else:
            assert max(null_idx) == len(null_idx) - 1
    con.close()


def test_sample_deterministic_hash_bucket(spark):
    """SAMPLE keeps exactly the rows whose doc_id hash bucket is 0 —
    recomputed in Python — and is parallelism-invariant."""
    from unichem2index_spark.functions.hashing import FP_MULT, MOD

    t = load_tables(spark, SF_SMOKE)
    st = parse_esql("FROM documents | SAMPLE 0.25 | KEEP doc_id")
    got = sorted(r.doc_id for r in compile_spark(st, t).collect())
    want = sorted(
        r.doc_id
        for r in t["documents"].select("doc_id").collect()
        if ((r.doc_id % MOD + 1) * FP_MULT) % MOD % 4 == 0
    )
    assert got == want and 0 < len(got) < t["documents"].count()
    # repartitioned input keeps the identical sample
    t2 = dict(t)
    t2["documents"] = t["documents"].repartition(7)
    got2 = sorted(r.doc_id for r in compile_spark(st, t2).collect())
    assert got2 == want


def test_sample_validation():
    with pytest.raises(ValueError, match="0 < p < 1"):
        parse_esql("FROM documents | SAMPLE 1.5")
    with pytest.raises(ValueError, match="1/k"):
        parse_esql("FROM documents | SAMPLE 0.3")
    # SAMPLE after LIMIT violates the trailing-commands contract
    with pytest.raises(ValueError, match="trailing"):
        parse_esql("FROM documents | LIMIT 5 | SAMPLE 0.25")


def test_sample_both_engines(spark, duck):
    """Dual render agrees engine-to-engine on the sampled aggregate."""
    st = parse_esql(
        "FROM documents | SAMPLE 0.5"
        " | STATS n = COUNT(*) BY lang | SORT lang ASC"
    )
    t = load_tables(spark, "/root/testdata/sf0.01")
    got = [(r.lang, r.n) for r in compile_spark(st, t).collect()]
    want = [tuple(r) for r in duck.execute(compile_sql(st)).fetchall()]
    assert got == want


def test_fork_parse_and_validation():
    st = parse_esql(
        "FROM documents | FORK (WHERE n_chars > 10) (LIMIT 3)"
        " | SORT _fork ASC"
    )
    assert [s[0] for s in st] == ["from", "fork", "sort"]
    assert len(st[1][1]) == 2
    assert st[1][1][0][0][0] == "where"
    assert st[1][1][1][0][0] == "limit"
    with pytest.raises(ValueError, match=">= 2"):
        parse_esql("FROM documents | FORK (WHERE n_chars > 10)")
    with pytest.raises(ValueError, match="nested"):
        parse_esql(
            "FROM t | FORK (FORK (LIMIT 1) (LIMIT 2)) (LIMIT 3)"
        )
    with pytest.raises(ValueError, match="trailing"):
        # tail check applies INSIDE a branch too
        parse_esql("FROM t | FORK (LIMIT 3 | WHERE x == 1) (LIMIT 2)")


def test_fork_union_semantics(spark):
    """Rows land in every branch they match, tagged fork1/fork2, and
    branch evals survive the union."""
    t = load_tables(spark, SF_SMOKE)
    st = parse_esql(
        "FROM documents"
        " | FORK (WHERE n_chars > 300 | EVAL sel = 'long')"
        "        (WHERE lang == 'en' | EVAL sel = 'english')"
        " | STATS n = COUNT(*) BY _fork, sel | SORT _fork ASC"
    )
    rows = compile_spark(st, t).collect()
    docs = t["documents"].collect()
    want1 = sum(1 for r in docs if r.n_chars > 300)
    want2 = sum(1 for r in docs if r.lang == "en")
    got = {(r._fork, r.sel): r.n for r in rows}
    assert got == {("fork1", "long"): want1, ("fork2", "english"): want2}


def test_fork_both_engines(spark, duck):
    st = parse_esql(
        "FROM documents"
        " | FORK (WHERE n_chars > 300) (WHERE lang == 'en')"
        " | STATS n = COUNT(*), chars = SUM(n_chars) BY _fork, lang"
        " | SORT _fork ASC, lang ASC"
    )
    t = load_tables(spark, "/root/testdata/sf0.01")
    got = [(r._fork, r.lang, r.n, r.chars)
           for r in compile_spark(st, t).collect()]
    want = [tuple(r) for r in duck.execute(compile_sql(st)).fetchall()]
    assert got == want


def test_categorize_grouping(spark, duck):
    """CATEGORIZE as a STATS BY expression matches the prefix-skeleton
    recompute and the DuckDB render."""
    from unichem2index_spark.functions.tokenize import tokenize

    t = load_tables(spark, SF_SMOKE)
    st = parse_esql(
        "FROM documents | STATS n = COUNT(*) BY cat = CATEGORIZE(text)"
        " | SORT n DESC, cat ASC | LIMIT 5"
    )
    rows = [(r.cat, r.n) for r in compile_spark(st, t).collect()]
    from collections import Counter

    c = Counter()
    for r in t["documents"].collect():
        toks = tokenize(r.text)[:2]
        c[" ".join("*" if any(ch.isdigit() for ch in x) else x
                   for x in toks)] += 1
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert rows == want
