"""as-of join + EQL sequence: brute-force recompute oracles."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from unichem2index_spark.operators import eventseq
from unichem2index_spark.sources.tables import load_tables

from tests.conftest import SF_SMOKE


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_asof_join_brute(spark):
    left = spark.createDataFrame(
        [(1, _ts(5), "l1"), (1, _ts(10), "l2"), (2, _ts(3), "l3"),
         (3, _ts(1), "l4")],
        "k long, ts timestamp, lv string",
    )
    right = spark.createDataFrame(
        [(1, _ts(4), 40.0), (1, _ts(9), 90.0), (1, _ts(10), 100.0),
         (2, _ts(3), 30.0)],
        "k long, ts timestamp, rv double",
    )
    got = {
        (r.k, r.lv): (r.asof_rv, r.asof_ts)
        for r in eventseq.asof_join(left, right, "k", "ts", ["rv"]).collect()
    }
    # <= semantics: equal-ts right matches; key 3 has no right -> NULL.
    assert got[(1, "l1")][0] == 40.0
    assert got[(1, "l2")][0] == 100.0  # ts(10) right matches at equal ts
    assert got[(2, "l3")][0] == 30.0
    assert got[(3, "l4")][0] is None

    strict = {
        (r.k, r.lv): r.asof_rv
        for r in eventseq.asof_join(
            left, right, "k", "ts", ["rv"], strict=True
        ).collect()
    }
    assert strict[(1, "l2")] == 90.0  # equal-ts right excluded
    assert strict[(2, "l3")] is None


def test_eql_sequence_recompute(spark):
    t = load_tables(spark, SF_SMOKE)
    got = eventseq.eql_sequence(
        spark, t, first="click", then="purchase", within_sec=7200.0
    ).collect()
    assert got
    ev = sorted(
        t["events"]
        .where(F.col("event_type").isin(["click", "purchase"]))
        .collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    want = []
    last_click: dict = {}
    for r in ev:
        if r.event_type == "click":
            last_click[r.user_id] = r
        elif r.user_id in last_click:
            c = last_click[r.user_id]
            gap = (r.ts - c.ts).total_seconds()
            if gap <= 7200.0:
                want.append((r.user_id, c.event_id, r.event_id))
    assert [(g.user_id, g.first_event_id, g.second_event_id) for g in got] == sorted(
        want, key=lambda x: x[2]
    )
    for g in got:
        assert 0 <= g.gap_sec <= 7200.0


def test_regexp_expansion_is_anchored(spark):
    """Lucene regexp queries are full-match: 'm.*e' must expand to terms
    fully matching, never substring hits (e.g. NOT 'small' for 'm.*l')."""
    import __spark_entry__ as entry
    from unichem2index_spark.operators import query as Q

    idx = entry._index_for(spark, SF_SMOKE)
    terms = Q.expand_regexp(spark, idx, "m.*e|s..w")
    assert terms == ["merge", "slow"]
    # unanchored substring would match 'small' for 'mal'; anchored must not
    assert Q.expand_regexp(spark, idx, "mal") == []
    rows = Q.bm25_topk_regexp(spark, idx, "m.*e|s..w", 10).collect()
    assert rows
    wand = Q.bm25_topk_wand(spark, idx, ["merge", "slow"], 10).collect()
    assert [(r.doc_id, r.score) for r in rows] == [
        (r.doc_id, r.score) for r in wand
    ]


def test_multi_terms_ranks_composite_buckets(spark):
    from unichem2index_spark.operators import textstats

    t = load_tables(spark, SF_SMOKE)
    rows = textstats.multi_terms_agg(spark, t, size=10).collect()
    assert rows
    exact = {
        (r.lang, r.source): r.c
        for r in t["documents"]
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    for r in rows:
        assert exact[(r.lang, r.source)] == r.doc_count
    keys = [(-r.doc_count, r.lang, r.source) for r in rows]
    assert keys == sorted(keys)


def test_sessionize_gaps_and_islands_recompute(spark):
    t = load_tables(spark, SF_SMOKE)
    rows = eventseq.sessionize(spark, t, gap_sec=1800).collect()
    assert rows
    ev: dict = {}
    for r in t["events"].collect():
        ev.setdefault(r.user_id, []).append(r.ts)
    for u in ev:
        ev[u].sort()
    want = []
    for u, tss in sorted(ev.items()):
        sessions = [[tss[0]]]
        for prev, cur in zip(tss, tss[1:]):
            if (cur - prev).total_seconds() >= 1800:
                sessions.append([cur])
            else:
                sessions[-1].append(cur)
        for i, s_ in enumerate(sessions, 1):
            want.append((u, i, len(s_), s_[0], s_[-1]))
    got = [
        (r.user_id, r.session_seq, r.n_events, r.start_ts, r.end_ts)
        for r in rows
    ]
    assert got == want
    # durations are non-negative, exact microsecond math
    for r in rows:
        assert r.duration_sec >= 0
        assert abs(
            r.duration_sec - (r.end_ts - r.start_ts).total_seconds()
        ) < 1e-6


def test_cosine_radius_threshold_and_consistency(spark):
    from unichem2index_spark.operators import similarity

    t = load_tables(spark, SF_SMOKE)
    rows = similarity.cosine_radius(spark, t, min_cosine=0.35).collect()
    assert rows  # the threshold genuinely matches something
    assert all(r.cosine >= 0.35 for r in rows)
    # radius ⊇ any topk page restricted to the threshold
    top = similarity.cosine_topk_bruteforce(spark, t, k=10).collect()
    radius_set = {(r.query_id, r.vec_id) for r in rows}
    for r in top:
        if r.cosine >= 0.35:
            assert (r.query_id, r.vec_id) in radius_set


def test_funnel_monotone_and_recompute(spark):
    t = load_tables(spark, SF_SMOKE)
    rows = eventseq.funnel(spark, t).collect()
    assert [r.step for r in rows] == [1, 2, 3]
    n1, n2, n3 = (r.n_users for r in rows)
    assert n1 >= n2 >= n3 >= 0 and n1 > 0
    # brute-force recompute
    ev: dict = {}
    for r in t["events"].collect():
        ev.setdefault(r.user_id, []).append((r.ts, r.event_type))
    c1 = c2 = c3 = 0
    for u, es in ev.items():
        es.sort()
        v = next((ts for ts, et in es if et == "view"), None)
        if v is None:
            continue
        c1 += 1
        c = next((ts for ts, et in es if et == "click" and ts >= v), None)
        if c is None:
            continue
        c2 += 1
        if any(et == "purchase" and ts >= c for ts, et in es):
            c3 += 1
    assert (n1, n2, n3) == (c1, c2, c3)


def test_retention_cohort_recompute(spark):
    t = load_tables(spark, SF_SMOKE)
    rows = eventseq.retention_cohort(spark, t).collect()
    assert rows
    # brute-force recompute
    days: dict = {}
    for r in t["events"].collect():
        days.setdefault(r.user_id, set()).add(r.ts.date())
    first = {u: min(ds) for u, ds in days.items()}
    exp: dict = {}
    for u, ds in days.items():
        for d in ds:
            key = (first[u], (d - first[u]).days)
            exp[key] = exp.get(key, 0) + 1
    cohort_size = {c: n for (c, off), n in exp.items() if off == 0}
    got = {(r.cohort_day.date(), r.offset_days): r.n_active for r in rows}
    assert got == exp
    for r in rows:
        c = r.cohort_day.date()
        assert r.cohort_size == cohort_size[c]
        assert r.retention == round(r.n_active / cohort_size[c], 6)
        # day-0 row is the full cohort
        if r.offset_days == 0:
            assert r.retention == 1.0
        assert 0.0 < r.retention <= 1.0


def test_frequent_item_sets_recompute(spark):
    t = load_tables(spark, SF_SMOKE)
    rows = eventseq.frequent_item_sets(spark, t).collect()
    # brute-force recompute over (user, day) baskets
    baskets: dict = {}
    for r in t["events"].collect():
        baskets.setdefault((r.user_id, r.ts.date()), set()).add(r.event_type)
    n_total = len(baskets)
    from itertools import combinations

    cnt: dict = {}
    for items in baskets.values():
        for a, b in combinations(sorted(items), 2):
            cnt[(a, b)] = cnt.get((a, b), 0) + 1
    exp = {
        p: n
        for p, n in cnt.items()
        if n * eventseq.FIS_SUPPORT_DEN >= n_total * eventseq.FIS_SUPPORT_NUM
    }
    got = {(r.item_a, r.item_b): r.n_baskets for r in rows}
    assert got == exp
    for r in rows:
        assert r.item_a < r.item_b
        assert r.support == round(r.n_baskets / n_total, 6)


def test_eql_sequence_until_kill_guard(spark):
    """UNTIL kills pending sequences: brute-force recompute; an absent
    until type degenerates to plain eql_sequence."""
    t = load_tables(spark, SF_SMOKE)
    got = eventseq.eql_sequence_until(
        spark, t, first="click", then="purchase", until="error",
        within_sec=7200.0,
    ).collect()
    assert got
    ev = sorted(
        t["events"]
        .where(F.col("event_type").isin(["click", "purchase", "error"]))
        .collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    want = []
    last_click: dict = {}
    last_err: dict = {}
    for r in ev:
        if r.event_type == "click":
            last_click[r.user_id] = r
        elif r.event_type == "error":
            last_err[r.user_id] = r
        elif r.user_id in last_click:
            c = last_click[r.user_id]
            u = last_err.get(r.user_id)
            gap = (r.ts - c.ts).total_seconds()
            killed = u is not None and (u.ts, u.event_id) > (c.ts, c.event_id)
            if gap <= 7200.0 and not killed:
                want.append((r.user_id, c.event_id, r.event_id))
    assert [
        (g.user_id, g.first_event_id, g.second_event_id) for g in got
    ] == sorted(want, key=lambda x: x[2])
    # the until guard only removes pairs, never adds
    plain = {
        (g.user_id, g.first_event_id, g.second_event_id)
        for g in eventseq.eql_sequence(spark, t).collect()
    }
    assert set(
        (g.user_id, g.first_event_id, g.second_event_id) for g in got
    ) <= plain
    # synthetic frame where the guard provably kills: click(1) ->
    # error(2) -> purchase(3) dies; click(4) -> purchase(5) survives
    syn = spark.createDataFrame(
        [
            (1, _ts(1), 9, "click", 0.0, ""),
            (2, _ts(2), 9, "error", 0.0, ""),
            (3, _ts(3), 9, "purchase", 0.0, ""),
            (4, _ts(4), 9, "click", 0.0, ""),
            (5, _ts(5), 9, "purchase", 0.0, ""),
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    killed = eventseq.eql_sequence_until(
        spark, {"events": syn}, within_sec=7200.0
    ).collect()
    assert [(g.first_event_id, g.second_event_id) for g in killed] == [
        (4, 5)
    ]
    # absent until type == plain eql_sequence
    same = eventseq.eql_sequence_until(
        spark, t, until="nosuchtype"
    ).collect()
    assert {
        (g.user_id, g.first_event_id, g.second_event_id) for g in same
    } == plain


def test_transform_pivot_recompute(spark):
    """Entity-centric pivot vs a pure-Python per-user fold."""
    import json

    t = load_tables(spark, SF_SMOKE)
    per: dict = {}
    for r in t["events"].collect():
        per.setdefault(r.user_id, []).append(r)
    got = {r.user_id: r for r in eventseq.transform_pivot(spark, t).collect()}
    assert set(got) == set(per)
    for uid, evs in per.items():
        g = got[uid]
        assert g.n_events == len(evs)
        assert g.n_purchases == sum(
            1 for e in evs if e.event_type == "purchase"
        )
        assert g.total_k == sum(json.loads(e.props)["k"] for e in evs)
        assert g.n_types == len({e.event_type for e in evs})
        assert g.first_seen == min(e.ts for e in evs)
        assert g.last_seen == max(e.ts for e in evs)


def test_rollup_search_exact_and_smaller(spark):
    """The rollup-served daily answer equals the direct daily answer,
    and the rollup index is strictly smaller than raw events."""
    import json

    t = load_tables(spark, SF_SMOKE)
    direct: dict = {}
    hours = set()
    for r in t["events"].collect():
        k = json.loads(r.props)["k"]
        day = r.ts.replace(hour=0, minute=0, second=0, microsecond=0)
        hours.add((r.ts.replace(minute=0, second=0, microsecond=0),
                   r.event_type))
        cur = direct.setdefault((day, r.event_type), [0, 0])
        cur[0] += 1
        cur[1] += k
    got = {
        (r.day, r.event_type): (r.n_events, r.total_k)
        for r in eventseq.rollup_search(spark, t).collect()
    }
    assert got == {key: tuple(v) for key, v in direct.items()}
    n_raw = t["events"].count()
    assert len(hours) < n_raw  # the rollup index really is a reduction


def test_eql_pipes_unique_head(spark):
    """unique keeps each user's first match in emission order; head
    cuts to N; pipes never add matches."""
    t = load_tables(spark, SF_SMOKE)
    matches = eventseq.eql_sequence(spark, t).collect()
    first_per_user: dict = {}
    for r in sorted(matches, key=lambda r: r.second_event_id):
        first_per_user.setdefault(r.user_id, r)
    want = sorted(
        first_per_user.values(), key=lambda r: r.second_event_id
    )[:10]
    got = eventseq.eql_sequence_pipes(spark, t, head=10).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len({r.user_id for r in got}) == len(got)  # unique by key


def test_eql_sample_recompute(spark):
    """Brute-force recompute: per user, the (ts, event_id)-max event of
    each filter; keys need BOTH filters; 20 smallest user_ids."""
    t = load_tables(spark, SF_SMOKE)
    ev = t["events"].collect()
    best1, best2 = {}, {}
    for r in ev:
        k = (r.ts, r.event_id)
        if r.event_type == "view":
            if r.user_id not in best1 or k > best1[r.user_id][0]:
                best1[r.user_id] = (k, r.event_id, r.ts)
        if r.event_type == "purchase" and r.value > 50.0:
            if r.user_id not in best2 or k > best2[r.user_id][0]:
                best2[r.user_id] = (k, r.event_id, r.ts)
    keys = sorted(set(best1) & set(best2))[:20]
    want = [
        (u, best1[u][1], best1[u][2], best2[u][1], best2[u][2])
        for u in keys
    ]
    got = [
        (r.user_id, r.s1_event_id, r.s1_ts, r.s2_event_id, r.s2_ts)
        for r in eventseq.eql_sample(spark, t).collect()
    ]
    assert got == want and len(got) > 0


def test_nested_reverse_counts(spark):
    """reverse_nested parent counts never exceed nested sentence counts
    and match a pure-Python recompute."""
    from collections import Counter, defaultdict

    from unichem2index_spark.functions.tokenize import tokenize
    from unichem2index_spark.operators import textstats

    t = load_tables(spark, SF_SMOKE)
    sent = Counter()
    parents = defaultdict(set)
    for r in t["documents"].collect():
        toks = tokenize(r.text)
        for i in range(0, len(toks), 10):
            sent[toks[i]] += 1
            parents[toks[i]].add(r.doc_id)
    want = sorted(
        ((term, n, len(parents[term])) for term, n in sent.items()),
        key=lambda x: (-x[1], x[0]),
    )[:15]
    got = [
        (r.term, r.n_sentences, r.n_docs)
        for r in textstats.nested_reverse_agg(spark, t).collect()
    ]
    assert got == want
    assert all(nd <= ns for _, ns, nd in got)


def test_cube_counts_grouping_sets(spark):
    """CUBE emits all four grouping sets consistently: per-cell counts
    roll up exactly to marginals and grand total."""
    from unichem2index_spark.operators import parity

    t = load_tables(spark, SF_SMOKE)
    rows = parity.cube_counts(spark, t).collect()
    cells = {(r.lang_k, r.source_k): r.n_docs for r in rows if r.gid == 0}
    lang_m = {r.lang_k: r.n_docs for r in rows if r.gid == 1}
    src_m = {r.source_k: r.n_docs for r in rows if r.gid == 2}
    total = [r.n_docs for r in rows if r.gid == 3]
    assert len(total) == 1
    assert sum(cells.values()) == total[0]
    for lang, n in lang_m.items():
        assert n == sum(v for (lk, _), v in cells.items() if lk == lang)
    for src, n in src_m.items():
        assert n == sum(v for (_, sk), v in cells.items() if sk == src)


def test_asof_join_entry_brute(spark):
    """Entry-shaped as-of join vs per-row brute force with the
    (ts, event_id)-max tie-break."""
    import __spark_entry__ as entry

    got = [
        (r.user_id, r.event_id, r.asof_event_id, r.asof_value)
        for r in entry.q_asof_join(spark, SF_SMOKE).collect()
    ]
    t = load_tables(spark, SF_SMOKE)
    ev = t["events"].collect()
    views = [r for r in ev if r.event_type == "view"]
    want = []
    for l in sorted(
        (r for r in ev if r.event_type == "purchase"),
        key=lambda r: r.event_id,
    ):
        cands = [
            r for r in views if r.user_id == l.user_id and r.ts <= l.ts
        ]
        if cands:
            b = max(cands, key=lambda r: (r.ts, r.event_id))
            want.append((l.user_id, l.event_id, b.event_id, b.value))
        else:
            want.append((l.user_id, l.event_id, None, None))
    assert got == want and len(got) > 0
