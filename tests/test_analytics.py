"""Oracles for the ES-aggregation analog operators that are not (fully)
SQL-hash-checkable: cardinality_agg's HLL estimate (tolerance vs exact),
plus structural invariants for the pipeline and range aggregations that
the DuckDB hash check can't express (telescoping, bucket bounds).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from unichem2index_spark.operators import textstats
from unichem2index_spark.sources.tables import load_tables

SF = "/root/testdata/sf0.001"


def test_cardinality_within_tolerance(spark):
    t = load_tables(spark, SF)
    approx = {
        r.event_type: r.approx_users
        for r in textstats.cardinality_agg(spark, t, rsd=0.05).collect()
    }
    exact = {
        r.event_type: r.exact_users
        for r in t["events"]
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact_users"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, ex in exact.items():
        assert ex > 0
        rel_err = abs(approx[et] - ex) / ex
        # 3x the requested rsd — generous but catches a broken sketch.
        assert rel_err <= 0.15, (et, approx[et], ex)


def test_date_histogram_pipeline_invariants(spark):
    t = load_tables(spark, SF)
    rows = textstats.date_histogram_pipeline(spark, t).collect()
    assert rows
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for et, series in by_type.items():
        # orderBy guarantees bucket-ascending within each type.
        assert series == sorted(series, key=lambda r: r.bucket)
        # cumulative_sum telescopes to the running total.
        run = 0
        prev_n = None
        for i, r in enumerate(series):
            run += r.n_events
            assert r.cum_n == run, (et, i)
            if i == 0:
                assert r.deriv_n is None  # ES emits no derivative bucket 0
                assert r.moving_avg_n == float(r.n_events)
            else:
                assert r.deriv_n == r.n_events - prev_n
            prev_n = r.n_events
            window = [x.n_events for x in series[max(0, i - 2) : i + 1]]
            assert abs(r.moving_avg_n - round(sum(window) / len(window), 6)) < 1e-9


def test_range_agg_buckets(spark):
    t = load_tables(spark, SF)
    rows = textstats.range_agg(spark, t).collect()
    total = t["documents"].count()
    assert sum(r.doc_count for r in rows) == total
    bounds = {
        f"{lo}-{hi if hi is not None else '*'}": (lo, hi)
        for lo, hi in textstats.RANGE_BOUNDS
    }
    for r in rows:
        lo, hi = bounds[r.range_key]
        assert r.range_from == lo
        assert r.min_chars >= lo
        if hi is not None:
            assert r.max_chars < hi  # half-open [lo, hi), ES semantics
        assert lo <= r.avg_chars <= (hi - 1 if hi is not None else r.max_chars)


def test_weighted_avg_bounds(spark):
    t = load_tables(spark, SF)
    rows = textstats.weighted_avg_agg(spark, t).collect()
    assert len(rows) == 3  # R / A / N
    lo, hi = (
        t["lineitem"]
        .agg(F.min("l_extendedprice"), F.max("l_extendedprice"))
        .first()
    )
    for r in rows:
        # A weighted mean must land inside the value range.
        assert lo <= r.weighted_avg <= hi
        assert r.value_count > 0


def test_mad_is_median_deviation(spark):
    t = load_tables(spark, SF)
    rows = textstats.mad_agg(spark, t).collect()
    vals = {}
    for r in t["events"].select("event_type", "value").collect():
        vals.setdefault(r.event_type, []).append(r.value)
    for r in rows:
        xs = vals[r.event_type]
        # By definition, >= half the values lie within mad of the median.
        within = sum(1 for x in xs if abs(x - r.median) <= r.mad + 1e-9)
        assert within >= len(xs) / 2
        assert r.mad >= 0


def test_completion_suggest_prefix_and_order(spark):
    t = load_tables(spark, SF)
    rows = textstats.completion_suggest(spark, t, prefix="s", k=10).collect()
    assert rows
    assert all(r.suggestion.startswith("s") for r in rows)
    keys = [(-r.weight, r.suggestion) for r in rows]
    assert keys == sorted(keys)


def test_auto_date_histogram_picks_fitting_interval(spark):
    t = load_tables(spark, SF)
    rows = textstats.auto_date_histogram(spark, t, target_buckets=20).collect()
    assert rows
    assert len(rows) <= 20  # the whole point: bucket count fits the target
    unit = rows[0].interval
    assert all(r.interval == unit for r in rows)
    # A 30-day span at target 20 must choose 'week' from the ladder.
    assert unit == "week"
    assert sum(r.n_events for r in rows) == t["events"].count()
    # Tighter target -> coarser interval, never more buckets.
    coarse = textstats.auto_date_histogram(spark, t, target_buckets=3).collect()
    assert len(coarse) <= 3


def test_terms_agg_sharded_bound_is_sound(spark):
    """The error bound must actually BOUND the truth: for every returned
    term, exact_count - reported_count <= doc_count_error_upper_bound;
    and a shard_size big enough to exhaust every shard drives all bounds
    to zero and reproduces the exact agg."""
    t = load_tables(spark, SF)
    rows = textstats.terms_agg_sharded(spark, t, size=5, shard_size=3).collect()
    assert rows
    exact = {
        r.term: r.cnt
        for r in t["documents"]
        .select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term"))
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    for r in rows:
        assert r.doc_count <= exact[r.term]
        assert exact[r.term] - r.doc_count <= r.doc_count_error_upper_bound
    # Exhaustive shard_size: zero error, exact counts.
    full = textstats.terms_agg_sharded(spark, t, size=5, shard_size=10_000).collect()
    for r in full:
        assert r.doc_count_error_upper_bound == 0
        assert r.doc_count == exact[r.term]


def test_t_test_against_scipy_free_recompute(spark):
    """Welch t recomputed in pure Python from the raw values."""
    import math

    t = load_tables(spark, SF)
    got = textstats.t_test_agg(spark, t, "click", "error").first()
    vals = {"click": [], "error": []}
    for r in t["events"].where(
        F.col("event_type").isin(["click", "error"])
    ).collect():
        vals[r.event_type].append(round(r.value * 100) / 100)
    a, b = vals["click"], vals["error"]
    ma, mb = sum(a) / len(a), sum(b) / len(b)
    va = sum((x - ma) ** 2 for x in a) / (len(a) - 1)
    vb = sum((x - mb) ** 2 for x in b) / (len(b) - 1)
    tstat = (ma - mb) / math.sqrt(va / len(a) + vb / len(b))
    assert got.na == len(a) and got.nb == len(b)
    assert abs(got.t_stat - tstat) < 1e-4, (got.t_stat, tstat)


def test_boxplot_invariants(spark):
    t = load_tables(spark, SF)
    rows = textstats.boxplot_agg(spark, t).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.min <= r.q1 <= r.median <= r.q3 <= r.max
        assert r.min <= r.lower_whisker <= r.q1
        assert r.q3 <= r.upper_whisker <= r.max


def test_approx_percentiles_within_rank_tolerance(spark):
    t = load_tables(spark, SF)
    approx = textstats.doclen_percentiles_approx(spark, t).first()
    exact = textstats.doclen_percentiles(spark, t).first()
    assert approx.n_docs == exact.n_docs
    # GK sketch at accuracy=10000 on a 500-doc corpus is near-exact;
    # allow the interpolation gap (exact is quantile_cont, sketch
    # returns an observed value).
    for a, e in [(approx.p50, exact.p50), (approx.p90, exact.p90),
                 (approx.p99, exact.p99)]:
        assert abs(a - e) <= max(2.0, 0.05 * e), (a, e)


def test_pipeline_agg_tail_invariants(spark):
    t = load_tables(spark, SF)
    norm = textstats.normalize_agg(spark, t).collect()
    by_type: dict = {}
    for r in norm:
        by_type.setdefault(r.event_type, []).append(r.pct_of_total)
    for et, pcts in by_type.items():
        assert abs(sum(pcts) - 100.0) < 1e-3, et  # percent_of_sum telescopes

    bs = textstats.bucket_sort_agg(spark, t, offset=2, size=5).collect()
    assert [r.rk for r in bs] == [3, 4, 5, 6, 7]
    counts = [r.n_events for r in bs]
    assert counts == sorted(counts, reverse=True)

    rate = textstats.rate_agg(spark, t).collect()
    for r in rate:
        assert abs(r.per_hour - r.n_events / 24.0) < 1e-6

    sd = textstats.serial_diff_agg(spark, t).collect()
    series: dict = {}
    for r in sd:
        series.setdefault(r.event_type, []).append(r)
    for et, rs in series.items():
        assert rs[0].diff is None  # no predecessor for the first bucket
        for prev, cur in zip(rs, rs[1:]):
            assert cur.diff == cur.n_events - prev.n_events


def test_top_metrics_and_string_stats(spark):
    import math

    t = load_tables(spark, SF)
    top = textstats.top_metrics_agg(spark, t).collect()
    assert len(top) == 5
    evs: dict = {}
    for r in t["events"].collect():
        cur = evs.get(r.event_type)
        if cur is None or (r.ts, r.event_id) > (cur.ts, cur.event_id):
            evs[r.event_type] = r
    for r in top:
        assert r.top_ts == evs[r.event_type].ts
        assert abs(r.top_value - round(evs[r.event_type].value, 6)) < 1e-9

    ss = textstats.string_stats_agg(spark, t).first()
    srcs = [r.source for r in t["documents"].collect()]
    assert ss["count"] == len(srcs)
    assert ss.min_length == min(len(s) for s in srcs)
    assert ss.max_length == max(len(s) for s in srcs)
    from collections import Counter

    c = Counter("".join(srcs))
    total = sum(c.values())
    ent = -sum(n / total * math.log2(n / total) for n in c.values())
    assert abs(ss.entropy - ent) < 1e-5
    assert 0 < ss.entropy <= math.log2(len(c)) + 1e-9  # entropy bound


def test_cumulative_cardinality_exact(spark):
    from unichem2index_spark.operators.textstats import cumulative_cardinality
    from unichem2index_spark.sources.tables import load_tables

    from tests.conftest import SF_SMOKE

    t = load_tables(spark, SF_SMOKE)
    rows = cumulative_cardinality(spark, t).collect()
    assert rows
    # brute force: running distinct-user count per observed day, plus the
    # carried-forward invariant on zero-new days.
    ev = [(r.ts.date(), r.user_id) for r in t["events"].collect()]
    days = sorted({d for d, _ in ev})
    assert [r.bucket.date() for r in rows] == days
    seen: set = set()
    prev_cum = 0
    by_day: dict = {}
    for d, u in ev:
        by_day.setdefault(d, []).append(u)
    for r in rows:
        d = r.bucket.date()
        new = {u for u in by_day[d] if u not in seen}
        seen.update(by_day[d])
        assert r.n_events == len(by_day[d])
        assert r.new_users == len(new)
        assert r.cumulative_users == len(seen)
        assert r.cumulative_users == prev_cum + r.new_users
        prev_cum = r.cumulative_users


def test_tfidf_keywords_recompute(spark):
    import math

    from unichem2index_spark.functions.tokenize import tokenize
    from unichem2index_spark.operators.textstats import tfidf_keywords
    from unichem2index_spark.sources.tables import load_tables

    from tests.conftest import SF_SMOKE

    t = load_tables(spark, SF_SMOKE)
    rows = tfidf_keywords(spark, t).collect()

    docs = {
        r.doc_id: tokenize(r.text)
        for r in t["documents"].select("doc_id", "text").collect()
    }
    n = len(docs)
    dfreq: dict = {}
    for toks in docs.values():
        for term in set(toks):
            dfreq[term] = dfreq.get(term, 0) + 1
    exp = {}
    for d, toks in docs.items():
        tf: dict = {}
        for w in toks:
            tf[w] = tf.get(w, 0) + 1
        scored = sorted(
            (
                (-(c / len(toks)) * math.log(n / dfreq[w]), w, c)
                for w, c in tf.items()
            ),
        )[:3]
        for rk, (neg, w, c) in enumerate(scored, 1):
            exp[(d, rk)] = (w, c, round(-neg, 6))
    got = {(r.doc_id, r.rk): (r.term, r.tf, r.score) for r in rows}
    assert got == exp


def test_percentiles_bucket_recompute(spark):
    from unichem2index_spark.operators.textstats import percentiles_bucket
    from unichem2index_spark.sources.tables import load_tables

    from tests.conftest import SF_SMOKE

    t = load_tables(spark, SF_SMOKE)
    row = percentiles_bucket(spark, t).collect()[0]
    counts: dict = {}
    for r in t["events"].collect():
        d = r.ts.date()
        counts[d] = counts.get(d, 0) + 1
    vals = sorted(counts.values())
    assert row.n_buckets == len(vals)
    assert row.min_bucket == vals[0] and row.max_bucket == vals[-1]

    def q(p):
        i = (len(vals) - 1) * p
        lo, hi = int(i), min(int(i) + 1, len(vals) - 1)
        return round(vals[lo] + (vals[hi] - vals[lo]) * (i - lo), 6)

    assert (row.p25, row.p50, row.p75) == (q(0.25), q(0.5), q(0.75))


def test_moving_percentiles_recompute(spark):
    from unichem2index_spark.operators.textstats import (
        MOVING_PCT_WINDOW,
        moving_percentiles,
    )
    from unichem2index_spark.sources.tables import load_tables

    from tests.conftest import SF_SMOKE

    t = load_tables(spark, SF_SMOKE)
    rows = moving_percentiles(spark, t).collect()
    counts: dict = {}
    for r in t["events"].collect():
        d = r.ts.date()
        counts[d] = counts.get(d, 0) + 1
    days = sorted(counts)
    assert [r.bucket.date() for r in rows] == days

    def q(vals, p):
        vals = sorted(vals)
        i = (len(vals) - 1) * p
        lo, hi = int(i), min(int(i) + 1, len(vals) - 1)
        return round(vals[lo] + (vals[hi] - vals[lo]) * (i - lo), 6)

    for idx, r in enumerate(rows):
        wvals = [
            counts[d]
            for d in days[max(0, idx - MOVING_PCT_WINDOW + 1) : idx + 1]
        ]
        assert r.n_events == counts[days[idx]]
        assert (r.moving_p50, r.moving_p90) == (q(wvals, 0.5), q(wvals, 0.9))


def test_cumulative_sum_and_derivative(spark):
    t = load_tables(spark, SF)
    cs = textstats.cumulative_sum_agg(spark, t).collect()
    series: dict = {}
    for r in cs:
        series.setdefault(r.event_type, []).append(r)
    for et, rs in series.items():
        run = 0
        for r in rs:
            run += r.n_events
            assert r.running == run  # telescopes exactly
        assert rs[-1].running == sum(x.n_events for x in rs)

    dv = textstats.derivative_agg(spark, t).collect()
    series = {}
    for r in dv:
        series.setdefault(r.event_type, []).append(r)
    for et, rs in series.items():
        assert rs[0].per_day is None  # no predecessor
        for prev, cur in zip(rs, rs[1:]):
            gap = (cur.bucket.date() - prev.bucket.date()).days
            assert gap >= 1
            want = round((cur.n_events - prev.n_events) / gap, 6)
            assert cur.per_day == want


def test_bucket_correlation_matches_bruteforce(spark):
    import math

    t = load_tables(spark, SF)
    got = {
        r.event_type: (r.n_days, r.corr)
        for r in textstats.bucket_correlation_agg(spark, t).collect()
    }
    evs = t["events"].collect()
    days = sorted({r.ts.date() for r in evs})
    total = {d: 0 for d in days}
    per: dict = {}
    for r in evs:
        d = r.ts.date()
        total[d] += 1
        per.setdefault(r.event_type, {d2: 0 for d2 in days})[d] += 1
    for et, xs in per.items():
        x = [xs[d] for d in days]
        y = [total[d] for d in days]
        n = len(days)
        sx, sy = sum(x), sum(y)
        sxy = sum(a * b for a, b in zip(x, y))
        sxx, syy = sum(a * a for a in x), sum(b * b for b in y)
        corr = (n * sxy - sx * sy) / (
            math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
        )
        assert got[et] == (n, round(corr, 6)), et
    # a series proportional to the total correlates at exactly 1
    assert all(-1.0 <= c <= 1.0 for _, c in got.values())


def test_change_point_matches_bruteforce(spark):
    import math

    t = load_tables(spark, SF)
    got = {
        r.event_type: (r.change_bucket, r.stat, r.mean_before, r.mean_after)
        for r in textstats.change_point_agg(spark, t).collect()
    }
    evs = t["events"].collect()
    per: dict = {}
    for r in evs:
        per.setdefault(r.event_type, {}).setdefault(r.ts.date(), 0)
        per[r.event_type][r.ts.date()] += 1
    for et, byday in per.items():
        days = sorted(byday)
        xs = [byday[d] for d in days]
        n, s = len(xs), sum(xs)
        best = None
        for i in range(1, n):  # left = 1..i, right = i+1..n
            cum = sum(xs[:i])
            ml, mr = cum / i, (s - cum) / (n - i)
            stat = abs(mr - ml) * math.sqrt(i * (n - i) / n)
            if best is None or stat > best[0]:
                best = (stat, days[i], ml, mr)  # ties keep the earliest
        stat, change_day, ml, mr = best
        g = got[et]
        assert g[0].date() == change_day, et
        assert g[1] == round(stat, 6) and g[2] == round(ml, 6)
        assert g[3] == round(mr, 6)


def test_extended_stats_bucket_moments(spark):
    """variance/std/bounds recomputed brute-force from the daily counts
    (population variance, exact moments)."""
    t = load_tables(spark, SF)
    daily = (
        t["events"]
        .groupBy("event_type", F.date_trunc("day", "ts").alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    series: dict = {}
    for r in daily:
        series.setdefault(r.event_type, []).append(r.n)
    got = {r.event_type: r for r in
           textstats.extended_stats_bucket(spark, t).collect()}
    assert set(got) == set(series)
    for et, xs in series.items():
        r = got[et]
        k = len(xs)
        avg = sum(xs) / k
        var = (k * sum(x * x for x in xs) - sum(xs) ** 2) / (k * k)
        assert r.n_buckets == k
        assert r.min_bucket == min(xs) and r.max_bucket == max(xs)
        assert r.sum_events == sum(xs)
        assert abs(r.avg_per_bucket - avg) < 1e-6
        assert abs(r.variance - var) < 1e-6
        assert abs(r.std_dev - var ** 0.5) < 1e-6
        assert abs(r.upper2 - (avg + 2 * var ** 0.5)) < 1e-6
        assert abs(r.lower2 - (avg - 2 * var ** 0.5)) < 1e-6


def test_moving_fn_lwa_recompute(spark):
    """linearWeightedAvg over the trailing 7-bucket window (current
    included; partial leading windows) — brute-force recompute."""
    t = load_tables(spark, SF)
    daily = sorted(
        (r.b, r.n)
        for r in t["events"]
        .groupBy(F.date_trunc("day", "ts").alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    xs = [n for _, n in daily]
    got = [
        (r.bucket, r.n, r.lwa)
        for r in textstats.moving_fn_agg(spark, t).collect()
    ]
    assert len(got) == len(daily)
    for i, (b, n, lwa) in enumerate(got):
        win = xs[max(0, i - 6): i + 1]
        want = sum((j + 1) * v for j, v in enumerate(win)) / (
            len(win) * (len(win) + 1) // 2
        )
        assert (b, n) == daily[i]
        assert abs(lwa - want) < 1e-6


def test_bucket_count_ks_test_bruteforce(spark):
    """KS D == max ECDF gap vs the overall daily distribution, with
    min_doc_count=0 grid alignment; D in [0, 1]."""
    t = load_tables(spark, SF)
    rows = t["events"].select("event_type", F.date_trunc("day", "ts")
                              .alias("b")).collect()
    days = sorted({r.b for r in rows})
    types = sorted({r.event_type for r in rows})
    per: dict = {et: {d: 0 for d in days} for et in types}
    allc = {d: 0 for d in days}
    for r in rows:
        per[r.event_type][r.b] += 1
        allc[r.b] += 1
    got = {r.event_type: r for r in
           textstats.bucket_count_ks_test_agg(spark, t).collect()}
    assert set(got) == set(types)
    A = sum(allc.values())
    for et in types:
        T = sum(per[et].values())
        cx = cy = 0
        dmax = 0.0
        for d in days:
            cx += per[et][d]
            cy += allc[d]
            dmax = max(dmax, abs(cx / T - cy / A))
        r = got[et]
        assert r.n_days == len(days)
        assert 0.0 <= r.d_stat <= 1.0
        assert abs(r.d_stat - dmax) < 1e-6


def test_domain_cap_deterministic_sample(spark):
    """Per-source counts == min(count, cap); the kept set is exactly
    the cap lowest hash-permutation ranks per source, and the result is
    partitioning-independent."""
    from unichem2index_spark.functions.hashing import FP_MULT, MOD
    from unichem2index_spark.operators import trainprep

    t = load_tables(spark, SF)
    cap = 5
    got = trainprep.domain_cap(spark, t, cap=cap).collect()
    docs = t["documents"].select("source", "doc_id").collect()
    per: dict = {}
    for r in docs:
        per.setdefault(r.source, []).append(r.doc_id)
    want = {}
    for src, ids in per.items():
        ranked = sorted(ids, key=lambda d: (((d % MOD) + 1) * FP_MULT % MOD, d))
        want[src] = ranked[: cap]
    by_src: dict = {}
    for r in got:
        by_src.setdefault(r.source, []).append((r.rk, r.doc_id))
    assert set(by_src) == set(want)
    for src, pairs in by_src.items():
        assert [d for _, d in sorted(pairs)] == want[src]
        assert len(pairs) == min(len(per[src]), cap)
    # partitioning-independence: same rows from a 7-partition input
    t2 = dict(t)
    t2["documents"] = t["documents"].repartition(7)
    again = trainprep.domain_cap(spark, t2, cap=cap).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, got))


def test_runtime_fields_schema_on_read(spark):
    """runtime band field recompute: integer div bands, filter applies
    before the agg, count_distinct over source."""
    t = load_tables(spark, SF)
    rows = t["documents"].collect()
    per: dict = {}
    for r in rows:
        if r.lang not in ("en", "de"):
            continue
        b = min(r.n_chars // 100, 5)
        per.setdefault(b, []).append(r)
    got = {r.band: r for r in
           textstats.runtime_fields_agg(spark, t).collect()}
    assert set(got) == set(per)
    for b, rs in per.items():
        g = got[b]
        assert g.n_docs == len(rs)
        assert g.min_chars == min(r.n_chars for r in rs)
        assert g.max_chars == max(r.n_chars for r in rs)
        assert g.n_sources == len({r.source for r in rs})


def test_missing_agg_recompute(spark):
    """missing/present/min per bucket vs a pure-Python recompute of the
    sparse JSON runtime field."""
    import json

    t = load_tables(spark, SF)
    per: dict = {}
    for r in t["events"].collect():
        k = json.loads(r.props)["k"]
        big = k if k >= 90 else None
        per.setdefault(r.event_type, []).append(big)
    got = {r.event_type: r for r in textstats.missing_agg(spark, t).collect()}
    assert set(got) == set(per)
    for et, vals in per.items():
        g = got[et]
        present = [v for v in vals if v is not None]
        assert g.missing_docs == sum(1 for v in vals if v is None)
        assert g.present_docs == len(present)
        assert g.min_big_k == (min(present) if present else 0)
        assert g.missing_docs + g.present_docs == len(vals)


def test_global_agg_escapes_query_scope(spark):
    t = load_tables(spark, SF)
    rows = t["documents"].collect()
    g = textstats.global_agg(spark, t).collect()[0]
    en = [r for r in rows if r.lang == "en"]
    assert g.query_docs == len(en)
    assert g.query_chars == sum(r.n_chars for r in en)
    assert g.all_docs == len(rows)
    assert g.all_chars == sum(r.n_chars for r in rows)
    # the global bucket must NOT shrink to the query scope
    assert g.all_docs > g.query_docs


def test_scripted_metric_recompute(spark):
    """map (+k purchase / -k other) → combine/reduce == hash agg."""
    import json

    t = load_tables(spark, SF)
    per: dict = {}
    for r in t["events"].collect():
        k = json.loads(r.props)["k"]
        per.setdefault(r.event_type, []).append(k)
    got = {
        r.event_type: r
        for r in textstats.scripted_metric_agg(spark, t).collect()
    }
    assert set(got) == set(per)
    for et, ks in per.items():
        g = got[et]
        sign = 1 if et == "purchase" else -1
        assert g.n_events == len(ks)
        assert g.net_amount == sign * sum(ks)
        assert g.max_amount == max(ks)


def test_significant_text_dedup_filters_copies(spark):
    """filter_duplicate_text: planting an exact copy of a foreground doc
    must not change any fg_df/bg_df count."""
    t = load_tables(spark, SF)
    base = textstats.significant_text_agg(spark, t, query_term="merge")
    got = [(r.term, r.fg_df, r.bg_df, r.score) for r in base.collect()]
    assert got, "foreground must be non-empty at sf0.001"
    docs = t["documents"]
    fg_doc = docs.where(
        F.array_contains(
            F.split(F.lower("text"), r"\s+"), "merge"
        )
    ).limit(1)
    clone = fg_doc.withColumn(
        "doc_id", F.col("doc_id") + F.lit(10_000_000)
    )
    t2 = dict(t)
    t2["documents"] = docs.unionByName(clone)
    again = textstats.significant_text_agg(spark, t2, query_term="merge")
    assert got == [
        (r.term, r.fg_df, r.bg_df, r.score) for r in again.collect()
    ]


def test_geotile_grid_recompute(spark):
    """Slippy-tile math vs a pure-Python recompute (math.floor/tan/cos/
    log are the same IEEE doubles)."""
    import math

    t = load_tables(spark, SF)
    per: dict = {}
    for r in t["documents"].collect():
        lat = float((r.doc_id * 37 % 170) - 85) + 0.5
        lon = float((r.doc_id * 73 % 360) - 180) + 0.5
        if not (-60.5 <= lat <= 70.5 and -150.5 <= lon <= 150.5):
            continue
        rad = lat * math.pi / 180.0
        xt = math.floor((lon + 180.0) / 360.0 * 8.0)
        yt = math.floor(
            (1.0 - math.log(math.tan(rad) + 1.0 / math.cos(rad)) / math.pi)
            / 2.0 * 8.0
        )
        key = f"3/{xt}/{yt}"
        per[key] = per.get(key, 0) + 1
    got = {r.tile: r.doc_count for r in
           textstats.geotile_grid_agg(spark, t).collect()}
    assert got == per
    # every tile index is inside the zoom-3 grid
    for key in got:
        z, x, y = (int(p) for p in key.split("/"))
        assert z == 3 and 0 <= x < 8 and 0 <= y < 8


def test_geo_distance_rings_recompute(spark):
    t = load_tables(spark, SF)
    per: dict = {}
    for r in t["documents"].collect():
        lat = float((r.doc_id * 37 % 170) - 85) + 0.5
        lon = float((r.doc_id * 73 % 360) - 180) + 0.5
        d2 = (lat - 0.5) ** 2 + (lon - 0.5) ** 2
        ring = (
            "0-30" if d2 < 900 else
            "30-60" if d2 < 3600 else
            "60-90" if d2 < 8100 else "90-inf"
        )
        per[ring] = per.get(ring, 0) + 1
    got = {r.ring: r.doc_count for r in
           textstats.geo_distance_agg(spark, t).collect()}
    assert got == per
    assert sum(got.values()) == t["documents"].count()


def test_unigram_surprisal_recompute(spark):
    """Sorted-fold surprisal vs the same sequential fold in Python —
    the fold order is part of the contract, so the recompute follows
    it exactly."""
    import math

    from unichem2index_spark.functions.tokenize import tokenize

    t = load_tables(spark, SF)
    docs = {r.doc_id: tokenize(r.text) for r in t["documents"].collect()}
    cf: dict = {}
    for toks in docs.values():
        for tok in toks:
            cf[tok] = cf.get(tok, 0) + 1
    total = float(sum(cf.values()))
    got = {r.doc_id: r for r in
           textstats.unigram_surprisal(spark, t).collect()}
    assert set(got) == set(docs)
    for doc_id, toks in docs.items():
        tf: dict = {}
        for tok in toks:
            tf[tok] = tf.get(tok, 0) + 1
        acc = 0.0
        for term in sorted(tf):
            acc = acc + float(tf[term]) * math.log(total / float(cf[term]))
        bits = acc / math.log(2.0) / float(len(toks))
        g = got[doc_id]
        assert g.n_tokens == len(toks)
        assert abs(g.bits_per_token - bits) < 1e-6
        assert g.bits_per_token > 0


def test_terms_partition_disjoint_exhaustive(spark):
    """The union of all partitions == the unpartitioned terms frame,
    and partitions are disjoint (rank-mod contract)."""
    t = load_tables(spark, SF)
    all_terms = {
        (r.term, r.df)
        for p in range(3)
        for r in textstats.terms_partition_agg(
            spark, t, num_partitions=3, partition=p, size=10**6
        ).collect()
    }
    from unichem2index_spark.functions.tokenize import tokenize

    per: dict = {}
    for r in t["documents"].collect():
        for term in set(tokenize(r.text)):
            per[term] = per.get(term, 0) + 1
    assert all_terms == set(per.items())
    counts = [
        textstats.terms_partition_agg(
            spark, t, num_partitions=3, partition=p, size=10**6
        ).count()
        for p in range(3)
    ]
    assert sum(counts) == len(per)
    import pytest

    with pytest.raises(ValueError):
        textstats.terms_partition_agg(spark, t, 4, 4)


def test_diversified_sampler_caps(spark):
    """The sample honors max-per-source and shard_size; df counts come
    from the sample only."""
    from unichem2index_spark.functions.hashing import FP_MULT, MOD
    from unichem2index_spark.functions.tokenize import tokenize

    t = load_tables(spark, SF)
    rows = t["documents"].collect()
    per_src: dict = {}
    for r in rows:
        per_src.setdefault(r.source, []).append(r)
    picked = []
    for src, rs in per_src.items():
        order = sorted(
            rs, key=lambda r: ((((r.doc_id % MOD) + 1) * FP_MULT) % MOD,
                               r.doc_id)
        )
        picked.extend(order[:2])
    picked.sort(
        key=lambda r: ((((r.doc_id % MOD) + 1) * FP_MULT) % MOD, r.doc_id)
    )
    sample = picked[:60]
    df: dict = {}
    for r in sample:
        for term in set(tokenize(r.text)):
            df[term] = df.get(term, 0) + 1
    want = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [
        (r.term, r.df)
        for r in textstats.diversified_sampler_agg(spark, t).collect()
    ]
    assert got == want


def test_random_sampler_scaling(spark):
    """Inclusion is the exact perm modulo; estimates are sampled × 5."""
    from unichem2index_spark.functions.hashing import FP_MULT, MOD

    t = load_tables(spark, SF)
    per: dict = {}
    for r in t["documents"].collect():
        if (((r.doc_id % MOD) + 1) * FP_MULT) % MOD % 5 == 0:
            cur = per.setdefault(r.lang, [0, 0])
            cur[0] += 1
            cur[1] += r.n_chars
    got = {r.lang: r for r in
           textstats.random_sampler_agg(spark, t).collect()}
    assert set(got) == set(per)
    for lang, (n, chars) in per.items():
        g = got[lang]
        assert g.sampled_docs == n
        assert g.est_docs == n * 5
        assert g.est_chars == chars * 5


def test_categorize_text_prefix_skeleton(spark):
    """Category key recomputed per doc in pure Python; top-10 cut
    ordered (doc_count desc, key asc)."""
    import re

    t = load_tables(spark, SF)
    cats: dict = {}
    for r in t["documents"].collect():
        toks = re.findall(r"[a-z0-9]+", r.text.lower())[:2]
        key = " ".join(
            "*" if re.search(r"[0-9]", x) else x for x in toks
        )
        cats[key] = cats.get(key, 0) + 1
    want = sorted(cats.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [
        (r.category, r.doc_count)
        for r in textstats.categorize_text_agg(spark, t).collect()
    ]
    assert got == want


def test_date_range_buckets_partition_events(spark):
    """from-inclusive/to-exclusive edges; buckets tile the stream."""
    t = load_tables(spark, SF)
    got = {
        r.bucket: r.doc_count
        for r in textstats.date_range_agg(spark, t).collect()
    }
    total = t["events"].count()
    assert sum(got.values()) == total
    lo = t["events"].where(
        F.col("ts") < F.lit("2024-01-10").cast("timestamp")
    ).count()
    hi = t["events"].where(
        F.col("ts") >= F.lit("2024-01-20").cast("timestamp")
    ).count()
    assert got.get("*-2024-01-10", 0) == lo
    assert got.get("2024-01-20-*", 0) == hi
    assert got.get("2024-01-10-2024-01-20", 0) == total - lo - hi


def test_geo_bounds_enclose_centroid(spark):
    """Per-lang invariants: bounds are a box, the centroid sits inside
    it, and counts sum to the corpus."""
    t = load_tables(spark, SF)
    bounds = {
        r.lang: r for r in textstats.geo_bounds_agg(spark, t).collect()
    }
    cent = {
        r.lang: r for r in textstats.geo_centroid_agg(spark, t).collect()
    }
    assert set(bounds) == set(cent)
    assert sum(c.doc_count for c in cent.values()) == t["documents"].count()
    for lang, b in bounds.items():
        c = cent[lang]
        assert b.bottom_lat <= b.top_lat and b.left_lon <= b.right_lon
        assert b.bottom_lat <= c.centroid_lat <= b.top_lat
        assert b.left_lon <= c.centroid_lon <= b.right_lon
        # x.5-degree grid: bounds land exactly on half-degrees
        for v in (b.top_lat, b.bottom_lat, b.left_lon, b.right_lon):
            assert v == int(v) + 0.5 or v == int(v) - 0.5


def test_geo_centroid_exact_mean(spark):
    """The planar mean recomputed in Python — exact because every
    coordinate is a multiple of 0.5 (dyadic, order-insensitive)."""
    t = load_tables(spark, SF)
    pts: dict = {}
    for r in t["documents"].select("doc_id", "lang").collect():
        lat = float((r.doc_id * 37 % 170) - 85) + 0.5
        lon = float((r.doc_id * 73 % 360) - 180) + 0.5
        pts.setdefault(r.lang, []).append((lat, lon))
    got = {r.lang: r for r in textstats.geo_centroid_agg(spark, t).collect()}
    for lang, ps in pts.items():
        g = got[lang]
        assert g.doc_count == len(ps)
        assert g.centroid_lat == round(
            sum(p[0] for p in ps) / len(ps), 6
        )
        assert g.centroid_lon == round(
            sum(p[1] for p in ps) / len(ps), 6
        )


def test_zipf_fit_recompute(spark):
    """Least-squares recompute (numpy-free, same fold order) of the
    Zipf slope/intercept over the top-100 vocabulary."""
    import math
    from collections import Counter

    from unichem2index_spark.functions.tokenize import tokenize
    from unichem2index_spark.operators import textstats as TS
    from unichem2index_spark.sources.tables import load_tables
    from tests.conftest import SF_SMOKE

    t = load_tables(spark, SF_SMOKE)
    cf = Counter()
    for r in t["documents"].select("text").collect():
        cf.update(tokenize(r.text))
    top = sorted(cf.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    sx = sy = sxy = sxx = 0.0
    for rank, (_, c) in enumerate(top, start=1):
        x, y = math.log(rank), math.log(c)
        sx += x
        sy += y
        sxy += x * y
        sxx += x * x
    n = float(len(top))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    row = TS.zipf_fit(spark, t).collect()[0]
    assert row.n_terms == len(top)
    assert row.zipf_slope == round(slope, 6)
    assert row.zipf_intercept == round(intercept, 6)
    # synthetic sf0.001 text is flatter than natural prose (measured
    # slope ~-0.18 on the smoke corpus); only require a negative fit
    assert row.zipf_slope < -0.05


def test_heaps_law_recompute(spark):
    """Exact vocabulary-growth checkpoints vs a sequential scan."""
    from unichem2index_spark.functions.tokenize import tokenize
    from unichem2index_spark.operators import textstats as TS
    from unichem2index_spark.sources.tables import load_tables
    from tests.conftest import SF_SMOKE

    t = load_tables(spark, SF_SMOKE)
    rows = {
        r.doc_id: tokenize(r.text)
        for r in t["documents"].select("doc_id", "text").collect()
    }
    seen: set[str] = set()
    per_bucket_tokens: dict[int, int] = {}
    per_bucket_new: dict[int, int] = {}
    for d in sorted(rows):
        b = d // TS.HEAPS_BUCKET_DOCS
        toks = rows[d]
        per_bucket_tokens[b] = per_bucket_tokens.get(b, 0) + len(toks)
        for tok in toks:
            if tok not in seen:
                seen.add(tok)
                per_bucket_new[b] = per_bucket_new.get(b, 0) + 1
    exp, ct, cv = [], 0, 0
    for b in sorted(per_bucket_tokens):
        ct += per_bucket_tokens[b]
        cv += per_bucket_new.get(b, 0)
        exp.append((b, ct, cv))
    got = [
        (r.bucket, r.cum_tokens, r.cum_vocab)
        for r in TS.heaps_law(spark, t).collect()
    ]
    assert got == exp
    # growth curve is strictly monotone in tokens, non-decreasing in vocab
    assert all(a[1] < b2[1] and a[2] <= b2[2] for a, b2 in zip(exp, exp[1:]))


def test_skipgram_pmi_recompute(spark):
    """Exact-count PMI recompute over the ±2 left-context pair table."""
    import math
    from collections import Counter

    from unichem2index_spark.functions.tokenize import tokenize
    from unichem2index_spark.operators import textstats as TS
    from unichem2index_spark.sources.tables import load_tables
    from tests.conftest import SF_SMOKE

    t = load_tables(spark, SF_SMOKE)
    cab, ca, cb = Counter(), Counter(), Counter()
    total = 0
    for r in t["documents"].select("text").collect():
        toks = tokenize(r.text)
        if len(toks) < 2:
            continue
        prs = [(toks[i], toks[i + 1]) for i in range(len(toks) - 1)]
        prs += [(toks[i], toks[i + 2]) for i in range(len(toks) - 2)]
        for a, b in prs:
            cab[(a, b)] += 1
            ca[a] += 1
            cb[b] += 1
            total += 1
    top = sorted(cab.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    exp = [
        (
            a,
            b,
            n,
            ca[a],
            cb[b],
            round(math.log((total * n) / (ca[a] * cb[b])), 6),
        )
        for (a, b), n in top
    ]
    got = [
        (r.w1, r.w2, r.c_ab, r.c_a, r.c_b, r.pmi)
        for r in TS.skipgram_pmi(spark, t).collect()
    ]
    assert got == exp


def test_geo_line_recompute(spark):
    """Per-lang path recompute: first 8 x.5-grid points in doc order."""
    from unichem2index_spark.operators import textstats as TS
    from unichem2index_spark.sources.tables import load_tables
    from tests.conftest import SF_SMOKE

    t = load_tables(spark, SF_SMOKE)
    by_lang: dict[str, list[int]] = {}
    for r in t["documents"].select("doc_id", "lang").collect():
        by_lang.setdefault(r.lang, []).append(r.doc_id)
    exp = {}
    for lang, ids in by_lang.items():
        pts = []
        for d in sorted(ids)[: TS.GEO_LINE_POINTS]:
            lon = (d * 73 % 360) - 180 + 0.5
            lat = (d * 37 % 170) - 85 + 0.5
            pts.append(f"{lon:.1f},{lat:.1f}")
        exp[lang] = (";".join(pts), len(ids))
    got = {
        r.lang: (r.line, r.n_points)
        for r in TS.geo_line_agg(spark, t).collect()
    }
    assert got == exp
