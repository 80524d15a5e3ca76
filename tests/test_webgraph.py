"""Web-graph operators: derived link graph, degree stats, PageRank —
checked against a pure-Python recompute on the smoke corpus."""

from __future__ import annotations

from unichem2index_spark.functions.hashing import FP_MULT, MOD
from unichem2index_spark.operators import webgraph
from unichem2index_spark.sources.tables import load_tables

from tests.conftest import SF_SMOKE


def _py_graph(doc_ids):
    n = len(doc_ids)
    edges = set()
    for d in doc_ids:
        for j in (1, 2, 3):
            dst = ((d % MOD + j) * FP_MULT) % MOD % n
            if dst != d:
                edges.add((d, dst))
    return n, sorted(edges)


def test_link_graph_stats_recompute(spark):
    t = load_tables(spark, SF_SMOKE)
    ids = [r.doc_id for r in t["documents"].select("doc_id").collect()]
    n, edges = _py_graph(ids)
    indeg = {d: 0 for d in ids}
    for _, dst in edges:
        indeg[dst] += 1
    from collections import Counter

    want = sorted(Counter(indeg.values()).items())
    got = [
        (r.in_deg, r.n_docs)
        for r in webgraph.link_graph_stats(spark, t).collect()
    ]
    assert got == want
    assert sum(c for _, c in got) == n
    # non-uniform in-degree: the hash graph must not be a permutation
    assert len(got) > 2


def test_pagerank_recompute_and_mass(spark):
    t = load_tables(spark, SF_SMOKE)
    ids = sorted(r.doc_id for r in t["documents"].select("doc_id").collect())
    n, edges = _py_graph(ids)
    outdeg = {}
    inlinks = {d: [] for d in ids}
    for s, dst in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
        inlinks[dst].append(s)
    assert all(d in outdeg for d in ids), "dangling node in synth graph"
    pr = {d: 1.0 / n for d in ids}
    for _ in range(webgraph.PR_ITERS):
        nxt = {}
        for d in ids:
            c = 0.0
            for s in sorted(inlinks[d]):  # same fold order as engines
                c += pr[s] / float(outdeg[s])
            nxt[d] = 0.15 / n + 0.85 * c
        pr = nxt
    want = sorted(
        ((d, round(pr[d], 9)) for d in ids),
        key=lambda x: (-x[1], x[0]),
    )[:20]
    got = [
        (r.doc_id, r.pagerank)
        for r in webgraph.pagerank_2iter(spark, t).collect()
    ]
    assert got == want
    # total rank mass conserved (no dangling): sum over ALL nodes ~ 1
    assert abs(sum(pr.values()) - 1.0) < 1e-9


def test_anchor_text_recompute(spark):
    """Pure-Python recompute of the per-target anchor-text rollup:
    link counts, distinct anchors, and the (count desc, anchor asc)
    argmax anchor."""
    from collections import Counter, defaultdict

    from unichem2index_spark.functions.tokenize import tokenize

    t = load_tables(spark, SF_SMOKE)
    rows = t["documents"].select("doc_id", "text").collect()
    toks = {r.doc_id: tokenize(r.text) for r in rows}
    n, edges = _py_graph(sorted(toks))
    per_dst: dict[int, Counter] = defaultdict(Counter)
    for src, dst in edges:
        ts = toks[src]
        if not ts:
            continue
        per_dst[dst][ts[(src + dst) % len(ts)]] += 1
    exp = {}
    for dst, c in per_dst.items():
        top = min(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        exp[dst] = (sum(c.values()), len(c), top)
    want = sorted(exp.items(), key=lambda kv: (-kv[1][0], kv[0]))[:50]
    got = [
        (r.dst, (r.n_links, r.n_anchors, r.top_anchor))
        for r in webgraph.anchor_text_agg(spark, t).collect()
    ]
    assert got == want


def test_hits_recompute(spark):
    """Pure-Python HITS (same fold order, max-normalized half-steps)
    must match the Spark top-20 exactly after round(9)."""
    t = load_tables(spark, SF_SMOKE)
    ids = sorted(r.doc_id for r in t["documents"].select("doc_id").collect())
    n, edges = _py_graph(ids)
    inlinks = {d: [] for d in ids}
    outlinks = {d: [] for d in ids}
    for s, dst in edges:
        inlinks[dst].append(s)
        outlinks[s].append(dst)

    def norm(vec):
        m = max(vec.values())
        return {d: v / m for d, v in vec.items()}

    # iteration 1: a1 = in-degree (h0 == 1), h1 from a1
    a = norm({d: float(len(inlinks[d])) for d in ids})
    def fold_h(avec):
        h = {}
        for d in ids:
            c = 0.0
            for v in sorted(outlinks[d]):
                c += avec[v]
            h[d] = c
        return norm(h)
    def fold_a(hvec):
        a2 = {}
        for d in ids:
            c = 0.0
            for u in sorted(inlinks[d]):
                c += hvec[u]
            a2[d] = c
        return norm(a2)
    h = fold_h(a)
    a = fold_a(h)
    h = fold_h(a)
    want = sorted(
        ((d, round(a[d], 9), round(h[d], 9)) for d in ids),
        key=lambda x: (-x[1], -x[2], x[0]),
    )[:20]
    got = [
        (r.doc_id, r.authority, r.hub)
        for r in webgraph.hits_2iter(spark, t).collect()
    ]
    assert got == want
    # sanity: normalization pins the max of each vector to 1.0
    assert max(v for _, v, _ in got) == 1.0


def test_salsa_recompute(spark):
    """Pure-Python SALSA (degree-normalized folds, max-normalized
    half-steps, a0 == 1) must match the Spark top-20 after round(9),
    and must diverge from HITS somewhere in the ranking."""
    t = load_tables(spark, SF_SMOKE)
    ids = sorted(r.doc_id for r in t["documents"].select("doc_id").collect())
    n, edges = _py_graph(ids)
    inlinks = {d: [] for d in ids}
    outlinks = {d: [] for d in ids}
    for s, dst in edges:
        inlinks[dst].append(s)
        outlinks[s].append(dst)
    ideg = {d: float(len(inlinks[d])) for d in ids}
    odeg = {d: float(len(outlinks[d])) for d in ids}

    def norm(vec):
        m = max(vec.values())
        return {d: v / m for d, v in vec.items()}

    def fold_h(avec):
        h = {}
        for d in ids:
            c = 0.0
            for v in sorted(outlinks[d]):
                c += avec[v] / ideg[v]
            h[d] = c
        return norm(h)

    def fold_a(hvec):
        a2 = {}
        for d in ids:
            c = 0.0
            for u in sorted(inlinks[d]):
                c += hvec[u] / odeg[u]
            a2[d] = c
        return norm(a2)

    a = {d: 1.0 for d in ids}
    h = fold_h(a)
    a = fold_a(h)
    h = fold_h(a)
    a = fold_a(h)
    want = sorted(
        ((d, round(a[d], 9), round(h[d], 9)) for d in ids),
        key=lambda x: (-x[1], -x[2], x[0]),
    )[:20]
    got = [
        (r.doc_id, r.authority, r.hub)
        for r in webgraph.salsa_2iter(spark, t).collect()
    ]
    assert got == want
    assert max(v for _, v, _ in got) == 1.0
    # degree normalization must change the order vs HITS somewhere
    hits = [r.doc_id for r in webgraph.hits_2iter(spark, t).collect()]
    assert [d for d, _, _ in got] != hits
