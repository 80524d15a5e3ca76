"""Web-graph operators over the corpus: link-graph degree statistics
and a fixed-iteration PageRank — the two graph computations every
web-crawl pipeline runs between fetch and ranking (in-degree / PageRank
feed both crawl frontier prioritization and quality weighting of
training mixtures; ref analog: the reference treats each UCI as a node
keyed for lookup, inchiDivider.go — here the node set is the document
corpus itself).

The synthetic corpus carries no hyperlinks, so the edge set is DERIVED
deterministically from doc_ids with the repo's shared hash constants
(functions/hashing.py): doc d emits an edge to
``((d % MOD + j) * FP_MULT) % MOD % N`` for j in 1..3 — a fixed,
engine-reproducible pseudo-random 3-out graph with non-uniform
in-degree (hash collisions concentrate mass, which is exactly what
PageRank must handle). On real webtext the edge extractor is an href
parse over the html column; everything downstream of the ``edges``
frame is unchanged.

Float determinism: PageRank contribution sums use the repo's
sequential-fold discipline (sort the contribution list by source id,
fold left) so both engines add the same doubles in the same order —
only IEEE-exact ops (+ * /), no libm — and round(9) at emit.

Scale shape at 10^12 nodes: edges/deg/pr are all hash-partitioned on
node id; each iteration is one shuffle-on-dst aggregate plus one
co-partitioned join back (AQE reuses the exchange); no collect, no
driver-side adjacency. Fixed iteration count keeps the lineage bounded
(production would checkpoint between iterations — noted, not needed at
2 iterations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from unichem2index_spark.functions.hashing import FP_MULT, MOD

PR_DAMPING = 0.85
PR_ITERS = 2
OUT_LINKS = 3


def _graph(t):
    """(docs-with-n, distinct self-loop-free edges) shared frames."""
    docs = t["documents"].select("doc_id")
    n_df = docs.agg(F.count(F.lit(1)).alias("n"))
    d = docs.crossJoin(F.broadcast(n_df))
    dsts = F.array(
        *[
            ((F.col("doc_id") % MOD + F.lit(j)) * FP_MULT)
            % MOD
            % F.col("n")
            for j in range(1, OUT_LINKS + 1)
        ]
    )
    edges = (
        d.select(
            F.col("doc_id").alias("src"),
            F.explode(dsts).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    return d, edges


def link_graph_stats(spark: SparkSession, t) -> DataFrame:
    """In-degree histogram of the link graph (0-in-degree nodes
    included via a left join from the node set): the crawl-frontier
    summary — how concentrated is the link mass. One shuffle-on-dst
    count, one broadcast-scale left join, one tiny histogram agg."""
    d, edges = _graph(t)
    indeg = edges.groupBy("dst").agg(F.count(F.lit(1)).alias("in_deg"))
    per_node = d.join(
        indeg, d.doc_id == indeg.dst, "left"
    ).select("doc_id", F.coalesce("in_deg", F.lit(0)).alias("in_deg"))
    return (
        per_node.groupBy("in_deg")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("in_deg")
    )


def pagerank_2iter(spark: SparkSession, t, k: int = 20) -> DataFrame:
    """Two power iterations of PageRank (damping 0.85) over the derived
    link graph; top-k nodes by rounded rank. No dangling-mass term: a
    node is dangling only if all 3 emitted edges self-collide mod N
    (P ~ N^-2 per node — none exist at any test SF, and both renders
    share the exact same edge semantics, so the twin stays
    value-identical regardless); the standard dangling-sum term is the
    documented production add-on. The per-dst contribution sum is a
    sorted sequential fold (see module docstring) — bit-identical
    across engines."""
    d, edges = _graph(t)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ed = edges.join(deg, "src")
    pr = d.select(
        "doc_id",
        (F.lit(1.0) / F.col("n").cast("double")).alias("pr"),
    )
    base = d.select(
        "doc_id",
        (F.lit(1.0 - PR_DAMPING) / F.col("n").cast("double")).alias(
            "base"
        ),
    )
    for _ in range(PR_ITERS):
        contrib = (
            ed.join(pr.withColumnRenamed("doc_id", "src"), "src")
            .groupBy("dst")
            .agg(
                F.aggregate(
                    F.sort_array(
                        F.collect_list(
                            F.struct(
                                "src",
                                (
                                    F.col("pr")
                                    / F.col("deg").cast("double")
                                ).alias("v"),
                            )
                        )
                    ),
                    F.lit(0.0),
                    lambda acc, s: acc + s["v"],
                ).alias("c")
            )
        )
        pr = base.join(
            contrib, base.doc_id == contrib.dst, "left"
        ).select(
            "doc_id",
            (
                F.col("base")
                + F.lit(PR_DAMPING) * F.coalesce("c", F.lit(0.0))
            ).alias("pr"),
        )
    out = pr.select("doc_id", F.round("pr", 9).alias("pagerank"))
    return out.orderBy(F.desc("pagerank"), F.asc("doc_id")).limit(k)


def anchor_text_agg(spark: SparkSession, t, k: int = 50) -> DataFrame:
    """Anchor-text aggregation over the link graph: for each link
    target, the most common anchor text across its in-links plus link
    and distinct-anchor counts — the classic web-search signal (anchor
    text describes the TARGET better than its own page does; it feeds
    both ranking fields and query-expansion dictionaries).

    The synthetic corpus has no hrefs, so each derived edge's anchor is
    a deterministic token of the SOURCE doc — the token at 0-based
    index (src + dst) % len (DuckDB's 1-based indexing adds 1),
    engine-reproducible. On real
    webtext the anchor is the href's inner text from the html parse;
    everything downstream of the (src, dst, anchor) frame is unchanged.

    Scale shape: anchor extraction joins edges to source docs on src
    (co-partitioned with the doc table's own key); the (dst, anchor)
    agg map-side combines; the per-target argmax is one window over the
    reduced (dst, anchor) count frame. Top-k targets by in-link count
    bounds the emitted frame."""
    from pyspark.sql.window import Window

    from unichem2index_spark.functions.tokenize import tokens_col

    d, edges = _graph(t)
    toks = (
        t["documents"]
        .select("doc_id", tokens_col("text").alias("toks"))
        .where(F.size("toks") > 0)
    )
    anch = (
        edges.join(toks, edges.src == toks.doc_id)
        .select(
            "src",
            "dst",
            F.expr(
                "toks[CAST((src + dst) % size(toks) AS INT)]"
            ).alias("anchor"),
        )
    )
    per_pair = anch.groupBy("dst", "anchor").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("dst").orderBy(F.desc("n"), F.asc("anchor"))
    best = (
        per_pair.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("dst", F.col("anchor").alias("top_anchor"))
    )
    stats = per_pair.groupBy("dst").agg(
        F.sum("n").cast("long").alias("n_links"),
        F.count(F.lit(1)).cast("long").alias("n_anchors"),
    )
    return (
        stats.join(best, "dst")
        .select(
            F.col("dst").cast("long").alias("dst"),
            "n_links",
            "n_anchors",
            "top_anchor",
        )
        .orderBy(F.desc("n_links"), F.asc("dst"))
        .limit(k)
    )


def hits_2iter(spark: SparkSession, t, k: int = 20) -> DataFrame:
    """Two iterations of HITS (Kleinberg hubs & authorities) over the
    derived link graph, max-normalized after every half-step (the
    standard power-iteration form). h0 == 1.0, so a1 is exactly the
    in-degree in doubles; every later half-step sums the opposite
    vector over edges with the repo's sorted sequential fold (sort by
    the contributing endpoint, fold left — bit-identical across
    engines) and divides by the vector max (IEEE-exact).

    Scale shape: identical to :func:`pagerank_2iter` — each half-step
    is one shuffle-on-endpoint aggregate plus a co-partitioned join
    back; the max is a scalar reduce broadcast into the next step; no
    collect, no driver-side adjacency. Top-k by (authority, hub).
    """
    d, edges = _graph(t)
    nodes = d.select("doc_id")

    def norm(vec: DataFrame, col: str) -> DataFrame:
        """Full node frame (missing -> 0.0), divided by the max."""
        full = nodes.join(vec, "doc_id", "left").select(
            "doc_id", F.coalesce(col, F.lit(0.0)).alias(col)
        )
        mx = full.agg(F.max(col).alias("mx"))
        return full.crossJoin(F.broadcast(mx)).select(
            "doc_id", (F.col(col) / F.col("mx")).alias(col)
        )

    def fold(vec: DataFrame, col: str, frm: str, to: str) -> DataFrame:
        """out(to) = sum over edges of vec(frm), sorted-fold by frm."""
        return (
            edges.join(vec.withColumnRenamed("doc_id", frm), frm)
            .groupBy(F.col(to).alias("doc_id"))
            .agg(
                F.aggregate(
                    F.sort_array(
                        F.collect_list(
                            F.struct(F.col(frm), F.col(col).alias("v"))
                        )
                    ),
                    F.lit(0.0),
                    lambda acc, s: acc + s["v"],
                ).alias(col)
            )
        )

    # iteration 1: a1 from h0=1 (== in-degree), then h1 from a1
    a = norm(
        edges.groupBy(F.col("dst").alias("doc_id")).agg(
            F.count(F.lit(1)).cast("double").alias("auth")
        ),
        "auth",
    )
    h = norm(fold(a.withColumnRenamed("auth", "hub"), "hub", "dst", "src"), "hub")
    # iteration 2
    a = norm(fold(h.withColumnRenamed("hub", "auth"), "auth", "src", "dst"), "auth")
    h = norm(fold(a.withColumnRenamed("auth", "hub"), "hub", "dst", "src"), "hub")

    return (
        a.join(h, "doc_id")
        .select(
            "doc_id",
            F.round("auth", 9).alias("authority"),
            F.round("hub", 9).alias("hub"),
        )
        .orderBy(F.desc("authority"), F.desc("hub"), F.asc("doc_id"))
        .limit(k)
    )


def triangle_count(spark: SparkSession, t) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient over the
    undirected link graph — the classic web-graph cohesion metrics
    (spam farms and mirror clusters show up as dense triangles; the
    MapReduce formulation is Cohen 2009, Suri & Vassilvitskii WWW'11).
    A triangle is counted ONCE as an ordered triple a<b<c via two joins
    over the a<b edge list, then credited back to all three corners;
    clustering = 2T / (d·(d−1)) for degree ≥ 2, exact integers until
    the one rounded divide.

    Scale note: the production guard for skew is degree-ordering (join
    low-degree endpoints first — Suri's trick); the plan here is the
    same two hash joins that trick feeds, and the synthetic 3-out
    graph's max degree is log-bounded so the direct join is safe at any
    SF of this fixture."""
    d, edges = _graph(t)
    e = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    ab, bc, ac = e.alias("ab"), e.alias("bc"), e.alias("ac")
    tri = (
        ab.join(bc, F.col("ab.b") == F.col("bc.a"))
        .join(
            ac,
            (F.col("ac.a") == F.col("ab.a"))
            & (F.col("ac.b") == F.col("bc.b")),
        )
        .select(
            F.col("ab.a").alias("x"),
            F.col("ab.b").alias("y"),
            F.col("bc.b").alias("z"),
        )
    )
    corners = (
        tri.select(F.col("x").alias("node"))
        .union(tri.select(F.col("y").alias("node")))
        .union(tri.select(F.col("z").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    degs = (
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    out = (
        d.select("doc_id")
        .join(degs, d["doc_id"] == degs["node"], "left")
        .drop("node")
        .join(corners, d["doc_id"] == corners["node"], "left")
        .drop("node")
        .select(
            "doc_id",
            F.coalesce("degree", F.lit(0)).cast("long").alias("degree"),
            F.coalesce("n_triangles", F.lit(0))
            .cast("long")
            .alias("n_triangles"),
        )
    )
    clus = F.when(
        F.col("degree") >= 2,
        F.round(
            F.lit(2.0)
            * F.col("n_triangles").cast("double")
            / (
                F.col("degree").cast("double")
                * (F.col("degree").cast("double") - F.lit(1.0))
            ),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return out.withColumn("clustering", clus).orderBy("doc_id")


def salsa_2iter(spark: SparkSession, t, k: int = 20) -> DataFrame:
    """Two iterations of SALSA (Lempel & Moran WWW'00 "Stochastic
    Approach for Link-Structure Analysis") over the derived link
    graph — the degree-normalized cousin of HITS that powered
    production web search link features (e.g. the classic
    query-dependent neighborhood rankers): where HITS sums raw
    opposite-vector mass over edges (TKC-drift-prone), SALSA walks a
    RANDOM in/out link, so every contribution is divided by the
    contributing node's degree:

        h(i) = sum over i->j of a(j) / indeg(j)
        a(j) = sum over i->j of h(i) / outdeg(i)

    a0 == 1.0, max-normalized after every half-step — the exact
    discipline of :func:`hits_2iter` so the two operators differ ONLY
    in the degree normalization (the point of the comparison; on this
    graph SALSA's authority order visibly diverges from HITS' wherever
    a high-out-degree hub inflates HITS mass).

    Float determinism: each per-node sum is the repo's sorted
    sequential fold (sort by contributing endpoint, fold left); the
    degree divides are IEEE-exact same-shape ops. round(9) at emit.

    Scale shape: identical to hits_2iter — each half-step is one
    shuffle-on-endpoint aggregate plus a co-partitioned join back;
    degree frames are computed once and reused; no collect, no
    driver-side adjacency."""
    d, edges = _graph(t)
    nodes = d.select("doc_id")
    outdeg = edges.groupBy(F.col("src").alias("doc_id")).agg(
        F.count(F.lit(1)).cast("double").alias("odeg")
    )
    indeg = edges.groupBy(F.col("dst").alias("doc_id")).agg(
        F.count(F.lit(1)).cast("double").alias("ideg")
    )

    def norm(vec: DataFrame, col: str) -> DataFrame:
        full = nodes.join(vec, "doc_id", "left").select(
            "doc_id", F.coalesce(col, F.lit(0.0)).alias(col)
        )
        mx = full.agg(F.max(col).alias("mx"))
        return full.crossJoin(F.broadcast(mx)).select(
            "doc_id", (F.col(col) / F.col("mx")).alias(col)
        )

    def fold(vec: DataFrame, col: str, deg: DataFrame, dcol: str,
             frm: str, to: str) -> DataFrame:
        """out(to) = sum over edges of vec(frm)/deg(frm), sorted fold."""
        v = (
            vec.join(deg, "doc_id")
            .select(
                F.col("doc_id").alias(frm),
                (F.col(col) / F.col(dcol)).alias("v"),
            )
        )
        return (
            edges.join(v, frm)
            .groupBy(F.col(to).alias("doc_id"))
            .agg(
                F.aggregate(
                    F.sort_array(
                        F.collect_list(F.struct(F.col(frm), F.col("v")))
                    ),
                    F.lit(0.0),
                    lambda acc, s: acc + s["v"],
                ).alias(col)
            )
        )

    a = nodes.select("doc_id", F.lit(1.0).alias("auth"))
    # iteration 1: h1 from a0 (degree-normalized), then a1 from h1
    h = norm(
        fold(a.withColumnRenamed("auth", "hub"), "hub",
             indeg, "ideg", "dst", "src"),
        "hub",
    )
    a = norm(
        fold(h.withColumnRenamed("hub", "auth"), "auth",
             outdeg, "odeg", "src", "dst"),
        "auth",
    )
    # iteration 2
    h = norm(
        fold(a.withColumnRenamed("auth", "hub"), "hub",
             indeg, "ideg", "dst", "src"),
        "hub",
    )
    a = norm(
        fold(h.withColumnRenamed("hub", "auth"), "auth",
             outdeg, "odeg", "src", "dst"),
        "auth",
    )
    return (
        a.join(h, "doc_id")
        .select(
            "doc_id",
            F.round("auth", 9).alias("authority"),
            F.round("hub", 9).alias("hub"),
        )
        .orderBy(F.desc("authority"), F.desc("hub"), F.asc("doc_id"))
        .limit(k)
    )
