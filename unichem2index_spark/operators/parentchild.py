"""ES parent-child join queries (`has_child` / `has_parent`) re-expressed
as Spark joins over the orders (parent) / lineitem (child) tables.

In Elasticsearch a `join` field co-locates children with their parent via
routing, and `has_child`/`has_parent` run a per-shard join at query time
(reference behavior: the query surface the reference delegates to ES —
extractor posts parents and children as separate doc types; see
extractor/sources.go:70-74 for the 2-key dim shape these tables mirror).
Spark-first design: the child-side predicate + aggregation collapses the
big child table to one row per matching parent BEFORE the join, so the
join input is the small aggregated frame — broadcastable, no shuffle of
the parent table. At 100 TB the child filter is pushed to the parquet
scan and the groupBy is a partial-agg shuffle on the join key only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def has_child_topk(
    spark,
    t,
    k: int = 20,
    min_children: int = 2,
    qty: float = 30.0,
    flag: str = "R",
) -> DataFrame:
    """ES `has_child` (score_mode=sum, min_children): parents whose
    children match the child query, scored by the SUM of matching
    children's scores (child score analog: net extended price).

    Plan shape: filter+partial-agg on lineitem (map-side combine, shuffle
    carries only (orderkey, count, sum)) -> broadcast the aggregated
    child frame into orders. The orders scan never shuffles.
    """
    li, o = t["lineitem"], t["orders"]
    kids = (
        li.where((F.col("l_quantity") >= qty) & (F.col("l_returnflag") == flag))
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_children"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("child_score"),
        )
        .where(F.col("n_children") >= min_children)
    )
    return (
        o.join(F.broadcast(kids), o.o_orderkey == kids.l_orderkey)
        .select("o_orderkey", "o_orderpriority", "n_children", "child_score")
        .orderBy(F.desc("child_score"), F.asc("o_orderkey"))
        .limit(k)
    )


def has_parent_topk(
    spark,
    t,
    k: int = 20,
    priority: str = "1-URGENT",
    min_price: float = 400000.0,
) -> DataFrame:
    """ES `has_parent`: children whose parent matches the parent query;
    each child inherits the PARENT's score (score=true semantics —
    parent score analog: o_totalprice).

    Plan shape: the selective parent predicate reaches the orders scan
    (pushed filter), the surviving parent frame is broadcast into the
    child table — lineitem never shuffles.
    """
    o, li = t["orders"], t["lineitem"]
    parents = o.where(
        (F.col("o_orderpriority") == priority) & (F.col("o_totalprice") > min_price)
    ).select("o_orderkey", "o_totalprice")
    return (
        li.join(F.broadcast(parents), li.l_orderkey == parents.o_orderkey)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("o_totalprice"), 2).alias("parent_score"),
        )
        .orderBy(F.desc("parent_score"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .limit(k)
    )


def children_agg_by_parent_bucket(spark, t, k: int = 10) -> DataFrame:
    """ES `children` aggregation: bucket parents (by o_orderpriority),
    then step down to the child scope and aggregate child metrics per
    parent bucket — one join keyed on the parent key, partial-agg
    before AND after (the child metrics shuffle carries only
    (priority, count, sum))."""
    o, li = t["orders"], t["lineitem"]
    # Exact-cents trick (float-exactness recipe): per-row double math is one
    # shared expression tree, then the SUM is over exact integers — so the
    # bucket totals are order-independent and identical across engines.
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0)
            .cast("long")
        ).alias("rev_cents"),
    )
    return (
        o.join(per_order, o.o_orderkey == per_order.l_orderkey, "left")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.sum(F.coalesce(F.col("n_lines"), F.lit(0))).alias("n_children"),
            F.round(
                F.sum(F.coalesce(F.col("rev_cents"), F.lit(0))) / 100.0, 2
            ).alias("child_revenue"),
        )
        .orderBy("priority")
        .limit(k)
    )


def parent_agg_by_child_bucket(spark, t, k: int = 10) -> DataFrame:
    """ES `parent` aggregation (the `children` agg's mirror, mapped to
    the same orders/lineitem parent-child pair): bucket CHILD docs (by
    l_returnflag), then step UP to the parent scope — each parent
    counts ONCE per bucket no matter how many of its children landed
    there, and parent metrics aggregate over that deduplicated parent
    set. Emits (returnflag, n_parents, parent_revenue).

    Scale shape: the child->parent-key projection is deduplicated
    map-side FIRST ((flag, orderkey) distinct — the shuffle carries
    one row per parent per bucket, not per child), then one equi-join
    to the parent table and a partial-agg per bucket. Same
    exact-cents recipe as children_agg_by_parent_bucket so bucket
    totals are order-independent across engines."""
    o, li = t["orders"], t["lineitem"]
    pk = li.select(
        F.col("l_returnflag").alias("returnflag"),
        F.col("l_orderkey").alias("orderkey"),
    ).distinct()
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    return (
        pk.join(o.select(
            F.col("o_orderkey").alias("orderkey"),
            cents.alias("price_cents"),
        ), "orderkey")
        .groupBy("returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_parents"),
            F.round(F.sum("price_cents") / 100.0, 2).alias(
                "parent_revenue"
            ),
        )
        .orderBy("returnflag")
        .limit(k)
    )
