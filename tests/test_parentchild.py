"""Structural invariants for the ES parent-child join queries beyond the
DuckDB hash check: min_children is actually enforced, child scores are
sums over exactly the matching children, and has_parent children all
carry a genuinely matching parent.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from unichem2index_spark.operators import parentchild
from unichem2index_spark.sources.tables import load_tables

SF = "/root/testdata/sf0.001"


def test_has_child_min_children_and_score(spark):
    t = load_tables(spark, SF)
    rows = parentchild.has_child_topk(spark, t, k=20, min_children=2).collect()
    assert rows
    # Recompute one parent's child set independently.
    li = t["lineitem"]
    for r in rows[:3]:
        kids = (
            li.where(
                (F.col("l_orderkey") == r.o_orderkey)
                & (F.col("l_quantity") >= 30)
                & (F.col("l_returnflag") == "R")
            )
            .select(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("s")
            )
            .collect()
        )
        assert len(kids) == r.n_children >= 2
        assert abs(sum(k.s for k in kids) - r.child_score) < 0.01
    # Descending by score with doc-id tiebreak.
    scores = [(-(r.child_score), r.o_orderkey) for r in rows]
    assert scores == sorted(scores)


def test_has_parent_inherits_parent_score(spark):
    t = load_tables(spark, SF)
    rows = parentchild.has_parent_topk(spark, t, k=20).collect()
    assert rows
    parents = {
        r.o_orderkey: r.o_totalprice
        for r in t["orders"]
        .where(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_totalprice") > 400000)
        )
        .collect()
    }
    for r in rows:
        assert r.l_orderkey in parents
        assert abs(r.parent_score - round(parents[r.l_orderkey], 2)) < 1e-9


def test_children_agg_totals_reconcile(spark):
    t = load_tables(spark, SF)
    rows = parentchild.children_agg_by_parent_bucket(spark, t).collect()
    assert len(rows) == 5  # one bucket per priority
    # Bucket child counts must telescope to the lineitems whose order exists.
    total_children = sum(r.n_children for r in rows)
    joined = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .count()
    )
    assert total_children == joined


def test_parent_agg_counts_each_parent_once(spark):
    from collections import defaultdict

    from unichem2index_spark.operators.parentchild import (
        parent_agg_by_child_bucket,
    )
    from unichem2index_spark.sources.tables import load_tables
    from tests.conftest import SF_SMOKE

    t = load_tables(spark, SF_SMOKE)
    li = t["lineitem"].select("l_returnflag", "l_orderkey").collect()
    price = {
        r.o_orderkey: round(r.o_totalprice * 100)
        for r in t["orders"].select("o_orderkey", "o_totalprice").collect()
    }
    parents = defaultdict(set)
    for r in li:
        parents[r.l_returnflag].add(r.l_orderkey)
    got = {r.returnflag: r for r in
           parent_agg_by_child_bucket(spark, t).collect()}
    assert set(got) == set(parents)
    for flag, oks in parents.items():
        row = got[flag]
        # each parent exactly once, regardless of its child count
        assert row.n_parents == len(oks)
        assert abs(
            row.parent_revenue
            - round(sum(price[o] for o in oks) / 100.0, 2)
        ) < 1e-6
