"""Reference-semantics parity operators (SURVEY.md §2.2-§2.7) expressed as
idiomatic DataFrame programs over the driver testdata tables.

Each function takes (spark, tables) where ``tables`` is the dict from
``sources.tables.load_tables`` and returns a DataFrame whose column names
match the DuckDB oracle SQL in ``__spark_entry__.oracle_sql`` exactly.
Determinism rules: every ORDER BY carries a full tie-break; every float is
rounded at the emit boundary; LIMIT boundaries are never count-ambiguous.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql import Window as W

from unichem2index_spark.functions.keysplit import fan_out_components, split_key


# --------------------------------------------------------------- joins (J*)
def threeway_join(spark, t) -> DataFrame:
    """J1: fact ⋈ fact ⋈ dim (Docker/config.yaml:45-55 analog).
    lineitem ⋈ orders shuffle on orderkey; customer→nation broadcast."""
    li, o, c, n = t["lineitem"], t["orders"], t["customer"], t["nation"]
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue"),
        )
        .orderBy("nation")
    )


def semi_join_recent(spark, t) -> DataFrame:
    """J2/P7: semi-join via IN-subquery (extractor/init.go:195-200 analog) —
    customers having an order since a fixed date."""
    o, c = t["orders"], t["customer"]
    recent = o.where(F.col("o_orderdate") >= F.lit("1997-01-01")).select("o_custkey")
    return (
        c.join(recent, c.c_custkey == recent.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


def dim_join_2key(spark, t) -> DataFrame:
    """J3: two-key dim equi-join (extractor/sources.go:70-74 analog):
    per-(orderkey, partkey) line stats joined back on both keys."""
    li = t["lineitem"]
    dim = li.groupBy("l_orderkey", "l_partkey").agg(
        F.sum("l_quantity").alias("qty_total")
    )
    return (
        li.join(dim, ["l_orderkey", "l_partkey"])
        .where(F.col("qty_total") > 90)
        .groupBy("l_orderkey", "l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.first("qty_total"), 2).alias("qty_total"),
        )
        .orderBy("l_orderkey", "l_partkey")
    )


def map_lookup_join(spark, t) -> DataFrame:
    """J4/S7: enrich a small dim with per-key doc counts via broadcast hash
    join (extractor/sources.go:270; counts map built loader.go:364-376)."""
    d = t["documents"]
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("doc_count"))
    dim = d.select("source", "lang").distinct().groupBy("source").agg(
        F.count(F.lit(1)).alias("n_langs")
    )
    return (
        dim.join(F.broadcast(counts), "source", "left")
        .select("source", "n_langs", F.coalesce("doc_count", F.lit(0)).alias("doc_count"))
        .orderBy("source")
    )


# --------------------------------------------------- filters / projections
def filter_flag_coerce(spark, t) -> DataFrame:
    """P2+P4: equality filter on a flag + int→bool coercion
    (extractor/extractor.go:208,141-154 analog)."""
    e = t["events"]
    return (
        e.where(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            (F.col("value") > 50).alias("is_big"),
            F.round("value", 2).alias("value"),
        )
        .orderBy("event_id")
    )


def null_defaulting(spark, t) -> DataFrame:
    """P5: NULL defaulting (sql.NullString zero-value analog,
    extractor/extractor.go:165-168)."""
    e = t["events"]
    return (
        e.select(
            "event_id",
            F.coalesce(F.col("props"), F.lit("{}")).alias("props_def"),
            F.coalesce(F.col("value"), F.lit(0.0)).alias("value_def"),
        )
        .orderBy("event_id")
        .limit(2000)
    )


def sourceless_flag(spark, t) -> DataFrame:
    """P6: derived is_sourceless flag (len(Sources)==0,
    extractor/extractor.go:233-236) — customers without orders."""
    c, o = t["customer"], t["orders"]
    agg = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    return (
        c.join(agg, c.c_custkey == agg.o_custkey, "left")
        .select(
            "c_custkey",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            (F.coalesce("n_orders", F.lit(0)) == 0).alias("is_sourceless"),
        )
        .orderBy("c_custkey")
    )


def range_scan(spark, t) -> DataFrame:
    """P1/S1: range-partition predicate, pushed to the parquet scan
    (Docker/config.yaml:49-53 analog)."""
    return (
        t["documents"]
        .where(F.col("doc_id").between(100, 299))
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    )


# ------------------------------------------------------------ aggregations
def group_collect(spark, t) -> DataFrame:
    """A1: group-adjacent fold → order-free hash agg with deterministic
    list rendering (extractor/extractor.go:202-228 analog)."""
    o = t["orders"]
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.concat_ws(",", F.sort_array(F.collect_list("o_orderstatus")))
            .alias("statuses"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
        )
        .where(F.col("n_orders") >= 3)
        .orderBy("o_custkey")
    )


def count_distinct_keys(spark, t) -> DataFrame:
    """A2: COUNT(DISTINCT key) validation count (extractor/init.go:62-69)."""
    return t["orders"].agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def max_dates(spark, t) -> DataFrame:
    """A4+A5: two MAX aggs + MIN-of-maxes (extractor/loader.go:288-331):
    oldest = least(max(ts of purchases), max(ts of clicks))."""
    e = t["events"]
    m = e.agg(
        F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "max_purchase_ts"
        ),
        F.max(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
            "max_click_ts"
        ),
    )
    return m.select(
        "max_purchase_ts",
        "max_click_ts",
        F.least("max_purchase_ts", "max_click_ts").alias("oldest_ts"),
    )


def terms_agg(spark, t) -> DataFrame:
    """A6: terms aggregation — count per key, ordered, top-N with
    deterministic tie-break (extractor/loader.go:340-379)."""
    return (
        t["events"]
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy(F.desc("doc_count"), F.asc("event_type"))
        .limit(3000)
    )


def tpch_q1(spark, t) -> DataFrame:
    """Pricing-summary agg (generic A-family workout at scale)."""
    li = t["lineitem"]
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ------------------------------------------------- window / top-k / limits
def topn_per_group(spark, t) -> DataFrame:
    """W-family: row_number over full deterministic ordering — top-3
    orders per status by price."""
    o = t["orders"]
    w = W.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_orderstatus", "rn", "o_orderkey",
                F.round("o_totalprice", 2).alias("o_totalprice"))
        .orderBy("o_orderstatus", "rn")
    )


def last_key_top1(spark, t) -> DataFrame:
    """W2: top-1 by key desc (last-indexed UCI, loader.go:256-286)."""
    return (
        t["documents"]
        .orderBy(F.desc("doc_id"))
        .limit(1)
        .select("doc_id", "source")
    )


# ------------------------------------------------------- set ops (E1)
def reconcile_counts(spark, t) -> DataFrame:
    """E1: source-vs-index reconciliation (extractor/init.go:44-126):
    anti-join count must be 0 when the 'index' covers the source."""
    o, c = t["orders"], t["customer"]
    missing = (
        o.select("o_custkey")
        .distinct()
        .join(c, o.o_custkey == c.c_custkey, "left_anti")
    )
    return missing.agg(F.count(F.lit(1)).alias("missing_keys"))


# ----------------------------------------------- F1-F5 layered-key splitter
_KEY_EXPR = (
    "concat('KEY=1S/C', cast(doc_id % 40 + 1 as string), "
    "'H', cast(doc_id % 60 + 1 as string), "
    "case when doc_id % 5 = 0 then concat('.', cast(doc_id % 3 + 2 as string), "
    "'C2H4') else '' end, "
    "'/c', cast(doc_id % 99 + 1 as string), "
    "case when doc_id % 2 = 0 then concat('/h', cast(doc_id % 20 + 1 as string), 'H') "
    "else '' end, "
    "case when doc_id % 4 = 0 then '/q+1' else '' end, "
    "case when doc_id % 6 = 0 then concat('/b1/t2/m01/s1') else '' end)"
)


def with_layered_key(d: DataFrame) -> DataFrame:
    """Derive a deterministic layered key per doc (same expr as the SQL
    oracle — see oracle_sql['key_split'])."""
    return d.select("doc_id", F.expr(_KEY_EXPR).alias("key"))


def key_split(spark, t) -> DataFrame:
    """F1+F2+F5: layered regex parse + derived concat fields + round-trip
    flag (extractor/inchiDivider.go:225-256, Inchi.go:24-61)."""
    keyed = with_layered_key(t["documents"])
    ver = F.regexp_extract("key", r"^KEY=([^/]+)", 1)
    formula = F.regexp_extract("key", r"^KEY=[^/]+/([^/]*)", 1)
    c_l = F.regexp_extract("key", r"/c([^/]*)", 1)
    h_l = F.regexp_extract("key", r"/h([^/]*)", 1)
    q_l = F.regexp_extract("key", r"/q([^/]*)", 1)
    b_l = F.regexp_extract("key", r"/b([^/]*)", 1)
    t_l = F.regexp_extract("key", r"/t([^/]*)", 1)
    m_l = F.regexp_extract("key", r"/m([^/]*)", 1)
    s_l = F.regexp_extract("key", r"/s([^/]*)", 1)
    rebuilt = F.concat(
        F.lit("KEY="), ver,
        F.when(formula != "", F.concat(F.lit("/"), formula)).otherwise(""),
        F.when(c_l != "", F.concat(F.lit("/c"), c_l)).otherwise(""),
        F.when(h_l != "", F.concat(F.lit("/h"), h_l)).otherwise(""),
        F.when(q_l != "", F.concat(F.lit("/q"), q_l)).otherwise(""),
        F.when(b_l != "", F.concat(F.lit("/b"), b_l)).otherwise(""),
        F.when(t_l != "", F.concat(F.lit("/t"), t_l)).otherwise(""),
        F.when(m_l != "", F.concat(F.lit("/m"), m_l)).otherwise(""),
        F.when(s_l != "", F.concat(F.lit("/s"), s_l)).otherwise(""),
    )
    return keyed.select(
        "doc_id",
        ver.alias("version"),
        formula.alias("formula"),
        c_l.alias("layer_c"),
        h_l.alias("layer_h"),
        q_l.alias("layer_q"),
        F.concat(b_l, t_l, m_l, s_l).alias("full_stereo"),
        (rebuilt == F.col("key")).alias("roundtrip_ok"),
    ).orderBy("doc_id")


_COMPONENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("component_idx", T.IntegerType()),
        T.StructField("formula", T.StringType()),
        T.StructField("layer_c", T.StringType()),
        T.StructField("layer_m", T.StringType()),
    ]
)


def key_components(spark, t) -> DataFrame:
    """F3+F4: multi-component expansion + fan-out as an Arrow UDTF
    (mapInPandas; extractor/inchiDivider.go:58-223). Non-SQL-expressible —
    pytest-verified against the pure splitter; driver records rows-only."""
    keyed = with_layered_key(t["documents"])

    def fan(batches):
        for pdf in batches:
            rows = []
            for doc_id, key in zip(pdf["doc_id"], pdf["key"]):
                sk = split_key(key)
                if sk is None:
                    continue
                for comp in fan_out_components(sk):
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "component_idx": comp["component_idx"],
                            "formula": comp["formula"],
                            "layer_c": comp["c"],
                            "layer_m": comp["m"],
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _COMPONENT_SCHEMA.fields]
            )

    return keyed.mapInPandas(fan, _COMPONENT_SCHEMA).orderBy(
        "doc_id", "component_idx"
    )


# ES type mapping for field_caps: Spark simpleString -> ES field type.
_ES_TYPE = {
    "bigint": "long",
    "int": "integer",
    "double": "double",
    "float": "float",
    "timestamp": "date",
    "timestamp_ntz": "date",
    "array<float>": "dense_vector",
    "boolean": "boolean",
    "binary": "binary",
}
_AGGREGATABLE = {"keyword", "long", "integer", "double", "float", "date"}


def field_caps(
    spark, t, tables=("documents", "events", "embeddings")
) -> DataFrame:
    """ES `_field_caps`: per (index, field) the mapped ES type and its
    searchable/aggregatable capabilities. The Spark side derives from
    the DataFrame schema, the DuckDB oracle from the catalog DESCRIBE —
    two independent walks over two independent type systems landing on
    the same ES mapping, so the hash check verifies the type mapping
    itself. Mapping rule for strings mirrors the index template: the
    body column (named 'text') is a full-text field, every other string
    is a keyword."""
    rows = []
    for name in tables:
        for f in t[name].schema.fields:
            s = f.dataType.simpleString()
            if s == "string":
                es = "text" if f.name == "text" else "keyword"
            else:
                es = _ES_TYPE.get(s, s)
            rows.append(
                (
                    name,
                    f.name,
                    es,
                    es != "dense_vector",
                    es in _AGGREGATABLE,
                )
            )
    return spark.createDataFrame(
        rows,
        "idx string, field string, es_type string, "
        "searchable boolean, aggregatable boolean",
    ).orderBy("idx", "field")


def cube_counts(spark: SparkSession, t) -> DataFrame:
    """OLAP CUBE over (lang, source): doc counts at every grouping-set
    level with an explicit grouping id (2*grouping(lang) +
    grouping(source) — spelled out rather than grouping_id() so both
    engines share one bit order). Catalyst expands CUBE into a single
    Expand + one hash agg — one scan for all four grouping sets, which
    is the point at 100 TB (four separate GROUP BYs would be four
    scans)."""
    d = t["documents"]
    gid = (
        F.grouping("lang").cast("long") * 2
        + F.grouping("source").cast("long")
    )
    return (
        d.cube("lang", "source")
        .agg(
            gid.alias("gid"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .select(
            "gid",
            F.coalesce("lang", F.lit("*")).alias("lang_k"),
            F.coalesce("source", F.lit("*")).alias("source_k"),
            "n_docs",
        )
        .orderBy("gid", "lang_k", "source_k")
    )
