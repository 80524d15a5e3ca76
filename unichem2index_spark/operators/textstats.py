"""Text-analysis operators for a training-data pipeline: language ID,
quality scoring, token counting, document fingerprinting.

All JVM-side expressions (no Python workers); each has an exact DuckDB
oracle twin in ``__spark_entry__.oracle_sql``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from unichem2index_spark.functions.hashing import FP_MULT, MOD
from unichem2index_spark.functions.tokenize import tokens_col
from unichem2index_spark.operators.dedup import vocab_ids

# Marker-word sets for the n-gram/stopword language heuristic. The corpus
# vocabulary is English-ish, so real-language discrimination is synthetic —
# what matters is that the heuristic is deterministic and engine-identical.
EN_MARKERS = ["the", "a", "of", "and", "is"]
DE_MARKERS = ["der", "die", "das", "und", "ist"]
STOPWORDS = ["the", "a", "of", "and", "is", "to", "in"]


def _tok(d: DataFrame) -> DataFrame:
    return d.select("doc_id", tokens_col("text").alias("tokens"), "text")


def lang_id(spark: SparkSession, t) -> DataFrame:
    """Marker-word-ratio language ID: en vs de vs unknown."""
    d = _tok(t["documents"])
    en = F.size(F.filter("tokens", lambda x: x.isin(EN_MARKERS)))
    de = F.size(F.filter("tokens", lambda x: x.isin(DE_MARKERS)))
    n = F.size("tokens")
    return d.select(
        "doc_id",
        F.round(en / F.greatest(n, F.lit(1)), 6).alias("en_ratio"),
        F.when(en > de, "en").when(de > en, "de").otherwise("und").alias(
            "pred_lang"
        ),
    ).orderBy("doc_id")


def quality_score(spark: SparkSession, t) -> DataFrame:
    """Heuristic quality score: token count, mean token length, stopword
    ratio, alpha-char ratio → linear score (deterministic double math)."""
    d = _tok(t["documents"])
    n = F.size("tokens")
    tok_chars = F.aggregate(
        F.transform("tokens", lambda x: F.length(x).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    stop = F.size(F.filter("tokens", lambda x: x.isin(STOPWORDS)))
    alpha = F.length(F.regexp_replace("text", "[^a-zA-Z]", ""))
    out = d.select(
        "doc_id",
        n.alias("n_tokens"),
        F.round(tok_chars / F.greatest(n.cast("double"), F.lit(1.0)), 6).alias(
            "mean_tok_len"
        ),
        F.round(
            stop.cast("double") / F.greatest(n.cast("double"), F.lit(1.0)), 6
        ).alias("stop_ratio"),
        F.round(
            alpha.cast("double")
            / F.greatest(F.length("text").cast("double"), F.lit(1.0)),
            6,
        ).alias("alpha_ratio"),
    )
    # Constant-only contributions: a float multiply of a rounded ratio can
    # land exactly on a round-half boundary where engines disagree; summing
    # exact literals is bit-identical everywhere.
    score = (
        F.when(F.col("n_tokens").between(20, 400), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when(F.col("stop_ratio").between(0.05, 0.6), F.lit(0.3)).otherwise(
            F.lit(0.0)
        )
        + F.when(F.col("mean_tok_len").between(3.0, 8.0), F.lit(0.3)).otherwise(
            F.lit(0.0)
        )
    )
    return out.withColumn("quality", F.round(score, 6)).orderBy("doc_id")


def token_counts(spark: SparkSession, t) -> DataFrame:
    """Token counting two ways: whitespace split vs regex tokenizer."""
    d = t["documents"]
    ws = F.size(F.split(F.trim("text"), r"\s+"))
    rx = F.size(tokens_col("text"))
    return d.select(
        "doc_id",
        ws.alias("ws_tokens"),
        rx.alias("regex_tokens"),
        F.length("text").alias("n_chars_actual"),
    ).orderBy("doc_id")


def doclen_percentiles(spark: SparkSession, t) -> DataFrame:
    """ES `percentiles` aggregation analog over document length (the
    corpus-shape summary every index operator looks at first).

    Exact interpolated percentiles via Spark's `percentile` — the same
    linear (n-1)*q interpolation DuckDB's quantile_cont uses, so the
    oracle is value-hash identical. At 100 TB swap in
    `approx_percentile` (t-digest, single-pass, mergeable — what ES
    itself computes); the exact form here doubles as its oracle."""
    dl = t["documents"].select(
        F.size(tokens_col("text")).cast("long").alias("doclen")
    )
    return dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.expr("percentile(doclen, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(doclen, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(doclen, 0.99)"), 6).alias("p99"),
        F.min("doclen").alias("min_doclen"),
        F.max("doclen").alias("max_doclen"),
    )


def significant_terms(
    spark: SparkSession, t, where: str = "lang = 'de'", size: int = 25,
    min_fg_df: int = 3,
) -> DataFrame:
    """ES `significant_terms` aggregation analog: terms overrepresented in
    a foreground subset (docs matching ``where``) vs the whole corpus,
    scored with ES's default JLH heuristic
    ``(fgPct - bgPct) * fgPct / bgPct`` over document frequencies.

    Scale shape (single-pass, r3 verdict item 4): the foreground flag is
    computed per DOC before the explode, so ONE distinct-(doc, term)
    scan feeds ONE conditional hash agg — fg_df and bg_df come out of
    the same groupBy (no second explode, no term join). The n_fg/n_bg
    corpus counts fold into one extra skinny agg over the docs table.
    ``min_fg_df`` is ES's min_doc_count guard against one-doc flukes."""
    d = t["documents"]
    fg_flag = F.coalesce(F.expr(where).cast("boolean"), F.lit(False))
    totals = d.agg(
        F.count(F.lit(1)).alias("n_bg"),
        F.count(F.when(fg_flag, 1)).alias("n_fg"),
    ).collect()[0]
    n_bg, n_fg = int(totals.n_bg), int(totals.n_fg)
    if n_fg == 0:
        return spark.createDataFrame(
            [], "term string, fg_df long, bg_df long, score double"
        )
    tokset = d.select(
        "doc_id",
        fg_flag.alias("_fg"),
        F.explode(tokens_col("text")).alias("term"),
    ).distinct()
    stats = (
        tokset.groupBy("term")
        .agg(
            F.count(F.when(F.col("_fg"), 1)).alias("fg_df"),
            F.count(F.lit(1)).alias("bg_df"),
        )
        .where(F.col("fg_df") >= min_fg_df)
    )
    fg_pct = F.col("fg_df").cast("double") / F.lit(float(n_fg))
    bg_pct = F.col("bg_df").cast("double") / F.lit(float(n_bg))
    return (
        stats.select(
            "term",
            "fg_df",
            "bg_df",
            F.round((fg_pct - bg_pct) * fg_pct / bg_pct, 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("term"))
        .limit(size)
    )


def term_suggest(
    spark: SparkSession, t, query_term: str = "merg", max_dist: int = 2,
    size: int = 10,
) -> DataFrame:
    """ES term-suggester analog: vocabulary terms within ``max_dist``
    Levenshtein edits of the query, ranked (dist asc, df desc, term asc).

    Scale shape: the vocabulary+df agg is the only shuffle; the edit
    distance runs map-side against ONE literal (JVM levenshtein) behind a
    length-window pre-filter, so no all-pairs anything. Batch suggesting
    many misspellings would block on (length, first char) and broadcast
    the query list — same plan family."""
    d = t["documents"]
    vocab = (
        d.select("doc_id", F.explode(tokens_col("text")).alias("term"))
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    qlen = len(query_term)
    return (
        vocab.where(
            (F.length("term") >= qlen - max_dist)
            & (F.length("term") <= qlen + max_dist)
        )
        .select(
            "term",
            "df",
            F.levenshtein(F.col("term"), F.lit(query_term)).alias("dist"),
        )
        .where((F.col("dist") >= 1) & (F.col("dist") <= max_dist))
        .orderBy(F.asc("dist"), F.desc("df"), F.asc("term"))
        .limit(size)
    )


def doc_fingerprint(spark: SparkSession, t) -> DataFrame:
    """Position-weighted rolling fingerprint over dense token ids —
    order-sensitive, engine-identical integer math (functions.hashing)."""
    d = _tok(t["documents"])
    ids = vocab_ids(d.select("doc_id", "tokens"))
    pos = d.select("doc_id", F.posexplode("tokens").alias("pos", "term"))
    # No broadcast hint: AQE broadcasts small vocabularies, shuffle-joins
    # web-scale ones.
    weighted = pos.join(ids, "term").select(
        "doc_id", ((F.col("pos") + 1) * (F.col("token_id") + 1)).alias("w")
    )
    return (
        weighted.groupBy("doc_id")
        .agg(((F.sum("w") * F.lit(FP_MULT)) % F.lit(MOD)).alias("fingerprint"))
        .orderBy("doc_id")
    )
