"""DuckDB oracle SQL for every SQL-expressible query in
``__spark_entry__.queries()``.

Each statement is the *same computation* as its Spark twin, expression by
expression: identical tokenizer regex, identical BM25 float expression tree,
identical hash constants (functions/hashing.py — the SQL is generated from
the same Python lists), identical rounding at emit boundaries, identical
ORDER BY tie-breaks. Tables available as DuckDB views: region nation
customer supplier part orders lineitem events documents embeddings.
"""

from __future__ import annotations

from unichem2index_spark.functions.hashing import (
    CC_BUCKET_TARGET,
    BAND_SIZE,
    FP_MULT,
    MINHASH_A,
    MINHASH_B,
    MOD,
    NUM_HASHES,
    SIMHASH_P,
)
from unichem2index_spark.functions.tokenize import TOKEN_PATTERN

TOKS = f"regexp_extract_all(lower(text), '{TOKEN_PATTERN}')"

# Shared corpus CTEs for the index family.
_TOK_CTE = f"""
tok AS (
  SELECT doc_id, len({TOKS}) AS doclen FROM documents
),
stats AS (
  SELECT count(*) AS n_docs,
         sum(doclen) AS total_tokens,
         CAST(sum(doclen) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
  FROM tok
),
post AS (
  SELECT doc_id, term, count(*) AS tf FROM (
    SELECT doc_id, unnest({TOKS}) AS term FROM documents
  ) GROUP BY doc_id, term
),
dfs AS (
  SELECT term, count(*) AS df, sum(tf) AS cf FROM post GROUP BY term
)
"""


def bm25_sql(terms: list[str], k: int) -> str:
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH {_TOK_CTE},
scored AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN dfs d USING (term)
  JOIN tok t USING (doc_id)
  CROSS JOIN stats s
  WHERE p.term IN ({inlist})
  GROUP BY p.doc_id
)
SELECT doc_id, round(score, 6) AS score
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def bm25_msm_sql(terms: list[str], k: int, min_match: int) -> str:
    """ES minimum_should_match analog: same BM25 scoring, but only docs
    matching >= min_match DISTINCT query terms are eligible (`post` is one
    row per (doc_id, term), so count(*) in the per-doc group IS the
    distinct matched-term count)."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH {_TOK_CTE},
scored AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN dfs d USING (term)
  JOIN tok t USING (doc_id)
  CROSS JOIN stats s
  WHERE p.term IN ({inlist})
  GROUP BY p.doc_id
  HAVING count(*) >= {min_match}
)
SELECT doc_id, round(score, 6) AS score
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def bm25_filtered_sql(terms: list[str], k: int, where: str) -> str:
    """ES bool (match + filter) analog: candidates restricted by a
    metadata predicate, stats/scores computed over the WHOLE corpus
    (filter contexts don't affect relevance)."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH {_TOK_CTE},
scored AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN dfs d USING (term)
  JOIN tok t USING (doc_id)
  CROSS JOIN stats s
  WHERE p.term IN ({inlist})
    AND p.doc_id IN (SELECT doc_id FROM documents WHERE {where})
  GROUP BY p.doc_id
)
SELECT doc_id, round(score, 6) AS score
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def phrase_sql(phrase: list[str], k: int) -> str:
    """Exact-phrase BM25: the phrase filter is a substring match over the
    space-joined token list (space-delimited needle with sentinel spaces ==
    consecutive-token match, exactly the positional-index adjacency test);
    scoring is the standard BM25 expression over the unique phrase terms."""
    uniq = sorted(set(phrase))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    needle = " " + " ".join(phrase) + " "
    return f"""
WITH {_TOK_CTE},
phrased AS (
  SELECT doc_id FROM documents
  WHERE position('{needle}' IN ' ' || array_to_string({TOKS}, ' ') || ' ') > 0
),
scored AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN dfs d USING (term)
  JOIN tok t USING (doc_id)
  CROSS JOIN stats s
  WHERE p.term IN ({inlist})
    AND p.doc_id IN (SELECT doc_id FROM phrased)
  GROUP BY p.doc_id
)
SELECT doc_id, round(score, 6) AS score
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


TERM_STATS = f"""
WITH {_TOK_CTE},
s AS (SELECT n_docs FROM stats)
SELECT d.term, d.df, CAST(d.cf AS BIGINT) AS cf,
       round(ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5)), 6) AS idf
FROM dfs d CROSS JOIN s
ORDER BY d.term
"""

CORPUS_STATS = f"""
WITH {_TOK_CTE}
SELECT s.n_docs, CAST(s.total_tokens AS BIGINT) AS total_tokens,
       (SELECT count(*) FROM dfs) AS vocab_size,
       round(s.avgdl, 6) AS avgdl
FROM stats s
"""

DOC_LENGTHS = f"""
SELECT doc_id, len({TOKS}) AS doclen FROM documents ORDER BY doc_id
"""

SIGNIFICANT_TERMS = f"""
WITH tokset AS (
  SELECT DISTINCT doc_id, lang, unnest({TOKS}) AS term FROM documents
),
n AS (
  SELECT (SELECT count(*) FROM documents) AS n_bg,
         (SELECT count(*) FROM documents WHERE lang = 'de') AS n_fg
),
bg AS (SELECT term, count(*) AS bg_df FROM tokset GROUP BY term),
fg AS (
  SELECT term, count(*) AS fg_df FROM tokset WHERE lang = 'de'
  GROUP BY term HAVING count(*) >= 3
)
SELECT f.term, f.fg_df, b.bg_df,
       round(
         (CAST(f.fg_df AS DOUBLE) / n.n_fg - CAST(b.bg_df AS DOUBLE) / n.n_bg)
         * (CAST(f.fg_df AS DOUBLE) / n.n_fg)
         / (CAST(b.bg_df AS DOUBLE) / n.n_bg), 6) AS score
FROM fg f JOIN bg b USING (term) CROSS JOIN n
ORDER BY score DESC, f.term ASC
LIMIT 25
"""

TERM_SUGGEST = f"""
WITH vocab AS (
  SELECT term, count(*) AS df FROM (
    SELECT DISTINCT doc_id, unnest({TOKS}) AS term FROM documents
  ) GROUP BY term
)
SELECT term, df, levenshtein(term, 'merg') AS dist
FROM vocab
WHERE length(term) BETWEEN 2 AND 6
  AND levenshtein(term, 'merg') BETWEEN 1 AND 2
ORDER BY dist ASC, df DESC, term ASC
LIMIT 10
"""

DOCLEN_PERCENTILES = f"""
WITH dl AS (SELECT len({TOKS}) AS doclen FROM documents)
SELECT count(*) AS n_docs,
       round(quantile_cont(doclen, 0.5), 6) AS p50,
       round(quantile_cont(doclen, 0.9), 6) AS p90,
       round(quantile_cont(doclen, 0.99), 6) AS p99,
       min(doclen) AS min_doclen,
       max(doclen) AS max_doclen
FROM dl
"""

POSTINGS_SAMPLE = f"""
WITH post AS (
  SELECT doc_id, term, count(*) AS tf FROM (
    SELECT doc_id, unnest({TOKS}) AS term FROM documents
  ) GROUP BY doc_id, term
)
SELECT term, doc_id, tf FROM post
WHERE term IN ('merge', 'dup')
ORDER BY term, doc_id
"""

INDEX_COUNT = "SELECT count(*) AS doc_count FROM documents"

LAST_DOC_ID = "SELECT max(doc_id) AS last_doc_id FROM documents"

COUNTS_BY_SOURCE = """
SELECT source, count(*) AS doc_count
FROM documents
GROUP BY source
ORDER BY doc_count DESC, source ASC
LIMIT 3000
"""

MAX_DATES = """
WITH m AS (
  SELECT max(CASE WHEN event_type = 'purchase' THEN ts END) AS max_purchase_ts,
         max(CASE WHEN event_type = 'click' THEN ts END) AS max_click_ts
  FROM events
)
SELECT max_purchase_ts, max_click_ts,
       least(max_purchase_ts, max_click_ts) AS oldest_ts
FROM m
"""

DATE_HISTOGRAM_PIPELINE = """
WITH hist AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         count(*) AS n_events, round(sum(value), 2) AS value_sum
  FROM events GROUP BY 1, 2
)
SELECT event_type, bucket, n_events, value_sum,
       n_events - lag(n_events) OVER w AS deriv_n,
       round(value_sum - lag(value_sum) OVER w, 2) AS deriv_value,
       CAST(sum(n_events) OVER (PARTITION BY event_type ORDER BY bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_n,
       round(avg(n_events) OVER (PARTITION BY event_type ORDER BY bucket
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS moving_avg_n
FROM hist
WINDOW w AS (PARTITION BY event_type ORDER BY bucket)
ORDER BY event_type, bucket
"""


def range_agg_sql() -> str:
    """Generated from the SAME bound list the Spark operator uses
    (textstats.RANGE_BOUNDS) so the bucket edges can't drift."""
    from unichem2index_spark.operators.textstats import RANGE_BOUNDS

    key_cases, lo_cases = [], []
    for lo, hi in RANGE_BOUNDS:
        label = f"{lo}-{hi if hi is not None else '*'}"
        if hi is not None:
            key_cases.append(f"WHEN nc < {hi} THEN '{label}'")
            lo_cases.append(f"WHEN nc < {hi} THEN {lo}")
        else:
            key_cases.append(f"ELSE '{label}'")
            lo_cases.append(f"ELSE {lo}")
    key_sql = "CASE " + " ".join(key_cases) + " END"
    lo_sql = "CASE " + " ".join(lo_cases) + " END"
    return f"""
WITH b AS (
  SELECT {key_sql} AS range_key,
         CAST({lo_sql} AS BIGINT) AS range_from,
         nc
  FROM (SELECT coalesce(n_chars, 0) AS nc FROM documents)
)
SELECT range_key, range_from, count(*) AS doc_count,
       round(avg(nc), 6) AS avg_chars,
       min(nc) AS min_chars, max(nc) AS max_chars
FROM b GROUP BY 1, 2 ORDER BY range_from
"""


WINDOWED_COUNTS = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events, round(sum(value), 2) AS value_sum
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""

# ------------------------------------------------------------------ parity
THREEWAY_JOIN = """
SELECT n.n_name AS nation, count(*) AS n_lines,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY 1
ORDER BY 1
"""

SEMI_JOIN_RECENT = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (
  SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
)
ORDER BY c_custkey
"""

DIM_JOIN_2KEY = """
WITH dim AS (
  SELECT l_orderkey, l_partkey, sum(l_quantity) AS qty_total
  FROM lineitem GROUP BY 1, 2
)
SELECT l.l_orderkey, l.l_partkey, count(*) AS n_lines,
       round(min(d.qty_total), 2) AS qty_total
FROM lineitem l
JOIN dim d ON l.l_orderkey = d.l_orderkey AND l.l_partkey = d.l_partkey
WHERE d.qty_total > 90
GROUP BY 1, 2
ORDER BY 1, 2
"""

MAP_LOOKUP_JOIN = """
WITH counts AS (SELECT source, count(*) AS doc_count FROM documents GROUP BY 1),
dim AS (
  SELECT source, count(*) AS n_langs
  FROM (SELECT DISTINCT source, lang FROM documents) GROUP BY 1
)
SELECT d.source, d.n_langs, coalesce(c.doc_count, 0) AS doc_count
FROM dim d LEFT JOIN counts c USING (source)
ORDER BY d.source
"""

FILTER_FLAG_COERCE = """
SELECT event_id, user_id, (value > 50) AS is_big, round(value, 2) AS value
FROM events
WHERE event_type = 'purchase'
ORDER BY event_id
"""

NULL_DEFAULTING = """
SELECT event_id, coalesce(props, '{}') AS props_def,
       coalesce(value, 0.0) AS value_def
FROM events
ORDER BY event_id
LIMIT 2000
"""

SOURCELESS_FLAG = """
WITH agg AS (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY 1)
SELECT c.c_custkey, coalesce(a.n_orders, 0) AS n_orders,
       (coalesce(a.n_orders, 0) = 0) AS is_sourceless
FROM customer c LEFT JOIN agg a ON c.c_custkey = a.o_custkey
ORDER BY c.c_custkey
"""

RANGE_SCAN = """
SELECT doc_id, source, n_chars FROM documents
WHERE doc_id BETWEEN 100 AND 299
ORDER BY doc_id
"""

GROUP_COLLECT = """
SELECT o_custkey, count(*) AS n_orders,
       string_agg(o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
       round(sum(o_totalprice), 2) AS total_spend
FROM orders
GROUP BY o_custkey
HAVING count(*) >= 3
ORDER BY o_custkey
"""

COUNT_DISTINCT_KEYS = """
SELECT count(DISTINCT o_custkey) AS n_customers, count(*) AS n_orders
FROM orders
"""

TERMS_AGG = """
SELECT event_type, count(*) AS doc_count FROM events
GROUP BY event_type
ORDER BY doc_count DESC, event_type ASC
LIMIT 3000
"""

TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

TOPN_PER_GROUP = """
WITH r AS (
  SELECT o_orderstatus, o_orderkey, o_totalprice,
         row_number() OVER (
           PARTITION BY o_orderstatus
           ORDER BY o_totalprice DESC, o_orderkey ASC
         ) AS rn
  FROM orders
)
SELECT o_orderstatus, CAST(rn AS BIGINT) AS rn, o_orderkey,
       round(o_totalprice, 2) AS o_totalprice
FROM r WHERE rn <= 3
ORDER BY o_orderstatus, rn
"""

LAST_KEY_TOP1 = """
SELECT doc_id, source FROM documents ORDER BY doc_id DESC LIMIT 1
"""

RECONCILE_COUNTS = """
SELECT count(*) AS missing_keys FROM (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
)
"""

# ---------------------------------------------------------- F1-F5 splitter
# The layered-key expression, DuckDB dialect (Spark twin: parity._KEY_EXPR).
KEY_EXPR_DUCK = (
    "concat('KEY=1S/C', CAST(doc_id % 40 + 1 AS VARCHAR), "
    "'H', CAST(doc_id % 60 + 1 AS VARCHAR), "
    "CASE WHEN doc_id % 5 = 0 THEN concat('.', CAST(doc_id % 3 + 2 AS VARCHAR), "
    "'C2H4') ELSE '' END, "
    "'/c', CAST(doc_id % 99 + 1 AS VARCHAR), "
    "CASE WHEN doc_id % 2 = 0 THEN concat('/h', CAST(doc_id % 20 + 1 AS VARCHAR), 'H') "
    "ELSE '' END, "
    "CASE WHEN doc_id % 4 = 0 THEN '/q+1' ELSE '' END, "
    "CASE WHEN doc_id % 6 = 0 THEN '/b1/t2/m01/s1' ELSE '' END)"
)

KEY_SPLIT = f"""
WITH keyed AS (SELECT doc_id, {KEY_EXPR_DUCK} AS key FROM documents),
ex AS (
  SELECT doc_id, key,
    regexp_extract(key, '^KEY=([^/]+)', 1) AS version,
    regexp_extract(key, '^KEY=[^/]+/([^/]*)', 1) AS formula,
    regexp_extract(key, '/c([^/]*)', 1) AS layer_c,
    regexp_extract(key, '/h([^/]*)', 1) AS layer_h,
    regexp_extract(key, '/q([^/]*)', 1) AS layer_q,
    regexp_extract(key, '/b([^/]*)', 1) AS layer_b,
    regexp_extract(key, '/t([^/]*)', 1) AS layer_t,
    regexp_extract(key, '/m([^/]*)', 1) AS layer_m,
    regexp_extract(key, '/s([^/]*)', 1) AS layer_s
  FROM keyed
)
SELECT doc_id, version, formula, layer_c, layer_h, layer_q,
       concat(layer_b, layer_t, layer_m, layer_s) AS full_stereo,
       (concat('KEY=', version,
         CASE WHEN formula <> '' THEN concat('/', formula) ELSE '' END,
         CASE WHEN layer_c <> '' THEN concat('/c', layer_c) ELSE '' END,
         CASE WHEN layer_h <> '' THEN concat('/h', layer_h) ELSE '' END,
         CASE WHEN layer_q <> '' THEN concat('/q', layer_q) ELSE '' END,
         CASE WHEN layer_b <> '' THEN concat('/b', layer_b) ELSE '' END,
         CASE WHEN layer_t <> '' THEN concat('/t', layer_t) ELSE '' END,
         CASE WHEN layer_m <> '' THEN concat('/m', layer_m) ELSE '' END,
         CASE WHEN layer_s <> '' THEN concat('/s', layer_s) ELSE '' END
       ) = key) AS roundtrip_ok
FROM ex
ORDER BY doc_id
"""

# ------------------------------------------------------------------ dedup
DEDUP_EXACT = """
WITH doubled AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id, text FROM documents
)
SELECT min(doc_id) AS keeper_doc_id, count(*) AS n_copies, md5(text) AS text_md5
FROM doubled
GROUP BY text
ORDER BY keeper_doc_id
"""
# DEDUP_EXACT groups by RAW text (fine at oracle scale) while the Spark
# side groups by the 16-byte md5 digest (the 100-TB shuffle-key
# optimization): a digest collision that merged two distinct documents
# would diverge the two results and fail the hash compare, so the
# correctness harness keeps its safety net over the optimization.

_VOCAB_CTES = f"""
tokset AS (
  SELECT DISTINCT doc_id, unnest({TOKS}) AS term FROM documents
),
vocab AS (
  SELECT term, row_number() OVER (ORDER BY term) - 1 AS token_id
  FROM (SELECT DISTINCT term FROM tokset)
),
ids AS (
  SELECT t.doc_id, v.token_id FROM tokset t JOIN vocab v USING (term)
)
"""


def minhash_lsh_sql(threshold: float = 0.8) -> str:
    sig_cols = ",\n    ".join(
        f"min(({a} * (token_id + 1) + {b}) % {MOD}) AS m{i}"
        for i, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    )
    n_bands = NUM_HASHES // BAND_SIZE
    band_selects = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {bi} AS band_idx, concat_ws('_', "
        + ", ".join(f"m{bi * BAND_SIZE + j}" for j in range(BAND_SIZE))
        + ") AS band_val FROM sig"
        for bi in range(n_bands)
    )
    return f"""
WITH {_VOCAB_CTES},
sig AS (
  SELECT doc_id,
    {sig_cols}
  FROM ids GROUP BY doc_id
),
bands AS (
{band_selects}
),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         count(DISTINCT a.band_idx) AS n_bands
  FROM bands a
  JOIN bands b ON a.band_idx = b.band_idx AND a.band_val = b.band_val
              AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, count(*) AS sz FROM ids GROUP BY 1),
inter AS (
  SELECT c.doc_a, c.doc_b, c.n_bands, count(*) AS inter
  FROM cand c
  JOIN ids ia ON c.doc_a = ia.doc_id
  JOIN ids ib ON c.doc_b = ib.doc_id AND ia.token_id = ib.token_id
  GROUP BY 1, 2, 3
)
SELECT i.doc_a, i.doc_b, i.n_bands,
       round(i.inter / (sa.sz + sb.sz - i.inter), 6) AS jaccard
FROM inter i
JOIN sizes sa ON i.doc_a = sa.doc_id
JOIN sizes sb ON i.doc_b = sb.doc_id
WHERE round(i.inter / (sa.sz + sb.sz - i.inter), 6) >= {threshold}
ORDER BY doc_a, doc_b
"""


def simhash_groups_sql() -> str:
    half = MOD // 2
    bit_terms = " + ".join(
        f"(CASE WHEN sum(cnt * (CASE WHEN ((token_id + 1) * {p}) % {MOD} >= {half} "
        f"THEN 1 ELSE -1 END)) > 0 THEN {1 << j} ELSE 0 END)"
        for j, p in enumerate(SIMHASH_P)
    )
    return f"""
WITH counts AS (
  SELECT doc_id, term, count(*) AS cnt FROM (
    SELECT doc_id, unnest({TOKS}) AS term FROM documents
  ) GROUP BY 1, 2
),
vocab AS (
  SELECT term, row_number() OVER (ORDER BY term) - 1 AS token_id
  FROM (SELECT DISTINCT term FROM counts)
),
idc AS (
  SELECT c.doc_id, v.token_id, c.cnt FROM counts c JOIN vocab v USING (term)
),
sims AS (
  SELECT doc_id, CAST({bit_terms} AS BIGINT) AS simhash
  FROM idc GROUP BY doc_id
)
SELECT simhash, count(*) AS n_docs, min(doc_id) AS min_doc_id
FROM sims
GROUP BY simhash
HAVING count(*) > 1
ORDER BY simhash
"""


def ngram_jaccard_sql(threshold: float = 0.5, df_cap: int = 50) -> str:
    return f"""
WITH tok AS (
  SELECT doc_id, {TOKS} AS toks FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, unnest(
    CASE WHEN len(toks) >= 3 THEN
      list_transform(range(len(toks) - 2),
        i -> concat_ws(' ', toks[i + 1], toks[i + 2], toks[i + 3]))
    ELSE CAST([] AS VARCHAR[]) END
  ) AS shingle
  FROM tok
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
rare AS (
  SELECT shingle FROM (
    SELECT shingle, count(*) AS df FROM sh GROUP BY 1
  ) WHERE df <= {df_cap}
),
blocked AS (SELECT s.doc_id, s.shingle FROM sh s JOIN rare USING (shingle)),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM blocked a
  JOIN blocked b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS inter
  FROM cand c
  JOIN sh ia ON c.doc_a = ia.doc_id
  JOIN sh ib ON c.doc_b = ib.doc_id AND ia.shingle = ib.shingle
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b, CAST(i.inter AS BIGINT) AS shared_shingles,
       round(i.inter / (sa.sz + sb.sz - i.inter), 6) AS jaccard
FROM inter i
JOIN sizes sa ON i.doc_a = sa.doc_id
JOIN sizes sb ON i.doc_b = sb.doc_id
WHERE round(i.inter / (sa.sz + sb.sz - i.inter), 6) >= {threshold}
ORDER BY doc_a, doc_b
"""


COSINE_TOPK = """
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < 5),
c AS (SELECT vec_id, v FROM emb WHERE vec_id >= 5),
scored AS (
  SELECT q.query_id, c.vec_id,
         round(list_dot_product(q.qv, c.v)
           / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.v, c.v))),
           6) AS cosine
  FROM c CROSS JOIN q
),
r AS (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, cosine
FROM r WHERE rank <= 10
ORDER BY query_id, rank
"""

# Embedding-cosine near-dup: the oracle is the EXACT all-pairs computation
# over the augmented corpus (embeddings UNION dim0+0.2 twins); the Spark
# side blocks with multi-table sign-LSH whose per-pair miss probability at
# the planted twins' theta (<= 12deg) is ~1e-4 — verified to hash-match.
EMBEDDING_NEARDUP = """
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
aug AS (
  SELECT vec_id, v FROM emb
  UNION ALL
  SELECT vec_id + 1000000, list_concat([v[1] + 0.2], v[2:]) FROM emb
),
p AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         round(list_dot_product(a.v, b.v)
           / (sqrt(list_dot_product(a.v, a.v))
              * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
  FROM aug a JOIN aug b ON a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, cosine FROM p
WHERE cosine >= 0.9
ORDER BY vec_a, vec_b
"""

# -------------------------------------------------------------- text stats
LANG_ID = f"""
WITH tok AS (SELECT doc_id, {TOKS} AS toks FROM documents),
m AS (
  SELECT doc_id,
    len(list_filter(toks, x -> list_contains(['the','a','of','and','is'], x))) AS en,
    len(list_filter(toks, x -> list_contains(['der','die','das','und','ist'], x))) AS de,
    len(toks) AS n
  FROM tok
)
SELECT doc_id,
       round(en / greatest(n, 1), 6) AS en_ratio,
       CASE WHEN en > de THEN 'en' WHEN de > en THEN 'de' ELSE 'und' END AS pred_lang
FROM m
ORDER BY doc_id
"""

QUALITY_SCORE = f"""
WITH tok AS (SELECT doc_id, text, {TOKS} AS toks FROM documents),
m AS (
  SELECT doc_id,
    CAST(len(toks) AS BIGINT) AS n_tokens,
    round(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
          / greatest(CAST(len(toks) AS DOUBLE), 1.0), 6) AS mean_tok_len,
    round(CAST(len(list_filter(toks,
          x -> list_contains(['the','a','of','and','is','to','in'], x))) AS DOUBLE)
          / greatest(CAST(len(toks) AS DOUBLE), 1.0), 6) AS stop_ratio,
    round(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
          / greatest(CAST(length(text) AS DOUBLE), 1.0), 6) AS alpha_ratio
  FROM tok
)
SELECT doc_id, n_tokens, mean_tok_len, stop_ratio, alpha_ratio,
  round(
    (CASE WHEN n_tokens BETWEEN 20 AND 400 THEN CAST(0.4 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)
    + (CASE WHEN stop_ratio BETWEEN 0.05 AND 0.6 THEN CAST(0.3 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)
    + (CASE WHEN mean_tok_len BETWEEN 3.0 AND 8.0 THEN CAST(0.3 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END),
  6) AS quality
FROM m
ORDER BY doc_id
"""

TOKEN_COUNTS = f"""
SELECT doc_id,
       CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS ws_tokens,
       CAST(len({TOKS}) AS BIGINT) AS regex_tokens,
       CAST(length(text) AS BIGINT) AS n_chars_actual
FROM documents
ORDER BY doc_id
"""

DOC_FINGERPRINT = f"""
WITH tok AS (SELECT doc_id, {TOKS} AS toks FROM documents),
vocab AS (
  SELECT term, row_number() OVER (ORDER BY term) - 1 AS token_id
  FROM (SELECT DISTINCT unnest(toks) AS term FROM tok)
),
pos AS (
  SELECT doc_id, unnest(range(len(toks))) AS pos, unnest(toks) AS term FROM tok
),
w AS (
  SELECT p.doc_id, (p.pos + 1) * (v.token_id + 1) AS w
  FROM pos p JOIN vocab v USING (term)
)
SELECT doc_id, CAST((sum(w) * {FP_MULT}) % {MOD} AS BIGINT) AS fingerprint
FROM w GROUP BY doc_id ORDER BY doc_id
"""

# The Spark side runs the applyInPandasWithState newest-per-key operator
# with Trigger.Once (one micro-batch), so its emission set is exactly the
# argmax-doc_id row per source (doc_id unique -> deterministic).
STREAM_DEDUP_LATEST = """
SELECT d.source AS source, d.doc_id AS doc_id, d.n_chars AS n_chars
FROM documents d
JOIN (
  SELECT source, max(doc_id) AS m FROM documents GROUP BY source
) x ON d.source = x.source AND d.doc_id = x.m
ORDER BY source
"""

# The Spark query spools orders through a '|' CSV and reads it back; the
# oracle reads the original table — equality proves the round-trip lossless.
CSV_ROUNDTRIP = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       o_orderdate, o_orderpriority
FROM orders
ORDER BY o_orderkey
"""

BINARY_META = """
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS kind,
       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
       md5(text) AS payload_md5
FROM documents
ORDER BY media_id
"""


# ---------------------------------------------------------------- r4 extras
def bm25_boosted_sql(terms: list[str], k: int, boosts: dict[str, float]) -> str:
    """Per-term query boosts (ES `term^boost`): the idf factor is scaled by
    a CASE over the term BEFORE multiplying the tf part — the same float
    association ((idf * boost) * w) the Spark exact path and the WAND
    kernel (pre-scaled idf) use, so products are bit-identical."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    cases = " ".join(
        f"WHEN '{t}' THEN {float(v)!r}" for t, v in sorted(boosts.items())
    )
    boost = f"CASE p.term {cases} ELSE 1.0 END"
    return f"""
WITH {_TOK_CTE},
scored AS (
  SELECT p.doc_id,
         sum(
           (ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
            * ({boost}))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN dfs d USING (term)
  JOIN tok t USING (doc_id)
  CROSS JOIN stats s
  WHERE p.term IN ({inlist})
  GROUP BY p.doc_id
)
SELECT doc_id, round(score, 6) AS score
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def bm25_must_not_sql(terms: list[str], k: int, exclude: list[str]) -> str:
    """ES bool must_not: docs containing ANY excluded term are dropped;
    survivors' scores are the plain query's (filter context)."""
    excl = sorted(set(exclude))
    uniq = sorted(set(terms) - set(excl))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    exlist = ", ".join("'" + t.replace("'", "''") + "'" for t in excl)
    return f"""
WITH {_TOK_CTE},
scored AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN dfs d USING (term)
  JOIN tok t USING (doc_id)
  CROSS JOIN stats s
  WHERE p.term IN ({inlist})
    AND p.doc_id NOT IN (SELECT doc_id FROM post WHERE term IN ({exlist}))
  GROUP BY p.doc_id
)
SELECT doc_id, round(score, 6) AS score
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def _bm25_over_expansion(expansion_cte: str, k: int) -> str:
    """Shared tail: BM25-OR over an expansion CTE named `exp_terms`."""
    return f"""
WITH {_TOK_CTE},
{expansion_cte},
scored AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN dfs d USING (term)
  JOIN tok t USING (doc_id)
  CROSS JOIN stats s
  WHERE p.term IN (SELECT term FROM exp_terms)
  GROUP BY p.doc_id
)
SELECT doc_id, round(score, 6) AS score
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def bm25_prefix_sql(prefix: str, k: int, max_expansions: int) -> str:
    """Prefix expansion: same rule as query.expand_prefix — alphabetical,
    capped (the term dictionary `dfs` == the index's term_stats)."""
    p = prefix.replace("'", "''")
    cte = f"""
exp_terms AS (
  SELECT term FROM dfs WHERE term LIKE '{p}%'
  ORDER BY term LIMIT {max_expansions}
)"""
    return _bm25_over_expansion(cte, k)


def bm25_fuzzy_sql(
    term: str, k: int, max_edits: int, max_expansions: int
) -> str:
    """Fuzzy expansion: same rule as query.expand_fuzzy — length window,
    levenshtein <= max_edits (exact term included), (dist, term) order."""
    q = term.replace("'", "''")
    qlen = len(term)
    cte = f"""
exp_terms AS (
  SELECT term FROM dfs
  WHERE length(term) BETWEEN {qlen - max_edits} AND {qlen + max_edits}
    AND levenshtein(term, '{q}') <= {max_edits}
  ORDER BY levenshtein(term, '{q}') ASC, term ASC
  LIMIT {max_expansions}
)"""
    return _bm25_over_expansion(cte, k)


def bm25_paged_sql(terms: list[str], k: int, offset: int) -> str:
    """from/size pagination: global rank over RAW scores, sliced to
    (offset, offset+k], rounded only at emit — the same order-then-round
    discipline as the Spark paged query."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH {_TOK_CTE},
scored AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN dfs d USING (term)
  JOIN tok t USING (doc_id)
  CROSS JOIN stats s
  WHERE p.term IN ({inlist})
  GROUP BY p.doc_id
),
ranked AS (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT CAST(rank AS BIGINT) AS rank, doc_id, round(score, 6) AS score
FROM ranked
WHERE rank > {offset} AND rank <= {offset + k}
ORDER BY rank
"""


def bm25_field_boost_sql(
    terms: list[str], k: int, factor: float, field: str = "n_chars"
) -> str:
    """function_score field_value_factor: BM25 * ln(1 + factor*field),
    multiplier applied AFTER the per-doc sum (same tree as Spark)."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH {_TOK_CTE},
scored AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN dfs d USING (term)
  JOIN tok t USING (doc_id)
  CROSS JOIN stats s
  WHERE p.term IN ({inlist})
  GROUP BY p.doc_id
)
SELECT sc.doc_id,
       round(sc.score * ln(1.0 + {float(factor)!r} * dd.{field}), 6) AS score
FROM scored sc JOIN documents dd ON sc.doc_id = dd.doc_id
ORDER BY sc.score * ln(1.0 + {float(factor)!r} * dd.{field}) DESC,
         sc.doc_id ASC
LIMIT {k}
"""


EXTENDED_STATS = f"""
WITH base AS (SELECT lang, len({TOKS}) AS doclen FROM documents),
g AS (
  SELECT lang, count(*) AS n, min(doclen) AS min_dl, max(doclen) AS max_dl,
         CAST(sum(doclen) AS BIGINT) AS sum_dl,
         CAST(sum(doclen * doclen) AS BIGINT) AS sum_sq
  FROM base GROUP BY lang
)
SELECT lang, n, min_dl, max_dl, sum_dl,
       round(CAST(sum_dl AS DOUBLE) / CAST(n AS DOUBLE), 6) AS avg_dl,
       round(greatest(
         CAST(sum_sq AS DOUBLE) / CAST(n AS DOUBLE)
         - (CAST(sum_dl AS DOUBLE) / CAST(n AS DOUBLE))
           * (CAST(sum_dl AS DOUBLE) / CAST(n AS DOUBLE)),
         0.0), 6) AS var_dl,
       round(sqrt(greatest(
         CAST(sum_sq AS DOUBLE) / CAST(n AS DOUBLE)
         - (CAST(sum_dl AS DOUBLE) / CAST(n AS DOUBLE))
           * (CAST(sum_dl AS DOUBLE) / CAST(n AS DOUBLE)),
         0.0)), 6) AS std_dl
FROM g ORDER BY lang
"""


def histogram_agg_sql() -> str:
    """Generated from the SAME interval constant the Spark operator uses."""
    from unichem2index_spark.operators.textstats import HISTOGRAM_INTERVAL

    return f"""
WITH dl AS (SELECT len({TOKS}) AS doclen FROM documents)
SELECT doclen - doclen % {HISTOGRAM_INTERVAL} AS bucket,
       count(*) AS doc_count
FROM dl GROUP BY 1 ORDER BY bucket
"""


FILTERS_AGG = """
SELECT count(CASE WHEN lang = 'en' THEN 1 END) AS n_en,
       count(CASE WHEN n_chars >= 800 THEN 1 END) AS n_long,
       count(CASE WHEN lang = 'en' AND n_chars >= 800 THEN 1 END)
         AS n_long_en,
       count(*) AS n_total
FROM documents
"""


def top_hits_by_lang_sql() -> str:
    """Generated from the SAME query terms / group size constants the
    Spark operator uses (textstats.TOP_HITS_TERMS)."""
    from unichem2index_spark.operators.textstats import (
        TOP_HITS_PER_GROUP,
        TOP_HITS_TERMS,
    )

    uniq = sorted(set(TOP_HITS_TERMS))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH {_TOK_CTE},
scored AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN dfs d USING (term)
  JOIN tok t USING (doc_id)
  CROSS JOIN stats s
  WHERE p.term IN ({inlist})
  GROUP BY p.doc_id
),
ranked AS (
  SELECT dd.lang, sc.doc_id, sc.score,
         row_number() OVER (
           PARTITION BY dd.lang ORDER BY sc.score DESC, sc.doc_id ASC
         ) AS rank
  FROM scored sc JOIN documents dd ON sc.doc_id = dd.doc_id
)
SELECT lang, CAST(rank AS BIGINT) AS rank, doc_id,
       round(score, 6) AS score
FROM ranked WHERE rank <= {TOP_HITS_PER_GROUP}
ORDER BY lang, rank
"""


def bm25_search_after_sql(terms: list[str], k: int, cursor_rank: int) -> str:
    """search_after equivalence: the k docs ranked strictly after the doc
    at global rank ``cursor_rank`` == the OFFSET slice (the Spark side
    derives the (raw_score, doc_id) cursor from rank ``cursor_rank`` and
    cursor-filters inside the kernel; this spells the same slice
    declaratively). Raw-score ordering, rounded only at emit."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH {_TOK_CTE},
scored AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN dfs d USING (term)
  JOIN tok t USING (doc_id)
  CROSS JOIN stats s
  WHERE p.term IN ({inlist})
  GROUP BY p.doc_id
),
ranked AS (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT doc_id, round(score, 6) AS score
FROM ranked
WHERE rank > {cursor_rank} AND rank <= {cursor_rank + k}
ORDER BY rank
"""


def bm25_wildcard_sql(pattern: str, k: int, max_expansions: int) -> str:
    """Wildcard expansion: same * -> %% / ? -> _ translation as
    query.expand_wildcard, alphabetical, capped."""
    like = (
        pattern.replace("'", "''")
        .replace("%", "\\%").replace("_", "\\_")
        .replace("*", "%").replace("?", "_")
    )
    cte = f"""
exp_terms AS (
  SELECT term FROM dfs WHERE term LIKE '{like}'
  ORDER BY term LIMIT {max_expansions}
)"""
    return _bm25_over_expansion(cte, k)


def more_like_this_sql(src_doc_id: int, k: int, max_query_terms: int) -> str:
    """more_like_this: the source doc's top tf*idf terms (score desc,
    term asc — ES interestingness order) feed a BM25-OR that excludes
    the source doc itself."""
    return f"""
WITH {_TOK_CTE},
exp_terms AS (
  SELECT p.term
  FROM post p
  JOIN dfs d USING (term)
  CROSS JOIN stats s
  WHERE p.doc_id = {src_doc_id}
  ORDER BY p.tf * ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5)
                     / (d.df + 0.5)) DESC,
           p.term ASC
  LIMIT {max_query_terms}
),
scored AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN dfs d USING (term)
  JOIN tok t USING (doc_id)
  CROSS JOIN stats s
  WHERE p.term IN (SELECT term FROM exp_terms)
    AND p.doc_id != {src_doc_id}
  GROUP BY p.doc_id
)
SELECT doc_id, round(score, 6) AS score
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def bm25_dismax_sql(terms: list[str], k: int, tie_breaker: float) -> str:
    """dis_max: per-(doc, term) contributions, then
    max + tie_breaker * (sum - max) per doc — same grouped expressions as
    the Spark side."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH {_TOK_CTE},
contrib AS (
  SELECT p.doc_id,
         ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
         * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         AS contrib
  FROM post p
  JOIN dfs d USING (term)
  JOIN tok t USING (doc_id)
  CROSS JOIN stats s
  WHERE p.term IN ({inlist})
),
scored AS (
  SELECT doc_id,
         max(contrib) + {float(tie_breaker)!r} * (sum(contrib) - max(contrib))
         AS score
  FROM contrib
  GROUP BY doc_id
)
SELECT doc_id, round(score, 6) AS score
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def bm25_boosting_sql(
    pos_terms: list[str],
    neg_terms: list[str],
    k: int,
    negative_boost: float,
) -> str:
    """boosting query: positive BM25 sum, multiplied by negative_boost
    for docs that also match any negative term (demote, not exclude)."""
    pos = sorted(set(pos_terms))
    neg = sorted(set(neg_terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in pos)
    exlist = ", ".join("'" + t.replace("'", "''") + "'" for t in neg)
    return f"""
WITH {_TOK_CTE},
scored AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN dfs d USING (term)
  JOIN tok t USING (doc_id)
  CROSS JOIN stats s
  WHERE p.term IN ({inlist})
  GROUP BY p.doc_id
),
demoted AS (
  SELECT doc_id,
         score * CASE WHEN doc_id IN (
             SELECT DISTINCT doc_id FROM post WHERE term IN ({exlist})
           ) THEN {float(negative_boost)!r} ELSE 1.0 END AS score
  FROM scored
)
SELECT doc_id, round(score, 6) AS score
FROM demoted
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def highlight_sql(
    terms: list[str], k: int, before: int = 20, width: int = 50
) -> str:
    """highlight: top-k BM25 hits joined back to the body; earliest
    occurrence of any query term (position asc, term asc) picks the
    matched term and the fragment window. 2^31 = the same absent-term
    sentinel the Spark side folds through least()."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    no_hit = 2**31
    # plain `text` resolves to dd.text inside `hit` and to hit.text in the
    # outer select — the same expressions are reusable in both scopes
    pos_exprs = {
        t: f"CASE WHEN instr(lower(text), '{t}') = 0 THEN {no_hit} "
           f"ELSE instr(lower(text), '{t}') END"
        for t in uniq
    }
    best = "least(" + ", ".join(pos_exprs.values()) + ")" if len(
        pos_exprs
    ) > 1 else next(iter(pos_exprs.values()))
    matched = "NULL"
    for t in reversed(uniq):
        matched = (
            f"CASE WHEN {pos_exprs[t]} = best THEN '{t}' ELSE {matched} END"
        )
    return f"""
WITH {_TOK_CTE},
scored AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN dfs d USING (term)
  JOIN tok t USING (doc_id)
  CROSS JOIN stats s
  WHERE p.term IN ({inlist})
  GROUP BY p.doc_id
),
topk AS (
  SELECT doc_id, round(score, 6) AS score
  FROM scored
  ORDER BY score DESC, doc_id ASC
  LIMIT {k}
),
hit AS (
  SELECT tk.doc_id, tk.score, dd.text AS text, {best} AS best
  FROM topk tk JOIN documents dd ON tk.doc_id = dd.doc_id
)
SELECT doc_id, score,
       CASE WHEN best = {no_hit} THEN NULL ELSE {matched} END
         AS matched_term,
       CASE WHEN best = {no_hit} THEN NULL
            ELSE substr(text, greatest(1, best - {before}), {width}) END
         AS snippet
FROM hit
ORDER BY score DESC, doc_id ASC
"""


MATRIX_STATS = f"""
WITH base AS (
  SELECT CAST(n_chars AS BIGINT) AS x, len({TOKS}) AS y FROM documents
),
g AS (
  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
  FROM base
)
SELECT n,
       round(CAST(sx AS DOUBLE) / n, 6) AS mean_chars,
       round(CAST(sy AS DOUBLE) / n, 6) AS mean_tokens,
       round(greatest(CAST(sxx AS DOUBLE) / n
             - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n), 0.0), 6)
         AS var_chars,
       round(greatest(CAST(syy AS DOUBLE) / n
             - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n), 0.0), 6)
         AS var_tokens,
       round(CAST(sxy AS DOUBLE) / n
             - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n), 6)
         AS covariance,
       round((CAST(sxy AS DOUBLE) / n
             - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
             / sqrt(greatest(CAST(sxx AS DOUBLE) / n
                   - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n), 0.0)
                  * greatest(CAST(syy AS DOUBLE) / n
                   - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n), 0.0)
             ), 6) AS correlation
FROM g
"""


ADJACENCY_MATRIX = """
SELECT count(*) FILTER (lang = 'en') AS en,
       count(*) FILTER (n_chars >= 400) AS long_docs,
       count(*) FILTER (source IN ('src0', 'src1', 'src2')) AS early_src,
       count(*) FILTER (lang = 'en' AND n_chars >= 400) AS en_long,
       count(*) FILTER (lang = 'en' AND source IN ('src0', 'src1', 'src2'))
         AS en_early_src,
       count(*) FILTER (n_chars >= 400 AND source IN ('src0', 'src1', 'src2'))
         AS long_early_src
FROM documents
"""


def rare_terms_sql(max_doc_count: int = 5, out_cap: int = 50) -> str:
    """rare_terms over 3-token shingles: df <= max_doc_count, (df asc,
    shingle asc), capped — same shingle construction as ngram_jaccard."""
    return f"""
WITH tok AS (
  SELECT doc_id, {TOKS} AS toks FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, unnest(
    CASE WHEN len(toks) >= 3 THEN
      list_transform(range(len(toks) - 2),
        i -> concat_ws(' ', toks[i + 1], toks[i + 2], toks[i + 3]))
    ELSE CAST([] AS VARCHAR[]) END
  ) AS shingle
  FROM tok
)
SELECT shingle, CAST(count(*) AS BIGINT) AS doc_count
FROM sh
GROUP BY shingle
HAVING count(*) <= {max_doc_count}
ORDER BY doc_count ASC, shingle ASC
LIMIT {out_cap}
"""


def composite_agg_sql(
    after: tuple[str, str], size: int
) -> str:
    """composite agg: (lang, source) buckets tuple-asc, strictly after
    the cursor, one page."""
    al, asrc = after
    return f"""
SELECT lang, source, count(*) AS doc_count
FROM documents
WHERE lang > '{al}' OR (lang = '{al}' AND source > '{asrc}')
GROUP BY lang, source
ORDER BY lang ASC, source ASC
LIMIT {size}
"""


# ------------------------------------------------------- training prep
def train_eval_split_sql(train_pct: int, valid_pct: int) -> str:
    """Deterministic hash split: identical int64 expression as
    trainprep._split_hash_col (no overflow below 2^62)."""
    h = "((doc_id % 2147483647 + 1) * 1315423911) % 2147483647 % 100"
    return f"""
WITH s AS (
  SELECT CASE WHEN {h} < {train_pct} THEN 'train'
              WHEN {h} < {valid_pct} THEN 'valid'
              ELSE 'test' END AS split,
         len({TOKS}) AS doclen
  FROM documents
)
SELECT split, count(*) AS n_docs, CAST(sum(doclen) AS BIGINT) AS n_tokens
FROM s GROUP BY split ORDER BY split
"""


_SHINGLE_CTE = f"""
tokd AS (
  SELECT doc_id, source, {TOKS} AS toks FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, source, unnest(
    CASE WHEN len(toks) >= 3 THEN
      list_transform(range(len(toks) - 2),
        i -> concat_ws(' ', toks[i + 1], toks[i + 2], toks[i + 3]))
    ELSE CAST([] AS VARCHAR[]) END
  ) AS shingle
  FROM tokd
)
"""


def decontaminate_sql(bench_source: str, min_shared: int) -> str:
    """Benchmark decontamination: distinct-shingle overlap of every
    non-benchmark doc against the union of benchmark shingles."""
    b = bench_source.replace("'", "''")
    return f"""
WITH {_SHINGLE_CTE},
bench AS (
  SELECT DISTINCT shingle FROM sh WHERE source = '{b}'
)
SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_shared
FROM sh s JOIN bench USING (shingle)
WHERE s.source != '{b}'
GROUP BY s.doc_id
HAVING count(*) >= {min_shared}
ORDER BY s.doc_id
"""


def pack_sequences_sql(budget: int) -> str:
    """Greedy token-budget packing as a recursive CTE: the fill state
    recurses doc-by-doc within each source (the same sequential rule the
    Spark operator applies per group)."""
    return f"""
WITH RECURSIVE d AS (
  SELECT source, doc_id, len({TOKS}) AS n,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
),
packed AS (
  SELECT source, rn, n, CAST(0 AS BIGINT) AS seq_id, n AS fill
  FROM d WHERE rn = 1
  UNION ALL
  SELECT d.source, d.rn, d.n,
         CASE WHEN p.fill + d.n > {budget} THEN p.seq_id + 1
              ELSE p.seq_id END,
         CASE WHEN p.fill + d.n > {budget} THEN d.n
              ELSE p.fill + d.n END
  FROM packed p
  JOIN d ON d.source = p.source AND d.rn = p.rn + 1
)
SELECT source, seq_id, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n) AS BIGINT) AS seq_tokens
FROM packed
GROUP BY source, seq_id
ORDER BY source, seq_id
"""


def bm25_gauss_decay_sql(
    terms: list[str], k: int, origin: float, denom: float,
    field: str = "n_chars",
) -> str:
    """function_score gauss decay: BM25 * exp(-dist^2 / denom), the
    denominator precomputed in Python (one literal in both engines)."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH {_TOK_CTE},
scored AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN dfs d USING (term)
  JOIN tok t USING (doc_id)
  CROSS JOIN stats s
  WHERE p.term IN ({inlist})
  GROUP BY p.doc_id
),
decayed AS (
  SELECT sc.doc_id,
         sc.score * exp(-(abs(dd.{field} - {float(origin)!r})
                          * abs(dd.{field} - {float(origin)!r}))
                        / {float(denom)!r}) AS score
  FROM scored sc JOIN documents dd ON sc.doc_id = dd.doc_id
)
SELECT doc_id, round(score, 6) AS score
FROM decayed
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def bucket_script_selector_sql(min_docs: int) -> str:
    """bucket_script (avg tokens = sum/count over the reduced buckets) +
    bucket_selector (HAVING doc_count >= min_docs)."""
    return f"""
WITH g AS (
  SELECT lang, count(*) AS doc_count, sum(len({TOKS})) AS total_tokens
  FROM documents
  GROUP BY lang
)
SELECT lang, doc_count, CAST(total_tokens AS BIGINT) AS total_tokens,
       round(CAST(total_tokens AS DOUBLE) / CAST(doc_count AS DOUBLE), 6)
         AS avg_tokens
FROM g
WHERE doc_count >= {min_docs}
ORDER BY lang
"""


def collapse_topk_sql(
    terms: list[str], k: int, collapse_field: str = "source"
) -> str:
    """Field collapsing: best raw-score doc per collapse-key value, then
    the global top-k over the group winners."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH {_TOK_CTE},
scored AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN dfs d USING (term)
  JOIN tok t USING (doc_id)
  CROSS JOIN stats s
  WHERE p.term IN ({inlist})
  GROUP BY p.doc_id
),
collapsed AS (
  SELECT sc.doc_id, dd.{collapse_field}, sc.score,
         row_number() OVER (
           PARTITION BY dd.{collapse_field}
           ORDER BY sc.score DESC, sc.doc_id ASC
         ) AS rn
  FROM scored sc JOIN documents dd ON sc.doc_id = dd.doc_id
)
SELECT doc_id, {collapse_field}, round(score, 6) AS score
FROM collapsed
WHERE rn = 1
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def explain_score_sql(terms: list[str], doc_id: int) -> str:
    """_explain breakdown: per-term tf/df/idf/weight/contribution for one
    doc, same expressions as every scorer."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH {_TOK_CTE}
SELECT p.term, p.tf, d.df,
       round(ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5)
                / (d.df + 0.5)), 6) AS idf,
       round(p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)), 6)
         AS tf_weight,
       round(ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
             * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl))), 6)
         AS contrib
FROM post p
JOIN dfs d USING (term)
JOIN tok t USING (doc_id)
CROSS JOIN stats s
WHERE p.doc_id = {doc_id} AND p.term IN ({inlist})
ORDER BY p.term
"""


def span_near_sql(terms: list[str], k: int, slop: int) -> str:
    """span_near (in_order=false): EXISTS one position per distinct term
    with covering span <= slop + n - 1 (the Lucene NearSpansUnordered
    window for single-term spans), then BM25 over the unique terms."""
    uniq = sorted(set(terms))
    window = slop + len(uniq) - 1
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    aliases = [f"p{i}" for i in range(len(uniq))]
    joins = " JOIN ".join(
        [f"pos {aliases[0]}"]
        + [f"pos {a} USING (doc_id)" for a in aliases[1:]]
    )
    preds = " AND ".join(
        f"{a}.term = '{t}'" for a, t in zip(aliases, uniq)
    )
    plist = ", ".join(f"{a}.p" for a in aliases)
    return f"""
WITH {_TOK_CTE},
tokd AS (
  SELECT doc_id, {TOKS} AS toks FROM documents
),
pos AS (
  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS p
  FROM tokd
),
matched AS (
  SELECT DISTINCT {aliases[0]}.doc_id
  FROM {joins}
  WHERE {preds}
    AND greatest({plist}) - least({plist}) <= {window}
),
scored AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN dfs d USING (term)
  JOIN tok t USING (doc_id)
  CROSS JOIN stats s
  WHERE p.term IN ({inlist})
    AND p.doc_id IN (SELECT doc_id FROM matched)
  GROUP BY p.doc_id
)
SELECT doc_id, round(score, 6) AS score
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def diversified_sql(terms: list[str], k: int, field: str, per_key: int) -> str:
    """diversified_sampler: at most per_key docs per field value, then
    the ordinary top-k merge; raw-score ordering, round at emit."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH {_TOK_CTE},
scored AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN dfs d USING (term)
  JOIN tok t USING (doc_id)
  CROSS JOIN stats s
  WHERE p.term IN ({inlist})
  GROUP BY p.doc_id
),
ranked AS (
  SELECT sc.doc_id, doc.{field}, sc.score,
         row_number() OVER (
           PARTITION BY doc.{field}
           ORDER BY sc.score DESC, sc.doc_id ASC
         ) AS rn
  FROM scored sc JOIN documents doc USING (doc_id)
)
SELECT doc_id, {field}, round(score, 6) AS score
FROM ranked
WHERE rn <= {per_key}
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def match_count_sql(terms: list[str]) -> str:
    """_count for bool-must: docs containing ALL the terms."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH {_TOK_CTE},
per_doc AS (
  SELECT doc_id
  FROM post
  WHERE term IN ({inlist})
  GROUP BY doc_id
  HAVING count(*) = {len(uniq)}
)
SELECT count(*) AS n_matching FROM per_doc
"""


def random_score_sql(terms: list[str], k: int, seed: int, mult: int, mod: int) -> str:
    """function_score random_score (seeded, multiply): exact integer mix
    then ONE float divide — identical constants to the Spark twin."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH {_TOK_CTE},
scored AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN dfs d USING (term)
  JOIN tok t USING (doc_id)
  CROSS JOIN stats s
  WHERE p.term IN ({inlist})
  GROUP BY p.doc_id
)
SELECT doc_id,
       round(
         score * (CAST(((doc_id + {seed}) * {mult}) % {mod} AS DOUBLE)
                  / {float(mod)!r}),
         6
       ) AS score
FROM scored
ORDER BY score * (CAST(((doc_id + {seed}) * {mult}) % {mod} AS DOUBLE)
                  / {float(mod)!r}) DESC,
         doc_id ASC
LIMIT {k}
"""


def percolate_sql(
    queries: list[tuple[int, list[str], int]],
    phrase_queries: list[tuple[int, list[str]]] | None = None,
) -> str:
    """Percolator: stored (query_id, terms, min_match) registry as an
    inline VALUES list; a doc matches when it contains >= min_match of
    the query's distinct terms. Optional phrase registrations match via
    the sentinel-space substring identity (same as phrase_sql)."""
    qterm_rows = []
    mm_rows = []
    for qid, terms, mm in queries:
        for t in sorted({str(x) for x in terms}):
            qterm_rows.append(f"({int(qid)}, '" + t.replace("'", "''") + "')")
        mm_rows.append(f"({int(qid)}, {int(mm)})")
    qterms = ", ".join(qterm_rows)
    mms = ", ".join(mm_rows)
    phrase_part = ""
    if phrase_queries:
        needles = ", ".join(
            f"({int(qid)}, '"
            + (" " + " ".join(str(t) for t in p) + " ").replace("'", "''")
            + "')"
            for qid, p in phrase_queries
        )
        phrase_part = f"""
UNION ALL
SELECT n.query_id, d.doc_id
FROM documents d
JOIN (VALUES {needles}) AS n(query_id, needle)
  ON position(n.needle IN ' ' || array_to_string({TOKS}, ' ') || ' ') > 0
"""
    return f"""
WITH {_TOK_CTE},
qterm(query_id, term) AS (VALUES {qterms}),
qmm(query_id, min_match) AS (VALUES {mms}),
matched AS (
  SELECT p.doc_id, q.query_id, count(*) AS n_matched
  FROM post p JOIN qterm q USING (term)
  GROUP BY p.doc_id, q.query_id
),
allhits AS (
  SELECT m.query_id, m.doc_id
  FROM matched m JOIN qmm USING (query_id)
  WHERE m.n_matched >= qmm.min_match
  {phrase_part}
)
SELECT query_id, doc_id FROM allhits
ORDER BY query_id, doc_id
"""


def rank_eval_sql(terms: list[str], k: int, marker: str) -> str:
    """_rank_eval: precision@k / recall@k / MRR of the BM25 top-k against
    the binary judgment "doc contains the marker term"."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    m = "'" + marker.replace("'", "''") + "'"
    return f"""
WITH {_TOK_CTE},
scored AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN dfs d USING (term)
  JOIN tok t USING (doc_id)
  CROSS JOIN stats s
  WHERE p.term IN ({inlist})
  GROUP BY p.doc_id
),
ranked AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM scored
  ORDER BY score DESC, doc_id ASC
  LIMIT {k}
),
relevant AS (
  SELECT DISTINCT doc_id FROM post WHERE term = {m}
),
hits AS (
  SELECT count(*) AS n_hits, min(rank) AS first_rank
  FROM ranked JOIN relevant USING (doc_id)
),
totals AS (
  SELECT (SELECT count(*) FROM ranked) AS n_retrieved,
         (SELECT count(*) FROM relevant) AS n_relevant
)
SELECT round(CAST(h.n_hits AS DOUBLE) / t.n_retrieved, 6) AS precision_at_k,
       round(CAST(h.n_hits AS DOUBLE) / t.n_relevant, 6) AS recall_at_k,
       round(CASE WHEN h.n_hits > 0 THEN 1.0 / h.first_rank ELSE 0.0 END,
             6) AS mrr
FROM totals t CROSS JOIN hits h
"""


def span_first_sql(term: str, k: int, end: int) -> str:
    """span_first(span_term): the term occurs within the first ``end``
    token positions (kernel positions are 0-based; generate_subscripts is
    1-based, hence ``min(p) <= end``), scored as single-term BM25."""
    t = "'" + term.replace("'", "''") + "'"
    return f"""
WITH {_TOK_CTE},
tokd AS (
  SELECT doc_id, {TOKS} AS toks FROM documents
),
pos AS (
  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS p
  FROM tokd
),
matched AS (
  SELECT doc_id FROM pos WHERE term = {t} GROUP BY doc_id
  HAVING min(p) <= {end}
),
scored AS (
  SELECT p.doc_id,
         ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
         * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         AS score
  FROM post p
  JOIN dfs d USING (term)
  JOIN tok t USING (doc_id)
  CROSS JOIN stats s
  WHERE p.term = {t}
    AND p.doc_id IN (SELECT doc_id FROM matched)
)
SELECT doc_id, round(score, 6) AS score
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def scroll_sql(terms: list[str], page_size: int, after: int) -> str:
    """scroll / search_after-on-_doc: bool-must matches in doc_id order,
    keyset-paginated."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH {_TOK_CTE},
matched AS (
  SELECT doc_id
  FROM post
  WHERE term IN ({inlist}) AND doc_id > {after}
  GROUP BY doc_id
  HAVING count(*) = {len(uniq)}
)
SELECT d.doc_id, d.source, d.lang
FROM documents d JOIN matched USING (doc_id)
ORDER BY d.doc_id
LIMIT {page_size}
"""


def term_vectors_sql(doc_id: int) -> str:
    """_termvectors (term_statistics=true): per-term tf, 0-based
    positions, corpus df and ttf (the dfs CTE's cf IS the total term
    frequency)."""
    return f"""
WITH {_TOK_CTE},
tokd AS (
  SELECT doc_id, {TOKS} AS toks FROM documents
),
pos AS (
  SELECT doc_id, unnest(toks) AS term,
         generate_subscripts(toks, 1) - 1 AS p
  FROM tokd
),
tv AS (
  SELECT term, count(*) AS tf, list(p ORDER BY p) AS positions
  FROM pos WHERE doc_id = {doc_id} GROUP BY term
)
SELECT t.term, t.tf, d.df, CAST(d.cf AS BIGINT) AS ttf,
       array_to_string(t.positions, ',') AS positions
FROM tv t JOIN dfs d USING (term)
ORDER BY t.term
"""


def percentile_ranks_sql(values: tuple[float, ...]) -> str:
    """percentile_ranks over doclen: exact (count <= v) / n * 100, one
    conditional-aggregation pass, same float association as Spark."""
    cols = ",\n       ".join(
        f"round(CAST(sum(CASE WHEN doclen <= {float(v)!r} THEN 1 ELSE 0 END)"
        f" AS DOUBLE) / count(*) * 100.0, 6) AS rank_{int(v)}"
        for v in values
    )
    return f"""
WITH tok AS (
  SELECT len({TOKS}) AS doclen FROM documents
)
SELECT count(*) AS n_docs,
       {cols}
FROM tok
"""


def terms_set_sql(terms: list[str], k: int, required_case: str) -> str:
    """terms_set: per-doc dynamic minimum_should_match from a metadata
    expression; eligible docs score as the plain BM25 bag over matched
    terms. ``required_case`` is the same SQL CASE both engines evaluate."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH {_TOK_CTE},
scored AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score,
         count(*) AS n_matched
  FROM post p
  JOIN dfs d USING (term)
  JOIN tok t USING (doc_id)
  CROSS JOIN stats s
  WHERE p.term IN ({inlist})
  GROUP BY p.doc_id
),
gated AS (
  SELECT sc.doc_id, sc.score
  FROM scored sc JOIN documents doc USING (doc_id)
  WHERE sc.n_matched >= ({required_case})
)
SELECT doc_id, round(score, 6) AS score
FROM gated
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def phrase_suggest_sql(
    phrase: tuple[str, str], max_dist: int, size: int
) -> str:
    """Phrase suggester: per-slot Levenshtein candidates (dist 0
    allowed), pairs ranked by adjacent-bigram corpus frequency."""
    q0 = "'" + phrase[0].replace("'", "''") + "'"
    q1 = "'" + phrase[1].replace("'", "''") + "'"
    return f"""
WITH {_TOK_CTE},
tokd AS (
  SELECT doc_id, {TOKS} AS toks FROM documents
),
pos AS (
  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS p
  FROM tokd
),
bg AS (
  SELECT a.term AS w1, b.term AS w2, count(*) AS n_occurrences
  FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.p = a.p + 1
  GROUP BY a.term, b.term
),
c0 AS (
  SELECT term AS w1, levenshtein(term, {q0}) AS d0 FROM dfs
  WHERE len(term) BETWEEN len({q0}) - {max_dist} AND len({q0}) + {max_dist}
    AND levenshtein(term, {q0}) <= {max_dist}
),
c1 AS (
  SELECT term AS w2, levenshtein(term, {q1}) AS d1 FROM dfs
  WHERE len(term) BETWEEN len({q1}) - {max_dist} AND len({q1}) + {max_dist}
    AND levenshtein(term, {q1}) <= {max_dist}
)
SELECT bg.w1, bg.w2, bg.n_occurrences, c0.d0 + c1.d1 AS total_edits
FROM bg JOIN c0 USING (w1) JOIN c1 USING (w2)
ORDER BY bg.n_occurrences DESC, total_edits ASC, bg.w1 ASC, bg.w2 ASC
LIMIT {size}
"""


def bm25_fvf_wand_sql(terms: list[str], k: int, factor: float) -> str:
    """field_value_factor on doclen (the index doc store's own field),
    served through WAND on the Spark side: BM25 * ln(1 + factor*doclen),
    multiplier applied AFTER the per-doc sum — same tree as the kernel's
    ``s * mult[doc]``."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH {_TOK_CTE},
scored AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN dfs d USING (term)
  JOIN tok t USING (doc_id)
  CROSS JOIN stats s
  WHERE p.term IN ({inlist})
  GROUP BY p.doc_id
)
SELECT sc.doc_id,
       round(sc.score * ln(1.0 + {float(factor)!r} * t.doclen), 6) AS score
FROM scored sc JOIN tok t USING (doc_id)
ORDER BY sc.score * ln(1.0 + {float(factor)!r} * t.doclen) DESC,
         sc.doc_id ASC
LIMIT {k}
"""


def bm25_gauss_wand_sql(
    terms: list[str], k: int, origin: float, denom: float
) -> str:
    """Kernel-served gauss decay on doclen: BM25 * exp(-(doclen-origin)^2
    / denom); multiplier bounded by 1, stored WAND bounds admissible."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH {_TOK_CTE},
scored AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN dfs d USING (term)
  JOIN tok t USING (doc_id)
  CROSS JOIN stats s
  WHERE p.term IN ({inlist})
  GROUP BY p.doc_id
),
decayed AS (
  SELECT sc.doc_id,
         sc.score * exp(-((t.doclen - {float(origin)!r})
                          * (t.doclen - {float(origin)!r}))
                        / {float(denom)!r}) AS score
  FROM scored sc JOIN tok t USING (doc_id)
)
SELECT doc_id, round(score, 6) AS score
FROM decayed
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def sort_topk_sql(
    terms: list[str],
    k: int,
    field: str,
    after: tuple[float, int] | None = None,
) -> str:
    """Field sort (desc, doc_id asc) over bool-must matches with an
    optional keyset cursor — no scoring."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    cursor = ""
    if after is not None:
        v, d = after
        cursor = (
            f"WHERE d.{field} < {v!r} "
            f"OR (d.{field} = {v!r} AND d.doc_id > {int(d)})"
        )
    return f"""
WITH {_TOK_CTE},
matched AS (
  SELECT doc_id
  FROM post
  WHERE term IN ({inlist})
  GROUP BY doc_id
  HAVING count(*) = {len(uniq)}
)
SELECT d.doc_id, d.{field}
FROM documents d JOIN matched USING (doc_id)
{cursor}
ORDER BY d.{field} DESC, d.doc_id ASC
LIMIT {k}
"""


def span_not_sql(include: str, exclude: str, k: int, dist: int) -> str:
    """span_not: EXISTS an include position with NO exclude position
    within dist tokens; single-term BM25 of the include term."""
    a = "'" + include.replace("'", "''") + "'"
    b = "'" + exclude.replace("'", "''") + "'"
    return f"""
WITH {_TOK_CTE},
tokd AS (
  SELECT doc_id, {TOKS} AS toks FROM documents
),
pos AS (
  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS p
  FROM tokd
),
matched AS (
  SELECT DISTINCT a.doc_id
  FROM pos a
  WHERE a.term = {a} AND NOT EXISTS (
    SELECT 1 FROM pos bb
    WHERE bb.doc_id = a.doc_id AND bb.term = {b}
      AND abs(a.p - bb.p) <= {dist}
  )
),
scored AS (
  SELECT p.doc_id,
         ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
         * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         AS score
  FROM post p
  JOIN dfs d USING (term)
  JOIN tok t USING (doc_id)
  CROSS JOIN stats s
  WHERE p.term = {a}
    AND p.doc_id IN (SELECT doc_id FROM matched)
)
SELECT doc_id, round(score, 6) AS score
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def multi_index_sql(
    terms: list[str],
    k: int,
    splits: list[tuple[str, float]],
) -> str:
    """Multi-index search: each split predicate defines one physical
    index; BM25 uses SUBSET-LOCAL stats (per-index idf/avgdl — ES does
    not renormalize across indexes), scaled by the split's boost, then
    one global top-k with (score desc, index_id asc, doc_id asc)."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    ctes, unions = [], []
    for i, (pred, boost) in enumerate(splits):
        ctes.append(f"""
tok{i} AS (
  SELECT doc_id, len({TOKS}) AS doclen FROM documents WHERE {pred}
),
stats{i} AS (
  SELECT count(*) AS n_docs,
         CAST(sum(doclen) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
  FROM tok{i}
),
post{i} AS (
  SELECT doc_id, term, count(*) AS tf FROM (
    SELECT doc_id, unnest({TOKS}) AS term FROM documents WHERE {pred}
  ) GROUP BY doc_id, term
),
dfs{i} AS (
  SELECT term, count(*) AS df FROM post{i} GROUP BY term
),
scored{i} AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post{i} p
  JOIN dfs{i} d USING (term)
  JOIN tok{i} t USING (doc_id)
  CROSS JOIN stats{i} s
  WHERE p.term IN ({inlist})
  GROUP BY p.doc_id
)""")
        unions.append(
            f"SELECT {i} AS index_id, doc_id, score * {float(boost)!r} AS score"
            f" FROM scored{i}"
        )
    body = ",".join(ctes)
    u = "\nUNION ALL\n".join(unions)
    return f"""
WITH {body},
allhits AS (
{u}
)
SELECT index_id, doc_id, round(score, 6) AS score
FROM allhits
ORDER BY score DESC, index_id ASC, doc_id ASC
LIMIT {k}
"""


def synonyms_sql(groups: list[list[str]], k: int) -> str:
    """Query-time synonyms (Lucene SynonymQuery blend): per-doc tf = SUM
    over group members, df = MAX of member dfs; each group is one
    scoring slot."""
    pairs = []
    for gi, g in enumerate(groups):
        for t in sorted({str(x) for x in g}):
            pairs.append(f"({gi}, '" + t.replace("'", "''") + "')")
    vals = ", ".join(pairs)
    return f"""
WITH {_TOK_CTE},
gmap(gid, term) AS (VALUES {vals}),
gdf AS (
  SELECT g.gid, max(coalesce(d.df, 0)) AS df
  FROM gmap g LEFT JOIN dfs d USING (term)
  GROUP BY g.gid
  HAVING max(coalesce(d.df, 0)) > 0
),
per_group AS (
  SELECT g.gid, p.doc_id, t.doclen, sum(p.tf) AS tf
  FROM post p JOIN gmap g USING (term) JOIN tok t USING (doc_id)
  GROUP BY g.gid, p.doc_id, t.doclen
),
scored AS (
  SELECT pg.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - gd.df + 0.5) / (gd.df + 0.5))
           * (pg.tf / (pg.tf + 1.2 * (0.25 + 0.75 * pg.doclen / s.avgdl)))
         ) AS score
  FROM per_group pg
  JOIN gdf gd USING (gid)
  CROSS JOIN stats s
  GROUP BY pg.doc_id
)
SELECT doc_id, round(score, 6) AS score
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def constant_score_sql(terms: list[str], k: int, boost: float) -> str:
    """constant_score: every bool-must match gets score = boost."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH {_TOK_CTE},
matched AS (
  SELECT doc_id FROM post WHERE term IN ({inlist})
  GROUP BY doc_id HAVING count(*) = {len(uniq)}
)
SELECT doc_id, {float(boost)!r} AS score
FROM matched
ORDER BY doc_id
LIMIT {k}
"""


def min_score_sql(terms: list[str], k: int, min_score: float) -> str:
    """min_score: raw-score floor before the top-k."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH {_TOK_CTE},
scored AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN dfs d USING (term)
  JOIN tok t USING (doc_id)
  CROSS JOIN stats s
  WHERE p.term IN ({inlist})
  GROUP BY p.doc_id
  HAVING sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) >= {float(min_score)!r}
)
SELECT doc_id, round(score, 6) AS score
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def analyze_sql(text: str) -> str:
    """_analyze on a literal string: (position, token) via the shared
    tokenizer regex; generate_subscripts is 1-based, positions 0-based."""
    lit = "'" + text.replace("'", "''") + "'"
    return f"""
WITH toks AS (
  SELECT regexp_extract_all(lower({lit}), '{TOKEN_PATTERN}') AS t
)
SELECT generate_subscripts(t, 1) - 1 AS position, unnest(t) AS token
FROM toks
ORDER BY position
"""


def mget_sql(doc_ids: list[int]) -> str:
    """_mget: point lookups by id list; missing ids absent."""
    ids = ", ".join(str(int(d)) for d in sorted(set(doc_ids)))
    return f"""
SELECT doc_id, source, lang, n_chars
FROM documents
WHERE doc_id IN ({ids})
ORDER BY doc_id
"""


def sampler_terms_sql(terms: list[str], shard_size: int, field: str) -> str:
    """sampler agg: terms sub-agg over the top-shard_size best-scoring
    docs (raw-score sample selection, doc_id tie-break)."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH {_TOK_CTE},
scored AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN dfs d USING (term)
  JOIN tok t USING (doc_id)
  CROSS JOIN stats s
  WHERE p.term IN ({inlist})
  GROUP BY p.doc_id
),
sample AS (
  SELECT doc_id FROM scored ORDER BY score DESC, doc_id ASC
  LIMIT {shard_size}
)
SELECT d.{field}, count(*) AS doc_count
FROM documents d JOIN sample USING (doc_id)
GROUP BY d.{field}
ORDER BY doc_count DESC, d.{field} ASC
"""


def stats_bucket_sql(interval: str = "hour") -> str:
    """stats_bucket pipeline: per event_type, stats over its
    date-histogram bucket counts."""
    return f"""
WITH hist AS (
  SELECT event_type, date_trunc('{interval}', ts) AS bucket,
         count(*) AS n_events
  FROM events GROUP BY event_type, bucket
)
SELECT event_type,
       count(*) AS n_buckets,
       min(n_events) AS min_bucket,
       max(n_events) AS max_bucket,
       CAST(sum(n_events) AS BIGINT) AS sum_events,
       round(CAST(sum(n_events) AS DOUBLE) / count(*), 6) AS avg_per_bucket
FROM hist
GROUP BY event_type
ORDER BY event_type
"""


# ------------------------------------------------------------ parent-child
HAS_CHILD = """
WITH kids AS (
  SELECT l_orderkey, count(*) AS n_children,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS child_score
  FROM lineitem
  WHERE l_quantity >= 30 AND l_returnflag = 'R'
  GROUP BY l_orderkey
  HAVING count(*) >= 2
)
SELECT o.o_orderkey, o.o_orderpriority,
       CAST(k.n_children AS BIGINT) AS n_children, k.child_score
FROM orders o JOIN kids k ON o.o_orderkey = k.l_orderkey
ORDER BY child_score DESC, o_orderkey ASC
LIMIT 20
"""

HAS_PARENT = """
SELECT l.l_orderkey, l.l_linenumber, round(o.o_totalprice, 2) AS parent_score
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT' AND o.o_totalprice > 400000
ORDER BY parent_score DESC, l_orderkey ASC, l_linenumber ASC
LIMIT 20
"""

CHILDREN_AGG = """
WITH per_order AS (
  SELECT l_orderkey, count(*) AS n_lines,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
           AS rev_cents
  FROM lineitem GROUP BY l_orderkey
)
SELECT o.o_orderpriority AS priority,
       CAST(sum(coalesce(p.n_lines, 0)) AS BIGINT) AS n_children,
       round(CAST(sum(coalesce(p.rev_cents, 0)) AS DOUBLE) / 100.0, 2)
         AS child_revenue
FROM orders o LEFT JOIN per_order p ON o.o_orderkey = p.l_orderkey
GROUP BY o.o_orderpriority
ORDER BY priority
LIMIT 10
"""


# ----------------------------------------------------- metric aggregations
WEIGHTED_AVG = """
SELECT l_returnflag AS flag,
       count(*) AS value_count,
       round((CAST(sum(CAST(round(l_extendedprice * l_quantity * 100)
                            AS BIGINT)) AS DOUBLE) / 100.0)
             / CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE),
             6) AS weighted_avg
FROM lineitem
GROUP BY l_returnflag
ORDER BY flag
"""

MAD_AGG = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_type, abs(e.value - m.med) AS adev
  FROM events e JOIN med m USING (event_type)
)
SELECT m.event_type, round(m.med, 6) AS median,
       round(quantile_cont(d.adev, 0.5), 6) AS mad
FROM dev d JOIN med m USING (event_type)
GROUP BY m.event_type, m.med
ORDER BY 1
"""


def completion_suggest_sql(prefix: str = "s", k: int = 10) -> str:
    return f"""
SELECT suggestion, count(*) AS weight FROM (
  SELECT unnest({TOKS}) AS suggestion FROM documents
)
WHERE suggestion LIKE '{prefix}%'
GROUP BY suggestion
ORDER BY weight DESC, suggestion ASC
LIMIT {k}
"""


# ------------------------------------------------ hybrid retrieval / kNN
def cosine_topk_filtered_sql(
    n_queries: int = 5, k: int = 10, label_mod: int = 3
) -> str:
    return f"""
WITH emb AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < {n_queries}),
c AS (SELECT vec_id, label, v FROM emb
      WHERE vec_id >= {n_queries} AND label % {label_mod} = 0),
scored AS (
  SELECT q.query_id, c.vec_id, c.label,
         round(list_dot_product(q.qv, c.v)
           / (sqrt(list_dot_product(q.qv, q.qv))
              * sqrt(list_dot_product(c.v, c.v))), 6) AS cosine
  FROM c CROSS JOIN q
),
r AS (
  SELECT query_id, vec_id, label, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, label, cosine
FROM r WHERE rank <= {k}
ORDER BY query_id, rank
"""


def rrf_hybrid_sql(
    terms: list[str],
    qvec_id: int = 42,
    k: int = 10,
    window: int = 20,
    rank_const: int = 60,
) -> str:
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH {_TOK_CTE},
scored AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN dfs d USING (term)
  JOIN tok t USING (doc_id)
  CROSS JOIN stats s
  WHERE p.term IN ({inlist})
  GROUP BY p.doc_id
),
bmtop AS (
  SELECT doc_id, round(score, 6) AS s
  FROM scored ORDER BY score DESC, doc_id ASC LIMIT {window}
),
bm AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank_bm25
  FROM bmtop
),
emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
qv AS (SELECT v AS q FROM emb WHERE vec_id = {qvec_id}),
cs AS (
  SELECT e.vec_id AS doc_id,
         round(list_dot_product(qv.q, e.v)
           / (sqrt(list_dot_product(qv.q, qv.q))
              * sqrt(list_dot_product(e.v, e.v))), 6) AS cosine
  FROM emb e CROSS JOIN qv WHERE e.vec_id != {qvec_id}
),
kn AS (
  SELECT doc_id, rank_knn FROM (
    SELECT doc_id,
           row_number() OVER (ORDER BY cosine DESC, doc_id ASC) AS rank_knn
    FROM cs
  ) WHERE rank_knn <= {window}
)
SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
       CAST(a.rank_bm25 AS INT) AS rank_bm25,
       CAST(b.rank_knn AS INT) AS rank_knn,
       round(coalesce(1.0 / ({rank_const} + a.rank_bm25), 0.0)
             + coalesce(1.0 / ({rank_const} + b.rank_knn), 0.0), 6) AS rrf
FROM bm a FULL JOIN kn b ON a.doc_id = b.doc_id
ORDER BY coalesce(1.0 / ({rank_const} + a.rank_bm25), 0.0)
         + coalesce(1.0 / ({rank_const} + b.rank_knn), 0.0) DESC,
         coalesce(a.doc_id, b.doc_id) ASC
LIMIT {k}
"""


# -------------------------------------------------- corpus-cleanup oracles
COLLAPSE_REPEATS = f"""
WITH tok AS (SELECT doc_id, {TOKS} AS toks FROM documents),
k AS (
  SELECT doc_id, toks,
         list_filter(toks, (x, i) -> i = 1 OR x != toks[i - 1]) AS kept
  FROM tok
)
SELECT doc_id,
       CAST(len(toks) AS INT) AS n_tokens,
       CAST(len(kept) AS INT) AS n_kept,
       CAST(len(toks) - len(kept) AS INT) AS n_removed,
       md5(array_to_string(kept, ' ')) AS clean_fp
FROM k ORDER BY doc_id
"""

_DUP_RATIO = """CASE WHEN len(grams) > 0
  THEN 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams)
  ELSE 0.0 END"""

DUP_NGRAM_RATIO = f"""
WITH tok AS (SELECT doc_id, {TOKS} AS toks FROM documents),
ng AS (
  SELECT doc_id,
    CASE WHEN len(toks) >= 3 THEN
      list_transform(range(1, len(toks) - 1),
        i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2]))
    ELSE CAST([] AS VARCHAR[]) END AS grams
  FROM tok
)
SELECT doc_id,
       CAST(len(grams) AS INT) AS n_ngrams,
       CAST(len(list_distinct(grams)) AS INT) AS n_distinct,
       round({_DUP_RATIO}, 6) AS dup_ratio,
       ({_DUP_RATIO}) <= 0.005 AS keep
FROM ng ORDER BY doc_id
"""


def pii_scrub_sql(email: str, phone: str, ip: str) -> str:
    return f"""
WITH d AS (
  SELECT doc_id,
         concat(text, ' contact user', CAST(doc_id AS VARCHAR),
                '@example.com or 555-',
                lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                ' from 10.0.', CAST(doc_id % 256 AS VARCHAR), '.1') AS t2
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t2, '{email}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(t2, '{phone}')) AS INT) AS n_phones,
       CAST(len(regexp_extract_all(t2, '{ip}')) AS INT) AS n_ips,
       md5(regexp_replace(
             regexp_replace(
               regexp_replace(t2, '{email}', '<EMAIL>', 'g'),
               '{phone}', '<PHONE>', 'g'),
             '{ip}', '<IP>', 'g')) AS scrubbed_fp
FROM d ORDER BY doc_id
"""


# ------------------------------------------------ query_string / rescore
def query_string_sql(qstring: str, k: int = 10, syntax: str = "lucene") -> str:
    """Renders the SAME parsed AST the Spark path evaluates (both
    query-string dialects — ``syntax="simple"`` selects the
    simple_query_string parser, everything downstream is shared)."""
    from unichem2index_spark.functions.querystring import (
        parse_query_string,
        parse_simple_query_string,
        positive_terms,
        render_sql,
    )

    parse = (
        parse_simple_query_string if syntax == "simple" else parse_query_string
    )
    node = parse(qstring)
    pos = positive_terms(node)
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in pos)
    cond = render_sql(node, "toks", "s")
    score_join = (
        f"""
scored AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN dfs d USING (term)
  JOIN tok t USING (doc_id)
  CROSS JOIN stats s
  WHERE p.term IN ({inlist})
  GROUP BY p.doc_id
),"""
        if pos
        else "scored AS (SELECT NULL AS doc_id, NULL AS score WHERE false),"
    )
    return f"""
WITH {_TOK_CTE},
{score_join}
tok2 AS (
  SELECT doc_id, {TOKS} AS toks,
         ' ' || array_to_string({TOKS}, ' ') || ' ' AS s
  FROM documents
),
elig AS (SELECT doc_id FROM tok2 WHERE {cond})
SELECT e.doc_id, round(coalesce(sc.score, 0.0), 6) AS score
FROM elig e LEFT JOIN scored sc ON e.doc_id = sc.doc_id
ORDER BY coalesce(sc.score, 0.0) DESC, e.doc_id ASC
LIMIT {k}
"""


def rescore_sql(
    terms: list[str],
    phrase: list[str],
    window: int = 50,
    k: int = 10,
    wq: float = 1.0,
    wr: float = 2.0,
) -> str:
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    needle = (" " + " ".join(phrase) + " ").replace("'", "''")
    return f"""
WITH {_TOK_CTE},
scored AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN dfs d USING (term)
  JOIN tok t USING (doc_id)
  CROSS JOIN stats s
  WHERE p.term IN ({inlist})
  GROUP BY p.doc_id
),
base AS (
  SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id ASC
  LIMIT {window}
),
tok2 AS (
  SELECT doc_id, ' ' || array_to_string({TOKS}, ' ') || ' ' AS s
  FROM documents
),
j AS (
  SELECT b.doc_id, b.score,
         position('{needle}' IN t.s) > 0 AS phrase_match
  FROM base b JOIN tok2 t ON b.doc_id = t.doc_id
)
SELECT doc_id,
       round({wq} * score
             + {wr} * CAST(CAST(phrase_match AS INT) AS DOUBLE), 6) AS score,
       phrase_match
FROM j
ORDER BY {wq} * score + {wr} * CAST(CAST(phrase_match AS INT) AS DOUBLE) DESC,
         doc_id ASC
LIMIT {k}
"""


# ----------------------------------------- multi_match / pinned / linear
def _field_score_ctes(prefix: str, field_expr: str, inlist: str) -> str:
    """Per-FIELD BM25 CTE block (own n_docs/avgdl/df — Lucene per-field
    statistics). ``field_expr`` slices the token list for the field."""
    return f"""
{prefix}f AS (
  SELECT doc_id, {field_expr} AS ftoks FROM tokall
  WHERE len({field_expr}) > 0
),
{prefix}stats AS (
  SELECT count(*) AS n_docs,
         CAST(sum(len(ftoks)) AS DOUBLE) / count(*) AS avgdl
  FROM {prefix}f
),
{prefix}post AS (
  SELECT doc_id, term, count(*) AS tf FROM (
    SELECT doc_id, unnest(ftoks) AS term FROM {prefix}f
  ) GROUP BY doc_id, term
),
{prefix}dfs AS (SELECT term, count(*) AS df FROM {prefix}post GROUP BY term),
{prefix}dl AS (SELECT doc_id, len(ftoks) AS dl FROM {prefix}f),
{prefix}scored AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl)))
         ) AS score
  FROM {prefix}post p
  JOIN {prefix}dfs d USING (term)
  JOIN {prefix}dl l USING (doc_id)
  CROSS JOIN {prefix}stats s
  WHERE p.term IN ({inlist})
  GROUP BY p.doc_id
)"""


def multi_match_sql(
    terms: list[str], k: int = 10, tie: float = 0.3, title_len: int = 8
) -> str:
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    title = f"toks[1:{title_len}]"
    body = f"toks[{title_len + 1}:len(toks)]"
    return f"""
WITH tokall AS (SELECT doc_id, {TOKS} AS toks FROM documents),
{_field_score_ctes('t_', title, inlist)},
{_field_score_ctes('b_', body, inlist)},
j AS (
  SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
         coalesce(a.score, 0.0) AS t, coalesce(b.score, 0.0) AS b
  FROM t_scored a FULL JOIN b_scored b ON a.doc_id = b.doc_id
)
SELECT doc_id,
       round(greatest(t, b) + {tie} * least(t, b), 6) AS score
FROM j
ORDER BY greatest(t, b) + {tie} * least(t, b) DESC, doc_id ASC
LIMIT {k}
"""


def pinned_sql(terms: list[str], pinned_ids: list[int], k: int = 10) -> str:
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    npin = len(pinned_ids)
    vals = ", ".join(f"({i + 1}, {int(d)})" for i, d in enumerate(pinned_ids))
    notin = ", ".join(str(int(d)) for d in pinned_ids)
    return f"""
WITH {_TOK_CTE},
scored AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN dfs d USING (term)
  JOIN tok t USING (doc_id)
  CROSS JOIN stats s
  WHERE p.term IN ({inlist})
  GROUP BY p.doc_id
),
org AS (
  SELECT doc_id, score FROM scored WHERE doc_id NOT IN ({notin})
  ORDER BY score DESC, doc_id ASC LIMIT {max(k - npin, 0)}
)
SELECT * FROM (
  SELECT CAST(r AS INT) AS rank, CAST(doc_id AS BIGINT) AS doc_id,
         true AS is_pinned, 0.0 AS score
  FROM (VALUES {vals}) v(r, doc_id)
  UNION ALL
  SELECT CAST({npin} + row_number() OVER (ORDER BY score DESC, doc_id ASC)
              AS INT) AS rank,
         doc_id, false AS is_pinned, round(score, 6) AS score
  FROM org
)
ORDER BY rank
"""


def linear_hybrid_sql(
    terms: list[str],
    qvec_id: int = 42,
    k: int = 10,
    window: int = 20,
    w_lex: float = 0.7,
    w_knn: float = 0.3,
) -> str:
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH {_TOK_CTE},
scored AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN dfs d USING (term)
  JOIN tok t USING (doc_id)
  CROSS JOIN stats s
  WHERE p.term IN ({inlist})
  GROUP BY p.doc_id
),
bm AS (
  SELECT doc_id, round(score, 6) AS s FROM scored
  ORDER BY score DESC, doc_id ASC LIMIT {window}
),
bm_n AS (
  SELECT doc_id,
         CASE WHEN max(s) OVER () = min(s) OVER () THEN 1.0
              ELSE (s - min(s) OVER ()) / (max(s) OVER () - min(s) OVER ())
         END AS nl
  FROM bm
),
emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
qv AS (SELECT v AS q FROM emb WHERE vec_id = {qvec_id}),
kn AS (
  SELECT e.vec_id AS doc_id,
         round(list_dot_product(qv.q, e.v)
           / (sqrt(list_dot_product(qv.q, qv.q))
              * sqrt(list_dot_product(e.v, e.v))), 6) AS c
  FROM emb e CROSS JOIN qv WHERE e.vec_id != {qvec_id}
  ORDER BY c DESC, e.vec_id ASC LIMIT {window}
),
kn_n AS (
  SELECT doc_id,
         CASE WHEN max(c) OVER () = min(c) OVER () THEN 1.0
              ELSE (c - min(c) OVER ()) / (max(c) OVER () - min(c) OVER ())
         END AS nk
  FROM kn
)
SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
       round({w_lex} * coalesce(a.nl, 0.0)
             + {w_knn} * coalesce(b.nk, 0.0), 6) AS score
FROM bm_n a FULL JOIN kn_n b ON a.doc_id = b.doc_id
ORDER BY {w_lex} * coalesce(a.nl, 0.0) + {w_knn} * coalesce(b.nk, 0.0) DESC,
         coalesce(a.doc_id, b.doc_id) ASC
LIMIT {k}
"""


# --------------------------------------------------------- ingest pipeline
def ingest_pipeline_sql(procs: list[dict]) -> str:
    """Rendered by the SAME compiler walk as the Spark path."""
    from unichem2index_spark.functions.ingestpipeline import (
        compile_pipeline_sql,
    )

    base = {
        "doc_id": "doc_id",
        "text": "text",
        "lang": "lang",
        "source": "source",
        "n_chars": "n_chars",
    }
    out = compile_pipeline_sql(procs, base)
    cols = []
    for name, expr in out.items():
        if name == "words":
            cols.append(f"CAST(len({expr}) AS INT) AS word_count")
            cols.append(
                f"md5(array_to_string({expr}, chr(31))) AS words_fp"
            )
        else:
            cols.append(f"{expr} AS {name}")
    sel = ",\n       ".join(cols)
    return f"SELECT {sel}\nFROM documents\nORDER BY doc_id"


def auto_date_histogram_sql(target_buckets: int = 20) -> str:
    """Re-derives the interval rung from the same span/interval + 1
    estimate the Spark path computes driver-side."""
    return f"""
WITH span AS (
  SELECT epoch(max(ts)) - epoch(min(ts)) AS s FROM events
),
sel AS (
  SELECT CASE
    WHEN s / 60.0 + 1.0 <= {target_buckets} THEN 'minute'
    WHEN s / 3600.0 + 1.0 <= {target_buckets} THEN 'hour'
    WHEN s / 86400.0 + 1.0 <= {target_buckets} THEN 'day'
    WHEN s / 604800.0 + 1.0 <= {target_buckets} THEN 'week'
    WHEN s / 2592000.0 + 1.0 <= {target_buckets} THEN 'month'
    ELSE 'year' END AS unit
  FROM span
)
SELECT (SELECT unit FROM sel) AS interval,
       date_trunc((SELECT unit FROM sel), ts) AS bucket,
       count(*) AS n_events
FROM events
GROUP BY bucket
ORDER BY bucket
"""


QUALITY_FILTER = f"""
WITH tok AS (SELECT doc_id, {TOKS} AS toks FROM documents),
base AS (
  SELECT doc_id, toks,
         len(toks) AS n,
         list_sum(list_transform(toks, x -> CAST(length(x) AS DOUBLE)))
           / greatest(CAST(len(toks) AS DOUBLE), 1.0) AS mean_len,
         CASE WHEN len(toks) >= 3 THEN
           list_transform(range(1, len(toks) - 1),
             i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2]))
         ELSE CAST([] AS VARCHAR[]) END AS grams,
         len(list_filter(toks,
             x -> list_contains(['the','a','of','and','is','to','in'], x)))
           AS stops
  FROM tok
),
sig AS (
  SELECT doc_id, n, mean_len, stops,
         CASE WHEN len(grams) > 0
              THEN 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
                   / len(grams)
              ELSE 0.0 END AS dup
  FROM base
),
v AS (
  SELECT doc_id, n, mean_len, dup, stops,
         list_filter([
           CASE WHEN n < 15 OR n > 5000 THEN 'length' END,
           CASE WHEN mean_len < 2.0 OR mean_len > 10.0
                THEN 'mean_tok_len' END,
           CASE WHEN dup > 0.005 THEN 'dup_ngrams' END,
           CASE WHEN stops < 1 THEN 'stopwords' END
         ], x -> x IS NOT NULL) AS failed_rules
  FROM sig
)
SELECT doc_id,
       CAST(n AS INT) AS n_tokens,
       round(mean_len, 6) AS mean_tok_len,
       round(dup, 6) AS dup_ratio,
       CAST(stops AS INT) AS stop_hits,
       coalesce(array_to_string(failed_rules, ','), '') AS failed_rules,
       len(failed_rules) = 0 AS keep
FROM v
ORDER BY doc_id
"""


def terms_agg_sharded_sql(
    size: int = 5, shard_size: int = 8, n_shards: int = 4
) -> str:
    return f"""
WITH tokset AS (
  SELECT DISTINCT CAST(doc_id % {n_shards} AS INT) AS shard, doc_id, term
  FROM (SELECT doc_id, unnest({TOKS}) AS term FROM documents)
),
per_shard AS (
  SELECT shard, term, count(*) AS cnt FROM tokset GROUP BY shard, term
),
ranked AS (
  SELECT shard, term, cnt,
         row_number() OVER (PARTITION BY shard
                            ORDER BY cnt DESC, term ASC) AS r
  FROM per_shard
),
reported AS (SELECT * FROM ranked WHERE r <= {shard_size}),
shard_stats AS (
  SELECT shard,
         CASE WHEN count(*) <= {shard_size} THEN 0
              ELSE min(CASE WHEN r <= {shard_size} THEN cnt END) END AS err
  FROM ranked GROUP BY shard
),
tot AS (SELECT sum(err) AS total_err FROM shard_stats),
merged AS (
  SELECT rep.term, sum(rep.cnt) AS doc_count, sum(ss.err) AS reported_err
  FROM reported rep JOIN shard_stats ss USING (shard)
  GROUP BY rep.term
)
SELECT m.term, CAST(m.doc_count AS BIGINT) AS doc_count,
       CAST(t.total_err - m.reported_err AS BIGINT)
         AS doc_count_error_upper_bound
FROM merged m CROSS JOIN tot t
ORDER BY doc_count DESC, term ASC
LIMIT {size}
"""


def eql_sequence_sql(
    first: str = "click", then: str = "purchase", within_sec: float = 7200.0
) -> str:
    return f"""
WITH e AS (
  SELECT event_id, ts, user_id, event_type FROM events
  WHERE event_type IN ('{first}', '{then}')
),
m AS (
  SELECT user_id, ts, event_id, event_type,
         last_value(CASE WHEN event_type = '{first}'
                         THEN struct_pack(fts := ts, fid := event_id)
                    END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS f
  FROM e
)
SELECT user_id,
       f.fid AS first_event_id,
       event_id AS second_event_id,
       round(CAST(date_diff('microsecond', f.fts, ts) AS DOUBLE)
             / 1000000.0, 6) AS gap_sec
FROM m
WHERE event_type = '{then}' AND f IS NOT NULL
  AND CAST(date_diff('microsecond', f.fts, ts) AS DOUBLE) / 1000000.0
      <= {within_sec}
ORDER BY second_event_id
"""


def bm25_regexp_sql(pattern: str, k: int, max_expansions: int) -> str:
    """Anchored-regex dictionary expansion (Lucene full-match regexp)."""
    pat = pattern.replace("'", "''")
    cte = f"""
exp_terms AS (
  SELECT term FROM dfs WHERE regexp_full_match(term, '{pat}')
  ORDER BY term LIMIT {max_expansions}
)"""
    return _bm25_over_expansion(cte, k)


def multi_terms_sql(size: int = 10) -> str:
    return f"""
SELECT lang, source, count(*) AS doc_count
FROM documents
GROUP BY lang, source
ORDER BY doc_count DESC, lang ASC, source ASC
LIMIT {size}
"""


def t_test_sql(type_a: str = "click", type_b: str = "error") -> str:
    return f"""
WITH m AS (
  SELECT event_type, count(*) AS n,
         sum(CAST(round(value * 100) AS BIGINT)) AS s1,
         sum(CAST(round(value * 100) AS BIGINT)
             * CAST(round(value * 100) AS BIGINT)) AS s2
  FROM events WHERE event_type IN ('{type_a}', '{type_b}')
  GROUP BY event_type
),
a AS (SELECT n AS na, s1 AS sa, s2 AS qa FROM m WHERE event_type = '{type_a}'),
b AS (SELECT n AS nb, s1 AS sb, s2 AS qb FROM m WHERE event_type = '{type_b}')
SELECT na, nb,
  round((CAST(sa AS DOUBLE) / 100.0) / CAST(na AS DOUBLE), 6) AS mean_a,
  round((CAST(sb AS DOUBLE) / 100.0) / CAST(nb AS DOUBLE), 6) AS mean_b,
  round(
    ((CAST(sa AS DOUBLE) / 100.0) / CAST(na AS DOUBLE)
     - (CAST(sb AS DOUBLE) / 100.0) / CAST(nb AS DOUBLE))
    / sqrt(
        (((CAST(qa AS DOUBLE) / 10000.0)
          - (CAST(sa AS DOUBLE) / 100.0) * (CAST(sa AS DOUBLE) / 100.0)
            / CAST(na AS DOUBLE)) / (CAST(na AS DOUBLE) - 1.0))
        / CAST(na AS DOUBLE)
        + (((CAST(qb AS DOUBLE) / 10000.0)
          - (CAST(sb AS DOUBLE) / 100.0) * (CAST(sb AS DOUBLE) / 100.0)
            / CAST(nb AS DOUBLE)) / (CAST(nb AS DOUBLE) - 1.0))
        / CAST(nb AS DOUBLE)
      ), 6) AS t_stat
FROM a CROSS JOIN b
"""


BOXPLOT = """
WITH q AS (
  SELECT event_type,
         min(value) AS vmin,
         quantile_cont(value, 0.25) AS q1,
         quantile_cont(value, 0.5) AS q2,
         quantile_cont(value, 0.75) AS q3,
         max(value) AS vmax
  FROM events GROUP BY event_type
)
SELECT event_type,
       round(vmin, 6) AS min,
       round(q1, 6) AS q1,
       round(q2, 6) AS median,
       round(q3, 6) AS q3,
       round(vmax, 6) AS max,
       round(greatest(vmin, q1 - 1.5 * (q3 - q1)), 6) AS lower_whisker,
       round(least(vmax, q3 + 1.5 * (q3 - q1)), 6) AS upper_whisker
FROM q
ORDER BY event_type
"""


def field_caps_sql(tables=("documents", "events", "embeddings")) -> str:
    """Independent walk over DuckDB's catalog types -> the same ES
    mapping the Spark schema walk produces."""
    parts = []
    for name in tables:
        parts.append(f"""
SELECT '{name}' AS idx, column_name AS field, column_type
FROM (DESCRIBE {name})""")
    union = "\nUNION ALL\n".join(parts)
    return f"""
WITH cols AS ({union}),
mapped AS (
  SELECT idx, field,
    CASE
      WHEN column_type = 'VARCHAR' AND field = 'text' THEN 'text'
      WHEN column_type = 'VARCHAR' THEN 'keyword'
      WHEN column_type = 'BIGINT' THEN 'long'
      WHEN column_type = 'INTEGER' THEN 'integer'
      WHEN column_type = 'DOUBLE' THEN 'double'
      WHEN column_type = 'FLOAT' THEN 'float'
      WHEN column_type = 'TIMESTAMP' THEN 'date'
      WHEN column_type = 'FLOAT[]' THEN 'dense_vector'
      WHEN column_type = 'BOOLEAN' THEN 'boolean'
      WHEN column_type = 'BLOB' THEN 'binary'
      ELSE lower(column_type) END AS es_type
  FROM cols
)
SELECT idx, field, es_type,
       es_type != 'dense_vector' AS searchable,
       es_type IN ('keyword', 'long', 'integer', 'double', 'float', 'date')
         AS aggregatable
FROM mapped
ORDER BY idx, field
"""


def query_string_wand_sql(
    terms: list[str], k: int, min_match: int, exclude: list[str]
) -> str:
    """Flat query_string on the kernel path: msm conjunction +
    must_not exclusion in one scored CTE."""
    excl = sorted(set(exclude))
    uniq = sorted(set(terms) - set(excl))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    exguard = ""
    if excl:
        exlist = ", ".join("'" + t.replace("'", "''") + "'" for t in excl)
        exguard = (
            f"AND p.doc_id NOT IN "
            f"(SELECT doc_id FROM post WHERE term IN ({exlist}))"
        )
    return f"""
WITH {_TOK_CTE},
scored AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN dfs d USING (term)
  JOIN tok t USING (doc_id)
  CROSS JOIN stats s
  WHERE p.term IN ({inlist})
    {exguard}
  GROUP BY p.doc_id
  HAVING count(*) >= {min_match}
)
SELECT doc_id, round(score, 6) AS score
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def sample_mixture_sql(
    quotas: dict, default_quota: int
) -> str:
    cases = " ".join(
        f"WHEN source = '{s}' THEN {int(q)}"
        for s, q in sorted(quotas.items())
    )
    return f"""
WITH h AS (
  SELECT doc_id, source,
         ((doc_id % {MOD} + 1) * {FP_MULT}) % {MOD} AS h
  FROM documents
),
r AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk
  FROM h
)
SELECT doc_id, source, CAST(rk AS INT) AS sample_rank
FROM r
WHERE rk <= CASE {cases} ELSE {int(default_quota)} END
ORDER BY source, sample_rank
"""


def maxsim_sql(qvec_id: int = 42, k: int = 10, n_sub: int = 4) -> str:
    dim = 64 // n_sub

    def sub(col, i):
        return f"{col}[{i * dim + 1}:{(i + 1) * dim}]"

    def cos(a, b):
        return (
            f"round(list_dot_product({a}, {b}) / "
            f"(sqrt(list_dot_product({a}, {a})) * "
            f"sqrt(list_dot_product({b}, {b}))), 6)"
        )

    terms = []
    for i in range(n_sub):
        pairs = ", ".join(
            cos(sub("q.qv", i), sub("c.v", j)) for j in range(n_sub)
        )
        terms.append(f"greatest({pairs})")
    score = " + ".join(terms)
    return f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
q AS (SELECT v AS qv FROM emb WHERE vec_id = {qvec_id}),
c AS (SELECT vec_id, v FROM emb WHERE vec_id != {qvec_id}),
scored AS (
  SELECT c.vec_id, {score} AS maxsim
  FROM c CROSS JOIN q
)
SELECT vec_id, round(maxsim, 6) AS maxsim
FROM scored
ORDER BY maxsim DESC, vec_id ASC
LIMIT {k}
"""


def sessionize_sql(gap_sec: int = 1800) -> str:
    """Gaps-and-islands formulation of session_window semantics: a new
    session starts when the gap from the previous event reaches
    gap_sec (Spark's session window is [start, last+gap) — an
    exactly-gap diff opens a NEW session); session id = running sum of
    start flags."""
    return f"""
WITH e AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   IS NULL THEN 1
              WHEN CAST(date_diff('microsecond',
                        lag(ts) OVER (PARTITION BY user_id ORDER BY ts),
                        ts) AS DOUBLE) / 1000000.0 >= {gap_sec} THEN 1
              ELSE 0 END AS new_session
  FROM events
),
s AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM e
),
g AS (
  SELECT user_id, sid, count(*) AS n_events,
         min(ts) AS start_ts, max(ts) AS end_ts
  FROM s GROUP BY user_id, sid
)
SELECT user_id,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY start_ts)
            AS INT) AS session_seq,
       CAST(n_events AS BIGINT) AS n_events,
       start_ts, end_ts,
       round(CAST(date_diff('microsecond', start_ts, end_ts) AS DOUBLE)
             / 1000000.0, 6) AS duration_sec
FROM g
ORDER BY user_id, session_seq
"""


NORMALIZE_AGG = """
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
         count(*) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT event_type, bucket, n_events,
       round(CAST(n_events AS DOUBLE)
             / CAST(sum(n_events) OVER (PARTITION BY event_type) AS DOUBLE)
             * 100.0, 6) AS pct_of_total
FROM daily
ORDER BY event_type, bucket
"""


def bucket_sort_sql(offset: int = 2, size: int = 5) -> str:
    return f"""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
         count(*) AS n_events
  FROM events GROUP BY 1
),
r AS (
  SELECT bucket, n_events,
         row_number() OVER (ORDER BY n_events DESC, bucket ASC) AS rk
  FROM daily
)
SELECT CAST(rk AS INT) AS rk, bucket, n_events
FROM r WHERE rk > {offset} AND rk <= {offset + size}
ORDER BY rk
"""


RATE_AGG = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
       count(*) AS n_events,
       round(CAST(count(*) AS DOUBLE) / 24.0, 6) AS per_hour
FROM events GROUP BY 1 ORDER BY bucket
"""


def serial_diff_sql(lag: int = 1) -> str:
    return f"""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
         count(*) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT event_type, bucket, n_events,
       n_events - lag(n_events, {lag})
         OVER (PARTITION BY event_type ORDER BY bucket) AS diff
FROM daily
ORDER BY event_type, bucket
"""


def cosine_radius_sql(n_queries: int = 5, min_cosine: float = 0.35) -> str:
    return f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < {n_queries}),
c AS (SELECT vec_id, v FROM emb WHERE vec_id >= {n_queries}),
scored AS (
  SELECT q.query_id, c.vec_id,
         round(list_dot_product(q.qv, c.v)
           / (sqrt(list_dot_product(q.qv, q.qv))
              * sqrt(list_dot_product(c.v, c.v))), 6) AS cosine
  FROM c CROSS JOIN q
)
SELECT query_id, vec_id, cosine FROM scored
WHERE cosine >= {min_cosine}
ORDER BY query_id, cosine DESC, vec_id ASC
"""


def funnel_sql(steps=("view", "click", "purchase")) -> str:
    s1, s2, s3 = steps
    return f"""
WITH t1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = '{s1}' GROUP BY user_id
),
t2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN t1 USING (user_id)
  WHERE e.event_type = '{s2}' AND e.ts >= t1.t1
  GROUP BY e.user_id
),
t3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN t2 USING (user_id)
  WHERE e.event_type = '{s3}' AND e.ts >= t2.t2
  GROUP BY e.user_id
),
n AS (
  SELECT (SELECT count(*) FROM t1) AS n1,
         (SELECT count(*) FROM t2) AS n2,
         (SELECT count(*) FROM t3) AS n3
)
SELECT * FROM (
  SELECT 1 AS step, '{s1}' AS event_type, n1 AS n_users,
         100.0 AS pct_of_prev FROM n
  UNION ALL
  SELECT 2, '{s2}', n2,
         CASE WHEN n1 > 0
              THEN round(CAST(n2 AS DOUBLE) / n1 * 100.0, 6)
              ELSE 0.0 END FROM n
  UNION ALL
  SELECT 3, '{s3}', n3,
         CASE WHEN n2 > 0
              THEN round(CAST(n3 AS DOUBLE) / n2 * 100.0, 6)
              ELSE 0.0 END FROM n
)
ORDER BY step
"""


def percolate_query_strings_sql(
    registrations: list[tuple[int, str]]
) -> str:
    """Per-registration SELECT over the same rendered AST, unioned."""
    from unichem2index_spark.functions.querystring import (
        parse_query_string,
        render_sql,
    )

    parts = []
    for qid, qs in registrations:
        cond = render_sql(parse_query_string(qs), "toks", "s")
        parts.append(
            f"SELECT CAST({int(qid)} AS BIGINT) AS query_id, doc_id\n"
            f"FROM tok2 WHERE {cond}"
        )
    union = "\nUNION ALL\n".join(parts)
    return f"""
WITH tok2 AS (
  SELECT doc_id, {TOKS} AS toks,
         ' ' || array_to_string({TOKS}, ' ') || ' ' AS s
  FROM documents
)
SELECT * FROM (
{union}
)
ORDER BY query_id, doc_id
"""


TOP_METRICS = """
WITH r AS (
  SELECT event_type, ts, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT event_type, ts AS top_ts, round(value, 6) AS top_value
FROM r WHERE rn = 1
ORDER BY event_type
"""

STRING_STATS = """
WITH lens AS (
  SELECT count(*) AS cnt, min(length(source)) AS min_length,
         max(length(source)) AS max_length,
         sum(length(source)) AS total_chars
  FROM documents
),
chars AS (
  SELECT ch, count(*) AS n FROM (
    SELECT unnest(list_transform(range(1, length(source) + 1),
                                 i -> source[i:i])) AS ch
    FROM documents
  ) GROUP BY ch
),
ent AS (
  SELECT sum(n) AS total,
         sum(-(CAST(n AS DOUBLE)) * log2(CAST(n AS DOUBLE))) AS nlogn
  FROM chars
)
SELECT l.cnt AS count,
       CAST(l.min_length AS INT) AS min_length,
       CAST(l.max_length AS INT) AS max_length,
       round(CAST(l.total_chars AS DOUBLE) / l.cnt, 6) AS avg_length,
       round(log2(CAST(e.total AS DOUBLE))
             + e.nlogn / CAST(e.total AS DOUBLE), 6) AS entropy
FROM lens l CROSS JOIN ent e
"""


def exact_substring_dedup_sql(w: int) -> str:
    """Fixed-granularity exact-substring inventory: identical window
    construction as operators/dedup.py::exact_substring_dedup (DuckDB
    list slices are 1-based inclusive, so toks[i+1 : i+w] is the same w
    tokens as Spark's slice(toks, i+1, w))."""
    return f"""
WITH tokd AS (
  SELECT doc_id, {TOKS} AS toks FROM documents
),
wins AS (
  SELECT doc_id, unnest(
    CASE WHEN len(toks) >= {w} THEN
      list_transform(range(len(toks) - {w - 1}),
        i -> array_to_string(toks[i + 1 : i + {w}], ' '))
    ELSE CAST([] AS VARCHAR[]) END
  ) AS win
  FROM tokd
),
dup_wins AS (
  SELECT win FROM (SELECT DISTINCT win, doc_id FROM wins)
  GROUP BY win HAVING count(*) >= 2
),
tot AS (
  SELECT doc_id, count(*) AS n_windows FROM wins GROUP BY doc_id
),
dup AS (
  SELECT doc_id, count(*) AS n_dup_windows FROM wins
  WHERE win IN (SELECT win FROM dup_wins) GROUP BY doc_id
)
SELECT d.doc_id, t.n_windows, d.n_dup_windows,
       round(d.n_dup_windows * 1.0 / t.n_windows, 6) AS dup_frac
FROM dup d JOIN tot t USING (doc_id)
ORDER BY doc_id
"""


CUMULATIVE_CARDINALITY = """
WITH hist AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
         count(*) AS n_events
  FROM events GROUP BY 1
),
f AS (
  SELECT user_id,
         min(CAST(date_trunc('day', ts) AS TIMESTAMP)) AS bucket
  FROM events GROUP BY user_id
),
nu AS (
  SELECT bucket, count(*) AS new_users FROM f GROUP BY bucket
)
SELECT h.bucket, h.n_events, COALESCE(nu.new_users, 0) AS new_users,
       CAST(sum(COALESCE(nu.new_users, 0))
            OVER (ORDER BY h.bucket) AS BIGINT) AS cumulative_users
FROM hist h LEFT JOIN nu USING (bucket)
ORDER BY bucket
"""


RETENTION_COHORT = """
WITH e AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
  FROM events
),
f AS (
  SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id
),
act AS (
  SELECT cohort_day, date_diff('day', cohort_day, day) AS offset_days,
         count(DISTINCT e.user_id) AS n_active
  FROM e JOIN f USING (user_id) GROUP BY 1, 2
),
sized AS (
  SELECT cohort_day, offset_days, n_active,
         max(CASE WHEN offset_days = 0 THEN n_active END)
           OVER (PARTITION BY cohort_day) AS cohort_size
  FROM act
)
SELECT cohort_day, offset_days, n_active, cohort_size,
       round(n_active * 1.0 / cohort_size, 6) AS retention
FROM sized
ORDER BY cohort_day, offset_days
"""


def frequent_item_sets_sql(support_num: int, support_den: int) -> str:
    """2-item frequent-item-sets over (user, day) baskets; the support
    threshold compares exact integers, same as the Spark operator."""
    return f"""
WITH b AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                  event_type
  FROM events
),
tot AS (
  SELECT count(*) AS n_total
  FROM (SELECT DISTINCT user_id, day FROM b)
),
p AS (
  SELECT a.event_type AS item_a, bb.event_type AS item_b,
         count(*) AS n_baskets
  FROM b a JOIN b bb USING (user_id, day)
  WHERE a.event_type < bb.event_type
  GROUP BY 1, 2
)
SELECT item_a, item_b, n_baskets,
       round(n_baskets * 1.0 / tot.n_total, 6) AS support
FROM p, tot
WHERE n_baskets * {support_den} >= tot.n_total * {support_num}
ORDER BY item_a, item_b
"""


def _neardup_cc_ctes(threshold: float) -> str:
    """Shared CTE chain: minhash pairs (verbatim reuse of
    minhash_lsh_sql — same pairs by construction) -> undirected edges
    -> transitive-closure reachability -> components labeled by min
    reachable doc_id. DuckDB evaluates the recursive member with UNION
    set-semantics, so reach terminates at the closure."""
    return f"""pairs AS (
  SELECT doc_a, doc_b FROM ({minhash_lsh_sql(threshold)})
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
),
reach(id, lab) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT e.u, r.lab FROM edges e JOIN reach r ON e.v = r.id
),
cc AS (SELECT id AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY id)"""


def neardup_clusters_sql(threshold: float = 0.8) -> str:
    return f"""
WITH RECURSIVE {_neardup_cc_ctes(threshold)},
sz AS (SELECT cluster_id, count(*) AS cluster_size FROM cc GROUP BY cluster_id)
SELECT cc.doc_id, cc.cluster_id, sz.cluster_size
FROM cc JOIN sz USING (cluster_id)
ORDER BY cluster_id, doc_id
"""


def dedup_keep_best_sql(threshold: float = 0.8) -> str:
    return f"""
WITH RECURSIVE {_neardup_cc_ctes(threshold)},
lens AS (SELECT doc_id, CAST(len({TOKS}) AS BIGINT) AS doclen FROM documents),
j AS (
  SELECT cc.doc_id, cc.cluster_id, l.doclen
  FROM cc JOIN lens l USING (doc_id)
),
rnk AS (
  SELECT *, row_number() OVER (
    PARTITION BY cluster_id ORDER BY doclen DESC, doc_id) AS rk
  FROM j
)
SELECT doc_id, cluster_id, doclen,
       CAST(CASE WHEN rk = 1 THEN 1 ELSE 0 END AS INTEGER) AS keep
FROM rnk
ORDER BY cluster_id, doc_id
"""


def training_order_sql(mod: int, mult: int) -> str:
    """Same injective permutation expression as
    operators/trainprep.py::training_order; the oracle ranks by ONE
    global row_number (fine at oracle scale — the Spark side ranks via
    the parallel prefix-sum machinery)."""
    return f"""
WITH p AS (
  SELECT doc_id, ((doc_id % {mod} + 1) * {mult}) % {mod} AS perm_key
  FROM documents
)
SELECT doc_id, perm_key,
       CAST(row_number() OVER (ORDER BY perm_key) - 1 AS BIGINT)
         AS train_order
FROM p
ORDER BY train_order
"""


def tfidf_keywords_sql(k: int = 3) -> str:
    """Identical fixed-shape double expression as
    operators/textstats.py::tfidf_keywords — integer inputs, so equal
    scores are bit-equal in both engines and ties fall to the term."""
    return f"""
WITH tok AS (SELECT doc_id, unnest({TOKS}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*) AS doclen FROM tok GROUP BY 1),
dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         (CAST(tf.tf AS DOUBLE) / dl.doclen)
           * ln(CAST(n.n_docs AS DOUBLE) / dfq.df) AS score
  FROM tf JOIN dl USING (doc_id) JOIN dfq USING (term) CROSS JOIN n
),
rnk AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY score DESC, term) AS rk
  FROM scored
)
SELECT doc_id, CAST(rk AS BIGINT) AS rk, term, tf,
       round(score, 6) AS score
FROM rnk WHERE rk <= {k}
ORDER BY doc_id, rk
"""


PERCENTILES_BUCKET = """
WITH hist AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
         count(*) AS n_events
  FROM events GROUP BY 1
)
SELECT count(*) AS n_buckets,
       round(quantile_cont(n_events, 0.25), 6) AS p25,
       round(quantile_cont(n_events, 0.5), 6) AS p50,
       round(quantile_cont(n_events, 0.75), 6) AS p75,
       min(n_events) AS min_bucket,
       max(n_events) AS max_bucket
FROM hist
"""


def moving_percentiles_sql(window: int) -> str:
    """Same trailing-bucket frame; quantile_cont == Spark percentile
    (both exact linear interpolation — the doclen_percentiles
    precedent)."""
    return f"""
WITH hist AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
         count(*) AS n_events
  FROM events GROUP BY 1
)
SELECT bucket, n_events,
       round(quantile_cont(n_events, 0.5) OVER (
         ORDER BY bucket ROWS BETWEEN {window - 1} PRECEDING
         AND CURRENT ROW), 6) AS moving_p50,
       round(quantile_cont(n_events, 0.9) OVER (
         ORDER BY bucket ROWS BETWEEN {window - 1} PRECEDING
         AND CURRENT ROW), 6) AS moving_p90
FROM hist
ORDER BY bucket
"""


def span_near_or_sql(groups: list[list[str]], k: int, slop: int) -> str:
    """span_near over span_or clauses: one position per GROUP (any
    member) within the window; score = synonym blend per group (tf
    summed over members, df blended as MAX member df), the exact
    discipline of operators/query.py::span_near_or_topk. Groups must be
    term-disjoint."""
    gs = [sorted({str(x) for x in g}) for g in groups if g]
    n = len(gs)
    window = slop + n - 1

    def inlist(g):
        return ", ".join("'" + t.replace("'", "''") + "'" for t in g)

    aliases = [f"p{i}" for i in range(n)]
    joins = " JOIN ".join(
        [f"pos {aliases[0]}"]
        + [f"pos {a} USING (doc_id)" for a in aliases[1:]]
    )
    preds = " AND ".join(
        f"{a}.term IN ({inlist(g)})" for a, g in zip(aliases, gs)
    )
    plist = ", ".join(f"{a}.p" for a in aliases)
    pairs = ", ".join(
        f"({gi}, '" + t.replace("'", "''") + "')"
        for gi, g in enumerate(gs)
        for t in g
    )
    return f"""
WITH {_TOK_CTE},
tokd AS (
  SELECT doc_id, {TOKS} AS toks FROM documents
),
pos AS (
  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS p
  FROM tokd
),
matched AS (
  SELECT DISTINCT {aliases[0]}.doc_id
  FROM {joins}
  WHERE {preds}
    AND greatest({plist}) - least({plist}) <= {window}
),
gmap(gid, term) AS (VALUES {pairs}),
gdfs AS (
  SELECT g.gid, max(d.df) AS df
  FROM gmap g JOIN dfs d USING (term)
  GROUP BY g.gid
),
gscore AS (
  SELECT p.doc_id, g.gid, sum(p.tf) AS tf, min(t.doclen) AS doclen
  FROM post p
  JOIN gmap g USING (term)
  JOIN tok t USING (doc_id)
  WHERE p.doc_id IN (SELECT doc_id FROM matched)
  GROUP BY p.doc_id, g.gid
),
scored AS (
  SELECT s.doc_id,
         sum(
           ln(1.0 + (CAST(st.n_docs AS DOUBLE) - gd.df + 0.5)
              / (gd.df + 0.5))
           * (s.tf / (s.tf + 1.2 * (0.25 + 0.75 * s.doclen / st.avgdl)))
         ) AS score
  FROM gscore s
  JOIN gdfs gd USING (gid)
  CROSS JOIN stats st
  GROUP BY s.doc_id
)
SELECT doc_id, round(score, 6) AS score
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def intervals_ordered_sql(terms: list[str], k: int, max_gaps: int) -> str:
    """intervals (match, ordered, max_gaps): EXISTS strictly-increasing
    positions in query order with p_n - p_1 <= max_gaps + n - 1, then
    BM25 over the unique terms — the exact discipline of
    operators/query.py::intervals_ordered_topk."""
    q = [str(t) for t in terms if t]
    n = len(q)
    window = max_gaps + n - 1
    uniq = sorted(set(q))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    aliases = [f"p{i}" for i in range(n)]
    joins = " JOIN ".join(
        [f"pos {aliases[0]}"]
        + [f"pos {a} USING (doc_id)" for a in aliases[1:]]
    )
    preds = " AND ".join(
        f"{a}.term = '" + t.replace("'", "''") + "'"
        for a, t in zip(aliases, q)
    )
    chain = " AND ".join(
        f"{aliases[i]}.p < {aliases[i + 1]}.p" for i in range(n - 1)
    )
    if chain:
        chain = f"AND {chain}"
    return f"""
WITH {_TOK_CTE},
tokd AS (
  SELECT doc_id, {TOKS} AS toks FROM documents
),
pos AS (
  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS p
  FROM tokd
),
matched AS (
  SELECT DISTINCT {aliases[0]}.doc_id
  FROM {joins}
  WHERE {preds}
    {chain}
    AND {aliases[n - 1]}.p - {aliases[0]}.p <= {window}
),
scored AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN dfs d USING (term)
  JOIN tok t USING (doc_id)
  CROSS JOIN stats s
  WHERE p.term IN ({inlist})
    AND p.doc_id IN (SELECT doc_id FROM matched)
  GROUP BY p.doc_id
)
SELECT doc_id, round(score, 6) AS score
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def match_phrase_prefix_sql(
    fixed: list[str],
    prefix: str,
    k: int,
    max_expansions: int = 50,
    slop: int = 0,
) -> str:
    """match_phrase_prefix: fixed terms chained with per-adjacent-pair
    gaps in [1, slop+1], final slot = ANY dictionary term starting with
    ``prefix`` (alphabetical cap at max_expansions, minus fixed terms);
    score = BM25 over unique fixed terms + one synonym-blended slot for
    the expansion (tf summed over members, df blended as MAX member df)
    — the exact discipline of
    operators/query.py::match_phrase_prefix_topk."""
    fx = [str(t) for t in fixed if t]
    n = len(fx)
    gap_hi = slop + 1
    uniq = sorted(set(fx))
    fx_inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    pref_esc = prefix.replace("'", "''").replace("%", "\\%").replace(
        "_", "\\_"
    )
    aliases = [f"p{i}" for i in range(n)] + ["pg"]
    joins = " JOIN ".join(
        [f"pos {aliases[0]}"]
        + [f"pos {a} USING (doc_id)" for a in aliases[1:]]
    )
    preds = " AND ".join(
        f"{a}.term = '" + t.replace("'", "''") + "'"
        for a, t in zip(aliases, fx)
    )
    chain = " AND ".join(
        f"{aliases[i + 1]}.p - {aliases[i]}.p BETWEEN 1 AND {gap_hi}"
        for i in range(n)
    )
    return f"""
WITH {_TOK_CTE},
tokd AS (
  SELECT doc_id, {TOKS} AS toks FROM documents
),
pos AS (
  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS p
  FROM tokd
),
exp AS (
  SELECT term FROM dfs
  WHERE term LIKE '{pref_esc}%' ESCAPE '\\'
  ORDER BY term LIMIT {max_expansions}
),
grp AS (
  SELECT term FROM exp WHERE term NOT IN ({fx_inlist})
),
matched AS (
  SELECT DISTINCT {aliases[0]}.doc_id
  FROM {joins}
  WHERE {preds}
    AND pg.term IN (SELECT term FROM grp)
    AND {chain}
),
gdf AS (
  SELECT max(d.df) AS df FROM dfs d WHERE d.term IN (SELECT term FROM grp)
),
gscore AS (
  SELECT p.doc_id, sum(p.tf) AS tf, min(t.doclen) AS doclen
  FROM post p
  JOIN tok t USING (doc_id)
  WHERE p.term IN (SELECT term FROM grp)
    AND p.doc_id IN (SELECT doc_id FROM matched)
  GROUP BY p.doc_id
),
fscore AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN dfs d USING (term)
  JOIN tok t USING (doc_id)
  CROSS JOIN stats s
  WHERE p.term IN ({fx_inlist})
    AND p.doc_id IN (SELECT doc_id FROM matched)
  GROUP BY p.doc_id
),
scored AS (
  SELECT f.doc_id,
         f.score
         + ln(1.0 + (CAST(st.n_docs AS DOUBLE) - gd.df + 0.5)
              / (gd.df + 0.5))
           * (g.tf / (g.tf + 1.2 * (0.25 + 0.75 * g.doclen / st.avgdl)))
         AS score
  FROM fscore f
  JOIN gscore g USING (doc_id)
  CROSS JOIN gdf gd
  CROSS JOIN stats st
)
SELECT doc_id, round(score, 6) AS score
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def match_bool_prefix_sql(
    fixed: list[str],
    prefix: str,
    k: int,
    max_expansions: int = 50,
) -> str:
    """match_bool_prefix: bool SHOULD of one term clause per unique
    fixed term + ONE synonym-blended slot for the prefix expansion
    (alphabetical cap over the dictionary, minus fixed terms); a doc
    matches on ANY clause — the exact discipline of
    operators/query.py::match_bool_prefix_topk."""
    fx = sorted({str(t) for t in fixed if t})
    fx_inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in fx)
    p = prefix.replace("'", "''")
    vals = ", ".join(
        f"({gi}, '" + t.replace("'", "''") + "')" for gi, t in enumerate(fx)
    )
    gexp = len(fx)
    return f"""
WITH {_TOK_CTE},
exp AS (
  SELECT term FROM dfs WHERE term LIKE '{p}%'
  ORDER BY term LIMIT {max_expansions}
),
grp AS (
  SELECT term FROM exp WHERE term NOT IN ({fx_inlist})
),
gmap AS (
  SELECT * FROM (VALUES {vals}) v(gid, term)
  UNION ALL
  SELECT {gexp} AS gid, term FROM grp
),
gdf AS (
  SELECT g.gid, max(coalesce(d.df, 0)) AS df
  FROM gmap g LEFT JOIN dfs d USING (term)
  GROUP BY g.gid
  HAVING max(coalesce(d.df, 0)) > 0
),
per_group AS (
  SELECT g.gid, p.doc_id, t.doclen, sum(p.tf) AS tf
  FROM post p JOIN gmap g USING (term) JOIN tok t USING (doc_id)
  GROUP BY g.gid, p.doc_id, t.doclen
),
scored AS (
  SELECT pg.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - gd.df + 0.5) / (gd.df + 0.5))
           * (pg.tf / (pg.tf + 1.2 * (0.25 + 0.75 * pg.doclen / s.avgdl)))
         ) AS score
  FROM per_group pg
  JOIN gdf gd USING (gid)
  CROSS JOIN stats s
  GROUP BY pg.doc_id
)
SELECT doc_id, round(score, 6) AS score
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def rank_feature_sql(
    terms: list[str],
    k: int,
    field: str = "n_chars",
    pivot: float = 300.0,
    boost: float = 1.0,
) -> str:
    """rank_feature (saturation): BM25 over the match terms plus the
    additive bounded feature term boost * x / (x + pivot) — the exact
    discipline of operators/query.py::rank_feature_topk."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH {_TOK_CTE},
scored AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN dfs d USING (term)
  JOIN tok t USING (doc_id)
  CROSS JOIN stats s
  WHERE p.term IN ({inlist})
  GROUP BY p.doc_id
)
SELECT sc.doc_id,
       round(
         sc.score
         + {float(boost)!r} * CAST(doc.{field} AS DOUBLE)
           / (CAST(doc.{field} AS DOUBLE) + {float(pivot)!r}), 6
       ) AS score
FROM scored sc JOIN documents doc ON sc.doc_id = doc.doc_id
ORDER BY score DESC, sc.doc_id ASC
LIMIT {k}
"""


def terms_enum_sql(prefix: str, size: int) -> str:
    """_terms_enum: dictionary terms starting with the prefix,
    alphabetical, capped — the exact discipline of
    operators/query.py::terms_enum."""
    p = prefix.replace("'", "''")
    return f"""
WITH {_TOK_CTE}
SELECT term FROM dfs WHERE term LIKE '{p}%'
ORDER BY term LIMIT {size}
"""


CUMULATIVE_SUM = """
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
         count(*) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT event_type, bucket, n_events,
       CAST(sum(n_events) OVER (
         PARTITION BY event_type ORDER BY bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS running
FROM daily
ORDER BY event_type, bucket
"""


DERIVATIVE = """
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
         count(*) AS n_events
  FROM events GROUP BY 1, 2
),
lagged AS (
  SELECT event_type, bucket, n_events,
         n_events - lag(n_events, 1)
           OVER (PARTITION BY event_type ORDER BY bucket) AS delta,
         date_diff('day',
           lag(CAST(bucket AS DATE), 1)
             OVER (PARTITION BY event_type ORDER BY bucket),
           CAST(bucket AS DATE)) AS gap_days
  FROM daily
)
SELECT event_type, bucket, n_events,
       round(CAST(delta AS DOUBLE) / CAST(gap_days AS DOUBLE), 6) AS per_day
FROM lagged
ORDER BY event_type, bucket
"""


def msearch_sql(queries: list[tuple[int, list[str], int]]) -> str:
    """_msearch: each sub-query's standard BM25 top-k with its own rank
    column, unioned — rank over RAW scores, rounding at emit, the exact
    discipline of operators/query.py::bm25_topk_batch."""
    blocks = []
    for qid, terms, k in queries:
        uniq = sorted(set(terms))
        inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
        blocks.append(f"""
SELECT query_id, rank, doc_id, round(score, 6) AS score FROM (
  SELECT {int(qid)} AS query_id,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC)
              AS INTEGER) AS rank,
         doc_id, score
  FROM (
    SELECT p.doc_id,
           sum(
             ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
             * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
           ) AS score
    FROM post p
    JOIN dfs d USING (term)
    JOIN tok t USING (doc_id)
    CROSS JOIN stats s
    WHERE p.term IN ({inlist})
    GROUP BY p.doc_id
  )
) WHERE rank <= {int(k)}""")
    union = "\nUNION ALL\n".join(blocks)
    return f"""
WITH {_TOK_CTE}
{union}
ORDER BY query_id, rank
"""


BUCKET_CORRELATION = """
WITH typed AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
         count(*) AS x
  FROM events GROUP BY 1, 2
),
total AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket, count(*) AS y
  FROM events GROUP BY 1
),
grid AS (
  SELECT t.event_type, d.bucket, d.y
  FROM (SELECT DISTINCT event_type FROM typed) t CROSS JOIN total d
),
xy AS (
  SELECT g.event_type, coalesce(td.x, 0) AS x, g.y
  FROM grid g LEFT JOIN typed td
    ON g.event_type = td.event_type AND g.bucket = td.bucket
),
m AS (
  SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
  FROM xy GROUP BY event_type
)
SELECT event_type, n AS n_days,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
            * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS corr
FROM m
ORDER BY event_type
"""


CHANGE_POINT = """
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
         count(*) AS n_events
  FROM events GROUP BY 1, 2
),
pre AS (
  SELECT event_type, bucket, n_events,
         row_number() OVER
           (PARTITION BY event_type ORDER BY bucket) AS i,
         sum(n_events) OVER
           (PARTITION BY event_type ORDER BY bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         count(*) OVER (PARTITION BY event_type) AS N,
         sum(n_events) OVER (PARTITION BY event_type) AS S,
         lead(bucket, 1) OVER
           (PARTITION BY event_type ORDER BY bucket) AS change_at
  FROM daily
),
scored AS (
  SELECT *,
         abs(
           (CAST(S AS DOUBLE) - CAST(cum AS DOUBLE))
             / (CAST(N AS DOUBLE) - CAST(i AS DOUBLE))
           - CAST(cum AS DOUBLE) / CAST(i AS DOUBLE)
         )
         * sqrt(CAST(i AS DOUBLE)
                * (CAST(N AS DOUBLE) - CAST(i AS DOUBLE))
                / CAST(N AS DOUBLE)) AS stat
  FROM pre WHERE i < N
),
best AS (
  SELECT *, row_number() OVER
    (PARTITION BY event_type ORDER BY stat DESC, bucket ASC) AS rk
  FROM scored
)
SELECT event_type, change_at AS change_bucket, round(stat, 6) AS stat,
       round(CAST(cum AS DOUBLE) / CAST(i AS DOUBLE), 6) AS mean_before,
       round((CAST(S AS DOUBLE) - CAST(cum AS DOUBLE))
             / (CAST(N AS DOUBLE) - CAST(i AS DOUBLE)), 6) AS mean_after
FROM best WHERE rk = 1
ORDER BY event_type
"""


def combined_fields_sql(
    terms: list[str],
    k: int = 10,
    title_len: int = 8,
    title_weight: int = 2,
) -> str:
    """combined_fields (BM25F): ONE combined pseudo-field — weighted
    tf/dl (exact integers), single df/avgdl — the exact float tree of
    operators/query.py::combined_fields_topk. generate_subscripts is
    1-based, so title slots are pos <= title_len (Spark's 0-based
    posexplode uses pos < title_len: same slots)."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    w, L = int(title_weight), int(title_len)
    return f"""
WITH tokall AS (SELECT doc_id, {TOKS} AS toks FROM documents),
dl AS (
  SELECT doc_id,
         {w} * least(len(toks), {L})
         + (len(toks) - least(len(toks), {L})) AS dl
  FROM tokall
),
cstats AS (
  SELECT count(*) AS n_docs,
         CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
  FROM dl
),
cpost AS (
  SELECT doc_id, term,
         sum(CASE WHEN pos <= {L} THEN {w} ELSE 1 END) AS wtf
  FROM (
    SELECT doc_id, unnest(toks) AS term,
           generate_subscripts(toks, 1) AS pos
    FROM tokall
  )
  WHERE term IN ({inlist})
  GROUP BY doc_id, term
),
cdfs AS (SELECT term, count(*) AS df FROM cpost GROUP BY term),
scored AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.wtf / (p.wtf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl)))
         ) AS score
  FROM cpost p
  JOIN cdfs d USING (term)
  JOIN dl l USING (doc_id)
  CROSS JOIN cstats s
  GROUP BY p.doc_id
)
SELECT doc_id, round(score, 6) AS score FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def distance_feature_sql(
    terms: list[str],
    k: int,
    origin: int,
    pivot: float = 200.0,
    boost: float = 1.5,
) -> str:
    """distance_feature: BM25 plus boost*pivot/(pivot + |x - origin|)
    over the doc_id recency ordinal — the exact discipline of
    operators/query.py::distance_feature_topk (integer distance, one
    float tree)."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH {_TOK_CTE},
scored AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN dfs d USING (term)
  JOIN tok t USING (doc_id)
  CROSS JOIN stats s
  WHERE p.term IN ({inlist})
  GROUP BY p.doc_id
)
SELECT doc_id,
       round(
         score
         + {float(boost)!r} * {float(pivot)!r}
           / ({float(pivot)!r} + CAST(abs(doc_id - {int(origin)}) AS DOUBLE)),
         6
       ) AS score
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


EXTENDED_STATS_BUCKET = """
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
m AS (
  SELECT event_type, count(*) AS n_buckets,
         min(n) AS min_bucket, max(n) AS max_bucket,
         CAST(sum(n) AS BIGINT) AS sum_events,
         CAST(sum(n * n) AS BIGINT) AS sx2
  FROM daily GROUP BY event_type
)
SELECT event_type, n_buckets, min_bucket, max_bucket, sum_events,
       round(CAST(sum_events AS DOUBLE) / CAST(n_buckets AS DOUBLE), 6)
         AS avg_per_bucket,
       round(CAST(n_buckets * sx2 - sum_events * sum_events AS DOUBLE)
             / CAST(n_buckets * n_buckets AS DOUBLE), 6) AS variance,
       round(sqrt(CAST(n_buckets * sx2 - sum_events * sum_events AS DOUBLE)
             / CAST(n_buckets * n_buckets AS DOUBLE)), 6) AS std_dev,
       round(CAST(sum_events AS DOUBLE) / CAST(n_buckets AS DOUBLE)
             + 2.0 * sqrt(
                 CAST(n_buckets * sx2 - sum_events * sum_events AS DOUBLE)
                 / CAST(n_buckets * n_buckets AS DOUBLE)), 6) AS upper2,
       round(CAST(sum_events AS DOUBLE) / CAST(n_buckets AS DOUBLE)
             - 2.0 * sqrt(
                 CAST(n_buckets * sx2 - sum_events * sum_events AS DOUBLE)
                 / CAST(n_buckets * n_buckets AS DOUBLE)), 6) AS lower2
FROM m
ORDER BY event_type
"""


def moving_fn_sql(window: int) -> str:
    """moving_fn linearWeightedAvg: trailing-window list (frame order),
    1-based list_transform index weights == Spark's zip_with(sequence)
    weights; integer numerator and k(k+1)/2 denominator, ONE divide —
    the exact discipline of textstats.moving_fn_agg."""
    return f"""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
         count(*) AS n
  FROM events GROUP BY 1
),
win AS (
  SELECT bucket, n,
         list(n) OVER (
           ORDER BY bucket
           ROWS BETWEEN {int(window) - 1} PRECEDING AND CURRENT ROW
         ) AS vs
  FROM daily
)
SELECT bucket, n,
       round(
         CAST(list_sum(list_transform(vs, (v, i) -> v * i)) AS DOUBLE)
         / CAST((len(vs) * (len(vs) + 1)) // 2 AS DOUBLE), 6
       ) AS lwa
FROM win
ORDER BY bucket
"""


BUCKET_COUNT_KS_TEST = """
WITH typed AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
         count(*) AS x
  FROM events GROUP BY 1, 2
),
total AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
         count(*) AS y
  FROM events GROUP BY 1
),
grid AS (
  SELECT t.event_type, a.bucket, coalesce(d.x, 0) AS x, a.y
  FROM (SELECT DISTINCT event_type FROM typed) t
  CROSS JOIN total a
  LEFT JOIN typed d ON d.event_type = t.event_type AND d.bucket = a.bucket
),
cums AS (
  SELECT event_type,
         sum(x) OVER (PARTITION BY event_type ORDER BY bucket
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cx,
         sum(y) OVER (PARTITION BY event_type ORDER BY bucket
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cy,
         sum(x) OVER (PARTITION BY event_type) AS tx,
         sum(y) OVER (PARTITION BY event_type) AS ty
  FROM grid
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_days,
       round(CAST(max(abs(cx * ty - cy * tx)) AS DOUBLE)
             / CAST(max(tx) * max(ty) AS DOUBLE), 6) AS d_stat
FROM cums
GROUP BY event_type
ORDER BY event_type
"""


def domain_cap_sql(cap: int, mod: int, mult: int) -> str:
    """Per-domain cap by the deterministic hash permutation — the exact
    discipline of trainprep.domain_cap."""
    return f"""
WITH ranked AS (
  SELECT source, doc_id,
         row_number() OVER (
           PARTITION BY source
           ORDER BY ((doc_id % {mod} + 1) * {mult}) % {mod} ASC, doc_id ASC
         ) AS rk
  FROM documents
)
SELECT source, doc_id, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= {int(cap)}
ORDER BY source, rk
"""


def span_containing_sql(
    big: list[str],
    little: str,
    k: int,
    slop: int = 0,
    mode: str = "containing",
) -> str:
    """span_containing / span_within: a doc matches iff some valid big
    span (unordered span_near window slop+n-1) contains an occurrence
    of the little term; the returned query's terms score (big for
    containing, little for within) — the exact discipline of
    operators/query.py::span_containing_topk."""
    gs = sorted({str(t) for t in big})
    n = len(gs)
    window = slop + n - 1
    lit = little.replace("'", "''")
    aliases = [f"p{i}" for i in range(n)]
    joins = " JOIN ".join(
        [f"pos {aliases[0]}"]
        + [f"pos {a} USING (doc_id)" for a in aliases[1:]]
        + ["pos pc USING (doc_id)"]
    )
    preds = " AND ".join(
        f"{a}.term = '" + t.replace("'", "''") + "'"
        for a, t in zip(aliases, gs)
    )
    plist = ", ".join(f"{a}.p" for a in aliases)
    score_terms = gs if mode == "containing" else [little]
    inlist = ", ".join(
        "'" + t.replace("'", "''") + "'" for t in sorted(set(score_terms))
    )
    return f"""
WITH {_TOK_CTE},
tokd AS (
  SELECT doc_id, {TOKS} AS toks FROM documents
),
pos AS (
  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS p
  FROM tokd
),
matched AS (
  SELECT DISTINCT {aliases[0]}.doc_id
  FROM {joins}
  WHERE {preds} AND pc.term = '{lit}'
    AND greatest({plist}) - least({plist}) <= {window}
    AND pc.p BETWEEN least({plist}) AND greatest({plist})
),
scored AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN dfs d USING (term)
  JOIN tok t USING (doc_id)
  CROSS JOIN stats s
  WHERE p.term IN ({inlist})
    AND p.doc_id IN (SELECT doc_id FROM matched)
  GROUP BY p.doc_id
)
SELECT doc_id, round(score, 6) AS score
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def terms_lookup_sql(lookup_doc: int, field: str = "source", k: int = 15) -> str:
    """terms lookup: filter by the value set of another document's
    field — the exact discipline of operators/query.py::terms_lookup."""
    return f"""
SELECT doc_id, {field}
FROM documents
WHERE {field} IN (
  SELECT {field} FROM documents WHERE doc_id = {int(lookup_doc)}
)
ORDER BY doc_id
LIMIT {int(k)}
"""


RUNTIME_FIELDS = """
SELECT least(n_chars // 100, 5) AS band,
       count(*) AS n_docs,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars,
       count(DISTINCT source) AS n_sources
FROM documents
WHERE lang IN ('en', 'de')
GROUP BY 1
ORDER BY band
"""


def collapse_inner_hits_sql(
    terms: list[str],
    k: int,
    inner_size: int = 2,
    field: str = "source",
) -> str:
    """collapse + inner_hits: flat (group_rank, inner_rank) rows — ONE
    window rank serves both the collapsed winners and their inner hits,
    the exact discipline of query.py::collapse_inner_hits_topk."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH {_TOK_CTE},
scored AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN dfs d USING (term)
  JOIN tok t USING (doc_id)
  CROSS JOIN stats s
  WHERE p.term IN ({inlist})
  GROUP BY p.doc_id
),
ranked AS (
  SELECT sc.doc_id, sc.score, doc.{field},
         row_number() OVER (
           PARTITION BY doc.{field}
           ORDER BY sc.score DESC, sc.doc_id ASC
         ) AS inner_rank
  FROM scored sc JOIN documents doc ON sc.doc_id = doc.doc_id
),
winners AS (
  SELECT {field},
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS group_rank
  FROM ranked WHERE inner_rank = 1
  ORDER BY score DESC, doc_id ASC
  LIMIT {int(k)}
)
SELECT w.group_rank, r.{field}, r.inner_rank, r.doc_id,
       round(r.score, 6) AS score
FROM ranked r JOIN winners w USING ({field})
WHERE r.inner_rank <= {int(inner_size)}
ORDER BY group_rank, inner_rank
"""


def eql_sequence_until_sql(
    first: str = "click",
    then: str = "purchase",
    until: str = "error",
    within_sec: float = 7200.0,
) -> str:
    """eql_sequence with the UNTIL kill guard — the exact discipline of
    operators/eventseq.py::eql_sequence_until (lexicographic
    (ts, event_id) comparison between the last until and last first
    markers)."""
    return f"""
WITH e AS (
  SELECT event_id, ts, user_id, event_type FROM events
  WHERE event_type IN ('{first}', '{then}', '{until}')
),
m AS (
  SELECT user_id, ts, event_id, event_type,
         last_value(CASE WHEN event_type = '{first}'
                         THEN struct_pack(fts := ts, fid := event_id)
                    END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS f,
         last_value(CASE WHEN event_type = '{until}'
                         THEN struct_pack(uts := ts, uid := event_id)
                    END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS u
  FROM e
)
SELECT user_id,
       f.fid AS first_event_id,
       event_id AS second_event_id,
       round(CAST(date_diff('microsecond', f.fts, ts) AS DOUBLE)
             / 1000000.0, 6) AS gap_sec
FROM m
WHERE event_type = '{then}' AND f IS NOT NULL
  AND CAST(date_diff('microsecond', f.fts, ts) AS DOUBLE) / 1000000.0
      <= {float(within_sec)!r}
  AND (u IS NULL OR (u.uts, u.uid) < (f.fts, f.fid))
ORDER BY second_event_id
"""


def mterm_vectors_sql(doc_ids: list[int]) -> str:
    """_mtermvectors: term_vectors for a set of docs in one statement —
    the exact discipline of operators/query.py::mterm_vectors."""
    ids = ", ".join(str(int(d)) for d in sorted(set(doc_ids)))
    return f"""
WITH {_TOK_CTE},
tokd AS (
  SELECT doc_id, {TOKS} AS toks FROM documents
),
pos AS (
  SELECT doc_id, unnest(toks) AS term,
         generate_subscripts(toks, 1) - 1 AS p
  FROM tokd
),
tv AS (
  SELECT doc_id, term, count(*) AS tf, list(p ORDER BY p) AS positions
  FROM pos WHERE doc_id IN ({ids}) GROUP BY doc_id, term
)
SELECT t.doc_id, t.term, t.tf, d.df, CAST(d.cf AS BIGINT) AS ttf,
       array_to_string(t.positions, ',') AS positions
FROM tv t JOIN dfs d USING (term)
ORDER BY t.doc_id, t.term
"""


def analyze_shingles_sql(text: str, shingle_size: int = 2) -> str:
    """_analyze + shingle filter: unigrams UNION word n-grams at their
    first word's position — the exact discipline of
    query.py::analyze_shingles."""
    lit = "'" + text.replace("'", "''") + "'"
    n = int(shingle_size)
    parts = ", ".join(f"t[i + {j}]" for j in range(n))
    return f"""
WITH toks AS (
  SELECT regexp_extract_all(lower({lit}), '{TOKEN_PATTERN}') AS t
),
uni AS (
  SELECT generate_subscripts(t, 1) - 1 AS position, unnest(t) AS token
  FROM toks
),
sh AS (
  SELECT i - 1 AS position, concat_ws(' ', {parts}) AS token
  FROM toks, unnest(range(1, len(t) - {n} + 2)) AS u(i)
  WHERE len(t) >= {n}
)
SELECT position, token FROM (
  SELECT * FROM uni UNION ALL SELECT * FROM sh
)
ORDER BY position, token
"""


def token_budget_sample_sql(budget: int, mod: int, mult: int) -> str:
    """Token-budget slice in hash-permutation order — the exact
    discipline of trainprep.token_budget_sample."""
    return f"""
WITH toks AS (
  SELECT doc_id, ((doc_id % {mod} + 1) * {mult}) % {mod} AS perm_key,
         CAST(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}'))
              AS BIGINT) AS n_tokens
  FROM documents
),
run AS (
  SELECT doc_id, n_tokens,
         CAST(sum(n_tokens) OVER (
           ORDER BY perm_key, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS running
  FROM toks
)
SELECT doc_id, n_tokens, running FROM run
WHERE running <= {int(budget)}
ORDER BY running
"""


def msearch_template_sql(
    template: str, param_sets: list[tuple[int, dict]], k: int = 10
) -> str:
    """_msearch/template: UNION ALL of each rendered sub-search's
    query_string oracle, query_id tagged — the exact discipline of
    query.py::msearch_template_topk."""
    from unichem2index_spark.functions.querystring import (
        render_search_template,
    )

    parts = []
    for qid, params in param_sets:
        inner = query_string_sql(render_search_template(template, params), k)
        parts.append(
            f"SELECT {int(qid)} AS query_id, doc_id, score FROM ({inner})"
        )
    union = "\nUNION ALL\n".join(parts)
    return f"""
SELECT query_id, doc_id, score FROM (
{union}
)
ORDER BY query_id, score DESC, doc_id ASC
"""


MISSING_AGG = """
WITH rt AS (
  SELECT event_type,
         CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) >= 90
              THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
         END AS big_k
  FROM events
)
SELECT event_type,
       count(*) FILTER (WHERE big_k IS NULL) AS missing_docs,
       count(big_k) AS present_docs,
       coalesce(min(big_k), 0) AS min_big_k
FROM rt GROUP BY event_type ORDER BY event_type
"""

GLOBAL_AGG = """
SELECT count(*) FILTER (WHERE lang = 'en') AS query_docs,
       coalesce(CAST(sum(n_chars) FILTER (WHERE lang = 'en') AS BIGINT),
                0) AS query_chars,
       count(*) AS all_docs,
       CAST(sum(n_chars) AS BIGINT) AS all_chars
FROM documents
"""

SCRIPTED_METRIC = """
WITH rt AS (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN k ELSE -k END)
            AS BIGINT) AS net_amount,
       max(k) AS max_amount
FROM rt GROUP BY event_type ORDER BY event_type
"""

SIGNIFICANT_TEXT = f"""
WITH dedup AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY md5(text)
                                 ORDER BY doc_id) AS _rk
    FROM documents
  ) WHERE _rk = 1
),
tokset AS (
  SELECT DISTINCT doc_id,
         list_contains({TOKS}, 'merge') AS _fg,
         unnest({TOKS}) AS term
  FROM dedup
),
n AS (
  SELECT (SELECT count(*) FROM dedup) AS n_bg,
         (SELECT count(*) FROM dedup
          WHERE list_contains({TOKS}, 'merge')) AS n_fg
),
stats AS (
  SELECT term,
         count(*) FILTER (WHERE _fg) AS fg_df,
         count(*) AS bg_df
  FROM tokset GROUP BY term HAVING count(*) FILTER (WHERE _fg) >= 3
)
SELECT term, fg_df, bg_df,
       round(
         (CAST(fg_df AS DOUBLE) / n.n_fg - CAST(bg_df AS DOUBLE) / n.n_bg)
         * (CAST(fg_df AS DOUBLE) / n.n_fg)
         / (CAST(bg_df AS DOUBLE) / n.n_bg), 6) AS score
FROM stats CROSS JOIN n
ORDER BY score DESC, term ASC
LIMIT 20
"""

GEOTILE_GRID = """
WITH pts AS (
  SELECT CAST((doc_id * 37 % 170) - 85 AS DOUBLE) + 0.5 AS lat,
         CAST((doc_id * 73 % 360) - 180 AS DOUBLE) + 0.5 AS lon
  FROM documents
),
boxed AS (
  SELECT * FROM pts
  WHERE lat >= -60.5 AND lat <= 70.5 AND lon >= -150.5 AND lon <= 150.5
),
tiles AS (
  SELECT CAST(floor((lon + 180.0) / 360.0 * 8.0) AS BIGINT) AS xt,
         CAST(floor(
           (1.0 - ln(tan(lat * 3.141592653589793 / 180.0)
                     + 1.0 / cos(lat * 3.141592653589793 / 180.0))
                  / 3.141592653589793) / 2.0 * 8.0
         ) AS BIGINT) AS yt
  FROM boxed
)
SELECT concat_ws('/', 3, xt, yt) AS tile, count(*) AS doc_count
FROM tiles GROUP BY xt, yt
ORDER BY doc_count DESC, tile ASC
"""


def sparse_vector_sql(weights: dict[str, int], k: int = 10) -> str:
    """sparse_vector query oracle: dot product of the literal query
    weight vector with per-doc term frequencies — term IN pushdown,
    one tf agg, one weighted sum (BIGINT-pinned)."""
    if not weights:
        raise ValueError("sparse_vector: empty weights")
    inlist = ", ".join(
        "'" + t.replace("'", "''") + "'" for t in sorted(weights)
    )
    vals = ", ".join(
        f"('{t}', {int(w)})" for t, w in sorted(weights.items())
    )
    return f"""
WITH tf AS (
  SELECT doc_id, term, count(*) AS tf FROM (
    SELECT doc_id, unnest({TOKS}) AS term FROM documents
  ) WHERE term IN ({inlist}) GROUP BY doc_id, term
),
w(term, wt) AS (VALUES {vals})
SELECT doc_id, CAST(sum(tf * wt) AS BIGINT) AS score
FROM tf JOIN w USING (term)
GROUP BY doc_id
ORDER BY score DESC, doc_id ASC
LIMIT {int(k)}
"""


STRATIFIED_SPLIT = f"""
WITH ranked AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY ((doc_id % {MOD} + 1) * {FP_MULT}) % {MOD} ASC,
                    doc_id ASC
         ) AS _rk,
         count(*) OVER (PARTITION BY source) AS _n
  FROM documents
)
SELECT doc_id, source,
       CASE WHEN _rk * 10 <= _n * 1 THEN 'eval' ELSE 'train' END AS split
FROM ranked ORDER BY source, doc_id
"""

VOCAB_COVERAGE = f"""
WITH toks AS (
  SELECT source, unnest({TOKS}) AS term FROM documents
),
vocab AS (
  SELECT term FROM (
    SELECT term, count(*) AS cf FROM toks GROUP BY term
    ORDER BY cf DESC, term ASC LIMIT 50
  )
)
SELECT source,
       count(*) AS n_tokens,
       count(*) FILTER (WHERE term NOT IN (SELECT term FROM vocab))
         AS oov_tokens,
       round(CAST(count(*) FILTER (
                WHERE term NOT IN (SELECT term FROM vocab)) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS oov_rate
FROM toks GROUP BY source ORDER BY source
"""


TRANSFORM_PIVOT = """
WITH rt AS (
  SELECT user_id, event_type, ts,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT user_id,
       count(*) AS n_events,
       count(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
       CAST(sum(k) AS BIGINT) AS total_k,
       count(DISTINCT event_type) AS n_types,
       min(ts) AS first_seen,
       max(ts) AS last_seen
FROM rt GROUP BY user_id ORDER BY user_id
"""

# rollup_search's oracle computes the DAILY answer DIRECTLY from raw
# events — hash-equality proves the hourly-rollup-served path is exact.
ROLLUP_SEARCH = """
WITH rt AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT day, event_type,
       count(*) AS n_events,
       CAST(sum(k) AS BIGINT) AS total_k
FROM rt GROUP BY day, event_type ORDER BY day, event_type
"""

GEO_DISTANCE = """
WITH pts AS (
  SELECT CAST((doc_id * 37 % 170) - 85 AS DOUBLE) + 0.5 AS lat,
         CAST((doc_id * 73 % 360) - 180 AS DOUBLE) + 0.5 AS lon
  FROM documents
),
rings AS (
  SELECT CASE
           WHEN (lat - 0.5) * (lat - 0.5) + (lon - 0.5) * (lon - 0.5)
                < 900.0 THEN '0-30'
           WHEN (lat - 0.5) * (lat - 0.5) + (lon - 0.5) * (lon - 0.5)
                < 3600.0 THEN '30-60'
           WHEN (lat - 0.5) * (lat - 0.5) + (lon - 0.5) * (lon - 0.5)
                < 8100.0 THEN '60-90'
           ELSE '90-inf'
         END AS ring
  FROM pts
)
SELECT ring, count(*) AS doc_count FROM rings
GROUP BY ring ORDER BY ring
"""


def analyze_edge_ngrams_sql(
    text: str, min_gram: int = 2, max_gram: int = 5
) -> str:
    """_analyze + edge_ngram filter (preserve_original) — the exact
    discipline of query.py::analyze_edge_ngrams."""
    lit = "'" + text.replace("'", "''") + "'"
    lo, hi = int(min_gram), int(max_gram)
    return f"""
WITH toks AS (
  SELECT regexp_extract_all(lower({lit}), '{TOKEN_PATTERN}') AS t
),
pos AS (
  SELECT generate_subscripts(t, 1) - 1 AS position, unnest(t) AS tok
  FROM toks
),
grams AS (
  SELECT position, substring(tok, 1, i) AS token
  FROM pos, unnest(range({lo}, least(length(tok), {hi}) + 1)) AS u(i)
  WHERE length(tok) >= {lo}
),
originals AS (
  SELECT position, tok AS token FROM pos
  WHERE length(tok) < {lo} OR length(tok) > {hi}
)
SELECT position, token FROM (
  SELECT * FROM grams UNION ALL SELECT * FROM originals
)
ORDER BY position, token
"""


UNIGRAM_SURPRISAL = f"""
WITH tf AS (
  SELECT doc_id, term, count(*) AS tf FROM (
    SELECT doc_id, unnest({TOKS}) AS term FROM documents
  ) GROUP BY doc_id, term
),
cf AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY term),
tot AS (SELECT CAST(sum(cf) AS DOUBLE) AS total FROM cf),
folded AS (
  SELECT doc_id,
         CAST(sum(tf) AS BIGINT) AS n_tokens,
         list_reduce(
           list_prepend(0.0,
             list(CAST(tf AS DOUBLE) * ln(total / CAST(cf AS DOUBLE))
                  ORDER BY term)),
           (x, y) -> x + y
         ) AS s
  FROM tf JOIN cf USING (term) CROSS JOIN tot
  GROUP BY doc_id
)
SELECT doc_id, n_tokens,
       round(s / ln(2.0) / CAST(n_tokens AS DOUBLE), 6) AS bits_per_token
FROM folded ORDER BY doc_id
"""


SCROLL_SLICED = f"""
WITH sliced AS (
  SELECT doc_id,
         ((doc_id % {MOD} + 1) * {FP_MULT}) % {MOD} % 4 AS slice_id
  FROM documents
)
SELECT doc_id, slice_id, slice_rank FROM (
  SELECT doc_id, slice_id,
         row_number() OVER (PARTITION BY slice_id ORDER BY doc_id)
           AS slice_rank
  FROM sliced
) WHERE slice_rank <= 10
ORDER BY slice_id, slice_rank
"""

TERMS_PARTITION = f"""
WITH tokset AS (
  SELECT DISTINCT doc_id, unnest({TOKS}) AS term FROM documents
),
dfs AS (SELECT term, count(*) AS df FROM tokset GROUP BY term),
ids AS (
  SELECT term, row_number() OVER (ORDER BY term) - 1 AS token_id
  FROM (SELECT DISTINCT term FROM tokset)
)
SELECT term, df FROM dfs JOIN ids USING (term)
WHERE token_id % 4 = 1
ORDER BY df DESC, term ASC
LIMIT 10
"""

DIVERSIFIED_SAMPLER = f"""
WITH ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY source
    ORDER BY ((doc_id % {MOD} + 1) * {FP_MULT}) % {MOD} ASC, doc_id ASC
  ) AS _rk
  FROM documents
),
capped AS (SELECT * FROM ranked WHERE _rk <= 2),
sample AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      ORDER BY ((doc_id % {MOD} + 1) * {FP_MULT}) % {MOD} ASC, doc_id ASC
    ) AS _gk FROM capped
  ) WHERE _gk <= 60
),
tokset AS (
  SELECT DISTINCT doc_id, unnest({TOKS}) AS term FROM sample
)
SELECT term, count(*) AS df FROM tokset GROUP BY term
ORDER BY df DESC, term ASC
LIMIT 10
"""


def eql_sequence_pipes_sql(
    first: str = "click", then: str = "purchase",
    within_sec: float = 7200.0, head: int = 10,
) -> str:
    """sequence | unique user_id | head N — the exact discipline of
    eventseq.eql_sequence_pipes over the shared sequence oracle."""
    inner = eql_sequence_sql(first, then, within_sec).replace(
        "ORDER BY second_event_id", ""
    )
    return f"""
WITH matches AS ({inner}),
uniq AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY user_id ORDER BY second_event_id
    ) AS _rk FROM matches
  ) WHERE _rk = 1
)
SELECT user_id, first_event_id, second_event_id, gap_sec
FROM uniq ORDER BY second_event_id LIMIT {int(head)}
"""


RANDOM_SAMPLER = f"""
SELECT lang,
       count(*) AS sampled_docs,
       count(*) * 5 AS est_docs,
       CAST(sum(n_chars) * 5 AS BIGINT) AS est_chars
FROM documents
WHERE ((doc_id % {MOD} + 1) * {FP_MULT}) % {MOD} % 5 = 0
GROUP BY lang ORDER BY lang
"""


SPAN_CORRUPTION = f"""
WITH pos_tok AS (
  SELECT doc_id, generate_subscripts(t, 1) - 1 AS pos
  FROM (SELECT doc_id, {TOKS} AS t FROM documents)
),
flagged AS (
  SELECT doc_id, pos,
         (((doc_id % {MOD}) * 1000003 + pos) % {MOD} + 1)
           * {FP_MULT} % {MOD} % 20 = 0
         OR (pos >= 1 AND
             (((doc_id % {MOD}) * 1000003 + pos - 1) % {MOD} + 1)
               * {FP_MULT} % {MOD} % 20 = 0)
         OR (pos >= 2 AND
             (((doc_id % {MOD}) * 1000003 + pos - 2) % {MOD} + 1)
               * {FP_MULT} % {MOD} % 20 = 0) AS m
  FROM pos_tok
)
SELECT doc_id,
       count(*) AS n_tokens,
       count(*) FILTER (WHERE m) AS n_masked,
       coalesce(array_to_string(
         list(CAST(pos AS VARCHAR) ORDER BY pos) FILTER (WHERE m), ','),
         '') AS masked_positions
FROM flagged GROUP BY doc_id ORDER BY doc_id
"""

BIGRAM_LM = f"""
WITH pairs AS (
  SELECT t[i] AS w1, t[i + 1] AS w2
  FROM (SELECT {TOKS} AS t FROM documents),
       unnest(range(1, len(t))) AS u(i)
  WHERE len(t) >= 2
),
big AS (SELECT w1, w2, count(*) AS pair_n FROM pairs GROUP BY w1, w2),
marg AS (SELECT w1, count(*) AS w1_n FROM pairs GROUP BY w1)
SELECT w1, w2, pair_n, w1_n,
       round(CAST(pair_n AS DOUBLE) / CAST(w1_n AS DOUBLE), 6) AS cond_p
FROM big JOIN marg USING (w1)
ORDER BY pair_n DESC, w1 ASC, w2 ASC
LIMIT 20
"""

DOC_PERPLEXITY = f"""
WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
pairs AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM toks, unnest(range(1, len(t))) AS u(i)
  WHERE len(t) >= 2
),
dtf AS (
  SELECT doc_id, w1, w2, count(*) AS cnt FROM pairs
  GROUP BY doc_id, w1, w2
),
big AS (SELECT w1, w2, count(*) AS pair_n FROM pairs GROUP BY w1, w2),
marg AS (SELECT w1, count(*) AS w1_n FROM pairs GROUP BY w1),
folded AS (
  SELECT doc_id,
         CAST(sum(cnt) AS BIGINT) AS n_bigrams,
         list_reduce(
           list_prepend(0.0,
             list(CAST(cnt AS DOUBLE)
                  * ln(CAST(w1_n AS DOUBLE) / CAST(pair_n AS DOUBLE))
                  ORDER BY w1, w2)),
           (x, y) -> x + y
         ) AS s
  FROM dtf JOIN big USING (w1, w2) JOIN marg USING (w1)
  GROUP BY doc_id
)
SELECT doc_id, n_bigrams,
       round(s / ln(2.0) / CAST(n_bigrams AS DOUBLE), 6) AS bits_per_token
FROM folded ORDER BY doc_id
"""

CATEGORIZE_TEXT = f"""
WITH keyed AS (
  SELECT array_to_string(
           list_transform(t[1:2],
             x -> CASE WHEN regexp_matches(x, '[0-9]')
                       THEN '*' ELSE x END),
           ' ') AS category
  FROM (SELECT {TOKS} AS t FROM documents)
)
SELECT category, count(*) AS doc_count FROM keyed
GROUP BY category
ORDER BY doc_count DESC, category ASC
LIMIT 10
"""

DATE_RANGE = """
WITH keyed AS (
  SELECT CASE
           WHEN ts < TIMESTAMP '2024-01-10' THEN '*-2024-01-10'
           WHEN ts < TIMESTAMP '2024-01-20'
             THEN '2024-01-10-2024-01-20'
           ELSE '2024-01-20-*'
         END AS bucket
  FROM events
)
SELECT bucket, count(*) AS doc_count FROM keyed
GROUP BY bucket ORDER BY bucket
"""

_GEO_PTS = """
  SELECT lang,
         CAST((doc_id * 37 % 170) - 85 AS DOUBLE) + 0.5 AS lat,
         CAST((doc_id * 73 % 360) - 180 AS DOUBLE) + 0.5 AS lon
  FROM documents
"""

GEO_BOUNDS = f"""
WITH pts AS ({_GEO_PTS})
SELECT lang,
       max(lat) AS top_lat,
       min(lon) AS left_lon,
       min(lat) AS bottom_lat,
       max(lon) AS right_lon
FROM pts GROUP BY lang ORDER BY lang
"""

GEO_CENTROID = f"""
WITH pts AS ({_GEO_PTS})
SELECT lang,
       round(avg(lat), 6) AS centroid_lat,
       round(avg(lon), 6) AS centroid_lon,
       count(*) AS doc_count
FROM pts GROUP BY lang ORDER BY lang
"""

# --- corpus paragraph dedup / boilerplate strip / perplexity buckets ---
# Constants mirror operators/trainprep.py: PARA_CHUNK=10, BOILER_CHUNK=3,
# BOILER_MIN_DOCS=2.

PARAGRAPH_DEDUP = f"""
WITH base AS (
  SELECT doc_id, toks FROM (SELECT doc_id, {TOKS} AS toks FROM documents)
  WHERE len(toks) > 0
),
ex AS (
  SELECT doc_id, u.i AS idx,
         array_to_string(list_slice(toks, u.i * 10 + 1, u.i * 10 + 10),
                         ' ') AS para
  FROM base, unnest(range(0, ((len(toks) - 1) // 10) + 1)) AS u(i)
),
v AS (
  SELECT doc_id, idx, para,
         row_number() OVER (PARTITION BY md5(para)
                            ORDER BY doc_id, idx) = 1 AS keep
  FROM ex
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_paras,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       md5(coalesce(string_agg(para, ' ' ORDER BY idx)
                    FILTER (WHERE keep), '')) AS clean_fp
FROM v GROUP BY doc_id ORDER BY doc_id
"""

BOILERPLATE_STRIP = f"""
WITH base AS (
  SELECT doc_id, source, toks
  FROM (SELECT doc_id, source, {TOKS} AS toks FROM documents)
  WHERE len(toks) > 0
),
ex AS (
  SELECT doc_id, source, u.i AS idx,
         array_to_string(list_slice(toks, u.i * 3 + 1, u.i * 3 + 3),
                         ' ') AS line
  FROM base, unnest(range(0, ((len(toks) - 1) // 3) + 1)) AS u(i)
),
boiler AS (
  SELECT source, md5(line) AS h
  FROM ex GROUP BY source, md5(line)
  HAVING count(DISTINCT doc_id) >= 2
),
v AS (
  SELECT e.doc_id, e.idx, e.line, (b.h IS NOT NULL) AS is_boiler
  FROM ex e LEFT JOIN boiler b
    ON e.source = b.source AND md5(e.line) = b.h
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS BIGINT)
         AS n_boiler,
       md5(coalesce(string_agg(line, ' ' ORDER BY idx)
                    FILTER (WHERE NOT is_boiler), '')) AS clean_fp
FROM v GROUP BY doc_id ORDER BY doc_id
"""

PERPLEXITY_BUCKETS = f"""
WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
pairs AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM toks, unnest(range(1, len(t))) AS u(i)
  WHERE len(t) >= 2
),
dtf AS (
  SELECT doc_id, w1, w2, count(*) AS cnt FROM pairs
  GROUP BY doc_id, w1, w2
),
big AS (SELECT w1, w2, count(*) AS pair_n FROM pairs GROUP BY w1, w2),
marg AS (SELECT w1, count(*) AS w1_n FROM pairs GROUP BY w1),
folded AS (
  SELECT doc_id,
         CAST(sum(cnt) AS BIGINT) AS n_bigrams,
         list_reduce(
           list_prepend(0.0,
             list(CAST(cnt AS DOUBLE)
                  * ln(CAST(w1_n AS DOUBLE) / CAST(pair_n AS DOUBLE))
                  ORDER BY w1, w2)),
           (x, y) -> x + y
         ) AS s
  FROM dtf JOIN big USING (w1, w2) JOIN marg USING (w1)
  GROUP BY doc_id
),
ppl AS (
  SELECT doc_id,
         round(s / ln(2.0) / CAST(n_bigrams AS DOUBLE), 6)
           AS bits_per_token
  FROM folded
),
tiled AS (
  SELECT d.lang, p.bits_per_token,
         ntile(3) OVER (PARTITION BY d.lang
                        ORDER BY p.bits_per_token, p.doc_id) AS tile
  FROM ppl p JOIN documents d USING (doc_id)
)
SELECT lang,
       CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
            ELSE 'tail' END AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       min(bits_per_token) AS min_bits,
       max(bits_per_token) AS max_bits
FROM tiled GROUP BY lang, tile ORDER BY lang, bucket
"""

# --- EQL sample (unordered event-set match, deterministic reading) ---

EQL_SAMPLE = """
WITH s1 AS (
  SELECT user_id, event_id AS s1_event_id, ts AS s1_ts
  FROM (
    SELECT user_id, event_id, ts,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE event_type = 'view'
  ) WHERE rn = 1
),
s2 AS (
  SELECT user_id, event_id AS s2_event_id, ts AS s2_ts
  FROM (
    SELECT user_id, event_id, ts,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE event_type = 'purchase' AND value > 50.0
  ) WHERE rn = 1
)
SELECT user_id, s1_event_id, s1_ts, s2_event_id, s2_ts
FROM s1 JOIN s2 USING (user_id)
ORDER BY user_id LIMIT 20
"""

# --- ES nested + reverse_nested aggregation pair ---

NESTED_REVERSE = f"""
WITH base AS (
  SELECT doc_id, toks FROM (SELECT doc_id, {TOKS} AS toks FROM documents)
  WHERE len(toks) > 0
),
firsts AS (
  SELECT doc_id, toks[u.i * 10 + 1] AS term
  FROM base, unnest(range(0, ((len(toks) - 1) // 10) + 1)) AS u(i)
)
SELECT term,
       CAST(count(*) AS BIGINT) AS n_sentences,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM firsts GROUP BY term
ORDER BY n_sentences DESC, term ASC LIMIT 15
"""

# --- web-graph: derived 3-out link graph, degree stats, PageRank ---

_GRAPH_CTE = f"""
nn AS (SELECT count(*) AS n FROM documents),
e0 AS (
  SELECT d.doc_id AS src,
         ((d.doc_id % {MOD} + u.j) * {FP_MULT}) % {MOD} % nn.n AS dst
  FROM documents d CROSS JOIN nn, unnest([1, 2, 3]) AS u(j)
),
edges AS (SELECT DISTINCT src, dst FROM e0 WHERE src != dst)
"""

LINK_GRAPH_STATS = f"""
WITH {_GRAPH_CTE},
indeg AS (SELECT dst, count(*) AS in_deg FROM edges GROUP BY dst)
SELECT in_deg, CAST(count(*) AS BIGINT) AS n_docs FROM (
  SELECT d.doc_id, CAST(coalesce(i.in_deg, 0) AS BIGINT) AS in_deg
  FROM documents d LEFT JOIN indeg i ON d.doc_id = i.dst
) GROUP BY in_deg ORDER BY in_deg
"""

PAGERANK_2ITER = f"""
WITH {_GRAPH_CTE},
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
pr0 AS (
  SELECT d.doc_id, CAST(1.0 AS DOUBLE) / CAST(nn.n AS DOUBLE) AS pr
  FROM documents d CROSS JOIN nn
),
c1 AS (
  SELECT e.dst,
         list_reduce(
           list_prepend(0.0,
             list(p.pr / CAST(g.deg AS DOUBLE) ORDER BY e.src)),
           (x, y) -> x + y) AS c
  FROM edges e JOIN deg g USING (src) JOIN pr0 p ON p.doc_id = e.src
  GROUP BY e.dst
),
pr1 AS (
  SELECT d.doc_id,
         CAST(0.15 AS DOUBLE) / CAST(nn.n AS DOUBLE)
         + CAST(0.85 AS DOUBLE) * coalesce(c1.c, CAST(0.0 AS DOUBLE))
           AS pr
  FROM documents d CROSS JOIN nn LEFT JOIN c1 ON d.doc_id = c1.dst
),
c2 AS (
  SELECT e.dst,
         list_reduce(
           list_prepend(0.0,
             list(p.pr / CAST(g.deg AS DOUBLE) ORDER BY e.src)),
           (x, y) -> x + y) AS c
  FROM edges e JOIN deg g USING (src) JOIN pr1 p ON p.doc_id = e.src
  GROUP BY e.dst
),
pr2 AS (
  SELECT d.doc_id,
         CAST(0.15 AS DOUBLE) / CAST(nn.n AS DOUBLE)
         + CAST(0.85 AS DOUBLE) * coalesce(c2.c, CAST(0.0 AS DOUBLE))
           AS pr
  FROM documents d CROSS JOIN nn LEFT JOIN c2 ON d.doc_id = c2.dst
)
SELECT doc_id, round(pr, 9) AS pagerank
FROM pr2 ORDER BY pagerank DESC, doc_id ASC LIMIT 20
"""

# --- BPE first-merge pair counts / OLAP cube / as-of join entry ---

BPE_FIRST_MERGE = f"""
WITH words AS (
  SELECT term, count(*) AS freq FROM (
    SELECT unnest({TOKS}) AS term FROM documents
  ) GROUP BY term HAVING length(term) >= 2
),
pairs AS (
  SELECT substring(term, u.i, 2) AS pair, freq
  FROM words, unnest(range(1, length(term))) AS u(i)
)
SELECT pair, CAST(sum(freq) AS BIGINT) AS n
FROM pairs GROUP BY pair ORDER BY n DESC, pair ASC LIMIT 20
"""

CUBE_COUNTS = """
SELECT CAST(GROUPING(lang) * 2 + GROUPING(source) AS BIGINT) AS gid,
       coalesce(lang, '*') AS lang_k,
       coalesce(source, '*') AS source_k,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents
GROUP BY CUBE (lang, source)
ORDER BY gid, lang_k, source_k
"""

ASOF_JOIN = """
WITH l AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
),
r AS (
  SELECT user_id, event_id, ts, value FROM events
  WHERE event_type = 'view'
),
cand AS (
  SELECT l.user_id, l.event_id, l.ts,
         r.ts AS asof_ts, r.event_id AS asof_event_id,
         r.value AS asof_value,
         row_number() OVER (
           PARTITION BY l.event_id
           ORDER BY r.ts DESC NULLS LAST, r.event_id DESC NULLS LAST
         ) AS rn
  FROM l LEFT JOIN r
    ON l.user_id = r.user_id AND r.ts <= l.ts
)
SELECT user_id, event_id, ts, asof_ts, asof_event_id, asof_value
FROM cand WHERE rn = 1 ORDER BY event_id
"""

# RAG sliding-window chunking: 32-token windows every 24 tokens.
# DuckDB list_slice(l, a, b) is begin/end INCLUSIVE (Spark slice takes a
# LENGTH); range(0, n) elements are 0-based like Spark's sequence here.
RAG_CHUNKS = f"""
WITH base AS (
  SELECT doc_id, toks FROM (SELECT doc_id, {TOKS} AS toks FROM documents)
  WHERE len(toks) > 0
),
ex AS (
  SELECT doc_id, u.i AS chunk_id, u.i * 24 + 1 AS start_tok,
         len(list_slice(toks, u.i * 24 + 1, u.i * 24 + 32)) AS n_toks,
         md5(array_to_string(
           list_slice(toks, u.i * 24 + 1, u.i * 24 + 32), ' ')) AS fp
  FROM base, unnest(range(0, ((len(toks) - 1) // 24) + 1)) AS u(i)
)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(start_tok AS BIGINT) AS start_tok,
       CAST(n_toks AS BIGINT) AS n_toks, fp
FROM ex ORDER BY doc_id, chunk_id
"""

# Within-document duplicate-line character ratio (Gopher line rule).
# lines built per doc from 0-based window index i (range elements);
# duplicate test uses list_transform's 1-based (x, i) index against
# list_position's 1-based first occurrence, matching Spark's
# zip_with(sequence(1, n)) + array_position formulation.
DUP_LINE_CHARS = f"""
WITH base AS (
  SELECT doc_id, toks FROM (SELECT doc_id, {TOKS} AS toks FROM documents)
  WHERE len(toks) > 0
),
w AS (
  SELECT doc_id,
         list_transform(range(0, ((len(toks) - 1) // 10) + 1),
           i -> array_to_string(
                  list_slice(toks, i * 10 + 1, i * 10 + 10), ' '))
           AS lines
  FROM base
),
m AS (
  SELECT doc_id,
         list_reduce(list_prepend(0,
           list_transform(lines, (x, i) ->
             CASE WHEN list_position(lines, x) < i
                  THEN length(x) ELSE 0 END)), (a, b) -> a + b)
           AS dup_chars,
         list_reduce(list_prepend(0,
           list_transform(lines, x -> length(x))), (a, b) -> a + b)
           AS total_chars
  FROM w
)
SELECT doc_id,
       CAST(dup_chars AS BIGINT) AS dup_chars,
       CAST(total_chars AS BIGINT) AS total_chars,
       round(CASE WHEN total_chars > 0
             THEN CAST(dup_chars AS DOUBLE) / CAST(total_chars AS DOUBLE)
             ELSE 0.0 END, 6) AS dup_ratio,
       (CASE WHEN total_chars > 0
             THEN CAST(dup_chars AS DOUBLE) / CAST(total_chars AS DOUBLE)
             ELSE 0.0 END) <= 0.30 AS keep
FROM m ORDER BY doc_id
"""

# Zipf fit: four sequential folds in rank order (list_reduce with a
# prepended 0.0 == F.aggregate from 0.0) then one shared slope tree.
ZIPF_FIT = f"""
WITH vocab AS (
  SELECT term, count(*) AS cf
  FROM (SELECT unnest({TOKS}) AS term FROM documents)
  GROUP BY term ORDER BY cf DESC, term LIMIT 100
),
ranked AS (
  SELECT cf, row_number() OVER (ORDER BY cf DESC, term) AS rank
  FROM vocab
),
arr AS (
  SELECT list(struct_pack(rank := rank, cf := cf) ORDER BY rank) AS pts
  FROM ranked
),
m AS (
  SELECT CAST(len(pts) AS DOUBLE) AS n,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(pts, p -> ln(CAST(p.rank AS DOUBLE)))),
           (a, v) -> a + v) AS sx,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(pts, p -> ln(CAST(p.cf AS DOUBLE)))),
           (a, v) -> a + v) AS sy,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(pts, p -> ln(CAST(p.rank AS DOUBLE))
                                     * ln(CAST(p.cf AS DOUBLE)))),
           (a, v) -> a + v) AS sxy,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(pts, p -> ln(CAST(p.rank AS DOUBLE))
                                     * ln(CAST(p.rank AS DOUBLE)))),
           (a, v) -> a + v) AS sxx
  FROM arr
)
SELECT CAST(n AS BIGINT) AS n_terms,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
       round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n,
             6) AS zipf_intercept
FROM m
"""

HEAPS_LAW = f"""
WITH base AS (
  SELECT doc_id, {TOKS} AS toks FROM documents
),
tpb AS (
  SELECT doc_id // 100 AS bucket, sum(len(toks)) AS bucket_tokens
  FROM base GROUP BY doc_id // 100
),
fs AS (
  SELECT min(doc_id) // 100 AS bucket, term
  FROM (SELECT doc_id, unnest(toks) AS term FROM base)
  GROUP BY term
),
nv AS (SELECT bucket, count(*) AS new_terms FROM fs GROUP BY bucket)
SELECT CAST(t.bucket AS BIGINT) AS bucket,
       CAST(sum(t.bucket_tokens)
            OVER (ORDER BY t.bucket) AS BIGINT) AS cum_tokens,
       CAST(sum(coalesce(n.new_terms, 0))
            OVER (ORDER BY t.bucket) AS BIGINT) AS cum_vocab
FROM tpb t LEFT JOIN nv n ON t.bucket = n.bucket
ORDER BY bucket
"""

# fs buckets by the term's FIRST doc: min(doc_id) per term, then // 100.
# Left-context skip-gram pairs: offsets +1 and +2 per center token.
SKIPGRAM_PMI = f"""
WITH base AS (
  SELECT {TOKS} AS toks FROM documents
  WHERE len({TOKS}) >= 2
),
pairs AS (
  SELECT p.w1, p.w2 FROM (
    SELECT unnest(flatten([
      list_transform(range(1, len(toks)),
        i -> struct_pack(w1 := toks[i], w2 := toks[i + 1])),
      list_transform(range(1, greatest(len(toks) - 1, 1)),
        i -> struct_pack(w1 := toks[i], w2 := toks[i + 2]))
    ])) AS p FROM base
  )
),
cab AS (SELECT w1, w2, count(*) AS c_ab FROM pairs GROUP BY w1, w2),
ca AS (SELECT w1, count(*) AS c_a FROM pairs GROUP BY w1),
cb AS (SELECT w2, count(*) AS c_b FROM pairs GROUP BY w2),
tot AS (SELECT count(*) AS t_pairs FROM pairs),
top AS (
  SELECT * FROM cab ORDER BY c_ab DESC, w1, w2 LIMIT 20
)
SELECT t.w1, t.w2,
       CAST(t.c_ab AS BIGINT) AS c_ab,
       CAST(a.c_a AS BIGINT) AS c_a,
       CAST(b.c_b AS BIGINT) AS c_b,
       round(ln(CAST(x.t_pairs * t.c_ab AS DOUBLE)
                / CAST(a.c_a * b.c_b AS DOUBLE)), 6) AS pmi
FROM top t JOIN ca a USING (w1) JOIN cb b USING (w2) CROSS JOIN tot x
ORDER BY c_ab DESC, w1, w2
"""

GEO_LINE = """
WITH pts AS (
  SELECT lang, doc_id,
         printf('%.1f,%.1f',
                CAST((doc_id * 73 % 360) - 180 AS DOUBLE) + 0.5,
                CAST((doc_id * 37 % 170) - 85 AS DOUBLE) + 0.5) AS s
  FROM documents
)
SELECT lang,
       array_to_string(list(s ORDER BY doc_id)[1:8], ';') AS line,
       CAST(count(*) AS BIGINT) AS n_points
FROM pts GROUP BY lang ORDER BY lang
"""

# Anchor = source doc's token at 0-based (src+dst) % len — DuckDB's
# 1-based list indexing adds 1.
ANCHOR_TEXT = f"""
WITH {_GRAPH_CTE},
toks AS (
  SELECT doc_id, toks FROM (SELECT doc_id, {TOKS} AS toks FROM documents)
  WHERE len(toks) > 0
),
anch AS (
  SELECT e.dst,
         t.toks[CAST((e.src + e.dst) % len(t.toks) AS BIGINT) + 1]
           AS anchor
  FROM edges e JOIN toks t ON e.src = t.doc_id
),
per_pair AS (
  SELECT dst, anchor, count(*) AS n FROM anch GROUP BY dst, anchor
),
best AS (
  SELECT dst, anchor AS top_anchor,
         row_number() OVER (PARTITION BY dst
                            ORDER BY n DESC, anchor) AS rn
  FROM per_pair
),
stats AS (
  SELECT dst, sum(n) AS n_links, count(*) AS n_anchors
  FROM per_pair GROUP BY dst
)
SELECT CAST(s.dst AS BIGINT) AS dst,
       CAST(s.n_links AS BIGINT) AS n_links,
       CAST(s.n_anchors AS BIGINT) AS n_anchors,
       b.top_anchor
FROM stats s JOIN best b ON s.dst = b.dst AND b.rn = 1
ORDER BY n_links DESC, dst LIMIT 50
"""

URL_NORMALIZE_DEDUP = """
WITH raw AS (
  SELECT doc_id,
         'https://'
         || CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END
         || CASE WHEN doc_id % 7 = 0 THEN upper(source) ELSE source END
         || '.example.com/page/' || CAST(doc_id % 50 AS VARCHAR)
         || CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END
         || CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed&ref=rss'
                 ELSE '' END AS url
  FROM documents
),
norm AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(
             regexp_replace(lower(url), '\\?.*$', ''),
             '^https://www\\.', 'https://'),
           '/$', '') AS canon_url
  FROM raw
)
SELECT canon_url,
       CAST(count(*) AS BIGINT) AS n_dups,
       CAST(min(doc_id) AS BIGINT) AS keep_doc_id
FROM norm GROUP BY canon_url HAVING count(*) >= 2
ORDER BY n_dups DESC, canon_url LIMIT 50
"""


def fix_mojibake_sql() -> str:
    """Rendered from the SAME repair table the Spark path uses
    (trainprep.MOJIBAKE_TABLE) — one source of truth for the
    cp1252-double-encoding inverse."""
    from unichem2index_spark.operators.trainprep import (
        MOJIBAKE_SUFFIX,
        MOJIBAKE_TABLE,
    )

    counts = " + ".join(
        f"CAST((len(t2) - len(replace(t2, '{bad}', ''))) / {len(bad)} AS INT)"
        for bad, _ in MOJIBAKE_TABLE
    )
    fixed = "t2"
    for bad, good in MOJIBAKE_TABLE:
        fixed = f"replace({fixed}, '{bad}', '{good}')"
    return f"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
              THEN text || repeat('{MOJIBAKE_SUFFIX}',
                                  CAST(doc_id % 2 + 1 AS INT))
              ELSE text END AS t2
  FROM documents
)
SELECT doc_id,
       CAST({counts} AS INT) AS n_fixed,
       md5({fixed}) AS fixed_fp
FROM d ORDER BY doc_id
"""


DOMAIN_BLOCKLIST_FILTER = """
WITH d AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 4 = 0 THEN 'cdn.'
               WHEN doc_id % 4 = 1 THEN 'www.'
               ELSE '' END) || source || '.example.com' AS host
  FROM documents
),
parts AS (
  SELECT doc_id, host, string_split(host, '.') AS p FROM d
),
cand AS (
  SELECT doc_id, array_to_string(p[i:], '.') AS cand
  FROM parts, UNNEST(generate_series(1, len(p) - 1)) AS u(i)
),
bl AS (
  SELECT DISTINCT source || '.example.com' AS domain
  FROM documents
  WHERE TRY_CAST(regexp_extract(source, '([0-9]+)$', 1) AS INT) % 3 = 0
),
hits AS (
  SELECT doc_id, min(cand) AS rule
  FROM cand JOIN bl ON cand.cand = bl.domain
  GROUP BY doc_id
)
SELECT d.doc_id, d.host, (h.rule IS NOT NULL) AS blocked, h.rule
FROM d LEFT JOIN hits h USING (doc_id)
ORDER BY d.doc_id
"""


HITS_2ITER = f"""
WITH {_GRAPH_CTE},
nodes AS (SELECT doc_id FROM documents),
a1r AS (
  SELECT dst AS doc_id, CAST(count(*) AS DOUBLE) AS auth
  FROM edges GROUP BY dst
),
a1f AS (
  SELECT n.doc_id, coalesce(a.auth, CAST(0.0 AS DOUBLE)) AS auth
  FROM nodes n LEFT JOIN a1r a USING (doc_id)
),
a1 AS (SELECT doc_id, auth / (SELECT max(auth) FROM a1f) AS auth FROM a1f),
h1r AS (
  SELECT e.src AS doc_id,
         list_reduce(
           list_prepend(0.0, list(a.auth ORDER BY e.dst)),
           (x, y) -> x + y) AS hub
  FROM edges e JOIN a1 a ON a.doc_id = e.dst GROUP BY e.src
),
h1f AS (
  SELECT n.doc_id, coalesce(h.hub, CAST(0.0 AS DOUBLE)) AS hub
  FROM nodes n LEFT JOIN h1r h USING (doc_id)
),
h1 AS (SELECT doc_id, hub / (SELECT max(hub) FROM h1f) AS hub FROM h1f),
a2r AS (
  SELECT e.dst AS doc_id,
         list_reduce(
           list_prepend(0.0, list(h.hub ORDER BY e.src)),
           (x, y) -> x + y) AS auth
  FROM edges e JOIN h1 h ON h.doc_id = e.src GROUP BY e.dst
),
a2f AS (
  SELECT n.doc_id, coalesce(a.auth, CAST(0.0 AS DOUBLE)) AS auth
  FROM nodes n LEFT JOIN a2r a USING (doc_id)
),
a2 AS (SELECT doc_id, auth / (SELECT max(auth) FROM a2f) AS auth FROM a2f),
h2r AS (
  SELECT e.src AS doc_id,
         list_reduce(
           list_prepend(0.0, list(a.auth ORDER BY e.dst)),
           (x, y) -> x + y) AS hub
  FROM edges e JOIN a2 a ON a.doc_id = e.dst GROUP BY e.src
),
h2f AS (
  SELECT n.doc_id, coalesce(h.hub, CAST(0.0 AS DOUBLE)) AS hub
  FROM nodes n LEFT JOIN h2r h USING (doc_id)
),
h2 AS (SELECT doc_id, hub / (SELECT max(hub) FROM h2f) AS hub FROM h2f)
SELECT a2.doc_id, round(a2.auth, 9) AS authority, round(h2.hub, 9) AS hub
FROM a2 JOIN h2 USING (doc_id)
ORDER BY authority DESC, hub DESC, doc_id ASC LIMIT 20
"""


NEGATIVE_SAMPLING_TABLE = f"""
WITH vocab AS (
  SELECT term, count(*) AS cnt
  FROM (SELECT unnest({TOKS}) AS term FROM documents)
  GROUP BY term
),
weighted AS (
  SELECT term, cnt,
         sqrt(sqrt(CAST(cnt AS DOUBLE) * CAST(cnt AS DOUBLE)
                   * CAST(cnt AS DOUBLE))) AS raw
  FROM vocab
),
cum AS (
  SELECT term, cnt, raw,
         sum(raw) OVER (ORDER BY cnt DESC, term
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS cum_raw
  FROM weighted
),
tot AS (SELECT max(cum_raw) AS tot FROM cum)
SELECT term, CAST(cnt AS BIGINT) AS cnt,
       round(raw / tot.tot, 9) AS prob,
       round(cum_raw / tot.tot, 9) AS cum_prob
FROM cum CROSS JOIN tot
ORDER BY cnt DESC, term ASC LIMIT 50
"""


CRAWL_SNAPSHOT_DIFF = """
WITH a AS (
  SELECT source || '/' || CAST(doc_id AS VARCHAR) AS url,
         source AS src_a, md5(text) AS fp_a
  FROM documents WHERE doc_id % 11 != 0
),
b AS (
  SELECT source || '/' || CAST(doc_id AS VARCHAR) AS url,
         source AS src_b,
         md5(CASE WHEN doc_id % 5 = 0 THEN text || ' [revised]'
                  ELSE text END) AS fp_b
  FROM documents WHERE doc_id % 7 != 3
),
j AS (SELECT * FROM a FULL OUTER JOIN b USING (url))
SELECT coalesce(src_a, src_b) AS source,
       CASE WHEN fp_a IS NULL THEN 'added'
            WHEN fp_b IS NULL THEN 'gone'
            WHEN fp_a != fp_b THEN 'changed'
            ELSE 'unchanged' END AS status,
       CAST(count(*) AS BIGINT) AS n_urls
FROM j GROUP BY 1, 2 ORDER BY source, status
"""


ROBOTS_FILTER = """
WITH urls AS (
  SELECT doc_id, source,
         '/' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 3) AS path
  FROM documents
),
hosts AS (SELECT DISTINCT source FROM documents),
rules AS (
  SELECT source, '/' || substr(md5(source), 1, 1) AS prefix, 0 AS allowed
  FROM hosts
  UNION ALL
  SELECT source, '/' || substr(md5(source), 1, 2), 1 FROM hosts
  UNION ALL
  SELECT source, '/' || substr(md5(source), 9, 1), 0 FROM hosts
),
best AS (
  SELECT u.source, u.doc_id,
         max(CASE WHEN starts_with(u.path, r.prefix)
                  THEN 2 * length(r.prefix) + r.allowed END) AS best
  FROM urls u LEFT JOIN rules r ON u.source = r.source
  GROUP BY 1, 2
)
SELECT source,
       CASE WHEN best IS NULL OR best % 2 = 1
            THEN 'allow' ELSE 'disallow' END AS verdict,
       CAST(count(*) AS BIGINT) AS n_urls
FROM best GROUP BY 1, 2 ORDER BY source, verdict
"""


READABILITY = """
WITH f AS (
  SELECT doc_id,
         CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE)
           AS w,
         CAST(greatest(length(regexp_extract_all(text, '[.!?]+')), 1)
           AS DOUBLE) AS s,
         CAST(greatest(length(regexp_extract_all(lower(text), '[aeiouy]+')),
                       1) AS DOUBLE) AS y
  FROM documents
),
r AS (
  SELECT doc_id, CAST(w AS BIGINT) AS n_words, CAST(s AS BIGINT) AS n_sents,
         CAST(y AS BIGINT) AS n_syllables,
         round(206.835 - 1.015 * (w / s) - 84.6 * (y / w), 4) AS flesch
  FROM f
)
SELECT doc_id, n_words, n_sents, n_syllables, flesch,
       CASE WHEN flesch >= 70.0 THEN 'easy'
            WHEN flesch >= 50.0 THEN 'standard'
            WHEN flesch >= 30.0 THEN 'difficult'
            ELSE 'very_difficult' END AS band
FROM r ORDER BY doc_id
"""


CONNECTED_COMPONENTS = f"""
WITH RECURSIVE
nb AS (
  SELECT greatest(CAST(ceil(count(*) / {CC_BUCKET_TARGET}.0) AS BIGINT), 1)
    AS n_buckets
  FROM documents
),
bk AS (
  SELECT doc_id,
         ((doc_id % {MOD} + 7) * {FP_MULT}) % {MOD} % nb.n_buckets AS bkt
  FROM documents CROSS JOIN nb
),
edges AS (
  SELECT lag(doc_id) OVER (PARTITION BY bkt ORDER BY doc_id) AS src,
         doc_id AS dst
  FROM bk
  QUALIFY src IS NOT NULL
),
und AS (
  SELECT src, dst FROM edges
  UNION
  SELECT dst AS src, src AS dst FROM edges
),
reach AS (
  SELECT doc_id AS node, doc_id AS r FROM documents
  UNION
  SELECT u.src AS node, reach.r
  FROM und u JOIN reach ON reach.node = u.dst
),
comp AS (SELECT node, min(r) AS component_id FROM reach GROUP BY node)
SELECT component_id, CAST(count(*) AS BIGINT) AS size
FROM comp GROUP BY 1 ORDER BY size DESC, component_id
"""


def ndcg_eval_sql(terms: list[str], k: int, hi: str, lo: str) -> str:
    """_rank_eval dcg metric: nDCG@k with graded judgments; discounts are
    shortest-repr double literals and both folds are rank-ordered, so the
    double math mirrors operators/query.py::ndcg_eval op for op."""
    import math

    TOK_CTE = _TOK_CTE
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    hq = "'" + hi.replace("'", "''") + "'"
    lq = "'" + lo.replace("'", "''") + "'"
    w = [1.0 / math.log2(p + 1) for p in range(1, k + 1)]
    wlist = "[" + ", ".join(repr(x) for x in w) + "]::DOUBLE[]"
    return f"""
WITH {TOK_CTE},
scored AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN dfs d USING (term)
  JOIN tok t USING (doc_id)
  CROSS JOIN stats s
  WHERE p.term IN ({inlist})
  GROUP BY p.doc_id
),
ranked AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM scored ORDER BY score DESC, doc_id ASC LIMIT {k}
),
g AS (
  SELECT r.rank,
         ([0, 1, 3, 7])[
           2 * (CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END)
           + (CASE WHEN l.doc_id IS NOT NULL THEN 1 ELSE 0 END) + 1
         ] AS gain
  FROM ranked r
  LEFT JOIN (SELECT DISTINCT doc_id FROM post WHERE term = {hq}) h
    USING (doc_id)
  LEFT JOIN (SELECT DISTINCT doc_id FROM post WHERE term = {lq}) l
    USING (doc_id)
),
arrs AS (
  SELECT list(gain ORDER BY rank) AS by_rank,
         list(gain ORDER BY gain DESC) AS gains_desc
  FROM g
),
vals AS (
  SELECT
    list_reduce(list_prepend(0.0, list_transform(by_rank,
      (x, i) -> CAST(x AS DOUBLE) * ({wlist})[i])), (a, b) -> a + b) AS dcg,
    list_reduce(list_prepend(0.0, list_transform(gains_desc,
      (x, i) -> CAST(x AS DOUBLE) * ({wlist})[i])), (a, b) -> a + b) AS idcg
  FROM arrs
)
SELECT round(dcg, 6) AS dcg, round(idcg, 6) AS idcg,
       round(CASE WHEN idcg > 0 THEN dcg / idcg ELSE 0.0 END, 6) AS ndcg
FROM vals
"""


def normalize_text_sql() -> str:
    """Casefold + diacritic-fold + whitespace-collapse scan; constants are
    IMPORTED from trainprep so both engines translate the same code
    points byte for byte."""
    from unichem2index_spark.operators.trainprep import (
        NORM_DST,
        NORM_INJ_PRE,
        NORM_INJ_SUF,
        NORM_SRC,
    )

    return f"""
WITH inj AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN '{NORM_INJ_PRE}' || text
              WHEN doc_id % 5 = 0 THEN text || '{NORM_INJ_SUF}'
              ELSE text END AS itext
  FROM documents
),
low AS (SELECT doc_id, lower(itext) AS lt FROM inj),
nrm AS (
  SELECT doc_id, lt, translate(lt, '{NORM_SRC}', '{NORM_DST}') AS flt
  FROM low
),
fin AS (
  SELECT doc_id, lt, flt,
         trim(regexp_replace(flt, '\\s+', ' ', 'g')) AS norm
  FROM nrm
)
SELECT doc_id,
       CAST(flt != lt AS INT) AS folded,
       CAST(length(norm) AS BIGINT) AS n_chars_norm,
       md5(norm) AS fp
FROM fin ORDER BY doc_id
"""


def winnowing_sql() -> str:
    """MOSS winnowing fingerprints; mirrors dedup.py op for op (same
    k-gram hash prefix, same rightmost-min suffix encoding)."""
    from unichem2index_spark.operators.dedup import WINNOW_K, WINNOW_W

    k1, w1 = WINNOW_K - 1, WINNOW_W - 1
    return f"""
WITH base AS (
  SELECT doc_id, {TOKS} AS toks FROM documents
),
kg AS (
  SELECT doc_id, toks, greatest(len(toks) - {k1}, 0) AS m FROM base
),
enc AS (
  SELECT doc_id, m,
    CASE WHEN m = 0 THEN [] ELSE
      list_transform(range(1, m + 1), i ->
        substr(md5(array_to_string(list_slice(toks, i, i + {k1}), ' ')),
               1, 8)
        || ':' || lpad(CAST(99999 - i AS VARCHAR), 5, '0'))
    END AS e
  FROM kg
),
picks AS (
  SELECT doc_id,
    CASE WHEN m = 0 THEN [] ELSE
      list_distinct(list_transform(range(1, greatest(m - {w1}, 1) + 1),
        j -> list_aggregate(list_slice(e, j, j + {w1}), 'min')))
    END AS fps
  FROM enc
)
SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fps,
       md5(array_to_string(list_sort(fps), ',')) AS fp_digest
FROM picks ORDER BY doc_id
"""


def shard_manifest_sql() -> str:
    """Byte-budget output sharding manifest; integer-only math."""
    from unichem2index_spark.operators.trainprep import SHARD_BYTES

    return f"""
WITH cum AS (
  SELECT source, doc_id, n_chars,
         sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) - n_chars
           AS start_off
  FROM documents
),
sh AS (
  SELECT source, doc_id, n_chars,
         CAST(floor(start_off / {SHARD_BYTES}.0) AS BIGINT) AS shard_id
  FROM cum
)
SELECT source, shard_id, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS shard_bytes,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM sh GROUP BY 1, 2 ORDER BY source, shard_id
"""


def ltr_features_sql(terms: list[str], k: int, hi: str, lo: str) -> str:
    """LTR feature/label table for the BM25 top-k; mirrors
    operators/query.py::ltr_features column for column."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    hq = "'" + hi.replace("'", "''") + "'"
    lq = "'" + lo.replace("'", "''") + "'"
    return f"""
WITH {_TOK_CTE},
scored AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN dfs d USING (term)
  JOIN tok t USING (doc_id)
  CROSS JOIN stats s
  WHERE p.term IN ({inlist})
  GROUP BY p.doc_id
),
ranked AS (
  SELECT doc_id, score FROM scored
  ORDER BY score DESC, doc_id ASC LIMIT {k}
),
qf AS (
  SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_matched,
         CAST(sum(p.tf) AS BIGINT) AS sum_tf,
         CAST(max(t.doclen) AS BIGINT) AS doclen
  FROM post p JOIN tok t USING (doc_id)
  WHERE p.term IN ({inlist})
  GROUP BY 1
)
SELECT r.doc_id, round(r.score, 6) AS score,
       coalesce(qf.n_matched, 0) AS n_matched,
       coalesce(qf.sum_tf, 0) AS sum_tf,
       coalesce(qf.doclen, 0) AS doclen,
       CAST(2 * (CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END)
            + (CASE WHEN l.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS INT)
         AS label
FROM ranked r
LEFT JOIN qf USING (doc_id)
LEFT JOIN (SELECT DISTINCT doc_id FROM post WHERE term = {hq}) h
  USING (doc_id)
LEFT JOIN (SELECT DISTINCT doc_id FROM post WHERE term = {lq}) l
  USING (doc_id)
ORDER BY r.score DESC, r.doc_id ASC
"""


CDC_CHUNKS = f"""
WITH base AS (
  SELECT doc_id, {TOKS} AS toks FROM documents
),
bp AS (
  SELECT doc_id, toks,
    list_filter(list_transform(toks,
        (tk, i) -> CASE WHEN substr(md5(tk), 1, 1) = '0'
                        THEN i ELSE 0 END),
      p -> p > 0) AS bpos
  FROM base
),
se AS (
  SELECT doc_id, toks,
         list_prepend(0, bpos) AS starts,
         list_append(bpos, len(toks)) AS ends
  FROM bp
),
ch AS (
  SELECT doc_id, toks,
    list_filter(
      list_transform(range(1, len(starts) + 1), j ->
        CASE WHEN ends[j] > starts[j]
             THEN md5(array_to_string(
                    list_slice(toks, starts[j] + 1, ends[j]), ' '))
        END),
      x -> x IS NOT NULL) AS chunks
  FROM se
)
SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks,
       CAST(len(chunks) AS BIGINT) AS n_chunks,
       md5(array_to_string(chunks, ',')) AS chunks_digest
FROM ch ORDER BY doc_id
"""


def simhash_hamming_sql() -> str:
    """Manku et al. hamming-radius pairs; band blocking + bit_count
    verify, mirroring dedup.py::simhash_hamming_pairs."""
    from unichem2index_spark.operators.dedup import (
        SIMHASH_BAND_BITS,
        SIMHASH_HAMMING_MAX,
    )

    half = MOD // 2
    bit_terms = " + ".join(
        f"(CASE WHEN sum(cnt * (CASE WHEN ((token_id + 1) * {p}) % {MOD} "
        f">= {half} THEN 1 ELSE -1 END)) > 0 THEN {1 << j} ELSE 0 END)"
        for j, p in enumerate(SIMHASH_P)
    )
    n_bands = 16 // SIMHASH_BAND_BITS
    blist = "[" + ", ".join(str(b) for b in range(n_bands)) + "]"
    return f"""
WITH counts AS (
  SELECT doc_id, term, count(*) AS cnt FROM (
    SELECT doc_id, unnest({TOKS}) AS term FROM documents
  ) GROUP BY 1, 2
),
vocab AS (
  SELECT term, row_number() OVER (ORDER BY term) - 1 AS token_id
  FROM (SELECT DISTINCT term FROM counts)
),
idc AS (
  SELECT c.doc_id, v.token_id, c.cnt FROM counts c JOIN vocab v USING (term)
),
sims AS (
  SELECT doc_id, CAST({bit_terms} AS BIGINT) AS simhash
  FROM idc GROUP BY doc_id
),
bands AS (
  SELECT doc_id, simhash, u.b AS band_idx,
         (simhash >> ({SIMHASH_BAND_BITS} * u.b))
           % {1 << SIMHASH_BAND_BITS} AS band_val
  FROM sims, unnest({blist}) AS u(b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.simhash AS sa, b.simhash AS sb
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
   AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= {SIMHASH_HAMMING_MAX}
ORDER BY doc_a, doc_b
"""


def prf_expansion_sql(terms: list[str], fb_k: int, n_terms: int) -> str:
    """PRF expansion-term ranking; doc_id-ordered folds mirror
    operators/query.py::prf_expansion."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH {_TOK_CTE},
scored AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN dfs d USING (term)
  JOIN tok t USING (doc_id)
  CROSS JOIN stats s
  WHERE p.term IN ({inlist})
  GROUP BY p.doc_id
),
fb AS (
  SELECT doc_id FROM scored ORDER BY score DESC, doc_id ASC LIMIT {fb_k}
),
fbp AS (
  SELECT p.term, p.doc_id, p.tf / t.doclen AS c
  FROM post p JOIN fb USING (doc_id) JOIN tok t USING (doc_id)
  WHERE p.term NOT IN ({inlist})
),
per AS (
  SELECT term,
         list_reduce(list_prepend(0.0, list(c ORDER BY doc_id)),
                     (a, b) -> a + b) AS s,
         count(*) AS n_fb_docs
  FROM fbp GROUP BY term
)
SELECT p.term,
       round(ln(1.0 + (CAST(st.n_docs AS DOUBLE) - d.df + 0.5)
                / (d.df + 0.5)) * p.s, 6) AS weight,
       CAST(p.n_fb_docs AS BIGINT) AS n_fb_docs
FROM per p JOIN dfs d USING (term) CROSS JOIN stats st
ORDER BY weight DESC, term ASC LIMIT {n_terms}
"""


def dedup_consensus_sql() -> str:
    """>=2-of-3 near-dup method vote; composes the three method oracles
    as subqueries so the ensemble semantics mirror dedup.py exactly."""
    return f"""
WITH u AS (
  SELECT doc_a, doc_b, 'mh' AS m FROM ({minhash_lsh_sql(0.8)})
  UNION ALL
  SELECT doc_a, doc_b, 'sh' AS m FROM ({simhash_hamming_sql()})
  UNION ALL
  SELECT doc_a, doc_b, 'ng' AS m FROM ({ngram_jaccard_sql(0.5)})
)
SELECT doc_a, doc_b, CAST(count(*) AS INT) AS n_methods,
       CAST(max(CASE WHEN m = 'mh' THEN 1 ELSE 0 END) AS INT)
         AS via_minhash,
       CAST(max(CASE WHEN m = 'sh' THEN 1 ELSE 0 END) AS INT)
         AS via_simhash,
       CAST(max(CASE WHEN m = 'ng' THEN 1 ELSE 0 END) AS INT)
         AS via_jaccard
FROM u GROUP BY 1, 2 HAVING count(*) >= 2 ORDER BY doc_a, doc_b
"""


def rocchio_knn_sql(terms: list[str], fb_k: int, k: int) -> str:
    """Rocchio dense feedback: BM25 head -> embedding centroid ->
    cosine top-k; vec_id-ordered centroid fold mirrors similarity.py."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH {_TOK_CTE},
scored AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN dfs d USING (term)
  JOIN tok t USING (doc_id)
  CROSS JOIN stats s
  WHERE p.term IN ({inlist})
  GROUP BY p.doc_id
),
fb AS (
  SELECT doc_id AS vec_id FROM scored
  ORDER BY score DESC, doc_id ASC LIMIT {fb_k}
),
emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
fbl AS (
  SELECT list(e.v ORDER BY e.vec_id) AS vl
  FROM emb e JOIN fb USING (vec_id)
),
cent AS (
  SELECT list_transform(range(1, 65), d ->
    list_reduce(list_prepend(0.0, list_transform(vl, u -> u[d])),
                (a, b) -> a + b) / {fb_k}.0) AS c
  FROM fbl
),
sc AS (
  SELECT e.vec_id,
         round(list_dot_product(cent.c, e.v)
           / (sqrt(list_dot_product(cent.c, cent.c))
              * sqrt(list_dot_product(e.v, e.v))), 6) AS cosine
  FROM emb e CROSS JOIN cent
  WHERE e.vec_id NOT IN (SELECT vec_id FROM fb)
),
r AS (
  SELECT vec_id, cosine,
         row_number() OVER (ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM sc
)
SELECT CAST(rank AS BIGINT) AS rank, vec_id, cosine
FROM r WHERE rank <= {k} ORDER BY rank
"""


TEXTRANK_KEYWORDS = f"""
WITH raw AS (
  SELECT w1, w2 FROM (
    SELECT toks[i] AS w1, toks[i + 1] AS w2
    FROM (SELECT {TOKS} AS toks FROM documents),
         unnest(range(1, len(toks))) AS u(i)
    UNION ALL
    SELECT toks[i] AS w1, toks[i + 2] AS w2
    FROM (SELECT {TOKS} AS toks FROM documents),
         unnest(range(1, len(toks) - 1)) AS u(i)
  ) WHERE w1 != w2
),
wtab AS (
  SELECT least(w1, w2) AS a, greatest(w1, w2) AS b, count(*) AS w
  FROM raw GROUP BY 1, 2
),
edges AS (
  SELECT a AS src, b AS dst, w FROM wtab
  UNION ALL
  SELECT b AS src, a AS dst, w FROM wtab
),
nodes AS (SELECT DISTINCT src AS term FROM edges),
nn AS (SELECT count(*) AS n FROM nodes),
deg AS (SELECT src, sum(w) AS strength FROM edges GROUP BY src),
pr0 AS (
  SELECT t.term, CAST(1.0 AS DOUBLE) / CAST(nn.n AS DOUBLE) AS pr
  FROM nodes t CROSS JOIN nn
),
c1 AS (
  SELECT e.dst,
         list_reduce(
           list_prepend(0.0,
             list(p.pr * CAST(e.w AS DOUBLE) / CAST(g.strength AS DOUBLE)
                  ORDER BY e.src)),
           (x, y) -> x + y) AS c
  FROM edges e JOIN deg g USING (src) JOIN pr0 p ON p.term = e.src
  GROUP BY e.dst
),
pr1 AS (
  SELECT t.term,
         CAST(0.15 AS DOUBLE) / CAST(nn.n AS DOUBLE)
         + CAST(0.85 AS DOUBLE) * coalesce(c1.c, CAST(0.0 AS DOUBLE)) AS pr
  FROM nodes t CROSS JOIN nn LEFT JOIN c1 ON t.term = c1.dst
),
c2 AS (
  SELECT e.dst,
         list_reduce(
           list_prepend(0.0,
             list(p.pr * CAST(e.w AS DOUBLE) / CAST(g.strength AS DOUBLE)
                  ORDER BY e.src)),
           (x, y) -> x + y) AS c
  FROM edges e JOIN deg g USING (src) JOIN pr1 p ON p.term = e.src
  GROUP BY e.dst
),
pr2 AS (
  SELECT t.term,
         CAST(0.15 AS DOUBLE) / CAST(nn.n AS DOUBLE)
         + CAST(0.85 AS DOUBLE) * coalesce(c2.c, CAST(0.0 AS DOUBLE)) AS pr
  FROM nodes t CROSS JOIN nn LEFT JOIN c2 ON t.term = c2.dst
)
SELECT term, round(pr, 9) AS textrank
FROM pr2 ORDER BY textrank DESC, term ASC LIMIT 20
"""


TRIANGLE_COUNT = f"""
WITH {_GRAPH_CTE},
e AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges WHERE src != dst
),
tri AS (
  SELECT ab.a AS x, ab.b AS y, bc.b AS z
  FROM e ab JOIN e bc ON ab.b = bc.a
  JOIN e ac ON ac.a = ab.a AND ac.b = bc.b
),
corners AS (
  SELECT node, count(*) AS n_triangles FROM (
    SELECT x AS node FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri
  ) GROUP BY node
),
degs AS (
  SELECT node, count(*) AS degree FROM (
    SELECT a AS node FROM e UNION ALL SELECT b FROM e
  ) GROUP BY node
)
SELECT d.doc_id,
       CAST(coalesce(g.degree, 0) AS BIGINT) AS degree,
       CAST(coalesce(c.n_triangles, 0) AS BIGINT) AS n_triangles,
       CASE WHEN coalesce(g.degree, 0) >= 2
            THEN round(2.0 * coalesce(c.n_triangles, 0)
                 / (CAST(g.degree AS DOUBLE) * (g.degree - 1.0)), 6)
            ELSE 0.0 END AS clustering
FROM documents d
LEFT JOIN degs g ON d.doc_id = g.node
LEFT JOIN corners c ON d.doc_id = c.node
ORDER BY d.doc_id
"""


POSTINGS_SIZE_ESTIMATE = f"""
WITH post AS (
  SELECT term, doc_id FROM (
    SELECT doc_id, unnest({TOKS}) AS term FROM documents
  ) GROUP BY term, doc_id
),
per_term AS (
  SELECT term, list(doc_id ORDER BY doc_id) AS ids FROM post GROUP BY term
),
g AS (
  SELECT term, ids,
         list_transform(ids, (x, i) ->
           CASE WHEN i = 1 THEN x + 1 ELSE x - ids[i - 1] END) AS gaps
  FROM per_term
),
b AS (
  SELECT term, CAST(len(ids) AS BIGINT) AS df,
         CAST(list_reduce(list_prepend(0, list_transform(gaps, gg ->
           CASE WHEN gg < 128 THEN 1
                WHEN gg < 16384 THEN 2
                WHEN gg < 2097152 THEN 3
                WHEN gg < 268435456 THEN 4
                ELSE 5 END)), (x, y) -> x + y) AS BIGINT) AS encoded_bytes
  FROM g
)
SELECT term, df, encoded_bytes,
       round(CAST(encoded_bytes AS DOUBLE) / df, 6) AS bytes_per_posting
FROM b ORDER BY term
"""


NEXT_EVENT_MARKOV = """
WITH pairs AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS from_type,
         event_type AS to_type
  FROM events
),
cnt AS (
  SELECT from_type, to_type, count(*) AS n
  FROM pairs WHERE from_type IS NOT NULL
  GROUP BY 1, 2
),
tot AS (SELECT from_type, sum(n) AS tot FROM cnt GROUP BY 1)
SELECT c.from_type, c.to_type, CAST(c.n AS BIGINT) AS n,
       round(CAST(c.n AS DOUBLE) / t.tot, 6) AS p
FROM cnt c JOIN tot t USING (from_type)
ORDER BY from_type, to_type
"""


def query_likelihood_sql(
    terms: list[str], k: int = 15, mu: float = 2000.0
) -> str:
    """Dirichlet query-likelihood twin of
    operators/textstats.py::query_likelihood_topk — the decomposed
    match-only form with token-identical expression shapes (p_mu,
    const_q, the per-doc score), so equal integer inputs give bit-equal
    doubles and both engines rank identically."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH tokf AS (SELECT doc_id, unnest({TOKS}) AS term FROM documents),
dl AS (SELECT doc_id, count(*) AS doclen FROM tokf GROUP BY 1),
tot AS (SELECT CAST(sum(doclen) AS BIGINT) AS total_tokens FROM dl),
qtok AS (SELECT * FROM tokf WHERE term IN ({inlist})),
cf AS (
  SELECT term,
         {mu!r} * (CAST(count(*) AS DOUBLE)
                   / CAST(total_tokens AS DOUBLE)) AS p_mu
  FROM qtok CROSS JOIN tot GROUP BY term, total_tokens
),
constq AS (SELECT sum(ln(p_mu)) AS const_q, count(*) AS nq FROM cf),
matched AS (
  SELECT doc_id, sum(ln(1.0 + CAST(tf AS DOUBLE) / p_mu)) AS match_part
  FROM (SELECT doc_id, term, count(*) AS tf FROM qtok GROUP BY 1, 2)
  JOIN cf USING (term) GROUP BY doc_id
),
scored AS (
  SELECT m.doc_id,
         const_q - CAST(nq AS DOUBLE)
                   * ln(CAST(doclen AS DOUBLE) + {mu!r})
                 + match_part AS score
  FROM matched m JOIN dl USING (doc_id) CROSS JOIN constq
)
SELECT doc_id, round(score, 6) AS score
FROM scored ORDER BY score DESC, doc_id LIMIT {k}
"""


def champion_lists_sql(m: int = 5) -> str:
    """Twin of operators/textstats.py::champion_lists — rank by
    (tf desc, doc_id), keep m per term, lists serialized in rank order
    per the repo's canon convention."""
    return f"""
WITH tf AS (
  SELECT term, doc_id, count(*) AS tf FROM (
    SELECT doc_id, unnest({TOKS}) AS term FROM documents
  ) GROUP BY 1, 2
),
rk AS (
  SELECT *, row_number() OVER (
    PARTITION BY term ORDER BY tf DESC, doc_id) AS rk
  FROM tf
),
dfs AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1)
SELECT d.term, d.df,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY rk)
         AS champion_ids,
       string_agg(CAST(tf AS VARCHAR), ',' ORDER BY rk)
         AS champion_tfs
FROM rk JOIN dfs d USING (term)
WHERE rk <= {m}
GROUP BY d.term, d.df
ORDER BY d.term
"""


_VB_FOLD = """list_reduce(list_prepend(0, list_transform(
    list_transform(ids, (x, i) ->
      CASE WHEN i = 1 THEN x + 1 ELSE x - ids[i - 1] END),
    gg -> CASE WHEN gg < 128 THEN 1
               WHEN gg < 16384 THEN 2
               WHEN gg < 2097152 THEN 3
               WHEN gg < 268435456 THEN 4
               ELSE 5 END)), (x, y) -> x + y)"""


DOCID_REMAP_GAP_BYTES = f"""
WITH remap AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY source, lang, doc_id) - 1 AS new_id
  FROM documents
),
post AS (
  SELECT term, doc_id FROM (
    SELECT doc_id, unnest({TOKS}) AS term FROM documents
  ) GROUP BY 1, 2
),
o AS (SELECT term, list(doc_id ORDER BY doc_id) AS ids
      FROM post GROUP BY term),
r AS (SELECT term, list(new_id ORDER BY new_id) AS ids
      FROM post JOIN remap USING (doc_id) GROUP BY term),
ob AS (SELECT CAST(sum({_VB_FOLD}) AS BIGINT) AS orig_bytes FROM o),
rb AS (SELECT CAST(sum({_VB_FOLD}) AS BIGINT) AS remap_bytes FROM r),
np AS (SELECT CAST(count(*) AS BIGINT) AS n_postings FROM post)
SELECT n_postings, orig_bytes, remap_bytes,
       round(CAST(remap_bytes AS DOUBLE)
             / CAST(orig_bytes AS DOUBLE), 6) AS bytes_ratio
FROM np CROSS JOIN ob CROSS JOIN rb
"""


SIBLING_BUCKET_AGGS = """
WITH hist AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
         count(*) AS n_events
  FROM events GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_buckets,
       round(avg(CAST(n_events AS DOUBLE)), 6) AS avg_bucket,
       CAST(min(n_events) AS BIGINT) AS min_bucket,
       CAST(max(n_events) AS BIGINT) AS max_bucket,
       CAST(sum(n_events) AS BIGINT) AS sum_bucket
FROM hist
"""


BLOOM_PREFILTER = f"""
WITH h AS (
  SELECT doc_id, md5(text) AS hx, doc_id % 10 = 0 AS is_probe
  FROM documents
),
p AS (
  SELECT doc_id, hx, is_probe,
         ('0x' || substr(hx, 1, 7))::BIGINT % 8192 AS p0,
         ('0x' || substr(hx, 9, 7))::BIGINT % 8192 AS p1,
         ('0x' || substr(hx, 17, 7))::BIGINT % 8192 AS p2
  FROM h
),
bits AS (
  SELECT DISTINCT pos FROM (
    SELECT unnest([p0, p1, p2]) AS pos FROM p WHERE NOT is_probe)
),
base_hx AS (SELECT DISTINCT hx FROM p WHERE NOT is_probe)
SELECT doc_id,
       CAST(CASE WHEN p0 IN (SELECT pos FROM bits)
              AND p1 IN (SELECT pos FROM bits)
              AND p2 IN (SELECT pos FROM bits)
            THEN 1 ELSE 0 END AS BIGINT) AS bloom_hit,
       CAST(CASE WHEN hx IN (SELECT hx FROM base_hx)
            THEN 1 ELSE 0 END AS BIGINT) AS exact_dup
FROM p WHERE is_probe
ORDER BY doc_id
"""


def bm25_plus_sql(
    terms: list[str], k: int = 15, delta: float = 0.5
) -> str:
    """BM25+ twin of operators/textstats.py::bm25_plus_topk — the repo
    BM25 kernel shape (bm25_sql) with the Lv-Zhai lower bound added
    inside the idf product; token-identical expression nesting."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH tokf AS (SELECT doc_id, unnest({TOKS}) AS term FROM documents),
dl AS (SELECT doc_id, count(*) AS doclen FROM tokf GROUP BY 1),
stats AS (
  SELECT count(*) AS n_docs,
         CAST(sum(doclen) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
  FROM dl
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tokf
  WHERE term IN ({inlist}) GROUP BY 1, 2
),
dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doclen / s.avgdl))
              + {delta!r})
         ) AS score
  FROM tf JOIN dfs d USING (term) JOIN dl USING (doc_id)
  CROSS JOIN stats s
  GROUP BY tf.doc_id
)
SELECT doc_id, round(score, 6) AS score
FROM scored ORDER BY score DESC, doc_id LIMIT {k}
"""


def intersect_estimate_sql(n_terms: int = 10) -> str:
    """Twin of operators/textstats.py::intersect_estimate — actual
    pairwise postings intersections of the top-df terms vs the
    System-R independence estimate."""
    return f"""
WITH post AS (
  SELECT term, doc_id FROM (
    SELECT doc_id, unnest({TOKS}) AS term FROM documents
  ) GROUP BY 1, 2
),
dfs AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
top AS (SELECT term, df FROM dfs ORDER BY df DESC, term LIMIT {n_terms}),
p AS (SELECT post.term, doc_id FROM post JOIN top USING (term)),
pairs AS (
  SELECT a.term AS term_a, b.term AS term_b, count(*) AS actual
  FROM p a JOIN p b USING (doc_id)
  WHERE a.term < b.term GROUP BY 1, 2
),
n AS (SELECT count(*) AS n_docs FROM documents)
SELECT ta.term AS term_a, tb.term AS term_b,
       CAST(ta.df AS BIGINT) AS df_a, CAST(tb.df AS BIGINT) AS df_b,
       CAST(coalesce(pr.actual, 0) AS BIGINT) AS actual,
       round(CAST(ta.df AS DOUBLE) * CAST(tb.df AS DOUBLE)
             / CAST(n_docs AS DOUBLE), 6) AS est_independent,
       round(CAST(coalesce(pr.actual, 0) AS DOUBLE)
             / (CAST(ta.df AS DOUBLE) * CAST(tb.df AS DOUBLE)
                / CAST(n_docs AS DOUBLE)), 6) AS err_ratio
FROM top ta CROSS JOIN top tb
LEFT JOIN pairs pr ON pr.term_a = ta.term AND pr.term_b = tb.term
CROSS JOIN n
WHERE ta.term < tb.term
ORDER BY term_a, term_b
"""


def static_prune_sql(lam: float = 0.75) -> str:
    """Twin of operators/textstats.py::static_prune_audit — same BM25
    kernel shape as bm25_sql; the keep rule compares bit-equal
    doubles, so both engines prune identically."""
    return f"""
WITH tokf AS (SELECT doc_id, unnest({TOKS}) AS term FROM documents),
dl AS (SELECT doc_id, count(*) AS doclen FROM tokf GROUP BY 1),
stats AS (
  SELECT count(*) AS n_docs,
         CAST(sum(doclen) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
  FROM dl
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tokf GROUP BY 1, 2),
dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.term,
         ln(1.0 + (CAST(st.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
         * (tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doclen / st.avgdl)))
           AS s
  FROM tf JOIN dfs d USING (term) JOIN dl USING (doc_id)
  CROSS JOIN stats st
),
smax AS (SELECT term, max(s) AS smax FROM scored GROUP BY 1),
agg AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df,
         CAST(sum(CASE WHEN s >= {lam!r} * smax THEN 1 ELSE 0 END)
              AS BIGINT) AS kept
  FROM scored JOIN smax USING (term) GROUP BY term
)
SELECT term, df, kept,
       round(CAST(kept AS DOUBLE) / CAST(df AS DOUBLE), 6) AS kept_ratio
FROM agg ORDER BY term
"""


def best_passage_sql(
    terms: list[str], w: int = 20, k: int = 10
) -> str:
    """Twin of operators/textstats.py::best_passage — 1-based
    positions on both engines; arg-min via struct sort (neg count,
    then earliest start)."""
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"""
WITH d AS (SELECT doc_id, {TOKS} AS toks FROM documents),
q AS (
  SELECT doc_id, toks,
         list_filter(range(1, len(toks) + 1),
                     i -> list_contains([{inlist}], toks[i])) AS qpos
  FROM d
),
b AS (
  SELECT doc_id, toks,
         list_sort(list_transform(qpos, s -> {{
           'neg_n': -len(list_distinct(list_transform(
              list_filter(qpos, p -> p >= s AND p < s + {w}),
              p -> toks[p]))),
           'start': s}}))[1] AS bp
  FROM q WHERE len(qpos) > 0
)
SELECT doc_id, CAST(-bp.neg_n AS BIGINT) AS n_terms,
       CAST(bp.start AS BIGINT) AS start,
       array_to_string(list_slice(toks, bp.start, bp.start + {w - 1}),
                       ' ') AS passage
FROM b ORDER BY n_terms DESC, doc_id LIMIT {k}
"""


def rank_correlation_sql(
    terms: list[str], k: int = 20, p: float = 0.9, mu: float = 2000.0
) -> str:
    """Twin of operators/textstats.py::rank_correlation — BM25 (repo
    kernel) and Dirichlet-QL top-k CTEs with the exact expression
    shapes of bm25_plus_sql(delta=0) / query_likelihood_sql, ranks
    over the rounded scores, tau over common pairs, truncated RBO.
    The (1-p) factor is emitted as the exact double literal Python
    computes (DuckDB's decimal arithmetic would give exactly 0.1)."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    one_minus_p = f"CAST({1.0 - p!r} AS DOUBLE)"
    return f"""
WITH tokf AS (SELECT doc_id, unnest({TOKS}) AS term FROM documents),
dl AS (SELECT doc_id, count(*) AS doclen FROM tokf GROUP BY 1),
stats AS (
  SELECT count(*) AS n_docs,
         CAST(sum(doclen) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
  FROM dl
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tokf
  WHERE term IN ({inlist}) GROUP BY 1, 2
),
dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
bm_raw AS (
  SELECT tf.doc_id,
         sum(
           ln(1.0 + (CAST(st.n_docs AS DOUBLE) - d.df + 0.5)
              / (d.df + 0.5))
           * (tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doclen / st.avgdl))
              + 0.0)
         ) AS score
  FROM tf JOIN dfs d USING (term) JOIN dl USING (doc_id)
  CROSS JOIN stats st
  GROUP BY tf.doc_id ORDER BY score DESC, doc_id LIMIT {k}
),
bm AS (SELECT doc_id, round(score, 6) AS score FROM bm_raw),
tot AS (SELECT CAST(sum(doclen) AS BIGINT) AS total_tokens FROM dl),
cf AS (
  SELECT term,
         {mu!r} * (CAST(count(*) AS DOUBLE)
                   / CAST(total_tokens AS DOUBLE)) AS p_mu
  FROM (SELECT doc_id, unnest({TOKS}) AS term FROM documents)
  CROSS JOIN tot
  WHERE term IN ({inlist}) GROUP BY term, total_tokens
),
constq AS (SELECT sum(ln(p_mu)) AS const_q, count(*) AS nq FROM cf),
matched AS (
  SELECT doc_id, sum(ln(1.0 + CAST(tf AS DOUBLE) / p_mu)) AS match_part
  FROM tf JOIN cf USING (term) GROUP BY doc_id
),
ql_raw AS (
  SELECT m.doc_id,
         const_q - CAST(nq AS DOUBLE)
                   * ln(CAST(doclen AS DOUBLE) + {mu!r})
                 + match_part AS score
  FROM matched m JOIN dl USING (doc_id) CROSS JOIN constq
  ORDER BY score DESC, doc_id LIMIT {k}
),
ql AS (SELECT doc_id, round(score, 6) AS score FROM ql_raw),
ra AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id)
         AS ra FROM bm),
rb AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id)
         AS rb FROM ql),
common AS (SELECT doc_id, ra, rb FROM ra JOIN rb USING (doc_id)),
pairs AS (
  SELECT CASE WHEN (x.ra - y.ra) * (x.rb - y.rb) > 0 THEN 1 ELSE 0 END
           AS conc
  FROM common x JOIN common y ON x.doc_id < y.doc_id
),
tau AS (
  SELECT coalesce(round(
           CAST(sum(conc) * 2 - count(*) AS DOUBLE)
           / CAST(count(*) AS DOUBLE), 6), 0.0) AS kendall_tau
  FROM pairs
),
depths AS (SELECT unnest(range(1, {k + 1})) AS d),
ov AS (
  SELECT d, count(doc_id) AS ov
  FROM depths LEFT JOIN common ON greatest(ra, rb) <= d
  GROUP BY d
),
rbo AS (
  SELECT round({one_minus_p}
               * sum(CAST(ov AS DOUBLE) / d * pow({p!r}, d - 1)), 6)
           AS rbo
  FROM ov
),
nc AS (SELECT CAST(count(*) AS BIGINT) AS n_common FROM common)
SELECT n_common, kendall_tau, rbo FROM nc CROSS JOIN tau CROSS JOIN rbo
"""


def mmr_rerank_sql(
    k: int = 10, n_cand: int = 30, lam: float = 0.7, beta: float = 0.3
) -> str:
    """Recursive-CTE twin of operators/similarity.py::mmr_rerank —
    each recursion step LATERAL-picks the argmax of
    lam*rel - beta*max_sim_to_selected over the unpicked candidates
    (same rounded-6 rel/sim inputs, same literals, doc_id tie-break),
    so the greedy order matches the Spark/driver selection
    bit-for-bit."""
    return f"""
WITH RECURSIVE emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
q AS (SELECT v AS qv FROM emb WHERE vec_id = 0),
c0 AS (
  SELECT vec_id,
         round(list_dot_product(qv, v)
           / (sqrt(list_dot_product(qv, qv))
              * sqrt(list_dot_product(v, v))), 6) AS rel
  FROM emb CROSS JOIN q WHERE vec_id >= 5
  ORDER BY rel DESC, vec_id LIMIT {n_cand}
),
cand AS (SELECT c0.vec_id, c0.rel, emb.v FROM c0 JOIN emb USING (vec_id)),
sim AS (
  SELECT a.vec_id AS ca, b.vec_id AS cb,
         round(list_dot_product(a.v, b.v)
           / (sqrt(list_dot_product(a.v, a.v))
              * sqrt(list_dot_product(b.v, b.v))), 6) AS sim
  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
),
sel AS (
  SELECT 1 AS rank, vec_id, [vec_id] AS picked,
         round({lam!r} * rel - {beta!r} * 0.0, 6) AS mmr
  FROM (SELECT * FROM cand ORDER BY rel DESC, vec_id LIMIT 1)
  UNION ALL
  SELECT s.rank + 1, nxt.vec_id, list_append(s.picked, nxt.vec_id),
         nxt.mmr
  FROM sel s, LATERAL (
    SELECT c.vec_id,
           round({lam!r} * c.rel - {beta!r} * coalesce(
             (SELECT max(p.sim) FROM sim p
              WHERE p.ca = c.vec_id AND list_contains(s.picked, p.cb)),
             0.0), 6) AS mmr
    FROM cand c WHERE NOT list_contains(s.picked, c.vec_id)
    ORDER BY {lam!r} * c.rel - {beta!r} * coalesce(
             (SELECT max(p.sim) FROM sim p
              WHERE p.ca = c.vec_id AND list_contains(s.picked, p.cb)),
             0.0) DESC, c.vec_id
    LIMIT 1) nxt
  WHERE s.rank < {k}
)
SELECT CAST(rank AS BIGINT) AS rank, vec_id, mmr
FROM sel ORDER BY rank
"""


CHAR_ENTROPY = """
WITH ch AS (
  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
),
per AS (SELECT doc_id, ch, count(*) AS cnt FROM ch GROUP BY 1, 2),
g AS (
  SELECT doc_id,
         list({'ch': ch, 'cnt': cnt} ORDER BY ch) AS cl,
         sum(cnt) AS n
  FROM per GROUP BY doc_id
),
e AS (
  SELECT doc_id, n, len(cl) AS n_symbols,
         -list_reduce(list_prepend(0.0, list_transform(cl, x ->
            (x.cnt / CAST(n AS DOUBLE))
            * (ln(x.cnt / CAST(n AS DOUBLE)) / ln(2.0)))),
           (a, b) -> a + b) AS ent
  FROM g
)
SELECT doc_id, CAST(n AS BIGINT) AS n_chars_counted,
       CAST(n_symbols AS BIGINT) AS n_symbols,
       round(ent, 6) AS entropy_bits,
       CAST(CASE WHEN ent < 3.0 THEN 1 ELSE 0 END AS BIGINT)
         AS low_entropy
FROM e ORDER BY doc_id
"""


SOURCE_KL = f"""
WITH tokf AS (SELECT source, unnest({TOKS}) AS term FROM documents),
st AS (SELECT source, term, count(*) AS cnt FROM tokf GROUP BY 1, 2),
ct AS (SELECT term, count(*) AS ccnt FROM tokf GROUP BY 1),
na AS (SELECT count(*) AS n_corpus FROM tokf),
g AS (
  SELECT source,
         list({{'term': term, 'cnt': cnt, 'ccnt': ccnt}} ORDER BY term)
           AS cl,
         sum(cnt) AS n_src
  FROM st JOIN ct USING (term) GROUP BY source
)
SELECT source, CAST(n_src AS BIGINT) AS n_tokens,
       CAST(len(cl) AS BIGINT) AS vocab,
       round(list_reduce(list_prepend(0.0, list_transform(cl, x ->
           (x.cnt / CAST(n_src AS DOUBLE))
           * ln((x.cnt / CAST(n_src AS DOUBLE))
                / (x.ccnt / CAST(n_corpus AS DOUBLE))))),
         (a, b) -> a + b), 6) AS kl_nats
FROM g CROSS JOIN na ORDER BY source
"""


def containment_sql(
    threshold: float = 0.6, df_cap: int = 50
) -> str:
    """Twin of operators/dedup.py::containment_pairs — Broder
    containment c(A,B) = inter/|A| over ORDERED candidate pairs, same
    shingle/df-cap machinery as ngram_jaccard_sql."""
    return f"""
WITH tok AS (
  SELECT doc_id, {TOKS} AS toks FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, unnest(
    CASE WHEN len(toks) >= 3 THEN
      list_transform(range(len(toks) - 2),
        i -> concat_ws(' ', toks[i + 1], toks[i + 2], toks[i + 3]))
    ELSE CAST([] AS VARCHAR[]) END
  ) AS shingle
  FROM tok
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
rare AS (
  SELECT shingle FROM (
    SELECT shingle, count(*) AS df FROM sh GROUP BY 1
  ) WHERE df <= {df_cap}
),
blocked AS (SELECT s.doc_id, s.shingle FROM sh s JOIN rare USING (shingle)),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM blocked a
  JOIN blocked b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS inter
  FROM cand c
  JOIN sh ia ON c.doc_a = ia.doc_id
  JOIN sh ib ON c.doc_b = ib.doc_id AND ia.shingle = ib.shingle
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b, CAST(i.inter AS BIGINT) AS shared_shingles,
       round(i.inter / sa.sz, 6) AS containment
FROM inter i
JOIN sizes sa ON i.doc_a = sa.doc_id
WHERE round(i.inter / sa.sz, 6) >= {threshold}
ORDER BY doc_a, doc_b
"""


def qpp_preretrieval_sql(terms: list[str]) -> str:
    """Twin of operators/textstats.py::qpp_preretrieval — SCQ / avg
    ICTF / query scope over the same term-sorted folds."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH tokf AS (SELECT doc_id, unnest({TOKS}) AS term FROM documents),
nd AS (SELECT count(*) AS n_docs FROM documents),
tot AS (SELECT count(*) AS total_tokens FROM tokf),
qtok AS (SELECT * FROM tokf WHERE term IN ({inlist})),
ts AS (
  SELECT term, count(*) AS cf, count(DISTINCT doc_id) AS df
  FROM qtok GROUP BY 1
),
g AS (
  SELECT list({{'term': term, 'cf': cf, 'df': df}} ORDER BY term) AS tl
  FROM ts
),
sc AS (
  SELECT len(tl) AS n_terms_kept,
         list_transform(tl, x ->
           (1.0 + ln(CAST(x.cf AS DOUBLE)))
           * ln(1.0 + CAST(n_docs AS DOUBLE) / x.df)) AS scqs,
         list_reduce(list_prepend(0.0, list_transform(tl, x ->
           ln(CAST(total_tokens AS DOUBLE) / x.cf))),
           (a, b) -> a + b) AS ictf_sum,
         n_docs
  FROM g CROSS JOIN nd CROSS JOIN tot
),
sn AS (SELECT count(DISTINCT doc_id) AS n_match FROM qtok)
SELECT CAST(n_terms_kept AS BIGINT) AS n_terms_kept,
       round(list_reduce(list_prepend(0.0, scqs), (a, b) -> a + b), 6)
         AS scq_sum,
       round(list_max(scqs), 6) AS scq_max,
       round(ictf_sum / CAST(n_terms_kept AS DOUBLE), 6) AS avg_ictf,
       round(-ln(CAST(n_match AS DOUBLE) / CAST(n_docs AS DOUBLE)), 6)
         AS query_scope
FROM sc CROSS JOIN sn
"""


def front_coding_sql(block: int = 16) -> str:
    """Twin of operators/textstats.py::front_coding_audit — same
    restart-every-``block`` front-coding byte model over the sorted
    vocabulary. The lcp is computed ROW-WISE (unnest positions, min
    first-mismatch) instead of via a list lambda: DuckDB misbinds
    lambda captures of lag()-window outputs to the wrong row (verified
    off-by-one on this very query), so no lambda may reference
    ``prev``/``term`` here."""
    return f"""
WITH vocab AS (SELECT DISTINCT unnest({TOKS}) AS term FROM documents),
o AS (
  SELECT term, lag(term) OVER (ORDER BY term) AS prev,
         row_number() OVER (ORDER BY term) AS rn
  FROM vocab
),
o2 AS (
  SELECT term, prev, rn,
         CASE WHEN prev IS NULL THEN 0
              ELSE least(length(prev), length(term)) END AS L
  FROM o
),
pos AS (
  SELECT rn, term, prev, unnest(range(1, L + 1)) AS i
  FROM o2 WHERE prev IS NOT NULL
),
mism AS (
  SELECT rn, min(i) AS fm FROM pos
  WHERE substr(prev, i, 1) <> substr(term, i, 1) GROUP BY rn
),
c AS (
  SELECT length(o2.term) AS tl,
         CASE WHEN (o2.rn - 1) % {block} = 0 THEN length(o2.term) + 1
              ELSE length(o2.term)
                   - (CASE WHEN o2.prev IS NULL THEN 0
                           ELSE coalesce(m.fm - 1, o2.L) END) + 2
         END AS fb
  FROM o2 LEFT JOIN mism m USING (rn)
)
SELECT CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(tl + 1) AS BIGINT) AS raw_bytes,
       CAST(sum(fb) AS BIGINT) AS front_bytes,
       round(CAST(sum(fb) AS DOUBLE) / CAST(sum(tl + 1) AS DOUBLE), 6)
         AS bytes_ratio
FROM c
"""


def combsum_hybrid_sql(
    terms: list[str], k: int = 10, mu: float = 2000.0
) -> str:
    """Twin of operators/textstats.py::combsum_hybrid — min-max
    normalized CombSUM/CombMNZ over the same BM25/QL top-20 CTEs as
    rank_correlation_sql."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH tokf AS (SELECT doc_id, unnest({TOKS}) AS term FROM documents),
dl AS (SELECT doc_id, count(*) AS doclen FROM tokf GROUP BY 1),
stats AS (
  SELECT count(*) AS n_docs,
         CAST(sum(doclen) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
  FROM dl
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tokf
  WHERE term IN ({inlist}) GROUP BY 1, 2
),
dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
bm_raw AS (
  SELECT tf.doc_id,
         sum(
           ln(1.0 + (CAST(st.n_docs AS DOUBLE) - d.df + 0.5)
              / (d.df + 0.5))
           * (tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doclen / st.avgdl))
              + 0.0)
         ) AS score
  FROM tf JOIN dfs d USING (term) JOIN dl USING (doc_id)
  CROSS JOIN stats st
  GROUP BY tf.doc_id ORDER BY score DESC, doc_id LIMIT 20
),
bm AS (SELECT doc_id, round(score, 6) AS score FROM bm_raw),
tot AS (SELECT CAST(sum(doclen) AS BIGINT) AS total_tokens FROM dl),
cf AS (
  SELECT term,
         {mu!r} * (CAST(count(*) AS DOUBLE)
                   / CAST(total_tokens AS DOUBLE)) AS p_mu
  FROM (SELECT doc_id, unnest({TOKS}) AS term FROM documents)
  CROSS JOIN tot
  WHERE term IN ({inlist}) GROUP BY term, total_tokens
),
constq AS (SELECT sum(ln(p_mu)) AS const_q, count(*) AS nq FROM cf),
matched AS (
  SELECT doc_id, sum(ln(1.0 + CAST(tf AS DOUBLE) / p_mu)) AS match_part
  FROM tf JOIN cf USING (term) GROUP BY doc_id
),
ql_raw AS (
  SELECT m.doc_id,
         const_q - CAST(nq AS DOUBLE)
                   * ln(CAST(doclen AS DOUBLE) + {mu!r})
                 + match_part AS score
  FROM matched m JOIN dl USING (doc_id) CROSS JOIN constq
  ORDER BY score DESC, doc_id LIMIT 20
),
ql AS (SELECT doc_id, round(score, 6) AS score FROM ql_raw),
mma AS (SELECT min(score) AS mn, max(score) AS mx FROM bm),
na AS (
  SELECT doc_id, CASE WHEN mx = mn THEN 1.0
                      ELSE (score - mn) / (mx - mn) END AS sa
  FROM bm CROSS JOIN mma
),
mmb AS (SELECT min(score) AS mn, max(score) AS mx FROM ql),
nb AS (
  SELECT doc_id, CASE WHEN mx = mn THEN 1.0
                      ELSE (score - mn) / (mx - mn) END AS sb
  FROM ql CROSS JOIN mmb
),
fused AS (
  SELECT doc_id,
         coalesce(sa, 0.0) + coalesce(sb, 0.0) AS combsum,
         (CASE WHEN sa IS NOT NULL THEN 1 ELSE 0 END
          + CASE WHEN sb IS NOT NULL THEN 1 ELSE 0 END) AS nz
  FROM na FULL JOIN nb USING (doc_id)
),
ranked AS (
  SELECT doc_id, combsum, combsum * CAST(nz AS DOUBLE) AS combmnz, nz
  FROM fused ORDER BY combmnz DESC, doc_id LIMIT {k}
)
SELECT doc_id, round(combsum, 6) AS combsum,
       round(combmnz, 6) AS combmnz, CAST(nz AS BIGINT) AS n_lists
FROM ranked
"""

def quantize_fidelity_sql(
    terms: list[str], k: int = 20, qmax: int = 255
) -> str:
    """Twin of operators/textstats.py::quantize_fidelity — same kernel,
    same floor(s / smax * qmax) quantizer, ranks over each top-k."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH tokf AS (SELECT doc_id, unnest({TOKS}) AS term FROM documents),
dl AS (SELECT doc_id, count(*) AS doclen FROM tokf GROUP BY 1),
stats AS (
  SELECT count(*) AS n_docs,
         CAST(sum(doclen) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
  FROM dl
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tokf
  WHERE term IN ({inlist}) GROUP BY 1, 2
),
dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (CAST(st.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
         * (tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doclen / st.avgdl)))
           AS s
  FROM tf JOIN dfs d USING (term) JOIN dl USING (doc_id)
  CROSS JOIN stats st
),
smax AS (SELECT max(s) AS smax FROM scored),
agg AS (
  SELECT doc_id, sum(s) AS es,
         CAST(sum(CAST(floor(s / smax * {float(qmax)!r}) AS BIGINT))
              AS BIGINT) AS qs
  FROM scored CROSS JOIN smax GROUP BY doc_id
),
exact AS (
  SELECT doc_id, row_number() OVER (ORDER BY es DESC, doc_id) AS re
  FROM (SELECT * FROM agg ORDER BY es DESC, doc_id LIMIT {k})
),
quant AS (
  SELECT doc_id, row_number() OVER (ORDER BY qs DESC, doc_id) AS rq
  FROM (SELECT * FROM agg ORDER BY qs DESC, doc_id LIMIT {k})
)
SELECT CAST({k} AS BIGINT) AS k,
       CAST(count(*) AS BIGINT) AS overlap_at_k,
       CAST(coalesce(sum(abs(re - rq)), 0) AS BIGINT) AS footrule
FROM exact JOIN quant USING (doc_id)
"""


def shard_idf_drift_sql(
    terms: list[str], k: int = 20, n_shards: int = 4
) -> str:
    """Twin of operators/textstats.py::shard_idf_drift — global vs
    shard-local BM25 statistics, same kernel shape both ways."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH tokf AS (
  SELECT doc_id, doc_id % {n_shards} AS shard, unnest({TOKS}) AS term
  FROM documents
),
dl AS (
  SELECT doc_id, shard, count(*) AS doclen FROM tokf GROUP BY 1, 2
),
gstats AS (
  SELECT count(*) AS n_docs,
         CAST(sum(doclen) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
  FROM dl
),
lstats AS (
  SELECT shard, count(*) AS l_n_docs,
         CAST(sum(doclen) AS DOUBLE) / CAST(count(*) AS DOUBLE)
           AS l_avgdl
  FROM dl GROUP BY shard
),
tf AS (
  SELECT doc_id, shard, term, count(*) AS tf FROM tokf
  WHERE term IN ({inlist}) GROUP BY 1, 2, 3
),
gdf AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
ldf AS (SELECT shard, term, count(*) AS l_df FROM tf GROUP BY 1, 2),
gscore AS (
  SELECT tf.doc_id,
         sum(
           ln(1.0 + (CAST(g.n_docs AS DOUBLE) - d.df + 0.5)
              / (d.df + 0.5))
           * (tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doclen / g.avgdl)))
         ) AS gs
  FROM tf JOIN gdf d USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN gstats g
  GROUP BY tf.doc_id
),
lscore AS (
  SELECT tf.doc_id,
         sum(
           ln(1.0 + (CAST(l.l_n_docs AS DOUBLE) - d.l_df + 0.5)
              / (d.l_df + 0.5))
           * (tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doclen / l.l_avgdl)))
         ) AS ls
  FROM tf JOIN ldf d ON tf.shard = d.shard AND tf.term = d.term
  JOIN dl ON tf.doc_id = dl.doc_id
  JOIN lstats l ON tf.shard = l.shard
  GROUP BY tf.doc_id
),
gtop AS (SELECT doc_id, gs FROM gscore ORDER BY gs DESC, doc_id LIMIT {k}),
ltop AS (SELECT doc_id, ls FROM lscore ORDER BY ls DESC, doc_id LIMIT {k})
SELECT CAST({k} AS BIGINT) AS k,
       CAST({n_shards} AS BIGINT) AS n_shards,
       CAST(count(*) AS BIGINT) AS overlap_at_k,
       round(coalesce(max(abs(ls - gs) / gs), 0.0), 6) AS max_rel_err
FROM gtop JOIN ltop USING (doc_id)
"""


def collocations_llr_sql(k: int = 20) -> str:
    """Twin of operators/textstats.py::collocations_llr — Dunning G^2
    as one fixed-shape double expression with term-by-term additions
    in the same order as the Spark column expression."""
    xlx = (
        "CASE WHEN {x} > 0 THEN CAST({x} AS DOUBLE)"
        " * ln(CAST({x} AS DOUBLE)) ELSE 0.0 END"
    )
    terms = [
        xlx.format(x="k11"),
        xlx.format(x="k12"),
        xlx.format(x="k21"),
        xlx.format(x="k22"),
        xlx.format(x="nn"),
    ]
    minus = [
        xlx.format(x="row1"),
        xlx.format(x="(nn - row1)"),
        xlx.format(x="col1"),
        xlx.format(x="(nn - col1)"),
    ]
    expr = (
        "2.0 * ("
        + " + ".join(terms)
        + " - "
        + " - ".join(minus)
        + ")"
    )
    return f"""
WITH big AS (
  SELECT unnest(
    CASE WHEN len(toks) >= 2 THEN
      list_transform(range(1, len(toks)),
        i -> {{'a': toks[i], 'b': toks[i + 1]}})
    ELSE [] END
  ) AS bg
  FROM (SELECT {TOKS} AS toks FROM documents)
),
pairs AS (SELECT bg.a AS a, bg.b AS b FROM big),
k11t AS (SELECT a, b, count(*) AS k11 FROM pairs GROUP BY 1, 2),
rowc AS (SELECT a, count(*) AS row1 FROM pairs GROUP BY 1),
colc AS (SELECT b, count(*) AS col1 FROM pairs GROUP BY 1),
n AS (SELECT count(*) AS nn FROM pairs),
j AS (
  SELECT a, b, k11, row1 - k11 AS k12, col1 - k11 AS k21,
         nn - row1 - col1 + k11 AS k22, row1, col1, nn
  FROM k11t JOIN rowc USING (a) JOIN colc USING (b) CROSS JOIN n
),
scored AS (SELECT a, b, k11, {expr} AS llr FROM j)
SELECT a, b, CAST(k11 AS BIGINT) AS n_bigram, round(llr, 6) AS llr
FROM (SELECT * FROM scored ORDER BY llr DESC, a, b LIMIT {k})
"""


def lm_jelinek_mercer_sql(
    terms: list[str], k: int = 15, lam: float = 0.7
) -> str:
    """Twin of operators/textstats.py::lm_jelinek_mercer_topk — the
    match-only J-M form with token-identical expression shapes (p_c,
    the per-term contribution), so equal integer inputs give bit-equal
    doubles and both engines rank identically."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH tokf AS (SELECT doc_id, unnest({TOKS}) AS term FROM documents),
dl AS (SELECT doc_id, count(*) AS doclen FROM tokf GROUP BY 1),
tot AS (SELECT CAST(sum(doclen) AS BIGINT) AS total_tokens FROM dl),
qtok AS (SELECT * FROM tokf WHERE term IN ({inlist})),
cf AS (
  SELECT term, CAST(count(*) AS DOUBLE)
               / CAST(total_tokens AS DOUBLE) AS p_c
  FROM qtok CROSS JOIN tot GROUP BY term, total_tokens
),
scored AS (
  SELECT doc_id,
         sum(ln(1.0 + ({1.0 - lam!r} * CAST(tf AS DOUBLE)
                        / CAST(doclen AS DOUBLE))
                      / ({lam!r} * p_c))) AS score
  FROM (SELECT doc_id, term, count(*) AS tf FROM qtok GROUP BY 1, 2)
  JOIN cf USING (term) JOIN dl USING (doc_id)
  GROUP BY doc_id
)
SELECT doc_id, round(score, 6) AS score
FROM scored ORDER BY score DESC, doc_id LIMIT {k}
"""


def dfi_sql(terms: list[str], k: int = 15) -> str:
    """Twin of operators/textstats.py::dfi_topk — chi-squared DFI with
    log2 written as ln(x)/ln(2.0) on both engines."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH tokf AS (SELECT doc_id, unnest({TOKS}) AS term FROM documents),
dl AS (SELECT doc_id, count(*) AS doclen FROM tokf GROUP BY 1),
tot AS (SELECT CAST(sum(doclen) AS BIGINT) AS total_tokens FROM dl),
qtok AS (SELECT * FROM tokf WHERE term IN ({inlist})),
cf AS (SELECT term, count(*) AS cf FROM qtok GROUP BY 1),
j AS (
  SELECT doc_id, CAST(tf AS DOUBLE) AS tf,
         CAST(cf AS DOUBLE) * CAST(doclen AS DOUBLE)
           / CAST(total_tokens AS DOUBLE) AS e
  FROM (SELECT doc_id, term, count(*) AS tf FROM qtok GROUP BY 1, 2)
  JOIN cf USING (term) JOIN dl USING (doc_id) CROSS JOIN tot
),
scored AS (
  SELECT doc_id,
         sum(CASE WHEN tf > e
                  THEN ln(1.0 + (tf - e) * (tf - e) / e) / ln(2.0)
                  ELSE 0.0 END) AS score
  FROM j GROUP BY doc_id
)
SELECT doc_id, round(score, 6) AS score
FROM scored WHERE score > 0
ORDER BY score DESC, doc_id LIMIT {k}
"""


def bm25f_sql(
    terms: list[str],
    k: int = 15,
    title_len: int = 5,
    w_title: float = 2.0,
    w_body: float = 1.0,
    b: float = 0.75,
    k1: float = 1.2,
) -> str:
    """Twin of operators/textstats.py::bm25f_topk — the same synthetic
    title/body split (first title_len tokens vs the rest), per-field
    length normalization before weight combination, single saturation,
    document-level df."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_slice(ts, 1, {title_len}) AS title_ts,
         list_slice(ts, {title_len + 1}, len(ts)) AS body_ts
  FROM (SELECT doc_id, {TOKS} AS ts FROM documents)
),
lens AS (
  SELECT doc_id, len(title_ts) AS len_title, len(body_ts) AS len_body
  FROM toks
),
avgs AS (
  SELECT CAST(sum(len_title) AS DOUBLE) / CAST(count(*) AS DOUBLE)
           AS avg_title,
         CAST(sum(len_body) AS DOUBLE) / CAST(count(*) AS DOUBLE)
           AS avg_body,
         count(*) AS n_docs
  FROM lens
),
fielded AS (
  SELECT doc_id, 'title' AS field, unnest(title_ts) AS term FROM toks
  UNION ALL
  SELECT doc_id, 'body' AS field, unnest(body_ts) AS term FROM toks
),
tf AS (
  SELECT doc_id, field, term, count(*) AS tf
  FROM fielded WHERE term IN ({inlist})
  GROUP BY 1, 2, 3
),
dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
pseudo AS (
  SELECT doc_id, term, n_docs,
         sum(
           (CASE WHEN field = 'title' THEN {w_title!r}
                 ELSE {w_body!r} END)
           * CAST(tf AS DOUBLE)
           / ({1.0 - b!r} + {b!r}
              * CAST(CASE WHEN field = 'title' THEN len_title
                          ELSE len_body END AS DOUBLE)
              / (CASE WHEN field = 'title' THEN avg_title
                      ELSE avg_body END))
         ) AS tft
  FROM tf JOIN lens USING (doc_id) CROSS JOIN avgs
  GROUP BY 1, 2, 3
),
scored AS (
  SELECT doc_id,
         sum(ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE)
                       + 0.5) / (CAST(df AS DOUBLE) + 0.5))
             * tft / ({k1!r} + tft)) AS score
  FROM pseudo JOIN dfs USING (term)
  GROUP BY doc_id
)
SELECT doc_id, round(score, 6) AS score
FROM scored ORDER BY score DESC, doc_id LIMIT {k}
"""


def kmv_distinct_sql(k: int = 16) -> str:
    """Twin of operators/textstats.py::kmv_distinct — same vocab-rank
    hash ((token_id+1)*FP_MULT % MOD), same min-k window, same
    (k-1)*MOD/h_k estimator with the exact-count fallback below k."""
    return f"""
WITH st AS (
  SELECT DISTINCT source, term FROM (
    SELECT source, unnest({TOKS}) AS term FROM documents
  )
),
vocab AS (
  SELECT term, row_number() OVER (ORDER BY term) - 1 AS token_id
  FROM (SELECT DISTINCT term FROM st)
),
hashed AS (
  SELECT source, ((token_id + 1) * {FP_MULT}) % {MOD} AS h
  FROM st JOIN vocab USING (term)
),
sk AS (
  SELECT source, h,
         row_number() OVER (PARTITION BY source ORDER BY h) AS rk
  FROM hashed
),
kept AS (SELECT * FROM sk WHERE rk <= {k}),
merged AS (
  SELECT '__merged__' AS source, h,
         row_number() OVER (ORDER BY h) AS rk
  FROM (SELECT DISTINCT h FROM kept)
),
unioned AS (
  SELECT source, h, rk FROM kept
  UNION ALL
  SELECT source, h, rk FROM merged WHERE rk <= {k}
),
est AS (
  SELECT source,
         CASE WHEN count(*) >= {k}
              THEN {float(k - 1)!r} * {float(MOD)!r}
                   / CAST(max(CASE WHEN rk = {k} THEN h END) AS DOUBLE)
              ELSE CAST(count(*) AS DOUBLE) END AS kmv_est
  FROM unioned GROUP BY source
),
exact AS (
  SELECT source, count(DISTINCT term) AS n_exact FROM st GROUP BY 1
  UNION ALL
  SELECT '__merged__', count(DISTINCT term) FROM st
)
SELECT source, n_exact, round(kmv_est, 6) AS kmv_est,
       round(abs(kmv_est - CAST(n_exact AS DOUBLE))
             / CAST(n_exact AS DOUBLE), 6) AS rel_err
FROM est JOIN exact USING (source)
ORDER BY source
"""


def merge_policy_plan_sql(
    merge_factor: int = 10, flush_docs: int = 50
) -> str:
    """Twin of operators/textstats.py::merge_policy_plan — same
    synthetic flush segments, log-mergeFactor level, arrival-order
    windows of mergeFactor per level."""
    return f"""
WITH segs AS (
  SELECT CAST(floor(doc_id / {flush_docs}) AS BIGINT) AS seg_id,
         CAST(sum(n_chars) AS BIGINT) AS bytes
  FROM documents GROUP BY 1
),
lev AS (
  SELECT seg_id, bytes,
         CAST(floor(ln(CAST(bytes AS DOUBLE))
                    / ln({float(merge_factor)!r})) AS BIGINT) AS level
  FROM segs
),
grouped AS (
  SELECT *,
         CAST(floor((row_number() OVER (
             PARTITION BY level ORDER BY seg_id) - 1)
             / {merge_factor}) AS BIGINT) AS grp
  FROM lev
)
SELECT level, grp,
       count(*) AS n_segments,
       min(seg_id) AS first_seg,
       max(seg_id) AS last_seg,
       CAST(sum(bytes) AS BIGINT) AS total_bytes,
       count(*) = {merge_factor} AS will_merge
FROM grouped GROUP BY level, grp
ORDER BY level, grp
"""


PARENT_AGG = """
WITH pk AS (
  SELECT DISTINCT l_returnflag AS returnflag, l_orderkey AS orderkey
  FROM lineitem
)
SELECT returnflag,
       count(*) AS n_parents,
       round(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
             / 100.0, 2) AS parent_revenue
FROM pk JOIN orders ON orderkey = o_orderkey
GROUP BY returnflag
ORDER BY returnflag
LIMIT 10
"""


def avg_precision_sql(
    queries: list[tuple[int, list[str], str]], k: int = 20
) -> str:
    """Twin of operators/query.py::avg_precision_eval — same binary
    marker judgments, same exact-integer P@r accumulation (cnt_r *
    (LCM(1..k) // r) summed as integers), same single final divide."""
    qrows = ", ".join(
        f"({qid}, '{t}')"
        for qid, ts, _ in queries
        for t in sorted(set(ts))
    )
    mrows = ", ".join(f"({qid}, '{m}')" for qid, _, m in queries)
    return f"""
WITH {_TOK_CTE},
q(query_id, term) AS (VALUES {qrows}),
m(query_id, marker) AS (VALUES {mrows}),
scored AS (
  SELECT q.query_id, p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN q ON p.term = q.term
  JOIN dfs d ON p.term = d.term
  JOIN tok t ON p.doc_id = t.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, p.doc_id
),
ranked AS (
  SELECT query_id, doc_id,
         row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC
         ) AS rank
  FROM scored
),
topk AS (SELECT * FROM ranked WHERE rank <= {k}),
rel AS (
  SELECT DISTINCT m.query_id, p.doc_id
  FROM post p JOIN m ON p.term = m.marker
),
nrel AS (
  SELECT query_id, count(*) AS n_rel FROM rel GROUP BY query_id
),
hits AS (
  SELECT t.query_id, t.rank FROM topk t
  JOIN rel r ON t.query_id = r.query_id AND t.doc_id = r.doc_id
),
weighted AS (
  SELECT query_id,
         count(*) OVER (
           PARTITION BY query_id ORDER BY rank
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) * (232792560 // rank) AS term_num
  FROM hits
),
agg AS (
  SELECT query_id, count(*) AS n_hits,
         CAST(sum(term_num) AS BIGINT) AS num
  FROM weighted GROUP BY query_id
)
SELECT n.query_id, n.n_rel,
       coalesce(a.n_hits, 0) AS n_hits,
       round(CAST(coalesce(a.num, 0) AS DOUBLE)
             / (232792560.0 * CAST(n.n_rel AS DOUBLE)), 6) AS ap
FROM nrel n LEFT JOIN agg a ON n.query_id = a.query_id
ORDER BY n.query_id
"""


def redde_sql(
    terms: list[str],
    n_shards: int = 4,
    sample_every: int = 3,
    top_n: int = 40,
) -> str:
    """Twin of operators/query.py::redde_resource_selection — same
    systematic CSI sample (doc_id % sample_every = 0), same CSI-local
    BM25 stats, same integers-in/two-float-ops-out est_rel."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH csi AS (
  SELECT * FROM documents WHERE doc_id % {sample_every} = 0
),
tok AS (
  SELECT doc_id, len({TOKS}) AS doclen FROM csi
),
stats AS (
  SELECT count(*) AS n_docs,
         CAST(sum(doclen) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
  FROM tok
),
post AS (
  SELECT doc_id, term, count(*) AS tf FROM (
    SELECT doc_id, unnest({TOKS}) AS term FROM csi
  ) GROUP BY doc_id, term
),
dfs AS (SELECT term, count(*) AS df FROM post GROUP BY term),
scored AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN dfs d USING (term)
  JOIN tok t USING (doc_id)
  CROSS JOIN stats s
  WHERE p.term IN ({inlist})
  GROUP BY p.doc_id
),
topn AS (
  SELECT doc_id FROM scored ORDER BY score DESC, doc_id ASC LIMIT {top_n}
),
votes AS (
  SELECT CAST(doc_id % {n_shards} AS INT) AS shard,
         count(*) AS n_votes
  FROM topn GROUP BY 1
),
shard_stats AS (
  SELECT CAST(doc_id % {n_shards} AS INT) AS shard,
         count(*) AS shard_docs,
         CAST(sum(CASE WHEN doc_id % {sample_every} = 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS csi_docs
  FROM documents GROUP BY 1
)
SELECT s.shard, s.shard_docs, s.csi_docs,
       coalesce(v.n_votes, 0) AS n_votes,
       round(CASE WHEN s.csi_docs > 0
                  THEN (CAST(coalesce(v.n_votes, 0) AS DOUBLE)
                        * CAST(s.shard_docs AS DOUBLE))
                       / CAST(s.csi_docs AS DOUBLE)
                  ELSE 0.0 END, 6) AS est_rel
FROM shard_stats s LEFT JOIN votes v ON s.shard = v.shard
ORDER BY est_rel DESC, s.shard ASC
"""


ELIAS_FANO_AUDIT = f"""
WITH post AS (
  SELECT term, doc_id FROM (
    SELECT doc_id, unnest({TOKS}) AS term FROM documents
  ) GROUP BY term, doc_id
),
u AS (SELECT max(doc_id) + 1 AS u FROM post),
per_term AS (
  SELECT term, list(doc_id ORDER BY doc_id) AS ids FROM post GROUP BY term
),
g AS (
  SELECT term, CAST(len(ids) AS BIGINT) AS df,
         list_transform(ids, (x, i) ->
           CASE WHEN i = 1 THEN x + 1 ELSE x - ids[i - 1] END) AS gaps
  FROM per_term
),
sized AS (
  SELECT df,
         CAST(list_reduce(list_prepend(0, list_transform(gaps, gg ->
           CASE WHEN gg < 128 THEN 1
                WHEN gg < 16384 THEN 2
                WHEN gg < 2097152 THEN 3
                WHEN gg < 268435456 THEN 4
                ELSE 5 END)), (x, y) -> x + y) AS BIGINT) AS vb,
         greatest(0, length(bin(u.u // df)) - 1) AS l
  FROM g CROSS JOIN u
),
eb AS (
  SELECT df, vb,
         (df * l + df + (SELECT u FROM u) // (CAST(1 AS BIGINT) << l)
          + 1 + 7) // 8 AS eb
  FROM sized
)
SELECT CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(vb) AS BIGINT) AS varbyte_bytes,
       CAST(sum(eb) AS BIGINT) AS ef_bytes,
       round(CAST(sum(eb) AS DOUBLE) / CAST(sum(vb) AS DOUBLE), 6)
         AS ef_to_varbyte,
       CAST(sum(CASE WHEN eb < vb THEN 1 ELSE 0 END) AS BIGINT) AS ef_wins
FROM eb
"""


SOFT404_FILTER = """
WITH staged AS (
  SELECT source,
         CASE WHEN doc_id % 13 = 0 THEN 'error_page'
              WHEN doc_id % 17 = 5 THEN 'truncated'
              ELSE 'normal' END AS planted,
         CASE WHEN doc_id % 13 = 0 THEN
                CASE WHEN doc_id % 2 = 0
                     THEN 'Error 404: the page you requested was not found on this server.'
                     ELSE 'Sorry, this page does not exist or is no longer available.'
                END
              WHEN doc_id % 17 = 5 THEN substr(text, 1, 40)
              ELSE text END AS body
  FROM documents
)
SELECT source, planted,
       (regexp_matches(lower(body),
          'page not found|does not exist|no longer available|error 404')
        OR length(body) < 64) AS detected,
       CAST(count(*) AS BIGINT) AS n_docs
FROM staged
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


URL_FEATURES = """
WITH f AS (
  SELECT source,
         ['com', 'org', 'net'][CAST(doc_id % 3 AS INT) + 1] AS tld,
         CAST(doc_id % 3 + 1 AS BIGINT) AS path_depth,
         CAST(doc_id % 5 = 1 AS BIGINT) AS is_html,
         CAST(doc_id % 6 = 0 AS BIGINT) AS has_query,
         'https://' || source || '.'
           || ['com', 'org', 'net'][CAST(doc_id % 3 AS INT) + 1]
           || '/' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 3)
           || CASE WHEN doc_id % 3 + 1 >= 2
                   THEN '/' || substr(md5(CAST(doc_id AS VARCHAR)), 4, 3)
                   ELSE '' END
           || CASE WHEN doc_id % 3 + 1 >= 3
                   THEN '/' || substr(md5(CAST(doc_id AS VARCHAR)), 7, 3)
                   ELSE '' END
           || CASE WHEN doc_id % 5 = 1 THEN '.html' ELSE '' END
           || CASE WHEN doc_id % 6 = 0
                   THEN '?q=' || CAST(doc_id AS VARCHAR) ELSE '' END
           AS url
  FROM documents
)
SELECT source, tld,
       CAST(count(*) AS BIGINT) AS n_urls,
       round(avg(length(url)), 6) AS avg_url_len,
       round(avg(length(regexp_replace(url, '[^0-9]', '', 'g'))), 6)
         AS avg_digits,
       max(path_depth) AS max_depth,
       CAST(sum(has_query) AS BIGINT) AS n_query,
       CAST(sum(is_html) AS BIGINT) AS n_html
FROM f
GROUP BY 1, 2
ORDER BY 1, 2
"""


def dfr_pl2_sql(terms: list[str], k: int = 15, c: float = 1.0) -> str:
    """Twin of operators/textstats.py::dfr_pl2_topk — PL2 with H2
    tfn, lambda = cf/N, and the Stirling Poisson weight; log2 spelled
    ln(x)/ln(2.0) with the shared /ln(2) factored identically."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH tokf AS (SELECT doc_id, unnest({TOKS}) AS term FROM documents),
dl AS (SELECT doc_id, count(*) AS doclen FROM tokf GROUP BY 1),
st AS (
  SELECT count(*) AS n_docs,
         CAST(sum(doclen) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
  FROM dl
),
qtok AS (SELECT * FROM tokf WHERE term IN ({inlist})),
cf AS (SELECT term, count(*) AS cf FROM qtok GROUP BY 1),
j AS (
  SELECT doc_id,
         CAST(tf AS DOUBLE)
           * (ln(1.0 + {c!r} * avgdl / CAST(doclen AS DOUBLE))
              / ln(2.0)) AS tfn,
         CAST(cf AS DOUBLE) / CAST(n_docs AS DOUBLE) AS lam
  FROM (SELECT doc_id, term, count(*) AS tf FROM qtok GROUP BY 1, 2)
  JOIN cf USING (term) JOIN dl USING (doc_id) CROSS JOIN st
),
scored AS (
  SELECT doc_id,
         sum((tfn * ln(tfn / lam) + (lam - tfn)
              + 0.5 * ln(6.283185307179586 * tfn))
             / (ln(2.0) * (tfn + 1.0))) AS score
  FROM j GROUP BY doc_id
)
SELECT doc_id, round(score, 6) AS score
FROM scored ORDER BY score DESC, doc_id LIMIT {k}
"""


def cori_sql(terms: list[str], n_shards: int = 4) -> str:
    """Twin of operators/query.py::cori_selection — same shard split,
    same T/I/p belief expressions, belief floor 0.4 for terms absent
    from the whole corpus (cf_t NULL)."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    qrows = ", ".join("('" + t.replace("'", "''") + "')" for t in uniq)
    return f"""
WITH tokf AS (
  SELECT doc_id, CAST(doc_id % {n_shards} AS INT) AS shard,
         unnest({TOKS}) AS term
  FROM documents
),
cw AS (SELECT shard, count(*) AS cw FROM tokf GROUP BY 1),
acw AS (
  SELECT CAST(sum(cw) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_cw
  FROM cw
),
df_tc AS (
  SELECT shard, term, count(*) AS df FROM (
    SELECT DISTINCT shard, term, doc_id FROM tokf
    WHERE term IN ({inlist})
  ) GROUP BY 1, 2
),
cf_t AS (SELECT term, count(*) AS cf_t FROM df_tc GROUP BY 1),
q(term) AS (VALUES {qrows}),
grid AS (
  SELECT c.shard, c.cw, q.term, a.avg_cw
  FROM cw c CROSS JOIN q CROSS JOIN acw a
),
belief AS (
  SELECT g.shard, g.cw,
         CASE WHEN f.cf_t IS NOT NULL THEN
           0.4 + 0.6
             * (CAST(coalesce(d.df, 0) AS DOUBLE)
                / (CAST(coalesce(d.df, 0) AS DOUBLE) + 50.0
                   + 150.0 * CAST(g.cw AS DOUBLE) / g.avg_cw))
             * (ln(({float(n_shards)!r} + 0.5) / CAST(f.cf_t AS DOUBLE))
                / ln({float(n_shards)!r} + 1.0))
         ELSE 0.4 END AS p
  FROM grid g
  LEFT JOIN df_tc d ON g.shard = d.shard AND g.term = d.term
  LEFT JOIN cf_t f ON g.term = f.term
)
SELECT shard, max(cw) AS cw, round(sum(p), 6) AS score
FROM belief GROUP BY shard
ORDER BY score DESC, shard
"""


def rbp_sql(
    queries: list[tuple[int, list[str], str]], k: int = 20
) -> str:
    """Twin of operators/query.py::rbp_eval — p = 1/2, integer
    2^(k-r) hit weights summed as BIGINT, one multiply + one divide
    at emit."""
    qrows = ", ".join(
        f"({qid}, '{t}')"
        for qid, ts, _ in queries
        for t in sorted(set(ts))
    )
    mrows = ", ".join(f"({qid}, '{m}')" for qid, _, m in queries)
    return f"""
WITH {_TOK_CTE},
q(query_id, term) AS (VALUES {qrows}),
m(query_id, marker) AS (VALUES {mrows}),
scored AS (
  SELECT q.query_id, p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN q ON p.term = q.term
  JOIN dfs d ON p.term = d.term
  JOIN tok t ON p.doc_id = t.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, p.doc_id
),
ranked AS (
  SELECT query_id, doc_id,
         row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC
         ) AS rank
  FROM scored
),
topk AS (SELECT * FROM ranked WHERE rank <= {k}),
rel AS (
  SELECT DISTINCT m.query_id, p.doc_id
  FROM post p JOIN m ON p.term = m.marker
),
nrel AS (
  SELECT query_id, count(*) AS n_rel FROM rel GROUP BY query_id
),
hits AS (
  SELECT t.query_id, t.rank FROM topk t
  JOIN rel r ON t.query_id = r.query_id AND t.doc_id = r.doc_id
),
agg AS (
  SELECT query_id, count(*) AS n_hits,
         CAST(sum(CAST(1 AS BIGINT) << ({k} - rank)) AS BIGINT) AS num
  FROM hits GROUP BY query_id
)
SELECT n.query_id, n.n_rel,
       coalesce(a.n_hits, 0) AS n_hits,
       round(0.5 * CAST(coalesce(a.num, 0) AS DOUBLE)
             / {float(1 << (k - 1))!r}, 6) AS rbp
FROM nrel n LEFT JOIN agg a ON n.query_id = a.query_id
ORDER BY n.query_id
"""


# Twin of operators/trainprep.py::c4_filter — same planted suffixes,
# LIKE detectors, 7-token planted lines, and >=5-words / >=3-lines
# retention policy.
C4_FILTER = f"""
WITH staged AS (
  SELECT source, doc_id,
         CASE WHEN doc_id % 7 = 1
              THEN text || ' Lorem ipsum dolor sit amet'
              WHEN doc_id % 11 = 3
              THEN text || ' var f = function() {{ return 1; }}'
              ELSE text END AS body
  FROM documents
),
f AS (
  SELECT source, doc_id,
         lower(body) LIKE '%lorem ipsum%' AS has_lorem,
         body LIKE '%{{%' AS has_brace,
         len(regexp_extract_all(lower(body), '{TOKEN_PATTERN}')) AS n
  FROM staged
),
lines AS (
  SELECT source, has_lorem, has_brace, n,
         list_filter(range(greatest((n + 6) // 7, 1)),
                     i -> least(7, n - 7 * i) >= 5
                          AND (doc_id + i) % 3 != 0) AS retained
  FROM f
),
g AS (
  SELECT source, has_lorem, has_brace, n,
         len(retained) AS n_retained,
         coalesce(list_sum(list_transform(retained,
                    i -> least(7, n - 7 * i))), 0) AS retained_tokens,
         (NOT has_lorem AND NOT has_brace AND len(retained) >= 3) AS kept
  FROM lines
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN has_lorem THEN 1 ELSE 0 END) AS BIGINT) AS n_lorem,
       CAST(sum(CASE WHEN has_brace THEN 1 ELSE 0 END) AS BIGINT) AS n_brace,
       CAST(sum(CASE WHEN NOT has_lorem AND NOT has_brace
                     AND n_retained < 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_fewlines,
       CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN kept THEN retained_tokens ELSE 0 END) AS BIGINT)
         AS kept_tokens,
       round(avg(CASE WHEN kept
                      THEN CAST(retained_tokens AS DOUBLE)
                           / CAST(n AS DOUBLE) END), 6) AS kept_ratio
FROM g GROUP BY source ORDER BY source
"""


# Twin of operators/trainprep.py::dsir_weights — same md5-bucket
# unigram+bigram features, +1/+256 Laplace smoothing, one-ln ratio.
DSIR_WEIGHTS = f"""
WITH toks AS (SELECT doc_id, source, {TOKS} AS toks FROM documents),
grams AS (
  SELECT doc_id, source, substr(md5(gram), 1, 2) AS b
  FROM (
    SELECT doc_id, source,
           unnest(list_concat(toks,
             CASE WHEN len(toks) >= 2
                  THEN list_transform(range(1, len(toks)),
                         i -> toks[i] || ' ' || toks[i + 1])
                  ELSE [] END)) AS gram
    FROM toks
  )
),
per_doc AS (
  SELECT doc_id, source, b, count(*) AS cnt FROM grams GROUP BY 1, 2, 3
),
all_b AS (
  SELECT b, CAST(sum(cnt) AS BIGINT) AS a_cnt FROM per_doc GROUP BY 1
),
tgt_b AS (
  SELECT b, CAST(sum(cnt) AS BIGINT) AS t_cnt FROM per_doc
  WHERE source = 'src0' GROUP BY 1
),
tot AS (SELECT CAST(sum(a_cnt) AS DOUBLE) AS a_tot FROM all_b),
ttot AS (SELECT CAST(sum(t_cnt) AS DOUBLE) AS t_tot FROM tgt_b),
lr AS (
  SELECT b,
         ln(((CAST(coalesce(t_cnt, 0) AS DOUBLE) + 1.0) * (a_tot + 256.0))
            / ((CAST(a_cnt AS DOUBLE) + 1.0) * (t_tot + 256.0))) AS lr
  FROM all_b LEFT JOIN tgt_b USING (b) CROSS JOIN tot CROSS JOIN ttot
),
weights AS (
  SELECT doc_id, source, sum(CAST(cnt AS DOUBLE) * lr) AS logw
  FROM per_doc JOIN lr USING (b) GROUP BY 1, 2
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(logw), 6) AS avg_logw,
       CAST(sum(CASE WHEN logw > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_target_like
FROM weights GROUP BY source ORDER BY source
"""


# Twin of operators/trainprep.py::fim_transform — same integer cut
# points, AR/PSM/SPM mode split, one divide at emit.
FIM_TRANSFORM = f"""
WITH f AS (
  SELECT source, doc_id // 20 AS m,
         CAST(len({TOKS}) AS BIGINT) AS n,
         CASE WHEN doc_id // 20 % 4 = 0 THEN 'ar'
              WHEN doc_id // 20 % 2 = 0 THEN 'psm' ELSE 'spm' END AS mode
  FROM documents
),
g AS (
  SELECT source, mode, n,
         CASE WHEN mode = 'ar' THEN n
              ELSE (n * (1 + m % 8)) // 10 END AS prefix_len,
         CASE WHEN mode = 'ar' THEN CAST(0 AS BIGINT)
              ELSE ((n - (n * (1 + m % 8)) // 10)
                    * (1 + m % 5)) // 6 END AS middle_len
  FROM f
)
SELECT source, mode,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(prefix_len) AS BIGINT) AS prefix_tokens,
       CAST(sum(middle_len) AS BIGINT) AS middle_tokens,
       CAST(sum(n - prefix_len - middle_len) AS BIGINT) AS suffix_tokens,
       round(avg(CASE WHEN n > 0
                      THEN CAST(middle_len AS DOUBLE) / CAST(n AS DOUBLE)
                      ELSE 0.0 END), 6) AS avg_middle_frac
FROM g GROUP BY 1, 2 ORDER BY 1, 2
"""


# Twin of operators/textstats.py::skiplist_audit — same s=16 / m=8
# integer level math (floor-div identity), same entry fold.
SKIPLIST_AUDIT = f"""
WITH tok AS (SELECT doc_id, {TOKS} AS toks FROM documents),
dfs AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM (
    SELECT DISTINCT doc_id, unnest(toks) AS term FROM tok
  ) GROUP BY term
),
sized AS (
  SELECT df,
         CASE WHEN df >= 16
              THEN 1 + (length(bin(df // 16)) - 1) // 3
              ELSE 0 END AS levels
  FROM dfs
),
e AS (
  SELECT df, levels,
         CASE WHEN levels > 0
              THEN coalesce(list_sum(list_transform(range(levels),
                     l -> df // (16 * (CAST(1 AS BIGINT) << (3 * l))))), 0)
              ELSE 0 END AS entries
  FROM sized
)
SELECT CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(CASE WHEN levels > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_skipped_terms,
       CAST(sum(levels) AS BIGINT) AS total_levels,
       CAST(max(levels) AS BIGINT) AS max_levels,
       CAST(sum(entries) AS BIGINT) AS total_entries,
       CAST(sum(entries) * 9 AS BIGINT) AS est_bytes,
       round(CAST(sum(entries) AS DOUBLE)
             / CAST(greatest(sum(CASE WHEN levels > 0 THEN 1 ELSE 0 END),
                             1) AS DOUBLE), 6)
         AS avg_entries_per_skipped
FROM e
"""


# Twin of operators/textstats.py::variable_width_histogram_agg —
# same value-atomic equal-depth bucket assignment over the
# distinct-value frame.
VARIABLE_WIDTH_HISTOGRAM = """
WITH vals AS (
  SELECT CAST(n_chars AS BIGINT) AS v, count(*) AS cnt
  FROM documents GROUP BY 1
),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vals),
b AS (
  SELECT v, cnt,
         (coalesce(sum(cnt) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          * 8) // total AS bucket
  FROM vals CROSS JOIN tot
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       min(v) AS min_val, max(v) AS max_val,
       CAST(sum(cnt) AS BIGINT) AS n_docs,
       round(sum(CAST(v AS DOUBLE) * CAST(cnt AS DOUBLE))
             / CAST(sum(cnt) AS DOUBLE), 6) AS avg_val
FROM b GROUP BY bucket ORDER BY bucket
"""


def intervals_unordered_sql(
    term_a: str, term_b: str, max_gaps: int = 4
) -> str:
    """Twin of operators/query.py::intervals_unordered_match — same
    |pa - pb| - 1 gap arithmetic over zipped position/term unnests."""
    a = term_a.replace("'", "''")
    b = term_b.replace("'", "''")
    return f"""
WITH tok AS (SELECT doc_id, {TOKS} AS toks FROM documents),
pos AS (
  SELECT doc_id, unnest(range(len(toks))) AS pos, unnest(toks) AS term
  FROM tok
),
pa AS (SELECT doc_id, pos AS pa FROM pos WHERE term = '{a}'),
pb AS (SELECT doc_id, pos AS pb FROM pos WHERE term = '{b}'),
pairs AS (
  SELECT pa.doc_id, abs(pa.pa - pb.pb) - 1 AS gap
  FROM pa JOIN pb ON pa.doc_id = pb.doc_id
)
SELECT doc_id, CAST(min(gap) AS BIGINT) AS min_gap,
       CAST(sum(CASE WHEN gap <= {max_gaps} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pairs_within
FROM pairs GROUP BY doc_id HAVING min(gap) <= {max_gaps}
ORDER BY doc_id
"""


def borda_fusion_sql(
    terms: list[str], k: int = 15, mu: float = 2000.0
) -> str:
    """Twin of operators/textstats.py::borda_fusion — same BM25/QL
    top-20 CTEs as combsum_hybrid_sql, ballots ranked over the
    rounded scores, integer points end-to-end."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH tokf AS (SELECT doc_id, unnest({TOKS}) AS term FROM documents),
dl AS (SELECT doc_id, count(*) AS doclen FROM tokf GROUP BY 1),
stats AS (
  SELECT count(*) AS n_docs,
         CAST(sum(doclen) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
  FROM dl
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tokf
  WHERE term IN ({inlist}) GROUP BY 1, 2
),
dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
bm_raw AS (
  SELECT tf.doc_id,
         sum(
           ln(1.0 + (CAST(st.n_docs AS DOUBLE) - d.df + 0.5)
              / (d.df + 0.5))
           * (tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doclen / st.avgdl))
              + 0.0)
         ) AS score
  FROM tf JOIN dfs d USING (term) JOIN dl USING (doc_id)
  CROSS JOIN stats st
  GROUP BY tf.doc_id ORDER BY score DESC, doc_id LIMIT 20
),
bm AS (SELECT doc_id, round(score, 6) AS score FROM bm_raw),
tot AS (SELECT CAST(sum(doclen) AS BIGINT) AS total_tokens FROM dl),
cf AS (
  SELECT term,
         {mu!r} * (CAST(count(*) AS DOUBLE)
                   / CAST(total_tokens AS DOUBLE)) AS p_mu
  FROM (SELECT doc_id, unnest({TOKS}) AS term FROM documents)
  CROSS JOIN tot
  WHERE term IN ({inlist}) GROUP BY term, total_tokens
),
constq AS (SELECT sum(ln(p_mu)) AS const_q, count(*) AS nq FROM cf),
matched AS (
  SELECT doc_id, sum(ln(1.0 + CAST(tf AS DOUBLE) / p_mu)) AS match_part
  FROM tf JOIN cf USING (term) GROUP BY doc_id
),
ql_raw AS (
  SELECT m.doc_id,
         const_q - CAST(nq AS DOUBLE)
                   * ln(CAST(doclen AS DOUBLE) + {mu!r})
                 + match_part AS score
  FROM matched m JOIN dl USING (doc_id) CROSS JOIN constq
  ORDER BY score DESC, doc_id LIMIT 20
),
ql AS (SELECT doc_id, round(score, 6) AS score FROM ql_raw),
pa AS (
  SELECT doc_id,
         20 - row_number() OVER (ORDER BY score DESC, doc_id) + 1 AS pa
  FROM bm
),
pb AS (
  SELECT doc_id,
         20 - row_number() OVER (ORDER BY score DESC, doc_id) + 1 AS pb
  FROM ql
),
fused AS (
  SELECT doc_id,
         coalesce(pa, 0) + coalesce(pb, 0) AS borda,
         (CASE WHEN pa IS NOT NULL THEN 1 ELSE 0 END
          + CASE WHEN pb IS NOT NULL THEN 1 ELSE 0 END) AS n_lists
  FROM pa FULL JOIN pb USING (doc_id)
)
SELECT doc_id, CAST(borda AS BIGINT) AS borda,
       CAST(n_lists AS BIGINT) AS n_lists
FROM fused ORDER BY borda DESC, n_lists DESC, doc_id LIMIT {k}
"""


def err_sql(
    queries: list[tuple[int, list[str], str]], k: int = 20
) -> str:
    """Twin of operators/query.py::err_eval — same graded judgments
    (least(tf, 3), gmax 3), same rank-ordered struct-accumulator
    left fold."""
    qrows = ", ".join(
        f"({qid}, '{t}')"
        for qid, ts, _ in queries
        for t in sorted(set(ts))
    )
    mrows = ", ".join(f"({qid}, '{m}')" for qid, _, m in queries)
    return f"""
WITH {_TOK_CTE},
q(query_id, term) AS (VALUES {qrows}),
m(query_id, marker) AS (VALUES {mrows}),
scored AS (
  SELECT q.query_id, p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN q ON p.term = q.term
  JOIN dfs d ON p.term = d.term
  JOIN tok t ON p.doc_id = t.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, p.doc_id
),
ranked AS (
  SELECT query_id, doc_id,
         row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC
         ) AS rank
  FROM scored
),
topk AS (SELECT * FROM ranked WHERE rank <= {k}),
grades AS (
  SELECT m.query_id, p.doc_id, least(p.tf, 3) AS g
  FROM post p JOIN m ON p.term = m.marker
),
judged AS (
  SELECT t.query_id, t.rank,
         (CAST((CAST(1 AS INT) << CAST(coalesce(g.g, 0) AS INT))
               AS DOUBLE) - 1.0) / 8.0 AS R
  FROM topk t
  LEFT JOIN grades g
    ON t.query_id = g.query_id AND t.doc_id = g.doc_id
),
folded AS (
  SELECT query_id,
         CAST(sum(CASE WHEN R > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_graded,
         list_reduce(
           list_prepend(
             struct_pack(e := CAST(0.0 AS DOUBLE),
                         p := CAST(1.0 AS DOUBLE),
                         rr := CAST(0.0 AS DOUBLE),
                         rs := CAST(0.0 AS DOUBLE)),
             list(struct_pack(e := CAST(0.0 AS DOUBLE),
                              p := CAST(0.0 AS DOUBLE),
                              rr := R / CAST(rank AS DOUBLE),
                              rs := R) ORDER BY rank)),
           (acc, x) -> struct_pack(e := acc.e + acc.p * x.rr,
                                   p := acc.p * (1.0 - x.rs),
                                   rr := x.rr, rs := x.rs)
         ).e AS err_raw
  FROM judged GROUP BY query_id
)
SELECT query_id, n_graded, round(err_raw, 6) AS err
FROM folded ORDER BY query_id
"""


# Twin of operators/webgraph.py::salsa_2iter — HITS_2ITER's structure
# with degree-normalized contributions (a/ideg to hubs, h/odeg to
# authorities), a0 == 1.0, max-normalize per half-step.
SALSA_2ITER = f"""
WITH {_GRAPH_CTE},
nodes AS (SELECT doc_id FROM documents),
odeg AS (
  SELECT src AS doc_id, CAST(count(*) AS DOUBLE) AS odeg
  FROM edges GROUP BY 1
),
ideg AS (
  SELECT dst AS doc_id, CAST(count(*) AS DOUBLE) AS ideg
  FROM edges GROUP BY 1
),
h1r AS (
  SELECT e.src AS doc_id,
         list_reduce(
           list_prepend(0.0, list(1.0 / i.ideg ORDER BY e.dst)),
           (x, y) -> x + y) AS hub
  FROM edges e JOIN ideg i ON i.doc_id = e.dst GROUP BY e.src
),
h1f AS (
  SELECT n.doc_id, coalesce(h.hub, CAST(0.0 AS DOUBLE)) AS hub
  FROM nodes n LEFT JOIN h1r h USING (doc_id)
),
h1 AS (SELECT doc_id, hub / (SELECT max(hub) FROM h1f) AS hub FROM h1f),
a1r AS (
  SELECT e.dst AS doc_id,
         list_reduce(
           list_prepend(0.0, list(h.hub / o.odeg ORDER BY e.src)),
           (x, y) -> x + y) AS auth
  FROM edges e JOIN h1 h ON h.doc_id = e.src
  JOIN odeg o ON o.doc_id = e.src GROUP BY e.dst
),
a1f AS (
  SELECT n.doc_id, coalesce(a.auth, CAST(0.0 AS DOUBLE)) AS auth
  FROM nodes n LEFT JOIN a1r a USING (doc_id)
),
a1 AS (SELECT doc_id, auth / (SELECT max(auth) FROM a1f) AS auth FROM a1f),
h2r AS (
  SELECT e.src AS doc_id,
         list_reduce(
           list_prepend(0.0, list(a.auth / i.ideg ORDER BY e.dst)),
           (x, y) -> x + y) AS hub
  FROM edges e JOIN a1 a ON a.doc_id = e.dst
  JOIN ideg i ON i.doc_id = e.dst GROUP BY e.src
),
h2f AS (
  SELECT n.doc_id, coalesce(h.hub, CAST(0.0 AS DOUBLE)) AS hub
  FROM nodes n LEFT JOIN h2r h USING (doc_id)
),
h2 AS (SELECT doc_id, hub / (SELECT max(hub) FROM h2f) AS hub FROM h2f),
a2r AS (
  SELECT e.dst AS doc_id,
         list_reduce(
           list_prepend(0.0, list(h.hub / o.odeg ORDER BY e.src)),
           (x, y) -> x + y) AS auth
  FROM edges e JOIN h2 h ON h.doc_id = e.src
  JOIN odeg o ON o.doc_id = e.src GROUP BY e.dst
),
a2f AS (
  SELECT n.doc_id, coalesce(a.auth, CAST(0.0 AS DOUBLE)) AS auth
  FROM nodes n LEFT JOIN a2r a USING (doc_id)
),
a2 AS (SELECT doc_id, auth / (SELECT max(auth) FROM a2f) AS auth FROM a2f)
SELECT a2.doc_id, round(a2.auth, 9) AS authority, round(h2.hub, 9) AS hub
FROM a2 JOIN h2 USING (doc_id)
ORDER BY authority DESC, hub DESC, doc_id ASC LIMIT 20
"""


def index_sort_audit_sql(
    terms: list[str], k: int = 10
) -> str:
    """Twin of operators/textstats.py::index_sort_audit — same
    (n_chars desc, doc_id) sort ordinal and k-th-match position."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH n_df AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
ranked AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id)
              AS BIGINT) AS sort_pos
  FROM documents
),
matched AS (
  SELECT DISTINCT m.term, m.doc_id, r.sort_pos FROM (
    SELECT doc_id, unnest({TOKS}) AS term FROM documents
  ) m JOIN ranked r USING (doc_id)
  WHERE m.term IN ({inlist})
),
kth AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df,
         max(CASE WHEN rn = {k} THEN sort_pos END) AS kth_pos
  FROM (
    SELECT term, sort_pos,
           row_number() OVER (PARTITION BY term ORDER BY sort_pos) AS rn
    FROM matched
  ) GROUP BY term
)
SELECT term, df,
       CAST(CASE WHEN df >= {k} THEN kth_pos ELSE n_docs END AS BIGINT)
         AS scanned_docs,
       n_docs,
       round(1.0 - CAST(CASE WHEN df >= {k} THEN kth_pos ELSE n_docs END
                        AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
         AS skip_ratio
FROM kth CROSS JOIN n_df ORDER BY term
"""


def symspell_sql(queries: list[str], top_n: int = 3) -> str:
    """Twin of operators/textstats.py::symspell_suggest — same
    1-delete key generation, levenshtein <= 1 verify, and
    (dist, cf desc, term) ranking."""
    qrows = ", ".join(
        "('" + q.replace("'", "''") + "')" for q in queries
    )
    dels = (
        "list_prepend({col}, list_transform(range(1, len({col}) + 1),"
        " i -> substr({col}, 1, i - 1)"
        " || substr({col}, i + 1, len({col}))))"
    )
    return f"""
WITH vocab AS (
  SELECT term, CAST(count(*) AS BIGINT) AS cf
  FROM (SELECT unnest({TOKS}) AS term FROM documents) GROUP BY term
),
tkeys AS (
  SELECT term, cf, unnest({dels.format(col='term')}) AS key FROM vocab
),
q(query) AS (VALUES {qrows}),
qkeys AS (
  SELECT query, unnest({dels.format(col='query')}) AS key FROM q
),
cand AS (
  SELECT DISTINCT query, term, cf FROM tkeys JOIN qkeys USING (key)
),
scored AS (
  SELECT query, term, cf,
         CAST(levenshtein(query, term) AS BIGINT) AS dist
  FROM cand WHERE levenshtein(query, term) <= 1
),
r AS (
  SELECT query, term, dist, cf,
         CAST(row_number() OVER (
           PARTITION BY query ORDER BY dist, cf DESC, term
         ) AS BIGINT) AS rank
  FROM scored
)
SELECT query, rank, term, dist, cf FROM r
WHERE rank <= {top_n} ORDER BY query, rank
"""


# Twin of operators/textstats.py::routing_skew_audit — same shared-hash
# shard assignment for both routing schemes.
ROUTING_SKEW_AUDIT = f"""
WITH by_id AS (
  SELECT 'id' AS scheme,
         CAST(((doc_id % {MOD} + 1) * {FP_MULT}) % {MOD} % 8 AS BIGINT)
           AS shard,
         doc_id AS rkey
  FROM documents
),
by_src AS (
  SELECT 'source' AS scheme,
         CAST(((CAST(substr(source, 4) AS BIGINT) % {MOD} + 1)
               * {FP_MULT}) % {MOD} % 8 AS BIGINT) AS shard,
         CAST(substr(source, 4) AS BIGINT) AS rkey
  FROM documents
),
u AS (SELECT * FROM by_id UNION ALL SELECT * FROM by_src)
SELECT scheme, shard, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT rkey) AS BIGINT) AS n_keys
FROM u GROUP BY 1, 2 ORDER BY 1, 2
"""


def trec_pool_sql(
    queries: list[tuple[int, list[str], str]], depth: int = 10
) -> str:
    """Twin of operators/query.py::trec_pool — same shared postings
    pass, BM25 b=0.75 vs b=0 system pair, top-depth pools."""
    qrows = ", ".join(
        f"({qid}, '{t}')"
        for qid, ts, _ in queries
        for t in sorted(set(ts))
    )
    return f"""
WITH {_TOK_CTE},
q(query_id, term) AS (VALUES {qrows}),
scored AS (
  SELECT q.query_id, p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score_a,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2))
         ) AS score_b
  FROM post p
  JOIN q ON p.term = q.term
  JOIN dfs d ON p.term = d.term
  JOIN tok t ON p.doc_id = t.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, p.doc_id
),
ta AS (
  SELECT query_id, doc_id FROM (
    SELECT query_id, doc_id, row_number() OVER (
      PARTITION BY query_id ORDER BY score_a DESC, doc_id) AS rn
    FROM scored
  ) WHERE rn <= {depth}
),
tb AS (
  SELECT query_id, doc_id FROM (
    SELECT query_id, doc_id, row_number() OVER (
      PARTITION BY query_id ORDER BY score_b DESC, doc_id) AS rn
    FROM scored
  ) WHERE rn <= {depth}
),
tagged AS (
  SELECT coalesce(a.query_id, b.query_id) AS query_id,
         CASE WHEN a.doc_id IS NOT NULL THEN 1 ELSE 0 END AS in_a,
         CASE WHEN b.doc_id IS NOT NULL THEN 1 ELSE 0 END AS in_b
  FROM ta a FULL JOIN tb b
    ON a.query_id = b.query_id AND a.doc_id = b.doc_id
)
SELECT query_id,
       CAST(count(*) AS BIGINT) AS pool_size,
       CAST(sum(in_a * in_b) AS BIGINT) AS n_overlap,
       CAST(sum(in_a * (1 - in_b)) AS BIGINT) AS n_only_a,
       CAST(sum(in_b * (1 - in_a)) AS BIGINT) AS n_only_b,
       round(CAST(sum(in_a * in_b) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS jaccard
FROM tagged GROUP BY query_id ORDER BY query_id
"""


def blockmax_tightness_sql(
    terms: list[str], block: int = 64
) -> str:
    """Twin of operators/textstats.py::blockmax_tightness — same
    frozen BM25 partial, doc_id div block blocks, one tightness
    divide."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH tokf AS (SELECT doc_id, unnest({TOKS}) AS term FROM documents),
dl AS (SELECT doc_id, count(*) AS doclen FROM tokf GROUP BY 1),
stats AS (
  SELECT count(*) AS n_docs,
         CAST(sum(doclen) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
  FROM dl
),
qtok AS (SELECT * FROM tokf WHERE term IN ({inlist})),
dfs AS (
  SELECT term, count(*) AS df FROM (
    SELECT DISTINCT term, doc_id FROM qtok
  ) GROUP BY 1
),
pb AS (
  SELECT term, doc_id // {block} AS blk,
         max(
           ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
              / (CAST(df AS DOUBLE) + 0.5))
           * (CAST(tf AS DOUBLE)
              / (CAST(tf AS DOUBLE)
                 + 1.2 * (0.25 + 0.75 * CAST(doclen AS DOUBLE) / avgdl)))
         ) AS bmax
  FROM (SELECT doc_id, term, count(*) AS tf FROM qtok GROUP BY 1, 2)
  JOIN dfs USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY 1, 2
),
g AS (SELECT term, max(bmax) AS gmax FROM pb GROUP BY 1),
tight AS (
  SELECT term, bmax / gmax AS tightness FROM pb JOIN g USING (term)
)
SELECT term, CAST(count(*) AS BIGINT) AS n_blocks,
       round(avg(tightness), 6) AS avg_tightness,
       round(min(tightness), 6) AS min_tightness,
       CAST(sum(CASE WHEN tightness < 0.5 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_prunable
FROM tight GROUP BY term ORDER BY term
"""


# Twin of operators/textstats.py::trending_events — same fixed
# boundary, add-one-smoothed rise ratio, thresholds on the ROUNDED
# ratio.
TRENDING_EVENTS = """
WITH agg AS (
  SELECT event_type,
         CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_early,
         CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                       THEN 0 ELSE 1 END) AS BIGINT) AS n_late
  FROM events GROUP BY 1
),
r AS (
  SELECT event_type, n_early, n_late,
         round((CAST(n_late AS DOUBLE) + 1.0)
               / (CAST(n_early AS DOUBLE) + 1.0), 6) AS rise
  FROM agg
)
SELECT event_type, n_early, n_late, rise,
       CASE WHEN rise >= 1.1 THEN 'rising'
            WHEN rise <= 0.9 THEN 'falling'
            ELSE 'flat' END AS trend
FROM r ORDER BY event_type
"""


# Twin of operators/trainprep.py::crawl_politeness_plan — same host
# derivation (url_features tld convention) and two-term makespan
# lower bound.
CRAWL_POLITENESS_PLAN = """
WITH per_host AS (
  SELECT source || '.'
           || ['com', 'org', 'net'][CAST(doc_id % 3 AS INT) + 1] AS host,
         count(*) AS n_urls
  FROM documents GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_hosts,
       CAST(sum(n_urls) AS BIGINT) AS total_urls,
       CAST(max(n_urls) AS BIGINT) AS max_host_urls,
       CAST(8 AS BIGINT) AS crawlers,
       CAST(greatest(max(n_urls), (sum(n_urls) + 7) // 8) AS BIGINT)
         AS lb_makespan_sec,
       round(CAST(max(n_urls) AS DOUBLE) * 8.0
             / CAST(sum(n_urls) AS DOUBLE), 6) AS imbalance
FROM per_host
"""


# Twin of operators/trainprep.py::temperature_mixture — same sqrt
# weights, sorted-fold total, largest-remainder apportionment.
TEMPERATURE_MIXTURE = """
WITH per_src AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
w AS (
  SELECT source, n_docs, sqrt(CAST(n_docs AS DOUBLE)) AS w FROM per_src
),
tot AS (
  SELECT list_reduce(list_prepend(0.0, list(w ORDER BY source)),
                     (x, y) -> x + y) AS tot_w
  FROM w
),
staged AS (
  SELECT source, n_docs, w, w * 200.0 / tot_w AS share,
         CAST(floor(w * 200.0 / tot_w) AS BIGINT) AS base
  FROM w CROSS JOIN tot
),
f AS (SELECT *, share - CAST(base AS DOUBLE) AS frac FROM staged),
rem AS (SELECT CAST(200 - sum(base) AS BIGINT) AS r FROM f),
rk AS (
  SELECT f.*, rem.r,
         row_number() OVER (ORDER BY frac DESC, source) AS rk
  FROM f CROSS JOIN rem
)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       round(w, 6) AS weight,
       CAST(base + CASE WHEN rk <= r THEN 1 ELSE 0 END AS BIGINT)
         AS alloc,
       round(share / 200.0, 6) AS share
FROM rk ORDER BY source
"""


# Twin of operators/textstats.py::term_burstiness — cf/df over the
# term dictionary, df >= 5, top-20.
TERM_BURSTINESS = f"""
WITH per AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df,
         CAST(sum(tf) AS BIGINT) AS cf FROM (
    SELECT doc_id, term, count(*) AS tf FROM (
      SELECT doc_id, unnest({TOKS}) AS term FROM documents
    ) GROUP BY 1, 2
  ) GROUP BY term
)
SELECT term, df, cf,
       round(CAST(cf AS DOUBLE) / CAST(df AS DOUBLE), 6) AS burstiness
FROM per WHERE df >= 5
ORDER BY burstiness DESC, term LIMIT 20
"""


def norms_quant_audit_sql(terms: list[str], k: int = 20) -> str:
    """Twin of operators/textstats.py::norms_quant_audit — same
    3-bit-mantissa encode/decode and dual-score postings pass."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH tokf AS (SELECT doc_id, unnest({TOKS}) AS term FROM documents),
dl AS (
  SELECT doc_id, doclen,
         CASE WHEN doclen < 8 THEN doclen
              ELSE (8 + (doclen >> (length(bin(doclen)) - 4)) % 8)
                   * (CAST(1 AS BIGINT) << (length(bin(doclen)) - 4))
              END AS dec
  FROM (SELECT doc_id, count(*) AS doclen FROM tokf GROUP BY 1)
),
stats AS (
  SELECT count(*) AS n_docs,
         CAST(sum(doclen) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl,
         round(avg(abs(CAST(doclen AS DOUBLE) - CAST(dec AS DOUBLE))
                   / CAST(doclen AS DOUBLE)), 6) AS avg_rel_err
  FROM dl
),
qtok AS (SELECT * FROM tokf WHERE term IN ({inlist})),
dfs AS (
  SELECT term, count(*) AS df FROM (
    SELECT DISTINCT term, doc_id FROM qtok
  ) GROUP BY 1
),
scored AS (
  SELECT doc_id,
         sum(
           ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
              / (CAST(df AS DOUBLE) + 0.5))
           * (CAST(tf AS DOUBLE)
              / (CAST(tf AS DOUBLE)
                 + 1.2 * (0.25 + 0.75 * CAST(doclen AS DOUBLE) / avgdl)))
         ) AS s_exact,
         sum(
           ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
              / (CAST(df AS DOUBLE) + 0.5))
           * (CAST(tf AS DOUBLE)
              / (CAST(tf AS DOUBLE)
                 + 1.2 * (0.25 + 0.75 * CAST(dec AS DOUBLE) / avgdl)))
         ) AS s_quant
  FROM (SELECT doc_id, term, count(*) AS tf FROM qtok GROUP BY 1, 2)
  JOIN dfs USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY doc_id
),
te AS (SELECT doc_id FROM scored ORDER BY s_exact DESC, doc_id LIMIT {k}),
tq AS (SELECT doc_id FROM scored ORDER BY s_quant DESC, doc_id LIMIT {k}),
ov AS (
  SELECT CAST(count(*) AS BIGINT) AS n_overlap FROM te JOIN tq USING (doc_id)
)
SELECT CAST({k} AS BIGINT) AS k, n_overlap,
       round(CAST(n_overlap AS DOUBLE) / {float(k)!r}, 6) AS overlap_ratio,
       avg_rel_err
FROM ov CROSS JOIN stats
"""


def stopword_prune_audit_sql(terms: list[str], k: int = 20) -> str:
    """Twin of operators/textstats.py::stopword_prune_audit — same
    df > n/2 stoplist, dual conditional score, postings pricing."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH tokf AS (SELECT doc_id, unnest({TOKS}) AS term FROM documents),
dl AS (SELECT doc_id, count(*) AS doclen FROM tokf GROUP BY 1),
stats AS (
  SELECT count(*) AS n_docs,
         CAST(sum(doclen) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
  FROM dl
),
qtok AS (SELECT * FROM tokf WHERE term IN ({inlist})),
dfs AS (
  SELECT term, count(*) AS df FROM (
    SELECT DISTINCT term, doc_id FROM qtok
  ) GROUP BY 1
),
j AS (
  SELECT doc_id,
         ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
            / (CAST(df AS DOUBLE) + 0.5))
         * (CAST(tf AS DOUBLE)
            / (CAST(tf AS DOUBLE)
               + 1.2 * (0.25 + 0.75 * CAST(doclen AS DOUBLE) / avgdl)))
           AS contrib,
         CAST(df AS DOUBLE) <= 0.5 * CAST(n_docs AS DOUBLE) AS keep
  FROM (SELECT doc_id, term, count(*) AS tf FROM qtok GROUP BY 1, 2)
  JOIN dfs USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
),
scored AS (
  SELECT doc_id, sum(contrib) AS s_full,
         sum(CASE WHEN keep THEN contrib ELSE 0.0 END) AS s_pruned,
         max(CASE WHEN keep THEN 1 ELSE 0 END) AS any_kept
  FROM j GROUP BY doc_id
),
tf_ AS (SELECT doc_id FROM scored ORDER BY s_full DESC, doc_id LIMIT {k}),
tp AS (
  SELECT doc_id FROM scored WHERE any_kept = 1
  ORDER BY s_pruned DESC, doc_id LIMIT {k}
),
ov AS (
  SELECT CAST(count(*) AS BIGINT) AS n_overlap
  FROM tf_ JOIN tp USING (doc_id)
),
scan AS (
  SELECT CAST(sum(df) AS BIGINT) AS postings_full,
         CAST(sum(CASE WHEN CAST(df AS DOUBLE)
                            <= 0.5 * CAST(n_docs AS DOUBLE)
                       THEN df ELSE 0 END) AS BIGINT) AS postings_pruned
  FROM dfs CROSS JOIN stats
)
SELECT CAST({k} AS BIGINT) AS k, n_overlap,
       round(CAST(n_overlap AS DOUBLE) / {float(k)!r}, 6) AS overlap_ratio,
       postings_full, postings_pruned,
       round(1.0 - CAST(postings_pruned AS DOUBLE)
             / CAST(postings_full AS DOUBLE), 6) AS scan_saved
FROM ov CROSS JOIN scan
"""


# Twin of operators/textstats.py::ilm_phase_plan — same day-age
# phases against the broadcast max date.
ILM_PHASE_PLAN = """
WITH mx AS (SELECT max(CAST(ts AS DATE)) AS mx FROM events),
aged AS (
  SELECT date_diff('day', CAST(ts AS DATE), mx) AS age_days
  FROM events CROSS JOIN mx
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS tot FROM events),
p AS (
  SELECT CASE WHEN age_days <= 7 THEN 'hot'
              WHEN age_days <= 21 THEN 'warm'
              ELSE 'cold' END AS phase,
         age_days
  FROM aged
)
SELECT phase, CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT age_days) AS BIGINT) AS n_days,
       CAST(min(age_days) AS BIGINT) AS min_age,
       CAST(max(age_days) AS BIGINT) AS max_age,
       round(CAST(count(*) AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS share
FROM p CROSS JOIN tot GROUP BY phase, tot ORDER BY min_age
"""


def bm25_prox_sql(terms: list[str], k: int = 15) -> str:
    """Twin of operators/textstats.py::bm25_prox_topk — same frozen
    BM25 leg plus 1/min_dist^2 pair bonuses, lambda 2.0."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    pair_sel = "\nUNION ALL\n".join(
        f"""SELECT pa.doc_id, min(abs(pa.pos - pb.pos)) AS md
  FROM (SELECT doc_id, pos FROM pos WHERE term = '{a}') pa
  JOIN (SELECT doc_id, pos FROM pos WHERE term = '{b}') pb
    ON pa.doc_id = pb.doc_id
  GROUP BY pa.doc_id"""
        for i, a in enumerate(uniq)
        for b in uniq[i + 1:]
    )
    return f"""
WITH tok AS (SELECT doc_id, {TOKS} AS toks FROM documents),
tokf AS (SELECT doc_id, unnest(toks) AS term FROM tok),
dl AS (SELECT doc_id, count(*) AS doclen FROM tokf GROUP BY 1),
stats AS (
  SELECT count(*) AS n_docs,
         CAST(sum(doclen) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
  FROM dl
),
qtok AS (SELECT * FROM tokf WHERE term IN ({inlist})),
dfs AS (
  SELECT term, count(*) AS df FROM (
    SELECT DISTINCT term, doc_id FROM qtok
  ) GROUP BY 1
),
bm AS (
  SELECT doc_id,
         sum(
           ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
              / (CAST(df AS DOUBLE) + 0.5))
           * (CAST(tf AS DOUBLE)
              / (CAST(tf AS DOUBLE)
                 + 1.2 * (0.25 + 0.75 * CAST(doclen AS DOUBLE) / avgdl)))
         ) AS bm25
  FROM (SELECT doc_id, term, count(*) AS tf FROM qtok GROUP BY 1, 2)
  JOIN dfs USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY doc_id
),
pos AS (
  SELECT doc_id, pos, term FROM (
    SELECT doc_id, unnest(range(len(toks))) AS pos,
           unnest(toks) AS term
    FROM tok
  ) WHERE term IN ({inlist})
),
pr AS (
{pair_sel}
),
bonus AS (
  SELECT doc_id,
         sum(1.0 / (CAST(md AS DOUBLE) * CAST(md AS DOUBLE))) AS prox
  FROM pr GROUP BY doc_id
)
SELECT doc_id,
       round(bm25 + 2.0 * coalesce(prox, 0.0), 6) AS score
FROM bm LEFT JOIN bonus USING (doc_id)
ORDER BY bm25 + 2.0 * coalesce(prox, 0.0) DESC, doc_id LIMIT {k}
"""


# Twin of operators/textstats.py::ip_range_agg — same Knuth-hash IPv4
# derivation and /2-prefix fixed ranges.
IP_RANGE_AGG = """
WITH staged AS (
  SELECT ((doc_id % 65536 + 1) * 2654435761) % 4294967296 AS ip_int,
         (((doc_id % 65536 + 1) * 2654435761) % 4294967296)
           // 16777216 AS o1
  FROM documents
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(bucket * 64 AS BIGINT) AS from_octet,
       CAST(bucket * 64 + 64 AS BIGINT) AS to_octet,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT ip_int) AS BIGINT) AS n_ips
FROM (SELECT o1 // 64 AS bucket, ip_int FROM staged)
GROUP BY bucket ORDER BY bucket
"""


# Twin of operators/textstats.py::counter_rate — same planted
# per-user sawtooth and reset-aware delta sum.
COUNTER_RATE = """
WITH staged AS (
  SELECT user_id, ts, event_id,
         (row_number() OVER (
            PARTITION BY user_id ORDER BY ts, event_id) % 17) * 3
           AS counter
  FROM events
),
lagged AS (
  SELECT CAST(ts AS DATE) AS day, counter,
         lag(counter) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM staged
)
SELECT CAST(day AS VARCHAR) AS day,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(sum(CASE WHEN prev IS NULL THEN 0
                     WHEN counter >= prev THEN counter - prev
                     ELSE counter END) AS BIGINT) AS increase,
       CAST(sum(CASE WHEN prev IS NOT NULL AND counter < prev
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_resets
FROM lagged GROUP BY day ORDER BY day
"""


def sdm_sql(terms: list[str], k: int = 15) -> str:
    """Twin of operators/textstats.py::sdm_topk — same unigram /
    ordered-#1 / unordered-#uw8 features, Dirichlet mu 2000, +0.5 cf
    floor, (0.85, 0.10, 0.05) weights."""
    q = list(terms)
    uniq = sorted(set(q))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    bi_sel = "\nUNION ALL\n".join(
        f"""SELECT doc_id, 'o:{a} {b}' AS feat, tf FROM (
  SELECT doc_id,
         CAST(CASE WHEN len(toks) >= 2
              THEN len(list_filter(range(1, len(toks)),
                   i -> toks[i] = '{a}' AND toks[i + 1] = '{b}'))
              ELSE 0 END AS BIGINT) AS tf
  FROM tok
) WHERE tf > 0"""
        for a, b in zip(q, q[1:])
    )
    uw_sel = "\nUNION ALL\n".join(
        f"""SELECT pa.doc_id, 'w:{a} {b}' AS feat,
       CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, pos FROM pos WHERE term = '{a}') pa
  JOIN (SELECT doc_id, pos FROM pos WHERE term = '{b}') pb
    ON pa.doc_id = pb.doc_id
  WHERE abs(pa.pos - pb.pos) < 8
  GROUP BY pa.doc_id"""
        for i, a in enumerate(uniq)
        for b in uniq[i + 1:]
    )
    wrows = "\nUNION ALL\n".join(
        [
            f"SELECT 'u:{t2}' AS feat, CAST(0.85 AS DOUBLE) AS w"
            for t2 in uniq
        ]
        + [
            f"SELECT 'o:{a} {b}', CAST(0.10 AS DOUBLE)"
            for a, b in zip(q, q[1:])
        ]
        + [
            f"SELECT 'w:{a} {b}', CAST(0.05 AS DOUBLE)"
            for i, a in enumerate(uniq)
            for b in uniq[i + 1:]
        ]
    )
    return f"""
WITH tok AS (SELECT doc_id, {TOKS} AS toks FROM documents),
tokf AS (SELECT doc_id, unnest(toks) AS term FROM tok),
dl AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS doclen
  FROM tokf GROUP BY 1
),
tot AS (SELECT CAST(sum(doclen) AS BIGINT) AS total_tokens FROM dl),
pos AS (
  SELECT doc_id, pos, term FROM (
    SELECT doc_id, unnest(range(len(toks))) AS pos,
           unnest(toks) AS term
    FROM tok
  ) WHERE term IN ({inlist})
),
uni AS (
  SELECT doc_id, 'u:' || term AS feat, CAST(count(*) AS BIGINT) AS tf
  FROM tokf WHERE term IN ({inlist}) GROUP BY 1, 2
),
feats_tf AS (
  SELECT * FROM uni
UNION ALL
{bi_sel}
UNION ALL
{uw_sel}
),
cf AS (
  SELECT feat, CAST(sum(tf) AS BIGINT) AS cf FROM feats_tf GROUP BY 1
),
wdf AS (
{wrows}
),
model AS (
  SELECT w.feat, w.w, coalesce(c.cf, 0) AS cf
  FROM wdf w LEFT JOIN cf c USING (feat)
),
cand AS (
  SELECT DISTINCT doc_id FROM tokf WHERE term IN ({inlist})
),
grid AS (
  SELECT c.doc_id, d.doclen, m.feat, m.w, m.cf, t.total_tokens, f.tf
  FROM cand c
  JOIN dl d USING (doc_id)
  CROSS JOIN model m
  CROSS JOIN tot t
  LEFT JOIN feats_tf f
    ON f.doc_id = c.doc_id AND f.feat = m.feat
),
scored AS (
  SELECT doc_id,
         sum(w * ln(
           (CAST(coalesce(tf, 0) AS DOUBLE)
            + 2000.0 * ((CAST(cf AS DOUBLE) + 0.5)
                        / CAST(total_tokens AS DOUBLE)))
           / (CAST(doclen AS DOUBLE) + 2000.0)
         )) AS score
  FROM grid GROUP BY doc_id
)
SELECT doc_id, round(score, 6) AS score
FROM scored ORDER BY score DESC, doc_id LIMIT {k}
"""


def kgram_wildcard_sql(
    pattern_grams: list[tuple[str, str, int]]
) -> str:
    """Twin of operators/textstats.py::kgram_wildcard — same
    boundary-bigram dictionary index, gram-intersection HAVING, and
    LIKE verify. ``pattern_grams`` = (pattern, gram, n_required)
    rows computed by the same python helper."""
    qrows = ", ".join(
        f"('{p}', '{g.replace(chr(39), chr(39) * 2)}', {n})"
        for p, g, n in pattern_grams
    )
    return f"""
WITH vocab AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM (
    SELECT DISTINCT doc_id, unnest({TOKS}) AS term FROM documents
  ) GROUP BY term
),
tg AS (
  SELECT term, df, unnest(list_distinct(list_transform(
    range(1, length('$' || term || '$')),
    i -> substr('$' || term || '$', i, 2)))) AS gram
  FROM vocab
),
q(pattern, gram, n_req) AS (VALUES {qrows}),
cand AS (
  SELECT pattern, term, df, n_req,
         count(DISTINCT gram) AS n_hit
  FROM tg JOIN q USING (gram) GROUP BY 1, 2, 3, 4
)
SELECT pattern, term, df FROM cand
WHERE n_hit = n_req AND term LIKE replace(pattern, '*', '%')
ORDER BY pattern, term
"""


# Twin of operators/textstats.py::langid_confusion — lang_id's marker
# prediction against the gold lang column.
LANGID_CONFUSION = f"""
WITH tok AS (SELECT doc_id, lang, {TOKS} AS toks FROM documents),
m AS (
  SELECT lang AS gold,
    CASE WHEN len(list_filter(toks,
            x -> list_contains(['the','a','of','and','is'], x)))
          > len(list_filter(toks,
            x -> list_contains(['der','die','das','und','ist'], x)))
         THEN 'en'
         WHEN len(list_filter(toks,
            x -> list_contains(['der','die','das','und','ist'], x)))
          > len(list_filter(toks,
            x -> list_contains(['the','a','of','and','is'], x)))
         THEN 'de'
         ELSE 'und' END AS pred
  FROM tok
),
cells AS (
  SELECT gold, pred, CAST(count(*) AS BIGINT) AS n_docs
  FROM m GROUP BY 1, 2
),
gt AS (
  SELECT gold, CAST(sum(n_docs) AS BIGINT) AS n_gold
  FROM cells GROUP BY 1
)
SELECT gold, pred, n_docs,
       round(CAST(n_docs AS DOUBLE) / CAST(n_gold AS DOUBLE), 6)
         AS share
FROM cells JOIN gt USING (gold) ORDER BY gold, pred
"""


def completion_context_sql(prefix: str = "s", k: int = 5) -> str:
    """Twin of operators/textstats.py::completion_context — per-lang
    prefix dictionary with in-context popularity ranking."""
    p = prefix.replace("'", "''")
    return f"""
WITH per AS (
  SELECT lang, term AS suggestion, CAST(count(*) AS BIGINT) AS weight
  FROM (SELECT lang, unnest({TOKS}) AS term FROM documents)
  WHERE term LIKE '{p}%' GROUP BY 1, 2
),
r AS (
  SELECT lang, suggestion, weight,
         CAST(row_number() OVER (
           PARTITION BY lang ORDER BY weight DESC, suggestion
         ) AS BIGINT) AS rank
  FROM per
)
SELECT lang, rank, suggestion, weight FROM r
WHERE rank <= {k} ORDER BY lang, rank
"""


def serp_clusters_sql(
    terms: list[str], k: int = 20, tau: float = 0.25
) -> str:
    """Twin of operators/textstats.py::serp_clusters — same BM25
    top-k, token-set Jaccard, highest-ranked-neighbor star attach."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH tok AS (SELECT doc_id, {TOKS} AS toks FROM documents),
tokf AS (SELECT doc_id, unnest(toks) AS term FROM tok),
dl AS (SELECT doc_id, count(*) AS doclen FROM tokf GROUP BY 1),
stats AS (
  SELECT count(*) AS n_docs,
         CAST(sum(doclen) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
  FROM dl
),
qtok AS (SELECT * FROM tokf WHERE term IN ({inlist})),
dfs AS (
  SELECT term, count(*) AS df FROM (
    SELECT DISTINCT term, doc_id FROM qtok
  ) GROUP BY 1
),
scored AS (
  SELECT doc_id,
         sum(
           ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
              / (CAST(df AS DOUBLE) + 0.5))
           * (CAST(tf AS DOUBLE)
              / (CAST(tf AS DOUBLE)
                 + 1.2 * (0.25 + 0.75 * CAST(doclen AS DOUBLE) / avgdl)))
         ) AS score
  FROM (SELECT doc_id, term, count(*) AS tf FROM qtok GROUP BY 1, 2)
  JOIN dfs USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY doc_id
),
top AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id)
              AS BIGINT) AS rank
  FROM (SELECT doc_id, score FROM scored
        ORDER BY score DESC, doc_id LIMIT {k})
),
sets AS (
  SELECT t2.doc_id, t2.rank, list_distinct(tok.toks) AS s
  FROM top t2 JOIN tok ON tok.doc_id = t2.doc_id
),
pairs AS (
  SELECT a.doc_id AS d_a, b.doc_id AS d_b, b.rank AS r_b,
         CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
           / CAST(len(list_distinct(list_concat(a.s, b.s)))
                  AS DOUBLE) AS j
  FROM sets a JOIN sets b ON b.rank < a.rank
),
best AS (
  SELECT d_a AS doc_id, d_b AS leader, round(j, 6) AS sim FROM (
    SELECT *, row_number() OVER (
      PARTITION BY d_a ORDER BY r_b) AS rn
    FROM pairs WHERE j >= {tau!r}
  ) WHERE rn = 1
)
SELECT s.doc_id, s.rank,
       coalesce(b.leader, s.doc_id) AS leader,
       coalesce(b.sim, 1.0) AS sim
FROM sets s LEFT JOIN best b USING (doc_id) ORDER BY s.rank
"""


def pivoted_length_audit_sql(
    queries: list[tuple[int, list[str], str]], depth: int = 50
) -> str:
    """Twin of operators/query.py::pivoted_length_audit — same
    value-atomic length deciles and retrieval-share ratio."""
    qrows = ", ".join(
        f"({qid}, '{t}')"
        for qid, ts, _ in queries
        for t in sorted(set(ts))
    )
    return f"""
WITH {_TOK_CTE},
q(query_id, term) AS (VALUES {qrows}),
vals AS (SELECT doclen, count(*) AS cnt FROM tok GROUP BY 1),
vtot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vals),
bkt AS (
  SELECT doclen,
         (coalesce(sum(cnt) OVER (ORDER BY doclen
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          * 10) // total AS bucket
  FROM vals CROSS JOIN vtot
),
scored AS (
  SELECT q.query_id, p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN q ON p.term = q.term
  JOIN dfs d ON p.term = d.term
  JOIN tok t ON p.doc_id = t.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, p.doc_id
),
topd AS (
  SELECT query_id, doc_id FROM (
    SELECT query_id, doc_id, row_number() OVER (
      PARTITION BY query_id ORDER BY score DESC, doc_id) AS rn
    FROM scored
  ) WHERE rn <= {depth}
),
retr AS (
  SELECT bucket, count(*) AS n_retrieved
  FROM topd JOIN tok USING (doc_id) JOIN bkt USING (doclen)
  GROUP BY 1
),
docs_b AS (
  SELECT bucket, count(*) AS n_docs
  FROM tok JOIN bkt USING (doclen) GROUP BY 1
),
td AS (SELECT CAST(sum(n_docs) AS DOUBLE) AS td FROM docs_b),
tr AS (SELECT CAST(sum(n_retrieved) AS DOUBLE) AS tr FROM retr)
SELECT CAST(b.bucket AS BIGINT) AS bucket,
       CAST(b.n_docs AS BIGINT) AS n_docs,
       CAST(coalesce(r.n_retrieved, 0) AS BIGINT) AS n_retrieved,
       round(CAST(b.n_docs AS DOUBLE) / td.td, 6) AS doc_share,
       round(CAST(coalesce(r.n_retrieved, 0) AS DOUBLE) / tr.tr, 6)
         AS retr_share,
       round((CAST(coalesce(r.n_retrieved, 0) AS DOUBLE) / tr.tr)
             / (CAST(b.n_docs AS DOUBLE) / td.td), 6) AS ratio
FROM docs_b b LEFT JOIN retr r USING (bucket)
CROSS JOIN td CROSS JOIN tr
ORDER BY bucket
"""


def qpp_postretrieval_sql(
    queries: list[tuple[int, list[str], str]], k: int = 20
) -> str:
    """Twin of operators/query.py::qpp_postretrieval — same WIG/NQC
    shapes over the shared BM25 score frame."""
    qrows = ", ".join(
        f"({qid}, '{t}')"
        for qid, ts, _ in queries
        for t in sorted(set(ts))
    )
    nrows = ", ".join(
        f"({qid}, {len(sorted(set(ts)))})" for qid, ts, _ in queries
    )
    return f"""
WITH {_TOK_CTE},
q(query_id, term) AS (VALUES {qrows}),
qn(query_id, nq) AS (VALUES {nrows}),
scored AS (
  SELECT q.query_id, p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN q ON p.term = q.term
  JOIN dfs d ON p.term = d.term
  JOIN tok t ON p.doc_id = t.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, p.doc_id
),
allstats AS (
  SELECT query_id, CAST(count(*) AS BIGINT) AS n_matched,
         avg(score) AS mu_all
  FROM scored GROUP BY 1
),
topk AS (
  SELECT query_id, score FROM (
    SELECT query_id, score, row_number() OVER (
      PARTITION BY query_id ORDER BY score DESC, doc_id) AS rn
    FROM scored
  ) WHERE rn <= {k}
),
kstats AS (
  SELECT query_id, avg(score) AS mu_k,
         avg(score * score) AS m2_k
  FROM topk GROUP BY 1
)
SELECT a.query_id, a.n_matched,
       round(k2.mu_k, 6) AS mu_k,
       round((k2.mu_k - a.mu_all) / sqrt(CAST(nq AS DOUBLE)), 6) AS wig,
       round(sqrt(k2.m2_k - k2.mu_k * k2.mu_k) / a.mu_all, 6) AS nqc
FROM allstats a JOIN kstats k2 USING (query_id) JOIN qn USING (query_id)
ORDER BY query_id
"""


def rerank_depth_audit_sql(
    terms: list[str],
    k: int = 10,
    depths: tuple[int, ...] = (10, 20, 50),
) -> str:
    """Twin of operators/textstats.py::rerank_depth_audit — same
    bm25/prox scored frame, oracle top-k, per-depth recall rows."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    pair_sel = "\nUNION ALL\n".join(
        f"""SELECT pa.doc_id, min(abs(pa.pos - pb.pos)) AS md
  FROM (SELECT doc_id, pos FROM pos WHERE term = '{a}') pa
  JOIN (SELECT doc_id, pos FROM pos WHERE term = '{b}') pb
    ON pa.doc_id = pb.doc_id
  GROUP BY pa.doc_id"""
        for i, a in enumerate(uniq)
        for b in uniq[i + 1:]
    )
    depth_ctes = ",\n".join(
        f"""r{r} AS (
  SELECT doc_id FROM (
    SELECT doc_id, final FROM scored
    ORDER BY bm25 DESC, doc_id LIMIT {r}
  ) ORDER BY final DESC, doc_id LIMIT {k}
)"""
        for r in depths
    )
    rows = "\nUNION ALL\n".join(
        f"""SELECT CAST({r} AS BIGINT) AS depth,
       CAST((SELECT count(*) FROM r{r} JOIN ok USING (doc_id))
            AS BIGINT) AS n_hit,
       round(CAST((SELECT count(*) FROM r{r} JOIN ok USING (doc_id))
                  AS DOUBLE) / {float(k)!r}, 6) AS recall"""
        for r in depths
    )
    return f"""
WITH tok AS (SELECT doc_id, {TOKS} AS toks FROM documents),
tokf AS (SELECT doc_id, unnest(toks) AS term FROM tok),
dl AS (SELECT doc_id, count(*) AS doclen FROM tokf GROUP BY 1),
stats AS (
  SELECT count(*) AS n_docs,
         CAST(sum(doclen) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
  FROM dl
),
qtok AS (SELECT * FROM tokf WHERE term IN ({inlist})),
dfs AS (
  SELECT term, count(*) AS df FROM (
    SELECT DISTINCT term, doc_id FROM qtok
  ) GROUP BY 1
),
bm AS (
  SELECT doc_id,
         sum(
           ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
              / (CAST(df AS DOUBLE) + 0.5))
           * (CAST(tf AS DOUBLE)
              / (CAST(tf AS DOUBLE)
                 + 1.2 * (0.25 + 0.75 * CAST(doclen AS DOUBLE) / avgdl)))
         ) AS bm25
  FROM (SELECT doc_id, term, count(*) AS tf FROM qtok GROUP BY 1, 2)
  JOIN dfs USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY doc_id
),
pos AS (
  SELECT doc_id, pos, term FROM (
    SELECT doc_id, unnest(range(len(toks))) AS pos,
           unnest(toks) AS term
    FROM tok
  ) WHERE term IN ({inlist})
),
pr AS (
{pair_sel}
),
bonus AS (
  SELECT doc_id,
         sum(1.0 / (CAST(md AS DOUBLE) * CAST(md AS DOUBLE))) AS prox
  FROM pr GROUP BY doc_id
),
scored AS (
  SELECT doc_id, bm25,
         bm25 + 2.0 * coalesce(prox, 0.0) AS final
  FROM bm LEFT JOIN bonus USING (doc_id)
),
ok AS (
  SELECT doc_id FROM scored ORDER BY final DESC, doc_id LIMIT {k}
),
{depth_ctes}
{rows}
ORDER BY depth
"""


# Twin of operators/textstats.py::event_bursts — same 2x-median
# hourly threshold and gaps-and-islands merge.
EVENT_BURSTS = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
),
med AS (SELECT quantile_cont(cnt, 0.5) AS med FROM hourly),
mn AS (SELECT min(hour) AS h0 FROM hourly),
flagged AS (
  SELECT hour, cnt, date_diff('hour', h0, hour) AS hidx
  FROM hourly CROSS JOIN med CROSS JOIN mn
  WHERE cnt > 2.0 * med
),
islands AS (
  SELECT hour, cnt,
         hidx - row_number() OVER (ORDER BY hidx) AS grp
  FROM flagged
)
SELECT CAST(min(hour) AS VARCHAR) AS start_hour,
       CAST(max(hour) AS VARCHAR) AS end_hour,
       CAST(count(*) AS BIGINT) AS n_hours,
       CAST(max(cnt) AS BIGINT) AS peak,
       CAST(sum(cnt) AS BIGINT) AS total
FROM islands GROUP BY grp ORDER BY start_hour
"""


# Twin of operators/similarity.py::embedding_qa — same fold-based
# norms and label-partition stats.
EMBEDDING_QA = """
WITH emb AS (
  SELECT label, len(embedding) AS dim,
         sqrt(list_dot_product(
           list_transform(embedding, x -> CAST(x AS DOUBLE)),
           list_transform(embedding, x -> CAST(x AS DOUBLE)))) AS nrm
  FROM embeddings
)
SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(max(dim) AS BIGINT) AS dim,
       round(avg(nrm), 6) AS mean_norm,
       round(min(nrm), 6) AS min_norm,
       round(max(nrm), 6) AS max_norm,
       CAST(sum(CASE WHEN abs(nrm - 1.0) > 0.01 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_unnormalized,
       CAST(sum(CASE WHEN nrm = 0.0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_zero
FROM emb GROUP BY label ORDER BY label
"""


def hard_negatives_sql(
    queries: list[tuple[int, list[str], str]], n_neg: int = 5
) -> str:
    """Twin of operators/query.py::hard_negatives — same shared BM25
    frame, marker anti-join, per-query negative ranking."""
    qrows = ", ".join(
        f"({qid}, '{t}')"
        for qid, ts, _ in queries
        for t in sorted(set(ts))
    )
    mrows = ", ".join(f"({qid}, '{m}')" for qid, _, m in queries)
    return f"""
WITH {_TOK_CTE},
q(query_id, term) AS (VALUES {qrows}),
m(query_id, marker) AS (VALUES {mrows}),
scored AS (
  SELECT q.query_id, p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN q ON p.term = q.term
  JOIN dfs d ON p.term = d.term
  JOIN tok t ON p.doc_id = t.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, p.doc_id
),
rel AS (
  SELECT DISTINCT m.query_id, p.doc_id
  FROM post p JOIN m ON p.term = m.marker
),
negs AS (
  SELECT s.query_id, s.doc_id, s.score FROM scored s
  LEFT JOIN rel r
    ON s.query_id = r.query_id AND s.doc_id = r.doc_id
  WHERE r.doc_id IS NULL
),
r2 AS (
  SELECT query_id, doc_id, score,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id
         ) AS BIGINT) AS neg_rank
  FROM negs
)
SELECT query_id, neg_rank, doc_id, round(score, 6) AS score
FROM r2 WHERE neg_rank <= {n_neg} ORDER BY query_id, neg_rank
"""


# Twin of operators/trainprep.py::recrawl_schedule — same planted
# source-dependent change rate and clamped 1/rate interval.
RECRAWL_SCHEDULE = """
WITH agg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_pages,
         CAST(sum(CASE WHEN (doc_id // 20) % (3 + doc_id % 20 % 4) = 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_changed
  FROM documents GROUP BY source
)
SELECT source, n_pages, n_changed,
       round(CAST(n_changed AS DOUBLE) / CAST(n_pages AS DOUBLE), 6)
         AS change_rate,
       CAST(greatest(1, least(30,
         CAST(floor(1.0 / (CAST(n_changed AS DOUBLE)
                           / CAST(n_pages AS DOUBLE))) AS BIGINT)))
         AS BIGINT) AS recrawl_days
FROM agg ORDER BY source
"""


def bm25_param_sweep_sql(
    queries: list[tuple[int, list[str], str]],
    k: int = 10,
    bs: tuple[float, ...] = (0.0, 0.375, 0.75, 1.0),
) -> str:
    """Twin of operators/textstats.py::bm25_param_sweep — same shared
    postings frame, per-b dyadic norm constants, integer P@k."""
    qrows = ", ".join(
        f"({qid}, '{t}')"
        for qid, ts, _ in queries
        for t in sorted(set(ts))
    )
    mrows = ", ".join(f"({qid}, '{m}')" for qid, _, m in queries)
    n_q = float(len(queries))
    blocks = []
    rows = []
    for i, b in enumerate(bs):
        blocks.append(f"""s_{i} AS (
  SELECT query_id, doc_id,
         sum(
           ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
              / (CAST(df AS DOUBLE) + 0.5))
           * (CAST(tf AS DOUBLE)
              / (CAST(tf AS DOUBLE)
                 + 1.2 * ({1.0 - b!r}
                          + {b!r} * CAST(doclen AS DOUBLE) / avgdl)))
         ) AS score
  FROM base GROUP BY 1, 2
),
t_{i} AS (
  SELECT query_id, doc_id FROM (
    SELECT query_id, doc_id, row_number() OVER (
      PARTITION BY query_id ORDER BY score DESC, doc_id) AS rn
    FROM s_{i}
  ) WHERE rn <= {k}
),
h_{i} AS (
  SELECT CAST(count(*) AS BIGINT) AS n_hits
  FROM t_{i} JOIN rel USING (query_id, doc_id)
)""")
        rows.append(f"""SELECT CAST({b!r} AS DOUBLE) AS b, n_hits,
       round(CAST(n_hits AS DOUBLE) / {n_q * k!r}, 6) AS mean_p_at_k
FROM h_{i}""")
    block_sql = ",\n".join(blocks)
    row_sql = "\nUNION ALL\n".join(rows)
    return f"""
WITH {_TOK_CTE},
q(query_id, term) AS (VALUES {qrows}),
m(query_id, marker) AS (VALUES {mrows}),
base AS (
  SELECT q.query_id, p.doc_id, p.tf, t.doclen, d.df, s.n_docs, s.avgdl
  FROM post p
  JOIN q ON p.term = q.term
  JOIN dfs d ON p.term = d.term
  JOIN tok t ON p.doc_id = t.doc_id
  CROSS JOIN stats s
),
rel AS (
  SELECT DISTINCT m.query_id, p.doc_id
  FROM post p JOIN m ON p.term = m.marker
),
{block_sql}
{row_sql}
ORDER BY b
"""


# Twin of operators/textstats.py::good_turing_mass — count-of-counts
# per source, guarded GT hapax probability.
GOOD_TURING_MASS = f"""
WITH per AS (
  SELECT source, term, count(*) AS cf FROM (
    SELECT source, unnest({TOKS}) AS term FROM documents
  ) GROUP BY 1, 2
),
g AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS v,
         CAST(sum(cf) AS BIGINT) AS n,
         CAST(sum(CASE WHEN cf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN cf = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
  FROM per GROUP BY source
)
SELECT source, v, n, n1, n2,
       round(CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS missing_mass,
       CASE WHEN n1 > 0
            THEN round((2.0 * CAST(n2 AS DOUBLE) / CAST(n1 AS DOUBLE))
                       / CAST(n AS DOUBLE), 6)
            ELSE 0.0 END AS p_hapax_gt
FROM g ORDER BY source
"""


def zscore_merge_sql(terms: list[str], k: int = 10) -> str:
    """Twin of operators/textstats.py::zscore_merge_audit — same
    shard-local BM25, population z-normalization, merged page with
    naive-merge agreement flags."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH tokf AS (
  SELECT CAST(doc_id % 4 AS INT) AS shard, doc_id,
         unnest({TOKS}) AS term
  FROM documents
),
dl AS (
  SELECT shard, doc_id, count(*) AS doclen FROM tokf GROUP BY 1, 2
),
stats AS (
  SELECT shard, count(*) AS n_docs,
         CAST(sum(doclen) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
  FROM dl GROUP BY 1
),
qtok AS (SELECT * FROM tokf WHERE term IN ({inlist})),
dfs AS (
  SELECT shard, term, count(*) AS df FROM (
    SELECT DISTINCT shard, term, doc_id FROM qtok
  ) GROUP BY 1, 2
),
scored AS (
  SELECT t2.shard, t2.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE)
                     + 0.5) / (CAST(d.df AS DOUBLE) + 0.5))
           * (CAST(t2.tf AS DOUBLE)
              / (CAST(t2.tf AS DOUBLE)
                 + 1.2 * (0.25 + 0.75 * CAST(l.doclen AS DOUBLE)
                          / s.avgdl)))
         ) AS s
  FROM (SELECT shard, doc_id, term, count(*) AS tf
        FROM qtok GROUP BY 1, 2, 3) t2
  JOIN dfs d ON t2.shard = d.shard AND t2.term = d.term
  JOIN dl l ON t2.shard = l.shard AND t2.doc_id = l.doc_id
  JOIN stats s ON t2.shard = s.shard
  GROUP BY t2.shard, t2.doc_id
),
local AS (
  SELECT shard, doc_id, s,
         CAST(row_number() OVER (
           PARTITION BY shard ORDER BY s DESC, doc_id
         ) AS BIGINT) AS local_rank
  FROM scored QUALIFY local_rank <= {k}
),
lstats AS (
  SELECT shard, avg(s) AS mu, avg(s * s) AS m2 FROM local GROUP BY 1
),
zed AS (
  SELECT l.shard, l.doc_id, l.s, l.local_rank,
         (l.s - t3.mu) / sqrt(t3.m2 - t3.mu * t3.mu) AS z
  FROM local l JOIN lstats t3 USING (shard)
),
merged AS (
  SELECT *, CAST(row_number() OVER (ORDER BY z DESC, doc_id)
                 AS BIGINT) AS rank
  FROM zed QUALIFY rank <= {k}
),
naive AS (
  SELECT doc_id, 1 AS in_naive
  FROM (SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id)
               AS rr FROM zed)
  WHERE rr <= {k}
)
SELECT m.rank, m.doc_id, CAST(m.shard AS BIGINT) AS shard,
       m.local_rank, round(m.z, 6) AS z,
       CAST(coalesce(n.in_naive, 0) AS BIGINT) AS n_raw_agree
FROM merged m LEFT JOIN naive n USING (doc_id)
ORDER BY m.rank
"""


# Twin of operators/textstats.py::pfor_audit — same gap arrays as the
# EF audit, exact order-statistic base width, patched exceptions.
PFOR_AUDIT = f"""
WITH post AS (
  SELECT term, doc_id FROM (
    SELECT doc_id, unnest({TOKS}) AS term FROM documents
  ) GROUP BY term, doc_id
),
per_term AS (
  SELECT term, list(doc_id ORDER BY doc_id) AS ids FROM post GROUP BY term
),
g AS (
  SELECT term, CAST(len(ids) AS BIGINT) AS df,
         list_transform(ids, (x, i) ->
           CASE WHEN i = 1 THEN x + 1 ELSE x - ids[i - 1] END) AS gaps
  FROM per_term
),
sized AS (
  SELECT term, df,
         CAST(list_reduce(list_prepend(0, list_transform(gaps, gg ->
           CASE WHEN gg < 128 THEN 1
                WHEN gg < 16384 THEN 2
                WHEN gg < 2097152 THEN 3
                WHEN gg < 268435456 THEN 4
                ELSE 5 END)), (x, y) -> x + y) AS BIGINT) AS vb,
         list_sort(list_transform(gaps, gg -> length(bin(gg)))) AS widths
  FROM g
),
p AS (
  SELECT df, vb,
         CAST(widths[CAST(ceil(0.9 * len(widths)) AS INT)] AS BIGINT)
           AS b,
         widths
  FROM sized
),
e AS (
  SELECT df, vb, b,
         CAST(len(list_filter(widths, w -> w > b)) AS BIGINT) AS exc
  FROM p
),
f AS (
  SELECT df, vb, exc, (df * b + 7) // 8 + 4 * exc AS pfor FROM e
)
SELECT CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(vb) AS BIGINT) AS varbyte_bytes,
       CAST(sum(pfor) AS BIGINT) AS pfor_bytes,
       CAST(sum(exc) AS BIGINT) AS n_exceptions,
       round(CAST(sum(pfor) AS DOUBLE) / CAST(sum(vb) AS DOUBLE), 6)
         AS pfor_to_varbyte,
       CAST(sum(CASE WHEN pfor < vb THEN 1 ELSE 0 END) AS BIGINT)
         AS pfor_wins
FROM f
"""


# Twin of operators/textstats.py::source_vocab_overlap — distinct-term
# Jaccard over source pairs, top-10.
SOURCE_VOCAB_OVERLAP = f"""
WITH sv AS (
  SELECT DISTINCT source, term FROM (
    SELECT source, unnest({TOKS}) AS term FROM documents
  )
),
sizes AS (SELECT source, count(*) AS v FROM sv GROUP BY 1),
inter AS (
  SELECT a.source AS src_a, b.source AS src_b, count(*) AS inter
  FROM sv a JOIN sv b USING (term)
  WHERE a.source < b.source
  GROUP BY 1, 2
)
SELECT src_a, src_b,
       CAST(sa.v AS BIGINT) AS v_a, CAST(sb.v AS BIGINT) AS v_b,
       CAST(inter AS BIGINT) AS n_common,
       round(CAST(inter AS DOUBLE)
             / CAST(sa.v + sb.v - inter AS DOUBLE), 6) AS jaccard
FROM inter
JOIN sizes sa ON src_a = sa.source
JOIN sizes sb ON src_b = sb.source
ORDER BY jaccard DESC, src_a, src_b LIMIT 10
"""


def judge_agreement_kappa_sql(
    queries: list[tuple[int, list[str], str]], k: int = 20
) -> str:
    """Twin of operators/textstats.py::judge_agreement_kappa — same
    tf>=1 vs tf>=2 judges over the BM25 page, same po/pe shapes."""
    qrows = ", ".join(
        f"({qid}, '{t}')"
        for qid, ts, _ in queries
        for t in sorted(set(ts))
    )
    mrows = ", ".join(f"({qid}, '{m}')" for qid, _, m in queries)
    kd = float(k)
    return f"""
WITH {_TOK_CTE},
q(query_id, term) AS (VALUES {qrows}),
m(query_id, marker) AS (VALUES {mrows}),
scored AS (
  SELECT q.query_id, p.doc_id,
         sum(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf / (p.tf + 1.2 * (0.25 + 0.75 * t.doclen / s.avgdl)))
         ) AS score
  FROM post p
  JOIN q ON p.term = q.term
  JOIN dfs d ON p.term = d.term
  JOIN tok t ON p.doc_id = t.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, p.doc_id
),
page AS (
  SELECT query_id, doc_id FROM (
    SELECT query_id, doc_id, row_number() OVER (
      PARTITION BY query_id ORDER BY score DESC, doc_id) AS rn
    FROM scored
  ) WHERE rn <= {k}
),
mtf AS (
  SELECT m.query_id, p.doc_id, CAST(p.tf AS BIGINT) AS mtf
  FROM post p JOIN m ON p.term = m.marker
),
judged AS (
  SELECT pg.query_id,
         CASE WHEN coalesce(mt.mtf, 0) >= 1 THEN 1 ELSE 0 END AS ja,
         CASE WHEN coalesce(mt.mtf, 0) >= 2 THEN 1 ELSE 0 END AS jb
  FROM page pg
  LEFT JOIN mtf mt
    ON pg.query_id = mt.query_id AND pg.doc_id = mt.doc_id
),
cells AS (
  SELECT query_id,
         CAST(sum(ja * jb) AS BIGINT) AS n_both,
         CAST(sum(ja * (1 - jb)) AS BIGINT) AS n_a_only,
         CAST(sum((1 - ja) * jb) AS BIGINT) AS n_b_only,
         CAST(sum((1 - ja) * (1 - jb)) AS BIGINT) AS n_neither
  FROM judged GROUP BY 1
),
rates AS (
  SELECT query_id, n_both, n_a_only, n_b_only, n_neither,
         CAST(n_both + n_neither AS DOUBLE) / {kd!r} AS po,
         (CAST(n_both + n_a_only AS DOUBLE) / {kd!r})
           * (CAST(n_both + n_b_only AS DOUBLE) / {kd!r})
         + (1.0 - CAST(n_both + n_a_only AS DOUBLE) / {kd!r})
           * (1.0 - CAST(n_both + n_b_only AS DOUBLE) / {kd!r}) AS pe
  FROM cells
)
SELECT query_id, n_both, n_a_only, n_b_only, n_neither,
       round(po, 6) AS po,
       round(CASE WHEN pe < 1.0 THEN (po - pe) / (1.0 - pe)
                  ELSE 1.0 END, 6) AS kappa
FROM rates ORDER BY query_id
"""


# Twin of operators/textstats.py::idf_negative_audit — classic
# Robertson idf over the term dictionary, one summary row.
IDF_NEGATIVE_AUDIT = f"""
WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
dfs AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM (
    SELECT DISTINCT doc_id, unnest({TOKS}) AS term FROM documents
  ) GROUP BY term
),
sized AS (
  SELECT df,
         ln((CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
            / (CAST(df AS DOUBLE) + 0.5)) AS idf_classic
  FROM dfs CROSS JOIN nn
)
SELECT CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(CASE WHEN idf_classic < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_negative,
       CAST(sum(CASE WHEN idf_classic < 0 THEN df ELSE 0 END) AS BIGINT)
         AS negative_postings,
       CAST(sum(df) AS BIGINT) AS total_postings,
       round(CAST(sum(CASE WHEN idf_classic < 0 THEN df ELSE 0 END)
                  AS DOUBLE) / CAST(sum(df) AS DOUBLE), 6)
         AS negative_share,
       round(min(idf_classic), 6) AS min_idf
FROM sized
"""


def countmin_audit_sql(probes: list[str]) -> str:
    """Twin of operators/textstats.py::countmin_audit — same 4x256
    md5-hex-pair sketch and min-over-rows estimate; probe buckets
    computed by the same python md5."""
    import hashlib

    uniq = sorted(set(probes))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    prows = ", ".join(
        f"('{t}', {j}, '{hashlib.md5(t.encode()).hexdigest()[2 * j:2 * j + 2]}')"
        for t in uniq
        for j in range(4)
    )
    return f"""
WITH tokf AS (SELECT unnest({TOKS}) AS term FROM documents),
cells AS (
  SELECT row, bucket, CAST(count(*) AS BIGINT) AS cnt FROM (
    SELECT 0 AS row, substr(md5(term), 1, 2) AS bucket FROM tokf
    UNION ALL SELECT 1, substr(md5(term), 3, 2) FROM tokf
    UNION ALL SELECT 2, substr(md5(term), 5, 2) FROM tokf
    UNION ALL SELECT 3, substr(md5(term), 7, 2) FROM tokf
  ) GROUP BY 1, 2
),
p(term, row, bucket) AS (VALUES {prows}),
est AS (
  SELECT term, CAST(min(cnt) AS BIGINT) AS cms_est
  FROM cells JOIN p USING (row, bucket) GROUP BY term
),
tc AS (
  SELECT term, CAST(count(*) AS BIGINT) AS true_cf
  FROM tokf WHERE term IN ({inlist}) GROUP BY 1
)
SELECT e.term,
       CAST(coalesce(tc.true_cf, 0) AS BIGINT) AS true_cf,
       e.cms_est,
       CAST(e.cms_est - coalesce(tc.true_cf, 0) AS BIGINT)
         AS overestimate
FROM est e LEFT JOIN tc ON e.term = tc.term ORDER BY e.term
"""


def nextword_index_plan_sql(k: int = 20) -> str:
    """Twin of operators/textstats.py::nextword_index_plan — same
    adjacency bigrams, decode-volume join, 5-byte/doc + 1/occurrence
    sizing constant."""
    return f"""
WITH tok AS (SELECT doc_id, {TOKS} AS toks FROM documents),
big AS (
  SELECT doc_id,
         unnest(CASE WHEN len(toks) >= 2
                THEN list_transform(range(1, len(toks)),
                       i -> toks[i] || ' ' || toks[i + 1])
                ELSE [] END) AS bigram
  FROM tok
),
per_doc AS (
  SELECT bigram, doc_id, count(*) AS n FROM big GROUP BY 1, 2
),
top AS (
  SELECT bigram, CAST(sum(n) AS BIGINT) AS n_pairs,
         CAST(count(*) AS BIGINT) AS df_pair
  FROM per_doc GROUP BY 1
  ORDER BY n_pairs DESC, bigram LIMIT {k}
),
post AS (
  SELECT doc_id, term, count(*) AS tf FROM (
    SELECT doc_id, unnest(toks) AS term FROM tok
  ) GROUP BY 1, 2
),
parts AS (
  SELECT bigram, string_split(bigram, ' ')[1] AS w1,
         string_split(bigram, ' ')[2] AS w2
  FROM top
),
cost AS (
  SELECT pd.bigram, CAST(sum(p1.tf + p2.tf) AS BIGINT)
           AS decode_positions
  FROM per_doc pd
  JOIN parts pa USING (bigram)
  JOIN post p1 ON p1.doc_id = pd.doc_id AND p1.term = pa.w1
  JOIN post p2 ON p2.doc_id = pd.doc_id AND p2.term = pa.w2
  GROUP BY 1
)
SELECT t2.bigram, t2.n_pairs, t2.df_pair, c.decode_positions,
       CAST(t2.df_pair * 5 + t2.n_pairs AS BIGINT) AS nw_bytes
FROM top t2 JOIN cost c USING (bigram)
ORDER BY t2.n_pairs DESC, t2.bigram
"""


def _bm25_block(
    name: str, terms_inlist: str, where: str = ""
) -> str:
    """Shared CTE block: frozen BM25 over a (possibly filtered)
    corpus with its OWN statistics; emits {name}_scored."""
    return f"""
{name}_tokf AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents {where}
),
{name}_dl AS (
  SELECT doc_id, count(*) AS doclen FROM {name}_tokf GROUP BY 1
),
{name}_stats AS (
  SELECT count(*) AS n_docs,
         CAST(sum(doclen) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
  FROM {name}_dl
),
{name}_qtok AS (
  SELECT * FROM {name}_tokf WHERE term IN ({terms_inlist})
),
{name}_dfs AS (
  SELECT term, count(*) AS df FROM (
    SELECT DISTINCT term, doc_id FROM {name}_qtok
  ) GROUP BY 1
),
{name}_scored AS (
  SELECT doc_id,
         sum(
           ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
              / (CAST(df AS DOUBLE) + 0.5))
           * (CAST(tf AS DOUBLE)
              / (CAST(tf AS DOUBLE)
                 + 1.2 * (0.25 + 0.75 * CAST(doclen AS DOUBLE) / avgdl)))
         ) AS score
  FROM (SELECT doc_id, term, count(*) AS tf FROM {name}_qtok
        GROUP BY 1, 2)
  JOIN {name}_dfs USING (term) JOIN {name}_dl USING (doc_id)
  CROSS JOIN {name}_stats
  GROUP BY doc_id
)"""


def generation_rank_drift_sql(terms: list[str], k: int = 15) -> str:
    """Twin of operators/textstats.py::generation_rank_drift — same
    tombstone predicate and refreshed-statistics re-rank."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH {_bm25_block('o', inlist)},
{_bm25_block('g', inlist, 'WHERE doc_id % 10 != 3')},
old AS (
  SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                      AS BIGINT) AS old_rank
  FROM (SELECT * FROM o_scored ORDER BY score DESC, doc_id LIMIT {k})
),
new AS (
  SELECT doc_id, score,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id)
              AS BIGINT) AS rank
  FROM (SELECT * FROM g_scored ORDER BY score DESC, doc_id LIMIT {k})
)
SELECT n.rank, n.doc_id, round(n.score, 6) AS score,
       CAST(coalesce(o2.old_rank, 0) AS BIGINT) AS old_rank,
       CAST(CASE WHEN coalesce(o2.old_rank, 0) != n.rank
                 THEN 1 ELSE 0 END AS BIGINT) AS moved
FROM new n LEFT JOIN old o2 USING (doc_id)
ORDER BY n.rank
"""


def post_filter_facets_sql(
    terms: list[str], selected: str = "en", k: int = 10
) -> str:
    """Twin of operators/textstats.py::post_filter_facets — facet
    counts over the unfiltered match set, page filtered."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    sel = selected.replace("'", "''")
    return f"""
WITH tokf AS (
  SELECT doc_id, lang, unnest({TOKS}) AS term FROM documents
),
dl AS (SELECT doc_id, count(*) AS doclen FROM tokf GROUP BY 1),
stats AS (
  SELECT count(*) AS n_docs,
         CAST(sum(doclen) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
  FROM dl
),
qtok AS (SELECT * FROM tokf WHERE term IN ({inlist})),
dfs AS (
  SELECT term, count(*) AS df FROM (
    SELECT DISTINCT term, doc_id FROM qtok
  ) GROUP BY 1
),
scored AS (
  SELECT doc_id, lang,
         sum(
           ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
              / (CAST(df AS DOUBLE) + 0.5))
           * (CAST(tf AS DOUBLE)
              / (CAST(tf AS DOUBLE)
                 + 1.2 * (0.25 + 0.75 * CAST(doclen AS DOUBLE) / avgdl)))
         ) AS score
  FROM (SELECT doc_id, lang, term, count(*) AS tf FROM qtok
        GROUP BY 1, 2, 3)
  JOIN dfs USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY doc_id, lang
),
facets AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_matched
  FROM scored GROUP BY 1
),
page AS (
  SELECT lang FROM scored WHERE lang = '{sel}'
  ORDER BY score DESC, doc_id LIMIT {k}
),
in_page AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_topk FROM page GROUP BY 1
)
SELECT f.lang, f.n_matched,
       CAST(CASE WHEN f.lang = '{sel}' THEN 1 ELSE 0 END AS BIGINT)
         AS selected,
       CAST(coalesce(p.n_topk, 0) AS BIGINT) AS n_topk
FROM facets f LEFT JOIN in_page p USING (lang)
ORDER BY f.lang
"""


def sampled_df_accuracy_sql(terms: list[str]) -> str:
    """Twin of operators/textstats.py::sampled_df_accuracy — 1-in-3
    systematic sample scaled by the inverse rate."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH tokf AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, unnest({TOKS}) AS term FROM documents
  ) WHERE term IN ({inlist})
),
exact AS (
  SELECT term, CAST(count(*) AS BIGINT) AS exact_df FROM (
    SELECT DISTINCT term, doc_id FROM tokf
  ) GROUP BY 1
),
sampled AS (
  SELECT term, CAST(count(*) AS BIGINT) AS sample_df FROM (
    SELECT DISTINCT term, doc_id FROM tokf WHERE doc_id % 3 = 0
  ) GROUP BY 1
)
SELECT e.term, e.exact_df,
       CAST(coalesce(s.sample_df, 0) AS BIGINT) AS sample_df,
       CAST(coalesce(s.sample_df, 0) * 3 AS BIGINT) AS est_df,
       round(abs(CAST(coalesce(s.sample_df, 0) AS DOUBLE) * 3.0
                 - CAST(e.exact_df AS DOUBLE))
             / CAST(e.exact_df AS DOUBLE), 6) AS rel_err
FROM exact e LEFT JOIN sampled s USING (term)
ORDER BY e.term
"""


def taat_accumulator_sql(terms: list[str], k: int = 10) -> str:
    """Twin of operators/textstats.py::taat_accumulator_audit — same
    rarest-first phases, (phase, doc_id) admission window, capped
    recall rows."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    kf = float(k)
    return f"""
WITH tokf AS (SELECT doc_id, unnest({TOKS}) AS term FROM documents),
dl AS (SELECT doc_id, count(*) AS doclen FROM tokf GROUP BY 1),
stats AS (
  SELECT count(*) AS n_docs,
         CAST(sum(doclen) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
  FROM dl
),
qtok AS (SELECT * FROM tokf WHERE term IN ({inlist})),
dfs AS (
  SELECT term, count(*) AS df FROM (
    SELECT DISTINCT term, doc_id FROM qtok
  ) GROUP BY 1
),
phases AS (
  SELECT term, df,
         CAST(row_number() OVER (ORDER BY df, term) AS BIGINT) AS phase
  FROM dfs
),
scored AS (
  SELECT doc_id,
         sum(
           ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
              / (CAST(df AS DOUBLE) + 0.5))
           * (CAST(tf AS DOUBLE)
              / (CAST(tf AS DOUBLE)
                 + 1.2 * (0.25 + 0.75 * CAST(doclen AS DOUBLE) / avgdl)))
         ) AS score,
         CAST(min(phase) AS BIGINT) AS first_phase
  FROM (SELECT doc_id, term, count(*) AS tf FROM qtok GROUP BY 1, 2)
  JOIN phases USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY doc_id
),
admitted AS (
  SELECT *, CAST(row_number() OVER (ORDER BY first_phase, doc_id)
                 AS BIGINT) AS adm
  FROM scored
),
exact AS (
  SELECT doc_id FROM scored ORDER BY score DESC, doc_id LIMIT {k}
),
c50 AS (
  SELECT doc_id FROM admitted WHERE adm <= 50
  ORDER BY score DESC, doc_id LIMIT {k}
),
n50 AS (
  SELECT CAST(count(*) AS BIGINT) AS n_acc FROM admitted
  WHERE adm <= 50
),
c100 AS (
  SELECT doc_id FROM admitted WHERE adm <= 100
  ORDER BY score DESC, doc_id LIMIT {k}
),
n100 AS (
  SELECT CAST(count(*) AS BIGINT) AS n_acc FROM admitted
  WHERE adm <= 100
),
c200 AS (
  SELECT doc_id FROM admitted WHERE adm <= 200
  ORDER BY score DESC, doc_id LIMIT {k}
),
n200 AS (
  SELECT CAST(count(*) AS BIGINT) AS n_acc FROM admitted
  WHERE adm <= 200
)
SELECT CAST(50 AS BIGINT) AS a_cap,
       (SELECT n_acc FROM n50) AS n_acc,
       CAST((SELECT count(*) FROM c50 JOIN exact USING (doc_id))
            AS BIGINT) AS n_hit,
       round(CAST((SELECT count(*) FROM c50 JOIN exact USING (doc_id))
                  AS DOUBLE) / {kf!r}, 6) AS recall
UNION ALL
SELECT CAST(100 AS BIGINT) AS a_cap,
       (SELECT n_acc FROM n100) AS n_acc,
       CAST((SELECT count(*) FROM c100 JOIN exact USING (doc_id))
            AS BIGINT) AS n_hit,
       round(CAST((SELECT count(*) FROM c100 JOIN exact USING (doc_id))
                  AS DOUBLE) / {kf!r}, 6) AS recall
UNION ALL
SELECT CAST(200 AS BIGINT) AS a_cap,
       (SELECT n_acc FROM n200) AS n_acc,
       CAST((SELECT count(*) FROM c200 JOIN exact USING (doc_id))
            AS BIGINT) AS n_hit,
       round(CAST((SELECT count(*) FROM c200 JOIN exact USING (doc_id))
                  AS DOUBLE) / {kf!r}, 6) AS recall
ORDER BY a_cap
"""


def jass_anytime_sql(terms: list[str], k: int = 10) -> str:
    """Twin of operators/textstats.py::jass_anytime_audit — same
    8-bit impacts, global (impact desc, term, doc_id) ordering,
    per-rho budget recall."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    kf = float(k)
    return f"""
WITH tokf AS (SELECT doc_id, unnest({TOKS}) AS term FROM documents),
dl AS (SELECT doc_id, count(*) AS doclen FROM tokf GROUP BY 1),
stats AS (
  SELECT count(*) AS n_docs,
         CAST(sum(doclen) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
  FROM dl
),
qtok AS (SELECT * FROM tokf WHERE term IN ({inlist})),
dfs AS (
  SELECT term, count(*) AS df FROM (
    SELECT DISTINCT term, doc_id FROM qtok
  ) GROUP BY 1
),
partials AS (
  SELECT doc_id, term,
         ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
            / (CAST(df AS DOUBLE) + 0.5))
         * (CAST(tf AS DOUBLE)
            / (CAST(tf AS DOUBLE)
               + 1.2 * (0.25 + 0.75 * CAST(doclen AS DOUBLE) / avgdl)))
           AS p
  FROM (SELECT doc_id, term, count(*) AS tf FROM qtok GROUP BY 1, 2)
  JOIN dfs USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
),
gmax AS (SELECT max(p) AS gmax FROM partials),
quant AS (
  SELECT doc_id, term, p,
         CAST(floor(p / gmax * 255.0) AS BIGINT) AS impact
  FROM partials CROSS JOIN gmax
),
ordered AS (
  SELECT *, CAST(row_number() OVER (
    ORDER BY impact DESC, term, doc_id) AS BIGINT) AS pos
  FROM quant
),
total AS (SELECT max(pos) AS total FROM ordered),
exact AS (
  SELECT doc_id FROM (
    SELECT doc_id, sum(p) AS s FROM partials GROUP BY 1
  ) ORDER BY s DESC, doc_id LIMIT {k}
),
sel0 AS (
  SELECT o.* FROM ordered o CROSS JOIN total t
  WHERE o.pos <= ceil(0.1 * t.total)
),
pg0 AS (
  SELECT doc_id FROM (
    SELECT doc_id, CAST(sum(impact) AS BIGINT) AS iscore
    FROM sel0 GROUP BY 1
  ) ORDER BY iscore DESC, doc_id LIMIT {k}
),
u0 AS (
  SELECT CAST(count(*) AS BIGINT) AS postings_used FROM sel0
),
sel1 AS (
  SELECT o.* FROM ordered o CROSS JOIN total t
  WHERE o.pos <= ceil(0.5 * t.total)
),
pg1 AS (
  SELECT doc_id FROM (
    SELECT doc_id, CAST(sum(impact) AS BIGINT) AS iscore
    FROM sel1 GROUP BY 1
  ) ORDER BY iscore DESC, doc_id LIMIT {k}
),
u1 AS (
  SELECT CAST(count(*) AS BIGINT) AS postings_used FROM sel1
),
sel2 AS (
  SELECT o.* FROM ordered o CROSS JOIN total t
  WHERE o.pos <= ceil(1.0 * t.total)
),
pg2 AS (
  SELECT doc_id FROM (
    SELECT doc_id, CAST(sum(impact) AS BIGINT) AS iscore
    FROM sel2 GROUP BY 1
  ) ORDER BY iscore DESC, doc_id LIMIT {k}
),
u2 AS (
  SELECT CAST(count(*) AS BIGINT) AS postings_used FROM sel2
)
SELECT CAST(0.1 AS DOUBLE) AS rho,
       (SELECT postings_used FROM u0) AS postings_used,
       CAST((SELECT count(*) FROM pg0 JOIN exact USING (doc_id))
            AS BIGINT) AS n_hit,
       round(CAST((SELECT count(*) FROM pg0 JOIN exact USING (doc_id))
                  AS DOUBLE) / {kf!r}, 6) AS recall
UNION ALL
SELECT CAST(0.5 AS DOUBLE) AS rho,
       (SELECT postings_used FROM u1) AS postings_used,
       CAST((SELECT count(*) FROM pg1 JOIN exact USING (doc_id))
            AS BIGINT) AS n_hit,
       round(CAST((SELECT count(*) FROM pg1 JOIN exact USING (doc_id))
                  AS DOUBLE) / {kf!r}, 6) AS recall
UNION ALL
SELECT CAST(1.0 AS DOUBLE) AS rho,
       (SELECT postings_used FROM u2) AS postings_used,
       CAST((SELECT count(*) FROM pg2 JOIN exact USING (doc_id))
            AS BIGINT) AS n_hit,
       round(CAST((SELECT count(*) FROM pg2 JOIN exact USING (doc_id))
                  AS DOUBLE) / {kf!r}, 6) AS recall
ORDER BY rho
"""


def proximity_histogram_sql(
    term_a: str = "merge", term_b: str = "group"
) -> str:
    """Twin of operators/textstats.py::proximity_histogram — same
    min-gap join and power-of-two ladder."""
    a = term_a.replace("'", "''")
    b = term_b.replace("'", "''")
    return f"""
WITH tok AS (SELECT doc_id, {TOKS} AS toks FROM documents),
pos AS (
  SELECT doc_id, unnest(range(len(toks))) AS pos, unnest(toks) AS term
  FROM tok
),
md AS (
  SELECT pa.doc_id,
         CAST(min(abs(pa.pos - pb.pos)) - 1 AS BIGINT) AS gap
  FROM (SELECT doc_id, pos FROM pos WHERE term = '{a}') pa
  JOIN (SELECT doc_id, pos FROM pos WHERE term = '{b}') pb
    ON pa.doc_id = pb.doc_id
  GROUP BY pa.doc_id
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS tot FROM md),
g AS (
  SELECT CASE WHEN gap <= 0 THEN '0'
              WHEN gap <= 1 THEN '1'
              WHEN gap <= 3 THEN '2-3'
              WHEN gap <= 7 THEN '4-7'
              WHEN gap <= 15 THEN '8-15'
              ELSE '16+' END AS bucket,
         gap
  FROM md
)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(gap) AS BIGINT) AS min_gap,
       CAST(max(gap) AS BIGINT) AS max_gap,
       round(CAST(count(*) AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS share
FROM g CROSS JOIN tot GROUP BY bucket, tot
ORDER BY min_gap
"""


# Twin of operators/textstats.py::query_reduction_audit — full query
# plus leave-one-out variants as query_ids over one postings pass.
QUERY_REDUCTION_AUDIT = f"""
WITH tokf AS (SELECT doc_id, unnest({TOKS}) AS term FROM documents),
dl AS (SELECT doc_id, count(*) AS doclen FROM tokf GROUP BY 1),
stats AS (
  SELECT count(*) AS n_docs,
         CAST(sum(doclen) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
  FROM dl
),
qtok AS (
  SELECT * FROM tokf
  WHERE term IN ('customer', 'merge', 'the', 'vector')
),
dfs AS (
  SELECT term, count(*) AS df FROM (
    SELECT DISTINCT term, doc_id FROM qtok
  ) GROUP BY 1
),
v(vid, term) AS (VALUES (0, 'customer'), (0, 'merge'), (0, 'the'), (0, 'vector'), (1, 'customer'), (1, 'merge'), (1, 'vector'), (2, 'customer'), (2, 'the'), (2, 'vector'), (3, 'customer'), (3, 'merge'), (3, 'the'), (4, 'merge'), (4, 'the'), (4, 'vector')),
lab(vid, terms) AS (VALUES (0, 'the,merge,vector,customer'), (1, 'merge,vector,customer'), (2, 'the,vector,customer'), (3, 'the,merge,customer'), (4, 'the,merge,vector')),
scored AS (
  SELECT v.vid, q2.doc_id,
         sum(
           ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
              / (CAST(df AS DOUBLE) + 0.5))
           * (CAST(tf AS DOUBLE)
              / (CAST(tf AS DOUBLE)
                 + 1.2 * (0.25 + 0.75 * CAST(doclen AS DOUBLE) / avgdl)))
         ) AS score
  FROM (SELECT doc_id, term, count(*) AS tf FROM qtok GROUP BY 1, 2) q2
  JOIN dfs USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  JOIN v ON v.term = q2.term
  GROUP BY v.vid, q2.doc_id
),
allstats AS (
  SELECT vid, CAST(count(*) AS BIGINT) AS n_matched,
         avg(score) AS mu_all
  FROM scored GROUP BY 1
),
topk AS (
  SELECT vid, doc_id, score FROM (
    SELECT vid, doc_id, score, row_number() OVER (
      PARTITION BY vid ORDER BY score DESC, doc_id) AS rn
    FROM scored
  ) WHERE rn <= 10
),
kstats AS (
  SELECT vid, avg(score) AS mu_k, avg(score * score) AS m2_k
  FROM topk GROUP BY 1
),
rel AS (
  SELECT DISTINCT doc_id FROM tokf WHERE term = 'group'
),
p10 AS (
  SELECT vid, CAST(count(*) AS BIGINT) AS n_rel_topk
  FROM topk JOIN rel USING (doc_id) GROUP BY 1
)
SELECT l.vid, l.terms, a.n_matched,
       round(sqrt(k2.m2_k - k2.mu_k * k2.mu_k) / a.mu_all, 6) AS nqc,
       CAST(coalesce(p.n_rel_topk, 0) AS BIGINT) AS n_rel_topk,
       round(CAST(coalesce(p.n_rel_topk, 0) AS DOUBLE) / 10.0, 6)
         AS p_at_k
FROM lab l JOIN allstats a USING (vid) JOIN kstats k2 USING (vid)
LEFT JOIN p10 p USING (vid)
ORDER BY l.vid
"""


def prior_mix_sql(terms: list[str], k: int = 15) -> str:
    """Twin of operators/textstats.py::prior_mix_audit — frozen BM25
    plus 0.3 * ln(1 + indeg) over the shared derived graph."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH {_GRAPH_CTE},
{_bm25_block('m', inlist)},
indeg AS (
  SELECT dst AS doc_id, CAST(count(*) AS BIGINT) AS indeg
  FROM edges GROUP BY 1
),
mixed AS (
  SELECT s.doc_id, s.score AS bm25,
         CAST(coalesce(i.indeg, 0) AS BIGINT) AS indeg,
         s.score + 0.3 * ln(1.0 + CAST(coalesce(i.indeg, 0) AS DOUBLE))
           AS mixed
  FROM m_scored s LEFT JOIN indeg i USING (doc_id)
),
plain AS (
  SELECT doc_id, CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id)
                      AS BIGINT) AS old_rank
  FROM (SELECT * FROM mixed ORDER BY bm25 DESC, doc_id LIMIT {k})
),
page AS (
  SELECT doc_id, mixed, indeg,
         CAST(row_number() OVER (ORDER BY mixed DESC, doc_id)
              AS BIGINT) AS rank
  FROM (SELECT * FROM mixed ORDER BY mixed DESC, doc_id LIMIT {k})
)
SELECT p.rank, p.doc_id, round(p.mixed, 6) AS score, p.indeg,
       CAST(coalesce(pl.old_rank, 0) AS BIGINT) AS old_rank
FROM page p LEFT JOIN plain pl USING (doc_id)
ORDER BY p.rank
"""


# Twin of operators/textstats.py::dedup_threshold_sweep — exact
# token-set Jaccard pairs, counted at three thresholds.
DEDUP_THRESHOLD_SWEEP = f"""
WITH dt AS (
  SELECT DISTINCT doc_id, term FROM (
    SELECT doc_id, unnest({TOKS}) AS term FROM documents
  )
),
sizes AS (SELECT doc_id, count(*) AS sz FROM dt GROUP BY 1),
inter AS (
  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
  FROM dt a JOIN dt b USING (term)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT da, db,
         CAST(inter AS DOUBLE)
           / CAST(sa.sz + sb.sz - inter AS DOUBLE) AS j
  FROM inter
  JOIN sizes sa ON da = sa.doc_id
  JOIN sizes sb ON db = sb.doc_id
)
SELECT CAST(0.5 AS DOUBLE) AS tau,
       CAST((SELECT count(*) FROM jac WHERE j >= 0.5) AS BIGINT)
         AS n_pairs,
       CAST((SELECT count(*) FROM (
         SELECT da AS d FROM jac WHERE j >= 0.5
         UNION SELECT db FROM jac WHERE j >= 0.5)) AS BIGINT)
         AS n_docs
UNION ALL
SELECT CAST(0.7 AS DOUBLE) AS tau,
       CAST((SELECT count(*) FROM jac WHERE j >= 0.7) AS BIGINT)
         AS n_pairs,
       CAST((SELECT count(*) FROM (
         SELECT da AS d FROM jac WHERE j >= 0.7
         UNION SELECT db FROM jac WHERE j >= 0.7)) AS BIGINT)
         AS n_docs
UNION ALL
SELECT CAST(0.9 AS DOUBLE) AS tau,
       CAST((SELECT count(*) FROM jac WHERE j >= 0.9) AS BIGINT)
         AS n_pairs,
       CAST((SELECT count(*) FROM (
         SELECT da AS d FROM jac WHERE j >= 0.9
         UNION SELECT db FROM jac WHERE j >= 0.9)) AS BIGINT)
         AS n_docs
ORDER BY tau
"""


def partitioning_cost_sql(
    terms: list[str], n_shards: int = 4
) -> str:
    """Twin of operators/textstats.py::partitioning_cost_audit —
    distinct matched rows per shard, one summary row."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH qtok AS (
  SELECT DISTINCT CAST(doc_id % {n_shards} AS INT) AS shard,
         term, doc_id
  FROM (SELECT doc_id, unnest({TOKS}) AS term FROM documents)
  WHERE term IN ({inlist})
),
per_shard AS (
  SELECT shard, CAST(count(*) AS BIGINT) AS rows_ FROM qtok GROUP BY 1
)
SELECT CAST({n_shards} AS BIGINT) AS n_shards,
       CAST(sum(rows_) AS BIGINT) AS termp_network_rows,
       CAST(max(rows_) AS BIGINT) AS docp_max_shard_rows,
       CAST(min(rows_) AS BIGINT) AS docp_min_shard_rows,
       round(CAST(max(rows_) AS DOUBLE) * {float(n_shards)!r}
             / CAST(sum(rows_) AS DOUBLE), 6) AS docp_imbalance
FROM per_shard
"""


# Twin of operators/textstats.py::hybrid_codec_assignment — the
# three sibling codec formulas computed per term, argmin summary.
HYBRID_CODEC_ASSIGNMENT = f"""
WITH post AS (
  SELECT term, doc_id FROM (
    SELECT doc_id, unnest({TOKS}) AS term FROM documents
  ) GROUP BY term, doc_id
),
u AS (SELECT max(doc_id) + 1 AS u FROM post),
per_term AS (
  SELECT term, list(doc_id ORDER BY doc_id) AS ids FROM post GROUP BY term
),
g AS (
  SELECT term, CAST(len(ids) AS BIGINT) AS df,
         list_transform(ids, (x, i) ->
           CASE WHEN i = 1 THEN x + 1 ELSE x - ids[i - 1] END) AS gaps
  FROM per_term
),
sized AS (
  SELECT term, df,
         CAST(list_reduce(list_prepend(0, list_transform(gaps, gg ->
           CASE WHEN gg < 128 THEN 1
                WHEN gg < 16384 THEN 2
                WHEN gg < 2097152 THEN 3
                WHEN gg < 268435456 THEN 4
                ELSE 5 END)), (x, y) -> x + y) AS BIGINT) AS vb,
         greatest(0, length(bin(u.u // df)) - 1) AS l,
         list_sort(list_transform(gaps, gg -> length(bin(gg)))) AS widths
  FROM g CROSS JOIN u
),
costed AS (
  SELECT term, df, vb,
         (df * l + df + (SELECT u FROM u)
            // (CAST(1 AS BIGINT) << l) + 1 + 7) // 8 AS eb,
         (df * CAST(widths[CAST(ceil(0.9 * len(widths)) AS INT)]
                    AS BIGINT) + 7) // 8
           + 4 * CAST(len(list_filter(widths, w ->
               w > widths[CAST(ceil(0.9 * len(widths)) AS INT)]))
               AS BIGINT) AS pf
  FROM sized
),
best AS (SELECT *, least(vb, eb, pf) AS best FROM costed)
SELECT CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(CASE WHEN best = vb THEN 1 ELSE 0 END) AS BIGINT)
         AS varbyte_wins,
       CAST(sum(CASE WHEN best = eb AND eb < vb THEN 1 ELSE 0 END)
            AS BIGINT) AS ef_wins,
       CAST(sum(CASE WHEN best = pf AND pf < vb AND pf < eb
                     THEN 1 ELSE 0 END) AS BIGINT) AS pfor_wins,
       CAST(sum(vb) AS BIGINT) AS varbyte_total,
       CAST(sum(eb) AS BIGINT) AS ef_total,
       CAST(sum(pf) AS BIGINT) AS pfor_total,
       CAST(sum(best) AS BIGINT) AS hybrid_total,
       round(1.0 - CAST(sum(best) AS DOUBLE)
             / CAST(least(sum(vb), sum(eb), sum(pf)) AS DOUBLE), 6)
         AS hybrid_saving
FROM best
"""


def blockmax_metadata_sql(block: int = 64) -> str:
    """Twin of operators/textstats.py::blockmax_metadata_overhead —
    distinct block count per term, 6 bytes/block, varbyte base."""
    return f"""
WITH post AS (
  SELECT term, doc_id FROM (
    SELECT doc_id, unnest({TOKS}) AS term FROM documents
  ) GROUP BY term, doc_id
),
per_term AS (
  SELECT term, list(doc_id ORDER BY doc_id) AS ids FROM post GROUP BY term
),
g AS (
  SELECT term,
         CAST(len(list_distinct(list_transform(ids,
              x -> x // {block}))) AS BIGINT) AS n_blocks,
         list_transform(ids, (x, i) ->
           CASE WHEN i = 1 THEN x + 1 ELSE x - ids[i - 1] END) AS gaps
  FROM per_term
),
sized AS (
  SELECT term, n_blocks,
         CAST(list_reduce(list_prepend(0, list_transform(gaps, gg ->
           CASE WHEN gg < 128 THEN 1
                WHEN gg < 16384 THEN 2
                WHEN gg < 2097152 THEN 3
                WHEN gg < 268435456 THEN 4
                ELSE 5 END)), (x, y) -> x + y) AS BIGINT) AS vb
  FROM g
)
SELECT CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(n_blocks) AS BIGINT) AS total_blocks,
       CAST(sum(n_blocks) * 6 AS BIGINT) AS metadata_bytes,
       CAST(sum(vb) AS BIGINT) AS postings_bytes,
       round(CAST(sum(n_blocks) AS DOUBLE) * 6.0
             / CAST(sum(vb) AS DOUBLE), 6) AS overhead_ratio
FROM sized
"""


# Twin of operators/similarity.py::knn_label_purity — same fold-based
# cosine, label-share purity over exact top-k.
KNN_LABEL_PURITY = """
WITH emb AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, label AS qlabel, v AS qv
  FROM emb WHERE vec_id < 5
),
c AS (SELECT vec_id, label, v FROM emb WHERE vec_id >= 5),
scored AS (
  SELECT q.query_id, q.qlabel, c.vec_id, c.label,
         list_dot_product(q.qv, c.v)
           / (sqrt(list_dot_product(q.qv, q.qv))
              * sqrt(list_dot_product(c.v, c.v))) AS cosine
  FROM c CROSS JOIN q
),
topk AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
    FROM scored
  ) WHERE rank <= 10
)
SELECT query_id, CAST(qlabel AS BIGINT) AS qlabel,
       CAST(sum(CASE WHEN label = qlabel THEN 1 ELSE 0 END) AS BIGINT)
         AS n_same,
       round(CAST(sum(CASE WHEN label = qlabel THEN 1 ELSE 0 END)
                  AS DOUBLE) / 10.0, 6) AS purity
FROM topk GROUP BY query_id, qlabel ORDER BY query_id
"""


def term_position_bias_sql(terms: list[str]) -> str:
    """Twin of operators/textstats.py::term_position_bias — same
    relative positions and interpolated median."""
    uniq = sorted(set(terms))
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH tok AS (SELECT doc_id, {TOKS} AS toks FROM documents),
pos AS (
  SELECT term, CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) AS rel FROM (
    SELECT doc_id, len(toks) AS n,
           unnest(range(len(toks))) AS pos, unnest(toks) AS term
    FROM tok
  ) WHERE term IN ({inlist})
)
SELECT term, CAST(count(*) AS BIGINT) AS n_occ,
       round(avg(rel), 6) AS mean_rel_pos,
       round(quantile_cont(rel, 0.5), 6) AS median_rel_pos,
       round(CAST(sum(CASE WHEN rel < 0.1 THEN 1 ELSE 0 END)
                  AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
         AS first_decile_share
FROM pos GROUP BY term ORDER BY term
"""


# Twin of operators/textstats.py::heaps_extrapolation — two-point
# prefix fit, full-corpus prediction, one row.
HEAPS_EXTRAPOLATION = f"""
WITH mx AS (SELECT max(doc_id) AS mx FROM documents),
tok AS (SELECT doc_id, unnest({TOKS}) AS term FROM documents),
q1 AS (
  SELECT CAST(count(DISTINCT term) AS BIGINT) AS v1,
         CAST(count(*) AS BIGINT) AS t1
  FROM tok CROSS JOIN mx WHERE doc_id * 4 <= mx
),
q2 AS (
  SELECT CAST(count(DISTINCT term) AS BIGINT) AS v2,
         CAST(count(*) AS BIGINT) AS t2
  FROM tok CROSS JOIN mx WHERE doc_id * 2 <= mx
),
fu AS (
  SELECT CAST(count(DISTINCT term) AS BIGINT) AS v_true,
         CAST(count(*) AS BIGINT) AS t_full
  FROM tok CROSS JOIN mx WHERE doc_id * 1 <= mx * 1
),
f AS (
  SELECT t1, v1, t2, v2, t_full, v_true,
         ln(CAST(v2 AS DOUBLE) / CAST(v1 AS DOUBLE))
           / ln(CAST(t2 AS DOUBLE) / CAST(t1 AS DOUBLE)) AS beta
  FROM q1 CROSS JOIN q2 CROSS JOIN fu
),
g AS (
  SELECT *, CAST(v1 AS DOUBLE) / power(CAST(t1 AS DOUBLE), beta) AS k
  FROM f
),
h AS (
  SELECT *, k * power(CAST(t_full AS DOUBLE), beta) AS v_pred FROM g
)
SELECT t1, v1, t2, v2, t_full, v_true,
       round(beta, 6) AS beta, round(k, 6) AS k,
       round(v_pred, 6) AS v_pred,
       round(abs(v_pred - CAST(v_true AS DOUBLE))
             / CAST(v_true AS DOUBLE), 6) AS rel_err
FROM h
"""
