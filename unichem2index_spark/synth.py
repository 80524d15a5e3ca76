"""Deterministic synthetic data generators (FIXTURES.md; seed=42, no
external data).

* :func:`gen_webtext`   — the BASELINE.json input_hint table
  (url, warc_ts, html, text, lang); html is constructed so that
  ``extract_text(html) == text`` byte-identically per url.
* :func:`gen_queries`   — the frozen reference query set for rank-identity
  checks (FIXTURES.md §2).
* :func:`gen_layered_keys` — synthetic layered keys exercising the F1-F5
  splitter incl. multi-component and multiplier cases.
"""

from __future__ import annotations

import datetime as dt
import html as _html
import random

VOCAB = [
    # Zipf-ish vocabulary mirroring /root/testdata documents style, with
    # stopword-class heavy terms first (skew / WAND pruning exercise).
    "the", "a", "data", "row", "table", "scan", "join", "sort", "merge",
    "group", "agg", "filter", "window", "hash", "key", "order", "batch",
    "stream", "spark", "query", "column", "value", "part", "line", "customer",
    "small", "big", "fast", "slow", "vector", "dup",
]

LANGS = ["en", "de", "es", "fr", "zh"]


def _zipf_weights(n: int, s: float = 1.1) -> list[float]:
    return [1.0 / (i + 1) ** s for i in range(n)]


def gen_webtext(n: int, seed: int = 42) -> list[dict]:
    """Deterministic Common-Crawl-style rows (FIXTURES.md §1)."""
    rng = random.Random(seed)
    weights = _zipf_weights(len(VOCAB))
    base_ts = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    rows = []
    for i in range(n):
        doclen = max(5, min(500, int(rng.lognormvariate(3.3, 0.8))))
        toks = rng.choices(VOCAB, weights=weights, k=doclen)
        text = " ".join(toks)
        if i % 7 == 0:
            # Exercise entity escaping + angle brackets in the extractor.
            text += " r&d <odd & ends>"
        rows.append(
            {
                "url": f"https://site{i % 997}.example/page/{i}",
                "warc_ts": base_ts
                + dt.timedelta(days=i % 365, seconds=i % 86400),
                "html": render_html(text, i),
                "text": text,
                "lang": LANGS[i % len(LANGS)],
            }
        )
    return rows


def render_html(text: str, i: int) -> bytes:
    """Wrap text in an HTML template whose extraction equals ``text``.

    Splits the body across two <p> tags at a whitespace boundary and adds
    script/style/comment noise so the extractor has real work to do.
    """
    esc = _html.escape(text)
    words = esc.split(" ")
    cut = len(words) // 2
    p1, p2 = " ".join(words[:cut]), " ".join(words[cut:])
    body = f"<p>{p1}</p>\n  <p>{p2}</p>" if p1 and p2 else f"<p>{esc}</p>"
    return (
        "<html><head>"
        f"<title>page {i}</title>"
        "<script type='text/javascript'>var x = 1 < 2;</script>"
        "<style>.c { color: red; }</style>"
        "</head>\n<body class='doc'>"
        "<!-- generated fixture -->"
        f"{body}"
        "</body></html>"
    ).encode("utf-8")


def gen_webtext_row(i: int, seed: int = 42) -> dict:
    """One deterministic row keyed by (seed, i) — per-row RNG, so any
    worker can generate any slice independently (embarrassingly parallel,
    unlike :func:`gen_webtext`'s sequential stream)."""
    rng = random.Random(seed * 0x9E3779B1 + i)
    weights = _zipf_weights(len(VOCAB))
    base_ts = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    doclen = max(5, min(500, int(rng.lognormvariate(3.3, 0.8))))
    text = " ".join(rng.choices(VOCAB, weights=weights, k=doclen))
    if i % 7 == 0:
        text += " r&d <odd & ends>"
    return {
        "url": f"https://site{i % 9973}.example/page/{i}",
        "warc_ts": base_ts + dt.timedelta(days=i % 365, seconds=i % 86400),
        "html": render_html(text, i),
        "text": text,
        "lang": LANGS[i % len(LANGS)],
    }


def gen_webtext_dist(spark, n: int, seed: int = 42, num_partitions: int = 32):
    """Distributed deterministic webtext DataFrame (bench/scaling corpus).

    ``spark.range`` partitions the id space; each task materializes its own
    rows via :func:`gen_webtext_row` — generation itself scales with the
    cluster, no driver-side list.
    """
    import pandas as pd

    from unichem2index_spark.schemas import WEBTEXT_SCHEMA

    def make(batches):
        for pdf in batches:
            rows = [gen_webtext_row(int(i), seed) for i in pdf["id"]]
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return (
        spark.range(0, n, numPartitions=num_partitions)
        .mapInPandas(make, WEBTEXT_SCHEMA)
    )


def gen_queries(n: int = 30, seed: int = 42) -> list[dict]:
    """Frozen reference query set (FIXTURES.md §2): 1-5 terms each, mixing
    rare, mid-df and >=1 heavy stopword-class term; k in {1, 10, 100}."""
    rng = random.Random(seed)
    heavy, mid, rare = VOCAB[:3], VOCAB[3:15], VOCAB[15:]
    out = []
    for qid in range(n):
        n_terms = rng.randint(1, 5)
        terms = [rng.choice(heavy)]
        pool = mid + rare
        terms += rng.sample(pool, min(n_terms - 1, len(pool)))
        k = [10, 1, 100][qid % 3]
        out.append({"query_id": qid, "terms": terms[:n_terms] or terms, "k": k})
    return out


def gen_layered_keys(n: int = 200, seed: int = 42) -> list[str]:
    """Synthetic layered keys for the F1-F5 splitter (FIXTURES.md §3)."""
    rng = random.Random(seed)
    keys = []
    for i in range(n):
        if i % 20 == 0:
            keys.append("")  # empty-key guard (P3)
            continue
        n_comp = 3 if i % 10 == 0 else (2 if i % 5 == 0 else 1)
        formulas = []
        for j in range(n_comp):
            f = f"C{rng.randint(1, 40)}H{rng.randint(1, 60)}N{rng.randint(0, 9)}"
            formulas.append((f"{rng.randint(2, 3)}" if j == 1 and i % 10 == 0 else "") + f)
        parts = [f"KEY=1S/{'.'.join(formulas)}"]
        if i % 2 == 0:
            parts.append("c" + ";".join(str(rng.randint(1, 99)) for _ in range(n_comp)))
        if i % 3 == 0:
            parts.append("h" + ";".join(f"{rng.randint(1, 20)}H" for _ in range(n_comp)))
        if i % 4 == 0:
            parts.append(f"q{rng.choice(['+1', '-1', '+2'])}")
        if i % 6 == 0:
            parts.append("b" + str(rng.randint(1, 9)))
            parts.append("t" + str(rng.randint(1, 9)))
            parts.append("m" + "".join(rng.choice("01") for _ in range(n_comp)))
            parts.append("s1")
        if i % 8 == 0:
            parts.append("i" + str(rng.randint(1, 5)))
        keys.append("/".join(parts))
    return keys
