"""Frozen BM25 scoring math + pure-Python exact oracle.

Formula (Lucene 8 / ES 7.5.2 default similarity, the engine behind the
reference index created at extractor/loader.go:114-136; docker-compose.yaml:4
pins ES 7.5.2):

    idf(t)        = ln(1 + (N - df + 0.5) / (df + 0.5))
    w(t, d)       = tf / (tf + k1 * (1 - b + b * dl/avgdl))      # no (k1+1)
    score(q, d)   = sum_t idf(t) * w(t, d)
    k1 = 1.2, b = 0.75
    tie-break: (score desc, doc_id asc)

Every scorer in this repo (exact DataFrame path, block-max WAND path, DuckDB
oracle SQL, this Python oracle) uses exactly these expressions so top-k is
rank- AND score-identical. To keep float64 summation order fixed, all
implementations accumulate per-document term contributions in term-iteration
order over postings sorted by doc_id.
"""

from __future__ import annotations

import heapq
import math
from collections import Counter

K1 = 1.2
B = 0.75


def idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def tf_weight(tf: float, dl: float, avgdl: float) -> float:
    return tf / (tf + K1 * (1.0 - B + B * dl / avgdl))


def score_term(tf: float, dl: float, avgdl: float, idf_t: float) -> float:
    return idf_t * tf_weight(tf, dl, avgdl)


def max_score_bound(max_tf: float, min_dl: float, avgdl: float, idf_t: float) -> float:
    """Upper bound on a term's contribution within a posting block.

    w(tf, dl) is increasing in tf and decreasing in dl, so the pair
    (block max tf, block min dl) bounds every posting in the block.
    """
    return idf_t * tf_weight(max_tf, min_dl, avgdl)


class Bm25Oracle:
    """Exact in-memory BM25 index — the pytest ground truth.

    Mirrors what the reference delegates to Lucene: posting lists + top-k
    scoring (extractor/loader.go:260-261 builds the query; Lucene scores).
    """

    def __init__(self, docs: list[tuple[int, list[str]]]):
        """docs: (doc_id, tokens) pairs."""
        self.doclen: dict[int, int] = {}
        self.postings: dict[str, dict[int, int]] = {}
        for doc_id, toks in docs:
            self.doclen[doc_id] = len(toks)
            for term, tf in Counter(toks).items():
                self.postings.setdefault(term, {})[doc_id] = tf
        self.n_docs = len(self.doclen)
        self.avgdl = (
            sum(self.doclen.values()) / self.n_docs if self.n_docs else 0.0
        )

    def idf(self, term: str) -> float:
        return idf(self.n_docs, len(self.postings.get(term, {})))

    def score_doc(self, terms: list[str], doc_id: int) -> float:
        s = 0.0
        dl = self.doclen[doc_id]
        for t in terms:
            plist = self.postings.get(t)
            if plist and doc_id in plist:
                s += score_term(plist[doc_id], dl, self.avgdl, self.idf(t))
        return s

    def topk(self, terms: list[str], k: int) -> list[tuple[int, float]]:
        """Exact top-k: (doc_id, score), score desc then doc_id asc.

        Unique query terms contribute once each (duplicate terms in the
        query are deduplicated, matching the DataFrame/SQL implementations).
        """
        uniq = sorted(set(terms))
        acc: dict[int, float] = {}
        for t in uniq:
            plist = self.postings.get(t)
            if not plist:
                continue
            idf_t = self.idf(t)
            for doc_id in sorted(plist):
                acc[doc_id] = acc.get(doc_id, 0.0) + score_term(
                    plist[doc_id], self.doclen[doc_id], self.avgdl, idf_t
                )
        return heapq.nsmallest(k, acc.items(), key=lambda kv: (-kv[1], kv[0]))
