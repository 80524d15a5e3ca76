"""Positional phrase matching with block skipping (pure kernel; runs
per doc-shard inside ``applyInPandas``).

Lucene's ExactPhraseMatcher analog over our varbyte block layout (the
phrase machinery the reference's ES index carries but never exercises —
extractor/loader.go:121 creates it, loader.go:239-379 never issues a
match_phrase). Strategy:

* The candidate doc set is driven by the RAREST phrase term (shard-local
  df), decoded in full — it is the intersection's upper bound.
* Every other term is probed candidate-by-candidate through its per-block
  ``max_doc_id`` metadata (monotone bisect, lo-anchored => galloping):
  only blocks that can contain a candidate are decoded.
* The positions blob is decoded ONLY for blocks holding a doc that
  survived the doc-id intersection.

A phrase containing a stopword-class term therefore decodes
O(|candidates|) of that term's postings — never its full per-shard df.
(The earlier design materialized every phrase term's postings AND
positions per shard into dicts before intersecting: per-task memory
O(sum df_shard(term) * positions), exactly what a "the quick" phrase
must not cost.)

``DecodeStats`` counts decoded postings/positions so tests can assert
the skipping actually happens.
"""

from __future__ import annotations

from bisect import bisect_left
from dataclasses import dataclass, field

from unichem2index_spark.functions.bm25 import score_term
from unichem2index_spark.functions.codec import PostingBlock, decode_positions


@dataclass
class DecodeStats:
    """Per-term decode counters (postings = doc entries, positions =
    individual token positions)."""

    postings: dict[str, int] = field(default_factory=dict)
    positions: dict[str, int] = field(default_factory=dict)

    def add_postings(self, term: str, n: int) -> None:
        self.postings[term] = self.postings.get(term, 0) + n

    def add_positions(self, term: str, n: int) -> None:
        self.positions[term] = self.positions.get(term, 0) + n


@dataclass
class PosTermPostings:
    """One term's positional posting blocks within one shard, ordered by
    (gen, block_id) — doc_ids are globally increasing across the list
    (generations append strictly larger ids; replaced docs are
    tombstoned, not renumbered)."""

    term: str
    max_doc_ids: list[int]  # per block
    enc_blocks: list[tuple[bytes, bytes, bytes, bytes]]  # gaps,tfs,dls,pos
    df: int  # shard-local doc count (sum of block n_docs)
    stats: DecodeStats | None = None
    _blk: dict[int, PostingBlock] = field(default_factory=dict, repr=False)
    _pos: dict[int, list[list[int]]] = field(default_factory=dict, repr=False)

    def _block(self, bi: int) -> PostingBlock:
        blk = self._blk.get(bi)
        if blk is None:
            gaps, tfs, dls, _ = self.enc_blocks[bi]
            blk = PostingBlock.decode(bytes(gaps), bytes(tfs), bytes(dls))
            self._blk[bi] = blk
            if self.stats is not None:
                self.stats.add_postings(self.term, len(blk.doc_ids))
        return blk

    def all_docs(self) -> dict[int, tuple[int, int]]:
        """doc_id -> (tf, dl) over ALL blocks (used for the rarest term
        only — it bounds the whole intersection)."""
        out: dict[int, tuple[int, int]] = {}
        for bi in range(len(self.enc_blocks)):
            blk = self._block(bi)
            for d, tf, dl in zip(blk.doc_ids, blk.tfs, blk.dls):
                out[d] = (tf, dl)
        return out

    def lookup_many(self, sorted_ids: list[int]) -> dict[int, tuple[int, int]]:
        """(tf, dl) for each candidate present in this term's postings.
        Decodes only blocks whose [.., max_doc_id] range is hit by a
        candidate; bisect anchored at the previous block index makes the
        scan one forward pass (galloping)."""
        out: dict[int, tuple[int, int]] = {}
        bi = 0
        n_blocks = len(self.enc_blocks)
        for d in sorted_ids:
            bi = bisect_left(self.max_doc_ids, d, bi)
            if bi >= n_blocks:
                break
            blk = self._block(bi)
            j = bisect_left(blk.doc_ids, d)
            if j < len(blk.doc_ids) and blk.doc_ids[j] == d:
                out[d] = (blk.tfs[j], blk.dls[j])
        return out

    def positions_of(self, doc_id: int) -> list[int]:
        """Token positions of ``doc_id`` — decodes (and caches) the
        positions blob of the ONE block containing it. Caller guarantees
        the doc is present (it survived the doc-id intersection)."""
        bi = bisect_left(self.max_doc_ids, doc_id)
        plists = self._pos.get(bi)
        if plists is None:
            blk = self._block(bi)
            blob = self.enc_blocks[bi][3]
            plists = decode_positions(bytes(blob), blk.tfs)
            self._pos[bi] = plists
            if self.stats is not None:
                self.stats.add_positions(self.term, sum(blk.tfs))
        blk = self._block(bi)
        return plists[bisect_left(blk.doc_ids, doc_id)]


def phrase_match_topk(
    posts: dict[str, PosTermPostings],
    phrase: list[str],
    idfs: dict[str, float],
    avgdl: float,
    k: int,
    slop: int = 0,
    deleted: frozenset[int] = frozenset(),
) -> list[tuple[int, float]]:
    """Top-k (doc_id, score) for one phrase within one shard.

    Position semantics: a position q of phrase term i+1 survives iff some
    surviving position p of term i has p < q <= p + 1 + slop — ordered,
    per-adjacent-pair gaps. NOTE this is STRICTER than Lucene/ES
    match_phrase slop (a total edit budget that also admits out-of-order
    matches, e.g. slop=2 matches a reversed bigram in ES, never here);
    slop=0 — exact consecutive phrase — is identical in both.

    Matching docs score as a plain BM25 bag over the phrase's unique
    terms, so slop=0 agrees with the SQL oracle's phrase-filter + BM25
    formulation exactly. Returns (score desc, doc_id asc).
    """
    if not phrase:
        return []
    uniq = sorted(set(phrase))
    if any(t not in posts for t in uniq):
        return []
    # 1. doc-id intersection, rarest term first (it bounds everything)
    by_rarity = sorted(uniq, key=lambda t: (posts[t].df, t))
    rare = by_rarity[0]
    tfdl: dict[str, dict[int, tuple[int, int]]] = {rare: posts[rare].all_docs()}
    cand = sorted(d for d in tfdl[rare] if d not in deleted)
    for t in by_rarity[1:]:
        if not cand:
            return []
        tfdl[t] = posts[t].lookup_many(cand)
        cand = [d for d in cand if d in tfdl[t]]
    # 2. positional verification, lazy per surviving candidate
    out: list[tuple[int, float]] = []
    for doc in cand:
        live = set(posts[phrase[0]].positions_of(doc))
        ok = bool(live)
        for t in phrase[1:]:
            nxt = {
                q
                for q in posts[t].positions_of(doc)
                if any(q - d in live for d in range(1, slop + 2))
            }
            live = nxt
            if not live:
                ok = False
                break
        if not ok:
            continue
        dl = tfdl[rare][doc][1]
        score = sum(
            score_term(tfdl[t][doc][0], dl, avgdl, idfs[t]) for t in uniq
        )
        out.append((doc, score))
    out.sort(key=lambda p: (-p[1], p[0]))
    return out[:k]


def min_span(plists: list[list[int]]) -> int:
    """Smallest (max - min) over one position chosen from each sorted
    list — the classic k-pointer sweep over the merged position streams,
    O(total positions) per doc. Lists must be non-empty and ascending."""
    idx = [0] * len(plists)
    best = max(p[0] for p in plists) - min(p[0] for p in plists)
    while True:
        cur = [pl[i] for pl, i in zip(plists, idx)]
        lo, hi = min(cur), max(cur)
        if hi - lo < best:
            best = hi - lo
            if best == 0:
                return 0
        j = cur.index(lo)
        idx[j] += 1
        if idx[j] >= len(plists[j]):
            return best


def span_near_match_topk(
    posts: dict[str, PosTermPostings],
    terms: list[str],
    idfs: dict[str, float],
    avgdl: float,
    k: int,
    slop: int = 0,
    deleted: frozenset[int] = frozenset(),
) -> list[tuple[int, float]]:
    """Top-k (doc_id, score) for one unordered proximity query within one
    shard — the Lucene ``NearSpansUnordered`` / ES ``span_near``
    (in_order=false) analog: a doc matches iff ONE position per distinct
    term can be chosen so the covering span fits the slop budget. With
    single-term spans Lucene's test ``(max_end - min_start) - n <= slop``
    reduces to ``max_pos - min_pos <= slop + n - 1``; that window is
    checked against the exact minimal span from :func:`min_span`.

    Same two-stage scale shape as the phrase kernel (shared machinery):
    doc-id intersection rarest-first with block skipping, positions
    decoded lazily only for survivors. Matching docs score as a plain
    BM25 bag over the unique terms (same discipline as phrase_match_topk,
    so the SQL oracle formulation agrees exactly)."""
    uniq = sorted(set(terms))
    if not uniq or any(t not in posts for t in uniq):
        return []
    window = slop + len(uniq) - 1
    by_rarity = sorted(uniq, key=lambda t: (posts[t].df, t))
    rare = by_rarity[0]
    tfdl: dict[str, dict[int, tuple[int, int]]] = {rare: posts[rare].all_docs()}
    cand = sorted(d for d in tfdl[rare] if d not in deleted)
    for t in by_rarity[1:]:
        if not cand:
            return []
        tfdl[t] = posts[t].lookup_many(cand)
        cand = [d for d in cand if d in tfdl[t]]
    out: list[tuple[int, float]] = []
    for doc in cand:
        plists = [posts[t].positions_of(doc) for t in uniq]
        if min_span(plists) > window:
            continue
        dl = tfdl[rare][doc][1]
        score = sum(
            score_term(tfdl[t][doc][0], dl, avgdl, idfs[t]) for t in uniq
        )
        out.append((doc, score))
    out.sort(key=lambda p: (-p[1], p[0]))
    return out[:k]


def span_first_match_topk(
    posts: dict[str, PosTermPostings],
    term: str,
    idf: float,
    avgdl: float,
    k: int,
    end: int,
    deleted: frozenset[int] = frozenset(),
) -> list[tuple[int, float]]:
    """Top-k (doc_id, score) for one ``span_first`` query within one
    shard — the Lucene ``SpanFirstQuery`` / ES ``span_first`` analog
    wrapping a single span_term: a doc matches iff the term occurs at a
    token position < ``end`` (0-based; "in the first ``end`` tokens" —
    the title-ish / lead-paragraph boost every news search uses).

    Every posting of the term is a candidate (no intersection to skip
    through), but positions decode lazily per block via the shared
    cache, and matching docs score as the ordinary single-term BM25 so
    the SQL oracle's expression tree agrees exactly."""
    if term not in posts:
        return []
    tfdl = posts[term].all_docs()
    out: list[tuple[int, float]] = []
    for doc in sorted(tfdl):
        if doc in deleted:
            continue
        if posts[term].positions_of(doc)[0] >= end:
            continue
        tf, dl = tfdl[doc]
        out.append((doc, score_term(tf, dl, avgdl, idf)))
    out.sort(key=lambda p: (-p[1], p[0]))
    return out[:k]


def span_not_match_topk(
    posts: dict[str, PosTermPostings],
    include: str,
    exclude: str,
    idf: float,
    avgdl: float,
    k: int,
    dist: int = 0,
    deleted: frozenset[int] = frozenset(),
) -> list[tuple[int, float]]:
    """Top-k (doc_id, score) for one ``span_not`` query within one shard
    — the Lucene ``SpanNotQuery`` / ES ``span_not`` analog with a
    symmetric pre/post window: a doc matches iff SOME occurrence of
    ``include`` has NO occurrence of ``exclude`` within ``dist`` tokens
    ("mortgage but not near reverse", the classic negation-by-proximity).

    Candidates are the include term's postings; the exclude term's
    postings/positions decode ONLY for candidate docs (the same
    galloping block-skip probe the phrase kernel uses — an exclusion
    stopword costs O(candidates), never its df). Matching docs score as
    plain single-term BM25 of the include term."""
    from bisect import bisect_left as _bl

    if include not in posts:
        return []
    tfdl = posts[include].all_docs()
    cand = sorted(d for d in tfdl if d not in deleted)
    ex = posts.get(exclude)
    extf = ex.lookup_many(cand) if ex is not None else {}
    out: list[tuple[int, float]] = []
    for doc in cand:
        if doc in extf:
            apos = posts[include].positions_of(doc)
            bpos = ex.positions_of(doc)
            ok = False
            for a in apos:
                i = _bl(bpos, a)
                near = min(
                    abs(bpos[m] - a)
                    for m in (i - 1, i)
                    if 0 <= m < len(bpos)
                )
                if near > dist:
                    ok = True
                    break
            if not ok:
                continue
        tf, dl = tfdl[doc]
        out.append((doc, score_term(tf, dl, avgdl, idf)))
    out.sort(key=lambda p: (-p[1], p[0]))
    return out[:k]


def span_near_or_match_topk(
    posts: dict[str, PosTermPostings],
    groups: list[list[str]],
    gidfs: list[float],
    avgdl: float,
    k: int,
    slop: int = 0,
    deleted: frozenset[int] = frozenset(),
) -> list[tuple[int, float]]:
    """Top-k for ``span_near`` over ``span_or`` clauses within one shard
    — Lucene ``SpanNearQuery(SpanOrQuery(...), SpanTermQuery(...))`` /
    ES nested spans: each clause is a GROUP of alternatives; a doc
    matches iff one position per group (drawn from the union of its
    members' occurrences) fits the unordered window
    ``slop + n_groups - 1``. The "(fast|slow) NEAR merge" query no flat
    span shape can express.

    Candidate generation intersects rarest-GROUP-first (group df = sum
    of member dfs; a group's postings are the union of its members'),
    with the same galloping block-skipping per member and lazy position
    decode for survivors only. Group positions are the merged union of
    member positions — exactly Lucene's SpanOr disjunction. Scoring
    follows the SynonymQuery discipline shared with bm25_synonyms: per
    group, tf SUMS over members and the idf is the blend (min member
    idf == idf of the max member df), so alternatives share one scoring
    slot instead of double-counting."""
    present: list[list[str]] = []
    for g in groups:
        mem = [t for t in sorted(set(g)) if t in posts]
        if not mem:
            return []
        present.append(mem)
    n = len(present)
    window = slop + n - 1
    order = sorted(
        range(n),
        key=lambda i: (sum(posts[t].df for t in present[i]), i),
    )
    mem_docs: list[dict[str, dict[int, tuple[int, int]]]] = [
        {} for _ in range(n)
    ]
    gi0 = order[0]
    for t in present[gi0]:
        mem_docs[gi0][t] = posts[t].all_docs()
    cand = sorted(
        {
            d
            for m in mem_docs[gi0].values()
            for d in m
            if d not in deleted
        }
    )
    for gi in order[1:]:
        if not cand:
            return []
        found: set[int] = set()
        for t in present[gi]:
            got = posts[t].lookup_many(cand)
            mem_docs[gi][t] = got
            found.update(got)
        cand = [d for d in cand if d in found]
    out: list[tuple[int, float]] = []
    for doc in cand:
        plists = []
        for gi in range(n):
            ps = sorted(
                {
                    p
                    for t, m in mem_docs[gi].items()
                    if doc in m
                    for p in posts[t].positions_of(doc)
                }
            )
            plists.append(ps)
        if min_span(plists) > window:
            continue
        dl = next(
            m[doc][1] for m in mem_docs[gi0].values() if doc in m
        )
        score = 0.0
        for gi in range(n):
            tf = sum(
                m[doc][0] for m in mem_docs[gi].values() if doc in m
            )
            score += score_term(tf, dl, avgdl, gidfs[gi])
        out.append((doc, score))
    out.sort(key=lambda p: (-p[1], p[0]))
    return out[:k]


def ordered_chain_width(plists: list[list[int]]) -> int | None:
    """Smallest ``p_n - p_1`` over strictly-increasing chains that pick
    one position per slot IN QUERY ORDER — Lucene's ``NearSpansOrdered``
    / intervals ``ordered`` minimal-interval sweep. For each start
    position the greedy "smallest admissible next position" chain
    minimizes the end position, and as starts increase those choices
    only move forward, so one monotonic pointer per slot gives
    O(total positions) per doc. Returns None when no chain exists.
    Lists must be ascending; slots may repeat a term (positions must
    still strictly increase, so "a b a" works naturally)."""
    n = len(plists)
    if any(not pl for pl in plists):
        return None
    best: int | None = None
    ptr = [0] * n
    for p1 in plists[0]:
        prev = p1
        dead = False
        for i in range(1, n):
            pl = plists[i]
            while ptr[i] < len(pl) and pl[ptr[i]] <= prev:
                ptr[i] += 1
            if ptr[i] >= len(pl):
                dead = True
                break
            prev = pl[ptr[i]]
        if dead:
            break
        width = prev - p1
        if best is None or width < best:
            best = width
            if best == n - 1:  # tightest possible ordered chain
                break
    return best


def intervals_ordered_match_topk(
    posts: dict[str, PosTermPostings],
    terms: list[str],
    idfs: dict[str, float],
    avgdl: float,
    k: int,
    max_gaps: int = 0,
    deleted: frozenset[int] = frozenset(),
) -> list[tuple[int, float]]:
    """Top-k for the ES ``intervals`` query's ``match`` source with
    ``ordered: true, max_gaps: G`` within one shard: positions
    p_1 < p_2 < ... < p_n (strictly increasing, query order) with total
    gap budget ``p_n - p_1 - (n - 1) <= G``. The ordered complement of
    :func:`span_near_match_topk` (any-order window); ``max_gaps=0`` is
    an exact ordered run == phrase slop 0 over distinct terms.

    Same two-stage scale shape as the phrase kernel: rarest-first doc-id
    intersection with block skipping, lazy position decode for survivors
    only, then the O(total positions) ordered-chain sweep. Matching docs
    score as a plain BM25 bag over the unique terms (the span-family
    discipline, so the SQL oracle agrees exactly)."""
    if not terms:
        return []
    uniq = sorted(set(terms))
    if any(t not in posts for t in uniq):
        return []
    window = max_gaps + len(terms) - 1
    by_rarity = sorted(uniq, key=lambda t: (posts[t].df, t))
    rare = by_rarity[0]
    tfdl: dict[str, dict[int, tuple[int, int]]] = {rare: posts[rare].all_docs()}
    cand = sorted(d for d in tfdl[rare] if d not in deleted)
    for t in by_rarity[1:]:
        if not cand:
            return []
        tfdl[t] = posts[t].lookup_many(cand)
        cand = [d for d in cand if d in tfdl[t]]
    out: list[tuple[int, float]] = []
    for doc in cand:
        plists = [posts[t].positions_of(doc) for t in terms]
        width = ordered_chain_width(plists)
        if width is None or width > window:
            continue
        dl = tfdl[rare][doc][1]
        score = sum(
            score_term(tfdl[t][doc][0], dl, avgdl, idfs[t]) for t in uniq
        )
        out.append((doc, score))
    out.sort(key=lambda p: (-p[1], p[0]))
    return out[:k]


def phrase_prefix_match_topk(
    posts: dict[str, PosTermPostings],
    fixed: list[str],
    last_group: list[str],
    idfs: dict[str, float],
    group_idf: float,
    avgdl: float,
    k: int,
    slop: int = 0,
    deleted: frozenset[int] = frozenset(),
) -> list[tuple[int, float]]:
    """Top-k for ES ``match_phrase_prefix`` within one shard: the phrase
    ``fixed + [<prefix>*]`` where the final slot accepts ANY member of
    ``last_group`` (the dictionary expansion of the prefix, computed
    globally by the caller — deterministic, unlike ES's infamous
    per-shard expansion). Position semantics are phrase_match_topk's
    per-adjacent-pair gaps; the final slot's positions are the merged
    union of member positions (MultiPhraseQuery's last-slot disjunction).

    Scoring: BM25 bag over the unique fixed terms plus ONE blended slot
    for the expansion group — tf summed over members present in the doc,
    idf = ``group_idf`` (the caller blends at max expansion df, the
    SynonymQuery discipline shared with span_near_or) — so alternatives
    share a single scoring slot. ``fixed`` must be non-empty and
    disjoint from ``last_group``."""
    if not fixed or not last_group:
        return []
    uniq = sorted(set(fixed))
    if any(t not in posts for t in uniq):
        return []
    members = [t for t in sorted(set(last_group)) if t in posts]
    if not members:
        return []
    # 1. doc-id intersection: rarest fixed term first, then the group
    by_rarity = sorted(uniq, key=lambda t: (posts[t].df, t))
    rare = by_rarity[0]
    tfdl: dict[str, dict[int, tuple[int, int]]] = {rare: posts[rare].all_docs()}
    cand = sorted(d for d in tfdl[rare] if d not in deleted)
    for t in by_rarity[1:]:
        if not cand:
            return []
        tfdl[t] = posts[t].lookup_many(cand)
        cand = [d for d in cand if d in tfdl[t]]
    if not cand:
        return []
    mem_tf: dict[str, dict[int, tuple[int, int]]] = {}
    found: set[int] = set()
    for t in members:
        got = posts[t].lookup_many(cand)
        mem_tf[t] = got
        found.update(got)
    cand = [d for d in cand if d in found]
    # 2. positional chain, lazy per surviving candidate
    out: list[tuple[int, float]] = []
    for doc in cand:
        live = set(posts[fixed[0]].positions_of(doc))
        ok = bool(live)
        for t in fixed[1:]:
            live = {
                q
                for q in posts[t].positions_of(doc)
                if any(q - d in live for d in range(1, slop + 2))
            }
            if not live:
                ok = False
                break
        if ok:
            last_ps = {
                p
                for t in members
                if doc in mem_tf[t]
                for p in posts[t].positions_of(doc)
            }
            ok = any(
                q - d in live for q in last_ps for d in range(1, slop + 2)
            )
        if not ok:
            continue
        dl = tfdl[rare][doc][1]
        score = sum(
            score_term(tfdl[t][doc][0], dl, avgdl, idfs[t]) for t in uniq
        )
        gtf = sum(m[doc][0] for m in mem_tf.values() if doc in m)
        score += score_term(gtf, dl, avgdl, group_idf)
        out.append((doc, score))
    out.sort(key=lambda p: (-p[1], p[0]))
    return out[:k]


def span_containing_match_topk(
    posts: dict[str, PosTermPostings],
    big: list[str],
    little: str,
    idfs: dict[str, float],
    avgdl: float,
    k: int,
    slop: int = 0,
    score_terms: list[str] | None = None,
    deleted: frozenset[int] = frozenset(),
) -> list[tuple[int, float]]:
    """Top-k for ``span_containing`` / ``span_within`` in one shard —
    Lucene ``SpanContainingQuery`` / ``SpanWithinQuery``: the big span
    is an unordered span_near over ``big`` (window ``slop+len(big)-1``),
    the little span a single term; a doc matches iff SOME valid big
    span's interval [min, max] contains an occurrence of ``little``.
    The same doc-level predicate serves both queries — they differ in
    which side SCORES (Lucene scores the query being returned:
    ``score_terms=big`` is span_containing, ``[little]`` span_within;
    the other side is a pure filter), so one kernel carries both.

    Candidates intersect rarest-first over big+little with the shared
    block-skipping machinery; positions decode lazily for survivors.
    The span check enumerates one-position-per-big-term combinations
    (product of per-doc tfs — tf is single digits for non-stopword
    query terms, so the combo count is tiny) with early exit on the
    first valid covering span; the little lookup is a bisect."""
    from itertools import product

    uniq_big = sorted(set(big))
    need = sorted(set(uniq_big + [little]))
    if any(t not in posts for t in need):
        return []
    window = slop + len(uniq_big) - 1
    score_over = sorted(set(score_terms if score_terms else uniq_big))
    by_rarity = sorted(need, key=lambda t: (posts[t].df, t))
    rare = by_rarity[0]
    tfdl: dict[str, dict[int, tuple[int, int]]] = {rare: posts[rare].all_docs()}
    cand = sorted(d for d in tfdl[rare] if d not in deleted)
    for t in by_rarity[1:]:
        if not cand:
            return []
        tfdl[t] = posts[t].lookup_many(cand)
        cand = [d for d in cand if d in tfdl[t]]
    out: list[tuple[int, float]] = []
    for doc in cand:
        plists = [posts[t].positions_of(doc) for t in uniq_big]
        cpos = posts[little].positions_of(doc)
        hit = False
        for combo in product(*plists):
            s, e = min(combo), max(combo)
            if e - s > window:
                continue
            i = bisect_left(cpos, s)
            if i < len(cpos) and cpos[i] <= e:
                hit = True
                break
        if not hit:
            continue
        dl = tfdl[rare][doc][1]
        score = sum(
            score_term(tfdl[t][doc][0], dl, avgdl, idfs[t])
            for t in score_over
        )
        out.append((doc, score))
    out.sort(key=lambda p: (-p[1], p[0]))
    return out[:k]
