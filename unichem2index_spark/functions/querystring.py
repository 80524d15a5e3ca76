"""Lucene-style ``query_string`` mini-language: parser + dual renderer.

Grammar (a faithful subset of Lucene's query_string syntax):

    expr    := or_expr
    or_expr := and_expr (OR and_expr)*
    and_expr:= unary (AND unary)*          # adjacency without an operator
    unary   := NOT unary | primary         #   is implicit OR (Lucene default)
    primary := '(' expr ')' | '"phrase words"' | term

The SAME parsed AST renders to (a) a Spark Column over a tokenized-doc
frame and (b) a DuckDB boolean expression string — so the engine and the
oracle evaluate one tree, never two hand-kept translations.

Semantics notes (documented scope):
- Terms are analyzed with the index tokenizer (lowercase, [a-z0-9]+).
- Quoted phrases are evaluated in FILTER context (match/no-match via the
  sentinel-space substring identity the phrase oracle uses); they gate
  eligibility but do not contribute phrase-frequency scoring the way
  Lucene's sloppy phrase scorer would.
- Scoring: BM25 sum over the query's POSITIVE terms (terms not under a
  NOT), which is Lucene's boolean-query sum-of-clauses shape.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from unichem2index_spark.functions.tokenize import tokenize

_LEX = re.compile(r'\(|\)|"[^"]*"|[^\s()]+')


def parse_query_string(q: str):
    """Parse into nested tuples: ('term', t) / ('phrase', [t..]) /
    ('and'|'or', [children]) / ('not', child)."""
    toks = _LEX.findall(q)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def take():
        nonlocal pos
        t = toks[pos]
        pos += 1
        return t

    def primary():
        t = peek()
        if t is None:
            raise ValueError(f"query_string: unexpected end in {q!r}")
        if t == "(":
            take()
            node = or_expr()
            if peek() != ")":
                raise ValueError(f"query_string: missing ')' in {q!r}")
            take()
            return node
        if t.startswith('"'):
            take()
            words = tokenize(t.strip('"'))
            if not words:
                raise ValueError(f"query_string: empty phrase in {q!r}")
            return ("phrase", words)
        take()
        words = tokenize(t)
        if len(words) != 1:
            raise ValueError(f"query_string: bad term {t!r}")
        return ("term", words[0])

    def unary():
        if peek() == "NOT":
            take()
            return ("not", unary())
        return primary()

    def and_expr():
        kids = [unary()]
        while peek() == "AND":
            take()
            kids.append(unary())
        return kids[0] if len(kids) == 1 else ("and", kids)

    def or_expr():
        kids = [and_expr()]
        while peek() is not None and peek() not in (")",):
            if peek() == "OR":
                take()
            # bare adjacency: implicit OR (Lucene default_operator=OR)
            kids.append(and_expr())
        return kids[0] if len(kids) == 1 else ("or", kids)

    node = or_expr()
    if peek() is not None:
        raise ValueError(f"query_string: trailing input in {q!r}")
    return node


def positive_terms(node) -> list[str]:
    """Distinct scoring terms: every term NOT under a NOT."""
    out: set[str] = set()

    def walk(n, neg: bool):
        kind = n[0]
        if kind == "term":
            if not neg:
                out.add(n[1])
        elif kind == "phrase":
            pass  # filter context — no term scoring contribution
        elif kind == "not":
            walk(n[1], True)
        else:
            for c in n[1]:
                walk(c, neg)

    walk(node, False)
    return sorted(out)


def _needle(words: list[str]) -> str:
    return " " + " ".join(words) + " "


def render_spark(node, toks: Column, sent: Column) -> Column:
    """Boolean eligibility Column; ``toks`` = token array, ``sent`` =
    sentinel-spaced joined tokens (' t1 t2 ... ')."""
    kind = node[0]
    if kind == "term":
        return F.array_contains(toks, node[1])
    if kind == "phrase":
        return F.locate(_needle(node[1]), sent) > 0
    if kind == "not":
        return ~render_spark(node[1], toks, sent)
    cols = [render_spark(c, toks, sent) for c in node[1]]
    out = cols[0]
    for c in cols[1:]:
        out = (out & c) if kind == "and" else (out | c)
    return out


def render_sql(node, toks_ref: str = "toks", sent_ref: str = "s") -> str:
    """The same tree as a DuckDB boolean expression."""
    kind = node[0]
    if kind == "term":
        t = node[1].replace("'", "''")
        return f"list_contains({toks_ref}, '{t}')"
    if kind == "phrase":
        n = _needle(node[1]).replace("'", "''")
        return f"position('{n}' IN {sent_ref}) > 0"
    if kind == "not":
        return f"(NOT {render_sql(node[1], toks_ref, sent_ref)})"
    op = " AND " if kind == "and" else " OR "
    return "(" + op.join(render_sql(c, toks_ref, sent_ref) for c in node[1]) + ")"


_SIMPLE_LEX = re.compile(r'\(|\)|\+|\||"[^"]*"|[^\s()+|]+')


def parse_simple_query_string(q: str):
    """ES ``simple_query_string``: the operator-character sibling of
    query_string — ``+`` is AND, ``|`` is OR, a leading ``-`` negates,
    quotes make a phrase, parens group; bare adjacency is the default
    operator (OR here, ES's default). Precedence (documented subset of
    Lucene's SimpleQueryParser): ``|``/adjacency < ``+`` < unary ``-``.
    Produces the SAME AST node shapes as :func:`parse_query_string`, so
    every downstream renderer/scorer is shared.

    Lenient like ES (the API's defining contract — it never throws on
    user input): if the operator grammar fails to parse, the input
    degrades to an OR of its analyzed terms, operators stripped."""
    try:
        return _parse_simple_strict(q)
    except ValueError:
        words = tokenize(q)
        if not words:
            raise ValueError(f"simple_query_string: no terms in {q!r}")
        if len(words) == 1:
            return ("term", words[0])
        return ("or", [("term", w) for w in words])


def _parse_simple_strict(q: str):
    toks = _SIMPLE_LEX.findall(q)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def take():
        nonlocal pos
        t = toks[pos]
        pos += 1
        return t

    def primary():
        t = peek()
        if t is None:
            raise ValueError(f"simple_query_string: unexpected end in {q!r}")
        if t == "(":
            take()
            node = or_expr()
            if peek() != ")":
                raise ValueError(f"simple_query_string: missing ')' in {q!r}")
            take()
            return node
        if t in (")", "+", "|"):
            raise ValueError(f"simple_query_string: misplaced {t!r} in {q!r}")
        if t.startswith('"'):
            take()
            words = tokenize(t.strip('"'))
            if not words:
                raise ValueError(f"simple_query_string: empty phrase in {q!r}")
            return ("phrase", words)
        take()
        if t.startswith("-") and len(t) > 1:
            # -term: the modifier rides on the token (no whitespace)
            inner = tokenize(t[1:])
            if len(inner) != 1:
                raise ValueError(f"simple_query_string: bad term {t!r}")
            return ("not", ("term", inner[0]))
        words = tokenize(t)
        if len(words) != 1:
            raise ValueError(f"simple_query_string: bad term {t!r}")
        return ("term", words[0])

    def and_expr():
        kids = [primary()]
        while peek() == "+":
            take()
            kids.append(primary())
        return kids[0] if len(kids) == 1 else ("and", kids)

    def or_expr():
        kids = [and_expr()]
        while peek() is not None and peek() != ")":
            if peek() == "|":
                take()
            # bare adjacency = default operator (OR)
            kids.append(and_expr())
        return kids[0] if len(kids) == 1 else ("or", kids)

    node = or_expr()
    if peek() is not None:
        raise ValueError(f"simple_query_string: trailing input in {q!r}")
    return node


_TEMPLATE_REF = re.compile(r"\{\{(\w+)\}\}")


def render_search_template(template: str, params: dict) -> str:
    """ES ``search_template`` (the mustache subset ES actually renders
    for query strings): substitute every ``{{name}}`` hole from
    ``params``, error on missing or unused-hole leftovers — then the
    rendered string runs through the normal query parser, exactly like
    ES pre-renders the template before the search phase. Values are
    analyzed by the query parser downstream, so substitution is plain
    text (no quoting layer needed beyond the template's own)."""
    missing: list[str] = []

    def sub(m: re.Match) -> str:
        key = m.group(1)
        if key not in params:
            missing.append(key)
            return m.group(0)
        return str(params[key])

    out = _TEMPLATE_REF.sub(sub, template)
    if missing:
        raise ValueError(
            f"search_template: missing params {sorted(set(missing))}"
        )
    return out
