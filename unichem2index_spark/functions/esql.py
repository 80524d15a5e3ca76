"""Mini ES|QL (the Elasticsearch piped query language, 8.11+): parser +
dual compiler. One parsed pipeline renders to BOTH a Spark DataFrame
program and a DuckDB SQL statement (the oracle), so the compiler — not a
hand-kept translation — is what the correctness gate checks. Same design
as functions/querystring.py.

Supported surface (the ES|QL core):

    FROM <table>  |  ROW <alias> = <expr> [, ...]   (literal 1-row source)
    | WHERE <expr>
    | EVAL <alias> = <expr> [, ...]
    | KEEP <col> [, ...]
    | DROP <col> [, ...]
    | RENAME <old> AS <new> [, ...]
    | STATS <alias> = <agg>(<expr>|*) [WHERE <cond>] [, ...]
            BY <col> | <alias> = <expr> [, ...]
    | INLINESTATS <alias> = <agg>(<expr>|*) [, ...] BY <col> [, ...]
    | ENRICH <table> ON <left_key> == <right_key> WITH <col> [, ...]
    | LOOKUP JOIN <table> ON <key>
    | MV_EXPAND <col>
    | DISSECT <field> '<pattern with %{name} holes>'
    | GROK <field> '<pattern with %{ALIAS:name} refs>'
    | CHANGE_POINT <value> ON <order> [BY <key>]
    | SORT <col> [ASC|DESC] [, ...]
    | LIMIT <n>

8.x STATS extensions: a per-aggregate ``WHERE`` filter (rendered as
``F.when`` conditional aggregation / SQL ``FILTER (WHERE ...)`` — the
filter stays inside the single hash-aggregate), and grouping
EXPRESSIONS in BY (``BY day = BUCKET(ts, 1 day)``); BUCKET accepts
1-unit calendar spans (minute/hour/day/week/month/year) and lowers to
``date_trunc`` on both engines. CASE(cond, val, ..., default) chains
WHEN on both engines. GROK expands the ingest-node pattern library
(functions/ingestpipeline.py) and lowers to the same dual
``regexp_extract`` projection as DISSECT (unanchored, per ES).

Expressions: identifiers, integer/float/string literals ("..." or '...'),
arithmetic + - * / %, comparisons == != < <= > >=, IS NULL /
IS NOT NULL (the missing-field predicate — an enrich/lookup miss or a
sparse field; same three-valued logic both engines), LIKE "pat*?"
(Lucene wildcards), IN (lit, ...), AND/OR/NOT, parens,
and the scalar functions ROUND(x[, d]) / LENGTH(s) / ABS(x) /
SPLIT(s, "delim") (LITERAL delimiter, yields a multivalue column for
MV_EXPAND — Spark's regex split gets the delimiter re-escaped) /
CONTAINS_TERM(field, "term") — the ES|QL match()-family analog:
analyzer-tokenized term membership, identical tokenizer both engines —
and the multivalue family MV_COUNT / MV_MAX / MV_MIN (size and
element extremes of a multivalue column; one total order per type on
both engines), plus the string family CONCAT (null-propagating on
both engines: Spark concat == SQL ||; ES|QL CONCAT is likewise null
in → null out) / SUBSTRING(s, start, len) (1-based, literal
positive bounds — ES|QL's negative-start form is rejected because
the engines' negative-index semantics differ) / TO_UPPER / TO_LOWER
/ STARTS_WITH / ENDS_WITH / COALESCE / TRIM / LEFT / RIGHT (native
``left``/``right`` on BOTH engines — a substring render would
diverge on strings shorter than n) / REPLACE(s, pat, new) (ES|QL
REPLACE is regex-based: literal pattern, Spark regexp_replace ==
DuckDB regexp_replace with the 'g' flag), and the date family
DATE_TRUNC(1 <unit>, ts) (ES|QL's duration-first signature, same
calendar spans as BUCKET) / DATE_EXTRACT("part", ts) (year/month/
day/hour/minute, long-pinned; dayofweek deliberately absent — the
engines disagree on week start) / DATE_FORMAT("pattern", ts)
(Java-style patterns with a verified strftime twin only).
Aggregates (STATS only): COUNT(*) / COUNT(x) / SUM / MIN / MAX /
AVG / MEDIAN / PERCENTILE(x, p) (exact interpolated — Spark
percentile == DuckDB quantile_cont) / COUNT_DISTINCT (EXACT —
ES|QL's is an HLL estimate; documented divergence) / TOP(x, n,
"asc"|"desc") and VALUES(x) — both are MULTIVALUE-returning in
ES|QL, so the engine serializes them to a "v1,v2,..." string in the
agg itself (the repo's canon-compat list discipline); VALUES is
unordered in ES — the serialized form sorts ascending, the one
deterministic reading.

Determinism note: SUM/COUNT/MIN/MAX over integers are order-independent
(exact); AVG renders as an exact integer SUM divided once on both
engines. Float expressions follow the repo's shared-float-tree rule.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TOKEN = re.compile(
    r"\s*(>=|<=|==|!=|>|<|\(|\)|,|\*|\+|-|/|%|=|"
    r"\"[^\"]*\"|'[^']*'|[0-9]+\.[0-9]+|[0-9]+|[A-Za-z_][A-Za-z0-9_]*)"
)

_AGGS = {
    "count", "sum", "min", "max", "avg",
    "median", "percentile", "count_distinct", "top", "values",
}
_FUNCS = {
    "round", "length", "abs", "contains_term", "split", "case", "bucket",
    "categorize",
    "mv_count", "mv_max", "mv_min",
    "concat", "substring", "to_upper", "to_lower", "starts_with",
    "ends_with", "coalesce", "trim", "replace", "left", "right",
    "date_trunc", "date_extract", "date_format",
}

# DATE_EXTRACT parts whose semantics provably agree: part -> (Spark fn,
# DuckDB fn). dayofweek is deliberately ABSENT (Spark Sunday=1 vs
# DuckDB Sunday=0 — a silent off-by-one, not a render).
_EXTRACT_PARTS = {
    "year": ("year", "year"),
    "month": ("month", "month"),
    "day": ("dayofmonth", "day"),
    "hour": ("hour", "hour"),
    "minute": ("minute", "minute"),
}

# DATE_FORMAT patterns: the Java-style pattern ES|QL takes, mapped to
# the strftime DuckDB takes. Only patterns with a verified 1:1 render.
_DATE_FMTS = {
    "yyyy-MM-dd": "%Y-%m-%d",
    "yyyy-MM": "%Y-%m",
    "yyyy": "%Y",
    "HH": "%H",
    "yyyy-MM-dd HH": "%Y-%m-%d %H",
}

# BUCKET spans both engines can render as a calendar truncation. ES|QL
# BUCKET also takes a target-bucket-count form and sub-calendar spans
# (e.g. `3 hours`) — rejected here: a fixed-width epoch-anchored bucket
# is easy in both engines, but ES aligns sub-calendar buckets to the
# epoch while DuckDB's time_bucket aligns to 2000-01-01, so only the
# calendar units whose truncation semantics provably agree are allowed.
_BUCKET_UNITS = {"day", "hour", "week", "month", "year", "minute"}


class _P:
    def __init__(self, s: str):
        self.toks = []
        i = 0
        while i < len(s):
            m = _TOKEN.match(s, i)
            if not m:
                if s[i:].strip():
                    raise ValueError(f"ES|QL: cannot lex {s[i:]!r}")
                break
            self.toks.append(m.group(1))
            i = m.end()
        self.pos = 0

    def peek(self):
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def take(self, want=None):
        t = self.peek()
        if t is None or (want is not None and t.upper() != want):
            raise ValueError(f"ES|QL: expected {want or 'token'}, got {t!r}")
        self.pos += 1
        return t

    # precedence: OR < AND < NOT < cmp < add < mul < unary < primary
    def expr(self):
        node = self.and_()
        while self.peek() and self.peek().upper() == "OR":
            self.take()
            node = ("bin", "or", node, self.and_())
        return node

    def and_(self):
        node = self.not_()
        while self.peek() and self.peek().upper() == "AND":
            self.take()
            node = ("bin", "and", node, self.not_())
        return node

    def not_(self):
        if self.peek() and self.peek().upper() == "NOT":
            self.take()
            return ("not", self.not_())
        return self.cmp()

    def cmp(self):
        node = self.add()
        nxt = self.peek()
        if nxt in (">=", "<=", "==", "!=", ">", "<"):
            op = self.take()
            node = ("bin", op, node, self.add())
        elif nxt is not None and nxt.upper() == "IS":
            # IS NULL / IS NOT NULL — ES|QL's missing-field predicate
            # (an enrich/lookup miss, an unmatched dissect, a sparse
            # field); same three-valued-logic escape hatch both engines.
            self.take()
            neg = False
            if self.peek() and self.peek().upper() == "NOT":
                self.take()
                neg = True
            self.take("NULL")
            node = ("isnull", node, neg)
        elif nxt is not None and nxt.upper() == "LIKE":
            self.take()
            pat = self.take()
            if pat[0] not in "\"'":
                raise ValueError("ES|QL: LIKE needs a quoted pattern")
            if "%" in pat or "_" in pat:
                # Lucene wildcards are * and ?; SQL metacharacters are
                # rejected because LIKE-escape semantics differ between
                # engines (DuckDB has no default ESCAPE char).
                raise ValueError("ES|QL: LIKE uses * and ?, not %/_")
            node = ("like", node, pat[1:-1])
        elif nxt is not None and nxt.upper() == "IN":
            self.take()
            self.take("(")
            vals = [self.primary()]
            while self.peek() == ",":
                self.take()
                vals.append(self.primary())
            self.take(")")
            if not all(v[0] == "lit" for v in vals):
                raise ValueError("ES|QL: IN takes literals")
            node = ("in", node, [v[1] for v in vals])
        return node

    def add(self):
        node = self.mul()
        while self.peek() in ("+", "-"):
            op = self.take()
            node = ("bin", op, node, self.mul())
        return node

    def mul(self):
        node = self.unary()
        while self.peek() in ("*", "/", "%"):
            op = self.take()
            node = ("bin", op, node, self.unary())
        return node

    def unary(self):
        if self.peek() == "-":
            self.take()
            return ("neg", self.unary())
        return self.primary()

    def primary(self):
        t = self.peek()
        if t is None:
            raise ValueError("ES|QL: unexpected end of expression")
        if t == "(":
            self.take()
            node = self.expr()
            self.take(")")
            return node
        self.take()
        if t[0] in "\"'":
            return ("lit", t[1:-1])
        if re.fullmatch(r"[0-9]+\.[0-9]+", t):
            return ("lit", float(t))
        if re.fullmatch(r"[0-9]+", t):
            return ("lit", int(t))
        if self.peek() == "(":  # function call
            fn = t.lower()
            self.take("(")
            args = []
            if fn == "bucket":
                # BUCKET(col, 1 day): the span is the two-token ES|QL
                # duration literal, not an expression — parsed here.
                args.append(self.expr())
                self.take(",")
                n = self.take()
                unit = self.take().lower().rstrip("s")
                if n != "1" or unit not in _BUCKET_UNITS:
                    raise ValueError(
                        f"ES|QL: BUCKET span must be 1 of {sorted(_BUCKET_UNITS)},"
                        f" got {n} {unit!r}"
                    )
                args.append(("lit", unit))
            elif fn == "date_trunc":
                # DATE_TRUNC(1 day, col) — ES|QL puts the duration
                # literal FIRST; same 1-unit calendar spans as BUCKET.
                n = self.take()
                unit = self.take().lower().rstrip("s")
                if n != "1" or unit not in _BUCKET_UNITS:
                    raise ValueError(
                        "ES|QL: DATE_TRUNC span must be 1 of "
                        f"{sorted(_BUCKET_UNITS)}, got {n} {unit!r}"
                    )
                args.append(("lit", unit))
                self.take(",")
                args.append(self.expr())
            elif self.peek() == "*":
                self.take()
                args.append(("star",))
            elif self.peek() != ")":
                args.append(self.expr())
                while self.peek() == ",":
                    self.take()
                    args.append(self.expr())
            self.take(")")
            if fn not in _AGGS | _FUNCS:
                raise ValueError(f"ES|QL: unknown function {fn!r}")
            return ("call", fn, args)
        return ("id", t)


def parse_esql(q: str) -> list[tuple]:
    stages = []
    parts = [p.strip() for p in _split_pipes(q.strip())]
    if parts and parts[0].upper().startswith("ROW "):
        # ROW source (ES|QL): a literal one-row table — the pipe
        # playground / computed-constants source.
        assigns = []
        for piece in _split_top(parts[0][4:]):
            alias, _, e = piece.partition("=")
            assigns.append((alias.strip(), _P(e).expr()))
        if not assigns:
            raise ValueError("ES|QL: ROW needs at least one column")
        stages.append(("row", assigns))
    elif not parts or not parts[0].upper().startswith("FROM "):
        raise ValueError("ES|QL: query must start with FROM or ROW")
    else:
        stages.append(("from", parts[0][5:].strip()))
    for part in parts[1:]:
        stages.append(_parse_command(part))
    _check_tail(stages)
    return stages


def _check_tail(stages: list[tuple]) -> None:
    # SORT/LIMIT must be trailing (the SQL render hoists them to the
    # outermost query; a mid-pipeline sort would silently reorder-only).
    seen_tail = False
    for st in stages:
        if st[0] in ("sort", "limit"):
            seen_tail = True
        elif seen_tail:
            raise ValueError(
                "ES|QL: SORT/LIMIT must be the trailing commands"
            )


def _split_pipes(s: str) -> list[str]:
    """Split a pipeline on | at paren depth 0, outside quotes — so
    FORK branch sub-pipelines and quoted patterns survive intact."""
    out, depth, cur, quote = [], 0, [], None
    for ch in s:
        if quote:
            if ch == quote:
                quote = None
        elif ch in ("'", '"'):
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "|" and depth == 0 and quote is None:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return out


def _parse_command(part: str) -> tuple:
    cmd, _, rest = part.partition(" ")
    cmd = cmd.upper()
    if cmd == "WHERE":
        return (("where", _P(rest).expr()))
    if cmd == "EVAL":
        assigns = []
        for piece in _split_top(rest):
            alias, _, e = piece.partition("=")
            assigns.append((alias.strip(), _P(e).expr()))
        return (("eval", assigns))
    if cmd == "KEEP":
        return (("keep", [c.strip() for c in rest.split(",")]))
    if cmd == "DROP":
        return (("drop", [c.strip() for c in rest.split(",")]))
    if cmd == "RENAME":
        pairs = []
        for piece in rest.split(","):
            m4 = re.fullmatch(
                r"\s*(\w+)\s+AS\s+(\w+)\s*", piece, re.IGNORECASE
            )
            if not m4:
                raise ValueError(f"ES|QL: bad RENAME clause {piece!r}")
            pairs.append((m4.group(1), m4.group(2)))
        return (("rename", pairs))
    if cmd == "INLINESTATS":
        aggpart, by = rest, []
        m = re.search(r"\bBY\b", rest, re.IGNORECASE)
        if m:
            aggpart = rest[: m.start()]
            by = [c.strip() for c in rest[m.end():].split(",")]
        aggs = []
        for piece in _split_top(aggpart):
            alias, _, e = piece.partition("=")
            aggs.append((alias.strip(), _P(e).expr()))
        return (("inlinestats", aggs, by))
    if cmd == "STATS":
        aggpart, by = rest, []
        m = re.search(r"\bBY\b", rest, re.IGNORECASE)
        if m:
            aggpart = rest[: m.start()]
            # BY items: bare column, or alias = expr (8.x grouping
            # expressions, incl. BUCKET) — top-level split so a
            # BUCKET(ts, 1 day) comma doesn't shear the item.
            for piece in _split_top(rest[m.end():]):
                piece = piece.strip()
                if re.fullmatch(r"\w+", piece):
                    by.append((piece, None))
                else:
                    m6 = re.match(r"(\w+)\s*=\s*(.+)", piece, re.DOTALL)
                    if not m6 or m6.group(2).startswith("="):
                        raise ValueError(
                            f"ES|QL: bad STATS BY item {piece!r}"
                        )
                    by.append((m6.group(1), _P(m6.group(2)).expr()))
        aggs = []
        for piece in _split_top(aggpart):
            alias, _, e = piece.partition("=")
            # per-agg filter (8.16): alias = AGG(expr) WHERE cond
            mw = re.search(r"\bWHERE\b", e, re.IGNORECASE)
            cond = None
            if mw:
                cond = _P(e[mw.end():]).expr()
                e = e[: mw.start()]
            aggs.append((alias.strip(), _P(e).expr(), cond))
        return (("stats", aggs, by))
    if cmd == "SORT":
        keys = []
        for piece in rest.split(","):
            bits = piece.split()
            keys.append((bits[0], len(bits) > 1 and bits[1].upper() == "DESC"))
        return (("sort", keys))
    if cmd == "ENRICH":
        m2 = re.fullmatch(
            r"(\w+)\s+ON\s+(\w+)\s*==\s*(\w+)\s+WITH\s+(.+)",
            rest.strip(), re.IGNORECASE,
        )
        if not m2:
            raise ValueError(f"ES|QL: bad ENRICH clause {rest!r}")
        return (
            (
                "enrich",
                m2.group(1),
                m2.group(2),
                m2.group(3),
                [c.strip() for c in m2.group(4).split(",")],
            )
        )
    if cmd == "LOOKUP":
        m5 = re.fullmatch(
            r"JOIN\s+(\w+)\s+ON\s+(\w+)", rest.strip(), re.IGNORECASE
        )
        if not m5:
            raise ValueError(f"ES|QL: bad LOOKUP JOIN clause {rest!r}")
        return (("lookup", m5.group(1), m5.group(2)))
    if cmd == "MV_EXPAND":
        col = rest.strip()
        if not re.fullmatch(r"\w+", col):
            raise ValueError(f"ES|QL: bad MV_EXPAND column {rest!r}")
        return (("mv_expand", col))
    if cmd == "GROK":
        # GROK <field> '<pattern>': %{ALIAS:name} refs expand from
        # the shared RE2-safe library (functions/ingestpipeline.py);
        # the compiled stage is the same regexp_extract projection
        # DISSECT lowers to, so it reuses that stage kind — grok is
        # unanchored (ES semantics: match anywhere), dissect anchors.
        from unichem2index_spark.functions.ingestpipeline import (
            grok_to_regex,
        )

        m7 = re.fullmatch(
            r"(\w+)\s+'([^']*)'", rest.strip()
        ) or re.fullmatch(r'(\w+)\s+"([^"]*)"', rest.strip())
        if not m7:
            raise ValueError(f"ES|QL: bad GROK clause {rest!r}")
        rx, names = grok_to_regex(m7.group(2))
        if not names:
            raise ValueError("ES|QL: GROK pattern has no named captures")
        return (("dissect", m7.group(1), rx, names))
    if cmd == "DISSECT":
        m3 = re.fullmatch(
            r"(\w+)\s+'([^']*)'", rest.strip()
        ) or re.fullmatch(r'(\w+)\s+"([^"]*)"', rest.strip())
        if not m3:
            raise ValueError(f"ES|QL: bad DISSECT clause {rest!r}")
        field, pat = m3.group(1), m3.group(2)
        names = re.findall(r"%\{(\w+)\}", pat)
        if not names:
            raise ValueError("ES|QL: DISSECT pattern has no %{name}")
        lits = re.split(r"%\{\w+\}", pat)
        rx = "^" + re.escape(lits[0])
        for i, lit in enumerate(lits[1:]):
            last = i == len(names) - 1
            esc = re.escape(lit)
            rx += ("(.*)" if last and not lit else "(.*?)") + esc
        rx += "$"
        return (("dissect", field, rx, names))
    if cmd == "CHANGE_POINT":
        # CHANGE_POINT <value> ON <order> [BY <key>] (8.18): the
        # most likely step change of the value series ordered by
        # <order> — the same deterministic CUSUM-style scan
        # statistic as textstats.change_point_agg, generalized to
        # the piped table. BY is this dialect's per-series grouping
        # (ES runs the command per index stream); ES's ML variant
        # emits a pvalue and is not reproducible across runs — this
        # one is, by construction. Integer value columns keep the
        # prefix sums exact (the entry feeds a COUNT).
        m8 = re.fullmatch(
            r"(\w+)\s+ON\s+(\w+)(?:\s+BY\s+(\w+))?",
            rest.strip(),
            re.IGNORECASE,
        )
        if not m8:
            raise ValueError(f"ES|QL: bad CHANGE_POINT clause {rest!r}")
        return (
            ("change_point", m8.group(1), m8.group(2), m8.group(3))
        )
    if cmd == "SAMPLE":
        # SAMPLE <probability> (8.16+): ES keeps each row with
        # pseudo-random probability p — not reproducible across
        # runs. The engine's deterministic reading reuses the
        # random_sampler_agg bucket hash on the pipeline's doc_id
        # column: keep rows whose hash bucket is 0 out of
        # round(1/p). p is restricted to 1/k (integer k >= 2) so
        # the kept fraction is EXACT, and the same row is kept at
        # any parallelism — the reproducibility contract ES's
        # `seed` parameter only approximates.
        p = float(rest.strip())
        if not (0.0 < p < 1.0):
            raise ValueError("ES|QL: SAMPLE needs 0 < p < 1")
        den = round(1.0 / p)
        if den < 2 or abs(1.0 / den - p) > 1e-9:
            raise ValueError(
                "ES|QL: SAMPLE p must be 1/k for integer k >= 2"
            )
        return (("sample", den))
    if cmd == "LIMIT":
        return (("limit", int(rest.strip())))
    if cmd == "FORK":
        # FORK (branch) (branch) ... (ES|QL 9.x): run each branch
        # sub-pipeline on the current table, tag rows with _fork =
        # "fork1"/"fork2"/..., and union the results. Branches must
        # produce union-compatible schemas (ES null-pads missing
        # columns; this dialect requires agreement — unionByName
        # raises otherwise, which is the honest failure). Nested FORK
        # is rejected. Spark side is a plan-level UNION of the shared
        # scan — Catalyst reuses the exchange where branches share
        # prefixes.
        branches = []
        depth, cur, quote = 0, [], None
        for ch in rest:
            if quote:
                if ch == quote:
                    quote = None
            elif ch in ("'", '"'):
                quote = ch
            elif ch == "(":
                depth += 1
                if depth == 1:
                    cur = []
                    continue
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    branches.append("".join(cur))
                    continue
            if depth >= 1:
                cur.append(ch)
        if depth != 0 or len(branches) < 2:
            raise ValueError(
                "ES|QL: FORK needs >= 2 parenthesized branches"
            )
        parsed = []
        for b in branches:
            sub = [
                _parse_command(pc.strip())
                for pc in _split_pipes(b)
                if pc.strip()
            ]
            if any(s[0] == "fork" for s in sub):
                raise ValueError("ES|QL: nested FORK is not supported")
            _check_tail(sub)
            parsed.append(sub)
        return ("fork", parsed)
    raise ValueError(f"ES|QL: unknown command {cmd!r}")



def _split_top(s: str) -> list[str]:
    """Split on commas not inside parentheses."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if "".join(cur).strip():
        out.append("".join(cur))
    return out


_CMP = {"==": "=", "!=": "!=", ">": ">", ">=": ">=", "<": "<", "<=": "<="}


def _top_args(args) -> tuple[int, str]:
    """Validate TOP(x, n, "asc"|"desc") arguments once for both renders."""
    if (
        len(args) != 3
        or args[1][0] != "lit"
        or args[2][0] != "lit"
        or str(args[2][1]).lower() not in ("asc", "desc")
        or int(args[1][1]) < 1
    ):
        raise ValueError('ES|QL: TOP(x, n>=1, "asc"|"desc") with literals')
    return int(args[1][1]), str(args[2][1]).lower()


def _sp(node) -> Column:
    kind = node[0]
    if kind == "lit":
        return F.lit(node[1])
    if kind == "id":
        return F.col(node[1])
    if kind == "neg":
        return -_sp(node[1])
    if kind == "not":
        return ~_sp(node[1])
    if kind == "isnull":
        col = _sp(node[1])
        return col.isNotNull() if node[2] else col.isNull()
    if kind == "like":
        # ES|QL LIKE: * = any run, ? = one char (Lucene wildcard syntax;
        # %/_ rejected at parse time — no escape-dialect divergence).
        return _sp(node[1]).like(node[2].replace("*", "%").replace("?", "_"))
    if kind == "in":
        return _sp(node[1]).isin(list(node[2]))
    if kind == "call":
        fn, args = node[1], node[2]
        if fn == "round":
            d = args[1][1] if len(args) > 1 else 0
            return F.round(_sp(args[0]), int(d))
        if fn == "length":
            return F.length(_sp(args[0]))
        if fn == "abs":
            return F.abs(_sp(args[0]))
        if fn == "split":
            # LITERAL delimiter (ES|QL split): Spark's split takes a
            # regex, so the delimiter is re-escaped.
            if args[1][0] != "lit" or not isinstance(args[1][1], str):
                raise ValueError("ES|QL: SPLIT needs a quoted delimiter")
            return F.split(_sp(args[0]), re.escape(args[1][1]))
        if fn == "contains_term":
            # ES|QL match()-family analog: analyzer-tokenized membership.
            from unichem2index_spark.functions.tokenize import tokens_col

            return F.array_contains(
                tokens_col(_sp(args[0])), str(args[1][1])
            )
        if fn == "categorize":
            # STATS ... BY CATEGORIZE(text) (ES|QL 8.18): the same
            # deterministic prefix-skeleton reading as
            # textstats.categorize_text_agg — first 2 analyzer tokens,
            # number-bearing tokens wildcarded (ES's drain tree depends
            # on arrival order; this is reproducible at any layout).
            from unichem2index_spark.functions.tokenize import tokens_col

            return F.concat_ws(
                " ",
                F.transform(
                    F.slice(tokens_col(_sp(args[0])), 1, 2),
                    lambda x: F.when(
                        x.rlike("[0-9]"), F.lit("*")
                    ).otherwise(x),
                ),
            )
        if fn == "count":
            return F.count(F.lit(1)) if args[0][0] == "star" else F.count(_sp(args[0]))
        if fn == "avg":
            # exact integer sum, ONE divide — identical across engines
            return F.sum(_sp(args[0])).cast("double") / F.count(F.lit(1))
        if fn == "median":
            # exact interpolated median — what ES's t-digest MEDIAN
            # converges to; Spark percentile == DuckDB quantile_cont
            # hash-identically (the doclen_percentiles discipline)
            return F.percentile(_sp(args[0]), F.lit(0.5))
        if fn == "percentile":
            if args[1][0] != "lit":
                raise ValueError("ES|QL: PERCENTILE needs a literal p")
            return F.percentile(_sp(args[0]), F.lit(float(args[1][1])))
        if fn == "count_distinct":
            # EXACT distinct count — ES|QL's COUNT_DISTINCT is an HLL
            # estimate; the exact form is what it converges to and is
            # the only hash-checkable reading (documented divergence).
            return F.count_distinct(_sp(args[0]))
        if fn == "case":
            # CASE(cond, val, [cond, val ...], default) — chained WHEN.
            if len(args) < 3 or len(args) % 2 == 0:
                raise ValueError("ES|QL: CASE takes cond/value pairs + default")
            col = F.when(_sp(args[0]), _sp(args[1]))
            for i in range(2, len(args) - 1, 2):
                col = col.when(_sp(args[i]), _sp(args[i + 1]))
            return col.otherwise(_sp(args[-1]))
        if fn == "bucket":
            # span validated at parse time to a 1-unit calendar span
            return F.date_trunc(str(args[1][1]), _sp(args[0]))
        if fn == "date_trunc":
            return F.date_trunc(str(args[0][1]), _sp(args[1]))
        if fn == "date_extract":
            if args[0][0] != "lit" or str(args[0][1]) not in _EXTRACT_PARTS:
                raise ValueError(
                    "ES|QL: DATE_EXTRACT part must be one of "
                    f"{sorted(_EXTRACT_PARTS)}"
                )
            # extract returns int32 in Spark but BIGINT in DuckDB —
            # pinned to long (the retention_cohort datediff lesson)
            sp_fn = _EXTRACT_PARTS[str(args[0][1])][0]
            return getattr(F, sp_fn)(_sp(args[1])).cast("long")
        if fn == "date_format":
            if args[0][0] != "lit" or str(args[0][1]) not in _DATE_FMTS:
                raise ValueError(
                    f"ES|QL: DATE_FORMAT pattern must be one of "
                    f"{sorted(_DATE_FMTS)}"
                )
            return F.date_format(_sp(args[1]), str(args[0][1]))
        if fn == "mv_count":
            return F.size(_sp(args[0])).cast("long")
        if fn == "mv_max":
            # lexicographic for strings, numeric for numbers — the same
            # total order both engines use for array element compare
            return F.array_max(_sp(args[0]))
        if fn == "mv_min":
            return F.array_min(_sp(args[0]))
        if fn in ("concat", "coalesce"):
            return getattr(F, fn)(*[_sp(a) for a in args])
        if fn == "substring":
            # 1-based literal bounds; negative start rejected (Spark
            # counts a negative pos from the end and clips differently
            # than DuckDB — only the common 1-based form is safe).
            if (
                len(args) != 3
                or args[1][0] != "lit"
                or args[2][0] != "lit"
                or int(args[1][1]) < 1
                or int(args[2][1]) < 0
            ):
                raise ValueError(
                    "ES|QL: SUBSTRING(s, start>=1, len>=0) with literals"
                )
            return F.substring(_sp(args[0]), int(args[1][1]), int(args[2][1]))
        if fn == "to_upper":
            return F.upper(_sp(args[0]))
        if fn == "to_lower":
            return F.lower(_sp(args[0]))
        if fn == "starts_with":
            return F.startswith(_sp(args[0]), _sp(args[1]))
        if fn == "ends_with":
            return F.endswith(_sp(args[0]), _sp(args[1]))
        if fn in ("left", "right"):
            # native left/right on BOTH engines: for strings shorter
            # than n they return the whole string, which a substring
            # render would NOT reproduce (Spark substring('ab',-5,5)='')
            if args[1][0] != "lit" or int(args[1][1]) < 0:
                raise ValueError(f"ES|QL: {fn.upper()} needs a literal n>=0")
            return F.call_function(
                fn, _sp(args[0]), F.lit(int(args[1][1]))
            )
        if fn == "replace":
            # ES|QL REPLACE is regex-based; literal pattern/replacement
            # so both engines compile the same RE.
            if args[1][0] != "lit" or args[2][0] != "lit":
                raise ValueError("ES|QL: REPLACE needs literal pat/new")
            return F.regexp_replace(
                _sp(args[0]), str(args[1][1]), str(args[2][1])
            )
        if fn == "top":
            # TOP(x, n, "asc"|"desc"): multivalue in ES|QL — serialized
            # to "v1,v2,..." inside the agg (canon-compat: no raw
            # arrays leave an entry). Full sort THEN slice: ties are
            # equal values, so the cut is deterministic.
            n, order = _top_args(args)
            arr = F.slice(
                F.sort_array(
                    F.collect_list(_sp(args[0])), asc=(order == "asc")
                ),
                1,
                n,
            )
            return F.array_join(
                F.transform(arr, lambda x: x.cast("string")), ","
            )
        if fn == "values":
            # VALUES(x): the distinct multivalue — ES leaves it
            # unordered; serialized-ascending is the deterministic form.
            return F.array_join(
                F.transform(
                    F.sort_array(F.collect_set(_sp(args[0]))),
                    lambda x: x.cast("string"),
                ),
                ",",
            )
        return getattr(F, fn)(_sp(args[0]))
    op, l, r = node[1], _sp(node[2]), _sp(node[3])
    if op == "and":
        return l & r
    if op == "or":
        return l | r
    if op == "==":
        return l == r
    if op == "!=":
        return l != r
    if op in (">", ">=", "<", "<="):
        return {"<": l < r, "<=": l <= r, ">": l > r, ">=": l >= r}[op]
    if op == "%":
        return l % r
    return {"+": l + r, "-": l - r, "*": l * r, "/": l / r}[op]


def _sq(node) -> str:
    kind = node[0]
    if kind == "lit":
        v = node[1]
        return "'" + v.replace("'", "''") + "'" if isinstance(v, str) else repr(v)
    if kind == "id":
        return node[1]
    if kind == "neg":
        return f"(-{_sq(node[1])})"
    if kind == "not":
        return f"(NOT {_sq(node[1])})"
    if kind == "isnull":
        return f"({_sq(node[1])} IS {'NOT ' if node[2] else ''}NULL)"
    if kind == "like":
        pat = node[2].replace("'", "''").replace("*", "%").replace("?", "_")
        return f"({_sq(node[1])} LIKE '{pat}')"
    if kind == "in":
        vals = ", ".join(
            "'" + v.replace("'", "''") + "'" if isinstance(v, str) else repr(v)
            for v in node[2]
        )
        return f"({_sq(node[1])} IN ({vals}))"
    if kind == "call":
        fn, args = node[1], node[2]
        if fn == "split":
            if args[1][0] != "lit" or not isinstance(args[1][1], str):
                raise ValueError("ES|QL: SPLIT needs a quoted delimiter")
            d = args[1][1].replace("'", "''")
            return f"string_split({_sq(args[0])}, '{d}')"
        if fn == "categorize":
            from unichem2index_spark.functions.tokenize import TOKEN_PATTERN

            return (
                f"array_to_string(list_transform("
                f"regexp_extract_all(lower({_sq(args[0])}), "
                f"'{TOKEN_PATTERN}')[1:2], "
                f"x -> CASE WHEN regexp_matches(x, '[0-9]') "
                f"THEN '*' ELSE x END), ' ')"
            )
        if fn == "contains_term":
            from unichem2index_spark.functions.tokenize import TOKEN_PATTERN

            term = str(args[1][1]).replace("'", "''")
            return (
                f"list_contains(regexp_extract_all(lower({_sq(args[0])}), "
                f"'{TOKEN_PATTERN}'), '{term}')"
            )
        if fn == "count":
            return "count(*)" if args[0][0] == "star" else f"count({_sq(args[0])})"
        if fn == "avg":
            return (
                f"(CAST(sum({_sq(args[0])}) AS DOUBLE) / count(*))"
            )
        if fn == "sum":
            # DuckDB renders sum(BIGINT) as HUGEINT, which pandas
            # canonicalizes to float64 while Spark's sum(long) stays
            # int64 — same value, different hash. ES|QL SUM over
            # integer fields is long, so pin the oracle to BIGINT.
            return f"CAST(sum({_sq(args[0])}) AS BIGINT)"
        if fn == "round" and len(args) > 1:
            return f"round({_sq(args[0])}, {int(args[1][1])})"
        if fn == "median":
            return f"quantile_cont({_sq(args[0])}, 0.5)"
        if fn == "percentile":
            if args[1][0] != "lit":
                raise ValueError("ES|QL: PERCENTILE needs a literal p")
            return f"quantile_cont({_sq(args[0])}, {float(args[1][1])!r})"
        if fn == "count_distinct":
            return f"count(DISTINCT {_sq(args[0])})"
        if fn == "case":
            if len(args) < 3 or len(args) % 2 == 0:
                raise ValueError("ES|QL: CASE takes cond/value pairs + default")
            whens = " ".join(
                f"WHEN {_sq(args[i])} THEN {_sq(args[i + 1])}"
                for i in range(0, len(args) - 1, 2)
            )
            return f"(CASE {whens} ELSE {_sq(args[-1])} END)"
        if fn == "bucket":
            # CAST pins DuckDB's per-unit DATE/TIMESTAMP return types to
            # Spark's date_trunc timestamp (same pin as CUMULATIVE_SUM).
            return (
                f"CAST(date_trunc('{args[1][1]}', {_sq(args[0])}) "
                "AS TIMESTAMP)"
            )
        if fn == "date_trunc":
            return (
                f"CAST(date_trunc('{args[0][1]}', {_sq(args[1])}) "
                "AS TIMESTAMP)"
            )
        if fn == "date_extract":
            if args[0][0] != "lit" or str(args[0][1]) not in _EXTRACT_PARTS:
                raise ValueError(
                    "ES|QL: DATE_EXTRACT part must be one of "
                    f"{sorted(_EXTRACT_PARTS)}"
                )
            sq_fn = _EXTRACT_PARTS[str(args[0][1])][1]
            return f"CAST({sq_fn}({_sq(args[1])}) AS BIGINT)"
        if fn == "date_format":
            if args[0][0] != "lit" or str(args[0][1]) not in _DATE_FMTS:
                raise ValueError(
                    f"ES|QL: DATE_FORMAT pattern must be one of "
                    f"{sorted(_DATE_FMTS)}"
                )
            return f"strftime({_sq(args[1])}, '{_DATE_FMTS[str(args[0][1])]}')"
        if fn == "mv_count":
            return f"CAST(len({_sq(args[0])}) AS BIGINT)"
        if fn == "mv_max":
            return f"list_max({_sq(args[0])})"
        if fn == "mv_min":
            return f"list_min({_sq(args[0])})"
        if fn == "concat":
            # || is null-propagating like Spark's concat; DuckDB's own
            # concat() SKIPS nulls — the one render that would diverge.
            return "(" + " || ".join(_sq(a) for a in args) + ")"
        if fn == "to_upper":
            return f"upper({_sq(args[0])})"
        if fn == "to_lower":
            return f"lower({_sq(args[0])})"
        if fn == "replace":
            if args[1][0] != "lit" or args[2][0] != "lit":
                raise ValueError("ES|QL: REPLACE needs literal pat/new")
            pat = str(args[1][1]).replace("'", "''")
            new = str(args[2][1]).replace("'", "''")
            return f"regexp_replace({_sq(args[0])}, '{pat}', '{new}', 'g')"
        if fn == "top":
            n, order = _top_args(args)
            return (
                f"array_to_string(list_transform((list_sort(list("
                f"{_sq(args[0])}), '{order.upper()}'))[1:{n}], "
                "x -> CAST(x AS VARCHAR)), ',')"
            )
        if fn == "values":
            return (
                f"array_to_string(list_transform(list_sort(list(DISTINCT "
                f"{_sq(args[0])})), x -> CAST(x AS VARCHAR)), ',')"
            )
        if fn == "substring":
            # same validation as the Spark render — both renders must
            # reject what either engine can't do identically
            if (
                len(args) != 3
                or args[1][0] != "lit"
                or args[2][0] != "lit"
                or int(args[1][1]) < 1
                or int(args[2][1]) < 0
            ):
                raise ValueError(
                    "ES|QL: SUBSTRING(s, start>=1, len>=0) with literals"
                )
            return (
                f"substring({_sq(args[0])}, {int(args[1][1])}, "
                f"{int(args[2][1])})"
            )
        if fn in ("left", "right"):
            if args[1][0] != "lit" or int(args[1][1]) < 0:
                raise ValueError(f"ES|QL: {fn.upper()} needs a literal n>=0")
            return f"{fn}({_sq(args[0])}, {int(args[1][1])})"
        # starts_with/ends_with/coalesce/trim share their DuckDB names
        # with the generic render
        return f"{fn}({', '.join(_sq(a) for a in args)})"
    op, l, r = node[1], _sq(node[2]), _sq(node[3])
    sqlop = {"and": "AND", "or": "OR"}.get(op, _CMP.get(op, op))
    return f"({l} {sqlop} {r})"


def _sp_agg(node, cond) -> Column:
    """STATS aggregate, optionally with an 8.16 per-agg WHERE filter —
    Spark's conditional-aggregation idiom: agg over ``F.when(cond, x)``
    (nulls don't count/sum), which keeps the filter INSIDE the one
    hash-aggregate — no extra scan per filtered agg at any scale."""
    if cond is None:
        return _sp(node)
    if node[0] != "call" or node[1] not in _AGGS:
        raise ValueError("ES|QL: per-agg WHERE needs an aggregate call")
    fn, args = node[1], node[2]
    if fn in ("top", "values"):
        raise ValueError("ES|QL: per-agg WHERE is not supported for TOP/VALUES")
    c = _sp(cond)
    if fn == "count":
        x = F.lit(1) if args[0][0] == "star" else _sp(args[0])
        return F.count(F.when(c, x))
    if fn == "avg":
        return (
            F.sum(F.when(c, _sp(args[0]))).cast("double")
            / F.count(F.when(c, F.lit(1)))
        )
    if fn == "median":
        return F.percentile(F.when(c, _sp(args[0])), F.lit(0.5))
    if fn == "percentile":
        return F.percentile(
            F.when(c, _sp(args[0])), F.lit(float(args[1][1]))
        )
    if fn == "count_distinct":
        return F.count_distinct(F.when(c, _sp(args[0])))
    return getattr(F, fn)(F.when(c, _sp(args[0])))


def _sq_agg(node, cond) -> str:
    """Oracle twin of :func:`_sp_agg` — SQL's ``FILTER (WHERE ...)``
    aggregate modifier, with the same HUGEINT→BIGINT pin on SUM."""
    if cond is None:
        return _sq(node)
    if node[0] != "call" or node[1] not in _AGGS:
        raise ValueError("ES|QL: per-agg WHERE needs an aggregate call")
    fn, args = node[1], node[2]
    if fn in ("top", "values"):
        raise ValueError("ES|QL: per-agg WHERE is not supported for TOP/VALUES")
    filt = f"FILTER (WHERE {_sq(cond)})"
    if fn == "count":
        inner = "count(*)" if args[0][0] == "star" else f"count({_sq(args[0])})"
        return f"{inner} {filt}"
    if fn == "sum":
        return f"CAST(sum({_sq(args[0])}) {filt} AS BIGINT)"
    if fn == "avg":
        return (
            f"(CAST(sum({_sq(args[0])}) {filt} AS DOUBLE) "
            f"/ count(*) {filt})"
        )
    if fn == "median":
        return f"quantile_cont({_sq(args[0])}, 0.5) {filt}"
    if fn == "percentile":
        return (
            f"quantile_cont({_sq(args[0])}, {float(args[1][1])!r}) {filt}"
        )
    if fn == "count_distinct":
        return f"count(DISTINCT {_sq(args[0])}) {filt}"
    return f"{fn}({_sq(args[0])}) {filt}"


def _sp_window(node, w) -> Column:
    """Aggregate call rendered as a window aggregate (INLINESTATS)."""
    if node[0] != "call" or node[1] not in _AGGS:
        raise ValueError("ES|QL: INLINESTATS takes aggregate calls")
    if node[1] in ("median", "percentile", "count_distinct", "top", "values"):
        raise ValueError(
            "ES|QL: order-statistic/distinct/multivalue aggs are STATS-only here"
        )
    fn, args = node[1], node[2]
    if fn == "count":
        base = F.count(F.lit(1)) if args[0][0] == "star" else F.count(_sp(args[0]))
        return base.over(w)
    if fn == "avg":
        return (
            F.sum(_sp(args[0])).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        )
    return getattr(F, fn)(_sp(args[0])).over(w)


def _sq_window(node, over: str) -> str:
    if node[0] != "call" or node[1] not in _AGGS:
        raise ValueError("ES|QL: INLINESTATS takes aggregate calls")
    if node[1] in ("median", "percentile", "count_distinct", "top", "values"):
        raise ValueError(
            "ES|QL: order-statistic/distinct/multivalue aggs are STATS-only here"
        )
    fn, args = node[1], node[2]
    if fn == "count":
        inner = "count(*)" if args[0][0] == "star" else f"count({_sq(args[0])})"
        return f"{inner} {over}"
    if fn == "avg":
        return (
            f"(CAST(sum({_sq(args[0])}) {over} AS DOUBLE) "
            f"/ count(*) {over})"
        )
    if fn == "sum":
        # Same HUGEINT→BIGINT pin as the non-window SUM render.
        return f"CAST(sum({_sq(args[0])}) {over} AS BIGINT)"
    return f"{fn}({_sq(args[0])}) {over}"


def compile_spark(stages: list[tuple], tables: dict) -> DataFrame:
    df = None
    for st in stages:
        if st[0] == "from":
            df = tables[st[1]]
        elif st[0] == "df":
            # internal: FORK seeds a branch with the current plan
            df = st[1]
        elif st[0] == "fork":
            outs = []
            for bi, branch in enumerate(st[1], 1):
                bdf = compile_spark([("df", df)] + branch, tables)
                outs.append(bdf.withColumn("_fork", F.lit(f"fork{bi}")))
            out = outs[0]
            for bdf in outs[1:]:
                out = out.unionByName(bdf)
            df = out
        elif st[0] == "row":
            from pyspark.sql import SparkSession

            spark = SparkSession.getActiveSession()
            df = spark.range(1).select(
                *[_sp(e).alias(a) for a, e in st[1]]
            )
        elif st[0] == "where":
            df = df.where(_sp(st[1]))
        elif st[0] == "eval":
            for alias, e in st[1]:
                df = df.withColumn(alias, _sp(e))
        elif st[0] == "keep":
            df = df.select(*st[1])
        elif st[0] == "drop":
            df = df.drop(*st[1])
        elif st[0] == "rename":
            for old, new in st[1]:
                df = df.withColumnRenamed(old, new)
        elif st[0] == "dissect":
            _, field, rx, names = st
            for i, name in enumerate(names):
                df = df.withColumn(
                    name, F.regexp_extract(F.col(field), rx, i + 1)
                )
        elif st[0] == "enrich":
            # ES ENRICH is a broadcast lookup against a small policy
            # index — exactly Spark's broadcast hash join.
            _, tbl, lk, rk, cols = st
            lookup = tables[tbl].select(rk, *cols)
            df = df.join(
                F.broadcast(lookup), df[lk] == lookup[rk], "left"
            ).drop(rk)
        elif st[0] == "lookup":
            # ES|QL LOOKUP JOIN (8.18): left join against a lookup-mode
            # index on a SHARED column name — lookup indexes are small
            # and replicated in ES, i.e. exactly a broadcast hash join.
            _, tbl, key = st
            df = df.join(F.broadcast(tables[tbl]), key, "left")
        elif st[0] == "mv_expand":
            # ES|QL MV_EXPAND: one row per element of the multivalue
            # column, keeping the name. Empty/null multivalues drop the
            # row on BOTH engines (Spark explode == DuckDB unnest) — a
            # documented divergence from ES, which keeps a null row.
            df = df.withColumn(st[1], F.explode(st[1]))
        elif st[0] == "stats":
            aggs = [_sp_agg(e, cond).alias(a) for a, e, cond in st[1]]
            names = []
            for name, e in st[2]:
                if e is not None:  # BY alias = expr (incl. BUCKET)
                    df = df.withColumn(name, _sp(e))
                names.append(name)
            df = df.groupBy(*names).agg(*aggs) if names else df.agg(*aggs)
        elif st[0] == "inlinestats":
            # ES|QL INLINESTATS: group aggregates joined back to every
            # row — Spark's window aggregate, no self-join.
            from pyspark.sql.window import Window as _W

            w = _W.partitionBy(*st[2]) if st[2] else _W.partitionBy()
            for alias, e in st[1]:
                df = df.withColumn(alias, _sp_window(e, w))
        elif st[0] == "change_point":
            # One ordered window per series over the (already reduced)
            # piped rows — exact integer prefix sums, ONE shared float
            # tree, argmax with an order-column tie-break. Mirrors
            # textstats.change_point_agg expression for expression.
            from pyspark.sql.window import Window as _W

            _, vcol, ocol, key = st
            keys = [key] if key else []
            w = (_W.partitionBy(*keys) if keys else _W.partitionBy()).orderBy(
                ocol
            )
            wall = _W.partitionBy(*keys) if keys else _W.partitionBy()
            pre = (
                df.withColumn("_i", F.row_number().over(w))
                .withColumn(
                    "_cum",
                    F.sum(vcol).over(
                        w.rowsBetween(
                            _W.unboundedPreceding, _W.currentRow
                        )
                    ),
                )
                .withColumn("_N", F.count(F.lit(1)).over(wall))
                .withColumn("_S", F.sum(vcol).over(wall))
                .withColumn("change_at", F.lead(ocol, 1).over(w))
            )
            splits = pre.where(F.col("_i") < F.col("_N"))
            i = F.col("_i").cast("double")
            cum = F.col("_cum").cast("double")
            n = F.col("_N").cast("double")
            s = F.col("_S").cast("double")
            mean_l = cum / i
            mean_r = (s - cum) / (n - i)
            stat = F.abs(mean_r - mean_l) * F.sqrt(i * (n - i) / n)
            scored = splits.withColumn("_stat", stat)
            best = (
                _W.partitionBy(*keys) if keys else _W.partitionBy()
            ).orderBy(F.desc("_stat"), F.asc(ocol))
            df = (
                scored.withColumn("_rk", F.row_number().over(best))
                .where(F.col("_rk") == 1)
                .select(
                    *keys,
                    "change_at",
                    F.round(F.col("_stat"), 6).alias("stat"),
                    F.round(mean_l, 6).alias("mean_before"),
                    F.round(mean_r, 6).alias("mean_after"),
                )
            )
        elif st[0] == "sample":
            # Deterministic hash-bucket sample — a pushed-down map-side
            # filter (no shuffle, no RNG state), so Catalyst prunes the
            # scan before any downstream agg sees the dropped rows.
            from unichem2index_spark.functions.hashing import (
                FP_MULT,
                MOD,
            )

            h = ((F.col("doc_id") % MOD + 1) * FP_MULT) % MOD % st[1]
            df = df.where(h == 0)
        elif st[0] == "sort":
            # ES|QL treats null as LARGER than any value (asc → nulls
            # last, desc → nulls first). Spark's bare asc() is
            # nulls-FIRST — a silent divergence on nullable sort keys
            # (lookup misses), so the null order is always explicit.
            df = df.orderBy(
                *[
                    F.desc_nulls_first(c) if d else F.asc_nulls_last(c)
                    for c, d in st[1]
                ]
            )
        elif st[0] == "limit":
            df = df.limit(st[1])
    return df


def compile_sql(stages: list[tuple]) -> str:
    sql = None
    tail = []
    for st in stages:
        if st[0] == "from":
            sql = f"SELECT * FROM {st[1]}"
        elif st[0] == "sql":
            # internal: FORK seeds a branch with the current rendering
            sql = st[1]
        elif st[0] == "fork":
            outs = []
            for bi, branch in enumerate(st[1], 1):
                bsql = compile_sql([("sql", sql)] + branch)
                outs.append(
                    f"SELECT *, 'fork{bi}' AS _fork FROM ({bsql})"
                )
            sql = " UNION ALL ".join(outs)
        elif st[0] == "row":
            evals = ", ".join(f"{_sq(e)} AS {a}" for a, e in st[1])
            sql = f"SELECT {evals}"
        elif st[0] == "where":
            sql = f"SELECT * FROM ({sql}) WHERE {_sq(st[1])}"
        elif st[0] == "eval":
            evals = ", ".join(f"{_sq(e)} AS {a}" for a, e in st[1])
            sql = f"SELECT *, {evals} FROM ({sql})"
        elif st[0] == "keep":
            sql = f"SELECT {', '.join(st[1])} FROM ({sql})"
        elif st[0] == "drop":
            cols = ", ".join(st[1])
            sql = f"SELECT * EXCLUDE ({cols}) FROM ({sql})"
        elif st[0] == "rename":
            ren = ", ".join(f"{o} AS {n}" for o, n in st[1])
            excl = ", ".join(o for o, _ in st[1])
            sql = f"SELECT * EXCLUDE ({excl}), {ren} FROM ({sql})"
        elif st[0] == "dissect":
            _, field, rx, names = st
            rx_sql = rx.replace("'", "''")
            evals = ", ".join(
                f"regexp_extract({field}, '{rx_sql}', {i + 1}) AS {n}"
                for i, n in enumerate(names)
            )
            sql = f"SELECT *, {evals} FROM ({sql})"
        elif st[0] == "enrich":
            _, tbl, lk, rk, cols = st
            proj = ", ".join(f"r.{c}" for c in cols)
            sql = (
                f"SELECT l.*, {proj} FROM ({sql}) l "
                f"LEFT JOIN {tbl} r ON l.{lk} = r.{rk}"
            )
        elif st[0] == "lookup":
            _, tbl, key = st
            sql = (
                f"SELECT l.*, r.* EXCLUDE ({key}) FROM ({sql}) l "
                f"LEFT JOIN {tbl} r ON l.{key} = r.{key}"
            )
        elif st[0] == "mv_expand":
            col = st[1]
            sql = (
                f"SELECT * EXCLUDE ({col}), unnest({col}) AS {col} "
                f"FROM ({sql})"
            )
        elif st[0] == "inlinestats":
            over = (
                "OVER (PARTITION BY " + ", ".join(st[2]) + ")"
                if st[2] else "OVER ()"
            )
            evals = ", ".join(
                f"{_sq_window(e, over)} AS {a}" for a, e in st[1]
            )
            sql = f"SELECT *, {evals} FROM ({sql})"
        elif st[0] == "stats":
            aggs = ", ".join(
                f"{_sq_agg(e, cond)} AS {a}" for a, e, cond in st[1]
            )
            if st[2]:
                sel = ", ".join(
                    name if e is None else f"{_sq(e)} AS {name}"
                    for name, e in st[2]
                )
                names = ", ".join(name for name, _ in st[2])
                sql = (
                    f"SELECT {sel}, {aggs} FROM ({sql}) GROUP BY {names}"
                )
            else:
                sql = f"SELECT {aggs} FROM ({sql})"
        elif st[0] == "change_point":
            _, v, o, key = st
            part = f"PARTITION BY {key} " if key else ""
            pall = f"PARTITION BY {key}" if key else ""
            keysel = f"{key}, " if key else ""
            sql = f"""SELECT {keysel}change_at, round(_stat, 6) AS stat,
  round(CAST(_cum AS DOUBLE) / CAST(_i AS DOUBLE), 6) AS mean_before,
  round((CAST(_S AS DOUBLE) - CAST(_cum AS DOUBLE))
        / (CAST(_N AS DOUBLE) - CAST(_i AS DOUBLE)), 6) AS mean_after
FROM (
  SELECT *, row_number() OVER ({part}ORDER BY _stat DESC, {o} ASC) AS _rk
  FROM (
    SELECT *,
      abs((CAST(_S AS DOUBLE) - CAST(_cum AS DOUBLE))
            / (CAST(_N AS DOUBLE) - CAST(_i AS DOUBLE))
          - CAST(_cum AS DOUBLE) / CAST(_i AS DOUBLE))
      * sqrt(CAST(_i AS DOUBLE)
             * (CAST(_N AS DOUBLE) - CAST(_i AS DOUBLE))
             / CAST(_N AS DOUBLE)) AS _stat
    FROM (
      SELECT *,
        row_number() OVER ({part}ORDER BY {o}) AS _i,
        sum({v}) OVER ({part}ORDER BY {o}
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _cum,
        count(*) OVER ({pall}) AS _N,
        sum({v}) OVER ({pall}) AS _S,
        lead({o}, 1) OVER ({part}ORDER BY {o}) AS change_at
      FROM ({sql})
    ) WHERE _i < _N
  )
) WHERE _rk = 1"""
        elif st[0] == "sample":
            from unichem2index_spark.functions.hashing import (
                FP_MULT,
                MOD,
            )

            sql = (
                f"SELECT * FROM ({sql}) WHERE "
                f"((doc_id % {MOD} + 1) * {FP_MULT}) % {MOD} "
                f"% {st[1]} = 0"
            )
        elif st[0] == "sort":
            # explicit null order — the ES|QL null-is-largest contract
            # (DuckDB's configurable default_null_order must not leak in)
            tail.append(
                "ORDER BY "
                + ", ".join(
                    f"{c} {'DESC NULLS FIRST' if d else 'ASC NULLS LAST'}"
                    for c, d in st[1]
                )
            )
        elif st[0] == "limit":
            tail.append(f"LIMIT {st[1]}")
    return sql + ("\n" + "\n".join(tail) if tail else "")
