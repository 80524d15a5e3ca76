"""ES ingest-pipeline processor chain (`PUT _ingest/pipeline` +
`_simulate`), compiled once and rendered twice — a Spark select list and
a DuckDB select list from the SAME processor walk, so engine and oracle
cannot drift (same pattern as functions/querystring.py).

Supported processors (the ingest-node core set; each mutates an ordered
field->expression mapping, exactly like ES's document-map mutation):

    {"set":       {"field": f, "value": v}}          # constant
    {"rename":    {"field": f, "target_field": g}}
    {"remove":    {"field": f}}
    {"lowercase": {"field": f}} / {"uppercase": {"field": f}}
    {"trim":      {"field": f}}
    {"gsub":      {"field": f, "pattern": p, "replacement": r}}
    {"split":     {"field": f, "separator": s[, "target_field": g]}}
    {"grok":      {"field": f, "pattern": "%{WORD:w} %{GREEDYDATA:rest}"}}

Grok follows ES ingest-node semantics: ``%{ALIAS:field}`` references
expand from a pattern library into capture groups, each named capture
becomes a NEW document field (the source field is kept), and literal
text between references is regex, exactly as in Logstash/ES grok. The
translated pattern stays within the regex subset both engines share
(RE2-safe: char classes, \\w/\\d/\\s, non-capturing groups), and both
engines' ``regexp_extract`` return '' on no-match, so the dual render
cannot drift.

The compiled pipeline is a MAP-ONLY projection — at 100 TB it fuses into
the scan (one stage, no shuffle), which is precisely why ES runs these
on ingest nodes: per-doc, embarrassingly parallel.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def _sq(s: str) -> str:
    return "'" + str(s).replace("'", "''") + "'"


# The ES/Logstash core pattern library, restricted to the RE2-safe
# subset valid in BOTH Java regex (Spark) and DuckDB's RE2.
GROK_LIB: dict[str, str] = {
    "WORD": r"\w+",
    "ALPHA": r"[a-zA-Z]+",
    "INT": r"\d+",
    "NUMBER": r"\d+(?:\.\d+)?",
    "SPACE": r"\s+",
    "NOTSPACE": r"\S+",
    "GREEDYDATA": r".*",
    "IP": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
}
_GROK_REF = re.compile(r"%\{(\w+)(?::(\w+))?\}")


def grok_to_regex(pattern: str) -> tuple[str, list[str]]:
    """Expand ``%{ALIAS:field}`` references into capture groups.
    Returns (regex, capture field names in group order); an aliased
    reference WITHOUT a field name becomes a non-capturing group."""
    names: list[str] = []

    def sub(m: re.Match) -> str:
        alias, field = m.group(1), m.group(2)
        if alias not in GROK_LIB:
            raise ValueError(f"unknown grok pattern %{{{alias}}}")
        if field:
            names.append(field)
            return "(" + GROK_LIB[alias] + ")"
        return "(?:" + GROK_LIB[alias] + ")"

    return _GROK_REF.sub(sub, pattern), names


def compile_pipeline_spark(
    procs: list[dict], fields: dict[str, Column]
) -> dict[str, Column]:
    """Apply the processor chain to an ordered {name: Column} mapping."""
    out = dict(fields)
    for proc in procs:
        (kind, p), = proc.items()
        f = p.get("field")
        if kind == "set":
            out[f] = F.lit(p["value"])
        elif kind == "rename":
            out[p["target_field"]] = out.pop(f)
        elif kind == "remove":
            out.pop(f)
        elif kind == "lowercase":
            out[f] = F.lower(out[f])
        elif kind == "uppercase":
            out[f] = F.upper(out[f])
        elif kind == "trim":
            out[f] = F.trim(out[f])
        elif kind == "gsub":
            out[f] = F.regexp_replace(
                out[f], p["pattern"], p["replacement"]
            )
        elif kind == "split":
            out[p.get("target_field", f)] = F.split(
                out[f], p["separator"]
            )
            if "target_field" in p and p["target_field"] != f:
                pass  # source field kept, ES split semantics
        elif kind == "grok":
            regex, names = grok_to_regex(p["pattern"])
            for i, nm in enumerate(names):
                out[nm] = F.regexp_extract(out[f], regex, i + 1)
        else:
            raise ValueError(f"unknown processor {kind!r}")
    return out


def compile_pipeline_sql(
    procs: list[dict], fields: dict[str, str]
) -> dict[str, str]:
    """The SAME walk over {name: sql_expr} (DuckDB dialect)."""
    out = dict(fields)
    for proc in procs:
        (kind, p), = proc.items()
        f = p.get("field")
        if kind == "set":
            out[f] = _sq(p["value"])
        elif kind == "rename":
            out[p["target_field"]] = out.pop(f)
        elif kind == "remove":
            out.pop(f)
        elif kind == "lowercase":
            out[f] = f"lower({out[f]})"
        elif kind == "uppercase":
            out[f] = f"upper({out[f]})"
        elif kind == "trim":
            out[f] = f"trim({out[f]})"
        elif kind == "gsub":
            out[f] = (
                f"regexp_replace({out[f]}, {_sq(p['pattern'])}, "
                f"{_sq(p['replacement'])}, 'g')"
            )
        elif kind == "split":
            out[p.get("target_field", f)] = (
                f"string_split({out[f]}, {_sq(p['separator'])})"
            )
        elif kind == "grok":
            regex, names = grok_to_regex(p["pattern"])
            for i, nm in enumerate(names):
                out[nm] = (
                    f"regexp_extract({out[f]}, {_sq(regex)}, {i + 1})"
                )
        else:
            raise ValueError(f"unknown processor {kind!r}")
    return out
