"""Layered-key splitter — the generic re-expression of the reference's
InChI divider (F1-F5 in SURVEY.md §2.7).

The reference parses ``InChI=<ver>/<formula>/c.../h.../q.../p.../b.../t...
/m.../s.../i.../h...`` into 12 optional named layers with a single layered
regex (extractor/inchiDivider.go:225-256), derives concat fields
FullStereo=b+t+m+s and FullIsotopic=i+h (inchiDivider.go:43-44,120-121),
splits multi-component layers on '.' / ';' with ``N*token`` multiplier
expansion (inchiDivider.go:182-223), fans components out into index-aligned
structs (inchiDivider.go:58-128), and can re-serialize the struct back to the
canonical string (Inchi.go:24-61) — round-trip byte identity.

We keep the exact same layer grammar over a neutral prefix ``KEY=`` so the
operator is domain-generic. All functions are pure (pytest oracles); Spark
wrappers are Arrow pandas_udfs in operators/parity.py.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

# Same layer set and ordering as the reference regex
# (extractor/inchiDivider.go:229-240): version, formula, then
# c h q p b t m s i iH layers, each optional, '/'-introduced.
LAYERS = ["c", "h", "q", "p", "b", "t", "m", "s", "i"]

_KEY_RE = re.compile(
    r"^KEY=(?P<version>[^/]+)"
    r"(?:/(?P<formula>[^/]*))?"
    r"(?:/c(?P<c>[^/]*))?"
    r"(?:/h(?P<h>[^/]*))?"
    r"(?:/q(?P<q>[^/]*))?"
    r"(?:/p(?P<p>[^/]*))?"
    r"(?:/b(?P<b>[^/]*))?"
    r"(?:/t(?P<t>[^/]*))?"
    r"(?:/m(?P<m>[^/]*))?"
    r"(?:/s(?P<s>[^/]*))?"
    r"(?:/i(?P<i>[^/]*))?"
    r"$"
)

_MULT_RE = re.compile(r"^(?:(\d+)\*)?(.*)$")  # N*token expansion (standard layers)
_FORMULA_MULT_RE = re.compile(r"^(\d+)?(.*)$")  # leading-digit multiplier (formula)


@dataclass
class SplitKey:
    version: str = ""
    formula: str = ""
    layers: dict = field(default_factory=dict)

    @property
    def full_stereo(self) -> str:
        # FullStereo = b+t+m+s (extractor/inchiDivider.go:43-44)
        return "".join(self.layers.get(x, "") for x in ("b", "t", "m", "s"))

    @property
    def full_isotopic(self) -> str:
        # FullIsotopic = i (+ trailing h sub-layer folded in upstream)
        return self.layers.get("i", "")


def split_key(key: str | None) -> SplitKey | None:
    """F1: layered regex parse. Returns None when the key doesn't match."""
    if not key:
        return None
    m = _KEY_RE.match(key)
    if not m:
        return None
    gd = m.groupdict()
    return SplitKey(
        version=gd.get("version") or "",
        formula=gd.get("formula") or "",
        layers={k: v for k in LAYERS if (v := gd.get(k)) not in (None, "")},
    )


def rebuild_key(sk: SplitKey) -> str:
    """F5: canonical re-serialization, skipping empty layers
    (mirrors extractor/Inchi.go:24-61)."""
    parts = [f"KEY={sk.version}"]
    if sk.formula:
        parts.append(sk.formula)
    for name in LAYERS:
        v = sk.layers.get(name, "")
        if v:
            parts.append(f"{name}{v}")
    return "/".join(parts)


def expand_components(layer_value: str, is_formula: bool = False) -> list[str]:
    """F3: multi-component split with multiplier expansion.

    Formula splits on '.', other layers on ';'; an ``N*token`` (or leading
    ``N`` for formula) prefix replicates the token N times
    (extractor/inchiDivider.go:182-223).
    """
    if not layer_value:
        return []
    sep = "." if is_formula else ";"
    out: list[str] = []
    for tok in layer_value.split(sep):
        m = (_FORMULA_MULT_RE if is_formula else _MULT_RE).match(tok)
        n = int(m.group(1)) if m.group(1) else 1
        out.extend([m.group(2)] * n)
    return out


def fan_out_components(sk: SplitKey) -> list[dict]:
    """F4: one key -> N component dicts, index-aligned across layers.

    The ``m`` layer is positional: component j takes character j
    (extractor/inchiDivider.go:111-117); a component count exceeding the
    m-flag length is an error there — we emit '' instead (total function).
    """
    formula_comps = expand_components(sk.formula, is_formula=True)
    n = max(
        [len(formula_comps)]
        + [
            len(expand_components(sk.layers.get(name, "")))
            for name in LAYERS
            if name != "m"
        ]
        + [1]
    )
    m_flags = sk.layers.get("m", "")
    comps: list[dict] = []
    for j in range(n):
        comp = {"component_idx": j}
        comp["formula"] = formula_comps[j] if j < len(formula_comps) else ""
        for name in LAYERS:
            if name == "m":
                comp["m"] = m_flags[j] if j < len(m_flags) else ""
            else:
                vals = expand_components(sk.layers.get(name, ""))
                comp[name] = vals[j] if j < len(vals) else ""
        comps.append(comp)
    return comps
