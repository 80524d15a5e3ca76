"""Frozen HTML -> text extractor (the engine's scalar transform).

The reference's only nontrivial scalar compute is a deterministic pure
string transform (the InChI divider, extractor/inchiDivider.go:16-56).  Our
input is Common-Crawl-style web pages (BASELINE.json input_hint:
``html:binary -> text:string``), so the analogous transform here is a
deterministic HTML text extractor, byte-identical per url between the pure
Python oracle and the Arrow UDF (verified by pytest).

Frozen spec, applied in order:

1. Decode bytes as UTF-8 (errors -> U+FFFD replacement).
2. Remove ``<script ...>...</script>`` and ``<style ...>...</style>``
   blocks including their content (case-insensitive).
3. Remove HTML comments ``<!-- ... -->``.
4. If a ``<body ...>`` tag exists, keep only the content between the first
   ``<body>`` and the last ``</body>`` (else keep everything).
5. Replace every remaining tag ``<...>`` with a single space.
6. Unescape HTML entities (``&amp;`` -> ``&`` etc., via html.unescape).
7. Collapse all whitespace runs to a single space and strip the ends.
"""

from __future__ import annotations

import html as _html
import re

import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_SCRIPT_RE = re.compile(r"<script\b[^>]*>.*?</script\s*>", re.IGNORECASE | re.DOTALL)
_STYLE_RE = re.compile(r"<style\b[^>]*>.*?</style\s*>", re.IGNORECASE | re.DOTALL)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_BODY_OPEN_RE = re.compile(r"<body\b[^>]*>", re.IGNORECASE)
_BODY_CLOSE_RE = re.compile(r"</body\s*>", re.IGNORECASE)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")


def extract_text(html_bytes: bytes | None) -> str:
    """Pure-Python reference extractor — the byte-identity oracle."""
    if html_bytes is None:
        return ""
    s = html_bytes.decode("utf-8", errors="replace")
    s = _SCRIPT_RE.sub(" ", s)
    s = _STYLE_RE.sub(" ", s)
    s = _COMMENT_RE.sub(" ", s)
    m_open = _BODY_OPEN_RE.search(s)
    if m_open:
        closes = list(_BODY_CLOSE_RE.finditer(s))
        end = closes[-1].start() if closes else len(s)
        s = s[m_open.end() : end]
    s = _TAG_RE.sub(" ", s)
    s = _html.unescape(s)
    return _WS_RE.sub(" ", s).strip()


@pandas_udf(T.StringType())
def extract_text_udf(html_col: pd.Series) -> pd.Series:
    """Arrow-vectorized extractor over an ``html:binary`` column.

    Byte-identical per row to :func:`extract_text` (it IS that function,
    applied per Arrow batch — one shared implementation, no drift).
    """
    return html_col.map(extract_text)
