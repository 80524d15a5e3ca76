"""M0 unit tests: frozen pure functions (tokenizer, extractor, codec,
BM25 oracle, layered-key splitter) — no Spark session required."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from unichem2index_spark.functions.bm25 import Bm25Oracle, idf, score_term
from unichem2index_spark.functions.codec import (
    BLOCK_SIZE,
    PostingBlock,
    chunk_postings,
    delta_decode,
    delta_encode,
    vb_decode,
    vb_encode,
)
from unichem2index_spark.functions.extract import extract_text
from unichem2index_spark.functions.keysplit import (
    expand_components,
    fan_out_components,
    rebuild_key,
    split_key,
)
from unichem2index_spark.functions.tokenize import tokenize
from unichem2index_spark.synth import gen_layered_keys, gen_queries, gen_webtext


# ---------------------------------------------------------------- tokenizer
def test_tokenize_basic():
    assert tokenize("The quick, Brown FOX-42!") == ["the", "quick", "brown", "fox", "42"]
    assert tokenize("") == []
    assert tokenize(None) == []
    assert tokenize("  \n\t ") == []
    assert tokenize("a&b <c>") == ["a", "b", "c"]


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_tokenize_total_and_lowercase(s):
    toks = tokenize(s)
    for t in toks:
        assert t == t.lower()
        assert all(c.islower() or c.isdigit() for c in t)


# ---------------------------------------------------------------- extractor
def test_extract_text_byte_identity_on_synth():
    rows = gen_webtext(300, seed=42)
    for r in rows:
        assert extract_text(r["html"]) == r["text"], r["url"]


def test_extract_text_edge_cases():
    assert extract_text(None) == ""
    assert extract_text(b"") == ""
    assert extract_text(b"plain text no tags") == "plain text no tags"
    assert extract_text(b"<body>a</body> outside") == "a"
    assert extract_text(b"<p>a&amp;b &lt;x&gt;</p>") == "a&b <x>"
    assert (
        extract_text(b"<script>drop me</script><b>keep</b><style>x{}</style>")
        == "keep"
    )
    assert extract_text(b"<!-- no --><i>yes</i>") == "yes"
    # multi-line script with attributes
    assert extract_text(b"<SCRIPT src='x'>\nvar a=1;\n</SCRIPT>hello") == "hello"


def test_synth_webtext_deterministic():
    assert gen_webtext(50, seed=42) == gen_webtext(50, seed=42)
    assert gen_webtext(50, seed=42) != gen_webtext(50, seed=43)


# ---------------------------------------------------------------- codec
def test_varbyte_roundtrip_simple():
    vals = [0, 1, 127, 128, 129, 16383, 16384, 2**31, 2**62]
    assert vb_decode(vb_encode(vals)) == vals


@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip_prop(vals):
    assert vb_decode(vb_encode(vals)) == vals


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300)
    .map(lambda xs: sorted(set(xs)))
)
@settings(max_examples=200, deadline=None)
def test_delta_roundtrip_prop(ids):
    assert delta_decode(delta_encode(ids)) == ids


def test_posting_block_roundtrip_and_chunking():
    n = BLOCK_SIZE * 2 + 17  # exercises block boundaries
    ids = [i * 3 + 1 for i in range(n)]
    tfs = [(i % 7) + 1 for i in range(n)]
    dls = [50 + (i % 100) for i in range(n)]
    blocks = chunk_postings(ids, tfs, dls)
    assert [len(b.doc_ids) for b in blocks] == [BLOCK_SIZE, BLOCK_SIZE, 17]
    out_ids, out_tfs, out_dls = [], [], []
    for b in blocks:
        dec = PostingBlock.decode(*b.encode())
        out_ids += dec.doc_ids
        out_tfs += dec.tfs
        out_dls += dec.dls
    assert (out_ids, out_tfs, out_dls) == (ids, tfs, dls)


# ---------------------------------------------------------------- BM25 oracle
def test_idf_formula():
    assert idf(1000, 10) == pytest.approx(math.log(1 + (1000 - 10 + 0.5) / 10.5))


def test_bm25_oracle_hand_computed():
    docs = [(0, ["a", "b", "a"]), (1, ["a"]), (2, ["b", "c"])]
    o = Bm25Oracle(docs)
    assert o.n_docs == 3
    assert o.avgdl == pytest.approx(2.0)
    # score doc0 for ["a"]: tf=2, dl=3, df(a)=2
    idf_a = math.log(1 + (3 - 2 + 0.5) / 2.5)
    w = 2 / (2 + 1.2 * (1 - 0.75 + 0.75 * 3 / 2.0))
    assert o.score_doc(["a"], 0) == pytest.approx(idf_a * w)
    top = o.topk(["a", "b"], 3)
    assert [d for d, _ in top] == sorted(
        [0, 1, 2], key=lambda d: (-o.score_doc(["a", "b"], d), d)
    )


def test_bm25_oracle_tiebreak_doc_id_asc():
    docs = [(5, ["x"]), (1, ["x"]), (3, ["x"])]  # identical docs → equal scores
    o = Bm25Oracle(docs)
    assert [d for d, _ in o.topk(["x"], 3)] == [1, 3, 5]


def test_bm25_duplicate_query_terms_dedup():
    docs = [(0, ["a", "b"]), (1, ["a"])]
    o = Bm25Oracle(docs)
    assert o.topk(["a", "a"], 2) == o.topk(["a"], 2)


def test_gen_queries_frozen():
    qs = gen_queries(30, seed=42)
    assert qs == gen_queries(30, seed=42)
    assert all(1 <= len(q["terms"]) <= 5 for q in qs)
    assert {q["k"] for q in qs} == {1, 10, 100}


# ---------------------------------------------------------------- keysplit
def test_split_key_basic():
    sk = split_key("KEY=1S/C6H12O6/c1;2;3/h1H;2H/q+1/b5/t4/m01/s1/i2")
    assert sk.version == "1S"
    assert sk.formula == "C6H12O6"
    assert sk.layers["c"] == "1;2;3"
    assert sk.layers["m"] == "01"
    assert sk.full_stereo == "5" + "4" + "01" + "1"
    assert sk.full_isotopic == "2"


def test_split_rebuild_roundtrip_on_synth():
    for key in gen_layered_keys(200, seed=42):
        if not key:
            assert split_key(key) is None
            continue
        sk = split_key(key)
        assert sk is not None, key
        assert rebuild_key(sk) == key  # F5 round-trip byte identity


def test_expand_components_multiplier():
    assert expand_components("2*ab;cd") == ["ab", "ab", "cd"]
    assert expand_components("ab;cd") == ["ab", "cd"]
    assert expand_components("2C6H6.CH4", is_formula=True) == ["C6H6", "C6H6", "CH4"]
    assert expand_components("") == []


def test_fan_out_components_alignment():
    sk = split_key("KEY=1S/2C2H4.CH4/c1;2;3/h1H;2H/m010")
    comps = fan_out_components(sk)
    assert len(comps) == 3
    assert [c["formula"] for c in comps] == ["C2H4", "C2H4", "CH4"]
    assert [c["c"] for c in comps] == ["1", "2", "3"]
    assert [c["h"] for c in comps] == ["1H", "2H", ""]
    assert [c["m"] for c in comps] == ["0", "1", "0"]
