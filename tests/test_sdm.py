"""Sequential dependence model (Metzler & Croft 2005): compile_sdm query
rewriting + rank identity of the served SDM ranking vs the pure-Python
oracle evaluating the same structured query. Also pins the compiled shape
(weights, #NEAR/1 ordered pairs, #WINDOW/8 unordered pairs) and the
degenerate one-term / stopword cases."""

import math

import pytest

from searchengines_spark.corpus import FIELDS, extract_fields, make_page
from searchengines_spark.engine import Engine
from searchengines_spark.oracle import OracleIndex, search as oracle_search
from searchengines_spark.tokenizer import tokenize_full


def test_compile_shape():
    q = Engine.compile_sdm("a b c")
    assert q == ("#WSUM( 0.8 #SUM( a b c ) "
                 "0.1 #SUM( #NEAR/1( a b ) #NEAR/1( b c ) ) "
                 "0.1 #SUM( #WINDOW/8( a b ) #WINDOW/8( b c ) ) )")
    assert Engine.compile_sdm("solo") == "solo"
    assert Engine.compile_sdm("  x   y ") == Engine.compile_sdm("x y")


@pytest.fixture(scope="module")
def oracle_idx():
    docs = []
    for i in range(300):
        url, _, html, _, lang = make_page(i, seed=42)
        if lang != "en":
            continue
        f = extract_fields(url, html)
        docs.append((url, {k: tokenize_full(f[k]) for k in FIELDS}))
    return OracleIndex.from_docs(docs)


def test_fielded_compile_and_rank_identity(tiny_index, oracle_idx):
    q = Engine.compile_fielded("a b", {"body": 0.7, "inlink": 0.3})
    assert q == "#WSUM( 0.7 #SUM( a.body b.body ) 0.3 #SUM( a.inlink b.inlink ) )"
    assert Engine.compile_fielded("") == ""
    eng = Engine(tiny_index)
    text = "cebaba1 dibaba2"
    got = [(r["url"], r["score"]) for r in
           eng.search_web(text, "bm25", 25).collect()]
    want = oracle_search(oracle_idx, Engine.compile_fielded(text), "bm25", 25)
    assert [u for u, _ in got] == [u for u, _ in want]
    for (gu, gs), (wu, ws) in zip(got, want):
        assert math.isclose(gs, ws, rel_tol=1e-9, abs_tol=1e-12)
    # field evidence actually moves the ranking vs plain body bag-of-words
    plain = [(r["url"], r["score"]) for r in
             eng.search(text, "bm25", 25).collect()]
    assert got != plain


def test_more_like_this_rank_identity(tiny_index, oracle_idx):
    eng = Engine(tiny_index)
    url = sorted(oracle_idx.ext_ids.values())[7]
    # pure-Python replica of the MLT term selection (tf x idf, tie term asc)
    d = {u: i for i, u in oracle_idx.ext_ids.items()}[url]
    n = oracle_idx.field_stats["body"][0]
    scored = sorted(
        (-len(ps[d]) * max(0.0, math.log((n - len(ps) + 0.5) / (len(ps) + 0.5))), t)
        for (f, t), ps in oracle_idx.postings.items()
        if f == "body" and d in ps)
    terms = [t for s, t in scored[:10] if s < 0.0]
    assert len(terms) >= 5  # a typical doc has discriminative terms
    got = [(r["url"], r["score"]) for r in
           eng.more_like_this(url, top_terms=10, k=15).collect()]
    want = oracle_search(oracle_idx, " ".join(terms), "bm25", 15)
    assert [u for u, _ in got] == [u for u, _ in want]
    for (gu, gs), (wu, ws) in zip(got, want):
        assert math.isclose(gs, ws, rel_tol=1e-9, abs_tol=1e-12)
    assert url in [u for u, _ in got]  # the source doc matches itself
    with pytest.raises(KeyError):
        eng.more_like_this("https://nope.example.org/x.html")


@pytest.mark.parametrize("model,kw", [("bm25", {}),
                                      ("indri", {"mu": 1500.0, "lam": 0.4})])
def test_sdm_rank_identity(tiny_index, oracle_idx, model, kw):
    eng = Engine(tiny_index)
    text = "cebaba1 dibaba2 fobaba3"
    got = [(r["url"], r["score"]) for r in
           eng.search_sdm(text, model, 25, **kw).collect()]
    want = oracle_search(oracle_idx, Engine.compile_sdm(text), model, 25, **kw)
    assert [u for u, _ in got] == [u for u, _ in want]
    for (gu, gs), (wu, ws) in zip(got, want):
        assert math.isclose(gs, ws, rel_tol=1e-9, abs_tol=1e-12), (gu, gs, ws)
    # proximity evidence actually contributes: SDM != plain bag-of-words
    plain = [(r["url"], r["score"]) for r in
             eng.search(text, model, 25, **kw).collect()]
    assert got != plain
