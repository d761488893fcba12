"""PRF expansion: engine (decomposed groupBy form) vs oracle (faithful
sequential reference replica) — term identity + score parity, and the full
expand-and-requery loop."""

import math

import pytest

from searchengines_spark.corpus import FIELDS, extract_fields, make_page
from searchengines_spark.engine import Engine
from searchengines_spark.oracle import OracleIndex, prf_expansion, search as oracle_search
from searchengines_spark.prf import expanded_query, expansion_terms, learned_query, prf_search
from searchengines_spark.tokenizer import tokenize_full


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


@pytest.mark.parametrize("mu", [0.0, 40.0])
def test_expansion_parity(spark, tiny_index, oracle_idx, mu):
    q = "cebaba1 dibaba2"
    init = oracle_search(oracle_idx, q, "indri", 10, mu=1500.0, lam=0.4)
    url_rank = {u: d for d, u in oracle_idx.ext_ids.items()}
    init_ids = [(url_rank[u], s) for u, s in init]

    want = prf_expansion(oracle_idx, init_ids, num_docs=10, num_terms=8, mu=mu)
    got = expansion_terms(tiny_index, init_ids, num_docs=10, num_terms=8, mu=mu)
    assert [t for t, _ in got] == [t for t, _ in want]
    for (gt, gs), (_, ws) in zip(got, want):
        assert math.isclose(gs, ws, rel_tol=1e-9), (mu, gt, gs, ws)


def test_query_strings():
    terms = [("asbestos", 0.0349), ("removal", 0.0111)]
    lq = learned_query(terms)
    assert lq == "#WAND ( 0.0111 removal 0.0349 asbestos )"
    eq = expanded_query("#AND( a b )", lq, 0.6)
    assert eq.startswith("#WAND ( 0.6 #AND( a b )") and "0.4" in eq


def test_prf_search_end_to_end(spark, tiny_index, oracle_idx):
    eng = Engine(tiny_index)
    final, terms, q = prf_search(
        eng, "cebaba1 dibaba2", model="indri", k=15,
        num_docs=8, num_terms=5, prf_mu=40.0, orig_weight=0.5,
    )
    got = [(r["url"], r["score"]) for r in final.collect()]
    assert len(got) == 15 and len(terms) == 5

    # oracle replica of the whole loop
    init = oracle_search(oracle_idx, "cebaba1 dibaba2", "indri", 8, mu=2500.0, lam=0.4)
    url_rank = {u: d for d, u in oracle_idx.ext_ids.items()}
    oterms = prf_expansion(oracle_idx, [(url_rank[u], s) for u, s in init], 8, 5, 40.0)
    oq = expanded_query("#AND( cebaba1 dibaba2 )", learned_query(oterms), 0.5)
    want = oracle_search(oracle_idx, oq, "indri", 15, mu=2500.0, lam=0.4)
    assert [u for u, _ in got] == [u for u, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert math.isclose(gs, ws, rel_tol=1e-9)
