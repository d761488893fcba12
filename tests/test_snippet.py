"""Serving-path snippets (Engine.snippets): window rule vs a brute-force
all-starts oracle, highlight correctness, width bound, leading-passage
fallback, and ordering. The corpus-wide batch twin (analytic.q_snippet) is
DuckDB-hash-gated by the driver; this covers the k-bounded highlighted
serving variant."""

import re

import pytest

from searchengines_spark.corpus import extract_fields, generate_pages, make_page
from searchengines_spark.engine import Engine
from searchengines_spark.tokenizer import _TOKEN_RE, STOPWORDS, s_stem

N_DOCS = 300
QUERY = "cebaba1 dibaba2 fobaba3"
QTERMS = {"cebaba1", "dibaba2", "fobaba3"}
W = 20
K = 12


@pytest.fixture(scope="module")
def pages(spark):
    return generate_pages(spark, N_DOCS, seed=42, partitions=4)


@pytest.fixture(scope="module")
def snips(tiny_index, pages):
    eng = Engine(tiny_index)
    res = eng.search(QUERY, model="bm25", k=K)
    return eng.search(QUERY, model="bm25", k=K).collect(), \
        eng.snippets(res, pages, QUERY, width=W).collect()


def _body(url):
    i = int(url.rsplit("p", 1)[1].split(".")[0])
    u, _, html, _, _ = make_page(i, seed=42)
    assert u == url
    return extract_fields(url, html)["body"]


def _stems(text):
    return [None if m.group() in STOPWORDS else s_stem(m.group())
            for m in _TOKEN_RE.finditer(text.lower())]


def test_snippets_align_with_results(snips):
    results, rows = snips
    assert [r["url"] for r in rows] == [r["url"] for r in results]
    assert [r["score"] for r in rows] == [r["score"] for r in results]


def test_window_rule_matches_bruteforce_all_starts(snips):
    _, rows = snips
    assert any(r["n_terms"] >= 2 for r in rows)  # workload non-trivial
    for r in rows:
        stems = _stems(_body(r["url"]))
        # brute force over EVERY start, not just match positions: verifies
        # the candidate-start restriction loses nothing
        best = 0
        for s in range(len(stems)):
            best = max(best, len({t for t in stems[s:s + W] if t in QTERMS}))
        assert r["n_terms"] == best, r["url"]


def test_highlights_and_width(snips):
    _, rows = snips
    for r in rows:
        marked = re.findall(r"\*\*([^*]+)\*\*", r["snippet"])
        assert marked, r["url"]  # top-k docs all match something
        for tok in marked:
            assert s_stem(tok.lower()) in QTERMS
        # snippet spans at most W tokens of the original text
        n_toks = len(_TOKEN_RE.findall(r["snippet"].replace("**", "").lower()))
        assert n_toks <= W
        # the snippet is a literal substring of the body once unmarked
        assert r["snippet"].replace("**", "") in _body(r["url"])
        # start is 1-based into the token stream and covers its own match
        stems = _stems(_body(r["url"]))
        assert stems[r["start"] - 1] in QTERMS


def test_non_ascii_body_offsets(tiny_index, spark):
    """Length-changing lowercasing (Turkish U+0130 expands under .lower())
    must not shift highlight offsets: the kernel slices the lowered text in
    that case, so marks still wrap exactly the matched tokens."""
    eng = Engine(tiny_index)
    html = ("<html><body><p>İİİ spark gather query İstanbul spark</p>"
            "</body></html>").encode("utf-8")
    url = "https://u.example/p1.html"
    pages = spark.createDataFrame([(url, bytearray(html))], ["url", "html"])
    hits = spark.createDataFrame([(url, 1.0)], ["url", "score"])
    r = eng.snippets(hits, pages, "spark query", width=6).collect()[0]
    marked = re.findall(r"\*\*([^*]+)\*\*", r["snippet"])
    assert marked and all(m in ("spark", "query") for m in marked)
    assert r["n_terms"] == 2


def test_no_match_leading_passage(tiny_index, pages, spark):
    eng = Engine(tiny_index)
    # a hit frame pointing at a doc that cannot contain the query term
    one = pages.filter(pages.lang == "en").limit(1).select(
        "url", pages.warc_ts.cast("double").alias("score"))
    rows = eng.snippets(one, pages, "zzzznotaterm", width=8).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_terms"] == 0 and r["start"] == 1
    body = _body(r["url"])
    assert "**" not in r["snippet"] and r["snippet"] in body
    assert body.startswith(r["snippet"].split(" ")[0])
