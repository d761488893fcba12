"""Edge cases: absent terms, tiny corpora, empty fields."""

import pyspark.sql.functions as F

from searchengines_spark.engine import Engine
from searchengines_spark.index import IndexReader, build_index


def test_absent_term_in_bow_query(tiny_index):
    """A term missing from the index contributes nothing — WAND route and
    exhaustive planner must agree."""
    e = Engine(tiny_index)
    q = "haceba4 zzzneverseen badiba5"
    wand = [(r["url"], round(r["score"], 9)) for r in e.search(q, k=20).collect()]
    plan = [(r["url"], round(r["score"], 9)) for r in e.search(q, k=20, use_wand=False).collect()]
    base = [(r["url"], round(r["score"], 9)) for r in
            e.search("haceba4 badiba5", k=20, use_wand=False).collect()]
    assert wand == plan == base


def test_all_absent_terms(tiny_index):
    e = Engine(tiny_index)
    assert e.search("zzza zzzb", k=10).collect() == []
    assert e.search("#AND( zzza zzzb )", k=10, use_wand=False).collect() == []


def test_single_doc_build(spark, tmp_path):
    from searchengines_spark.corpus import generate_pages

    pages = generate_pages(spark, 40, seed=9, partitions=2).filter(
        F.col("lang") == "en").limit(1)
    d = str(tmp_path / "one")
    m = build_index(spark, pages, d, n_salts=2)
    assert m["n_docs"] == 1
    r = IndexReader(spark, d)
    e = Engine(r)
    # every body term of the single doc scores it; idf is 0 (df == N == 1)
    term = r._term_stats.filter("field='body'").limit(1).collect()[0]["term"]
    rows = e.search(term, k=5).collect()
    assert len(rows) == 1 and rows[0]["score"] == 0.0


def test_empty_field_docs(spark, tmp_path):
    """Docs with an empty field (no title) index fine; field stats skip
    zero-length docs (doc_count counts docs with len > 0)."""
    import pandas as pd

    from searchengines_spark.corpus import PAGES_SCHEMA

    rows = []
    for i in range(6):
        title = "" if i % 2 == 0 else f"tword{i}"
        html = (f"<html><head><title>{title}</title></head>"
                f"<body>alpha beta w{i}</body></html>").encode()
        rows.append((f"https://x.org/p{i}", pd.Timestamp("2020-01-01"),
                     html, "alpha beta", "en"))
    pdf = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])
    pages = spark.createDataFrame(pdf, schema=PAGES_SCHEMA)
    d = str(tmp_path / "ef")
    build_index(spark, pages, d, n_salts=2)
    r = IndexReader(spark, d)
    assert r.n_docs == 6
    assert r.field_stats["title"][0] == 3  # only docs with a real title
    e = Engine(r)
    assert len(e.search("alpha", k=10, use_wand=False).collect()) == 6
    assert len(e.search("tword1.title", k=10, use_wand=False).collect()) == 1


def test_candidate_filtered_positional_decode_identical(spark, tiny_index):
    """Force the cost-based gate open: the candidate-filtered positional
    path must produce exactly the same ranking as the full-decode path
    (it is the 100-TB asymptote; the gate keeps it off at small df)."""
    import math

    from searchengines_spark.engine import Engine
    from searchengines_spark.query.planner import Planner

    eng = Engine(tiny_index)
    queries = ["#NEAR/4( cebaba1 dibaba2 )", "#WINDOW/6( haceba4 badiba5 )"]
    want = {q: [(r["url"], r["score"]) for r in
                eng.search(q, "bm25", 20).collect()] for q in queries}
    old_cap, old_heavy = Planner.MAX_POS_CANDIDATES, Planner.HEAVY_POS_DF
    try:
        Planner.MAX_POS_CANDIDATES = 10**9
        Planner.HEAVY_POS_DF = 0
        for q in queries:
            got = [(r["url"], r["score"]) for r in
                   eng.search(q, "bm25", 20).collect()]
            assert [u for u, _ in got] == [u for u, _ in want[q]], q
            for (_, gs), (_, ws) in zip(got, want[q]):
                assert math.isclose(gs, ws, rel_tol=1e-12)
    finally:
        Planner.MAX_POS_CANDIDATES = old_cap
        Planner.HEAVY_POS_DF = old_heavy
