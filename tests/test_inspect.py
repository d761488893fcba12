"""Index inspection surface (InspectIndex.java:152-667 analog)."""

from searchengines_spark.inspect import (corpus_stats, doc_vector,
                                         postings_for, term_dictionary)


def test_corpus_stats(tiny_index):
    st = corpus_stats(tiny_index)
    assert st["num_docs"] == tiny_index.n_docs > 0
    for f in ("body", "title", "url", "keywords", "inlink"):
        assert st["fields"][f]["doc_count"] > 0
        assert st["fields"][f]["avg_doclen"] > 0


def test_term_dictionary_sorted_and_prefixed(tiny_index):
    rows = term_dictionary(tiny_index, "body", prefix="ha", limit=50).collect()
    assert rows and all(r["term"].startswith("ha") for r in rows)
    terms = [r["term"] for r in rows]
    assert terms == sorted(terms)
    assert all(r["df"] > 0 and r["ctf"] >= r["df"] for r in rows)


def test_postings_consistent_with_doc_vector(tiny_index):
    term = "haceba4"
    posts = postings_for(tiny_index, term).collect()
    assert posts == sorted(posts, key=lambda r: r["docid"])
    one = posts[0]
    dv = {r["term"]: (r["tf"], list(r["positions"]))
          for r in doc_vector(tiny_index, one["url"]).collect()}
    assert dv[term] == (one["tf"], list(one["positions"]))
    # tf == number of positions everywhere
    assert all(r["tf"] == len(r["positions"]) for r in posts)
