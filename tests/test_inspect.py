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


def test_inspect_long_tail(spark, tiny_index):
    """The remaining InspectIndex subcommand analogs: id lookups, docid and
    field listings, metadata, postings sample, all-field term vector."""
    from searchengines_spark.inspect import (
        doc_metadata,
        doc_vector_all,
        external_docid,
        internal_docid,
        list_docids,
        list_fields,
        postings_sample,
    )

    ids = list_docids(tiny_index, 5).collect()
    assert [r["docid"] for r in ids] == list(range(5))
    url0 = ids[0]["url"]
    assert external_docid(tiny_index, 0) == url0
    assert internal_docid(tiny_index, url0) == 0
    assert internal_docid(tiny_index, "https://nope.example/") is None
    assert external_docid(tiny_index, 10**9) is None

    assert list_fields(tiny_index) == ["body", "inlink", "keywords", "title", "url"]

    md = doc_metadata(tiny_index, 0)
    assert md["docid"] == 0 and "spam_score" in md and "page_rank" in md
    assert md["field_lens"]["body"] > 0

    ps = postings_sample(tiny_index, "cebaba1", "body", n=5).collect()
    assert 0 < len(ps) <= 5
    assert all(r["tf"] >= 1 and len(r["positions"]) == r["tf"] for r in ps)

    dv = doc_vector_all(tiny_index, url0).collect()
    fields_seen = {r["field"] for r in dv}
    assert "body" in fields_seen and len(fields_seen) >= 3
    assert all(r["tf"] == len(r["positions"]) for r in dv)


def test_inspect_cli_list_doc(tiny_index, capsys):
    """-list-doc CLI flag (InspectIndex.java:381-390): header line + the
    stored fields of the document."""
    import json

    from searchengines_spark.inspect import main

    assert main(["-index", tiny_index.index_dir, "-list-doc", "0"]) == 0
    out = capsys.readouterr().out
    assert "Document:  docid 0" in out
    body = json.loads(out.split("Document:  docid 0", 1)[1])
    assert body["docid"] == 0 and body["field_lens"]["body"] > 0
