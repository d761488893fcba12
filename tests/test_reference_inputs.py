"""Reference TEST_DIR input sweep: every query/intents/ranking/qrels file
the reference ships is parsed by this engine's own parsers, and the real
structured query workloads (HW2's fielded #AND, HW3-Train-8's nested
#wand/#near/#window) run end-to-end through Engine.search.

The ClueWeb index isn't shipped (.MISSING_LARGE_BLOBS), so the English
query terms mostly miss the synthetic tiny_index vocabulary — which is
itself reference behavior: QryEval writes a dummy TREC row for an empty
result (QryEval.java:1452-1456), and that path must hold for every real
reference query, not just hand-written fixtures.
"""

import os

import pytest

from searchengines_spark.driver import (
    parse_intents,
    parse_qrels,
    parse_queries,
    parse_ranking,
)
from searchengines_spark.engine import Engine
from searchengines_spark.query.parser import QueryParser

TEST_DIR = "/root/reference/TEST_DIR"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(TEST_DIR), reason="reference TEST_DIR not present")


def _files(suffix):
    return sorted(f for f in os.listdir(TEST_DIR) if f.endswith(suffix))


def test_every_reference_query_file_parses():
    """All *.qry / *.trainQry files: qid:query lines split correctly and
    every query string builds a non-empty operator tree under both the
    BM25 and Indri default-operator rules."""
    fnames = _files(".qry") + _files(".trainQry")
    assert len(fnames) >= 15
    n_queries = n_structured = 0
    for fname in fnames:
        queries = parse_queries(os.path.join(TEST_DIR, fname))
        assert queries, fname
        for qid, q in queries.items():
            assert qid.strip().isdigit(), (fname, qid)
            for model in ("bm25", "indri"):
                tree = QueryParser(model=model).parse(q)
                assert tree is not None, (fname, qid, q)
            n_queries += 1
            if q.lstrip().startswith("#"):
                n_structured += 1
    assert n_queries >= 100 and n_structured >= 8


def test_every_reference_intents_file_parses():
    for fname in _files(".intents"):
        intents = parse_intents(os.path.join(TEST_DIR, fname))
        assert intents, fname
        for qid, lst in intents.items():
            assert qid.isdigit() and lst
            assert [i for i, _ in lst] == sorted(i for i, _ in lst)


def test_every_reference_ranking_file_parses():
    for fname in _files(".inRank"):
        ranked = parse_ranking(os.path.join(TEST_DIR, fname))
        assert ranked, fname
        for key, lst in ranked.items():
            assert lst and all(isinstance(s, float) for _, s in lst)


def test_every_reference_qrels_file_parses():
    for fname in _files(".trainQrels"):
        rows = parse_qrels(os.path.join(TEST_DIR, fname))
        assert rows, fname
        assert all(rel >= 0 for _, _, rel in rows)


def test_reference_structured_queries_run(tiny_index):
    """The real HW2 (fielded #AND) and HW3-Train-8 (weighted #wand over
    nested #and/#near/#window) workloads run through Engine.search without
    error; no-hit queries produce the reference's dummy TREC row."""
    eng = Engine(tiny_index)
    runs = [("HW2-Train-0.qry", "bm25"), ("HW3-Train-8.qry", "indri")]
    for fname, model in runs:
        queries = parse_queries(os.path.join(TEST_DIR, fname))
        for qid, q in queries.items():
            res = [(r["url"], r["score"])
                   for r in eng.search(q, model=model, k=10).collect()]
            lines = Engine.trec_lines(qid, res, "sweep")
            assert lines
            if len(lines) == 1 and " dummy " in lines[0]:
                assert lines[0] == f"{qid} Q0 dummy 1 0 sweep"
            else:
                assert all(len(ln.split()) == 6 for ln in lines)
