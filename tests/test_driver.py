"""Batch driver: param-dict dispatch -> TREC lines, for EP1 (retrieval),
PRF, EP3 (diversity) and EP2 (LTR)."""

import re

import pytest

from searchengines_spark.driver import (
    parse_intents,
    parse_queries,
    parse_qrels,
    run_batch,
    run_ltr,
)

TREC_RE = re.compile(r"^\S+ Q0 \S+ \d+ \S+ \S+$")


def test_parsers(tmp_path):
    qf = tmp_path / "q.qry"
    qf.write_text("188:internet phone service\n140:#AND( east.title ridge.title )\n")
    qs = parse_queries(str(qf))
    assert qs["188"] == "internet phone service"
    assert qs["140"].startswith("#AND")

    it = parse_intents(["185.1:credit report", "185.2:annual report", "7.1:x"])
    assert it["185"] == [(1, "credit report"), (2, "annual report")]

    qr = parse_qrels(["1 0 doc-a 2", "1 0 doc-b -2"])
    assert qr == [("1", "doc-a", 2), ("1", "doc-b", 0)]


def test_run_batch_bm25(spark, tiny_index):
    params = {"retrievalAlgorithm": "BM25", "BM25:k_1": 1.2, "BM25:b": 0.75,
              "trecEvalOutputLength": 10}
    lines = run_batch(tiny_index, params, {"1": "cebaba1 dibaba2", "2": "zzznope"})
    assert all(TREC_RE.match(ln) for ln in lines)
    q1 = [ln for ln in lines if ln.startswith("1 ")]
    assert len(q1) == 10 and " 1 " in q1[0]
    # no-match query emits the dummy row (QryEval.java:1444-1449)
    q2 = [ln for ln in lines if ln.startswith("2 ")]
    assert len(q2) == 1 and "dummy" in q2[0]


def test_run_batch_diversity(spark, tiny_index, tmp_path):
    intents = tmp_path / "i.txt"
    intents.write_text("1.1:cebaba1\n1.2:dibaba2\n")
    params = {
        "retrievalAlgorithm": "BM25",
        "diversity": "true",
        "diversity:algorithm": "PM2",
        "diversity:lambda": 0.5,
        "diversity:maxInputRankingsLength": 20,
        "diversity:maxResultRankingLength": 10,
        "diversity:intentsFile": str(intents),
        "trecEvalOutputLength": 10,
    }
    lines = run_batch(tiny_index, params, {"1": "cebaba1 dibaba2"})
    assert len(lines) == 10 and all(TREC_RE.match(ln) for ln in lines)


def test_run_ltr(spark, tiny_index):
    urls = [r["url"] for r in tiny_index.docid_url_map().limit(30).collect()]
    qrels = [("1", u, i % 3) for i, u in enumerate(urls)]
    params = {"trecEvalOutputLength": 10}
    lines = run_ltr(tiny_index, params, {"1": "cebaba1 dibaba2"},
                    {"9": "fobaba3 cebaba1"}, qrels)
    assert len(lines) == 10
    assert all(ln.startswith("9 Q0 ") for ln in lines)


def test_run_batch_prf_initial_ranking_file(spark, tiny_index, tmp_path):
    """PRF seeded from a TREC ranking file (QryEval.java:1388-1416's file
    branch) must run and differ-or-match sanely vs the fresh-ranking path."""
    base = {"retrievalAlgorithm": "Indri", "Indri:mu": 1000, "Indri:lambda": 0.4,
            "prf": "Indri", "prf:numDocs": 3, "prf:numTerms": 4,
            "trecEvalOutputLength": 5}
    fresh = run_batch(tiny_index, base, {"1": "haceba4 badiba5"})
    # write the engine's own initial ranking as the file input -> same result
    init = tmp_path / "init.inRank"
    from searchengines_spark.engine import Engine
    eng = Engine(tiny_index)
    ranking = [(r["url"], r["score"]) for r in
               eng.search("#AND( haceba4 badiba5 )", model="indri", k=3,
                          mu=1000.0, lam=0.4).collect()]
    init.write_text("".join(f"1 Q0 {u} {i+1} {s} ref\n" for i, (u, s) in enumerate(ranking)))
    via_file = run_batch(tiny_index, {**base, "prf:initialRankingFile": str(init)},
                         {"1": "haceba4 badiba5"})
    assert fresh == via_file


def test_run_batch_diversity_initial_ranking_file(spark, tiny_index, tmp_path):
    from searchengines_spark.engine import Engine
    eng = Engine(tiny_index)
    lines = []
    for qid, q in [("1", "haceba4 badiba5"), ("1.1", "haceba4"), ("1.2", "badiba5")]:
        ranking = [(r["url"], r["score"]) for r in eng.search(q, model="bm25", k=15).collect()]
        lines += [f"{qid} Q0 {u} {i+1} {s} ref" for i, (u, s) in enumerate(ranking)]
    rank_file = tmp_path / "div.inRank"
    rank_file.write_text("\n".join(lines) + "\n")
    intents = tmp_path / "i.txt"
    intents.write_text("1.1:haceba4\n1.2:badiba5\n")
    params = {
        "retrievalAlgorithm": "BM25", "diversity": "true",
        "diversity:algorithm": "xQuAD", "diversity:lambda": 0.4,
        "diversity:maxInputRankingsLength": 15,
        "diversity:maxResultRankingLength": 8,
        "diversity:intentsFile": str(intents),
        "diversity:initialRankingFile": str(rank_file),
        "trecEvalOutputLength": 8,
    }
    out = run_batch(tiny_index, params, {"1": "haceba4 badiba5"})
    assert len(out) == 8
    assert all(TREC_RE.match(ln) for ln in out)
