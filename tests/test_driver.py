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


BATCH_QUERIES = {
    "1": "cebaba1 dibaba2",
    "2": "haceba4 badiba5 bafoba4",
    "3": "#AND( haceba4 badiba5 )",
    "4": "#NEAR/3( cebaba1 dibaba2 )",
    "5": "fobaba3",
    "6": "the of and",          # all stopwords -> empty
    "7": "#OR( haceba4 dibaba2 )",
    "8": "gubaba4 cebaba1",
}


@pytest.mark.parametrize("model,kw", [
    ("bm25", {}),
    ("indri", {"mu": 1000.0, "lam": 0.4}),
])
def test_search_batch_matches_sequential(spark, tiny_index, model, kw):
    """The one-action batch path must be result-identical (urls, scores,
    order) to the per-query path for every query shape."""
    import math

    from searchengines_spark.engine import Engine

    eng = Engine(tiny_index)
    batch = eng.search_batch(BATCH_QUERIES, model, 10, **kw)
    assert set(batch) == set(BATCH_QUERIES)
    for qid, q in BATCH_QUERIES.items():
        want = [(r["url"], r["score"]) for r in
                eng.search(q, model, 10, **kw).collect()]
        got = batch[qid]
        assert [u for u, _ in got] == [u for u, _ in want], (qid, q)
        for (_, gs), (_, ws) in zip(got, want):
            assert math.isclose(gs, ws, rel_tol=1e-9), (qid, q)


def test_search_batch_is_one_action(spark, tiny_index):
    """The 8-query batch must be ONE Spark action. Raw job COUNT is not the
    gate: AQE materializes every query stage of the one plan as its own
    job (plus broadcast/subquery futures), so a wide batch plan legally
    reports more jobs than two narrow sequential plans. The gate is
    provenance — every job the batch launches must belong to the single
    search_batch collect call site — plus a sublinearity backstop vs the
    8 queries run sequentially."""
    from searchengines_spark.engine import Engine
    from searchengines_spark.index import IndexReader

    # fresh reader: the session-scoped tiny_index's stats/cold-block memos
    # are warmed (and LRU-evicted) unpredictably by earlier tests, which
    # makes a warm-vs-cold job-count comparison order-dependent — both
    # measurements here must start from the same cold memo state
    eng = Engine(IndexReader(spark, tiny_index.index_dir))
    sc = spark.sparkContext
    tracker = sc.statusTracker

    def jobs_during(group, fn):
        # count ids in a DEDICATED job group: the status store retains a
        # bounded number of jobs, so differencing the GLOBAL id list goes
        # negative once a long test session starts evicting old jobs.
        # Cleared via the local property (setJobGroup("", "") would TAG all
        # later session jobs with a group literally named "").
        sc.setJobGroup(group, group)
        try:
            fn()
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
            sc.setLocalProperty("spark.job.description", None)
        return sorted(tracker().getJobIdsForGroup(group) or [])

    seq_jobs = jobs_during(
        "probe-seq",
        lambda: [eng.search(q, "bm25", 10).collect()
                 for q in BATCH_QUERIES.values()])
    batch_jobs = jobs_during(
        "probe-batch", lambda: eng.search_batch(BATCH_QUERIES, "bm25", 10))
    assert batch_jobs and len(batch_jobs) < len(seq_jobs), (
        len(batch_jobs), len(seq_jobs))

    # provenance: each batch job's stages trace to engine-internal driver
    # actions only, and the user-facing collect is ONE call site
    t = tracker()
    sites = set()
    saw_stage_names = False
    for j in batch_jobs:
        ji = t.getJobInfo(j)
        for s in (ji.stageIds if ji else []):
            si = t.getStageInfo(s)
            if si and si.name:
                saw_stage_names = True
            if si and "/searchengines_spark/" in si.name:
                sites.add(si.name.split("(")[0].strip())
    if not sites:
        # Spark builds that report JVM-only callsites in StageInfo.name
        # carry no Python path to trace — the sublinearity backstop above
        # already ran; skip only the provenance half rather than
        # false-failing on a reporting difference
        pytest.skip(f"no Python callsite in stage names "
                    f"(stage names seen: {saw_stage_names})")
    # the single search_batch collect; a second site would mean some leg
    # (metadata fetch, kernel prefetch) issued its own user-facing action
    assert len(sites) == 1 and "engine.py" in next(iter(sites)), sites


def test_prf_output_files(spark, tiny_index, tmp_path):
    """PRF side outputs: the .qryOut expansion-term list ('Score: s, term: t'
    per printExpansionList, QryEval.java:1483-1506) and the expanded-query
    file ('qid: #WAND(...)' per printExpandedQuery, 1469-1481), compared
    against a committed golden (GOLDEN_REGEN=1 to refresh)."""
    import os
    import shutil

    qry_out = str(tmp_path / "run.qryOut")
    exp_q = str(tmp_path / "run.expq")
    params = {"retrievalAlgorithm": "Indri", "Indri:mu": 1000,
              "Indri:lambda": 0.4, "prf": "Indri", "prf:numDocs": 5,
              "prf:numTerms": 5, "prf:Indri:mu": 0.0,
              "prf:Indri:origWeight": 0.5, "trecEvalOutputLength": 10,
              "prf:qryOutFile": qry_out, "prf:expansionQueryFile": exp_q}
    lines = run_batch(tiny_index, params,
                      {"p1": "haceba4 badiba5", "p2": "cebaba1"})
    assert all(TREC_RE.match(ln) for ln in lines)

    with open(qry_out) as f:
        got = f.read()
    out_lines = got.splitlines()
    assert len(out_lines) == 10  # 5 terms x 2 queries, appended in order
    assert all(re.match(r"^Score: \S+, term: \S+$", ln) for ln in out_lines)
    with open(exp_q) as f:
        eq = f.read().splitlines()
    assert len(eq) == 2
    assert eq[0].startswith("p1: #WAND (") and eq[1].startswith("p2: #WAND (")

    golden = os.path.join(os.path.dirname(__file__), "golden", "prf.qryOut")
    if os.environ.get("GOLDEN_REGEN"):
        shutil.copy(qry_out, golden)
    with open(golden) as f:
        assert got == f.read()


def test_prf_and_diversity_end_to_end_depth_100(spark, tiny_index, tmp_path):
    """Full-depth (top-100) end-to-end runs of the PRF and diversity
    pipelines through run_batch — the reference's HW3/EP3 operating depth."""
    prf_params = {"retrievalAlgorithm": "Indri", "Indri:mu": 1000,
                  "Indri:lambda": 0.4, "prf": "Indri", "prf:numDocs": 10,
                  "prf:numTerms": 10, "prf:Indri:mu": 0.0,
                  "prf:Indri:origWeight": 0.5, "trecEvalOutputLength": 100}
    lines = run_batch(tiny_index, prf_params, {"1": "haceba4 badiba5"})
    assert len(lines) == 100 and all(TREC_RE.match(ln) for ln in lines)
    ranks = [int(ln.split()[3]) for ln in lines]
    assert ranks == list(range(1, 101))

    intents = tmp_path / "i100.txt"
    intents.write_text("1.1:cebaba1\n1.2:dibaba2\n")
    div_params = {
        "retrievalAlgorithm": "BM25", "diversity": "true",
        "diversity:algorithm": "xQuAD", "diversity:lambda": 0.5,
        "diversity:maxInputRankingsLength": 100,
        "diversity:maxResultRankingLength": 100,
        "diversity:intentsFile": str(intents),
        "trecEvalOutputLength": 100,
    }
    lines = run_batch(tiny_index, div_params, {"1": "cebaba1 dibaba2"})
    assert len(lines) == 100 and all(TREC_RE.match(ln) for ln in lines)
    assert len({ln.split()[2] for ln in lines}) == 100  # distinct docs


def test_prf_batch_matches_sequential(spark, tiny_index):
    """run_batch's batched PRF (one action per pass for ALL queries) must be
    result-identical to the sequential per-query prf_search path."""
    import math

    from searchengines_spark.engine import Engine
    from searchengines_spark.prf import prf_search

    eng = Engine(tiny_index)
    queries = {"p1": "haceba4 badiba5", "p2": "cebaba1", "p3": "fobaba3 gubaba4"}
    params = {"retrievalAlgorithm": "Indri", "Indri:mu": 1000,
              "Indri:lambda": 0.4, "prf": "Indri", "prf:numDocs": 5,
              "prf:numTerms": 5, "prf:Indri:mu": 0.0,
              "prf:Indri:origWeight": 0.5, "trecEvalOutputLength": 8}
    lines = run_batch(tiny_index, params, queries)
    got = {}
    for ln in lines:
        qid, _, url, rank, score, _ = ln.split()
        got.setdefault(qid, []).append((url, float(score)))
    for qid, q in queries.items():
        final, terms, _ = prf_search(
            eng, q, model="indri", k=8, num_docs=5, num_terms=5,
            prf_mu=0.0, orig_weight=0.5, mu=1000.0, lam=0.4)
        want = [(r["url"], r["score"]) for r in final.collect()]
        assert [u for u, _ in got[qid]] == [u for u, _ in want], qid
        for (_, gs), (_, ws) in zip(got[qid], want):
            assert math.isclose(gs, ws, rel_tol=1e-9), qid


def test_prf_batch_is_bounded_actions(spark, tiny_index):
    """An N-query PRF workload must issue O(1) Spark jobs, not O(N): the
    job count for 6 queries may not exceed the count for 2 (both are
    [initial batch, dl collect, expansion job, final batch] + AQE jobs)."""
    sc = spark.sparkContext
    tracker = sc.statusTracker

    def jobs_during(fn):
        # count via MAX job id (monotonic), not len(): the status tracker
        # evicts old job ids past its retention window, so len() deltas go
        # negative late in a long-session suite run
        before = max(tracker().getJobIdsForGroup(None) or [0])
        fn()
        return max(tracker().getJobIdsForGroup(None) or [0]) - before

    params = {"retrievalAlgorithm": "Indri", "Indri:mu": 1000,
              "Indri:lambda": 0.4, "prf": "Indri", "prf:numDocs": 3,
              "prf:numTerms": 4, "trecEvalOutputLength": 5}
    qs = {"1": "haceba4 badiba5", "2": "cebaba1 dibaba2",
          "3": "fobaba3", "4": "gubaba4 cebaba1",
          "5": "dibaba2 fobaba3", "6": "badiba5"}
    two = dict(list(qs.items())[:2])
    # warm both workloads once first: the reader memoizes term stats, so a
    # cold run pays ONE bounded extra job for its unseen terms (O(1) per
    # batch, not O(N) — but it would skew a cold-vs-cold comparison in
    # whichever direction ran second)
    run_batch(tiny_index, params, two)
    run_batch(tiny_index, params, qs)
    n2 = jobs_during(lambda: run_batch(tiny_index, params, two))
    n6 = jobs_during(lambda: run_batch(tiny_index, params, qs))
    # +2 slack: AQE occasionally inserts an extra runtime-reoptimization job
    # depending on session state (observed once in 295-test full-suite runs;
    # deterministic in isolation). A per-query PRF regression would cost
    # >= 3 jobs PER extra query (~12 here), far outside the slack.
    assert n6 <= n2 + 2, (n6, n2)


def test_driver_paths_never_collect_corpus(spark, tiny_index, tmp_path, monkeypatch):
    """The diversity-from-file and LTR paths must resolve urls to docids via
    a broadcast JOIN of the small parsed-file frame — never by collecting
    the O(corpus) docid map to the driver (round-2's driver.py:176,221
    scale bug). Spy on every DataFrame.collect and bound the row counts."""
    # patch the CONCRETE class: pyspark.sql.DataFrame is an ABC in Spark 4
    # and instances dispatch to classic.dataframe.DataFrame's own method
    from pyspark.sql.classic.dataframe import DataFrame

    from searchengines_spark.engine import Engine

    n_docs = tiny_index.n_docs
    sizes: list[int] = []
    orig = DataFrame.collect

    def spy(self):
        rows = orig(self)
        sizes.append(len(rows))
        return rows

    eng = Engine(tiny_index)
    ranking = [(r["url"], r["score"]) for r in
               eng.search("haceba4 badiba5", model="bm25", k=15).collect()]
    rank_file = tmp_path / "div.inRank"
    rank_file.write_text("".join(
        f"{qid} Q0 {u} {i+1} {s} ref\n"
        for qid in ("1", "1.1") for i, (u, s) in enumerate(ranking)))
    intents = tmp_path / "i.txt"
    intents.write_text("1.1:haceba4\n")
    div_params = {
        "retrievalAlgorithm": "BM25", "diversity": "true",
        "diversity:algorithm": "xQuAD", "diversity:lambda": 0.4,
        "diversity:maxInputRankingsLength": 15,
        "diversity:maxResultRankingLength": 8,
        "diversity:intentsFile": str(intents),
        "diversity:initialRankingFile": str(rank_file),
        "trecEvalOutputLength": 8,
    }
    urls = [r["url"] for r in tiny_index.docid_url_map().limit(30).collect()]
    qrels = [("1", u, i % 3) for i, u in enumerate(urls)]

    monkeypatch.setattr(DataFrame, "collect", spy)
    out = run_batch(tiny_index, div_params, {"1": "haceba4 badiba5"})
    assert len(out) == 8
    lines = run_ltr(tiny_index, {"trecEvalOutputLength": 10},
                    {"1": "cebaba1 dibaba2"}, {"9": "fobaba3 cebaba1"}, qrels)
    assert len(lines) == 10
    assert sizes and max(sizes) < n_docs, max(sizes)


def test_search_batch_mixed_fields_and_models(spark, tiny_index):
    """Batch WAND routing must handle per-query fields (title vs body) and
    coexist with structured queries in one batch, result-identical to the
    sequential path."""
    import math

    from searchengines_spark.engine import Engine

    eng = Engine(tiny_index)
    queries = {
        "t1": "haceba4.title badiba5.title",   # flat BM25, title field
        "b1": "haceba4 badiba5",               # flat BM25, body
        "s1": "#AND( haceba4 badiba5 )",       # structured -> planner
    }
    batch = eng.search_batch(queries, "bm25", 15)
    for qid, q in queries.items():
        want = [(r["url"], r["score"]) for r in eng.search(q, "bm25", 15).collect()]
        got = batch[qid]
        assert [u for u, _ in got] == [u for u, _ in want], qid
        for (_, gs), (_, ws) in zip(got, want):
            assert math.isclose(gs, ws, rel_tol=1e-9), qid


def test_run_param_file_snippets(spark, tiny_index, tmp_path):
    """snippets=true on a param-file run writes the 'qid url rank snippet'
    sidecar next to the TREC output: highlighted passages for the top
    snippets:length results, none for dummy rows; byte-compared against a
    committed golden (GOLDEN_REGEN=1 to refresh)."""
    import os
    import shutil

    from searchengines_spark.corpus import generate_pages
    from searchengines_spark.driver import run_param_file

    pages_path = str(tmp_path / "pages")
    generate_pages(spark, 300, seed=42, partitions=4).write.parquet(pages_path)
    qf = tmp_path / "q.qry"
    qf.write_text("1:cebaba1 dibaba2\n2:zzznope\n")
    trec = str(tmp_path / "out.teIn")
    params = {"retrievalAlgorithm": "BM25", "queryFilePath": str(qf),
              "trecEvalOutputPath": trec, "trecEvalOutputLength": "10",
              "snippets": "true", "snippets:pagesPath": pages_path,
              "snippets:width": "20", "snippets:length": "3"}
    lines = run_param_file(tiny_index, params)

    snip_path = trec + ".snippets"
    assert os.path.exists(snip_path)
    with open(snip_path) as f:
        got = f.read()
    rows = got.strip().split("\n")
    # 3 snippet rows for q1 (top-3); the no-match query's dummy row gets none
    assert len(rows) == 3 and all(r.startswith("1 ") for r in rows)
    assert all("**" in r for r in rows)  # match-highlighted passages
    # url + rank columns mirror the TREC top-3 order
    trec_top = [ln.split()[2] for ln in lines if ln.startswith("1 ")][:3]
    assert [r.split()[1] for r in rows] == trec_top
    assert [r.split()[2] for r in rows] == ["1", "2", "3"]

    golden = os.path.join(os.path.dirname(__file__), "golden", "snippets.out")
    if os.environ.get("GOLDEN_REGEN"):
        shutil.copy(snip_path, golden)
    with open(golden) as f:
        assert got == f.read()


def test_run_param_file_snippets_config_fails_before_retrieval(tmp_path):
    """snippets=true with a missing required key raises a descriptive
    ValueError BEFORE any retrieval runs: reader=None proves nothing
    downstream of validation was touched."""
    import pytest

    from searchengines_spark.driver import run_param_file

    qf = tmp_path / "q.qry"
    qf.write_text("1:cebaba1\n")
    base = {"queryFilePath": str(qf), "snippets": "true"}
    with pytest.raises(ValueError, match="snippets:pagesPath"):
        run_param_file(None, {**base, "trecEvalOutputPath": str(tmp_path / "o")})
    with pytest.raises(ValueError, match="snippets:outputPath"):
        run_param_file(None, base)
