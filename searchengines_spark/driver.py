"""Batch run driver — the equivalent of the reference's QryEval.main
(QryEval.java:45-92): a parameter dict selects retrieval model / PRF / LTR /
diversification, queries stream from a ``qid:querytext`` file, output is
TREC-format lines (``qid Q0 extid rank score runid``).

Parameter keys mirror the reference param files (PARAM_DIR/*.param):
  retrievalAlgorithm  UnrankedBoolean | RankedBoolean | BM25 | Indri | ltr
  trecEvalOutputLength, trecEvalOutputPath
  BM25:k_1 BM25:b BM25:k_3 / Indri:mu Indri:lambda
  prf, prf:numDocs, prf:numTerms, prf:Indri:mu, prf:expansionField,
  prf:Indri:origWeight
  diversity, diversity:algorithm (xQuAD|PM2), diversity:lambda,
  diversity:maxInputRankingsLength, diversity:maxResultRankingLength,
  diversity:intentsFile
  ltr:trainingQueryFile, ltr:trainingQrelsFile (qid 0 extid rel)
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from .engine import Engine
from .index.build import IndexReader


def parse_queries(path_or_lines) -> dict[str, str]:
    """``qid:querytext`` lines (QryEval.java:1381-1386)."""
    if isinstance(path_or_lines, str) and os.path.exists(path_or_lines):
        with open(path_or_lines) as f:
            lines = f.readlines()
    else:
        lines = list(path_or_lines)
    out = {}
    for ln in lines:
        ln = ln.strip()
        if not ln:
            continue
        qid, _, q = ln.partition(":")
        out[qid.strip()] = q.strip()
    return out


def parse_intents(path_or_lines) -> dict[str, list[tuple[int, str]]]:
    """``qid.i:intent text`` lines (QryEval.java:319-334)."""
    if isinstance(path_or_lines, str) and os.path.exists(path_or_lines):
        with open(path_or_lines) as f:
            lines = f.readlines()
    else:
        lines = list(path_or_lines)
    out: dict[str, list[tuple[int, str]]] = {}
    for ln in lines:
        ln = ln.strip()
        if not ln:
            continue
        head, _, text = ln.partition(":")
        qid, _, i = head.partition(".")
        out.setdefault(qid, []).append((int(i), text.strip()))
    return out


def parse_ranking(path_or_lines) -> dict[str, list[tuple[str, float]]]:
    """TREC ranking file ``qid Q0 extdocid rank score runid`` -> qid ->
    [(url, score)] in rank order (initial-ranking source for PRF and
    diversity, QryEval.java:1333-1368 / 247-305). Intent rankings use
    ``qid.i`` as the qid column."""
    if isinstance(path_or_lines, str) and os.path.exists(path_or_lines):
        with open(path_or_lines) as f:
            lines = f.readlines()
    else:
        lines = list(path_or_lines)
    out: dict[str, list[tuple[str, float]]] = {}
    for ln in lines:
        parts = ln.split()
        if len(parts) >= 5:
            out.setdefault(parts[0], []).append((parts[2], float(parts[4])))
    return out


def parse_qrels(path_or_lines) -> list[tuple[str, str, int]]:
    """``qid 0 extdocid rel`` (QryEval.java:520-544); rel<0 -> 0."""
    if isinstance(path_or_lines, str) and os.path.exists(path_or_lines):
        with open(path_or_lines) as f:
            lines = f.readlines()
    else:
        lines = list(path_or_lines)
    out = []
    for ln in lines:
        parts = ln.split()
        if len(parts) >= 4:
            out.append((parts[0], parts[2], max(0, int(parts[3]))))
    return out


def _model_kw(params: dict) -> tuple[str, dict]:
    algo = params.get("retrievalAlgorithm", "BM25").lower()
    if algo == "bm25":
        return "bm25", {
            "k1": float(params.get("BM25:k_1", 1.2)),
            "b": float(params.get("BM25:b", 0.75)),
            "k3": float(params.get("BM25:k_3", 0.0)),
        }
    if algo == "indri":
        return "indri", {
            "mu": float(params.get("Indri:mu", 2500)),
            "lam": float(params.get("Indri:lambda", 0.4)),
        }
    return algo, {}


def run_batch(reader: IndexReader, params: dict, queries: dict[str, str],
              run_id: str = "run") -> list[str]:
    """EP1/EP3 (+PRF): returns TREC output lines for every query."""
    eng = Engine(reader)
    k = int(params.get("trecEvalOutputLength", 100))
    model, kw = _model_kw(params)

    if str(params.get("diversity", "false")).lower() == "true":
        return _run_diversity(eng, params, queries, run_id, k, model, kw)

    use_prf = params.get("prf", "").lower() in ("indri", "true")
    lines: list[str] = []
    if not use_prf:
        # the whole workload is ONE Spark action: shared postings scan over
        # the union of every query's terms, one window top-k, one collect
        rankings = eng.search_batch(queries, model, k, **kw)
        for qid in queries:
            lines.extend(Engine.trec_lines(qid, rankings[qid], run_id))
        return lines

    from .prf import learned_query, prf_search, write_expanded_query, write_expansion_list

    for qid, q in queries.items():
        # PRF is inherently two-pass per query (expansion depends on the
        # initial ranking); the expansion scoring itself is one job
        init = None
        if "prf:initialRankingFile" in params:
            init = parse_ranking(params["prf:initialRankingFile"]).get(qid)
        final, terms, _ = prf_search(
            eng, q, model=model, k=k, initial_ranking=init,
            num_docs=int(params.get("prf:numDocs", 10)),
            num_terms=int(params.get("prf:numTerms", 10)),
            prf_mu=float(params.get("prf:Indri:mu", 0.0)),
            orig_weight=float(params.get("prf:Indri:origWeight", 0.5)),
            field=params.get("prf:expansionField", "body"),
            **kw,
        )
        if "prf:expansionQueryFile" in params:
            write_expanded_query(qid, learned_query(terms),
                                 params["prf:expansionQueryFile"])
        if "prf:qryOutFile" in params:
            write_expansion_list(terms, params["prf:qryOutFile"])
        ranking = [(r["url"], r["score"]) for r in final.collect()]
        lines.extend(Engine.trec_lines(qid, ranking, run_id))
    return lines


def _run_diversity(eng: Engine, params, queries, run_id, k, model, kw) -> list[str]:
    """EP3 (QryEval.java:231-487): query + per-intent rankings -> greedy
    re-rank via xQuAD/PM2."""
    from .diversify import diversify_df

    max_in = int(params.get("diversity:maxInputRankingsLength", 100))
    max_out = int(params.get("diversity:maxResultRankingLength", 100))
    lam = float(params.get("diversity:lambda", 0.5))
    algo = params.get("diversity:algorithm", "xQuAD")

    spark = eng.reader.spark
    url_ids = eng.reader.docid_url_map()
    rows = []
    if "diversity:initialRankingFile" in params:
        # rankings supplied as a TREC file: qid rows = query ranking,
        # qid.i rows = intent rankings (QryEval.java:247-305)
        ranked = parse_ranking(params["diversity:initialRankingFile"])
        url2id = {r["url"]: int(r["docid"]) for r in url_ids.collect()}
        for key, ranking in ranked.items():
            qid, _, i = key.partition(".")
            if qid not in queries:
                continue
            intent_no = int(i) if i else 0
            for u, s in ranking:
                if u in url2id:
                    rows.append((qid, intent_no, url2id[u], float(s)))
    else:
        # every (query, intent) ranking in ONE batched action: key them as
        # "qid\x00intent" through search_batch_df, split back after
        intents = parse_intents(params["diversity:intentsFile"])
        batch = {}
        for qid, q in queries.items():
            batch[f"{qid}\x00{0}"] = q
            for i, text in intents.get(qid, []):
                batch[f"{qid}\x00{i}"] = text
        res = eng.search_batch_df(batch, model, max_in, **kw).join(url_ids, "url")
        for r in res.collect():
            qid, _, i = r["qid"].partition("\x00")
            rows.append((qid, int(i), int(r["docid"]), float(r["score"])))
    rdf = spark.createDataFrame(rows, ["qid", "intent", "docid", "score"])
    out = diversify_df(rdf, algo, lam, max_in, max_out).join(url_ids, "docid")
    by_qid: dict[str, list] = {}
    for r in out.collect():  # ONE collect for every query's diversified list
        by_qid.setdefault(r["qid"], []).append((r["rank"], r["url"], r["score"]))
    lines = []
    for qid in queries:
        rs = sorted(by_qid.get(qid, []))[:k]
        lines.extend(Engine.trec_lines(qid, [(u, s) for _, u, s in rs], run_id))
    return lines


def run_ltr(reader: IndexReader, params: dict, train_queries: dict[str, str],
            test_queries: dict[str, str], qrels: list[tuple[str, str, int]],
            run_id: str = "run") -> list[str]:
    """EP2 (QryEval.java:951-1057): train features on qrels, initial BM25
    top-100 for test queries, feature-score rerank, TREC output."""
    from .ltr import extract_features, minmax_normalize, rerank, train_ridge

    spark = reader.spark
    eng = Engine(reader)
    k = int(params.get("trecEvalOutputLength", 100))
    url_ids = reader.docid_url_map()
    url2id = {r["url"]: int(r["docid"]) for r in url_ids.collect()}

    train_rows = [(qid, url2id[u], rel) for qid, u, rel in qrels if u in url2id]
    cand_train = spark.createDataFrame(train_rows, ["qid", "docid", "rel"])
    feats = minmax_normalize(extract_features(reader, cand_train, train_queries))
    w = train_ridge(feats)

    # initial BM25 top-100 for every test query in one batched action
    init = eng.search_batch_df(test_queries, "bm25", 100).join(url_ids, "url")
    test_rows = [(r["qid"], int(r["docid"]), 0) for r in init.collect()]
    cand_test = spark.createDataFrame(test_rows, ["qid", "docid", "rel"])
    tfeats = minmax_normalize(extract_features(reader, cand_test, test_queries))
    ranked = rerank(tfeats, w, url_ids, k=k)
    by_qid: dict[str, list] = {}
    for r in ranked.collect():  # ONE collect for every query's reranking
        by_qid.setdefault(r["qid"], []).append((r["rank"], r["url"], r["ltr_score"]))
    lines = []
    for qid in test_queries:
        rs = sorted(by_qid.get(qid, []))
        lines.extend(Engine.trec_lines(qid, [(u, s) for _, u, s in rs], run_id))
    return lines
