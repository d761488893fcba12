"""LTR feature extraction: Spark extractor vs a pure-Python replica of the
reference featurePair (QryEval.java:553-890)."""

import hashlib
import math

import pytest

from searchengines_spark.corpus import FIELDS, extract_fields, make_page
from searchengines_spark.ltr import (
    FEATURE_FIELDS,
    extract_features,
    minmax_normalize,
    query_vectors,
    rerank,
    train_ridge,
)
from searchengines_spark.oracle import OracleIndex
from searchengines_spark.tokenizer import tokenize_full

K1, B, MU, LAM = 1.2, 0.75, 2500.0, 0.4


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


def oracle_features(idx, query, docid):
    """Faithful featurePair + f1-f4/f17-f20 assembly."""
    qv = {}
    for t in tokenize_full(query):
        if t is not None:
            qv[t] = qv.get(t, 0) + 1
    nq = float(len(qv))
    qlen = math.sqrt(sum(v * v for v in qv.values()))
    url = idx.ext_ids[docid]
    h = hashlib.md5(url.encode()).hexdigest()
    num_words = float(sum(idx.sum_len(f) for f in FEATURE_FIELDS))
    N = float(idx.n_docs)

    feats = {
        1: float(int(h[:4], 16) % 100),
        2: float(url.count("/")),
        3: 1.0 if "wikipedia.org" in url else 0.0,
        4: (int(h[4:8], 16) % 10000) / 100.0,
    }

    base = {"body": 5, "title": 8, "url": 11, "inlink": 14}
    for field in FEATURE_FIELDS:
        fi = base[field]
        dl = float(idx.get_len(field, docid))
        stems = {t: len(pl[docid]) for (f_, t), pl in idx.postings.items()
                 if f_ == field and docid in pl}
        if dl == 0.0 and not stems:
            feats[fi] = feats[fi + 1] = feats[fi + 2] = None
            if field == "url":
                feats[17] = None
            if field == "title":
                feats[18] = feats[19] = None
            if field == "body":
                feats[20] = None
            continue
        total = float(idx.sum_len(field))
        cnt_docs, _ = idx.field_stats[field]
        avg = total / cnt_docs
        bm25 = 0.0
        indri = 1.0
        count = 0
        widf = 0.0
        iprod = 0.0
        zipf = 0.0
        dvm = sum(tf * tf for tf in stems.values())
        matches = set()
        for t in sorted(stems):
            tf = float(stems[t])
            if t not in qv:
                continue
            matches.add(t)
            df = float(idx.df(field, t))
            ctf = float(idx.ctf(field, t))
            bm25 += max(0.0, math.log((N - df + 0.5) / (df + 0.5))) * tf / (
                tf + K1 * ((1.0 - B) + B * dl / avg))
            pqc = (0.5 / total) if ctf == 0.0 else ctf / total
            s_ind = (1.0 - LAM) * (tf + MU * pqc) / (dl + MU) + LAM * pqc
            indri *= s_ind ** (1.0 / nq)
            count += 1
            widf += math.log(N / df) * tf
            iprod += tf * qv[t]
            zipf = max(zipf, math.log(tf * 0.1 * num_words / ctf))
        mind = None
        if count == 0:
            indri, zipf = 0.0, None
        elif field == "title":
            pos = sorted(
                p for t in matches for p in idx.postings[(field, t)][docid]
            )
            mind = 0.0 if len(pos) == 1 else 1.0 / min(
                b_ - a_ for a_, b_ in zip(pos, pos[1:]))
        elif field == "body":
            zipf = zipf / dl
        feats[fi] = bm25
        feats[fi + 1] = indri
        feats[fi + 2] = float(count)
        if field == "url":
            feats[17] = widf
        if field == "title":
            feats[18] = (iprod / (dvm * qlen)) if dvm > 0 else 0.0
            feats[19] = mind
        if field == "body":
            feats[20] = zipf
    return feats


def test_feature_parity(spark, tiny_index, oracle_idx):
    queries = {"q1": "cebaba1 dibaba2", "q2": "fobaba3 gubaba4 cebaba1"}
    # candidates: first 25 docids, alternating rel labels
    cand = spark.createDataFrame(
        [(qid, d, (d % 3)) for qid in queries for d in range(25)],
        ["qid", "docid", "rel"],
    )
    feats = extract_features(tiny_index, cand, queries, K1, B, MU, LAM)
    rows = {(r["qid"], r["docid"]): r for r in feats.collect()}
    assert len(rows) == 50
    for (qid, docid), r in sorted(rows.items()):
        want = oracle_features(oracle_idx, queries[qid], docid)
        for i in range(1, 21):
            g, w = r[f"f{i}"], want[i]
            if w is None:
                assert g is None, (qid, docid, i, g)
            else:
                assert g is not None and math.isclose(g, w, rel_tol=1e-9), (
                    qid, docid, i, g, w)


def test_normalize_and_rerank(spark, tiny_index):
    queries = {"q1": "cebaba1 dibaba2"}
    cand = spark.createDataFrame(
        [("q1", d, d % 2) for d in range(20)], ["qid", "docid", "rel"]
    )
    feats = extract_features(tiny_index, cand, queries)
    norm = minmax_normalize(feats)
    import pyspark.sql.functions as F
    stats = norm.agg(*[F.max(f"f{i}").alias(f"mx{i}") for i in (1, 5, 7)]).collect()[0]
    for i in (1, 5, 7):
        assert stats[f"mx{i}"] is None or stats[f"mx{i}"] <= 1.0 + 1e-12
    w = train_ridge(norm)
    assert w.shape == (20,)
    ranked = rerank(norm, w, tiny_index.docid_url_map(), k=10)
    out = ranked.collect()
    assert len(out) == 10
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == list(range(1, 11))


def test_svmlight_roundtrip(spark, tiny_index, tmp_path):
    """Golden SVMlight format (FeatureVectorFileLine.java:23-63): lines are
    'rel qid:Q i:v ... # extdocid'; nulls omitted; parse-back preserves
    every value and every null exactly."""
    from searchengines_spark.ltr import read_svmlight, write_svmlight

    queries = {"q1": "cebaba1 dibaba2", "q2": "fobaba3 cebaba1"}
    cand = spark.createDataFrame(
        [(qid, d, (d % 3)) for qid in queries for d in range(15)],
        ["qid", "docid", "rel"],
    )
    feats = extract_features(tiny_index, cand, queries, K1, B, MU, LAM)
    p = str(tmp_path / "train.svmlight")
    write_svmlight(feats, tiny_index.docid_url_map(), p)

    with open(p) as f:
        lines = f.read().splitlines()
    assert len(lines) == 30
    assert lines == sorted(lines, key=lambda l: (l.split()[1], l.split(" # ")[1]))
    first = lines[0].split()
    assert first[1].startswith("qid:") and "#" in lines[0]

    back = read_svmlight(spark, p)
    urls = {r["docid"]: r["url"] for r in tiny_index.docid_url_map().collect()}
    want = {(r["qid"], urls[r["docid"]]): r for r in feats.collect()}
    got = {(r["qid"], r["url"]): r for r in back.collect()}
    assert set(got) == set(want)
    for key in want:
        w, g = want[key], got[key]
        assert g["rel"] == w["rel"]
        for i in range(1, 21):
            if w[f"f{i}"] is None:
                assert g[f"f{i}"] is None, (key, i)
            else:
                assert g[f"f{i}"] is not None and math.isclose(
                    g[f"f{i}"], w[f"f{i}"], rel_tol=1e-12), (key, i)


def test_train_toolkits(spark, tiny_index):
    """All three toolkit selections (reference ltr:toolkit analog) train and
    rank; linear ones are deterministic across refits; the pairwise model
    must order training pairs better than chance."""
    import numpy as np

    from searchengines_spark.ltr import rerank_with, train_ranker

    queries = {"q1": "cebaba1 dibaba2", "q2": "fobaba3 cebaba1"}
    cand = spark.createDataFrame(
        [(qid, d, (1 if d % 4 == 0 else 0)) for qid in queries for d in range(24)],
        ["qid", "docid", "rel"],
    )
    feats = minmax_normalize(
        extract_features(tiny_index, cand, queries, K1, B, MU, LAM)).cache()
    urls = tiny_index.docid_url_map()

    m_ridge = train_ranker(feats, "ridge")
    m_svm = train_ranker(feats, "svmrank")
    m_gbt = train_ranker(feats, "ranklib")

    # determinism of the linear paths
    assert np.allclose(m_ridge.weights, train_ranker(feats, "ridge").weights)
    assert np.allclose(m_svm.weights, train_ranker(feats, "svmrank").weights,
                       rtol=1e-6, atol=1e-8)

    rows = {r["docid"]: r for r in feats.fillna(0.0).collect() if r["qid"] == "q1"}
    for m in (m_ridge, m_svm, m_gbt):
        ranked = rerank_with(feats, m, urls, k=10)
        out = ranked.collect()
        qids = {r["qid"] for r in out}
        assert qids == {"q1", "q2"}
        for qid in qids:
            rs = sorted([r for r in out if r["qid"] == qid], key=lambda r: r["rank"])
            assert [r["rank"] for r in rs] == list(range(1, 11))
            scores = [r["ltr_score"] for r in rs]
            assert scores == sorted(scores, reverse=True)

    # pairwise accuracy of the svmrank-analog on its training data > 0.5
    sc = {d: float(sum(m_svm.weights[i] * float(rows[d][f"f{i+1}"] or 0.0)
                       for i in range(20))) for d in rows}
    good = bad = 0
    for a in rows:
        for b in rows:
            if rows[a]["rel"] > rows[b]["rel"]:
                if sc[a] > sc[b]:
                    good += 1
                elif sc[a] < sc[b]:
                    bad += 1
    assert good > bad


def test_model_and_docscore_files(spark, tiny_index, tmp_path):
    """The reference's .Model / .DocScore artifacts (QryEval.java:977-1002,
    892-949): a saved model reloads to identical scores; the .DocScore file
    has one score per feature line in write_svmlight order."""
    import numpy as np

    from searchengines_spark.ltr import (
        load_model,
        save_model,
        train_ranker,
        write_docscore,
        write_svmlight,
    )

    queries = {"q1": "cebaba1 dibaba2", "q2": "fobaba3 cebaba1"}
    cand = spark.createDataFrame(
        [(qid, d, (1 if d % 4 == 0 else 0)) for qid in queries for d in range(12)],
        ["qid", "docid", "rel"],
    )
    feats = minmax_normalize(
        extract_features(tiny_index, cand, queries, K1, B, MU, LAM)).cache()
    urls = tiny_index.docid_url_map()

    for toolkit in ("ridge", "svmrank", "ranklib"):
        m = train_ranker(feats, toolkit)
        mp = str(tmp_path / f"{toolkit}.Model")
        save_model(m, mp)
        m2 = load_model(spark, mp)
        s1 = {(r["qid"], r["docid"]): r["ltr_score"] for r in m.score(feats).collect()}
        s2 = {(r["qid"], r["docid"]): r["ltr_score"] for r in m2.score(feats).collect()}
        assert set(s1) == set(s2)
        assert all(abs(s1[k] - s2[k]) < 1e-9 for k in s1)
        if toolkit == "svmrank":
            # the .Model artifact is the real SVM-light model format
            # (svm_rank_learn's output shape): version header, kernel-0
            # header block, threshold, one linear SV with alpha=1
            lines = open(mp).read().splitlines()
            assert lines[0] == "SVM-light Version V6.20"
            assert lines[1].startswith("0 # kernel type")
            assert lines[7].split("#")[0].strip() == "20"
            assert lines[11].startswith("1 1:")
            from searchengines_spark.ltr import read_svmlight_model

            w, b = read_svmlight_model(mp)
            assert b == 0.0 and np.allclose(w, m.weights, atol=0)

    m = train_ranker(feats, "ridge")
    fp = str(tmp_path / "test.LtrTest")
    dp = str(tmp_path / "test.DocScore")
    write_svmlight(feats, urls, fp)
    write_docscore(feats, m, urls, dp)
    feat_lines = open(fp).read().splitlines()
    scores = [float(x) for x in open(dp).read().splitlines()]
    assert len(scores) == len(feat_lines) == 24
    # line i of .DocScore scores line i of the feature file: recompute from
    # the (qid, url)-keyed score map using the feature file's own order
    url_of = {i: ln.split(" # ")[1] for i, ln in enumerate(feat_lines)}
    qid_of = {i: ln.split()[1].split(":", 1)[1] for i, ln in enumerate(feat_lines)}
    urls_map = {r["url"]: r["docid"] for r in urls.collect()}
    smap = {(r["qid"], r["docid"]): r["ltr_score"] for r in m.score(feats).collect()}
    for i, sc in enumerate(scores):
        assert abs(sc - smap[(qid_of[i], urls_map[url_of[i]])]) < 1e-9

    # RankLib .DocScore shape (sortAndOutputFinalLtrResults, isSVMRank=false
    # branch): three columns "<qid> <idx> <score>", score parsed from
    # items[2], idx 0-based within each query, same line order as .LtrTest
    mr = train_ranker(feats, "ranklib")
    drp = str(tmp_path / "ranklib.DocScore")
    write_docscore(feats, mr, urls, drp)
    rl_lines = [ln.split() for ln in open(drp).read().splitlines()]
    assert len(rl_lines) == len(feat_lines)
    rmap = {(r["qid"], r["docid"]): r["ltr_score"] for r in mr.score(feats).collect()}
    seen_idx: dict[str, int] = {}
    for i, (qid, idx, sc) in enumerate(rl_lines):
        assert qid == qid_of[i]
        assert int(idx) == seen_idx.get(qid, 0)
        seen_idx[qid] = int(idx) + 1
        assert abs(float(sc) - rmap[(qid, urls_map[url_of[i]])]) < 1e-9


def test_metric_fn_hand_computed():
    """metric2t parsing vs independently hand-derived values."""
    import numpy as np

    from searchengines_spark.ltr import _metric_fn

    # rels in model-score order [1, 0, 2]:
    # DCG@2  = (2^1-1)/log2(2) + (2^0-1)/log2(3) = 1.0
    # IDCG@2 = (2^2-1)/log2(2) + (2^1-1)/log2(3) = 3 + 1/log2(3)
    rels = np.array([1.0, 0.0, 2.0])
    idcg2 = 3.0 + 1.0 / math.log2(3.0)
    assert abs(_metric_fn("NDCG@2")(rels) - 1.0 / idcg2) < 1e-12
    assert _metric_fn("NDCG@2")(np.array([2.0, 1.0, 0.0])) == 1.0
    assert abs(_metric_fn("P@2")(rels) - 0.5) < 1e-12
    # MAP of [1, 0, 1]: precisions at the hits are 1/1 and 2/3
    assert abs(_metric_fn("MAP")(np.array([1.0, 0.0, 1.0]))
               - (1.0 + 2.0 / 3.0) / 2.0) < 1e-12
    assert _metric_fn("MAP")(np.zeros(3)) == 0.0
    # RR: first relevant at rank 2
    assert _metric_fn("RR")(np.array([0.0, 1.0, 1.0])) == 0.5
    # DCG@2 of [1, 0, 2] = (2^1-1)/log2(2) = 1.0 (unnormalized)
    assert abs(_metric_fn("DCG@2")(rels) - 1.0) < 1e-12
    # ERR of a single fully-relevant doc: sat = (2^r-1)/2^r = 0.5 at r=1
    assert abs(_metric_fn("ERR@10")(np.array([1.0])) - 0.5) < 1e-12
    # ERR cascade of [1, 1] (top grade 1): 0.5 + (1-0.5)*0.5/2 = 0.625
    assert abs(_metric_fn("ERR")(np.array([1.0, 1.0])) - 0.625) < 1e-12
    assert _metric_fn("ERR@10")(np.zeros(2)) == 0.0
    with pytest.raises(ValueError):
        _metric_fn("BEST@10")


def test_ranklib_model_dispatch_and_svm_c(spark, tiny_index, tmp_path):
    """The reference's RankLib model ids train DIFFERENT rankers in-process
    (4 -> Coordinate Ascent on metric2t, 7 -> ListNet, both linear and
    deterministic), and ltr:svmRankParamC maps onto the pairwise
    regularization anchored at the reference corpus's C=0.002."""
    import numpy as np

    from searchengines_spark.ltr import (
        _collect_grouped,
        _mean_metric,
        _metric_fn,
        load_model,
        save_model,
        train_ranker,
    )

    queries = {"q1": "cebaba1 dibaba2", "q2": "fobaba3 cebaba1"}
    cand = spark.createDataFrame(
        [(qid, d, (1 if d % 4 == 0 else 0)) for qid in queries for d in range(24)],
        ["qid", "docid", "rel"],
    )
    feats = minmax_normalize(
        extract_features(tiny_index, cand, queries, K1, B, MU, LAM)).cache()

    m_ca = train_ranker(feats, "ranklib", ranklib_model=4, metric="NDCG@10")
    m_ln = train_ranker(feats, "ranklib", ranklib_model="7")
    assert m_ca.kind == "ranklib-ca" and m_ca.weights is not None
    assert m_ln.kind == "ranklib-listnet" and m_ln.weights is not None

    # deterministic refits
    assert np.allclose(
        m_ca.weights,
        train_ranker(feats, "ranklib", ranklib_model=4).weights)
    assert np.allclose(
        m_ln.weights, train_ranker(feats, "ranklib", ranklib_model=7).weights)

    # CA's whole job: never worse than its uniform-weight start on metric2t
    groups = _collect_grouped(feats)
    mfn = _metric_fn("NDCG@10")
    w0 = np.full(len(m_ca.weights), 1.0 / len(m_ca.weights))
    assert (_mean_metric(groups, m_ca.weights, mfn)
            >= _mean_metric(groups, w0, mfn) - 1e-12)

    # .Model round-trip for the new linear kinds
    for m, name in ((m_ca, "ca.Model"), (m_ln, "listnet.Model")):
        p = str(tmp_path / name)
        save_model(m, p)
        m2 = load_model(spark, p)
        assert m2.kind == m.kind and np.allclose(m2.weights, m.weights)

    # svmRankParamC: the anchor C reproduces the default fit; a much
    # smaller C (more slack -> more regularization) changes the weights
    w_def = train_ranker(feats, "svmrank").weights
    w_anchor = train_ranker(feats, "svmrank", svm_c="0.002").weights
    assert np.allclose(w_def, w_anchor, rtol=1e-6, atol=1e-8)
    w_tight = train_ranker(feats, "svmrank", svm_c=2e-6).weights
    assert not np.allclose(w_def, w_tight, rtol=1e-3, atol=1e-6)
