"""xQuAD / PM2 diversification: hand-verified examples + properties +
distributed wrapper."""

import math

from searchengines_spark.diversify import diversify_df, pm2, xquad


Q = [(1, 0.9), (2, 0.8), (3, 0.7), (4, 0.6)]
# intent 1 loves docs 1,2; intent 2 loves docs 3,4
I1 = [(1, 0.9), (2, 0.85)]
I2 = [(3, 0.95), (4, 0.9)]


def test_xquad_lambda0_is_relevance_order():
    out = xquad(Q, [I1, I2], lam=0.0, max_input=10, max_result=4)
    assert [d for d, _ in out] == [1, 2, 3, 4]
    for (d, s), (qd, qs) in zip(out, Q):
        assert math.isclose(s, qs, rel_tol=1e-12)


def test_xquad_diversifies():
    # with high lambda, after picking doc1 (intent1), intent2 docs gain
    out = xquad(Q, [I1, I2], lam=1.0, max_input=10, max_result=4)
    assert out[0][0] == 3  # 0.5*0.95 > 0.5*0.9
    assert out[1][0] == 1  # intent2 now discounted by (1-0.95)


def test_xquad_hand_computed():
    out = xquad(Q, [I1, I2], lam=0.5, max_input=10, max_result=2)
    # step 1: doc1: 0.5*0.9 + 0.5*(0.5*0.9 + 0.5*0) = 0.675
    #         doc3: 0.5*0.7 + 0.5*(0.5*0.95) = 0.5875
    assert out[0][0] == 1 and math.isclose(out[0][1], 0.675, rel_tol=1e-12)
    # step 2: doc3: 0.5*0.7 + 0.5*(0.5*0.9*(1-0)… intent1 of doc3=0;
    #         intent2: 0.5*0.95*(1-0) ) = 0.35 + 0.2375 = 0.5875
    assert out[1][0] == 3 and math.isclose(out[1][1], 0.5875, rel_tol=1e-12)


def test_pm2_alternates_intents():
    out = pm2(Q, [I1, I2], lam=0.7, max_input=10, max_result=4)
    docs = [d for d, _ in out]
    # PM2 must not take both intent-1 docs before any intent-2 doc
    assert set(docs[:2]) not in ({1, 2}, {3, 4})
    assert len(docs) == 4 and len(set(docs)) == 4


def test_pm2_monotone_fixup():
    out = pm2(Q, [I1, I2], lam=0.5, max_input=10, max_result=4)
    # after the reference fixup no later score may exceed the first
    first = out[0][1]
    for _, s in out[1:]:
        assert s <= first + 1e-12


def test_normalization_scores_above_one():
    q = [(1, 5.0), (2, 4.0)]
    i1 = [(1, 3.0), (2, 1.0)]
    out = xquad(q, [i1], lam=0.0, max_input=10, max_result=2)
    # largest = max(sum_q=9, sum_i1=4) = 9 -> relevance = score/9
    assert math.isclose(out[0][1], 5.0 / 9.0, rel_tol=1e-12)


def test_diversify_df(spark):
    rows = []
    for qid in ["7", "9"]:
        rows += [(qid, 0, d, s) for d, s in Q]
        rows += [(qid, 1, d, s) for d, s in I1]
        rows += [(qid, 2, d, s) for d, s in I2]
    df = spark.createDataFrame(rows, ["qid", "intent", "docid", "score"])
    out = diversify_df(df, "xquad", lam=0.5, max_input=10, max_result=3).collect()
    assert len(out) == 6
    by_q = {}
    for r in out:
        by_q.setdefault(r["qid"], []).append((r["rank"], r["docid"], r["score"]))
    for qid, rs in by_q.items():
        rs.sort()
        assert [d for _, d, _ in rs][:2] == [1, 3]

    out2 = diversify_df(df, "PM2", lam=0.5, max_input=10, max_result=4).collect()
    assert len(out2) == 8
