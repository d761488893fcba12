"""eval.py: trec_eval-style metrics vs hand-computed values, including the
trec_eval conventions (unjudged = rel 0, unretrieved-relevant counts in
denominators, qrels-only queries averaged in)."""

import math

import pytest


@pytest.fixture(scope="module")
def frames(spark):
    run = spark.createDataFrame(
        [("q1", "d1", 3.0), ("q1", "d2", 2.0), ("q1", "d3", 1.0),
         ("q2", "d1", 9.0), ("q2", "d4", 8.0)],
        ["qid", "url", "score"])
    qrels = spark.createDataFrame(
        [("q1", "d2", 2), ("q1", "d3", 1), ("q1", "d9", 1),
         ("q2", "d7", 1),
         ("q3", "d1", 2)],
        ["qid", "url", "rel"])
    return run, qrels


def test_per_query(spark, frames):
    from searchengines_spark.eval import per_query_metrics

    run, qrels = frames
    rows = {r["qid"]: r for r in per_query_metrics(run, qrels, k=10).collect()}

    q1 = rows["q1"]
    assert (q1["num_ret"], q1["num_rel"]) == (3, 3)
    assert q1["ap"] == round((1 / 2 + 2 / 3) / 3, 6)
    assert q1["p_at_10"] == 0.2
    assert q1["r_at_10"] == round(2 / 3, 6)
    assert q1["rr"] == 0.5
    dcg = (2 ** 2 - 1) / math.log2(3) + (2 ** 1 - 1) / math.log2(4)
    idcg = 3 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
    assert q1["ndcg_at_10"] == round(dcg / idcg, 6)

    # q2: retrieved 2, no relevant retrieved -> all-zero ratios
    q2 = rows["q2"]
    assert (q2["num_ret"], q2["num_rel"]) == (2, 1)
    assert (q2["ap"], q2["rr"], q2["ndcg_at_10"]) == (0.0, 0.0, 0.0)

    # q3: judged but never retrieved -> zero row still present
    q3 = rows["q3"]
    assert (q3["num_ret"], q3["num_rel"], q3["ap"]) == (0, 1, 0.0)


def test_summary_averages_over_judged(spark, frames):
    from searchengines_spark.eval import mean_metrics, per_query_metrics

    run, qrels = frames
    s = mean_metrics(run, qrels, k=10).collect()[0]
    pq = per_query_metrics(run, qrels, k=10).collect()
    assert s["num_q"] == 3
    assert s["num_ret"] == sum(r["num_ret"] for r in pq)
    assert s["map"] == round(sum(r["ap"] for r in pq) / 3, 6)
    assert s["mrr"] == round(sum(r["rr"] for r in pq) / 3, 6)


def test_tie_rule_matches_engine(spark):
    """Equal scores break by url asc (ScoreList.java:90-128)."""
    from searchengines_spark.eval import per_query_metrics

    run = spark.createDataFrame(
        [("q", "b", 1.0), ("q", "a", 1.0)], ["qid", "url", "score"])
    qrels = spark.createDataFrame([("q", "a", 1)], ["qid", "url", "rel"])
    r = per_query_metrics(run, qrels, k=10).collect()[0]
    assert r["rr"] == 1.0  # 'a' ranks first on the tie
