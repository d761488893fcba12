"""Distributed retrieval evaluation: trec_eval-style metrics over a run
table (qid, url, score) against a qrels table (qid, url, rel).

The reference's workflow writes TREC run files (QryEval.java:1442-1467) and
grades them with the external trec_eval binary; this module computes the
same headline metrics engine-side as one Catalyst plan, so a 10^5-query
evaluation sweep over a 10^12-doc corpus never leaves the cluster:

- ranks assigned with the engine's own tie rule (score desc, url asc —
  ScoreList.java:90-128);
- per-(qid,url) join run<->qrels (unjudged documents count as rel 0, the
  trec_eval convention);
- AP / P@k / R@k / RR / NDCG@k folded per qid in one aggregation.

Scale shape: everything is groupBy/window over (qid[, rank]); rank windows
partition BY QID, so parallelism scales with query count and no partition
ever holds more than one query's top-N — there is no corpus-sized shuffle
anywhere (the run table is |queries| x k rows, qrels are judgment-sized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ROUND_DP = 6


def _ranked(run: DataFrame, k: int | None = None) -> DataFrame:
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("url"))
    r = run.select("qid", "url", F.row_number().over(w).alias("rank"))
    return r.filter(F.col("rank") <= k) if k else r


def per_query_metrics(run: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """One row per qid: num_ret, num_rel, ap, p_at_k, r_at_k, rr, ndcg_at_k.

    ``run``: (qid, url, score) — any number of rows per qid (typically the
    engine's top-100). ``qrels``: (qid, url, rel) graded >= 0; rel > 0 is
    relevant. Queries present in qrels but absent from the run still get a
    row (all-zero metrics), matching trec_eval's averaging denominator."""
    ranked = _ranked(run)
    judged = ranked.join(qrels, ["qid", "url"], "left").fillna({"rel": 0})

    # cumulative relevant count at each rank (for AP)
    w_cum = (Window.partitionBy("qid").orderBy("rank")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    judged = judged.withColumn(
        "cum_rel", F.sum(F.when(F.col("rel") > 0, 1).otherwise(0)).over(w_cum))

    per_rank = judged.select(
        "qid", "rank", "rel", "cum_rel",
        F.when(F.col("rel") > 0, F.col("cum_rel") / F.col("rank"))
         .otherwise(F.lit(0.0)).alias("prec_if_rel"),
        F.when((F.col("rel") > 0) & (F.col("rank") <= k),
               F.lit(1.0)).otherwise(F.lit(0.0)).alias("rel_at_k"),
        F.when(F.col("rank") <= k,
               (F.pow(F.lit(2.0), F.col("rel")) - 1.0)
               / F.log2(F.col("rank") + 1.0)).otherwise(F.lit(0.0)).alias("gain"),
        F.when(F.col("rel") > 0, F.col("rank")).alias("rel_rank"),
    )
    agg = per_rank.groupBy("qid").agg(
        F.count("*").alias("num_ret"),
        F.sum("prec_if_rel").alias("sum_prec"),
        F.sum("rel_at_k").alias("rel_in_k"),
        F.sum("gain").alias("dcg"),
        F.min("rel_rank").alias("first_rel_rank"),
    )

    # per-qid totals + ideal DCG from qrels alone (covers unretrieved docs)
    w_ideal = Window.partitionBy("qid").orderBy(F.desc("rel"), F.asc("url"))
    ideal = (qrels.filter(F.col("rel") > 0)
             .withColumn("irank", F.row_number().over(w_ideal))
             .groupBy("qid").agg(
                 F.count("*").alias("num_rel"),
                 F.sum(F.when(
                     F.col("irank") <= k,
                     (F.pow(F.lit(2.0), F.col("rel")) - 1.0)
                     / F.log2(F.col("irank") + 1.0)).otherwise(0.0)).alias("idcg")))

    out = ideal.join(agg, "qid", "left").fillna(
        {"num_ret": 0, "sum_prec": 0.0, "rel_in_k": 0.0, "dcg": 0.0})
    return out.select(
        "qid", "num_ret", "num_rel",
        F.round(F.col("sum_prec") / F.col("num_rel"), ROUND_DP).alias("ap"),
        F.round(F.col("rel_in_k") / F.lit(float(k)), ROUND_DP).alias(f"p_at_{k}"),
        F.round(F.col("rel_in_k") / F.col("num_rel"), ROUND_DP).alias(f"r_at_{k}"),
        F.round(F.when(F.col("first_rel_rank").isNotNull(),
                       1.0 / F.col("first_rel_rank")).otherwise(0.0),
                ROUND_DP).alias("rr"),
        F.round(F.col("dcg") / F.col("idcg"), ROUND_DP).alias(f"ndcg_at_{k}"),
    )


def mean_metrics(run: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """trec_eval summary row: arithmetic means over qrels-judged queries
    (MAP, mean P@k/R@k, MRR, mean NDCG@k) + totals."""
    pq = per_query_metrics(run, qrels, k=k)
    return pq.agg(
        F.count("*").alias("num_q"),
        F.sum("num_ret").alias("num_ret"),
        F.sum("num_rel").alias("num_rel"),
        F.round(F.avg("ap"), ROUND_DP).alias("map"),
        F.round(F.avg(f"p_at_{k}"), ROUND_DP).alias(f"p_at_{k}"),
        F.round(F.avg(f"r_at_{k}"), ROUND_DP).alias(f"r_at_{k}"),
        F.round(F.avg("rr"), ROUND_DP).alias("mrr"),
        F.round(F.avg(f"ndcg_at_{k}"), ROUND_DP).alias(f"ndcg_at_{k}"),
    )
