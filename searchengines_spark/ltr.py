"""Learning-to-rank: the reference's 20-feature extractor + per-query min-max
normalization + train/rerank, Spark-first.

Feature definitions replicate QryEval.java:553-890 exactly:

  f1  spamScore            (attr; QryEval.java:826,839)
  f2  url depth = count of '/' in raw url (833)
  f3  url contains 'wikipedia.org' (834)
  f4  PageRank              (attr)
  f5/8/11/14   BM25 sum over matching query terms, field body/title/url/inlink
               (scoreBM25, QryEval.java:589-594; k3 factor = 1)
  f6/9/12/15   Indri prod s_t^(1/|q|) over matching terms, 0 if none matched
               (scoreIndri 596-601, featurePair 653-663)
  f7/10/13/16  count of matching distinct query terms
  f17 idf-weighted term match on url field: sum ln(N/df)*tf (657-659, 855)
  f18 title "cosine": innerProd / (sum(tf^2) * ||q||) — the reference does
      NOT sqrt the doc vector term; replicated faithfully (858-864)
  f19 title min pairwise distance between matched positions: 1/minDist,
      0.0 when exactly one matched position (672-691)
  f20 body rarest-zipf: max ln(tf*0.1*num_words/ctf) / body_len (663,692-694)

A doc missing a field (length 0) gets nulls for that field's features
(featurePair early return, 621-623). All extraction is joins + groupBy over
the forward index — one pass per field, no per-doc loop.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .index.build import IndexReader
from .tokenizer import tokenize_full

FIELDS4 = ["body", "title", "url", "keywords_no", "inlink"]  # order of f5-f16
FEATURE_FIELDS = ["body", "title", "url", "inlink"]
N_FEATURES = 20


def query_vectors(queries: dict[str, str]) -> dict[str, dict[str, int]]:
    """qid -> {stem: qtf} via the shared tokenize pipeline
    (QryParser.tokenizeString analog, QryEval.java:786-798)."""
    out = {}
    for qid, q in queries.items():
        toks = [t for t in tokenize_full(q) if t is not None]
        out[qid] = dict(Counter(toks))
    return out


def extract_features(reader: IndexReader, candidates: DataFrame,
                     queries: dict[str, str],
                     k1: float = 1.2, b: float = 0.75,
                     mu: float = 2500.0, lam: float = 0.4) -> DataFrame:
    """candidates: (qid, docid, rel). Returns (qid, docid, rel, f1..f20)."""
    spark = reader.spark
    qv = query_vectors(queries)
    n_docs = float(reader.n_docs)
    num_words = float(sum(reader.field_stats[f][1] for f in FEATURE_FIELDS))
    qconst = {qid: (float(len(v)), math.sqrt(sum(x * x for x in v.values())))
              for qid, v in qv.items()}

    qterms = spark.createDataFrame(
        [(qid, t, int(tf)) for qid, v in qv.items() for t, tf in v.items()],
        ["qid", "term", "qtf"],
    )
    cand = candidates.select("qid", "docid", "rel").cache()
    doc_terms = reader.doc_terms()
    doc_lens = reader.doc_lens()
    stats = reader._term_stats

    out = cand
    # doc-level features f1-f4
    attrs = reader.attrs()
    out = out.join(attrs, "docid", "left").select(
        "qid", "docid", "rel",
        F.col("spam_score").alias("f1"),
        (F.length("raw_url") - F.length(F.regexp_replace("raw_url", "/", "")))
        .cast("double").alias("f2"),
        F.col("raw_url").contains("wikipedia.org").cast("double").alias("f3"),
        F.col("page_rank").alias("f4"),
    )

    nq_df = spark.createDataFrame(
        [(qid, nq, ql) for qid, (nq, ql) in qconst.items()], ["qid", "nq", "qlen"]
    )
    out = out.join(F.broadcast(nq_df), "qid")

    for fi, field in zip([5, 8, 11, 14], FEATURE_FIELDS):
        c, s = reader.field_stats[field]
        avg_len = s / c if c else 1.0
        total_len = float(s)

        dl = doc_lens.filter(F.col("field") == field).select(
            "docid", F.col("len").alias("dl")
        )
        dvm = (
            doc_terms.filter(F.col("field") == field)
            .groupBy("docid")
            .agg(F.sum(F.col("tf") * F.col("tf")).cast("double").alias("dvm"))
        )
        matched = (
            cand.join(
                doc_terms.filter(F.col("field") == field).select("docid", "term", "tf", "positions"),
                "docid",
            )
            .join(qterms, ["qid", "term"])
            .join(
                F.broadcast(stats.filter(F.col("field") == field).select("term", "df", "ctf")),
                "term",
            )
            .join(dl, "docid")
            .join(F.broadcast(nq_df.select("qid", "nq")), "qid")
        )
        tf, dfc, ctf = (F.col("tf").cast("double"), F.col("df").cast("double"),
                        F.col("ctf").cast("double"))
        dlc = F.col("dl").cast("double")
        bm25_t = (
            F.greatest(F.lit(0.0), F.log((F.lit(n_docs) - dfc + 0.5) / (dfc + 0.5)))
            * tf / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dlc / F.lit(avg_len)))
        )
        pqc = F.when(ctf == 0.0, F.lit(0.5) / F.lit(total_len)).otherwise(ctf / F.lit(total_len))
        indri_t = (F.lit(1.0 - lam) * (tf + F.lit(mu) * pqc) / (dlc + F.lit(mu))
                   + F.lit(lam) * pqc)
        agg = matched.groupBy("qid", "docid").agg(
            F.sum(bm25_t).alias("bm25"),
            F.sum(F.log(indri_t) / F.col("nq")).alias("log_indri"),
            F.count(F.lit(1)).cast("double").alias("cnt"),
            F.sum(F.log(F.lit(n_docs) / dfc) * tf).alias("widf"),
            F.sum(tf * F.col("qtf")).alias("iprod"),
            F.max(F.log(tf * F.lit(0.1) * F.lit(num_words) / ctf)).alias("zipf"),
        )
        pre = f"x{fi}_"
        out = (
            out.join(agg.withColumnRenamed("bm25", pre + "bm25")
                     .withColumnRenamed("log_indri", pre + "li")
                     .withColumnRenamed("cnt", pre + "cnt")
                     .withColumnRenamed("widf", pre + "widf")
                     .withColumnRenamed("iprod", pre + "iprod")
                     .withColumnRenamed("zipf", pre + "zipf"),
                     ["qid", "docid"], "left")
            .join(dl.withColumnRenamed("dl", pre + "dl"), "docid", "left")
            .join(dvm.withColumnRenamed("dvm", pre + "dvm"), "docid", "left")
        )
        present = F.coalesce(F.col(pre + "dl"), F.lit(0)) > 0
        cnt = F.coalesce(F.col(pre + "cnt"), F.lit(0.0))
        out = out.withColumn(f"f{fi}", F.when(present, F.coalesce(F.col(pre + "bm25"), F.lit(0.0))))
        out = out.withColumn(
            f"f{fi + 1}",
            F.when(present, F.when(cnt > 0, F.exp(F.col(pre + "li"))).otherwise(F.lit(0.0))),
        )
        out = out.withColumn(f"f{fi + 2}", F.when(present, cnt))

        if field == "url":
            out = out.withColumn("f17", F.when(present, F.coalesce(F.col(pre + "widf"), F.lit(0.0))))
        if field == "title":
            # f18 faithful quirk: denominator uses sum(tf^2) (not sqrt)
            out = out.withColumn(
                "f18",
                F.when(
                    present,
                    F.when(
                        F.coalesce(F.col(pre + "dvm"), F.lit(0.0)) > 0,
                        F.coalesce(F.col(pre + "iprod"), F.lit(0.0))
                        / (F.col(pre + "dvm") * F.col("qlen")),
                    ).otherwise(F.lit(0.0)),
                ),
            )
            # f19: min distance between successive matched positions
            tpos = (
                matched.select("qid", "docid", F.explode("positions").alias("p"))
            )
            wspec = Window.partitionBy("qid", "docid").orderBy("p")
            gaps = tpos.withColumn("gap", F.col("p") - F.lag("p").over(wspec))
            f19 = gaps.groupBy("qid", "docid").agg(
                F.count(F.lit(1)).alias("npos"), F.min("gap").alias("mingap")
            ).select(
                "qid", "docid",
                F.when(F.col("npos") == 1, F.lit(0.0))
                .otherwise(F.lit(1.0) / F.col("mingap")).alias("f19v"),
            )
            out = out.join(f19, ["qid", "docid"], "left").withColumn(
                "f19", F.when(present & (cnt > 0), F.col("f19v"))
            ).drop("f19v")
        if field == "body":
            out = out.withColumn(
                "f20",
                F.when(present & (cnt > 0), F.col(pre + "zipf") / F.col(pre + "dl")),
            )
        out = out.drop(*[pre + x for x in ["bm25", "li", "cnt", "widf", "iprod", "zipf", "dl", "dvm"]])

    return out.select("qid", "docid", "rel", *[f"f{i}" for i in range(1, N_FEATURES + 1)])


def minmax_normalize(features: DataFrame) -> DataFrame:
    """Per-query per-feature min-max to [0,1]; null-preserving; max==min -> 0
    (normalizeFeatureValues, QryEval.java:706-736)."""
    out = features
    w = Window.partitionBy("qid")
    for i in range(1, N_FEATURES + 1):
        c = F.col(f"f{i}")
        mn, mx = F.min(c).over(w), F.max(c).over(w)
        out = out.withColumn(
            f"f{i}",
            F.when(c.isNull(), None)
            .when(mx == mn, F.lit(0.0))
            .otherwise((c - mn) / (mx - mn)),
        )
    return out


def train_ridge(features: DataFrame, l2: float = 1e-3) -> np.ndarray:
    """Closed-form ridge regression rel ~ f1..f20 (nulls -> 0). The
    reference shells out to SVMrank/RankLib (QryEval.java:977-1002); a
    deterministic in-process linear model is our stand-in."""
    rows = features.fillna(0.0).collect()
    X = np.array([[float(r[f"f{i}"]) for i in range(1, N_FEATURES + 1)] for r in rows])
    y = np.array([float(r["rel"]) for r in rows])
    A = X.T @ X + l2 * np.eye(N_FEATURES)
    return np.linalg.solve(A, X.T @ y)


def rerank(features: DataFrame, weights: np.ndarray, urls: DataFrame, k: int = 100) -> DataFrame:
    """Score = X @ w; per-query sort score desc, url asc, top-k
    (sortAndOutputFinalLtrResults, QryEval.java:892-949)."""
    filled = features.fillna(0.0)
    score = sum(
        F.col(f"f{i + 1}") * F.lit(float(weights[i])) for i in range(N_FEATURES)
    )
    scored = filled.select("qid", "docid", score.alias("ltr_score")).join(urls, "docid")
    w = Window.partitionBy("qid").orderBy(F.desc("ltr_score"), F.asc("url"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "url", "rank", "ltr_score")
    )
