"""End-to-end training-corpus curation driver: the composition a
pretraining pipeline actually runs over a crawl, as ONE lazy plan plus a
single-action report.

    kept, report = curate(docs, benchmark=bench_df, cap_per_source=1000)

Stages (each the already-gated operator, composed, not re-implemented):

1. quality  — C4/Gopher-style keep (length band, mean word length band,
              top-term repetition cap), from q_quality_filter's logic.
2. exact    — md5 exact-dup groups, keep the min-doc_id canonical.
3. near     — 64-perm MinHash, 16x4 LSH banding, candidate-restricted
              Jaccard >= 0.5, connected-component resolution, keep the
              component canonical (analytic._lsh64_sh_cand_df +
              cluster_pairs — no all-pairs stage anywhere).
4. decon    — optional benchmark 5-gram decontamination: drop docs whose
              text contains any benchmark gram (broadcast gram set).
5. cap      — optional per-source document cap (domain_cap rule).

Everything is flag-composed on doc_id: per-doc booleans land in one
`flags` frame, `kept` is docs ⋈ flags.filter(keep), and the report is ONE
aggregate pass over flags (per-stage drop counts + survivor count). No
stage materializes a filtered copy of the corpus — at 100 TB the only
corpus-sized materialization is the final write the caller chooses to do.

Flag semantics are conjunctive and stage-independent: a doc's near-dup
flag is computed over the FULL corpus, not the quality survivors — that
keeps every stage's statistics meaningful in the report, matches how
curation reports are audited, and lets the conjunction short-circuit in
one pass. (Sequential-filter semantics — dedup only among quality
survivors — is `curate(docs.filter(...))` by construction.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import analytic as A


def _quality_keep(docs: DataFrame) -> DataFrame:
    """(doc_id, q_keep) — q_quality_filter's conjunction at df level."""
    tok = A.tokens(docs)
    base = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.avg(F.length("term")).alias("awl"),
    )
    rep = A._rep_stats(docs).select("doc_id", "top_term_frac")
    j = base.join(rep, "doc_id")
    keep = (
        (F.col("n_tokens") >= A.QF_MIN_TOKENS)
        & (F.col("n_tokens") <= A.QF_MAX_TOKENS)
        & (F.col("awl") >= A.QF_MIN_WORDLEN)
        & (F.col("awl") <= A.QF_MAX_WORDLEN)
        & (F.col("top_term_frac") <= A.QF_MAX_TOP_TERM)
    )
    return j.select("doc_id", keep.alias("q_keep"))


def _exact_keep(docs: DataFrame) -> DataFrame:
    e = docs.select("doc_id", F.md5("text").alias("h"))
    ek = e.groupBy("h").agg(F.min("doc_id").alias("keep_id"))
    return e.join(ek, "h").select(
        "doc_id", (F.col("doc_id") == F.col("keep_id")).alias("exact_keep"))


def _near_keep(docs: DataFrame) -> DataFrame:
    sh, cand = A._lsh64_sh_cand_df(docs)
    pairs = (A._jaccard_for_pairs(sh, cand)
             .filter(F.col("jaccard") >= 0.5).select("a_id", "b_id"))
    clusters = A.cluster_pairs(pairs)
    return clusters.select(
        "doc_id", (F.col("canon") == F.col("doc_id")).alias("near_keep"))


def _decon_keep(docs: DataFrame, benchmark: DataFrame, n: int = 5) -> DataFrame:
    """Drop docs sharing any n-gram with the benchmark (q_contamination's
    broadcast shape, reduced to a boolean)."""
    bench_grams = (A._doc_ngrams(benchmark, n)
                   .select("gram").distinct())
    hit = (A._doc_ngrams(docs, n)
           .join(F.broadcast(bench_grams), "gram")
           .select("doc_id").distinct()
           .withColumn("hit", F.lit(True)))
    return docs.select("doc_id").join(hit, "doc_id", "left").select(
        "doc_id", F.coalesce(~F.col("hit"), F.lit(True)).alias("decon_keep"))


def _cap_keep(docs: DataFrame, cap: int) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return docs.select(
        "doc_id",
        (F.row_number().over(w) <= cap).alias("cap_keep"))


def curate(docs: DataFrame, benchmark: DataFrame | None = None,
           cap_per_source: int | None = None) -> tuple[DataFrame, dict]:
    """Returns (kept_docs, report). kept_docs is lazy (same schema as
    docs); report is computed by ONE aggregate action over the flag frame."""
    flags = (
        docs.select("doc_id")
        .join(_quality_keep(docs), "doc_id", "left")
        .join(_exact_keep(docs), "doc_id", "left")
        .join(_near_keep(docs), "doc_id", "left")
    )
    flags = flags.select(
        "doc_id",
        F.coalesce("q_keep", F.lit(False)).alias("q_keep"),  # empty docs drop
        F.coalesce("exact_keep", F.lit(True)).alias("exact_keep"),
        F.coalesce("near_keep", F.lit(True)).alias("near_keep"),  # no cluster
    )
    keep_cols = ["q_keep", "exact_keep", "near_keep"]
    if benchmark is not None:
        flags = flags.join(_decon_keep(docs, benchmark), "doc_id", "left")
        keep_cols.append("decon_keep")
    if cap_per_source is not None:
        flags = flags.join(_cap_keep(docs, cap_per_source), "doc_id", "left")
        keep_cols.append("cap_keep")
    keep = F.lit(True)
    for c in keep_cols:
        keep = keep & F.col(c)
    flags = A._fill(flags.withColumn("keep", keep))

    agg = flags.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        *[F.sum((~F.col(c)).cast("long")).alias(f"drop_{c[:-5]}")
          for c in keep_cols],
    ).collect()[0]
    report = {k: int(agg[k]) for k in agg.asDict()}

    kept = docs.join(flags.filter("keep").select("doc_id"), "doc_id")
    return kept, report
