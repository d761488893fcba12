"""End-to-end curation driver (curate.curate): stage flags compose the
already-gated operators; these tests check the composition invariants the
per-op DuckDB gates can't see — report consistency, one-survivor-per-dup-
group, benchmark-overlap drops, per-source caps."""

import pyspark.sql.functions as F
import pytest

from searchengines_spark import analytic as A
from searchengines_spark.curate import curate

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return A.load(spark, SF_DIR, "documents").cache()


def test_report_consistent_and_kept_matches(spark, docs):
    kept, report = curate(docs)
    assert report["n_docs"] == docs.count()
    assert report["n_kept"] == kept.count()
    assert 0 < report["n_kept"] <= report["n_docs"]
    assert kept.columns == docs.columns
    # drops are attributable: every non-kept doc fails >= 1 stage
    assert (report["drop_q"] + report["drop_exact"] + report["drop_near"]
            >= report["n_docs"] - report["n_kept"])


def test_no_exact_or_near_dups_survive(spark, docs):
    kept, _ = curate(docs)
    # exact: kept md5s are unique
    n = kept.count()
    assert kept.select(F.md5("text")).distinct().count() == n
    # near: no verified dup pair has both ends kept
    sh, cand = A._lsh64_sh_cand_df(docs)
    pairs = (A._jaccard_for_pairs(sh, cand)
             .filter(F.col("jaccard") >= 0.5).select("a_id", "b_id"))
    ids = kept.select(F.col("doc_id").alias("a_id"))
    both = (pairs.join(ids, "a_id")
            .join(kept.select(F.col("doc_id").alias("b_id")), "b_id"))
    assert both.count() == 0
    A.release_caches()


def test_decontamination_drops_overlapping_docs(spark, docs):
    # benchmark = verbatim copies of two training docs -> both must drop
    bench = (docs.filter(F.col("doc_id").isin([3, 7]))
             .select(F.col("doc_id").alias("doc_id"), "text"))
    kept_plain, rep_plain = curate(docs)
    A.release_caches()
    kept, report = curate(docs, benchmark=bench)
    assert kept.filter(F.col("doc_id").isin([3, 7])).count() == 0
    assert report["drop_decon"] >= 2
    assert report["n_kept"] <= rep_plain["n_kept"]
    A.release_caches()


def test_cap_per_source(spark, docs):
    kept, report = curate(docs, cap_per_source=2)
    per = kept.groupBy("source").count().collect()
    assert all(r["count"] <= 2 for r in per)
    assert report["drop_cap"] > 0
    A.release_caches()
