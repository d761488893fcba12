"""Property tests for the training-data pipeline filter/split operators
(analytic.q_repetition / q_token_bpe / q_source_stats / q_lang_mix /
q_quality_filter / q_split_assign). Value-level identity vs DuckDB is the
driver gate (tools/check_oracle.py); these assert the semantic invariants
the SQL comparison can't express."""

import pyspark.sql.functions as F
import pytest

from searchengines_spark import analytic as A

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return A.load(spark, SF_DIR, "documents").cache()


def test_repetition_bounds(spark, docs):
    rows = A.q_repetition(spark, SF_DIR).collect()
    assert len(rows) == docs.filter(F.col("text") != "").count()
    for r in rows:
        assert 0 < r.top_term_frac <= 1.0
        assert 0 <= r.top_bigram_frac <= 1.0
        # a bigram repeats at most as often as its rarer member appears
        assert r.n_tokens >= 1


def test_repetition_known_doc(spark):
    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "x y"), (3, "w")], ["doc_id", "text"])
    out = {r.doc_id: r for r in A._rep_stats(df).collect()}
    assert out[1].n_tokens == 4
    assert out[1].top_term_frac == pytest.approx(0.75)
    assert out[1].top_bigram_frac == pytest.approx(2 / 3, abs=1e-6)
    assert out[2].top_bigram_frac == pytest.approx(1.0)
    assert out[3].top_bigram_frac == 0.0  # single token: no bigram


def test_token_bpe_counts(spark):
    df = spark.createDataFrame(
        [(1, "abc 7 de9f"), (2, "")], ["doc_id", "text"])
    out = {r.doc_id: r for r in
           df.select("doc_id",
                     F.size(F.expr(f"regexp_extract_all(text, '{A.BPE_PAT}', 0)"))
                     .alias("n")).collect()}
    # 'abc' + '7' + 'de' + '9' + 'f' = 5 BPE-ish tokens (space not matched)
    assert out[1].n == 5
    assert out[2].n == 0


def test_source_stats_partition(spark, docs):
    out = A.q_source_stats(spark, SF_DIR)
    assert out.agg(F.sum("n_docs")).collect()[0][0] == docs.count()
    assert out.filter(F.col("n_dup_texts") < 0).count() == 0


def test_quality_filter_consistency(spark):
    rows = A.q_quality_filter(spark, SF_DIR).collect()
    for r in rows:
        assert r.keep == (r.len_ok and r.wordlen_ok and r.rep_ok)
        assert r.len_ok == (A.QF_MIN_TOKENS <= r.n_tokens <= A.QF_MAX_TOKENS)
    kept = sum(r.keep for r in rows)
    assert 0 < kept < len(rows)  # thresholds split the corpus non-trivially


def test_split_assign_deterministic_and_disjoint(spark, docs):
    a = {r.doc_id: r.split for r in A.q_split_assign(spark, SF_DIR).collect()}
    b = {r.doc_id: r.split for r in A.q_split_assign(spark, SF_DIR).collect()}
    assert a == b  # hash-based: stable across runs (no random())
    assert len(a) == docs.count()
    assert set(a.values()) <= {"train", "valid", "test"}


def test_lang_mix_totals(spark, docs):
    out = A.q_lang_mix(spark, SF_DIR)
    assert out.agg(F.sum("n")).collect()[0][0] == docs.count()


def test_lm_score_orders_probability(spark):
    """Docs made of rarer tokens must score higher nll than common-token docs."""
    out = {r.doc_id: r.nll for r in A.q_lm_score(spark, SF_DIR).collect()}
    assert all(v > 0 for v in out.values())


def test_tfidf_topterm_properties(spark, docs):
    rows = A.q_tfidf_topterms(spark, SF_DIR).collect()
    assert len(rows) == docs.filter(F.col("text") != "").count()
    texts = {r.doc_id: set(r.text.split()) for r in docs.collect()}
    for r in rows:
        assert r.top_term in texts[r.doc_id]  # keyword comes from the doc
        assert r.tfidf >= 0
