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


def test_contamination_semantics(spark, docs):
    """Brute-force replica on the small fixture: a train doc is contaminated
    iff its 5-gram set intersects the benchmark slice's 5-gram set."""
    texts = {r.doc_id: r.text.split() for r in docs.collect()}

    def grams(ts):
        return {" ".join(ts[i:i + A.CONTAM_N])
                for i in range(len(ts) - A.CONTAM_N + 1)}

    bench = set()
    for d, ts in texts.items():
        if d % A.CONTAM_MOD == 0:
            bench |= grams(ts)
    out = {r.doc_id: r for r in A.q_contamination(spark, SF_DIR).collect()}
    assert set(out) == {d for d in texts if d % A.CONTAM_MOD != 0}
    for d, r in out.items():
        expect = len(grams(texts[d]) & bench)
        assert r.n_shared == expect
        assert r.contaminated == (expect > 0)


def test_doc_entropy_known_values(spark):
    import math

    df = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b"), (3, "a a b b c c d d")],
        ["doc_id", "text"])
    tok = df.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "term")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "term")
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    g = tf.groupBy("doc_id").agg(
        F.sum("tf").alias("n"), F.sum(F.col("tf") * F.log2("tf")).alias("s"))
    out = {r.doc_id: r.e for r in g.select(
        "doc_id", (F.log2("n") - F.col("s") / F.col("n")).alias("e")).collect()}
    assert out[1] == pytest.approx(0.0)       # single repeated token
    assert out[2] == pytest.approx(1.0)       # uniform over 2
    assert out[3] == pytest.approx(2.0)       # uniform over 4
    sf_out = A.q_doc_entropy(spark, SF_DIR).collect()
    for r in sf_out:
        assert r.entropy >= 0.0
    assert math.isfinite(max(r.entropy for r in sf_out))


def test_ngram_topk_counts(spark, docs):
    out = A.q_ngram_topk(spark, SF_DIR).collect()
    assert len(out) <= A.NGRAM_TOPK_K
    ns = [r.n for r in out]
    assert ns == sorted(ns, reverse=True)
    # brute-force top count on the fixture
    from collections import Counter
    c = Counter()
    for r in docs.collect():
        ts = r.text.split()
        for i in range(len(ts) - 2):
            c[" ".join(ts[i:i + 3])] += 1
    assert out[0].n == max(c.values())


def test_length_quantiles_monotone(spark, docs):
    r = A.q_length_quantiles(spark, SF_DIR).collect()[0]
    assert r.n_docs == docs.filter(F.col("text") != "").count()
    assert r.p50 <= r.p90 <= r.p99
    assert r.mean_len > 0
