"""Product-quantization ANN: codebook training, 16-byte codes, ADC search,
exact refinement, IVF-PQ layout.

Fixture caveat (same as test_ann.py): the synthetic embeddings are
near-uniform in 64-dim — the worst case for any quantizer, since cosine
gaps between neighbors are tiny and quantization error swamps them. The
gates therefore check (a) invariants that hold on ANY data — full
refinement IS exact search, determinism, compression ratio — and (b)
measured-with-margin recall floors for this fixture (ADC-only mean
recall@10 measured 0.66 at m=16/k=64; the 150-candidate shortlist
contained the exact top-10 for 12/12 probe queries)."""

import numpy as np
import pytest

from searchengines_spark import pq
from searchengines_spark.ann import exact_topk_local, train_ivf

SF_DIR = "/root/testdata/sf0.01"
M, K = 16, 64


@pytest.fixture(scope="module")
def fixture(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    books = pq.train_pq(emb, m=M, k=K, seed=7)
    codes = pq.pq_encode(emb, books).cache()
    rows = emb.collect()
    return emb, books, codes, rows


def test_codebooks_and_codes(fixture):
    emb, books, codes, rows = fixture
    assert books.shape == (M, K, 64 // M)
    got = codes.collect()
    assert len(got) == len(rows)
    assert all(len(r["code"]) == M for r in got)  # 16 B vs 256 B float32
    # deterministic: retrain + re-encode is byte-identical
    books2 = pq.train_pq(emb, m=M, k=K, seed=7)
    assert np.array_equal(books, books2)
    got2 = {r["vec_id"]: r["code"] for r in pq.pq_encode(emb, books2).collect()}
    assert all(got2[r["vec_id"]] == r["code"] for r in got)


def test_adc_recall_floor(fixture):
    emb, books, codes, rows = fixture
    by_id = {r["vec_id"]: r for r in rows}
    recalls = []
    for q in range(12):
        qv = np.asarray(by_id[q]["embedding"], dtype=np.float64)
        exact = exact_topk_local(rows, qv, k=10, exclude_vec_id=q)
        adc = [r["vec_id"]
               for r in pq.pq_topk(codes, books, qv, k=10, exclude_vec_id=q).collect()]
        recalls.append(len(set(adc) & set(exact)) / 10)
    # measured 0.66 mean on this fixture; chance level is 10/499 ~ 0.02
    assert np.mean(recalls) >= 0.4
    assert min(recalls) >= 0.2


def test_refine_recovers_exact(fixture):
    """ADC top-150 shortlist + exact re-rank == exact top-10 on all probe
    queries (measured containment 12/12); full refinement (R = corpus) is
    exact search BY CONSTRUCTION and must match on any data."""
    emb, books, codes, rows = fixture
    by_id = {r["vec_id"]: r for r in rows}
    for q in range(12):
        qv = np.asarray(by_id[q]["embedding"], dtype=np.float64)
        exact = exact_topk_local(rows, qv, k=10, exclude_vec_id=q)
        ref = [r["vec_id"]
               for r in pq.pq_topk(codes, books, qv, k=10, refine=150,
                                   emb=emb, exclude_vec_id=q).collect()]
        assert ref == exact, f"refine=150 mismatch for query {q}"
    # invariant leg: refine covering the whole corpus == exact, always
    qv = np.asarray(by_id[0]["embedding"], dtype=np.float64)
    full = [r["vec_id"]
            for r in pq.pq_topk(codes, books, qv, k=10, refine=len(rows),
                                emb=emb, exclude_vec_id=0).collect()]
    assert full == exact_topk_local(rows, qv, k=10, exclude_vec_id=0)


def test_ivfpq_roundtrip_and_probe(fixture, spark, tmp_path):
    emb, books, codes, rows = fixture
    cents = train_ivf(emb, n_cells=8, seed=7)
    path = str(tmp_path / "ivfpq")
    pq.write_ivfpq(emb, cents, books, path)
    codes2, cents2, books2 = pq.read_ivfpq(spark, path)
    assert np.allclose(cents, cents2) and np.allclose(books, books2)
    assert codes2.count() == len(rows)
    assert "cell" in codes2.columns

    by_id = {r["vec_id"]: r for r in rows}
    qv = np.asarray(by_id[0]["embedding"], dtype=np.float64)
    exact = exact_topk_local(rows, qv, k=10, exclude_vec_id=0)
    # full probe + full refine IS exact search
    full = [r["vec_id"]
            for r in pq.ivfpq_topk(codes2, cents2, books2, qv, k=10,
                                   n_probe=8, refine=len(rows), emb=emb,
                                   exclude_vec_id=0).collect()]
    assert full == exact
    # partial probe: recall floor (IVF cell recall bounds it; test_ann
    # measured ~0.92 at n_probe=6 on this fixture)
    recalls = []
    for q in range(8):
        qv = np.asarray(by_id[q]["embedding"], dtype=np.float64)
        exact = exact_topk_local(rows, qv, k=10, exclude_vec_id=q)
        got = [r["vec_id"]
               for r in pq.ivfpq_topk(codes2, cents2, books2, qv, k=10,
                                      n_probe=6, refine=150, emb=emb,
                                      exclude_vec_id=q).collect()]
        recalls.append(len(set(got) & set(exact)) / 10)
    assert np.mean(recalls) >= 0.6


def test_pq_batch_multi_query(fixture):
    """Batch search scores all queries in one pass and matches the
    single-query path exactly."""
    emb, books, codes, rows = fixture
    by_id = {r["vec_id"]: r for r in rows}
    queries = {str(q): np.asarray(by_id[q]["embedding"], dtype=np.float64)
               for q in range(5)}
    batch = pq.pq_topk_batch(codes, books, queries, k=10).collect()
    by_q = {}
    for r in sorted(batch, key=lambda r: r["rank"]):
        by_q.setdefault(r["qid"], []).append(r["vec_id"])
    for q, qv in queries.items():
        single = [r["vec_id"] for r in pq.pq_topk(codes, books, qv, k=10).collect()]
        assert by_q[q] == single


def test_pq_cache_key_tracks_input_files(tmp_path):
    """q_pq_topk's codebook memo keys on the embeddings files' content
    signature (size/mtime), so rewriting the data at the same path is a
    cache miss — never stale codebooks — while an untouched path hits."""
    import os
    import time

    from searchengines_spark.analytic import _pq_cache_key

    root = tmp_path / "embeddings.parquet"
    root.mkdir()
    f = root / "part-0.parquet"
    f.write_bytes(b"aaaa")
    k1 = _pq_cache_key(str(tmp_path), 16, 64, 7)
    assert _pq_cache_key(str(tmp_path), 16, 64, 7) == k1  # stable
    time.sleep(0.01)
    f.write_bytes(b"bbbbbbbb")  # same path, new data
    k2 = _pq_cache_key(str(tmp_path), 16, 64, 7)
    assert k2 != k1
    os.utime(f, ns=(1, 1))
    assert _pq_cache_key(str(tmp_path), 16, 64, 7) != k2  # mtime-sensitive
