"""embed_dup_pairs (sign-LSH embedding near-dup) vs an independent numpy
replica.

The replica regenerates the deterministic hyperplanes with hashlib.md5 (not
Spark's md5), computes sign bits / bands / candidates / exact cosine in
numpy, and must agree with the Spark pipeline EXACTLY — pairs, and cosines
to 1e-6. This cross-checks the whole scheme (hash, plane coefficients,
band packing, candidate join, verification threshold) against a second
implementation, the same way oracle.py backs the retrieval operators.
"""

import hashlib

import numpy as np
import pyarrow.parquet as pq

from searchengines_spark.analytic import (
    EMB_COS_T,
    SLSH_BAND_BITS,
    SLSH_PLANES,
    q_embed_dup_pairs,
)

SF_DIR = "/root/testdata/sf0.001"


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _replica_pairs(vecs: np.ndarray, ids: np.ndarray):
    n, dim = vecs.shape
    # plane coefficients: hashed from (plane, 1-based dim), in [-1, 1]
    coef = np.array(
        [[(_h32(f"plane_{p}_{i+1}") % 2001 - 1000) / 1000.0 for i in range(dim)]
         for p in range(SLSH_PLANES)]
    )
    bits = (coef @ vecs.T >= 0).astype(np.int64)  # (planes, n)
    n_bands = SLSH_PLANES // SLSH_BAND_BITS
    weights = 1 << np.arange(SLSH_BAND_BITS, dtype=np.int64)
    bands = np.stack([
        (bits[j * SLSH_BAND_BITS:(j + 1) * SLSH_BAND_BITS].T * weights).sum(axis=1)
        for j in range(n_bands)
    ])  # (bands, n)
    cand = set()
    for j in range(n_bands):
        buckets: dict = {}
        for r, bv in enumerate(bands[j]):
            buckets.setdefault(int(bv), []).append(r)
        for rows in buckets.values():
            for ai in range(len(rows)):
                for bi in range(ai + 1, len(rows)):
                    a, b = rows[ai], rows[bi]
                    ra, rb = (a, b) if ids[a] < ids[b] else (b, a)
                    cand.add((ra, rb))
    nrm = np.linalg.norm(vecs, axis=1)
    out = {}
    for a, b in cand:
        cos = float(vecs[a] @ vecs[b] / (nrm[a] * nrm[b]))
        if cos >= EMB_COS_T:
            out[(int(ids[a]), int(ids[b]))] = round(cos, 6)
    return out


def test_embed_dup_pairs_matches_numpy_replica(spark):
    tbl = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    ids = np.asarray(tbl.column("vec_id").to_pylist(), dtype=np.int64)
    vecs = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    expect = _replica_pairs(vecs, ids)

    got = {(r["a_id"], r["b_id"]): r["cos"]
           for r in q_embed_dup_pairs(spark, SF_DIR).collect()}
    assert set(got) == set(expect)
    for k in got:
        assert abs(got[k] - expect[k]) <= 1e-6, (k, got[k], expect[k])
