import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from searchengines_spark.index import codec


def test_varint_roundtrip_basic():
    for arr in ([0], [1], [127], [128], [2**32], [2**63], [0, 1, 300, 2**40, 5]):
        a = np.array(arr, dtype=np.uint64)
        assert codec.decode_varint(codec.encode_varint(a)).tolist() == arr


def test_varint_empty():
    assert codec.encode_varint(np.empty(0, dtype=np.uint64)) == b""
    assert codec.decode_varint(b"").size == 0


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
def test_varint_roundtrip_hypothesis(vals):
    a = np.array(vals, dtype=np.uint64)
    out = codec.decode_varint(codec.encode_varint(a))
    assert out.tolist() == vals


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300, unique=True))
def test_block_roundtrip(docs):
    docids = np.array(sorted(docs), dtype=np.uint64)
    tfs = (docids % 7 + 1).astype(np.uint64)
    lens = (docids % 100 + 10).astype(np.uint64)
    dz, tz, lz = codec.encode_block(docids, tfs, lens)
    d, t, l = codec.decode_block(dz, tz, lz)
    assert d.tolist() == docids.tolist()
    assert t.tolist() == tfs.tolist()
    assert l.tolist() == lens.tolist()


def test_positions_roundtrip():
    pls = [np.array([0, 5, 9], dtype=np.uint64), np.array([], dtype=np.uint64),
           np.array([3], dtype=np.uint64), np.array([1, 2, 3, 1000], dtype=np.uint64)]
    buf = codec.encode_positions(pls)
    out = codec.decode_positions(buf, len(pls))
    assert [o.tolist() for o in out] == [p.tolist() for p in pls]


def test_bm25_upper_bound_dominates():
    rng = np.random.default_rng(0)
    tfs = rng.integers(1, 20, 50).astype(np.uint64)
    lens = rng.integers(10, 500, 50).astype(np.uint64)
    ub = codec.bm25_upper_bound(tfs, lens, df=100, n_docs=10_000, avg_doclen=120.0)
    idf = max(0.0, np.log((10_000 - 100 + 0.5) / (100 + 0.5)))
    scores = idf * tfs / (tfs + 1.2 * (0.25 + 0.75 * lens / 120.0))
    assert ub >= scores.max() - 1e-12
