"""store_positions=False (Lucene DOCS_AND_FREQS analog): serving blocks omit
position payloads (~half of all block bytes); BM25/boolean/WAND results are
bit-identical to a full-positional twin; positional operators raise at plan
time; compact(store_positions=True) restores positions from the forward
table (no re-tokenize)."""

import math
import os

import pytest

from searchengines_spark.corpus import generate_pages
from searchengines_spark.engine import Engine
from searchengines_spark.index import IndexReader, build_index
from searchengines_spark.index.incremental import append_pages, compact


@pytest.fixture(scope="module")
def twin_dirs(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("dfidx")
    pages = generate_pages(spark, 400, seed=42, partitions=4)
    m_pos = build_index(spark, pages, str(d / "with_pos"), n_salts=4)
    m_nop = build_index(spark, pages, str(d / "no_pos"), n_salts=4,
                        store_positions=False)
    return str(d / "with_pos"), str(d / "no_pos"), m_pos, m_nop


def test_docs_freqs_smaller_and_rank_identical(spark, twin_dirs):
    dp, dn, m_pos, m_nop = twin_dirs
    assert m_nop["bytes_compressed"] < 0.6 * m_pos["bytes_compressed"]
    ep, en = Engine(IndexReader(spark, dp)), Engine(IndexReader(spark, dn))
    for q, model in [("cebaba1 dibaba2 fobaba3", "bm25"),
                     ("#AND( cebaba1 dibaba2 )", "bm25"),
                     ("#OR( cebaba1 gubaba4 )", "rankedboolean"),
                     ("#WAND( 0.6 cebaba1 0.4 dibaba2 )", "indri")]:
        want = [(r.url, r.score) for r in ep.search(q, model=model, k=30).collect()]
        got = [(r.url, r.score) for r in en.search(q, model=model, k=30).collect()]
        assert [u for u, _ in got] == [u for u, _ in want], q
        for (_, gs), (_, ws) in zip(got, want):
            assert math.isclose(gs, ws, rel_tol=1e-12)


def test_docs_freqs_wand_identical(spark, twin_dirs):
    from searchengines_spark.query.wand import wand_topk

    dp, dn, _, _ = twin_dirs
    rp = IndexReader(spark, dp)
    rn = IndexReader(spark, dn)
    assert rn.store_positions is False and rp.store_positions is True
    want = [(r.url, r.score) for r in
            wand_topk(rp, ["cebaba1", "dibaba2"], k=15).collect()]
    got = [(r.url, r.score) for r in
           wand_topk(rn, ["cebaba1", "dibaba2"], k=15).collect()]
    assert got == want


def test_docs_freqs_positional_raises(spark, twin_dirs):
    _, dn, _, _ = twin_dirs
    en = Engine(IndexReader(spark, dn))
    with pytest.raises(ValueError, match="store_positions=False"):
        en.search("#NEAR/3( cebaba1 dibaba2 )", model="bm25", k=10).collect()


def test_docs_freqs_append_inherits_and_compact_restores(spark, twin_dirs, tmp_path):
    import shutil

    _, dn, _, _ = twin_dirs
    d = str(tmp_path / "idx")
    shutil.copytree(dn, d)
    extra = generate_pages(spark, 460, seed=42, partitions=4).filter(
        "url like '%p00000004%'")
    append_pages(spark, d, extra)
    r = IndexReader(spark, d)
    assert r.store_positions is False  # append kept the layout
    assert Engine(r).search("cebaba1 dibaba2", "bm25", 5).count() == 5
    # converting compact: positions restored from the forward table
    compact(spark, d, store_positions=True)
    r2 = IndexReader(spark, d)
    assert r2.store_positions is True
    got = Engine(r2).search("#NEAR/3( cebaba1 dibaba2 )", "bm25", 10).collect()
    assert len(got) >= 0  # positional path plans and runs
