"""Iceberg-semantics snapshot layer: every build/append/compact commits an
immutable numbered snapshot; time-travel readers reproduce historical
results bit-for-bit; expiry reclaims unreferenced files; no-op resumes do
not mint snapshots."""

import math
import os

import pytest

from searchengines_spark.corpus import generate_pages
from searchengines_spark.engine import Engine
from searchengines_spark.index import IndexReader, build_index
from searchengines_spark.index.incremental import append_pages, compact
from searchengines_spark.index.snapshots import (
    expire_snapshots,
    list_snapshots,
    snapshot_dir,
)

QUERY = "haceba4 badiba5 dibaba2"  # Zipf-tail terms: nonzero idf


def _topk(spark, d, snapshot=None, k=15):
    e = Engine(IndexReader(spark, d, snapshot=snapshot))
    return [(r["url"], r["score"]) for r in e.search(QUERY, "bm25", k).collect()]


@pytest.fixture(scope="module")
def versioned_index(spark, tmp_path_factory):
    """v1 = build over the first half, v2 = append of the second half,
    v3 = compaction. Captures the live top-k as of each commit."""
    root = tmp_path_factory.mktemp("snap")
    pages_all = generate_pages(spark, 300, seed=42, partitions=4)
    pages_all.write.parquet(str(root / "pages"))
    all_df = spark.read.parquet(str(root / "pages"))
    first = all_df.filter("url < 'https://www5'")
    rest = all_df.filter("url >= 'https://www5'")

    d = str(root / "idx")
    m1 = build_index(spark, first, d, n_salts=4)
    r1 = _topk(spark, d)
    m2 = append_pages(spark, d, rest)
    r2 = _topk(spark, d)
    m3 = compact(spark, d, n_salts=4)
    r3 = _topk(spark, d)
    assert (m1["snapshot"], m2["snapshot"], m3["snapshot"]) == (1, 2, 3)
    return d, r1, r2, r3


def test_snapshot_log(spark, versioned_index):
    d, *_ = versioned_index
    snaps = list_snapshots(d)
    assert [s["version"] for s in snaps] == [1, 2, 3]
    assert [s["operation"] for s in snaps] == ["build", "append", "compact"]
    assert [s["parent"] for s in snaps] == [None, 1, 2]
    assert snaps[1]["n_docs"] > snaps[0]["n_docs"]
    assert snaps[2]["n_docs"] == snaps[1]["n_docs"]


def test_time_travel_reproduces_history(spark, versioned_index):
    d, r1, r2, r3 = versioned_index
    # the corpus grew: the pre-append ranking differs from the live one
    assert r1 != r3
    for snap, want in ((1, r1), (2, r2), (3, r3)):
        got = _topk(spark, d, snapshot=snap)
        assert [u for u, _ in got] == [u for u, _ in want], snap
        for (_, gs), (_, ws) in zip(got, want):
            assert math.isclose(gs, ws, rel_tol=1e-12), snap


def test_snapshots_share_inodes_not_bytes(spark, versioned_index):
    """Snapshot data files are hard links of live/append-time files — the
    commit copies no posting bytes (Iceberg's pin-by-reference model)."""
    d, *_ = versioned_index
    v2 = snapshot_dir(d, 2)
    shared = total = 0
    for walk_root, _dirs, files in os.walk(os.path.join(v2, "docids")):
        for f in files:
            total += 1
            if os.stat(os.path.join(walk_root, f)).st_nlink >= 2:
                shared += 1
    assert total > 0 and shared == total


def test_expire_reclaims_old_versions(spark, versioned_index):
    d, _r1, _r2, r3 = versioned_index
    # stale-read guard: an expired snapshot must fail loudly, not serve
    assert expire_snapshots(d, keep_last=1) == [1, 2]
    assert [s["version"] for s in list_snapshots(d)] == [3]
    assert not os.path.isdir(snapshot_dir(d, 1))
    with pytest.raises(FileNotFoundError):
        IndexReader(spark, d, snapshot=1)
    # the live tree and the kept snapshot still serve identically
    assert _topk(spark, d) == r3
    assert _topk(spark, d, snapshot=3) == r3


def test_noop_resume_mints_no_snapshot(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("snapres")
    pages = generate_pages(spark, 120, seed=7, partitions=4)
    d = str(root / "idx")
    m = build_index(spark, pages, d, n_salts=2)
    assert m["snapshot"] == 1
    m2 = build_index(spark, pages, d, n_salts=2, resume=True)
    assert m2["snapshot"] == 1  # all stages skipped -> same snapshot
    assert [s["version"] for s in list_snapshots(d)] == [1]
