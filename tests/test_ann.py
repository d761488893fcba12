"""IVF ANN: trained coarse quantizer, multi-probe search, recall gate.

Recall@10 vs the exact cosine ranking must be >= 0.9 on the sf0.01
embeddings fixture, and exactly 1.0 when every cell is probed (IVF with
full probe IS exact search).

Fixture caveat, measured: the synthetic embeddings are near-uniform in
64-dim — exact top-10 neighbors share the query's label only ~22% of the
time and k-means purity vs label is ~0.17 (chance). On structureless data
ANY inverted-file index needs a high probe ratio for high recall; the gate
therefore runs at n_cells=8 / n_probe=6 (measured 0.92). On clustered
corpora the same code hits the 0.9 at much lower probe ratios."""

import numpy as np
import pytest

from searchengines_spark.ann import (
    assign_cells,
    exact_topk_local,
    ivf_topk,
    ivf_topk_batch,
    probe_cells,
    train_ivf,
)

SF_DIR = "/root/testdata/sf0.01"
N_CELLS = 8


@pytest.fixture(scope="module")
def fixture(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = train_ivf(emb, n_cells=N_CELLS, seed=7)
    cells = assign_cells(emb, cents).cache()
    rows = emb.collect()
    return emb, cents, cells, rows


def test_quantizer_shape_and_coverage(fixture):
    emb, cents, cells, rows = fixture
    assert cents.shape == (N_CELLS, 64)
    assert np.allclose(np.linalg.norm(cents, axis=1), 1.0)
    got = cells.groupBy("cell").count().collect()
    assert sum(r["count"] for r in got) == len(rows)
    assert all(0 <= r["cell"] < N_CELLS for r in got)
    # cells must be non-degenerate: no single cell swallowing everything
    assert max(r["count"] for r in got) < len(rows)


def test_recall_at_10(fixture):
    emb, cents, cells, rows = fixture
    by_id = {r["vec_id"]: r for r in rows}
    qids = [int(r["vec_id"]) for r in rows[:20]]
    queries = {str(q): np.asarray(by_id[q]["embedding"], dtype=np.float64) for q in qids}
    got = ivf_topk_batch(cells, cents, queries, k=10, n_probe=6).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["qid"], []).append((r["rank"], r["vec_id"]))
    recalls = []
    for q in qids:
        want = set(exact_topk_local(rows, queries[str(q)], k=10))
        have = {v for _, v in by_q.get(str(q), [])}
        recalls.append(len(want & have) / 10.0)
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.9, f"recall@10 = {mean_recall:.3f}"


def test_full_probe_is_exact(fixture):
    emb, cents, cells, rows = fixture
    qv = np.asarray(rows[3]["embedding"], dtype=np.float64)
    want = exact_topk_local(rows, qv, k=10, exclude_vec_id=int(rows[3]["vec_id"]))
    got = [r["vec_id"] for r in
           ivf_topk(cells, cents, qv, k=10, n_probe=N_CELLS,
                    exclude_vec_id=int(rows[3]["vec_id"])).collect()]
    assert got == want


def test_probe_cells_orders_by_similarity(fixture):
    emb, cents, cells, rows = fixture
    qv = np.asarray(rows[0]["embedding"], dtype=np.float64)
    p = probe_cells(cents, qv, 5)
    assert len(p) == 5 and len(set(p)) == 5
    sims = cents @ (qv / np.linalg.norm(qv))
    assert sims[p[0]] == pytest.approx(float(np.max(sims)))


def test_probe_scan_prunes(fixture):
    """The probed search must filter on cell before any scoring work — the
    physical plan pushes the cell filter into the scan of a cell-partitioned
    table at scale; here we assert the candidate filter exists at all."""
    emb, cents, cells, rows = fixture
    qv = np.asarray(rows[1]["embedding"], dtype=np.float64)
    df = ivf_topk(cells, cents, qv, k=5, n_probe=2)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "cell" in plan


def test_write_ivf_partition_pruned_probe(fixture, spark, tmp_path):
    """write_ivf materializes one directory per cell; a probe against the
    read-back table must (a) show the probed cells as PartitionFilters in
    the scan — directory-level pruning, the 100 TB path — and (b) return
    exactly the in-memory probe's results."""
    from searchengines_spark.ann import read_ivf, write_ivf

    emb, cents, cells, rows = fixture
    path = str(tmp_path / "ivf_idx")
    write_ivf(emb, cents, path)
    disk_cells, disk_cents = read_ivf(spark, path)
    assert np.allclose(disk_cents, cents)

    qv = np.asarray(rows[2]["embedding"], dtype=np.float64)
    out = ivf_topk(disk_cells, disk_cents, qv, k=10, n_probe=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("cell" in ln and " IN " in ln for ln in pf), pf
    want = [(r["vec_id"], r["cos"]) for r in
            ivf_topk(cells, cents, qv, k=10, n_probe=3).collect()]
    got = [(r["vec_id"], r["cos"]) for r in out.collect()]
    assert [v for v, _ in got] == [v for v, _ in want]
    assert all(abs(g - w) < 1e-9 for (_, g), (_, w) in zip(got, want))
