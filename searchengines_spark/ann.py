"""IVF approximate-nearest-neighbor over an embedding column.

The reference engine has no vector search; this is part of the
training-data-pipeline extension layer. Classic IVF (inverted-file) shape:

- **train**: distributed k-means (pyspark.ml) over L2-normalized vectors —
  on the unit sphere, euclidean k-means is spherical k-means, so cells are
  cosine-coherent;
- **build**: every vector gets its nearest-centroid ``cell`` id; at scale
  the table is written partitioned by cell so a probe prunes at the
  directory level (here: a filter the scan pushes down);
- **search**: rank centroids against the query (driver-side — centroids are
  tiny), probe the ``n_probe`` nearest cells, exact cosine only within the
  probed cells, distributed top-k.

Scoring is a vectorized Arrow batch kernel (one matrix multiply per batch
per query), never per-row Python. Batch search scores ALL queries in one
pass over the candidate union and does per-batch partial top-k so the
shuffle carries O(batches * queries * k) rows, not O(candidates * queries).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _to_matrix(col: pd.Series) -> np.ndarray:
    return np.vstack([np.asarray(v, dtype=np.float64) for v in col])


def train_ivf(emb: DataFrame, n_cells: int = 16, seed: int = 7,
              max_iter: int = 20) -> np.ndarray:
    """Distributed k-means coarse quantizer. Returns (n_cells, dim) unit-norm
    centroids."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    unit = emb.select(
        array_to_vector(
            F.transform(
                "embedding",
                lambda x: x.cast("double") / F.sqrt(F.aggregate(
                    F.transform("embedding", lambda y: y.cast("double") * y.cast("double")),
                    F.lit(0.0), lambda a, y: a + y)),
            )
        ).alias("features")
    )
    model = KMeans(k=n_cells, seed=seed, maxIter=max_iter).fit(unit)
    cents = np.vstack([np.asarray(c, dtype=np.float64) for c in model.clusterCenters()])
    norms = np.linalg.norm(cents, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return cents / norms


def assign_cells(emb: DataFrame, centroids: np.ndarray) -> DataFrame:
    """Adds ``cell`` = argmax cosine(vector, centroid). Broadcast centroids,
    one matmul per Arrow batch. At scale, write the result partitioned by
    cell: ``.write.partitionBy('cell')`` makes probes partition-pruned."""
    spark = emb.sparkSession
    b_c = spark.sparkContext.broadcast(centroids)
    schema = T.StructType(emb.schema.fields + [T.StructField("cell", T.IntegerType(), False)])

    def kernel(batches):
        cents = b_c.value
        for pdf in batches:
            if not len(pdf):
                continue
            M = _to_matrix(pdf["embedding"])
            nrm = np.linalg.norm(M, axis=1, keepdims=True)
            nrm[nrm == 0] = 1.0
            pdf = pdf.copy()
            pdf["cell"] = np.argmax((M / nrm) @ cents.T, axis=1).astype(np.int32)
            yield pdf

    return emb.mapInPandas(kernel, schema)


def write_ivf(emb: DataFrame, centroids: np.ndarray, path: str) -> None:
    """Materialize the IVF index PHYSICALLY partitioned by cell — one
    directory per cell via .write.partitionBy('cell'), so a probe's
    cell-membership filter prunes at the directory level: the scan's
    PartitionFilters lists the probed cells and unprobed cells' files are
    never opened (plan captured in PLANS.md). Centroids persist beside the
    data as a tiny parquet sidecar so search needs no retraining."""
    spark = emb.sparkSession
    (assign_cells(emb, centroids)
     .write.mode("overwrite").partitionBy("cell").parquet(path))
    spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        ["cell", "centroid"],
    ).coalesce(1).write.mode("overwrite").parquet(path + "_centroids")


def read_ivf(spark, path: str) -> tuple[DataFrame, np.ndarray]:
    """Load a write_ivf index: (cell-partitioned DataFrame, centroids).
    The returned frame's ``cell`` is a partition column — filters on it
    prune directories, which is the scale path for probes."""
    cells = spark.read.parquet(path)
    rows = spark.read.parquet(path + "_centroids").collect()
    dim = len(rows[0]["centroid"])
    cents = np.zeros((len(rows), dim), dtype=np.float64)
    for r in rows:
        cents[int(r["cell"])] = np.asarray(r["centroid"], dtype=np.float64)
    return cells, cents


def probe_cells(centroids: np.ndarray, qv: np.ndarray, n_probe: int) -> list[int]:
    q = np.asarray(qv, dtype=np.float64)
    nq = np.linalg.norm(q)
    sims = centroids @ (q / nq if nq else q)
    return [int(i) for i in np.argsort(-sims)[:n_probe]]


def ivf_topk(emb_cells: DataFrame, centroids: np.ndarray, qv: np.ndarray,
             k: int = 10, n_probe: int = 4,
             exclude_vec_id: int | None = None) -> DataFrame:
    """Single-query IVF search -> (vec_id, cos) top-k, ties broken vec_id asc."""
    out = ivf_topk_batch(emb_cells, centroids, {"q": np.asarray(qv)}, k=k,
                         n_probe=n_probe, exclude_vec_id=exclude_vec_id)
    return out.orderBy("rank").select("vec_id", "cos")


def ivf_topk_batch(emb_cells: DataFrame, centroids: np.ndarray,
                   queries: dict[str, np.ndarray], k: int = 10,
                   n_probe: int = 4,
                   exclude_vec_id: int | None = None) -> DataFrame:
    """Multi-query IVF search in ONE pass: (qid, vec_id, cos, rank)."""
    spark = emb_cells.sparkSession
    qids = sorted(queries)
    Q = np.vstack([np.asarray(queries[q], dtype=np.float64) for q in qids])
    nq = np.linalg.norm(Q, axis=1, keepdims=True)
    nq[nq == 0] = 1.0
    Qn = Q / nq
    probes = {qid: probe_cells(centroids, queries[qid], n_probe) for qid in qids}
    all_cells = sorted({c for p in probes.values() for c in p})
    b = spark.sparkContext.broadcast((qids, Qn, probes, k))

    cand = emb_cells.filter(F.col("cell").isin(all_cells))
    if exclude_vec_id is not None:
        cand = cand.filter(F.col("vec_id") != exclude_vec_id)
    schema = T.StructType([
        T.StructField("qid", T.StringType(), False),
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("cos", T.DoubleType(), False),
    ])

    def kernel(batches):
        qids_, Qn_, probes_, k_ = b.value
        for pdf in batches:
            if not len(pdf):
                continue
            M = _to_matrix(pdf["embedding"])
            nrm = np.linalg.norm(M, axis=1, keepdims=True)
            nrm[nrm == 0] = 1.0
            S = (M / nrm) @ Qn_.T  # (rows, queries)
            cells = pdf["cell"].to_numpy()
            vids = pdf["vec_id"].to_numpy()
            out_q, out_v, out_c = [], [], []
            for j, qid in enumerate(qids_):
                mask = np.isin(cells, probes_[qid])
                if not mask.any():
                    continue
                s = S[mask, j]
                v = vids[mask]
                top = np.argsort(-s)[:k_]  # partial top-k per batch
                out_q.extend([qid] * len(top))
                out_v.extend(v[top].tolist())
                out_c.extend(s[top].tolist())
            if out_q:
                yield pd.DataFrame({"qid": out_q, "vec_id": out_v, "cos": out_c})

    scored = cand.mapInPandas(kernel, schema)
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def exact_topk_local(emb_rows: list, qv: np.ndarray, k: int = 10,
                     exclude_vec_id: int | None = None) -> list[int]:
    """Driver-side exact oracle for tests (tiny fixtures only)."""
    ids = np.array([r["vec_id"] for r in emb_rows])
    M = np.vstack([np.asarray(r["embedding"], dtype=np.float64) for r in emb_rows])
    q = np.asarray(qv, dtype=np.float64)
    cos = (M @ q) / (np.linalg.norm(M, axis=1) * np.linalg.norm(q))
    order = np.lexsort((ids, -cos))
    out = [int(ids[i]) for i in order if exclude_vec_id is None or ids[i] != exclude_vec_id]
    return out[:k]
