"""Deterministic compute-scale replicas of the sf0.1 driver tables.

The analytics battery at sf0.1 is fixed-job-cost dominated (documents is
5,000 rows; every query finishes in 0.3-3.8s regardless of CPU width), so an
8-vs-32-CPU comparison there measures Spark's per-job overhead, not the
engine. This tool manufactures a compute-dominated input — DETERMINISTIC,
derived only from the driver's own sf0.1 parquet, no external data — and
writes it as ``/tmp/sgbig_sf6.4/{documents,embeddings,events}.parquet``:

- documents ×64: replica k remaps ``doc_id += k * 10_000_000``,
  token-shuffles ``text`` AND substitutes ~25% of token positions with
  replica-private tokens, all with an rng seeded by ``(k, blake2b(text))``.
  Seeding by CONTENT (not doc_id) means exact-duplicate families survive
  inside each replica (all copies of a text get the same permutation and
  substitution), so the dedup ops keep a realistic, linearly-scaling
  candidate workload — while any two replicas of the same doc diverge in
  BOTH token order and token bag, so cross-replica shingle/substring
  overlap collapses AND order-independent fingerprints (SimHash is a pure
  bag function — a permutation-only perturbation leaves all 64 replicas
  of a doc with IDENTICAL 64-bit fingerprints, manufacturing quadratic
  64-wide dup families that a pair-listing op must, by definition, emit)
  decorrelate. Candidate sets stay O(K), not O(K^2).
- embeddings ×32: replica k remaps ``vec_id`` and maps the vector through a
  norm-preserving decorrelator (per-k ±1 sign mask from a seeded rng, then
  roll by k), so brute-force/PQ/sign-LSH workloads scale linearly without
  manufacturing K^2 trivial near-dup pairs.
- events ×16: pure-Catalyst offsets (ids, user ids, ts + k·7 days) — keeps
  per-user session structure, scales sessionization state linearly.

The directory name ends in ``sf6.4`` so bench.py's SF parse reads 6.4
(64 × sf0.1). Idempotent: skips tables whose _SUCCESS already exists
unless --force.
"""

from __future__ import annotations

import hashlib
import os
import sys
from typing import Iterator

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

K_DOCS, K_EMB, K_EVENTS = 64, 32, 16
SRC = os.environ.get("SCALED_SRC", "/root/testdata/sf0.1")
OUT = os.environ.get("SCALED_OUT", "/tmp/sgbig_sf6.4")


def _done(table: str) -> bool:
    return os.path.exists(os.path.join(OUT, f"{table}.parquet", "_SUCCESS"))


def scale_documents(spark) -> None:
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    reps = docs.crossJoin(
        spark.range(K_DOCS).select(F.col("id").cast("int").alias("k"))
    ).repartition(64, "doc_id", "k")

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ])

    def perturb(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            texts = []
            for k, text in zip(pdf["k"].to_numpy(), pdf["text"]):
                toks = text.split(" ")
                seed = int.from_bytes(
                    hashlib.blake2b(text.encode(), digest_size=8).digest(),
                    "big") ^ (int(k) * 0x9E3779B97F4A7C15 & (1 << 64) - 1)
                rng = np.random.default_rng(seed)
                arr = np.array(toks, dtype=object)[rng.permutation(len(toks))]
                # replica-private substitution (~25% of positions): breaks
                # cross-replica BAG identity (SimHash et al.), keeps
                # within-replica exact-dup families (same text -> same seed)
                mask = rng.random(len(arr)) < 0.25
                n_sub = int(mask.sum())
                if n_sub:
                    arr[mask] = [f"xr{int(k)}w{w}" for w in
                                 rng.integers(0, 4096, size=n_sub)]
                texts.append(" ".join(arr))
            out = pd.DataFrame({
                "doc_id": pdf["doc_id"] + pdf["k"].astype("int64") * 10_000_000,
                "text": texts,
                "lang": pdf["lang"],
                "source": pdf["source"],
            })
            out["n_chars"] = out["text"].str.len().astype("int64")
            yield out

    reps.mapInPandas(perturb, schema).write.mode("overwrite").parquet(
        f"{OUT}/documents.parquet")


def scale_embeddings(spark) -> None:
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    reps = emb.crossJoin(
        spark.range(K_EMB).select(F.col("id").cast("int").alias("k"))
    ).repartition(32, "vec_id", "k")

    signs = {k: np.where(np.random.default_rng(9000 + k).random(dim) < 0.5,
                         np.float32(-1.0), np.float32(1.0))
             for k in range(K_EMB)}
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ])

    def perturb(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vecs = []
            for k, v in zip(pdf["k"].to_numpy(), pdf["embedding"]):
                a = np.asarray(v, dtype=np.float32)
                vecs.append(np.roll(a * signs[int(k)], int(k)))
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"] + pdf["k"].astype("int64") * 10_000_000,
                "embedding": vecs,
                "label": pdf["label"],
            })

    reps.mapInPandas(perturb, schema).write.mode("overwrite").parquet(
        f"{OUT}/embeddings.parquet")


def scale_events(spark) -> None:
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{SRC}/events.parquet")
    (ev.crossJoin(spark.range(K_EVENTS).select(F.col("id").alias("k")))
       .select(
           (F.col("event_id") + F.col("k") * 100_000_000).alias("event_id"),
           (F.col("ts") + F.make_interval(days=F.col("k") * 7)).alias("ts"),
           (F.col("user_id") + F.col("k") * 10_000_000).alias("user_id"),
           "event_type", "value", "props")
       .repartition(32)
       .write.mode("overwrite").parquet(f"{OUT}/events.parquet"))


def main() -> None:
    force = "--force" in sys.argv
    from searchengines_spark.session import get_spark
    spark = get_spark("make_scaled", cores=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "32")))
    for table, fn in [("documents", scale_documents),
                      ("embeddings", scale_embeddings),
                      ("events", scale_events)]:
        if _done(table) and not force:
            print(f"skip {table} (exists)")
            continue
        fn(spark)
        n = spark.read.parquet(f"{OUT}/{table}.parquet").count()
        print(f"wrote {table}: {n} rows")
    spark.stop()


if __name__ == "__main__":
    main()
