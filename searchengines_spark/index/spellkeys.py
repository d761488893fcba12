"""SymSpell delete-key sidecar (the spell-suggester's analog of norms.py).

``Engine.suggest`` candidates come from an equi-join on shared delete-
neighborhood keys (analytic.spell_suggest). Generating the VOCAB side of
that join is a vocab-sized explode (~16 keys/term, quadratic in term
length) — fine once, unacceptable per interactive suggestion at a 10^8-term
vocabulary. So the build/compact pipeline materializes it here as an index
sidecar:

- ``spell_keys/`` : (field, k, term, ctf) parquet, range-partitioned and
  sorted on (field, k) so a suggestion's handful of query keys resolves via
  parquet min/max row-group pruning — a point read, like a norms stripe —
  never a vocab scan.
- ``spell_keys/_TS_SIGNATURE.json`` : the (name, size, mtime) signature of
  the ``term_stats`` files the sidecar was derived from. Appends/upserts
  rewrite term_stats without refreshing the sidecar (a vocab-sized job per
  micro-append would be wrong at stream rates); the signature goes stale
  and ``read_spell_keys`` returns None, so ``Engine.suggest`` falls back to
  the on-the-fly delete join until the next compact() — the Lucene pattern
  of suggesters rebuilt at segment-merge time.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SPELL_DIR = "spell_keys"
_SIG_FILE = "_TS_SIGNATURE.json"


def _ts_signature(index_dir: str) -> dict:
    """term_stats file signature with paths RELATIVE to the index dir:
    a hard-linked snapshot tree (index/snapshots.py) shares inodes, sizes
    and mtimes, so its pinned sidecar verifies fresh under the snapshot
    root too — time-travel readers keep the fast suggest path.

    ``params`` pins the DERIVATION, not just the inputs: if a release
    changes SPELL_MAX_LEN or the delete depth, sidecars built by the old
    code stop verifying (term_stats files alone wouldn't notice) and
    suggest() falls back to the on-the-fly join until the next compact()."""
    from ..analytic import SPELL_MAX_LEN
    from ..fsutil import parquet_tree_sig

    ts = os.path.join(index_dir, "term_stats")
    # list-of-lists so the stamp compares equal after a JSON round-trip
    files = [list(t) for t in parquet_tree_sig(ts, rel_to=index_dir)]
    return {"files": files,
            "params": {"max_len": SPELL_MAX_LEN, "depth": 2, "fmt": 1}}


def write_spell_keys(spark: SparkSession, index_dir: str) -> None:
    """Derive the delete-key table from the CURRENT term_stats and stamp it
    with term_stats' file signature. Called by build_index (stats stage) and
    compact(); one vocab-sized explode, amortized over every suggest()."""
    from ..analytic import SPELL_MAX_LEN, _delete_keys

    out = os.path.join(index_dir, SPELL_DIR)
    ts = spark.read.parquet(os.path.join(index_dir, "term_stats"))
    keys = (ts.filter(F.length("term") <= SPELL_MAX_LEN)
            .select("field", "term", F.col("ctf").cast("long").alias("ctf"),
                    F.explode(_delete_keys("term")).alias("k")))
    (keys.repartitionByRange(
        max(spark.sparkContext.defaultParallelism, 8), "field", "k")
        .sortWithinPartitions("field", "k")
        .write.mode("overwrite").parquet(out))
    with open(os.path.join(out, _SIG_FILE), "w") as f:
        json.dump(_ts_signature(index_dir), f)


def read_spell_keys(spark: SparkSession, index_dir: str) -> DataFrame | None:
    """The sidecar frame iff present AND derived from the live term_stats
    files; None (-> caller falls back to the on-the-fly join) otherwise."""
    out = os.path.join(index_dir, SPELL_DIR)
    sig_path = os.path.join(out, _SIG_FILE)
    if not os.path.exists(sig_path):
        return None
    with open(sig_path) as f:
        stamped = json.load(f)
    if stamped != _ts_signature(index_dir):
        return None
    return spark.read.parquet(out)
