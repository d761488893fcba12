"""Iceberg-style snapshot layer over the index tables.

The north rule asks for "Iceberg-backed index tables"; the container has no
Iceberg runtime jar, so the PARQUET layout stands in for the data files and
this module supplies the table-format semantics that actually matter to an
index pipeline:

- **snapshot-per-commit**: every build / append / compact commits an
  immutable, numbered snapshot (``snapshots/v{N}.json`` + a hard-linked
  file tree under ``snapshots/data/v{N}/``). Hard links are metadata-only
  — no page or posting bytes are copied — which is precisely Iceberg's
  model of old snapshots pinning data files by reference until expiry.
  (On a real cluster the link step is an Iceberg catalog commit instead;
  the call sites and semantics are identical.)
- **time travel**: ``IndexReader(spark, dir, snapshot=N)`` serves queries
  against the index exactly as of commit N — appends and compactions that
  happened later are invisible, so yesterday's ranking is reproducible
  bit-for-bit (the lineage story the north rule's resumability clause
  needs).
- **snapshot expiry**: ``expire_snapshots(dir, keep_last=K)`` drops old
  versions and reclaims every data file no newer snapshot or the live
  tree references (inode refcount hits zero) — Iceberg's
  ``expireSnapshots`` maintenance action.

Concurrency model: single writer per index dir (same as the staged build);
snapshot numbering is monotonic via the max existing version + 1.
"""

from __future__ import annotations

import json
import os
import shutil
import time

# Tables a snapshot pins. blocks_segments is deliberately absent: serving
# never reads it (it is the pre-merge scratch the next compaction rewrites).
_TABLES = (
    "docids",
    "attrs",  # legacy split layout only
    "tokenized",  # forward table; post=1 is doc_terms (PRF/LTR/compact input)
    "doc_lens",
    "doc_lens_wide",
    "term_stats",
    "field_stats",
    "blocks",
    "lineage",
    "deletes",  # merge-on-read tombstones (empty/absent between delete and compact)
    # spell-suggest delete-key sidecar: its _TS_SIGNATURE stamp is
    # path-relative, so the hard-linked copy verifies fresh under the
    # snapshot root (time travel keeps the fast suggest path)
    "spell_keys",
)


def _snap_root(index_dir: str) -> str:
    return os.path.join(index_dir, "snapshots")


def snapshot_dir(index_dir: str, version: int) -> str:
    """Data root of snapshot N — layout-identical to a live index dir."""
    return os.path.join(_snap_root(index_dir), "data", f"v{version:06d}")


def _link_tree(src: str, dst: str) -> int:
    """Recursively hard-link every file of src into dst (copy on link
    failure, e.g. cross-device). Returns files linked."""
    n = 0
    for root, _dirs, files in os.walk(src):
        rel = os.path.relpath(root, src)
        out = os.path.join(dst, rel) if rel != "." else dst
        os.makedirs(out, exist_ok=True)
        for f in files:
            s, d = os.path.join(root, f), os.path.join(out, f)
            try:
                os.link(s, d)
            except OSError:
                shutil.copy2(s, d)
            n += 1
    return n


def _tree_sig(root: str) -> set[tuple[str, str, int, int]]:
    """Identity of a snapshot's data: (table, relpath, inode, size) for
    every file. Hard links share inodes, so a live tree whose stages were
    all resume-skipped has exactly the last snapshot's signature."""
    sig = set()
    for t in _TABLES:
        src = os.path.join(root, t)
        if not os.path.isdir(src):
            continue
        for d, _dirs, files in os.walk(src):
            for f in files:
                st = os.stat(os.path.join(d, f))
                sig.add((t, os.path.relpath(os.path.join(d, f), src),
                         st.st_ino, st.st_size))
    return sig


def list_snapshots(index_dir: str) -> list[dict]:
    """All committed snapshots, oldest first."""
    root = _snap_root(index_dir)
    if not os.path.isdir(root):
        return []
    out = []
    for f in sorted(os.listdir(root)):
        if f.startswith("v") and f.endswith(".json"):
            with open(os.path.join(root, f)) as fh:
                out.append(json.load(fh))
    return out


def commit_snapshot(index_dir: str, operation: str) -> int:
    """Commit the index dir's current table state as the next snapshot.
    Idempotent on data: if the live tree's files are byte-for-byte the
    latest snapshot's files (same inodes — e.g. a fully-resumed build that
    re-ran no stage), no new snapshot is created and the existing version
    is returned."""
    man_path = os.path.join(index_dir, "MANIFEST.json")
    with open(man_path) as f:
        manifest_text = f.read()

    snaps = list_snapshots(index_dir)
    if snaps:
        last_data = snapshot_dir(index_dir, int(snaps[-1]["version"]))
        if os.path.isdir(last_data) and _tree_sig(index_dir) == _tree_sig(last_data):
            return int(snaps[-1]["version"])

    version = (int(snaps[-1]["version"]) + 1) if snaps else 1
    data = snapshot_dir(index_dir, version)
    if os.path.exists(data):  # crashed half-commit of this version
        shutil.rmtree(data)
    os.makedirs(data, exist_ok=True)
    n_files, tables = 0, []
    for t in _TABLES:
        src = os.path.join(index_dir, t)
        if os.path.isdir(src):
            n_files += _link_tree(src, os.path.join(data, t))
            tables.append(t)
    with open(os.path.join(data, "MANIFEST.json"), "w") as f:
        f.write(manifest_text)

    meta = {
        "version": version,
        "parent": int(snaps[-1]["version"]) if snaps else None,
        "operation": operation,
        "ts": time.time(),
        "n_docs": json.loads(manifest_text).get("n_docs"),
        "tables": tables,
        "n_files": n_files,
    }
    tmp = os.path.join(_snap_root(index_dir), f".v{version:06d}.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=2)
    os.rename(tmp, os.path.join(_snap_root(index_dir), f"v{version:06d}.json"))
    return version


def expire_snapshots(index_dir: str, keep_last: int = 2) -> list[int]:
    """Drop all but the newest ``keep_last`` snapshots; data files
    referenced only by expired snapshots are reclaimed (hard-link refcount
    reaches zero). The live tree is never touched. Returns expired
    versions."""
    snaps = list_snapshots(index_dir)
    expired = []
    for s in snaps[:-keep_last] if keep_last > 0 else snaps:
        v = int(s["version"])
        shutil.rmtree(snapshot_dir(index_dir, v), ignore_errors=True)
        os.remove(os.path.join(_snap_root(index_dir), f"v{v:06d}.json"))
        expired.append(v)
    return expired
