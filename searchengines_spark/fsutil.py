"""Filesystem-signature helper shared by the content-pinned caches."""

from __future__ import annotations

import os


def parquet_tree_sig(root: str, rel_to: str | None = None) -> list[tuple]:
    """Sorted [(path, size, mtime_ns)] over every .parquet file under
    ``root`` — the content signature the sidecar/cache layers pin their
    inputs by (norms LRU key, spell-key sidecar freshness stamp, PQ
    codebook memo key). One definition so the pinning semantics cannot
    drift between them.

    rel_to: record paths relative to this base instead of absolute — a
    hard-linked snapshot tree (index/snapshots.py) shares inodes, sizes
    and mtimes with the live tree, so a relative signature verifies equal
    under the snapshot root too. A plain-file root signs as ('.', ...).
    """
    out: list[tuple] = []
    if os.path.isdir(root):
        for r, _dirs, files in os.walk(root):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(r, f)
                    st = os.stat(p)
                    out.append((os.path.relpath(p, rel_to) if rel_to else p,
                                st.st_size, st.st_mtime_ns))
    elif os.path.exists(root):
        st = os.stat(root)
        out.append((".", st.st_size, st.st_mtime_ns))
    return sorted(out)
