"""Point lookup of docid -> url without a Spark job.

The reference resolves internal docids to external ids through a random-
access forward index (Idx.getExternalDocid, Idx.java:87-144). Our analog:
the ``docids`` table is written docid-SORTED on disk (corpus.assign_docids
range-partitions by url and docids are url ranks, so file order == docid
order; incremental appends write docid-sorted delta files past the old
max), which makes parquet row-group min/max stats on ``docid`` an index.
A top-k result needs at most k lookups, so the serve path resolves urls
with one pyarrow ``docid IN (...)`` filtered read INSIDE the stripe task —
row groups whose [min, max] misses every probe are never decompressed —
instead of joining k rows against the O(corpus) url table in a second
Spark stage.

Scale story: at 10^12 docs each stripe task probes <= k ids falling in its
own docid range; with row-group pruning the read touches O(k) row groups
of the stripe's slice of the url table regardless of corpus size. No
driver participation, no shuffle, no broadcast.
"""

from __future__ import annotations

import numpy as np


def urls_at(docids_dir: str, docids) -> dict[int, str]:
    """Resolve a small set of docids to urls via a row-group-pruned read
    of the index's ``docids`` parquet table. Raises KeyError if any probe
    is absent — every docid emitted by the kernels exists in the table, so
    a miss means index corruption and must be loud."""
    ids = sorted({int(d) for d in np.asarray(list(docids), dtype=np.int64)})
    if not ids:
        return {}
    import pyarrow.parquet as pq

    tbl = pq.read_table(docids_dir, columns=["docid", "url"],
                        filters=[("docid", "in", ids)])
    got = dict(zip(tbl.column("docid").to_pylist(),
                   tbl.column("url").to_pylist()))
    missing = [d for d in ids if d not in got]
    if missing:
        raise KeyError(f"docids absent from {docids_dir}: {missing[:5]}"
                       f"{'...' if len(missing) > 5 else ''}")
    return got
