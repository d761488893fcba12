"""Export the index's snapshot history as Apache Iceberg table metadata.

ICEBERG.md maps this engine's snapshot layer (snapshots.py) onto Iceberg
concepts and claims the move is "a translation layer, not a rewrite".
This module makes that claim executable: it WRITES spec-conformant
Iceberg table metadata (format-version 2, per the public Apache Iceberg
Table Spec, https://iceberg.apache.org/spec/) for every index table, from
the already-committed snapshot history — no Iceberg runtime jar needed to
produce metadata; a real catalog could adopt these files with
`add_files`-style registration.

One Iceberg table per index table (ICEBERG.md "one Iceberg table each"):

    out_dir/<table>/metadata/v{N}.metadata.json      table metadata
    out_dir/<table>/metadata/snap-{id}-manifest-list.json
    out_dir/<table>/metadata/manifest-{id}.json

Encoding note, stated rather than hidden: the spec requires manifests and
manifest lists to be **Avro** files; this container has no Avro writer,
so those two are emitted as JSON documents whose RECORDS carry exactly
the spec's fields (manifest-entry: status / snapshot-id / sequence-number
/ data-file{content, file-path, file-format, partition, record-count,
file-size-in-bytes}; manifest-list entry: manifest-path / length /
partition-spec-id / content / sequence numbers / counts). The table
metadata file itself IS spec-format JSON and is validated against a
vendored JSON Schema of the v2 spec in tests/test_iceberg_export.py.

Snapshot mapping (snapshots.py:113-157 -> spec):
  version N          -> snapshot-id N, sequence-number N
  parent             -> parent-snapshot-id
  operation          -> summary.operation (build->append, append->append,
                        delete->delete, compact/compact_buckets->replace)
  ts                 -> timestamp-ms
  hard-linked tree   -> data files referenced by the manifest (identical
                        inode == identical file-path reference semantics)
"""

from __future__ import annotations

import json
import os
import uuid

_OP_MAP = {
    "build": "append",
    "append": "append",
    "delete": "delete",
    "upsert": "overwrite",
    "compact": "replace",
    "compact_buckets": "replace",
}

_ARROW_PRIMS = {
    "bool": "boolean",
    "int8": "int", "int16": "int", "int32": "int", "uint8": "int",
    "uint16": "int", "uint32": "int",
    "int64": "long", "uint64": "long",
    "float": "float", "halffloat": "float",
    "double": "double",
    "string": "string", "large_string": "string",
    "binary": "binary", "large_binary": "binary",
    "date32[day]": "date",
}


class _Ids:
    def __init__(self):
        self.last = 0

    def next(self) -> int:
        self.last += 1
        return self.last


def _iceberg_type(t, ids: _Ids):
    """Arrow type -> Iceberg type JSON (nested types get element ids)."""
    import pyarrow as pa

    if pa.types.is_timestamp(t):
        return "timestamptz" if t.tz else "timestamp"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision}, {t.scale})"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        eid = ids.next()
        return {"type": "list", "element-id": eid,
                "element": _iceberg_type(t.value_type, ids),
                "element-required": False}
    if pa.types.is_struct(t):
        fields = []
        for i in range(t.num_fields):
            f = t.field(i)
            fid = ids.next()
            fields.append({"id": fid, "name": f.name, "required": False,
                           "type": _iceberg_type(f.type, ids)})
        return {"type": "struct", "fields": fields}
    name = str(t)
    if name in _ARROW_PRIMS:
        return _ARROW_PRIMS[name]
    raise ValueError(f"no Iceberg mapping for arrow type {name}")


def _partition_levels(table_dir: str) -> list[tuple[str, str]]:
    """Hive-style partition directories (col=value) under the table root,
    in nesting order with a sample value per level — e.g.
    blocks/bucket=7/part-*.parquet -> [("bucket", "7")]. The sample value
    is what the schema probe types from, so it must come from the SAME
    level it names (a top-level-only probe would crash on 2-level
    layouts)."""
    levels = []
    d = table_dir
    while os.path.isdir(d):
        sub = [s for s in os.listdir(d) if "=" in s
               and os.path.isdir(os.path.join(d, s))]
        if not sub:
            break
        col, val = sub[0].split("=", 1)
        levels.append((col, val))
        d = os.path.join(d, sub[0])
    return levels


def _partition_cols(table_dir: str) -> list[str]:
    return [c for c, _v in _partition_levels(table_dir)]


def _first_parquet(table_dir: str) -> str | None:
    for root, _dirs, files in os.walk(table_dir):
        for f in sorted(files):
            if f.endswith(".parquet"):
                return os.path.join(root, f)
    return None


def _schema_of(table_dir: str) -> tuple[dict, dict[str, int], int]:
    """Iceberg schema struct for a table: file schema + hive partition
    columns (partition values live in paths, not file columns — the spec
    schema includes them). Returns (schema, name->field-id, last id)."""
    import pyarrow.parquet as pq

    sample = _first_parquet(table_dir)
    if sample is None:
        raise FileNotFoundError(f"no parquet under {table_dir}")
    arrow = pq.read_schema(sample)
    ids = _Ids()
    fields, by_name = [], {}
    for name in arrow.names:
        fid = ids.next()
        by_name[name] = fid
        fields.append({"id": fid, "name": name, "required": False,
                       "type": _iceberg_type(arrow.field(name).type, ids)})
    for col, v in _partition_levels(table_dir):
        if col in by_name:
            continue
        fid = ids.next()
        by_name[col] = fid
        # hive partition values here are always int-like (bucket=N); a
        # non-numeric layout would export as string
        fields.append({"id": fid, "name": col, "required": False,
                       "type": "int" if v.lstrip("-").isdigit() else "string"})
    schema = {"type": "struct", "schema-id": 0, "fields": fields}
    return schema, by_name, ids.last


def _data_files(table_dir: str, part_cols: list[str]) -> list[tuple[int, dict]]:
    """(inode, spec data_file record) for every parquet file of one table
    tree. The inode is the file's cross-snapshot identity: snapshots
    hard-link unchanged files, so two snapshot trees referencing the same
    inode reference the same data file (the analog of two Iceberg
    manifests naming the same file-path)."""
    import pyarrow.parquet as pq

    out = []
    for root, _dirs, files in os.walk(table_dir):
        rel_parts = os.path.relpath(root, table_dir).split(os.sep)
        partition = {}
        for p in rel_parts:
            if "=" in p:
                c, v = p.split("=", 1)
                partition[c] = int(v) if v.lstrip("-").isdigit() else v
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            path = os.path.join(root, f)
            meta = pq.ParquetFile(path).metadata
            out.append((os.stat(path).st_ino, {
                "content": 0,  # DATA
                "file-path": os.path.abspath(path),
                "file-format": "PARQUET",
                "partition": {c: partition.get(c) for c in part_cols},
                "record-count": meta.num_rows,
                "file-size-in-bytes": os.path.getsize(path),
            }))
    return out


def export_table(index_dir: str, table: str, out_dir: str) -> str:
    """Write one Iceberg table's metadata tree for ``table``; returns the
    table-metadata path. Every committed snapshot that contains the table
    becomes an Iceberg snapshot with a manifest (list) of its hard-linked
    data files."""
    from .snapshots import list_snapshots, snapshot_dir

    snaps = [s for s in list_snapshots(index_dir) if table in s["tables"]]
    if not snaps:
        raise FileNotFoundError(f"no committed snapshot carries {table!r}")
    meta_dir = os.path.join(out_dir, table, "metadata")
    os.makedirs(meta_dir, exist_ok=True)

    live = os.path.join(index_dir, table)
    part_cols = _partition_cols(live)
    schema, by_name, last_col = _schema_of(live)
    spec_fields = [{"name": c, "transform": "identity",
                    "source-id": by_name[c], "field-id": 1000 + i}
                   for i, c in enumerate(part_cols)]

    snapshots_json, snap_log = [], []
    # sequence-number inheritance (spec: an EXISTING entry keeps the
    # sequence number and snapshot id of the snapshot that ADDED the
    # file): first-seen snapshot per inode, carried forward
    added_in: dict[int, int] = {}
    for s in snaps:
        v = int(s["version"])
        sd = os.path.join(snapshot_dir(index_dir, v), table)
        files = _data_files(sd, part_cols)
        entries = []
        for ino, rec in files:
            first = added_in.get(ino)
            entries.append({
                "status": 1 if first is None else 0,
                "snapshot-id": v if first is None else first,
                "sequence-number": v if first is None else first,
                "data-file": rec,
            })
            if first is None:
                added_in[ino] = v
        # inodes absent from this snapshot were deleted/rewritten; drop
        # them so a re-added file (compaction rewrite) counts as ADDED
        cur = {ino for ino, _rec in files}
        added_in = {ino: sv for ino, sv in added_in.items() if ino in cur}
        man_path = os.path.join(meta_dir, f"manifest-{v:06d}.json")
        with open(man_path, "w") as fh:
            json.dump({"schema": schema, "partition-spec": spec_fields,
                       "entries": entries}, fh, indent=1)
        mlist_path = os.path.join(meta_dir,
                                  f"snap-{v:06d}-manifest-list.json")
        added = [e for e in entries if e["status"] == 1]
        with open(mlist_path, "w") as fh:
            json.dump([{
                "manifest-path": os.path.abspath(man_path),
                "manifest-length": os.path.getsize(man_path),
                "partition-spec-id": 0,
                "content": 0,
                "sequence-number": v,
                "min-sequence-number": min(
                    (e["sequence-number"] for e in entries), default=v),
                "added-snapshot-id": v,
                "added-files-count": len(added),
                "existing-files-count": len(entries) - len(added),
                "deleted-files-count": 0,
                "added-rows-count": sum(e["data-file"]["record-count"]
                                        for e in added),
            }], fh, indent=1)
        snapshots_json.append({
            "snapshot-id": v,
            **({"parent-snapshot-id": int(s["parent"])}
               if s.get("parent") is not None else {}),
            "sequence-number": v,
            "timestamp-ms": int(s["ts"] * 1000),
            "manifest-list": os.path.abspath(mlist_path),
            "summary": {
                "operation": _OP_MAP.get(s["operation"], "append"),
                "total-data-files": str(len(entries)),
                "total-records": str(sum(e["data-file"]["record-count"]
                                         for e in entries)),
            },
            "schema-id": 0,
        })
        snap_log.append({"timestamp-ms": int(s["ts"] * 1000),
                         "snapshot-id": v})

    current = snapshots_json[-1]["snapshot-id"]
    table_meta = {
        "format-version": 2,
        # deterministic: re-export of the same table is the same table
        "table-uuid": str(uuid.uuid5(uuid.NAMESPACE_URL,
                                     f"searchengines_spark://{table}")),
        "location": os.path.abspath(os.path.join(out_dir, table)),
        "last-sequence-number": current,
        "last-updated-ms": snapshots_json[-1]["timestamp-ms"],
        "last-column-id": last_col,
        "schemas": [schema],
        "current-schema-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": spec_fields}],
        "default-spec-id": 0,
        "last-partition-id": (999 + len(spec_fields)) if spec_fields else 999,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "default-sort-order-id": 0,
        "properties": {"write.format.default": "parquet"},
        "current-snapshot-id": current,
        "snapshots": snapshots_json,
        "snapshot-log": snap_log,
        "metadata-log": [],
        "refs": {"main": {"snapshot-id": current, "type": "branch"}},
    }
    out_path = os.path.join(meta_dir, f"v{len(snaps)}.metadata.json")
    with open(out_path, "w") as fh:
        json.dump(table_meta, fh, indent=1)
    return out_path


def export_index(index_dir: str, out_dir: str) -> dict[str, str]:
    """Export every snapshot-pinned table present in the history. Returns
    table -> metadata path."""
    from .snapshots import _TABLES, list_snapshots

    present: set[str] = set()
    for s in list_snapshots(index_dir):
        present.update(s["tables"])
    return {t: export_table(index_dir, t, out_dir)
            for t in _TABLES if t in present}
