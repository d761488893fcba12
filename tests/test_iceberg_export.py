"""Iceberg metadata export gates (ICEBERG.md made executable).

The emitted table metadata must validate against a vendored JSON Schema
of the Apache Iceberg Table Spec v2 (tests/iceberg_table_metadata_schema
.json) AND be semantically faithful: snapshot lineage mirrors the index's
commit history, manifests reference real files whose record counts sum to
the table's row count, and the blocks table keeps its identity bucket
partition spec (the layout PLANS.md's pruning evidence relies on)."""

import json
import os

import pytest

from searchengines_spark.corpus import generate_pages
from searchengines_spark.index import build_index
from searchengines_spark.index.iceberg_export import export_index, export_table
from searchengines_spark.index.incremental import append_pages, compact

SCHEMA_PATH = os.path.join(os.path.dirname(__file__),
                           "iceberg_table_metadata_schema.json")


@pytest.fixture(scope="module")
def exported(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("iceberg")
    pages_all = generate_pages(spark, 300, seed=42, partitions=4)
    pages_all.write.parquet(str(root / "pages"))
    all_df = spark.read.parquet(str(root / "pages"))
    d = str(root / "idx")
    m1 = build_index(spark, all_df.filter("url < 'https://www5'"), d, n_salts=4)
    m2 = append_pages(spark, d, all_df.filter("url >= 'https://www5'"))
    m3 = compact(spark, d, n_salts=4)
    assert (m1["snapshot"], m2["snapshot"], m3["snapshot"]) == (1, 2, 3)
    out = str(root / "iceberg")
    return d, out, export_index(d, out), m3


def test_validates_against_spec_schema(exported):
    import jsonschema

    _d, _out, paths, _m = exported
    with open(SCHEMA_PATH) as f:
        schema = json.load(f)
    assert {"docids", "blocks", "term_stats", "doc_lens_wide"} <= set(paths)
    for table, p in paths.items():
        with open(p) as f:
            meta = json.load(f)
        jsonschema.validate(meta, schema)  # raises on violation


def test_snapshot_lineage_mirrors_commits(exported):
    _d, _out, paths, _m = exported
    with open(paths["docids"]) as f:
        meta = json.load(f)
    snaps = meta["snapshots"]
    assert [s["snapshot-id"] for s in snaps] == [1, 2, 3]
    assert "parent-snapshot-id" not in snaps[0]
    assert snaps[1]["parent-snapshot-id"] == 1
    assert snaps[2]["parent-snapshot-id"] == 2
    ops = [s["summary"]["operation"] for s in snaps]
    assert ops == ["append", "append", "replace"]
    assert meta["current-snapshot-id"] == 3
    assert meta["refs"]["main"]["snapshot-id"] == 3
    ts = [s["timestamp-ms"] for s in snaps]
    assert ts == sorted(ts)


def test_manifest_counts_match_table(exported, spark):
    d, _out, paths, m3 = exported
    with open(paths["docids"]) as f:
        meta = json.load(f)
    cur = meta["snapshots"][-1]
    with open(cur["manifest-list"]) as f:
        mlist = json.load(f)
    assert len(mlist) == 1 and mlist[0]["partition-spec-id"] == 0
    with open(mlist[0]["manifest-path"]) as f:
        manifest = json.load(f)
    total = sum(e["data-file"]["record-count"] for e in manifest["entries"])
    assert total == int(cur["summary"]["total-records"]) == m3["n_docs"]
    for e in manifest["entries"]:
        df = e["data-file"]
        assert os.path.exists(df["file-path"])
        assert df["file-size-in-bytes"] == os.path.getsize(df["file-path"])
        assert df["file-format"] == "PARQUET" and df["content"] == 0


def test_append_marks_added_vs_existing(exported):
    """v2 (the append) must carry v1's files as EXISTING (status 0) and the
    delta's as ADDED (status 1) — the reference-not-copy file semantics the
    hard-link tree shares with Iceberg manifests."""
    _d, out, _paths, _m = exported
    man2 = os.path.join(out, "docids", "metadata", "manifest-000002.json")
    with open(man2) as f:
        entries = json.load(f)["entries"]
    statuses = {e["status"] for e in entries}
    assert statuses == {0, 1}, statuses
    # v2-spec sequence-number inheritance: EXISTING entries keep the
    # sequence/snapshot of the snapshot that ADDED the file (v1 here);
    # ADDED entries carry this snapshot's (v2)
    for e in entries:
        expect = 1 if e["status"] == 0 else 2
        assert e["sequence-number"] == expect, e
        assert e["snapshot-id"] == expect, e
    mlist2 = os.path.join(out, "docids", "metadata",
                          "snap-000002-manifest-list.json")
    with open(mlist2) as f:
        assert json.load(f)[0]["min-sequence-number"] == 1


def test_blocks_identity_bucket_partition(exported):
    _d, _out, paths, _m = exported
    with open(paths["blocks"]) as f:
        meta = json.load(f)
    spec = meta["partition-specs"][0]["fields"]
    assert [f_["name"] for f_ in spec] == ["bucket"]
    assert spec[0]["transform"] == "identity"
    by_name = {f_["name"]: f_["id"]
               for f_ in meta["schemas"][0]["fields"]}
    assert spec[0]["source-id"] == by_name["bucket"]
    # partition values ride in every data-file record
    with open(os.path.join(_out, "blocks", "metadata",
                           "manifest-000003.json")) as f:
        entries = json.load(f)["entries"]
    assert all(isinstance(e["data-file"]["partition"]["bucket"], int)
               for e in entries)


def test_export_is_deterministic_for_uuid(exported):
    d, out, paths, _m = exported
    p2 = export_table(d, "docids", out)
    with open(paths["docids"]) as f:
        a = json.load(f)
    with open(p2) as f:
        b = json.load(f)
    assert a["table-uuid"] == b["table-uuid"]
