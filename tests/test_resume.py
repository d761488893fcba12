"""Resumable build: interrupting after any stage and re-running with
resume=True must produce a logically identical index (content, not bytes)."""

import json
import os
import shutil

import pytest

from searchengines_spark.corpus import generate_pages
from searchengines_spark.index import IndexReader, build_index


def index_fingerprint(spark, d):
    """Order-insensitive content hash of the queryable index tables."""
    import pyspark.sql.functions as F

    parts = []
    for tbl, cols in [
        ("blocks", ["field", "term", "salt", "blk", "n", "min_docid", "max_docid",
                    "docids_z", "tfs_z", "positions_z"]),
        ("term_stats", ["field", "term", "df", "ctf"]),
        ("field_stats", ["field", "doc_count", "sum_len"]),
        ("doc_lens", ["docid", "field", "len"]),
        ("docids", ["url", "docid"]),
    ]:
        df = spark.read.parquet(os.path.join(d, tbl)).select(*cols)
        h = df.select(F.md5(F.concat_ws("\x01", *[F.col(c).cast("string") for c in cols])).alias("h"))
        agg = h.agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("long")).alias("s"),
                    F.count(F.lit(1)).alias("n")).collect()[0]
        parts.append((tbl, int(agg["s"] or 0), int(agg["n"])))
    return parts


@pytest.mark.slow
def test_resume_preserves_encode_salt_min_df(spark, tmp_path):
    """cold_blocks' skip-gate ("df >= salt_min_df implies all blocks
    striped") is only sound against the threshold the blocks were ENCODED
    with. A resume that skips the segments stage but records the new
    call's (lower) threshold would make the reader skip the cold scan for
    every term with new_thr <= df < old_thr — whose blocks are all
    UNSTRIPED — silently dropping those postings from every query."""
    import pandas as pd

    from searchengines_spark.corpus import PAGES_SCHEMA
    from searchengines_spark.index import IndexReader

    bodies = [f"hotone filler{i}" for i in range(12)]
    rows = [(f"https://rs.org/p{i:03d}", pd.Timestamp("2020-01-01"),
             (f"<html><head><title>t{i}</title></head>"
              f"<body>{b}</body></html>").encode(), b, "en")
            for i, b in enumerate(bodies)]
    pages = spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"]),
        schema=PAGES_SCHEMA)

    d = str(tmp_path / "idx")
    # encode threshold 100: "hotone" (df=12) gets only UNSTRIPED blocks
    build_index(spark, pages, d, n_salts=4, salt_min_df=100)
    pairs = [("body", "hotone")]
    baseline = IndexReader(spark, d).cold_blocks(pairs)
    assert pairs[0] in baseline  # sanity: served from the cold path

    # resume with the threshold LOWERED to 4: every stage is already done,
    # so no block is re-encoded — the manifest must keep 100
    build_index(spark, pages, d, n_salts=4, salt_min_df=4, resume=True)
    with open(os.path.join(d, "MANIFEST.json")) as f:
        m = json.load(f)
    assert m["salt_min_df"] == 100

    r2 = IndexReader(spark, d)
    assert r2.cold_blocks(pairs) == baseline  # postings still reachable

    # legacy manifest without the key -> the gate must go conservative
    m.pop("salt_min_df")
    with open(os.path.join(d, "MANIFEST.json"), "w") as f:
        json.dump(m, f)
    r3 = IndexReader(spark, d)
    assert not r3.salt_min_df_known
    assert r3.cold_blocks(pairs) == baseline


@pytest.mark.slow
def test_resume_identical(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    generate_pages(spark, 200, seed=7, partitions=4).write.parquet(pages_dir)
    pages = spark.read.parquet(pages_dir)

    d_full = str(tmp_path / "full")
    build_index(spark, pages, d_full, n_salts=4)
    fp_full = index_fingerprint(spark, d_full)

    # simulate a crash after the doc_terms stage: copy the completed stages,
    # drop everything later, resume
    d_part = str(tmp_path / "partial")
    os.makedirs(os.path.join(d_part, "_stages"))
    for stage, artifacts in [("docids", ["docids"]),
                             ("doc_terms", ["tokenized", "doc_lens"])]:
        for a in artifacts:
            shutil.copytree(os.path.join(d_full, a), os.path.join(d_part, a))
        shutil.copy(os.path.join(d_full, "_stages", stage + ".json"),
                    os.path.join(d_part, "_stages", stage + ".json"))

    build_index(spark, pages, d_part, n_salts=4, resume=True)
    fp_part = index_fingerprint(spark, d_part)
    assert fp_part == fp_full

    # resumed index must answer queries identically
    r1, r2 = IndexReader(spark, d_full), IndexReader(spark, d_part)
    assert r1.n_docs == r2.n_docs and r1.field_stats == r2.field_stats
    with open(os.path.join(d_part, "MANIFEST.json")) as f:
        m = json.load(f)
    assert m["postings"] > 0 and m["docs_per_sec"] > 0
