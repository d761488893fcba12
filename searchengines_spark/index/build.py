"""Inverted-index build: pages -> term-partitioned, docid-sorted,
delta+varint-compressed posting blocks with per-block max-score metadata.

This is the capability the reference *lacks* (it reads a prebuilt Lucene
index, /root/reference/QryEval/Idx.java:236-259); the north rule mandates we
own it, at 10^12-doc scale, with explicit partitioning of both the document
space (docid ranges) and the term space (md5 term buckets), salted
repartition for hot-term skew, resumable stages, and per-partition lineage.

Layout under ``index_dir/`` (parquet; on a real cluster these would be
Iceberg tables — same layout, plus snapshot metadata):

- ``docids/``      (url, docid)                     — dense docid = rank(url)
- ``doc_lens/``    (docid, field, len)              — len incl. stopword slots
- ``tokenized/post={0,1}/`` (docid, field, term, tf, positions_z, doclen) —
                    post=1 IS the doc_terms forward/analytic table; post=0
                    holds one doclen sentinel row per (doc, field)
- ``blocks/bucket=NN/`` (field, term, salt, blk, n, max_docid, min_docid,
                    max_score, docids_z, tfs_z, positions_z); doclens are
                    NOT duplicated into blocks — they live once per doc in
                    the docid-sorted ``doc_lens_wide`` norms sidecar
- ``term_stats/``  (field, term, df, ctf, bucket)
- ``field_stats/`` (field, doc_count, sum_len)      + row field='__docs__'
                    carrying the global doc count N (Idx.getNumDocs analog)
- ``lineage/``     per term-bucket build metrics (rows, postings, bytes)
- ``MANIFEST.json`` stage ledger -> resumability

Scale notes (how this holds at 1000 executors / 100 TB):
- one shuffle tokenize->explode->aggregate per (docid,field,term) with
  map-side partial aggregation;
- the block encode groups by (field, term, salt) where salt is a *docid
  range* stripe: the hottest term (df ~= N) is split across
  ``n_salts`` groups, so no single task ever holds more than
  ``salt_range`` postings. Concatenating stripes in salt order preserves
  global docid order — merge is concatenation, never re-sort;
- output partitioned by md5 term bucket -> query-time scans prune to the
  buckets of the query's terms.
"""

from __future__ import annotations

import json
import math
import os
import time
from collections import OrderedDict

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..corpus import assign_docids, pages_to_tokenized
from ..tokenizer import get_stemmer
from . import codec

N_BUCKETS = 64

BLOCKS_SCHEMA = T.StructType([
    T.StructField("field", T.StringType(), False),
    T.StructField("term", T.StringType(), False),
    T.StructField("salt", T.IntegerType(), False),
    T.StructField("blk", T.IntegerType(), False),
    T.StructField("n", T.IntegerType(), False),
    T.StructField("min_docid", T.LongType(), False),
    T.StructField("max_docid", T.LongType(), False),
    T.StructField("max_score", T.DoubleType(), False),
    T.StructField("max_tf", T.IntegerType(), False),
    T.StructField("min_doclen", T.IntegerType(), False),
    T.StructField("striped", T.BooleanType(), False),
    T.StructField("docids_z", T.BinaryType(), False),
    T.StructField("tfs_z", T.BinaryType(), False),
    T.StructField("positions_z", T.BinaryType(), False),
])


def term_bucket_col(term_col):
    """Portable md5-based term bucket (same value computable in Python and
    DuckDB): int(md5(term)[:8], 16) % N_BUCKETS. JVM-side expression."""
    return (F.conv(F.substring(F.md5(term_col), 1, 8), 16, 10).cast("long") % N_BUCKETS).cast("int")


def term_bucket_py(term: str) -> int:
    import hashlib

    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:8], 16) % N_BUCKETS


def write_term_stats(term_stats: DataFrame, path: str) -> None:
    """Lookup-optimized layout for the vocab table: hash-repartition on the
    term bucket (every bucket's rows land in ONE task regardless of session
    parallelism, so the layout is deterministic), sort by (field, term)
    within it, write partitionBy(bucket). A per-query term lookup then
    prunes to one bucket DIRECTORY (partition filter) and, inside that
    bucket's single file, to the row groups whose [min, max] term range
    covers the probe (parquet stats) — instead of scanning the whole
    vocabulary, which grows with corpus size (a flat unsorted write
    measured 0.58 s per first-lookup at 1M pages vs 0.14 s at 200k; at
    10^12 docs an unpruned vocab scan per cold query would be the serve
    bottleneck). The table stays vocab-sized; this costs one extra
    vocab-sized shuffle at build/merge/compact time."""
    (term_stats.repartition("bucket")
     .sortWithinPartitions("field", "term")
     .write.mode("overwrite").partitionBy("bucket").parquet(path))


def doc_terms_dir(index_dir: str) -> str:
    """Postings long table location: the tokenized table's post=1 partition
    (single-write layout); falls back to a standalone doc_terms/ dir for
    indexes built before that layout."""
    p = os.path.join(index_dir, "tokenized", "post=1")
    return p if os.path.exists(p) else os.path.join(index_dir, "doc_terms")


def _write_doc_lens_wide(spark: SparkSession, index_dir: str) -> None:
    from ..corpus import FIELDS

    narrow = spark.read.parquet(os.path.join(index_dir, "doc_lens"))
    wide = narrow.groupBy("docid").pivot("field", FIELDS).agg(F.first("len"))
    for f in FIELDS:
        wide = wide.withColumnRenamed(f, f"len_{f}")
    # docid-range sorted files: this table doubles as the norms sidecar
    # (index/norms.py) — the serve kernels range-read a docid stripe, and
    # parquet row-group min/max stats prune that read only if files are
    # docid-clustered
    (wide.repartitionByRange(
        max(spark.sparkContext.defaultParallelism, 8), "docid")
     .sortWithinPartitions("docid")
     .write.mode("overwrite").parquet(os.path.join(index_dir, "doc_lens_wide")))


def _stage_done(index_dir: str, stage: str) -> bool:
    return os.path.exists(os.path.join(index_dir, "_stages", stage + ".json"))


def _mark_stage(index_dir: str, stage: str, **meta) -> None:
    d = os.path.join(index_dir, "_stages")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, stage + ".json"), "w") as f:
        json.dump({"stage": stage, "ts": time.time(), **meta}, f)


def _pinned_meta(index_dir: str, stage: str, manifest: dict,
                 man_path: str) -> dict:
    """Parameters a completed `stage` actually ran with, for resume.

    Two sources can know them: the stage marker (stamped at the moment the
    stage finished — survives a build that crashed before the final
    MANIFEST write) and the manifest (kept current by append/upsert/compact,
    which never rewrite markers). Whichever was written LATER wins; the
    other only fills missing keys."""
    try:
        with open(os.path.join(index_dir, "_stages", stage + ".json")) as f:
            marker = json.load(f)
    except (OSError, json.JSONDecodeError):
        marker = {}
    man_mtime = os.path.getmtime(man_path) if os.path.exists(man_path) else -1.0
    if marker.get("ts", -1.0) > man_mtime:
        return {**manifest, **marker}
    return {**marker, **manifest}


SALT_MIN_DF = 8 * codec.BLOCK_SIZE  # only terms with df >= this get striped
# cold-block memo bound: entries are <= SALT_MIN_DF compressed postings
# (few KB each), so 16k entries caps the memo at ~100 MB driver-side
COLD_MEMO_CAP = 16384


def encode_blocks(spark, doc_terms: DataFrame, term_stats: DataFrame,
                  avg_len: dict[str, float], n_docs: int, salt_range: int,
                  k1: float = 1.2, b: float = 0.75,
                  salt_min_df: int = SALT_MIN_DF,
                  payload_codec: str = "varint",
                  store_positions: bool = True) -> DataFrame:
    """Salted block-encode kernel, shared by the batch build and incremental
    append.

    Shape: repartition by (field, term, salt) hash + sortWithinPartitions
    (field, term, salt, docid) — the classic
    repartitionAndSortWithinPartitions — then ONE streaming mapInArrow pass
    that cuts consecutive (field, term, salt) runs and numpy-encodes blocks.
    No per-group Arrow round-trip (per-group applyInPandas was the original
    bottleneck), and no pandas materialization either: converting the
    positions list column to per-row Python/numpy objects anti-scaled at
    high parallelism. The kernel reads the ListArray's (values, offsets)
    buffers and the dictionary-encoded key columns as flat numpy — zero
    per-row objects.

    Salting is skew-targeted: only terms with df >= SALT_MIN_DF are striped
    by docid range (salt = docid // salt_range); cold terms stay whole (salt
    0), so group count stays O(vocab), not O(vocab x stripes). Group size is
    bounded by max(SALT_MIN_DF, salt_range) rows either way. Stripe
    concatenation preserves global docid order — merge is concatenation."""
    import pyarrow as pa

    b_avg = spark.sparkContext.broadcast(avg_len)
    b_n_docs = int(n_docs)

    with_df = doc_terms.join(
        F.broadcast(term_stats.select("field", "term", "df")), ["field", "term"]
    ).withColumn(
        "salt",
        F.when(F.col("df") >= salt_min_df,
               (F.col("docid") / F.lit(salt_range)).cast("int")).otherwise(F.lit(0)),
    )
    # hash-partition on the group key (one shuffle of the raw postings; no
    # range-sampling pass, which would re-execute the upstream scan+join),
    # sort within partitions — the classic repartitionAndSortWithinPartitions.
    # Final file layout (bucket-contiguous, few files) is the merge stage's
    # job, which range-partitions the ~100x smaller COMPRESSED blocks.
    part = (
        with_df.repartition(max(spark.sparkContext.defaultParallelism * 4, 16),
                            "field", "term", "salt")
        .sortWithinPartitions("field", "term", "salt", "docid")
    )

    out_types = [
        ("field", pa.string()), ("term", pa.string()), ("salt", pa.int32()),
        ("blk", pa.int32()), ("n", pa.int32()), ("min_docid", pa.int64()),
        ("max_docid", pa.int64()), ("max_score", pa.float64()),
        ("max_tf", pa.int32()), ("min_doclen", pa.int32()),
        ("striped", pa.bool_()),
        ("docids_z", pa.binary()), ("tfs_z", pa.binary()),
        ("positions_z", pa.binary()),
    ]

    def encode_chunk(fields, terms, salts, dfs, run_starts,
                     docids, tfs, doclens, zdata, zoffs):
        # One vectorized pass over a CHUNK of complete runs (runs are
        # contiguous row ranges): fields/terms/salts/dfs are per-RUN arrays,
        # run_starts the chunk-relative row index where each run begins;
        # docids/tfs/doclens per-row; zdata a byte buffer of pre-encoded
        # position payloads with zoffs[i] the start byte of row i (len
        # rows+1). The tokenize pass already paid the position varint
        # encode, so block payloads are pure byte slices. No per-run or
        # per-posting Python — per-run loops anti-scaled on web corpora
        # where the vocabulary is huge and the median run is a handful of
        # postings. Returns None for an empty chunk, else one RecordBatch.
        n = len(docids)
        if n == 0:
            return None
        n_runs = len(run_starts)
        run_starts = np.asarray(run_starts, dtype=np.int64)
        run_ends = np.append(run_starts[1:], n)
        run_lens = run_ends - run_starts
        run_id = np.repeat(np.arange(n_runs, dtype=np.int64), run_lens)
        row_off = np.arange(n, dtype=np.int64) - run_starts[run_id]
        bstarts = np.flatnonzero(row_off % codec.BLOCK_SIZE == 0)
        brun = run_id[bstarts]
        bends = np.minimum(bstarts + codec.BLOCK_SIZE, run_ends[brun])
        docids_u = docids.astype(np.uint64)
        dd = docids_u.copy()
        if n > 1:
            dd[1:] -= docids_u[:-1]
        dd[bstarts] = docids_u[bstarts]  # delta restarts at block start
        enc_sliced = (codec.encode_varint_sliced if payload_codec == "varint"
                      else codec.encode_pfor_sliced)
        d_sl = enc_sliced(dd, bstarts)
        t_sl = enc_sliced(tfs.astype(np.uint64), bstarts)
        if store_positions:
            bcuts = zoffs[np.append(bstarts, n)]
            p_sl = [zdata[s:e].tobytes() for s, e in zip(bcuts[:-1], bcuts[1:])]
        else:
            # DOCS_AND_FREQS-style index (Lucene IndexOptions analog): the
            # serving blocks omit position payloads entirely — positions are
            # ~half of all block bytes; positional operators raise at plan
            # time. The forward table keeps positions, so a later compact()
            # with store_positions=True can restore them without re-crawling.
            p_sl = [b""] * len(bstarts)
        # block metadata, all reduceat: BM25 upper bound (same float shape as
        # codec.bm25_upper_bound: max of tf-weights, then x idf), max tf, min dl
        dfs_f = dfs.astype(np.float64)
        idf_r = np.maximum(0.0, np.log((b_n_docs - dfs_f + 0.5) / (dfs_f + 0.5)))
        avg_map = b_avg.value
        avg_r = np.array([avg_map.get(f, 1.0) for f in fields.tolist()],
                         dtype=np.float64)
        tfd = tfs.astype(np.float64)
        dld = doclens.astype(np.float64)
        tfw = tfd / (tfd + k1 * ((1.0 - b) + b * (dld / avg_r[run_id])))
        bmax = np.maximum.reduceat(tfw, bstarts) * idf_r[brun]
        max_tf = np.maximum.reduceat(tfs, bstarts)
        min_dl = np.minimum.reduceat(doclens, bstarts)
        arrays = [
            pa.array(fields[brun], type=pa.string()),
            pa.array(terms[brun], type=pa.string()),
            pa.array(salts[brun].astype(np.int32), type=pa.int32()),
            pa.array((row_off[bstarts] // codec.BLOCK_SIZE).astype(np.int32),
                     type=pa.int32()),
            pa.array((bends - bstarts).astype(np.int32), type=pa.int32()),
            pa.array(docids[bstarts].astype(np.int64), type=pa.int64()),
            pa.array(docids[bends - 1].astype(np.int64), type=pa.int64()),
            pa.array(bmax, type=pa.float64()),
            pa.array(max_tf.astype(np.int32), type=pa.int32()),
            pa.array(min_dl.astype(np.int32), type=pa.int32()),
            pa.array(dfs[brun] >= salt_min_df, type=pa.bool_()),
            pa.array(d_sl, type=pa.binary()),
            pa.array(t_sl, type=pa.binary()),
            pa.array(p_sl, type=pa.binary()),
        ]
        return pa.RecordBatch.from_arrays(arrays, names=[nm for nm, _ in out_types])

    def encode_run_chunk(run):
        # a single carried run, encoded through the same vectorized path
        field, term, salt, df_val, docids, tfs, doclens, pbytes, pboffs = run
        return encode_chunk(
            np.array([field], dtype=object), np.array([term], dtype=object),
            np.array([salt], dtype=np.int64), np.array([df_val], dtype=np.int64),
            np.zeros(1, dtype=np.int64), docids, tfs, doclens, pbytes, pboffs)

    def encode_stream(batches):
        carry = None
        for rb in batches:
            if rb.num_rows == 0:
                continue
            ix = {n: i for i, n in enumerate(rb.schema.names)}
            fdict = rb.column(ix["field"]).dictionary_encode()
            tdict = rb.column(ix["term"]).dictionary_encode()
            f_idx = np.asarray(fdict.indices)
            f_vocab = fdict.dictionary.to_pylist()
            t_idx = np.asarray(tdict.indices)
            t_vocab = tdict.dictionary.to_pylist()
            salt = rb.column(ix["salt"]).to_numpy()
            docid = rb.column(ix["docid"]).to_numpy()
            tf = rb.column(ix["tf"]).to_numpy()
            doclen = rb.column(ix["doclen"]).to_numpy()
            dfc = rb.column(ix["df"]).to_numpy()
            pz = rb.column(ix["positions_z"])
            # raw (offsets, data) buffers of the binary column; honor any
            # slice offset the Arrow array carries
            zoffs = np.frombuffer(pz.buffers()[1], dtype=np.int32)[
                pz.offset : pz.offset + len(pz) + 1].astype(np.int64)
            zdata = np.frombuffer(pz.buffers()[2], dtype=np.uint8)

            n = rb.num_rows
            change = np.empty(n, dtype=bool)
            change[0] = True
            change[1:] = ((f_idx[1:] != f_idx[:-1]) | (t_idx[1:] != t_idx[:-1])
                          | (salt[1:] != salt[:-1]))
            starts = np.flatnonzero(change)
            ends = np.append(starts[1:], n)

            def make_run(s, e):
                return (f_vocab[f_idx[s]], t_vocab[t_idx[s]], int(salt[s]),
                        int(dfc[s]), docid[s:e], tf[s:e], doclen[s:e],
                        zdata[zoffs[s]:zoffs[e]], zoffs[s:e + 1] - zoffs[s])

            first = make_run(starts[0], ends[0])
            if carry is not None:
                if carry[:3] == first[:3]:
                    merged_offs = np.concatenate(
                        [carry[8], first[8][1:] + carry[8][-1]])
                    first = carry[:4] + (
                        np.concatenate([carry[4], first[4]]),
                        np.concatenate([carry[5], first[5]]),
                        np.concatenate([carry[6], first[6]]),
                        np.concatenate([carry[7], first[7]]),
                        merged_offs,
                    )
                else:
                    rb_out = encode_run_chunk(carry)
                    if rb_out is not None:
                        yield rb_out
                carry = None
            if len(starts) == 1:
                # the whole batch is one (possibly incomplete) run
                carry = first
                continue
            # the (merged) first run is not contiguous with the batch
            # arrays — encode it as its own 1-run chunk; the middle runs
            # [ends[0], starts[-1]) encode as one vectorized chunk; the
            # final run is held back for the next batch
            rb_out = encode_run_chunk(first)
            if rb_out is not None:
                yield rb_out
            mid_s, mid_e = int(ends[0]), int(starts[-1])
            if mid_e > mid_s:
                rs = starts[1:-1]
                fvoc = np.array(f_vocab, dtype=object)
                tvoc = np.array(t_vocab, dtype=object)
                rb_out = encode_chunk(
                    fvoc[f_idx[rs]], tvoc[t_idx[rs]],
                    salt[rs].astype(np.int64), dfc[rs].astype(np.int64),
                    rs - mid_s,
                    docid[mid_s:mid_e], tf[mid_s:mid_e], doclen[mid_s:mid_e],
                    zdata, zoffs[mid_s:mid_e + 1])
                if rb_out is not None:
                    yield rb_out
            carry = make_run(starts[-1], ends[-1])
        if carry is not None:
            rb_out = encode_run_chunk(carry)
            if rb_out is not None:
                yield rb_out

    return part.mapInArrow(encode_stream, BLOCKS_SCHEMA).withColumn(
        "bucket", term_bucket_col(F.col("term"))
    )


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    index_dir: str,
    n_docs_hint: int | None = None,
    n_salts: int = 32,
    resume: bool = False,
    bm25_k1: float = 1.2,
    bm25_b: float = 0.75,
    salt_min_df: int = SALT_MIN_DF,
    payload_codec: str = "pfor",
    store_positions: bool = True,
    stemmer: str = "s",
    anchors: DataFrame | None = None,
    page_ranks: DataFrame | None = None,
) -> dict:
    """Build (or resume) the full index. Returns build metrics.
    payload_codec: block payload compression for docids/tfs/doclens —
    "pfor" (patched frame-of-reference, default: ~24%% smaller blocks than
    varint at equal build/serve speed) or "varint" (LEB128); positions are
    always varint (pre-encoded per posting by the tokenize kernel).
    Pre-existing indexes keep the codec recorded in their manifest.
    stemmer: tokenizer stem function for document text — "s" (frozen s-stem
    spec, default) or "kstem" (Krovetz-scope inflectional spec; the
    reference's Lucene KStem analog, QryParser.java:40-49). Pinned in
    MANIFEST so the query side always resolves the same function; resume
    keeps the stemmer the doc_terms were actually tokenized with.
    page_ranks: optional (url, page_rank) frame — a real crawl-graph prior
    (e.g. links.url_priors: pagerank over the real-href host graph, mapped
    to each page) stored as the per-doc PageRank attribute the reference
    reads via Idx.getAttribute (LTR feature f4); urls absent from the
    frame keep the deterministic stand-in.
    anchors: optional (url, inlink) frame (links.anchor_texts output) — the
    aggregated inbound anchor text becomes the page's ``inlink`` field
    (ClueWeb semantics) in place of any in-page stand-in; pages with no
    inbound anchors index an empty inlink field. Joined on url under the
    same broadcast byte-gate as the docid join (co-partitioned storage on
    url at cluster scale); html bytes never move."""
    if payload_codec not in codec.PAYLOAD_CODECS:
        raise ValueError(f"unknown payload_codec {payload_codec!r}")
    get_stemmer(stemmer)  # fail on the driver, not inside the tokenize job
    os.makedirs(index_dir, exist_ok=True)
    t0 = time.time()
    metrics: dict = {}
    stage_secs: dict[str, float] = {}
    _last = [t0]

    def _lap(name: str) -> None:
        now = time.time()
        stage_secs[name] = round(now - _last[0], 2)
        _last[0] = now

    # -- stage 1: deterministic docids (+ per-doc attrs, fused) -------------
    # attrs (reference: spamScore/rawUrl/PageRank via Idx.getAttribute,
    # Idx.java:47-52; QryEval.java:822-829) are pure functions of url, so
    # they ride along in the docids write — one table, one job; readers
    # column-prune whichever half they need. The synthetic corpus has no
    # crawl-time metadata, so spam/pagerank are deterministic md5 stand-ins.
    docids_path = os.path.join(index_dir, "docids")
    if not (resume and _stage_done(index_dir, "docids")):
        base = assign_docids(pages.filter(F.col("lang") == "en")).select(
            "url", "docid",
            (F.conv(F.substring(F.md5("url"), 1, 4), 16, 10).cast("long") % 100)
            .cast("double").alias("spam_score"),
            ((F.conv(F.substring(F.md5("url"), 5, 4), 16, 10).cast("long") % 10000) / 100.0)
            .alias("page_rank"),
        )
        if page_ranks is not None:
            # real crawl-graph prior (e.g. links.pagerank over the host
            # graph, mapped to urls) replaces the stand-in; urls missing
            # from the frame keep it. Narrow (url, double) join — same
            # cluster answer as every url-keyed join here.
            pr = page_ranks.select("url", F.col("page_rank").alias("pr_in"))
            base = (base.join(pr, "url", "left")
                    .select("url", "docid", "spam_score",
                            F.coalesce("pr_in", "page_rank")
                            .alias("page_rank")))
        base.write.mode("overwrite").parquet(docids_path)
        _mark_stage(index_dir, "docids")
        _lap("docids")
    elif page_ranks is not None:
        # the docids stage (where attrs live) was resumed as-is; a newly
        # supplied priors frame cannot take effect without a rebuild —
        # surface that instead of silently ignoring it
        metrics["page_ranks_ignored_on_resume"] = True
    docids = spark.read.parquet(docids_path).select("url", "docid")

    n_docs = n_docs_hint or docids.count()
    _lap("count_docs")
    salt_range = max(1, math.ceil(n_docs / n_salts))
    metrics["n_docs"] = n_docs
    metrics["docid_space"] = n_docs  # dense build: space == count
    metrics["salt_range"] = salt_range
    metrics["salt_min_df"] = salt_min_df
    metrics["n_salts"] = n_salts
    metrics["bm25_k1"] = bm25_k1
    metrics["bm25_b"] = bm25_b
    metrics["payload_codec"] = payload_codec
    metrics["store_positions"] = bool(store_positions)
    metrics["stemmer"] = stemmer  # pinned: query side resolves the same fn

    # -- stage 2: tokenized postings long table + doc_lens ------------------
    # tokens arrays keep stopword slots as NULL so len(tokens) == field
    # length incl. stopwords (reference Idx.getFieldLength semantics,
    # Idx.java:99-115).
    doc_lens_path = os.path.join(index_dir, "doc_lens")
    if not (resume and _stage_done(index_dir, "doc_terms")):
        # one tokenize pass; (docid, field, term) aggregation happens
        # doc-locally inside the Arrow batch -> NO groupBy shuffle here.
        # The docids join must NOT sort-merge: that would shuffle every html
        # byte by url. Broadcast the narrow (url, docid) side while it fits
        # (explicit hint — it can exceed autoBroadcastJoinThreshold); at
        # 10^12 docs neither side broadcasts, and the cluster answer is
        # bucketed/co-partitioned storage of pages and docids on url so the
        # join is shuffle-free. html bytes never move in either regime.
        par = spark.sparkContext.defaultParallelism * 2
        en_pages = pages.filter(F.col("lang") == "en")
        # gate the explicit broadcast hint on estimated bytes, not a bare row
        # count: a (url, docid) row is ~100B serialized, and the driver plus
        # every executor must materialize the whole table. Cap configurable
        # for small-memory cluster configs; above the cap, AQE still
        # broadcasts if runtime stats say it's genuinely small.
        bcast_cap = int(os.environ.get("SE_BROADCAST_CAP_BYTES", 256 << 20))
        bcast_ids = n_docs * 100 <= bcast_cap
        ids = F.broadcast(docids) if bcast_ids else docids
        with_ids = en_pages.join(ids, "url")
        # Above the broadcast cap the join is a sort-merge shuffle of the
        # FULL html corpus, and its output width = spark.sql.shuffle
        # .partitions — a FIXED count. The first 10M-page build crossed the
        # cap with the session's 32 partitions: ~350 MB of html per join
        # task, and the pipelined join+tokenize+write stage OOM'd the 8 GB
        # heap (32 concurrent tasks x SMJ sort buffers + 2 partitioned
        # parquet writers x 32 MB row groups; BENCH/STRESS_10M.md). Width
        # must scale with the DATA: provision one shuffle partition per
        # byte-bounded input split (so each join task holds one split's
        # worth of html) and let AQE coalesce small corpora back down.
        # Restored after the tokenize write — only this stage moves html
        # bytes through a shuffle. The conf.set happens inside that write's
        # try/finally (everything in between is lazy, so the join binds the
        # shuffle width at ACTION time): an exception anywhere earlier —
        # e.g. a bad anchors frame — must not leak a thousands-wide shuffle
        # setting into the rest of the session.
        _sp_key = "spark.sql.shuffle.partitions"
        _old_sp = spark.conf.get(_sp_key)
        _widened_sp = (str(max(par, en_pages.rdd.getNumPartitions(),
                               int(_old_sp)))
                       if not bcast_ids else _old_sp)
        if anchors is not None:
            # semi-join to the indexed urls FIRST: anchor targets include
            # off-corpus urls (external links), so the raw table can exceed
            # n_docs many-fold; after the semi-join rows <= n_docs and the
            # broadcast gate's n_docs proxy is sound. ~1KB/row (up to 32
            # concatenated anchors); above the cap, plain shuffle join
            # (co-partitioned storage on url at cluster scale).
            # persist the per-docid anchor state actually indexed, then
            # read it BACK as the join source — one evaluation of the
            # (expensive) anchor aggregation lineage instead of two, and
            # the incremental refresh (incremental.refresh_anchors) diffs
            # future anchor tables against exactly these rows. Keyed by
            # docid (minted once) so live-filtering survives upserts.
            state_path = os.path.join(index_dir, "anchor_state")
            from ..links import one_anchor_row_per_url

            # defensively reduce to one row per url (latest epoch wins for
            # a multi-epoch streaming delta read) — a duplicate url here
            # would duplicate page rows and inflate tf/df silently
            one_anchor_row_per_url(anchors).join(docids, "url").select(
                "docid", "url", "inlink"
            ).write.mode("overwrite").parquet(state_path)
            anc = spark.read.parquet(state_path).select(
                "url", F.col("inlink").alias("inlink_override"))
            anc = F.broadcast(anc) if n_docs * 1024 <= bcast_cap else anc
            with_ids = with_ids.join(anc, "url", "left")
            metrics["anchor_inlinks"] = True
        else:
            # a fresh un-anchored build into a previously anchored dir must
            # not leave state describing an index that no longer exists
            # (docid collisions would mis-drive every future refresh diff)
            import shutil

            shutil.rmtree(os.path.join(index_dir, "anchor_state"),
                          ignore_errors=True)
        if en_pages.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism:
            # tiny test corpora scan into a couple of input splits, which
            # would serialize the tokenize kernel. Only then is the
            # repartition worth it: it is a full shuffle of the html bytes,
            # so when the scan already supplies >= one split per core the
            # kernel reads parquet splits directly and no page bytes move.
            with_ids = with_ids.repartition(par)
        tokenized_path = os.path.join(index_dir, "tokenized")
        # ONE write, partitioned by post (0 = doclen sentinel rows, 1 = real
        # postings). doc_terms IS the post=1 partition directory — the old
        # filter-and-rewrite of the biggest intermediate is gone.
        try:
            spark.conf.set(_sp_key, _widened_sp)
            pages_to_tokenized(with_ids, stemmer=stemmer).withColumn(
                "post", (F.col("term") != "").cast("int")
            ).write.mode("overwrite").partitionBy("post").parquet(tokenized_path)
        finally:
            spark.conf.set(_sp_key, _old_sp)
        spark.read.parquet(os.path.join(tokenized_path, "post=0")).select(
            "docid", "field", F.col("doclen").cast("int").alias("len")
        ).write.mode("overwrite").parquet(doc_lens_path)
        # wide variant (one row per doc, len_<field> columns): Indri's
        # default scores need per-field doclens for every candidate doc;
        # pivoting once at build time beats a scan+pivot per query
        _write_doc_lens_wide(spark, index_dir)
        _mark_stage(index_dir, "doc_terms", stemmer=stemmer)
        _lap("doc_terms")
    else:
        if anchors is not None:
            # the tokenize stage (where anchors index into the inlink field)
            # was resumed as-is; a newly supplied anchors frame cannot take
            # effect without a rebuild or refresh_anchors — surface that like
            # the page_ranks resume branch does instead of silently no-op'ing
            metrics["anchors_ignored_on_resume"] = True
        # doc_terms were tokenized by the PREVIOUS run: the manifest must
        # keep the stemmer they were actually stemmed with (same discipline
        # as salt_min_df for resumed segments) — recording this call's value
        # would make the query side stem differently from the documents
        man_path = os.path.join(index_dir, "MANIFEST.json")
        man = {}
        if os.path.exists(man_path):
            with open(man_path) as f:
                man = json.load(f)
        pinned = _pinned_meta(index_dir, "doc_terms", man, man_path)
        if "stemmer" in pinned:
            old_stemmer = pinned["stemmer"]
        elif man:
            old_stemmer = "s"  # pre-kstem manifest: 's' was the only spec
        else:
            # crashed before any MANIFEST and the marker predates stemmer
            # stamping: the re-run's own value is the best available guess
            old_stemmer = stemmer
            metrics["stemmer_unpinned_on_resume"] = True
        if old_stemmer != stemmer:
            metrics["stemmer_ignored_on_resume"] = True
        metrics["stemmer"] = old_stemmer
    doc_terms = spark.read.parquet(doc_terms_dir(index_dir))

    # -- stage 3: stats tables ----------------------------------------------
    term_stats_path = os.path.join(index_dir, "term_stats")
    field_stats_path = os.path.join(index_dir, "field_stats")
    if not (resume and _stage_done(index_dir, "stats")):
        term_stats = doc_terms.groupBy("field", "term").agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.sum("tf").cast("long").alias("ctf"),
        ).withColumn("bucket", term_bucket_col(F.col("term")))
        write_term_stats(term_stats, term_stats_path)

        doc_lens = spark.read.parquet(doc_lens_path)
        field_stats = doc_lens.filter(F.col("len") > 0).groupBy("field").agg(
            F.count(F.lit(1)).cast("long").alias("doc_count"),
            F.sum("len").cast("long").alias("sum_len"),
        )
        meta_row = spark.createDataFrame(
            [("__docs__", int(n_docs), 0)], ["field", "doc_count", "sum_len"]
        )
        field_stats.unionByName(meta_row).write.mode("overwrite").parquet(field_stats_path)
        _lap("stats")
        # spell sidecar: materialize the SymSpell delete-key table once per
        # build/compact so Engine.suggest is a pruned point read, never a
        # vocab-sized explode per call (index/spellkeys.py). Own lap so
        # stage timings stay comparable with pre-sidecar bench records.
        from .spellkeys import write_spell_keys

        write_spell_keys(spark, index_dir)
        _mark_stage(index_dir, "stats")
        _lap("spell_keys")

    term_stats = spark.read.parquet(term_stats_path)
    field_stats = spark.read.parquet(field_stats_path)

    # -- stage 4: salted block encode -> partial segments --------------------
    segments_path = os.path.join(index_dir, "blocks_segments")
    if resume and _stage_done(index_dir, "segments"):
        # blocks were NOT re-encoded: the manifest must keep the params the
        # blocks were actually encoded with, else the engine's stale-bounds
        # check is defeated and WAND prunes unsoundly
        man_path = os.path.join(index_dir, "MANIFEST.json")
        old_man = {}
        if os.path.exists(man_path):
            with open(man_path) as f:
                old_man = json.load(f)
        # the segments marker stamps the encode params at encode time, so a
        # build that crashed before its final MANIFEST write still pins
        # them; a manifest rewritten later (append/compact) wins on recency
        pinned = _pinned_meta(index_dir, "segments", old_man, man_path)
        # same rule for the payload codec: blocks keep the codec they were
        # actually encoded with
        metrics["payload_codec"] = pinned.get("payload_codec", "varint")
        metrics["store_positions"] = pinned.get("store_positions", True)
        # stripe geometry: the reader derives each stripe's docid window
        # from manifest salt_range — recording this call's value (line
        # `salt_range = ceil(n_docs / n_salts)` above) for blocks encoded
        # under a DIFFERENT n_salts would silently misalign every striped
        # decode, so restore both unconditionally when a source knows them
        if "salt_range" in pinned:
            metrics["salt_range"] = pinned["salt_range"]
        if "n_salts" in pinned:
            metrics["n_salts"] = pinned["n_salts"]
        # and for the striping threshold: cold_blocks' skip-gate ("df >=
        # salt_min_df implies every block is striped") is only sound
        # against the value the blocks were ENCODED with — recording the
        # new call's value would silently drop any term whose df falls
        # between the two thresholds from every query
        if "salt_min_df" in pinned:
            metrics["salt_min_df"] = pinned["salt_min_df"]
        else:  # encode threshold unknown -> reader must not skip-gate
            metrics["salt_min_df_unknown"] = True
        if "bm25_k1" in pinned:
            metrics["bm25_k1"] = pinned["bm25_k1"]
            metrics["bm25_b"] = pinned["bm25_b"]
            if (bm25_k1, bm25_b) != (pinned["bm25_k1"], pinned["bm25_b"]):
                metrics["stale_block_bounds"] = True
        else:  # encode params unknown -> conservative bounds at serve time
            metrics["stale_block_bounds"] = True
        if pinned.get("stale_block_bounds") and pinned.get("appends"):
            # appended blocks carry bounds under pre-append corpus stats;
            # only compact()/re-encode clears that, not a resumed build.
            # (Without appends the flag does NOT persist: the manifest keeps
            # the encode-time k1/b, so a matching-params resume re-verifies
            # bounds sound and clears a previous mismatched-call's flag.)
            metrics["stale_block_bounds"] = True
        # lifecycle state maintained by append/upsert/delete/compact lives
        # only in the manifest — a resumed build (which re-encoded nothing)
        # must carry it forward, not erase it: `appends` drives
        # segment_cuts' url-rank tie segments, `docid_space` covers docid
        # holes left by upserts (the dense n_docs recompute above
        # undercounts it), the rest keeps compact_buckets' bookkeeping
        for k in ("appends", "compactions", "docid_space", "n_deleted",
                  "uncompacted_buckets", "stale_bound_buckets"):
            if k in pinned:
                metrics[k] = pinned[k]
    else:
        fs = {r["field"]: (r["doc_count"], r["sum_len"]) for r in field_stats.collect()}
        avg_len = {f: (s / c if c else 1.0) for f, (c, s) in fs.items() if f != "__docs__"}
        blocks = encode_blocks(spark, doc_terms, term_stats, avg_len, int(n_docs),
                               salt_range, bm25_k1, bm25_b, salt_min_df,
                               payload_codec=payload_codec,
                               store_positions=store_positions)
        blocks.write.mode("overwrite").parquet(segments_path)
        _mark_stage(index_dir, "segments", salt_range=int(salt_range),
                    n_salts=int(n_salts), salt_min_df=int(salt_min_df),
                    payload_codec=payload_codec,
                    store_positions=bool(store_positions),
                    bm25_k1=float(bm25_k1), bm25_b=float(bm25_b))
        _lap("segments")

    # -- stage 5: merge segments into the serving layout ---------------------
    # Range-partition the COMPRESSED blocks (~100x smaller than raw postings)
    # on (bucket, field, term, salt): equal keys land in one partition, each
    # merge task owns a contiguous bucket range, so partitionBy("bucket")
    # emits ~1-2 directories per task — file count O(tasks + buckets) — with
    # term-contiguous row groups so parquet min/max stats prune term IN()
    # scans. This is the "merge partial segment indexes" step: stripes are
    # docid-range disjoint, so merge is layout-only, never a re-sort of
    # postings.
    blocks_path = os.path.join(index_dir, "blocks")
    if not (resume and _stage_done(index_dir, "blocks")):
        seg = spark.read.parquet(segments_path)
        (
            seg.repartitionByRange(
                max(spark.sparkContext.defaultParallelism, 16),
                "bucket", "field", "term", "salt")
            .sortWithinPartitions("bucket", "field", "term", "salt", "min_docid")
            .write.mode("overwrite").partitionBy("bucket").parquet(blocks_path)
        )
        _mark_stage(index_dir, "blocks")
        _lap("merge")

    # -- stage 6: lineage / metrics ------------------------------------------
    lineage_path = os.path.join(index_dir, "lineage")
    if not (resume and _stage_done(index_dir, "lineage")):
        # same rows as the serving layout, but the flat segments table scans
        # without listing the 256 bucket directories the merge just wrote
        blocks_df = spark.read.parquet(segments_path)
        lineage = blocks_df.groupBy("bucket", "field").agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum("n").alias("n_postings"),
            F.sum(F.length("docids_z") + F.length("tfs_z")
                  + F.length("positions_z")).alias("bytes_compressed"),
            F.countDistinct("term").alias("n_terms"),
        )
        lineage.write.mode("overwrite").parquet(lineage_path)
        _mark_stage(index_dir, "lineage")
        _lap("lineage")

    elapsed = time.time() - t0
    lineage_rows = spark.read.parquet(lineage_path).agg(
        F.sum("n_postings").alias("p"), F.sum("bytes_compressed").alias("b")
    ).collect()[0]
    metrics["stage_secs"] = stage_secs
    metrics.update(
        build_secs=elapsed,
        docs_per_sec=(n_docs / elapsed if elapsed > 0 else 0.0),
        postings=int(lineage_rows["p"] or 0),
        postings_per_sec=(int(lineage_rows["p"] or 0) / elapsed if elapsed > 0 else 0.0),
        bytes_compressed=int(lineage_rows["b"] or 0),
    )
    with open(os.path.join(index_dir, "MANIFEST.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    from .snapshots import commit_snapshot

    metrics["snapshot"] = commit_snapshot(index_dir, "build")
    return metrics


class IndexReader:
    """Query-side handle: broadcast stats + pruned block scans."""

    def __init__(self, spark: SparkSession, index_dir: str,
                 snapshot: int | None = None):
        """snapshot: serve against the index as of commit N (time travel) —
        later appends/compactions are invisible and results reproduce
        bit-for-bit. Default: the live (latest) state."""
        if snapshot is not None:
            from .snapshots import snapshot_dir

            index_dir = snapshot_dir(index_dir, snapshot)
            if not os.path.isdir(index_dir):
                raise FileNotFoundError(f"no snapshot v{snapshot} at {index_dir}")
        elif os.path.exists(os.path.join(index_dir, "COMPACTING")):
            # a compaction is in progress or crashed mid-rewrite: the live
            # tree may be inconsistent (some tables swapped, some not), so
            # serve the last COMMITTED snapshot instead — Iceberg
            # read-committed behavior. compact() re-run repairs the live
            # tree and removes the marker.
            from .snapshots import list_snapshots, snapshot_dir

            snaps = list_snapshots(index_dir)
            if not snaps:
                raise RuntimeError(
                    f"{index_dir}: compaction in progress/crashed and no "
                    "committed snapshot exists — re-run compact() to repair")
            index_dir = snapshot_dir(index_dir, int(snaps[-1]["version"]))
        self.spark = spark
        self.index_dir = index_dir
        fs = spark.read.parquet(os.path.join(index_dir, "field_stats")).collect()
        self.field_stats = {r["field"]: (int(r["doc_count"]), int(r["sum_len"])) for r in fs}
        self.n_docs = self.field_stats.pop("__docs__")[0]
        self._blocks = spark.read.parquet(os.path.join(index_dir, "blocks"))
        self._term_stats = spark.read.parquet(os.path.join(index_dir, "term_stats"))
        self._docids = None
        self._serve_blocks = None
        try:
            with open(os.path.join(index_dir, "MANIFEST.json")) as f:
                self.manifest = json.load(f)
        except FileNotFoundError:
            self.manifest = {}
        self.salt_range = int(self.manifest.get("salt_range") or max(1, -(-self.n_docs // 32)))
        # docid-space extent (max docid + 1). Equals n_docs for a dense
        # build; exceeds it after a physical purge leaves docid holes.
        self.docid_space = int(self.manifest.get("docid_space") or self.n_docs)
        self.salt_min_df = int(self.manifest.get("salt_min_df") or SALT_MIN_DF)
        # cold_blocks may only SKIP scanning a term (df >= salt_min_df =>
        # "all its blocks are striped") when the manifest actually records
        # the threshold the blocks were encoded with; a legacy manifest
        # (or a resume that couldn't recover it) forces the conservative
        # path: scan every pair with postings, like the appends case.
        self.salt_min_df_known = ("salt_min_df" in self.manifest
                                  and not self.manifest.get("salt_min_df_unknown"))
        self.payload_codec = self.manifest.get("payload_codec", "varint")
        # the stemmer documents were tokenized with; every query-side
        # tokenization (parser, LTR query vectors, snippets) must use it
        self.stemmer = str(self.manifest.get("stemmer", "s"))
        # False for DOCS_AND_FREQS-style indexes (blocks carry no position
        # payloads; positional operators raise at plan time)
        self.store_positions = bool(self.manifest.get("store_positions", True))
        # (field, term) -> (df, ctf) or None for known-absent; the reference's
        # ctf memoization across queries (QryEval.java:644-651). Readers are
        # per-index-version objects, so no staleness across appends.
        self._ts_memo: dict[tuple[str, str], tuple[int, int] | None] = {}
        # (field, term) -> raw unstriped block tuples (possibly []); see
        # cold_blocks(). Per-index-version like _ts_memo, so never stale —
        # but entries hold compressed posting BYTES (up to salt_min_df
        # postings each), so unlike the small _ts_memo tuples this one is
        # LRU-bounded: a long-lived reader on a rare-term-heavy workload
        # must not grow driver memory with the distinct-term count.
        self._cold_memo: "OrderedDict[tuple[str, str], list[tuple]]" = OrderedDict()

    @property
    def norms_dir(self) -> str:
        """Docid-sorted doc_lens_wide — the norms sidecar serve kernels
        read doclens from (blocks no longer carry them)."""
        return os.path.join(self.index_dir, "doc_lens_wide")

    def segment_cuts(self) -> list[int] | None:
        """Docid cut points of the url-rank SEGMENTS: [0, lo_1, lo_2, ...]
        where lo_i is the first docid of the i-th append. WITHIN a segment,
        docid order == url order (build docids are ranks of the sorted
        urls; each append's delta docids are ranks of the delta's sorted
        urls, offset past the old max) — the invariant serving tie-breaks
        lean on. Across segments it does not hold, so exact reference
        tie-breaks need a per-segment cut (Engine's pre-join top-k).
        Returns None when the history is unusable (a legacy append entry
        without extents, or so many segments that a per-segment plan would
        be unwieldy) — callers must then fall back to resolving urls for
        every candidate."""
        appends = self.manifest.get("appends", [])
        cuts = [0]
        for e in appends:
            if "docid_lo" not in e:
                return None
            cuts.append(int(e["docid_lo"]))
        if len(cuts) > 64:
            return None
        return sorted(set(cuts))

    def avg_doclen(self, field: str) -> float:
        c, s = self.field_stats[field]
        return s / c if c else 1.0

    def doc_count(self, field: str) -> int:
        return self.field_stats[field][0]

    def term_stats_df(self) -> DataFrame:
        """The full (field, term, df, ctf, bucket) stats table — the index
        vocabulary (one row per term per field, vocab-sized not
        corpus-sized). Consumers: spell suggestion, inspection dumps."""
        return self._term_stats

    def term_stats(self, terms: list[tuple[str, str]]) -> dict[tuple[str, str], tuple[int, int]]:
        """(field, term) -> (df, ctf); missing terms absent. Memoized, so a
        query whose terms were all seen before costs zero Spark jobs here."""
        missing = sorted({t for t in terms if t not in self._ts_memo})
        if missing:
            buckets = sorted({term_bucket_py(t) for _, t in missing})
            conds = F.col("bucket").isin(buckets) & F.struct("field", "term").isin(
                [F.struct(F.lit(f), F.lit(t)) for f, t in missing]
            )
            found = {(r["field"], r["term"]): (int(r["df"]), int(r["ctf"]))
                     for r in self._term_stats.filter(conds).collect()}
            for key in missing:
                self._ts_memo[key] = found.get(key)
        return {t: v for t in terms if (v := self._ts_memo[t]) is not None}

    def cold_blocks(self, terms: list[tuple[str, str]]
                    ) -> dict[tuple[str, str], list[tuple]]:
        """Unstriped (low-df) block rows for the given (field, term) pairs,
        as raw tuples (min_docid, max_docid, max_tf, min_doclen, max_score,
        docids_z, tfs_z) — callers derive score bounds under their own
        (k1, b). Memoized per reader like _ts_memo, so a repeat query pays
        zero Spark jobs here, and provably-empty lookups are skipped
        outright:

        - a pair with no stats row has no postings at all (term_stats and
          blocks derive from the same doc_terms table), and
        - on an index with no appends recorded, ``striped`` was derived
          from the LIVE df at encode time (encode_blocks), so df >=
          salt_min_df means every one of the pair's blocks is striped.

        The common all-hot-terms query therefore never pays the cold scan
        (measured ~0.5 s/query at 1M pages before this). Appends void the
        df inference — a term can cross the threshold leaving older
        unstriped blocks behind — so appended indexes scan every unseen
        pair that has postings; compact() re-encodes with current stats,
        but the appends history is retained for segment tie-breaks, so the
        conservative gate stays off until a fresh build."""
        pairs = sorted(set(terms))
        found: dict[tuple[str, str], list[tuple]] = {}
        unseen = []
        for p in pairs:
            v = self._cold_memo.get(p)
            if v is None:
                unseen.append(p)
            else:
                self._cold_memo.move_to_end(p)
                found[p] = v
        if unseen:
            stats = self.term_stats(unseen)  # memoized upstream of wand
            if self.manifest.get("appends") or not self.salt_min_df_known:
                candidates = [p for p in unseen if p in stats]
            else:
                candidates = [p for p in unseen
                              if 0 < stats.get(p, (0, 0))[0] < self.salt_min_df]
            got: dict[tuple[str, str], list[tuple]] = {}
            if candidates:
                rows = (self.blocks_for(candidates)
                        .filter(~F.col("striped"))
                        .select("field", "term", "min_docid", "max_docid",
                                "max_tf", "min_doclen", "max_score",
                                "docids_z", "tfs_z")
                        .collect())
                for r in rows:
                    got.setdefault((r["field"], r["term"]), []).append(
                        (int(r["min_docid"]), int(r["max_docid"]),
                         int(r["max_tf"]), int(r["min_doclen"]),
                         float(r["max_score"]),
                         bytes(r["docids_z"]), bytes(r["tfs_z"])))
            for p in unseen:
                v = got.get(p, [])
                found[p] = v
                self._cold_memo[p] = v
            while len(self._cold_memo) > COLD_MEMO_CAP:
                self._cold_memo.popitem(last=False)
        return {p: v for p, v in found.items() if v}

    def blocks_for(self, terms: list[tuple[str, str]]) -> DataFrame:
        """Pruned scan: bucket partition filter (directory pruning) + plain
        term IN (pushed to parquet row-group stats) + exact (field, term)
        struct filter."""
        buckets = sorted({term_bucket_py(t) for _, t in terms})
        return self._blocks.filter(
            F.col("bucket").isin(buckets)
            & F.col("term").isin(sorted({t for _, t in terms}))
            & F.struct("field", "term").isin([F.struct(F.lit(f), F.lit(t)) for f, t in terms])
        )

    # serve-cache registry: one persisted layout per index dir per
    # process. Readers are per-index-version, so when a NEW reader for
    # the same dir builds its cache, the superseded reader's cache is dead
    # weight — unpersist it instead of leaking executor storage for the
    # session's lifetime (the stream-freshness shape: a fresh reader per
    # append epoch). Bounded: oldest entries evict (and unpersist) past
    # the cap, covering many-distinct-index test sessions too.
    _SERVE_CACHE_REGISTRY: OrderedDict = OrderedDict()
    _SERVE_CACHE_CAP = 8

    def close(self) -> None:
        """Release this reader's persisted serve layout (optional — a newer
        reader over the same index dir, or registry eviction, also
        releases it)."""
        df = self._serve_blocks
        if df is not None:
            try:
                df.unpersist()
            except Exception:
                pass  # session already stopped
            self._SERVE_CACHE_REGISTRY.pop(
                os.path.realpath(self.index_dir), None)
            self._serve_blocks = None

    @property
    def n_stripes(self) -> int:
        """Stripes must cover the docid SPACE, not the doc count: after a
        physical purge surviving docids keep their values (holes), so the
        max docid can exceed n_docs."""
        return max(1, -(-self.docid_space // self.salt_range))

    SERVE_COLS = ("field", "term", "salt", "min_docid", "max_docid",
                  "max_score", "max_tf", "min_doclen", "docids_z", "tfs_z")

    def serve_blocks(self) -> DataFrame:
        """Serve-ready block layout, built once per reader and PERSISTED:
        all striped blocks (serving columns only — position payloads stay
        on disk) plus one empty skeleton row per stripe, hash-partitioned
        by salt. A query then filters its terms out of the cached
        partitions and groupBy(salt) reuses the partitioning — the warm
        stripe job is ONE no-shuffle stage, no per-query block scan.

        This is the Spark analog of an IR shard's in-memory posting cache
        (Lucene's page-cache-resident segments): the cluster's executor
        DRAM is the serving tier, MEMORY_AND_DISK so an index bigger than
        memory degrades to local-disk reads instead of failing, and the
        per-executor slice is index_bytes / n_executors — scale-out adds
        serving DRAM. Readers are per-index-version (appends/compactions
        build a new reader), so the cache can never serve stale blocks.
        First touch pays the scan+shuffle the uncached path pays per
        query; SPARK_GRAFT_SERVE_CACHE=0 disables materialization (the
        frame still computes, uncached) for memory-constrained runs.

        Partition count: one task per stripe is right when stripes carry
        real decode work, but at small corpora the ~10 ms/task dispatch
        floor dominates the ~tens-of-ms kernels, so stripes PACK — several
        salt groups per task (groupBy still splits them per salt inside) —
        sized so each task holds ~SPARK_GRAFT_SERVE_TASK_BYTES (default
        2 MB) of on-disk block bytes, capped at n_stripes. Measured at
        100k pages / 32 stripes on local[32]: 32 tasks 0.54 s warm query,
        16 tasks 0.45 s, 8 tasks 0.51 s (packing too far serializes the
        kernel) — the byte heuristic lands at ~18 there and at the full
        n_stripes for 1M+ corpora, where per-stripe work pays for its
        task."""
        if self._serve_blocks is None:
            from pyspark import StorageLevel

            sel = list(self.SERVE_COLS)
            skeleton = self.spark.range(self.n_stripes).select(
                F.lit("").alias("field"), F.lit("").alias("term"),
                F.col("id").cast("int").alias("salt"),
                F.lit(0).cast("long").alias("min_docid"),
                F.lit(-1).cast("long").alias("max_docid"),
                F.lit(0.0).alias("max_score"),
                F.lit(0).cast("int").alias("max_tf"),
                F.lit(0).cast("int").alias("min_doclen"),
                F.lit(b"").alias("docids_z"), F.lit(b"").alias("tfs_z"),
            )
            task_bytes = int(os.environ.get(
                "SPARK_GRAFT_SERVE_TASK_BYTES", str(2 << 20)))
            blocks_bytes = sum(
                os.path.getsize(os.path.join(dp, fn))
                for dp, _, fns in os.walk(os.path.join(self.index_dir, "blocks"))
                for fn in fns if fn.endswith(".parquet"))
            n_part = max(1, min(self.n_stripes,
                                -(-blocks_bytes // max(1, task_bytes))))
            # Plan + persist + materialize with AQE OFF: an AQE-wrapped
            # cached plan reports UNKNOWN output partitioning, so every
            # query's groupBy(salt) would re-Exchange the filtered rows (a
            # small shuffle, but a whole extra stage of task dispatch per
            # query). A non-adaptive cached plan exposes
            # HashPartitioning(salt, n) and the per-query stripe job runs
            # as ONE stage. AQE adds nothing here anyway — the layout is
            # an explicit fixed-width repartition.
            spark, aqe_key = self.spark, "spark.sql.adaptive.enabled"
            old_aqe = spark.conf.get(aqe_key)
            try:
                spark.conf.set(aqe_key, "false")
                hot = (self._blocks.filter(F.col("striped")).select(*sel)
                       .unionByName(skeleton)
                       .repartition(n_part, "salt"))
                if os.environ.get("SPARK_GRAFT_SERVE_CACHE", "1") != "0":
                    hot = hot.persist(StorageLevel.MEMORY_AND_DISK)
                    hot.count()  # materialize under the non-adaptive plan
            finally:
                spark.conf.set(aqe_key, old_aqe)
            # registry upkeep: a prior reader's cache for the SAME dir is
            # superseded (readers are per-version) — release it; evict the
            # oldest entry past the cap
            reg = self._SERVE_CACHE_REGISTRY
            key = os.path.realpath(self.index_dir)
            old = reg.pop(key, None)
            if old is not None and old is not hot:
                try:
                    old.unpersist()
                except Exception:
                    pass
            reg[key] = hot
            while len(reg) > self._SERVE_CACHE_CAP:
                _k, stale = reg.popitem(last=False)
                try:
                    stale.unpersist()
                except Exception:
                    pass
            self._serve_blocks = hot
        return self._serve_blocks

    def docid_url_map(self) -> DataFrame:
        if self._docids is None:
            self._docids = self.spark.read.parquet(os.path.join(self.index_dir, "docids"))
        return self._docids

    def doc_terms(self) -> DataFrame:
        return self.spark.read.parquet(doc_terms_dir(self.index_dir))

    def doc_lens(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.index_dir, "doc_lens"))

    def doc_lens_wide(self) -> DataFrame:
        """(docid, len_<field>...) — one row per doc. Built at index time;
        derived on the fly for indexes predating the artifact."""
        p = os.path.join(self.index_dir, "doc_lens_wide")
        if os.path.exists(p):
            return self.spark.read.parquet(p)
        from ..corpus import FIELDS

        wide = self.doc_lens().groupBy("docid").pivot("field", FIELDS).agg(F.first("len"))
        for f in FIELDS:
            wide = wide.withColumnRenamed(f, f"len_{f}")
        return wide

    def deletes_df(self) -> DataFrame | None:
        """Tombstoned docids (merge-on-read deletes), or None when the index
        has none. Bounded by deletes since the last compaction — compaction
        removes tombstoned docs physically and clears this table."""
        p = os.path.join(self.index_dir, "deletes")
        if os.path.isdir(p) and any(f.endswith(".parquet") for f in os.listdir(p)):
            return self.spark.read.parquet(p).select("docid").distinct()
        return None

    def deleted_set(self) -> frozenset | None:
        """Tombstones as a driver-side frozenset for the WAND kernel
        broadcast. Cached per reader (readers are per-index-version)."""
        if not hasattr(self, "_deleted_set"):
            df = self.deletes_df()
            self._deleted_set = (
                frozenset(int(r["docid"]) for r in df.collect()) if df is not None
                else None)
        return self._deleted_set

    def attrs(self) -> DataFrame:
        """(docid, raw_url, spam_score, page_rank) — stored fused in the
        docids table; a standalone attrs/ dir (older layout) wins if present."""
        legacy = os.path.join(self.index_dir, "attrs")
        if os.path.exists(legacy):
            return self.spark.read.parquet(legacy)
        return self.spark.read.parquet(os.path.join(self.index_dir, "docids")).select(
            "docid", F.col("url").alias("raw_url"), "spam_score", "page_rank")
