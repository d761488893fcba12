"""Benchmark harness. Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Phases:
  build   — inverted-index build over the deterministic synthetic pages
            corpus (north-star metric: docs/sec); corpus size scales with sf.
  serve   — BM25 / structured / WAND query latency against the built index.
  analytic— driver-table queries (bm25, dedup, similarity) at $SPARK_GRAFT_SF_DIR.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     BENCH_N_PAGES (override corpus size),
     BENCH_PHASES (csv subset, default all).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF = SF_DIR.rstrip("/").split("sf")[-1]
# 1M pages/sf-unit: at sf0.1 the 100k-page build runs ~30s at local[32] and
# is compute-dominated (10k pages measured session overhead, not the engine)
N_PAGES = int(os.environ.get("BENCH_N_PAGES", "0")) or max(2000, int(float(SF) * 1_000_000))
PHASES = os.environ.get("BENCH_PHASES", "build,serve,anchors,analytic").split(",")

SERVE_QUERIES = {
    "bm25_bow": ("cebaba1 dibaba2 fobaba3 gubaba4", "bm25"),
    "bm25_and": ("#AND( cebaba1 dibaba2 )", "bm25"),
    "indri_wand": ("#WAND( 0.6 cebaba1 0.4 #AND( dibaba2 fobaba3 ) )", "indri"),
    "near": ("#NEAR/4( cebaba1 dibaba2 )", "bm25"),
    "ranked_or": ("#OR( dibaba2 fobaba3 )", "rankedboolean"),
}

ANALYTIC = ["bm25_topk", "indri_topk", "minhash", "jaccard_topk",
            "jaccard_topk_scaled", "lsh_dup_pairs_scaled", "simhash",
            "simhash_dup_pairs", "cosine_topk", "pq_topk", "embed_dup_pairs",
            "substring_dedup", "near_pairs", "snippet", "quality",
            "events_window", "events_sessions",
            "pagerank", "domain_cap", "bpe_pairs", "eval_summary"]
# csv subset override (the scaled-input scaling study excludes the
# explicitly-labeled exact all-pairs baselines, which are O(n^2) by design)
if os.environ.get("BENCH_ANALYTIC_QUERIES"):
    ANALYTIC = [q for q in os.environ["BENCH_ANALYTIC_QUERIES"].split(",")
                if q in ANALYTIC]


def _cpu_stat():
    with open("/proc/stat") as f:
        return list(map(int, f.readline().split()[1:]))


def _loop_rate(pin_cpu: int | None = None) -> float:
    """Single-core Python-loop Miter/s — a host-health canary. This sandbox
    VM shows multi-x run-to-run swings from hypervisor contention; recording
    the canary beside every bench lets a reader normalize. The ONE
    definition every bench tool shares (tools/ import it), so the number
    stays comparable across studies. pin_cpu: measure a specific core
    (hypervisor degradation is per-core-placement dependent)."""
    if pin_cpu is not None:
        os.sched_setaffinity(0, {pin_cpu})
    t0 = time.time()
    s = 0
    for i in range(2_000_000):
        s += i
    return round(2.0 / max(1e-9, time.time() - t0), 2)


def main():
    from searchengines_spark.session import get_spark

    spark = get_spark("bench", cores=CPUS, shuffle_partitions=max(CPUS, 16))
    queries: dict[str, float] = {}
    extra: dict = {"n_pages": N_PAGES, "cpus": CPUS}
    stat0 = _cpu_stat()
    extra["host_loop_mops_start"] = _loop_rate()
    t_all = time.time()
    # soft wall-clock budget: the repeat runs that damp host noise are
    # OPTIONAL — on a degraded host (or at large BENCH_N_PAGES) skip them
    # rather than risk the caller's time budget. First passes always run.
    deadline = t_all + float(os.environ.get("BENCH_DEADLINE_SEC", "420"))

    def budget_left() -> float:
        return deadline - time.time()
    # scratch placement is measurable on this sandbox: A/B at 32-wide shows
    # tmpfs scratch 2.6x-slows the tokenize stage (tmpfs I/O competes with
    # the allocation-heavy kernels for DRAM bandwidth), while virtio disk
    # offloads writeback to the host. Default disk; BENCH_SCRATCH overrides.
    scratch_root = os.environ.get("BENCH_SCRATCH", "")
    idx_dir = tempfile.mkdtemp(prefix="benchidx_", dir=scratch_root or None)
    try:
        if "build" in PHASES or "serve" in PHASES:
            from searchengines_spark.corpus import generate_pages
            from searchengines_spark.index import IndexReader, build_index

            pages_path = os.path.join(idx_dir, "pages_parquet")
            t0 = time.time()
            generate_pages(spark, N_PAGES, seed=42,
                           partitions=max(CPUS, N_PAGES // 5000)).write.parquet(pages_path)
            queries["gen_pages"] = round(time.time() - t0, 3)
            pages = spark.read.parquet(pages_path)

            # best-of-N to damp host noise (this sandbox VM shows +-30%
            # run-to-run on identical builds); every run's wall clock is
            # reported in index_build_runs, the best run is the headline.
            # Default 2 runs, but never for large corpora (keeps the
            # harness under the driver's time budget).
            n_runs = int(os.environ.get("BENCH_BUILD_RUNS", "0")) or (
                2 if N_PAGES <= 150_000 else 1)
            runs = []
            for r in range(n_runs):
                if r and budget_left() < 180:
                    break  # keep the single honest run; note it in the output
                path = os.path.join(idx_dir, "idx" if r == 0 else f"idx_r{r}")
                t0 = time.time()
                # n_salts fixed (NOT a function of CPUS): the scaling evidence
                # compares the same job at two parallelism levels, so the index
                # shape must be identical in both runs
                m_r = build_index(spark, pages, path, n_salts=32)
                runs.append((round(time.time() - t0, 3), m_r))
                if r:  # identical content (fingerprint-stable); keep "idx"
                    shutil.rmtree(path, ignore_errors=True)
            wall, m = min(runs, key=lambda x: x[0])
            queries["index_build"] = wall
            extra["index_build_runs"] = [w for w, _ in runs]
            extra["build_docs_per_sec"] = round(m["docs_per_sec"], 1)
            extra["build_postings_per_sec"] = round(m["postings_per_sec"], 1)
            extra["bytes_compressed"] = m["bytes_compressed"]
            extra["build_stage_secs"] = m.get("stage_secs", {})

        if "serve" in PHASES:
            from searchengines_spark.engine import Engine

            reader = IndexReader(spark, os.path.join(idx_dir, "idx"))
            eng = Engine(reader)
            # session warm-up: whole-stage codegen compile + python UDF worker
            # spawn are per-session costs a serving deployment pays at startup,
            # not per query. Warm-up terms are disjoint from the timed queries
            # (different term sets -> different plans -> no cache assist).
            from searchengines_spark.corpus import VOCAB
            w1, w2 = VOCAB[40], VOCAB[41]
            eng.search(f"{w1} {w2}", model="bm25", k=10).collect()
            eng.search(f"#NEAR/2( {w1} {w2} )", model="bm25", k=10).collect()
            eng.search(f"#WAND( 0.5 {w1} 0.5 {w2} )", model="indri", k=10).collect()
            lat = []
            serve_runs: dict[str, list[float]] = {}
            n_serve_runs = int(os.environ.get("BENCH_SERVE_RUNS", "2"))
            for name, (q, model) in SERVE_QUERIES.items():
                runs_q = []
                for rr in range(n_serve_runs):
                    if rr and budget_left() < 90:
                        break
                    t0 = time.time()
                    eng.search(q, model=model, k=100).collect()
                    runs_q.append(round(time.time() - t0, 3))
                serve_runs[name] = runs_q
                dt = min(runs_q)  # best-of-N damps host noise; all runs recorded
                queries[f"serve_{name}"] = dt
                lat.append(dt)
            extra["serve_runs"] = serve_runs
            lat.sort()
            extra["serve_p95_sec"] = round(lat[min(len(lat) - 1, int(0.95 * len(lat)))], 3)

            # batched throughput: a 12-query workload through the one-action
            # shared-scan path (the reference's 57-query runs are this shape)
            batch = {f"b{i}": f"{VOCAB[50 + 2 * i]} {VOCAB[51 + 2 * i]}"
                     for i in range(12)}
            t0 = time.time()
            out = eng.search_batch(batch, model="bm25", k=100)
            dt = time.time() - t0
            queries["serve_batch12"] = round(dt, 3)
            extra["serve_batch_qps"] = round(len([q for q in out if out[q]]) / dt, 2)

        if "anchors" in PHASES:
            # anchor-text lifecycle: aggregate real <a href> votes over a
            # link_fanout corpus, build with anchors= (inlink field), serve
            # one t.inlink query, then a delta refresh_anchors — the full
            # crawl-cycle path (BENCH/LIFECYCLE.md shape)
            t_anchors = time.time()
            from pyspark.sql import functions as F_

            from searchengines_spark.corpus import generate_pages
            from searchengines_spark.engine import Engine
            from searchengines_spark.index import IndexReader, build_index
            from searchengines_spark.index.incremental import refresh_anchors
            from searchengines_spark.links import anchor_texts_from_pages

            n_anchor = int(os.environ.get("BENCH_ANCHOR_PAGES", "0")) or min(
                N_PAGES, 20_000)
            ap_path = os.path.join(idx_dir, "anchor_pages")
            generate_pages(spark, n_anchor, seed=42,
                           partitions=max(CPUS, n_anchor // 5000),
                           link_fanout=3).write.parquet(ap_path)
            apages = spark.read.parquet(ap_path)
            t0 = time.time()
            anc_path = os.path.join(idx_dir, "anchors_tbl")
            anchor_texts_from_pages(apages).write.parquet(anc_path)
            queries["anchor_aggregate"] = round(time.time() - t0, 3)
            anc = spark.read.parquet(anc_path)

            d_anchor = os.path.join(idx_dir, "idx_anchor")
            t0 = time.time()
            build_index(spark, apages, d_anchor, n_salts=32, anchors=anc)
            queries["anchor_build"] = round(time.time() - t0, 3)

            eng_a = Engine(IndexReader(spark, d_anchor))
            top2 = (anc.select(F_.explode(F_.split("inlink", " ")).alias("t"))
                    .groupBy("t").count()
                    .orderBy(F_.desc("count"), F_.asc("t")).limit(2).collect())
            q_inlink = "#SUM( " + " ".join(
                f"{r['t']}.inlink" for r in top2) + " )"
            eng_a.search(q_inlink, model="bm25", k=100).collect()  # warm
            t0 = time.time()
            eng_a.search(q_inlink, model="bm25", k=100).collect()
            queries["serve_inlink"] = round(time.time() - t0, 3)

            # delta refresh: ~2% of urls gain a new anchor token — the
            # per-crawl-cycle shape (re-index ONLY the changed targets)
            delta = (anc.filter(F_.pmod(F_.xxhash64("url"), F_.lit(50)) == 0)
                     .withColumn("inlink",
                                 F_.concat("inlink", F_.lit(" freshanchor"))))
            t0 = time.time()
            m_r = refresh_anchors(spark, d_anchor, apages, delta, delta=True)
            queries["anchor_refresh"] = round(time.time() - t0, 3)
            extra["anchor_refreshed_docs"] = m_r.get("refreshed", 0)
            # the anchors phase is new in r4: keep the headline `value`
            # comparable with r1-r3 records (build+serve+analytic only)
            extra["anchors_wall_sec"] = round(time.time() - t_anchors, 3)

        if "analytic" in PHASES:
            import __spark_entry__ as E

            # queries_all: the bench battery includes exact-baseline twins
            # (minhash, jaccard_topk, simhash, quality) demoted from the
            # <=50-entry driver registry but still bench-relevant
            qs = E.queries_all() if hasattr(E, "queries_all") else E.queries()
            # session warm-up, mirroring the serve phase: Python/Arrow
            # worker spawn + first whole-stage-codegen compile are
            # per-session costs (~6s at 32-wide) that would otherwise be
            # billed to whichever query happens to run first
            from pyspark.sql import functions as F_

            spark.range(1000, numPartitions=CPUS).mapInPandas(
                lambda it: it, "id long").groupBy((F_.col("id") % 7).alias("g")
                                                  ).count().collect()
            # ...plus one untimed run of the first battery query: codegen
            # compile + parquet FileIndex listing are also per-session.
            # (Serve-phase analog: its warm-up queries are untimed too.)
            if ANALYTIC:
                spark.catalog.clearCache()
                qs[ANALYTIC[0]](spark, SF_DIR).collect()
                extra["analytic_warmup_query"] = ANALYTIC[0]
            n_an_runs = int(os.environ.get("BENCH_ANALYTIC_RUNS", "2"))
            an_runs: dict[str, list[float]] = {n: [] for n in ANALYTIC}
            for r in range(n_an_runs):
                if r and budget_left() < 120:  # extra pass is optional
                    break
                for name in ANALYTIC:
                    # clear BEFORE every query in every pass: Spark's
                    # CacheManager matches re-built identical plans, so one
                    # query's cached shingle/band tables would serve the next
                    # query (and pass-1 headline numbers) warm. Same for the
                    # driver-side PQ codebook memo (analytic._PQ_BOOKS_CACHE):
                    # clearing it keeps analytic_pq_topk measuring
                    # train+encode+ADC+refine, like-for-like with r1-r3
                    # records (the memo exists for serving batches, not to
                    # redefine what the bench times).
                    from searchengines_spark import analytic as A_
                    spark.catalog.clearCache()
                    A_._PQ_BOOKS_CACHE.clear()
                    t0 = time.time()
                    qs[name](spark, SF_DIR).collect()
                    an_runs[name].append(round(time.time() - t0, 3))
            for name, rs in an_runs.items():
                if rs:
                    queries[f"analytic_{name}"] = min(rs)
            extra["analytic_runs"] = an_runs
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)
        spark.stop()

    total = round(time.time() - t_all - extra.get("anchors_wall_sec", 0.0), 3)
    stat1 = _cpu_stat()
    d = [y - x for x, y in zip(stat0, stat1)]
    extra["host_steal_pct"] = round(100.0 * d[7] / max(1, sum(d)), 2)
    extra["host_loop_mops_end"] = _loop_rate()
    payload = {
        "metric": "index-build+serve+analytic wall clock",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": float(SF),
    }
    # full record (per-run arrays, stage timings) goes to a file; stdout
    # gets ONE COMPACT line as the very last output — the driver only
    # tail-captures stdout, and the r3 record was lost to a line that
    # outgrew that window
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH", "last_run_detail.json")
    os.makedirs(os.path.dirname(detail_path), exist_ok=True)
    with open(detail_path, "w") as f:
        json.dump({**payload, **extra}, f, indent=2, sort_keys=True)
    scalars = {k: v for k, v in extra.items()
               if not isinstance(v, (list, dict))}
    print(json.dumps({**payload, **scalars}, separators=(",", ":")))


if __name__ == "__main__":
    main()
