"""Serve-side two-parallelism scaling evidence (the sandbox proxy for the
north rule's N vs 4N executors, applied to the QUERY path — the build-side
study is tools/scaling.py → BENCH/BASELINE.md).

Protocol: build the 1M-page index ONCE (untimed, full box), then run the
SAME serve workload in taskset-pinned subprocesses at an 8-CPU and a
32-CPU budget:

- single BM25 bag-of-words top-k (the stripe-kernel query; 32 docid-range
  stripe tasks run as 4 waves at 8 CPUs, 1 wave at 32 — exactly how an
  8-core vs 32-core cluster would run it),
- the 12-query batch through the shared-scan path (bench.py's workload).

Each is warmed (one untimed query for session/JIT/codegen) then best-of-N.
A no-Spark hardware calibration (the bulk kernel's numpy op mix via
multiprocessing at both widths) gives the box's own 8→32 ceiling for
memory-bandwidth-bound work; engine efficiency should be read against it
(see tools/scaling.py's rationale — a real cluster brings 4× DRAM with
its 4× cores, the single box does not).

Usage: python tools/scaling_serve.py [index_dir] [n_pages]
Prints one JSON line; findings go to BENCH/SCALING_SERVE.md.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PAGES_DEFAULT = 1_000_000
BUDGETS = (8, 32)
RUNS = 3


def _numpy_mix(_: int) -> int:
    """The bulk kernel's op shape: gather + elementwise f64 + fancy += over
    ~100k-posting arrays (memory-bandwidth bound, like the serve kernel)."""
    import numpy as np

    rng = np.random.default_rng(0)
    d = rng.integers(0, 31250, 100_000).astype(np.int64)
    tf = rng.integers(1, 9, 100_000).astype(np.float64)
    norms = rng.integers(20, 300, 31250).astype(np.float64)
    denom = 1.2 * (0.25 + 0.75 * norms / 150.0)
    acc = np.zeros(31250)
    for _i in range(60):
        acc[d] += 1.5 * tf / (tf + denom[d])
    return int(acc[0])


def _ceiling() -> dict:
    """Affinity-pinned, matching the engine legs: the 8-proc pool must run
    on the SAME cpus 0-7 the 8-CPU engine leg is tasksetted to (same
    physical cores / cache domains), or the ceiling is measured under a
    different hardware budget than the thing it normalizes (the pattern
    tools/scaling.py::_calibrate uses)."""
    out = {}
    old = os.sched_getaffinity(0)
    for procs in BUDGETS:
        os.sched_setaffinity(0, set(range(procs)))  # children inherit
        try:
            with mp.Pool(procs) as pool:
                t0 = time.time()
                pool.map(_numpy_mix, range(procs * 4))
                dt = time.time() - t0
        finally:
            os.sched_setaffinity(0, old)
        out[str(procs)] = round(procs * 4 / dt, 2)  # tasks/sec
    out["efficiency"] = round((out["32"] / out["8"]) / 4, 3)
    return out


_WORKER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from searchengines_spark.session import get_spark
from searchengines_spark.corpus import VOCAB
from searchengines_spark.engine import Engine
from searchengines_spark.index import IndexReader

cpus = {cpus}
spark = get_spark("serve-scale", cores=cpus, shuffle_partitions=cpus)
eng = Engine(IndexReader(spark, {idx!r}))
eng.search("hobaba7 jibaba8", model="bm25", k=10).collect()  # warm-up

single = []
for _ in range({runs}):
    t0 = time.time()
    eng.search("cebaba1 dibaba2 fobaba3 gubaba4", model="bm25", k=100).collect()
    single.append(round(time.time() - t0, 3))

batch = {{f"b{{i}}": f"{{VOCAB[50 + 2 * i]}} {{VOCAB[51 + 2 * i]}}" for i in range(12)}}
bt = []
for _ in range({runs}):
    t0 = time.time()
    out = eng.search_batch(batch, model="bm25", k=100)
    bt.append(round(time.time() - t0, 3))

# throughput workload: 48 queries incl. the heavy Zipf-head set repeated
# with distinct qids (shared decode cache is per-stripe-task, so repeats
# still exercise scoring) — large enough that kernel work, not the fixed
# job floor, dominates the wall clock
big = {{}}
for i in range(40):
    big[f"m{{i}}"] = f"{{VOCAB[50 + i]}} {{VOCAB[90 + i]}}"
for i in range(8):
    big[f"h{{i}}"] = f"{{VOCAB[i]}} {{VOCAB[i + 1]}} {{VOCAB[i + 2]}}"
bt48 = []
for _ in range({runs}):
    t0 = time.time()
    out = eng.search_batch(big, model="bm25", k=100)
    bt48.append(round(time.time() - t0, 3))

print("RESULT " + json.dumps({{"single_runs": single, "batch_runs": bt,
                               "batch48_runs": bt48}}))
spark.stop()
"""


def main() -> None:
    from searchengines_spark.corpus import generate_pages
    from searchengines_spark.index import build_index
    from searchengines_spark.session import get_spark

    idx = sys.argv[1] if len(sys.argv) > 1 else ""
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else N_PAGES_DEFAULT
    if not idx or not os.path.exists(os.path.join(idx, "MANIFEST.json")):
        idx = idx or f"/tmp/serve_scale_idx_{n_pages}"
        if not os.path.exists(os.path.join(idx, "MANIFEST.json")):
            spark = get_spark("serve-scale-build", cores=32,
                              shuffle_partitions=32)
            pages = generate_pages(spark, n_pages, seed=42,
                                   partitions=max(32, n_pages // 5000))
            build_index(spark, pages, idx, n_salts=32)
            spark.stop()

    res: dict = {"n_pages": n_pages, "index": idx,
                 "hw_ceiling_numpy_mix": _ceiling()}
    for cpus in BUDGETS:
        cpu_list = f"0-{cpus - 1}"
        code = _WORKER.format(repo=REPO, cpus=cpus, idx=idx, runs=RUNS)
        p = subprocess.run(["taskset", "-c", cpu_list, sys.executable, "-c",
                            code], capture_output=True, text=True)
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("RESULT ")]
        if not line:
            print(p.stdout[-2000:], p.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"worker at {cpus} cpus failed")
        r = json.loads(line[-1][len("RESULT "):])
        r["single_best"] = min(r["single_runs"])
        r["batch_best"] = min(r["batch_runs"])
        r["batch_qps"] = round(12 / r["batch_best"], 2)
        r["batch48_best"] = min(r["batch48_runs"])
        r["batch48_qps"] = round(48 / r["batch48_best"], 2)
        res[f"cpus{cpus}"] = r
    s8, s32 = res["cpus8"], res["cpus32"]
    res["single_speedup"] = round(s8["single_best"] / s32["single_best"], 2)
    res["single_efficiency"] = round(res["single_speedup"] / 4, 3)
    res["batch_speedup"] = round(s8["batch_best"] / s32["batch_best"], 2)
    res["batch_efficiency"] = round(res["batch_speedup"] / 4, 3)
    res["batch48_speedup"] = round(s8["batch48_best"] / s32["batch48_best"], 2)
    res["batch48_efficiency"] = round(res["batch48_speedup"] / 4, 3)
    ceil = res["hw_ceiling_numpy_mix"]["efficiency"]
    if ceil:
        res["batch_efficiency_normalized"] = round(
            res["batch_efficiency"] / ceil, 3)
        res["batch48_efficiency_normalized"] = round(
            res["batch48_efficiency"] / ceil, 3)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
