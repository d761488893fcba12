"""Executor-mode serve scaling: the SCALING_SERVE workloads submitted with
``spark-submit --py-files engine.zip`` against local-cluster[E,4,3072] at
N=2 vs 4N=8 executors (8 vs 32 CPUs), taskset-pinned — the north rule's
deployment shape applied to the QUERY path (the build-path twin is
tools/scaling_cluster.py -> BENCH/SCALING_EXECUTORS.md; the thread-mode
serve study is tools/scaling_serve.py -> BENCH/SCALING_SERVE.md).

Each leg is one spark-submit running `submit_job.py servebench`: warm
session, best-of-RUNS for a single 4-term BM25 query, the 12-query batch,
the 48-query throughput batch, and a no-op job-floor probe (same stage
shape as a query, no data, no kernel) so the fixed, cores-invariant slice
of each wall can be subtracted: efficiency is reported raw AND
floor-adjusted ((wall - floor) ratio), because the per-job scheduler +
Python-worker dispatch floor is a deployment constant, not work that
cores could scale.

The same pinned numpy-mix hardware ceiling as tools/scaling_serve.py
calibrates what THIS BOX can give memory-bound work at 8 vs 32 procs.

Usage: python tools/scaling_serve_cluster.py [index_dir] [n_pages]
Prints one JSON line; findings go to BENCH/SCALING_SERVE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaling import _host_healthy, _steal_jiffies  # noqa: E402
from scaling_cluster import CONF, EXEC_MEM_MB, _zip_engine  # noqa: E402
from scaling_serve import _ceiling  # noqa: E402

N_PAGES_DEFAULT = 1_000_000
RUNS = 3
# Two controlled comparisons, both at a 4x CPU ratio:
#   executor-count pair: 2x4 -> 8x4 (N -> 4N executors, the north rule's
#     literal shape — but on ONE box 8 JVMs at full width hit the same
#     multi-JVM + wide-burst pathology SCALING_EXECUTORS measured for the
#     build path);
#   cores pair: 2x1 -> 2x4 (JVM count HELD CONSTANT, cores x4) — isolates
#     core scaling from the JVM-count confound this sandbox cannot remove.
LEGS = (("2x1", 2, 1), ("2x4", 2, 4), ("8x4", 8, 4))


def _submit_servebench(execs: int, cores: int, zpath: str, idx: str,
                       cpu_range: str) -> dict:
    cmd = ["taskset", "-c", cpu_range, "spark-submit",
           "--master", f"local-cluster[{execs},{cores},{EXEC_MEM_MB}]",
           "--py-files", zpath]
    for k, v in CONF.items():
        cmd += ["--conf", f"{k}={v}"]
    cmd += [os.path.join(REPO, "tools", "submit_job.py"),
            "servebench", "--index-dir", idx, "--runs", str(RUNS)]
    s0, t0 = _steal_jiffies()
    wall0 = time.time()
    p = subprocess.run(cmd, capture_output=True, text=True, timeout=3600,
                       cwd=REPO)
    wall = time.time() - wall0
    s1, t1 = _steal_jiffies()
    lines = [ln for ln in p.stdout.splitlines() if ln.startswith("RESULT ")]
    if not lines:
        raise RuntimeError(f"servebench submit failed (rc={p.returncode}):\n"
                           f"{p.stderr[-3000:]}")
    out = json.loads(lines[-1][len("RESULT "):])
    out["submit_wall_sec"] = round(wall, 1)
    out["steal_pct"] = round(100.0 * (s1 - s0) / max(1, (t1 - t0)), 1)
    return out


def main() -> None:
    idx = sys.argv[1] if len(sys.argv) > 1 else ""
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else N_PAGES_DEFAULT
    if not idx or not os.path.exists(os.path.join(idx, "MANIFEST.json")):
        from searchengines_spark.corpus import generate_pages
        from searchengines_spark.index import build_index
        from searchengines_spark.session import get_spark

        idx = idx or f"/tmp/serve_scale_idx_{n_pages}"
        if not os.path.exists(os.path.join(idx, "MANIFEST.json")):
            spark = get_spark("serve-scale-build", cores=32,
                              shuffle_partitions=32)
            pages = generate_pages(spark, n_pages, seed=42,
                                   partitions=max(32, n_pages // 5000))
            build_index(spark, pages, idx, n_salts=32)
            spark.stop()

    tmp = tempfile.mkdtemp(prefix="ssrvclust_")
    zpath = _zip_engine(tmp)
    ok, mops0 = _host_healthy()
    res: dict = {"n_pages": n_pages, "index": idx, "mode": "local-cluster",
                 "canary_mops_start": mops0, "canary_healthy_start": ok,
                 "hw_ceiling_numpy_mix": _ceiling()}
    for tag, execs, cores in LEGS:
        cpus = execs * cores
        r = _submit_servebench(execs, cores, zpath, idx, f"0-{cpus - 1}")
        for key in ("single", "batch", "batch48", "noop_floor"):
            r[f"{key}_best"] = min(r[f"{key}_runs"])
        r["batch_qps"] = round(12 / r["batch_best"], 2)
        r["batch48_qps"] = round(48 / r["batch48_best"], 2)
        res[f"leg_{tag}"] = r

    def _pair(name: str, lo_tag: str, hi_tag: str) -> None:
        lo, hi = res[f"leg_{lo_tag}"], res[f"leg_{hi_tag}"]
        for key in ("single", "batch", "batch48"):
            sp = lo[f"{key}_best"] / hi[f"{key}_best"]
            res[f"{name}_{key}_efficiency"] = round(sp / 4, 3)
            # floor-adjusted: the no-op job floor is a per-job deployment
            # constant (scheduler + worker dispatch); subtract each leg's
            # OWN floor to see how the distributed work itself scaled
            adj_lo = max(1e-6, lo[f"{key}_best"] - lo["noop_floor_best"])
            adj_hi = max(1e-6, hi[f"{key}_best"] - hi["noop_floor_best"])
            res[f"{name}_{key}_eff_floor_adj"] = round(adj_lo / adj_hi / 4, 3)

    _pair("execs_2x4_to_8x4", "2x4", "8x4")   # N -> 4N executors
    _pair("cores_2x1_to_2x4", "2x1", "2x4")   # cores x4, JVMs fixed
    ceil = res["hw_ceiling_numpy_mix"]["efficiency"]
    if ceil:
        for k in [k for k in list(res) if k.endswith("_efficiency")
                  or k.endswith("_eff_floor_adj")]:
            res[k + "_normalized"] = round(res[k] / ceil, 3)
    ok, mops1 = _host_healthy()
    res["canary_mops_end"] = mops1
    res["canary_healthy_end"] = ok
    print(json.dumps(res))


if __name__ == "__main__":
    main()
