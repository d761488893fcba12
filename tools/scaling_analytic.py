"""Two-parallelism scaling evidence for the ANALYTICS layer (the
training-data-pipeline ops), the same protocol as tools/scaling.py for the
index build: run bench.py's analytic battery taskset-pinned to 8 CPUs
(local[8]) and 32 CPUs (local[32]) on the same sf0.1 input, report
per-query seconds at both plus per-query and battery-level scaling
efficiency, and append a section to BENCH/BASELINE.md.

Per-query efficiency = (t_8 / t_32) / 4 (1.0 = perfect). Driver-bounded
gate queries (tiny embeddings table, k-means training collects) are
expected near 1/4 = 0.25-ish raw speedup -> low efficiency; the
data-parallel dedup/text passes are the ones that must move.

Usage: python tools/scaling_analytic.py [lo] [hi]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scaling import _host_healthy, _steal_jiffies  # noqa: E402


def run_battery(cpus: int, cpu_range: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
               BENCH_PHASES="analytic",
               BENCH_ANALYTIC_RUNS=os.environ.get("BENCH_ANALYTIC_RUNS", "2"),
               BENCH_DEADLINE_SEC=os.environ.get("BENCH_DEADLINE_SEC", "3000"))
    s0, t0 = _steal_jiffies()
    p = subprocess.run(
        ["taskset", "-c", cpu_range, sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600, cwd=REPO,
    )
    s1, t1 = _steal_jiffies()
    jlines = [ln for ln in p.stdout.strip().splitlines() if ln.startswith("{")]
    if not jlines:
        sys.stderr.write(f"--- bench@{cpus} produced no JSON; stderr tail:\n"
                         + "\n".join(p.stderr.splitlines()[-25:]) + "\n")
        raise RuntimeError(f"bench run at {cpus} CPUs failed")
    out = json.loads(jlines[-1])
    out["steal_pct"] = round(100.0 * (s1 - s0) / max(1, (t1 - t0)), 1)
    return out


def main():
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 4 * lo

    ok, mops = _host_healthy()
    if not ok and os.environ.get("SCALING_FORCE", "") != "1":
        print(json.dumps({"aborted": "host degraded", "loop_mops": mops}))
        sys.exit(3)

    r_lo = run_battery(lo, f"0-{lo - 1}")
    r_hi = run_battery(hi, f"0-{hi - 1}")

    names = sorted(k for k in r_lo["queries"] if k.startswith("analytic_"))
    rows, tot_lo, tot_hi = [], 0.0, 0.0
    for n in names:
        a, b = r_lo["queries"][n], r_hi["queries"].get(n)
        if b is None:
            continue
        tot_lo += a
        tot_hi += b
        rows.append((n.replace("analytic_", ""), a, b,
                     round(a / b, 2), round(a / b / (hi / lo), 2)))

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    label = os.environ.get("SCALING_LABEL", os.path.basename(sf_dir.rstrip("/")))
    section = [
        "",
        f"## Analytics-layer scaling ({lo} -> {hi} CPUs, taskset-pinned, {label})",
        "",
        "Same protocol as the build study above (pinned process tree, "
        "best-of-N per query, cache cleared before every query); "
        f"whole-box steal {r_lo['steal_pct']}% / {r_hi['steal_pct']}% during "
        f"the narrow/wide runs; input {sf_dir}.",
        "",
        f"| query | {lo}-CPU s | {hi}-CPU s | speedup | efficiency |",
        "|---|---|---|---|---|",
    ]
    for n, a, b, sp, eff in rows:
        section.append(f"| {n} | {a} | {b} | {sp} | {eff} |")
    section += [
        f"| **battery total** | **{round(tot_lo, 1)}** | **{round(tot_hi, 1)}** "
        f"| **{round(tot_lo / tot_hi, 2)}** | "
        f"**{round(tot_lo / tot_hi / (hi / lo), 2)}** |",
        "",
    ]
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write("\n".join(section) + "\n")
    print(json.dumps({
        "lo": lo, "hi": hi, "battery_lo_sec": round(tot_lo, 1),
        "battery_hi_sec": round(tot_hi, 1),
        "battery_speedup": round(tot_lo / tot_hi, 2),
        "battery_efficiency": round(tot_lo / tot_hi / (hi / lo), 2),
        "steal_lo": r_lo["steal_pct"], "steal_hi": r_hi["steal_pct"],
        "loop_mops": mops,
    }))


if __name__ == "__main__":
    main()
