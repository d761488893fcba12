"""Two-parallelism scaling evidence (the sandbox proxy for the north rule's
N vs 4N executors): run the SAME build+serve job at local[8] and local[32]
on the SAME deterministic input, report throughput at both and the scaling
efficiency, write BENCH/BASELINE.md.

Usage: python tools/scaling.py [n_pages]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cpus: int, n_pages: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        BENCH_N_PAGES=str(n_pages),
        BENCH_PHASES="build,serve",
    )
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    line = [ln for ln in p.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    r8 = run(8, n_pages)
    r32 = run(32, n_pages)
    tp8, tp32 = r8["build_docs_per_sec"], r32["build_docs_per_sec"]
    eff = tp32 / (4.0 * tp8)
    s8 = {k: v for k, v in r8["queries"].items() if k.startswith("serve_")}
    s32 = {k: v for k, v in r32["queries"].items() if k.startswith("serve_")}

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    out = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(out, "w") as f:
        f.write(f"""# BENCH/BASELINE — two-parallelism scaling evidence

Same job (index build of {n_pages} deterministic synthetic pages + 5 serve
queries), same input, local[8] (N) vs local[32] (4N). Sandbox proxy for the
north rule's N->4N executor criterion.

| metric | local[8] | local[32] |
|---|---|---|
| index build docs/sec | {tp8:.1f} | {tp32:.1f} |
| index build wall sec | {r8['queries']['index_build']} | {r32['queries']['index_build']} |
| build postings/sec | {r8['build_postings_per_sec']:.0f} | {r32['build_postings_per_sec']:.0f} |
| serve p95 sec | {r8.get('serve_p95_sec')} | {r32.get('serve_p95_sec')} |
| serve per-query sec | {json.dumps(s8)} | {json.dumps(s32)} |

**Scaling efficiency (build throughput): {tp32:.1f} / (4 x {tp8:.1f}) = {eff:.3f}**
(target >= 0.8; >1 can occur when the fixed JVM/stage overhead amortizes)

Raw local[8]: `{json.dumps(r8)}`

Raw local[32]: `{json.dumps(r32)}`
""")
    print(json.dumps({"eff": eff, "tp8": tp8, "tp32": tp32, "out": out}))


if __name__ == "__main__":
    main()
