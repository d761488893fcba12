"""Indri #WAND candidate-set audit at the 1M-page stress scale.

The one headline serving path without a PLANS.md entry at stress scale is
the Indri structured-query planner path: its candidate set is the UNION of
the operand posting lists (full-outer fold — Indri scores absent docs with
the smoothing default, so any doc matching ANY leaf can reach the top k),
and the fold joins doc_lens_wide once for default scores. This script
measures, at 1,000,000 pages:

  - per-leaf df (posting-list length) for the bench indri_wand query and a
    deliberately hot variant (Zipf rank-1/2 terms);
  - the realized candidate-set size (rows of the folded frame) vs sum(df)
    (the upper bound) vs n_docs;
  - end-to-end latency at k=100;
  - the formatted physical plan of the hot variant.

Output: a ready-to-paste markdown section on stdout (redirect into
PLANS.md / BENCH notes).

Usage:
  python tools/stress_indri_plan.py [index_dir] [n_pages]

Reuses index_dir if a finished index is present (MANIFEST.json), else
builds one (~3 min for 1M pages on local[32]).
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

IDX = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress1m_idx"
N_PAGES = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BENCH_Q = "#WAND( 0.6 cebaba1 0.4 #AND( dibaba2 fobaba3 ) )"
HOT_Q = "#WAND( 0.5 bababa0 0.3 cebaba1 0.2 #AND( bababa0 cebaba1 ) )"


def fmt_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    from searchengines_spark.engine import Engine
    from searchengines_spark.index import IndexReader, build_index
    from searchengines_spark.session import get_spark

    spark = get_spark("stress_indri", cores=CPUS, shuffle_partitions=CPUS)
    if not os.path.exists(os.path.join(IDX, "MANIFEST.json")):
        from searchengines_spark.corpus import generate_pages

        t0 = time.time()
        pages = generate_pages(spark, N_PAGES, seed=42,
                               partitions=max(CPUS, N_PAGES // 5000))
        build_index(spark, pages, IDX, n_salts=32)
        print(f"<!-- built {N_PAGES} pages in {time.time() - t0:.1f}s -->")

    reader = IndexReader(spark, IDX)
    engine = Engine(reader)
    n_docs = reader.doc_count("body")

    print(f"## Indri #WAND at {n_docs:,} docs: candidate-set audit")
    print()
    print(f"Corpus: {n_docs:,} docs (deterministic seed-42 crawl, n_salts=32,")
    print(f"local[{CPUS}]). The planner path's candidate set is the UNION of")
    print("the leaf posting lists (full-outer fold; Indri default-scores")
    print("absent docs, so no doc outside that union can enter the top k).")
    print("Bounded by sum(df) over the leaves — NEVER n_docs.")
    print()

    for label, q in (("bench indri_wand", BENCH_Q), ("hot-terms variant", HOT_Q)):
        # leaf dfs
        import re

        terms = sorted(set(re.findall(r"[a-z]+\d", q)))
        stats = reader.term_stats([("body", t) for t in terms])
        dfs = {t: stats.get(("body", t), (0, 0))[0] for t in terms}
        sum_df = sum(dfs.values())
        # realized candidate size = rows of the planner's folded frame
        # (distinct docids across the leaf posting lists)
        t0 = time.time()
        from searchengines_spark.query.parser import QueryParser
        from searchengines_spark.query.planner import Planner
        from searchengines_spark.query.models import make_model

        m = make_model("indri")
        root = QueryParser(m.name).parse(q)
        scored = Planner(reader, m).plan(root)
        n_cand = scored.count()
        t_cand = time.time() - t0

        t0 = time.time()
        res = engine.search(q, model="indri", k=100)
        rows = res.collect()
        t_e2e = time.time() - t0

        print(f"### {label}: `{q}`")
        print()
        print("| leaf term | df (posting-list length) | df/n_docs |")
        print("|---|---|---|")
        for t in terms:
            print(f"| {t} | {dfs[t]:,} | {dfs[t] / max(n_docs, 1):.3f} |")
        print(f"| **sum(df) (candidate upper bound)** | **{sum_df:,}** | "
              f"**{sum_df / max(n_docs, 1):.3f}** |")
        print()
        print(f"- realized candidate rows (full-outer fold output): "
              f"{n_cand:,} ({n_cand / max(n_docs, 1):.1%} of corpus; "
              f"overlap removed vs sum(df) {sum_df:,})")
        print(f"- candidate-count probe wall: {t_cand:.2f}s; "
              f"end-to-end k=100 search: {t_e2e:.2f}s, {len(rows)} rows")
        print()
        if label == "hot-terms variant":
            plan = fmt_plan(res)
            head = plan.split("\n\n")[0]
            print("```")
            print(head)
            print("```")
            print()


if __name__ == "__main__":
    main()
