"""Golden-output regression — the reference's own test strategy (108 golden
.teIn files under OUTPUT_DIR, SURVEY.md §5) recreated for this engine: a
fixed query battery over the deterministic seed-42 corpus, compared line-
for-line (ranks AND scores) against a committed golden file.

Regenerate deliberately after an intended ranking change with:
    GOLDEN_REGEN=1 python -m pytest tests/test_golden.py -q
"""

import os

import pytest

from searchengines_spark.driver import run_batch

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "battery.teIn")

CONFIGS = [
    ("bm25", {"retrievalAlgorithm": "BM25", "BM25:k_1": 1.2, "BM25:b": 0.75,
              "trecEvalOutputLength": 10},
     {
         "b1": "haceba4 badiba5 bafoba4",
         "b2": "#AND( haceba4 badiba5 )",
         "b3": "#SUM( haceba4 #AND( badiba5 bafoba4 ) )",
         "b4": "#NEAR/3( cebaba1 dibaba2 )",
         "b5": "#WINDOW/5( cebaba1 dibaba2 )",
         "b6": "#SYN( haceba4 badiba5 )",
         "b7": "#OR( haceba4 badiba5 )",
         "b8": "haceba4.title badiba5.title",
         "b9": "the of and haceba4",  # stopwords drop, operator survives
     }),
    ("indri", {"retrievalAlgorithm": "Indri", "Indri:mu": 1000,
               "Indri:lambda": 0.4, "trecEvalOutputLength": 10},
     {
         "i1": "#AND( haceba4 badiba5 )",
         "i2": "#WAND( 0.6 haceba4 0.4 #AND( badiba5 bafoba4 ) )",
         "i3": "#WSUM( 0.7 haceba4 0.3 badiba5 )",
         "i4": "#OR( haceba4 badiba5 )",
     }),
    ("rankedboolean", {"retrievalAlgorithm": "RankedBoolean",
                       "trecEvalOutputLength": 10},
     {
         "r1": "#AND( haceba4 badiba5 )",
         "r2": "#OR( haceba4 badiba5 )",
     }),
    ("unrankedboolean", {"retrievalAlgorithm": "UnrankedBoolean",
                         "trecEvalOutputLength": 5},
     {"u1": "#AND( haceba4 badiba5 )"}),
    ("prf", {"retrievalAlgorithm": "Indri", "Indri:mu": 1000,
             "Indri:lambda": 0.4, "prf": "Indri", "prf:numDocs": 5,
             "prf:numTerms": 5, "prf:Indri:mu": 0.0,
             "prf:Indri:origWeight": 0.5, "trecEvalOutputLength": 10},
     {"p1": "haceba4 badiba5"}),
]


def _run(tiny_index):
    lines = []
    for name, params, queries in CONFIGS:
        lines.append(f"# {name}")
        lines.extend(run_batch(tiny_index, params, queries))
    return lines


def test_golden_battery(spark, tiny_index):
    got = _run(tiny_index)
    if os.environ.get("GOLDEN_REGEN"):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with open(GOLDEN, "w") as f:
            f.write("\n".join(got) + "\n")
        pytest.skip("golden regenerated")
    assert os.path.exists(GOLDEN), "run once with GOLDEN_REGEN=1 to create"
    want = open(GOLDEN).read().splitlines()
    assert got == want
