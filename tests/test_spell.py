"""Spell correction: SymSpell delete-neighborhood candidate join + exact
levenshtein verify. Gates: delete-key generation vs a pure-Python replica,
and Engine.suggest (index-vocabulary did-you-mean) vs a brute-force
levenshtein sweep of the whole vocab — proving the delete-join candidate
restriction loses no suggestion. The documents-table twin (analytic.q_spell)
is DuckDB-hash-gated by the driver (`spell`), whose oracle is also a brute
force."""

from collections import defaultdict

import pytest

from pyspark.sql import functions as F

from searchengines_spark.analytic import _delete_keys
from searchengines_spark.engine import Engine


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _pydels(w: str) -> set[str]:
    d1 = {w[:i] + w[i + 1:] for i in range(len(w))}
    d2 = {x[:j] + x[j + 1:] for x in d1 for j in range(len(x))}
    return {w} | d1 | d2


@pytest.mark.parametrize("word", ["a", "ab", "spark", "cebaba1", "xx1"])
def test_delete_keys_replica(spark, word):
    row = (spark.createDataFrame([(word,)], ["t"])
           .select(_delete_keys("t").alias("ks")).first())
    assert set(row["ks"]) == _pydels(word)
    assert row["ks"][0] == word  # the term itself is always a key


def test_spell_guards(tiny_index):
    eng = Engine(tiny_index)
    assert eng.suggest([]).count() == 0  # empty batch -> empty frame
    with pytest.raises(ValueError):  # delete depth is fixed at 2
        eng.suggest(["abc"], max_d=3)


def test_engine_suggest_matches_bruteforce(tiny_index):
    eng = Engine(tiny_index)
    queries = ["cebbaa1", "dibaba", "hnaeba2", "zzzzzzzz"]
    rows = eng.suggest(queries).collect()
    got = defaultdict(list)
    for r in sorted(rows, key=lambda r: (r["q"], r["rnk"])):
        got[r["q"]].append((r["suggestion"], r["dist"], r["ctf"]))

    vocab = [(r["term"], r["ctf"]) for r in
             tiny_index.term_stats_df().filter(F.col("field") == "body")
             .select("term", "ctf").collect()]
    for q in queries:
        cands = sorted(((_lev(q, t), -ctf, t) for t, ctf in vocab
                        if _lev(q, t) <= 2))
        want = [(t, d, -negc) for d, negc, t in cands[:3]]
        assert got.get(q, []) == want, q
    assert got["zzzzzzzz"] == []  # no candidate within distance 2
    assert got["cebbaa1"] and got["cebbaa1"][0][0] == "cebaba1"
