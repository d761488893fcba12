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
    from searchengines_spark.analytic import py_delete_keys

    row = (spark.createDataFrame([(word,)], ["t"])
           .select(_delete_keys("t").alias("ks")).first())
    assert set(row["ks"]) == _pydels(word)
    assert row["ks"][0] == word  # the term itself is always a key
    # driver-side replica (the sidecar path's query keying) — same set
    assert set(py_delete_keys(word)) == _pydels(word)
    assert py_delete_keys(word)[0] == word


def test_spell_guards(tiny_index):
    eng = Engine(tiny_index)
    assert eng.suggest([]).count() == 0  # empty batch -> empty frame
    with pytest.raises(ValueError):  # delete depth is fixed at 2
        eng.suggest(["abc"], max_d=3)
    # pasted junk token guard: a 200-char term can never match any indexed
    # term (all <= SPELL_MAX_LEN, levenshtein >= length gap), so it yields
    # no rows WITHOUT expanding O(len^2) delete keys driver-side; a normal
    # term in the same batch still gets its suggestions
    rows = eng.suggest(["x" * 200, "cebbaa1"]).collect()
    assert all(r["q"] == "cebbaa1" for r in rows) and rows


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


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_suggest_serves_from_sidecar(tiny_index):
    """On a freshly built index, Engine.suggest reads the materialized
    spell_keys sidecar: the plan contains NO Generate (explode) node —
    the vocab-sized delete-key explode happened once at build time — and
    scans the sidecar with the batch's keys pushed down."""
    from searchengines_spark.index.spellkeys import read_spell_keys

    assert read_spell_keys(tiny_index.spark, tiny_index.index_dir) is not None
    df = Engine(tiny_index).suggest(["cebbaa1", "dibaba"])
    assert any("spell_keys" in f for f in df.inputFiles())
    assert "Generate" not in _plan(df)  # no vocab-sized explode per call
    assert df.count() > 0


def test_suggest_stale_fallback_and_compact_refresh(spark, tmp_path):
    """Append -> sidecar stale -> suggest falls back to the on-the-fly
    delete join (correct, vocab-exploding); compact -> sidecar refreshed
    -> pruned path again, suggestions identical."""
    from searchengines_spark.corpus import generate_pages
    from searchengines_spark.index import IndexReader, build_index
    from searchengines_spark.index.incremental import append_pages, compact
    from searchengines_spark.index.spellkeys import read_spell_keys

    pages = generate_pages(spark, 150, seed=21, partitions=3)
    extra = generate_pages(spark, 200, seed=21, partitions=3).subtract(pages)
    d = str(tmp_path / "idx")
    build_index(spark, pages, d, n_salts=4)
    assert read_spell_keys(spark, d) is not None

    append_pages(spark, d, extra)
    assert read_spell_keys(spark, d) is None  # term_stats moved on
    eng = Engine(IndexReader(spark, d))
    df = eng.suggest(["cebbaa1", "dibaba"])
    assert "Generate" in _plan(df)  # fallback explodes on the fly
    stale_rows = sorted(map(tuple, df.collect()))

    compact(spark, d, n_salts=4)
    assert read_spell_keys(spark, d) is not None
    eng2 = Engine(IndexReader(spark, d))
    df2 = eng2.suggest(["cebbaa1", "dibaba"])
    assert any("spell_keys" in f for f in df2.inputFiles())
    assert "Generate" not in _plan(df2)
    # same post-append vocabulary -> identical suggestions on either path
    assert sorted(map(tuple, df2.collect())) == stale_rows


def test_suggest_sidecar_survives_snapshot(tiny_index):
    """Time-travel readers keep the fast suggest path: the hard-linked
    snapshot tree shares inodes/sizes/mtimes and the sidecar's signature
    is path-relative, so it verifies fresh under the snapshot root."""
    from searchengines_spark.index import IndexReader
    from searchengines_spark.index.snapshots import list_snapshots
    from searchengines_spark.index.spellkeys import read_spell_keys

    v = int(list_snapshots(tiny_index.index_dir)[-1]["version"])
    snap_reader = IndexReader(tiny_index.spark, tiny_index.index_dir,
                              snapshot=v)
    assert read_spell_keys(snap_reader.spark,
                           snap_reader.index_dir) is not None
    df = Engine(snap_reader).suggest(["cebbaa1"])
    assert any("spell_keys" in f for f in df.inputFiles())
    assert "Generate" not in _plan(df)
    live = sorted(map(tuple, Engine(tiny_index).suggest(["cebbaa1"]).collect()))
    assert sorted(map(tuple, df.collect())) == live


def test_sidecar_invalidated_by_derivation_param_change(tiny_index, monkeypatch):
    """The sidecar signature pins SPELL_MAX_LEN/depth, not just the
    term_stats files: a release that changes the derivation params must
    see old sidecars as stale (fallback path) rather than silently serve
    a table missing the newly-eligible terms."""
    from searchengines_spark import analytic
    from searchengines_spark.index.spellkeys import read_spell_keys

    assert read_spell_keys(tiny_index.spark, tiny_index.index_dir) is not None
    monkeypatch.setattr(analytic, "SPELL_MAX_LEN", analytic.SPELL_MAX_LEN + 8)
    assert read_spell_keys(tiny_index.spark, tiny_index.index_dir) is None


def test_bulk_batch_drops_isin_pushdown_identically(tiny_index, monkeypatch):
    """Past SPELL_KEY_PUSH_MAX delete keys, spell_suggest_keys must stop
    pushing the IN() literal list (Catalyst plan blowup) and let the
    broadcast key join filter over one sidecar scan — suggestions
    identical either way."""
    from searchengines_spark import analytic

    qs = ["cebbaa1", "dibaba", "fobaba"]
    base_df = Engine(tiny_index).suggest(qs)
    assert "INSET" in _plan(base_df)  # small batch: literal pushdown on
    base = base_df.collect()
    monkeypatch.setattr(analytic, "SPELL_KEY_PUSH_MAX", 5)  # force fallback
    eng = Engine(tiny_index)
    if hasattr(tiny_index, "_spell_memo"):
        delattr(tiny_index, "_spell_memo")  # fresh sidecar read
    got = eng.suggest(qs)
    assert "INSET" not in _plan(got)  # fallback: no literal predicate
    assert got.collect() == base
