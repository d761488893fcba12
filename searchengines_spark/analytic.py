"""Analytic (driver-checkable) query layer over the test tables.

Every function here is the Spark half of a (Spark, DuckDB-SQL) pair wired in
``__spark_entry__.py`` — the driver runs both at sf=0.01 and compares
row-count + schema + order-insensitive value hashes. So each function:

- uses SIMPLE tokenization (split on ' ', matching DuckDB string_split);
- uses built-in pyspark.sql.functions (JVM-side, codegen) — no row UDFs;
  the single exception is the 64-permutation MinHash kernel, an
  Arrow-batched pandas_udf whose integer math is bit-identical to the SQL
  oracle (see _minhash64_arr for why the pure-Catalyst forms lose);
- aliases every computed column to the exact name the SQL uses;
- rounds floating-point outputs (ROUND_DP) so both engines hash identically;
- breaks ties deterministically (doc_id asc) before any LIMIT.

Search ops implement the reference formulas (BM25 QrySopScore.java:78-90,
Indri 64-76, ranked-boolean AND=min/OR=max QrySopAnd/Or) in SIMPLE mode.
The dedup / similarity / text-quality ops are the training-data-pipeline
extensions; portable hashing is md5-prefix -> uint32 so Spark and DuckDB
agree bit-for-bit.
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROUND_DP = 6
# fixed query-term sets (chosen from the synthetic docs vocabulary: 'dup' is
# rare -> positive idf; the rest are common)
Q_BM25 = ["dup", "spark", "query"]
Q_BOOL = ["spark", "query", "table"]
Q_PAIR = ("spark", "query")
BM25_K1, BM25_B = 1.2, 0.75
INDRI_MU, INDRI_LAM = 300.0, 0.4
HASH_P = 4294967311  # prime > 2^32
MINHASH_AB = [(1000003, 12345), (999983, 54321), (906061, 7), (777767, 999)]
STOP_EN = ["the", "a", "of", "and", "to", "in", "is", "it"]

# LSH banding scheme for the scale path: 64 permutations cut into b=16 bands
# of r=4 rows. Collision threshold ~ (1/b)^(1/r) = 0.5, matching the
# verification filter jaccard >= 0.5. Coefficients from a fixed LCG so the
# DuckDB oracle regenerates the identical scheme.
LSH_BANDS, LSH_ROWS = 16, 4

# Sign-LSH (random-hyperplane) scheme for embedding-cosine near-dup: 128
# deterministic hyperplanes (coefficients hashed from (plane, dim), so the
# DuckDB oracle regenerates the identical planes) cut into 8 bands of 16
# sign bits. A pair collides when any band matches exactly; the exact
# cosine is then computed ONLY for colliding pairs.
#
# Band width is a SCALE parameter, not a tuning nicety: with b-bit bands the
# expected candidate load grows as O(n^2 / 2^b) for the random (non-dup)
# mass. The original 8-bit bands (256 buckets) were fine at the 2k-vector
# gate fixture but degenerate at 64k vectors (measured: 64M candidate pairs,
# a 30+ GB verify shuffle that filled local disk). 16-bit bands (65,536
# buckets) keep random collisions ~O(n) well past 10^6 vectors per
# partition-group while retaining ~80% recall at cosine 0.95 and ~99.5% at
# 0.99 (p_bit = 1 - theta/pi per Charikar 2002).
SLSH_PLANES, SLSH_BAND_BITS = 128, 16
EMB_COS_T = 0.35


def _gen_ab(n: int, seed: int = 1234567) -> list[tuple[int, int]]:
    x, out = seed, []
    for _ in range(n):
        x = (x * 1103515245 + 12345) % (1 << 31)
        a = (x % 999983) | 1
        x = (x * 1103515245 + 12345) % (1 << 31)
        out.append((a, x % 1000003))
    return out


MINHASH_AB64 = _gen_ab(LSH_BANDS * LSH_ROWS)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, pos [1-based], term) — mirrors DuckDB unnest+generate_subscripts."""
    return (
        docs.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "term"))
        .filter(F.col("term") != "")
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "term")
    )


def _doclens(tok: DataFrame) -> DataFrame:
    return tok.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("len"))


def md5hash32(col) -> F.Column:
    """Portable uint32 hash: int(md5(s)[:8], 16). DuckDB equivalent:
    CAST(('0x' || substr(md5(s),1,8)) AS UBIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


_LIVE_CACHES: list[DataFrame] = []


def _track(df: DataFrame) -> DataFrame:
    """cache() + register so release_caches() can free it. Every cached
    intermediate in this module goes through here — without a registry the
    caches outlive their query and accumulate in executor storage for the
    session's lifetime (at the 100 TB shape, MEMORY_AND_DISK blocks from
    dozens of queries evict each other and spill)."""
    df = df.cache()
    _LIVE_CACHES.append(df)
    return df


def release_caches() -> None:
    """Unpersist every intermediate cached by this module's queries. Call
    between actions (the __spark_entry__ wrappers release the previous
    query's caches when the next query is built; harnesses may also call
    it directly). A released frame simply recomputes if re-collected."""
    while _LIVE_CACHES:
        _LIVE_CACHES.pop().unpersist()


def _fill(df: DataFrame) -> DataFrame:
    """cache() + eager materialize. Spark's cache has no cross-leg compute
    lock: when one action references a frame from k plan legs (e.g. the
    LSH candidate self-join + the candidate-restricted verify), the legs
    race an unpopulated cache and EACH recomputes the full upstream
    lineage — measured ~5x the shingle stage on the scaled dedup ops. One
    small count() turns every leg into a cache read."""
    df = _track(df)
    df.count()
    return df


# --------------------------------------------------------------------- stats
def q_term_stats(spark, sf_dir):
    tok = tokens(load(spark, sf_dir, "documents"))
    return tok.groupBy("term").agg(
        F.countDistinct("doc_id").cast("long").alias("df"),
        F.count(F.lit(1)).cast("long").alias("ctf"),
    )


def q_doc_lens(spark, sf_dir):
    return _doclens(tokens(load(spark, sf_dir, "documents")))


def q_corpus_stats(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    dl = _doclens(tokens(docs))
    n = docs.count()
    return dl.agg(
        F.lit(n).cast("long").alias("n_docs"),
        F.sum("len").cast("long").alias("sum_len"),
        F.round(F.sum("len") / F.lit(n), ROUND_DP).alias("avg_len"),
    )


# ---------------------------------------------------------------- retrieval
def _tf(tok: DataFrame, terms: list[str]) -> DataFrame:
    return (
        tok.filter(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


def _per_doc_qtf(docs: DataFrame, terms: list[str]) -> DataFrame:
    """ONE tokenize pass -> one narrow row per doc:
    (doc_id, len, tf_0..tf_{n-1}) for the query terms. The scale shape for
    every bag-of-words retrieval twin below: a single shuffle (groupBy
    doc_id) with map-side partial aggregation; the query-term tfs fold as
    pivoted conditional sums instead of one join per term, and doclen
    comes out of the same pass instead of a second tokenize of the corpus
    (at 10^12 docs the tokenize IS the cost — running it once per derived
    statistic is the difference between flat and linear scaling)."""
    tok = tokens(docs)
    aggs = [F.count(F.lit(1)).cast("long").alias("len")]
    aggs += [
        F.sum(F.when(F.col("term") == t, 1).otherwise(0)).cast("long").alias(f"tf_{i}")
        for i, t in enumerate(terms)
    ]
    return tok.groupBy("doc_id").agg(*aggs)


def q_bm25_topk(spark, sf_dir):
    """#SUM of BM25 term scores (QrySopScore.java:78-90, QrySopSum.java:59-80),
    SIMPLE mode, top-20 by (score desc, doc_id asc). One tokenize pass,
    one shuffle: per-doc pivoted tfs via _per_doc_qtf, corpus stats (avg
    doclen, per-term df) as one tiny agg over the cached narrow frame."""
    docs = load(spark, sf_dir, "documents")
    n_docs = docs.count()
    pdq = _fill(_per_doc_qtf(docs, Q_BM25))
    stats = pdq.agg(
        F.avg("len"),
        *[F.sum((F.col(f"tf_{i}") > 0).cast("long"))
          for i in range(len(Q_BM25))]).collect()[0]
    avg, dfs = float(stats[0]), [float(x) for x in stats[1:]]
    parts = []
    for i in range(len(Q_BM25)):
        idf = max(0.0, math.log((n_docs - dfs[i] + 0.5) / (dfs[i] + 0.5)))
        tf = F.col(f"tf_{i}").cast("double")
        parts.append(
            F.lit(idf) * tf
            / (tf + F.lit(BM25_K1) * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("len") / F.lit(avg))))
    matched = reduce(lambda a, b: a | b,
                     [F.col(f"tf_{i}") > 0 for i in range(len(Q_BM25))])
    scored = pdq.filter(matched).select(
        "doc_id", F.round(reduce(lambda a, b: a + b, parts), ROUND_DP).alias("score"))
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(20)


def q_indri_topk(spark, sf_dir):
    """Indri #SUM with two-state smoothing incl. default scores for docs
    missing a term (QrySopScore.java:64-76,13-26): candidates = docs matching
    >= 1 term (matchMin)."""
    docs = load(spark, sf_dir, "documents")
    pdq = _fill(_per_doc_qtf(docs, Q_BM25))
    tot = pdq.agg(F.sum("len"),
                  *[F.sum(f"tf_{i}") for i in range(len(Q_BM25))]).collect()[0]
    sum_len, ctfs = float(tot[0]), [int(x) for x in tot[1:]]
    parts = []
    for i in range(len(Q_BM25)):
        pqc = (ctfs[i] if ctfs[i] != 0 else 0.5) / sum_len
        tcol = F.col(f"tf_{i}").cast("double")
        parts.append(
            F.lit(1.0 - INDRI_LAM) * (tcol + F.lit(INDRI_MU * pqc)) / (F.col("len") + F.lit(INDRI_MU))
            + F.lit(INDRI_LAM * pqc)
        )
    matched = reduce(lambda a, b: a | b,
                     [F.col(f"tf_{i}") > 0 for i in range(len(Q_BM25))])
    score = F.round(reduce(lambda a, b: a + b, parts), ROUND_DP).alias("score")
    return (pdq.filter(matched).select("doc_id", score)
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(20))


def q_and_ranked(spark, sf_dir):
    """RankedBoolean #AND = min tf over all terms, match-ALL
    (QrySopAnd.java:146-169)."""
    tf = _tf(tokens(load(spark, sf_dir, "documents")), Q_BOOL)
    agg = tf.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("nt"), F.min("tf").cast("long").alias("score")
    )
    return agg.filter(F.col("nt") == len(Q_BOOL)).select("doc_id", "score")


def q_or_ranked(spark, sf_dir):
    """RankedBoolean #OR = max tf over matching terms (QrySopOr.java:81-151)."""
    tf = _tf(tokens(load(spark, sf_dir, "documents")), ["dup", "spark"])
    return tf.groupBy("doc_id").agg(F.max("tf").cast("long").alias("score"))


def q_syn_tf(spark, sf_dir):
    """#SYN union: per-doc tf = sum of member tfs (QryIopSyn.java:17-71)."""
    tf = _tf(tokens(load(spark, sf_dir, "documents")), list(Q_PAIR))
    return tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("tf"))


def q_near_pairs(spark, sf_dir):
    """Ordered proximity pair count: #NEAR/3-style (non-consuming variant:
    every (p1,p2) with 0 < p2-p1 <= 3; the consuming pointer semantics of
    QryIopNear.java:60-110 are covered by the pytest oracle)."""
    tok = tokens(load(spark, sf_dir, "documents"))
    a = tok.filter(F.col("term") == Q_PAIR[0]).select("doc_id", F.col("pos").alias("p1"))
    b = tok.filter(F.col("term") == Q_PAIR[1]).select("doc_id", F.col("pos").alias("p2"))
    return (
        a.join(b, "doc_id")
        .filter((F.col("p2") > F.col("p1")) & (F.col("p2") - F.col("p1") <= 3))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )


def q_window_pairs(spark, sf_dir):
    """Unordered window pair count: |p1-p2| < 4 (#WINDOW/4-style,
    QryIopWindow.java:159-166 non-consuming variant)."""
    tok = tokens(load(spark, sf_dir, "documents"))
    a = tok.filter(F.col("term") == Q_PAIR[0]).select("doc_id", F.col("pos").alias("p1"))
    b = tok.filter(F.col("term") == Q_PAIR[1]).select("doc_id", F.col("pos").alias("p2"))
    return (
        a.join(b, "doc_id")
        .filter(F.abs(F.col("p1") - F.col("p2")) < 4)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )


SNIP_TERMS = ("spark", "query", "hash")
SNIP_W = 12


def q_snippet(spark, sf_dir):
    """Best-window snippet extraction (search-result passage selection):
    for each doc containing any query term, the SNIP_W-token window that
    covers the most DISTINCT query terms; tie -> leftmost. Canonical
    windows start at a query-term occurrence, so the candidate starts are
    the match positions themselves — per-doc work is O(matches^2) and
    doc-local, never O(doclen). Shape: one self-equi-join of the
    query-term-filtered token stream on doc_id (tiny after the filter),
    one windowed argmax per doc, one join back to the text for the slice.
    A serving deployment runs this over the k-bounded result set per
    query (top-k urls broadcast against the forward text); the gate
    version runs corpus-wide so the output is deterministic."""
    docs = load(spark, sf_dir, "documents")
    tok = tokens(docs).filter(F.col("term").isin(*SNIP_TERMS))
    a = tok.select("doc_id", F.col("pos").alias("start"))
    b = tok.select("doc_id", F.col("pos").alias("mpos"), "term")
    from pyspark.sql import Window

    cand = (
        a.join(b, "doc_id")
        .filter((F.col("mpos") >= F.col("start"))
                & (F.col("mpos") <= F.col("start") + (SNIP_W - 1)))
        .groupBy("doc_id", "start")
        .agg(F.countDistinct("term").cast("long").alias("n_terms")))
    w = Window.partitionBy("doc_id").orderBy(F.desc("n_terms"), F.asc("start"))
    best = (cand.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1).drop("rn"))
    return (
        best.join(docs.select("doc_id", "text"), "doc_id")
        .select("doc_id", F.col("start").cast("long").alias("start"),
                "n_terms",
                F.array_join(
                    F.slice(F.split("text", " "), F.col("start"),
                            F.lit(SNIP_W)), " ").alias("snippet")))


SPELL_QUERIES = ("sprak", "qury", "tabel")  # misspelled corpus terms
SPELL_MAX_D = 2
SPELL_TOP = 3
# delete-neighborhood size is quadratic in token length; web crawls carry
# 100+-char junk tokens (base64, urls) nobody spell-corrects. Cap the
# suggestion vocabulary (mirrored in the DuckDB oracle).
SPELL_MAX_LEN = 24
SPELL_KEY_PUSH_MAX = 16384  # max IN() literals pushed into the sidecar scan


def _delete_keys(col: str):
    """array<string> of the term plus every 1- and 2-char-deletion variant
    (the SymSpell delete neighborhood, depth 2) — pure Catalyst, no UDF."""
    d1 = (f"transform(sequence(1, length({col})), "
          f"i -> concat(substring({col}, 1, i-1), substring({col}, i+1)))")
    d2 = (f"flatten(transform({d1}, s -> transform(sequence(1, length(s)), "
          f"j -> concat(substring(s, 1, j-1), substring(s, j+1)))))")
    return F.expr(f"array_distinct(concat(array({col}), {d1}, {d2}))")


def py_delete_keys(w: str) -> list[str]:
    """Driver-side replica of _delete_keys: the term plus its depth-<=2
    delete neighborhood (same SET as the Catalyst expression — gated by
    tests/test_spell.py). Used to key a query batch without a Spark job:
    query-side keys are batch-bounded (~16/term), never vocab-bounded."""
    d1 = [w[:i] + w[i + 1:] for i in range(len(w))]
    d2 = [s[:j] + s[j + 1:] for s in d1 for j in range(len(s))]
    out, seen = [], set()
    for k in [w] + d1 + d2:
        if k not in seen:
            seen.add(k)
            out.append(k)
    return out


def _rank_suggestions(cand: DataFrame, max_d: int, top: int) -> DataFrame:
    """Shared verify+rank tail: exact levenshtein on the candidate-sized
    set, then top-`top` per query by (distance asc, ctf desc, term asc)."""
    from pyspark.sql import Window

    cand = (cand.select("q", "term", "ctf").distinct()
            .withColumn("dist", F.levenshtein("q", "term").cast("long"))
            .filter(F.col("dist") <= max_d))
    w = Window.partitionBy("q").orderBy(
        F.asc("dist"), F.desc("ctf"), F.asc("term"))
    return (cand.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= top)
            .select("q", F.col("term").alias("suggestion"), "dist", "ctf",
                    F.col("rn").cast("long").alias("rnk")))


def spell_suggest_keys(vkeys: DataFrame, queries: list[str],
                       max_d: int = SPELL_MAX_D,
                       top: int = SPELL_TOP) -> DataFrame:
    """spell_suggest against a PRE-EXPLODED (k, term, ctf) delete-key table
    — the index sidecar path (index/spellkeys.py). Query keys are computed
    driver-side and pushed into the vkeys scan as an IN() predicate, so the
    parquet read is row-group-pruned to the batch's handful of keys (the
    sidecar is sorted on k): a point read per suggestion, no vocab-sized
    explode or scan anywhere in the plan."""
    if max_d > 2:
        raise ValueError("spell_suggest supports max_d <= 2 "
                         "(SymSpell delete depth is fixed at 2)")
    spark = vkeys.sparkSession
    # length guard BEFORE the driver-side key expansion: py_delete_keys is
    # O(len^2) keys per term, so a pasted 200-char junk token would emit
    # ~40k IN() literals. Correctness-neutral: sidecar terms are all
    # <= SPELL_MAX_LEN and levenshtein >= |len(q)-len(t)|, so a query term
    # longer than SPELL_MAX_LEN+max_d can never match within max_d.
    queries = [q for q in queries if len(q) <= SPELL_MAX_LEN + max_d]
    if not queries:
        return spark.createDataFrame(
            [], "q string, suggestion string, dist long, ctf long, rnk long")
    qpairs = [(q, k) for q in queries for k in py_delete_keys(q)]
    qdf = spark.createDataFrame(qpairs, "q string, k string")
    keys = sorted({k for _, k in qpairs})
    # the IN() literal list is what turns the sorted sidecar read into a
    # row-group-pruned point read — but a BULK batch (hundreds of
    # near-max-length terms emit ~350 keys each) would push 10^5 literals
    # into one Catalyst predicate. Past the cap, drop the pushdown and
    # let the broadcast key join do the filtering over one sidecar scan
    # (the same plan shape the non-sidecar fallback runs).
    cand = vkeys
    if len(keys) <= SPELL_KEY_PUSH_MAX:
        cand = cand.filter(F.col("k").isin(keys))
    cand = cand.join(F.broadcast(qdf), "k")
    return _rank_suggestions(cand, max_d, top)


def spell_suggest(vocab: DataFrame, queries: list[str],
                  max_d: int = SPELL_MAX_D, top: int = SPELL_TOP) -> DataFrame:
    """Spell correction against a (term, ctf) vocabulary, SymSpell shape:
    candidate generation is an EQUI-JOIN on shared delete-neighborhood keys
    (every term within edit distance d shares >= 1 depth-d delete with the
    query — the SymSpell property), then an exact levenshtein verify on the
    candidate-sized set, then top-`top` per query by (distance asc,
    frequency desc, term asc). The scale win vs a brute force: no
    query-x-vocab cross join — the delete table is vocab-bounded (~16
    keys/term), built once and reusable across query batches; candidates
    per query are the handful sharing a key. Hot short keys are
    vocab-bounded, never corpus-bounded (standard SymSpell prefix
    truncation applies at a 10^9 vocab; documented, not needed here).
    Returns (q, suggestion, dist, ctf, rnk)."""
    if max_d > 2:
        # the delete neighborhood is generated at depth 2; a larger max_d
        # would silently miss candidates the brute force finds
        raise ValueError("spell_suggest supports max_d <= 2 "
                         "(SymSpell delete depth is fixed at 2)")
    spark = vocab.sparkSession
    if not queries:
        return spark.createDataFrame(
            [], "q string, suggestion string, dist long, ctf long, rnk long")
    vkeys = vocab.filter(F.length("term") <= SPELL_MAX_LEN).select(
        "term", "ctf", F.explode(_delete_keys("term")).alias("k"))
    qdf = spark.createDataFrame([(q,) for q in queries], ["q"])
    qkeys = qdf.select("q", F.explode(_delete_keys("q")).alias("k"))
    # broadcast the QUERY-side keys (bounded by the query batch, ~16
    # keys/term), never the vocab delete table (10^9-vocab x 16 at scale)
    cand = F.broadcast(qkeys).join(vkeys, "k")
    return _rank_suggestions(cand, max_d, top)


def q_spell(spark, sf_dir):
    """Query spell correction over the documents-table vocabulary (see
    spell_suggest; the DuckDB oracle brute-forces levenshtein over the
    whole vocab — candidate-set equivalence IS the gate)."""
    docs = load(spark, sf_dir, "documents")
    vocab = tokens(docs).groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("ctf"))
    return spell_suggest(vocab, list(SPELL_QUERIES))


# ----------------------------------------------------------- dedup / simhash
def _shingles(docs: DataFrame) -> DataFrame:
    """Distinct 3-word shingles per doc, built doc-locally from the token
    array (no per-doc window sort, no token explode — the shuffle-free
    twin of the oracle's window-lead formulation; adjacent-triple values
    are identical either way)."""
    toks = docs.select(
        "doc_id", F.filter(F.split("text", " "), lambda x: x != "").alias("arr"))
    sh = toks.select(
        "doc_id",
        F.explode(F.when(
            F.size("arr") >= 3,
            F.expr("transform(sequence(0, size(arr) - 3), "
                   "j -> concat_ws(' ', arr[j], arr[j+1], arr[j+2]))"),
        ).otherwise(F.array().cast("array<string>"))).alias("shingle"),
    )
    return sh.distinct()


def q_dedup_exact(spark, sf_dir):
    """Exact dedup: md5(text) group sizes + canonical (min) doc_id."""
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy(F.md5("text").alias("h")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("doc_id").cast("long").alias("keep_id"),
    )


def q_minhash(spark, sf_dir):
    """MinHash signatures (4 permutations) over distinct 3-shingles."""
    sh = _shingles(load(spark, sf_dir, "documents")).withColumn("h", md5hash32(F.col("shingle")))
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(HASH_P)).alias(f"mh{i}")
        for i, (a, b) in enumerate(MINHASH_AB)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def _jaccard_for_pairs(sh: DataFrame, cand: DataFrame) -> DataFrame:
    """Jaccard computed ONLY for the given candidate (a_id, b_id) pairs —
    the whole point of banding. Each pair is expanded by a's shingles (O(doc
    size) per candidate), intersected against b's via a (b_id, shingle)
    join; no shingle self-join over the full corpus ever happens."""
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        cand.join(sh.select(F.col("doc_id").alias("a_id"), "shingle"), "a_id")
        .join(sh.select(F.col("doc_id").alias("b_id"), "shingle"), ["b_id", "shingle"])
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("a_id"), F.col("sz").alias("sa")), "a_id")
        .join(sizes.select(F.col("doc_id").alias("b_id"), F.col("sz").alias("sb")), "b_id")
        .select(
            "a_id", "b_id",
            F.round(F.col("i") / (F.col("sa") + F.col("sb") - F.col("i")), ROUND_DP).alias("jaccard"),
        )
    )


def q_lsh_dup_pairs(spark, sf_dir):
    """LSH banding: candidate pairs sharing band (mh0, mh1), verified with
    true 3-shingle Jaccard >= 0.5 computed only on the candidates."""
    sh = _fill(_shingles(load(spark, sf_dir, "documents")))
    mh = _fill(q_minhash(spark, sf_dir))
    a = mh.select(F.col("doc_id").alias("a_id"), "mh0", "mh1")
    b = mh.select(F.col("doc_id").alias("b_id"), "mh0", "mh1")
    cand = a.join(b, ["mh0", "mh1"]).filter(F.col("a_id") < F.col("b_id")).select("a_id", "b_id")
    return _jaccard_for_pairs(sh, cand).filter(F.col("jaccard") >= 0.5)


def _mh64_kernel(hs):
    """numpy kernel: per doc, min over its shingle hashes of the 64 affine
    permutations (a*h + b) mod P. int64-exact: a < 2^20 (gen_ab), h < 2^32
    -> a*h + b < 2^52. Per-row vectorized (64, n) broadcast; the row loop
    is bounded by the Arrow batch size and keeps peak memory at one doc's
    (64, n) block instead of a whole batch's."""
    import numpy as np
    import pandas as pd

    A = np.array([a for a, _ in MINHASH_AB64], dtype=np.int64).reshape(-1, 1)
    B = np.array([b for _, b in MINHASH_AB64], dtype=np.int64).reshape(-1, 1)
    out = []
    for h in hs:
        hv = np.asarray(h, dtype=np.int64)
        out.append(((A * hv + B) % HASH_P).min(axis=1))
    return pd.Series(out)


def _minhash64_arr(sh: DataFrame) -> DataFrame:
    """(doc_id, mh: array<long>[64]): 64-permutation MinHash signature.

    Shape note — this supersedes two measured earlier forms: a 64-column
    ``agg(min, ...)`` stalls ~12s in janino codegen per fresh session, and
    the long (doc_id, i) form (broadcast 64-row coefficient join + one
    groupBy) compiles instantly but shuffles and hash-aggregates 64x the
    shingle count (~93M tiny rows at sf0.1 — the dominant cost of every
    scaled dedup query). Here the distinct-shingle hashes shuffle ONCE
    (collect_list per doc — bounded by doc length, the same per-doc payload
    shape the documents table itself carries) and the 64 permutations run
    in one Arrow-batched numpy kernel with zero additional shuffle. Values
    are bit-identical to both earlier forms (same integer math), so the
    DuckDB oracle is unchanged. min() is order-invariant, so the
    nondeterministic collect_list order is immaterial."""
    from pyspark.sql.functions import pandas_udf

    udf = pandas_udf(_mh64_kernel, "array<long>")
    per_doc = (
        sh.withColumn("h", md5hash32(F.col("shingle")))
        .groupBy("doc_id")
        .agg(F.collect_list("h").alias("hs"))
    )
    return per_doc.select("doc_id", udf("hs").alias("mh"))


def _minhash64(sh: DataFrame) -> DataFrame:
    """(doc_id, m0..m63): wide MinHash signature (oracle-facing schema)."""
    return _minhash64_arr(sh).select(
        "doc_id", *[F.col("mh")[i].alias(f"m{i}") for i in range(64)]
    )


def q_minhash64(spark, sf_dir):
    return _minhash64(_shingles(load(spark, sf_dir, "documents")))


def band_hash_arr(col: str = "mh"):
    """array<int>[LSH_BANDS] of band-bucket hashes off a 64-long signature
    array: band hash = md5 of the band's LSH_ROWS signature values
    comma-joined in permutation order (string- and hash-identical to
    concat_ws over the wide m{i} columns). Shared by the batch LSH path and
    the streaming near-dup store so their buckets collide identically."""
    return F.array(*[
        md5hash32(F.concat_ws(",", *[
            F.col(col)[band * LSH_ROWS + r].cast("string")
            for r in range(LSH_ROWS)
        ]))
        for band in range(LSH_BANDS)
    ])


def _lsh64_sh_cand(spark, sf_dir) -> tuple[DataFrame, DataFrame]:
    return _lsh64_sh_cand_df(load(spark, sf_dir, "documents"))


def _lsh64_sh_cand_df(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Shared scale-path LSH stage: (cached shingles, candidate pairs from
    the 16x4 band-bucket join). ``sh`` is cached and ``long`` cache-filled
    (one count) because the downstream plan references sh from 3 legs and
    long from 2 — see _fill."""
    sh = _track(_shingles(docs))
    band_arr = band_hash_arr()
    long = _fill(
        _minhash64_arr(sh).select(
            "doc_id", F.posexplode(band_arr).alias("band", "bh")))
    cand = (
        long.select(F.col("doc_id").alias("a_id"), "band", "bh")
        .join(long.select(F.col("doc_id").alias("b_id"), "band", "bh"), ["band", "bh"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    return sh, cand


def q_lsh_dup_pairs_scaled(spark, sf_dir):
    """Production-parameter LSH dedup: 64 MinHash perms in 16 bands x 4 rows
    (collision threshold ~0.5), band-bucket join for candidates, Jaccard
    verification restricted to candidates. This is the 100 TB shape: one
    groupBy for signatures, one equi-join on (band, bandhash), one
    candidate-sized verify join — no all-pairs stage anywhere."""
    sh, cand = _lsh64_sh_cand(spark, sf_dir)
    return _jaccard_for_pairs(sh, cand).filter(F.col("jaccard") >= 0.5)


def q_jaccard_pairs(spark, sf_dir):
    """All-pairs 3-shingle Jaccard (intersection self-join)."""
    sh = _fill(_shingles(load(spark, sf_dir, "documents")))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        sh.select(F.col("doc_id").alias("a_id"), "shingle")
        .join(sh.select(F.col("doc_id").alias("b_id"), "shingle"), "shingle")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("a_id"), F.col("sz").alias("sa")), "a_id")
        .join(sizes.select(F.col("doc_id").alias("b_id"), F.col("sz").alias("sb")), "b_id")
        .select(
            "a_id", "b_id",
            F.round(F.col("i") / (F.col("sa") + F.col("sb") - F.col("i")), ROUND_DP).alias("jaccard"),
        )
    )


def q_jaccard_topk(spark, sf_dir):
    """Labeled EXACT baseline (all-pairs) — correctness yardstick only; the
    scale path is q_jaccard_topk_scaled."""
    return q_jaccard_pairs(spark, sf_dir).orderBy(
        F.desc("jaccard"), F.asc("a_id"), F.asc("b_id")
    ).limit(15)


def q_jaccard_topk_scaled(spark, sf_dir):
    """Top-k most-similar pairs restricted to LSH band-collision candidates
    (the 100 TB shape: the all-pairs join never happens; recall governed by
    the deterministic b x r scheme, identical in the DuckDB oracle)."""
    sh, cand = _lsh64_sh_cand(spark, sf_dir)
    return _jaccard_for_pairs(sh, cand).orderBy(
        F.desc("jaccard"), F.asc("a_id"), F.asc("b_id")
    ).limit(15)


def md5hash32b(col) -> F.Column:
    """Second independent 32-bit hash: int(md5(s)[8:16], 16)."""
    return F.conv(F.substring(F.md5(col), 9, 8), 16, 10).cast("long")


def _simhash_bands(tok: DataFrame) -> DataFrame:
    """(doc_id, sh0..sh3): 64-bit SimHash over tf-weighted term hashes,
    materialized as four 16-bit band values (band j = bits 16j..16j+15).
    Bands both ARE the fingerprint (sh0 + sh1<<16 + ... = the 64-bit value)
    and feed the Hamming-banding join directly: any pair within Hamming
    distance 3 of each other shares at least one exact band (pigeonhole).

    Shape note: bit index is EXPLODED into rows (64 rows per (doc, term))
    rather than planned as 64 ``sum(when(...))`` aggregate columns — the
    wide-agg form generated a codegen unit whose janino compile cost ~12s
    of driver time per fresh session (measured; execution itself was fast).
    The exploded form is ~7M tiny rows at sf0.1, two cheap shuffles, and
    compiles instantly. Values are bit-identical."""
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    tf = tf.withColumn("hA", md5hash32(F.col("term"))).withColumn("hB", md5hash32b(F.col("term")))
    # global bit i: i<32 -> bit i of hA; else bit i-32 of hB (same layout as
    # the previous wide-agg form). sign contribution = +tf / -tf.
    s = (
        tf.select(
            "doc_id", "tf", "hA", "hB",
            F.explode(F.sequence(F.lit(0), F.lit(63))).alias("i"))
        .withColumn(
            "bit",
            F.expr("CASE WHEN i < 32 THEN shiftright(hA, i) "
                   "ELSE shiftright(hB, i - 32) END & 1"))
        .groupBy("doc_id", "i")
        .agg(F.sum(F.when(F.col("bit") == 1, F.col("tf"))
                   .otherwise(-F.col("tf"))).alias("s"))
    )
    aggs = [
        F.sum(
            F.when(
                (F.col("i") >= 16 * j) & (F.col("i") < 16 * (j + 1)) & (F.col("s") >= 0),
                F.expr("shiftleft(CAST(1 AS LONG), CAST(i % 16 AS INT))"),
            ).otherwise(F.lit(0))
        ).cast("long").alias(f"sh{j}")
        for j in range(4)
    ]
    return s.groupBy("doc_id").agg(*aggs)


def q_dup_clusters(spark, sf_dir):
    """Near-dup CLUSTER resolution — the step a real dedup pipeline runs
    after pair generation: connected components over the LSH-verified dup
    pairs, canonical doc = min doc_id in the component. Iterative min-label
    propagation (each round: label <- min(label, neighbors' labels)), which
    converges in O(component diameter) rounds — components here are dup
    clusters, so diameters are tiny; each round is one join + one groupBy,
    fully distributed (the 100 TB shape; large-star/small-star is the same
    idea with better worst-case bounds)."""
    pairs = q_lsh_dup_pairs(spark, sf_dir).select("a_id", "b_id")
    return cluster_pairs(pairs)


def cluster_pairs(pairs: DataFrame) -> DataFrame:
    """Connected components over (a_id, b_id) dup pairs -> (doc_id, canon),
    canon = min doc_id of the component. See q_dup_clusters for the
    algorithmic rationale."""
    edges = _track(
        pairs.select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
        .unionByName(pairs.select(F.col("b_id").alias("src"), F.col("a_id").alias("dst")))
    )
    labels = (edges.select(F.col("src").alias("doc_id")).distinct()
              .withColumn("canon", F.col("doc_id"))
              .localCheckpoint(eager=True))
    for _ in range(12):  # >= diameter of any plausible dup cluster
        nbr_min = (
            edges.join(labels, edges.src == labels.doc_id)
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("canon").alias("nbr_canon"))
        )
        # checkpoint each round: iterative drivers otherwise both
        # recompute the whole chain (O(rounds^2) work) AND pay Catalyst
        # analysis over an ever-deeper logical plan (see pagerank)
        new_labels = (
            labels.join(nbr_min, "doc_id", "left")
            .select("doc_id",
                    F.least(F.col("canon"), F.coalesce(F.col("nbr_canon"), F.col("canon")))
                    .alias("canon"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("canon", "old"), "doc_id")
            .filter(F.col("canon") != F.col("old")).limit(1).count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("doc_id").cast("long").alias("doc_id"),
                         F.col("canon").cast("long").alias("canon"))


def q_simhash(spark, sf_dir):
    """64-bit SimHash as four 16-bit bands (sh0 = lowest 16 bits)."""
    return _simhash_bands(tokens(load(spark, sf_dir, "documents")))


def q_simhash_dup_pairs(spark, sf_dir):
    """SimHash near-dup pairs: Hamming-banding candidates (exact match on
    any of the 4 16-bit bands — complete for Hamming distance <= 3 by
    pigeonhole), verified with full 64-bit Hamming distance <= 3."""
    g = _fill(_simhash_bands(tokens(load(spark, sf_dir, "documents"))))
    long = g.select("doc_id", F.explode(F.array(*[
        F.struct(F.lit(j).alias("band"), F.col(f"sh{j}").alias("v")) for j in range(4)
    ])).alias("x")).select("doc_id", "x.band", "x.v")
    cand = (
        long.select(F.col("doc_id").alias("a_id"), "band", "v")
        .join(long.select(F.col("doc_id").alias("b_id"), "band", "v"), ["band", "v"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    a = g.select(F.col("doc_id").alias("a_id"), *[F.col(f"sh{j}").alias(f"a{j}") for j in range(4)])
    b = g.select(F.col("doc_id").alias("b_id"), *[F.col(f"sh{j}").alias(f"b{j}") for j in range(4)])
    ham = reduce(
        lambda acc, j: acc + F.bit_count(F.col(f"a{j}").bitwiseXOR(F.col(f"b{j}"))),
        range(1, 4),
        F.bit_count(F.col("a0").bitwiseXOR(F.col("b0"))),
    )
    return (
        cand.join(a, "a_id").join(b, "b_id")
        .select("a_id", "b_id", ham.cast("long").alias("hamming"))
        .filter(F.col("hamming") <= 3)
    )


# ------------------------------------------------------------- embeddings
def q_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-10 vs vec_id=0 (exact ANN baseline)."""
    emb = load(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    dot = F.aggregate(
        F.zip_with("embedding", "qv", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x.cast("double") * x.cast("double")), F.lit(0.0), lambda a, x: a + x))
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select("vec_id", F.round(dot / (nrm(F.col("embedding")) * nrm(F.col("qv"))), ROUND_DP).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(10)
    )


_PQ_BOOKS_CACHE: dict = {}
_PQ_BOOKS_CACHE_MAX = 8  # codebooks are tiny (m*k*sub-dim floats); bound anyway


def _pq_cache_key(sf_dir: str, m: int, k: int, seed: int):
    """Cache key that pins the INPUT DATA, not just its path: the
    (relpath, size, mtime_ns) signature of the embeddings parquet files.
    Regenerating testdata in place under a long-lived driver gets a cache
    miss and a retrain instead of silently serving codebooks trained on
    the old vectors."""
    import os

    from .fsutil import parquet_tree_sig

    root = os.path.join(sf_dir, "embeddings.parquet")
    return (sf_dir, tuple(parquet_tree_sig(root, rel_to=root)), m, k, seed)


def q_pq_topk(spark, sf_dir):
    """Product-quantization ANN (pq.py; Jegou et al. 2011 / FAISS IVFPQ
    shape): m=16 x k=64 codebooks trained on a bounded deterministic sample,
    16-byte codes (16x compression of the 64-dim float32 column), ADC scan
    with per-batch partial top-k, then exact-cosine refinement of the
    150-candidate shortlist. At this fixture scale the shortlist provably
    contains the exact top-10 (tests/test_pq.py), so the DuckDB oracle is
    the exact cosine ranking — the same gate trick as ann_ivf_topk. Final
    order mirrors the oracle exactly: rounded cos desc, vec_id asc."""
    import numpy as np

    from . import pq as P

    emb = load(spark, sf_dir, "embeddings")
    # codebook training is the offline one-time step of a PQ deployment
    # (FAISS trains once, serves many): memoize per input so repeat calls
    # (bench passes, batched correctness runs) measure the encode+ADC+refine
    # serving shape, not a driver-side k-means re-train. Deterministic
    # (seeded, sorted sample) -> identical books and results either way.
    key = _pq_cache_key(sf_dir, 16, 64, 7)
    books = _PQ_BOOKS_CACHE.get(key)
    if books is None:
        while len(_PQ_BOOKS_CACHE) >= _PQ_BOOKS_CACHE_MAX:
            _PQ_BOOKS_CACHE.pop(next(iter(_PQ_BOOKS_CACHE)))
        books = _PQ_BOOKS_CACHE[key] = P.train_pq(emb, m=16, k=64, seed=7)
    codes = P.pq_encode(emb, books)
    qv = np.asarray(
        emb.filter(F.col("vec_id") == 0).first()["embedding"], dtype=np.float64)
    sl = P.pq_topk_batch(codes, books, {"q": qv}, k=150, refine=150,
                         emb=emb, exclude_vec_id=0)
    return (
        sl.select("vec_id", F.round("score", ROUND_DP).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(10)
    )


def q_ann_ivf_topk(spark, sf_dir):
    """IVF-style ANN: restrict search to the query's coarse cell (label
    column = precomputed quantizer cell), then exact cosine top-10. The
    scale path: cells partition the corpus, a query probes 1..n cells."""
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv"), F.col("label").alias("qlabel")
    )
    dot = F.aggregate(
        F.zip_with("embedding", "qv", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x.cast("double") * x.cast("double")), F.lit(0.0), lambda a, x: a + x))
    return (
        emb.crossJoin(F.broadcast(q))
        .filter((F.col("label") == F.col("qlabel")) & (F.col("vec_id") != 0))
        .select("vec_id", F.round(dot / (nrm(F.col("embedding")) * nrm(F.col("qv"))), ROUND_DP).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(10)
    )


def q_embed_dup_pairs(spark, sf_dir):
    """Embedding-cosine near-dup via random-hyperplane (sign) LSH: 128
    deterministic hyperplanes -> 8 bands x 16 sign bits per vector (see the
    SLSH_* comment for why band width is a scale parameter), band-bucket
    equi-join for candidates, exact cosine computed ONLY for colliding
    pairs (>= EMB_COS_T kept). The 100 TB shape: the plane table is 128xdim
    rows (broadcast), signatures are one shuffle by vec_id, and the verify
    join is candidate-sized — no all-pairs stage anywhere. Hyperplane
    coefficients are hashed from (plane, dim), so the DuckDB oracle
    regenerates the identical scheme bit-for-bit."""
    emb = load(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", F.posexplode("embedding").alias("i0", "x")
    ).select(
        "vec_id", (F.col("i0") + 1).alias("i"), F.col("x").cast("double").alias("x")
    )
    # materialize the (plane, dim) coefficient table ONCE — planes x dims
    # rows (e.g. 64x64) — and broadcast-join it, instead of evaluating an
    # md5 per (posting-row x plane): the hash count drops from O(n_vecs x
    # dim x planes) to O(dim x planes)
    dims = ex.select("i").distinct()
    planes = spark.range(SLSH_PLANES).select(F.col("id").cast("int").alias("p"))
    coef_tbl = planes.crossJoin(dims).select(
        "p", "i",
        (((md5hash32(F.concat(F.lit("plane_"), F.col("p").cast("string"),
                              F.lit("_"), F.col("i").cast("string"))) % F.lit(2001))
          - F.lit(1000)) / F.lit(1000.0)).alias("coef"),
    )
    bits = (
        ex.join(F.broadcast(coef_tbl), "i")
        .groupBy("vec_id", "p")
        .agg(F.when(F.sum(F.col("coef") * F.col("x")) >= 0, F.lit(1))
             .otherwise(F.lit(0)).alias("bit"))
    )
    bands = _fill(bits.groupBy(
        "vec_id", F.expr(f"p div {SLSH_BAND_BITS}").cast("int").alias("band")
    ).agg(F.sum(F.col("bit") * F.expr(f"shiftleft(1, p % {SLSH_BAND_BITS})")).alias("bv")))
    cand = (
        bands.select(F.col("vec_id").alias("a_id"), "band", "bv")
        .join(bands.select(F.col("vec_id").alias("b_id"), "band", "bv"), ["band", "bv"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    dots = (
        cand.join(ex.select(F.col("vec_id").alias("a_id"), "i", F.col("x").alias("xa")), "a_id")
        .join(ex.select(F.col("vec_id").alias("b_id"), "i", F.col("x").alias("xb")), ["b_id", "i"])
        .groupBy("a_id", "b_id")
        .agg((F.sum(F.col("xa") * F.col("xb"))
              / (F.sqrt(F.sum(F.col("xa") * F.col("xa")))
                 * F.sqrt(F.sum(F.col("xb") * F.col("xb"))))).alias("c"))
    )
    return dots.filter(F.col("c") >= EMB_COS_T).select(
        F.col("a_id").cast("long").alias("a_id"),
        F.col("b_id").cast("long").alias("b_id"),
        F.round("c", ROUND_DP).alias("cos"),
    )


# --------------------------------------------------------------- events
def q_events_window(spark, sf_dir):
    """Tumbling 1-hour event-time window counts + value sum by type — the
    batch twin of the streaming watermark+window aggregation
    (streaming.stream_event_window_stats)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"),
             F.round(F.sum("value"), ROUND_DP).alias("sum_value"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n", "sum_value")
    )


def q_events_sessions(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity closes a session) per
    user: lag -> new-session flag -> running sum = session id -> per-user
    rollup. The per-user window sort is the standard distributed shape
    (partitionBy user); the streaming twin is the applyInPandasWithState
    operator in streaming.py."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    sec = F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(1_000_000.0)
    flagged = ev.withColumn(
        "new_s",
        (sec - F.coalesce(F.lag(sec).over(w), F.lit(-1e9)) > 1800.0).cast("int"))
    sess = flagged.withColumn("session_id", F.sum("new_s").over(w))
    per_sess = sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"))
    return per_sess.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.max("n_events").cast("long").alias("max_session_events"),
        F.sum("n_events").cast("long").alias("n_events"),
    )


def q_events_props(spark, sf_dir):
    """Semi-structured extraction: JSON prop k summed by event type."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("long")).alias("sum_k"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


# ------------------------------------------------------------ text quality
# Gopher/C4-style pretraining-corpus filter thresholds (Rae et al. 2021 §A1.1
# shape, constants tuned to the synthetic corpus so both branches are
# non-trivially populated at sf0.01)
QF_MIN_TOKENS, QF_MAX_TOKENS = 20, 100_000
QF_MIN_WORDLEN, QF_MAX_WORDLEN = 3.0, 10.0
QF_MAX_TOP_TERM = 0.10  # docs whose hottest term carries >10% mass are spam-y
# BPE-ish pretokenizer (GPT-2 pretokenizer shape reduced to this corpus's
# alphabet): letter runs, single digits, single symbols. Identical RE2/Java
# semantics for ASCII input.
BPE_PAT = "[a-z]+|[0-9]|[^a-z0-9 ]"
SPLIT_TRAIN_PCT, SPLIT_VALID_PCT = 80, 10


def _rep_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, top_term_frac, top_bigram_frac) — repetition mass
    signals. Bigrams are built doc-locally from the token array (transform
    over sequence — no per-doc window sort, the same shuffle-free shape as
    _shingles), so the whole op is two narrow groupBys."""
    toks = docs.select(
        "doc_id", F.filter(F.split("text", " "), lambda x: x != "").alias("arr"))
    tf = (
        toks.select("doc_id", F.explode("arr").alias("term"))
        .groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
        .groupBy("doc_id")
        .agg(F.sum("tf").cast("long").alias("n_tokens"),
             F.max("tf").alias("max_tf"))
    )
    bg = (
        toks.select(
            "doc_id",
            F.explode(F.when(
                F.size("arr") >= 2,
                F.expr("transform(sequence(0, size(arr) - 2), "
                       "j -> concat_ws(' ', arr[j], arr[j+1]))"),
            ).otherwise(F.array().cast("array<string>"))).alias("bigram"),
        )
        .groupBy("doc_id", "bigram").agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id").agg(F.max("c").alias("max_bg"))
    )
    return (
        tf.join(bg, "doc_id", "left")
        .select(
            "doc_id", "n_tokens",
            F.round(F.col("max_tf") / F.col("n_tokens"), ROUND_DP).alias("top_term_frac"),
            F.round(
                F.when(F.col("n_tokens") > 1,
                       F.coalesce(F.col("max_bg"), F.lit(0)) / (F.col("n_tokens") - 1))
                .otherwise(F.lit(0.0)), ROUND_DP).alias("top_bigram_frac"),
        )
    )


def q_repetition(spark, sf_dir):
    """Repetition signals per doc: total tokens, mass of the most frequent
    unigram and bigram (the Gopher repetition family's core members)."""
    return _rep_stats(load(spark, sf_dir, "documents"))


def q_token_bpe(spark, sf_dir):
    """Token counting two ways: whitespace words vs BPE-ish pretokenizer
    matches (letter runs + single digits + single symbols), plus their
    ratio — the 'how many model tokens is this corpus' estimator. Pure
    Catalyst (regexp_extract_all is JVM-side codegen)."""
    docs = load(spark, sf_dir, "documents")
    n_bpe = F.size(F.expr(f"regexp_extract_all(text, '{BPE_PAT}', 0)"))
    n_ws = F.size(F.filter(F.split("text", " "), lambda x: x != ""))
    return docs.select(
        "doc_id",
        n_bpe.cast("long").alias("n_bpe"),
        n_ws.cast("long").alias("n_ws"),
        F.round(F.when(n_ws > 0, n_bpe / n_ws).otherwise(F.lit(0.0)),
                ROUND_DP).alias("bpe_per_word"),
    )


def q_source_stats(spark, sf_dir):
    """Per-source (per-domain analog) rollup: doc count, mean length,
    language spread, exact-dup count within the source — the aggregation a
    crawl pipeline runs to rank/blocklist domains. One groupBy; scales."""
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.avg("n_chars"), ROUND_DP).alias("avg_chars"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        (F.count(F.lit(1)) - F.countDistinct(F.md5("text"))).cast("long").alias("n_dup_texts"),
    )


def q_lang_mix(spark, sf_dir):
    """Declared-lang x predicted-en confusion counts: joins the metadata lang
    label against the stopword-ratio language-ID heuristic."""
    docs = load(spark, sf_dir, "documents")
    tok = tokens(docs)
    pred = tok.groupBy("doc_id").agg(
        (F.avg(F.col("term").isin(STOP_EN).cast("double")) >= 0.05).alias("pred_en"))
    return (
        docs.join(pred, "doc_id")
        .groupBy("lang", "pred_en")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def q_quality_filter(spark, sf_dir):
    """C4/Gopher-style keep/drop decision per doc: length band, mean word
    length band, top-term repetition cap — each flag exposed plus the final
    conjunction. The pretraining-corpus filter as one distributed pass."""
    docs = load(spark, sf_dir, "documents")
    tok = tokens(docs)
    base = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.avg(F.length("term")).alias("awl"),
    )
    rep = _rep_stats(docs).select("doc_id", "top_term_frac")
    j = base.join(rep, "doc_id")
    len_ok = (F.col("n_tokens") >= QF_MIN_TOKENS) & (F.col("n_tokens") <= QF_MAX_TOKENS)
    wl_ok = (F.col("awl") >= QF_MIN_WORDLEN) & (F.col("awl") <= QF_MAX_WORDLEN)
    rep_ok = F.col("top_term_frac") <= QF_MAX_TOP_TERM
    return j.select(
        "doc_id", "n_tokens",
        F.round("awl", ROUND_DP).alias("avg_word_len"),
        "top_term_frac",
        len_ok.alias("len_ok"), wl_ok.alias("wordlen_ok"), rep_ok.alias("rep_ok"),
        (len_ok & wl_ok & rep_ok).alias("keep"),
    )


# PII scrub (C4 / Dolma / FineWeb-style): regex families kept to syntax both
# Java regex (Spark) and RE2 (DuckDB) interpret identically — \b, \d, bounded
# repetition, plain char classes — so the oracle replays them verbatim.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_MOD = 4


def pii_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc PII detection + redaction — the pre-training scrub pass every
    public web corpus pipeline runs (C4 drops lines with bad words, Dolma and
    FineWeb mask emails/phones/IPs before training). One narrow projection,
    no shuffle: each doc is scanned independently by JVM-side regexes
    (regexp_count / regexp_replace inside whole-stage codegen — no Python in
    the loop), so the pass is embarrassingly parallel at any corpus size.
    Emits match counts per family, the has_pii flag a filter or router would
    consume, and the md5 of the redacted text (<EMAIL>/<PHONE>/<IP>
    placeholders) so the scrubbed OUTPUT is value-checked without shipping
    full text through the gate."""
    t = F.col(text_col)
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_EMAIL, "<EMAIL>"),
            PII_PHONE, "<PHONE>"),
        PII_IPV4, "<IP>")
    n_em = F.regexp_count(t, F.lit(PII_EMAIL))
    n_ph = F.regexp_count(t, F.lit(PII_PHONE))
    n_ip = F.regexp_count(t, F.lit(PII_IPV4))
    return docs.select(
        "doc_id",
        n_em.cast("long").alias("n_emails"),
        n_ph.cast("long").alias("n_phones"),
        n_ip.cast("long").alias("n_ips"),
        ((n_em + n_ph + n_ip) > 0).alias("has_pii"),
        F.md5(F.encode(red, "UTF-8")).alias("redacted_h"),
    )


def q_pii_scrub(spark, sf_dir):
    """Driver gate for pii_stats. The synthetic corpus contains no organic
    PII, so the gate appends a deterministic per-doc suffix (email / phone /
    IPv4 / none by doc_id % 4 — integer arithmetic the DuckDB oracle replays
    exactly, like the eval_* synthetic run/qrels) and value-checks counts,
    the flag, and the redacted-text hash."""
    docs = load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.when(did % PII_MOD == 0,
               F.concat(F.lit(" contact admin"), did.cast("string"),
                        F.lit("@example.com")))
        .when(did % PII_MOD == 1,
              F.concat(F.lit(" call 555-010-"),
                       F.lpad((did % 10000).cast("string"), 4, "0")))
        .when(did % PII_MOD == 2,
              F.concat(F.lit(" from 192.168."), (did % 256).cast("string"),
                       F.lit("."), ((did * 7) % 256).cast("string")))
        .otherwise(F.lit("")))
    return pii_stats(docs.select("doc_id", aug.alias("text")))


def q_split_assign(spark, sf_dir):
    """Deterministic hash-based train/valid/test split (the standard leakage-
    safe way to split a training corpus: hash of a stable id, never random()):
    bucket = md5-hash32('split_' || doc_id) % 100 -> 80/10/10."""
    docs = load(spark, sf_dir, "documents")
    bucket = (md5hash32(F.concat(F.lit("split_"), F.col("doc_id").cast("string")))
              % F.lit(100)).cast("long")
    return docs.select(
        "doc_id", bucket.alias("bucket"),
        F.when(bucket < SPLIT_TRAIN_PCT, F.lit("train"))
        .when(bucket < SPLIT_TRAIN_PCT + SPLIT_VALID_PCT, F.lit("valid"))
        .otherwise(F.lit("test")).alias("split"),
    )


def q_lm_score(spark, sf_dir):
    """Unigram-LM perplexity-style quality score (the CCNet/KenLM filter
    signal's distributed shape): corpus MLE p(term) = ctf/total, per-doc
    mean negative log-likelihood. High nll = improbable token mix. Two
    groupBys + one broadcast join; the LM table is O(vocab)."""
    tok = tokens(load(spark, sf_dir, "documents"))
    total = tok.count()
    probs = tok.groupBy("term").agg(
        (F.count(F.lit(1)) / F.lit(float(total))).alias("p"))
    return (
        tok.join(F.broadcast(probs), "term")
        .groupBy("doc_id")
        .agg(F.round(F.avg(-F.log("p")), ROUND_DP).alias("nll"))
    )


def q_tfidf_topterms(spark, sf_dir):
    """Keyword extraction: the highest-tf-idf term per doc (tf * ln(N/df),
    ties broken term-asc). One tf groupBy, a broadcast df join, a per-doc
    window rank — the standard distributed shape."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    tok = tokens(docs)
    n_docs = docs.count()
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = tf.join(F.broadcast(df), "term").withColumn(
        "tfidf", F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")))
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("term").alias("top_term"),
                F.round("tfidf", ROUND_DP).alias("tfidf"))
    )


# Decontamination: the benchmark set is the deterministic doc_id % CONTAM_MOD
# slice (stands in for an eval suite's text); a training doc is contaminated
# when it shares any CONTAM_N-gram with any benchmark doc — the GPT-3/Llama
# n-gram eval-overlap check as one distributed pass.
CONTAM_MOD, CONTAM_N = 29, 5
NGRAM_TOPK_N, NGRAM_TOPK_K = 3, 15


def _doc_ngrams_pos(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, pos [1-based gram start], gram) with one row per n-gram
    OCCURRENCE, built doc-locally from the token array (transform over
    sequence — no per-doc window sort, no shuffle; the same shape as
    _shingles/_rep_stats bigrams)."""
    joined = ", ".join(f"arr[j+{i}]" for i in range(n))
    return (
        docs.select(
            "doc_id", F.filter(F.split("text", " "), lambda x: x != "").alias("arr"))
        .select(
            "doc_id",
            F.posexplode(F.when(
                F.size("arr") >= n,
                F.expr(f"transform(sequence(0, size(arr) - {n}), "
                       f"j -> concat_ws(' ', {joined}))"),
            ).otherwise(F.array().cast("array<string>"))).alias("pos0", "gram"),
        )
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "gram")
    )


def _doc_ngrams(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, gram) — _doc_ngrams_pos without the start position."""
    return _doc_ngrams_pos(docs, n).select("doc_id", "gram")


def q_contamination(spark, sf_dir):
    """Benchmark decontamination: per training doc, the number of distinct
    CONTAM_N-grams it shares with the benchmark slice, plus the drop flag.
    The benchmark gram set is small -> broadcast; training grams never
    self-join, so the op is one doc-local explode + one broadcast semi
    shape — the plan that survives a 100-TB training corpus."""
    docs = load(spark, sf_dir, "documents")
    grams = _doc_ngrams(docs, CONTAM_N)
    is_bench = F.col("doc_id") % CONTAM_MOD == 0
    bench = grams.filter(is_bench).select("gram").distinct()
    train = grams.filter(~is_bench).distinct()
    hits = (
        train.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    return (
        docs.filter(~is_bench).select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shared", F.lit(0)).cast("long").alias("n_shared"),
            (F.coalesce("n_shared", F.lit(0)) > 0).alias("contaminated"),
        )
    )


# Exact substring-level dedup: a token is duplicated when some verbatim
# SUBDUP_N-token run covering it also occurs in ANOTHER doc (the
# suffix-array dedup criterion of Lee et al. 2022, "Deduplicating Training
# Data Makes Language Models Better", recast as three narrow Spark passes —
# no suffix array, no self-join).
SUBDUP_N, SUBDUP_MAX_FRAC = 16, 0.5


def q_substring_dedup(spark, sf_dir):
    """Per-doc duplicated-token coverage + drop flag (dup_frac > 0.5).

    Scale shape: gram construction is doc-local (transform over sequence);
    cross-doc grams come from ONE groupBy on the gram — singleton grams,
    the vast majority of a crawl, die in the map-side partial aggregate;
    coverage expansion explodes only DUPLICATED gram starts
    (candidate-restricted, ≤ SUBDUP_N rows per dup gram), then one doc_id
    groupBy. At crawl scale the groupBy key would be xxhash64(gram) (8-byte
    shuffle rows); here the verbatim string is kept so the DuckDB oracle is
    collision-free-identical."""
    return _substring_dedup(load(spark, sf_dir, "documents"))


def _substring_dedup(docs: DataFrame, n: int = SUBDUP_N) -> DataFrame:
    g = _doc_ngrams_pos(docs, n)
    dup = (
        g.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
        .select("gram")
    )
    cov = (
        g.join(dup, "gram")
        .select("doc_id",
                F.explode(F.sequence(F.col("pos"), F.col("pos") + (n - 1))).alias("j"))
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("dup_tokens"))
    )
    nt = _doclens(tokens(docs)).withColumnRenamed("len", "n_tokens")
    return (
        nt.join(cov, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
            F.round(F.coalesce("dup_tokens", F.lit(0)) / F.col("n_tokens"),
                    ROUND_DP).alias("dup_frac"),
        )
        .withColumn("drop_doc", F.col("dup_frac") > SUBDUP_MAX_FRAC)
    )


def q_doc_entropy(spark, sf_dir):
    """Per-doc unigram Shannon entropy in bits (the complement quality signal
    to lm_score: low entropy = repetitive/templated text). Algebraic form
    H = log2(n) - sum(tf*log2(tf))/n needs one tf groupBy + one doc groupBy."""
    tok = tokens(load(spark, sf_dir, "documents"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    g = tf.groupBy("doc_id").agg(
        F.sum("tf").alias("n"),
        F.sum(F.col("tf") * F.log2("tf")).alias("s"),
    )
    return g.select(
        "doc_id",
        F.round(F.log2("n") - F.col("s") / F.col("n"), ROUND_DP).alias("entropy"),
    )


def q_ngram_topk(spark, sf_dir):
    """Corpus-level top-k trigrams by occurrence count (the n-gram frequency
    table a curation pipeline derives boilerplate/stop-phrase lists from).
    Doc-local gram construction -> one groupBy -> TakeOrderedAndProject."""
    grams = _doc_ngrams(load(spark, sf_dir, "documents"), NGRAM_TOPK_N)
    return (
        grams.groupBy("gram").agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("gram"))
        .limit(NGRAM_TOPK_K)
    )


def q_length_quantiles(spark, sf_dir):
    """Exact corpus length distribution (p50/p90/p99 of token count + mean):
    the sizing numbers that pick maxPartitionBytes / seq-len budgets. Exact
    interpolated percentile (Spark `percentile` == DuckDB quantile_cont);
    at 100 TB the same query swaps to approx_percentile with a
    documented error bound."""
    tok = tokens(load(spark, sf_dir, "documents"))
    lens = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("len"))
    return lens.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.avg("len"), ROUND_DP).alias("mean_len"),
        F.round(F.percentile("len", F.lit(0.5)), ROUND_DP).alias("p50"),
        F.round(F.percentile("len", F.lit(0.9)), ROUND_DP).alias("p90"),
        F.round(F.percentile("len", F.lit(0.99)), ROUND_DP).alias("p99"),
    )


def q_lang_id(spark, sf_dir):
    """Stopword-ratio language heuristic."""
    tok = tokens(load(spark, sf_dir, "documents"))
    g = tok.groupBy("doc_id").agg(
        F.round(F.avg(F.col("term").isin(STOP_EN).cast("double")), ROUND_DP).alias("stop_ratio")
    )
    return g.select(
        "doc_id", "stop_ratio", (F.col("stop_ratio") >= 0.05).alias("pred_en")
    )


def q_quality(spark, sf_dir):
    """Quality scoring: token count, type/token ratio, mean token length."""
    tok = tokens(load(spark, sf_dir, "documents"))
    return tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.countDistinct("term").cast("long").alias("n_distinct"),
        F.round(F.countDistinct("term") / F.count(F.lit(1)), ROUND_DP).alias("ttr"),
        F.round(F.avg(F.length("term")), ROUND_DP).alias("avg_tok_len"),
    )


def q_token_stats(spark, sf_dir):
    tok = tokens(load(spark, sf_dir, "documents"))
    return tok.agg(
        F.count(F.lit(1)).cast("long").alias("total_tokens"),
        F.countDistinct("term").cast("long").alias("distinct_terms"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
    )


def q_binary_meta(spark, sf_dir):
    """Multimodal plumbing, SQL-checkable slice: documents' text as an opaque
    binary payload -> typed metadata (bytes, md5, fake-decoded width/height
    from the first two bytes). The full feature kernel (mapInPandas) is
    covered by pytest (multimodal.py)."""
    docs = load(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("h"),
        (F.ascii(F.substring("text", 1, 1)) % 32 + 1).cast("int").alias("width"),
        (F.ascii(F.substring("text", 2, 1)) % 32 + 1).cast("int").alias("height"),
    )


def q_fingerprint(spark, sf_dir):
    """Winnowing-style doc fingerprint: min 5-shingle hash per doc."""
    from pyspark.sql import Window

    tok = tokens(load(spark, sf_dir, "documents"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    sh = tok.select(
        "doc_id",
        F.concat_ws(" ", "term", F.lead("term", 1).over(w), F.lead("term", 2).over(w),
                    F.lead("term", 3).over(w), F.lead("term", 4).over(w)).alias("shingle"),
        F.lead("term", 4).over(w).alias("_ok"),
    ).filter(F.col("_ok").isNotNull())
    return sh.select("doc_id", md5hash32(F.col("shingle")).alias("h")).groupBy("doc_id").agg(
        F.min("h").alias("fingerprint")
    )


# ----------------------------------------------- training-prep: pack / mix
# GPT-style sequence packing: the corpus is concatenated in doc_id order and
# sliced into fixed-length training blocks. PACK_BUCKET is the fan-in of the
# distributed prefix-sum tree (see q_pack_blocks).
PACK_SEQ_LEN = 128
PACK_BUCKET = 64
MIX_ALPHA = 0.5     # source-mixing temperature (alpha < 1 upweights rare sources)
VOCAB_TOP_V = 64    # vocabulary size for the OOV-rate estimator
PREFIX_K = 16       # tokens of leading context for boilerplate-prefix families


def q_pack_blocks(spark, sf_dir):
    """Sequence packing for training: concatenate docs in doc_id order, slice
    into PACK_SEQ_LEN-token blocks; per doc emit the block span its tokens
    land in. The global prefix sum is a 3-level scan tree (doc -> bucket of
    PACK_BUCKET docs -> superbucket of PACK_BUCKET buckets -> root): the
    per-doc and per-bucket windows are PARTITIONED (parallel), and only the
    superbucket roll-up — N / PACK_BUCKET^2 rows — is a global window. With
    PACK_BUCKET=64 two partitioned levels cover 4096 docs per root row;
    production sets PACK_BUCKET~2^16 so the root level is ~N/2^32 rows (233
    rows at 10^12 docs), and the same pattern nests once more if ever needed
    — there is no O(N) single-task sort anywhere (the anti-pattern a naive
    Window.orderBy cumsum would introduce)."""
    from pyspark.sql import Window

    B, L = PACK_BUCKET, PACK_SEQ_LEN
    dl = _doclens(tokens(load(spark, sf_dir, "documents")))
    d = dl.withColumn("b1", F.expr(f"doc_id div {B}")).withColumn(
        "b2", F.expr(f"doc_id div {B * B}"))
    w1 = Window.partitionBy("b1").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1)
    d = d.withColumn("off1", F.coalesce(F.sum("len").over(w1), F.lit(0)))
    bt = d.groupBy("b1", "b2").agg(F.sum("len").alias("bsum"))
    w2 = Window.partitionBy("b2").orderBy("b1").rowsBetween(
        Window.unboundedPreceding, -1)
    bt = bt.withColumn("off2", F.coalesce(F.sum("bsum").over(w2), F.lit(0)))
    st = bt.groupBy("b2").agg(F.sum("bsum").alias("ssum"))
    w3 = Window.orderBy("b2").rowsBetween(Window.unboundedPreceding, -1)
    st = st.withColumn("off3", F.coalesce(F.sum("ssum").over(w3), F.lit(0)))
    j = (
        d.join(F.broadcast(bt.select("b1", "off2")), "b1")
        .join(F.broadcast(st.select("b2", "off3")), "b2")
        .withColumn("start", F.col("off1") + F.col("off2") + F.col("off3"))
    )
    return j.select(
        "doc_id", "len",
        F.expr(f"start div {L}").cast("long").alias("first_block"),
        F.expr(f"(start + len - 1) div {L}").cast("long").alias("last_block"),
        (F.expr(f"(start + len - 1) div {L}") - F.expr(f"start div {L}") + 1)
        .cast("long").alias("n_blocks"),
    )


def q_sample_weights(spark, sf_dir):
    """Temperature-based source mixing (the multinomial data-mix reweighting
    used for multilingual/multi-source pretraining): per-source sampling
    share w_s ~ (n_s/N)^alpha, normalized; per-doc weight = w_s * N / n_s so
    the corpus-mean weight is exactly 1 and alpha < 1 upweights rare
    sources. One tiny per-source aggregate, broadcast back — scales."""
    docs = load(spark, sf_dir, "documents")
    n_total = docs.count()
    src = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    pa = F.pow(F.col("n_s") / F.lit(float(n_total)), F.lit(MIX_ALPHA))
    w = src.select("source", "n_s", pa.alias("pa"))
    z = w.agg(F.sum("pa").alias("z"))
    w = w.crossJoin(F.broadcast(z)).select(
        "source",
        (F.col("pa") / F.col("z") * F.lit(float(n_total)) / F.col("n_s")).alias("wt"))
    return docs.select("doc_id", "source").join(F.broadcast(w), "source").select(
        "doc_id", "source", F.round("wt", ROUND_DP).alias("weight"))


def q_vocab_oov(spark, sf_dir):
    """Top-V vocabulary construction + per-doc OOV rate (the 'how much of
    this doc does a V-word vocab cover' signal; also the first stage of any
    frequency-built tokenizer). The vocab is a corpus-wide top-V (tiny),
    broadcast against the token stream — no shuffle of the corpus beyond
    the term-count groupBy."""
    tok = tokens(load(spark, sf_dir, "documents"))
    vocab = (
        tok.groupBy("term").agg(F.count(F.lit(1)).alias("ctf"))
        .orderBy(F.desc("ctf"), F.asc("term")).limit(VOCAB_TOP_V)
        .select("term", F.lit(True).alias("in_vocab"))
    )
    return (
        tok.join(F.broadcast(vocab), "term", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(F.avg(F.when(F.col("in_vocab").isNull(), 1.0).otherwise(0.0)),
                    ROUND_DP).alias("oov_rate"),
        )
    )


def q_prefix_dup(spark, sf_dir):
    """Boilerplate-prefix families: docs sharing an identical first-PREFIX_K
    token prefix (crawl near-dups differing only in the tail — headers,
    templates, mirrored pages). One hash + one groupBy; emits only
    families with >= 2 members."""
    docs = load(spark, sf_dir, "documents")
    arr = F.filter(F.split("text", " "), lambda x: x != "")
    d = docs.select("doc_id", arr.alias("arr")).filter(F.size("arr") >= 1)
    d = d.select(
        "doc_id",
        md5hash32(F.concat_ws(" ", F.slice("arr", 1, PREFIX_K))).alias("ph"))
    return (
        d.groupBy("ph")
        .agg(F.count(F.lit(1)).cast("long").alias("n"),
             F.min("doc_id").cast("long").alias("keep_id"))
        .filter(F.col("n") > 1)
    )


def q_dedup_keep(spark, sf_dir):
    """The APPLY step of deduplication — the final keep-list a pipeline
    materializes before training: keep a doc iff it is the canonical (min
    doc_id) member of its exact-dup (md5) group AND the canonical of its
    near-dup cluster (or in no cluster). Exact side is one groupBy; near
    side reuses the LSH-verified connected components (q_dup_clusters) and
    joins them back — candidate-sized, never all-pairs."""
    docs = load(spark, sf_dir, "documents")
    e = docs.select("doc_id", F.md5("text").alias("h"))
    ek = e.groupBy("h").agg(F.min("doc_id").alias("keep_id"))
    exact = e.join(ek, "h").select(
        "doc_id", (F.col("doc_id") == F.col("keep_id")).alias("exact_keep"))
    clusters = q_dup_clusters(spark, sf_dir).select("doc_id", "canon")
    near_keep = F.col("canon").isNull() | (F.col("canon") == F.col("doc_id"))
    return (
        exact.join(clusters, "doc_id", "left")
        .select(
            "doc_id", "exact_keep", near_keep.alias("near_keep"),
            (F.col("exact_keep") & near_keep).alias("keep"),
        )
    )


# --- host graph: link extraction, PageRank, per-host caps ------------------
# The web-graph layer of a crawl pipeline: derive a host->host link graph,
# rank hosts (PageRank is the canonical crawl-frontier / quality prior),
# and cap per-host document counts (RefinedWeb/C4-style anti-SEO-farm rule).

PR_DAMP = 0.85
PR_ITERS = 5
PR_DST_MOD = 20  # derived-graph fanout modulus (src0..src19 host space)
DCAP_N = 20      # per-host document cap


def _host_edges(docs: DataFrame) -> DataFrame:
    """Deterministic host->host edge list derived from documents by pure
    integer arithmetic (no engine-specific hash): each doc contributes two
    outlinks source_host -> src{(doc_id*7 + n_chars) % 20} and
    -> src{(doc_id*13 + 3*n_chars + 1) % 20} (n_chars mixes in per-doc
    entropy — doc_id alone is congruent to the source assignment and
    collapses the graph to a permutation); edges collapse to
    (src, dst, w=count). Stands in for real <a href> host extraction —
    with a crawl table the same op is one generated-column explode over
    parsed hrefs; everything downstream (collapse, out-weight, rank
    iteration) is identical. One groupBy; at crawl scale the collapse is
    the big win (10^11 raw links -> 10^8 host pairs before any iteration)."""
    d1 = (F.col("doc_id") * 7 + F.col("n_chars")) % PR_DST_MOD
    d2 = (F.col("doc_id") * 13 + F.col("n_chars") * 3 + 1) % PR_DST_MOD
    links = docs.select(
        F.col("source").alias("src"),
        F.explode(F.array(d1, d2)).alias("d"))
    return (links.select("src", F.concat(F.lit("src"),
                                         F.col("d").cast("string")).alias("dst"))
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).cast("double").alias("w")))


def q_host_links(spark, sf_dir):
    """The collapsed host->host link graph (see _host_edges)."""
    e = _host_edges(load(spark, sf_dir, "documents"))
    return e.select("src", "dst", F.col("w").cast("long").alias("w"))


def pagerank(edges: DataFrame, iters: int = PR_ITERS,
             damp: float = PR_DAMP,
             reliable_checkpoint: bool = False) -> DataFrame:
    """Weighted PageRank with damping and dangling-mass redistribution,
    fixed `iters` power iterations (deterministic — no convergence test, so
    the DuckDB oracle can unroll the same recurrence). Per iteration: one
    join (ranks x edges on src) + one groupBy (sum contributions by dst) —
    the standard distributed shape; ranks and edge partitioning are stable
    across iterations so at scale you pre-partition edges by src once and
    every iteration reuses it (no re-shuffle of the big side). Each
    round's ranks are localCheckpoint'ed: caching alone is NOT enough for
    an iterative driver — the cached data is reused but the LOGICAL plan
    keeps its full ancestry, so Catalyst analysis time grows with every
    round (measured: 1.9s -> 7.8s/iter by round 5 at 20 nodes); the
    checkpoint truncates the plan and holds per-iteration cost flat.
    reliable_checkpoint=True swaps in checkpoint() (requires
    spark.sparkContext.setCheckpointDir on durable storage): same
    semantics, but the materialized ranks survive executor loss — the
    right setting on a real cluster where a lost executor would otherwise
    force recomputing the whole iteration chain. Dangling nodes
    (in-links but no out-links) donate
    their mass uniformly, the textbook correction; the dangling SET is
    static across iterations, so when it is empty the 1-row mass
    aggregate + cross join are skipped entirely — when present it stays
    an executor-side agg cross-joined back (never a driver collect)."""
    edges = _track(edges)

    def _ckpt(df: DataFrame) -> DataFrame:
        return (df.checkpoint(eager=True) if reliable_checkpoint
                else df.localCheckpoint(eager=True))

    nodes = _ckpt(edges.select(F.col("src").alias("node"))
                  .unionByName(edges.select(F.col("dst").alias("node")))
                  .distinct())
    n = nodes.count()
    if n == 0:
        # empty edge set (e.g. a crawl slice with no extractable links):
        # the rank vector over zero nodes is the empty frame, not a crash
        ranks = nodes.withColumn("pr", F.lit(0.0))
        ranks._pagerank_n_nodes = 0
        return ranks
    outw = _track(edges.groupBy("src").agg(F.sum("w").alias("ow")))
    has_dangling = (
        nodes.join(outw, nodes.node == outw.src, "left_anti").limit(1).count() > 0)
    ranks = _ckpt(nodes.withColumn("pr", F.lit(1.0 / n)))
    for _ in range(iters):
        contrib = (
            ranks.join(edges, ranks.node == edges.src)
            .join(outw, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("pr") * F.col("w") / F.col("ow")).alias("contrib")))
        new_ranks = nodes.join(contrib, nodes.node == contrib.dst, "left")
        if has_dangling:
            dang = (ranks.join(outw, ranks.node == outw.src, "left_anti")
                    .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("dang")))
            dang_mass = F.col("dang") / F.lit(float(n))
            new_ranks = new_ranks.crossJoin(dang)
        else:
            dang_mass = F.lit(0.0)
        ranks = _ckpt(new_ranks.select(
            "node",
            (F.lit((1.0 - damp) / n)
             + F.lit(damp) * (F.coalesce(F.col("contrib"), F.lit(0.0))
                              + dang_mass)).alias("pr")
        ))
    # node count is already paid for above — stash it so callers needing
    # the teleport floor (url_priors) don't run an extra count job
    ranks._pagerank_n_nodes = n
    return ranks


def q_pagerank(spark, sf_dir):
    """PageRank over the derived host graph, PR_ITERS power iterations."""
    e = _host_edges(load(spark, sf_dir, "documents"))
    return pagerank(e).select("node", F.round("pr", ROUND_DP).alias("pr"))


PR_URL_MOD = 257  # per-url derived-graph target modulus (prime, > host fanout)


def _url_edges(docs: DataFrame) -> DataFrame:
    """Deterministic UN-collapsed url->url edge list: each doc is a url node
    'u{doc_id}' with two outlinks — one intra-corpus ('u' target, usually an
    existing doc) and one to an external sink ('x' target, a node with NO
    outlinks) so the dangling-mass redistribution branch of pagerank() is
    exercised by the gate, not just the host graph's fully-connected case.
    Mirrors links.url_graph semantics (distinct pairs, w=1): per-url rank
    is the same pagerank() call on the un-collapsed graph — only the edge
    derivation differs (links.url_graph parses real <a href>; this gate
    derives edges by integer arithmetic so DuckDB can replay them)."""
    d1 = (F.col("doc_id") * 7 + F.col("n_chars")) % PR_URL_MOD
    d2 = (F.col("doc_id") * 13 + F.col("n_chars") * 3 + 1) % PR_URL_MOD
    src = F.concat(F.lit("u"), F.col("doc_id").cast("string"))
    pairs = docs.select(
        src.alias("src"),
        F.explode(F.array(
            F.concat(F.lit("u"), d1.cast("string")),
            F.concat(F.lit("x"), d2.cast("string")))).alias("dst"))
    return (pairs.filter(F.col("src") != F.col("dst"))
            .distinct().withColumn("w", F.lit(1.0)))


def q_pagerank_url(spark, sf_dir):
    """Per-url (per-document) PageRank: the un-collapsed-graph twin of
    q_pagerank, exercising the dangling-mass branch (x-sinks have no
    outlinks). This is the granularity url_priors(granularity='url')
    feeds to LTR f4."""
    e = _url_edges(load(spark, sf_dir, "documents"))
    return pagerank(e).select("node", F.round("pr", ROUND_DP).alias("pr"))


def q_domain_cap(spark, sf_dir):
    """Per-host document cap: keep the DCAP_N largest docs per source
    (n_chars desc, doc_id asc tie-break) — the RefinedWeb/C4-style rule
    that stops SEO farms and mirror hosts from dominating a training mix.
    One windowed row_number partitioned by host: parallelism = #hosts
    (10^7+ at crawl scale), per-partition work bounded by per-host crawl
    budget; for a pathological mega-host, pre-cap within each input split
    first (rank <= N per (host, split) keeps <= N x splits candidates)
    then re-rank — same operator, one extra narrow pass."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (docs.withColumn("rnk", F.row_number().over(w).cast("long"))
            .filter(F.col("rnk") <= DCAP_N)
            .select("source", "doc_id", "n_chars", "rnk"))


# --- BPE tokenizer training (bpe.py) ----------------------------------------

BPE_PAIRS_K = 20


def q_bpe_pairs(spark, sf_dir):
    """Step-0 BPE pair statistics: top-K adjacent character pairs over the
    word-frequency table (the argmax input of the first merge). The
    SQL-expressible half of tokenizer training — hash-gated; the iterative
    merge loop is q_bpe_merges (rows-only + pytest replica gate)."""
    from . import bpe

    wf = bpe.word_freq(load(spark, sf_dir, "documents"))
    return (bpe._pair_counts(bpe._init_vocab(wf))
            .orderBy(F.desc("freq"), F.asc("left"), F.asc("right"))
            .limit(BPE_PAIRS_K))


def q_bpe_merges(spark, sf_dir):
    """The learned BPE merge table (N_MERGES greedy merges) — iterative
    argmax, non-SQL-expressible; gated by the sequential-replica identity
    test (test_bpe.py) plus the driver's rows-only check."""
    from . import bpe

    return bpe.train_bpe(load(spark, sf_dir, "documents"))


# --- retrieval evaluation (trec_eval-style metrics, eval.py) ---------------

def _eval_run_qrels(spark, sf_dir):
    """Deterministic synthetic (run, qrels) pair derived from documents by
    pure integer arithmetic — identical in Spark and the DuckDB oracle, no
    engine-specific hash anywhere. 5 pseudo-queries, top-50 run rows each,
    graded qrels for ~2/17 of the corpus."""
    from pyspark.sql import Window

    base = load(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("url"),
        (F.col("doc_id") % 5).cast("string").alias("qid"),
        (((F.col("doc_id") * 37 + 11) % 1000) / 1000.0).alias("score"),
        ((F.col("doc_id") * 13 + 3) % 17).alias("relcode"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("url"))
    run = (base.withColumn("rank", F.row_number().over(w))
           .filter(F.col("rank") <= 50).select("qid", "url", "score"))
    qrels = (base.filter(F.col("relcode") < 2)
             .select("qid", "url",
                     F.when(F.col("relcode") == 0, 2).otherwise(1).alias("rel")))
    return run, qrels


def q_eval_per_query(spark, sf_dir):
    """Per-query AP / P@10 / R@10 / RR / NDCG@10 over the synthetic run
    (eval.per_query_metrics — the engine-side trec_eval)."""
    from .eval import per_query_metrics

    run, qrels = _eval_run_qrels(spark, sf_dir)
    return per_query_metrics(run, qrels, k=10).orderBy("qid")


def q_eval_summary(spark, sf_dir):
    """trec_eval summary row (MAP, mean P@10/R@10, MRR, mean NDCG@10)."""
    from .eval import mean_metrics

    run, qrels = _eval_run_qrels(spark, sf_dir)
    return mean_metrics(run, qrels, k=10)
