"""Pseudo-relevance feedback: Indri query expansion.

Reference semantics (QryEval.java:1218-1306, getExpansionTermIndri): for
every term t in the top-N docs of an initial ranking,

    score_t = idf_t * sum_d score_d * (tf_{t,d} + mu*ptc_t) / (doclen_d + mu)

summed over the top docs INCLUDING docs where tf=0 (the unseen-term mass,
which the reference accumulates incrementally via ``sumOfPrevDocs``), with
idf = ln(fieldlen/ctf) and ptc = ctf/fieldlen. Algebraically this splits:

    score_t = idf_t * ( sum_{d: t in d} score_d * tf / (dl_d + mu)
                        + ptc_t * mu * S ),   S = sum_d score_d / (dl_d + mu)

which is one groupBy over the forward index joined with broadcast doc scores
— no per-doc loop. Terms containing '.'/','/non-ASCII are skipped
(QryEval.java:1256-1259). Expansion list sorts score desc, term asc
(ExpansionTermList.java:69-86); the learned query lists terms lowest-score
first (getLearnedQuery iterates the list in reverse, QryEval.java:1188-1201);
final query = #WAND( w original (1-w) learned ) (QryEval.java:1203-1215).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .index.build import IndexReader


def expansion_terms(reader: IndexReader, initial: list[tuple[int, float]],
                    num_docs: int, num_terms: int, mu: float,
                    field: str = "body") -> list[tuple[str, float]]:
    """initial: [(docid, score)] ranked. Returns [(term, score)] top
    num_terms, sorted score desc / term asc."""
    top = initial[:num_docs]
    if not top:
        return []
    fieldlen = float(reader.field_stats[field][1])
    spark = reader.spark
    docids = [d for d, _ in top]
    dl_rows = (
        reader.doc_lens()
        .filter((F.col("field") == field) & F.col("docid").isin(docids))
        .collect()
    )
    dls = {int(r["docid"]): float(r["len"]) for r in dl_rows}
    # skip doclen==0 docs when mu==0 (QryEval.java:1249-1251)
    top = [(d, s) for d, s in top if not (dls.get(d, 0.0) == 0.0 and mu == 0.0)]
    if not top:
        return []
    S = sum(s / (dls.get(d, 0.0) + mu) for d, s in top)

    sdf = spark.createDataFrame(
        [(d, s, dls.get(d, 0.0)) for d, s in top], ["docid", "dscore", "dl"]
    )
    part1 = (
        reader.doc_terms()
        .filter((F.col("field") == field) & F.col("docid").isin(docids))
        .join(F.broadcast(sdf), "docid")
        .groupBy("term")
        .agg(F.sum(F.col("dscore") * F.col("tf") / (F.col("dl") + F.lit(mu))).alias("p1"))
    )
    stats = (
        reader._term_stats.filter(F.col("field") == field).select("term", "ctf")
    )
    scored = (
        part1.join(stats, "term")
        .withColumn("idf", F.log(F.lit(fieldlen) / F.col("ctf")))
        .withColumn("ptc", F.col("ctf") / F.lit(fieldlen))
        .select(
            "term",
            (F.col("idf") * (F.col("p1") + F.col("ptc") * F.lit(mu) * F.lit(S))).alias("score"),
        )
        .filter(~F.col("term").rlike(r"[.,]") & F.col("term").rlike(r"^[\x00-\x7F]+$"))
        .orderBy(F.desc("score"), F.asc("term"))
        .limit(num_terms)
    )
    return [(r["term"], float(r["score"])) for r in scored.collect()]


def expansion_terms_batch(reader: IndexReader,
                          initials: dict[str, list[tuple[int, float]]],
                          num_docs: int, num_terms: int, mu: float,
                          field: str = "body") -> dict[str, list[tuple[str, float]]]:
    """Batched twin of expansion_terms: EVERY query's expansion scoring in
    ONE Spark job (the per-query formula is one groupBy — QryEval.java's
    per-query loop at 1218-1306 becomes a groupBy(qid, term) over the union
    of every query's top docs, with the per-query unseen-mass constant S
    joined in as a tiny broadcast table). Driver-side state is bounded by
    n_queries * num_docs, never the corpus.

    initials: qid -> [(docid, score)] ranked. Returns qid -> [(term, score)]
    top num_terms each, sorted score desc / term asc — same per-qid output
    as expansion_terms."""
    from pyspark.sql import Window

    tops = {qid: lst[:num_docs] for qid, lst in initials.items() if lst}
    out: dict[str, list[tuple[str, float]]] = {qid: [] for qid in initials}
    if not tops:
        return out
    fieldlen = float(reader.field_stats[field][1])
    spark = reader.spark
    all_ids = sorted({d for lst in tops.values() for d, _ in lst})
    dl_rows = (
        reader.doc_lens()
        .filter((F.col("field") == field) & F.col("docid").isin(all_ids))
        .collect()
    )
    dls = {int(r["docid"]): float(r["len"]) for r in dl_rows}
    sdf_rows, s_rows = [], []
    for qid, lst in tops.items():
        # skip doclen==0 docs when mu==0 (QryEval.java:1249-1251)
        lst = [(d, s) for d, s in lst if not (dls.get(d, 0.0) == 0.0 and mu == 0.0)]
        if not lst:
            continue
        s_rows.append((qid, sum(s / (dls.get(d, 0.0) + mu) for d, s in lst)))
        sdf_rows.extend((qid, d, s, dls.get(d, 0.0)) for d, s in lst)
    if not sdf_rows:
        return out
    sdf = spark.createDataFrame(sdf_rows, ["qid", "docid", "dscore", "dl"])
    s_df = spark.createDataFrame(s_rows, ["qid", "S"])
    part1 = (
        reader.doc_terms()
        .filter((F.col("field") == field) & F.col("docid").isin(all_ids))
        .join(F.broadcast(sdf), "docid")
        .groupBy("qid", "term")
        .agg(F.sum(F.col("dscore") * F.col("tf") / (F.col("dl") + F.lit(mu))).alias("p1"))
    )
    stats = (
        reader._term_stats.filter(F.col("field") == field).select("term", "ctf")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("term"))
    scored = (
        part1.join(stats, "term").join(F.broadcast(s_df), "qid")
        .withColumn("idf", F.log(F.lit(fieldlen) / F.col("ctf")))
        .withColumn("ptc", F.col("ctf") / F.lit(fieldlen))
        .select(
            "qid", "term",
            (F.col("idf") * (F.col("p1") + F.col("ptc") * F.lit(mu) * F.col("S"))).alias("score"),
        )
        .filter(~F.col("term").rlike(r"[.,]") & F.col("term").rlike(r"^[\x00-\x7F]+$"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= num_terms)
    )
    for r in sorted(scored.collect(), key=lambda r: (r["qid"], r["rn"])):
        out[r["qid"]].append((r["term"], float(r["score"])))
    return out


def learned_query(terms: list[tuple[str, float]]) -> str:
    """#WAND with terms lowest-score first (QryEval.java:1188-1201)."""
    parts = [f"{s} {t}" for t, s in reversed(terms)]
    return "#WAND ( " + " ".join(parts) + " )"


def expanded_query(original: str, learned: str, w: float) -> str:
    return f"#WAND ( {w} {original} {1.0 - w} {learned} )"


def write_expansion_list(terms: list[tuple[str, float]], path: str) -> None:
    """The ``.qryOut`` expansion-term artifact (printExpansionList,
    QryEval.java:1483-1506; SURVEY §5 HW3 row): one ``Score: <s>, term: <t>``
    line per expansion term, appended so a multi-query run accumulates in
    query order. Term order is as produced (score desc, term asc)."""
    with open(path, "a") as f:
        for t, s in terms:
            f.write(f"Score: {s}, term: {t}\n")


def write_expanded_query(qid: str, learned: str, path: str) -> None:
    """``qid: <learned query>`` append (printExpandedQuery,
    QryEval.java:1469-1481, wired to prf:expansionQueryFile at 1409-1413)."""
    with open(path, "a") as f:
        f.write(f"{qid}: {learned}\n")


def prf_search(engine, query: str, model: str = "indri", k: int = 100,
               num_docs: int = 10, num_terms: int = 10, prf_mu: float = 0.0,
               orig_weight: float = 0.5, field: str = "body",
               initial_ranking: list[tuple[str, float]] | None = None,
               **model_kw):
    """Full PRF loop: initial ranking (run fresh, or supplied from a TREC
    ranking file — QryEval.java:1388-1416 supports both) -> expansion ->
    rewritten query -> final ranking. Returns (final_df, expansion_terms,
    expanded_query_string)."""
    # the rewritten #WAND embeds the original query as ONE operand, so a bare
    # bag-of-words query must be wrapped in the model default op first
    # (the reference's .qry inputs are always operator-wrapped in PRF runs)
    if not query.strip().startswith("#"):
        query = ("#SUM( " if model == "bm25" else "#AND( ") + query + " )"
    if initial_ranking is not None:
        urls = initial_ranking[:num_docs]
    else:
        initial = engine.search(query, model=model, k=num_docs, **model_kw)
        urls = [(r["url"], r["score"]) for r in initial.collect()]
    url_df = engine.reader.docid_url_map()
    ranked_ids = {r["url"]: int(r["docid"]) for r in
                  url_df.filter(F.col("url").isin([u for u, _ in urls])).collect()}
    init_scores = [(ranked_ids[u], s) for u, s in urls if u in ranked_ids]
    terms = expansion_terms(engine.reader, init_scores, num_docs, num_terms, prf_mu, field)
    q = expanded_query(query, learned_query(terms), orig_weight)
    return engine.search(q, model=model, k=k, **model_kw), terms, q
