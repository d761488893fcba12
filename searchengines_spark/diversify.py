"""Search-result diversification: xQuAD and PM2.

Faithful to the reference (QryEval.java:231-487):

- normalization (QueryAndIntents.normalize, 102-171): truncate query +
  intent rankings to maxInputDocs; intent scores only count for docs present
  in the query ranking; if ANY score > 1.0, divide everything by
  largest = max(sum of query scores, max per-intent restricted sum).
- xQuAD (453-481): greedy pick argmax of
  (1-λ)·P(d|q) + λ·Σ_i P(q_i|q)·P(d|q_i)·Π_{chosen}(1-P(c|q_i)),
  uniform P(q_i|q) = 1/n.
- PM2 (393-451): quotient q_j = v_j/(2 s_j + 1), v_j = limit/n; pick best
  intent; score = λ·q_best·P(d|best) + (1-λ)·Σ_{j≠best} q_j·P(d|j);
  update s_j += P(best_doc|j)/Σ_j P(best_doc|j); then the monotone fixup
  ×0.999 exactly as written in the reference (prev is set once, a quirk we
  replicate).

Deviations (documented): the reference breaks score ties via a
TreeMap<Double,..> keyed on score, whose winner among equal scores depends
on HashSet iteration order (JVM-internal, not reproducible). We tie-break on
the earlier initial-rank index — deterministic. The reference divides by a
zero bestDocIntentSum (NaN propagation) when the chosen doc covers no
intent; we skip the s-update in that case.

The greedy loops are inherently sequential over <= maxInputDocs candidates
per query; parallelism is ACROSS queries (applyInPandas over qid groups).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def _prepare(query_list, intents, max_input):
    """normalize() replica. Returns (qdocs [(docid, score)], iscore:
    {docid: [per-intent score]}, largest)."""
    limit = min(max_input, len(query_list))
    qdocs = query_list[:limit]
    n_int = len(intents)
    qdoc_set = {d for d, _ in qdocs}
    iscore = {d: [0.0] * n_int for d in qdoc_set}
    needs = any(s > 1.0 for _, s in qdocs)
    largest = float("-inf")
    # intents truncate to the SAME limit as the query list
    # (normalize(), QryEval.java:104-112)
    for j, ranking in enumerate(intents):
        s_sum = 0.0
        for d, s in ranking[:limit]:
            if d in qdoc_set:
                if s > 1.0:
                    needs = True
                s_sum += s
                iscore[d][j] = s
        largest = max(largest, s_sum)
    largest = max(largest, sum(s for _, s in qdocs))
    if not needs:
        largest = 1.0
    return qdocs, iscore, largest


def xquad(query_list, intents, lam, max_input, max_result):
    """query_list: [(docid, score)] sorted; intents: list of such lists."""
    qdocs, iscore, largest = _prepare(query_list, intents, max_input)
    n_int = len(intents)
    if not qdocs:
        return []
    pqiq = 1.0 / n_int if n_int else 0.0
    remaining = list(range(len(qdocs)))
    chosen: list[int] = []  # docids
    result = []
    while len(result) < max_result and remaining:
        best_score, best_pos = None, None
        for pos, i in enumerate(remaining):
            docid, qs = qdocs[i]
            rel = (1.0 - lam) * (qs / largest)
            int_sum = 0.0
            for j in range(n_int):
                div = pqiq * (iscore[docid][j] / largest)
                for c in chosen:
                    div *= 1.0 - (iscore[c][j] / largest)
                int_sum += div
            score = rel + lam * int_sum
            if best_score is None or score > best_score:
                best_score, best_pos = score, pos
        i = remaining.pop(best_pos)
        docid = qdocs[i][0]
        chosen.append(docid)
        result.append((docid, best_score))
    return result


def pm2(query_list, intents, lam, max_input, max_result):
    qdocs, iscore, largest = _prepare(query_list, intents, max_input)
    n_int = len(intents)
    if not qdocs or n_int == 0:
        return []
    limit = len(qdocs)
    v = [(1.0 / n_int) * limit] * n_int
    s = [0.0] * n_int
    remaining = list(range(limit))
    result = []
    while len(result) < max_result and remaining:
        q = [v[j] / (2.0 * s[j] + 1.0) for j in range(n_int)]
        best_j = max(range(n_int), key=lambda j: (q[j], -j))
        best_score, best_pos = None, None
        for pos, i in enumerate(remaining):
            docid = qdocs[i][0]
            cover = lam * q[best_j] * (iscore[docid][best_j] / largest)
            other = sum(q[j] * (iscore[docid][j] / largest)
                        for j in range(n_int) if j != best_j)
            score = cover + (1.0 - lam) * other
            if best_score is None or score > best_score:
                best_score, best_pos = score, pos
        i = remaining.pop(best_pos)
        docid = qdocs[i][0]
        result.append((docid, best_score))
        tot = sum(iscore[docid][j] / largest for j in range(n_int))
        if tot > 0.0:
            for j in range(n_int):
                s[j] += (iscore[docid][j] / largest) / tot
    # monotone fixup, replicated exactly (prev set once — reference quirk,
    # QryEval.java:441-451)
    out = list(result)
    prev = None
    for i, (d, sc) in enumerate(out):
        if prev is None:
            prev = sc
        elif sc >= prev:
            out[i] = (d, sc * 0.999)
    return out


DIV_SCHEMA = T.StructType([
    T.StructField("qid", T.StringType(), False),
    T.StructField("docid", T.LongType(), False),
    T.StructField("score", T.DoubleType(), False),
    T.StructField("rank", T.IntegerType(), False),
])


def diversify_df(rankings: DataFrame, algorithm: str, lam: float,
                 max_input: int, max_result: int) -> DataFrame:
    """rankings: (qid, intent, docid, score) where intent 0 = the query
    ranking, 1..n = intents; rows need not be pre-sorted. Greedy per query,
    parallel across queries via applyInPandas."""
    fn = pm2 if algorithm.lower() == "pm2" else xquad

    def per_query(key, pdf: pd.DataFrame) -> pd.DataFrame:
        qid = key[0]
        def ranked(sub):
            sub = sub.sort_values(["score", "docid"], ascending=[False, True])
            return list(zip(sub["docid"].astype(int), sub["score"].astype(float)))
        qlist = ranked(pdf[pdf["intent"] == 0])
        n_int = int(pdf["intent"].max())
        intents = [ranked(pdf[pdf["intent"] == j]) for j in range(1, n_int + 1)]
        res = fn(qlist, intents, lam, max_input, max_result)
        return pd.DataFrame(
            [(qid, d, s, i + 1) for i, (d, s) in enumerate(res)],
            columns=["qid", "docid", "score", "rank"],
        )

    return rankings.groupBy("qid").applyInPandas(per_query, DIV_SCHEMA)
