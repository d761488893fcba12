"""Single-node pure-Python oracle for rank-identity testing.

Implements *exactly* the reference engine's retrieval semantics over an
in-memory corpus, with formulas cited to the reference source:

- BM25 term score:            QrySopScore.java:78-90
- Indri term score + default: QrySopScore.java:13-26,64-77
- #AND  (min / geo-mean):     QrySopAnd.java:83-169
- #OR   (max / 1-prod(1-s)):  QrySopOr.java:46-151
- #SUM  (sum, BM25 k3 term):  QrySopSum.java:47-129
- #WAND (prod s^(w/W)):       QrySopWAnd.java:86-147
- #WSUM (sum (w/W)s):         QrySopWSum.java:78-128
- #SYN / #NEAR/n / #WINDOW/n: QryIopSyn.java:17-71, QryIopNear.java:60-110,
                              QryIopWindow.java:64-166
- sort: score desc, external-id asc, truncate k: ScoreList.java:90-128

The oracle shares the engine's frozen tokenizer (tokenizer.py) so engine
vs oracle comparisons are exact rank identity (docids AND scores).
Slow and simple on purpose — only used in pytest on small corpora.
"""

from __future__ import annotations

import math
from collections import defaultdict
from dataclasses import dataclass, field


@dataclass
class OracleIndex:
    # (field, term) -> {docid: [positions]}
    postings: dict = field(default_factory=lambda: defaultdict(dict))
    # (field, docid) -> length (incl. stopword slots)
    doclen: dict = field(default_factory=dict)
    # field -> (doc_count, sum_len)
    field_stats: dict = field(default_factory=lambda: defaultdict(lambda: [0, 0]))
    n_docs: int = 0
    ext_ids: dict = field(default_factory=dict)  # docid -> external id (url)

    @classmethod
    def from_docs(cls, docs: list[tuple[str, dict[str, list]]]) -> "OracleIndex":
        """docs: [(url, {field: tokens_with_None_stopwords})]; docid = rank of
        sorted url (same rule as corpus.assign_docids)."""
        idx = cls()
        urls = sorted(u for u, _ in docs)
        rank = {u: i for i, u in enumerate(urls)}
        idx.n_docs = len(urls)
        for url, fields in docs:
            d = rank[url]
            idx.ext_ids[d] = url
            for f, toks in fields.items():
                if not toks:
                    continue
                idx.doclen[(f, d)] = len(toks)
                st = idx.field_stats[f]
                st[0] += 1
                st[1] += len(toks)
                for pos, t in enumerate(toks):
                    if t is None:
                        continue
                    idx.postings[(f, t)].setdefault(d, []).append(pos)
        return idx

    # --- stats ---
    def df(self, f: str, t: str) -> int:
        return len(self.postings.get((f, t), {}))

    def ctf(self, f: str, t: str) -> int:
        return sum(len(p) for p in self.postings.get((f, t), {}).values())

    def avg_len(self, f: str) -> float:
        c, s = self.field_stats[f]
        return s / c if c else 1.0

    def sum_len(self, f: str) -> int:
        return self.field_stats[f][1]

    def get_len(self, f: str, d: int) -> int:
        return self.doclen.get((f, d), 0)


# --- inverted-list algebra (QryIop analog): {docid: [positions]} -----------

def iop_syn(lists: list[dict]) -> dict:
    out: dict[int, list[int]] = {}
    for pl in lists:
        for d, ps in pl.items():
            out.setdefault(d, []).extend(ps)
    return {d: sorted(ps) for d, ps in out.items()}


def iop_near(lists: list[dict], n: int) -> dict:
    """Ordered proximity (QryIopNear.java:60-110): positions strictly
    increasing across args, each gap <= n; emitted position = last arg's;
    matched positions consumed."""
    out: dict[int, list[int]] = {}
    common = set(lists[0])
    for pl in lists[1:]:
        common &= set(pl)
    for d in sorted(common):
        ptrs = [0] * len(lists)
        pls = [pl[d] for pl in lists]
        res = []
        while True:
            if ptrs[0] >= len(pls[0]):
                break
            prev = pls[0][ptrs[0]]
            ok = True
            for i in range(1, len(pls)):
                while ptrs[i] < len(pls[i]) and pls[i][ptrs[i]] <= prev:
                    ptrs[i] += 1
                if ptrs[i] >= len(pls[i]):
                    ok = False
                    break
                cur = pls[i][ptrs[i]]
                if cur - prev > n:
                    ok = False
                    ptrs[0] += 1
                    break
                prev = cur
            if ok:
                res.append(prev)
                for i in range(len(pls)):
                    ptrs[i] += 1
            elif any(p >= len(pl) for p, pl in zip(ptrs, pls)):
                break
        if res:
            out[d] = res
    return out


def iop_window(lists: list[dict], n: int) -> dict:
    """Unordered window (QryIopWindow.java:64-166): one occurrence of each
    arg with max(pos)-min(pos) < n; on failure advance the min iterator;
    emitted position = max; all consumed on match."""
    out: dict[int, list[int]] = {}
    common = set(lists[0])
    for pl in lists[1:]:
        common &= set(pl)
    for d in sorted(common):
        ptrs = [0] * len(lists)
        pls = [pl[d] for pl in lists]
        res = []
        while all(p < len(pl) for p, pl in zip(ptrs, pls)):
            cur = [pl[p] for p, pl in zip(ptrs, pls)]
            lo, hi = min(cur), max(cur)
            if hi - lo < n:
                res.append(hi)
                ptrs = [p + 1 for p in ptrs]
            else:
                i = cur.index(lo)
                ptrs[i] += 1
        if res:
            out[d] = res
    return out


# --- score operators --------------------------------------------------------

def bm25_term_scores(idx: OracleIndex, f: str, pl: dict, df: int,
                     k1: float = 1.2, b: float = 0.75) -> dict[int, float]:
    n = idx.n_docs
    avg = idx.avg_len(f)
    idf = max(0.0, math.log((n - df + 0.5) / (df + 0.5)))
    out = {}
    for d, ps in pl.items():
        tf = len(ps)
        dl = idx.get_len(f, d)
        out[d] = idf * tf / (tf + k1 * ((1.0 - b) + b * dl / avg))
    return out


def indri_term_score(idx: OracleIndex, f: str, tf: int, dl: int, ctf: int,
                     mu: float, lam: float) -> float:
    c = ctf if ctf != 0 else 0.5
    pqc = c / idx.sum_len(f)
    return (1.0 - lam) * ((tf + mu * pqc) / (dl + mu)) + lam * pqc


def topk(scores: dict[int, float], ext_ids: dict[int, str], k: int) -> list[tuple[str, float]]:
    """Reference sort: score desc, external id asc (ScoreList.java:90-105)."""
    rows = [(ext_ids[d], s) for d, s in scores.items()]
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows[:k]


def bm25_bow_query(idx: OracleIndex, terms: list[str], f: str = "body", k: int = 100,
                   k1: float = 1.2, b: float = 0.75) -> list[tuple[str, float]]:
    """#SUM of #SCORE(term): the BM25 bag-of-words path (QrySopSum.java:59-80;
    k3 factor with qtf=1 is 1). Sum in query-term order (fixed float order)."""
    acc: dict[int, float] = defaultdict(float)
    for t in terms:
        pl = idx.postings.get((f, t), {})
        for d, s in bm25_term_scores(idx, f, pl, len(pl), k1, b).items():
            acc[d] += s
    return topk(acc, idx.ext_ids, k)
