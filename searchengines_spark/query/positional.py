"""Per-document positional operators: #NEAR/n and #WINDOW/n matching.

Pointer-walk algorithms mirroring the reference's location iterators
(QryIopNear.java:60-110 for ordered proximity, QryIopWindow.java:64-166 for
unordered windows). These run inside Arrow-batched pandas UDFs over candidate
docs that already passed the conjunctive docid join — so the per-doc Python
cost is paid only on docs containing ALL argument terms.
"""

from __future__ import annotations


def near_positions(pls: list[list[int]], n: int) -> list[int]:
    """Ordered: one occurrence of each arg, positions strictly increasing,
    each adjacent gap <= n. Emits the LAST arg's position; consumes all
    matched positions (QryIopNear.java:60-110)."""
    k = len(pls)
    ptrs = [0] * k
    out: list[int] = []
    while ptrs[0] < len(pls[0]):
        prev = pls[0][ptrs[0]]
        matched = True
        for i in range(1, k):
            while ptrs[i] < len(pls[i]) and pls[i][ptrs[i]] <= prev:
                ptrs[i] += 1
            if ptrs[i] >= len(pls[i]):
                return out
            cur = pls[i][ptrs[i]]
            if cur - prev > n:
                matched = False
                ptrs[0] += 1
                break
            prev = cur
        if matched:
            out.append(prev)
            for i in range(k):
                ptrs[i] += 1
    return out


def window_positions(pls: list[list[int]], n: int) -> list[int]:
    """Unordered: one occurrence of each arg with max-min < n. Emits the max
    position; on failure advances the min iterator; consumes all on match
    (QryIopWindow.java:64-166)."""
    k = len(pls)
    ptrs = [0] * k
    out: list[int] = []
    while all(ptrs[i] < len(pls[i]) for i in range(k)):
        cur = [pls[i][ptrs[i]] for i in range(k)]
        lo, hi = min(cur), max(cur)
        if hi - lo < n:
            out.append(hi)
            for i in range(k):
                ptrs[i] += 1
        else:
            ptrs[cur.index(lo)] += 1
    return out


def syn_positions(pls: list[list[int]]) -> list[int]:
    """Union of positions, sorted (QryIopSyn.java:17-71)."""
    out: list[int] = []
    for p in pls:
        out.extend(p)
    return sorted(out)
