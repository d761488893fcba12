"""Retrieval models (parameter holders), mirroring RetrievalModel*.java."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class BM25:
    k1: float = 1.2
    b: float = 0.75
    k3: float = 0.0
    name: str = "bm25"


@dataclass(frozen=True)
class Indri:
    mu: float = 2500.0
    lam: float = 0.4
    name: str = "indri"


@dataclass(frozen=True)
class RankedBoolean:
    name: str = "rankedboolean"


@dataclass(frozen=True)
class UnrankedBoolean:
    name: str = "unrankedboolean"


def make_model(name: str, **kw):
    n = name.lower()
    if n == "bm25":
        return BM25(**kw)
    if n == "indri":
        return Indri(**kw)
    if n == "rankedboolean":
        return RankedBoolean()
    if n == "unrankedboolean":
        return UnrankedBoolean()
    raise ValueError(f"unknown retrieval model {name}")
