"""Recursive-descent parser for the structured prefix query language.

Grammar and semantics follow the reference parser
(/root/reference/QryEval/QryParser.java):

- operators: #AND #OR #SUM #WAND #WSUM #SYN #NEAR/n #WINDOW/n
  (createOperator, QryParser.java:76-132), case-insensitive;
- bare tokens are terms, optional ``.field`` suffix with field in
  {body,title,url,keywords,inlink} (createTerms, QryParser.java:141-179);
- #WAND/#WSUM args alternate weight then operand (QryParser.java:317-357);
- query terms pass through the same tokenize pipeline as documents; stopword
  terms vanish, and their weights with them (QryParser.java:141-179);
- post-parse optimize: remove emptied operators, collapse single-arg
  operators except SCORE (optimizeQuery, QryParser.java:230-272);
- implicit SCORE inserted between a SOP parent and IOP child
  (Qry.java:140-149);
- a raw query with no operator is wrapped in the model default op: #SUM for
  BM25, #AND otherwise (QryEval.java:1152-1156, RetrievalModelBM25.java:22-24).
"""

from __future__ import annotations

import re

from ..tokenizer import tokenize_query_term
from . import ast

_KNOWN_FIELDS = {"body", "title", "url", "keywords", "inlink"}
_OP_RE = re.compile(r"#(\w+)(?:/(\d+))?$", re.I)


def _tokenize_query_string(q: str) -> list[str]:
    # split into '(' ')' and whitespace-separated tokens
    q = q.replace("(", " ( ").replace(")", " ) ")
    return [t for t in q.split() if t]


class QueryParser:
    def __init__(self, model: str = "bm25", stemmer: str = "s"):
        # stemmer must be the INDEX's pinned stemmer (MANIFEST "stemmer")
        # so query terms stem exactly like the documents did
        self.model = model.lower()
        self.stemmer = stemmer

    def parse(self, query: str) -> ast.Node | None:
        toks = _tokenize_query_string(query)
        if not toks:
            return None
        # wrap in default operator if not already a single operator expr
        if not toks[0].startswith("#"):
            default = "#sum" if self.model == "bm25" else "#and"
            toks = [default, "("] + toks + [")"]
        node, rest = self._parse_expr(toks)
        if rest:
            raise ValueError(f"trailing tokens: {rest}")
        node = self._optimize(node)
        if node is not None:
            node = self._insert_scores(node, parent_is_sop=True)
        return node

    # -- recursive descent ---------------------------------------------------
    def _parse_expr(self, toks: list[str]):
        head = toks[0]
        m = _OP_RE.match(head)
        if not m:
            raise ValueError(f"expected operator, got {head}")
        name = m.group(1).lower()
        n = int(m.group(2)) if m.group(2) else None
        if toks[1] != "(":
            raise ValueError(f"expected ( after {head}")
        rest = toks[2:]
        weighted = name in ("wand", "wsum")
        args, weights = [], []
        expect_weight = weighted
        while rest and rest[0] != ")":
            t = rest[0]
            if expect_weight:
                weights.append(float(t))
                rest = rest[1:]
                expect_weight = False
                continue
            if t.startswith("#"):
                child, rest = self._parse_expr(rest)
                if child is not None:
                    args.append(child)
                elif weighted:
                    weights.pop()
            else:
                rest = rest[1:]
                term_node = self._make_term(t)
                if term_node is not None:
                    args.append(term_node)
                elif weighted:
                    weights.pop()  # stopword term: weight vanishes too
            expect_weight = weighted
        if not rest:
            raise ValueError("missing )")
        rest = rest[1:]  # consume )
        node = self._make_op(name, n, args, weights)
        return node, rest

    def _make_term(self, tok: str) -> ast.Term | None:
        field = ast.DEFAULT_FIELD
        if "." in tok:
            base, _, suffix = tok.rpartition(".")
            if suffix.lower() in _KNOWN_FIELDS and base:
                field = suffix.lower()
                tok = base
        stem = tokenize_query_term(tok, stemmer=self.stemmer)
        if stem is None:
            return None
        return ast.Term(stem, field)

    def _make_op(self, name: str, n: int | None, args: list, weights: list):
        if name == "and":
            return ast.And(args)
        if name == "or":
            return ast.Or(args)
        if name == "sum":
            return ast.Sum(args)
        if name == "syn":
            return ast.Syn(args)
        if name == "near":
            return ast.Near(n or 1, args)
        if name == "window":
            return ast.Window(n or 1, args)
        if name == "wand":
            return ast.Wand(weights, args)
        if name == "wsum":
            return ast.Wsum(weights, args)
        raise ValueError(f"unknown operator #{name}")

    # -- optimize (QryParser.java:230-272) ------------------------------------
    def _optimize(self, node: ast.Node) -> ast.Node | None:
        if isinstance(node, ast.Term):
            return node
        new_args, new_weights = [], []
        weighted = isinstance(node, (ast.Wand, ast.Wsum))
        for i, a in enumerate(node.args):
            oa = self._optimize(a)
            if oa is not None:
                new_args.append(oa)
                if weighted:
                    new_weights.append(node.weights[i])
        if not new_args:
            return None
        if len(new_args) == 1 and not isinstance(node, ast.Near | ast.Window):
            # single-arg collapse (NEAR/WINDOW of one arg degrade to the arg
            # as well in the reference optimizer)
            return new_args[0]
        if len(new_args) == 1:
            return new_args[0]
        node.args = new_args
        if weighted:
            node.weights = new_weights
        return node

    # -- implicit SCORE insertion (Qry.java:140-149) ---------------------------
    def _insert_scores(self, node: ast.Node, parent_is_sop: bool) -> ast.Node:
        if isinstance(node, ast.IOP_TYPES):
            if parent_is_sop:
                return ast.Score(node)
            return node
        node.args = [
            self._insert_scores(a, parent_is_sop=not isinstance(node, ast.Score))
            for a in node.args
        ]
        return node
