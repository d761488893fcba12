"""Parser robustness: malformed input raises clear errors; stopword/empty
operators vanish with their weights (QryParser.java:141-179, 230-272)."""

import pytest

from searchengines_spark.query import ast
from searchengines_spark.query.parser import QueryParser


@pytest.mark.parametrize("bad", [
    "#AND( x y",            # missing )
    "#AND x y )",           # missing (
    "#NEAR/x( a b )",       # non-numeric /n
    "#BOGUS( x )",          # unknown operator
    "#AND( x ) y",          # trailing tokens
])
def test_malformed_raises(bad):
    with pytest.raises(ValueError):
        QueryParser("bm25").parse(bad)


def test_empty_and_stopword_queries_are_none():
    p = QueryParser("bm25")
    assert p.parse("") is None
    assert p.parse("the of and") is None          # all stopwords
    assert p.parse("#AND()") is None              # empty operator
    assert p.parse("#NEAR/2( the of )") is None   # emptied by stopwords


def test_dangling_weight_collapses():
    # trailing weight with no operand: surviving single arg collapses to its
    # score; the orphan weight vanishes (single-arg collapse,
    # QryParser.java:262-268)
    node = QueryParser("indri").parse("#WAND( 0.5 apple 0.7 )")
    assert isinstance(node, ast.Score)
    assert node.arg == ast.Term("apple", "body")


def test_stopword_arg_drops_its_weight():
    # 'the' vanishes WITH its 0.9 weight; remaining weights renormalize at
    # scoring time over the surviving args
    node = QueryParser("indri").parse("#WSUM( 0.9 the 0.3 apple 0.2 banana )")
    assert isinstance(node, ast.Wsum)
    assert node.weights == [0.3, 0.2]
    assert len(node.args) == 2


def test_field_suffix_and_default():
    node = QueryParser("bm25").parse("apple.title banana")
    terms = [(a.arg.term, a.arg.field) for a in node.args]
    assert terms == [("apple", "title"), ("banana", "body")]
