"""QueryParser tests (api_queryparser.cc analog — parse → expected tree)."""

import pytest

from xapian_spark.plans import query as Q
from xapian_spark.plans.parser import DEFAULT_FLAGS, FLAG_WILDCARD, QueryParser

P = QueryParser()


def test_default_op_or():
    q = P.parse_query("hash join")
    assert isinstance(q, Q.Or)
    assert [c.term for c in q.children] == ["hash", "join"]


def test_boolean_ops():
    assert isinstance(P.parse_query("hash AND join"), Q.And)
    assert isinstance(P.parse_query("hash AND NOT join"), Q.AndNot)
    assert isinstance(P.parse_query("hash NOT join"), Q.AndNot)
    q = P.parse_query("a OR b XOR c")
    assert isinstance(q, Q.Or)
    assert isinstance(q.children[1], Q.Xor)


def test_precedence_or_lowest():
    # OR < XOR < AND (queryparser.lemony:2231-2234)
    q = P.parse_query("a AND b OR c")
    assert isinstance(q, Q.Or)
    assert isinstance(q.children[0], Q.And)


def test_phrase_and_near():
    q = P.parse_query('"binary search"')
    assert isinstance(q, Q.Phrase) and q.window == 2
    # reference window math (queryparser.lemony:2041-2045,2155-2173):
    # window = (width - 1) + #terms, width defaulting to 10
    q = P.parse_query("hash NEAR/5 join")
    assert isinstance(q, Q.Near) and q.window == 6
    q = P.parse_query("hash NEAR join")
    assert isinstance(q, Q.Near) and q.window == 11
    q = P.parse_query("hash ADJ join")
    assert isinstance(q, Q.Phrase) and q.window == 11
    q = P.parse_query("a NEAR b NEAR c")
    assert isinstance(q, Q.Near) and q.window == 12


def test_lovehate():
    q = P.parse_query("+req opt -ban")
    assert isinstance(q, Q.AndNot)
    assert isinstance(q.left, Q.AndMaybe)
    assert q.left.left.term == "req"
    assert q.right.term == "ban"


def test_parens():
    q = P.parse_query("(a OR b) AND c")
    assert isinstance(q, Q.And)
    assert isinstance(q.children[0], Q.Or)


def test_term_production_uses_indexer_tokenizer():
    assert P.parse_query("Don’t").term == "don't"
    assert P.parse_query("C++").term == "c++"
    assert P.parse_query("U.N.C.L.E.").term == "uncle"


def test_wildcard_flag():
    pw = QueryParser(flags=DEFAULT_FLAGS | FLAG_WILDCARD)
    q = pw.parse_query("bin*")
    assert isinstance(q, Q.Wildcard) and q.pattern == "bin*"
    # without the flag, '*' is stripped by tokenization → plain term
    assert isinstance(P.parse_query("bin*"), Q.Term)


def test_empty_and_punct():
    assert isinstance(P.parse_query(""), Q.MatchNothing)
    assert isinstance(P.parse_query("!!! ???"), Q.MatchNothing)


def test_multiword_token_becomes_phrase():
    q = P.parse_query("e.g.x")  # tokenizes to multiple terms
    assert isinstance(q, Q.Phrase)


def test_pure_hate_raises():
    with pytest.raises(ValueError):
        P.parse_query("-banned")
