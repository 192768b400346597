"""ESet/Bo1 expansion, spelling suggestion, sortable_serialise parity."""

import math
import random
import struct

import pytest


def test_eset_bo1_matches_oracle(spark, index, oracle):
    from xapian_spark.operators.expand import eset_bo1, eset_bo1_oracle

    rset = [1, 2, 3, 10, 57]
    got = [(r["term"], r["wt"]) for r in eset_bo1(spark, index, rset, 10).collect()]
    want = eset_bo1_oracle(oracle.ix, rset, 10)
    assert [t for t, _ in got] == [t for t, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert abs(a - b) < 1e-9


def test_eset_prob_matches_oracle(spark, index, oracle):
    """ProbEWeight (expand/probeweight.cc) vs the pure-Python oracle, at
    the default expand_k=0 and a non-zero k (which exercises the
    doclen/avlen multiplier accumulate path, expandweight.h:84)."""
    from xapian_spark.operators.expand import eset_prob, eset_prob_oracle

    rset = [1, 2, 3, 10, 57]
    for k in (0.0, 1.5):
        got = [
            (r["term"], r["wt"])
            for r in eset_prob(spark, index, rset, 10, expand_k=k).collect()
        ]
        want = eset_prob_oracle(oracle.ix, rset, 10, expand_k=k)
        assert [t for t, _ in got] == [t for t, _ in want], f"k={k}"
        for (_, a), (_, b) in zip(got, want):
            assert abs(a - b) < 1e-9


def test_eset_excludes_terms(spark, index, oracle):
    from xapian_spark.operators.expand import eset_bo1, eset_bo1_oracle

    rset = [1, 2, 3]
    excl = [t for t, _ in eset_bo1_oracle(oracle.ix, rset, 2)]
    got = [r["term"] for r in eset_bo1(spark, index, rset, 10, exclude_terms=excl).collect()]
    assert not (set(got) & set(excl))


def test_spelling_suggestion(spark, index, oracle):
    from xapian_spark.operators.spelling import (
        edit_distance,
        suggest,
        suggest_exhaustive,
        trigram_table,
    )

    tri = trigram_table(index.dictionary).persist()
    # typo one edit from a real indexed term
    assert suggest(spark, index, "binary_saerch", trigrams=tri) == "binary_search"
    assert suggest(spark, index, "retrun", trigrams=tri) == "return"
    # no suggestion for garbage beyond max distance
    assert suggest(spark, index, "qqqqqqqq", trigrams=tri) is None
    # exhaustive path agrees on the pick (OSA metric)
    row = suggest_exhaustive(spark, index, "retrun").collect()[0]
    assert row["term"] == "return" and row["dist"] == edit_distance("retrun", "return")
    tri.unpersist()


def test_edit_distance_reference_cases():
    from xapian_spark.operators.spelling import edit_distance as d

    assert d("", "") == 0
    assert d("abc", "abc") == 0
    assert d("abc", "acb") == 1  # transposition = 1 (OSA)
    assert d("hsah", "hash") == 1
    assert d("abc", "") == 3
    assert d("kitten", "sitting") == 3


def test_sortable_serialise_roundtrip_and_order():
    from xapian_spark.functions.sortable import (
        sortable_serialise as S,
        sortable_unserialise as U,
    )

    vals = [0.0, 1.0, -1.0, 0.5, -0.5, 3.14159, -2.71828, 1e300, -1e300,
            1e-300, -1e-300, math.inf, -math.inf, 7.0, 8.0]
    rng = random.Random(11)
    for _ in range(5000):
        vals.append(struct.unpack("d", struct.pack("Q", rng.getrandbits(64)))[0])
    fin = [v for v in vals if not math.isnan(v)]
    for v in fin:
        got = U(S(v))
        assert got == v or (math.isinf(v) and math.isinf(got) and (v > 0) == (got > 0))
    ordered = sorted({v for v in fin if math.isfinite(v)})
    enc = [S(v) for v in ordered]
    assert all(a < b for a, b in zip(enc, enc[1:]))


def test_sortable_known_bytes():
    # zero encodes as a single 0x80 byte; -inf empty; +inf nine 0xff
    from xapian_spark.functions.sortable import sortable_serialise as S

    assert S(0.0) == b"\x80"
    assert S(-math.inf) == b""
    assert S(math.inf) == b"\xff" * 9


def test_edit_distance_query_node(spark, index, matcher, oracle):
    """Q.EditDistance expands like OP_WILDCARD and scores identically to
    the oracle's expansion (api/queryinternal.cc:317-380)."""
    from tests.conftest import assert_mset_equal
    from xapian_spark.plans import query as Q

    for combiner in ("or", "synonym", "max"):
        q = Q.EditDistance("returm", max_edit_distance=1, combiner=combiner)
        got = matcher.mset_df(q, 10).collect()
        want = oracle.mset(q, 10)
        assert_mset_equal(got, want)


def test_fuzzy_parser_flag():
    from xapian_spark.plans import query as Q
    from xapian_spark.plans.parser import DEFAULT_FLAGS, FLAG_FUZZY, QueryParser

    p = QueryParser(flags=DEFAULT_FLAGS | FLAG_FUZZY)
    q = p.parse_query("return~1")
    assert isinstance(q, Q.EditDistance)
    assert q.target == "return" and q.max_edit_distance == 1
    q = p.parse_query("return~")
    assert isinstance(q, Q.EditDistance) and q.max_edit_distance == 2
    # without the flag, '~' stays part of the word (tokenizer strips it)
    p2 = QueryParser()
    q2 = p2.parse_query("return~1")
    assert not isinstance(q2, Q.EditDistance)
