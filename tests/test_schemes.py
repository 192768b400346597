"""Alternative weighting schemes: engine vs oracle parity (api_weight.cc
analog — per-scheme numeric checks)."""

import pytest

from tests.conftest import N_DOCS, assert_mset_equal
from xapian_spark.functions.weights import (
    BoolScheme,
    CoordScheme,
    TfIdfScheme,
    TradScheme,
)
from xapian_spark.plans import query as Q

SCHEMES = {
    "tfidf": lambda: TfIdfScheme(),
    "tfidf_log_prob": lambda: TfIdfScheme(wdf_norm="log", idf_norm="prob"),
    "trad": lambda: TradScheme(),
    "coord": lambda: CoordScheme(),
    "bool": lambda: BoolScheme(),
}

QUERIES = [
    Q.Term("binary_search"),
    Q.Or([Q.Term("binary_search"), Q.Term("return")]),
    Q.And([Q.Term("return"), Q.Term("if")]),
    Q.Synonym([Q.Term("binary_search"), Q.Term("merge_sort")]),
]


@pytest.mark.parametrize("name", sorted(SCHEMES))
def test_scheme_matches_oracle(name, spark, index, oracle):
    from xapian_spark.operators.matcher import Matcher
    from xapian_spark.oracle import OracleMatcher

    scheme = SCHEMES[name]()
    m = Matcher(spark, index, scheme=scheme)
    om = OracleMatcher(oracle.ix, scheme=scheme)
    for q in QUERIES:
        got = m.mset_df(q, 10).collect()
        want = om.mset(q, 10)
        assert_mset_equal(got, want)


def test_trad_equals_bm25_mapping(spark, index, oracle):
    """TradWeight(k) ≡ BM25Weight(k,0,0,1,0) — weight.h:1292-1309."""
    from xapian_spark.functions.weights import BM25Params, BM25Scheme
    from xapian_spark.operators.matcher import Matcher

    q = Q.Or([Q.Term("binary_search"), Q.Term("return")])
    a = Matcher(spark, index, scheme=TradScheme(1.0)).mset_df(q, 10).collect()
    b = (
        Matcher(
            spark,
            index,
            scheme=BM25Scheme(BM25Params(k1=1.0, k2=0.0, k3=1.0, b=1.0, min_normlen=0.0)),
        )
        .mset_df(q, 10)
        .collect()
    )
    assert [(r["doc_id"], r["weight"]) for r in a] == [
        (r["doc_id"], r["weight"]) for r in b
    ]
