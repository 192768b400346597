"""Percent scores (mset.cc:449-480), sort-by-value, stopwords (STOP_ALL)."""

import pytest

from tests.conftest import N_DOCS, assert_mset_equal
from xapian_spark.plans import query as Q


def test_percent_matches_oracle(spark, matcher, oracle):
    for q in [
        Q.Or([Q.Term("binary_search"), Q.Term("return")]),
        Q.Term("return"),
        Q.And([Q.Term("return"), Q.Term("if")]),
        Q.MaxOp([Q.Term("binary_search"), Q.Term("merge_sort")]),
        Q.Synonym([Q.Term("binary_search"), Q.Term("merge_sort")]),
    ]:
        res = matcher.mset(q, maxitems=10, with_percent=True)
        want = oracle.mset_percent(q, 10)
        got = [(r["doc_id"], res.percents[r["doc_id"]]) for r in res.df.collect()]
        assert got == [(d, p) for d, _, p in want]
        assert all(1 <= p <= 100 for _, p in got)


def test_percent_unweighted_is_100(spark, matcher):
    res = matcher.mset(Q.MatchAll(), maxitems=5, with_percent=True)
    assert set(res.percents.values()) == {100}


def test_sort_by_value(spark, matcher, index):
    q = Q.Term("binary_search")
    res = matcher.mset(q, maxitems=10, sort_by_value="path")
    ids = [r["doc_id"] for r in res.df.collect()]
    docs = {
        r["doc_id"]: r["path"]
        for r in index.docs.select("doc_id", "path").collect()
    }
    paths = [docs[i] for i in ids]
    assert paths == sorted(paths)
    # reverse order
    res2 = matcher.mset(q, maxitems=10, sort_by_value="path", sort_value_reverse=True)
    paths2 = [docs[r["doc_id"]] for r in res2.df.collect()]
    assert paths2 == sorted(paths2, reverse=True)


def test_stopwords_engine_vs_oracle(spark, corpus):
    from xapian_spark.operators.indexer import build_index
    from xapian_spark.operators.matcher import Matcher
    from xapian_spark.oracle import OracleMatcher, build_oracle_index
    from xapian_spark.sources.corpus import generate_corpus

    stop = frozenset({"return", "if", "the"})
    ix = build_index(spark, corpus, meta_cols=["lang"], stopwords=stop)
    om = OracleMatcher(
        build_oracle_index(
            [(i + 1, r[4]) for i, r in enumerate(generate_corpus(N_DOCS))],
            stopwords=stop,
        )
    )
    m = Matcher(spark, ix)
    # a stopped term matches nothing; other scores shift (doc_len changed)
    assert m.mset_df(Q.Term("return"), 5).count() == 0
    q = Q.Or([Q.Term("binary_search"), Q.Term("error")])
    assert_mset_equal(m.mset_df(q, 10).collect(), om.mset(q, 10))
    assert ix.stats["total_length"] == om.ix.total_length


def test_percent_and_weight_cutoff(spark, matcher, oracle):
    """set_cutoff (enquire.h:312): results below the percent/weight
    thresholds are dropped; surviving set matches the oracle's percents."""
    from xapian_spark.plans import query as Q

    q = Q.Or([Q.Term("binary_search"), Q.Term("return")])
    full = matcher.mset(q, maxitems=200, with_percent=True)
    cut = matcher.mset(q, maxitems=200, with_percent=True, percent_cutoff=50)
    keep = {d for d, p in full.percents.items() if p >= 50}
    got = {r["doc_id"] for r in cut.df.collect()}
    assert got == {d for d in keep if d in got} and got <= keep
    # every returned doc meets the cutoff; no doc above it was dropped
    full_ids = {r["doc_id"] for r in full.df.collect()}
    assert got == keep & full_ids

    wcut = matcher.mset(q, maxitems=200, weight_cutoff=0.4)
    for r in wcut.df.collect():
        assert r["weight"] >= 0.4


def test_mset_bounds_surface(spark, matcher):
    from xapian_spark.plans import query as Q

    res = matcher.mset(Q.Term("return"), maxitems=5, with_count=True,
                       with_percent=True)
    assert res.matches_lower_bound == res.matches_estimated == res.matches_upper_bound
    assert res.matches_estimated == res.matches
    assert res.max_attained is not None and res.max_possible is not None
    assert res.max_attained <= res.max_possible + 1e-12


def test_synonym_percent_single_job(spark, matcher, oracle):
    """Percent mode over a Synonym query with synonym_tf='exact' must not
    run a plan-time count(): the merged termfreq rides the max_attained
    aggregation (VERDICT r03 #3).  DataFrame.count is banned for the whole
    call; results still match the oracle exactly."""
    from pyspark.sql import DataFrame

    q = Q.Synonym([Q.Term("binary_search"), Q.Term("merge_sort")])
    want = oracle.mset_percent(q, 10)

    real_count = DataFrame.count

    def banned(self):
        raise AssertionError("plan-time DataFrame.count() in percent path")

    DataFrame.count = banned
    try:
        res = matcher.mset(q, maxitems=10, with_percent=True)
        got = [(r["doc_id"], res.percents[r["doc_id"]]) for r in res.df.collect()]
    finally:
        DataFrame.count = real_count
    assert got == [(d, p) for d, _, p in want]


def test_sort_mode_comparator_families(spark, matcher, index, oracle):
    """msetcmp.cc's three families: VAL (value, docid), VAL_REL (value,
    weight DESC, docid), REL_VAL (weight DESC, value, docid) — each checked
    against a driver-side re-sort of (value, exact weight, docid)."""
    q = Q.Or([Q.Term("binary_search"), Q.Term("return")])
    weights = dict(oracle.mset(q, 10000))
    langs = {
        r["doc_id"]: r["lang"]
        for r in index.docs.select("doc_id", "lang").collect()
    }
    rows = [(d, langs[d], w) for d, w in weights.items()]

    got = [
        r["doc_id"]
        for r in matcher.mset(
            q, maxitems=15, sort_by_value="lang", sort_mode="value_then_relevance"
        ).df.collect()
    ]
    want = [d for d, v, w in sorted(rows, key=lambda x: (x[1], -x[2], x[0]))][:15]
    assert got == want

    got = [
        r["doc_id"]
        for r in matcher.mset(
            q, maxitems=15, sort_by_value="lang", sort_mode="relevance_then_value"
        ).df.collect()
    ]
    want = [d for d, v, w in sorted(rows, key=lambda x: (-x[2], x[1], x[0]))][:15]
    assert got == want

    with pytest.raises(ValueError, match="sort_mode"):
        matcher.mset(q, maxitems=5, sort_by_value="lang", sort_mode="bogus")


def test_collapse_key_in_mset(spark, matcher, index, oracle):
    """Enquire::set_collapse_key in mset proper: at most collapse_max best
    docs per key value under the active comparator; NULL keys uncollapsed;
    matches reports the post-collapse count."""
    q = Q.Or([Q.Term("binary_search"), Q.Term("return")])
    weights = dict(oracle.mset(q, 10000))
    langs = {
        r["doc_id"]: r["lang"]
        for r in index.docs.select("doc_id", "lang").collect()
    }
    # expected: best-by-(weight desc, docid) per lang
    best: dict[str, list[int]] = {}
    for d, w in sorted(weights.items(), key=lambda kv: (-kv[1], kv[0])):
        best.setdefault(langs[d], []).append(d)
    expect1 = {v[0] for v in best.values()}
    res = matcher.mset(q, maxitems=100, collapse_key="lang", with_count=True)
    got = [r["doc_id"] for r in res.df.collect()]
    assert set(got) == expect1
    assert res.matches == len(expect1)
    # collapse_max=2 keeps the two best per key
    expect2 = {d for v in best.values() for d in v[:2]}
    res2 = matcher.mset(
        q, maxitems=100, collapse_key="lang", collapse_max=2, with_count=True
    )
    assert {r["doc_id"] for r in res2.df.collect()} == expect2
    # ranking within the result keeps the global comparator
    ws = [r["weight"] for r in res2.df.collect()]
    assert ws == sorted(ws, reverse=True)


def test_docid_order(matcher):
    """Enquire::set_docid_order (enquire.h:126-163): the docid tie-break
    flips under 'desc'; non-tied ranks are unaffected; DONT_CARE is
    deterministic (ascending here)."""
    import pytest

    from xapian_spark.plans import query as Q

    q = Q.Term("return")
    asc = [(r["doc_id"], r["weight"]) for r in matcher.mset(q, maxitems=50).df.collect()]
    desc = [
        (r["doc_id"], r["weight"])
        for r in matcher.mset(q, maxitems=50, docid_order="desc").df.collect()
    ]
    dc = [
        (r["doc_id"], r["weight"])
        for r in matcher.mset(q, maxitems=50, docid_order="dont_care").df.collect()
    ]
    assert dc == asc
    # same weight multiset either way
    assert sorted(w for _, w in asc) == sorted(w for _, w in desc)
    # within every weight-tie group the docids reverse
    from itertools import groupby

    ga = {w: [d for d, _ in g] for w, g in groupby(asc, key=lambda x: x[1])}
    gd = {w: [d for d, _ in g] for w, g in groupby(desc, key=lambda x: x[1])}
    tied = [w for w, ds in ga.items() if len(ds) > 1 and w in gd and len(gd[w]) == len(ga[w])]
    assert tied, "fixture needs at least one full weight tie in the page"
    for w in tied:
        assert gd[w] == list(reversed(ga[w]))
    with pytest.raises(ValueError):
        matcher.mset(q, maxitems=5, docid_order="sideways")
