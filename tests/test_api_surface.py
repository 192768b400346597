"""API-parity surface: check_at_least, per-slot value statistics, and the
WAND kernel's cache hygiene (no persisted partitions may outlive a call).
"""

from pyspark.sql import functions as F

from xapian_spark.plans import query as Q


def test_check_at_least_yields_exact_count(matcher, oracle):
    """enquire.h:383-404 third get_mset arg: with check_at_least > 0 the
    match-count bounds must cover the true count; ours are exact."""
    q = Q.Or([Q.Term("return"), Q.Term("binary_search")])
    res = matcher.mset(q, maxitems=5, check_at_least=100)
    want = oracle.count(q)
    assert res.matches == want
    assert res.matches_lower_bound == want
    assert res.matches_estimated == want
    assert res.matches_upper_bound == want
    # check_at_least=0 keeps the cheap path: no count computed
    res0 = matcher.mset(q, maxitems=5)
    assert res0.matches is None


def test_value_slot_stats(index):
    """Database::get_value_freq / lower / upper bound (database.h:313-415,
    valuestats.h:28-52) over a docs-table value column."""
    rows = index.docs.agg(
        F.count("doc_len"), F.min("doc_len"), F.max("doc_len")
    ).collect()[0]
    assert index.value_freq("doc_len") == rows[0]
    assert index.value_lower_bound("doc_len") == rows[1]
    assert index.value_upper_bound("doc_len") == rows[2]
    # memoized: second call hits the cache (same values)
    assert index.value_freq("doc_len") == rows[0]
    # a string meta column works too (slots are typed columns)
    assert index.value_freq("lang") > 0


def test_wand_leaves_no_persisted_rdds(spark, matcher):
    """wand_topk persists intermediates; after the call returns they must
    all be unpersisted (long-lived sessions would otherwise accumulate
    cached partitions — VERDICT r02 'What's wrong' #4)."""
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    out = matcher.mset_df(
        Q.Or([Q.Term("return"), Q.Term("binary_search")]), 5, prune=True
    )
    assert out.count() == 5
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert after == before
