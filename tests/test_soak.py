"""Randomized query-tree soak test — the reference's metamorphic strategy
(tests/soaktest/soaktest_queries.cc:180-240): build seeded random trees,
assert exact MSet equality vs the oracle and the top-k-prefix property.
"""

import random

import pytest

from tests.conftest import assert_mset_equal
from xapian_spark.plans import query as Q

TERMS = [
    "return", "if", "def", "value", "error", "binary_search", "merge_sort",
    "hash_table", "the", "data", "index", "zzz_absent", "c++", "posting_list",
]


def random_tree(rng: random.Random, depth: int = 0) -> Q.Query:
    if depth >= 3 or rng.random() < 0.4:
        return Q.Term(rng.choice(TERMS))
    kind = rng.choice(["or", "and", "andnot", "xor", "max", "filter",
                       "andmaybe", "scale", "synonym"])
    if kind in ("or", "and", "xor", "max"):
        n = rng.randint(2, 4)
        kids = [random_tree(rng, depth + 1) for _ in range(n)]
        cls = {"or": Q.Or, "and": Q.And, "xor": Q.Xor, "max": Q.MaxOp}[kind]
        return cls(kids)
    if kind == "synonym":
        n = rng.randint(2, 3)
        terms = rng.sample(TERMS, n)
        return Q.Synonym([Q.Term(t) for t in terms])
    if kind == "scale":
        return Q.ScaleWeight(random_tree(rng, depth + 1), rng.choice([0.5, 2.0, 3.25]))
    left = random_tree(rng, depth + 1)
    right = random_tree(rng, depth + 1)
    cls = {"andnot": Q.AndNot, "filter": Q.Filter, "andmaybe": Q.AndMaybe}[kind]
    return cls(left, right)


@pytest.mark.parametrize("seed", range(12))
def test_random_tree_matches_oracle(seed, matcher, oracle):
    rng = random.Random(1000 + seed)
    q = random_tree(rng)
    k = rng.choice([1, 5, 20])
    got = matcher.mset_df(q, k).collect()
    want = oracle.mset(q, k)
    assert_mset_equal(got, want)


def test_random_tree_topk_prefix(matcher):
    """topk(q,1) and topk(q,5) are prefixes of topk(q,50) (soaktest
    invariant), on random trees."""
    rng = random.Random(77)
    for _ in range(4):
        q = random_tree(rng)
        full = [(r["doc_id"], r["weight"]) for r in matcher.mset_df(q, 50).collect()]
        for k in (1, 5):
            part = [(r["doc_id"], r["weight"]) for r in matcher.mset_df(q, k).collect()]
            assert full[: len(part)] == part
