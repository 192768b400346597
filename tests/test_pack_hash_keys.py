"""The int-key pack shuffle (r7 optimization) must be invisible in output:
blocks built by shuffling xxhash64(term) keys and re-attaching term strings
per block row are row-identical to the string-keyed path."""

import os

import pytest


@pytest.fixture(scope="module")
def corpus(spark):
    from xapian_spark.sources.corpus import corpus_df

    return corpus_df(spark, 300, seed=7, n_partitions=4).persist()


def _build(spark, corpus, **overrides):
    from xapian_spark.operators.indexer import build_index

    kw = dict(
        content_col="content",
        meta_cols=["repo", "lang"],
        mode="simple",
        with_positions=True,
        impact_tiers=4,
    )
    kw.update(overrides)
    return build_index(spark, corpus, **kw)


def test_hash_keyed_pack_matches_string_path(spark, corpus):
    old = os.environ.get("SPARK_GRAFT_PACK_HASH_MAX_VOCAB")
    try:
        os.environ.pop("SPARK_GRAFT_PACK_HASH_MAX_VOCAB", None)
        ix_hash = _build(spark, corpus)
        # vocab cap 0 forces the string-keyed fallback (same switch the
        # collision check would take)
        os.environ["SPARK_GRAFT_PACK_HASH_MAX_VOCAB"] = "0"
        ix_str = _build(spark, corpus)
    finally:
        if old is None:
            os.environ.pop("SPARK_GRAFT_PACK_HASH_MAX_VOCAB", None)
        else:
            os.environ["SPARK_GRAFT_PACK_HASH_MAX_VOCAB"] = old
    rows_hash = sorted(tuple(r) for r in ix_hash.postings.collect())
    rows_str = sorted(tuple(r) for r in ix_str.postings.collect())
    assert rows_hash == rows_str
    assert ix_hash.stats == ix_str.stats
    assert sorted(map(tuple, ix_hash.dictionary.collect())) == sorted(
        map(tuple, ix_str.dictionary.collect())
    )
