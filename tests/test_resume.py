"""Resume equality (FIXTURES.md F6 / north rule): an index built with an
injected mid-build failure + resume is identical to a clean build."""

import json

import pytest
from pyspark.sql import functions as F

from xapian_spark.sources.checkpoint import CheckpointedIndexBuilder


def _index_signature(ix) -> tuple:
    """Content signature over all tables (order-insensitive)."""
    post = ix.postings.agg(
        F.count("*"),
        F.bit_xor(F.xxhash64("term", "block_no", "docids", "wdfs")).alias("h"),
    ).collect()[0]
    docs = ix.docs.agg(F.count("*"), F.bit_xor(F.xxhash64("doc_id", "doc_len"))).collect()[0]
    d = ix.dictionary.agg(
        F.count("*"), F.bit_xor(F.xxhash64("term", "termfreq", "collfreq", "wdf_max"))
    ).collect()[0]
    return (tuple(post), tuple(docs), tuple(d), tuple(sorted(ix.stats.items())))


def test_interrupted_build_resumes_identical(spark, corpus, tmp_path):
    clean = CheckpointedIndexBuilder(spark, str(tmp_path / "clean"), n_shards=4)
    ix_clean = clean.build(corpus, meta_cols=["lang"])
    sig_clean = _index_signature(ix_clean)

    crashy = CheckpointedIndexBuilder(spark, str(tmp_path / "crashy"), n_shards=4)
    with pytest.raises(RuntimeError, match="injected failure"):
        crashy.build(corpus, meta_cols=["lang"], fail_after_shards=2)

    # lineage shows exactly 2 committed shards
    recs = [json.loads(x) for x in open(crashy.ckpt_path)]
    assert len(recs) == 2 and all(r["status"] == "done" for r in recs)

    # resume: skips the 2 done shards, finishes the rest
    ix_resumed = crashy.build(corpus, meta_cols=["lang"])
    recs = [json.loads(x) for x in open(crashy.ckpt_path)]
    assert sorted(r["shard"] for r in recs) == [0, 1, 2, 3]
    assert _index_signature(ix_resumed) == sig_clean


def test_rerun_after_done_is_noop_and_stable(spark, corpus, tmp_path):
    b = CheckpointedIndexBuilder(spark, str(tmp_path / "w"), n_shards=3)
    sig1 = _index_signature(b.build(corpus, meta_cols=["lang"]))
    n_recs = len(open(b.ckpt_path).readlines())
    sig2 = _index_signature(b.build(corpus, meta_cols=["lang"]))
    assert sig1 == sig2
    assert len(open(b.ckpt_path).readlines()) == n_recs  # no new shard work
