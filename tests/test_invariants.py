"""Index invariants — the xapian-check analog (backends/dbcheck.cc):
docid order inside blocks, freq sums, stats consistency, sha256 integrity.
"""

import numpy as np
from pyspark.sql import functions as F

from xapian_spark.functions import codec
from xapian_spark.operators.matcher import decode_blocks


def test_block_docids_strictly_increasing(index):
    rows = index.postings.select("n", "docids", "first_docid", "last_docid").collect()
    assert rows
    for r in rows:
        d = codec.decode_docids(r["docids"], r["n"]).astype(np.int64)
        assert (np.diff(d) > 0).all()
        assert d[0] == r["first_docid"] and d[-1] == r["last_docid"]


def test_dictionary_matches_blocks(index):
    per_term = (
        index.postings.groupBy("term")
        .agg(F.sum("n").alias("nf"), F.max("max_wdf").alias("mw"))
        .join(index.dictionary, "term", "full")
        .collect()
    )
    assert per_term
    for r in per_term:
        assert r["nf"] == r["termfreq"], r["term"]
        assert r["mw"] == r["wdf_max"], r["term"]


def test_doclen_equals_wdf_sum(index):
    dec = decode_blocks(index.postings)
    sums = dec.groupBy("doc_id").agg(
        F.sum("wdf").alias("s"), F.max("doc_len").alias("l"), F.min("doc_len").alias("l2")
    )
    bad = sums.filter("s <> l or l <> l2").count()
    assert bad == 0
    # docs table agrees
    j = sums.join(index.docs, "doc_id").filter("s <> doc_len").count()
    assert j == 0


def test_stats_consistency(index):
    docs_total = index.docs.agg(F.sum("doc_len")).collect()[0][0]
    assert docs_total == index.stats["total_length"]
    assert index.docs.count() == index.stats["doccount"]
    dict_total = index.dictionary.agg(F.sum("collfreq")).collect()[0][0]
    assert dict_total == index.stats["total_length"]


def test_sha256_integrity(index, corpus):
    """Per-row sha256(content) equality (input_hint invariant)."""
    import hashlib

    from xapian_spark.sources.corpus import generate_corpus

    from tests.conftest import N_DOCS

    manifest = {
        i + 1: hashlib.sha256(r[4].encode()).hexdigest()
        for i, r in enumerate(generate_corpus(N_DOCS))
    }
    rows = index.docs.select("doc_id", "sha256").collect()
    assert len(rows) == N_DOCS
    for r in rows:
        assert manifest[r["doc_id"]] == r["sha256"]


def test_positions_roundtrip(index, oracle):
    """Decoded positions match the oracle's posting positions."""
    dec = decode_blocks(
        index.postings.filter(F.col("term") == "binary_search"), with_positions=True
    ).collect()
    want = oracle.ix.postings.get("binary_search", {})
    assert len(dec) == len(want)
    for r in dec:
        assert list(r["positions"]) == want[r["doc_id"]]
