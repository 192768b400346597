"""Deterministic docid assignment (SURVEY.md §7.0)."""

from pyspark.sql import functions as F

from xapian_spark.sources.docids import assign_doc_ids


def test_assign_doc_ids_dense_and_ordered(spark, corpus):
    src = corpus.drop("doc_id")
    out = assign_doc_ids(src, ["repo", "path"]).collect()
    n = len(out)
    ids = sorted(r["doc_id"] for r in out)
    assert ids == list(range(1, n + 1))  # dense, 1-based (docid 0 invalid)
    by_key = sorted(out, key=lambda r: (r["repo"], r["path"]))
    assert [r["doc_id"] for r in by_key] == list(range(1, n + 1))


def test_assign_doc_ids_partition_invariant(spark, corpus):
    src = corpus.drop("doc_id")
    a = {(r["repo"], r["path"]): r["doc_id"] for r in assign_doc_ids(src.repartition(3)).collect()}
    b = {(r["repo"], r["path"]): r["doc_id"] for r in assign_doc_ids(src.repartition(17)).collect()}
    assert a == b
