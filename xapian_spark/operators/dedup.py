"""Deduplication operators for large-scale training-data pipelines.

All are pure DataFrame ops (JVM-side hashing via md5/xxhash64, no Python in
the hot path) and shuffle on high-cardinality keys (hash / shingle /
signature), so they scale like any Spark aggregation: map-side partial
aggregation, AQE-coalesced reducers, no driver collection.

- exact_duplicates: hash-groupBy on content (the classic exact dedup).
- shingles: n-token shingling (w-shingling, Broder 1997).
- minhash_signatures + minhash_candidate_pairs: MinHash LSH — per-doc
  signature of ``n_hashes`` min-hashes over shingles, banded into
  ``bands``; docs sharing any band bucket are candidate pairs.  md5 is used
  as the hash family (seeded by prefix) so results are engine-portable and
  deterministic.
- ngram_jaccard_pairs: exact Jaccard over distinct shingles via a
  shingle-join (only pairs sharing ≥1 shingle are ever materialized — never
  a cross join).
- simhash: 16-bit SimHash (Charikar 2002) from md5 hex-digit majorities.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tokens_col(text_col: str = "text"):
    """Whitespace tokens (simple mode) as an array column."""
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    return F.filter(toks, lambda t: t != "")


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical content: (content_hash, cnt, min_doc)."""
    h = docs.select(F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("content_hash"))
    return (
        h.groupBy("content_hash")
        .agg(F.count("*").alias("cnt"), F.min("doc_id").alias("min_doc"))
        .filter("cnt > 1")
    )


def fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Order-insensitive document fingerprint: md5 over the sorted distinct
    token set — catches shuffled/reordered near-copies."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens_col(text_col))))).alias("fp"),
    )


def shingles(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", w: int = 3) -> DataFrame:
    """Distinct w-token shingles per doc: (doc_id, shingle)."""
    toks = tokens_col(text_col)
    sh = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - w, F.lit(-1))),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(w)]),
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(sh).alias("shingle"))
        .distinct()
    )


def minhash_signatures(sh: DataFrame, n_hashes: int = 8) -> DataFrame:
    """(doc_id, h1..hN): per-seed min of md5('{seed}:'||shingle)."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{s}:"), F.col("shingle")))).alias(f"h{s}")
        for s in range(1, n_hashes + 1)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_candidate_pairs(
    sig: DataFrame, n_hashes: int = 8, bands: int = 1
) -> DataFrame:
    """LSH banding: docs sharing any band's concatenated signature.

    bands=1 → full-signature equality (highest precision). Returns
    (d1, d2) with d1 < d2, distinct.
    """
    rows = n_hashes // bands
    out = None
    for b in range(bands):
        cols = [f"h{b * rows + i + 1}" for i in range(rows)]
        banded = sig.select(
            "doc_id", F.concat_ws("|", *cols).alias("band_key")
        )
        j = (
            banded.alias("a")
            .join(banded.alias("b"), "band_key")
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        )
        out = j if out is None else out.unionByName(j)
    return out.distinct()


def ngram_jaccard_pairs(
    sh: DataFrame, threshold: float = 0.8, round_digits: int = 6
) -> DataFrame:
    """Exact Jaccard over distinct shingles: (d1, d2, jac) with jac ≥ threshold.

    Shuffle key is the shingle (high cardinality → no skew); the pair
    aggregation only sees co-occurring docs.
    """
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2")
        )
        .agg(F.count("*").alias("i"))
    )
    j = (
        inter.join(sizes.withColumnRenamed("doc_id", "d1").withColumnRenamed("n", "n1"), "d1")
        .join(sizes.withColumnRenamed("doc_id", "d2").withColumnRenamed("n", "n2"), "d2")
        .withColumn(
            "jac",
            F.round(
                F.col("i").cast("double")
                / (F.col("n1") + F.col("n2") - F.col("i")).cast("double"),
                round_digits,
            ),
        )
    )
    return j.filter(F.col("jac") >= threshold).select("d1", "d2", "jac")


def simhash16(sh: DataFrame) -> DataFrame:
    """16-bit SimHash per doc from shingle md5 hex digits: (doc_id, fp int).

    Bit i is the sign of Σ over shingles of ±1 (hex digit i of md5 < '8'
    → -1 else +1) — deterministic and portable to any SQL engine with md5.
    """
    h = sh.select("doc_id", F.md5("shingle").alias("h"))
    aggs = [
        F.sum(
            F.when(F.substring("h", i, 1) < "8", -1).otherwise(1)
        ).alias(f"s{i}")
        for i in range(1, 17)
    ]
    g = h.groupBy("doc_id").agg(*aggs)
    fp = None
    for i in range(1, 17):
        bit = F.when(F.col(f"s{i}") > 0, F.lit(1 << (i - 1))).otherwise(F.lit(0))
        fp = bit if fp is None else fp + bit
    return g.select("doc_id", fp.cast("long").alias("fp"))
