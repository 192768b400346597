"""Document clustering — the reference's cluster/ subsystem
(include/xapian/cluster.h:520-674: KMeans + TF-IDF cosine similarity) as
MLlib KMeans over TF-IDF vectors built from the index's own statistics.

The reference clusters an MSet's documents by TF-IDF cosine; here any doc
set (default: all docs) gets a sparse TF-IDF vector straight from decoded
postings + dictionary idf — no re-tokenization.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .indexer import IndexTables
from .matcher import decode_blocks


def tfidf_vectors(spark, index: IndexTables, vocab_size: int = 1 << 18) -> DataFrame:
    """(doc_id, features SparseVector) — tf·idf with idf = ln(N/termfreq),
    terms hashed into ``vocab_size`` dims (feature hashing keeps the vector
    space fixed at any vocabulary scale)."""
    from pyspark.ml.linalg import SparseVector, VectorUDT
    from pyspark.sql.functions import udf

    n = float(index.stats["doccount"])
    dic = index.dictionary.select(
        "term", (F.log(F.lit(n) / F.col("termfreq"))).alias("idf")
    )
    dec = decode_blocks(index.postings).join(dic, "term")
    scored = dec.select(
        "doc_id",
        (F.abs(F.xxhash64("term")) % vocab_size).alias("dim"),
        (F.col("wdf").cast("double") * F.col("idf")).alias("v"),
    ).groupBy("doc_id", "dim").agg(F.sum("v").alias("v"))
    pairs = scored.groupBy("doc_id").agg(
        F.sort_array(F.collect_list(F.struct("dim", "v"))).alias("pairs")
    )

    # Arrow can't transport VectorUDT — assemble vectors with a (pickled)
    # UDF; one call per doc over already-aggregated pairs, so the
    # row-at-a-time cost is per-document, not per-posting.
    @udf(returnType=VectorUDT())
    def to_vec(pairs):
        return SparseVector(
            vocab_size, [int(p["dim"]) for p in pairs], [float(p["v"]) for p in pairs]
        )

    return pairs.select("doc_id", to_vec("pairs").alias("features"))


def kmeans_clusters(
    spark, index: IndexTables, k: int = 8, seed: int = 42, max_iter: int = 20
) -> DataFrame:
    """(doc_id, cluster) via MLlib KMeans (cosine distance, like the
    reference's CosineDistance metric, cluster.h:306)."""
    from pyspark.ml.clustering import KMeans

    vecs = tfidf_vectors(spark, index)
    km = KMeans(k=k, seed=seed, maxIter=max_iter, distanceMeasure="cosine")
    model = km.fit(vecs)
    return model.transform(vecs).select(
        "doc_id", F.col("prediction").alias("cluster")
    )
