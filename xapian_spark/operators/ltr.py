"""Learning-to-rank feature extraction (xapian-letor parity, SURVEY.md §2.10).

The reference ships 6 feature classes over (tf, idf, doclen, collection
tf/len) (xapian-letor/include/xapian-letor/feature.h:129-222) computed per
(query, document) and fed to ListNET/ListMLE rankers.  Here the features
are one DataFrame expression pass over decoded candidate postings — the
output table plugs into any Spark MLlib ranker/regressor.

Formulas (whole-document variants; the reference additionally splits by
title/body prefix, which the code-corpus schema does not use):
  f1 TfFeature            Σ_q log10(1 + wdf)            (tffeature.cc:64)
  f2 TfDoclenFeature      Σ_q log10(1 + wdf/(1+len))    (tfdoclenfeature.cc:65)
  f3 IdfFeature           Σ_q log10(1 + idf)            (idffeature.cc:64)
  f4 CollTfCollLenFeature Σ_q log10(1 + cf/(1+L))       (colltfcolllenfeature.cc)
  f5 TfIdfDoclenFeature   Σ_q log10(1 + wdf/(1+len)·idf)
  f6 BM25 score (the engine's exact BM25 weight as a feature)
with idf = log10(N / termfreq).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.weights import BM25Scheme
from .indexer import IndexTables
from .matcher import Matcher


def ltr_features(
    spark,
    index: IndexTables,
    query_terms: list[str],
    candidates: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, f1..f6) for every candidate doc (default: docs matching any
    query term — the OR candidate set, like letor's MSet input)."""
    m = Matcher(spark, index)
    stats = m._term_stats(query_terms)
    known = [t for t in dict.fromkeys(query_terms) if t in stats]
    if not known:
        return spark.createDataFrame(
            [], "doc_id long, f1 double, f2 double, f3 double, f4 double, f5 double, f6 double"
        )
    n = float(index.stats["doccount"])
    total_len = float(index.stats["total_length"])
    consts = spark.createDataFrame(
        [
            (
                t,
                math.log10(n / stats[t][0]),  # idf
                math.log10(1.0 + stats[t][1] / (1.0 + total_len)),  # f4 addend
                m._weight_for(t, 1, 1.0, stats).termweight
                if isinstance(m.scheme, BM25Scheme)
                else 0.0,
            )
            for t in known
        ],
        "term string, idf double, f4add double, tw double",
    )
    dec = m._decoded_for_terms(known).join(F.broadcast(consts), "term")
    wdf = F.col("wdf").cast("double")
    dlen = F.col("doc_len").cast("double")
    tf_norm = wdf / (F.lit(1.0) + dlen)
    bm25 = m.scheme.init(
        termfreq=1, collfreq=1, stats=index.stats, wqf=1, factor=1.0
    )  # only for len_factor/params shape
    per = dec.select(
        "doc_id",
        F.log10(F.lit(1.0) + wdf).alias("x1"),
        F.log10(F.lit(1.0) + tf_norm).alias("x2"),
        F.log10(F.lit(1.0) + F.col("idf")).alias("x3"),
        F.col("f4add").alias("x4"),
        F.log10(F.lit(1.0) + tf_norm * F.col("idf")).alias("x5"),
    )
    feats = per.groupBy("doc_id").agg(
        F.sum("x1").alias("f1"),
        F.sum("x2").alias("f2"),
        F.sum("x3").alias("f3"),
        F.sum("x4").alias("f4"),
        F.sum("x5").alias("f5"),
    )
    # f6: the exact BM25 score
    from ..plans import query as Q

    scores = m.matches(Q.Or([Q.Term(t) for t in known])).withColumnRenamed(
        "weight", "f6"
    )
    out = feats.join(scores, "doc_id", "left").fillna({"f6": 0.0})
    if candidates is not None:
        out = out.join(candidates.select("doc_id"), "doc_id", "left_semi")
    return out
