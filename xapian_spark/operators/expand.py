"""ESet — relevance-feedback term expansion (Enquire::get_eset).

Reference: expand/esetinternal.cc + expand/bo1eweight.cc.  Bo1 (the default
scheme, include/xapian/enquire.h:460-520) scores a candidate term t against
a relevance set R as

    mean = collection_freq(t) / N
    wt(t) = rcollfreq * log2((1 + mean) / mean) + log2(1 + mean)

with rcollfreq = Σ_{d ∈ R} wdf(t, d)  (bo1eweight.cc:33-43).

Spark shape: the RSet is small (typically ≤ tens of docs), so candidate
postings are fetched via block-range pruning (blocks whose
[first_docid, last_docid] cover an RSet doc — metadata-only filter), decoded
once, and aggregated per term.  N and collection_freq come from the
dictionary + stats — all global, so results are partition-invariant.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .indexer import IndexTables
from .matcher import decode_blocks


def eset_bo1(
    spark,
    index: IndexTables,
    rset: list[int],
    maxitems: int = 10,
    exclude_terms: list[str] | None = None,
    rank_round: int | None = None,
) -> DataFrame:
    """Top-``maxitems`` expansion terms: (term, wt) ordered wt DESC, term ASC.

    ``rank_round``: rank on round(wt, n) instead of raw wt, so the selected
    top-k set matches an oracle that orders by the rounded value (two terms
    whose raw weights differ only past the n-th decimal tie identically on
    both sides)."""
    if not rset:
        return spark.createDataFrame([], "term string, wt double")
    ids = sorted(set(int(i) for i in rset))
    ids_arr = F.array(*[F.lit(i) for i in ids])
    touching = index.postings.filter(
        F.exists(ids_arr, lambda c: (c >= F.col("first_docid")) & (c <= F.col("last_docid")))
    )
    dec = decode_blocks(touching).filter(F.col("doc_id").isin(ids))
    per_term = dec.groupBy("term").agg(
        F.sum("wdf").cast("long").alias("rcollfreq"),
        F.count("*").cast("long").alias("rtermfreq"),
    )
    # wdf-0 boolean filter terms (field prefixes) carry no Bo1 evidence and
    # would divide by collfreq 0 — drop them (the reference would surface
    # them and users filter with an ExpandDecider; we build the decider in)
    per_term = per_term.filter(F.col("rcollfreq") > 0)
    if exclude_terms:
        per_term = per_term.filter(~F.col("term").isin(list(exclude_terms)))
    n = float(index.stats["doccount"])
    joined = per_term.join(index.dictionary.select("term", "collfreq"), "term")
    mean = F.col("collfreq").cast("double") / F.lit(n)
    log2 = math.log(2.0)
    wt = (
        F.col("rcollfreq").cast("double")
        * (F.log((F.lit(1.0) + mean) / mean) / F.lit(log2))
        + F.log(F.lit(1.0) + mean) / F.lit(log2)
    )
    out = joined.select("term", wt.alias("wt"))
    if rank_round is not None:
        out = out.withColumn("wt", F.round(F.col("wt"), rank_round))
    return out.orderBy(F.desc("wt"), F.asc("term")).limit(maxitems)


def eset_bo1_oracle(oracle_ix, rset: list[int], maxitems: int = 10,
                    exclude_terms: list[str] | None = None) -> list[tuple[str, float]]:
    """Pure-Python Bo1 for the test oracle (same formula, dict-based)."""
    rset_s = set(rset)
    excl = set(exclude_terms or ())
    n = float(oracle_ix.doccount)
    out = []
    for term, plist in oracle_ix.postings.items():
        if term in excl:
            continue
        rcf = sum(len(p) for d, p in plist.items() if d in rset_s)
        if rcf == 0:
            continue
        cf = sum(len(p) for p in plist.values())
        mean = cf / n
        wt = rcf * math.log2((1.0 + mean) / mean) + math.log2(1.0 + mean)
        out.append((term, wt))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:maxitems]
