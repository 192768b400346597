"""Weighting schemes.

``BM25Weight`` reproduces xapian-core/weight/bm25weight.cc exactly:

- defaults k1=1, k2=0, k3=1, b=0.5, min_normlen=0.5
  (include/xapian/weight.h:1128-1142);
- idf with the non-standard ``tw < 2 → tw/2 + 1`` adjustment
  (bm25weight.cc:107) — fires for terms indexing more than ~half the
  collection;
- ``len_factor = 1/average_length`` unless the weight is length-independent
  (bm25weight.cc:119-128);
- per-document part ``termweight * wdf / (k1*(normlen*b + (1-b)) + wdf)``
  with ``normlen = max(doc_len * len_factor, min_normlen)``
  (bm25weight.cc:166-178);
- WAND upper bound ``get_maxpart`` evaluated at wdf_max with
  doclen = max(wdf_max, doclen_lower_bound) (bm25weight.cc:180-202, after
  Macdonald/Tonellotto/Ounis 2011).

All arithmetic is float64 in the same operation order as the reference so
scores are bit-comparable (tests assert 1e-9).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class BM25Params:
    k1: float = 1.0
    k2: float = 0.0
    k3: float = 1.0
    b: float = 0.5
    min_normlen: float = 0.5


@dataclass
class BM25Term:
    """Per-term initialized state (≈ Weight::init result)."""

    termweight: float
    len_factor: float
    params: BM25Params

    def sumpart(self, wdf: float, doc_len: float) -> float:
        """bm25weight.cc:166-178."""
        p = self.params
        normlen = max(doc_len * self.len_factor, p.min_normlen)
        denom = p.k1 * (normlen * p.b + (1 - p.b)) + float(wdf)
        return self.termweight * (float(wdf) / denom)

    def maxpart(self, wdf_max: int, doclen_lower_bound: int) -> float:
        """bm25weight.cc:180-202 — the block-max/WAND bound."""
        p = self.params
        denom = p.k1
        if p.k1 != 0.0 and p.b != 0.0:
            normlen_lb = max(
                max(wdf_max, doclen_lower_bound) * self.len_factor, p.min_normlen
            )
            denom *= normlen_lb * p.b + (1 - p.b)
        denom += wdf_max
        return self.termweight * (wdf_max / denom)

    def sumpart_col(self, wdf: Column, doc_len: Column) -> Column:
        """Same formula as a JVM-side Column expression (no Python in the
        scoring hot path)."""
        p = self.params
        normlen = F.greatest(
            doc_len.cast("double") * F.lit(self.len_factor), F.lit(p.min_normlen)
        )
        denom = (
            F.lit(p.k1) * (normlen * F.lit(p.b) + F.lit(1 - p.b))
            + wdf.cast("double")
        )
        return F.lit(self.termweight) * (wdf.cast("double") / denom)


def bm25_init(
    termfreq: int,
    collection_size: int,
    average_length: float,
    wqf: int = 1,
    factor: float = 1.0,
    params: BM25Params = BM25Params(),
    rset_size: int = 0,
    reltermfreq: int = 0,
) -> BM25Term:
    """BM25Weight::init (bm25weight.cc:46-128), float64 op order preserved."""
    p = params
    if rset_size != 0:
        reldocs_not_indexed = rset_size - reltermfreq
        q = collection_size - reldocs_not_indexed
        nonreldocs_indexed = termfreq - reltermfreq
        numerator = (reltermfreq + 0.5) * (q - termfreq + 0.5)
        denom = (reldocs_not_indexed + 0.5) * (nonreldocs_indexed + 0.5)
        tw = numerator / denom
    else:
        tw = (collection_size - termfreq + 0.5) / (termfreq + 0.5)
    if tw < 2:
        tw = tw * 0.5 + 1  # bm25weight.cc:107
    termweight = math.log(tw) * factor
    if p.k3 != 0:
        wqf_double = float(wqf)
        termweight *= (p.k3 + 1) * wqf_double / (p.k3 + wqf_double)
    termweight *= p.k1 + 1

    if p.k2 == 0 and (p.b == 0 or p.k1 == 0):
        len_factor = 0.0
    else:
        len_factor = average_length
        if len_factor != 0:
            len_factor = 1 / len_factor
    return BM25Term(termweight=termweight, len_factor=len_factor, params=p)
