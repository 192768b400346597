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


# ---------------------------------------------------------------------------
# Pluggable weighting schemes (reference surface: include/xapian/weight.h
# :38-2231 — 19 schemes; implemented here: bm25, trad, tfidf, coord, bool).
# A scheme's init() returns a TermWeight with float64 sumpart / Column
# sumpart_col / WAND maxpart, mirroring Weight::init + get_sumpart +
# get_maxpart.
# ---------------------------------------------------------------------------


class TermWeight:
    """Initialized per-term state; subclasses implement the three hooks."""

    def sumpart(self, wdf: float, doc_len: float) -> float:
        raise NotImplementedError

    def sumpart_col(self, wdf: Column, doc_len: Column) -> Column:
        raise NotImplementedError

    def maxpart(self, wdf_max: int, doclen_lower_bound: int) -> float:
        raise NotImplementedError


class BM25Scheme:
    """Default scheme (api/enquire.cc:276-277 uses BM25Weight)."""

    name = "bm25"

    def __init__(self, params: BM25Params = BM25Params()):
        self.params = params

    def init(self, termfreq, collfreq, stats, wqf=1, factor=1.0):
        return bm25_init(
            termfreq=termfreq,
            collection_size=stats["doccount"],
            average_length=stats["avg_length"],
            wqf=wqf,
            factor=factor,
            params=self.params,
        )


class TradScheme(BM25Scheme):
    """TradWeight(k) ≡ BM25Weight(k, 0, 0, 1, 0) (weight.h:1292-1309).

    Note k3=0: the reference skips the wqf multiplier entirely for Trad
    (the 4th ctor arg is b=1, the 3rd is k3=0)."""

    name = "trad"

    def __init__(self, k: float = 1.0):
        super().__init__(BM25Params(k1=k, k2=0.0, k3=0.0, b=1.0, min_normlen=0.0))


@dataclass
class _TfIdfTerm(TermWeight):
    idfn: float
    wqf_factor: float
    wdf_norm: str
    avg_len: float

    def _wdfn(self, wdf: float, doc_len: float) -> float:
        # tfidfweight.cc:228-285 (uniqterms-based norms not supported — the
        # block layout stores doclen, not uniqterms; documented gap)
        w = self.wdf_norm
        if w == "none":
            return float(wdf)
        if wdf == 0:
            return 0.0
        if w == "boolean":
            return 1.0
        if w == "square":
            return float(wdf) * float(wdf)
        if w == "log":
            return 1 + math.log(float(wdf))
        if w == "aug_log":
            return 0.2 + 0.8 * math.log(1.0 + wdf)
        if w == "sqrt":
            return math.sqrt(wdf - 0.5) + 1
        raise ValueError(f"unsupported wdf_norm {w}")

    def sumpart(self, wdf: float, doc_len: float) -> float:
        return self._wdfn(wdf, doc_len) * self.idfn * self.wqf_factor

    def sumpart_col(self, wdf: Column, doc_len: Column) -> Column:
        w = self.wdf_norm
        x = wdf.cast("double")
        if w == "none":
            wdfn = x
        elif w == "boolean":
            wdfn = F.when(wdf > 0, 1.0).otherwise(0.0)
        elif w == "square":
            wdfn = x * x
        elif w == "log":
            wdfn = F.when(wdf > 0, F.lit(1.0) + F.log(x)).otherwise(0.0)
        elif w == "aug_log":
            wdfn = F.when(wdf > 0, F.lit(0.2) + F.lit(0.8) * F.log(F.lit(1.0) + x)).otherwise(0.0)
        elif w == "sqrt":
            wdfn = F.when(wdf > 0, F.sqrt(x - F.lit(0.5)) + F.lit(1.0)).otherwise(0.0)
        else:
            raise ValueError(f"unsupported wdf_norm {w}")
        return wdfn * F.lit(self.idfn) * F.lit(self.wqf_factor)

    def maxpart(self, wdf_max: int, doclen_lower_bound: int) -> float:
        return self._wdfn(wdf_max, doclen_lower_bound) * self.idfn * self.wqf_factor


class TfIdfScheme:
    """TfIdfWeight; defaults wdf_norm=NONE, idf_norm=TFIDF, wt_norm=NONE
    (weight.h:1026-1028); sumpart = wdfn * idfn * wqf * factor
    (tfidfweight.cc:206-213)."""

    name = "tfidf"

    def __init__(self, wdf_norm: str = "none", idf_norm: str = "tfidf"):
        self.wdf_norm = wdf_norm
        self.idf_norm = idf_norm

    def init(self, termfreq, collfreq, stats, wqf=1, factor=1.0):
        n = float(stats["doccount"])
        tf = float(termfreq)
        i = self.idf_norm
        if i == "none":
            idfn = 1.0
        elif i == "prob":
            idfn = 0.0 if n == tf else math.log((n - tf) / tf)
        elif i == "freq":
            idfn = 1.0 / tf
        elif i == "square":
            x = math.log(n / tf)
            idfn = x * x
        elif i == "pivoted":
            idfn = math.log((n + 1) / tf)
        elif i == "tfidf":
            idfn = math.log(n / tf)
        else:
            raise ValueError(f"unsupported idf_norm {i}")
        return _TfIdfTerm(
            idfn=idfn,
            wqf_factor=wqf * factor,
            wdf_norm=self.wdf_norm,
            avg_len=stats["avg_length"],
        )


@dataclass
class _ConstTerm(TermWeight):
    value: float

    def sumpart(self, wdf: float, doc_len: float) -> float:
        return self.value

    def sumpart_col(self, wdf: Column, doc_len: Column) -> Column:
        return F.lit(self.value)

    def maxpart(self, wdf_max: int, doclen_lower_bound: int) -> float:
        return self.value


class CoordScheme:
    """CoordWeight: 1 × factor per matching subquery (weight.h:2166,
    coordweight.cc:65-70)."""

    name = "coord"

    def init(self, termfreq, collfreq, stats, wqf=1, factor=1.0):
        return _ConstTerm(float(factor))


class BoolScheme:
    """BoolWeight: all weights 0 (weight.h:678)."""

    name = "bool"

    def init(self, termfreq, collfreq, stats, wqf=1, factor=1.0):
        return _ConstTerm(0.0)
