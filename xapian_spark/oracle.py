"""Pure-Python Xapian-semantics oracle.

A slow, obviously-correct reference implementation of indexing + matching
used by the test suite as the golden source (SURVEY.md §7.2 stage 1 —
the reference's API tests assert exact MSet contents against tiny corpora,
xapian-core/tests/api_anydb.cc:117-235; we do the same against this oracle).

Shares the tokenizer and BM25 code with the engine deliberately — what it
does NOT share is the entire distributed pipeline (codec, blocks, shuffles,
joins, aggregation order), which is what the tests are validating.
Matching is document-at-a-time over plain dicts, mirroring the PostList
tree semantics (matcher/*postlist.cc) directly.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .functions.tokenizer import simple_tokenize, xapian_tokenize
from .functions.weights import BM25Params, bm25_init
from .plans import query as Q


@dataclass
class OracleIndex:
    postings: dict[str, dict[int, list[int]]] = field(default_factory=dict)
    doclens: dict[int, int] = field(default_factory=dict)
    doccount: int = 0
    total_length: int = 0

    @property
    def avg_length(self) -> float:
        return self.total_length / self.doccount if self.doccount else 0.0

    def doclen_lower_bound(self) -> int:
        return min(self.doclens.values(), default=0)


def build_oracle_index(
    docs: list[tuple[int, str]],
    mode: str = "xapian",
    stopwords: frozenset[str] | None = None,
    stem: str | None = None,
    stem_strategy: str = "some",
) -> OracleIndex:
    tok = xapian_tokenize if mode == "xapian" else simple_tokenize
    stop = frozenset(stopwords) if stopwords else None
    stemmer = None
    if stem is not None:
        from .functions.stemmers import get_stemmer

        stemmer = get_stemmer(stem)
    from .operators.indexer import _should_stem

    ix = OracleIndex()
    for doc_id, text in docs:
        terms = tok(text) if isinstance(text, str) else []
        if stop:
            terms = [t for t in terms if t not in stop]
        dlen = 0
        pos = 0
        ix.doccount += 1
        for t in terms:
            if stemmer is not None and stem_strategy in ("all", "all_z"):
                t = stemmer(t)
                if stem_strategy == "all_z":
                    t = "Z" + t
            pos += 1
            dlen += 1
            ix.postings.setdefault(t, {}).setdefault(doc_id, []).append(pos)
            if stemmer is not None and stem_strategy == "some" and _should_stem(t):
                z = "Z" + stemmer(t)
                dlen += 1
                # positionless add_term posting: track wdf via a sentinel
                # empty-position entry list semantics — the oracle stores
                # positions; wdf for Z terms = occurrence count, so append
                # a 0 marker that positional ops never see (Z terms are not
                # used positionally)
                ix.postings.setdefault(z, {}).setdefault(doc_id, []).append(0)
        ix.doclens[doc_id] = dlen
        ix.total_length += dlen
    return ix


class OracleMatcher:
    def __init__(self, ix: OracleIndex, params: BM25Params = BM25Params(), scheme=None):
        from .functions.weights import BM25Scheme

        self.ix = ix
        self.params = params
        self.scheme = scheme if scheme is not None else BM25Scheme(params)
        self._ql = 1
        self._uniq_cache: dict[int, int] | None = None

    def _uniq(self, d: int) -> int:
        """Distinct wdf>0 terms of doc d (get_unique_terms)."""
        if self._uniq_cache is None:
            cache: dict[int, int] = {}
            for plist in self.ix.postings.values():
                for doc in plist:
                    cache[doc] = cache.get(doc, 0) + 1
            self._uniq_cache = cache
        return self._uniq_cache.get(d, 0)

    def _stats(self) -> dict:
        dl = self.ix.doclens.values()
        uniq = [self._uniq(d) for d in self.ix.doclens]
        return {
            "doccount": self.ix.doccount,
            "avg_length": self.ix.avg_length,
            "total_length": self.ix.total_length,
            "doclen_lower_bound": min(dl, default=0),
            "doclen_upper_bound": max(dl, default=0),
            "uniqterms_lower_bound": min((u for u in uniq if u > 0), default=1),
            "uniqterms_upper_bound": max(uniq, default=0),
        }

    def _init_term(self, termfreq: int, collfreq: int, wqf: int, factor: float):
        return self.scheme.init(
            termfreq=termfreq,
            collfreq=collfreq,
            stats=self._stats(),
            wqf=wqf,
            factor=factor,
            query_length=self._ql,
        )

    # (docid → weight) maps; None weight marks pure-boolean results
    def _weights(self, q: Q.Query, factor: float) -> dict[int, float]:
        ix = self.ix
        if isinstance(q, Q.Term):
            plist = ix.postings.get(q.term, {})
            if not plist:
                return {}
            collfreq = sum(len(p) for p in plist.values())
            w = self._init_term(len(plist), collfreq, q.wqf, factor)
            return {
                d: w.sumpart(len(poss), ix.doclens[d], self._uniq(d))
                for d, poss in plist.items()
            }
        if isinstance(q, Q.MatchAll):
            return {d: 0.0 for d in ix.doclens}
        if isinstance(q, Q.MatchNothing):
            return {}
        if isinstance(q, Q.Or):
            out: dict[int, float] = {}
            for c in q.children:
                for d, w in self._weights(c, factor).items():
                    out[d] = out.get(d, 0.0) + w
            return out
        if isinstance(q, Q.And):
            maps = [self._weights(c, factor) for c in q.children]
            common = set(maps[0])
            for m in maps[1:]:
                common &= set(m)
            out = {}
            for d in common:
                s = 0.0
                for m in maps:
                    s += m[d]
                out[d] = s
            return out
        if isinstance(q, Q.Xor):
            maps = [self._weights(c, factor) for c in q.children]
            out = {}
            for i, m in enumerate(maps):
                for d, w in m.items():
                    if d in out:
                        out[d] = (out[d][0] + 1, out[d][1] + w)
                    else:
                        out[d] = (1, w)
            return {d: w for d, (cnt, w) in out.items() if cnt % 2 == 1}
        if isinstance(q, Q.AndNot):
            left = self._weights(q.left, factor)
            right = self._weights(q.right, 0.0)
            return {d: w for d, w in left.items() if d not in right}
        if isinstance(q, Q.Filter):
            left = self._weights(q.left, factor)
            right = self._weights(q.right, 0.0)
            return {d: w for d, w in left.items() if d in right}
        if isinstance(q, Q.AndMaybe):
            left = self._weights(q.left, factor)
            right = self._weights(q.right, factor)
            return {d: w + right.get(d, 0.0) for d, w in left.items()}
        if isinstance(q, Q.MaxOp):
            out = {}
            for c in q.children:
                for d, w in self._weights(c, factor).items():
                    out[d] = max(out.get(d, float("-inf")), w)
            return out
        if isinstance(q, Q.Synonym):
            return self._synonym(q, factor)
        if isinstance(q, (Q.Phrase, Q.Near)):
            return self._positional(q, factor)
        if isinstance(q, Q.ScaleWeight):
            return self._weights(q.subquery, factor * q.factor)
        if isinstance(q, Q.ValueRange):
            raise NotImplementedError("oracle has no value slots")
        if isinstance(q, Q.Wildcard):
            terms = sorted(
                t for t in self.ix.postings if _glob_match(q.pattern, t)
            )
            if q.max_expansion and len(terms) > q.max_expansion:
                if q.limit_policy == "most_frequent":
                    terms.sort(key=lambda t: (-len(self.ix.postings[t]), t))
                    terms = sorted(terms[: q.max_expansion])
                elif q.limit_policy == "first":
                    terms = terms[: q.max_expansion]
                else:
                    raise ValueError("wildcard expansion over limit")
            if not terms:
                return {}
            leaves: list[Q.Query] = [Q.Term(t) for t in terms]
            comb = {"or": Q.Or, "max": Q.MaxOp}.get(q.combiner, Q.Synonym)
            return self._weights(comb(leaves), factor)
        if isinstance(q, Q.EditDistance):
            from .operators.spelling import edit_distance

            def dist(t):
                if q.metric == "levenshtein":
                    # plain Levenshtein via DP without the transposition row
                    la, lb = len(q.target), len(t)
                    prev = list(range(lb + 1))
                    for i in range(1, la + 1):
                        cur = [i] + [0] * lb
                        for j in range(1, lb + 1):
                            cost = 0 if q.target[i - 1] == t[j - 1] else 1
                            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
                        prev = cur
                    return prev[lb]
                return edit_distance(q.target, t)

            skip_ucase = not q.target[:1].isupper()
            terms = sorted(
                t
                for t in self.ix.postings
                if not (skip_ucase and "A" <= t[:1] <= "Z")
                and dist(t) <= q.max_edit_distance
            )
            if q.max_expansion and len(terms) > q.max_expansion:
                if q.limit_policy == "most_frequent":
                    terms.sort(key=lambda t: (-len(self.ix.postings[t]), t))
                    terms = sorted(terms[: q.max_expansion])
                elif q.limit_policy == "first":
                    terms = terms[: q.max_expansion]
                else:
                    raise ValueError("edit-distance expansion over limit")
            if not terms:
                return {}
            leaves2: list[Q.Query] = [Q.Term(t) for t in terms]
            comb = {"or": Q.Or, "max": Q.MaxOp}.get(q.combiner, Q.Synonym)
            return self._weights(comb(leaves2), factor)
        if isinstance(q, Q.EliteSet):
            scored = []
            for i, c in enumerate(q.children):
                mx = 0.0
                for t in c.terms():
                    plist = self.ix.postings.get(t)
                    if not plist:
                        continue
                    cf = sum(len(p) for p in plist.values())
                    w = self._init_term(len(plist), cf, 1, factor)
                    wdf_max = max(len(p) for p in plist.values())
                    mx = max(mx, w.maxpart(wdf_max, self.ix.doclen_lower_bound()))
                scored.append((-mx, i, c))
            scored.sort(key=lambda x: (x[0], x[1]))
            kept = [c for _, _, c in scored[: q.n]]
            return self._weights(Q.Or(kept), factor) if kept else {}
        raise NotImplementedError(type(q).__name__)

    def _synonym(self, q: Q.Synonym, factor: float) -> dict[int, float]:
        ix = self.ix
        merged: dict[int, int] = {}
        for t in dict.fromkeys(q.terms()):
            for d, poss in ix.postings.get(t, {}).items():
                merged[d] = merged.get(d, 0) + len(poss)
        if not merged:
            return {}
        cf = sum(
            len(p)
            for t in dict.fromkeys(q.terms())
            for p in ix.postings.get(t, {}).values()
        )
        w = self._init_term(len(merged), cf, 1, factor)
        return {
            d: w.sumpart(min(wdf, ix.doclens[d]), ix.doclens[d], self._uniq(d))
            for d, wdf in merged.items()
        }

    def _positional(self, q: Q.Phrase | Q.Near, factor: float) -> dict[int, float]:
        terms = [c.term for c in q.children]  # term leaves only
        n = len(terms)
        window = q.window if q.window is not None else n
        and_w = self._weights(Q.And([Q.Term(t) for t in terms]), factor)
        is_phrase = isinstance(q, Q.Phrase)
        out = {}
        for d, w in and_w.items():
            plists = [self.ix.postings[t][d] for t in terms]
            ok = (
                _phrase_ok(plists, window)
                if is_phrase
                else _near_ok(plists, window)
            )
            if ok:
                out[d] = w
        return out

    def mset(self, q: Q.Query, k: int) -> list[tuple[int, float]]:
        """Top-k (doc_id, weight), weight DESC then docid ASC
        (matcher/msetcmp.cc:55-60)."""
        q = Q.normalize(q)
        if isinstance(q, Q.MatchNothing):
            return []
        from .operators.matcher import _query_len

        self._ql = max(_query_len(q), 1)
        weights = self._weights(q, 1.0)
        # document-dependent extra (Weight::get_sumextra — LM schemes)
        probe = None
        for t in q.terms():
            plist = self.ix.postings.get(t)
            if plist:
                cf = sum(len(p) for p in plist.values())
                probe = self._init_term(len(plist), cf, 1, 1.0)
                break
        if probe is not None and hasattr(probe, "sumextra"):
            weights = {
                d: w + probe.sumextra(self.ix.doclens[d], self._uniq(d))
                for d, w in weights.items()
            }
        ranked = sorted(weights.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def mset_percent(self, q: Q.Query, k: int) -> list[tuple[int, float, int]]:
        """Top-k with percent (mset.cc:449-480 semantics)."""
        from .operators.matcher import convert_to_percent

        q = Q.normalize(q)
        if isinstance(q, Q.MatchNothing):
            return []
        weights = self._weights(q, 1.0)
        mp = self._max_possible(q, 1.0)
        if weights:
            mp = max(mp, max(weights.values()))
        ranked = sorted(weights.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return [(d, w, convert_to_percent(w, mp)) for d, w in ranked]

    def _max_possible(self, q: Q.Query, factor: float) -> float:
        ix = self.ix
        dlb = ix.doclen_lower_bound()
        if isinstance(q, Q.Term):
            plist = ix.postings.get(q.term)
            if not plist:
                return 0.0
            cf = sum(len(p) for p in plist.values())
            w = self._init_term(len(plist), cf, q.wqf, factor)
            return w.maxpart(max(len(p) for p in plist.values()), dlb)
        if isinstance(q, (Q.Or, Q.And, Q.Xor, Q.Phrase, Q.Near)):
            return sum(self._max_possible(c, factor) for c in q.children)
        if isinstance(q, (Q.AndNot, Q.Filter)):
            return self._max_possible(q.left, factor)
        if isinstance(q, Q.AndMaybe):
            return self._max_possible(q.left, factor) + self._max_possible(
                q.right, factor
            )
        if isinstance(q, Q.MaxOp):
            return max((self._max_possible(c, factor) for c in q.children), default=0.0)
        if isinstance(q, Q.ScaleWeight):
            return self._max_possible(q.subquery, factor * q.factor)
        if isinstance(q, Q.Synonym):
            merged: dict[int, int] = {}
            for t in dict.fromkeys(q.terms()):
                for d, poss in ix.postings.get(t, {}).items():
                    merged[d] = merged.get(d, 0) + len(poss)
            if not merged:
                return 0.0
            cf = sum(
                len(p)
                for t in dict.fromkeys(q.terms())
                for p in ix.postings.get(t, {}).values()
            )
            w = self._init_term(len(merged), cf, 1, factor)
            wdf_max_terms = sum(
                max((len(p) for p in ix.postings.get(t, {}).values()), default=0)
                for t in set(q.terms())
            )
            wdf_max = min(wdf_max_terms, max(ix.doclens.values(), default=0))
            return w.maxpart(wdf_max, dlb)
        return 0.0

    def count(self, q: Q.Query) -> int:
        q = Q.normalize(q)
        if isinstance(q, Q.MatchNothing):
            return 0
        return len(self._weights(q, 0.0))


def _phrase_ok(plists: list[list[int]], window: int) -> bool:
    """PhrasePostList::test_doc (phrasepostlist.cc:67-104)."""
    import bisect

    for base in plists[0]:
        pos = base
        ok = True
        for arr in plists[1:]:
            k = bisect.bisect_right(arr, pos)
            if k >= len(arr) or arr[k] - base >= window:
                ok = False
                break
            pos = arr[k]
        if ok:
            return True
    return False


def _near_ok(plists: list[list[int]], window: int) -> bool:
    """NearPostList::test_doc (nearpostlist.cc:75-158): pairwise-distinct
    positions, one per term, max - min < window."""
    allpos = sorted({p for arr in plists for p in arr})
    for lo in allpos:
        hi = lo + window - 1
        cand = [[p for p in arr if lo <= p <= hi] for arr in plists]
        if any(not c for c in cand):
            continue
        if _assign_distinct(cand, frozenset()):
            return True
    return False


def _assign_distinct(cand: list[list[int]], used: frozenset) -> bool:
    if not cand:
        return True
    for p in cand[0]:
        if p not in used and _assign_distinct(cand[1:], used | {p}):
            return True
    return False


def _glob_match(pattern: str, term: str) -> bool:
    """Xapian 2.0 wildcard glob: '*' any run, '?' single char (query.h:330+)."""
    import re

    rx = "".join(
        ".*" if c == "*" else "." if c == "?" else re.escape(c) for c in pattern
    )
    return re.fullmatch(rx, term) is not None
