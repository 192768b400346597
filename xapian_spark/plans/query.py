"""Query tree — the logical IR, mirroring Xapian's ``Query`` ops.

Op set and semantics follow xapian-core/include/xapian/query.h:78-292
(enum values noted per node).  Construction-time normalizations mirror
api/queryinternal.cc:2566-2680 (MatchNothing propagation, flattening,
single-child elision) where they are semantics-preserving.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class Query:
    """Base class for query tree nodes."""

    #: does this node contribute weight (False → pure boolean, weight 0)
    weighted: bool = True

    def terms(self) -> list[str]:
        """All leaf terms in tree (pre-order, duplicates preserved)."""
        out: list[str] = []
        self._collect_terms(out)
        return out

    def _collect_terms(self, out: list[str]) -> None:
        for c in getattr(self, "children", []):
            c._collect_terms(out)
        for name in ("left", "right", "subquery"):
            c = getattr(self, name, None)
            if isinstance(c, Query):
                c._collect_terms(out)


@dataclass
class Term(Query):
    """LEAF_TERM (query.h:280). ``wqf`` = within-query frequency."""

    term: str
    wqf: int = 1

    def _collect_terms(self, out: list[str]) -> None:
        out.append(self.term)


@dataclass
class MatchAll(Query):
    """LEAF_MATCH_ALL — matches every document, weight 0 (query.h:285)."""

    weighted = False

    def _collect_terms(self, out: list[str]) -> None:
        pass


@dataclass
class MatchNothing(Query):
    """LEAF_MATCH_NOTHING (query.h:288)."""

    weighted = False

    def _collect_terms(self, out: list[str]) -> None:
        pass


@dataclass
class And(Query):
    """OP_AND (=0): all children match; weight = Σ children."""

    children: list[Query]


@dataclass
class Or(Query):
    """OP_OR (=1): any child matches; weight = Σ matching children."""

    children: list[Query]


@dataclass
class AndNot(Query):
    """OP_AND_NOT (=2): left minus right; weight from left only."""

    left: Query
    right: Query


@dataclass
class Xor(Query):
    """OP_XOR (=3): an odd number of children match."""

    children: list[Query]


@dataclass
class AndMaybe(Query):
    """OP_AND_MAYBE (=4): left required; right only adds weight."""

    left: Query
    right: Query


@dataclass
class Filter(Query):
    """OP_FILTER (=5): AND, but right contributes no weight
    (lowered with factor 0, api/queryinternal.cc:2700+)."""

    left: Query
    right: Query


@dataclass
class Near(Query):
    """OP_NEAR (=6): all terms within a positional window, any order.
    Default window = number of subqueries (query.h:591-592)."""

    children: list[Query]
    window: int | None = None


@dataclass
class Phrase(Query):
    """OP_PHRASE (=7): terms within window, in order; exact phrase when
    window == len(children)."""

    children: list[Query]
    window: int | None = None


@dataclass
class ValueRange(Query):
    """OP_VALUE_RANGE (=8) over a value column; never weighted
    (matcher/valuerangepostlist.h:32-74)."""

    column: str
    lo: object = None  # None → OP_VALUE_LE when only hi given, etc.
    hi: object = None
    weighted = False


@dataclass
class ScaleWeight(Query):
    """OP_SCALE_WEIGHT (=9): multiply subquery weight by factor ≥ 0."""

    subquery: Query
    factor: float


@dataclass
class EliteSet(Query):
    """OP_ELITE_SET (=10): keep the N subqueries with highest max weight,
    then OR them (api/queryinternal.cc:286-295). Our selection is global
    (the reference picks per-shard — documented divergence, query.h:209-214).
    """

    children: list[Query]
    n: int = 10


@dataclass
class Synonym(Query):
    """OP_SYNONYM (=13): match like OR, weight as a single pseudo-term with
    combined stats; wdf = min(Σ child wdf, doc_len)
    (matcher/synonympostlist.cc, api/queryinternal.cc:464-525)."""

    children: list[Query]


@dataclass
class MaxOp(Query):
    """OP_MAX (=14): match like OR, weight = max child."""

    children: list[Query]


@dataclass
class Wildcard(Query):
    """OP_WILDCARD (=15): expand ``pattern`` against the term dictionary.

    ``combiner``: 'synonym' (queryparser default), 'or', or 'max'.
    ``max_expansion`` + ``limit_policy`` ∈ {'error','first','most_frequent'}
    per query.h:294-340.
    """

    pattern: str  # glob: '*' and '?' supported (query.h:330+)
    combiner: str = "synonym"
    max_expansion: int = 0  # 0 = unlimited
    limit_policy: str = "error"


@dataclass
class PostingSource(Query):
    """LEAF_POSTING_SOURCE (query.h:283): a user-supplied stream of
    (doc_id, weight) — ExternalPostList (matcher/externalpostlist.cc).

    ``df`` is any DataFrame with doc_id (long) and weight (double) columns
    (weight optional → 0.0).  Built-ins like ValueWeightPostingSource or
    the geospatial LatLongDistancePostingSource (operators/geo.py) are just
    producers of such DataFrames.
    """

    df: object  # DataFrame(doc_id[, weight])

    def _collect_terms(self, out: list[str]) -> None:
        pass


@dataclass
class EditDistance(Query):
    """OP_EDIT_DISTANCE (=16, query.h:269): expand to dictionary terms
    within ``max_edit_distance`` edits (ins/del/sub/transpose) of
    ``target``, then combine like OP_WILDCARD (api/queryinternal.cc:317-380;
    same limit policies).

    ``metric``: 'osa' = the reference's restricted Damerau-Levenshtein
    (api/editdistance.cc); 'levenshtein' = plain Levenshtein (JVM/SQL
    built-in — used by oracle-checked entries since DuckDB's
    damerau_levenshtein is full DL, which differs from OSA).
    """

    target: str
    max_edit_distance: int = 2
    combiner: str = "synonym"
    max_expansion: int = 0
    limit_policy: str = "error"
    metric: str = "osa"


def normalize(q: Query) -> Query:
    """Construction-time rewrites (api/queryinternal.cc:2566-2680):

    - MatchNothing propagation through AND / AND_NOT / SCALE_WEIGHT;
    - OR / XOR / SYNONYM / MAX drop MatchNothing children;
    - associative flattening of AND-of-AND and OR-of-OR;
    - single-child elision.
    """
    if isinstance(q, (And, Or, Xor, Synonym, MaxOp, EliteSet, Near, Phrase)):
        kids = [normalize(c) for c in q.children]
        if isinstance(q, And):
            if any(isinstance(c, MatchNothing) for c in kids):
                return MatchNothing()
            flat: list[Query] = []
            for c in kids:
                flat.extend(c.children if isinstance(c, And) else [c])
            kids = flat
        else:
            kids = [c for c in kids if not isinstance(c, MatchNothing)]
            if not kids:
                return MatchNothing()
            if isinstance(q, Or):
                flat = []
                for c in kids:
                    flat.extend(c.children if isinstance(c, Or) else [c])
                kids = flat
        if len(kids) == 1 and not isinstance(q, (Near, Phrase)):
            return kids[0]
        out = type(q)(children=kids)
        for f in ("window", "n"):
            if hasattr(q, f):
                setattr(out, f, getattr(q, f))
        return out
    if isinstance(q, (AndNot, Filter, AndMaybe)):
        left = normalize(q.left)
        right = normalize(q.right)
        if isinstance(left, MatchNothing):
            return MatchNothing()
        if isinstance(right, MatchNothing):
            # X AND_NOT ∅ → X; X AND_MAYBE ∅ → X; X FILTER ∅ → ∅ for FILTER?
            # Reference: FILTER with empty right matches nothing (right is
            # required); AND_NOT/AND_MAYBE keep left.
            if isinstance(q, Filter):
                return MatchNothing()
            return left
        return type(q)(left, right)
    if isinstance(q, ScaleWeight):
        sub = normalize(q.subquery)
        if isinstance(sub, MatchNothing):
            return MatchNothing()
        if isinstance(sub, ScaleWeight):
            return ScaleWeight(sub.subquery, sub.factor * q.factor)
        return ScaleWeight(sub, q.factor)
    return q
