"""QueryParser — text → Query tree, driver-side pure Python.

Re-expresses the reference parser's behavior
(xapian-core/queryparser/queryparser.lemony) for the feature set
FLAG_PHRASE | FLAG_BOOLEAN | FLAG_LOVEHATE (the reference default,
include/xapian/queryparser.h:791) plus the opt-in flags FLAG_WILDCARD,
FLAG_BOOLEAN_ANY_CASE (lowercase operators), FLAG_PURE_NOT (``NOT x`` →
0·MatchAll AND_NOT x), FLAG_PARTIAL (search-as-you-type final-word
wildcard), FLAG_SPELLING_CORRECTION, FLAG_SYNONYM / FLAG_AUTO_SYNONYMS /
FLAG_AUTO_MULTIWORD_SYNONYMS (greedy longest multi-word synonym keys over
term groups), FLAG_FUZZY, FLAG_NGRAMS (the ``ngrams=True`` ctor arg) and
FLAG_WILDCARD_MULTI / SINGLE / GLOB (glob wildcards anywhere in a word),
and a FLAG_WORD_BREAKS analog (the ``word_breaks=lexicon`` ctor arg —
greedy longest-match segmentation standing in for ICU's dictionary
BreakIterator, words combined with OP_AND per the USE_ICU branch of
as_unbroken_query), FLAG_ACCUMULATE (keep stoplist/unstem data across
parses) and FLAG_NO_POSITIONS (phrase/NEAR/ADJ degrade to OP_AND); flag
VALUES mirror queryparser.h exactly.  A query-side stopper
(set_stopper), stoplist() and unstem() complete the introspection
surface.  The full queryparser.h flag enum is now implemented:

- default combining operator OP_OR (queryparser_internal.h:97);
- boolean operators AND / OR / NOT / XOR (uppercase only), with the
  reference's precedence OR < XOR < AND/NOT < NEAR/ADJ/phrase
  (queryparser.lemony:2231-2234);
- NEAR/n and ADJ/n positional operators (lemony:1534-1574) — ADJ maps to
  OP_PHRASE (ordered), NEAR to OP_NEAR.  Window math matches the reference
  exactly (as_near_query/as_adj_query, lemony:2155-2173 →
  as_opwindow_query:2041-2045): the op carries a width w (default 10, i.e.
  "a NEAR b" = within 10 terms), and the final window is
  (w - 1) + number_of_terms — so ``a NEAR b`` → window 11, ``a NEAR/5 b``
  → window 6, ``a ADJ b c`` → window 12;
- "quoted phrases" → OP_PHRASE with window = #terms;
- +love / -hate prefixes: love terms are ANDed and AND_MAYBEd with the
  rest; hate terms are AND_NOTed (lovehate semantics);
- trailing ``*`` → OP_WILDCARD when enabled;
- term production uses the SAME tokenizer as indexing (queryparser and
  TermGenerator share parse_terms in the reference);
- field prefixes (queryparser.h:1051-1169, termprefixes.rst:55-105):
  ``add_prefix('title', 'S')`` makes ``title:word`` produce the
  probabilistic term ``Sword`` (stemmed: ``ZSstem`` — Z before the field
  prefix, as the reference generates); ``add_boolean_prefix('lang', 'XL')``
  makes ``lang:value`` a FILTER term ``XLvalue`` (value verbatim, wdf-0
  boolean term) — same-field filters OR together, different fields AND,
  and the whole filter set applies as OP_FILTER over the probabilistic
  part (a filters-only query is pure boolean, weight 0);
- range processors (queryparser.h:139-330): ``add_rangeprocessor``
  registers Str/NumberRangeProcessor instances; ``field:lo..hi`` (or bare
  ``lo..hi`` for a processor with field='') lowers to OP_VALUE_RANGE over
  the processor's docs-table column — our engine's value slots are typed
  columns, so NumberRangeProcessor casts instead of sortable_serialise.

Multi-word tokens inside one query word (e.g. typing ``don't``) produce the
same single term the indexer would.

Divergence (documented): the reference hoists boolean filters to the top
level of the whole prompt; we apply them within the primary group they
appear in — identical for the common flat query shapes.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from ..functions.prefixes import make_term
from ..functions.tokenizer import simple_tokenize, xapian_tokenize
from . import query as Q

# Flag values mirror include/xapian/queryparser.h exactly (":539-791")
FLAG_BOOLEAN = 1
FLAG_PHRASE = 2
FLAG_LOVEHATE = 4
FLAG_BOOLEAN_ANY_CASE = 8  # lowercase and/or/not/xor (queryparser.h:539)
FLAG_WILDCARD = 16  # right truncation only (queryparser.h:556)
FLAG_PURE_NOT = 32  # 'NOT apples' with no left side (queryparser.h:563)
FLAG_PARTIAL = 64  # search-as-you-type final-word wildcard (queryparser.h:584)
FLAG_SPELLING_CORRECTION = 128  # "did you mean" (queryparser.h:592-604)
FLAG_SYNONYM = 256  # '~term' syntax (queryparser.h:605)
FLAG_AUTO_SYNONYMS = 512  # every term auto-expands (queryparser.h:610)
FLAG_AUTO_MULTIWORD_SYNONYMS = 1024  # term-group synonyms (queryparser.h:618)
FLAG_NGRAMS = 2048  # unbroken-script n-grams (queryparser.h:640); = ngrams=True
FLAG_CJK_NGRAM = FLAG_NGRAMS  # old name (queryparser.h:650)
FLAG_WORD_BREAKS = 4096  # dictionary word breaks (queryparser.h:665); needs word_breaks=lexicon
FLAG_WILDCARD_MULTI = 8192  # '*' anywhere in a word (queryparser.h:680)
FLAG_WILDCARD_SINGLE = 16384  # '?' matches one char (queryparser.h:695)
FLAG_WILDCARD_GLOB = FLAG_WILDCARD_MULTI | FLAG_WILDCARD_SINGLE
FLAG_FUZZY = 32768  # 'word~k' edit distance (queryparser.h:718)
FLAG_ACCUMULATE = 65536  # keep unstem/stoplist across parses (queryparser.h:733)
FLAG_NO_POSITIONS = 0x20000  # phrase/NEAR/ADJ degrade to AND (queryparser.h:744)
DEFAULT_FLAGS = FLAG_BOOLEAN | FLAG_PHRASE | FLAG_LOVEHATE
FLAG_DEFAULT = DEFAULT_FLAGS  # the reference's name (queryparser.h:791)

# search-as-you-type guardrail (queryparser_internal.h:125)
MIN_PARTIAL_PREFIX_LEN = 2

FLAG_NO_PROPER_NOUN_HEURISTIC = 0x40000  # queryparser.h:779

# Languages whose stemmers enable the capitalised-word (proper noun)
# heuristic — the hard-coded list from the reference's Snowball compiler
# (languages/compiler/generator.c:2489-2524), alias-inclusive.
_PROPER_NOUN_HEURISTIC_LANGS = frozenset({
    "nl", "dutch", "da", "danish", "fr", "french", "lovins", "porter",
    "ca", "catalan", "en", "english", "it", "italian", "es", "spanish",
    "sv", "swedish", "nb", "nn", "no", "norwegian", "id", "indonesian",
    "pt", "portuguese", "dutch_porter", "earlyenglish",
})


@dataclass
class RangeProcessor:
    """String range processor (queryparser.h:139-330): ``field:lo..hi`` →
    OP_VALUE_RANGE over ``column``.  ``field=''`` handles bare ranges."""

    column: str
    field: str = ""

    def parse(self, lo: str, hi: str) -> Q.Query:
        return Q.ValueRange(self.column, lo or None, hi or None)


@dataclass
class NumberRangeProcessor(RangeProcessor):
    """NumberRangeProcessor (queryparser.h:471+): numeric endpoints.

    The reference serializes through sortable_serialise into a value slot;
    our value slots are native typed columns, so endpoints just become
    numbers (functions/sortable.py proves byte-level parity separately)."""

    def parse(self, lo: str, hi: str) -> Q.Query | None:
        def num(s):
            if not s:
                return None
            f = float(s)
            return int(f) if f.is_integer() else f

        try:
            return Q.ValueRange(self.column, num(lo), num(hi))
        except ValueError:
            return None  # not a number → OP_INVALID (text stays plain terms)


# ---- DateRangeProcessor (api/rangeproc.cc:39-260) --------------------------

_DIGITS = frozenset("0123456789")

# We just need month <= 12 and a loose day bound to decide if an ambiguous
# aa/bb/cc date COULD be a given format (rangeproc.cc:71-77 keeps Feb at 29
# "without being anal about exact month lengths").
_MAX_MONTH_LEN = (31, 29, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)


def _decode_xxy(s: str):
    """rangeproc.cc:39-69 — parse ``x1<sep>x2<sep>y`` with sep ∈ {/,-,.},
    1-2 digit x fields in 1..31, 1-4 digit year.  Empty → (-1,-1,-1)
    (open endpoint); unparseable → None."""
    if s == "":
        return (-1, -1, -1)
    if not (5 <= len(s) <= 10):
        return None
    i = 0
    if s[i] not in _DIGITS:
        return None
    x1 = ord(s[i]) - 48
    i += 1
    if i < len(s) and s[i] in _DIGITS:
        x1 = x1 * 10 + ord(s[i]) - 48
        i += 1
    if not (1 <= x1 <= 31):
        return None
    if i >= len(s) or s[i] not in "/-.":
        return None
    sep = s[i]
    i += 1
    if i >= len(s) or s[i] not in _DIGITS:
        return None
    x2 = ord(s[i]) - 48
    i += 1
    if i < len(s) and s[i] in _DIGITS:
        x2 = x2 * 10 + ord(s[i]) - 48
        i += 1
    if not (1 <= x2 <= 31):
        return None
    if i >= len(s) or s[i] != sep:
        return None
    i += 1
    if len(s) - i > 4:
        return None
    if i >= len(s) or s[i] not in _DIGITS:
        return None
    y = 0
    while i < len(s) and s[i] in _DIGITS:
        y = y * 10 + ord(s[i]) - 48
        i += 1
    return (x1, x2, y) if i == len(s) else None


def _vet_dm(d: int, m: int) -> bool:
    """rangeproc.cc:79-87."""
    if m == -1:
        return True
    if m > 12 or m < 1:
        return False
    return 1 <= d <= _MAX_MONTH_LEN[m - 1]


def _is_yyyy_mm_dd(s: str) -> bool:
    """rangeproc.cc:89-97 (length already checked to be 10)."""
    return (
        all(c in _DIGITS for c in s[:4] + s[5:7] + s[8:10])
        and s[4] == s[7]
        and s[4] in "-./"
    )


@dataclass
class DateRangeProcessor(RangeProcessor):
    """Date range (queryparser.h:254-352, api/rangeproc.cc:185-260):
    ``date:2020-03-01..2020-06-30`` → OP_VALUE_RANGE over a DATE column.

    Recognised endpoint formats (any mix): YYYYMMDD, YYYY-MM-DD (sep -, .
    or /), and D/M/Y or M/D/Y with 1-2 digit day/month, 1-4 digit year and
    sep -, . or /.  Ambiguous x/y/z dates assume start ≤ end to
    disambiguate, else day/month/year unless ``prefer_mdy``
    (RP_DATE_PREFER_MDY).  2-digit years pivot on ``epoch_year``: y+1900,
    +100 more if still below the epoch (so 1/1/69 → 2069 with the default
    1970).  Either endpoint may be empty (open range).

    The reference serializes to a "YYYYMMDD" string value; our value slots
    are typed columns, so endpoints become datetime.date.  Divergence: a
    vetted-but-invalid calendar day (e.g. Feb 29 in a non-leap year — the
    reference compares it lexically) is rejected here (falls back to a
    plain term) because a DATE column has no such value.
    """

    prefer_mdy: bool = False
    epoch_year: int = 1970

    def parse(self, lo: str, hi: str) -> Q.Query | None:
        import datetime

        b, e = lo, hi

        def mk(lo_d, hi_d):
            return Q.ValueRange(self.column, lo_d, hi_d)

        def ymd(y, m, d):
            return datetime.date(y, m, d)  # may raise ValueError → caller

        try:
            # YYYYMMDD (rangeproc.cc:188-195)
            if (
                len(b) in (0, 8)
                and len(e) in (0, 8)
                and all(c in _DIGITS for c in b + e)
            ):
                return mk(
                    ymd(int(b[:4]), int(b[4:6]), int(b[6:8])) if b else None,
                    ymd(int(e[:4]), int(e[4:6]), int(e[6:8])) if e else None,
                )
            # YYYY-MM-DD (rangeproc.cc:196-211)
            if (
                len(b) in (0, 10)
                and len(e) in (0, 10)
                and (not b or _is_yyyy_mm_dd(b))
                and (not e or _is_yyyy_mm_dd(e))
            ):
                return mk(
                    ymd(int(b[:4]), int(b[5:7]), int(b[8:10])) if b else None,
                    ymd(int(e[:4]), int(e[5:7]), int(e[8:10])) if e else None,
                )
            # x/y/z with DMY/MDY disambiguation (rangeproc.cc:212-258)
            db, de = _decode_xxy(b), _decode_xxy(e)
            if db is None or de is None:
                return None
            b_d, b_m, b_y = db
            e_d, e_m, e_y = de
            if (
                not self.prefer_mdy
                and _vet_dm(b_d, b_m)
                and _vet_dm(e_d, e_m)
                and (b_y != e_y or b_m < e_m or (b_m == e_m and b_d <= e_d))
            ):
                pass  # consistent as DMY
            elif (
                _vet_dm(b_m, b_d)
                and _vet_dm(e_m, e_d)
                and (b_y != e_y or b_d < e_d or (b_d == e_d and b_m <= e_m))
            ):
                b_m, b_d = b_d, b_m
                e_m, e_d = e_d, e_m
            elif (
                self.prefer_mdy
                and _vet_dm(b_d, b_m)
                and _vet_dm(e_d, e_m)
                and (b_y != e_y or b_m < e_m or (b_m == e_m and b_d <= e_d))
            ):
                pass
            else:
                return None

            def pivot(y):
                if y < 100:
                    y += 1900
                    if y < self.epoch_year:
                        y += 100
                return y

            return mk(
                ymd(pivot(b_y), b_m, b_d) if b else None,
                ymd(pivot(e_y), e_m, e_d) if e else None,
            )
        except ValueError:
            return None  # invalid calendar date (see divergence note)


# ---- UnitRangeProcessor (api/rangeproc.cc:324-440) -------------------------

_BYTE_UNITS = {
    "B": 1.0,
    "K": 1024.0,
    "M": 1024.0 * 1024.0,
    "G": 1024.0 * 1024.0 * 1024.0,
    "T": 1024.0 * 1024.0 * 1024.0 * 1024.0,
}

# strtod-style longest numeric prefix
_FLOAT_PREFIX_RX = re.compile(r"[+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?")


@dataclass
class UnitRangeProcessor(RangeProcessor):
    """Byte-unit range (queryparser.h:423-467, api/rangeproc.cc:324-440):
    ``size:3K..10K`` → OP_VALUE_RANGE in bytes.  Unit suffixes B/K/M/G/T
    scale by 1024ᵏ.  Reference rules ported exactly: the END endpoint must
    carry a unit when non-empty; a unit-less START inherits the end's
    factor (``20..100K`` ≡ 20K..100K); an empty end requires the start to
    have a unit (``200..`` is not a unit range).  The reference serializes
    through sortable_serialise — our slots are typed numeric columns, so
    endpoints stay doubles (byte-level sortable parity is proven separately
    in functions/sortable.py)."""

    def parse(self, lo: str, hi: str) -> Q.Query | None:
        num_b = 0.0
        b_has_unit = False
        if lo:
            m = _FLOAT_PREFIX_RX.match(lo)
            if m is None:
                return None
            num_b = float(m.group(0))
            rest = lo[m.end():]
            if len(rest) == 1:
                factor_b = _BYTE_UNITS.get(rest)
                if factor_b is None:
                    return None
                b_has_unit = True
                num_b *= factor_b
            # rangeproc.cc:374: longer trailing text after the number is
            # ignored by strtod-based parsing (only size-1 is a unit check)
        num_e = 0.0
        if hi:
            m = _FLOAT_PREFIX_RX.match(hi)
            if m is None:
                return None
            num_e = float(m.group(0))
            rest = hi[m.end():]
            if len(rest) == 1:
                factor_e = _BYTE_UNITS.get(rest)
                if factor_e is None:
                    return None
                num_e *= factor_e
                if lo and not b_has_unit:
                    # 20..100K means 20K..100K (rangeproc.cc:415-419)
                    num_b *= factor_e
            else:
                return None  # non-empty end must carry a unit
        elif lo and not b_has_unit:
            return None  # "200.." — no unit anywhere (rangeproc.cc:428-432)
        return Q.ValueRange(
            self.column, num_b if lo else None, num_e if hi else None
        )

_TOKEN_RX = re.compile(
    r"""
    (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<quote>"[^"]*")
  | (?P<op>\b(?:AND|OR|NOT|XOR)\b)
  | (?P<near>\b(?:NEAR|ADJ)(?:/(?P<w>\d+))?\b)
  | (?P<love>\+(?=\S))
  | (?P<hate>-(?=\S))
  | (?P<word>[^\s()"]+)
    """,
    re.X,
)


@dataclass
class _Tok:
    kind: str
    text: str
    window: int | None = None
    prefix: str | None = None  # 'love' | 'hate'
    field: str | None = None  # registered field name the token was scoped to
    proc: object | None = None  # RangeProcessor for kind='range'
    hi: str | None = None  # range upper endpoint (text holds lo)
    raw: str | None = None  # original word (fallback when a range rejects)
    partial: bool = False  # FLAG_PARTIAL: final word, no trailing whitespace


class QueryParser:
    def __init__(
        self,
        flags: int = DEFAULT_FLAGS,
        default_op: str = "or",
        mode: str = "xapian",
        stem: str | None = None,
        ngrams: bool = False,
        word_breaks: frozenset[str] | set[str] | None = None,
    ):
        """``stem='en'``: free-text terms become Z-prefixed stemmed forms
        (STEM_SOME query side — the parser generates Zstem terms for
        probabilistic terms, unstemmed for phrases/positional ops, matching
        QueryParser behavior with a stemmer set).

        ``ngrams=True``: CJK/unbroken-script query text is segmented into
        positional unigrams and searched as a phrase over an
        ``build_index(ngrams=True)`` index (FLAG_NGRAMS — the reference
        feeds unbroken spans through the same NgramIterator and combines
        the unigrams positionally, queryparser.lemony
        as_positional_unbroken).

        ``word_breaks``: FLAG_WORD_BREAKS analog (queryparser.h FLAG_WORD
        _BREAKS, lemony as_unbroken_query USE_ICU branch:598-613) —
        unbroken-script query spans segment into WORDS via greedy
        longest-match against this lexicon and combine with OP_AND, the
        reference's exact combination for ICU-broken words.  Pass the
        same lexicon the index was built with.  Mutually exclusive with
        ``ngrams``."""
        if ngrams and word_breaks is not None:
            raise ValueError("ngrams and word_breaks are mutually exclusive")
        self.word_breaks = frozenset(word_breaks) if word_breaks is not None else None
        # FLAG_NGRAMS is equivalent to the ctor arg; FLAG_WORD_BREAKS
        # additionally needs the lexicon (like the reference needs ICU)
        self.ngrams = ngrams or bool(flags & FLAG_NGRAMS)
        if flags & FLAG_WORD_BREAKS and word_breaks is None:
            raise ValueError(
                "FLAG_WORD_BREAKS requires word_breaks=<lexicon> (the "
                "dictionary stands in for ICU here)"
            )
        if self.ngrams and word_breaks is not None:
            raise ValueError("ngrams and word_breaks are mutually exclusive")
        self.flags = flags
        self.default_op = default_op
        self._tok = xapian_tokenize if mode == "xapian" else simple_tokenize
        self._stem = None
        #: proper-noun heuristic (queryparser.lemony State ctor:229-233):
        #: capitalising a word prevents stemming, for languages where the
        #: trade is worthwhile, unless FLAG_NO_PROPER_NOUN_HEURISTIC
        self._pn_heuristic = False
        if stem is not None:
            from ..functions.stemmers import get_stemmer

            self._stem = get_stemmer(stem)
            self._pn_heuristic = (
                not flags & FLAG_NO_PROPER_NOUN_HEURISTIC
                and stem.lower() in _PROPER_NOUN_HEURISTIC_LANGS
            )
        self._prefixes: dict[str, list[str]] = {}
        self._bool_prefixes: dict[str, list[str]] = {}
        self._range_procs: dict[str, RangeProcessor] = {}
        #: query-expansion synonym dictionary (glass_synonym.h analog):
        #: term → [synonyms].  Set directly or via use_synonyms(index).
        self._synonyms: dict[str, list[str]] = {}
        self._corrected_query = ""
        self._corrections: list[tuple[int, int, str]] = []
        #: query-side stopper (SimpleStopper analog, queryparser.h:812+)
        self._stopper: frozenset[str] | None = None
        #: words dropped by the stopper during the last parse
        #: (stoplist_begin/end; FLAG_ACCUMULATE keeps it across parses)
        self._stoplist: list[str] = []
        #: generated term → original typed words (unstem_begin/end)
        self._unstem: dict[str, list[str]] = {}

    def set_stopper(self, words) -> None:
        """QueryParser::set_stopper (queryparser.h:812+): free-text terms
        matching the stopper are dropped (recorded in stoplist()); quoted
        phrases, positional ops, +love/-hate and field-scoped terms keep
        their stopwords like the reference, and a group consisting ONLY of
        stopwords rolls back and keeps them (lemony:1981-1990)."""
        self._stopper = frozenset(words) if words is not None else None

    def stoplist(self) -> list[str]:
        """stoplist_begin/end analog: words stopped by the last parse
        (accumulated across parses under FLAG_ACCUMULATE)."""
        return list(self._stoplist)

    def unstem(self, term: str) -> list[str]:
        """unstem_begin/end analog: the original typed words that produced
        ``term`` in the last parse (accumulated under FLAG_ACCUMULATE)."""
        return list(self._unstem.get(term, []))

    def _note_unstem(self, node, original: str) -> None:
        """Record original text for every Term leaf under ``node``."""
        if node is None:
            return
        stack = [node]
        while stack:
            n = stack.pop()
            if isinstance(n, Q.Term):
                lst = self._unstem.setdefault(n.term, [])
                if original not in lst:
                    lst.append(original)
            for attr in ("children", "left", "right", "subquery"):
                v = getattr(n, attr, None)
                if isinstance(v, list):
                    stack.extend(v)
                elif isinstance(v, Q.Query):
                    stack.append(v)

    def set_database(self, index) -> None:
        """Attach an index for FLAG_SPELLING_CORRECTION
        (QueryParser::set_database, queryparser.h:880+): spelling
        suggestions come from its dictionary via the trigram table, which
        is built lazily ONCE and cached on the parser."""
        self._spell_index = index
        self._spell_trigrams = None
        self._spell_cache: dict[str, str | None] = {}

    def get_corrected_query_string(self) -> str:
        """The last parsed query with spelling corrections applied
        (queryparser.h:868+) — empty string when no term was corrected.
        Corrections never alter the parsed Query itself, exactly like the
        reference: callers display "did you mean …?" and re-parse."""
        return self._corrected_query

    def _suggest(self, term: str) -> str | None:
        ix = getattr(self, "_spell_index", None)
        if ix is None:
            return None
        if term in self._spell_cache:
            return self._spell_cache[term]
        from ..operators.spelling import suggest, trigram_table

        if self._spell_trigrams is None:
            self._spell_trigrams = trigram_table(ix.dictionary).persist()
        spark = ix.dictionary.sparkSession
        got = suggest(spark, ix, term, trigrams=self._spell_trigrams)
        self._spell_cache[term] = got
        return got

    def set_synonyms(self, synonyms: dict[str, list[str]]) -> None:
        """Attach a synonym table (small, driver-side — the reference reads
        it from the database's synonym B-tree per term)."""
        self._synonyms = dict(synonyms)

    def use_synonyms(self, index) -> None:
        """Load the synonym table stored in an index's metadata KV."""
        self.set_synonyms(index.metadata.get(index.SYNONYM_KEY, {}))

    def _synonym_expand(self, node: Q.Query) -> Q.Query:
        """term → OP_SYNONYM(term, syn...) when the table has an entry
        (queryparser FLAG_SYNONYM/~ and FLAG_AUTO_SYNONYMS lowering)."""
        if not isinstance(node, Q.Term):
            return node
        syns = self._synonyms.get(node.term)
        if not syns:
            return node
        return Q.Synonym([node] + [Q.Term(s) for s in syns])

    def add_prefix(self, field: str, prefix: str) -> None:
        """Probabilistic field prefix (QueryParser::add_prefix,
        queryparser.h:1051-1100).  Repeated calls for one field OR the
        expansions together."""
        self._prefixes.setdefault(field, []).append(prefix)

    def add_boolean_prefix(self, field: str, prefix: str) -> None:
        """Boolean filter prefix (queryparser.h:1101-1169)."""
        self._bool_prefixes.setdefault(field, []).append(prefix)

    def add_rangeprocessor(self, proc: RangeProcessor) -> None:
        self._range_procs[proc.field] = proc

    # -- public ------------------------------------------------------------
    def parse_query(self, text: str) -> Q.Query:
        self._corrected_query = ""
        self._corrections: list[tuple[int, int, str]] = []
        if not self.flags & FLAG_ACCUMULATE:
            # default: unstem + stoplist reset per parse (queryparser.h:720)
            self._stoplist = []
            self._unstem = {}
        toks = self._lex(text)
        if self._corrections:
            # splice suggestions into the ORIGINAL query string, right to
            # left so earlier spans stay valid (queryparser.lemony:1668-1685
            # does the same with a running offset)
            out = text
            for start, end, sug in sorted(self._corrections, reverse=True):
                out = out[:start] + sug + out[end:]
            self._corrected_query = out
        if not toks:
            return Q.MatchNothing()
        tree, pos = self._parse_or(toks, 0)
        return Q.normalize(tree) if tree is not None else Q.MatchNothing()

    # -- lexer ---------------------------------------------------------------
    def _lex(self, text: str) -> list[_Tok]:
        out: list[_Tok] = []
        pending_prefix: str | None = None
        pending_field: str | None = None  # 'field:' just seen, phrase follows
        for m in _TOKEN_RX.finditer(text):
            if m.group("lparen"):
                out.append(_Tok("(", "("))
            elif m.group("rparen"):
                out.append(_Tok(")", ")"))
            elif m.group("quote") and self.flags & FLAG_PHRASE:
                out.append(
                    _Tok(
                        "phrase",
                        m.group("quote")[1:-1],
                        prefix=pending_prefix,
                        field=pending_field,
                    )
                )
                pending_prefix = pending_field = None
            elif m.group("quote"):
                out.append(
                    _Tok(
                        "word",
                        m.group("quote")[1:-1],
                        prefix=pending_prefix,
                        field=pending_field,
                    )
                )
                pending_prefix = pending_field = None
            elif m.group("op") and self.flags & FLAG_BOOLEAN:
                out.append(_Tok(m.group("op"), m.group("op")))
            elif m.group("near") and self.flags & FLAG_BOOLEAN:
                w = m.group("w")
                out.append(
                    _Tok(
                        "NEAR" if m.group("near").startswith("NEAR") else "ADJ",
                        m.group("near"),
                        window=int(w) if w else None,
                    )
                )
            elif m.group("love") and self.flags & FLAG_LOVEHATE:
                pending_prefix = "love"
            elif m.group("hate") and self.flags & FLAG_LOVEHATE:
                pending_prefix = "hate"
            else:
                word = m.group("word") or m.group("op") or m.group("near")
                # FLAG_BOOLEAN_ANY_CASE (queryparser.h:539, lemony:1516-1522):
                # recognize lowercase/mixed-case operators by upper-casing
                # the candidate before the operator check
                if (
                    self.flags & FLAG_BOOLEAN
                    and self.flags & FLAG_BOOLEAN_ANY_CASE
                    and m.group("word")
                ):
                    up = word.upper()
                    if up in ("AND", "OR", "NOT", "XOR"):
                        out.append(_Tok(up, up))
                        pending_prefix = None
                        continue
                    nm = re.match(r"^(NEAR|ADJ)(?:/(\d+))?$", up)
                    if nm is not None:
                        out.append(
                            _Tok(
                                nm.group(1),
                                up,
                                window=int(nm.group(2)) if nm.group(2) else None,
                            )
                        )
                        pending_prefix = None
                        continue
                tok, pending_field = self._classify_word(word, pending_prefix)
                if tok is not None:
                    # FLAG_PARTIAL (queryparser.h:584, lemony:1648-1662):
                    # the final word, only when nothing (not even
                    # whitespace) follows it, becomes a wildcarded match.
                    # Boolean-prefix fields, ranges, phrases and wildcards
                    # are excluded like the reference.
                    if (
                        self.flags & FLAG_PARTIAL
                        and tok.kind == "word"
                        and m.end() == len(text)
                        and (tok.field is None or tok.field in self._prefixes)
                        and not tok.text.endswith("*")
                    ):
                        tok.partial = True
                    # FLAG_SPELLING_CORRECTION (queryparser.lemony:1668-1685):
                    # only plain unprefixed free-text terms are checked —
                    # field-scoped words, ranges, fuzzy/synonym syntax and
                    # wildcards are skipped like the reference's
                    # empty-prefix + !was_acronym guard.
                    if (
                        self.flags & FLAG_SPELLING_CORRECTION
                        and tok.kind == "word"
                        and tok.field is None
                        and not tok.partial  # partial final word → wildcard
                        and not (self.flags & FLAG_WILDCARD and tok.text.endswith("*"))
                    ):
                        terms = self._tok(tok.text)
                        if len(terms) == 1:
                            s = self._suggest(terms[0])
                            if s is not None and s != terms[0]:
                                self._corrections.append((m.start(), m.end(), s))
                    out.append(tok)
                    pending_prefix = None
        return out

    # lo is non-greedy so the FIRST ".." splits the range — endpoints may
    # themselves contain single dots (dates like 25.12.2025, sizes like 0.5K)
    _RANGE_RX = re.compile(r"^(?:(?P<f>[A-Za-z_][\w]*):)?(?P<lo>.*?)\.\.(?P<hi>.*)$")

    def _classify_word(
        self, word: str, pending_prefix: str | None
    ) -> tuple[_Tok | None, str | None]:
        """word → (token, pending_field).  Recognizes registered ranges and
        field-scoped words; unknown ``foo:bar`` stays one plain word (the
        reference also keeps unregistered fields as terms)."""
        rm = self._RANGE_RX.match(word)
        if rm is not None:
            f = rm.group("f") or ""
            proc = self._range_procs.get(f)
            if proc is not None:
                return (
                    _Tok(
                        "range",
                        rm.group("lo"),
                        proc=proc,
                        hi=rm.group("hi"),
                        raw=word,
                    ),
                    None,
                )
        if ":" in word:
            head, _, rest = word.partition(":")
            if head in self._prefixes or head in self._bool_prefixes:
                if rest == "":
                    # `field:"quoted phrase"` — field applies to next token
                    return None, head
                return (
                    _Tok("word", rest, prefix=pending_prefix, field=head),
                    None,
                )
        if self.flags & FLAG_SYNONYM and word.startswith("~") and len(word) > 1:
            return _Tok("synonym", word[1:], prefix=pending_prefix), None
        if self.flags & FLAG_FUZZY:
            fm = re.match(r"^(.+?)~(\d*)$", word)
            if fm is not None:
                return (
                    _Tok(
                        "fuzzy",
                        fm.group(1),
                        window=int(fm.group(2)) if fm.group(2) else None,
                        prefix=pending_prefix,
                    ),
                    None,
                )
        return _Tok("word", word, prefix=pending_prefix), None

    # -- grammar (precedence climbing, lemony:2231-2234) --------------------
    def _parse_or(self, toks, i):
        left, i = self._parse_xor(toks, i)
        parts = [left]
        while i < len(toks) and toks[i].kind == "OR":
            nxt, i = self._parse_xor(toks, i + 1)
            parts.append(nxt)
        parts = [p for p in parts if p is not None]
        if not parts:
            return None, i
        return (parts[0] if len(parts) == 1 else Q.Or(parts)), i

    def _parse_xor(self, toks, i):
        left, i = self._parse_and(toks, i)
        parts = [left]
        while i < len(toks) and toks[i].kind == "XOR":
            nxt, i = self._parse_and(toks, i + 1)
            parts.append(nxt)
        parts = [p for p in parts if p is not None]
        if not parts:
            return None, i
        return (parts[0] if len(parts) == 1 else Q.Xor(parts)), i

    def _parse_and(self, toks, i):
        left, i = self._parse_near(toks, i)
        while i < len(toks) and toks[i].kind in ("AND", "NOT"):
            if toks[i].kind == "NOT" or (
                toks[i].kind == "AND"
                and i + 1 < len(toks)
                and toks[i + 1].kind == "NOT"
            ):
                i += 1 if toks[i].kind == "NOT" else 2
                right, i = self._parse_near(toks, i)
                if right is not None:
                    if left is None and self.flags & FLAG_PURE_NOT:
                        # 'NOT foo' → (0 * <alldocuments>) AND_NOT foo
                        # (FLAG_PURE_NOT, queryparser.lemony:2306-2315 —
                        # scaled by 0 so it doesn't add weight and an
                        # enclosing AND can still eliminate it)
                        left = Q.AndNot(
                            Q.ScaleWeight(Q.MatchAll(), 0.0), right
                        )
                    else:
                        left = Q.AndNot(left, right) if left is not None else None
            else:
                right, i = self._parse_near(toks, i + 1)
                if left is None:
                    left = right
                elif right is not None:
                    kids = left.children if isinstance(left, Q.And) else [left]
                    left = Q.And(kids + [right])
        return left, i

    def _positional(self, cls, terms, window):
        """Build a positional node — or its OP_AND degradation under
        FLAG_NO_POSITIONS (queryparser.h:744: "phrase searches, NEAR and
        ADJ will result in OP_AND")."""
        if self.flags & FLAG_NO_POSITIONS:
            return terms[0] if len(terms) == 1 else Q.And(list(terms))
        return cls(terms, window=window)

    def _parse_near(self, toks, i):
        left, i = self._parse_primary(toks, i)
        while i < len(toks) and toks[i].kind in ("NEAR", "ADJ"):
            op = toks[i]
            right, i = self._parse_primary(toks, i + 1)
            if right is None:
                break
            terms = []
            for side in (left, right):
                if isinstance(side, Q.Term):
                    terms.append(side)
                elif isinstance(side, (Q.Near, Q.Phrase)):
                    terms.extend(side.children)
                elif isinstance(side, Q.And) and self.flags & FLAG_NO_POSITIONS:
                    terms.extend(side.children)
                else:
                    raise ValueError(f"{op.kind} requires plain terms")
            # window = (width - 1) + #terms, width defaulting to 10
            # (as_opwindow_query, queryparser.lemony:2041-2045,2155-2173)
            width = op.window if op.window is not None else 10
            window = (width - 1) + len(terms)
            cls = Q.Near if op.kind == "NEAR" else Q.Phrase
            left = self._positional(cls, terms, window)
        return left, i

    def _parse_primary(self, toks, i):
        """A sequence of adjacent words/phrases/groups combined with the
        default op + lovehate handling, ending at any boolean operator."""
        loves: list[Q.Query] = []
        hates: list[Q.Query] = []
        normals: list[Q.Query] = []
        stopped: list[_Tok] = []  # stopper-dropped words (rollback buffer)
        #: boolean-prefix filter terms grouped per field (same field → OR,
        #: across fields → AND — the reference's filter combination)
        bool_filters: dict[str, list[Q.Query]] = {}
        range_filters: list[Q.Query] = []
        got = False
        while i < len(toks):
            t = toks[i]
            if t.kind in ("AND", "OR", "NOT", "XOR", "NEAR", "ADJ", ")"):
                break
            if t.kind == "(":
                sub, i = self._parse_or(toks, i + 1)
                if i < len(toks) and toks[i].kind == ")":
                    i += 1
                if sub is not None:
                    normals.append(sub)
                got = True
                # a group is a full primary when alone; keep collecting words
                continue
            if t.kind == "range":
                parsed = t.proc.parse(t.text, t.hi)
                if parsed is not None:
                    range_filters.append(parsed)
                else:
                    # processor rejected the endpoints (reference returns
                    # OP_INVALID and the text parses as ordinary terms)
                    node = self._word_node(t.raw if t.raw is not None else t.text)
                    if node is not None:
                        normals.append(node)
                got = True
                i += 1
                continue
            if (
                self.flags & FLAG_AUTO_MULTIWORD_SYNONYMS
                and t.kind == "word"
                and t.prefix is None
                and t.field is None
                and not t.partial
            ):
                mw = self._multiword_synonym(toks, i)
                if mw is not None:
                    node, i = mw
                    normals.append(node)
                    got = True
                    continue
            if t.field is not None and t.field in self._bool_prefixes:
                # boolean filter term: value VERBATIM, one per prefix
                for p in self._bool_prefixes[t.field]:
                    bt = Q.Term(make_term(p, t.text))
                    bool_filters.setdefault(t.field, []).append(bt)
                    # unstem maps the generated term to the typed token
                    # ("XTESTfoo" → "test:foo", qp_unstem_boolean_prefix)
                    self._note_unstem(bt, f"{t.field}:{t.text}")
                got = True
                i += 1
                continue
            fps = self._prefixes.get(t.field) if t.field is not None else None
            if t.kind == "phrase":
                node = self._phrase_node(t.text, field_prefixes=fps)
            elif t.kind == "fuzzy":
                # `word~k` (FLAG_FUZZY, queryparser.h:718) → OP_EDIT_DISTANCE
                # with the queryparser's default combiner (synonym)
                terms = self._tok(t.text)
                node = (
                    Q.EditDistance(
                        terms[-1],
                        max_edit_distance=t.window if t.window is not None else 2,
                    )
                    if terms
                    else None
                )
            elif t.kind == "synonym":
                # '~word' (FLAG_SYNONYM, queryparser.h:605): OP_SYNONYM over
                # the term + its table entries
                node = self._synonym_expand(self._word_node(t.text))
            elif t.partial:
                # FLAG_PARTIAL final word → wildcard OR full term
                node = self._partial_node(t.text, field_prefixes=fps)
            else:
                if (
                    self._stopper is not None
                    and t.field is None
                    and t.prefix is None
                    and not t.partial
                ):
                    wt = self._tok(t.text)
                    if wt and all(w in self._stopper for w in wt):
                        # dropped; kept in `stopped` for the all-stopword
                        # group rollback (lemony:1981-1990)
                        stopped.append(t)
                        self._stoplist.append(t.text)
                        got = True
                        i += 1
                        continue
                node = self._word_node(t.text, field_prefixes=fps)
                if node is not None and self.flags & (
                    FLAG_AUTO_SYNONYMS | FLAG_AUTO_MULTIWORD_SYNONYMS
                ):
                    node = self._synonym_expand(node)
            if node is not None:
                self._note_unstem(
                    node, f"{t.field}:{t.text}" if t.field else t.text
                )
                if t.prefix == "love":
                    loves.append(node)
                elif t.prefix == "hate":
                    hates.append(node)
                else:
                    normals.append(node)
            got = True
            i += 1
        if not got:
            return None, i
        if (
            stopped
            and not normals
            and not loves
            and not hates
            and not bool_filters
            and not range_filters
        ):
            # the whole group was stopwords → roll back and keep them
            # (the reference reprocesses the group with the stopper off)
            for t in stopped:
                self._stoplist.remove(t.text)
                node = self._word_node(t.text)
                if node is not None:
                    self._note_unstem(node, t.text)
                    normals.append(node)
        base: Q.Query | None = None
        if loves:
            base = loves[0] if len(loves) == 1 else Q.And(loves)
            if normals:
                rest = normals[0] if len(normals) == 1 else self._combine(normals)
                base = Q.AndMaybe(base, rest)
        elif normals:
            base = normals[0] if len(normals) == 1 else self._combine(normals)
        # attach filters (boolean prefixes + ranges) with OP_FILTER
        filters: list[Q.Query] = []
        for field in sorted(bool_filters):
            fs = bool_filters[field]
            filters.append(fs[0] if len(fs) == 1 else Q.Or(fs))
        filters.extend(range_filters)
        if filters:
            fq = filters[0] if len(filters) == 1 else Q.And(filters)
            if base is None:
                # filters-only query: pure boolean, weight 0 (the reference
                # scores it with BoolWeight)
                base = Q.ScaleWeight(fq, 0.0)
            else:
                base = Q.Filter(base, fq)
        if hates:
            h = hates[0] if len(hates) == 1 else Q.Or(hates)
            if base is None:
                raise ValueError("query with only hate terms (pure NOT)")
            base = Q.AndNot(base, h)
        return base, i

    def _combine(self, nodes: list[Q.Query]) -> Q.Query:
        return Q.And(nodes) if self.default_op == "and" else Q.Or(nodes)

    def _multiword_synonym(self, toks, i):
        """FLAG_AUTO_MULTIWORD_SYNONYMS (queryparser.h:618, lemony
        :1884-1966): greedily match the longest run of ≥2 consecutive
        plain words whose space-joined (unstemmed) names form a synonym
        key; the match becomes OP_SYNONYM(default_op(original term
        queries), synonym terms).  Returns (node, next_i) or None."""
        names: list[str] = []
        words: list[str] = []
        j = i
        while j < len(toks):
            t = toks[j]
            if (
                t.kind != "word"
                or t.prefix is not None
                or t.field is not None
                or t.partial
            ):
                break
            terms = self._tok(t.text)
            if len(terms) != 1:  # hyphenated → implicit phrase, no key part
                break
            names.append(terms[0])
            words.append(t.text)
            j += 1
        if len(names) < 2:
            return None
        for m in range(len(names), 1, -1):  # longest match wins
            key = " ".join(names[:m])
            syns = self._synonyms.get(key)
            if syns:
                originals = [
                    n
                    for n in (self._word_node(w) for w in words[:m])
                    if n is not None
                ]
                q_orig = (
                    originals[0] if len(originals) == 1 else self._combine(originals)
                )
                node = Q.Synonym([q_orig] + [Q.Term(s) for s in syns])
                return node, i + m
        return None

    def _partial_node(
        self, word: str, field_prefixes: list[str] | None = None
    ) -> Q.Query | None:
        """FLAG_PARTIAL lowering (Term::as_partial_query, queryparser
        .lemony:564-590): OR(SYNONYM(per-prefix wildcard on the UNSTEMMED
        root), SYNONYM(per-prefix full term as normally generated)), with
        the reference's max_partial_expansion=100 / most-frequent limit
        (queryparser_internal.h:113-119).  Words shorter than
        MIN_PARTIAL_PREFIX_LEN or splitting into several index terms fall
        back to normal handling."""
        fps = field_prefixes if field_prefixes else [""]
        terms = self._tok(word)
        if len(terms) != 1 or len(terms[0]) < MIN_PARTIAL_PREFIX_LEN:
            return self._word_node(word, field_prefixes=field_prefixes)
        name = terms[0]
        # per-prefix wildcards score synonym-combined like the reference's
        # SYNONYM-over-OP_WILDCARD; multiple prefixes OR together (the
        # same prefix-variant combination the rest of this parser uses)
        wilds = [
            Q.Wildcard(
                make_term(p, name) + "*",
                combiner="synonym",
                max_expansion=100,
                limit_policy="most_frequent",
            )
            for p in fps
        ]
        fulls = [self._leaf_term(name, p) for p in fps]
        wild = wilds[0] if len(wilds) == 1 else Q.Or(wilds)
        full = fulls[0] if len(fulls) == 1 else Q.Or(fulls)
        return Q.Or([wild, full])

    def _leaf_term(
        self, t: str, prefix: str = "", capitalised: bool = False
    ) -> Q.Query:
        """One token → Term with stem + field prefix (Term::make_term,
        queryparser.lemony:341-367: 'Z' + prefix + [':'] + stem).
        ``capitalised`` words skip stemming under the proper-noun
        heuristic (should_stem_mask, lemony:218-233)."""
        if self._stem is not None and not (capitalised and self._pn_heuristic):
            from ..operators.indexer import _should_stem

            if _should_stem(t):
                return Q.Term("Z" + make_term(prefix, self._stem(t)))
        return Q.Term(make_term(prefix, t))

    @staticmethod
    def _word_capitalised(word: str) -> bool:
        for ch in word:
            if ch.isalpha():
                return ch.isupper()
        return False

    def _word_node(
        self, word: str, field_prefixes: list[str] | None = None
    ) -> Q.Query | None:
        fps = field_prefixes if field_prefixes else [""]
        if self.word_breaks is not None:
            from ..functions.tokenizer import (
                _is_unbroken_wordchar,
                wordbreak_tokenize_mixed,
            )

            if any(_is_unbroken_wordchar(c) for c in word):
                toks = wordbreak_tokenize_mixed(word, self.word_breaks)
                if not toks:
                    return None
                variants = []
                for p in fps:
                    terms_p = [Q.Term(make_term(p, t)) for t in toks]
                    variants.append(
                        terms_p[0] if len(terms_p) == 1 else Q.And(terms_p)
                    )
                return variants[0] if len(variants) == 1 else Q.Or(variants)
        if self.ngrams:
            from ..functions.tokenizer import (
                _is_unbroken_wordchar,
                ngram_tokenize_mixed,
            )

            if any(_is_unbroken_wordchar(c) for c in word):
                # positional unigrams (+ latin tokens) searched as a phrase
                toks = [t for t, positional in ngram_tokenize_mixed(word) if positional]
                if not toks:
                    return None
                if len(toks) == 1:
                    return Q.Term(toks[0])
                return Q.Phrase([Q.Term(t) for t in toks], window=len(toks))
        # FLAG_WILDCARD_MULTI ('*' anywhere) / FLAG_WILDCARD_SINGLE ('?')
        # (queryparser.h:680-706; lemony is_extended_wildcard:900-905):
        # glob-style patterns, FLAG_WILDCARD's right-truncation subsumed.
        # Only fires when every wildcard char in the word is enabled —
        # a disabled wildcard char is ordinary punctuation.
        enabled = ""
        if self.flags & FLAG_WILDCARD_MULTI:
            enabled += "*"
        if self.flags & FLAG_WILDCARD_SINGLE:
            enabled += "?"
        if enabled:
            found = {c for c in word if c in "*?"}
            if found and found <= set(enabled):
                pat = word.lower()
                pats = [
                    Q.Wildcard(make_term(p, pat), combiner="synonym")
                    for p in fps
                ]
                return pats[0] if len(pats) == 1 else Q.Or(pats)
        if self.flags & FLAG_WILDCARD and word.endswith("*") and len(word) > 1:
            stem = word[:-1]
            terms = self._tok(stem)
            if terms:
                pats = [Q.Wildcard(make_term(p, terms[-1]) + "*", combiner="synonym") for p in fps]
                return pats[0] if len(pats) == 1 else Q.Or(pats)
        terms = self._tok(word)
        if not terms:
            return None
        variants: list[Q.Query] = []
        cap = self._word_capitalised(word)
        for p in fps:
            if len(terms) == 1:
                variants.append(self._leaf_term(terms[0], p, capitalised=cap))
            else:
                # one typed word → several index terms (e.g. "1.2-rc") →
                # phrase; phrase terms are unstemmed (positional terms)
                variants.append(
                    self._positional(
                        Q.Phrase,
                        [Q.Term(make_term(p, t)) for t in terms],
                        len(terms),
                    )
                )
        return variants[0] if len(variants) == 1 else Q.Or(variants)

    def _phrase_node(
        self, text: str, field_prefixes: list[str] | None = None
    ) -> Q.Query | None:
        fps = field_prefixes if field_prefixes else [""]
        terms = self._tok(text)
        if not terms:
            return None
        variants: list[Q.Query] = []
        for p in fps:
            if len(terms) == 1:
                variants.append(Q.Term(make_term(p, terms[0])))
            else:
                variants.append(
                    self._positional(
                        Q.Phrase,
                        [Q.Term(make_term(p, t)) for t in terms],
                        len(terms),
                    )
                )
        return variants[0] if len(variants) == 1 else Q.Or(variants)
