"""QueryParser — text → Query tree, driver-side pure Python.

Re-expresses the reference parser's behavior
(xapian-core/queryparser/queryparser.lemony) for the feature set
FLAG_PHRASE | FLAG_BOOLEAN | FLAG_LOVEHATE (the reference default,
include/xapian/queryparser.h:791) plus opt-in FLAG_WILDCARD:

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
  TermGenerator share parse_terms in the reference).

Multi-word tokens inside one query word (e.g. typing ``don't``) produce the
same single term the indexer would.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from ..functions.tokenizer import simple_tokenize, xapian_tokenize
from . import query as Q

FLAG_BOOLEAN = 1
FLAG_PHRASE = 2
FLAG_LOVEHATE = 4
FLAG_WILDCARD = 8
DEFAULT_FLAGS = FLAG_BOOLEAN | FLAG_PHRASE | FLAG_LOVEHATE

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


class QueryParser:
    def __init__(
        self,
        flags: int = DEFAULT_FLAGS,
        default_op: str = "or",
        mode: str = "xapian",
        stem: str | None = None,
    ):
        """``stem='en'``: free-text terms become Z-prefixed stemmed forms
        (STEM_SOME query side — the parser generates Zstem terms for
        probabilistic terms, unstemmed for phrases/positional ops, matching
        QueryParser behavior with a stemmer set)."""
        self.flags = flags
        self.default_op = default_op
        self._tok = xapian_tokenize if mode == "xapian" else simple_tokenize
        self._stem = None
        if stem is not None:
            from ..functions.stem_en import stem_english

            self._stem = stem_english

    # -- public ------------------------------------------------------------
    def parse_query(self, text: str) -> Q.Query:
        toks = self._lex(text)
        if not toks:
            return Q.MatchNothing()
        tree, pos = self._parse_or(toks, 0)
        return Q.normalize(tree) if tree is not None else Q.MatchNothing()

    # -- lexer ---------------------------------------------------------------
    def _lex(self, text: str) -> list[_Tok]:
        out: list[_Tok] = []
        pending_prefix: str | None = None
        for m in _TOKEN_RX.finditer(text):
            kind = m.lastgroup if m.lastgroup in ("lparen", "rparen") else None
            if m.group("lparen"):
                out.append(_Tok("(", "("))
            elif m.group("rparen"):
                out.append(_Tok(")", ")"))
            elif m.group("quote") and self.flags & FLAG_PHRASE:
                out.append(_Tok("phrase", m.group("quote")[1:-1], prefix=pending_prefix))
                pending_prefix = None
            elif m.group("quote"):
                out.append(_Tok("word", m.group("quote")[1:-1], prefix=pending_prefix))
                pending_prefix = None
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
                out.append(_Tok("word", word, prefix=pending_prefix))
                pending_prefix = None
        return out

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
                    left = Q.AndNot(left, right) if left is not None else None
            else:
                right, i = self._parse_near(toks, i + 1)
                if left is None:
                    left = right
                elif right is not None:
                    kids = left.children if isinstance(left, Q.And) else [left]
                    left = Q.And(kids + [right])
        return left, i

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
                else:
                    raise ValueError(f"{op.kind} requires plain terms")
            # window = (width - 1) + #terms, width defaulting to 10
            # (as_opwindow_query, queryparser.lemony:2041-2045,2155-2173)
            width = op.window if op.window is not None else 10
            window = (width - 1) + len(terms)
            cls = Q.Near if op.kind == "NEAR" else Q.Phrase
            left = cls(terms, window=window)
        return left, i

    def _parse_primary(self, toks, i):
        """A sequence of adjacent words/phrases/groups combined with the
        default op + lovehate handling, ending at any boolean operator."""
        loves: list[Q.Query] = []
        hates: list[Q.Query] = []
        normals: list[Q.Query] = []
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
            if t.kind == "phrase":
                node = self._phrase_node(t.text)
            else:
                node = self._word_node(t.text)
            if node is not None:
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
        base: Q.Query | None = None
        if loves:
            base = loves[0] if len(loves) == 1 else Q.And(loves)
            if normals:
                rest = normals[0] if len(normals) == 1 else self._combine(normals)
                base = Q.AndMaybe(base, rest)
        elif normals:
            base = normals[0] if len(normals) == 1 else self._combine(normals)
        if hates:
            h = hates[0] if len(hates) == 1 else Q.Or(hates)
            if base is None:
                raise ValueError("query with only hate terms (pure NOT)")
            base = Q.AndNot(base, h)
        return base, i

    def _combine(self, nodes: list[Q.Query]) -> Q.Query:
        return Q.And(nodes) if self.default_op == "and" else Q.Or(nodes)

    def _word_node(self, word: str) -> Q.Query | None:
        if self.flags & FLAG_WILDCARD and word.endswith("*") and len(word) > 1:
            stem = word[:-1]
            terms = self._tok(stem)
            if terms:
                return Q.Wildcard(terms[-1] + "*", combiner="synonym")
        terms = self._tok(word)
        if not terms:
            return None
        if len(terms) == 1:
            t = terms[0]
            if self._stem is not None:
                from ..operators.indexer import _should_stem

                if _should_stem(t):
                    return Q.Term("Z" + self._stem(t))
            return Q.Term(t)
        # one typed word → several index terms (e.g. "1.2-rc") → phrase
        return Q.Phrase([Q.Term(t) for t in terms], window=len(terms))

    def _phrase_node(self, text: str) -> Q.Query | None:
        terms = self._tok(text)
        if not terms:
            return None
        if len(terms) == 1:
            return Q.Term(terms[0])
        return Q.Phrase([Q.Term(t) for t in terms], window=len(terms))
