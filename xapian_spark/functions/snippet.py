"""Snippet / highlight generation — MSet::snippet analog.

The reference (queryparser/termgenerator_internal.cc SnipPipe,
include/xapian/mset.h:318-419) selects the highest-relevance window of the
document text, bolds matching terms and adds ellipses.  This is a
driver-side presentation feature applied only to the final top-k rows, so
it runs as a small pandas UDF over ≤ k documents — never in the match path.

Semantics implemented (deterministic; remaining divergences listed below):
- the window is chosen to maximize Σ relevance of query terms inside it,
  where relevance = the per-term BM25 termweight when supplied (the
  reference uses the same idea: snippets favor rare terms), else 1;
- the rendered window is END-anchored like SnipPipe (the window extends
  BACKWARD ≈ length+1 chars from the end of its last term — pump()'s
  eviction loop, termgenerator_internal.cc:470-486), then trimmed
  forward to the first word start;
- drain()'s edge rules (termgenerator_internal.cc:611-730): a leading
  ``omit`` only when the window does NOT start at a sentence boundary
  (start of text, or sentence-ending punctuation + whitespace before
  it); leading/trailing punctuation that carries meaning (quotes,
  currency, ``#%&'+-/<@\\`~`` …) is kept, capped at 4 chars; a window
  ending at end-of-sentence punctuation keeps it and gets no trailing
  ``omit``;
- output is XML-escaped (&, <, >) like append_escaping_xml;
- matching terms are wrapped in hi_start/hi_end (defaults <b>, </b>,
  ... — mset.h:343-356); term matching uses the SAME tokenizer as
  indexing, so ``c++`` or ``don't`` highlight correctly.

make_snippet's window comes from the full SnipPipe pump (every word
through the deque, zero-weight extension, DECAY=2.0 per-term re-visit
damping); the oracle-checked ``select_window`` keeps the static-relevance
sweep the driver's SQL replays.

Phrase-relevance pegging (pump():445-463) is implemented: pass
``phrases=[["hello", "world"], ...]`` (or let ``snippet_terms`` extract
tight OP_PHRASE runs from a Query tree, mirroring check_query :751-803).
A completed phrase occurrence contributes ``max_tw * n_terms`` relevance
pegged onto its FIRST word — so it leaves the rolling sum exactly when
the phrase starts to exit the window — and the whole phrase is wrapped
in ONE hi_start/hi_end pair (drain()'s phrase_len, :731-744).

Highlights exclude inter-word characters like drain() (:721-744):
hi_start lands on the word's first word char, hi_end right after its
term_end, so ``(sits.)`` highlights as ``(<b>sits</b>.)`` — with the
tokenizer's ``+``/``#`` suffixes kept attached (``<b>c++</b>``).

SNIPPET_BACKGROUND_MODEL (snippet():995-1030) is available via
``background=`` (term → corpus termfreq, built by ``background_tf``):
non-query words get ``max_tw·log((N−tf)/tf)/((length+1)·log N)``
relevance so the window prefers informative text, including when no
query term matches at all.  Opt-in here (the reference defaults it on).

``exhaustive=False`` enables the non-EXHAUSTIVE early stop
(pump():505-511): once a scoring window exists and the sweep has moved
past it, later text is not considered.  The default True matches the
reference's default flags (SNIPPET_EXHAUSTIVE, mset.h:422).

With a ``stemmer=`` callable, loose-term and background lookups retry
the ``Z``-prefixed stem like check_term / the bg cache (:948-962,
:1007-1013), so a parsed query's Zstem terms highlight unstemmed words.

The phrase ring buffer holds one entry per TERM (not per whitespace
run), matching the reference's one-term-per-word pipe: a phrase only
completes when its terms appear consecutively in token order — tokens
of a multi-token run ("foo-bar") are consecutive, but a phrase cannot
skip over an intervening token.  No known SnipPipe divergences remain.
"""

from __future__ import annotations

import re

import pandas as pd  # module-level: pandas_udf type hints must resolve

from ..functions.tokenizer import simple_tokenize, xapian_tokenize


def term_spans(
    text: str, terms: dict[str, float], tok
) -> list[tuple[int, int, float]]:
    """Char spans (start, end, relevance) of words whose tokenization hits a
    query term — the SnipPipe relevance stream over the raw text."""
    spans: list[tuple[int, int, float]] = []
    for m in re.finditer(r"\S+", text):
        for t in tok(m.group()):
            rel = terms.get(t)
            if rel is not None:
                spans.append((m.start(), m.end(), rel))
                break
    return spans


def select_window(
    text: str,
    terms: dict[str, float] | list[str],
    length: int = 200,
    mode: str = "xapian",
) -> tuple[float, int] | None:
    """The snippet's window SELECTION step, isolated so it has a
    deterministic oracle (the driver's snippets entry checks exactly this):
    two-pointer sweep maximizing Σ relevance of term spans inside a
    ``length``-char window.  Returns (best_total, anchor_char, end_char) —
    anchor is the char offset of the first span in the winning window,
    end_char the end offset of its last span (the SnipPipe window is
    END-anchored); ties keep the earliest window.  None when no term
    occurs."""
    if not isinstance(terms, dict):
        terms = {t: 1.0 for t in terms}
    tok = xapian_tokenize if mode == "xapian" else simple_tokenize
    spans = term_spans(text, terms, tok)
    if not spans:
        return None
    best = (0.0, spans[0][0], spans[0][1])
    total = 0.0
    start_idx = 0
    for i, (s, e, rel) in enumerate(spans):
        total += rel
        while spans[start_idx][1] < e - length + 1:
            total -= spans[start_idx][2]
            start_idx += 1
        anchor = spans[start_idx][0]
        if total > best[0]:
            best = (total, anchor, e)
    return best


# Meaning-carrying punctuation kept at snippet edges
# (snippet_check_leading_nonwordchar / _trailing_nonwordchar,
# termgenerator_internal.cc:530-587; ASCII subset + the common Unicode
# open/close/quote marks)
_LEAD_PUNC = set("\"#%&'+-/<@\\`~$([{¡§¿“‘«")
_TRAIL_PUNC = set("\"%'+-/>@\\`~$)]}”’»")
_SENT_END = set(".?!")
_WORDCHAR_RX = re.compile(r"\w", re.UNICODE)


def _xml_escape(s: str) -> str:
    """append_escaping_xml (termgenerator_internal.cc:589-608)."""
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _is_sentence_start(text: str, pos: int) -> bool:
    """drain()'s sentence_boundary scan (termgenerator_internal.cc:668-695):
    position 0, or sentence-ending punctuation then whitespace before it."""
    if pos == 0:
        return True
    i = pos - 1
    while i >= 0 and text[i].isspace():
        i -= 1
    return i >= 0 and text[i] in _SENT_END


def snippet_terms(
    query, termweights: dict[str, float] | None = None
) -> tuple[dict[str, float], list[list[str]]]:
    """check_query analog (termgenerator_internal.cc:751-803): walk a
    Query tree and split it into (loose term → relevance, exact phrases).
    A tight OP_PHRASE (window == n_subqs, all Term children) becomes a
    phrase; every other node recurses and its leaf terms become loose
    terms weighted by ``termweights`` (default 1.0).  Wildcard / fuzzy
    subqueries are skipped (no pattern relevance here — the reference
    gives them max_tw + min_tw, :891-905)."""
    from ..plans import query as Q

    loose: dict[str, float] = {}
    phrases: list[list[str]] = []

    def walk(q):
        if isinstance(q, Q.Term):
            loose[q.term] = float((termweights or {}).get(q.term, 1.0))
            return
        if isinstance(q, Q.Phrase):
            kids = list(q.children)
            window = q.window if q.window is not None else len(kids)
            if window == len(kids) and all(
                isinstance(k, Q.Term) for k in kids
            ):
                phrases.append([k.term for k in kids])
                return
        for k in getattr(q, "children", None) or []:
            walk(k)
        for attr in ("left", "right", "subquery"):
            sub = getattr(q, attr, None)
            if isinstance(sub, Q.Query):
                walk(sub)

    walk(query)
    return loose, phrases


def background_tf(
    index, texts, mode: str = "xapian", stemmer=None
) -> tuple[dict[str, int], int]:
    """Build make_snippet's ``background`` inputs from an index: corpus
    termfreq for every token appearing in ``texts`` (the top-k docs being
    snippeted — a bounded vocabulary, so the dictionary lookup collects
    ≤ a few thousand rows) plus the collection size.  The analog of
    Enquire::db.get_termfreq() feeding snippet_bg_relevance
    (termgenerator_internal.cc snippet():1007-1021)."""
    from pyspark.sql import functions as F

    tok = xapian_tokenize if mode == "xapian" else simple_tokenize
    vocab = set()
    for t in texts:
        if isinstance(t, str):
            for run in t.split():
                vocab.update(tok(run))
    if stemmer is not None:
        vocab |= {"Z" + stemmer(t) for t in list(vocab)}
    if not vocab:
        return {}, int(index.stats["doccount"])
    rows = (
        index.dictionary.filter(F.col("term").isin(sorted(vocab)))
        .select("term", "termfreq")
        .collect()
    )
    return (
        {r["term"]: int(r["termfreq"]) for r in rows},
        int(index.stats["doccount"]),
    )


def make_snippet(
    text: str,
    terms: dict[str, float] | list[str],
    length: int = 200,
    hi_start: str = "<b>",
    hi_end: str = "</b>",
    omit: str = "...",
    mode: str = "xapian",
    phrases: list[list[str]] | None = None,
    background: dict[str, int] | None = None,
    collection_size: int | None = None,
    exhaustive: bool = True,
    stemmer=None,
) -> str:
    """Best-window snippet with highlights — SnipPipe edge semantics (see
    module docstring for the rule list and remaining divergences).

    ``background`` (term → corpus termfreq) enables the reference's
    SNIPPET_BACKGROUND_MODEL (snippet():995-1030): a non-query word gets
    relevance ``max_tw·log((N−tf)/tf) / ((length+1)·log N)`` with
    ``N = collection_size + 1`` — rare corpus terms pull the window
    toward informative text (and terms indexing most of the corpus push
    it away with negative relevance).  Use ``background_tf`` to build the
    dict from an index.  Opt-in here; the reference enables it by default
    (mset.h:422)."""
    import math

    if not isinstance(terms, dict):
        terms = {t: 1.0 for t in terms}
    if not text:
        return ""
    tok = xapian_tokenize if mode == "xapian" else simple_tokenize
    from collections import deque

    phrases = [list(p) for p in (phrases or []) if len(p) > 1]
    # Phrase relevance = max_tw * n_terms (snippet():882-886) where
    # max_tw is the largest loose termweight scaled by 1.015625, or 1.0
    # when no weights are known (:858-866).
    max_tw = max(terms.values(), default=0.0)
    max_tw = max_tw * 1.015625 if max_tw > 0 else 1.0
    phrase_cells = [[max_tw * len(p)] for p in phrases]
    longest = max((len(p) for p in phrases), default=0)
    bg_cells: dict[str, list[float]] = {}
    bg_n = None
    if background is not None:
        bg_n = (
            collection_size
            if collection_size is not None
            else max(background.values(), default=0)
        ) + 1

    # Full pump (SnipPipe::pump, termgenerator_internal.cc:443-511, minus
    # the non-EXHAUSTIVE early exit): EVERY word flows through the window,
    # zero-weight words extend the best window (`sum >= best_sum` — "we
    # don't extend a snippet over terms with 0 weight" is exactly why the
    # reference compares >=), evictions keep end − begin ≤ length+1 (the
    # +1 allows the inter-word space, :427-428).  DECAY=2.0 re-visit
    # damping included: relevance is a per-TERM mutable cell — each
    # occurrence entering the window adds the cell's current value then
    # halves it (:466-469), and an occurrence leaving doubles it back
    # then subtracts (:475-478) — so repeats of one term contribute
    # geometrically less and a window of distinct terms outranks one
    # stuffed with a single term.
    words = []  # [run_start, run_end, term_end, cell | None, highlight]
    cells: dict[str, list[float]] = {}
    # ring of the previous longest-1 TERMS for the phrase check
    # (snippet():907-946's `phrase` ring buffer).  The reference's pipe
    # sees exactly one term per word segment, so the ring holds individual
    # tokens in emission order — a multi-token whitespace run ("foo-bar")
    # contributes each token as its own ring entry, tagged with the run it
    # came from so pegging/highlighting can count RUNS covered.
    ring: deque | None = deque(maxlen=longest - 1) if longest > 1 else None
    for wi, m in enumerate(re.finditer(r"\S+", text)):
        run = m.group()
        toks = tok(run)
        cell = None
        h = 0
        # exact-phrase check FIRST (snippet():928-946): a term of this run
        # ends a phrase whose earlier terms match the preceding terms in
        # order — first any earlier tokens of the SAME run, then the ring
        for pi, p in enumerate(phrases):
            for j in range(len(toks) - 1, -1, -1):
                if toks[j] != p[-1]:
                    continue
                ti, ri, ok, first_wi = j - 1, 0, True, wi
                for term in reversed(p[:-1]):
                    if ti >= 0:
                        if toks[ti] != term:
                            ok = False
                            break
                        ti -= 1
                        continue
                    ri += 1
                    if ring is None or ri > len(ring):
                        ok = False
                        break
                    tokv, twi = ring[-ri]
                    if tokv != term:
                        ok = False
                        break
                    first_wi = twi
                if ok:
                    cell = phrase_cells[pi]
                    h = wi - first_wi + 1  # runs covered incl. this one
                    break
            if h:
                break
        if h == 0:
            # loose-term check: unstemmed, then Z+stem (check_term twice,
            # snippet():948-962) — a parsed probabilistic query's Zstem
            # terms highlight the document's unstemmed words
            for t in toks:
                key = t if t in terms else None
                if key is None and stemmer is not None:
                    zs = "Z" + stemmer(t)
                    if zs in terms:
                        key = zs
                if key is not None:
                    cell = cells.setdefault(key, [float(terms[key])])
                    h = 1
                    break
        if h == 0 and background is not None:
            # background document model (snippet():995-1030): relevance
            # without highlight; cached per term like snippet_bg_relevance;
            # termfreq falls back to the stem (:1007-1013)
            for t in toks:
                if t not in background and stemmer is not None:
                    zs = "Z" + stemmer(t)
                    if zs in background:
                        t = zs
                bg = bg_cells.get(t)
                if bg is None and t in background:
                    tf = background[t]
                    r = 0.0
                    if tf:
                        r = (
                            max_tw
                            * math.log((bg_n - tf) / tf)
                            / ((length + 1) * math.log(bg_n))
                        )
                    bg = bg_cells[t] = [r]
                if bg is not None:
                    cell = bg
                    break
        # term_end excludes trailing sentence/clause/closing punctuation
        # (the reference's term_end stops at the term's last word char;
        # '+' and '#' stay attached so c++/c# highlight whole)
        e = m.end()
        while e > m.start() + 1 and text[e - 1] in ".?!,;:)]}\"'":
            e -= 1
        words.append([m.start(), m.end(), e, cell, h])
        if ring is not None:
            for t in toks:
                ring.append((t, wi))

    DECAY = 2.0
    pipe: deque = deque()
    begin = 0
    cur = 0.0
    best_sum, best_begin, best_end = 0.0, 0, 0
    matchfound = False
    for w in words:
        _rs, _rend, e, cell, h = w
        if h:
            matchfound = True
        if h > 1:
            # pump():447-463 — the final term of a phrase is entering the
            # window: peg the phrase's relevance onto its FIRST word so
            # it leaves `sum` exactly when the phrase starts to exit.
            if len(pipe) >= h - 1:
                ps = pipe[-(h - 1)]
                if ps[3] is not None:
                    ps[3][0] *= DECAY
                    cur -= ps[3][0]
                cur += cell[0]
                ps[3] = cell
                ps[4] = h
                cell[0] /= DECAY
            w[3] = None
            w[4] = 0
            pipe.append(w)
        else:
            pipe.append(w)
            if cell is not None:
                cur += cell[0]
                cell[0] /= DECAY
        while e - begin > length + 1:
            front = pipe.popleft()
            if front[3] is not None:
                front[3][0] *= DECAY
                cur -= front[3][0]
            begin = front[2]
            if not pipe:
                break
        if cur >= best_sum:
            best_sum, best_begin, best_end = cur, begin, e
        elif not exhaustive and best_sum > 0 and best_end < begin:
            # non-EXHAUSTIVE early stop (pump():505-511): we found
            # something and we aren't still looking near it
            break

    if not matchfound and (background is None or best_end == 0):
        # no matches (and no background-selected window): document lead
        if len(text) <= length:
            return _xml_escape(text)
        return _xml_escape(text[:length].rsplit(" ", 1)[0]) + omit

    wend = best_end
    wstart = best_begin

    # trim forward to the first word start, keeping ≤4 chars of
    # meaning-carrying leading punctuation (drain():697-716)
    scan = wstart
    word_start = None
    while scan < wend:
        ch = text[scan]
        if _WORDCHAR_RX.match(ch):
            word_start = scan
            break
        scan += 1
        if ch not in _LEAD_PUNC:
            wstart = scan
    if word_start is not None and word_start - wstart > 4:
        wstart = word_start

    # trailing edge (drain():621-664): keep end-of-sentence punctuation
    # (no omit), else ≤4 chars of meaning-carrying punctuation, else omit
    tail_omit = False
    tend = wend
    if wend < len(text):
        i = wend
        sentence_end = False
        while i < len(text):
            ch = text[i]
            if sentence_end and ch.isspace():
                break
            sentence_end = ch in _SENT_END
            if _WORDCHAR_RX.match(ch):
                break
            i += 1
        if sentence_end:
            tend = i
        else:
            j = wend
            kept = 0
            while j < len(text) and text[j] in _TRAIL_PUNC:
                kept += 1
                if kept > 4:
                    kept = 0
                    break
                j += 1
            if kept:
                tend = j
            tail_omit = tend < len(text)
    # render from the pump-annotated words; a phrase highlight wraps all
    # its words in ONE hi pair (drain()'s phrase_len, :731-744), and
    # highlights exclude inter-word characters: hi_start lands on the
    # word's first word char, hi_end right after its term_end (:721-744)
    out = []
    last = wstart
    open_rem = 0  # words left (incl. current) inside an open highlight
    for rs, rend, te, _cell, h in words:
        if te <= best_begin or te > best_end:
            continue
        gs = min(max(rs, last), tend)
        if gs > last:
            out.append(_xml_escape(text[last:gs]))
            last = gs
        if open_rem == 0 and h:
            # leading punctuation stays outside the highlight
            wcs = last
            while wcs < te and not _WORDCHAR_RX.match(text[wcs]):
                wcs += 1
            if wcs > last:
                out.append(_xml_escape(text[last:wcs]))
                last = wcs
            open_rem = h
            out.append(hi_start)
        closing = False
        if open_rem:
            open_rem -= 1
            closing = open_rem == 0
        # the closing word's trailing punctuation falls outside the pair;
        # mid-phrase words keep their inter-word chars inside it
        seg_end = min(max(te if closing else rend, last), tend)
        out.append(_xml_escape(text[last:seg_end]))
        last = seg_end
        if closing:
            out.append(hi_end)
    if open_rem:
        out.append(hi_end)
    if tend > last:
        out.append(_xml_escape(text[last:tend]))
    snip = "".join(out)
    if not _is_sentence_start(text, wstart):
        snip = omit + snip
    if tail_omit:
        snip = snip + omit
    return snip


def snippets_for_mset(
    spark,
    mset_df,
    docs_with_text,
    terms: dict[str, float] | list[str],
    text_col: str = "content",
    length: int = 200,
    mode: str = "xapian",
    phrases: list[list[str]] | None = None,
    background: dict[str, int] | None = None,
    collection_size: int | None = None,
):
    """Attach a snippet column to a (small) top-k MSet DataFrame."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    tdict = terms if isinstance(terms, dict) else {t: 1.0 for t in terms}

    @pandas_udf(StringType())
    def snip(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: make_snippet(
                t,
                tdict,
                length=length,
                mode=mode,
                phrases=phrases,
                background=background,
                collection_size=collection_size,
            )
            if isinstance(t, str)
            else ""
        )

    joined = mset_df.join(
        docs_with_text.select("doc_id", text_col), "doc_id", "left"
    )
    return joined.withColumn("snippet", snip(F.col(text_col))).drop(text_col)


def snippet_windows_for_mset(
    spark,
    mset_df,
    docs_with_text,
    terms: dict[str, float] | list[str],
    text_col: str = "content",
    length: int = 200,
    mode: str = "xapian",
):
    """Window-selection output for a (small) top-k MSet: DF(doc_id,
    anchor, total) — the oracle-checkable core of the snippet pipeline
    (rendering stays in make_snippet / pytest)."""
    import pandas as pd_  # noqa: F401 (kept local like snippets_for_mset)
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    tdict = terms if isinstance(terms, dict) else {t: 1.0 for t in terms}

    @pandas_udf("anchor long, total double")
    def win(texts: pd.Series) -> pd.DataFrame:
        anchors, totals = [], []
        for t in texts:
            got = (
                select_window(t, tdict, length=length, mode=mode)
                if isinstance(t, str)
                else None
            )
            anchors.append(-1 if got is None else got[1])
            totals.append(0.0 if got is None else got[0])
        return pd.DataFrame({"anchor": anchors, "total": totals})

    joined = mset_df.join(
        docs_with_text.select("doc_id", text_col), "doc_id", "left"
    )
    w = win(F.col(text_col))
    return joined.select(
        "doc_id", w["anchor"].alias("anchor"), w["total"].alias("total")
    )
