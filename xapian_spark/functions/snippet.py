"""Snippet / highlight generation — MSet::snippet analog.

The reference (queryparser/termgenerator_internal.cc SnipPipe,
include/xapian/mset.h:318-419) selects the highest-relevance window of the
document text, bolds matching terms and adds ellipses.  This is a
driver-side presentation feature applied only to the final top-k rows, so
it runs as a small pandas UDF over ≤ k documents — never in the match path.

Semantics implemented (simplified but deterministic, divergences noted):
- the window is chosen to maximize Σ relevance of query terms inside it,
  where relevance = the per-term BM25 termweight when supplied (the
  reference uses the same idea: snippets favor rare terms), else 1;
- matching terms are wrapped in hi_start/hi_end; non-edge truncation adds
  ``omit`` markers (defaults <b>, </b>, ... — mset.h:343-356);
- term matching uses the SAME tokenizer as indexing, so ``c++`` or
  ``don't`` highlight correctly.
- flag behaviors (BACKGROUND_MODEL, EXHAUSTIVE) are not reproduced.
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
    ``length``-char window.  Returns (best_total, anchor_char) — anchor is
    the char offset of the first span in the winning window; ties keep the
    earliest window.  None when no term occurs."""
    if not isinstance(terms, dict):
        terms = {t: 1.0 for t in terms}
    tok = xapian_tokenize if mode == "xapian" else simple_tokenize
    spans = term_spans(text, terms, tok)
    if not spans:
        return None
    best = (0.0, spans[0][0])
    total = 0.0
    start_idx = 0
    for i, (s, e, rel) in enumerate(spans):
        total += rel
        while spans[start_idx][1] < e - length + 1:
            total -= spans[start_idx][2]
            start_idx += 1
        anchor = spans[start_idx][0]
        if total > best[0]:
            best = (total, anchor)
    return best


def make_snippet(
    text: str,
    terms: dict[str, float] | list[str],
    length: int = 200,
    hi_start: str = "<b>",
    hi_end: str = "</b>",
    omit: str = "...",
    mode: str = "xapian",
) -> str:
    """Best-window snippet with highlights."""
    if not isinstance(terms, dict):
        terms = {t: 1.0 for t in terms}
    if not text:
        return ""
    tok = xapian_tokenize if mode == "xapian" else simple_tokenize

    best = select_window(text, terms, length=length, mode=mode)
    if best is None:
        # no matches: lead of the document
        if len(text) <= length:
            return text
        return text[:length].rsplit(" ", 1)[0] + omit

    wstart = max(0, best[1] - 10)
    wend = min(len(text), wstart + length)
    # align to whitespace
    if wstart > 0:
        nxt = text.find(" ", wstart)
        if 0 <= nxt < wend:
            wstart = nxt + 1
    window = text[wstart:wend]

    # highlight matches inside the window
    out = []
    last = 0
    for m in re.finditer(r"\S+", window):
        toks = tok(m.group())
        if any(t in terms for t in toks):
            out.append(window[last : m.start()])
            out.append(hi_start + m.group() + hi_end)
            last = m.end()
    out.append(window[last:])
    snip = "".join(out)
    if wstart > 0:
        snip = omit + snip
    if wend < len(text):
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
):
    """Attach a snippet column to a (small) top-k MSet DataFrame."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    tdict = terms if isinstance(terms, dict) else {t: 1.0 for t in terms}

    @pandas_udf(StringType())
    def snip(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: make_snippet(t, tdict, length=length, mode=mode)
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
