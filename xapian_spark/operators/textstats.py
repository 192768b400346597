"""Text-analysis operators: quality scoring, token counting, language hint.

All JVM-side Column expressions over the simple-token array — one scan, no
shuffle except the final aggregation (if any).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import tokens_col

# tiny function-word list used as the quality / language-hint signal
STOPWORDS = ("the", "a", "of", "and", "in", "to", "is")

# Function-word profiles for the n-gram/marker language-ID heuristic.
# Ordered: ties resolve to the earlier language (deterministic argmax).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "of", "and", "to", "in", "is", "that", "it", "was", "with"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "ich", "zu"),
    "es": ("el", "los", "las", "que", "y", "un", "una", "por", "como", "para"),
    "fr": ("le", "les", "des", "et", "est", "une", "dans", "pour", "qui", "au"),
    "zh": ("的", "是", "不", "我", "了", "在", "有", "他", "这", "们"),
}


def language_id(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """Marker-word language identification: (doc_id, lang_pred, marker_ratio).

    Per document, count tokens (with multiplicity) hitting each language's
    function-word profile; predict the argmax language, ties broken by
    LANG_MARKERS order, zero hits everywhere → 'und'.  marker_ratio is the
    winning count over the token count.

    One Arrow ``mapInPandas`` pass: a v1 pure-Column version evaluated five
    interpreted ``F.filter`` higher-order counts plus the argmax chain over
    them — interpreted HOFs get no common-subexpression elimination, so the
    token split re-ran ~12× per row (measured ~6× the scan floor at sf0.1;
    same trap as winnow v1, see dedup.py).  The kernel tokenizes once per
    row and emits integer counts; the division + rounding stay JVM-side so
    half-up ``F.round`` semantics match the SQL oracle exactly.  Still one
    scan, no shuffle — at 100 TB a single narrow projection.
    """
    import pandas as pd
    import re

    langs = list(LANG_MARKERS)
    marker_of = {}
    for li, lg in enumerate(langs):
        for w in LANG_MARKERS[lg]:
            marker_of.setdefault(w, li)
    # ASCII \s+ to match Java's default \s in the Column tokenizer paths
    split_re = re.compile(r"\s+", re.ASCII)
    n_langs = len(langs)

    def kernel(batches):
        for pdf in batches:
            ids, bests, preds, ntoks = [], [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks = [t for t in split_re.split((text or "").lower()) if t]
                counts = [0] * n_langs
                for t in toks:
                    li = marker_of.get(t)
                    if li is not None:
                        counts[li] += 1
                best = max(counts) if counts else 0
                ids.append(doc_id)
                bests.append(best)
                ntoks.append(len(toks))
                preds.append("und" if best == 0 else langs[counts.index(best)])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "lang_pred": pd.Series(preds, dtype="object"),
                    "_best": pd.Series(bests, dtype="int64"),
                    "_n_tok": pd.Series(ntoks, dtype="int64"),
                }
            )

    raw = docs.select(
        F.col(id_col).alias(id_col), F.col(text_col)
    ).mapInPandas(kernel, "doc_id long, lang_pred string, _best long, _n_tok long")
    ratio = F.when(
        F.col("_n_tok") > 0,
        F.round(
            F.col("_best").cast("double") / F.col("_n_tok").cast("double"),
            round_digits,
        ),
    ).otherwise(F.lit(0.0))
    return raw.select("doc_id", "lang_pred", ratio.alias("marker_ratio"))


# BPE-ish pretokenizer: letter runs / digit runs / non-space-punct runs.
# The three branches have DISJOINT first characters, so leftmost-first
# (Java regex) and leftmost-longest (RE2/POSIX) matching agree — the count
# is engine-portable by construction.
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^\\sA-Za-z0-9]+"


def token_counts(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_ws_tokens, n_bpe_tokens): whitespace token count plus a
    BPE-style pretokenizer count (letter/digit/punctuation runs — the unit
    a byte-pair encoder would subdivide).  The ratio of the two is the
    standard cheap proxy for tokenizer cost per document when budgeting an
    LLM training corpus.  Pure Column expressions, one scan, no shuffle."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens_col(text_col)).cast("long").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), 0))
        .cast("long")
        .alias("n_bpe_tokens"),
    )


def text_quality(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """(doc_id, n_tokens, n_distinct, distinct_ratio, stop_ratio,
    avg_token_len) — the usual cheap quality features for corpus filtering.

    One Arrow ``mapInPandas`` pass (the lang_id/winnow pattern): the
    Column version evaluated ~5 interpreted HOF expressions per row with
    no common-subexpression elimination (the token split re-ran per
    expression, array_distinct twice).  The kernel tokenizes once and
    emits integer counts; ratios + half-up rounding stay JVM-side so the
    SQL oracle hashes identically."""
    import re

    import pandas as pd

    stop = frozenset(STOPWORDS)
    split_re = re.compile(r"\s+", re.ASCII)

    def kernel(batches):
        for pdf in batches:
            ids, ntok, ndis, nstop, chars = [], [], [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks = [t for t in split_re.split((text or "").lower()) if t]
                ids.append(doc_id)
                ntok.append(len(toks))
                ndis.append(len(set(toks)))
                nstop.append(sum(1 for t in toks if t in stop))
                chars.append(sum(len(t) for t in toks))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "n_tokens": pd.Series(ntok, dtype="int64"),
                    "n_distinct": pd.Series(ndis, dtype="int64"),
                    "_n_stop": pd.Series(nstop, dtype="int64"),
                    "_chars": pd.Series(chars, dtype="int64"),
                }
            )

    raw = docs.select(F.col(id_col).alias(id_col), F.col(text_col)).mapInPandas(
        kernel,
        "doc_id long, n_tokens long, n_distinct long, _n_stop long, _chars long",
    )
    nt = F.col("n_tokens").cast("double")
    return raw.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        F.round(F.col("n_distinct").cast("double") / nt, round_digits).alias(
            "distinct_ratio"
        ),
        F.round(F.col("_n_stop").cast("double") / nt, round_digits).alias(
            "stop_ratio"
        ),
        F.round(F.col("_chars").cast("double") / nt, round_digits).alias(
            "avg_token_len"
        ),
    )
