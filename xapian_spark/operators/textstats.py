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
    winning count over the token count.  Pure Column expressions — one scan,
    no shuffle, no Python; at 100 TB this is a single narrow projection.
    """
    toks = tokens_col(text_col)
    langs = list(LANG_MARKERS)
    counts = {}
    for lang, words in LANG_MARKERS.items():
        arr = F.array(*[F.lit(w) for w in words])
        counts[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    best = F.greatest(*[counts[lg] for lg in langs])
    pred = F.lit("und")
    for lg in reversed(langs):  # earlier language wins ties
        pred = F.when(counts[lg] == best, F.lit(lg)).otherwise(pred)
    pred = F.when(best == 0, F.lit("und")).otherwise(pred)
    n_tok = F.size(toks)
    ratio = F.when(n_tok > 0, F.round(best.cast("double") / n_tok.cast("double"), round_digits)).otherwise(F.lit(0.0))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        pred.alias("lang_pred"),
        ratio.alias("marker_ratio"),
    )


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
    avg_token_len) — the usual cheap quality features for corpus filtering."""
    toks = tokens_col(text_col)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    total_chars = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_tok.cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.round(
            F.size(F.array_distinct(toks)).cast("double") / n_tok.cast("double"),
            round_digits,
        ).alias("distinct_ratio"),
        F.round(n_stop.cast("double") / n_tok.cast("double"), round_digits).alias(
            "stop_ratio"
        ),
        F.round(
            total_chars.cast("double") / n_tok.cast("double"), round_digits
        ).alias("avg_token_len"),
    )
