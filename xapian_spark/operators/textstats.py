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
