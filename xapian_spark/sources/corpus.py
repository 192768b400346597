"""Deterministic synthetic source-code corpus (FIXTURES.md F1/F5).

Shape fixed by BASELINE.json input_hint:
``(repo string, path string, commit string, lang string, content string)``.

Content is a pure function of (seed, doc index) — each document gets its own
RNG — so generation is BOTH deterministic and embarrassingly parallel:
``corpus_df`` generates distributed via ``spark.range(n).mapInPandas`` and
produces byte-identical rows to the driver-side ``generate_corpus`` loop at
any partitioning.  That property is what makes golden tests, the sha256
integrity manifest, and the two-parallelism scaling bench meaningful.

Includes the F5 edge cases (``c++``, ``AT&T``, acronyms, 65-byte
identifiers) and Zipf-hot keywords that index more than half the corpus to
exercise the BM25 tw<2 branch (bm25weight.cc:107).
"""

from __future__ import annotations

import hashlib
import random
from collections.abc import Iterator

LANGS = ["python", "c", "cpp", "java", "go", "rust", "js", "md"]

_KEYWORDS = [  # Zipf-ish: earlier → hotter
    "return", "if", "def", "int", "for", "self", "value", "result",
    "data", "index", "node", "key", "list", "size", "buffer", "error",
    "while", "struct", "class", "import", "static", "const", "void",
    "string", "print", "true", "false", "null", "len", "append",
]

_IDENTS = [
    "binary_search", "merge_sort", "hash_table", "linked_list", "tree_node",
    "parse_query", "build_index", "posting_list", "term_freq", "doc_length",
    "read_block", "write_chunk", "skip_to", "next_item", "get_weight",
    "CamelCaseClass", "HttpServer", "JsonParser", "XmlReader", "ioHandler",
]

_EDGE_TOKENS = [
    "c++", "c#", "f#", "AT&T", "don't", "O'Brien", "U.N.C.L.E.", "P.T.O",
    "1,000.5", "2026.08.16", "héllo_wörld", "x" * 70,
]

_COMMENT_WORDS = [
    "the", "fast", "search", "over", "sorted", "array", "using", "lower",
    "bound", "returns", "position", "when", "found", "otherwise", "negative",
    "algorithm", "complexity", "logarithmic", "time", "memory", "constant",
]


def doc_row(i: int, seed: int = 42) -> tuple[str, str, str, str, str]:
    """Row i of the corpus — pure function of (i, seed)."""
    repo = f"org{i % 7}/proj{(i // 7) % 3}"
    lang = LANGS[i % len(LANGS)]
    path = f"src/mod{i % 13}/file_{i}.{lang[:2]}"
    commit = hashlib.sha1(f"{repo}/{path}".encode()).hexdigest()
    rng = random.Random(hashlib.sha256(f"{seed}:{i}".encode()).digest())
    content = _gen_content(rng, i)
    return (repo, path, commit, lang, content)


def _gen_content(rng: random.Random, i: int) -> str:
    # A few degenerate docs (F5): empty, punctuation-only, one giant token.
    if i % 97 == 11:
        return ""
    if i % 97 == 23:
        return "!!! ??? ;;; ..."
    if i % 97 == 37:
        return "a" * 63  # just under the 64-byte cap → one giant term
    nlines = rng.randint(3, 25)
    parts: list[str] = []
    for _ in range(nlines):
        line: list[str] = []
        for _ in range(rng.randint(3, 12)):
            r = rng.random()
            if r < 0.55:
                # Zipf over keywords: rank ~ 1/(k+1)
                z = min(int(rng.paretovariate(1.1)) - 1, len(_KEYWORDS) - 1)
                line.append(_KEYWORDS[z])
            elif r < 0.8:
                line.append(rng.choice(_IDENTS))
            elif r < 0.9:
                line.append(rng.choice(_COMMENT_WORDS))
            elif r < 0.97:
                line.append(str(rng.randint(0, 4096)))
            else:
                line.append(rng.choice(_EDGE_TOKENS))
        parts.append(" ".join(line))
    return "\n".join(parts)


def generate_corpus(
    n_docs: int, seed: int = 42
) -> list[tuple[str, str, str, str, str]]:
    """Driver-side reference generator (used by the oracle/tests)."""
    return [doc_row(i, seed) for i in range(n_docs)]


def corpus_df(spark, n_docs: int, seed: int = 42, n_partitions: int | None = None):
    """Corpus as a DataFrame with deterministic doc_id = row index + 1,
    generated DISTRIBUTED (per-doc RNG; byte-identical at any parallelism).

    docid 0 is invalid in the reference (include/xapian/types.h:51).
    """
    import pandas as pd

    schema = (
        "doc_id long, repo string, path string, commit string, "
        "lang string, content string"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = [(int(i) + 1, *doc_row(int(i), seed)) for i in ids]
            yield pd.DataFrame(
                rows, columns=["doc_id", "repo", "path", "commit", "lang", "content"]
            )

    rng_df = spark.range(n_docs)
    if n_partitions:
        rng_df = rng_df.repartition(n_partitions)
    return rng_df.mapInPandas(gen, schema)
