"""Deterministic synthetic source-code corpus (FIXTURES.md F1/F5).

Shape fixed by BASELINE.json input_hint:
``(repo string, path string, commit string, lang string, content string)``.

Seeded generator — same (seed, n_docs) → byte-identical corpus on any
machine, which is what makes golden tests and the sha256 integrity
invariant meaningful.  Includes the F5 edge cases (``c++``, ``AT&T``,
acronyms, 65-byte identifiers, Zipf-hot keywords that index >half the
corpus to exercise the BM25 tw<2 branch, bm25weight.cc:107).
"""

from __future__ import annotations

import hashlib
import random

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


def generate_corpus(
    n_docs: int, seed: int = 42
) -> list[tuple[str, str, str, str, str]]:
    """Returns rows (repo, path, commit, lang, content), deterministic."""
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        repo = f"org{i % 7}/proj{(i // 7) % 3}"
        lang = LANGS[i % len(LANGS)]
        path = f"src/mod{i % 13}/file_{i}.{lang[:2]}"
        commit = hashlib.sha1(f"{repo}/{path}".encode()).hexdigest()
        content = _gen_content(rng, i)
        rows.append((repo, path, commit, lang, content))
    return rows


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


def corpus_df(spark, n_docs: int, seed: int = 42, n_partitions: int | None = None):
    """Corpus as a DataFrame with deterministic doc_id = row index + 1.

    docid 0 is invalid in the reference (include/xapian/types.h:51).
    At real scale docids come from assign_doc_ids() (range-partition +
    per-partition offsets); for generated fixtures the enumeration index is
    already deterministic.
    """
    rows = [
        (i + 1, r[0], r[1], r[2], r[3], r[4])
        for i, r in enumerate(generate_corpus(n_docs, seed))
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, repo string, path string, commit string, lang string, content string"
    )
    if n_partitions:
        df = df.repartition(n_partitions, "doc_id")
    return df
