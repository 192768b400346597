"""Tokenizer goldens — each case cites the parse_terms rule it pins
(xapian-core/queryparser/termgenerator_internal.cc)."""

import pytest

from xapian_spark.functions.tokenizer import MAX_WORD_LENGTH, xapian_tokenize as T


@pytest.mark.parametrize(
    "text,want",
    [
        ("Hello world", ["hello", "world"]),
        # trailing +/# kept, max 3 (:283-297)
        ("c++ and c# rock", ["c++", "and", "c#", "rock"]),
        ("x+++", ["x+++"]),
        ("x++++", ["x"]),
        ("fish+chips", ["fish", "chips"]),  # suffix dropped before wordchar
        ("tail+", ["tail+"]),
        # infix ' & (:81-102)
        ("AT&T don't O'Brien", ["at&t", "don't", "o'brien"]),
        ("M&S", ["m&s"]),
        # acronym folding (:232-252)
        ("U.N.C.L.E. agent", ["uncle", "agent"]),
        ("P.T.O", ["pto"]),
        ("P.T.O.x", ["p", "t", "o", "x"]),  # wordchar after → not an acronym
        ("A.B", ["ab"]),
        ("e.g. example", ["e", "g", "example"]),  # lowercase → no acronym
        # digit infix , . ; (:104-126)
        ("1,000.5 items", ["1,000.5", "items"]),
        ("2026.08.16", ["2026.08.16"]),
        ("1.x", ["1", "x"]),  # digit infix needs digits BOTH sides
        # '_' is a wordchar (category Pc, unicode.h:355-369)
        ("snake_case CamelCase", ["snake_case", "camelcase"]),
        ("héllo_wörld", ["héllo_wörld"]),
        # unicode apostrophe maps to ASCII (:92)
        ("don’t", ["don't"]),
        # soft hyphen elided (:98-101)
        ("hy­phen", ["hyphen"]),
        ("", []),
        ("!!! ??? ;;; ...", []),
    ],
)
def test_golden(text, want):
    assert T(text) == want


def test_max_word_length_bytes():
    # 64-BYTE cap (termgenerator_internal.h:45): é is 2 bytes in UTF-8.
    assert T("x" * 64) == ["x" * 64]
    assert T("x" * 65) == []
    assert T("é" * 32) == ["é" * 32]  # 64 bytes
    assert T("é" * 33) == []  # 66 bytes


def test_positions_are_emission_order():
    # wdf/positions derive from emission order; dropped long terms
    # consume no position (action returns before add_posting, :333-346)
    long = "y" * (MAX_WORD_LENGTH + 1)
    assert T(f"a {long} b") == ["a", "b"]


def test_fast_path_equals_state_machine():
    """The ASCII regex fast path must be EXACTLY the parse_terms state
    machine (randomized adversarial property)."""
    import random

    from xapian_spark.functions.tokenizer import _xapian_tokenize_slow

    alphabet = list("abcXYZ019 _.'&+#,;!\t\n-") + ["++", "..", "A.B", "C#"]
    rng = random.Random(7)
    for _ in range(3000):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 30)))
        assert T(s) == _xapian_tokenize_slow(s), repr(s)


def test_codec_segmented_roundtrip():
    import random

    import numpy as np

    from xapian_spark.functions import codec

    rng = random.Random(0)
    for _ in range(200):
        lists = [
            sorted(rng.sample(range(1, 1000), rng.randint(0, 10)))
            for _ in range(rng.randint(0, 20))
        ]
        counts = np.array([len(x) for x in lists], dtype=np.int64)
        dec = codec.decode_segmented(codec.encode_segmented(lists, counts), counts)
        assert [list(x) for x in dec] == lists
