"""Snowball Dutch (Porter variant) stemmer — pure-Python port of
xapian-core/languages/algorithms/dutch_porter.sbl; golden-validated
against xapian-data/stemming/dutch_porter/ in tests/test_stemmer.py.
"""

from __future__ import annotations

_V = frozenset("aeiouyè")
_V_I = _V | {"I"}
_V_J = _V | {"j"}

_DEACCENT = str.maketrans(
    {"ä": "a", "á": "a", "ë": "e", "é": "e", "ï": "i", "í": "i",
     "ö": "o", "ó": "o", "ü": "u", "ú": "u"}
)


def _prelude(word: str) -> str:
    word = word.translate(_DEACCENT)
    chars = list(word)
    n = len(chars)
    if n and chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, n):
        if chars[i] == "i" and chars[i - 1] in _V and i + 1 < n and chars[i + 1] in _V:
            chars[i] = "I"
        elif chars[i] == "y" and chars[i - 1] in _V:
            chars[i] = "Y"
    return "".join(chars)


def _mark_regions(word: str) -> tuple[int, int]:
    n = len(word)

    def next_region(start: int) -> int:
        i = start
        while i < n and word[i] not in _V:
            i += 1
        if i >= n:
            return n
        i += 1
        while i < n and word[i] in _V:
            i += 1
        if i >= n:
            return n
        return i + 1

    p1 = next_region(0)
    # p2's scan continues from the UNCLAMPED p1 cursor; only p1 itself is
    # clamped to >= 3 (the hop-3 x mark)
    p2 = next_region(p1)
    if n >= 3 and p1 < 3:
        p1 = 3
    return p1, p2


def _undouble(word: str) -> str:
    if word.endswith(("kk", "dd", "tt")):
        return word[:-1]
    return word


def stem_dutch_porter(word: str) -> str:
    word = _prelude(word)
    p1, p2 = _mark_regions(word)
    e_found = False

    # ---- step 1 ----
    n = len(word)
    for s in ("heden", "ene", "en", "se", "s"):
        if word.endswith(s):
            cut = n - len(s)
            if s == "heden":
                if cut >= p1:
                    word = word[:cut] + "heid"
            elif s in ("en", "ene"):
                # en_ending: R1, non-v before, not preceded by 'gem'
                if (
                    cut >= p1
                    and cut >= 1
                    and word[cut - 1] not in _V
                    and not word[:cut].endswith("gem")
                ):
                    word = _undouble(word[:cut])
            else:  # 's'/'se'
                if cut >= p1 and cut >= 1 and word[cut - 1] not in _V_J:
                    word = word[:cut]
            break

    # ---- step 2: e_ending ----
    n = len(word)
    if word.endswith("e") and n - 1 >= p1 and n >= 2 and word[n - 2] not in _V:
        word = _undouble(word[: n - 1])
        e_found = True

    # ---- step 3: heid ----
    n = len(word)
    if word.endswith("heid") and n - 4 >= p2 and not word[: n - 4].endswith("c"):
        word = word[: n - 4]
        # ['en'] en_ending (sequence — heid deletion persists either way)
        n = len(word)
        if word.endswith("en"):
            cut = n - 2
            if (
                cut >= p1
                and cut >= 1
                and word[cut - 1] not in _V
                and not word[:cut].endswith("gem")
            ):
                word = _undouble(word[:cut])

    # ---- step 4 ----
    n = len(word)
    for s in ("lijk", "baar", "end", "ing", "bar", "ig"):
        if word.endswith(s):
            cut = n - len(s)
            if s in ("end", "ing"):
                if cut >= p2:
                    word = word[:cut]
                    if (
                        word.endswith("ig")
                        and len(word) - 2 >= p2
                        and not word[:-2].endswith("e")
                    ):
                        word = word[:-2]
                    else:
                        word = _undouble(word)
            elif s == "ig":
                if cut >= p2 and not word[:cut].endswith("e"):
                    word = word[:cut]
            elif s == "lijk":
                if cut >= p2:
                    word = word[:cut]
                    m = len(word)
                    if (
                        word.endswith("e")
                        and m - 1 >= p1
                        and m >= 2
                        and word[m - 2] not in _V
                    ):
                        word = _undouble(word[: m - 1])
            elif s == "baar":
                if cut >= p2:
                    word = word[:cut]
            else:  # 'bar'
                if cut >= p2 and e_found:
                    word = word[:cut]
            break

    # ---- step 5: undouble vowel (…V V C at the end) ----
    n = len(word)
    if (
        n >= 4
        and word[n - 1] not in _V_I
        and word[n - 3 : n - 1] in ("aa", "ee", "oo", "uu")
        and word[n - 4] not in _V
    ):
        word = word[: n - 2] + word[n - 1]

    return word.replace("Y", "y").replace("I", "i")
