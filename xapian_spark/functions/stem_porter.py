"""Snowball Porter (classic) stemmer — pure-Python port of
xapian-core/languages/algorithms/porter.sbl.

Validated against the reference's full golden vocabulary
(xapian-data/stemming/porter/voc.txt → output.txt) in tests/test_stemmer.py.
Same Y-marking / p1-p2 region structure as [stem_en] (Porter2); the steps
follow the .sbl routines with Snowball longest-match among semantics.
"""

from __future__ import annotations

_V = frozenset("aeiouy")
_V_WXY = frozenset("aeiouywxY")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")


def _mark_ys(word: str) -> tuple[str, bool]:
    """Initial y and post-vowel y → Y (consonant-y marking)."""
    found = False
    chars = list(word)
    for i, c in enumerate(chars):
        if c == "y" and (i == 0 or chars[i - 1] in _V):
            chars[i] = "Y"
            found = True
    return "".join(chars), found


def _regions(word: str) -> tuple[int, int]:
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
    p2 = next_region(p1)
    return p1, p2


def _shortv(word: str, i: int) -> bool:
    """shortv at cursor i (backwards): non-v_WXY, v, non-v."""
    if i - 3 < 0:
        return False
    return (
        word[i - 1] not in _V_WXY
        and word[i - 2] in _V
        and word[i - 3] not in _V
    )


def _has_vowel(s: str) -> bool:
    return any(c in _V for c in s)


def stem_porter(word: str) -> str:
    word, y_found = _mark_ys(word)
    p1, p2 = _regions(word)

    # ---- Step 1a ----
    for s, rep in (("sses", "ss"), ("ies", "i"), ("ss", None), ("s", "")):
        if word.endswith(s):
            if rep is not None:
                word = word[: len(word) - len(s)] + rep
            break

    # ---- Step 1b ----
    if word.endswith("eed"):
        if len(word) - 3 >= p1:
            word = word[:-3] + "ee"
    else:
        for s in ("ing", "ed"):
            if word.endswith(s):
                stem = word[: len(word) - len(s)]
                if _has_vowel(stem):
                    word = stem
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(_DOUBLES):
                        word = word[:-1]
                    elif len(word) == p1 and _shortv(word, len(word)):
                        word += "e"
                break

    # ---- Step 1c ----
    if word.endswith(("y", "Y")) and _has_vowel(word[:-1]):
        word = word[:-1] + "i"

    # ---- Step 2 ----
    step2 = (
        ("ational", "ate"), ("fulness", "ful"), ("iveness", "ive"),
        ("ization", "ize"), ("ousness", "ous"), ("biliti", "ble"),
        ("tional", "tion"), ("ation", "ate"), ("alism", "al"),
        ("aliti", "al"), ("ousli", "ous"), ("iviti", "ive"),
        ("entli", "ent"), ("enci", "ence"), ("anci", "ance"),
        ("abli", "able"), ("izer", "ize"), ("ator", "ate"),
        ("alli", "al"), ("eli", "e"),
    )
    for s, rep in step2:
        if word.endswith(s):
            if len(word) - len(s) >= p1:
                word = word[: len(word) - len(s)] + rep
            break

    # ---- Step 3 ----
    step3 = (
        ("alize", "al"), ("icate", "ic"), ("iciti", "ic"), ("ative", ""),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    )
    for s, rep in step3:
        if word.endswith(s):
            if len(word) - len(s) >= p1:
                word = word[: len(word) - len(s)] + rep
            break

    # ---- Step 4 ----
    step4 = (
        "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent",
        "ism", "ate", "iti", "ous", "ive", "ize", "ion", "al", "er", "ic",
        "ou",
    )
    for s in step4:
        if word.endswith(s):
            cut = len(word) - len(s)
            if cut >= p2:
                if s == "ion":
                    if cut >= 1 and word[cut - 1] in "st":
                        word = word[:cut]
                else:
                    word = word[:cut]
            break

    # ---- Step 5a ----
    if word.endswith("e"):
        cut = len(word) - 1
        if cut >= p2 or (cut >= p1 and not _shortv(word, cut)):
            word = word[:cut]

    # ---- Step 5b ----
    if word.endswith("l"):
        cut = len(word) - 1
        if cut >= p2 and cut >= 1 and word[cut - 1] == "l":
            word = word[:cut]

    if y_found:
        word = word.replace("Y", "y")
    return word
