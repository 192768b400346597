"""Snowball Danish stemmer — pure-Python port of
xapian-core/languages/algorithms/danish.sbl; golden-validated against
xapian-data/stemming/danish/ in tests/test_stemmer.py.

Same Snowball conventions as [stem_sv]: the ``setlimit tomark p1 for
([substring])`` scope covers only the suffix match — conditions afterwards
run string-wide.
"""

from __future__ import annotations

_C = frozenset("bcdfghjklmnpqrstvwxz")
_V = frozenset("aeiouyæåø")
_S_ENDING = frozenset("abcdfghjklmnoprtvyzå")

_MAIN_DELETE = sorted(
    (
        "hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene",
        "erne", "ere", "en", "heden", "eren", "er", "heder", "erer", "heds",
        "es", "endes", "erendes", "enes", "ernes", "eres", "ens", "hedens",
        "erens", "ers", "ets", "erets", "et", "eret",
    ),
    key=len,
    reverse=True,
)

_PAIRS = ("gd", "dt", "gt", "kt")


def _mark_p1(word: str) -> int:
    n = len(word)
    p1 = n
    i = 0
    while i < n and word[i] not in _V:
        i += 1
    if i < n:
        i += 1
        while i < n and word[i] in _V:
            i += 1
        if i < n:
            p1 = i + 1
    if n >= 3 and p1 < 3:
        p1 = 3
    return p1


def _consonant_pair(word: str, p1: int) -> str:
    n = len(word)
    region = word[p1:] if p1 < n else ""
    for pair in _PAIRS:
        if region.endswith(pair):
            return word[: n - 1]
    return word


def stem_danish(word: str) -> str:
    p1 = _mark_p1(word)

    # ---- main_suffix ----
    n = len(word)
    region = word[p1:] if p1 < n else ""
    best = None
    for s in _MAIN_DELETE:
        if region.endswith(s):
            best = (len(s), "del")
            break
    if region.endswith("s") and (best is None or best[0] < 1):
        best = (1, "s")
    if best is not None:
        if best[1] == "del":
            word = word[: n - best[0]]
        else:  # 's': preceding char ∈ s_ending (string-wide)
            if n >= 2 and word[n - 2] in _S_ENDING:
                word = word[: n - 1]

    # ---- consonant_pair ----
    word = _consonant_pair(word, p1)

    # ---- other_suffix ----
    # do ( ['st'] 'ig' delete ): endswith 'igst' (string-wide) → drop 'st'
    if word.endswith("igst"):
        word = word[:-2]
    n = len(word)
    region = word[p1:] if p1 < n else ""
    for s in ("elig", "løst", "lig", "els", "ig"):
        if region.endswith(s):
            if s == "løst":
                word = word[: n - 1]  # løst → løs
            else:
                word = word[: n - len(s)]
                word = _consonant_pair(word, p1)
            break

    # ---- undouble: final double consonant (last char within R1) ----
    n = len(word)
    if (
        n - 1 >= p1
        and n >= 2
        and word[n - 1] in _C
        and word[n - 2] == word[n - 1]
    ):
        word = word[: n - 1]
    return word
