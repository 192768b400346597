"""Snowball Finnish stemmer — pure-Python port of
xapian-core/languages/algorithms/finnish.sbl; golden-validated against
xapian-data/stemming/finnish/ in tests/test_stemmer.py.

Unlike French's i_verb_suffix, the ``setlimit tomark p1 for ([substring])``
in these routines scopes ONLY the suffix match — the among conditions run
with the limit restored, so lookbehinds may cross p1.  The exceptions are
t_plural's first step and tidy, whose whole bodies sit inside the for.
"""

from __future__ import annotations

_AEI = frozenset("aäei")
_C = frozenset("bcdfghjklmnpqrstvwxz")
_V1 = frozenset("aeiouyäö")
_V2 = frozenset("aeiouäö")
_PARTICLE_END = _V1 | {"n", "t"}

_LONG = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")


def _mark_regions(word: str) -> tuple[int, int]:
    n = len(word)

    def next_region(start: int) -> int:
        i = start
        while i < n and word[i] not in _V1:
            i += 1
        if i >= n:
            return n
        i += 1
        while i < n and word[i] in _V1:
            i += 1
        if i >= n:
            return n
        return i + 1

    p1 = next_region(0)
    p2 = next_region(p1)
    return p1, p2


def _particle_etc(word: str, p1: int, p2: int):
    n = len(word)
    region = word[p1:] if p1 < n else ""
    for s in ("kaan", "kään", "kin", "han", "hän", "ko", "kö", "pa", "pä", "sti"):
        if region.endswith(s):
            cut = n - len(s)
            if s == "sti":
                if cut >= p2:
                    return word[:cut]
                return None
            if cut >= 1 and word[cut - 1] in _PARTICLE_END:
                return word[:cut]
            return None
    return None


def _possessive(word: str, p1: int):
    n = len(word)
    region = word[p1:] if p1 < n else ""
    for s in ("nsa", "nsä", "mme", "nne", "si", "ni", "an", "än", "en"):
        if region.endswith(s):
            cut = n - len(s)
            if s == "si":
                if cut >= 1 and word[cut - 1] == "k":
                    return None
                return word[:cut]
            if s == "ni":
                w = word[:cut]
                # ['kse'] <- 'ksi'; failure fails the routine but the 'ni'
                # deletion persists
                if w.endswith("kse"):
                    return w[:-3] + "ksi"
                return w
            if s in ("nsa", "nsä", "mme", "nne"):
                return word[:cut]
            if s == "an":
                pres = ("ta", "ssa", "sta", "lla", "lta", "na")
            elif s == "än":
                pres = ("tä", "ssä", "stä", "llä", "ltä", "nä")
            else:
                pres = ("lle", "ine")
            head = word[:cut]
            for t in pres:
                if head.endswith(t):
                    return head
            return None
    return None


def _vi(word: str, pos: int) -> bool:
    """VI = ('i' V2) backwards ending at pos."""
    return pos >= 2 and word[pos - 1] == "i" and word[pos - 2] in _V2


def _long_at(word: str, pos: int) -> bool:
    return pos >= 2 and word[pos - 2 : pos] in _LONG


_CASE = (
    "siin seen tten han hen hin hon hän hön den tta ttä ssa ssä sta stä "
    "lla llä lta ltä lle ksi ine ta tä na nä n a ä"
).split()
_CASE.sort(key=len, reverse=True)


def _case_ending(word: str, p1: int):
    n = len(word)
    region = word[p1:] if p1 < n else ""
    for s in _CASE:
        if not region.endswith(s):
            continue
        cut = n - len(s)
        if s in ("han", "hen", "hin", "hon", "hän", "hön"):
            want = {"han": "a", "hen": "e", "hin": "i", "hon": "o",
                    "hän": "ä", "hön": "ö"}[s]
            if cut >= 1 and word[cut - 1] == want:
                return word[:cut]
            return None
        # 'siin'/'seen'/'den'/'tten' carry their conditions as among
        # FUNCTIONS (bare routine name after the literal, no parens) —
        # find_among_b evaluates those during the search and BACKTRACKS to
        # a shorter entry when they fail, unlike command-form conditions
        # which commit.
        if s == "siin" or s == "den" or s == "tten":
            if _vi(word, cut):
                return word[:cut]
            continue
        if s == "seen":
            if _long_at(word, cut):
                return word[:cut]
            continue
        if s == "n":
            # try( (LONG or 'ie') and next ] ): extend deletion one char
            if _long_at(word, cut) or (
                cut >= 2 and word[cut - 2 : cut] == "ie"
            ):
                if cut >= 1:
                    cut -= 1
            return word[:cut]
        if s in ("a", "ä"):
            if cut >= 2 and word[cut - 1] in _V1 and word[cut - 2] in _C:
                return word[:cut]
            return None
        if s in ("tta", "ttä"):
            if cut >= 1 and word[cut - 1] == "e":
                return word[:cut]
            return None
        # unconditional: ta tä ssa ssä sta stä lla llä lta ltä lle na nä
        # ksi ine
        return word[:cut]
    return None


def _other_endings(word: str, p2: int):
    n = len(word)
    region = word[p2:] if p2 < n else ""
    for s in ("impi", "impa", "impä", "immi", "imma", "immä",
              "mpi", "mpa", "mpä", "mmi", "mma", "mmä", "eja", "ejä"):
        if region.endswith(s):
            cut = n - len(s)
            if s in ("mpi", "mpa", "mpä", "mmi", "mma", "mmä"):
                if cut >= 2 and word[cut - 2 : cut] == "po":
                    return None
            return word[:cut]
    return None


def _i_plural(word: str, p1: int):
    n = len(word)
    if n - 1 >= p1 and word[-1:] in ("i", "j"):
        return word[:-1]
    return None


def _t_plural(word: str, p1: int, p2: int):
    n = len(word)
    if n - 1 >= p1 and word.endswith("t") and n - 2 >= p1 and word[n - 2] in _V1:
        word = word[:-1]
        n = len(word)
        region = word[p2:] if p2 < n else ""
        for s in ("imma", "mma"):
            if region.endswith(s):
                cut = n - len(s)
                if s == "mma" and cut >= 2 and word[cut - 2 : cut] == "po":
                    break
                return word[:cut]
        return word
    return None


def _tidy(word: str, p1: int) -> str:
    n = len(word)
    # undouble final long vowel
    if n - 2 >= p1 and word[n - 2 : n] in _LONG:
        word = word[:-1]
        n = len(word)
    # remove trailing a/ä/e/i after a consonant
    if n - 1 >= p1 and word[-1:] and word[-1] in _AEI and n - 2 >= p1 and word[n - 2] in _C:
        word = word[:-1]
        n = len(word)
    # ['j'] 'o' or 'u'
    if n - 1 >= p1 and word.endswith("j") and n - 2 >= p1 and word[n - 2] in "ou":
        word = word[:-1]
        n = len(word)
    # ['o'] 'j'
    if n - 1 >= p1 and word.endswith("o") and n - 2 >= p1 and word[n - 2] == "j":
        word = word[:-1]
        n = len(word)
    # goto non-V1 [C] -> x  x delete  (outside the limit)
    i = n
    while i >= 1 and word[i - 1] in _V1:
        i -= 1
    if i >= 1 and word[i - 1] in _C and i >= 2 and word[i - 2] == word[i - 1]:
        word = word[: i - 1] + word[i:]
    return word


def stem_finnish(word: str) -> str:
    p1, p2 = _mark_regions(word)
    ending_removed = False

    r = _particle_etc(word, p1, p2)
    if r is not None:
        word = r
    r = _possessive(word, p1)
    if r is not None:
        word = r
    r = _case_ending(word, p1)
    if r is not None:
        word = r
        ending_removed = True
    r = _other_endings(word, p2)
    if r is not None:
        word = r
    if ending_removed:
        r = _i_plural(word, p1)
        if r is not None:
            word = r
    else:
        r = _t_plural(word, p1, p2)
        if r is not None:
            word = r
    return _tidy(word, p1)
