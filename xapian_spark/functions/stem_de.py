"""Snowball German stemmer — pure-Python port of
xapian-core/languages/algorithms/german.sbl (Snowball 3.x "german2"
variant: ae/oe/ue folding in the prelude, -et suffix with exception list);
golden-validated against xapian-data/stemming/german/ in
tests/test_stemmer.py.
"""

from __future__ import annotations

_V = frozenset("aeiouyäöü")
_ET_ENDING = frozenset("dfgklmnrstUzä")
_S_ENDING = frozenset("bdfghklmnrt")
_ST_ENDING = _S_ENDING - {"r"}

_ET_EXCL = ("geordn", "intern", "plan", "tick", "tr")


def _prelude(word: str) -> str:
    # mark u/y between vowels as U/Y (consonant use)
    chars = list(word)
    n = len(chars)
    i = 0
    while i + 2 < n + 0:
        if (
            chars[i] in _V
            and chars[i + 1] in ("u", "y")
            and i + 2 < n
            and chars[i + 2] in _V
        ):
            chars[i + 1] = chars[i + 1].upper()
            i += 2  # the trailing vowel may lead the next match
        else:
            i += 1
    s = "".join(chars)
    # ß→ss, ae→ä, oe→ö, ue→ü (but 'qu' protects a following 'u')
    out = []
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c == "ß":
            out.append("ss")
            i += 1
        elif c == "q" and i + 1 < n and s[i + 1] == "u":
            out.append("qu")
            i += 2
        elif c in "aou" and i + 1 < n and s[i + 1] == "e":
            out.append({"a": "ä", "o": "ö", "u": "ü"}[c])
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _postlude(word: str) -> str:
    return (
        word.replace("Y", "y")
        .replace("U", "u")
        .replace("ä", "a")
        .replace("ö", "o")
        .replace("ü", "u")
    )


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
    p2 = next_region(p1)
    if n >= 3 and p1 < 3:
        p1 = 3
    return p1, p2


def stem_german(word: str) -> str:
    word = _prelude(word)
    p1, p2 = _mark_regions(word)

    def in_r1(cut: int) -> bool:
        return cut >= p1

    def in_r2(cut: int) -> bool:
        return cut >= p2

    # ---- block 1 (R1) ----
    n = len(word)
    for s in ("erinnen", "erin", "ern", "er", "em", "lns", "ln", "en", "es", "e", "s"):
        if word.endswith(s):
            cut = n - len(s)
            if not in_r1(cut):
                break
            if s == "em":
                if word[:cut].endswith("syst"):
                    break
                word = word[:cut]
            elif s in ("ern", "er", "erin", "erinnen"):
                word = word[:cut]
            elif s in ("e", "en", "es"):
                word = word[:cut]
                # try (['s'] 'nis' delete): ...niss → ...nis
                if word.endswith("s") and word[:-1].endswith("nis"):
                    word = word[:-1]
            elif s == "s":
                if cut >= 1 and word[cut - 1] in _S_ENDING:
                    word = word[:cut]
            else:  # 'ln' / 'lns' → 'l'
                word = word[:cut] + "l"
            break

    # ---- block 2 (R1) ----
    n = len(word)
    for s in ("est", "en", "er", "st", "et"):
        if word.endswith(s):
            cut = n - len(s)
            if not in_r1(cut):
                break
            if s in ("en", "er", "est"):
                word = word[:cut]
            elif s == "st":
                # st_ending hop 3: preceding char ∈ st_ending and ≥3 chars
                # before it
                if cut >= 1 and word[cut - 1] in _ST_ENDING and cut - 1 >= 3:
                    word = word[:cut]
            else:  # 'et'
                if cut >= 1 and word[cut - 1] in _ET_ENDING:
                    head = word[:cut]
                    if not any(head.endswith(p) for p in _ET_EXCL):
                        word = word[:cut]
            break

    # ---- block 3 (R2) ----
    n = len(word)
    for s in ("isch", "lich", "heit", "keit", "end", "ung", "ig", "ik"):
        if word.endswith(s):
            cut = n - len(s)
            if not in_r2(cut):
                break
            if s in ("end", "ung"):
                word = word[:cut]
                # try (['ig'] not 'e' R2 delete)
                if word.endswith("ig") and not word[:-2].endswith("e") and in_r2(
                    len(word) - 2
                ):
                    word = word[:-2]
            elif s in ("ig", "ik", "isch"):
                if not word[:cut].endswith("e"):
                    word = word[:cut]
            elif s in ("lich", "heit"):
                word = word[:cut]
                # try (['er' or 'en'] R1 delete)
                for t in ("er", "en"):
                    if word.endswith(t) and in_r1(len(word) - 2):
                        word = word[:-2]
                        break
            else:  # 'keit'
                word = word[:cut]
                for t in ("lich", "ig"):
                    if word.endswith(t) and in_r2(len(word) - len(t)):
                        word = word[: len(word) - len(t)]
                        break
            break

    return _postlude(word)
