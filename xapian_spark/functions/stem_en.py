"""Snowball English stemmer — pure-Python port of
xapian-core/languages/algorithms/english.sbl (the Porter2 algorithm with
xapian 2.0's extensions: mark_regions exception prefixes past/univers/
later/emerg/organ/inter, shortv 'past' case, Step_1b proc/exc/succ and
'even' exceptions, Step_2 'ogist').

Validated against the reference's full golden vocabulary
(xapian-data/stemming/english/voc.txt → output.txt, 42,649 pairs) in
tests/test_stemmer.py.
"""

from __future__ import annotations

_V = frozenset("aeiouy")
_V_WXY = frozenset("aeiouywxY")
_VALID_LI = frozenset("cdeghkmnrt")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")

_EXCEPTION1 = {
    "skis": "ski",
    "skies": "sky",
    "idly": "idl",
    "gently": "gentl",
    "ugly": "ugli",
    "early": "earli",
    "only": "onli",
    "singly": "singl",
    "sky": "sky",
    "news": "news",
    "howe": "howe",
    "atlas": "atlas",
    "cosmos": "cosmos",
    "bias": "bias",
    "andes": "andes",
}

_R1_PREFIXES = (
    "gener", "commun", "arsen", "past", "univers", "later", "emerg",
    "organ", "inter",
)

_STEP2 = [  # longest-match order handled by sorting at lookup
    ("ational", "ate"), ("fulness", "ful"), ("iveness", "ive"),
    ("ization", "ize"), ("ousness", "ous"),
    ("biliti", "ble"), ("lessli", "less"), ("tional", "tion"),
    ("alism", "al"), ("aliti", "al"), ("ation", "ate"), ("entli", "ent"),
    ("fulli", "ful"), ("iviti", "ive"), ("ousli", "ous"), ("ogist", "og"),
    ("abli", "able"), ("alli", "al"), ("anci", "ance"), ("ator", "ate"),
    ("enci", "ence"), ("izer", "ize"),
    ("bli", "ble"), ("ogi", None), ("li", None),
]

_STEP3 = [
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ative", None), ("ical", "ic"),
    ("ness", ""), ("ful", ""),
]

_STEP4 = [
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize", "ion",
    "al", "er", "ic",
]


def _has_vowel(s: str) -> bool:
    return any(c in _V for c in s)


def _shortv_at(w: str, i: int) -> bool:
    """shortv ending at position i (exclusive), english.sbl:58-66."""
    # ( non-v_WXY v non-v )  — reading backwards from i
    if i >= 3 and w[i - 1] not in _V_WXY and w[i - 2] in _V and w[i - 3] not in _V:
        return True
    # ( non-v v atlimit )
    if i == 2 and w[1] not in _V and w[0] in _V:
        return True
    # ( 'past' )
    if w[:i].endswith("past"):
        return True
    return False


def _mark_regions(w: str) -> tuple[int, int]:
    n = len(w)
    p1 = n
    # exception prefixes (longest match)
    for pre in sorted(_R1_PREFIXES, key=len, reverse=True):
        if w.startswith(pre):
            p1 = len(pre)
            break
    else:
        i = 0
        while i < n and w[i] not in _V:
            i += 1
        while i < n and w[i] in _V:
            i += 1
        p1 = i if i < n else n
        if p1 < n:
            p1 += 0  # p1 is the position AFTER vowel+non-vowel
        # the loop above: gopast v → first vowel; gopast non-v → first
        # non-vowel after it; p1 = index after that non-vowel
        i = 0
        while i < n and w[i] not in _V:
            i += 1
        while i < n and w[i] in _V:
            i += 1
        p1 = i + 1 if i < n else n
    # p2: continue from p1
    i = p1
    while i < n and w[i] not in _V:
        i += 1
    while i < n and w[i] in _V:
        i += 1
    p2 = i + 1 if i < n else n
    return p1, p2


_STEP1B_SUFFIXES = ("ingly", "edly", "ing", "ed")


def stem_english(word: str, _step1b_extra: tuple = ()) -> str:
    """``_step1b_extra``: extra Step_1b delete-group suffixes — the hook
    earlyenglish.sbl uses (its only diff vs english.sbl is adding the
    archaic verb endings 'est'/'eth' to that among group)."""
    w = word
    if w in _EXCEPTION1:
        return _EXCEPTION1[w]
    if len(w) < 3:
        return w

    # prelude
    if w.startswith("'"):
        w = w[1:]
    y_found = False
    if w.startswith("y"):
        w = "Y" + w[1:]
        y_found = True
    out = []
    for i, c in enumerate(w):
        if c == "y" and i > 0 and w[i - 1] in _V:
            out.append("Y")
            y_found = True
        else:
            out.append(c)
    w = "".join(out)

    p1, p2 = _mark_regions(w)

    def in_r1(i: int) -> bool:  # suffix starting at index i
        return i >= p1

    def in_r2(i: int) -> bool:
        return i >= p2

    # ---- Step 0 / 1a ----
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break
    if w.endswith("sses"):
        w = w[:-4] + "ss"
    elif w.endswith("ied") or w.endswith("ies"):
        pre = w[:-3]
        w = pre + ("i" if len(pre) > 1 else "ie")
    elif w.endswith("us") or w.endswith("ss"):
        pass
    elif w.endswith("s"):
        # delete if a vowel exists before the char immediately preceding 's'
        if len(w) >= 3 and _has_vowel(w[:-2]):
            w = w[:-1]

    # ---- Step 1b ----
    step1b_done = False
    if w.endswith("eedly") or w.endswith("eed"):
        k = 5 if w.endswith("eedly") else 3
        start = len(w) - k
        if in_r1(start):
            if not (w[:start] in ("proc", "exc", "succ")):
                w = w[:start] + "ee"
        step1b_done = True
    elif w.endswith("ing"):
        pre = w[:-3]
        if pre.endswith("y") and len(pre) == 2 and pre[0] not in _V:
            w = pre[:-1] + "ie"  # dying→die (single non-vowel + y + ing)
            step1b_done = True
        elif pre in ("inn", "out", "cann", "herr", "earr", "even"):
            step1b_done = True
    if not step1b_done:
        sufs = (
            _STEP1B_SUFFIXES if not _step1b_extra
            else ("ingly", "edly", "ing") + _step1b_extra + ("ed",)
        )
        for suf in sufs:
            if w.endswith(suf):
                pre = w[: -len(suf)]
                if _has_vowel(pre):
                    w = pre
                    if w.endswith(("at", "bl", "iz")):
                        w += "e"
                    elif w.endswith(_DOUBLES):
                        # undouble unless the word is a/e/o + double
                        if not (len(w) == 3 and w[0] in "aeo"):
                            w = w[:-1]
                    elif len(w) == p1 and _shortv_at(w, len(w)):
                        w += "e"
                break

    # ---- Step 1c ----
    if (
        len(w) > 2
        and w[-1] in ("y", "Y")
        and w[-2] not in _V
    ):
        w = w[:-1] + "i"

    # ---- Step 2 ----
    for suf, rep in _STEP2:
        if w.endswith(suf):
            start = len(w) - len(suf)
            if in_r1(start):
                if suf == "ogi":
                    if w[:start].endswith("l"):
                        w = w[:start] + "og"
                elif suf == "li":
                    if start > 0 and w[start - 1] in _VALID_LI:
                        w = w[:start]
                else:
                    w = w[:start] + rep
            break

    # ---- Step 3 ----
    for suf, rep in _STEP3:
        if w.endswith(suf):
            start = len(w) - len(suf)
            if in_r1(start):
                if suf == "ative":
                    if in_r2(start):
                        w = w[:start]
                else:
                    w = w[:start] + rep
            break

    # ---- Step 4 ----
    for suf in _STEP4:
        if w.endswith(suf):
            start = len(w) - len(suf)
            if in_r2(start):
                if suf == "ion":
                    if start > 0 and w[start - 1] in ("s", "t"):
                        w = w[:start]
                else:
                    w = w[:start]
            break

    # ---- Step 5 ----
    if w.endswith("e"):
        start = len(w) - 1
        if in_r2(start) or (in_r1(start) and not _shortv_at(w, start)):
            w = w[:start]
    elif w.endswith("l"):
        start = len(w) - 1
        if in_r2(start) and start > 0 and w[start - 1] == "l":
            w = w[:start]

    # postlude
    if y_found:
        w = w.replace("Y", "y")
    return w
