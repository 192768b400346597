"""Snowball Arabic stemmer — pure-Python port of
xapian-core/languages/algorithms/arabic.sbl (Chelli & Aries).

No golden vocabulary ships in xapian-data for Arabic; the port follows the
formal Snowball semantics (or-chain alternatives restore the cursor but
string changes persist, among commits to its longest match, ``atleast 1``
= strip once then repeat).  Pipeline: Checks1 flags the definite article,
Normalize_pre (strip diacritics/kasheeda, fold presentation forms,
ligatures, Hindu–Arabic digits), verb-or-noun-or-maqsura suffix phase,
prefix phase, Normalize_post (final-hamza then hamza folding).
"""

from __future__ import annotations

# base letters
_HAMZA = "ء"       # ء
_AHA = "أ"         # أ alef hamza above
_AHB = "إ"         # إ alef hamza below
_AMAD = "آ"        # آ alef madda
_WAWH = "ؤ"        # ؤ waw hamza
_YEHH = "ئ"        # ئ yeh hamza
_ALEF = "ا"        # ا
_MAQ = "ى"         # ى alef maksura
_TMARB = "ة"       # ة teh marbuta

_DROP = frozenset("ًٌٍَُِّْـ")

_SHAPED = {}
for _base, _forms in [
    (_HAMZA, ["ﺀ"]), (_AHA, ["ﺃ", "ﺄ"]),
    (_AHB, ["ﺇ", "ﺈ"]),
    (_YEHH, ["ﺋ", "ﺌ", "ﺉ", "ﺊ"]),
    (_AMAD, ["ﺁ", "ﺂ"]), (_WAWH, ["ﺅ", "ﺆ"]),
    (_ALEF, ["ﺍ", "ﺎ"]),
    ("ب", ["ﺏ", "ﺐ", "ﺑ", "ﺒ"]),
    (_TMARB, ["ﺓ", "ﺔ"]),
    ("ت", ["ﺗ", "ﺘ", "ﺕ", "ﺖ"]),
    ("ث", ["ﺛ", "ﺜ", "ﺚ", "ﺙ"]),
    ("ج", ["ﺟ", "ﺠ", "ﺝ", "ﺞ"]),
    ("ح", ["ﺣ", "ﺤ", "ﺡ", "ﺢ"]),
    ("خ", ["ﺧ", "ﺨ", "ﺥ", "ﺦ"]),
    ("د", ["ﺩ", "ﺪ"]), ("ذ", ["ﺫ", "ﺬ"]),
    ("ر", ["ﺭ", "ﺮ"]), ("ز", ["ﺯ", "ﺰ"]),
    ("س", ["ﺳ", "ﺴ", "ﺱ", "ﺲ"]),
    ("ش", ["ﺷ", "ﺸ", "ﺵ", "ﺶ"]),
    ("ص", ["ﺻ", "ﺼ", "ﺹ", "ﺺ"]),
    ("ض", ["ﺿ", "ﻀ", "ﺽ", "ﺾ"]),
    ("ط", ["ﻃ", "ﻄ", "ﻁ", "ﻂ"]),
    ("ظ", ["ﻇ", "ﻈ", "ﻅ", "ﻆ"]),
    ("ع", ["ﻋ", "ﻌ", "ﻉ", "ﻊ"]),
    ("غ", ["ﻏ", "ﻐ", "ﻍ", "ﻎ"]),
    ("ف", ["ﻓ", "ﻔ", "ﻑ", "ﻒ"]),
    ("ق", ["ﻗ", "ﻘ", "ﻕ", "ﻖ"]),
    ("ك", ["ﻛ", "ﻜ", "ﻙ", "ﻚ"]),
    ("ل", ["ﻟ", "ﻠ", "ﻝ", "ﻞ"]),
    ("م", ["ﻣ", "ﻤ", "ﻡ", "ﻢ"]),
    ("ن", ["ﻧ", "ﻨ", "ﻥ", "ﻦ"]),
    ("ه", ["ﻫ", "ﻬ", "ﻩ", "ﻪ"]),
    ("و", ["ﻭ", "ﻮ"]), (_MAQ, ["ﻯ", "ﻰ"]),
    ("ي", ["ﻳ", "ﻴ", "ﻱ", "ﻲ"]),
    ("ل" + _ALEF, ["ﻻ", "ﻼ"]),
    ("ل" + _AHA, ["ﻷ", "ﻸ"]),
    ("ل" + _AHB, ["ﻹ", "ﻺ"]),
    ("ل" + _AMAD, ["ﻵ", "ﻶ"]),
]:
    for _f in _forms:
        _SHAPED[_f] = _base
for _i in range(10):
    _SHAPED[chr(0x0660 + _i)] = str(_i)


def _normalize_pre(w: str) -> str:
    return "".join(_SHAPED.get(c, c) for c in w if c not in _DROP)


# (suffix, min_len) — delete when len(w) >= min_len; longest match commits.
def _mk(entries):
    return sorted(entries, key=lambda kv: -len(kv[0]))


_N1A = _mk([("ي", 4), ("ك", 4), ("ه", 4), ("نا", 5), ("كم", 5), ("ها", 5),
            ("هن", 5), ("هم", 5), ("كما", 6), ("هما", 6)])
_N2A = _mk([("ا", 5), ("ي", 5), ("و", 5)])       # len > 4
_V1 = _mk([("ه", 4), ("ك", 4), ("ني", 5), ("نا", 5), ("ها", 5), ("هم", 5),
           ("هن", 5), ("كم", 5), ("كن", 5), ("هما", 6), ("كما", 6),
           ("كمو", 6)])
_V2A = _mk([("ت", 4), ("ا", 4), ("ن", 4), ("ي", 4), ("نا", 5), ("تا", 5),
            ("تن", 5), ("ان", 6), ("ون", 6), ("ين", 6), ("تما", 6)])
_V2B = _mk([("وا", 5), ("تم", 5)])
_V2C = _mk([("و", 4), ("تمو", 6)])


def _del_suffix(w: str, table) -> str | None:
    for suf, need in table:
        if w.endswith(suf):
            return w[: -len(suf)] if len(w) >= need else None
    return None


def _n2c2(w):
    return w[:-1] if w.endswith(_TMARB) and len(w) >= 4 else None


def _n1b(w):
    return w[:-1] if w.endswith("ن") and len(w) > 5 else None


def _n2b(w):
    return w[:-2] if w.endswith("ات") and len(w) >= 5 else None


def _n2c1(w):
    return w[:-1] if w.endswith("ت") and len(w) >= 4 else None


def _n3(w):
    return w[:-1] if w.endswith("ي") and len(w) >= 3 else None


def _verb_suffixes(w: str) -> str | None:
    stripped = False
    while True:
        r = _del_suffix(w, _V1)
        if r is None:
            break
        w, stripped = r, True
    if stripped:
        r = _del_suffix(w, _V2A)
        if r is None:
            r = _del_suffix(w, _V2C)
        return r if r is not None else w  # `next` fallback
    r = _del_suffix(w, _V2B)
    if r is not None:
        return r
    return _del_suffix(w, _V2A)


def _noun_suffixes(w: str, is_defined: bool) -> tuple[str, bool]:
    """try(alternatives) then Step3; failed alternatives keep their
    deletions (Snowball string ops persist through or-chain failure)."""
    matched = False
    r = _n2c2(w)
    if r is not None:
        w, matched = r, True
    if not matched and not is_defined:
        r1 = _del_suffix(w, _N1A)
        if r1 is not None:
            w = r1
            r2 = _del_suffix(w, _N2A) or _n2b(w) or _n2c1(w)
            if r2 is not None:
                w = r2
            matched = True  # `next` fallback keeps the alternative alive
    if not matched:
        r1 = _n1b(w)
        if r1 is not None:
            w = r1  # persists even if the inner chain fails
            r2 = _del_suffix(w, _N2A) or _n2b(w) or _n2c1(w)
            if r2 is not None:
                w, matched = r2, True
    if not matched and not is_defined:
        r = _del_suffix(w, _N2A)
        if r is not None:
            w, matched = r, True
    if not matched:
        r = _n2b(w)
        if r is not None:
            w = r
    r = _n3(w)
    if r is not None:
        return r, True
    return w, False


_P1 = _mk([(_AHA + _AHA, _AHA), (_AHA + _AMAD, _AMAD), (_AHA + _WAWH, _AHA),
           (_AHA + _ALEF, _ALEF), (_AHA + _AHB, _AHB)])
_P3A = _mk([("بال", 6), ("كال", 6), ("لل", 5), ("ال", 5)])  # len > k-1
_P3V = _mk([("سي", "ي"), ("ست", "ت"), ("سن", "ن"), ("سأ", _AHA)])


def _prefixes(w: str, is_noun: bool, is_verb: bool) -> str:
    for pre, rep in _P1:  # try Prefix_Step1
        if w.startswith(pre):
            if len(w) > 3:
                w = rep + w[2:]
            break
    if w[:1] in ("ف", "و") and len(w) > 3 and w[1:2] != _ALEF:
        w = w[1:]  # try Prefix_Step2 (conjunction, not before alef)
    # Prefix_Step3a_Noun (any word)
    for pre, need in _P3A:
        if w.startswith(pre):
            if len(w) >= need:
                return w[len(pre):]
            break  # longest match committed; len failed -> Step3a fails
    if is_noun:
        # Prefix_Step3b_Noun, longest match: با no-op; بب/كك undouble; ب delete
        if w.startswith("با"):
            return w
        if w.startswith("بب"):
            if len(w) > 3:
                return "ب" + w[2:]
        elif w.startswith("كك"):
            if len(w) > 3:
                return "ك" + w[2:]
        elif w.startswith("ب"):
            if len(w) > 3:
                return w[1:]
        # matched-but-len-failed or no match: fall through to the verb branch
    if is_verb:
        for pre, rep in _P3V:  # try Prefix_Step3_Verb
            if w.startswith(pre):
                if len(w) > 4:
                    w = rep + w[2:]
                break
        for pre in ("يست", "نست", "تست"):  # Prefix_Step4_Verb
            if w.startswith(pre):
                if len(w) > 4:
                    return _ALEF + "ست" + w[3:]
                break
    return w


def _normalize_post(w: str) -> str:
    if w[-1:] in (_AHA, _AHB, _AMAD, _WAWH, _YEHH):
        w = w[:-1] + _HAMZA
    return (w.replace(_AHA, _ALEF).replace(_AHB, _ALEF)
            .replace(_AMAD, _ALEF).replace(_WAWH, "و").replace(_YEHH, "ي"))


def stem_arabic(word: str) -> str:
    is_noun = is_verb = True
    is_defined = False
    w = word
    for pre, need in _P3A:  # Checks1 shares Prefix_Step3a's article table
        if w.startswith(pre):
            if len(w) > need - 2:  # bal/kal: len>4; ll/al: len>3
                is_noun, is_verb, is_defined = True, False, True
            break
    w = _normalize_pre(w)
    if w:
        if is_verb:
            r = _verb_suffixes(w)
            if r is not None:
                w = r
            elif is_noun:
                w, ok = _noun_suffixes(w, is_defined)
                if not ok and w.endswith(_MAQ):
                    w = w[:-1] + "ي"
            elif w.endswith(_MAQ):
                w = w[:-1] + "ي"
        elif is_noun:
            w, ok = _noun_suffixes(w, is_defined)
            if not ok and w.endswith(_MAQ):
                w = w[:-1] + "ي"
        elif w.endswith(_MAQ):
            w = w[:-1] + "ي"
        w = _prefixes(w, is_noun, is_verb)
        if w:
            w = _normalize_post(w)
    return w
