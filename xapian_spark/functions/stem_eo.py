"""Snowball Esperanto stemmer — pure-Python port of
xapian-core/languages/algorithms/esperanto.sbl.

No golden vocabulary ships in xapian-data for Esperanto; the port is
.sbl-faithful and pinned by morphology tests.  Key semantics: the
``not pronoun`` / ``not correlative`` / ``not ujn_suffix`` guards ABORT the
stem() sequence when they match, but their slice deletions (the trailing
accusative ``n`` / plural ``j``) persist — that is how the reference stems
"min"→"mi", "tiun"→"tiu" while leaving the base form alone.  canonical_form
runs under ``test``: its x-system→circumflex replacements persist even when
a foreign letter (q/w/x/y or an accented vowel) later aborts everything.
"""

from __future__ import annotations

_X = {"cx": "ĉ", "gx": "ĝ", "hx": "ĥ", "jx": "ĵ", "sx": "ŝ", "ux": "ŭ"}
_ACCENT = {"á": "a", "é": "e", "í": "i", "ó": "o", "ú": "u"}
_VOWELS = frozenset("aeiou")
_DIGITS = frozenset("0123456789")

_PRONOUNS = sorted(
    ["ci", "gi", "ĝi", "hi", "ili", "iŝi", "ivi", "li", "malŝi", "mi",
     "ni", "oni", "ri", "si", "ŝi", "ŝli", "vi"], key=len, reverse=True)

_ADVERBS = sorted(
    ["adi", "almen", "amb", "ank", "ankor", "anstat", "antaŭhier", "apen",
     "bald", "ĉirk", "hier", "hodi", "kontr", "kvaz", "malbald", "malgr",
     "morg", "postmorg", "presk", "tutĉirk"], key=len, reverse=True)

_UNINFLECTED = ["aha", "amen", "dirlididi", "disde", "ehe", "ekde", "elde",
                "haha", "haleluja", "hola", "hosana", "hura", "ĥaĥa",
                "malĉi", "malkaj", "malpli", "maltra", "maltre", "maltro",
                "minus", "muu", "oho", "tamen", "uhu"]

_CORR_PREFIX = sorted(["ĉ", "k", "kelk", "mult", "nen", "samt", "t"],
                      key=len, reverse=True)

_STD_PLAIN = sorted(["a", "aj", "ajn", "an", "e", "en", "i", "as", "is",
                     "os", "u", "us", "o", "oj", "ojn", "on"],
                    key=len, reverse=True)
_STD_GUARDED = frozenset(["j", "jn", "n"])  # need '-' or digit before
_STD_ALL = sorted(_STD_PLAIN + list(_STD_GUARDED), key=len, reverse=True)


def _canonical(w: str) -> tuple[str, bool]:
    foreign = False
    out = []
    i = 0
    while i < len(w):
        two = w[i:i + 2]
        if two in _X:
            out.append(_X[two])
            i += 2
            continue
        c = w[i]
        if c in _ACCENT:
            out.append(_ACCENT[c])
            foreign = True
        elif c in "qwxy":
            out.append(c)
            foreign = True
        elif c == "-":
            out.append(c)
            foreign = False
        else:
            out.append(c)
        i += 1
    return "".join(out), foreign


def _at_or_dash(w: str, pos: int) -> bool:
    """(atlimit or '-') at backward cursor ``pos`` (start of the match)."""
    return pos == 0 or w[pos - 1] == "-"


def _pronoun(w: str) -> str | None:
    """Returns the word with the optional accusative n deleted, or None."""
    v, had_n = (w[:-1], True) if w.endswith("n") else (w, False)
    for p in _PRONOUNS:
        if v.endswith(p):
            if _at_or_dash(v, len(v) - len(p)):
                return v if had_n else w
            return None  # among commits to the longest match
    return None


def _final_apostrophe(w: str) -> str:
    if not w.endswith("'"):
        return w
    rest = w[:-1]
    if rest == "l":
        return "la"
    if rest == "un":
        return "unu"
    for a in _ADVERBS:
        if rest.endswith(a) and _at_or_dash(rest, len(rest) - len(a)):
            return rest + "aŭ"
    return rest + "o"


def _corr_tail(w: str, pos: int) -> bool:
    """After the e/aou char at ``pos``: 'i', optional ĉ/k/kelk/…, atlimit/'-'."""
    if pos < 1 or w[pos - 1] != "i":
        return False
    q = pos - 1
    for p in _CORR_PREFIX:  # try among — no backtracking out of it
        if w[:q].endswith(p):
            q -= len(p)
            break
    return _at_or_dash(w, q)


def _correlative(w: str) -> str | None:
    n = len(w)
    # branch 1: [try 'n' ]  'e'
    j, d = (n - 1, 1) if w.endswith("n") else (n, 0)
    if j >= 1 and w[j - 1] == "e" and _corr_tail(w, j - 1):
        return w[:n - d] if d else w
    # branch 2: try 'n' try 'j' ] aou
    j, d = (n - 1, 1) if w.endswith("n") else (n, 0)
    if j >= 1 and w[j - 1] == "j":
        j, d = j - 1, d + 1
    if j >= 1 and w[j - 1] in "aou" and _corr_tail(w, j - 1):
        return w[:n - d] if d else w
    return None


def _ujn(w: str) -> str | None:
    v, d = (w[:-1], 1) if w.endswith("n") else (w, 0)
    if v.endswith("j"):
        v, d = v[:-1], d + 1
    for base in ("aliu", "unu"):
        if v.endswith(base) and _at_or_dash(v, len(v) - len(base)):
            return v if d else w
    return None


def _long_word(w: str) -> bool:
    c = len(w)
    for _ in range(2):
        i = c - 1
        while i >= 0 and w[i] not in _VOWELS:
            i -= 1
        if i >= 0:
            c = i
            continue
        i = c - 1
        while i >= 0 and w[i] != "-":
            i -= 1
        if i >= 1:  # gopast '-' then `next` needs one more char to the left
            c = i - 1
            continue
        i = c - 1
        while i >= 0 and w[i] not in _DIGITS:
            i -= 1
        if i >= 0:
            c = i
            continue
        return False
    return True


def _standard_suffix(w: str) -> str | None:
    for s in _STD_ALL:
        if w.endswith(s):
            start = len(w) - len(s)
            if s in _STD_GUARDED:
                if start == 0 or not (w[start - 1] == "-"
                                      or w[start - 1] in _DIGITS):
                    return None
            if start > 0 and w[start - 1] == "-":
                start -= 1  # try '-': fold a joining hyphen into the slice
            return w[:start]
    return None


def stem_esperanto(word: str) -> str:
    w, foreign = _canonical(word)
    if foreign:
        return w
    if (w.startswith("'") and len(w) >= 4 and w[1:3] == "st"
            and w[3:] in ("as", "i", "is", "os", "u", "us")):
        w = "e" + w[1:]
    r = _pronoun(w)
    if r is not None:
        return r
    w = _final_apostrophe(w)
    r = _correlative(w)
    if r is not None:
        return r
    for u in _UNINFLECTED:
        if w == u or (w.endswith(u) and w[len(w) - len(u) - 1] == "-"):
            return w
    for num in ("unu", "tri", "du"):  # longest-match among
        if w.endswith(num):
            pre = w[: len(w) - len(num)]
            if pre.endswith("cent") or pre.endswith("dek"):
                return w
            break
    r = _ujn(w)
    if r is not None:
        return r
    if not _long_word(w):
        return w
    r = _standard_suffix(w)
    return r if r is not None else w
