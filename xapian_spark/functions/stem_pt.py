"""Snowball Portuguese stemmer — pure-Python port of
xapian-core/languages/algorithms/portuguese.sbl; golden-validated against
xapian-data/stemming/portuguese/ in tests/test_stemmer.py.

Processing happens on the prelude-marked form (ã → 'a~', õ → 'o~', where
'~' is a non-vowel marker char), exactly like the reference.
"""

from __future__ import annotations

_V = frozenset("aeiouáéíóúâêô")

_STD_R2 = (
    "eza ezas ico ica icos icas ismo ismos ável ível ista istas oso osa "
    "osos osas amento amentos imento imentos adora ador aça~o adoras "
    "adores aço~es ante antes ância"
).split()

_VERB = sorted(
    (
        "ada ida ia aria eria iria ará ara erá era irá ava asse esse isse "
        "aste este iste ei arei erei irei am iam ariam eriam iriam aram "
        "eram iram avam em arem erem irem assem essem issem ado ido ando "
        "endo indo ara~o era~o ira~o ar er ir as adas idas ias arias "
        "erias irias arás aras erás eras irás avas es ardes erdes irdes "
        "ares eres ires asses esses isses astes estes istes is ais eis "
        "íeis aríeis eríeis iríeis áreis areis éreis ereis íreis ireis "
        "ásseis ésseis ísseis áveis ados idos ámos amos íamos aríamos "
        "eríamos iríamos áramos éramos íramos ávamos emos aremos eremos "
        "iremos ássemos êssemos íssemos imos armos ermos irmos eu iu ou "
        "ira iras"
    ).split(),
    key=len,
    reverse=True,
)

_STD = sorted(
    [(s, "r2_del") for s in _STD_R2]
    + [("logia", "log"), ("logias", "log")]
    + [("uça~o", "u"), ("uço~es", "u")]
    + [("ência", "ente"), ("ências", "ente")]
    + [("amente", "amente"), ("mente", "mente")]
    + [("idade", "idade"), ("idades", "idade")]
    + [(s, "ivo") for s in ("iva", "ivo", "ivas", "ivos")]
    + [("ira", "ira"), ("iras", "ira")],
    key=lambda kv: -len(kv[0]),
)


def _mark_regions(word: str) -> tuple[int, int, int]:
    n = len(word)
    pV = p1 = p2 = n
    if n > 1:
        if word[0] in _V:
            if word[1] not in _V:
                j = 2
                while j < n and word[j] not in _V:
                    j += 1
                if j < n:
                    pV = j + 1
            else:
                j = 2
                while j < n and word[j] in _V:
                    j += 1
                if j < n:
                    pV = j + 1
        else:
            if word[1] not in _V:
                j = 2
                while j < n and word[j] not in _V:
                    j += 1
                if j < n:
                    pV = j + 1
            elif n > 2:
                pV = 3

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
    return pV, p1, p2


def _standard_suffix(word: str, pV: int, p1: int, p2: int):
    """Returns (word, cursor) or None on failure."""
    n = len(word)

    def r2(cut):
        return cut >= p2

    for s, act in _STD:
        if not word.endswith(s):
            continue
        cut = n - len(s)
        if act == "r2_del":
            return (word[:cut], cut) if r2(cut) else None
        if act in ("log", "u", "ente"):
            return (word[:cut] + act, cut) if r2(cut) else None
        if act == "amente":
            if cut < p1:
                return None
            w = word[:cut]
            for t in ("iv", "os", "ic", "ad"):
                if w.endswith(t) and r2(len(w) - len(t)):
                    w = w[: len(w) - len(t)]
                    if t == "iv" and w.endswith("at") and r2(len(w) - 2):
                        w = w[:-2]
                    break
            return w, len(w)
        if act == "mente":
            if not r2(cut):
                return None
            w = word[:cut]
            for t in ("ante", "avel", "ível"):
                if w.endswith(t) and r2(len(w) - len(t)):
                    w = w[: len(w) - len(t)]
                    break
            return w, len(w)
        if act == "idade":
            if not r2(cut):
                return None
            w = word[:cut]
            for t in ("abil", "ic", "iv"):
                if w.endswith(t):
                    if r2(len(w) - len(t)):
                        w = w[: len(w) - len(t)]
                    break
            return w, len(w)
        if act == "ivo":
            if not r2(cut):
                return None
            w = word[:cut]
            if w.endswith("at") and r2(len(w) - 2):
                w = w[:-2]
            return w, len(w)
        # 'ira'/'iras': RV and preceded by 'e' → replace with 'ir'
        if cut >= pV and word[:cut].endswith("e"):
            return word[:cut] + "ir", cut
        return None
    return None


def _verb_suffix(word: str, pV: int):
    n = len(word)
    region = word[pV:] if pV < n else ""
    for s in _VERB:
        if region.endswith(s):
            cut = n - len(s)
            return word[:cut], cut
    return None


def stem_portuguese(word: str) -> str:
    word = word.replace("ã", "a~").replace("õ", "o~")
    pV, p1, p2 = _mark_regions(word)

    r = _standard_suffix(word, pV, p1, p2)
    if r is None:
        r = _verb_suffix(word, pV)
    if r is not None:
        word, _c = r
        # `and do ( ['i'] test 'c' RV delete )` — Snowball `and` restores
        # the cursor (as distance from the end) between its operands, so
        # this matches at the END of the current word
        n = len(word)
        if (
            word.endswith("i")
            and n >= 2
            and word[n - 2] == "c"
            and n - 1 >= pV
        ):
            word = word[: n - 1]
    else:
        # residual_suffix
        n = len(word)
        for s in ("os", "a", "i", "o", "á", "í", "ó"):
            if word.endswith(s):
                cut = n - len(s)
                if cut >= pV:
                    word = word[:cut]
                break

    # residual_form (starts at the end of the current word)
    n = len(word)
    if word.endswith(("e", "é", "ê")):
        cut = n - 1
        if cut >= pV:
            word = word[:cut]
            # [('u'] test 'g') or ('i'] test 'c') RV delete
            if (
                word.endswith("u")
                and len(word) >= 2
                and word[-2] == "g"
                and len(word) - 1 >= pV
            ):
                word = word[:-1]
            elif (
                word.endswith("i")
                and len(word) >= 2
                and word[-2] == "c"
                and len(word) - 1 >= pV
            ):
                word = word[:-1]
    elif word.endswith("ç"):
        word = word[:-1] + "c"

    return word.replace("a~", "ã").replace("o~", "õ")
