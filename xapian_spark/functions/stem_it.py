"""Snowball Italian stemmer — pure-Python port of
xapian-core/languages/algorithms/italian.sbl; golden-validated against
xapian-data/stemming/italian/ in tests/test_stemmer.py.

Cursor semantics per the Snowball runtime (utilities.cc): each backward
``do`` routine starts at the end of the current word; string modifications
inside a failed ``try`` persist (only the cursor is restored).
"""

from __future__ import annotations

_V = frozenset("aeiouàèìòù")
_AEIO = frozenset("aeioàèìò")

_ACCENTS = {"á": "à", "é": "è", "í": "ì", "ó": "ò", "ú": "ù"}

_PRONOUNS = sorted(
    (
        "ci gli la le li lo mi ne si ti vi "
        "sene gliela gliele glieli glielo gliene "
        "mela mele meli melo mene tela tele teli telo tene "
        "cela cele celi celo cene vela vele veli velo vene"
    ).split(),
    key=len,
    reverse=True,
)

_STD = sorted(
    (
        "anza anze ico ici ica ice iche ichi ismo ismi abile abili ibile "
        "ibili ista iste isti istà istè istì oso osi osa ose mente atrice "
        "atrici ante anti azione azioni atore atori logia logie uzione "
        "uzioni usione usioni enza enze amento amenti imento imenti amente "
        "ità ivo ivi iva ive"
    ).split(),
    key=len,
    reverse=True,
)

_VERB = sorted(
    (
        "ammo ando ano are arono asse assero assi assimo ata ate ati ato "
        "ava avamo avano avate avi avo emmo enda ende endi endo erà erai "
        "eranno ere erebbe erebbero erei eremmo eremo ereste eresti erete "
        "erò erono essero ete eva evamo evano evate evi evo Yamo iamo immo "
        "irà irai iranno ire irebbe irebbero irei iremmo iremo ireste "
        "iresti irete irò irono isca iscano isce isci isco iscono issero "
        "ita ite iti ito iva ivamo ivano ivate ivi ivo ono uta ute uti uto "
        "ar ir"
    ).split(),
    key=len,
    reverse=True,
)


def _prelude(word: str) -> str:
    out = []
    i = 0
    n = len(word)
    while i < n:
        c = word[i]
        if c in _ACCENTS:
            out.append(_ACCENTS[c])
            i += 1
        elif c == "q" and i + 1 < n and word[i + 1] == "u":
            out.append("qU")
            i += 2
        else:
            out.append(c)
            i += 1
    s = "".join(out)
    chars = list(s)
    n = len(chars)
    i = 0
    while i + 2 < n + 0:
        if (
            chars[i] in _V
            and chars[i + 1] in ("u", "i")
            and i + 2 < n
            and chars[i + 2] in _V
        ):
            chars[i + 1] = chars[i + 1].upper()
            i += 2
        else:
            i += 1
    return "".join(chars)


def _mark_regions(word: str) -> tuple[int, int, int]:
    n = len(word)
    pV = p1 = p2 = n
    # RV with the 'divan' exception, alternatives in .sbl order
    done = False
    if n > 1 and word[0] in _V:
        if word[1] not in _V:
            j = 2
            while j < n and word[j] not in _V:
                j += 1
            if j < n:
                pV = j + 1
                done = True
        else:
            j = 2
            while j < n and word[j] in _V:
                j += 1
            if j < n:
                pV = j + 1
                done = True
    if not done and word.startswith("divan"):
        pV = 5
        done = True
    if not done and n > 1 and word[0] not in _V:
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


def _attached_pronoun(word: str, pV: int) -> str:
    for p in _PRONOUNS:
        if word.endswith(p):
            cut = len(word) - len(p)
            head = word[:cut]
            for pre, action in (
                ("ando", "del"), ("endo", "del"),
                ("ar", "e"), ("er", "e"), ("ir", "e"),
            ):
                if head.endswith(pre) and cut - len(pre) >= pV:
                    if action == "del":
                        return head
                    return head + "e"
            break
    return word


def _standard_suffix(word: str, pV: int, p1: int, p2: int):
    """Returns new word or None when the routine fails."""
    n = len(word)

    def r2(cut):
        return cut >= p2

    for s in _STD:
        if not word.endswith(s):
            continue
        cut = n - len(s)
        if s in ("amento", "amenti", "imento", "imenti"):
            if cut < pV:
                return None
            return word[:cut]
        if s == "amente":
            if cut < p1:
                return None
            w = word[:cut]
            for t in ("abil", "os", "iv", "ic"):
                if w.endswith(t) and r2(len(w) - len(t)):
                    w = w[: len(w) - len(t)]
                    if t == "iv" and w.endswith("at") and r2(len(w) - 2):
                        w = w[:-2]
                    break
            return w
        if s in ("azione", "azioni", "atore", "atori"):
            if not r2(cut):
                return None
            w = word[:cut]
            if w.endswith("ic") and r2(len(w) - 2):
                w = w[:-2]
            return w
        if s in ("logia", "logie"):
            if not r2(cut):
                return None
            return word[:cut] + "log"
        if s in ("uzione", "uzioni", "usione", "usioni"):
            if not r2(cut):
                return None
            return word[:cut] + "u"
        if s in ("enza", "enze"):
            if not r2(cut):
                return None
            return word[:cut] + "ente"
        if s == "ità":
            if not r2(cut):
                return None
            w = word[:cut]
            for t in ("abil", "ic", "iv"):
                if w.endswith(t):
                    if r2(len(w) - len(t)):
                        w = w[: len(w) - len(t)]
                    break
            return w
        if s in ("ivo", "ivi", "iva", "ive"):
            if not r2(cut):
                return None
            w = word[:cut]
            if w.endswith("at") and r2(len(w) - 2):
                w = w[:-2]
                if w.endswith("ic") and r2(len(w) - 2):
                    w = w[:-2]
            return w
        # plain R2-delete group
        if not r2(cut):
            return None
        return word[:cut]
    return None


def _verb_suffix(word: str, pV: int) -> str:
    # setlimit tomark pV for ([substring] among(...)): the LIMIT constrains
    # the matching itself, so the among's longest match is the longest
    # suffix lying entirely within RV (an out-of-region longer suffix can't
    # shadow it — unlike condition-style R1/R2 checks).
    n = len(word)
    region = word[pV:] if pV < n else ""
    for s in _VERB:
        if region.endswith(s):
            return word[: n - len(s)]
    return word


def _vowel_suffix(word: str, pV: int) -> str:
    n = len(word)
    if n >= 1 and word[-1] in _AEIO and n - 1 >= pV:
        word = word[:-1]
        if word.endswith("i") and len(word) - 1 >= pV:
            word = word[:-1]
    n = len(word)
    # ['h'] CG RV delete — RV is tested AFTER the CG char is consumed, so
    # the cursor under test is n-2, not n-1
    if (
        n >= 2
        and word[-1] == "h"
        and word[-2] in "cg"
        and n - 2 >= pV
    ):
        word = word[:-1]
    return word


def stem_italian(word: str) -> str:
    word = _prelude(word)
    pV, p1, p2 = _mark_regions(word)
    word = _attached_pronoun(word, pV)
    r = _standard_suffix(word, pV, p1, p2)
    if r is not None:
        word = r
    else:
        word = _verb_suffix(word, pV)
    word = _vowel_suffix(word, pV)
    return word.replace("I", "i").replace("U", "u")
