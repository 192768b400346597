"""Snowball Polish stemmer — pure-Python port of
xapian-core/languages/algorithms/polish.sbl (author Dmitry Shachnev);
golden-validated against xapian-data/stemming/polish/.

``backwards`` after ``hop 2`` pins the backward limit at position 2, so no
ending removal may leave fewer than two characters; the noun endings carry
R1 as an among FUNCTION (backtracks to shorter entries on failure).
"""

from __future__ import annotations

_V = frozenset("aąeęioóuy")

_COND = ("byście", "byśmy", "byś", "bym", "by")

_VERB_DEL = (
    "asz esz isz amy emy imy acie ecie icie ają eść aść ać ieć ić ąć "
    "ając ąc ałem iałem iłem ałam iałam iłam am ałeś iałeś iłeś "
    "ałaś iałaś iłaś ał iał ił ała iała iła ało iało iło "
    "aliśmy ieliśmy iliśmy ałyśmy iałyśmy iłyśmy "
    "aliście ieliście iliście ałyście iałyście iłyście "
    "ali ieli ili ały iały iły aj ajcie cie ę"
).split()
_L_GROUP = "łeś łaś liśmy łyśmy liście łyście".split()
_ADJ = "y ego iego emu iemu ym im ej iej ych ich ymi imi".split()
_PART_DEL = (
    "ająca ąca iejsza sza ającą ącą iejszą ające ące iejsze sze"
).split()
_SZ_S = "sząca szącą szące".split()
_NOUN_R1 = (
    "a o i u ia owi iowi ą ią em iem e iu ie ów om iom ami iami ach iach"
).split()

# (suffix, kind); kinds: del, sze(->s), sza(R1 del or ->s), l(->ł),
# adj(del+inner), part_del, sz_s(->s), noun(R1 function, backtracks)
_MAIN = sorted(
    [(s, "del") for s in _VERB_DEL]
    + [("szę", "sze")]
    + [("szą", "sza")]
    + [(s, "l") for s in _L_GROUP]
    + [(s, "adj") for s in _ADJ]
    + [(s, "part_del") for s in _PART_DEL]
    + [(s, "sz_s") for s in _SZ_S]
    + [(s, "noun") for s in _NOUN_R1],
    key=lambda kv: -len(kv[0]),
)

_INNER = sorted(
    [("iejsz", "del"), ("ając", "del"), ("sząc", "s"), ("ąc", "del"),
     ("sz", "del")],
    key=lambda kv: -len(kv[0]),
)

_NORM = {"ć": "c", "ń": "n", "ś": "s", "ź": "z"}


def _mark_p1(word: str) -> int:
    n = len(word)
    i = 0
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


def _remove_endings(word: str, p1: int):
    """Backward limit 2.  Returns (word, ok) — the conditional-suffix strip
    persists even when the main among fails (string changes survive routine
    failure in Snowball)."""
    lb = 2
    # conditionals, limited additionally to p1
    n = len(word)
    for s in _COND:
        if word.endswith(s) and n - len(s) >= max(p1, lb):
            word = word[: n - len(s)]
            break
    n = len(word)
    for s, kind in _MAIN:
        if not word.endswith(s):
            continue
        cut = n - len(s)
        if cut < lb:
            continue  # the limit blocks this entry; a shorter one may fit
        if kind == "del":
            return word[:cut], True
        if kind == "sze":
            return word[:cut] + "s", True
        if kind == "sza":
            if cut >= p1:
                return word[:cut], True
            return word[:cut] + "s", True
        if kind == "l":
            return word[:cut] + "ł", True
        if kind == "adj":
            w = word[:cut]
            m = len(w)
            for t, act in _INNER:
                if w.endswith(t) and m - len(t) >= lb:
                    if act == "del":
                        w = w[: m - len(t)]
                    else:
                        w = w[: m - len(t)] + "s"
                    break
            return w, True
        if kind == "part_del":
            return word[:cut], True
        if kind == "sz_s":
            return word[:cut] + "s", True
        # noun: R1 among-function — backtrack on failure
        if cut >= p1:
            return word[:cut], True
        continue
    return word, False


def stem_polish(word: str) -> str:
    p1 = _mark_p1(word)
    if len(word) >= 2:
        word, ok = _remove_endings(word, p1)
        if ok:
            return word
    # normalize_consonant ([substring] not atlimit) — runs on the possibly
    # conditional-stripped word
    if len(word) >= 2 and word[-1] in _NORM:
        return word[:-1] + _NORM[word[-1]]
    return word
