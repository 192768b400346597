"""Snowball Tamil stemmer — pure-Python port of
xapian-core/languages/algorithms/tamil.sbl (Damodharan Rajalingam's affix
stripper).

CAVEAT: the reference ships NO golden vocabulary for Tamil
(xapian-data/stemming/tamil/ contains only COPYING), so unlike every other
stemmer in this package this port is reviewed against the .sbl but not
vocabulary-validated — treat outputs as best-effort.
"""

from __future__ import annotations

import re

_D = {
    "aytham": "ஃ", "a": "அ", "aa": "ஆ", "i": "இ", "ii": "ஈ",
    "u": "உ", "uu": "ஊ", "e": "எ", "ee": "ஏ", "ai": "ஐ",
    "o": "ஒ", "oo": "ஓ", "au": "ஔ",
    "ka": "க", "nga": "ங", "ca": "ச", "ja": "ஜ", "nya": "ஞ",
    "tta": "ட", "nna": "ண", "ta": "த", "tha": "த", "na": "ந",
    "nnna": "ன", "pa": "ப", "ma": "ம", "ya": "ய", "ra": "ர",
    "rra": "ற", "la": "ல", "lla": "ள", "llla": "ழ", "zha": "ழ",
    "va": "வ", "sha": "ஶ", "ssa": "ஷ", "sa": "ஸ", "ha": "ஹ",
    "vs_aa": "ா", "vs_i": "ி", "vs_ii": "ீ", "vs_u": "ு",
    "vs_uu": "ூ", "vs_e": "ெ", "vs_ee": "ே", "vs_ai": "ை",
    "vs_o": "ொ", "vs_oo": "ோ", "vs_au": "ௌ",
    "pulli": "்", "au_lmark": "ௗ",
}


def _x(p: str) -> str:
    return re.sub(r"\{(\w+)\}", lambda m: _D[m.group(1)], p)


_P = _D["pulli"]
_VS = tuple(_x(p) for p in (
    "{vs_aa}", "{vs_i}", "{vs_ii}", "{vs_e}", "{vs_ee}", "{vs_u}",
    "{vs_uu}", "{vs_ai}",
))
_INDEP_V = tuple(_D[k] for k in (
    "a", "aa", "i", "ii", "u", "uu", "e", "ee", "ai", "o", "oo", "au"))
_HARD = tuple(_D[k] for k in ("ka", "ca", "tta", "tha", "pa", "rra"))
_SOFT = tuple(_D[k] for k in (
    "ya", "ra", "la", "va", "zha", "lla", "nya", "nna", "na", "ma", "nnna"))
_PREFIX_C = tuple(_D[k] for k in (
    "ka", "ca", "tha", "va", "na", "pa", "ma", "ya", "nga", "nya"))

_VA_START = [
    (_x("{va}{vs_oo}"), _D["oo"]), (_x("{va}{vs_o}"), _D["o"]),
    (_x("{va}{vs_u}"), _D["u"]), (_x("{va}{vs_uu}"), _D["uu"]),
]


def _fix_va_start(w: str) -> str:
    for s, rep in _VA_START:
        if w.startswith(s):
            return rep + w[len(s):]
    return w


_FE_SIMPLE = sorted([
    (_x("{na}{pulli}{ta}{pulli}"), ("del",)),
    (_x("{na}{pulli}{ta}"), ("del",)),
    (_x("{na}{pulli}"), ("del",)),
    (_x("{ya}{pulli}"), ("ya",)),
    (_x("{tta}{pulli}{pa}{pulli}"), ("repl", _x("{lla}{pulli}"))),
    (_x("{tta}{pulli}{ka}{pulli}"), ("repl", _x("{lla}{pulli}"))),
    (_x("{nnna}{pulli}{rra}{pulli}"), ("repl", _x("{la}{pulli}"))),
    (_x("{rra}{pulli}{ka}{pulli}"), ("repl", _x("{la}{pulli}"))),
    (_x("{tta}{pulli}{tta}{pulli}"), ("repl", _x("{tta}{vs_u}"))),
    (_x("{ta}{pulli}{ta}{pulli}"), ("tata",)),
    (_x("{vs_u}{ka}{pulli}{ka}{pulli}"), ("repl", _P)),
    (_x("{vs_u}{ka}{pulli}"), ("repl", _P)),
    (_x("{va}{pulli}"), ("del",)),
    (_x("{va}"), ("del",)),
    (_x("{ya}"), ("del",)),
    (_x("{nnna}{vs_u}"), ("nnnu",)),
    (_x("{nga}{pulli}"), ("nga",)),
], key=lambda kv: -len(kv[0]))


def _fix_ending(w: str, vetrumai: bool):
    """One fix_ending pass; returns new word or None on failure."""
    if len(w) <= 3:
        return None
    n = len(w)
    for s, act in _FE_SIMPLE:
        if not w.endswith(s):
            continue
        cut = n - len(s)
        head = w[:cut]
        kind = act[0]
        if kind == "del":
            return head
        if kind == "repl":
            return head + act[1]
        if kind == "ya":
            if head.endswith((_x("{vs_ai}"), _x("{vs_i}"), _x("{vs_ii}"))):
                return head
            break  # among committed and failed → second alternative
        if kind == "tata":
            if vetrumai and not head.endswith(_x("{vs_ai}")):
                return head + _x("{ma}{pulli}")
            break
        if kind == "nnnu":
            if not head.endswith(_VS):
                return head
            break
        if kind == "nga":
            if head.endswith(_x("{vs_ai}")) or head.endswith(_P):
                return head
            return head + _x("{ma}{pulli}")
        break
    # second alternative: final pulli clusters
    if not w.endswith(_P):
        return None
    c = n - 1  # before the final pulli
    head = w[:c]
    # A: hard consonant (optionally another pulli+hard) — delete cluster
    if head.endswith(_HARD):
        b = c - 1
        if w[:b].endswith(_P) and w[: b - 1].endswith(_HARD):
            b = b - 2
        return w[:b]
    # B: soft consonant preceded by pulli — delete consonant+pulli
    if head.endswith(_SOFT):
        if w[: c - 1].endswith(_P):
            return w[: c - 1]
    # C: preceded by a vowel sign or pulli — delete just the final pulli
    if head.endswith(_VS) or head.endswith(_P):
        return head
    return None


def _fix_endings(w: str, vetrumai: bool) -> str:
    while True:
        r = _fix_ending(w, vetrumai)
        if r is None:
            return w
        w = r


_PLURAL = sorted([
    (_x("{vs_u}{nga}{pulli}{ka}{lla}{pulli}"), "ung"),
    (_x("{rra}{pulli}{ka}{lla}{pulli}"), _x("{la}{pulli}")),
    (_x("{tta}{pulli}{ka}{lla}{pulli}"), _x("{lla}{pulli}")),
    (_x("{ka}{lla}{pulli}"), ""),
], key=lambda kv: -len(kv[0]))

_COMMON_P = sorted([_x(p) for p in (
    "{vs_u}{tta}{nnna}{pulli} {vs_i}{la}{pulli}{la}{vs_ai} "
    "{vs_i}{tta}{ma}{pulli} {vs_i}{nnna}{pulli}{rra}{vs_i} "
    "{vs_aa}{ka}{vs_i} {vs_aa}{ka}{vs_i}{ya} "
    "{vs_e}{nnna}{pulli}{rra}{vs_u} {vs_u}{lla}{pulli}{lla} "
    "{vs_u}{tta}{vs_ai}{ya} {vs_u}{tta}{vs_ai} "
    "{vs_e}{nnna}{vs_u}{ma}{pulli} {vs_e}{nnna}"
).split()], key=len, reverse=True)
_COMMON_LLA = _x("{la}{pulli}{la}")
_COMMON_DEL = sorted([_x(p) for p in (
    "{pa}{tta}{vs_u} {pa}{tta}{pulli}{tta} {pa}{tta}{pulli}{tta}{vs_u} "
    "{pa}{tta}{pulli}{tta}{ta}{vs_u} {pa}{tta}{pulli}{tta}{nna} "
    "{ka}{vs_u}{ra}{vs_i}{ya} {pa}{rra}{pulli}{rra}{vs_i} "
    "{va}{vs_i}{tta}{vs_u} {va}{vs_i}{tta}{pulli}{tta}{vs_u} "
    "{pa}{tta}{vs_i}{ta}{vs_aa}{nnna} {pa}{tta}{vs_i} {ta}{vs_aa}{nnna} "
    "{vs_e}{la}{pulli}{la}{vs_aa}{ma}{pulli}"
).split()], key=len, reverse=True)

_VETRU_DEL1 = _x("{nnna}{vs_ai}")
_VETRU_P = sorted([_x(p) for p in (
    "{vs_o}{tta}{vs_u} {vs_oo}{tta}{vs_u} {vs_i}{la}{pulli} "
    "{vs_i}{rra}{pulli} {vs_i}{nnna}{pulli}{rra}{vs_u} "
    "{vs_i}{ra}{vs_u}{na}{pulli}{ta}{vs_u} {va}{vs_i}{tta} "
    "{vs_aa}{la}{pulli} {vs_u}{tta}{vs_ai} {vs_aa}{ma}{la}{pulli} "
    "{vs_u}{lla}{pulli}"
).split()], key=len, reverse=True)
_VETRU_INN = _x("{vs_i}{nnna}{pulli}")
_VETRU_ITAM = _x("{vs_i}{tta}{ma}{pulli}")
_VETRU_LP = _x("{la}{pulli}")
_VETRU_DEL2 = sorted([_x(p) for p in (
    "{ka}{nna}{pulli} {ma}{vs_u}{nnna}{pulli} {ma}{vs_ee}{la}{pulli} "
    "{ma}{vs_ee}{rra}{pulli} {ka}{vs_ii}{llla}{pulli}"
).split()], key=len, reverse=True)
_VETRU_TU = _x("{ta}{vs_u}")
_VETRU_II = _x("{vs_ii}")

_TENSE_DEL = sorted([_x(p) for p in (
    "{ka}{vs_o}{nna}{pulli}{tta}{vs_i}{ra}{pulli} {pa}{tta}{vs_u} "
    "{ma}{vs_aa}{ra}{pulli} {ma}{vs_i}{nnna}{pulli} {nnna}{nnna}{pulli} "
    "{nnna}{vs_aa}{nnna}{pulli} {nnna}{vs_aa}{lla}{pulli} "
    "{nnna}{vs_aa}{ra}{pulli} {nnna}{lla}{pulli} {va}{lla}{pulli} "
    "{nnna}{ra}{pulli} {va}{ra}{pulli} {nnna} {pa} {ka} {ta} {ya} "
    "{pa}{nnna}{pulli} {pa}{lla}{pulli} {pa}{ra}{pulli} "
    "{vs_i}{rra}{pulli}{rra}{vs_u} {pa}{ma}{pulli} {nnna}{ma}{pulli} "
    "{ta}{vs_u}{ma}{pulli} {rra}{vs_u}{ma}{pulli} {ka}{vs_u}{ma}{pulli} "
    "{nnna}{vs_e}{nnna}{pulli} {nnna}{vs_ai} {va}{vs_ai}"
).split()], key=len, reverse=True)
_TENSE_VAN = _x("{va}{nnna}{pulli}")
_TENSE_AAN = _x("{vs_aa}{nnna}{pulli}")
_TENSE_P = sorted([_x(p) for p in (
    "{vs_aa}{lla}{pulli} {vs_aa}{ra}{pulli} {vs_ee}{nnna}{pulli} {vs_aa} "
    "{vs_aa}{ma}{pulli} {vs_e}{ma}{pulli} {vs_ee}{ma}{pulli} "
    "{vs_oo}{ma}{pulli} {tta}{vs_u}{ma}{pulli} {vs_aa}{ya}{pulli} "
    "{nnna}{vs_i}{ra}{pulli} {vs_ii}{ra}{pulli} {vs_ii}{ya}{ra}{pulli}"
).split()], key=len, reverse=True)
_TENSE_KU = _x("{ka}{vs_u}")
_TENSE_KINRA = sorted([_x(p) for p in (
    "{vs_aa}{na}{vs_i}{nnna}{pulli}{rra} "
    "{vs_aa}{na}{vs_i}{nnna}{pulli}{rra}{pulli} "
    "{ka}{vs_i}{nnna}{pulli}{rra} {ka}{vs_i}{nnna}{pulli}{rra}{pulli} "
    "{ka}{vs_i}{rra} {ka}{vs_i}{rra}{pulli}"
).split()], key=len, reverse=True)

# combined longest-match table for the big tense among
_TENSE_ALL = sorted(
    [(s, "del") for s in _TENSE_DEL]
    + [(_TENSE_VAN, "van"), (_VETRU_TU, "tu"),
       (_TENSE_AAN, "aan"), (_TENSE_KU, "ku")]
    + [(s, "p") for s in _TENSE_P],
    key=lambda kv: -len(kv[0]),
)


def _plural(w: str) -> str:
    n = len(w)
    for s, rep in _PLURAL:
        if w.endswith(s):
            head = w[: n - len(s)]
            if rep == "ung":
                if head.endswith(_HARD):
                    return head + _x("{vs_u}{nga}{pulli}")
                return head + _P
            return head + rep
    return w


def _common_word_endings(w: str, vetrumai: bool) -> str:
    n = len(w)
    changed = False
    for s in sorted(_COMMON_P + [_COMMON_LLA] + _COMMON_DEL,
                    key=len, reverse=True):
        if w.endswith(s):
            head = w[: n - len(s)]
            if s == _COMMON_LLA:
                if not head.endswith(_VS):
                    w = head + _P
                    changed = True
            elif s in _COMMON_DEL:
                w = head
                changed = True
            else:
                w = head + _P
                changed = True
            break
    if changed:
        w = _fix_endings(w, vetrumai)
    return w


def _vetrumai_urupukal(w: str):
    """Returns (word, flag_set)."""
    if len(w) <= 4:
        return w, False
    n = len(w)
    table = sorted(
        [(_VETRU_DEL1, "del")]
        + [(s, "p") for s in _VETRU_P]
        + [(_VETRU_INN, "inn"), (_VETRU_ITAM, "itam"), (_VETRU_LP, "lp")]
        + [(s, "del") for s in _VETRU_DEL2]
        + [(_VETRU_TU, "tu"), (_VETRU_II, "ii")],
        key=lambda kv: -len(kv[0]),
    )
    done = False
    for s, act in table:
        if not w.endswith(s):
            continue
        head = w[: n - len(s)]
        if act == "del":
            w = head
            done = True
        elif act == "p":
            w = head + _P
            done = True
        elif act == "inn":
            if not head.endswith(_D["ma"]):
                w = head + _P
                done = True
        elif act == "itam":
            if n >= 7:
                w = head + _P
                done = True
        elif act == "lp":
            if not head.endswith(_VS):
                w = head + _P
                done = True
        elif act == "tu":
            if not head.endswith(_VS):
                w = head
                done = True
        else:  # 'ii'
            w = head + _x("{vs_i}")
            done = True
        break
    if not done:
        # second test: final vs_ai
        if w.endswith(_x("{vs_ai}")):
            head = w[: n - 1]
            ok = not head.endswith(_HARD)
            if not ok and head.endswith(_HARD):
                # hard consonant preceded by pulli
                for hc in _HARD:
                    if head.endswith(hc) and head[: -len(hc)].endswith(_P):
                        ok = True
                        break
            if ok:
                w = head + _P
                done = True
    if not done:
        return w, False
    # do ( [ vs_i nnna pulli ] <- pulli )
    if w.endswith(_VETRU_INN):
        w = w[: len(w) - len(_VETRU_INN)] + _P
    w = _fix_endings(w, True)
    return w, True


def _tense_suffix(w: str, vetrumai: bool):
    """One remove_tense_suffix pass; returns (word, matched)."""
    if len(w) <= 4:
        return w, False
    found = False
    n = len(w)
    for s, act in _TENSE_ALL:
        if not w.endswith(s):
            continue
        head = w[: n - len(s)]
        if act == "del":
            w = head
            found = True
        elif act == "van":
            if not head.endswith(_INDEP_V):
                w = head
                found = True
        elif act == "tu":
            if not head.endswith(_VS):
                w = head
                found = True
        elif act == "aan":
            if not head.endswith(_D["ca"]):
                w = head + _P
                found = True
        elif act == "p":
            w = head + _P
            found = True
        else:  # 'ku'
            if head.endswith(_P):
                w = head
                found = True
        break
    # second do: kinra forms at the (possibly new) end
    n2 = len(w)
    for s in _TENSE_KINRA:
        if w.endswith(s):
            w = w[: n2 - len(s)]
            found = True
            break
    w = _fix_endings(w, vetrumai)
    return w, found


def stem_tamil(word: str) -> str:
    vetrumai = False
    r = _fix_ending(word, vetrumai)
    if r is not None:
        word = r
    if len(word) <= 4:
        return word
    # question prefixes: e + C + pulli
    if (
        len(word) >= 3
        and word[0] == _D["e"]
        and word[1] in _PREFIX_C
        and word[2] == _P
    ):
        word = _fix_va_start(word[3:])
    # pronoun prefixes: (a|i|u) + C + pulli
    if (
        len(word) >= 3
        and word[0] in (_D["a"], _D["i"], _D["u"])
        and word[1] in _PREFIX_C
        and word[2] == _P
    ):
        word = _fix_va_start(word[3:])
    # question suffixes
    if len(word) > 4:
        for s in (_x("{vs_oo}"), _x("{vs_ee}"), _x("{vs_aa}")):
            if word.endswith(s):
                word = word[:-1] + _P
                break
        word = _fix_endings(word, vetrumai)
    # um
    if len(word) > 4 and word.endswith(_x("{vs_u}{ma}{pulli}")):
        word = word[:-3] + _P
        r = _fix_ending(word, vetrumai)
        if r is not None:
            word = r
    # common word endings
    if len(word) > 4:
        word = _common_word_endings(word, vetrumai)
    # vetrumai urupukal
    word, flag = _vetrumai_urupukal(word)
    vetrumai = vetrumai or flag
    # plural
    word = _plural(word)
    # command suffixes
    if len(word) > 4:
        for s in (_x("{pa}{vs_i}"), _x("{va}{vs_i}")):
            if word.endswith(s):
                word = word[: len(word) - len(s)]
                break
    # tense suffixes (repeat)
    while True:
        word, matched = _tense_suffix(word, vetrumai)
        if not matched:
            break
    return word
