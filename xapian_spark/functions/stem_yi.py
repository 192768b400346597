"""Snowball Yiddish stemmer — pure-Python port of
xapian-core/languages/algorithms/yiddish.sbl (Assaf Urieli's YIVO-script
stemmer); golden-validated against xapian-data/stemming/yiddish/.

mark_regions rewrites the גע/צו verbal prefixes to ASCII 'GE'/'TSU'
markers (removed again at the end of standard_suffix), exactly like the
reference.
"""

from __future__ import annotations

import re

_H = {
    "Alef": "א", "Beys": "ב", "Giml": "ג", "Dalet": "ד", "Hey": "ה",
    "Vov": "ו", "Zayen": "ז", "Khes": "ח", "Tes": "ט", "Yud": "י",
    "LangerKhof": "ך", "Khof": "כ", "Lamed": "ל", "ShlosMem": "ם",
    "Mem": "מ", "LangerNun": "ן", "Nun": "נ", "Samekh": "ס",
    "Ayen": "ע", "LangerFey": "ף", "Fey": "פ", "LangerTsadek": "ץ",
    "Tsadek": "צ", "Kuf": "ק", "Reysh": "ר", "Shin": "ש", "Sof": "ת",
    "TsveyVovn": "װ", "VovYud": "ױ", "TsveyYudn": "ײ",
    "Shvo": "ְ", "Khirik": "ִ", "Tseyre": "ֵ",
    "Segl": "ֶ", "ReducedSegl": "ֱ", "Pasekh": "ַ",
    "ReducedPasekh": "ֲ", "Komets": "ָ",
    "ReducedKomets": "ֳ", "Rafe": "ֿ", "SinDot": "ׂ",
    "ShinDot": "ׁ", "Khoylm": "ֹ", "Melupm": "ּ",
    "Kubuts": "ֻ",
}


def _x(p: str) -> str:
    return re.sub(r"\{(\w+)\}", lambda m: _H[m.group(1)], p)


_NIKED = frozenset(_x(
    "{Shvo}{Khirik}{Tseyre}{Segl}{ReducedSegl}{Pasekh}{ReducedPasekh}"
    "{Komets}{ReducedKomets}{SinDot}{ShinDot}{Khoylm}{Melupm}{Kubuts}{Rafe}"
))
_VOWEL = frozenset(_x("{Alef}{Vov}{Yud}{Ayen}{VovYud}{TsveyYudn}"))
_ALEFBEYS = frozenset(_x(
    "{Alef}{Beys}{Giml}{Dalet}{Hey}{Vov}{Zayen}{Khes}{Tes}{Yud}"
    "{LangerKhof}{Khof}{Lamed}{ShlosMem}{Mem}{LangerNun}{Nun}{Samekh}"
    "{Ayen}{LangerFey}{Fey}{LangerTsadek}{Tsadek}{Kuf}{Reysh}{Shin}{Sof}"
    "{TsveyVovn}{VovYud}{TsveyYudn}"
))
_CONSONANT = _ALEFBEYS - _VOWEL


def _prelude(w: str) -> str:
    out = []
    i = 0
    n = len(w)
    while i < n:
        two = w[i : i + 2]
        c = w[i]
        if two == _x("{Vov}{Vov}") and w[i + 2 : i + 3] != _H["Melupm"]:
            out.append(_H["TsveyVovn"])
            i += 2
        elif two == _x("{Vov}{Yud}") and w[i + 2 : i + 3] != _H["Khirik"]:
            out.append(_H["VovYud"])
            i += 2
        elif two == _x("{Yud}{Yud}") and w[i + 2 : i + 3] != _H["Khirik"]:
            out.append(_H["TsveyYudn"])
            i += 2
        elif c == _H["LangerKhof"]:
            out.append(_H["Khof"])
            i += 1
        elif c == _H["ShlosMem"]:
            out.append(_H["Mem"])
            i += 1
        elif c == _H["LangerNun"]:
            out.append(_H["Nun"])
            i += 1
        elif c == _H["LangerFey"]:
            out.append(_H["Fey"])
            i += 1
        elif c == _H["LangerTsadek"]:
            out.append(_H["Tsadek"])
            i += 1
        else:
            out.append(c)
            i += 1
    return "".join(ch for ch in out if ch not in _NIKED)


_PREFIXES = sorted([_x(p) for p in (
    "{Alef}{Dalet}{Vov}{Reysh}{Khof} {Dalet}{Vov}{Reysh}{Khof} "
    "{Alef}{Hey}{Yud}{Nun} {Alef}{Hey}{Ayen}{Reysh} "
    "{Alef}{TsveyVovn}{Ayen}{Kuf} {Mem}{Yud}{Tes} "
    "{Alef}{Nun}{Tes}{Kuf}{Ayen}{Giml}{Nun} {Alef}{Kuf}{Ayen}{Giml}{Nun} "
    "{Alef}{Nun}{Yud}{Dalet}{Ayen}{Reysh} {Alef}{Reysh}{Alef}{Fey} "
    "{Alef}{Reysh}{VovYud}{Samekh} {Alef}{Reysh}{VovYud}{Fey} "
    "{Alef}{Reysh}{Vov}{Mem} {Alef}{Reysh}{TsveyYudn}{Nun} "
    "{Alef}{Reysh}{Vov}{Nun}{Tes}{Ayen}{Reysh} "
    "{Alef}{Reysh}{Yud}{Beys}{Ayen}{Reysh} {Nun}{Alef}{Khof} "
    "{Fey}{Alef}{Reysh}{Beys}{TsveyYudn} {Alef}{Hey}{TsveyYudn}{Mem} "
    "{Alef}{Fey}{Yud}{Reysh} {Fey}{Alef}{Reysh}{VovYud}{Samekh} "
    "{Fey}{Vov}{Nun}{Alef}{Nun}{Dalet}{Ayen}{Reysh} "
    "{Tsadek}{Vov}{Zayen}{Alef}{Mem}{Ayen}{Nun} "
    "{Tsadek}{Vov}{Nun}{VovYud}{Fey} {Tsadek}{Vov}{Reysh}{Yud}{Kuf} "
    "{Alef}{VovYud}{Samekh} {Alef}{VovYud}{Fey} {Alef}{Vov}{Mem} "
    "{Alef}{Vov}{Nun}{Tes}{Ayen}{Reysh} {Alef}{Yud}{Beys}{Ayen}{Reysh} "
    "{Alef}{TsveyYudn}{Nun} {Alef}{Nun} {Alef}{Fey} {Beys}{TsveyYudn} "
    "{Fey}{Alef}{Reysh} {Tsadek}{Vov} {Alef}{Nun}{Tes} {Beys}{Alef} "
    "{Dalet}{Ayen}{Reysh} {Tsadek}{Ayen}"
).split()], key=len, reverse=True)

_CLUSTERS = [_x(p) for p in (
    "{Shin}{Fey}{Reysh} {Shin}{Tes}{Reysh} {Shin}{Tes}{Shin} "
    "{Dalet}{Zayen}{Shin}"
).split()]

_GE = _x("{Giml}{Ayen}")
_TSU = _x("{Tsadek}{Vov}")
_ATLIMIT3 = tuple(_x(p) for p in (
    "{Tsadek}{Vov}{Giml}{Nun}", "{Tsadek}{Vov}{Kuf}{Tes}",
    "{Tsadek}{Vov}{Kuf}{Nun}",
))
_GEBN = _x("{Giml}{Ayen}{Beys}{Nun}")


def _mark_regions(w: str):
    """Returns (word-with-markers, p1)."""
    c = 0
    if w.startswith(_GE):
        rest = w[2:]
        if rest and not rest.startswith((_x("{Lamed}{Tes}"), _x("{Beys}{Nun}"))):
            w = "GE" + rest
            c = 2
    for p in _PREFIXES:
        if w[c:].startswith(p):
            c2 = c + len(p)
            rest = w[c2:]
            if rest in _ATLIMIT3:
                c = c2
            elif rest.startswith(_GEBN):
                c = c2
            elif rest.startswith(_GE):
                # slice_from leaves the cursor after the replacement
                w = w[:c2] + "GE" + w[c2 + 2 :]
                c = c2 + 2
            elif rest.startswith(_TSU):
                w = w[:c2] + "TSU" + w[c2 + 2 :]
                c = c2 + 3
            # else: try fails, cursor restored
            break
    if len(w) < c + 3:
        # test(hop 3) fails → the whole mark_regions sequence aborts with
        # p1 still at the limit
        return w, len(w)
    x = c + 3
    for cl in _CLUSTERS:
        if w[c:].startswith(cl):
            c += len(cl)
            break
    n = len(w)
    p1 = n
    if (
        c + 3 <= n
        and all(ch in _CONSONANT for ch in w[c : c + 3])
    ):
        p1 = c + 3
    else:
        i = c
        while i < n and w[i] not in _VOWEL:
            i += 1
        if i < n:
            i += 1  # past the vowel
            j = i
            while j < n and w[j] in _VOWEL:
                j += 1
            if j < n:
                p1 = j
            # goto non-vowel fails at end → p1 stays limit
    if p1 < x:
        p1 = x
    return w, p1


_RESPELL = sorted([
    (_x(a), _x(b)) for a, b in [
        ("{Giml}{Alef}{Nun}{Giml}", "{Giml}{TsveyYudn}"),
        ("{Nun}{Vov}{Mem}", "{Nun}{Ayen}{Mem}"),
        ("{Mem}{Yud}{Tes}", "{Mem}{TsveyYudn}{Dalet}"),
        ("{Beys}{Yud}{Tes}", "{Beys}{TsveyYudn}{Tes}"),
        ("{Beys}{Yud}{Samekh}", "{Beys}{TsveyYudn}{Samekh}"),
        ("{TsveyVovn}{Yud}{Zayen}", "{TsveyVovn}{TsveyYudn}{Zayen}"),
        ("{Tes}{Reysh}{Yud}{Beys}", "{Tes}{Reysh}{TsveyYudn}{Beys}"),
        ("{Lamed}{Yud}{Tes}", "{Lamed}{TsveyYudn}{Tes}"),
        ("{Kuf}{Lamed}{Yud}{Beys}", "{Kuf}{Lamed}{TsveyYudn}{Beys}"),
        ("{Reysh}{Yud}{Beys}", "{Reysh}{TsveyYudn}{Beys}"),
        ("{Reysh}{Yud}{Samekh}", "{Reysh}{TsveyYudn}{Samekh}"),
        ("{Shin}{TsveyVovn}{Yud}{Giml}", "{Shin}{TsveyVovn}{TsveyYudn}{Giml}"),
        ("{Shin}{Mem}{Yud}{Samekh}", "{Shin}{Mem}{TsveyYudn}{Samekh}"),
        ("{Shin}{Nun}{Yud}{Tes}", "{Shin}{Nun}{TsveyYudn}{Dalet}"),
        ("{Shin}{Reysh}{Yud}{Beys}", "{Shin}{Reysh}{TsveyYudn}{Beys}"),
        ("{Beys}{Vov}{Nun}{Dalet}", "{Beys}{Yud}{Nun}{Dalet}"),
        ("{TsveyVovn}{Vov}{Tes}{Shin}", "{TsveyVovn}{Yud}{Tes}{Shin}"),
        ("{Zayen}{Vov}{Nun}{Giml}", "{Zayen}{Yud}{Nun}{Giml}"),
        ("{Tes}{Reysh}{Vov}{Nun}{Kuf}", "{Tes}{Reysh}{Yud}{Nun}{Kuf}"),
        ("{Tsadek}{TsveyVovn}{Vov}{Nun}{Giml}", "{Tsadek}{TsveyVovn}{Yud}{Nun}{Giml}"),
        ("{Shin}{Lamed}{Vov}{Nun}{Giml}", "{Shin}{Lamed}{Yud}{Nun}{Giml}"),
        ("{Beys}{VovYud}{Giml}", "{Beys}{TsveyYudn}{Giml}"),
        ("{Hey}{VovYud}{Beys}", "{Hey}{TsveyYudn}{Beys}"),
        ("{Fey}{Alef}{Reysh}{Lamed}{VovYud}{Reysh}", "{Fey}{Alef}{Reysh}{Lamed}{Yud}{Reysh}"),
        ("{Shin}{Tes}{Alef}{Nun}", "{Shin}{Tes}{TsveyYudn}"),
        ("{Shin}{TsveyVovn}{VovYud}{Reysh}", "{Shin}{TsveyVovn}{Ayen}{Reysh}"),
    ]
], key=lambda kv: -len(kv[0]))

# big block-1 among (suffix, action)
_B1 = []
for _s in (
    "{Ayen}{Reysh}{Samekh} {Ayen}{Nun} {Nun}{Samekh} "
    "{Ayen}{Nun}{Ayen}{Reysh}{Samekh} {Ayen}{Samekh} {Ayen} {Nun} "
    "{Samekh} {Ayen}{Mem} {Ayen}{Reysh}"
).split():
    _B1.append((_x(_s), ("r1_del",)))
_B1.append((_x("{Yud}{Ayen}"), ("noop",)))
_B1.append((_x("{Yud}{Ayen}{Samekh}"), ("r1_repl", _x("{Yud}{Ayen}"))))
for _s in (
    "{Ayen}{Nun}{Ayen} {Ayen}{Nun}{Ayen}{Mem} {Ayen}{Nun}{Ayen}{Reysh} "
    "{Ayen}{Nun}{Samekh}"
).split():
    _B1.append((_x(_s), ("ene",)))
_B1.append((_x("{Tes}"), ("r1_del",)))
for _s in (
    "{Tes}{Nun} {Tes}{Ayen} {Tes}{Ayen}{Reysh} {Tes}{Samekh} "
    "{Tes}{Nun}{Samekh} {Tes}{Ayen}{Nun}{Ayen} {Tes}{Ayen}{Nun}{Ayen}{Mem} "
    "{Tes}{Ayen}{Nun}{Ayen}{Reysh}"
).split():
    _B1.append((_x(_s), ("tes_group",)))
for _s in (
    "{Ayen}{Tes} {Ayen}{Tes}{Nun} {Ayen}{Tes}{Samekh} {Ayen}{Tes}{Ayen} "
    "{Ayen}{Tes}{Ayen}{Reysh}"
).split():
    _B1.append((_x(_s), ("r1_del",)))
_B1.append((_x("{Giml}{TsveyYudn}{Nun}"), ("repl", _x("{Giml}{TsveyYudn}"))))
_B1.append((_x("{Giml}{Alef}{Nun}{Giml}{Ayen}{Nun}"), ("repl", _x("{Giml}{TsveyYudn}"))))
_B1.append((_x("{Nun}{Vov}{Mem}{Ayen}{Nun}"), ("repl", _x("{Nun}{Ayen}{Mem}"))))
_B1.append((_x("{Shin}{Reysh}{Yud}{Beys}{Nun}"), ("repl", _x("{Shin}{Reysh}{TsveyYudn}{Beys}"))))
_B1.append(("GE" + _x("{Mem}{Yud}{Tes}{Nun}"), ("repl", _x("{Mem}{TsveyYudn}{Dalet}"))))
_B1.append(("GE" + _x("{Beys}{Yud}{Tes}{Nun}"), ("repl", _x("{Beys}{TsveyYudn}{Tes}"))))
_B1.append(("GE" + _x("{Beys}{Yud}{Samekh}{Nun}"), ("repl", _x("{Beys}{TsveyYudn}{Samekh}"))))
_B1.append((_x("{TsveyVovn}{Yud}{Zayen}{Nun}"), ("repl", _x("{TsveyVovn}{TsveyYudn}{Zayen}"))))
_B1.append((_x("{Tes}{Reysh}{Yud}{Beys}{Nun}"), ("repl", _x("{Tes}{Reysh}{TsveyYudn}{Beys}"))))
_B1.append(("GE" + _x("{Lamed}{Yud}{Tes}{Nun}"), ("repl", _x("{Lamed}{TsveyYudn}{Tes}"))))
_B1.append((_x("{Kuf}{Lamed}{Yud}{Beys}{Nun}"), ("repl", _x("{Kuf}{Lamed}{TsveyYudn}{Beys}"))))
_B1.append((_x("{Reysh}{Yud}{Beys}{Nun}"), ("repl", _x("{Reysh}{TsveyYudn}{Beys}"))))
_B1.append(("GE" + _x("{Reysh}{Yud}{Samekh}{Nun}"), ("repl", _x("{Reysh}{TsveyYudn}{Samekh}"))))
_B1.append((_x("{Shin}{TsveyVovn}{Yud}{Giml}{Nun}"), ("repl", _x("{Shin}{TsveyVovn}{TsveyYudn}{Giml}"))))
_B1.append((_x("{Shin}{Mem}{Yud}{Samekh}{Nun}"), ("repl", _x("{Shin}{Mem}{TsveyYudn}{Samekh}"))))
_B1.append((_x("{Shin}{Nun}{Yud}{Tes}{Nun}"), ("repl", _x("{Shin}{Nun}{TsveyYudn}{Dalet}"))))
_B1.append((_x("{Beys}{Vov}{Nun}{Dalet}{Nun}"), ("repl", _x("{Beys}{Yud}{Nun}{Dalet}"))))
_B1.append((_x("{TsveyVovn}{Vov}{Tes}{Shin}{Nun}"), ("repl", _x("{TsveyVovn}{Yud}{Tes}{Shin}"))))
_B1.append((_x("{Zayen}{Vov}{Nun}{Giml}{Nun}"), ("repl", _x("{Zayen}{Yud}{Nun}{Giml}"))))
_B1.append((_x("{Tes}{Reysh}{Vov}{Nun}{Kuf}{Nun}"), ("repl", _x("{Tes}{Reysh}{Yud}{Nun}{Kuf}"))))
_B1.append((_x("{Tsadek}{TsveyVovn}{Vov}{Nun}{Giml}{Nun}"), ("repl", _x("{Tsadek}{TsveyVovn}{Yud}{Nun}{Giml}"))))
_B1.append((_x("{Shin}{Lamed}{Vov}{Nun}{Giml}{Nun}"), ("repl", _x("{Shin}{Lamed}{Yud}{Nun}{Giml}"))))
_B1.append((_x("{Beys}{VovYud}{Giml}{Nun}"), ("repl", _x("{Beys}{TsveyYudn}{Giml}"))))
_B1.append((_x("{Hey}{VovYud}{Beys}{Nun}"), ("repl", _x("{Hey}{TsveyYudn}{Beys}"))))
_B1.append((_x("{Fey}{Alef}{Reysh}{Lamed}{VovYud}{Reysh}{Nun}"), ("repl", _x("{Fey}{Alef}{Reysh}{Lamed}{Yud}{Reysh}"))))
_B1.append((_x("{Shin}{Tes}{Alef}{Nun}{Ayen}{Nun}"), ("repl", _x("{Shin}{Tes}{TsveyYudn}"))))
_B1.append((_x("{Shin}{TsveyVovn}{VovYud}{Reysh}{Nun}"), ("repl", _x("{Shin}{TsveyVovn}{Ayen}{Reysh}"))))
_B1.append((_x("{Beys}{Reysh}{Alef}{Khof}{Tes}"), ("repl", _x("{Beys}{Reysh}{Ayen}{Nun}{Giml}"))))
for _s in (
    "{Vov}{Nun}{Giml} {Hey}{TsveyYudn}{Tes} {Kuf}{TsveyYudn}{Tes} "
    "{Yud}{Kuf}{TsveyYudn}{Tes} {Shin}{Alef}{Fey}{Tes}"
).split():
    _B1.append((_x(_s), ("r1_del",)))
for _s in "{Yud}{Zayen}{Mem} {Yud}{Zayen}{Mem}{Ayen}{Nun} {Yud}{Mem}".split():
    _B1.append((_x(_s), ("r1_del",)))
_B1.append((_x("{Vov}{Sof}"), ("r1_repl", _H["Hey"])))
for _s in (
    "{Ayen}{Lamed}{Ayen}{Khof} {Ayen}{Lamed}{Ayen} {Lamed}{Ayen}{Khof} "
    "{Ayen}{Lamed}{Ayen}{Samekh} {Ayen}{Lamed}{Ayen}{Nun}"
).split():
    _B1.append((_x(_s), ("r1_del",)))
_B1.append((_x("{Yud}{Samekh}{Tes}"), ("ist",)))
_B1.append((_x("{Yud}{Samekh}{Tes}{Nun}"), ("r1_del",)))
for _s in (
    "{Samekh}{Tes}{Vov} {Samekh}{Tes}{Ayen}{Reysh} {Samekh}{Tes}{Ayen} "
    "{Samekh}{Tes}{Nun} {Samekh}{Tes}"
).split():
    _B1.append((_x(_s), ("r1_del",)))
_B1.sort(key=lambda kv: -len(kv[0]))

_B2 = sorted(
    [(_x(s), "r1_del") for s in (
        "{Vov}{Nun}{Giml} {Hey}{TsveyYudn}{Tes} {Kuf}{TsveyYudn}{Tes} "
        "{Yud}{Kuf}{TsveyYudn}{Tes} {Shin}{Alef}{Fey}{Tes}"
    ).split()]
    + [(_H["Lamed"], "lamed")],
    key=lambda kv: -len(kv[0]),
)

_B3 = sorted(
    [(_x(s), "r1_del") for s in (
        "{Yud}{Giml} {Yud}{Kuf} {Yud}{Shin} {Nun}{Yud}{Kuf} "
        "{Dalet}{Yud}{Kuf} {Nun}{Dalet}{Yud}{Kuf} "
        "{Ayen}{Nun}{Dalet}{Yud}{Kuf}"
    ).split()]
    + [(_x("{Beys}{Lamed}{Yud}{Kuf}"), "noop"),
       (_x("{Giml}{Lamed}{Yud}{Kuf}"), "noop")],
    key=lambda kv: -len(kv[0]),
)

_BRAKH = _x("{Beys}{Reysh}{Alef}{Khof}")
_BRENG = _x("{Beys}{Reysh}{Ayen}{Nun}{Giml}")


def _standard_suffix(w: str, p1: int) -> str:
    n = len(w)
    for s, act in _B1:
        if not w.endswith(s):
            continue
        cut = n - len(s)
        kind = act[0]
        if kind == "r1_del":
            if cut >= p1:
                w = w[:cut]
            break
        if kind == "noop":
            break
        if kind == "r1_repl":
            if cut >= p1:
                w = w[:cut] + act[1]
            break
        if kind == "repl":
            w = w[:cut] + act[1]
            break
        if kind == "ene":
            if cut >= p1:
                w = w[:cut]
                m = len(w)
                for a, b in _RESPELL:
                    if w.endswith(a):
                        w = w[: m - len(a)] + b
                        break
            break
        if kind == "tes_group":
            if cut >= p1:
                w = w[:cut]
            else:
                w = w[:cut] + _H["Tes"]
            # [BRAKH try GE] <- BRENG (failure keeps prior changes)
            m = len(w)
            if w.endswith(_BRAKH):
                b = m - len(_BRAKH)
                if w[:b].endswith("GE"):
                    b -= 2
                w = w[:b] + _BRENG
            break
        if kind == "ist":
            if cut >= 1 and w[cut - 1] in (_H["Giml"], _H["Shin"]):
                # try(R1plus3 <- YudSamekh)
                if cut >= p1 - 3:
                    w = w[:cut] + _x("{Yud}{Samekh}")
                break
            if cut >= p1:
                w = w[:cut]
            break
        break
    # block 2
    n = len(w)
    for s, kind in _B2:
        if w.endswith(s):
            cut = n - len(s)
            if kind == "r1_del":
                if cut >= p1:
                    w = w[:cut]
            else:  # lamed: R1 consonant delete
                if cut >= p1 and cut >= 1 and w[cut - 1] in _CONSONANT:
                    w = w[:cut]
            break
    # block 3
    n = len(w)
    for s, kind in _B3:
        if w.endswith(s):
            cut = n - len(s)
            if kind == "r1_del" and cut >= p1:
                w = w[:cut]
            break
    # block 4: drop GE/TSU markers
    return w.replace("GE", "").replace("TSU", "")


def stem_yiddish(word: str) -> str:
    word = _prelude(word)
    word, p1 = _mark_regions(word)
    return _standard_suffix(word, p1)
